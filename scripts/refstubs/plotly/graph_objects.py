import io


def _tiny_png() -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (255, 255, 255)).save(buf, format="PNG")
    return buf.getvalue()


class _Trace:
    def __init__(self, *args, **kwargs):
        pass


class Scatter3d(_Trace):
    pass


class Surface(_Trace):
    pass


class Figure:
    def __init__(self, data=None, *args, **kwargs):
        self._traces = [data] if data is not None else []

    def add_trace(self, trace):
        self._traces.append(trace)
        return self

    def update_layout(self, *args, **kwargs):
        return self

    def update_coloraxes(self, *args, **kwargs):
        return self

    def write_html(self, path, *args, **kwargs):
        with open(path, "w") as f:
            f.write("<!-- plotly stub: headless parity run, no viz -->\n")

    def to_image(self, format="png", *args, **kwargs):
        return _tiny_png()
