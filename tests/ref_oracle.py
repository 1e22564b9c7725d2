"""Import helpers for using the reference implementation as a test oracle.

The reference depends on plotly / apted / knn_cuda / chamferdist, which are
not installed; we stub just enough for its *pure-torch* modules (screw_se3,
kinematic/graph utils) to import. Oracle tests never execute the stubbed
paths.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def setup_reference_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # plotly (viz_utils) — never called by oracle tests
    plotly = _stub("plotly")
    go = _stub("plotly.graph_objects", Figure=object, Scatter3d=object, Surface=object)
    plotly.graph_objects = go
    # knn_cuda (run scripts / model knn path) — oracle tests pass knn=None
    class _KNN:
        def __init__(self, *a, **k):
            raise RuntimeError("knn_cuda stub should never be constructed")
    _stub("knn_cuda", KNN=_KNN)
    # apted (ted_utils)
    apted = _stub("apted", APTED=object, Config=object)
    helpers = _stub("apted.helpers", Tree=object)
    apted.helpers = helpers
    return REFERENCE_ROOT
