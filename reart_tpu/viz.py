"""Visualization artifacts: segmentation HTML, reconstruction GIFs, kinematic
structure HTML.

Parity target: utils/viz_utils.py (plotly scatter + cylinder-edge structure
viz + GIF sequences). This environment has no plotly, so the HTML artifacts
are produced by a self-contained zero-dependency WebGL-free viewer (inline
canvas renderer with drag-to-orbit) when plotly is absent; GIFs render via
matplotlib Agg + imageio. When plotly IS importable we emit reference-
identical figures.

Color protocol matches the reference (viz_utils.py:14-24): jet colormap over
the SORTED unique part ids present, normalized to the part count.
"""

from __future__ import annotations

import json
import os

import numpy as np

try:
    import plotly.graph_objects as go

    # functional check, not just importability: test stubs (and broken
    # installs) can register a non-working plotly in sys.modules
    HAS_PLOTLY = callable(getattr(go.Figure, "add_trace", None))
except ImportError:  # this image: no plotly
    HAS_PLOTLY = False


def part_colors(labels: np.ndarray) -> np.ndarray:
    """(N,) int labels -> (N, 3) float RGB via jet over unique ids."""
    import matplotlib.cm as cm
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    labels = np.asarray(labels)
    uniq = sorted(set(labels.tolist()))
    norm = mcolors.Normalize(vmin=0, vmax=len(uniq))
    smap = cm.ScalarMappable(norm=norm, cmap=plt.get_cmap("jet"))
    out = np.empty((len(labels), 3))
    for i, u in enumerate(uniq):
        out[labels == u] = np.asarray(smap.to_rgba(i)[:3])
    return out


# ---------------------------------------------------------------------------
# self-contained HTML point-cloud viewer (no plotly)
# ---------------------------------------------------------------------------

_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title><style>
body{{margin:0;background:#111;color:#eee;font:13px sans-serif}}
#c{{display:block}}#hud{{position:fixed;top:8px;left:10px}}</style></head>
<body><div id="hud">{title} — drag to orbit, wheel to zoom</div>
<canvas id="c"></canvas><script>
const DATA={data};
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let rx=-1.0,rz=0.6,zoom=1.0,dragging=false,px=0,py=0;
function resize(){{cv.width=innerWidth;cv.height=innerHeight;draw()}}
addEventListener('resize',resize);
cv.onmousedown=e=>{{dragging=true;px=e.clientX;py=e.clientY}};
addEventListener('mouseup',()=>dragging=false);
addEventListener('mousemove',e=>{{if(!dragging)return;
 rz+=(e.clientX-px)*0.008;rx+=(e.clientY-py)*0.008;px=e.clientX;py=e.clientY;draw()}});
cv.onwheel=e=>{{zoom*=e.deltaY<0?1.1:0.9;draw();e.preventDefault()}};
function draw(){{
 ctx.fillStyle='#111';ctx.fillRect(0,0,cv.width,cv.height);
 const cx=cv.width/2,cy=cv.height/2,s=Math.min(cx,cy)*0.8*zoom;
 const cb=Math.cos(rz),sb=Math.sin(rz),ca=Math.cos(rx),sa=Math.sin(rx);
 for(const set of DATA){{
  const pts=set.p,cols=set.c,n=pts.length/3,proj=new Array(n);
  for(let i=0;i<n;i++){{
   const x=pts[3*i],y=pts[3*i+1],z=pts[3*i+2];
   const x1=x*cb-y*sb,y1=x*sb+y*cb;
   const y2=y1*ca-z*sa,z2=y1*sa+z*ca;
   proj[i]=[x1,y2,z2,i];
  }}
  proj.sort((a,b)=>a[1]-b[1]);
  for(const[q,d,z2,i]of proj){{
   ctx.fillStyle=cols[i];
   ctx.fillRect(cx+q*s-1.5,cy-z2*s-1.5,3,3);
  }}
 }}
}}
resize();
</script></body></html>"""


def _rgb_hex(colors: np.ndarray):
    return ["#%02x%02x%02x" % tuple((np.clip(c, 0, 1) * 255).astype(int))
            for c in colors]


def _write_canvas_html(point_sets, save_path, title):
    """point_sets: list of (pc (N,3), colors (N,3))."""
    all_pts = np.concatenate([p for p, _ in point_sets], axis=0)
    center = all_pts.mean(0)
    scale = max(1e-9, np.abs(all_pts - center).max())
    data = []
    for pc, cols in point_sets:
        norm = (np.asarray(pc, np.float64) - center) / scale
        data.append({
            "p": [round(float(v), 4) for v in norm.reshape(-1)],
            "c": _rgb_hex(cols),
        })
    html = _HTML_TEMPLATE.format(title=title, data=json.dumps(data))
    with open(save_path, "w") as f:
        f.write(html)


def vis_pc(pc, pred_part, pc_gt=None, gt_part=None, name: str = "pred",
           save_path=None):
    """Side-by-side pred/GT segmentation viewer (viz_utils.py:13-53): the GT
    cloud is offset along +x by the pred cloud's extent + 40%."""
    pc = np.asarray(pc)
    sets = [(pc, part_colors(pred_part))]
    if gt_part is not None:
        gpc = np.asarray(pc_gt).copy() if pc_gt is not None else pc.copy()
        src_scale = pc[:, 0].max() - pc[:, 0].min()
        gpc[:, 0] += max(0.0, src_scale * 1.4)
        sets.append((gpc, part_colors(gt_part)))
    if save_path is None:
        return sets
    if HAS_PLOTLY:
        fig = go.Figure()
        for (p, c), nm in zip(sets, (name, "gt")):
            fig.add_trace(go.Scatter3d(
                x=p[:, 0], y=p[:, 2], z=p[:, 1], mode="markers", name=nm,
                marker=dict(color=_rgb_hex(c), size=5)))
        fig.update_layout(showlegend=True, scene=dict(aspectmode="data"))
        fig.write_html(save_path)
    else:
        _write_canvas_html(sets, save_path, name)
    return sets


def _render_frame(pc, colors, lims):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 4), dpi=80)
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pc[:, 0], pc[:, 2], pc[:, 1], c=colors, s=2)
    ax.set_xlim(lims[0]); ax.set_ylim(lims[2]); ax.set_zlim(lims[1])
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def vis_pc_seq(pc_list, pred_part=None, name: str = "seq", save_path=None):
    """Animated GIF over frames (viz_utils.py:63-76)."""
    import imageio.v2 as imageio

    pc_list = np.asarray(pc_list)
    colors = (part_colors(pred_part) if pred_part is not None
              else np.tile([[0.2, 0.4, 0.9]], (pc_list.shape[1], 1)))
    flat = pc_list.reshape(-1, 3)
    lims = [(flat[:, i].min(), flat[:, i].max()) for i in range(3)]
    frames = [_render_frame(pc, colors, lims) for pc in pc_list]
    if save_path is not None:
        imageio.mimsave(save_path, frames, duration=0.3, loop=0)
    return frames


def _cylinder_grid(r, h, nt=100, nv=50):
    """Parametrized cylinder surface grid (viz_utils.py:79-89): (nv, nt, 3)
    with the axis along +z from 0 to h."""
    theta = np.linspace(0, 2 * np.pi, nt)
    v = np.linspace(0, h, nv)
    theta, v = np.meshgrid(theta, v)
    return np.stack([r * np.cos(theta), r * np.sin(theta), v], axis=2)


def _edge_cylinder(parent_centroid, child_centroid, r=0.01):
    """The reference's cylinder-between-centroids construction
    (viz_utils.py:124-137): a z-axis cylinder of the edge's length rotated
    onto the centroid-to-centroid direction (Rodrigues from cross/dot, with
    the antipodal special case) and planted at the child centroid."""
    d = parent_centroid - child_centroid
    h = float(np.linalg.norm(d)) + 1e-6
    cy = _cylinder_grid(r, h)
    line1 = np.array([0.0, 0.0, 1.0])
    line2 = d / h
    v = np.cross(line1, line2)
    c = float(np.dot(line1, line2)) + 1e-8
    k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    rot = np.eye(3) + k + k @ k * (1.0 / (1.0 + c))
    if abs(c + 1.0) < 1e-4:  # cos = -1: the formula degenerates
        rot = np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    t = child_centroid + 5e-3 * line2
    return cy @ rot.T + t  # (nv, nt, 3)


def vis_structure(cano_pc, seg_part, joint_connection, save_path=None):
    """Kinematic-structure viz (viz_utils.py:92-145): part point clouds,
    black centroid joint markers, and the reference's EXACT cylinder-surface
    edges between parent/child centroids. With plotly the cylinders are
    go.Surface traces like the reference; the built-in canvas fallback
    renders the same cylinder surface grids as dense point samples."""
    cano_pc = np.asarray(cano_pc)
    seg_part = np.asarray(seg_part)
    cols = part_colors(seg_part)
    uniq = sorted(set(seg_part.tolist()))
    centroids = {u: cano_pc[seg_part == u].mean(0) for u in uniq}
    cylinders = []
    for a, b in joint_connection:
        ca, cb = int(a), int(b)  # (child, parent) edges
        if ca not in centroids or cb not in centroids:
            print(f"empty edge {cb}-{ca}: a part has no points")
            continue
        cylinders.append(_edge_cylinder(centroids[cb], centroids[ca]))
    joint_pts = np.stack([centroids[u] for u in uniq])
    sets = [(cano_pc, cols),
            (joint_pts, np.zeros((len(uniq), 3)))]  # black joint markers
    if cylinders:
        cyl_pts = np.concatenate([c.reshape(-1, 3) for c in cylinders])
        sets.append((cyl_pts, np.tile([[0.85, 0.85, 0.85]],
                                      (len(cyl_pts), 1))))
    if save_path is None:
        return sets
    if HAS_PLOTLY:
        fig = go.Figure()
        for i, u in enumerate(uniq):
            cp = centroids[u][None]
            fig.add_trace(go.Scatter3d(
                x=cp[:, 0], y=cp[:, 2], z=cp[:, 1], mode="markers",
                name=f"joint_{u}", marker=dict(color="black", size=20)))
        fig.add_trace(go.Scatter3d(
            x=cano_pc[:, 0], y=cano_pc[:, 2], z=cano_pc[:, 1],
            mode="markers", name="pc",
            marker=dict(color=_rgb_hex(cols), size=5)))
        for cy in cylinders:
            fig.add_trace(go.Surface(
                x=cy[:, :, 0], y=cy[:, :, 2], z=cy[:, :, 1],
                opacity=0.5, showscale=False))
        fig.update_layout(showlegend=True, scene=dict(
            xaxis_title="x", yaxis_title="z", zaxis_title="y",
            aspectmode="data"))
        fig.write_html(save_path)
    else:
        _write_canvas_html(sets, save_path, "structure")
    return sets
