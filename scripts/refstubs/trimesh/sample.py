"""trimesh.sample.sample_surface stand-in: area-weighted uniform sampling
with uniform barycentric coordinates (sqrt trick), driven by np.random like
the real library (the reference seeds np.random, run_real.py:34).

Baked-cloud mode (3-decimal real-domain reverse parity, VERDICT r4 #5):
when REART_REFSTUB_CLOUDS names an .npz with `clouds` (T, N, 3), successive
sample_surface calls return those exact arrays in order instead of fresh
samples — the reference's dataset samples its T meshes once, in frame
order (dataset_real.py:44-47), so baking OUR loader's clouds makes the
UNMODIFIED run_real.py consume geometry identical to our fit's and the
ass/cd/energy comparison becomes numeric, not statistical. face_idx is not
baked (nothing downstream of run_real uses it); zeros are returned."""

import os

import numpy as np

_BAKED = {"clouds": None, "next": 0}


def _baked_next(count):
    path = os.environ.get("REART_REFSTUB_CLOUDS")
    if not path:
        return None
    if _BAKED["clouds"] is None:
        _BAKED["clouds"] = np.load(path)["clouds"].astype(np.float64)
        _BAKED["next"] = 0
    clouds = _BAKED["clouds"]
    i = _BAKED["next"]
    assert i < clouds.shape[0], (
        f"baked clouds exhausted: {clouds.shape[0]} frames, call {i}")
    assert clouds.shape[1] == count, (
        f"baked cloud has {clouds.shape[1]} points, caller wants {count}")
    _BAKED["next"] = i + 1
    return clouds[i]


def sample_surface(mesh, count):
    baked = _baked_next(count)
    if baked is not None:
        return baked, np.zeros(count, np.int64)
    v, f = np.asarray(mesh.vertices), np.asarray(mesh.faces)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    p = area / area.sum()
    face_idx = np.random.choice(len(f), size=count, p=p)
    r1 = np.sqrt(np.random.rand(count, 1))
    r2 = np.random.rand(count, 1)
    pts = ((1 - r1) * a[face_idx] + r1 * (1 - r2) * b[face_idx]
           + r1 * r2 * c[face_idx])
    return pts, face_idx
