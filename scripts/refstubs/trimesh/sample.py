"""trimesh.sample.sample_surface stand-in: area-weighted uniform sampling
with uniform barycentric coordinates (sqrt trick), driven by np.random like
the real library (the reference seeds np.random, run_real.py:34)."""

import numpy as np


def sample_surface(mesh, count):
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
