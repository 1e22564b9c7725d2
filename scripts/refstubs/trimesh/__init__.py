"""Pure-numpy trimesh stand-in for reverse parity (run_real.py's dataset,
dataset/dataset_real.py:3,29-47): `load_mesh` (OBJ triangles), mesh
`.vertices`/`.copy()`, and `trimesh.sample.sample_surface` (area-weighted
uniform surface sampling via np.random, like the real library). Only the
call surface the reference uses is provided."""

import numpy as np

from . import sample  # noqa: F401  (trimesh.sample.sample_surface)


class Trimesh:
    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int64)

    def copy(self):
        return Trimesh(self.vertices.copy(), self.faces.copy())


def load_mesh(path):
    if str(path).rsplit(".", 1)[-1].lower() != "obj":
        raise NotImplementedError(
            "trimesh refstub loads OBJ only (reverse-parity fixtures)")
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return Trimesh(np.asarray(verts), np.asarray(faces))
