"""Real-scan sequence loader (mesh frames -> sampled clouds, no GT).

Parity target: dataset/dataset_real.py of the reference: load every mesh in
the directory (sorted by the trailing frame index), normalize the CANONICAL
mesh to unit diagonal to obtain (centroid, scale) for feature normalization,
sample `num_points` surface points per frame. Mesh IO / sampling via
reart_tpu.data.mesh (trimesh-free).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from reart_tpu.data.mesh import load_mesh, sample_surface


def normalize_stats(verts: np.ndarray):
    """(centroid, scale): scale = 1 / |bbox diagonal| (dataset_real.py:7-16)."""
    vmax, vmin = verts.max(axis=0), verts.min(axis=0)
    centroid = verts.mean(axis=0)
    return centroid, np.asarray(1.0 / np.linalg.norm(vmax - vmin))


class RealSequence:
    def __init__(self, seq_dir: str, num_points: int = 4096,
                 cano_idx: int = 0, seed: int = 0):
        self.seq_dir = seq_dir
        self.num_points = num_points
        self.cano_idx = cano_idx
        self._seed = seed
        files = glob.glob(os.path.join(seq_dir, "*.*"))
        files = sorted(
            files,
            key=lambda f: int(os.path.basename(f).split(".")[0].split("_")[-1]),
        )
        self.mesh_list = [load_mesh(f) for f in files]
        cano_verts = self.mesh_list[cano_idx][0]
        self.centroid, self.scale = normalize_stats(cano_verts)

    def __len__(self):
        return 1

    def __getitem__(self, item) -> dict:
        rng = np.random.RandomState(self._seed)
        complete = np.stack([
            sample_surface(v, f, self.num_points, rng)
            for v, f in self.mesh_list
        ]).astype("float32")
        cano_pc = complete[self.cano_idx]
        pc_list = np.concatenate(
            [complete[: self.cano_idx], complete[self.cano_idx + 1:]], axis=0
        )
        return {
            "cano_pc": cano_pc,
            "pc_list": pc_list,
            "complete_pc_list": complete,
        }
