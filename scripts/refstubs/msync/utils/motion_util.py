"""Minimal rigid-motion algebra matching the call surface the reference's
sapien dataset uses (dataset/dataset_sapien.py:5,8-20): Isometry.from_matrix,
.inv(), .dot(), `iso @ points`, `.matrix`. Implemented directly on 4x4
matrices — our own code, not multibody-sync's quaternion form."""

import numpy as np


class Isometry:
    def __init__(self, matrix=None):
        self._m = np.eye(4) if matrix is None else np.asarray(
            matrix, dtype=np.float64).reshape(4, 4)

    @classmethod
    def from_matrix(cls, m):
        return cls(np.asarray(m))

    @property
    def matrix(self):
        return self._m.copy()

    def inv(self):
        r, t = self._m[:3, :3], self._m[:3, 3]
        out = np.eye(4)
        out[:3, :3] = r.T
        out[:3, 3] = -r.T @ t
        return Isometry(out)

    def dot(self, other):
        return Isometry(self._m @ other._m)

    def __matmul__(self, pts):
        pts = np.asarray(pts)
        return pts @ self._m[:3, :3].T + self._m[:3, 3]
