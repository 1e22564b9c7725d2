"""Oracle tests for the structure / connection losses (reference
networks/loss.py:30-79 — defined there but unused by its drivers)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_oracle import setup_reference_path
from reart_tpu.losses import compute_connection_loss, structure_loss


@pytest.fixture(scope="module")
def ref_loss():
    setup_reference_path()
    import networks.loss as ref

    return ref


def random_se3(rng, shape):
    """Random small rigid transforms with valid rotations."""
    from scipy.spatial.transform import Rotation

    n = int(np.prod(shape))
    out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    out[:, :3, :3] = Rotation.random(n, random_state=rng).as_matrix()
    out[:, :3, 3] = 0.1 * rng.randn(n, 3)
    return out.reshape(shape + (4, 4)).astype(np.float32)


class TestStructureLoss:
    def test_matches_reference(self, ref_loss):
        rng = np.random.RandomState(0)
        t, p = 5, 4
        rel = random_se3(rng, (t, p, p))
        axis = rng.randn(t, p, p, 3).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        moment = rng.randn(t, p, p, 3).astype(np.float32) * 0.1
        theta = rng.randn(t, p, p).astype(np.float32) * 0.5
        distance = rng.randn(t, p, p).astype(np.float32) * 0.2
        edges = np.array([[1, 0], [2, 0], [3, 2]])

        ours = float(structure_loss(
            jnp.asarray(rel), jnp.asarray(axis), jnp.asarray(moment),
            jnp.asarray(theta), jnp.asarray(distance), edges))
        ref = float(ref_loss.structure_loss(
            torch.from_numpy(rel), torch.from_numpy(axis),
            torch.from_numpy(moment), torch.from_numpy(theta),
            torch.from_numpy(distance), torch.from_numpy(edges)))
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


class TestConnectionLoss:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(1)
        n, t = 200, 4
        cano = rng.randn(n, 3).astype(np.float32)
        seg = rng.randint(0, 3, n)
        pcs = np.stack([cano + 0.05 * i for i in range(t)]).astype(np.float32)
        edges = [[1, 0], [2, 0]]
        k = 5

        ours = float(compute_connection_loss(
            jnp.asarray(cano), jnp.asarray(seg), edges, jnp.asarray(pcs), k=k))

        # brute force
        expected = 0.0
        for a, b in edges:
            src_i = np.nonzero(seg == a)[0]
            tgt_i = np.nonzero(seg == b)[0]
            d = ((cano[src_i][:, None] - cano[tgt_i][None]) ** 2).sum(-1)
            nn_t = d.argmin(1)
            d_min = d[np.arange(len(src_i)), nn_t]
            src_sel = np.argsort(d_min)[:k]
            tgt_sel = nn_t[src_sel]
            rs, rt = src_i[src_sel], tgt_i[tgt_sel]
            dd = ((pcs[:, rs] - pcs[:, rt]) ** 2).sum(-1).mean(1)
            expected += dd.sum()
        np.testing.assert_allclose(ours, expected, rtol=1e-4)
