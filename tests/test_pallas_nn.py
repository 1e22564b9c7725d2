"""Fused k-NN kernel parity vs the jnp reference path (interpret mode on CPU;
the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from reart_tpu.ops.distance import pairwise_sqdist
from reart_tpu.ops.pallas_nn import TILE_M, TILE_N, nn_topk, nn_topk_pallas


def jnp_topk(q, r, k):
    sq = pairwise_sqdist(q, r)
    neg, idx = jax.lax.top_k(-sq, k)
    return np.asarray(jnp.clip(-neg, min=0.0)), np.asarray(idx)


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("n,m", [
    (TILE_N, TILE_M),            # exact tiles
    (300, 1500),                 # ragged both axes
    (TILE_N * 2, TILE_M * 2),    # multi-tile
])
def test_kernel_matches_jnp(k, n, m):
    rng = np.random.RandomState(0)
    q = rng.randn(2, n, 3).astype(np.float32)
    r = rng.randn(2, m, 3).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        d_p, i_p = nn_topk_pallas(jnp.asarray(q), jnp.asarray(r), k)
    d_j, i_j = jnp_topk(jnp.asarray(q), jnp.asarray(r), k)
    np.testing.assert_array_equal(np.asarray(i_p), i_j)
    np.testing.assert_allclose(np.asarray(d_p), d_j, rtol=1e-4, atol=1e-5)


def test_duplicate_points_tie_to_lower_index():
    q = jnp.zeros((1, TILE_N, 3))
    r = jnp.zeros((1, TILE_M * 2, 3))  # every ref point ties
    with pltpu.force_tpu_interpret_mode():
        _, idx = nn_topk_pallas(q, r, 3)
    np.testing.assert_array_equal(np.asarray(idx[0, 0]), [0, 1, 2])


def test_dispatch_fallback_small_shapes():
    # small problems must take the jnp path on any backend
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 64, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32))
    d, i = nn_topk(q, r, 3)
    d_j, i_j = jnp_topk(q, r, 3)
    np.testing.assert_array_equal(np.asarray(i), i_j)
    np.testing.assert_allclose(np.asarray(d), d_j, rtol=1e-5)


@pytest.mark.parametrize("n,m", [(TILE_N, TILE_M), (300, 1500),
                                 (TILE_N * 2, TILE_M * 2)])
def test_bidir_kernel_matches_jnp(n, m):
    from reart_tpu.ops.pallas_nn import nn_bidir_pallas

    rng = np.random.RandomState(3)
    src = rng.randn(2, n, 3).astype(np.float32)
    tgt = rng.randn(2, m, 3).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        fd, fi, bd, bi = nn_bidir_pallas(jnp.asarray(src), jnp.asarray(tgt))
    sq = np.asarray(pairwise_sqdist(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_array_equal(np.asarray(fi), sq.argmin(-1))
    np.testing.assert_array_equal(np.asarray(bi), sq.argmin(-2))
    np.testing.assert_allclose(np.asarray(fd), sq.min(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bd), sq.min(-2), rtol=1e-4, atol=1e-5)


def test_bidir_ties_to_lower_index():
    from reart_tpu.ops.pallas_nn import nn_bidir_pallas

    src = jnp.zeros((1, TILE_N * 2, 3))
    tgt = jnp.zeros((1, TILE_M * 2, 3))
    with pltpu.force_tpu_interpret_mode():
        _, fi, _, bi = nn_bidir_pallas(src, tgt)
    assert int(fi.max()) == 0 and int(bi.max()) == 0
