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


def _blend3_oracle(q, r, f):
    """Brute-force (x-y)^2 3-NN inverse-distance blend. The kernel now uses
    the x^2+y^2-2xy expansion (cross term on the MXU, same formula as the
    jnp fallback's pairwise_sqdist), which differs from this oracle in ulps
    — hence the atol below covers the weight wobble on near-tied anchors."""
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)  # (n, m)
    idx = np.argsort(d, axis=1, kind="stable")[:, :3]
    d3 = np.take_along_axis(d, idx, axis=1)
    dist3 = np.maximum(np.sqrt(d3), 1e-10)
    w = 1.0 / dist3
    w = w / w.sum(1, keepdims=True)
    flows = f[idx]  # (n, 3, 3)
    blended = (flows * w[..., None]).sum(1)
    min_d = dist3[:, 0]
    flow_d = (flows ** 2).sum(-1).max(1)
    mask = np.logical_or(min_d <= flow_d, min_d <= 0.05)
    return blended, mask


@pytest.mark.parametrize("n,m", [(64, 64), (100, 37), (256, 300)])
def test_blend3_kernel_matches_oracle(n, m):
    """Fused blend kernel == brute-force numpy blend (values + mask)."""
    from reart_tpu.ops.pallas_nn import blend3_pallas

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(4, n, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(4, m, 3).astype(np.float32))
    f = jnp.asarray(0.1 * rng.randn(4, m, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        blended, min_d, flow_d = blend3_pallas(q, r, f)
    mask = np.logical_or(np.asarray(min_d) <= np.asarray(flow_d),
                         np.asarray(min_d) <= 0.05)
    for b in range(4):
        ref_b, ref_m = _blend3_oracle(
            np.asarray(q[b], np.float32), np.asarray(r[b], np.float32),
            np.asarray(f[b], np.float32))
        np.testing.assert_allclose(np.asarray(blended[b]), ref_b,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_array_equal(mask[b], ref_m)


def test_blend3_batched_dispatch_fallback():
    """blend_anchor_motion_batched falls back to the jnp path off-TPU and
    matches the per-frame function."""
    from reart_tpu.ops.interpolate import (
        blend_anchor_motion,
        blend_anchor_motion_batched,
    )

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(3, 50, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(3, 40, 3).astype(np.float32))
    f = jnp.asarray(0.1 * rng.randn(3, 40, 3).astype(np.float32))
    blended, mask = blend_anchor_motion_batched(q, r, f)
    ref_b, ref_m = blend_anchor_motion(q[0], r[0], f[0], return_mask=True)
    np.testing.assert_allclose(np.asarray(blended[0]), np.asarray(ref_b),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask[0]), np.asarray(ref_m))


def test_nn1_coords_matches_oracle():
    from reart_tpu.ops.pallas_nn import nn1_coords_pallas

    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(3, 100, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(3, 77, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        d, idx, coords = nn1_coords_pallas(q, r)
    for b in range(3):
        dm = ((np.asarray(q[b])[:, None] - np.asarray(r[b])[None]) ** 2).sum(-1)
        ref_i = dm.argmin(1)
        np.testing.assert_array_equal(np.asarray(idx[b]), ref_i)
        np.testing.assert_allclose(np.asarray(d[b]), dm.min(1), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(coords[b]),
                                   np.asarray(r[b])[ref_i], rtol=1e-6)


def test_nn_points_custom_vjp_grads_match_gather_path():
    """Gradients of the kernel chamfer path == gradients of the
    gather-recompute formulation, for BOTH clouds."""
    from reart_tpu.ops.distance import (
        _gathered_sqdist,
        _nn_points_pallas,
        nearest_neighbor,
    )

    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))

    def loss_kernel(q, r):
        d, _ = _nn_points_pallas(q, r)
        return jnp.sum(d * jnp.arange(d.shape[-1], dtype=jnp.float32))

    def loss_gather(q, r):
        _, idx = nearest_neighbor(jax.lax.stop_gradient(q),
                                  jax.lax.stop_gradient(r))
        d = _gathered_sqdist(q, r, idx)
        return jnp.sum(d * jnp.arange(d.shape[-1], dtype=jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        gq_k, gr_k = jax.grad(loss_kernel, argnums=(0, 1))(q, r)
    gq_g, gr_g = jax.grad(loss_gather, argnums=(0, 1))(q, r)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_k), np.asarray(gr_g),
                               rtol=1e-4, atol=1e-5)


def test_fps_kernel_matches_jnp_loop():
    """Resident FPS kernel selects the identical index sequence as the
    fori_loop path, masked and unmasked."""
    from reart_tpu.ops.pallas_fps import fps_pallas
    from reart_tpu.ops.sampling import _fps_loop

    rng = np.random.RandomState(7)
    xyz = jnp.asarray(rng.randn(3, 200, 3).astype(np.float32))
    mask_all = jnp.ones((3, 200), bool)
    start0 = jnp.zeros((3,), jnp.int32)
    ref = _fps_loop(xyz, mask_all, start0, 64)
    with pltpu.force_tpu_interpret_mode():
        got = fps_pallas(xyz, mask_all, 64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    mask = jnp.asarray(rng.rand(3, 200) > 0.3)
    start = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    ref_m = _fps_loop(xyz, mask, start, 32)
    with pltpu.force_tpu_interpret_mode():
        got_m = fps_pallas(xyz, mask, 32)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))


def test_nn1_bidir_coords_matches_oracle():
    """Fused bidirectional coords kernel == brute force in both directions
    (values, first-min indices, gathered winner coords); N spans two row
    tiles so the reverse-direction cross-tile merge is exercised."""
    from reart_tpu.ops.pallas_nn import nn1_bidir_coords_pallas

    rng = np.random.RandomState(8)
    q = jnp.asarray(rng.randn(2, TILE_N + 60, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(2, 133, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        fd, fi, fc, bd, bi, bc = nn1_bidir_coords_pallas(q, r)
    for b in range(2):
        dm = ((np.asarray(q[b])[:, None] - np.asarray(r[b])[None]) ** 2).sum(-1)
        ref_fi, ref_bi = dm.argmin(1), dm.argmin(0)
        np.testing.assert_array_equal(np.asarray(fi[b]), ref_fi)
        np.testing.assert_array_equal(np.asarray(bi[b]), ref_bi)
        np.testing.assert_allclose(np.asarray(fd[b]), dm.min(1), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(bd[b]), dm.min(0), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(fc[b]),
                                   np.asarray(r[b])[ref_fi], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(bc[b]),
                                   np.asarray(q[b])[ref_bi], rtol=1e-6)


def test_nn1_bidir_ties_to_lower_index():
    """All-identical clouds: every match must resolve to index 0 in BOTH
    directions, including across row tiles (strict < keeps earlier tiles)."""
    from reart_tpu.ops.pallas_nn import nn1_bidir_coords_pallas

    src = jnp.zeros((1, TILE_N * 2, 3))
    tgt = jnp.zeros((1, 200, 3))
    with pltpu.force_tpu_interpret_mode():
        _, fi, _, _, bi, _ = nn1_bidir_coords_pallas(src, tgt)
    assert int(fi.max()) == 0 and int(bi.max()) == 0


def test_nn_points_bidir_vjp_grads_match_gather_path():
    """Gradients of the fused bidirectional chamfer path == gradients of the
    two-direction gather-recompute formulation, for BOTH clouds."""
    from reart_tpu.ops.distance import (
        _gathered_sqdist,
        _nn_points_bidir_pallas,
        nearest_neighbor,
    )

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))

    def loss_kernel(q, r):
        fd, _, bd, _ = _nn_points_bidir_pallas(q, r)
        wf = jnp.arange(fd.shape[-1], dtype=jnp.float32)
        wb = 1.0 + jnp.arange(bd.shape[-1], dtype=jnp.float32)
        return jnp.sum(fd * wf) + jnp.sum(bd * wb)

    def loss_gather(q, r):
        _, fi = nearest_neighbor(jax.lax.stop_gradient(q),
                                 jax.lax.stop_gradient(r))
        _, bi = nearest_neighbor(jax.lax.stop_gradient(r),
                                 jax.lax.stop_gradient(q))
        fd = _gathered_sqdist(q, r, fi)
        bd = _gathered_sqdist(r, q, bi)
        wf = jnp.arange(fd.shape[-1], dtype=jnp.float32)
        wb = 1.0 + jnp.arange(bd.shape[-1], dtype=jnp.float32)
        return jnp.sum(fd * wf) + jnp.sum(bd * wb)

    with pltpu.force_tpu_interpret_mode():
        gq_k, gr_k = jax.grad(loss_kernel, argnums=(0, 1))(q, r)
    gq_g, gr_g = jax.grad(loss_gather, argnums=(0, 1))(q, r)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_k), np.asarray(gr_g),
                               rtol=1e-4, atol=1e-5)
