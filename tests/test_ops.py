"""Neighbor/sampling op tests vs brute-force numpy references."""

import numpy as np
import jax
import jax.numpy as jnp

from reart_tpu import ops as O


def brute_fps(xyz, npoint, start=0):
    n = xyz.shape[0]
    dist = np.full(n, np.inf)
    far = start
    out = []
    for _ in range(npoint):
        out.append(far)
        d = np.sum((xyz - xyz[far]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    return np.array(out)


class TestDistance:
    def test_pairwise_sqdist(self, rng):
        x = rng.randn(2, 50, 3).astype(np.float32)
        y = rng.randn(2, 70, 3).astype(np.float32)
        ours = np.asarray(O.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
        ref = np.sum((x[:, :, None] - y[:, None]) ** 2, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_knn(self, rng):
        x = rng.randn(40, 3).astype(np.float32)
        y = rng.randn(100, 3).astype(np.float32)
        d, idx = O.knn(jnp.asarray(x), jnp.asarray(y), k=3)
        ref_d = np.sqrt(np.sum((x[:, None] - y[None]) ** 2, axis=-1))
        ref_idx = np.argsort(ref_d, axis=-1)[:, :3]
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(ref_d, ref_idx, 1), atol=1e-5
        )

    def test_chamfer_values(self, rng):
        src = rng.randn(2, 30, 3).astype(np.float32)
        tgt = rng.randn(2, 40, 3).astype(np.float32)
        d_fwd = O.chamfer(jnp.asarray(src), jnp.asarray(tgt))
        d_bwd = O.chamfer(jnp.asarray(src), jnp.asarray(tgt), reverse=True)
        full = np.sum((src[:, :, None] - tgt[:, None]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(d_fwd), full.min(-1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_bwd), full.min(-2), atol=1e-5)
        both = O.chamfer(jnp.asarray(src), jnp.asarray(tgt[:, :30]), bidirectional=True)
        full30 = full[:, :, :30]
        np.testing.assert_allclose(
            np.asarray(both), full30.min(-1) + full30.min(-2), atol=1e-5
        )

    def test_chamfer_grad(self, rng):
        """Gradient must equal d/dsrc of sum of squared NN distances with
        fixed correspondences (the CUDA chamfer backward semantics)."""
        src = rng.randn(1, 10, 3).astype(np.float32)
        tgt = rng.randn(1, 12, 3).astype(np.float32)

        g = jax.grad(lambda s: O.chamfer_loss(s, jnp.asarray(tgt)))(jnp.asarray(src))
        full = np.sum((src[:, :, None] - tgt[:, None]) ** 2, axis=-1)
        nn_fwd = full.argmin(-1)
        nn_bwd = full.argmin(-2)
        ref = 2 * (src[0] - tgt[0][nn_fwd[0]])
        for j in range(12):
            i = nn_bwd[0, j]
            ref[i] += 2 * (src[0, i] - tgt[0, j])
        np.testing.assert_allclose(np.asarray(g[0]), ref, atol=1e-4)

    def test_label_transfer(self, rng):
        src = rng.randn(100, 3).astype(np.float32)
        labels = rng.randint(0, 5, 100)
        query = src[:20] + 1e-4  # perturbed copies -> labels must match
        out = O.knn_transfer_labels(jnp.asarray(query), jnp.asarray(src), jnp.asarray(labels))
        np.testing.assert_array_equal(np.asarray(out), labels[:20])


class TestSampling:
    def test_fps_matches_bruteforce(self, rng):
        xyz = rng.randn(2, 200, 3).astype(np.float32)
        idx = np.asarray(O.farthest_point_sample(jnp.asarray(xyz), 32))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], brute_fps(xyz[b], 32))

    def test_fps_starts_at_zero(self, rng):
        xyz = rng.randn(1, 64, 3).astype(np.float32)
        idx = np.asarray(O.farthest_point_sample(jnp.asarray(xyz), 8))
        assert idx[0, 0] == 0  # CUDA kernel determinism contract

    def test_masked_fps(self, rng):
        xyz = rng.randn(1, 100, 3).astype(np.float32)
        mask = np.zeros((1, 100), dtype=bool)
        sel = np.sort(rng.choice(100, 40, replace=False))
        mask[0, sel] = True
        idx = np.asarray(
            O.masked_farthest_point_sample(jnp.asarray(xyz), jnp.asarray(mask), 10)
        )[0]
        assert set(idx).issubset(set(sel))
        # equivalent to FPS on the compacted subset
        sub = xyz[0][sel]
        ref_local = brute_fps(sub, 10)
        np.testing.assert_array_equal(idx, sel[ref_local])

    def test_ball_query(self, rng):
        xyz = rng.rand(1, 128, 3).astype(np.float32)
        new_xyz = xyz[:, :8]
        radius, nsample = 0.3, 16
        idx = np.asarray(O.ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)))[0]
        sq = np.sum((new_xyz[0][:, None] - xyz[0][None]) ** 2, axis=-1)
        for s in range(8):
            in_r = np.where(sq[s] < radius ** 2)[0]
            take = in_r[:nsample]
            expect = np.full(nsample, take[0])
            expect[: len(take)] = take
            np.testing.assert_array_equal(idx[s], expect)

    def test_index_points(self, rng):
        pts = rng.randn(2, 50, 3).astype(np.float32)
        idx = rng.randint(0, 50, (2, 7, 4))
        out = np.asarray(O.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(out[b], pts[b][idx[b]])

    def test_index_points_mm_matches_gather_and_grad(self, rng):
        """index_points_mm: identical forward; its one-hot-matmul backward
        must equal the scatter-add backward of the plain gather (duplicate
        indices accumulate), incl. when chunking kicks in (M > chunk)."""
        import jax

        pts = jnp.asarray(rng.randn(2, 40, 5).astype(np.float32))
        # duplicates on purpose; M large enough to exercise >1 chunk when
        # the block budget is tiny
        idx = jnp.asarray(rng.randint(0, 40, (2, 9, 6)))
        np.testing.assert_allclose(
            np.asarray(O.index_points_mm(pts, idx)),
            np.asarray(O.index_points(pts, idx)))

        def loss(fn, p):
            out = fn(p, idx)
            return jnp.sum(jnp.sin(out) * out)

        g_ref = jax.grad(lambda p: loss(O.index_points, p))(pts)
        g_mm = jax.grad(lambda p: loss(O.index_points_mm, p))(pts)
        np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)

        # force multi-chunk path
        from reart_tpu.ops import sampling as S

        old = S._ONEHOT_BLOCK_BYTES
        S._ONEHOT_BLOCK_BYTES = 4 * 2 * 40 * 128  # chunk == 128 rows
        try:
            big_idx = jnp.asarray(rng.randint(0, 40, (2, 300,)))

            def loss2(fn, p):
                return jnp.sum(jnp.cos(fn(p, big_idx)))

            g2_ref = jax.grad(lambda p: loss2(O.index_points, p))(pts)
            g2_mm = jax.grad(lambda p: loss2(O.index_points_mm, p))(pts)
            np.testing.assert_allclose(np.asarray(g2_mm), np.asarray(g2_ref),
                                       rtol=1e-5, atol=1e-6)
        finally:
            S._ONEHOT_BLOCK_BYTES = old


class TestInterpolate:
    def test_three_interpolate(self, rng):
        q = rng.randn(20, 3).astype(np.float32)
        r = rng.randn(50, 3).astype(np.float32)
        f = rng.randn(50, 8).astype(np.float32)
        out = np.asarray(O.three_interpolate(jnp.asarray(q), jnp.asarray(r), jnp.asarray(f)))
        sq = np.sum((q[:, None] - r[None]) ** 2, axis=-1)
        idx = np.argsort(sq, axis=-1)[:, :3]
        d = np.take_along_axis(sq, idx, 1)
        w = 1.0 / (d + 1e-8)
        w = w / w.sum(-1, keepdims=True)
        ref = (f[idx] * w[..., None]).sum(1)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_blend_anchor_motion(self, rng):
        q = rng.randn(30, 3).astype(np.float32)
        r = rng.randn(60, 3).astype(np.float32)
        flow = rng.randn(60, 3).astype(np.float32) * 0.1
        blended, mask = O.blend_anchor_motion(
            jnp.asarray(q), jnp.asarray(r), jnp.asarray(flow), k=3, return_mask=True
        )
        d = np.sqrt(np.sum((q[:, None] - r[None]) ** 2, axis=-1))
        idx = np.argsort(d, axis=-1)[:, :3]
        dd = np.maximum(np.take_along_axis(d, idx, 1), 1e-10)
        w = (1.0 / dd)
        w = w / w.sum(-1, keepdims=True)
        ref = (flow[idx] * w[..., None]).sum(1)
        np.testing.assert_allclose(np.asarray(blended), ref, atol=1e-4)
        flow_sq = (flow[idx] ** 2).sum(-1).max(-1)
        ref_mask = np.logical_or(dd.min(-1) <= flow_sq, dd.min(-1) <= 0.05)
        np.testing.assert_array_equal(np.asarray(mask), ref_mask)
