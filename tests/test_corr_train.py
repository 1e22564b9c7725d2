"""Tests for the self-supervised correspondence-backbone trainer
(reart_tpu/train/corr.py) — the capability the reference lacks entirely
(it consumes a frozen external corr_model.pth.tar, feature_extractor.py:62-86,
and ships no training code)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reart_tpu.models.pointnet2 import (
    apply_pointnet2msg2,
    bn_paths,
    init_pointnet2msg2,
    load_corr_model,
    save_corr_model,
)
from reart_tpu.train.corr import (
    CorrTrainConfig,
    apply_bn_ema,
    match_precision,
    synth_pair,
    train_corr,
)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(3, 700, 3).astype(np.float32) * 0.4)


class TestSynthPair:
    def test_shapes_and_determinism(self, frames):
        cfg = CorrTrainConfig(n_points=256)
        key = jax.random.PRNGKey(3)
        src, tgt, gt_pos, _ = synth_pair(key, frames, cfg)
        src2, tgt2, _, _ = synth_pair(key, frames, cfg)
        assert gt_pos.shape == (256, 3)
        assert src.shape == tgt.shape == (256, 3)
        assert np.isfinite(np.asarray(src)).all()
        assert np.isfinite(np.asarray(tgt)).all()
        np.testing.assert_array_equal(np.asarray(src), np.asarray(src2))
        np.testing.assert_array_equal(np.asarray(tgt), np.asarray(tgt2))
        # different keys give different pairs
        src3, _, _, _ = synth_pair(jax.random.PRNGKey(4), frames, cfg)
        assert np.abs(np.asarray(src) - np.asarray(src3)).max() > 1e-3

    def test_identity_when_motion_off(self, frames):
        cfg = CorrTrainConfig(n_points=128, resample=False,
                              max_angle=0.0, max_slide=0.0,
                              jitter=0.0, global_angle=0.0, global_slide=0.0,
                              scale_jitter=0.0)
        src, tgt, gt_pos, _ = synth_pair(jax.random.PRNGKey(0), frames, cfg)
        np.testing.assert_allclose(np.asarray(src), np.asarray(tgt),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gt_pos), np.asarray(tgt),
                                   atol=1e-6)

    def test_parts_move_rigidly(self, frames):
        """With jitter/global motion off, every point's displacement must be
        explained by one of k_parts rigid transforms: distances WITHIN a
        Voronoi cell are preserved."""
        cfg = CorrTrainConfig(n_points=200, resample=False,
                              jitter=0.0, global_angle=0.0,
                              global_slide=0.0, scale_jitter=0.0,
                              max_angle=0.5, max_slide=0.1, k_parts=4,
                              min_parts=4)
        src, tgt, _, _ = synth_pair(jax.random.PRNGKey(1), frames, cfg)
        src, tgt = np.asarray(src), np.asarray(tgt)
        # rigid motions preserve ALL pairwise distances within a part; points
        # whose distance changed are in different parts. Check the converse
        # cannot be asserted, but a rigid-per-part motion bounds how many
        # distances change: each point keeps its distance to every point of
        # its own cell. With 4 Voronoi cells over 200 points, every point
        # must have >= 10 distance-preserving partners.
        d_src = np.linalg.norm(src[:, None] - src[None], axis=-1)
        d_tgt = np.linalg.norm(tgt[:, None] - tgt[None], axis=-1)
        preserved = np.abs(d_src - d_tgt) < 1e-4
        assert (preserved.sum(1) >= 10).all()


class TestBatchBN:
    def test_stats_order_and_ema_bake(self):
        """bn_mode='batch' collects one (mean, var) per conv+BN layer in
        bn_paths order; baking them with momentum=1 makes the running-stats
        (inference) forward reproduce the batch-mode forward exactly."""
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 600, 3))
        stats = []
        y_batch = apply_pointnet2msg2(params, x, bn_mode="batch",
                                      stats_out=stats)
        assert len(stats) == len(bn_paths(params))
        baked = apply_bn_ema(params, stats, momentum=1.0)
        y_run = apply_pointnet2msg2(baked, x)  # default running mode
        np.testing.assert_allclose(np.asarray(y_run), np.asarray(y_batch),
                                   rtol=1e-4, atol=1e-4)

    def test_ema_preserves_originals(self):
        # momentum=0 must leave the tree bitwise identical
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        stats = []
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 520, 3))
        apply_pointnet2msg2(params, x, bn_mode="batch", stats_out=stats)
        out = apply_bn_ema(params, stats, momentum=0.0)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(out)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTraining:
    @pytest.mark.slow
    def test_short_training_improves_matching(self, frames):
        cfg = CorrTrainConfig(steps=8, batch=2, n_points=512,
                              dispatch_chunk=4, resample=False)
        key = jax.random.PRNGKey(0)
        init_params = init_pointnet2msg2(jax.random.PRNGKey(42))
        held_src, held_tgt, _, _ = synth_pair(jax.random.PRNGKey(999),
                                              frames, cfg)
        # th=1.0 disables the SNN ratio filter: precision is then plain
        # mutual-NN accuracy, a much more discriminative probe than the
        # ratio-gated SMNN precision (random features pass the ratio test
        # on locally-smooth xyz projections)
        prec0, _ = match_precision(init_params, held_src, held_tgt, th=1.0)

        params, losses = train_corr(key, frames, cfg)
        assert losses.shape == (8,)
        # InfoNCE falls hard from ~ln(512) within a few steps
        assert losses[-1] < losses[0] - 1.0
        prec1, rate1 = match_precision(params, held_src, held_tgt, th=1.0)
        assert prec1 > prec0  # matching strictly improves (fixed seeds)
        assert rate1 > 0.05


class TestSaveLoad:
    def test_native_roundtrip(self, tmp_path):
        params = init_pointnet2msg2(jax.random.PRNGKey(7))
        path = str(tmp_path / "corr_model.pkl")
        save_corr_model(path, params)
        loaded = load_corr_model(path)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the loaded tree runs through the inference path
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 520, 3))
        y = apply_pointnet2msg2(loaded, x)
        assert y.shape == (1, 520, 64)


class TestMeshParallel:
    @pytest.mark.slow
    def test_mesh_training_matches_single_device(self, frames):
        """Batch-sharded training over the 8-device mesh is semantics-
        identical to single-device training: gradient all-reduce AND the
        BatchNorm batch moments (which reduce over every non-channel axis)
        both come out global under sharding propagation."""
        from reart_tpu.parallel import make_mesh

        cfg = CorrTrainConfig(steps=2, batch=8, n_points=128,
                              dispatch_chunk=2)
        key = jax.random.PRNGKey(0)
        p_single, l_single = train_corr(key, frames, cfg)
        mesh = make_mesh(8)
        p_mesh, l_mesh = train_corr(key, frames, cfg, mesh=mesh)
        # the FIRST loss is computed from identical params: it probes the
        # sharded forward + global-BN semantics exactly. Step 2 (and the
        # params after it) drift by fp reduction order amplified through
        # Adam/ReLU/max-pool nonlinearities — only trajectory-level
        # agreement is meaningful there. The bound must cover sharded-
        # reduction-order f32 noise (measured up to 1.5e-4 rtol) while
        # still catching the failure mode it guards: per-device (local)
        # BN moments at batch 8 / 8 devices are batch-1 moments, which
        # move the loss at the several-percent level.
        np.testing.assert_allclose(l_mesh[0], l_single[0], rtol=1e-3)
        np.testing.assert_allclose(l_mesh, l_single, rtol=0.05)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(p_mesh))


class TestBF16:
    def test_bf16_training_runs_and_tracks_f32(self, frames):
        """compute_dtype='bfloat16': f32 master weights, bf16 backbone pass.
        First-step loss lands near the f32 loss; training stays finite."""
        cfg32 = CorrTrainConfig(steps=2, batch=2, n_points=128,
                                dispatch_chunk=2)
        cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
        key = jax.random.PRNGKey(0)
        _, l32 = train_corr(key, frames, cfg32)
        p16, l16 = train_corr(key, frames, cfg16)
        assert np.isfinite(l16).all()
        np.testing.assert_allclose(l16[0], l32[0], rtol=0.05)
        # master weights stay f32
        for leaf in jax.tree_util.tree_leaves(p16):
            assert leaf.dtype == jnp.float32


class TestCheckpointResume:
    def test_resume_is_bit_identical(self, frames, tmp_path):
        """4 steps + resume to 8 == uninterrupted 8 (chunk-keyed RNG)."""
        ckpt = str(tmp_path / "train.ckpt")
        cfg4 = CorrTrainConfig(steps=4, batch=2, n_points=128,
                               dispatch_chunk=2, checkpoint_every=1)
        cfg8 = dataclasses.replace(cfg4, steps=8)
        key = jax.random.PRNGKey(0)
        p_full, l_full = train_corr(key, frames, cfg8)

        train_corr(key, frames, cfg4, checkpoint_path=ckpt)
        p_res, l_res = train_corr(key, frames, cfg8, checkpoint_path=ckpt)
        assert l_res.shape == (8,)
        np.testing.assert_array_equal(l_res, l_full)
        for a, b in zip(jax.tree_util.tree_leaves(p_full),
                        jax.tree_util.tree_leaves(p_res)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dispatch_watchdog_raises(self, frames, tmp_path, monkeypatch):
        """Inject the hang at the python level (the engine-test pattern):
        abandoning a thread stuck inside a REAL XLA compile aborts the
        process at teardown (pthread C++ unwind), so the fake chunk blocks
        on an Event we release after the assertion."""
        import threading

        import reart_tpu.train.corr as corr_mod

        release = threading.Event()

        def hanging_chunk(*a, **k):
            release.wait()
            raise AssertionError("released hang must not produce results")

        monkeypatch.setattr(corr_mod, "_train_chunk", hanging_chunk)
        cfg = CorrTrainConfig(steps=2, batch=2, n_points=128,
                              dispatch_chunk=2, dispatch_timeout=0.2)
        try:
            with pytest.raises(RuntimeError, match="wedged"):
                train_corr(jax.random.PRNGKey(0), frames, cfg,
                           checkpoint_path=str(tmp_path / "t.ckpt"))
        finally:
            release.set()  # let the abandoned daemon thread exit cleanly


class TestResampledRecipe:
    """cfg.resample=True: src/tgt are independent subsets of the frame and
    positives are radius-gated geometric NNs of gt_pos (train/corr.py)."""

    def test_gt_pos_tracks_tgt_within_jitter(self, frames):
        cfg = CorrTrainConfig(n_points=128, resample=False)  # identity
        src, tgt, gt_pos, _ = synth_pair(jax.random.PRNGKey(5), frames, cfg)
        # tgt = gt_pos + jitter*normal (then shared scale): bounded gap
        gap = np.linalg.norm(np.asarray(tgt) - np.asarray(gt_pos), axis=-1)
        assert gap.max() < 8 * cfg.jitter

    def test_resampled_subsets_are_disjoint_and_rigid(self, frames):
        cfg = CorrTrainConfig(n_points=300, resample=True, jitter=0.0,
                              max_angle=0.0, max_slide=0.0, global_angle=0.0,
                              global_slide=0.0, scale_jitter=0.0)
        src, tgt, gt_pos, _ = synth_pair(jax.random.PRNGKey(2), frames, cfg)
        src, tgt, gt_pos = map(np.asarray, (src, tgt, gt_pos))
        # with all motion off, gt_pos is src itself...
        np.testing.assert_allclose(gt_pos, src, atol=1e-6)
        # ...but tgt is a DIFFERENT subset of the cloud (frames have 700
        # points >= 2*300: subsets are disjoint)
        d = np.linalg.norm(src[:, None] - tgt[None], axis=-1)
        assert d.min(axis=1).max() > 1e-6  # no tgt point equals a src point

    def test_gated_ce_reduces_to_identity_on_exact_pairs(self, frames):
        """With jitter off and resample off, gt_pos == tgt, so the
        radius-gated loss must equal the diagonal-label loss exactly."""
        from reart_tpu.train.corr import corr_info_nce

        cfg = CorrTrainConfig(n_points=128, jitter=0.0, resample=False)
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        src, tgt, gt_pos, _ = synth_pair(jax.random.PRNGKey(3), frames, cfg)
        src, tgt, gt_pos = src[None], tgt[None], gt_pos[None]
        l_diag, _ = corr_info_nce(params, src, tgt, 0.07)
        l_gated, _ = corr_info_nce(params, src, tgt, 0.07, gt_pos=gt_pos,
                                   pos_radius=1e9, neg_radius=0.0)
        np.testing.assert_allclose(float(l_gated), float(l_diag), rtol=1e-6)

    def test_gated_ce_masks_near_positives(self, frames):
        """Points inside neg_radius of the true position must not be pushed
        away: widening neg_radius can only lower (or keep) the loss on the
        same inputs, and the loss stays finite with gradients."""
        from reart_tpu.train.corr import corr_info_nce

        cfg = CorrTrainConfig(n_points=128, resample=True)
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        src, tgt, gt_pos, _ = synth_pair(jax.random.PRNGKey(4), frames, cfg)
        src, tgt, gt_pos = src[None], tgt[None], gt_pos[None]

        def loss_at(neg_r):
            l, _ = corr_info_nce(params, src, tgt, 0.07, gt_pos=gt_pos,
                                 pos_radius=0.3, neg_radius=neg_r)
            return float(l)

        l_none, l_wide = loss_at(0.0), loss_at(0.2)
        assert np.isfinite(l_none) and np.isfinite(l_wide)
        assert l_wide <= l_none + 1e-6

        def scalar(p):
            l, _ = corr_info_nce(p, src, tgt, 0.07, gt_pos=gt_pos,
                                 pos_radius=0.3, neg_radius=0.05)
            return l

        g = jax.grad(scalar)(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))

    def test_custom_vjp_tail_matches_autodiff(self, frames):
        """The hand-written _nce_tail VJP (the 7.7x TPU backward fix,
        scripts/ab_ce_tail_vjp.py) must give the same loss AND param
        gradients as a pure-autodiff optax integer-label reference, for
        both the identity and the gated recipe."""
        import optax

        from reart_tpu.models.pointnet2 import apply_pointnet2msg2
        from reart_tpu.train.corr import corr_info_nce

        cfg = CorrTrainConfig(n_points=128, resample=True)
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        src, tgt, gt_pos, scale = jax.vmap(
            lambda k: synth_pair(k, frames, cfg))(
                jax.random.split(jax.random.PRNGKey(5), 2))
        tau = 0.07

        def reference_loss(p, gated):
            stats = []
            both = jnp.concatenate([src, tgt], 0)
            feats = apply_pointnet2msg2(p, both, bn_mode="batch",
                                        stats_out=stats)
            feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                             + 1e-8)
            f1, f2 = feats[:2], feats[2:]
            lg = jnp.einsum("bnd,bmd->bnm", f1, f2) / tau
            ce = optax.softmax_cross_entropy_with_integer_labels
            if not gated:
                labels = jnp.broadcast_to(jnp.arange(cfg.n_points),
                                          (2, cfg.n_points))
                return 0.5 * (jnp.mean(ce(lg, labels)) +
                              jnp.mean(ce(jnp.swapaxes(lg, 1, 2), labels)))
            d2 = jnp.sum((gt_pos[:, :, None] - tgt[:, None]) ** 2, -1)
            s = jnp.asarray(scale, jnp.float32)
            pos_r2 = (pos_radius * s)[:, None] ** 2
            neg_r2 = (neg_radius * s)[:, None, None] ** 2

            def one(lg, d2):
                pos = jnp.argmin(d2, -1)
                valid = (jnp.min(d2, -1) < pos_r2).astype(jnp.float32)
                is_pos = jax.nn.one_hot(pos, d2.shape[-1], dtype=jnp.bool_)
                near = (d2 < neg_r2) & ~is_pos
                lgm = jnp.where(near, -1e9, lg)
                return jnp.sum(ce(lgm, pos) * valid) / jnp.maximum(
                    jnp.sum(valid), 1.0)

            return 0.5 * (one(lg, d2) +
                          one(jnp.swapaxes(lg, 1, 2),
                              jnp.swapaxes(d2, 1, 2)))

        # (a) exact check at the tail boundary: custom VJP vs autodiff of
        # the identical tail math, grads wrt f1/f2 (same check the TPU A/B
        # ran; float-exact up to one reassociation)
        from reart_tpu.train.corr import _nce_dir, _nce_tail

        rng = np.random.RandomState(0)
        f1 = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
        f2 = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
        ip = jax.nn.one_hot(jnp.asarray(rng.randint(0, 64, (2, 64))), 64,
                            dtype=jnp.bool_)
        near = jnp.asarray(rng.rand(2, 64, 64) < 0.1) & ~ip
        valid = jnp.asarray((rng.rand(2, 64) < 0.7).astype(np.float32))
        inv_tau = jnp.float32(1.0 / tau)

        def tail_auto(a, c):
            lg = jnp.einsum("bnd,bmd->bnm", a, c) * inv_tau
            return 0.5 * (_nce_dir(lg, ip, near, valid) +
                          _nce_dir(jnp.swapaxes(lg, 1, 2), ip, near, valid))

        def tail_custom(a, c):
            return _nce_tail(a, c, inv_tau, ip, near, valid,
                             ip, near, valid)

        np.testing.assert_allclose(float(tail_custom(f1, f2)),
                                   float(tail_auto(f1, f2)), rtol=1e-6)
        ga = jax.grad(tail_auto, argnums=(0, 1))(f1, f2)
        gc = jax.grad(tail_custom, argnums=(0, 1))(f1, f2)
        np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(ga[0]),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(ga[1]),
                                   rtol=1e-4, atol=1e-7)

        # (b) end-to-end: loss values exact vs the optax reference; param
        # grads direction/scale-equal per tensor (two differently-scheduled
        # f32 backwards through BN reassociate — elementwise comparison is
        # noise-bound, cosine/norm catches any real factor/transpose bug).
        # pos_radius widened vs the training default: at 0.02 this sparse
        # gaussian fixture gates out EVERY match and the comparison would
        # degenerate to 0 == 0.
        pos_radius, neg_radius = 0.3, 0.5
        for gated in (False, True):
            ours = lambda p: corr_info_nce(
                p, src, tgt, tau, "float32",
                gt_pos if gated else None, pos_radius,
                neg_radius, scale if gated else None)[0]
            ref = lambda p: reference_loss(p, gated)
            if gated:
                assert float(ours(params)) > 0.0, "gated arm degenerated"
            np.testing.assert_allclose(float(ours(params)),
                                       float(ref(params)), rtol=1e-5)
            g_ours = jax.grad(ours)(params)
            g_ref = jax.grad(ref)(params)
            leaves_o = jax.tree_util.tree_leaves(g_ours)
            leaves_r = jax.tree_util.tree_leaves(g_ref)
            # conv biases feeding BatchNorm have exactly-zero true grads
            # (BN subtracts the batch mean): both backwards produce pure
            # float noise there — compare only tensors above a noise
            # floor set by the largest grad tensor
            gscale = max(np.linalg.norm(np.asarray(x, np.float64))
                         for x in leaves_r)
            for a, b in zip(leaves_o, leaves_r):
                a = np.asarray(a, np.float64).ravel()
                b = np.asarray(b, np.float64).ravel()
                na, nb = np.linalg.norm(a), np.linalg.norm(b)
                if nb < 1e-4 * gscale:
                    assert na < 1e-3 * gscale, (na, nb, gscale)
                    continue
                cos = float(a @ b / (na * nb + 1e-30))
                assert cos > 0.999, cos
                assert abs(na / nb - 1.0) < 2e-3, (na, nb)

    def test_gating_scales_with_pair_scale(self, frames):
        """The radius gates must follow the pair's scale_jitter factor:
        passing scale=s is exactly equivalent to folding s into the radii
        (so gating is consistent with the un-jittered geometry)."""
        from reart_tpu.train.corr import corr_info_nce

        cfg = CorrTrainConfig(n_points=128, resample=True)
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        src, tgt, gt_pos, _ = synth_pair(jax.random.PRNGKey(6), frames, cfg)
        s = 1.37
        src, tgt, gt_pos = src[None] * s, tgt[None] * s, gt_pos[None] * s
        l_scaled, _ = corr_info_nce(params, src, tgt, 0.07, gt_pos=gt_pos,
                                    pos_radius=0.05, neg_radius=0.1,
                                    scale=jnp.array([s]))
        l_folded, _ = corr_info_nce(params, src, tgt, 0.07, gt_pos=gt_pos,
                                    pos_radius=0.05 * s, neg_radius=0.1 * s)
        np.testing.assert_allclose(float(l_scaled), float(l_folded),
                                   rtol=1e-6)

    @pytest.mark.slow
    def test_resampled_training_improves_matching(self, frames):
        cfg = CorrTrainConfig(steps=8, batch=2, n_points=512,
                              dispatch_chunk=4, resample=True,
                              pos_radius=0.1, neg_radius=0.2)
        init_params = init_pointnet2msg2(jax.random.PRNGKey(42))
        held_src, held_tgt, held_gt, _ = synth_pair(
            jax.random.PRNGKey(999), frames, cfg)
        prec0, _ = match_precision(init_params, held_src, held_tgt, th=1.0,
                                   gt_pos=held_gt, pos_radius=0.1)
        params, losses = train_corr(jax.random.PRNGKey(0), frames, cfg)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        prec1, _ = match_precision(params, held_src, held_tgt, th=1.0,
                                   gt_pos=held_gt, pos_radius=0.1)
        assert prec1 > prec0


class TestSelfFinetune:
    """Pseudo-label mining + real-pair fine-tuning (round-3 density work,
    train/corr.py: mine_pair_labels / finetune_real_pairs)."""

    def test_mine_labels_identical_frames(self, frames):
        """Two identical frames: every point's feature matches itself
        exactly (ratio 0), so mining labels every point with its own
        position."""
        from reart_tpu.train.corr import FAR_POS, mine_pair_labels

        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        two = jnp.stack([frames[0], frames[0]])
        gt_pos = np.asarray(mine_pair_labels(params, two, th=0.9))
        assert gt_pos.shape == (1,) + tuple(frames[0].shape)
        labeled = gt_pos[0, :, 0] < FAR_POS / 2
        assert labeled.mean() > 0.95
        np.testing.assert_allclose(gt_pos[0][labeled],
                                   np.asarray(frames[0])[labeled], atol=1e-6)

    def test_mine_labels_unrelated_frames_sparse(self, frames):
        """Unrelated clouds mine (almost) no labels — the multi-sequence
        pooling boundary case stays safe."""
        from reart_tpu.train.corr import FAR_POS, mine_pair_labels

        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        rng = np.random.RandomState(7)
        other = jnp.asarray(rng.randn(*frames[0].shape).astype(np.float32))
        two = jnp.stack([frames[0], other])
        gt_pos = np.asarray(mine_pair_labels(params, two, th=0.9))
        assert (gt_pos[0, :, 0] < FAR_POS / 2).mean() < 0.2

    def test_finetune_runs_and_updates(self, frames):
        from reart_tpu.train.corr import finetune_real_pairs

        cfg = CorrTrainConfig(batch=2, n_points=128, dispatch_chunk=2)
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        out, losses = finetune_real_pairs(
            jax.random.PRNGKey(1), params, frames, cfg, steps=4, rounds=2)
        assert np.isfinite(np.asarray(losses)).all()
        # at least one weight tensor moved
        moved = any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 0
            for a, b in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(out)))
        assert moved

    def test_refine_mined_labels(self, frames):
        """_refine_mined_labels: unmatched rows stay FAR_POS; matched rows
        under a pure rigid motion are refined onto the CONTINUOUS targets
        (closer than the raw discrete matches); a refined run of
        finetune_real_pairs stays finite."""
        from reart_tpu.geometry.se3 import se3_exp_map
        from reart_tpu.train.corr import (FAR_POS, _refine_mined_labels,
                                          finetune_real_pairs)

        rng = np.random.RandomState(3)
        src = rng.rand(200, 3).astype(np.float32)
        tw = jnp.asarray([[0.1, -0.2, 0.15, 0.02, -0.03, 0.01]], jnp.float32)
        r_t = np.asarray(se3_exp_map(tw))[0]
        true_tgt = src @ r_t[:3, :3].T + r_t[:3, 3]
        # discrete matches: true target + per-point sampling noise
        noisy_tgt = true_tgt + rng.randn(200, 3).astype(np.float32) * 0.01
        gt = np.full((1, 200, 3), FAR_POS, np.float32)
        matched = rng.rand(200) < 0.7
        gt[0, matched] = noisy_tgt[matched]
        two = np.stack([src, src])  # frames arg only supplies src coords
        out = _refine_mined_labels(two, gt, k=16)
        assert (out[0, ~matched, 0] > FAR_POS / 2).all()
        err_raw = np.linalg.norm(gt[0, matched] - true_tgt[matched], axis=-1)
        err_ref = np.linalg.norm(out[0, matched] - true_tgt[matched], axis=-1)
        assert err_ref.mean() < 0.5 * err_raw.mean()

        cfg = CorrTrainConfig(batch=2, n_points=128, dispatch_chunk=2)
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        out_p, losses = finetune_real_pairs(
            jax.random.PRNGKey(1), params, frames, cfg, steps=2, rounds=1,
            refine_k=8)
        assert np.isfinite(np.asarray(losses)).all()
