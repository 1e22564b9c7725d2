"""Tests for descriptor matching (SNN / SMNN / mutual-NN) against the
reference's torch implementation re-run as an oracle (utils/flow_utils.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reart_tpu.flow import (
    build_flow_context,
    compute_corr_masks,
    find_mutual_correspondences,
    match_smnn,
    match_snn,
)
from reart_tpu.train.engine import FAR


def torch_match_snn(desc1, desc2, th=0.9):
    dm = torch.cdist(desc1, desc2)
    vals, idxs_in_2 = torch.topk(dm, 2, dim=1, largest=False)
    ratio = vals[:, 0] / vals[:, 1]
    mask = ratio <= th
    idxs_in1 = torch.arange(0, idxs_in_2.size(0))[mask]
    idxs_in_2 = idxs_in_2[:, 0][mask]
    return ratio[mask], torch.stack([idxs_in1, idxs_in_2], dim=1)


def torch_match_smnn(desc1, desc2, th=0.9):
    """The reference's mutual filter (flow_utils.py:48-100), condensed."""
    dists1, idx1 = torch_match_snn(desc1, desc2, th)
    dists2, idx2 = torch_match_snn(desc2, desc1, th)
    if len(dists1) == 0 or len(dists2) == 0:
        return torch.empty(0), torch.empty(0, 2, dtype=torch.long)
    idx2 = idx2.flip(1)
    idxs_dm = torch.cdist(idx1.float(), idx2.float(), p=1.0)
    m1 = idxs_dm.min(dim=1)[0] < 1e-8
    m2 = idxs_dm.min(dim=0)[0] < 1e-8
    good1, good2 = idx1[m1], idx2[m2]
    d1, d2 = dists1[m1], dists2[m2]
    o1 = torch.argsort(good1[:, 0])
    o2 = torch.argsort(good2[:, 0])
    return torch.max(d1[o1], d2[o2]), good1[o1]


@pytest.fixture
def descs():
    rng = np.random.RandomState(0)
    d1 = rng.randn(64, 16).astype(np.float32)
    # half the rows of desc2 are perturbed copies -> strong matches
    d2 = rng.randn(64, 16).astype(np.float32)
    d2[:32] = d1[:32] + 0.01 * rng.randn(32, 16)
    return d1, d2


class TestSnn:
    def test_matches_reference(self, descs):
        d1, d2 = descs
        ratio, idx, valid = match_snn(jnp.asarray(d1), jnp.asarray(d2))
        ref_dists, ref_idx = torch_match_snn(torch.from_numpy(d1), torch.from_numpy(d2))
        ours_src = np.nonzero(np.asarray(valid))[0]
        np.testing.assert_array_equal(ours_src, ref_idx[:, 0].numpy())
        np.testing.assert_array_equal(np.asarray(idx)[ours_src], ref_idx[:, 1].numpy())
        np.testing.assert_allclose(np.asarray(ratio)[ours_src], ref_dists.numpy(), rtol=3e-3, atol=1e-3)


class TestSmnn:
    def test_matches_reference(self, descs):
        d1, d2 = descs
        dists, idx, valid = match_smnn(jnp.asarray(d1), jnp.asarray(d2))
        ref_dists, ref_idx = torch_match_smnn(torch.from_numpy(d1), torch.from_numpy(d2))
        ours_src = np.nonzero(np.asarray(valid))[0]
        np.testing.assert_array_equal(ours_src, ref_idx[:, 0].numpy())
        np.testing.assert_array_equal(np.asarray(idx)[ours_src], ref_idx[:, 1].numpy())
        np.testing.assert_allclose(
            np.asarray(dists)[ours_src], ref_dists.numpy(), rtol=3e-3, atol=1e-3
        )

    def test_identical_descriptors_all_match(self):
        rng = np.random.RandomState(1)
        d = rng.randn(32, 8).astype(np.float32)
        _, idx, valid = match_smnn(jnp.asarray(d), jnp.asarray(d), th=0.99)
        assert bool(np.all(np.asarray(valid)))
        np.testing.assert_array_equal(np.asarray(idx), np.arange(32))


class TestMutualNN:
    def test_simple(self):
        nns01 = jnp.asarray([1, 0, 2])
        nns10 = jnp.asarray([1, 0, 0])
        tgt, valid = find_mutual_correspondences(nns01, nns10)
        # 0<->1 mutual, 1<->0 mutual, 2->2 but 2->0: not mutual
        np.testing.assert_array_equal(np.asarray(valid), [True, True, False])


class TestFlowContext:
    def test_build_from_gt_identity_features(self):
        """With positions as descriptors, matching recovers near-identity
        correspondences for slowly-moving clouds."""
        rng = np.random.RandomState(2)
        t, n = 4, 128
        base = rng.randn(n, 3).astype(np.float32)
        pcs = np.stack([base + 0.01 * i for i in range(t)])
        ctx = build_flow_context(pcs, extract_fn=lambda x: x, matching="smnn")
        assert ctx.pc_ref.shape[0] == t - 1
        # all real anchors should carry flow ~= 0.01 per axis
        real = np.asarray(ctx.pc_ref[0, :, 0]) < FAR / 2
        flows = np.asarray(ctx.flow_ref[0])[real]
        np.testing.assert_allclose(flows, 0.01, atol=1e-5)

    def test_corr_masks_shapes(self):
        rng = np.random.RandomState(3)
        pcs = rng.randn(3, 64, 3).astype(np.float32)
        idx, valid = compute_corr_masks(pcs, lambda x: x, matching="mnn")
        assert idx.shape == (2, 64) and valid.shape == (2, 64)


class TestDisplacementGate:
    def test_drops_outlier_keeps_inliers(self):
        """An injected cross-body jump is dropped; coherent small motions
        survive (flow.gate_matches_by_displacement, round-3 density work)."""
        from reart_tpu.flow import gate_matches_by_displacement

        rng = np.random.RandomState(0)
        n = 256
        pc0 = rng.randn(n, 3).astype(np.float32)
        pc1 = pc0 + 0.01  # coherent small motion, identity correspondence
        pcs = np.stack([pc0, pc1])
        tgt_idx = np.arange(n)[None]           # (1, N)
        valid = np.ones((1, n), bool)
        # corrupt one match: point 7 "matches" the farthest-away point
        far = np.argmax(np.linalg.norm(pc1 - pc0[7], axis=-1))
        tgt_idx = tgt_idx.copy()
        tgt_idx[0, 7] = far
        out = gate_matches_by_displacement(pcs, tgt_idx, valid, k_mad=6.0)
        assert not out[0, 7]
        assert out[0].sum() == n - 1  # nothing else dropped

    def test_gate_off_by_default_in_build(self):
        """build_flow_context(disp_gate=0) must not alter matches (parity
        default)."""
        from reart_tpu.flow import build_flow_context as bfc

        rng = np.random.RandomState(2)
        base = rng.randn(64, 3).astype(np.float32)
        pcs = np.stack([base, base + 0.01])
        a = bfc(pcs, extract_fn=lambda x: x)
        b = bfc(pcs, extract_fn=lambda x: x, disp_gate=0.0)
        np.testing.assert_array_equal(np.asarray(a.pc_ref),
                                      np.asarray(b.pc_ref))


class TestRigidRefine:
    """refine_targets_local_rigid (round-3): local trimmed-Procrustes target
    refinement must beat raw discrete targets on noisy matches and stay
    robust across a two-part motion boundary."""

    def _two_part(self, n=400, noise=0.01, seed=0):
        rng = np.random.RandomState(seed)
        src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        part = (src[:, 0] > 0).astype(int)
        a = 0.4
        rot = np.array([[np.cos(a), -np.sin(a), 0],
                        [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32)
        true = np.where(part[:, None] == 1, src @ rot.T + [0.1, 0, 0],
                        src + [0, 0.05, 0]).astype(np.float32)
        # observed target = true position + sampling noise (the discrete
        # next-frame sample is a DIFFERENT surface discretization)
        obs = true + noise * rng.randn(n, 3).astype(np.float32)
        return src, true, obs

    def test_reduces_target_error(self):
        from reart_tpu.flow import refine_targets_local_rigid

        src, true, obs = self._two_part()
        ref = refine_targets_local_rigid(src, obs, k=16)
        err_raw = np.linalg.norm(obs - true, axis=-1).mean()
        err_ref = np.linalg.norm(ref - true, axis=-1).mean()
        assert err_ref < 0.5 * err_raw, (err_raw, err_ref)

    def test_exact_on_noise_free_rigid(self):
        from reart_tpu.flow import refine_targets_local_rigid

        src, true, obs = self._two_part(noise=0.0)
        ref = refine_targets_local_rigid(src, true, k=12)
        np.testing.assert_allclose(ref, true, atol=1e-4)

    def test_tiny_input_passthrough(self):
        from reart_tpu.flow import refine_targets_local_rigid

        src = np.zeros((3, 3), np.float32)
        tgt = np.ones((3, 3), np.float32)
        np.testing.assert_array_equal(
            refine_targets_local_rigid(src, tgt), tgt)

    def test_flow_context_wiring(self):
        from reart_tpu.flow import build_flow_context

        src, true, obs = self._two_part(n=128)
        pcs = np.stack([src, src])  # 2 frames, same sample
        n = src.shape[0]
        corr = (np.arange(n)[None], np.ones((1, n), bool))
        raw = build_flow_context(pcs, corr=corr)
        ref = build_flow_context(pcs, corr=corr, rigid_refine_k=8)
        assert raw.pc_ref.shape == ref.pc_ref.shape
        # identity matching on identical frames: zero flow either way
        np.testing.assert_allclose(np.asarray(ref.flow_ref), 0.0, atol=1e-4)


class TestCycleChain:
    """flow.cycle_chain_matches: vote + densify over frame triples."""

    def _fixture(self):
        rng = np.random.RandomState(0)
        n, d = 12, 16
        base = np.zeros((n, d), np.float32)
        base[:, :n] = 10.0 * np.eye(n)
        feats = np.stack([base + 0.001 * rng.randn(n, d).astype(np.float32)
                          for _ in range(3)])  # identity matches, all pairs
        pts = np.zeros((n, 3), np.float32)
        pts[:, 0] = np.arange(n)  # spacing 1.0 >> close_r
        pcs = np.stack([pts] * 3)
        j = np.tile(np.arange(n), (2, 1))
        v = np.ones((2, n), bool)
        return feats, pcs, j, v

    def test_densify_fills_holes_both_pairs(self):
        from reart_tpu.flow import cycle_chain_matches

        feats, pcs, j, v = self._fixture()
        v[0, 5] = False  # hole at pair 0
        v[1, 6] = False  # hole at pair 1
        j2, v2 = cycle_chain_matches(pcs, feats, j, v, close_r=0.1)
        assert v2.all()
        np.testing.assert_array_equal(j2, j)  # inferred matches = identity

    def test_drops_contradicted_match_keeps_confirmed(self):
        from reart_tpu.flow import cycle_chain_matches

        feats, pcs, j, v = self._fixture()
        j[0, 7] = 8  # wrong: composition lands at x=8, skip says x=7
        j2, v2 = cycle_chain_matches(pcs, feats, j, v, close_r=0.1)
        # (1, 8) broke that chain too but CLOSES its own (8->8->8): kept
        assert v2[1, 8]
        # every identity match elsewhere survives
        assert v2[0, :7].all() and v2[0, 9:].all() and v2[1].all()
        # the wrong match is either dropped or replaced by the verified
        # inferred identity match (skip 7->7 composed with pair-1 inverse)
        assert (not v2[0, 7]) or j2[0, 7] == 7

    def test_short_sequence_passthrough(self):
        from reart_tpu.flow import cycle_chain_matches

        feats, pcs, j, v = self._fixture()
        j2, v2 = cycle_chain_matches(pcs[:2], feats[:2], j[:1], v[:1])
        np.testing.assert_array_equal(j2, j[:1])
        np.testing.assert_array_equal(v2, v[:1])
