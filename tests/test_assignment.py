"""Assignment solvers: native JV exactness + TPU auction quality."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from reart_tpu.ops.assignment import auction_lap, assignment_cost
from reart_tpu import native


def scipy_opt_cost(c):
    r, col = linear_sum_assignment(c)
    return c[r, col].sum()


class TestNativeLAP:
    def test_exact_vs_scipy(self, rng):
        c = rng.rand(3, 40, 40).astype(np.float32)
        out = native.lap_solve_batch(c)
        for k in range(3):
            ours = c[k][np.arange(40), out[k]].sum()
            np.testing.assert_allclose(ours, scipy_opt_cost(c[k]), rtol=1e-6)
            assert len(set(out[k].tolist())) == 40  # valid permutation

    def test_rectangular(self, rng):
        c = rng.rand(1, 10, 25).astype(np.float32)
        out = native.lap_solve_batch(c)
        np.testing.assert_allclose(
            c[0][np.arange(10), out[0]].sum(), scipy_opt_cost(c[0]), rtol=1e-6
        )

    def test_structured_cost(self, rng):
        # near-permutation cost (what point matching looks like late in a fit)
        n = 64
        perm = rng.permutation(n)
        c = rng.rand(n, n).astype(np.float32) + 5.0
        c[np.arange(n), perm] = rng.rand(n).astype(np.float32) * 0.01
        out = native.lap_solve_batch(c[None])[0]
        np.testing.assert_array_equal(out, perm)

    def test_thread_pool_matches_sequential(self, rng, monkeypatch):
        """REART_NATIVE_THREADS fans batch elements across a pool; results
        must be identical to the 1-thread loop (elements are independent)."""
        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        c = rng.rand(9, 48, 48).astype(np.float32)
        src = rng.rand(7, 40, 3).astype(np.float32)
        tgt = rng.rand(7, 40, 3).astype(np.float32)
        monkeypatch.setenv("REART_NATIVE_THREADS", "1")
        seq = native.lap_solve_batch(c)
        seq_pts = native.lap_solve_points(src, tgt)
        monkeypatch.setenv("REART_NATIVE_THREADS", "4")
        np.testing.assert_array_equal(native.lap_solve_batch(c), seq)
        np.testing.assert_array_equal(native.lap_solve_points(src, tgt),
                                      seq_pts)


class TestAuction:
    def test_quality_random(self, rng):
        c = rng.rand(2, 64, 64).astype(np.float32)
        out = np.asarray(auction_lap(jnp.asarray(c), eps_min=1e-5))
        for k in range(2):
            assert len(set(out[k].tolist())) == 64
            ours = c[k][np.arange(64), out[k]].sum()
            opt = scipy_opt_cost(c[k])
            assert ours <= opt + 64 * 1e-5 + 1e-4, (ours, opt)

    def test_quality_pointcloud_cost(self, rng):
        """Cost = pairwise sq distances between two noisy copies of a cloud —
        the actual workload shape."""
        n = 128
        x = rng.rand(n, 3).astype(np.float32)
        y = x[rng.permutation(n)] + 0.01 * rng.randn(n, 3).astype(np.float32)
        c = np.sum((x[:, None] - y[None]) ** 2, axis=-1)
        out = np.asarray(auction_lap(jnp.asarray(c[None]), eps_min=1e-6))[0]
        assert len(set(out.tolist())) == n
        ours = c[np.arange(n), out].sum()
        opt = scipy_opt_cost(c)
        assert ours <= opt * 1.01 + n * 1e-6, (ours, opt)

    def test_batched(self, rng):
        c = rng.rand(5, 32, 32).astype(np.float32)
        out = np.asarray(auction_lap(jnp.asarray(c)))
        assert out.shape == (5, 32)
        for k in range(5):
            assert len(set(out[k].tolist())) == 32

    def test_assignment_cost_helper(self, rng):
        c = rng.rand(2, 16, 16).astype(np.float32)
        out = auction_lap(jnp.asarray(c))
        total = np.asarray(assignment_cost(jnp.asarray(c), out))
        for k in range(2):
            expect = c[k][np.arange(16), np.asarray(out)[k]].sum()
            np.testing.assert_allclose(total[k], expect, rtol=1e-5)


class TestPallasSweepKernels:
    """Fused sweep kernels vs the jnp reference formulation (interpret mode)."""

    def _rand(self, b=2, n=256, m=1024, seed=0):
        rng = np.random.RandomState(seed)
        benefit = jnp.asarray(rng.randn(b, n, m).astype(np.float32))
        price = jnp.asarray(np.abs(rng.randn(b, m)).astype(np.float32))
        return benefit, price

    def test_row_top2_matches_jnp(self):
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.pallas_auction import row_top2_pallas

        benefit, price = self._rand()
        values = benefit - price[:, None, :]
        bv_ref = jnp.max(values, axis=-1)
        bj_ref = jnp.argmax(values, axis=-1).astype(np.int32)
        masked = jnp.where(
            bj_ref[..., None] == jnp.arange(values.shape[-1])[None, None, :],
            -jnp.inf, values)
        sv_ref = jnp.max(masked, axis=-1)
        with pltpu.force_tpu_interpret_mode():
            bv, sv, bj = row_top2_pallas(benefit, price)
        np.testing.assert_allclose(np.asarray(bv), np.asarray(bv_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sv), np.asarray(sv_ref), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(bj), np.asarray(bj_ref))

    def test_col_winner_matches_jnp(self):
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.pallas_auction import col_winner_max_pallas

        rng = np.random.RandomState(1)
        b, n, m = 2, 512, 1024
        bid = rng.randn(b, n).astype(np.float32)
        bid[rng.rand(b, n) < 0.3] = -np.inf  # non-bidders
        best_j = rng.randint(0, m, size=(b, n)).astype(np.int32)
        col_ids = jnp.arange(m)[None, None, :]
        bid_matrix = jnp.where(jnp.asarray(best_j)[..., None] == col_ids,
                               jnp.asarray(bid)[..., None], -jnp.inf)
        cb_ref = jnp.max(bid_matrix, axis=1)
        is_win = jnp.logical_and(bid_matrix == cb_ref[:, None, :],
                                 bid_matrix > -jnp.inf)
        cw_ref = jnp.argmax(is_win, axis=1).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            cb, cw = col_winner_max_pallas(jnp.asarray(bid),
                                           jnp.asarray(best_j), m)
        np.testing.assert_allclose(np.asarray(cb), np.asarray(cb_ref))
        got = np.asarray(cb_ref) > -np.inf
        np.testing.assert_array_equal(np.asarray(cw)[got],
                                      np.asarray(cw_ref)[got])

    def test_full_phase_kernel_path_matches_jnp(self):
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import _auction_phase

        rng = np.random.RandomState(2)
        benefit = jnp.asarray(-rng.rand(3, 256, 1024).astype(np.float32))
        price = jnp.zeros((3, 1024), jnp.float32)
        r_ref, p_ref = _auction_phase(benefit, price, 1e-2, 40,
                                      use_kernels=False)
        with pltpu.force_tpu_interpret_mode():
            r_k, p_k = _auction_phase(benefit, price, 1e-2, 40,
                                      use_kernels=True)
        np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_k))
        np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_k),
                                   rtol=1e-5, atol=1e-6)

    def test_resident_solve_matches_phase_loop(self):
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap

        rng = np.random.RandomState(3)
        cost = jnp.asarray(rng.rand(3, 64, 128).astype(np.float32))
        kw = dict(eps_min=1e-3, num_scales=2, scale_factor=10.0,
                  max_sweeps=200, return_price=True)
        perm_ref, price_ref = auction_lap(cost, use_resident=False, **kw)
        with pltpu.force_tpu_interpret_mode():
            perm_k, price_k = auction_lap(cost, use_resident=True, **kw)
        np.testing.assert_array_equal(np.asarray(perm_ref), np.asarray(perm_k))
        np.testing.assert_allclose(np.asarray(price_ref), np.asarray(price_k),
                                   rtol=1e-5, atol=1e-6)

    def test_resident_solve_warm_start_roundtrip(self):
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap

        rng = np.random.RandomState(4)
        cost = jnp.asarray(rng.rand(2, 32, 128).astype(np.float32))
        kw = dict(eps_min=1e-3, num_scales=1, scale_factor=10.0,
                  max_sweeps=200, return_price=True)
        # warm-started resident solve must match the jnp phase loop given
        # the same warm price input (matchings are deterministic per path)
        perm_ref, price1 = auction_lap(cost, use_resident=False, **kw)
        perm_j, price_j = auction_lap(cost, price=price1, use_resident=False,
                                      **kw)
        with pltpu.force_tpu_interpret_mode():
            perm_k, price_k = auction_lap(cost, price=price1,
                                          use_resident=True, **kw)
        np.testing.assert_array_equal(np.asarray(perm_j), np.asarray(perm_k))
        np.testing.assert_allclose(np.asarray(price_j), np.asarray(price_k),
                                   rtol=1e-5, atol=1e-6)


class TestResidentHBM:
    def test_hbm_solve_matches_phase_loop_multi_strip(self):
        """Strip-streaming resident solve (forced 2-strip) == jnp phase loop."""
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap
        from reart_tpu.ops.pallas_auction import auction_solve_resident_hbm

        rng = np.random.RandomState(5)
        cost = jnp.asarray(rng.rand(2, 64, 256).astype(np.float32))
        kw = dict(eps_min=1e-3, num_scales=2, scale_factor=10.0,
                  max_sweeps=200, return_price=True)
        perm_ref, price_ref = auction_lap(cost, use_resident=False, **kw)
        eps_list = (1e-2, 1e-3)
        with pltpu.force_tpu_interpret_mode():
            r2c, price_k = auction_solve_resident_hbm(
                -cost, jnp.zeros((2, 256), jnp.float32), eps_list, 200,
                ts=128)
        # same greedy completion as auction_lap
        values = -cost - price_k[:, None, :]
        fb = jnp.argmax(values, axis=-1).astype(jnp.int32)
        perm_k = jnp.where(r2c < 0, fb, r2c)
        np.testing.assert_array_equal(np.asarray(perm_ref), np.asarray(perm_k))
        np.testing.assert_allclose(np.asarray(price_ref), np.asarray(price_k),
                                   rtol=1e-5, atol=1e-6)

    def test_hbm_warm_start_matches(self):
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap
        from reart_tpu.ops.pallas_auction import auction_solve_resident_hbm

        rng = np.random.RandomState(6)
        cost = jnp.asarray(rng.rand(2, 32, 384).astype(np.float32))
        kw = dict(eps_min=1e-3, num_scales=1, scale_factor=10.0,
                  max_sweeps=200, return_price=True)
        perm_ref, price1 = auction_lap(cost, use_resident=False, **kw)
        perm_j, price_j = auction_lap(cost, price=price1, use_resident=False,
                                      **kw)
        with pltpu.force_tpu_interpret_mode():
            r2c, price_k = auction_solve_resident_hbm(
                -cost, price1, (1e-3,), 200, ts=128)
        values = -cost - price_k[:, None, :]
        fb = jnp.argmax(values, axis=-1).astype(jnp.int32)
        perm_k = jnp.where(r2c < 0, fb, r2c)
        np.testing.assert_array_equal(np.asarray(perm_j), np.asarray(perm_k))
        np.testing.assert_allclose(np.asarray(price_j), np.asarray(price_k),
                                   rtol=1e-5, atol=1e-6)

    def test_hbm_gating(self):
        from reart_tpu.ops.pallas_auction import (
            RESIDENT_MAX_ELEMS,
            _hbm_strip_size,
            resident_hbm_available,
        )

        # sizes at or below the VMEM-resident bound never take the HBM path
        assert not resident_hbm_available(1024, 1024)
        for n, m in ((2048, 2048), (4096, 4096), (2048, 4096)):
            ts = _hbm_strip_size(n, m)
            assert ts % 128 == 0 and m % ts == 0 and n * ts * 4 <= 4 << 20
            assert n * m > RESIDENT_MAX_ELEMS


class TestBandedAuction:
    """Banded points-level solver (interpret mode): quality on geometric
    mid-fit-like problems must match the engine's dense sweep-bounded path."""

    def _problem(self, b=2, n=256, noise=0.05, seed=0):
        rng = np.random.RandomState(seed)
        src = rng.randn(b, n, 3).astype(np.float32)
        tgt = (src + noise * rng.randn(b, n, 3)).astype(np.float32)
        return src, tgt

    def test_quality_vs_scipy(self):
        from scipy.optimize import linear_sum_assignment

        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap_points

        src, tgt = self._problem()
        with pltpu.force_tpu_interpret_mode():
            r2c = np.asarray(auction_lap_points(
                jnp.asarray(src), jnp.asarray(tgt), band=128, max_sweeps=200))
        b, n = r2c.shape
        assert ((0 <= r2c) & (r2c < n)).all()
        for i in range(b):
            cost = np.sqrt(((src[i][:, None] - tgt[i][None]) ** 2).sum(-1))
            r, c = linear_sum_assignment(cost)
            opt = cost[r, c].sum()
            got = cost[np.arange(n), r2c[i]].sum()
            # band-restricted + sweep-bounded: same tolerance class as the
            # dense engine path (whose duplicates make cost non-permutation)
            assert got < 1.4 * opt, (i, got, opt)

    def test_full_band_near_exact(self):
        """With the window covering all columns the band restriction is
        gone; converged solves should sit within the epsilon bound."""
        from scipy.optimize import linear_sum_assignment

        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.pallas_auction import auction_solve_banded

        rng = np.random.RandomState(3)
        b, n = 2, 64
        src = rng.randn(b, n, 3).astype(np.float32)
        tgt = (src + 0.03 * rng.randn(b, n, 3)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            r2c, _ = auction_solve_banded(
                jnp.asarray(src), jnp.transpose(jnp.asarray(tgt), (0, 2, 1)),
                jnp.zeros((b, n), jnp.float32),
                eps_list=(5e-3, 1e-4), max_sweeps=2000, w=n, tile=8)
        r2c = np.asarray(r2c)
        for i in range(b):
            cost = np.sqrt(((src[i][:, None] - tgt[i][None]) ** 2).sum(-1))
            r, c = linear_sum_assignment(cost)
            opt = cost[r, c].sum()
            got = cost[np.arange(n), r2c[i]].sum()
            assert len(np.unique(r2c[i])) == n  # converged: true permutation
            assert got <= opt + n * 1e-4 * 2 + 1e-4, (i, got, opt)

    def test_phase_carryover_near_exact(self):
        """Round 4: epsilon-phase carryover (unseat only eps-CS violators at
        each phase start) must keep the SAME n*eps optimality bound as the
        classical per-phase restart — both arms converge to permutations
        within the final-epsilon bound on a full-band problem."""
        from scipy.optimize import linear_sum_assignment

        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.pallas_auction import auction_solve_banded

        rng = np.random.RandomState(11)
        b, n = 2, 64
        src = rng.randn(b, n, 3).astype(np.float32)
        tgt = (src + 0.03 * rng.randn(b, n, 3)).astype(np.float32)
        args = (jnp.asarray(src), jnp.transpose(jnp.asarray(tgt), (0, 2, 1)),
                jnp.zeros((b, n), jnp.float32))
        kw = dict(eps_list=(1e-2, 1e-3, 1e-4), max_sweeps=2000, w=n, tile=8)
        with pltpu.force_tpu_interpret_mode():
            r_carry, _ = auction_solve_banded(*args, carry=True, **kw)
            r_restart, _ = auction_solve_banded(*args, carry=False, **kw)
        for i in range(b):
            cost = np.sqrt(((src[i][:, None] - tgt[i][None]) ** 2).sum(-1))
            r, c = linear_sum_assignment(cost)
            opt = cost[r, c].sum()
            for r2c in (np.asarray(r_carry)[i], np.asarray(r_restart)[i]):
                assert len(np.unique(r2c)) == n  # converged permutation
                got = cost[np.arange(n), r2c].sum()
                assert got <= opt + n * 1e-4 * 2 + 1e-4, (i, got, opt)

    def test_group_invariance(self):
        """group=1 and group=B must produce identical matchings/prices
        (padding rows are dropped; per-element math is independent)."""
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.pallas_auction import auction_solve_banded

        rng = np.random.RandomState(5)
        b, n = 3, 128
        src = rng.randn(b, n, 3).astype(np.float32)
        tgt = (src + 0.05 * rng.randn(b, n, 3)).astype(np.float32)
        args = (jnp.asarray(src), jnp.transpose(jnp.asarray(tgt), (0, 2, 1)),
                jnp.zeros((b, n), jnp.float32))
        kw = dict(eps_list=(5e-3, 1e-4), max_sweeps=150, w=128, tile=16)
        with pltpu.force_tpu_interpret_mode():
            r1, p1 = auction_solve_banded(*args, group=1, **kw)
            r2, p2 = auction_solve_banded(*args, group=2, **kw)  # pads to 4
            r3, p3 = auction_solve_banded(*args, group=3, **kw)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r3))
        # group=2 pads B=3 to 4: prices must come back pad-free and equal
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p3), rtol=1e-6)

    def test_morton_sort_roundtrip(self):
        """row_to_col indices come back in ORIGINAL index space."""
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap_points

        rng = np.random.RandomState(1)
        b, n = 1, 128
        src = rng.randn(b, n, 3).astype(np.float32)
        perm = rng.permutation(n)
        tgt = src[:, perm] + 1e-4  # target = permuted copy
        with pltpu.force_tpu_interpret_mode():
            r2c = np.asarray(auction_lap_points(
                jnp.asarray(src), jnp.asarray(tgt), band=128, max_sweeps=500))
        # each row must find its own (permuted) copy
        inv = np.argsort(perm)
        assert (r2c[0] == inv[np.arange(n)]).mean() > 0.95

    def test_hilbert_curve_roundtrip(self):
        """The Hilbert-sorted path must also return matchings in ORIGINAL
        index space (permutation recovery on a permuted copy)."""
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap_points

        rng = np.random.RandomState(6)
        b, n = 1, 128
        src = rng.randn(b, n, 3).astype(np.float32)
        perm = rng.permutation(n)
        tgt = src[:, perm] + 1e-4
        with pltpu.force_tpu_interpret_mode():
            r2c = np.asarray(auction_lap_points(
                jnp.asarray(src), jnp.asarray(tgt), band=128, max_sweeps=500,
                curve="hilbert"))
        inv = np.argsort(perm)
        assert (r2c[0] == inv[np.arange(n)]).mean() > 0.95

    def test_nn_recenter_roundtrip(self):
        """The NN-guided row order must still return a valid matching in
        ORIGINAL index space (permutation recovery on a permuted copy)."""
        from jax.experimental.pallas import tpu as pltpu

        from reart_tpu.ops.assignment import auction_lap_points

        rng = np.random.RandomState(4)
        b, n = 1, 128
        src = rng.randn(b, n, 3).astype(np.float32)
        perm = rng.permutation(n)
        tgt = src[:, perm] + 1e-4
        with pltpu.force_tpu_interpret_mode():
            r2c = np.asarray(auction_lap_points(
                jnp.asarray(src), jnp.asarray(tgt), band=128, max_sweeps=500,
                nn_recenter=True))
        inv = np.argsort(perm)
        assert (r2c[0] == inv[np.arange(n)]).mean() > 0.95

    def test_gating(self):
        from reart_tpu.ops.assignment import banded_points_available

        assert not banded_points_available(1024, 1024, 512)  # resident wins
        assert not banded_points_available(2048, 2048, 0)    # disabled
        assert not banded_points_available(2048, 1024, 512)  # rectangular


class TestLapPoints:
    def test_points_solver_matches_scipy(self, rng=None):
        from scipy.optimize import linear_sum_assignment

        from reart_tpu.native import lap_solve_points

        rng = np.random.RandomState(8)
        src = rng.randn(3, 60, 3).astype(np.float32)
        tgt = rng.randn(3, 80, 3).astype(np.float32)
        perm = lap_solve_points(src, tgt)
        for k in range(3):
            cost = np.sqrt(((src[k][:, None] - tgt[k][None]) ** 2).sum(-1))
            r, c = linear_sum_assignment(cost)
            ours = cost[np.arange(60), perm[k]].sum()
            assert len(np.unique(perm[k])) == 60  # valid matching
            np.testing.assert_allclose(ours, cost[r, c].sum(), rtol=1e-5)

    def test_warm_duals_preserve_optimality(self):
        """SSP from ARBITRARY initial column duals stays exact (the property
        the TPU-auction warm start relies on)."""
        from scipy.optimize import linear_sum_assignment

        from reart_tpu.native import lap_solve_points

        rng = np.random.RandomState(9)
        src = rng.randn(2, 50, 3).astype(np.float32)
        tgt = rng.randn(2, 50, 3).astype(np.float32)
        for scale in (0.0, 0.5, 10.0):
            v = (scale * rng.randn(2, 50)).astype(np.float32)
            perm = lap_solve_points(src, tgt, v_init=v)
            for k in range(2):
                cost = np.sqrt(
                    ((src[k][:, None] - tgt[k][None]) ** 2).sum(-1))
                r, c = linear_sum_assignment(cost)
                assert len(np.unique(perm[k])) == 50
                np.testing.assert_allclose(
                    cost[np.arange(50), perm[k]].sum(), cost[r, c].sum(),
                    rtol=1e-5)

    def test_compute_ass_err_matches_reference_formula(self):
        from scipy.optimize import linear_sum_assignment

        from reart_tpu.metrics import compute_ass_err

        rng = np.random.RandomState(10)
        src = rng.randn(4, 40, 3).astype(np.float32)
        tgt = src + 0.1 * rng.randn(4, 40, 3).astype(np.float32)
        got = compute_ass_err(src, tgt)
        errs = []
        for k in range(4):
            cost = np.sqrt(((src[k][:, None] - tgt[k][None]) ** 2).sum(-1))
            r, c = linear_sum_assignment(cost)
            errs.append(((src[k][r] - tgt[k][c]) ** 2).sum(-1))
        ref = np.concatenate(errs).mean()  # reference: mean over all pairs
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_rectangular_warm_duals_ignored_stays_exact():
    """For n < m warm duals would bias the column-subset choice, so the
    native solver must ignore them (code-review finding)."""
    from scipy.optimize import linear_sum_assignment

    from reart_tpu.native import lap_solve_points

    rng = np.random.RandomState(11)
    src = rng.randn(2, 30, 3).astype(np.float32)
    tgt = rng.randn(2, 70, 3).astype(np.float32)
    v = (10.0 * rng.randn(2, 70)).astype(np.float32)  # adversarial duals
    perm = lap_solve_points(src, tgt, v_init=v)
    for k in range(2):
        cost = np.sqrt(((src[k][:, None] - tgt[k][None]) ** 2).sum(-1))
        r, c = linear_sum_assignment(cost)
        np.testing.assert_allclose(
            cost[np.arange(30), perm[k]].sum(), cost[r, c].sum(), rtol=1e-5)


def test_lap_points_scipy_fallback(monkeypatch):
    """lap_solve_points must stay exact when the native library is absent."""
    import reart_tpu.native as native
    from scipy.optimize import linear_sum_assignment

    monkeypatch.setattr(native, "get_lib", lambda: None)
    rng = np.random.RandomState(12)
    src = rng.randn(2, 25, 3).astype(np.float32)
    tgt = rng.randn(2, 40, 3).astype(np.float32)
    perm = native.lap_solve_points(src, tgt, v_init=np.zeros((2, 40), np.float32))
    for k in range(2):
        cost = np.sqrt(((src[k][:, None] - tgt[k][None]) ** 2).sum(-1))
        r, c = linear_sum_assignment(cost)
        np.testing.assert_allclose(
            cost[np.arange(25), perm[k]].sum(), cost[r, c].sum(), rtol=1e-5)


def test_resolve_band_auto():
    from reart_tpu.ops.assignment import resolve_band

    assert resolve_band(512, 4096) == 512      # explicit wins
    assert resolve_band(0, 4096) == 0          # disabled passes through
    assert resolve_band(-1, 1024) == 512       # clamped low
    assert resolve_band(-1, 2048) == 512       # robot faithful: validated 512
    assert resolve_band(-1, 4096) == 1024      # sapien ds1: measured-better
    # 8192 x 1024 band = 32 MB > the 16 MB scratch gate: auto steps down
    # to 512 (16 MB) instead of silently losing the banded path to dense
    assert resolve_band(-1, 8192) == 512
    for n in (1024, 2048, 4096, 8192):
        w = resolve_band(-1, n)
        assert w % 128 == 0 and n * w * 4 <= 16 * 1024 * 1024


class TestCurveKeys:
    def test_hilbert_bijective_and_adjacent(self):
        """Over ALL cells of a 8^3 grid the Hilbert index must be a
        bijection onto [0, 512) and consecutive curve positions must be
        face-adjacent (L1 distance exactly 1) — the property Morton lacks
        and the reason the banded LAP sorts along a space-filling curve."""
        from reart_tpu.ops.assignment import _hilbert_index

        bits = 3
        n = 1 << bits
        g = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"),
                     axis=-1).reshape(-1, 3).astype(np.uint32)
        keys = np.asarray(_hilbert_index(jnp.asarray(g), bits))
        assert np.array_equal(np.sort(keys), np.arange(n ** 3))  # bijection
        order = np.argsort(keys)
        steps = np.abs(np.diff(g[order].astype(np.int64), axis=0)).sum(1)
        assert (steps == 1).all()  # every curve step is face-adjacent

    def test_morton_not_adjacent(self):
        """Sanity: Morton genuinely lacks the adjacency property (else the
        Hilbert upgrade would be pointless)."""
        from reart_tpu.ops.assignment import _spread_bits

        n = 8
        g = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"),
                     axis=-1).reshape(-1, 3).astype(np.uint32)
        gg = jnp.asarray(g)
        keys = np.asarray(_spread_bits(gg[..., 0])
                          | (_spread_bits(gg[..., 1]) << 1)
                          | (_spread_bits(gg[..., 2]) << 2))
        order = np.argsort(keys)
        steps = np.abs(np.diff(g[order].astype(np.int64), axis=0)).sum(1)
        assert (steps > 1).any()
