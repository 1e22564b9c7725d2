"""End-to-end tests of the fit engine on a synthetic 2-part articulated toy.

Checks capability, not RNG parity: the relaxation fit must drive the recon
loss down and recover an approximately-rigid 2-part motion; the assignment
phase must run fully compiled (no host LAP) and keep improving the energy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reart_tpu.models.base_model import base_forward, init_base_params
from reart_tpu.train import FitConfig, FlowContext, fit_base


def make_toy(t_frames=4, n=256, seed=0):
    """Two rigid boxes; the second rotates about the z-axis hinge at x=0."""
    rng = np.random.RandomState(seed)
    half = n // 2
    left = rng.uniform([-1.0, -0.25, -0.25], [-0.2, 0.25, 0.25], (half, 3))
    right = rng.uniform([0.2, -0.25, -0.25], [1.0, 0.25, 0.25], (half, 3))
    cano = np.concatenate([left, right]).astype(np.float32)
    labels = np.concatenate([np.zeros(half), np.ones(half)]).astype(np.int32)

    frames = []
    for i in range(1, t_frames):
        ang = 0.3 * i
        rot = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            dtype=np.float32,
        )
        moved = cano.copy()
        moved[half:] = moved[half:] @ rot.T
        frames.append(moved)
    return cano, np.stack(frames), labels


@pytest.fixture(scope="module")
def toy():
    return make_toy()


def test_fit_base_recon_phase(toy):
    cano, pc_list, _ = toy
    key = jax.random.PRNGKey(0)
    params = init_base_params(key, num_parts=4, pose_len=pc_list.shape[0])
    cfg = FitConfig(n_iter=200, use_assign_loss=False, start_tau=2.0, end_tau=1.0)
    fitted, hist = fit_base(key, params, cfg, cano, pc_list)
    assert hist["total_loss"].shape == (200,)
    first, last = float(hist["total_loss"][0]), float(hist["total_loss"][-1])
    assert last < 0.25 * first, (first, last)


def test_fit_base_assign_phase(toy):
    cano, pc_list, _ = toy
    key = jax.random.PRNGKey(1)
    params = init_base_params(key, num_parts=4, pose_len=pc_list.shape[0])
    cfg = FitConfig(
        n_iter=120, use_assign_loss=True, assign_iter=60, assign_gap=5,
        downsample=4, start_tau=2.0, end_tau=1.0,
    )
    fitted, hist = fit_base(key, params, cfg, cano, pc_list)
    assert hist["total_loss"].shape == (120,)
    # assignment phase populated and decreasing overall
    ass = hist["ass_loss"][60:]
    assert float(ass[0]) > 0.0
    assert float(ass[-1]) < float(ass[0])
    # recon term inactive in assignment phase (robot config: not always_recon)
    assert float(hist["recon_loss"][61]) == 0.0


def test_fit_base_with_flow_ctx(toy):
    cano, pc_list, labels = toy
    key = jax.random.PRNGKey(2)
    # perfect flow supervision from GT correspondences on consecutive frames
    complete = np.concatenate([cano[None], pc_list], axis=0)
    pc_refs = [complete[i] for i in range(complete.shape[0] - 1)]
    flow_refs = [complete[i + 1] - complete[i] for i in range(complete.shape[0] - 1)]
    flow_ctx = FlowContext.from_lists(pc_refs, flow_refs)
    params = init_base_params(key, num_parts=4, pose_len=pc_list.shape[0])
    cfg = FitConfig(n_iter=150, use_flow_loss=True, start_tau=2.0, end_tau=1.0)
    fitted, hist = fit_base(key, params, cfg, cano, pc_list, flow_ctx=flow_ctx)
    assert float(hist["flow_loss"][0]) > 0.0
    assert float(hist["total_loss"][-1]) < 0.5 * float(hist["total_loss"][0])


def test_fit_recovers_two_parts(toy):
    """After a full fit the dominant two predicted parts should align with the
    GT left/right split (Rand-index style check via best-part purity)."""
    cano, pc_list, labels = toy
    key = jax.random.PRNGKey(3)
    params = init_base_params(key, num_parts=4, pose_len=pc_list.shape[0])
    cfg = FitConfig(
        n_iter=300, use_assign_loss=True, assign_iter=150, assign_gap=5,
        start_tau=2.0, end_tau=0.5,
    )
    fitted, _ = fit_base(key, params, cfg, cano, pc_list)
    _, seg, _ = base_forward(fitted, jnp.asarray(cano), key, tau=0.5)
    seg = np.asarray(seg)
    # each GT part should be dominated by a single predicted label
    purity = []
    for g in (0, 1):
        _, counts = np.unique(seg[labels == g], return_counts=True)
        purity.append(counts.max() / counts.sum())
    assert min(purity) > 0.85, purity


def test_fit_chunked_dispatch_equivalence(toy):
    """Chunked dispatches must produce the same trajectory as one dispatch
    (masking correctness at chunk boundaries)."""
    cano, pc_list, _ = toy
    key = jax.random.PRNGKey(5)
    params = init_base_params(key, num_parts=4, pose_len=pc_list.shape[0])
    kw = dict(n_iter=90, use_assign_loss=True, assign_iter=40, assign_gap=5,
              start_tau=2.0, end_tau=1.0)
    _, h_one = fit_base(key, params, FitConfig(dispatch_chunk=1000, **kw),
                        cano, pc_list)
    _, h_chk = fit_base(key, params, FitConfig(dispatch_chunk=32, **kw),
                        cano, pc_list)
    np.testing.assert_allclose(np.asarray(h_one["total_loss"]),
                               np.asarray(h_chk["total_loss"]),
                               rtol=1e-4, atol=1e-5)


def test_select_canonical_frame(toy):
    """Energy-based cano selection runs per-candidate fits with shared
    compiled programs and returns finite energies for all candidates."""
    from reart_tpu.selection import select_canonical_frame

    cano, pc_list, _ = toy
    complete = np.concatenate([cano[None], pc_list], axis=0)
    cfg = FitConfig(n_iter=60, start_tau=2.0, end_tau=1.0)
    best, energies = select_canonical_frame(
        jax.random.PRNGKey(0), complete, cfg, num_parts=4,
        candidates=[0, 2], verbose=False)
    assert best in (0, 2)
    assert all(np.isfinite(e["total_err"]) for e in energies.values())


def test_compiled_program_reuse_is_value_safe():
    """Regression (code-review finding): two same-shaped fits in one process
    must each optimize against THEIR OWN canonical cloud — cached compiled
    programs take the cloud as a traced argument, not a closure constant."""
    rng = np.random.RandomState(7)
    key = jax.random.PRNGKey(0)
    cfg = FitConfig(n_iter=40, start_tau=1.0, end_tau=1.0)

    losses = []
    for seed in (0, 1):
        r = np.random.RandomState(seed)
        cano = r.randn(64, 3).astype(np.float32) * (1.0 + seed * 5.0)
        pcs = np.stack([cano + 0.01 * i for i in range(1, 4)])
        params = init_base_params(key, num_parts=3, pose_len=3)
        _, h = fit_base(key, params, cfg, cano, pcs)
        losses.append(float(h["total_loss"][-1]))
    # both fits converge on their own data; a baked-in first cloud makes the
    # second loss explode by orders of magnitude
    assert losses[1] < 100 * max(losses[0], 1e-3), losses


def test_fit_checkpoint_resume(toy, tmp_path):
    """Mid-run checkpointing: a fit interrupted between dispatches resumes
    from the snapshot and matches an uninterrupted fit's trajectory."""
    cano, pc_list, _ = toy
    key = jax.random.PRNGKey(9)
    kw = dict(n_iter=120, use_assign_loss=True, assign_iter=60, assign_gap=5,
              start_tau=1.0, end_tau=1.0, dispatch_chunk=20)
    cfg = FitConfig(**kw)
    params = init_base_params(key, num_parts=3, pose_len=pc_list.shape[0])

    # uninterrupted reference run
    ref_params, ref_hist = fit_base(key, params, cfg, cano, pc_list)

    # interrupted run: monkeypatch the scan cache to kill after 3 dispatches
    import reart_tpu.train.engine as eng

    ckpt_dir = str(tmp_path / "ckpt")
    calls = {"n": 0}
    orig = eng.make_fit_fns

    recon_scan, assign_scan = eng.make_fit_fns(
        eng._base_forward_fn, cfg, True)

    def killing_recon(*args):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated crash")
        return recon_scan(*args)

    try:
        eng.make_fit_fns = lambda *a, **k: (killing_recon, assign_scan)
        with pytest.raises(RuntimeError):
            eng.fit(key, eng._base_forward_fn, params, cfg,
                    jnp.asarray(cano), jnp.asarray(pc_list),
                    two_group_opt=True, checkpoint_dir=ckpt_dir,
                    checkpoint_every=40)
    finally:
        eng.make_fit_fns = orig
    import os

    assert os.path.exists(os.path.join(ckpt_dir, "fit_state.pkl"))

    # resume completes and matches the uninterrupted trajectory
    res_params, res_hist = eng.fit(
        key, eng._base_forward_fn, params, cfg, jnp.asarray(cano),
        jnp.asarray(pc_list), two_group_opt=True, checkpoint_dir=ckpt_dir)
    assert res_hist["total_loss"].shape == (120,)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        res_params, ref_params)
    # snapshot cleaned up after completion
    assert not os.path.exists(os.path.join(ckpt_dir, "fit_state.pkl"))


def test_pipeline_recovers_hung_enqueue():
    """An enqueue that never returns (wedged tunnel mid-dispatch) trips the
    watchdog and is retried from the last fenced state; a later attempt
    that succeeds continues the run."""
    import threading

    from reart_tpu.train.engine import run_chunks_pipelined

    calls = []

    def dispatch_one(start, st):
        calls.append(start)
        if len(calls) == 1:
            threading.Event().wait()  # wedged: blocks forever
        return st + 1, None

    final = run_chunks_pipelined(
        range(3), 0, dispatch_one, lambda *a: None,
        timeout=0.5, max_retries=2, depth=2)
    assert final == 3
    assert calls.count(0) == 2  # hung once, retried once


def test_pipeline_hung_enqueue_exhausts_retries():
    import threading

    import pytest

    from reart_tpu.train.engine import run_chunks_pipelined

    def always_hangs(start, st):
        threading.Event().wait()

    with pytest.raises(TimeoutError):
        run_chunks_pipelined(range(2), 0, always_hangs, lambda *a: None,
                             timeout=0.2, max_retries=1, depth=2)


def test_pipelined_rewind_on_fence_failure():
    """run_chunks_pipelined: a fence failure drops every younger in-flight
    chunk, rewinds to the last fenced state, and re-dispatches — final state
    and fenced-callback order are as if every chunk ran serially once."""
    import jax

    from reart_tpu.train.engine import run_chunks_pipelined

    calls, fenced = [], []
    fail = {"armed": True}

    class Buf:
        def __init__(self, v, poison=False):
            self.v, self.poison = v, poison

        def block_until_ready(self):
            if self.poison and fail.pop("armed", False):
                raise jax.errors.JaxRuntimeError("boom")
            return self

    def dispatch_one(start, st):
        calls.append(start)
        return Buf(st.v + 1, poison=(start == 3)), Buf(start)

    def on_fenced(start, st, extras):
        fenced.append((start, st.v))

    final = run_chunks_pipelined(
        range(8), Buf(0), dispatch_one, on_fenced,
        timeout=5.0, max_retries=2, depth=3)
    assert final.v == 8
    assert fenced == [(s, s + 1) for s in range(8)]  # in order, correct state
    assert calls.count(3) == 2                       # failed chunk retried
    assert calls.count(4) == 2                       # younger chunk re-run


def test_pipelined_exhausts_retries():
    import jax
    import pytest

    from reart_tpu.train.engine import run_chunks_pipelined

    class Bad:
        def block_until_ready(self):
            raise jax.errors.JaxRuntimeError("dead chip")

    with pytest.raises(jax.errors.JaxRuntimeError):
        run_chunks_pipelined(
            range(3), Bad(), lambda s, st: (Bad(), None),
            lambda *a: None, timeout=5.0, max_retries=1, depth=2)


def test_pipeline_rewinds_on_enqueue_jax_error():
    """A deferred async device error surfacing at ENQUEUE time rewinds to
    the oldest unproven chunk instead of killing the run."""
    import jax

    from reart_tpu.train.engine import run_chunks_pipelined

    calls, fenced = [], []
    fail = {"armed": True}

    def dispatch_one(start, st):
        calls.append(start)
        if start == 2 and fail.pop("armed", False):
            raise jax.errors.JaxRuntimeError("deferred async failure")
        return st + 1, None

    final = run_chunks_pipelined(
        range(5), 0, dispatch_one, lambda s, st, ex: fenced.append(s),
        timeout=5.0, max_retries=2, depth=3)
    assert final == 5
    assert fenced == list(range(5))
    # chunks 0 and 1 were in flight when the error surfaced -> re-dispatched
    assert calls.count(0) == 2 and calls.count(2) == 2


def test_selection_gather_matches_onehot(monkeypatch):
    """_select_rows/_select_matched switch to plain gathers above
    ONEHOT_SELECT_MAX_ROWS; both formulations must agree exactly."""
    from reart_tpu.train import engine

    rng = np.random.RandomState(3)
    t, n, m = 4, 96, 48
    pc_trans = jnp.asarray(rng.randn(t, n, 3).astype(np.float32))
    pc_tgt = jnp.asarray(rng.randn(t, m, 3).astype(np.float32))
    src_idx = jnp.asarray(rng.choice(n, size=m, replace=False))
    perm = jnp.asarray(np.stack([rng.permutation(m) for _ in range(t)]))
    actx = engine.AssignContext(src_idx=src_idx, pc_tgt=pc_tgt)

    monkeypatch.setattr(engine, "ONEHOT_SELECT_MAX_ROWS", 10**9)
    rows_oh = engine._select_rows(actx, pc_trans)
    matched_oh = engine._select_matched(pc_tgt, perm)
    monkeypatch.setattr(engine, "ONEHOT_SELECT_MAX_ROWS", 0)
    rows_g = engine._select_rows(actx, pc_trans)
    matched_g = engine._select_matched(pc_tgt, perm)

    np.testing.assert_array_equal(np.asarray(rows_oh), np.asarray(rows_g))
    np.testing.assert_array_equal(np.asarray(matched_oh),
                                  np.asarray(matched_g))


class TestBandGuard:
    """Banded-LAP quality guard (round-3, VERDICT r2 #5b): at the assign-
    phase boundary the fit solves the first REAL assignment problem both
    banded and dense and auto-falls-back to dense when the banded matched
    cost collapses (band coverage cannot represent the matching)."""

    def _fit(self, monkeypatch, tgt_of, n_iter=2, **cfg_over):
        """Run a tiny all-assign fit with the banded path force-admitted at
        toy scale (interpret-mode kernels on CPU)."""
        from jax.experimental.pallas import tpu as pltpu

        import reart_tpu.ops.assignment as A
        from reart_tpu.train.engine import _band_guard_probe

        monkeypatch.setattr(A, "banded_points_available",
                            lambda n, m, band: band > 0)
        monkeypatch.setattr(
            A, "resolve_band", lambda band, n: 128 if band == -1 else band)
        if hasattr(_band_guard_probe, "cache_clear"):
            _band_guard_probe.cache_clear()

        # dispatch synchronously on THIS thread: interpret mode is a
        # thread-local, and the pipelined driver's watchdog threads would
        # lower the banded kernel for real on the CPU backend
        import reart_tpu.train.engine as E

        def sync_chunks(starts, state, dispatch_one, on_fenced, timeout,
                        max_retries=2, depth=4):
            for start in starts:
                state, h = dispatch_one(start, state)
                on_fenced(start, state, h)
            return state

        monkeypatch.setattr(E, "run_chunks_pipelined", sync_chunks)

        n, t, p = 512, 4, 3
        rng = np.random.RandomState(0)
        cano = rng.randn(n, 3).astype(np.float32)
        pcs = np.stack([tgt_of(cano, i, rng) for i in range(t)])
        cfg = FitConfig(n_iter=n_iter, assign_iter=0, use_assign_loss=True,
                        downsample=1, dispatch_chunk=2, assign_gap=1,
                        start_tau=1.0, end_tau=1.0, **cfg_over)
        params = init_base_params(jax.random.PRNGKey(1), p, t)
        with pltpu.force_tpu_interpret_mode():
            _, hist = fit_base(jax.random.PRNGKey(0), params, cfg, cano,
                               jnp.asarray(pcs))
        return np.asarray(hist["total_loss"])

    def test_falls_back_on_unaligned_clouds(self, monkeypatch, capsys):
        # reflected target: the two clouds' space-filling orders disagree
        # completely, so band-restricted matching is far off the optimum
        losses = self._fit(
            monkeypatch,
            lambda cano, i, rng: (cano * np.float32([-1, 1, 1])).astype(
                np.float32))
        assert np.isfinite(losses).all()
        assert "banded-LAP guard" in capsys.readouterr().out

    def test_reprobe_flips_decision_midfit(self, monkeypatch, capsys):
        """Mid-fit guard re-probe (round-4, VERDICT r3 #8): a problem whose
        alignment regime drifts flips the banded-vs-dense decision at the
        re-probe boundary and the fit switches solver paths. The probe is
        faked with iteration-dependent costs (unaligned at the phase
        boundary, aligned by the re-probe) so the drift is deterministic;
        everything downstream — cadence bookkeeping, the decision flip,
        the scan swap — is the real engine path."""
        import reart_tpu.train.engine as E

        calls = []

        def fake_probe(forward_fn, band, n_iter, end_tau, start_tau, sweeps):
            def go(params, key, it0, cano_pc, fwd_ctx, src_idx, pc_tgt,
                   price):
                i = int(it0)
                calls.append(i)
                # phase start: banded 50% worse -> dense; re-probe: equal
                # -> switch back to banded
                return (1.5, 1.0) if i == 0 else (1.0, 1.0)

            return go

        monkeypatch.setattr(E, "_band_guard_probe", fake_probe)
        losses = self._fit(
            monkeypatch,
            lambda cano, i, rng: (cano + 1e-4 * rng.randn(*cano.shape)
                                  ).astype(np.float32),
            n_iter=8, assign_band_reprobe=4)
        out = capsys.readouterr().out
        assert np.isfinite(losses).all()
        assert calls == [0, 4]  # phase-boundary probe + one re-probe
        assert "banded-LAP guard: banded matched cost" in out  # -> dense
        assert "switching to the banded solver" in out         # flip back

    def test_keeps_banded_on_aligned_clouds(self, monkeypatch, capsys):
        # near-coincident clouds: identity-initialized proposals put the
        # predictions on top of the targets, the banded matching is
        # near-exact and the guard keeps the banded path
        losses = self._fit(
            monkeypatch,
            lambda cano, i, rng: (cano + 1e-4 * rng.randn(*cano.shape)
                                  ).astype(np.float32))
        assert np.isfinite(losses).all()
        assert "banded-LAP guard" not in capsys.readouterr().out


def test_band_overflow_fraction_diagnostic():
    """band_overflow_fraction: ~0 on aligned clouds, larger on rotated
    clouds, and always in [0, 1]."""
    from reart_tpu.ops.assignment import band_overflow_fraction

    rng = np.random.RandomState(0)
    n = 2048
    cano = rng.randn(n, 3).astype(np.float32)
    a = np.cos(0.5), np.sin(0.5)
    rot = np.array([[a[0], -a[1], 0], [a[1], a[0], 0], [0, 0, 1]], np.float32)
    aligned = float(band_overflow_fraction(
        jnp.asarray(cano)[None], jnp.asarray(cano + 0.01)[None], band=512))
    rotated = float(band_overflow_fraction(
        jnp.asarray(cano)[None], jnp.asarray(cano @ rot.T)[None], band=512))
    assert 0.0 <= aligned <= 1.0 and 0.0 <= rotated <= 1.0
    assert aligned < 0.02
    assert rotated > 2 * aligned
