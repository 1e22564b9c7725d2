"""Energy-based canonical-frame and model selection.

The reference README (README.md:60) tells the USER to re-run the whole fit
once per candidate canonical frame and keep the lowest-energy result — a
manual sweep of full processes. Here it is one call: the canonical cloud
AND the canonical index are traced arguments of the compiled fit programs,
so every candidate frame reuses one compilation. Energies use the same
ass+screw(+group) formula the drivers print (run_robot.py:306-321).
"""

from __future__ import annotations

import functools as _functools

import numpy as np

import jax
import jax.numpy as jnp


# per-frame kinematic parameter rows (everything except the screw axes);
# sliced by holdout_split / holdout_score
_PER_FRAME_KEYS = ("theta_list", "distance_list", "root_6d", "root_t")


def holdout_split(t_fitted: int, every: int = 3):
    """Deterministic train/held split of the fitted frame indices: every
    `every`-th frame (starting at 1) is held out — ~1/3 of frames,
    interleaved so both subsets span the articulation range."""
    held = np.arange(1, t_fitted, every)
    train = np.setdiff1d(np.arange(t_fitted), held)
    if held.size == 0 or train.size == 0:  # degenerate short sequences
        held = np.asarray([t_fitted - 1])
        train = np.arange(t_fitted - 1) if t_fitted > 1 else np.asarray([0])
    return train, held


def _holdout_chamfer(opt, params, state, cano_pc, held_pc):
    from reart_tpu.models.kinematic import kinematic_forward
    from reart_tpu.ops.distance import chamfer

    p2 = {**params, **opt}
    pred, _, _ = kinematic_forward(p2, state, cano_pc)
    return jnp.mean(chamfer(pred, held_pc, bidirectional=True))


@_functools.partial(jax.jit, static_argnames=("n_iter",))
def _holdout_run(params, state, cano_pc, held_pc, opt0, n_iter, lr=1e-1):
    import optax

    tx = optax.amsgrad(lr)
    opt_state = tx.init(opt0)

    def step(carry, _):
        opt, opt_state = carry
        loss, grads = jax.value_and_grad(_holdout_chamfer)(
            opt, params, state, cano_pc, held_pc)
        updates, opt_state = tx.update(grads, opt_state, opt)
        return (optax.apply_updates(opt, updates), opt_state), loss

    (opt, _), _ = jax.lax.scan(step, (opt0, opt_state), None, length=n_iter)
    return _holdout_chamfer(opt, params, state, cano_pc, held_pc)


def _holdout_solve(params, state, cano_pc, held_pc, n_iter: int = 150):
    """With axis/moment FROZEN, fit only per-held-frame joint coordinates
    (theta, prismatic distance, root pose) against the observed held-out
    clouds; return the final mean bidirectional chamfer there.

    This is the reference's own IK mechanism (kinematic_utils.py:229-234 —
    theta-only Adam with fixed screws) pointed at dense observed clouds
    instead of sparse GT correspondences, so it needs no supervision.
    Module-level jit: every tree candidate shares one compiled program
    (identical (H, E) shapes; the tree metadata is neutralized out of the
    cache key by the caller, like the short fits)."""
    from reart_tpu.models.kinematic import PIN
    from reart_tpu.models.base_model import IDENTITY_6D

    h = held_pc.shape[0]
    e = params["theta_list"].shape[1]
    opt0 = {"theta_list": jnp.full((h, e), PIN, jnp.float32)}
    if "distance_list" in params:
        opt0["distance_list"] = jnp.full((h, e), PIN, jnp.float32)
    if "root_6d" in params:
        opt0["root_6d"] = jnp.tile(jnp.asarray(IDENTITY_6D)[None], (h, 1))
        opt0["root_t"] = jnp.zeros((h, 3), jnp.float32)
    return float(_holdout_run(params, state, cano_pc, held_pc, opt0, n_iter))


def _interp_rows(train_vals, train_idx, held_idx):
    """Linear interpolation of per-frame parameter rows at held frame
    indices from the surrounding train frames (clamped at the ends)."""
    pos = np.interp(held_idx.astype(np.float64), train_idx.astype(np.float64),
                    np.arange(len(train_idx), dtype=np.float64))
    lo = np.clip(np.floor(pos).astype(np.int64), 0, len(train_idx) - 1)
    hi = np.clip(lo + 1, 0, len(train_idx) - 1)
    w = jnp.asarray((pos - lo)[:, None], train_vals.dtype)
    lo_v = train_vals[jnp.asarray(lo)]
    hi_v = train_vals[jnp.asarray(hi)]
    return (1.0 - w) * lo_v.reshape(len(held_idx), -1) \
        + w * hi_v.reshape(len(held_idx), -1)


def holdout_score_interp(params_fitted, state, cano_pc, pc_list, train, held):
    """Interpolated-coordinate holdout: predict each held frame's joint
    coordinates by LINEAR INTERPOLATION of the neighboring train frames'
    fitted coordinates (no solve at all) and score reconstruction chamfer.

    Rationale (measured, round 5): free per-frame IK on held frames cannot
    separate topologies — with every joint coordinate free, even a wrong
    parent reconstructs each held cloud individually (nao pool: holdout
    chamfer 0.00011-0.00012 across trees whose retarget spans 1.1-1.5 cm).
    Physical articulation is SMOOTH in the right joint space: under the
    true topology, joint coordinates vary regularly over time and
    interpolate well; a wrong parent's coordinates absorb the parent's
    motion and interpolate badly."""
    from reart_tpu.models.kinematic import kinematic_forward
    from reart_tpu.ops.distance import chamfer

    held_j = jnp.asarray(held)
    p2 = dict(params_fitted)
    h = len(held)
    for k in _PER_FRAME_KEYS:
        if k in p2:
            shape = (h,) + tuple(p2[k].shape[1:])
            p2[k] = _interp_rows(p2[k], train, held).reshape(shape)
    pred, _, _ = kinematic_forward(p2, state, cano_pc)
    d = chamfer(pred, jnp.asarray(pc_list)[held_j], bidirectional=True)
    return float(jnp.mean(d))


def holdout_score(key, params, state, cfg, cano_pc, pc_list,
                  solve_iter: int = 150) -> float:
    """Held-out-frame generalization score of one kinematic-tree candidate
    (lower = generalizes better).

    Fit the candidate's screws on a TRAIN subset of frames, freeze the
    axes, IK-solve the per-frame coordinates on the HELD-OUT frames, and
    score reconstruction chamfer there (plus the interpolated-coordinate
    variant below). Motivation (PARITY round 4): the in-sample ass+screw
    energy cannot rank trees — every sane spanning tree reconstructs the
    TRAINING clouds equally well while TED spans 3-7 — and a wrong
    parent's screw axes are precisely what should NOT transfer to motion
    states the fit never saw. The reference has no counterpart: it never
    searches topology (run_robot.py:104-124).

    MEASURED OUTCOME (round 5, both flagship pools): NEGATIVE as a
    ranking signal — reconstruction chamfer permits self-sliding, so even
    a wrong parent reconstructs each held cloud (nao pool: scores
    0.00011-0.00012 across trees whose retarget spans 1.1-1.5 cm; the
    fullscale sapien pool: 0.00027-0.00034 across trees whose projected
    EPE spans 3x). It still REJECTS grossly-wrong trees (non-expressible
    parents, tests/test_tree_search.py) — useful as a veto, not a ranker.
    Full table in PARITY.md round 5."""
    from reart_tpu.train import fit_kinematic

    t = pc_list.shape[0]
    train, held = holdout_split(t)
    p_train = {
        k: (v[jnp.asarray(train)] if k in _PER_FRAME_KEYS else v)
        for k, v in params.items()
    }
    fitted, _ = fit_kinematic(key, p_train, state, cfg,
                              jnp.asarray(pc_list)[jnp.asarray(train)],
                              flow_ctx=None)
    solved = _holdout_solve(fitted, state, cano_pc,
                            jnp.asarray(pc_list)[jnp.asarray(held)],
                            n_iter=solve_iter)
    interp = holdout_score_interp(fitted, state, cano_pc, pc_list,
                                  train, held)
    # the free-solve chamfer cannot separate topologies (measured — every
    # tree reconstructs individual held clouds); the interpolated-coordinate
    # score carries the cross-frame smoothness evidence and is the ranking
    # signal. The solve result is kept as a sanity lower bound in the sum
    # (a tree that cannot even free-solve its held frames is hopeless).
    return interp + solved


def fit_energy(params, cfg, cano_pc, pc_list, cano_idx, seg_part, trans_list,
               sample_complete, include_group: bool = True) -> dict:
    """Energy of a finished fit (run_robot.py:306-314)."""
    from reart_tpu.graph import (
        denoise_seg_label,
        extract_kinematic,
        merging_wrapper,
        mst_wrapper,
    )
    from reart_tpu.hostops import on_host
    from reart_tpu.metrics import energy
    from reart_tpu.models.base_model import compute_pc_transform

    # host backend throughout: every candidate frame can surface a different
    # part count P, and each fresh P-shaped program would cost a remote
    # compile for microsecond-scale compute (see cli.finalize)
    with on_host():
        # same cleanup protocol as the driver finalize: tiny parts reassigned
        # before merge costs (masked FPS needs >= num_fps points per part)
        seg = np.asarray(denoise_seg_label(seg_part, cano_pc, min_num=20))
        if len(np.unique(seg)) > 1:
            seg = np.asarray(merging_wrapper(seg, trans_list, cano_pc, 3e-2))
        if len(np.unique(seg)) > 1:
            conn = mst_wrapper(seg, trans_list, cano_pc)
            seg, trans, conn = extract_kinematic(seg, trans_list, conn)
        else:  # degenerate single-part candidate: rigid fit, no tree
            lab = int(np.unique(seg)[0])
            seg = np.zeros_like(seg)
            trans = np.asarray(trans_list)[:, lab:lab + 1]
            conn = np.zeros((0, 2), np.int64)
        pred_pc = compute_pc_transform(
            cano_pc, jnp.asarray(trans), jnp.asarray(seg))
        complete_pred = jnp.concatenate(
            [pred_pc[:cano_idx], cano_pc[None], pred_pc[cano_idx:]], axis=0
        )
        return energy(pred_pc, pc_list, jnp.asarray(trans), jnp.asarray(conn),
                      seg, complete_pred_pc_list=complete_pred,
                      include_group=include_group)


def select_canonical_frame(key, complete_pc_list, cfg, num_parts: int,
                           candidates=None, include_group: bool = True,
                           verbose: bool = True, mesh=None):
    """Fit once per candidate canonical frame, return (best_idx, energies).

    complete_pc_list: (T, N, 3). Candidate fits share one compiled program
    (identical shapes). Flow context is omitted during selection (the
    reference's selection criterion is the energy, which has no flow term).

    With `mesh` (>1 device), candidate fits are batched and sharded over the
    mesh's "seq" axis (parallel.fit_base_candidates) — same compiled phase
    programs and key, so the sweep computes the same fits as the sequential
    loop. The per-candidate energy/graph stage stays on the host (part
    counts vary per candidate).
    """
    from reart_tpu.models.base_model import base_forward, init_base_params
    from reart_tpu.train import fit_base

    complete = jnp.asarray(complete_pc_list, jnp.float32)
    t = complete.shape[0]
    if candidates is None:
        candidates = range(t)
    candidates = [int(i) for i in candidates]

    fits = None
    if mesh is not None and mesh.devices.size > 1 and len(candidates) > 1:
        from reart_tpu.parallel import fit_base_candidates

        if verbose:
            print(f"auto_cano sweep: {len(candidates)} candidates over "
                  f"{mesh.devices.size}-device mesh {dict(mesh.shape)}")
        fits = fit_base_candidates(key, cfg, complete, num_parts, candidates,
                                   mesh)

    energies = {}
    for cano_idx in candidates:
        cano_pc = complete[cano_idx]
        pc_list = jnp.concatenate(
            [complete[:cano_idx], complete[cano_idx + 1:]], axis=0
        )
        import dataclasses

        cfg_i = dataclasses.replace(cfg, cano_idx=cano_idx)
        if fits is None:
            params = init_base_params(key, num_parts, t - 1)
            fitted, _ = fit_base(key, params, cfg_i, cano_pc, pc_list)
            _, seg, trans = base_forward(fitted, cano_pc, key, tau=1.0)
        else:
            fitted, seg, trans = fits[cano_idx]
        e = fit_energy(fitted, cfg_i, cano_pc, pc_list, cano_idx,
                       np.asarray(seg), np.asarray(trans), complete,
                       include_group=include_group)
        energies[cano_idx] = e
        if verbose:
            print(f"cano {cano_idx}: total_err {e['total_err']:.3f}")
    best = min(energies, key=lambda i: energies[i]["total_err"])
    return best, energies
