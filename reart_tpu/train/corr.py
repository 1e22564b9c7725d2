"""Self-supervised training of the correspondence backbone (PointNet2Msg2).

The reference consumes its correspondence features from a FROZEN checkpoint
trained elsewhere (`corr_model.pth.tar`, loaded at feature_extractor.py:62-86)
and ships no trainer — a user without that file has no flow supervision on
the robot/real domains. This module adds the missing capability TPU-natively:
train the backbone on synthetic rigid-part deformations of the sequence's own
frames (no GT labels anywhere), then hand the weights to the existing
`--flow_provider corr` path.

Recipe (classic point-feature self-supervision, e.g. PPF-FoldNet/predator-style
InfoNCE, built from scratch here):
  * sample a frame, subsample N points, split them into K random Voronoi
    parts, move every part by a random screw (rotation about its centroid +
    translation), add a global SE(3) and per-point jitter — correspondence is
    the identity map by construction;
  * embed both clouds with the SAME backbone (one batched pass) and train
    with a bidirectional InfoNCE over the (N, N) feature-similarity logits;
  * BatchNorm runs in batch-stats mode with an EMA write-back into the
    parameter tree (torch running-stat semantics), so the trained tree drops
    straight into the frozen inference path (`apply_pointnet2msg2`, running
    mode) and the torch-format loaders stay untouched.

Everything per-step is jit/vmap-safe (static shapes, branchless masking) and
the whole optimization scans on-device in dispatch_chunk-bounded programs —
the same dispatch discipline as train/engine.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.geometry.se3 import so3_exp_map
from reart_tpu.models.pointnet2 import apply_pointnet2msg2, bn_paths


@dataclasses.dataclass(frozen=True)
class CorrTrainConfig:
    steps: int = 2000
    batch: int = 4                # pairs per step
    n_points: int = 1024          # points per cloud during training
    k_parts: int = 8              # max synthetic rigid parts per example
    min_parts: int = 2
    max_angle: float = 0.6        # rad, per-part rotation about its centroid
    max_slide: float = 0.08      # per-part translation (input units)
    jitter: float = 0.004         # per-point gaussian noise (input units)
    global_angle: float = 0.25    # global rotation applied to the target
    global_slide: float = 0.08
    scale_jitter: float = 0.15    # +-15% uniform rescale of the pair
    temperature: float = 0.07     # InfoNCE logit temperature
    lr: float = 1e-3
    bn_momentum: float = 0.1      # torch BatchNorm default
    dispatch_chunk: int = 50      # scan steps per device dispatch
    out_dim: int = 64             # feature width (reference head: 64)
    seed_frames: int = 0          # 0 = use all frames
    # forward/backward compute dtype. "bfloat16" runs the backbone's matmuls
    # on the MXU at 2x f32 rate with f32 master weights/optimizer/BN-EMA
    # (logits + loss always f32). f32 default = bit-safe everywhere.
    compute_dtype: str = "float32"
    # mid-run checkpointing (the trainer-side counterpart of the fit
    # engine's rewind-and-resume): dump params/opt_state/rng every this many
    # dispatch chunks when train_corr gets a checkpoint_path
    checkpoint_every: int = 10
    # per-dispatch watchdog: a chunk (enqueue + fence) outliving this is a
    # wedged-tunnel failure — the last checkpoint is already on disk, so the
    # trainer raises instead of hanging forever. Must cover the first
    # chunk's remote compile.
    dispatch_timeout: float = 1800.0
    # resampled pairs: src and tgt are INDEPENDENT subsets of the frame, the
    # way two real scans are independent samplings of the surface — the
    # identity map no longer exists, so positives come from the geometric
    # nearest neighbor of each src point's true transformed position
    # (gt_pos), gated by pos_radius, and near-misses inside neg_radius are
    # excluded from the negatives (they are almost-correct answers). Trains
    # features that survive resampling — the failure mode of the identity
    # recipe on real frame pairs (sparse matches, PARITY.md). Default True,
    # matching the CLI (`run.py corr --resample 1`).
    resample: bool = True
    pos_radius: float = 0.02      # max ||gt_pos - nn(tgt)|| for a positive
    neg_radius: float = 0.05      # no-penalty zone around gt_pos


def synth_pair(key, frames, cfg: CorrTrainConfig):
    """One synthetic training pair from the sequence's own frames.

    frames: (F, N0, 3) clouds ALREADY normalized exactly as inference will
    normalize them (cli.setup_flow passes the category/dataset centroid+scale
    before matching — run_robot.py:72-77). Returns (src (N, 3), tgt (N, 3),
    gt_pos (N, 3), scale ()): gt_pos[i] is src[i]'s TRUE (jitter-free)
    position in tgt's frame; scale is the pair's ±scale_jitter rescale factor
    — radius gates in corr_info_nce must be multiplied by it so gating stays
    consistent with the un-jittered geometry. With cfg.resample=False, tgt is
    the same point set as src (correspondence src[i] <-> tgt[i], gt_pos ≈
    tgt); with resample=True, tgt is an INDEPENDENT subset of the frame moved
    by the same part/global motion — the identity map does not exist and the
    loss derives positives from gt_pos (see corr_info_nce)."""
    kf, kp, ks, kk, kax, kan, ktr, kga, kgan, kgt, kj1, kj2, ksc = (
        jax.random.split(key, 13))
    f_count, n0 = frames.shape[0], frames.shape[1]
    n, k_max = cfg.n_points, cfg.k_parts

    cloud = frames[jax.random.randint(kf, (), 0, f_count)]
    perm = jax.random.permutation(kp, n0)
    x = cloud[perm[:n]]  # (N, 3)
    if cfg.resample:
        # independent target subset — disjoint iff n0 >= 2n (train_corr
        # warns when the frame is too small and the subsets must overlap)
        x2 = cloud[perm[n0 - n:]]  # (N, 3)
    else:
        x2 = x

    # Voronoi split around K random seed points; a random subset of seeds is
    # active so part count varies in [min_parts, k_parts]
    seeds = x[jax.random.permutation(ks, n)[:k_max]]  # (K, 3)
    k_active = jax.random.randint(kk, (), cfg.min_parts, k_max + 1)
    active = jnp.arange(k_max) < k_active

    def voronoi_label(pts):
        d2 = jnp.sum((pts[:, None] - seeds[None]) ** 2, axis=-1)  # (N, K)
        return jnp.argmin(jnp.where(active[None], d2, jnp.inf), axis=-1)

    label = voronoi_label(x)  # (N,)
    onehot = jax.nn.one_hot(label, k_max, dtype=x.dtype)  # (N, K)

    counts = jnp.sum(onehot, axis=0)  # (K,)
    centroids = (onehot.T @ x) / jnp.maximum(counts, 1.0)[:, None]  # (K, 3)

    axis = jax.random.normal(kax, (k_max, 3))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    angle = jax.random.uniform(kan, (k_max, 1), minval=-cfg.max_angle,
                               maxval=cfg.max_angle)
    rot = so3_exp_map(axis * angle)  # (K, 3, 3)
    slide = cfg.max_slide * jax.random.normal(ktr, (k_max, 3))

    # global motion on the target (camera / root movement)
    gaxis = jax.random.normal(kga, (3,))
    gaxis = gaxis / (jnp.linalg.norm(gaxis) + 1e-8)
    gangle = jax.random.uniform(kgan, (), minval=-cfg.global_angle,
                                maxval=cfg.global_angle)
    grot = so3_exp_map((gaxis * gangle)[None])[0]
    gslide = cfg.global_slide * jax.random.normal(kgt, (3,))

    def move(pts, lab):
        c = centroids[lab]   # (N, 3)
        r = rot[lab]         # (N, 3, 3)
        out = jnp.einsum("nij,nj->ni", r, pts - c) + c + slide[lab]
        return out @ grot.T + gslide

    gt_pos = move(x, label)                      # src's true target position
    y = gt_pos if not cfg.resample else move(x2, voronoi_label(x2))

    x = x + cfg.jitter * jax.random.normal(kj1, x.shape)
    y = y + cfg.jitter * jax.random.normal(kj2, y.shape)

    s = jax.random.uniform(ksc, (), minval=1.0 - cfg.scale_jitter,
                           maxval=1.0 + cfg.scale_jitter)
    return x * s, y * s, gt_pos * s, s


def apply_bn_ema(params, stats, momentum: float):
    """EMA the collected batch moments back into the tree (torch semantics:
    running = (1-m)*running + m*batch), in `bn_paths` forward order."""
    paths = bn_paths(params)
    assert len(paths) == len(stats), (len(paths), len(stats))
    # shallow-copy the containers we touch so the update stays functional
    out = {k: (list(v) if isinstance(v, list) else v)
           for k, v in params.items()}
    for name in ("sa1", "sa2"):
        out[name] = [list(block) for block in params[name]]
    for path, (mean, var) in zip(paths, stats):
        node = out
        for p in path[:-1]:
            node = node[p]
        layer = dict(node[path[-1]] if path != ("head",) else out["head"])
        layer["bn_mean"] = (1 - momentum) * layer["bn_mean"] + momentum * mean
        layer["bn_var"] = (1 - momentum) * layer["bn_var"] + momentum * var
        if path == ("head",):
            out["head"] = layer
        else:
            node[path[-1]] = layer
    return out


def corr_info_nce(params, src, tgt, temperature: float,
                  compute_dtype: str = "float32", gt_pos=None,
                  pos_radius: float = 0.02, neg_radius: float = 0.05,
                  scale=None):
    """Bidirectional InfoNCE.

    src/tgt: (B, N, 3). Returns (loss, bn_stats) — the backbone runs ONE
    batched pass over the 2B clouds so batch statistics are shared.

    gt_pos=None (identity recipe): src[i] corresponds to tgt[i]; the labels
    are the diagonal. gt_pos (B, N, 3) (resampled recipe): src[i]'s positive
    is the tgt point geometrically nearest to gt_pos[i] (its true transformed
    position), valid only within pos_radius; any other tgt point inside
    neg_radius of gt_pos[i] is an almost-correct answer and is masked out of
    the negatives instead of being pushed away. Reverse direction likewise
    with the roles swapped. This is the PPF-FoldNet/FCGF-style
    radius-gated contrastive objective, needed once src and tgt stop
    sharing a point set.

    scale (B,) (optional): the per-pair scale_jitter factor from synth_pair.
    The coordinates already carry it, so the radius gates are multiplied by
    it — gating is then exactly scale-invariant relative to the un-jittered
    geometry instead of tightening/loosening by ±scale_jitter per sample.

    compute_dtype="bfloat16" casts weights+activations for the backbone pass
    (MXU 2x rate); master weights stay f32 (autodiff casts grads back), BN
    stats and the logits/CE are promoted to f32.
    """
    dt = jnp.dtype(compute_dtype)
    b, n = src.shape[0], src.shape[1]
    stats = []
    cast_params = (params if dt == jnp.float32 else
                   jax.tree_util.tree_map(lambda x: x.astype(dt), params))
    both = jnp.concatenate([src, tgt], 0).astype(dt)
    feats = apply_pointnet2msg2(cast_params, both,
                                bn_mode="batch", stats_out=stats)
    feats = feats.astype(jnp.float32)
    stats = [(m.astype(jnp.float32), v.astype(jnp.float32))
             for m, v in stats]
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    f1, f2 = feats[:b], feats[b:]

    if gt_pos is None:
        # identity recipe == the gated tail with diagonal positives, no
        # near-mask, everything valid (sum/B·N is then exactly the mean)
        is_pos = jnp.broadcast_to(jnp.eye(n, dtype=jnp.bool_)[None],
                                  (b, n, n))
        near = jnp.zeros((b, n, n), jnp.bool_)
        valid = jnp.ones((b, n), jnp.float32)
        gates_f = gates_b = (is_pos, near, valid)
    else:
        # geometric distances from each src point's true position to every
        # tgt point (and transposed for the reverse direction)
        d2 = jnp.sum((gt_pos[:, :, None] - tgt[:, None]) ** 2, -1)  # (B,N,M)
        s = (jnp.ones((b,), jnp.float32) if scale is None
             else jnp.asarray(scale, jnp.float32))
        pos_r2 = (pos_radius * s)[:, None] ** 2                     # (B, 1)
        neg_r2 = (neg_radius * s)[:, None, None] ** 2               # (B,1,1)

        def gates(d2):
            pos = jnp.argmin(d2, axis=-1)                           # (B, N)
            valid = (jnp.min(d2, axis=-1) < pos_r2).astype(jnp.float32)
            is_pos = jax.nn.one_hot(pos, d2.shape[-1], dtype=jnp.bool_)
            near = (d2 < neg_r2) & ~is_pos
            return is_pos, near, valid

        gates_f = gates(d2)
        gates_b = gates(jnp.swapaxes(d2, 1, 2))

    loss = _nce_tail(f1, f2, jnp.float32(1.0 / temperature),
                     *gates_f, *gates_b)
    return loss, stats


# The InfoNCE tail (logits einsum -> near-mask -> gated CE both directions)
# carries a hand-written VJP. XLA autodiffs the identical math fine in
# isolation (1.55 ms standalone) but embedding that autodiff graph in the
# full param backward produces a pathological schedule: 26 ms/grad at the
# SAME cost_analysis flops/bytes as a constant-cotangent tail running
# 3.4 ms (scripts/ab_tail_bisect.py, scripts/ab_ce_tail_vjp.py; one-session
# A/B measured 7.7x end-to-end from this boundary). The custom VJP fences
# the tail into its own clean backward: d_logits = (softmax - onehot) *
# valid/den, masked where `near`, then two MXU einsums for df1/df2.
#
# Contract: gates (is_pos, near, valid) and inv_tau are treated as
# non-differentiable constants (their cotangents are zero) — callers only
# ever differentiate through f1/f2 (the params path). CE is evaluated as
# logsumexp minus the one-hot-masked sum (value-identical to the integer-
# label form, scripts/ab_ce_form.py).


def _nce_dir(lg, is_pos, near, valid):
    """Per-direction gated CE: mean over valid rows of
    lse(masked logits) - positive logit."""
    lgm = jnp.where(near, -1e9, lg)
    lse = jax.nn.logsumexp(lgm, axis=-1)
    pos_lg = jnp.sum(jnp.where(is_pos, lgm, 0.0), axis=-1)
    return jnp.sum((lse - pos_lg) * valid) / jnp.maximum(
        jnp.sum(valid), 1.0)


def _nce_dir_dlg(lg, is_pos, near, valid):
    """d(_nce_dir)/d(lg): rows weighted by valid/den; masked logits pass
    no gradient (is_pos is never masked — gates() excludes it from near)."""
    lgm = jnp.where(near, -1e9, lg)
    p = jax.nn.softmax(lgm, axis=-1)
    den = jnp.maximum(jnp.sum(valid), 1.0)
    w = (valid / den)[..., None]
    return jnp.where(near, 0.0, (p - is_pos) * w)


@jax.custom_vjp
def _nce_tail(f1, f2, inv_tau, ipf, nf, vf, ipb, nb, vb):
    lg = jnp.einsum("bnd,bmd->bnm", f1, f2) * inv_tau
    return 0.5 * (_nce_dir(lg, ipf, nf, vf) +
                  _nce_dir(jnp.swapaxes(lg, 1, 2), ipb, nb, vb))


def _nce_tail_fwd(f1, f2, inv_tau, ipf, nf, vf, ipb, nb, vb):
    return (_nce_tail(f1, f2, inv_tau, ipf, nf, vf, ipb, nb, vb),
            (f1, f2, inv_tau, ipf, nf, vf, ipb, nb, vb))


def _nce_tail_bwd(res, g):
    f1, f2, inv_tau, ipf, nf, vf, ipb, nb, vb = res
    lg = jnp.einsum("bnd,bmd->bnm", f1, f2) * inv_tau
    dlg = 0.5 * (_nce_dir_dlg(lg, ipf, nf, vf) +
                 jnp.swapaxes(_nce_dir_dlg(jnp.swapaxes(lg, 1, 2),
                                           ipb, nb, vb), 1, 2))
    dlg = dlg * (g * inv_tau)
    df1 = jnp.einsum("bnm,bmd->bnd", dlg, f2)
    df2 = jnp.einsum("bnm,bnd->bmd", dlg, f1)
    fz = lambda x: (np.zeros(x.shape, jax.dtypes.float0)
                    if not jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.zeros_like(x))
    return (df1, df2, jnp.zeros_like(inv_tau),
            fz(ipf), fz(nf), fz(vf), fz(ipb), fz(nb), fz(vb))


_nce_tail.defvjp(_nce_tail_fwd, _nce_tail_bwd)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _train_chunk(cfg: CorrTrainConfig, tx, mesh, params, opt_state, frames,
                 keys):
    """Scan cfg.dispatch_chunk steps in one device program.

    With a mesh, the synthetic batch is sharded over the "seq" axis (pure
    data parallel): the backbone runs SPMD per shard and XLA inserts the
    gradient all-reduce — and because BatchNorm batch moments reduce over
    every non-channel axis, the same propagation turns them into GLOBAL
    (cross-device) means, so sharded training is semantics-identical to
    single-device training."""

    def body(carry, key):
        params, opt_state = carry
        pair_keys = jax.random.split(key, cfg.batch)
        src, tgt, gt_pos, scale = jax.vmap(
            lambda k: synth_pair(k, frames, cfg))(pair_keys)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("seq"))
            src = jax.lax.with_sharding_constraint(src, sh)
            tgt = jax.lax.with_sharding_constraint(tgt, sh)
            gt_pos = jax.lax.with_sharding_constraint(gt_pos, sh)
            scale = jax.lax.with_sharding_constraint(scale, sh)
        (loss, stats), grads = jax.value_and_grad(
            corr_info_nce, has_aux=True)(params, src, tgt, cfg.temperature,
                                         cfg.compute_dtype,
                                         gt_pos if cfg.resample else None,
                                         cfg.pos_radius, cfg.neg_radius,
                                         scale)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_bn_ema(params, stats, cfg.bn_momentum)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
    return params, opt_state, losses


# --- self-fine-tuning on the sequence's own REAL consecutive pairs ---------
#
# The synthetic-deformation recipe trains features that are precise but
# SPARSE on real frame pairs (PARITY.md round 2: 7.7% SMNN match rate on
# nao) — real pairs differ from the synthetic distribution (true part
# boundaries, resampling structure, contact shadows). Close the gap with the
# classic EM bootstrap: mine the matcher's own high-precision SMNN matches
# on the real consecutive pairs (the exact matching inference will run),
# treat the matched target positions as pseudo ground truth, and fine-tune
# the radius-gated InfoNCE on REAL (src, tgt) clouds, re-mining as features
# improve. Synthetic pairs keep flowing at `real_frac` mixing so the feature
# space cannot collapse onto the pseudo-labels. Capability beyond the
# reference (its corr model is fixed, feature_extractor.py:62-86).

FAR_POS = 1e6  # pseudo-label sentinel: fails every pos_radius gate


@partial(jax.jit, static_argnames=("th",))
def mine_pair_labels(params, frames, th: float = 0.9):
    """SMNN-match every consecutive frame pair with the CURRENT backbone
    (frozen running stats — the exact inference-time matching in
    flow.compute_corr_masks). frames (F, N0, 3) normalized. Returns
    gt_pos (F-1, N0, 3): src point i's pseudo true position in frame t+1
    (its matched tgt point), FAR_POS rows where unmatched."""
    from reart_tpu.flow import match_smnn

    feats = apply_pointnet2msg2(params, frames)  # (F, N0, D)

    def per_pair(f1, f2, tgt_pts):
        _, j, valid = match_smnn(f1, f2, th)
        return jnp.where(valid[:, None], tgt_pts[j], FAR_POS)

    return jax.vmap(per_pair)(feats[:-1], feats[1:], frames[1:])


@partial(jax.jit, static_argnums=(0, 1))
def _finetune_chunk(cfg: CorrTrainConfig, tx, params, opt_state, frames,
                    gt_pos_all, real_frac, keys):
    """Scan fine-tuning steps: each batch element is a REAL consecutive pair
    (random frame pair, independently subsampled src/tgt subsets, mined
    pseudo gt_pos) with probability real_frac, else a synthetic pair —
    one loss (the radius-gated corr_info_nce) covers both."""
    import optax

    f_count, n0 = frames.shape[0], frames.shape[1]

    def body(carry, key):
        params, opt_state = carry

        def one_pair(k):
            kp, ks, kt, km, ksy = jax.random.split(k, 5)
            p = jax.random.randint(kp, (), 0, f_count - 1)
            si = jax.random.choice(ks, n0, (cfg.n_points,), replace=False)
            ti = jax.random.choice(kt, n0, (cfg.n_points,), replace=False)
            src_r = frames[p][si]
            tgt_r = frames[p + 1][ti]
            gt_r = gt_pos_all[p][si]
            src_s, tgt_s, gt_s, sc_s = synth_pair(ksy, frames, cfg)
            use_real = jax.random.bernoulli(km, real_frac)
            pick = lambda a, b: jnp.where(use_real, a, b)
            return (pick(src_r, src_s), pick(tgt_r, tgt_s),
                    pick(gt_r, gt_s), jnp.where(use_real, 1.0, sc_s))

        src, tgt, gt_pos, scale = jax.vmap(one_pair)(
            jax.random.split(key, cfg.batch))
        (loss, stats), grads = jax.value_and_grad(
            corr_info_nce, has_aux=True)(params, src, tgt, cfg.temperature,
                                         cfg.compute_dtype, gt_pos,
                                         cfg.pos_radius, cfg.neg_radius,
                                         scale)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_bn_ema(params, stats, cfg.bn_momentum)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state),
                                               keys)
    return params, opt_state, losses


def _refine_mined_labels(frames_np, gt_np, k: int):
    """Host-side local-rigid refinement of mined pseudo-targets: each
    matched src point's DISCRETE target (a point of the next frame's
    sample, ~surface spacing of irreducible error) is replaced by its
    matched neighbourhood's trimmed-Procrustes prediction — the same
    continuous-target construction the inference path uses
    (flow.refine_targets_local_rigid; the reference consumes raw SMNN
    targets, flow_utils.py:116-143). Unmatched rows stay FAR_POS.
    frames_np (F, N0, 3), gt_np (F-1, N0, 3); returns refined copy."""
    from reart_tpu.flow import refine_targets_local_rigid

    out = gt_np.copy()
    for t in range(out.shape[0]):
        m = out[t, :, 0] < FAR_POS / 2
        if int(m.sum()) >= 5:
            out[t][m] = refine_targets_local_rigid(
                frames_np[t][m], out[t][m], k=k)
    return out


def finetune_real_pairs(key, params, frames,
                        cfg: CorrTrainConfig = CorrTrainConfig(),
                        steps: int = 600, mine_th: float = 0.9,
                        rounds: int = 3, real_frac: float = 0.5,
                        lr: float | None = None, log_fn=None,
                        refine_k: int = 0):
    """EM-style fine-tuning of a trained backbone on the sequence's own
    consecutive frame pairs (see module comment above). Returns
    (params, losses (steps,)). `rounds` re-minings; `mine_th` is the SMNN
    ratio threshold for pseudo-labels (keep conservative: wrong labels
    poison the gate); lr defaults to 0.3x the training lr. refine_k > 0
    additionally local-rigid-refines each round's mined targets on host
    (_refine_mined_labels) so the finetune supervision carries the same
    continuous targets the flow path blends."""
    import optax

    frames = jnp.asarray(frames, jnp.float32)
    assert frames.shape[0] >= 2, "need at least one consecutive pair"
    frames_np = np.asarray(frames)
    tx = optax.adam(cfg.lr * 0.3 if lr is None else lr)
    opt_state = tx.init(params)
    per_round = -(-steps // max(rounds, 1))
    rf = jnp.float32(real_frac)
    losses = []
    for r in range(max(rounds, 1)):
        gt_pos_all = mine_pair_labels(params, frames, th=mine_th)
        if refine_k > 0:
            gt_pos_all = jnp.asarray(_refine_mined_labels(
                frames_np, np.asarray(gt_pos_all), refine_k))
        if log_fn is not None:
            matched = float(jnp.mean(
                (gt_pos_all[..., 0] < FAR_POS / 2).astype(jnp.float32)))
            log_fn(r, matched)
        for start in range(0, per_round, cfg.dispatch_chunk):
            n = min(cfg.dispatch_chunk, per_round - start)
            keys = jax.random.split(
                jax.random.fold_in(key, r * 100_003 + start), n)
            params, opt_state, ls = _finetune_chunk(
                cfg, tx, params, opt_state, frames, gt_pos_all, rf, keys)
            losses.append(ls)
    return params, (jnp.concatenate(losses) if losses else jnp.zeros(0))


def _save_train_ckpt(path, params, opt_state, key, done, losses):
    import pickle

    host = jax.tree_util.tree_map(np.asarray, (params, opt_state, key))
    with open(path + ".tmp", "wb") as f:
        pickle.dump({"format": "reart_tpu_corr_train_v1",
                     "state": host, "done": done,
                     "losses": [np.asarray(x) for x in losses]}, f)
    import os

    os.replace(path + ".tmp", path)  # atomic: never a torn checkpoint


def _load_train_ckpt(path):
    import pickle

    with open(path, "rb") as f:
        obj = pickle.load(f)
    assert obj.get("format") == "reart_tpu_corr_train_v1", path
    params, opt_state, key = jax.tree_util.tree_map(jnp.asarray, obj["state"])
    return params, opt_state, key, obj["done"], list(obj["losses"])


def train_corr(key, frames, cfg: CorrTrainConfig = CorrTrainConfig(),
               params=None, log_fn=None, mesh=None, checkpoint_path=None):
    """Train the backbone on frames (F, N0, 3) (normalized — see synth_pair).

    Returns (params, losses (steps,)). The returned tree is inference-ready:
    running BN stats carry the EMA of training batch moments. Pass a
    `jax.sharding.Mesh` with a "seq" axis to data-parallel the batch over
    devices (semantics-identical — see _train_chunk).

    checkpoint_path: mid-run resume. If the file exists, training continues
    from it (bit-identical to an uninterrupted run as long as
    dispatch_chunk is unchanged — the RNG stream is chunk-keyed); every
    cfg.checkpoint_every chunks the state is atomically rewritten. Each
    dispatch runs under cfg.dispatch_timeout: a chunk that outlives it
    (wedged tunnel) raises instead of hanging, with the last checkpoint
    already on disk.
    """
    import optax

    from reart_tpu.models.pointnet2 import init_pointnet2msg2

    frames = jnp.asarray(frames, jnp.float32)
    if cfg.seed_frames:
        frames = frames[: cfg.seed_frames]
    assert frames.shape[1] >= cfg.n_points, (
        f"frames have {frames.shape[1]} points, need >= {cfg.n_points}")
    if cfg.resample and 2 * cfg.n_points > frames.shape[1]:
        import warnings

        warnings.warn(
            f"resample=True with n_points={cfg.n_points} but frames of only "
            f"{frames.shape[1]} points: src/tgt subsets overlap by "
            f"{2 * cfg.n_points - frames.shape[1]} points (at n_points == "
            f"frame size, tgt is a permutation of src and the 'independent "
            f"sampling' premise is gone). Lower n_points or resample.",
            stacklevel=2)
    if mesh is not None:
        assert cfg.batch % mesh.shape["seq"] == 0, (
            f"batch {cfg.batch} not divisible by mesh seq={mesh.shape['seq']}")

    import os

    tx = optax.adam(cfg.lr)  # pure functions of (lr): safe to rebuild on resume
    losses = []
    done = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        params, opt_state, key, done, losses = _load_train_ckpt(
            checkpoint_path)
        if log_fn is not None:
            log_fn(done, float(losses[-1][-1]) if losses else float("nan"))
    else:
        if params is None:
            key, init_key = jax.random.split(key)
            params = init_pointnet2msg2(init_key, out_dim=cfg.out_dim)
        opt_state = tx.init(params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        params, opt_state, frames = jax.device_put(
            (params, opt_state, frames), repl)

    from reart_tpu.train.engine import _call_with_watchdog

    chunks_since_ckpt = 0
    while done < cfg.steps:
        chunk = min(cfg.dispatch_chunk, cfg.steps - done)
        key, sub = jax.random.split(key)
        step_keys = jax.random.split(sub, chunk)
        # re-jit only when the chunk length changes (the tail chunk)
        chunk_cfg = (cfg if chunk == cfg.dispatch_chunk
                     else dataclasses.replace(cfg, dispatch_chunk=chunk))

        def run_chunk():
            p, o, l = _train_chunk(chunk_cfg, tx, mesh, params, opt_state,
                                   frames, step_keys)
            # the host transfer is the completion fence (the only reliable
            # one on axon) — it MUST run inside the watchdogged callable:
            # jit returns right after enqueue, so timing only the dispatch
            # would let a wedged execution hang the main thread instead
            return p, o, np.asarray(l)

        try:
            # daemon watchdog thread (engine.py pattern): on expiry the
            # stuck worker is abandoned, not joined — interpreter shutdown
            # doesn't block on it
            params, opt_state, chunk_losses = _call_with_watchdog(
                run_chunk, cfg.dispatch_timeout)
        except TimeoutError:
            raise RuntimeError(
                f"corr training dispatch exceeded "
                f"{cfg.dispatch_timeout:.0f}s at step {done} — wedged "
                f"tunnel/device? last checkpoint: "
                f"{checkpoint_path or 'none (pass checkpoint_path)'}")
        losses.append(chunk_losses)
        done += chunk
        chunks_since_ckpt += 1
        if checkpoint_path and (chunks_since_ckpt >= cfg.checkpoint_every
                                or done >= cfg.steps):
            _save_train_ckpt(checkpoint_path, params, opt_state, key,
                             done, losses)
            chunks_since_ckpt = 0
        if log_fn is not None:
            log_fn(done, float(losses[-1][-1]))
    return params, np.concatenate(losses)


def match_precision(params, src, tgt, th: float = 0.9, gt_pos=None,
                    pos_radius: float = 0.02):
    """Evaluation: SMNN-match src->tgt features (the exact inference matching,
    flow.match_smnn); returns (precision, match_rate): fraction of VALID
    matches that are correct, and fraction of points matched at all.

    gt_pos=None: identity-corresponding pair, a match i->j is correct iff
    j == i. gt_pos (N, 3): resampled pair, correct iff tgt[j] lies within
    pos_radius of src[i]'s true transformed position gt_pos[i]."""
    from reart_tpu.flow import match_smnn

    feats = apply_pointnet2msg2(params, jnp.stack([src, tgt]))
    f1, f2 = feats[0], feats[1]
    _, j, valid = match_smnn(f1, f2, th)
    if gt_pos is None:
        hit = j == jnp.arange(src.shape[0])
    else:
        err2 = jnp.sum((tgt[j] - gt_pos) ** 2, -1)
        hit = err2 < pos_radius ** 2
    correct = valid & hit
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return (float(jnp.sum(correct) / n_valid),
            float(jnp.mean(valid.astype(jnp.float32))))
