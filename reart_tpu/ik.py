"""Inverse kinematics / retargeting to novel states.

Parity target: utils/kinematic_utils.py:201-267 (`ik`) and the sparse novel
state sampler (utils/dataset_utils.py:55-88). The reference runs a 200-iter
Adam(amsgrad) Python loop per novel pose; here the whole optimization is one
`lax.scan` jitted per model — and all novel states of a sequence can be
solved in a single vmapped program (the per-state problems are independent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from reart_tpu.data.common import sparse_sample_novel_state  # noqa: F401
from reart_tpu.models.base_model import IDENTITY_6D, base_forward
from reart_tpu.models.kinematic import PIN, kinematic_forward


def _solve(loss_fn, opt_params, n_iter: int, lr: float):
    """Adam(amsgrad) scan (reference: Adam(lr=0.1, amsgrad=True), 200 iters)."""
    tx = optax.amsgrad(lr)
    opt_state = tx.init(opt_params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    (opt_params, _), losses = jax.lax.scan(
        step, (opt_params, opt_state), None, length=n_iter
    )
    return opt_params, losses


@functools.partial(jax.jit, static_argnames=("n_iter",))
def ik_solve_kinematic(params, state, sparse_cano_pc, sparse_novel_pc,
                       n_iter: int = 200, lr: float = 1e-1):
    """Optimize a (1, E) theta override so FK carries the sparse canonical
    points onto the sparse novel points (kinematic branch of `ik`,
    kinematic_utils.py:229-234)."""
    theta0 = jnp.full((1, params["theta_list"].shape[1]), PIN, jnp.float32)

    def loss_fn(theta):
        pc_trans, _, _ = kinematic_forward(
            params, state, sparse_cano_pc, theta_list=theta
        )
        return jnp.sum((pc_trans[0] - sparse_novel_pc) ** 2)

    return _solve(loss_fn, theta0, n_iter, lr)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def ik_solve_base(params, cano_pc, sparse_cano_pc, sparse_novel_pc, key,
                  tau: float = 1.0, n_iter: int = 200, lr: float = 1e-1):
    """Base-model branch: optimize free single-frame proposals
    (kinematic_utils.py:216-227)."""
    p = params["proposal_6d"].shape[1]
    opt0 = {
        "proposal_6d": jnp.tile(jnp.asarray(IDENTITY_6D)[None, None], (1, p, 1)),
        "proposal_t": jnp.zeros((1, p, 3)),
    }

    def loss_fn(opt):
        pc_trans, _, _ = base_forward(
            params, sparse_cano_pc, key, tau,
            proposal_6d=opt["proposal_6d"], proposal_t=opt["proposal_t"],
        )
        return jnp.sum((pc_trans[0] - sparse_novel_pc) ** 2)

    return _solve(loss_fn, opt0, n_iter, lr)


def ik(dataset, model_kind: str, params, state=None, key=None, tau: float = 1.0,
       n_iter: int = 200, save_dir=None, save_vis: bool = False,
       verbose: bool = False) -> float:
    """Full retargeting eval over a dataset's novel poses (kinematic_utils.py:
    201-267). Returns mean retarget error x100 (cm)."""
    sample = dataset[0]
    cano_pose = dataset.pose_list[dataset.cano_idx]
    cano_pc = jnp.asarray(sample["cano_pc"], jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    errs = []
    for novel_state, novel_pose in enumerate(dataset.novel_pose_list):
        novel = sparse_sample_novel_state(
            sample["cano_pc"], sample["gt_cano_part"], cano_pose, novel_pose
        )
        s_cano = jnp.asarray(novel["sparse_cano_pc"])
        s_novel = jnp.asarray(novel["sparse_novel_pc"])
        if model_kind == "kinematic":
            theta, _ = ik_solve_kinematic(params, state, s_cano, s_novel, n_iter=n_iter)
            pc_trans, seg_part, _ = kinematic_forward(
                params, state, cano_pc, theta_list=theta
            )
        else:
            opt, _ = ik_solve_base(params, cano_pc, s_cano, s_novel, key,
                                   tau=tau, n_iter=n_iter)
            pc_trans, seg_part, _ = base_forward(
                params, cano_pc, key, tau,
                proposal_6d=opt["proposal_6d"], proposal_t=opt["proposal_t"],
            )
        pred = np.asarray(pc_trans[0])
        err = 100.0 * float(
            np.sqrt(((pred - novel["novel_pc"]) ** 2).sum(axis=-1)).mean()
        )
        if verbose:
            print(f"Novel retarget err: {err:.3f}")
        errs.append(err)
        if save_vis and save_dir is not None:
            from reart_tpu.viz import vis_pc

            import os
            os.makedirs(save_dir, exist_ok=True)
            vis_pc(pred, np.asarray(seg_part), pc_gt=novel["novel_pc"],
                   gt_part=sample["gt_cano_part"],
                   save_path=os.path.join(save_dir, f"novel_{novel_state}.html"))
    return float(np.mean(errs)) if errs else 9999.0
