"""Motion-consistency segmentation E-step (models.base_model.refine_seg_motion).

Round-5 feature: the reference-scale projection ablation attributed the
sapien full-flow EPE residual to canonical seg error; the E-step relabels
points by which part's fitted trajectory reconstructs them, guarded so
poorly-converged fits stay untouched (PARITY round 5)."""

import numpy as np
import pytest

from reart_tpu.models.base_model import refine_seg_motion


def _two_part_scene(seed=0, n_per=150, t=4):
    rng = np.random.RandomState(seed)
    body = rng.uniform([-1, -0.3, -0.3], [0, 0.3, 0.3], (n_per, 3))
    arm = rng.uniform([0, -0.3, -0.3], [1, 0.3, 0.3], (n_per, 3))
    cano = np.concatenate([body, arm]).astype(np.float32)
    gt = np.repeat([0, 1], n_per)

    def rotz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    pcs, trans = [], []
    for i in range(1, t + 1):
        r = rotz(0.3 * i)
        pc = cano.copy()
        pc[gt == 1] = pc[gt == 1] @ r.T
        pcs.append(pc)
        tr = np.stack([np.eye(4, dtype=np.float32),
                       np.block([[r, np.zeros((3, 1), np.float32)],
                                 [np.zeros((1, 3), np.float32),
                                  np.ones((1, 1), np.float32)]])])
        trans.append(tr)
    return cano, np.stack(pcs), np.stack(trans), gt


def test_recovers_corrupted_labels():
    cano, pcs, trans, gt = _two_part_scene()
    rng = np.random.RandomState(1)
    seg = gt.copy()
    flip = rng.choice(len(seg), 40, replace=False)
    seg[flip] = 1 - seg[flip]
    assert (seg == gt).mean() < 0.9
    out = np.asarray(refine_seg_motion(cano, pcs, trans, seg, n_it=2))
    assert (out == gt).mean() > 0.98


def test_gapped_label_space():
    """Labels index trans_list columns directly (raw fitted label ids with
    holes, as the finalize passes them)."""
    cano, pcs, trans, gt = _two_part_scene()
    seg = np.where(gt == 0, 3, 7)
    wide = np.zeros((trans.shape[0], 8, 4, 4), np.float32)
    wide[:, 3] = trans[:, 0]
    wide[:, 7] = trans[:, 1]
    rng = np.random.RandomState(2)
    flip = rng.choice(len(seg), 30, replace=False)
    seg[flip] = np.where(seg[flip] == 3, 7, 3)
    out = np.asarray(refine_seg_motion(cano, pcs, wide, seg, n_it=1))
    assert set(np.unique(out)) <= {3, 7}
    assert ((out == 3) == (gt == 0)).mean() > 0.97


def test_floor_guard_inert_on_noise():
    """When every label reconstructs equally (static object, identity poses
    + noise), the absolute floor must keep the E-step from shuffling labels
    on noise — the failure mode measured on a 400-iter toy fit."""
    rng = np.random.RandomState(3)
    cano = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
    pcs = np.stack([cano + 0.001 * rng.randn(200, 3).astype(np.float32)
                    for _ in range(3)])
    trans = np.tile(np.eye(4, dtype=np.float32), (3, 2, 1, 1))
    seg = (cano[:, 0] > 0).astype(np.int64)  # arbitrary spatial split
    out = np.asarray(refine_seg_motion(cano, pcs, trans, seg, n_it=2))
    assert (out == seg).all()


def test_single_part_passthrough():
    cano, pcs, trans, gt = _two_part_scene()
    seg = np.zeros(len(gt), np.int64)
    out = np.asarray(refine_seg_motion(cano, pcs, trans, seg))
    assert (out == 0).all()


def test_holdout_split_properties():
    from reart_tpu.selection import holdout_split

    for t in (2, 3, 5, 9, 12):
        train, held = holdout_split(t)
        assert len(train) and len(held)
        assert not set(train) & set(held)
        assert sorted(set(train) | set(held)) == list(range(t)) or t <= 2
