"""Synthetic articulated-scene generator (mbs-sapien format).

The reference validates its sapien pipeline on the released mbs-sapien
scans (dataset/dataset_sapien.py; ~8 views x 4096 points x multi-part
scenes with camera motion). Those files are not redistributable, so this
module builds scenes with the same format, scale, and joint statistics —
box-sampled rigid parts articulated by revolute/prismatic joints, observed
in a MOVING camera frame — for tests, benchmarks, and TPU drives
(tests/test_cli_sapien_real.py, scripts/sapien_fullscale.sh).

Layout written: <root>/meta.json {"test": [0]}, <root>/data/000000.npz
with pc (V, N, 3) float32 in each view's CAMERA frame, segm (V, N)
1-based part ids, trans object dict {"cam": [V 4x4], 1..P: [V 4x4]}
(world-frame part motions), plus <root>/flow.npz holding GT
consecutive-pair correspondence flow at the --flow_file provider boundary
(utils/sapien_utils.py:80-108 is the reference's learned-flow equivalent).
"""

from __future__ import annotations

import json
import os

import numpy as np


def _rotz4(a):
    return np.array([
        [np.cos(a), -np.sin(a), 0, 0],
        [np.sin(a), np.cos(a), 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ])


def _trans4(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def _pivot_rotz(a, pivot):
    return _trans4(pivot) @ _rotz4(a) @ _trans4(-np.asarray(pivot))


# (box lo, box hi, motion kind, motion parameter) per part; part 1 is the
# static body, two joints are PRISMATIC (drawer +y, slider +x) — matching
# the reference data's mix of revolute and prismatic articulations.
# Motion RATES are per view; over the default 8 views each joint sweeps a
# realistic articulation range (lid ~40 deg, drawer ~0.35 of the body
# scale, flap ~48 deg) — real scans articulate joints by bounded fractions
# of their range within one sequence, and per-sequence chamfer+pairwise-
# flow optimization (the reference method itself) is not posed for e.g. a
# 120-degree lid sweep (measured: the fit diverges there, PARITY round 4).
_PARTS = (
    ((-0.6, -0.4, -0.3), (0.6, 0.4, 0.3), "static", None),
    ((-0.6, -0.4, 0.3), (0.6, 0.4, 0.45), "revolute",
     (0.10, (-0.6, 0.0, 0.3))),                      # lid, back-edge hinge
    ((-0.5, 0.4, -0.25), (0.5, 0.75, 0.0), "prismatic",
     (0.05, (0.0, 1.0, 0.0))),                       # drawer, +y
    ((0.6, -0.4, -0.3), (0.75, 0.4, 0.25), "revolute",
     (-0.09, (0.6, -0.4, 0.0))),                     # door, front hinge
    ((-0.45, -0.75, -0.2), (0.45, -0.4, 0.0), "prismatic",
     (0.04, (1.0, 0.0, 0.0))),                       # slider tray, +x
    ((-0.2, -0.15, 0.45), (0.2, 0.15, 0.6), "revolute",
     (0.12, (0.0, 0.0, 0.45))),                      # top flap
)


def _part_pose(kind, param, v):
    if kind == "static":
        return np.eye(4)
    if kind == "revolute":
        rate, pivot = param
        return _pivot_rotz(rate * v, pivot)
    rate, axis = param
    return _trans4(rate * v * np.asarray(axis))


def make_sapien_scene(root: str, n_views: int = 8, n_points: int = 4096,
                      n_parts: int = 6, seed: int = 0,
                      cam_rot: float = 0.06, cam_trans: float = 0.03):
    """Write one mbs-sapien-format scene under `root`; returns root.

    n_parts <= 6 selects a prefix of the part table (>= 4 keeps both
    prismatic joints). Camera pose per view: rotz(cam_rot*v) followed by a
    translation of cam_trans*v along (+x, -y) — the raw views are NOT
    model-aligned, like the real scans.
    """
    assert 2 <= n_parts <= len(_PARTS)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    rng = np.random.RandomState(seed)
    n_per = n_points // n_parts
    clouds, seg = [], []
    for pid, (lo, hi, _, _) in enumerate(_PARTS[:n_parts]):
        n = n_per if pid else n_points - n_per * (n_parts - 1)
        clouds.append(rng.uniform(lo, hi, (n, 3)))
        seg.append(np.full(n, pid + 1))
    cano = np.concatenate(clouds).astype(np.float64)
    segm1 = np.concatenate(seg)

    pcs, segms = [], []
    trans = {"cam": [], **{p: [] for p in range(1, n_parts + 1)}}
    for v in range(n_views):
        cam = _rotz4(cam_rot * v) @ _trans4([cam_trans * v,
                                             -cam_trans * v, 0.0])
        trans["cam"].append(cam)
        homo = np.concatenate([cano, np.ones((len(cano), 1))], 1)
        world = homo.copy()
        for pid, (_, _, kind, param) in enumerate(_PARTS[:n_parts]):
            m = _part_pose(kind, param, v)
            trans[pid + 1].append(m)
            selp = segm1 == pid + 1
            world[selp] = homo[selp] @ m.T
        pcs.append((world @ np.linalg.inv(cam).T)[:, :3].astype(np.float32))
        segms.append(segm1)
    np.savez(os.path.join(root, "data", "000000.npz"), pc=np.stack(pcs),
             segm=np.stack(segms), trans=np.asarray(trans, dtype=object))
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"test": [0]}, f)
    # GT consecutive-pair correspondence flow (the --flow_file boundary)
    flow = (np.stack(pcs)[1:] - np.stack(pcs)[:-1]).astype(np.float32)
    np.savez(os.path.join(root, "flow.npz"), flow=flow,
             conf=np.ones(flow.shape[:2], np.float32))
    return root
