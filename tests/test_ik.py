"""IK / retargeting unit tests: recover a known joint angle on a 1-joint
system, and the sparse novel-state sampler's fixed-index protocol."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reart_tpu.ik import ik_solve_base, ik_solve_kinematic, sparse_sample_novel_state
from reart_tpu.models.kinematic import (
    init_kinematic_params,
    kinematic_forward,
    make_kinematic_state,
)


class TestKinematicIK:
    def test_recovers_hinge_angle(self):
        """2 parts, revolute joint about z through the origin: given sparse
        correspondences generated at theta*, IK should recover theta*."""
        rng = np.random.RandomState(0)
        n = 64
        cano = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        seg = (cano[:, 0] > 0).astype(np.int32)

        state = make_kinematic_state(seg, cano, edges=[(1, 0)], root=0)
        params = init_kinematic_params(
            pose_len=2, num_edges=1,
            axis_list=np.array([[0.0, 0.0, 1.0]], np.float32),
            moment_list=np.zeros((1, 3), np.float32),
        )
        theta_true = 0.7
        # target sparse points: rotate part-1 points by theta_true
        c, s = np.cos(theta_true), np.sin(theta_true)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        sparse_idx = np.concatenate([
            np.nonzero(seg == 0)[0][:2], np.nonzero(seg == 1)[0][:2]
        ])
        s_cano = cano[sparse_idx]
        s_novel = s_cano.copy()
        s_novel[2:] = s_novel[2:] @ rot.T

        theta, losses = ik_solve_kinematic(
            params, state, jnp.asarray(s_cano), jnp.asarray(s_novel),
            n_iter=200)
        # full-cloud forward at the solved angle
        pc_trans, _, _ = kinematic_forward(
            params, state, jnp.asarray(cano), theta_list=theta)
        expected = cano.copy()
        expected[seg == 1] = expected[seg == 1] @ rot.T
        err = np.abs(np.asarray(pc_trans[0]) - expected).max()
        assert float(losses[-1]) < 1e-4, float(losses[-1])
        assert err < 0.05, err


class TestBaseIK:
    def test_recovers_rigid_translation(self):
        from reart_tpu.models.base_model import init_base_params

        rng = np.random.RandomState(1)
        cano = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        key = jax.random.PRNGKey(0)
        params = init_base_params(key, num_parts=2, pose_len=3)
        shift = np.array([0.3, -0.2, 0.1], np.float32)
        s_cano = cano[:4]
        s_novel = s_cano + shift
        opt, losses = ik_solve_base(
            params, jnp.asarray(cano), jnp.asarray(s_cano),
            jnp.asarray(s_novel), key, n_iter=200)
        assert float(losses[-1]) < 1e-3


class TestSparseSampler:
    def test_fixed_index_protocol(self):
        rng = np.random.RandomState(2)
        n = 100
        cano = rng.randn(n, 3)
        part = np.repeat([0, 1], n // 2)
        cano_pose = {0: np.eye(4), 1: np.eye(4)}
        novel_pose = {0: np.eye(4), 1: np.eye(4)}
        novel_pose[1] = np.eye(4); novel_pose[1][0, 3] = 1.0  # translate part 1
        out = sparse_sample_novel_state(cano, part, cano_pose, novel_pose)
        # reference protocol: point index 10 within each part (dataset_utils.py:74)
        np.testing.assert_allclose(out["sparse_cano_pc"][0], cano[part == 0][10])
        np.testing.assert_allclose(out["sparse_cano_pc"][1], cano[part == 1][10])
        # part-1 sparse novel point shifted by +1x
        np.testing.assert_allclose(
            out["sparse_novel_pc"][1] - out["sparse_cano_pc"][1], [1, 0, 0], atol=1e-6)
        # full novel cloud moved only for part 1
        np.testing.assert_allclose(out["novel_pc"][part == 0], cano[part == 0])
