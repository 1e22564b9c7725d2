"""Tests for checkpointing, viz artifacts, mesh IO, and the sapien helpers."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reart_tpu import checkpoint as ckpt
from reart_tpu import viz


class TestCheckpoint:
    def test_base_roundtrip(self, tmp_path):
        from reart_tpu.models.base_model import init_base_params

        params = init_base_params(jax.random.PRNGKey(0), 4, 3)
        path = str(tmp_path / "model.ckpt.pkl")
        ckpt.save_checkpoint(path, params, tau=1.5, cano_idx=2)
        payload = ckpt.load_checkpoint(path)
        assert payload["tau"] == 1.5 and payload["cano_idx"] == 2
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            params, payload["state_dict"],
        )

    def test_kinematic_state_roundtrip(self, tmp_path):
        from reart_tpu.models.kinematic import make_kinematic_state

        seg = np.array([0, 0, 1, 1, 2, 2])
        cano = np.random.RandomState(0).randn(6, 3).astype(np.float32)
        state = make_kinematic_state(seg, cano, [(1, 0), (2, 1)], root=0,
                                     joint_types=["revolute", "prismatic"])
        path = str(tmp_path / "kin.ckpt.pkl")
        ckpt.save_checkpoint(path, {"theta_list": jnp.zeros((3, 2))}, 1.0, 0,
                             state=state)
        restored = ckpt.restore_kinematic_state(ckpt.load_checkpoint(path))
        assert restored.edges == state.edges
        assert restored.reverse_topo == state.reverse_topo
        np.testing.assert_array_equal(np.asarray(restored.path_edges),
                                      np.asarray(state.path_edges))
        np.testing.assert_array_equal(np.asarray(restored.prismatic_mask),
                                      np.asarray(state.prismatic_mask))

    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from reart_tpu.models.base_model import init_base_params

        params = init_base_params(jax.random.PRNGKey(0), 4, 3)
        payload = {"state_dict": params, "tau": 1.5, "cano_idx": 2}
        ckpt.save_orbax(str(tmp_path / "orbax"), payload)
        restored = ckpt.load_orbax(str(tmp_path / "orbax"))
        assert float(restored["tau"]) == 1.5
        assert int(restored["cano_idx"]) == 2
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            params, restored["state_dict"],
        )

    def test_result_schema(self, tmp_path):
        path = str(tmp_path / "result.pkl")
        sample = {"cano_pc": np.zeros((5, 3), np.float32)}
        ckpt.save_result(path, np.zeros(5, np.int64), np.zeros((2, 3, 4, 4)),
                         1, [[1, 0], [2, 0]], sample)
        with open(path, "rb") as f:
            r = pickle.load(f)
        # the reference hand-off schema (run_robot.py:323-331)
        for k in ("pred_cano_part", "pred_pose_list", "cano_idx",
                  "joint_connection", "cano_pc"):
            assert k in r, k
        assert r["joint_connection"] == [[1, 0], [2, 0]]


class TestViz:
    @pytest.fixture
    def cloud(self):
        rng = np.random.RandomState(0)
        return rng.randn(200, 3).astype(np.float32), rng.randint(0, 3, 200)

    def test_vis_pc_html(self, cloud, tmp_path):
        pc, part = cloud
        path = str(tmp_path / "seg.html")
        viz.vis_pc(pc, part, gt_part=part, save_path=path)
        html = open(path).read()
        assert "<canvas" in html or "plotly" in html.lower()
        assert os.path.getsize(path) > 1000

    def test_vis_structure_html(self, cloud, tmp_path):
        pc, part = cloud
        path = str(tmp_path / "structure.html")
        viz.vis_structure(pc, part, [[1, 0], [2, 0]], save_path=path)
        assert os.path.getsize(path) > 1000

    def test_vis_pc_seq_gif(self, cloud, tmp_path):
        pc, part = cloud
        seq = np.stack([pc + 0.1 * i for i in range(3)])
        path = str(tmp_path / "recon.gif")
        viz.vis_pc_seq(seq, pred_part=part, save_path=path)
        with open(path, "rb") as f:
            assert f.read(6) in (b"GIF87a", b"GIF89a")


class TestMeshIO:
    def test_obj_roundtrip_and_sampling(self, tmp_path):
        from reart_tpu.data.mesh import load_mesh, sample_surface

        obj = tmp_path / "tri_0.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n")
        verts, faces = load_mesh(str(obj))
        assert verts.shape == (4, 3) and faces.shape == (2, 3)
        pts = sample_surface(verts, faces, 500)
        assert pts.shape == (500, 3)
        # all samples on the unit-square z=0 patch
        assert np.all(pts[:, 2] == 0)
        assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1

    def test_real_sequence(self, tmp_path):
        from reart_tpu.data.real import RealSequence

        for i in range(3):
            (tmp_path / f"frame_{i}.obj").write_text(
                f"v {i * 0.1} 0 0\nv {1 + i * 0.1} 0 0\nv {i * 0.1} 1 0\nf 1 2 3\n")
        ds = RealSequence(str(tmp_path), num_points=64, cano_idx=0)
        s = ds[0]
        assert s["complete_pc_list"].shape == (3, 64, 3)
        assert s["pc_list"].shape == (2, 64, 3)
        assert np.isfinite(ds.scale) and ds.scale > 0


class TestSapienHelpers:
    def test_full_flow_identity(self):
        """Static object: all pairwise flows are zero."""
        from reart_tpu.sapien_eval import compute_full_flow

        rng = np.random.RandomState(0)
        pcs = np.tile(rng.randn(1, 32, 3).astype(np.float32), (3, 1, 1))
        seg = np.zeros((3, 32), np.int32)
        trans = np.tile(np.eye(4, dtype=np.float32)[None, None], (3, 1, 1, 1))
        flow = np.asarray(compute_full_flow(pcs, seg, trans))
        assert flow.shape == (9, 32, 3)
        np.testing.assert_allclose(flow, 0.0, atol=1e-6)

    def test_full_flow_translation(self):
        from reart_tpu.sapien_eval import compute_full_flow, eval_full_flow

        rng = np.random.RandomState(1)
        pc = rng.randn(16, 3).astype(np.float32)
        # one part translated by +1x per frame: trans[t] maps cano -> frame t
        trans = np.tile(np.eye(4, dtype=np.float32)[None, None], (2, 1, 1, 1))
        trans[1, 0, 0, 3] = 1.0
        pcs = np.stack([pc, pc + [1, 0, 0]]).astype(np.float32)
        seg = np.zeros((2, 16), np.int32)
        flow = np.asarray(compute_full_flow(pcs, seg, trans))
        # view 0 -> view 1 flow should be +1x
        np.testing.assert_allclose(flow[1], [[1, 0, 0]] * 16, atol=1e-5)
        gt = flow.copy()
        assert eval_full_flow(flow, gt) == 0.0

    def test_align_trans(self):
        from reart_tpu.sapien_eval import compute_align_trans

        rng = np.random.RandomState(2)
        t_list = np.tile(np.eye(4, dtype=np.float32)[None, None], (3, 2, 1, 1))
        t_list[:, 0, :3, 3] = rng.randn(3, 3)
        aligned = np.asarray(compute_align_trans(jnp.asarray(t_list),
                                                 jnp.asarray(t_list[:, 0])))
        np.testing.assert_allclose(aligned[:, 0],
                                   np.tile(np.eye(4), (3, 1, 1)), atol=1e-6)
