"""Graph-stage tests: MST/merge/build_graph golden behavior + torch-oracle parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from reart_tpu import graph as GR
from reart_tpu.geometry import se3_exp_tw

from conftest import requires_reference


def make_part_motion(rng, t, p, scale=0.4):
    """Random smooth per-part trajectories (frame 0 near identity)."""
    w = rng.randn(p, 3) * scale
    v = rng.randn(p, 3) * scale
    mags = np.linspace(0, 1, t)[:, None, None]
    wt = (mags * w[None]).reshape(-1, 3).astype(np.float32)
    vt = (mags * v[None]).reshape(-1, 3).astype(np.float32)
    return np.asarray(se3_exp_tw(jnp.asarray(wt), jnp.asarray(vt))).reshape(t, p, 4, 4).copy()


class TestMST:
    def test_chain_cost(self):
        # cost favoring a 0-1-2-3 chain
        c = np.full((4, 4), 10.0)
        for i in range(3):
            c[i, i + 1] = c[i + 1, i] = 1.0 + 0.1 * i
        np.fill_diagonal(c, 1e4)
        edges = GR.mst(c)
        assert len(edges) == 3
        es = {tuple(sorted(e)) for e in edges.tolist()}
        assert es == {(0, 1), (1, 2), (2, 3)}

    def test_max_cost_stops(self):
        c = np.full((3, 3), 5.0)
        c[0, 1] = c[1, 0] = 1.0
        np.fill_diagonal(c, 1e4)
        edges = GR.mst(c, max_cost=2.0)
        assert len(edges) == 1

    def test_uni_label_mapping(self):
        c = np.array([[1e4, 1.0], [1.0, 1e4]])
        edges = GR.mst(c, uni_label=np.array([3, 7]))
        assert {tuple(sorted(edges[0]))} == {(3, 7)}


class TestMergeGraph:
    def test_merges_rigid_edge(self, rng):
        t, p = 5, 3
        trans = make_part_motion(rng, t, p)
        trans[:, 1] = trans[:, 0]  # part 1 rigidly follows part 0
        seg = np.repeat(np.arange(p), 10)
        conn = np.array([[0, 1], [1, 2]])
        new_seg, new_conn = GR.merge_graph(seg, conn, jnp.asarray(trans), merge_thr=1e-3)
        assert 1 not in set(np.unique(new_seg)) or 0 not in set(np.unique(new_seg))
        assert len(np.unique(new_seg)) == 2
        assert len(new_conn) == 1


class TestExtractKinematic:
    def test_relabels(self, rng):
        seg = np.array([2, 2, 5, 5, 9, 9])
        trans = rng.randn(3, 10, 4, 4).astype(np.float32)
        conn = np.array([[2, 5], [5, 9]])
        new_seg, new_trans, new_conn = GR.extract_kinematic(seg, trans, conn)
        np.testing.assert_array_equal(new_seg, [0, 0, 1, 1, 2, 2])
        np.testing.assert_array_equal(new_conn, [[0, 1], [1, 2]])
        assert new_trans.shape == (3, 3, 4, 4)
        np.testing.assert_allclose(new_trans[:, 0], trans[:, 2])


class TestBuildGraph:
    def test_revolute_chain(self, rng):
        """A chain of pure-revolute joints must be typed revolute and the FK
        reconstruction from extracted screws must reproduce the motion."""
        t, p = 6, 3
        # part 0 static; 1 and 2 rotate about different axes
        trans = np.tile(np.eye(4, dtype=np.float32), (t, p, 1, 1))
        for pid, axis in [(1, [0, 0, 1.0]), (2, [0, 1.0, 0])]:
            angles = np.linspace(0.05, 0.9, t).astype(np.float32)
            w = np.asarray(axis, np.float32)[None] * angles[:, None]
            r = np.asarray(se3_exp_tw(jnp.asarray(w), jnp.zeros((t, 3))))
            trans[:, pid] = r
        edges = np.array([[0, 1], [1, 2]])
        g, root, axis, moment, theta, edge_index = GR.build_graph(
            edges, jnp.asarray(trans), root_part=0, revolute_only=True
        )
        assert root == 0
        assert theta.shape == (t, 2)
        # edge 1_0's relative motion is the pure z rotation -> axis recovered
        # up to canonical sign (2_1 composes two rotations, axis not fixed)
        recovered = np.abs(np.asarray(axis))
        np.testing.assert_allclose(recovered[edge_index["1_0"]], [0, 0, 1], atol=1e-4)
        # theta on edge 1_0 matches the generated angles up to sign
        th = np.abs(np.asarray(theta)[:, edge_index["1_0"]])
        np.testing.assert_allclose(th, np.linspace(0.05, 0.9, t), atol=1e-4)
        assert set(edge_index.keys()) == {"1_0", "2_1"}

    def test_prismatic_detection(self, rng):
        t, p = 6, 2
        trans = np.tile(np.eye(4, dtype=np.float32), (t, p, 1, 1))
        slides = np.linspace(0.02, 0.5, t)
        trans[:, 1, 2, 3] = slides  # pure z translation
        edges = np.array([[0, 1]])
        out = GR.build_graph(edges, jnp.asarray(trans), root_part=0,
                             revolute_only=False, return_joint_type=True)
        joint_types = out[7]
        assert joint_types == ["prismatic"]
        distance = np.asarray(out[5])
        np.testing.assert_allclose(np.abs(distance[:, 0]), slides, atol=1e-3)

    def test_prismatic_detection_under_rotation_noise(self, rng):
        """Round 5: a translation carrying a small CONSISTENT fitted-pose
        rotation (the reference-scale drawer: ~3 deg across views) must still
        type prismatic. The reference's screw-derived prismatic hypothesis
        inherits the noise rotation's axis (slide ~0 along it) and loses to
        a far-axis revolute that reconstructs translation+noise exactly; the
        translation-native hypothesis + the axis-sanity override both catch
        it (utils/kinematic_utils.py:89-124 is the protocol being exceeded)."""

        def rotz(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

        t, p = 8, 2
        trans = np.tile(np.eye(4, dtype=np.float32), (t, p, 1, 1))
        for v in range(t):
            trans[v, 1, :3, :3] = rotz(0.008 * v)  # consistent noise rot
            trans[v, 1, 1, 3] = 0.05 * v           # dominant +y slide
        edges = np.array([[0, 1]])
        cano = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
        seg = (cano[:, 1] > 0).astype(np.int64)
        out = GR.build_graph(edges, jnp.asarray(trans), root_part=0,
                             revolute_only=False, return_joint_type=True,
                             cano_pc=cano, seg_part=seg)
        assert out[7] == ["prismatic"], out[7]
        # prismatic axis is the translation direction, not the noise axis
        axis = np.asarray(out[2])[0]
        assert abs(axis[1]) > 0.99, axis
        distance = np.asarray(out[5])[:, 0]
        np.testing.assert_allclose(np.abs(distance), 0.05 * np.arange(t),
                                   atol=5e-3)


@requires_reference
class TestGraphTorchParity:
    @classmethod
    def setup_class(cls):
        import ref_oracle
        ref_oracle.setup_reference_path()
        import torch

        class TorchChamfer:
            """Drop-in for the reference's ChamferDistance (CUDA-free)."""

            def __call__(self, src, tgt, bidirectional=False, reverse=False,
                         return_index=False, reduction="mean"):
                d = torch.cdist(src, tgt) ** 2
                fwd, fidx = d.min(dim=-1)
                if bidirectional or reverse:
                    bwd, bidx = d.min(dim=-2)
                if bidirectional:
                    if return_index:
                        return fwd + bwd, fidx, bidx
                    return fwd + bwd
                if reverse:
                    return (bwd, bidx) if return_index else bwd
                return (fwd, fidx) if return_index else fwd

        cls.chamfer = TorchChamfer()

    def test_mst_parity(self, rng):
        import torch
        from utils.graph_utils import mst as ref_mst
        c = rng.rand(8, 8).astype(np.float32)
        c = c + c.T
        np.fill_diagonal(c, 1e4)
        ours = GR.mst(c)
        ref = ref_mst(torch.from_numpy(c)).numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_mean_screw_param_parity(self, rng):
        import torch
        from utils.graph_utils import compute_mean_screw_param as ref_fn
        t, e = 5, 4
        s = rng.randn(t, e, 3).astype(np.float32)
        m = rng.randn(t, e, 3).astype(np.float32)
        th = rng.rand(t, e).astype(np.float32)
        d = rng.rand(t, e).astype(np.float32)
        th[:, 1] = 1e-6  # identity-ish edge frames
        d[:, 1] = 1e-6
        ours_a, ours_m = GR.compute_mean_screw_param(
            jnp.asarray(s), jnp.asarray(m), jnp.asarray(th), jnp.asarray(d)
        )
        ref_a, ref_m = ref_fn(torch.from_numpy(s), torch.from_numpy(m),
                              torch.from_numpy(th), torch.from_numpy(d))
        np.testing.assert_allclose(np.asarray(ours_a), ref_a.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours_m), ref_m.numpy(), atol=1e-5)

    def test_build_graph_parity(self, rng):
        import torch
        from utils.kinematic_utils import build_graph as ref_build
        t, p = 6, 4
        trans = make_part_motion(rng, t, p, scale=0.5)
        trans[:, 0] = np.eye(4)  # clear root
        edges = np.array([[0, 1], [1, 2], [1, 3]])
        g, root, axis, moment, theta, edge_index = GR.build_graph(
            edges, jnp.asarray(trans), revolute_only=True
        )
        rg, rroot, raxis, rmoment, rtheta, redge_index = ref_build(
            torch.from_numpy(edges), torch.from_numpy(trans), revolute_only=True
        )
        assert root == rroot
        assert edge_index == redge_index
        np.testing.assert_allclose(np.asarray(axis), raxis.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(moment), rmoment.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(theta), rtheta.numpy(), atol=1e-4)

    def test_build_graph_joint_type_parity(self, rng):
        import torch
        from utils.kinematic_utils import build_graph as ref_build
        t, p = 6, 3
        trans = np.tile(np.eye(4, dtype=np.float32), (t, p, 1, 1))
        # part 1 revolute, part 2 prismatic
        angles = np.linspace(0.05, 0.8, t).astype(np.float32)
        w = np.array([0, 0, 1.0], np.float32)[None] * angles[:, None]
        trans[:, 1] = np.asarray(se3_exp_tw(jnp.asarray(w), jnp.zeros((t, 3))))
        trans[:, 2, 0, 3] = np.linspace(0.02, 0.4, t)
        edges = np.array([[0, 1], [0, 2]])
        out = GR.build_graph(edges, jnp.asarray(trans), root_part=0,
                             revolute_only=False, return_joint_type=True)
        rout = ref_build(torch.from_numpy(edges), torch.from_numpy(trans),
                         root_part=0, revolute_only=False, return_joint_type=True)
        assert out[7] == rout[7]  # joint types
        np.testing.assert_allclose(np.asarray(out[4]), rout[4].numpy(), atol=1e-4)  # theta
        np.testing.assert_allclose(np.asarray(out[5]), rout[5].numpy(), atol=1e-4)  # distance

    def test_mst_wrapper_parity(self, rng):
        import torch
        from utils.graph_utils import mst_wrapper as ref_wrapper
        t, p, n_per = 5, 4, 60
        trans = make_part_motion(rng, t, p, scale=0.3)
        seg = np.repeat(np.arange(p), n_per)
        # parts laid out along a line so spatial gating matters
        cano = (rng.rand(p * n_per, 3) * 0.2).astype(np.float32)
        cano[:, 0] += np.repeat(np.arange(p) * 0.21, n_per)
        ours = GR.mst_wrapper(seg, jnp.asarray(trans), jnp.asarray(cano),
                              cano_dist_thr=5e-2, joint_cost_weight=100.0)
        ref = ref_wrapper(
            torch.from_numpy(seg), torch.from_numpy(trans),
            torch.from_numpy(cano), self.chamfer,
            cano_dist_thr=5e-2, joint_cost_weight=100.0,
        ).numpy()
        np.testing.assert_array_equal(np.asarray(ours), ref)

    def test_merging_wrapper_parity(self, rng):
        import torch
        from utils.graph_utils import merging_wrapper as ref_wrapper
        t, p, n_per = 5, 4, 60
        trans = make_part_motion(rng, t, p, scale=0.3)
        trans[:, 2] = trans[:, 1]  # 2 rigidly follows 1 -> mergeable
        seg = np.repeat(np.arange(p), n_per)
        cano = (rng.rand(p * n_per, 3) * 0.2).astype(np.float32)
        cano[:, 0] += np.repeat(np.arange(p) * 0.21, n_per)
        ours = GR.merging_wrapper(seg, jnp.asarray(trans), jnp.asarray(cano),
                                  merge_thr=3e-2)
        ref = ref_wrapper(
            torch.from_numpy(seg.copy()), torch.from_numpy(trans),
            torch.from_numpy(cano), self.chamfer, 3e-2,
        ).numpy()
        np.testing.assert_array_equal(np.asarray(ours), ref)
