"""Parity against the reference's RELEASED fitted models (demo_data/
pretrained/nao): weight-exact forward agreement and metric agreement on the
bundled result — the strongest interop evidence available without GPUs.

Skipped when the reference checkout is absent.
"""

import os
import pickle

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import setup_reference_path
from reart_tpu import checkpoint as ckpt

NAO = "/root/reference/demo_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(NAO), reason="reference demo data not available"
)


class FakeKNN:
    """Drop-in for knn_cuda.KNN(transpose_mode=True): brute-force torch."""

    def __init__(self, k=1, transpose_mode=True):
        self.k = k

    def __call__(self, ref, query):
        d = torch.cdist(query, ref)
        dist, idx = torch.topk(d, self.k, dim=-1, largest=False)
        return dist, idx


@pytest.fixture(scope="module")
def bundled_result():
    with open(os.path.join(NAO, "pretrained/nao/base-2/result_14999.pkl"), "rb") as f:
        return pickle.load(f)


class TestBaseCheckpointInterop:
    def test_forward_matches_reference(self):
        """Our base forward with their fitted weights == their BaseModel
        forward (deterministic part: transforms; gumbel sampling differs, so
        compare per-part transformed clouds and logits)."""
        setup_reference_path()
        from networks.model import BaseModel

        path = os.path.join(NAO, "pretrained/nao/base-2/model.pth.tar")
        params, tau, cano_idx = ckpt.load_torch_base(path)
        assert cano_idx == 2 and tau == 1.0

        torch_ckpt = torch.load(path, map_location="cpu", weights_only=False)
        model = BaseModel(num_parts=20, pose_len=9)
        model.load_state_dict(torch_ckpt["state_dict"], strict=False)
        model.eval()

        with open(os.path.join(NAO, "pretrained/nao/base-2/result_14999.pkl"), "rb") as f:
            cano_pc = pickle.load(f)["cano_pc"]

        # seg logits parity
        from reart_tpu.models.base_model import base_seg_logits

        ours_logits = np.asarray(base_seg_logits(params, jnp.asarray(cano_pc)))
        with torch.no_grad():
            ref_logits = model.seg_forward(torch.from_numpy(cano_pc)).numpy()
        np.testing.assert_allclose(ours_logits, ref_logits, rtol=1e-3, atol=1e-5)

        # per-part transform parity (rotation_6d -> (T, P, 4, 4))
        from reart_tpu.geometry import rotation_6d_to_matrix, rt_to_transform

        ours_trans = np.asarray(rt_to_transform(
            rotation_6d_to_matrix(params["proposal_6d"]), params["proposal_t"]))
        with torch.no_grad():
            _, _, ref_trans = model(torch.from_numpy(cano_pc), tau=1.0)
        np.testing.assert_allclose(ours_trans, ref_trans.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestKinematicCheckpointInterop:
    def test_fk_matches_reference(self):
        """Compiled-tree FK with their fitted screws == the reference's
        python-graph-walk FK + full forward (weight-exact, 4096 points)."""
        setup_reference_path()
        from networks.model import KinematicModel

        path = os.path.join(NAO, "pretrained/nao/kinematic-2/model.pth.tar")
        params, state, tau, cano_idx = ckpt.load_torch_kinematic(path)
        assert state.num_parts == 10 and state.num_edges == 9

        torch_ckpt = torch.load(path, map_location="cpu", weights_only=False)
        model = KinematicModel(
            pose_len=9, seg_part=torch_ckpt["seg_part"],
            cano_pc=torch_ckpt["cano_pc"], knn=FakeKNN(k=1),
            edge_index=torch_ckpt["edge_index"],
            paths_to_base=torch_ckpt["paths_to_base"],
            reverse_topo=torch_ckpt["reverse_topo"])
        model.load_state_dict(torch_ckpt["state_dict"], strict=True)
        model.eval()

        cano = torch_ckpt["cano_pc"]
        with torch.no_grad():
            ref_pc, ref_seg, ref_trans = model(cano)

        from reart_tpu.models.kinematic import kinematic_forward

        ours_pc, ours_seg, ours_trans = kinematic_forward(
            params, state, jnp.asarray(np.asarray(cano)))
        np.testing.assert_array_equal(np.asarray(ours_seg), ref_seg.numpy())
        np.testing.assert_allclose(np.asarray(ours_trans), ref_trans.numpy(),
                                   rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ours_pc), ref_pc.numpy(),
                                   rtol=1e-3, atol=2e-4)


class TestMetricParityOnBundledResult:
    """Our metric implementations on the reference's own predictions must
    agree with the reference's metric implementations (torch oracle)."""

    def test_eval_flow_and_seg(self, bundled_result):
        r = bundled_result
        setup_reference_path()
        import utils.eval_utils as ref_eval

        from reart_tpu.models.base_model import compute_pc_transform

        pred = np.asarray(compute_pc_transform(
            jnp.asarray(r["cano_pc"]), jnp.asarray(r["pred_pose_list"]),
            jnp.asarray(r["pred_cano_part"])))
        cano_idx = r["cano_idx"]
        complete_pred = np.concatenate(
            [pred[:cano_idx], r["cano_pc"][None], pred[cano_idx:]], 0)
        pred_flow = complete_pred[1:] - complete_pred[:-1]

        from reart_tpu.metrics import compute_chamfer_list, eval_flow, eval_seg

        ours = eval_flow(pred_flow, r["gt_flow_list"], 0.005, 0.01)
        ref = ref_eval.eval_flow(pred_flow, r["gt_flow_list"],
                                 acc1_thre=0.005, acc2_thre=0.01)
        np.testing.assert_allclose(ours, [float(x) for x in ref], rtol=1e-5)

        ours_ri = eval_seg(jnp.asarray(r["gt_cano_part"]),
                           jnp.asarray(r["pred_cano_part"]))
        ref_ri = float(ref_eval.eval_seg(
            torch.from_numpy(r["gt_cano_part"]).long(),
            torch.from_numpy(r["pred_cano_part"]).long()))
        np.testing.assert_allclose(ours_ri, ref_ri, rtol=1e-6)

        ours_cd = compute_chamfer_list(pred, r["pc_list"], reduction="mean")
        ref_cd = float(ref_eval.compute_chamfer_list(pred, r["pc_list"],
                                                     reduction="mean"))
        np.testing.assert_allclose(ours_cd, ref_cd, rtol=1e-4)

    def test_ted_on_bundled_tree(self, bundled_result):
        """Our TED on their predicted tree vs the nao GT graph; the bundled
        10-part prediction of the 14-part GT has a known small distance."""
        r = bundled_result
        from reart_tpu.data.common import load_gt_graph
        from reart_tpu.graph.costs import compute_root_cost
        from reart_tpu.graph.ted import compute_ted, find_root_node

        root_cost = np.asarray(compute_root_cost(jnp.asarray(r["pred_pose_list"])))
        pred_root = int(np.unique(np.asarray(r["joint_connection"]))[root_cost.argmin()])
        _, gt_edges = load_gt_graph(os.path.join(NAO, "data/nao"))
        ted = compute_ted([list(e) for e in r["joint_connection"]], pred_root,
                          gt_edges, find_root_node(gt_edges))
        # 10 predicted parts vs 14 GT parts: at least 4 insertions needed
        assert 4 <= ted <= 8, ted