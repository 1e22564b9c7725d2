"""Weight-exact parity test of the PointNet2Msg2 backbone vs the reference
torch implementation (networks/feature_extractor.py, networks/
pointnet2_utils.py) run as an oracle with identical weights.

The reference's python FPS fallback randomizes the start index while its CUDA
kernel always starts at 0 (src/sampling_gpu.cu:113-115) — the released model
ran on the CUDA path, so the oracle's FPS is pinned to start at 0 to mirror
the kernel the checkpoint was trained with (our implementation's convention).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import setup_reference_path
from reart_tpu.models.pointnet2 import (
    apply_pointnet2msg2,
    init_pointnet2msg2,
    load_torch_state_dict,
)


@pytest.fixture(scope="module")
def torch_model():
    setup_reference_path()
    import networks.pointnet2_utils as pn2

    # pin the python-fallback FPS start index to 0 (CUDA kernel convention)
    def fps_start0(xyz, npoint):
        device = xyz.device
        B, N, C = xyz.shape
        centroids = torch.zeros(B, npoint, dtype=torch.long).to(device)
        distance = torch.ones(B, N).to(device) * 1e10
        farthest = torch.zeros(B, dtype=torch.long).to(device)
        batch_indices = torch.arange(B, dtype=torch.long).to(device)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
            dist = torch.sum((xyz - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        return centroids

    pn2.farthest_point_sample = fps_start0
    from networks.feature_extractor import PointNet2Msg2

    torch.manual_seed(0)
    model = PointNet2Msg2(out_dim=64)
    model.eval()
    return model


class TestPointNet2Parity:
    def test_features_match_torch(self, torch_model):
        rng = np.random.RandomState(0)
        xyz = rng.randn(2, 1024, 3).astype(np.float32) * 0.3
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(xyz).permute(0, 2, 1))
        ref = ref.permute(0, 2, 1).numpy()  # (B, N, 64)

        params = load_torch_state_dict(torch_model.state_dict())
        ours = np.asarray(apply_pointnet2msg2(params, jnp.asarray(xyz)))
        assert ours.shape == ref.shape
        # identical weights + identical sampling -> near-identical features
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_random_init_runs(self):
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 600, 3))
        out = apply_pointnet2msg2(params, xyz)
        assert out.shape == (1, 600, 64)
        assert bool(jnp.all(jnp.isfinite(out)))
        assert float(jnp.min(out)) >= 0.0  # final relu

    def test_jit_and_vmap_safe(self):
        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        xyz = jax.random.normal(jax.random.PRNGKey(1), (3, 520, 3))
        f = jax.jit(apply_pointnet2msg2)
        out = f(params, xyz)
        assert out.shape == (3, 520, 64)


class TestTorchExport:
    def test_export_loads_strict_and_matches(self, torch_model):
        """export_torch_state_dict round-trip: our random-init tree ->
        reference PointNet2Msg2.load_state_dict(strict=True) -> identical
        features both ways (so a train/corr.py backbone flows BACK to
        reference users)."""
        from reart_tpu.models.pointnet2 import export_torch_state_dict

        params = init_pointnet2msg2(jax.random.PRNGKey(5))
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_torch_state_dict(params).items()}
        torch_model.load_state_dict(sd, strict=True)
        torch_model.eval()

        rng = np.random.RandomState(3)
        xyz = rng.randn(2, 1024, 3).astype(np.float32) * 0.3
        ours = np.asarray(apply_pointnet2msg2(params, jnp.asarray(xyz)))
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(xyz).permute(0, 2, 1))
        ref = ref.permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_export_import_identity(self):
        """load_torch_state_dict(export_torch_state_dict(p)) == p."""
        from reart_tpu.models.pointnet2 import (
            export_torch_state_dict,
            load_torch_state_dict,
        )

        params = init_pointnet2msg2(jax.random.PRNGKey(6))
        back = load_torch_state_dict(export_torch_state_dict(params))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_save_corr_model_torch_file(self, tmp_path):
        """The torch-format file loads through BOTH load_corr_model (ours)
        and a raw torch.load."""
        import torch as _torch

        from reart_tpu.models.pointnet2 import (
            load_corr_model,
            save_corr_model_torch,
        )

        params = init_pointnet2msg2(jax.random.PRNGKey(7))
        path = str(tmp_path / "corr_model.pth.tar")
        save_corr_model_torch(path, params)
        loaded = load_corr_model(path)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        raw = _torch.load(path, map_location="cpu", weights_only=False)
        assert "state_dict" in raw
