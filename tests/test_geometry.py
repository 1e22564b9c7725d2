"""Geometry core tests: round-trip properties + torch-oracle parity.

The oracle tests run the reference's `screw_se3` torch code (CPU) on random
inputs and compare against our jnp implementations; they are skipped when the
reference checkout or torch is unavailable.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reart_tpu import geometry as G

from conftest import requires_reference, REFERENCE_ROOT


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR of gaussians."""
    a = rng.randn(n, 3, 3)
    q, r = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    return q.astype(np.float64)


def random_transforms(rng, n, t_scale=1.0):
    r = random_rotations(rng, n)
    t = (rng.randn(n, 3) * t_scale).astype(np.float64)
    out = np.zeros((n, 4, 4))
    out[:, :3, :3] = r
    out[:, :3, 3] = t
    out[:, 3, 3] = 1.0
    return out


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------

class TestProperties:
    def test_so3_exp_log_roundtrip(self, rng):
        # keep angles in (0, ~2.4): the log map is ill-conditioned near pi
        # (same limitation as the reference's pytorch3d implementation)
        w = rng.randn(64, 3)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.05, 2.4, (64, 1))
        r = G.so3_exp_map(jnp.asarray(w))
        w2 = G.so3_log_map(r)
        r2 = G.so3_exp_map(w2)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=2e-4)

    def test_se3_exp_log_roundtrip(self, rng):
        log = rng.randn(64, 6) * 0.7
        t = G.se3_exp_map(jnp.asarray(log))
        log2 = G.se3_log_map(t)
        np.testing.assert_allclose(log, np.asarray(log2), atol=1e-3)

    def test_inverse_transformation(self, rng):
        t = jnp.asarray(random_transforms(rng, 32))
        inv = G.inverse_transformation(t)
        eye = jnp.eye(4)[None].repeat(32, 0)
        np.testing.assert_allclose(np.asarray(t @ inv), np.asarray(eye), atol=1e-5)

    def test_rotation_6d_roundtrip(self, rng):
        r = jnp.asarray(random_rotations(rng, 32))
        d6 = G.matrix_to_rotation_6d(r)
        r2 = G.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-6)

    def test_matrix_quaternion_roundtrip(self, rng):
        r = jnp.asarray(random_rotations(rng, 64))
        q = G.matrix_to_quaternion(r)
        # rebuild the rotation from q and compare rotation action
        v = jnp.asarray(rng.randn(64, 3))
        qv = jnp.concatenate([jnp.zeros((64, 1)), v], axis=-1)
        rotated = G.q_mul(G.q_mul(q, qv), G.q_conjugate(q))[..., 1:]
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("nij,nj->ni", r, v)),
            np.asarray(rotated),
            atol=1e-6,
        )

    def test_transform_dq_screw_roundtrip(self, rng):
        """SE(3) -> dq -> screw -> exp coords -> SE(3) must be the identity map
        (away from singularities). This is the pipeline-critical chain:
        build_graph uses it per edge (reference kinematic_utils.py:76-98)."""
        t = jnp.asarray(random_transforms(rng, 128, t_scale=0.5))
        dq = G.transform_to_dq(t)
        l, m, theta, d = G.dq_to_screw(dq)
        t2 = G.screw_transform(l, m, theta, d)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)

    def test_screw_prismatic_pinning(self):
        """θ pinned to 1e-6 with real slide d must produce ~pure translation
        d·l — the numerical-stability trick the whole FK relies on."""
        l = jnp.asarray([[0.0, 0.0, 1.0]])
        m = jnp.zeros((1, 3))
        theta = jnp.asarray([1e-6])
        d = jnp.asarray([0.37])
        t = G.screw_transform(l, m, theta, d)
        np.testing.assert_allclose(np.asarray(t[0, :3, 3]), [0, 0, 0.37], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t[0, :3, :3]), np.eye(3), atol=1e-4)

    def test_screw_revolute_pinning(self):
        """d pinned to 1e-6 with real θ: rotation about the axis through the
        moment-defined point, negligible slide."""
        l = jnp.asarray([[0.0, 0.0, 1.0]])
        m = jnp.zeros((1, 3))  # axis through origin
        theta = jnp.asarray([0.7])
        d = jnp.asarray([1e-6])
        t = G.screw_transform(l, m, theta, d)
        c, s = np.cos(0.7), np.sin(0.7)
        expect = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        np.testing.assert_allclose(np.asarray(t[0, :3, :3]), expect, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t[0, :3, 3]), [0, 0, 0], atol=1e-5)

    def test_dq_to_screw_identity_guard(self):
        """Identity transforms must not produce NaNs and set l_x = 1."""
        t = jnp.eye(4)[None]
        l, m, theta, d = G.dq_to_screw(G.transform_to_dq(t))
        assert np.isfinite(np.asarray(l)).all()
        assert np.isfinite(np.asarray(m)).all()
        np.testing.assert_allclose(np.asarray(l[0, 0]), 1.0)
        np.testing.assert_allclose(np.asarray(theta[0]), 1e-6)

    def test_grad_through_screw_chain(self, rng):
        """Gradients through dq→screw→exp must be finite even with identity
        frames in the batch (the relaxation loop differentiates this)."""
        t0 = np.asarray(random_transforms(rng, 4, t_scale=0.3), dtype=np.float32)

        def loss(x):
            dq = G.transform_to_dq(x)
            l, m, theta, d = G.dq_to_screw(dq)
            t2 = G.screw_transform(l, m, theta, d)
            return jnp.sum((t2 - x) ** 2)

        g = jax.grad(loss)(jnp.asarray(t0))
        assert np.isfinite(np.asarray(g)).all()

    def test_jit_vmap_safe(self, rng):
        t = jnp.asarray(random_transforms(rng, 8), dtype=jnp.float32)

        @jax.jit
        def chain(x):
            dq = G.transform_to_dq(x)
            return G.dq_to_screw(dq)

        l, m, theta, d = chain(t)
        assert l.shape == (8, 3) and theta.shape == (8,)


# ---------------------------------------------------------------------------
# torch-oracle parity
# ---------------------------------------------------------------------------

@requires_reference
class TestTorchParity:
    @classmethod
    def setup_class(cls):
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        import screw_se3 as ref  # noqa
        cls.ref = ref

    def _t(self, x):
        import torch
        return torch.from_numpy(np.asarray(x)).double()

    def _tf(self, x):
        import torch
        return torch.from_numpy(np.asarray(x)).float()

    def test_se3_exp_map(self, rng):
        log = rng.randn(64, 6)
        ours = np.asarray(G.se3_exp_map(jnp.asarray(log)))
        ref = self.ref.se3_exp_map(self._t(log)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rotation_6d(self, rng):
        d6 = rng.randn(64, 6)
        ours = np.asarray(G.rotation_6d_to_matrix(jnp.asarray(d6)))
        ref = self.ref.rotation_6d_to_matrix(self._t(d6)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_matrix_to_quaternion(self, rng):
        r = random_rotations(rng, 64)
        ours = np.asarray(G.matrix_to_quaternion(jnp.asarray(r)))
        from screw_se3.geo_utils import matrix_to_quaternion as ref_fn
        ref = ref_fn(self._t(r)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_transform_to_dq_and_screw(self, rng):
        t = random_transforms(rng, 128, t_scale=0.5)
        dq_ours = np.asarray(G.transform_to_dq(jnp.asarray(t)))
        dq_ref = self.ref.transform_to_dq(self._tf(t)).numpy()
        np.testing.assert_allclose(dq_ours, dq_ref, atol=1e-5)

        l, m, theta, d = G.dq_to_screw(jnp.asarray(dq_ref))
        rl, rm, rtheta, rd = self.ref.dq_to_screw(self._tf(dq_ref))
        np.testing.assert_allclose(np.asarray(l), rl.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m), rm.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(theta), rtheta.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), rd.numpy(), atol=1e-5)

    def test_dq_to_screw_with_identity_rows(self, rng):
        t = random_transforms(rng, 16, t_scale=0.5)
        t[3] = np.eye(4)   # identity row exercises the unit_transform guard
        t[7] = np.eye(4)
        import warnings
        dq = self.ref.transform_to_dq(self._tf(t))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rl, rm, rtheta, rd = self.ref.dq_to_screw(dq)
        l, m, theta, d = G.dq_to_screw(jnp.asarray(dq.numpy()))
        np.testing.assert_allclose(np.asarray(l), rl.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(theta), rtheta.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), rd.numpy(), atol=1e-5)

    def test_screw_to_exp_coords(self, rng):
        t = random_transforms(rng, 64, t_scale=0.5)
        dq = self.ref.transform_to_dq(self._tf(t))
        rl, rm, rtheta, rd = self.ref.dq_to_screw(dq)
        ours = np.asarray(
            G.screw_param_to_exponential_coordinates(
                jnp.asarray(rl.numpy()), jnp.asarray(rm.numpy()),
                jnp.asarray(rtheta.numpy()), jnp.asarray(rd.numpy()),
            )
        )
        ref = self.ref.screw_param_to_exponential_coordinates(rl, rm, rtheta, rd)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)

        t_ours = np.asarray(
            G.transform_from_exponential_coordinates(jnp.asarray(ref.numpy()))
        )
        t_ref = self.ref.transform_from_exponential_coordinates(ref).numpy()
        np.testing.assert_allclose(t_ours, t_ref, atol=1e-5)
