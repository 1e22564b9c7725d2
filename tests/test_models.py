"""Base / kinematic model tests: shape contracts, blend equivalence, FK parity."""

import numpy as np
import jax
import jax.numpy as jnp

from reart_tpu.models import (
    init_base_params,
    base_forward,
    init_kinematic_params,
    kinematic_forward,
)
from reart_tpu.models.base_model import compute_pc_transform, transform_points_blend
from reart_tpu.models.kinematic import make_kinematic_state, fk, compile_tree

from conftest import requires_reference


class TestBaseModel:
    def test_forward_shapes_and_identity_init(self, rng):
        key = jax.random.PRNGKey(0)
        n, p, t = 128, 5, 4
        params = init_base_params(key, p, t)
        pc = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        pc_trans, seg, trans = base_forward(params, pc, key, tau=1.0)
        assert pc_trans.shape == (t, n, 3)
        assert seg.shape == (n,)
        assert trans.shape == (t, p, 4, 4)
        # identity-initialized proposals must reproduce the input cloud
        np.testing.assert_allclose(
            np.asarray(pc_trans), np.tile(np.asarray(pc)[None], (t, 1, 1)), atol=1e-5
        )

    def test_blend_matches_naive(self, rng):
        """The blended-matrix formulation must equal the reference's
        (T, P, N, 3) materialize-then-weight (model.py:63-69)."""
        n, p, t = 64, 4, 3
        w = jax.nn.softmax(jnp.asarray(rng.randn(n, p).astype(np.float32)), -1)
        trans = np.tile(np.eye(4, dtype=np.float32), (t, p, 1, 1))
        trans[..., :3, :3] += 0.1 * rng.randn(t, p, 3, 3).astype(np.float32)
        trans[..., :3, 3] = rng.randn(t, p, 3).astype(np.float32)
        pc = rng.randn(n, 3).astype(np.float32)
        ours = np.asarray(transform_points_blend(w, jnp.asarray(trans), jnp.asarray(pc)))
        per_part = np.einsum("tpij,nj->tpni", trans[..., :3, :3], pc) + trans[:, :, None, :3, 3]
        ref = np.einsum("np,tpni->tni", np.asarray(w), per_part)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_gumbel_hard_is_onehot_with_st_grad(self, rng):
        from reart_tpu.models import gumbel_softmax
        key = jax.random.PRNGKey(1)
        logits = jnp.asarray(rng.randn(50, 8).astype(np.float32))
        y = gumbel_softmax(key, logits, tau=2.0, hard=True)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-6)
        # hard output is one-hot in the forward pass (up to fp reassociation)
        ynp = np.asarray(y)
        assert (np.isclose(ynp, 1.0, atol=1e-6).sum(-1) == 1).all()
        assert np.isclose(np.sort(ynp, -1)[:, :-1], 0.0, atol=1e-6).all()
        # gradient flows (straight-through)
        g = jax.grad(lambda l: jnp.sum(gumbel_softmax(key, l, 2.0, True) ** 2))(logits)
        assert np.abs(np.asarray(g)).sum() > 0


def chain_edges(p):
    """0 <- 1 <- 2 ... (child, parent) pairs, root = 0."""
    return [(i, i - 1) for i in range(1, p)]


def star_edges(p):
    return [(i, 0) for i in range(1, p)]


class TestCompileTree:
    def test_chain(self):
        pe, topo = compile_tree(chain_edges(4), root=0, num_parts=4)
        assert pe.shape == (4, 3)
        e = 3  # pad value
        np.testing.assert_array_equal(pe[0], [e, e, e])
        np.testing.assert_array_equal(pe[3], [2, 1, 0])
        assert topo[0] == 0

    def test_star(self):
        pe, _ = compile_tree(star_edges(5), root=0, num_parts=5)
        assert pe.shape == (5, 1)
        np.testing.assert_array_equal(pe[:, 0], [4, 0, 1, 2, 3])


class TestKinematicFK:
    def _random_model(self, rng, edges, p, t, prismatic=None):
        e = len(edges)
        seg = np.arange(p).repeat(8)
        cano = rng.randn(len(seg), 3).astype(np.float32)
        state = make_kinematic_state(seg, cano, edges, root=0, joint_types=prismatic)
        axis = rng.randn(e, 3).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        moment = 0.3 * rng.randn(e, 3).astype(np.float32)
        theta = 0.5 * rng.randn(t, e).astype(np.float32)
        dist = 0.3 * rng.randn(t, e).astype(np.float32)
        params = init_kinematic_params(
            t, e, axis_list=axis, moment_list=moment, theta_list=theta,
            distance_list=dist if prismatic is not None else None,
        )
        return state, params, (axis, moment, theta, dist)

    def test_fk_shapes_root_identity(self, rng):
        state, params, _ = self._random_model(rng, chain_edges(5), 5, 3)
        trans = fk(params, state)
        assert trans.shape == (3, 5, 4, 4)
        np.testing.assert_allclose(
            np.asarray(trans[:, 0]), np.tile(np.eye(4), (3, 1, 1)), atol=1e-6
        )

    def test_fk_chain_composition(self, rng):
        """pose of part k must equal the left-product of edge transforms."""
        from reart_tpu.geometry.screw import screw_transform
        state, params, (axis, moment, theta, _) = self._random_model(
            rng, chain_edges(4), 4, 2
        )
        trans = np.asarray(fk(params, state))
        t_frames = 2
        edge_t = np.asarray(
            screw_transform(
                jnp.broadcast_to(jnp.asarray(axis)[None], (t_frames, 3, 3)),
                jnp.broadcast_to(jnp.asarray(moment)[None], (t_frames, 3, 3)),
                jnp.asarray(theta),
                jnp.full((t_frames, 3), 1e-6),
            )
        )
        # part 3 path edges: [2, 1, 0] child-first -> pose = T0 @ T1 @ T2
        for tt in range(t_frames):
            expect = edge_t[tt, 0] @ edge_t[tt, 1] @ edge_t[tt, 2]
            np.testing.assert_allclose(trans[tt, 3], expect, atol=1e-5)

    def test_forward_contract(self, rng):
        state, params, _ = self._random_model(rng, star_edges(3), 3, 4)
        pc = jnp.asarray(rng.randn(24, 3).astype(np.float32))
        pc_trans, seg, trans = kinematic_forward(params, state, pc)
        assert pc_trans.shape == (4, 24, 3)
        assert trans.shape == (4, 3, 4, 4)

    def test_prismatic_mask(self, rng):
        state, params, (axis, moment, theta, dist) = self._random_model(
            rng, chain_edges(3), 3, 2, prismatic=["revolute", "prismatic"]
        )
        trans = np.asarray(fk(params, state))
        # part 2's edge (idx 1) is prismatic: its relative motion from part 1
        # must be ~pure translation dist * axis
        rel = np.linalg.inv(trans[0, 1]) @ trans[0, 2]
        np.testing.assert_allclose(rel[:3, :3], np.eye(3), atol=1e-4)

    def test_grad_through_fk(self, rng):
        state, params, _ = self._random_model(rng, chain_edges(4), 4, 3)
        pc = jnp.asarray(rng.randn(32, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(3, 32, 3).astype(np.float32))

        def loss(p):
            out, _, _ = kinematic_forward(p, state, pc)
            return jnp.sum((out - tgt) ** 2)

        g = jax.grad(loss)(params)
        for k in ("axis_list", "moment_list", "theta_list"):
            arr = np.asarray(g[k])
            assert np.isfinite(arr).all()
            assert np.abs(arr).sum() > 0


@requires_reference
class TestFKTorchParity:
    def test_fk_vs_reference(self, rng):
        import ref_oracle
        ref_oracle.setup_reference_path()
        import torch
        import networkx as nx
        from utils.kinematic_utils import fk as ref_fk

        # random tree: parts 0..5, root 0
        edges = [(1, 0), (2, 0), (3, 1), (4, 1), (5, 3)]
        p, e, t = 6, 5, 4
        g = nx.from_edgelist(edges, create_using=nx.DiGraph())
        paths_to_base = nx.shortest_path(g, target=0)
        reverse_topo = list(reversed(list(nx.topological_sort(g))))
        edge_index = {f"{c}_{pp}": i for i, (c, pp) in enumerate(edges)}

        axis = rng.randn(e, 3).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        moment = 0.3 * rng.randn(e, 3).astype(np.float32)
        theta = 0.5 * rng.randn(t, e).astype(np.float32)

        ref = ref_fk(
            paths_to_base, reverse_topo, edge_index,
            torch.from_numpy(axis), torch.from_numpy(moment), torch.from_numpy(theta),
        ).numpy()

        from reart_tpu.models.kinematic import make_kinematic_state, fk as our_fk
        state = make_kinematic_state(np.arange(p), np.zeros((p, 3), np.float32), edges, root=0)
        params = init_kinematic_params(t, e, axis_list=axis, moment_list=moment, theta_list=theta)
        ours = np.asarray(our_fk(params, state))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_fk_vs_reference_with_prismatic(self, rng):
        import ref_oracle
        ref_oracle.setup_reference_path()
        import torch
        import networkx as nx
        from utils.kinematic_utils import fk as ref_fk

        edges = [(1, 0), (2, 1), (3, 1)]
        p, e, t = 4, 3, 3
        g = nx.from_edgelist(edges, create_using=nx.DiGraph())
        paths_to_base = nx.shortest_path(g, target=0)
        reverse_topo = list(reversed(list(nx.topological_sort(g))))
        edge_index = {f"{c}_{pp}": i for i, (c, pp) in enumerate(edges)}
        joint_types = ["revolute", "prismatic", "revolute"]

        axis = rng.randn(e, 3).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        moment = 0.3 * rng.randn(e, 3).astype(np.float32)
        theta = 0.5 * rng.randn(t, e).astype(np.float32)
        dist = 0.4 * rng.randn(t, e).astype(np.float32)

        ref = ref_fk(
            paths_to_base, reverse_topo, edge_index,
            torch.from_numpy(axis), torch.from_numpy(moment), torch.from_numpy(theta),
            distance_list=torch.from_numpy(dist), joint_type_list=joint_types,
        ).numpy()

        from reart_tpu.models.kinematic import make_kinematic_state, fk as our_fk
        state = make_kinematic_state(
            np.arange(p), np.zeros((p, 3), np.float32), edges, root=0,
            joint_types=joint_types,
        )
        params = init_kinematic_params(
            t, e, axis_list=axis, moment_list=moment, theta_list=theta, distance_list=dist
        )
        ours = np.asarray(our_fk(params, state))
        np.testing.assert_allclose(ours, ref, atol=1e-4)
