"""Golden-value tests for the tree edit distance (reference utils/ted_utils.py
protocol: min ordered TED over BFS child-permutations, free renames)."""

import pytest

from reart_tpu.graph.ted import (
    compute_ted,
    find_root_node,
    zhang_shasha,
)


class TestZhangShasha:
    def test_identical(self):
        t = [[], [[]]]
        assert zhang_shasha(t, t) == 0.0

    def test_single_vs_single(self):
        assert zhang_shasha([], []) == 0.0

    def test_insert_one(self):
        assert zhang_shasha([], [[]]) == 1.0
        assert zhang_shasha([[]], []) == 1.0

    def test_chain_vs_star(self):
        chain = [[[]]]   # a - b - c
        star = [[], []]  # a with children b, c
        assert zhang_shasha(chain, star) == 2.0

    def test_delete_middle(self):
        # deleting b from a{b{c,d}} gives a{c,d}: distance 1
        assert zhang_shasha([[[], []]], [[], []]) == 1.0

    def test_asymmetric_sizes(self):
        # 1 node vs chain of 4: insert 3
        assert zhang_shasha([], [[[[]]]]) == 3.0


class TestFindRoot:
    def test_simple(self):
        # child -> parent edges
        assert find_root_node([(1, 0), (2, 0), (3, 1)]) == 0

    def test_chain(self):
        assert find_root_node([(0, 1), (1, 2)]) == 2


class TestComputeTed:
    def test_identical_trees(self):
        edges = [(1, 0), (2, 0), (3, 1)]
        assert compute_ted(edges, 0, edges, 0) == 0.0

    def test_isomorphic_relabeled(self):
        # same shape, different node ids / child attachment sides
        pred = [(1, 0), (2, 0), (3, 1)]  # child 3 under node 1
        gt = [(1, 0), (2, 0), (3, 2)]    # child 3 under node 2
        assert compute_ted(pred, 0, gt, 0) == 0.0

    def test_traversal_min_beats_canonical(self):
        pred = [(1, 0), (2, 0), (3, 1)]
        gt = [(1, 0), (2, 0), (3, 2)]
        # single canonical ordering may not align the subtrees
        canonical = compute_ted(pred, 0, gt, 0, traverse=False)
        traversed = compute_ted(pred, 0, gt, 0, traverse=True)
        assert traversed == 0.0
        assert canonical >= traversed

    def test_different_shapes(self):
        chain = [(1, 0), (2, 1), (3, 2)]  # depth-3 chain
        star = [(1, 0), (2, 0), (3, 0)]   # flat star
        d = compute_ted(chain, 0, star, 0)
        assert d > 0
        # chain -> star: delete 2 internal nodes, insert 2 leaves = 4... but
        # deleting node k re-parents its children, so: delete 2, insert 2.
        assert d == pytest.approx(4.0)

    def test_undirected_edge_lists(self):
        # compute_ted receives undirected edge lists (reference builds an
        # nx.Graph from them); orientation comes from the root argument.
        pred = [(0, 1), (0, 2)]
        gt = [(1, 0), (2, 0)]
        assert compute_ted(pred, 0, gt, 0) == 0.0
