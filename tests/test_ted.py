"""Golden-value tests for the tree edit distance (reference utils/ted_utils.py
protocol: min ordered TED over BFS child-permutations, free renames)."""

import random
import time

import pytest

from reart_tpu.graph.ted import (
    compute_ted,
    compute_ted_enumerated,
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


def _rand_tree(n, rng):
    return [(i, rng.randrange(i)) for i in range(1, n)], 0


def _bushy_tree(n, rng):
    # parent biased toward the root -> high fanout
    return [(i, rng.choice([0] * 3 + list(range(i)))) for i in range(1, n)], 0


def _chains(lens):
    edges, nid = [], 1
    for length in lens:
        prev = 0
        for _ in range(length):
            edges.append((nid, prev))
            prev = nid
            nid += 1
    return edges, 0


class TestExactDP:
    """The free-order forest DP must equal brute-force enumeration of ALL
    BFS child-permutation orderings (the reference's ted_utils.py protocol
    without its factorial blow-up)."""

    def test_property_random_trees(self):
        rng = random.Random(42)
        for _ in range(250):
            e1, r1 = _rand_tree(rng.randrange(2, 9), rng)
            e2, r2 = _rand_tree(rng.randrange(2, 9), rng)
            brute = compute_ted_enumerated(e1, r1, e2, r2,
                                           max_traversals=None)
            assert compute_ted(e1, r1, e2, r2) == brute, (e1, e2)

    def test_property_bushy_trees(self):
        rng = random.Random(7)
        for _ in range(150):
            e1, r1 = _bushy_tree(rng.randrange(2, 9), rng)
            e2, r2 = _bushy_tree(rng.randrange(2, 9), rng)
            brute = compute_ted_enumerated(e1, r1, e2, r2,
                                           max_traversals=None)
            assert compute_ted(e1, r1, e2, r2) == brute, (e1, e2)

    def test_fanout8_star(self):
        # >= 8-child fanout: enumeration would need 8!^2 ordering pairs
        e1, r1 = _chains([1] * 8)
        e2, r2 = _chains([1] * 12)
        assert compute_ted(e1, r1, e2, r2) == 4.0

    def test_fanout8_distinct_children_fast_and_exact(self):
        # 8 DISTINCT chain children: each chain grows by one -> TED 8
        e1, r1 = _chains([1, 2, 3, 4, 5, 6, 7, 8])
        e2, r2 = _chains([2, 3, 4, 5, 6, 7, 8, 9])
        t0 = time.time()
        assert compute_ted(e1, r1, e2, r2) == 8.0
        assert time.time() - t0 < 5.0

    def test_fanout10_identical_children(self):
        e1, r1 = _chains([3] * 10)
        e2, r2 = _chains([4] * 10)
        assert compute_ted(e1, r1, e2, r2) == 10.0
