"""Tree edit distance for kinematic-structure evaluation (host-side).

Parity target: utils/ted_utils.py of the reference, which serializes trees
under every BFS child-permutation and takes the minimum APTED ordered tree
edit distance with FREE renames (CustomConfig.rename = 0) — i.e. the labels
only matter through the child ordering of the serialization, so the metric is
a min-over-orderings structural distance. We reproduce the protocol with our
own Zhang-Shasha ordered-TED implementation (unit insert/delete, zero
rename), no external apted dependency.
"""

from __future__ import annotations

import itertools
from collections import deque


def find_root_node(edges) -> int:
    """Root of a child->parent edge list: the unique node with no parent.
    (ted_utils.py:14-21 — first node with no descendants in the c->p DAG.)"""
    children = {c for c, _ in edges}
    nodes = children | {p for _, p in edges}
    roots = sorted(nodes - children)
    assert roots, "no root: edge list has a cycle"
    return roots[0]


def _children_map(edges, root):
    """Undirected edge list + root -> {parent: [children]} (orientation away
    from root), mirroring to_DAG (kinematic_utils.py:36-51)."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    children, seen, queue = {}, {root}, deque([root])
    while queue:
        cur = queue.popleft()
        kids = sorted(adj.get(cur, set()) - seen)
        children[cur] = kids
        seen.update(kids)
        queue.extend(kids)
    n_nodes = len({a for e in edges for a in e}) if edges else 1
    assert len(seen) == n_nodes, "edge list is not a connected tree"
    return children


def _bfs_orders(children, root, limit=None):
    """All node orders reachable by BFS where each parent's children may be
    enqueued in any permutation (ted_utils.py:24-54). Yields tuples of nodes."""
    out = []

    def backtrack(queue, order):
        if limit is not None and len(out) >= limit:
            return
        if not queue:
            out.append(tuple(order))
            return
        queue = deque(queue)
        parent = queue.popleft()
        order = order + [parent]
        kids = children.get(parent, [])
        if not kids:
            backtrack(queue, order)
            return
        for perm in itertools.permutations(kids):
            backtrack(deque(list(queue) + list(perm)), order)

    backtrack(deque([root]), [])
    return out


def _ordered_tree(children, root, rank):
    """Nested ordered tree [child_trees...] with children sorted by rank
    (the serialization order of ted_utils.get_node_attr_list + sorted())."""
    kids = sorted(children.get(root, []), key=lambda c: rank[c])
    return [
        _ordered_tree(children, c, rank) for c in kids
    ]


def _postorder(tree):
    """Flatten an ordered tree into postorder node list; returns (lmld, n)
    where lmld[i] is the postorder index of i's leftmost leaf descendant."""
    lmld = []

    def walk(node):
        if not node:  # leaf
            lmld.append(len(lmld))
            return len(lmld) - 1
        first = None
        for child in node:
            f = walk(child)
            if first is None:
                first = lmld[f]
        lmld.append(first)
        return len(lmld) - 1

    walk(tree)
    return lmld


def _keyroots(lmld):
    seen = set()
    roots = []
    for i in range(len(lmld) - 1, -1, -1):
        if lmld[i] not in seen:
            roots.append(i)
            seen.add(lmld[i])
    return sorted(roots)


def zhang_shasha(tree1, tree2, ins: float = 1.0, dele: float = 1.0,
                 ren: float = 0.0) -> float:
    """Ordered tree edit distance (Zhang & Shasha 1989). Trees are nested
    lists of children; labels are ignored (rename cost is a constant `ren`,
    0 by default to match the reference's CustomConfig)."""
    l1, l2 = _postorder(tree1), _postorder(tree2)
    n1, n2 = len(l1), len(l2)
    kr1, kr2 = _keyroots(l1), _keyroots(l2)
    td = [[0.0] * n2 for _ in range(n1)]

    for i in kr1:
        for j in kr2:
            li, lj = l1[i], l2[j]
            m, n = i - li + 2, j - lj + 2
            fd = [[0.0] * n for _ in range(m)]
            for x in range(1, m):
                fd[x][0] = fd[x - 1][0] + dele
            for y in range(1, n):
                fd[0][y] = fd[0][y - 1] + ins
            for x in range(1, m):
                for y in range(1, n):
                    pi, pj = li + x - 1, lj + y - 1
                    if l1[pi] == li and l2[pj] == lj:
                        fd[x][y] = min(
                            fd[x - 1][y] + dele,
                            fd[x][y - 1] + ins,
                            fd[x - 1][y - 1] + ren,
                        )
                        td[pi][pj] = fd[x][y]
                    else:
                        fd[x][y] = min(
                            fd[x - 1][y] + dele,
                            fd[x][y - 1] + ins,
                            fd[l1[pi] - li][l2[pj] - lj] + td[pi][pj],
                        )
    return td[n1 - 1][n2 - 1]


def compute_ted(pred_edges, pred_root, gt_edges, gt_root,
                traverse: bool = True, max_traversals: int | None = 500,
                verbose: bool = False) -> float:
    """Min ordered TED over BFS child-permutation orderings of both trees
    (ted_utils.py:127-156). With traverse=False, a single canonical
    (sorted-children) ordering is used per tree."""
    pred_children = _children_map([tuple(e) for e in pred_edges], pred_root)
    gt_children = _children_map([tuple(e) for e in gt_edges], gt_root)

    def orderings(children, root):
        if not traverse:
            order = []
            queue = deque([root])
            while queue:
                cur = queue.popleft()
                order.append(cur)
                queue.extend(children.get(cur, []))
            return [tuple(order)]
        return _bfs_orders(children, root, limit=max_traversals)

    pred_orders = orderings(pred_children, pred_root)
    gt_orders = orderings(gt_children, gt_root)
    if max_traversals is not None and traverse and (
            len(pred_orders) >= max_traversals or len(gt_orders) >= max_traversals):
        import warnings

        warnings.warn(
            f"compute_ted: BFS-ordering enumeration truncated at "
            f"{max_traversals}; reported TED is an upper bound", stacklevel=2)
    pred_trees = [
        _ordered_tree(pred_children, pred_root, {v: i for i, v in enumerate(o)})
        for o in pred_orders
    ]
    gt_trees = [
        _ordered_tree(gt_children, gt_root, {v: i for i, v in enumerate(o)})
        for o in gt_orders
    ]
    # dedup identical ordered shapes before the quadratic sweep
    pred_trees = list({repr(t): t for t in pred_trees}.values())
    gt_trees = list({repr(t): t for t in gt_trees}.values())

    # size difference is a lower bound on TED — stop once reached
    n_pred = len({a for e in pred_edges for a in e} or {pred_root})
    n_gt = len({a for e in gt_edges for a in e} or {gt_root})
    lower = float(abs(n_pred - n_gt))

    best = float("inf")
    for p in pred_trees:
        for g in gt_trees:
            best = min(best, zhang_shasha(p, g))
            if best <= lower:
                if verbose:
                    print(f"final tree edit distance {best}")
                return best
    if verbose:
        print(f"final tree edit distance {best}")
    return best
