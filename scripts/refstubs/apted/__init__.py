"""CPU stand-in for the `apted` package (reference utils/ted_utils.py:5-6).

Implements the subset the reference consumes: `APTED(tree1, tree2,
config).compute_edit_distance()` with a `Config` whose delete/insert/rename
methods give per-node costs (the reference's CustomConfig sets rename=0).
The distance computed is the exact ordered tree edit distance
(Zhang & Shasha 1989) — the same quantity APTED computes, adequate at the
<=20-node trees the evaluator compares."""

from functools import lru_cache


class Config:
    def delete(self, node):
        return 1

    def insert(self, node):
        return 1

    def rename(self, node1, node2):
        return int(node1.name != node2.name)

    def children(self, node):
        return getattr(node, "children", [])


class APTED:
    def __init__(self, tree1, tree2, config=None):
        self.t1 = tree1
        self.t2 = tree2
        self.cfg = config or Config()

    def compute_edit_distance(self):
        return _ted(self.t1, self.t2, self.cfg)


def _postorder(root, cfg):
    """Returns (nodes, lml) in postorder; lml[i] = index of leftmost leaf of
    the subtree rooted at node i."""
    nodes, lml = [], []

    def visit(n):
        kids = cfg.children(n)
        if not kids:
            nodes.append(n)
            lml.append(len(nodes) - 1)
            return len(nodes) - 1
        first = None
        for c in kids:
            ci = visit(c)
            if first is None:
                first = lml[ci]
        nodes.append(n)
        lml.append(first)
        return len(nodes) - 1

    visit(root)
    return nodes, lml


def _keyroots(lml):
    seen = set()
    out = []
    for i in range(len(lml) - 1, -1, -1):
        if lml[i] not in seen:
            out.append(i)
            seen.add(lml[i])
    return sorted(out)


def _ted(t1, t2, cfg):
    n1_nodes, l1 = _postorder(t1, cfg)
    n2_nodes, l2 = _postorder(t2, cfg)
    n1, n2 = len(n1_nodes), len(n2_nodes)
    td = [[0.0] * n2 for _ in range(n1)]

    for i in _keyroots(l1):
        for j in _keyroots(l2):
            li, lj = l1[i], l2[j]
            m, n = i - li + 2, j - lj + 2
            fd = [[0.0] * n for _ in range(m)]
            for x in range(1, m):
                fd[x][0] = fd[x - 1][0] + cfg.delete(n1_nodes[li + x - 1])
            for y in range(1, n):
                fd[0][y] = fd[0][y - 1] + cfg.insert(n2_nodes[lj + y - 1])
            for x in range(1, m):
                for y in range(1, n):
                    pi, pj = li + x - 1, lj + y - 1
                    dele = cfg.delete(n1_nodes[pi])
                    ins = cfg.insert(n2_nodes[pj])
                    if l1[pi] == li and l2[pj] == lj:
                        fd[x][y] = min(
                            fd[x - 1][y] + dele,
                            fd[x][y - 1] + ins,
                            fd[x - 1][y - 1]
                            + cfg.rename(n1_nodes[pi], n2_nodes[pj]),
                        )
                        td[pi][pj] = fd[x][y]
                    else:
                        fd[x][y] = min(
                            fd[x - 1][y] + dele,
                            fd[x][y - 1] + ins,
                            fd[l1[pi] - li][l2[pj] - lj] + td[pi][pj],
                        )
    return td[n1 - 1][n2 - 1]
