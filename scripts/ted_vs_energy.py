#!/usr/bin/env python
"""TED-vs-energy reconciliation for the flagship corr-chain (VERDICT r3 #4b).

Round 3 measured the densified-matcher flagship at TED 7 where the raw-matcher
run scores TED 5, and the energy-selected tree paying the 2 edits. Question:
does a TED-5 tree even EXIST over the densified run's merged part set, and if
so, can the fit energy see it?

TED here is the reference's protocol (utils/ted_utils.py: free renames), i.e.
a purely STRUCTURAL distance between rooted unordered trees — so the answer
decomposes into:
  (1) node-count bound: any tree over P parts is >= |P - |GT|| edits away;
  (2) shape reachability: over the finite-cost edge graph of the merged part
      set, what is the minimum TED any spanning tree achieves? (enumerated:
      the full 1-swap neighborhood the product sweeps, plus 2-swaps, plus
      random spanning trees of the allowed-edge graph);
  (3) energy: for representative minimum-TED trees, what energy does the
      SAME projection fit assign them vs the product-selected tree? (phase 2,
      driven through the product CLI with the tree injected as the stored
      `joint_connection` — writes variant result .pkls for run.py.)

Phase 1 is host-only (CPU): JAX_PLATFORMS handled via hostops.on_host.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ted_vs_energy.py \
      --base_result /tmp/nao_r4_armA/fit_base/nao/result.pkl \
      --seq_path /root/reference/demo_data/data/nao --cano_idx 4 \
      --out /tmp/ted_vs_energy
then, per written variant:
  python run.py robot --model kinematic --base_result_path <variant.pkl> \
      --tree_search 1 ... (forced stored tree; result.txt carries ted+energy)
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALLOWED_COST = 1e3  # mst_wrapper gates impossible pairs at +1e4


def spanning_trees_random(sym_cost, allowed, rng, n_samples):
    """Random spanning trees of the allowed-edge graph (random-Kruskal:
    shuffle allowed edges, union-find). Yields (P-1, 2) index arrays."""
    p = sym_cost.shape[0]
    edges = [(a, b) for a in range(p) for b in range(a + 1, p) if allowed[a, b]]
    for _ in range(n_samples):
        order = rng.permutation(len(edges))
        parent = list(range(p))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        tree = []
        for ei in order:
            a, b = edges[ei]
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                tree.append((a, b))
        if len(tree) == p - 1:
            yield np.asarray(tree, dtype=np.int64)


def two_swap_neighbors(base, sym_cost, allowed, limit=4000):
    """All spanning trees 1 or 2 edge-swaps from `base` (index space)."""
    import networkx as nx

    p = sym_cost.shape[0]
    seen = set()
    frontier = [np.asarray(base, dtype=np.int64)]
    out = []
    for _depth in range(2):
        nxt = []
        for tree in frontier:
            g = nx.Graph()
            g.add_nodes_from(range(p))
            g.add_edges_from(map(tuple, tree.tolist()))
            for u in range(p):
                for v in range(u + 1, p):
                    if not allowed[u, v] or g.has_edge(u, v):
                        continue
                    path = nx.shortest_path(g, u, v)
                    for a, b in zip(path[:-1], path[1:]):
                        edges = [e for e in tree.tolist()
                                 if {int(e[0]), int(e[1])} != {a, b}]
                        edges.append([u, v])
                        arr = np.asarray(sorted(map(sorted, edges)),
                                         dtype=np.int64)
                        key = frozenset(map(tuple, arr.tolist()))
                        if key in seen:
                            continue
                        seen.add(key)
                        nxt.append(arr)
                        out.append(arr)
                        if len(out) >= limit:
                            return out
        frontier = nxt
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_result", required=True)
    ap.add_argument("--seq_path", required=True)
    ap.add_argument("--cano_idx", default=4, type=int)
    ap.add_argument("--num_points", default=4096, type=int)
    ap.add_argument("--merge_thr", default=0.1, type=float)
    ap.add_argument("--cano_dist_thr", default=1e-2, type=float)
    ap.add_argument("--lambda_joint", default=100.0, type=float)
    ap.add_argument("--n_random", default=2000, type=int)
    ap.add_argument("--out", default="/tmp/ted_vs_energy")
    args = ap.parse_args()

    # Phase 1 is host-only: force the CPU platform BEFORE any jax touch so a
    # concurrently-running TPU fit is never disturbed (the axon tunnel serves
    # one client; CLAUDE.md). `JAX_PLATFORMS=cpu` alone is ignored by the
    # axon plugin — the config update is the documented route.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reart_tpu.data.common import load_gt_graph
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.graph import merging_wrapper, mst_wrapper
    from reart_tpu.graph.costs import compute_root_cost
    from reart_tpu.graph.mst import tree_candidates
    from reart_tpu.graph.ted import compute_ted, find_root_node
    from reart_tpu.hostops import on_host

    os.makedirs(args.out, exist_ok=True)
    with open(args.base_result, "rb") as f:
        result = pickle.load(f)
    assert result["cano_idx"] == args.cano_idx
    sample = RobotSequence(args.seq_path, args.num_points, args.cano_idx)[0]
    cano_pc = np.asarray(sample["cano_pc"], np.float32)

    seg = np.asarray(result["pred_cano_part"])
    trans = np.asarray(result["pred_pose_list"], np.float32)

    # Mirror build_kinematic_from_result's stored-tree contract: a base
    # result saves the POST-merge seg together with its MST, and the
    # projection stage then skips re-merging (cli.py:626-630). Re-merging an
    # already-merged seg would collapse the part set further and analyze a
    # part set the product never fits.
    stored = result.get("joint_connection")
    if stored is None or np.asarray(stored).size == 0:
        with on_host():
            seg = np.asarray(
                merging_wrapper(seg, trans, cano_pc, args.merge_thr))
    with on_host():
        mst_edges, cost, uni = mst_wrapper(
            seg, trans, cano_pc, num_fps=20,
            cano_dist_thr=args.cano_dist_thr,
            joint_cost_weight=args.lambda_joint, return_cost=True)
        cands, deltas = tree_candidates(cost, uni, k=64, return_deltas=True)
        root_cost = np.asarray(compute_root_cost(jnp.asarray(trans)))

    p = len(uni)
    pred_root_label = int(uni[np.argmin(root_cost[uni])])
    gt_nodes, gt_edges = load_gt_graph(args.seq_path)
    gt_root = find_root_node(gt_edges)
    n_gt = len({a for e in gt_edges for a in e})
    print(f"merged parts P={p} (labels {uni.tolist()}), root {pred_root_label}"
          f"; GT nodes {n_gt} -> node-count TED lower bound {abs(n_gt - p)}")

    sym = np.minimum(cost, cost.T)
    # candidate/cost index space -> part labels
    lab = {i: int(l) for i, l in enumerate(uni)}
    allowed = sym < ALLOWED_COST
    np.fill_diagonal(allowed, False)

    def ted_of(tree_idx_edges):
        edges = [(lab[int(a)], lab[int(b)]) for a, b in tree_idx_edges]
        return compute_ted(edges, pred_root_label, gt_edges, gt_root)

    def shape_key(tree_idx_edges):
        return frozenset(
            tuple(sorted((int(a), int(b)))) for a, b in tree_idx_edges)

    # tree_candidates returns label-space edges; map back to index space
    inv = {int(l): i for i, l in enumerate(uni)}
    pools = {}
    mst_idx = np.asarray(
        [[inv[int(a)], inv[int(b)]] for a, b in cands[0]], dtype=np.int64)
    pools["mst"] = [mst_idx]
    pools["1swap(product)"] = [
        np.asarray([[inv[int(a)], inv[int(b)]] for a, b in c], dtype=np.int64)
        for c in cands[1:]]
    pools["2swap"] = two_swap_neighbors(mst_idx, sym, allowed)
    rng = np.random.default_rng(0)
    pools["random"] = list(
        spanning_trees_random(sym, allowed, rng, args.n_random))

    best = {}
    seen = set()
    rows = []
    for pool, trees in pools.items():
        teds = []
        for t in trees:
            k = shape_key(t)
            new = k not in seen
            seen.add(k)
            d = ted_of(t)
            teds.append(d)
            if new and (d not in best):
                best[d] = (pool, t)
        if teds:
            rows.append((pool, len(trees), min(teds),
                         float(np.mean(teds)), max(teds)))

    print(f"\n{'pool':<18}{'trees':>7}{'minTED':>8}{'meanTED':>9}{'maxTED':>8}")
    for pool, n, lo, mean, hi in rows:
        print(f"{pool:<18}{n:>7}{lo:>8.0f}{mean:>9.2f}{hi:>8.0f}")

    min_ted = min(best)
    print(f"\nglobal min TED over {len(seen)} distinct spanning trees: "
          f"{min_ted:.0f}")

    # write variant result pkls for phase 2 (forced stored tree through the
    # product projection: run.py robot --model kinematic --tree_search 1)
    for d in sorted(best):
        if d > min(best) + 2:
            continue
        pool, tree = best[d]
        res = dict(result)
        res["pred_cano_part"] = seg  # pre-merged (stored-tree contract)
        res["joint_connection"] = np.asarray(
            [[lab[int(a)], lab[int(b)]] for a, b in tree], dtype=np.int64)
        path = os.path.join(args.out, f"variant_ted{int(d)}.pkl")
        with open(path, "wb") as f:
            pickle.dump(res, f)
        print(f"wrote {path} (TED {d:.0f}, from pool {pool}, edges "
              f"{res['joint_connection'].tolist()})")


if __name__ == "__main__":
    main()
