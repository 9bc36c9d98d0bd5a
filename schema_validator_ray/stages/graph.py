"""Graph analytics over edge lists: triangle / wedge census.

The reference has no graph surface; this serves the training-data side
(duplicate-cluster topology, co-occurrence graph health) and general
data-validation (an unexpectedly dense similarity graph is a corpus
alarm). Reference for the counting scheme: the standard edge-iterator
algorithm (each triangle {a<b<c} counted exactly once from its (a,b)
edge by common neighbors z > b).

Distributed shape: the EDGE STREAM is the dataset; the adjacency (CSR
over the node vocabulary) broadcasts once via ``ray.put``. That is the
right trade when nodes come from a bounded vocabulary (names, catalog
keys, duplicate-cluster reps) — the usual case for validation graphs.
For graphs whose adjacency outgrows a broadcast, the census raises
loudly; the scale path would co-partition wedges by hash of their
center (documented, not built — no caller needs it yet).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._collect import collect_up_to


def undirected_edge_census(edges, a_col: str, b_col: str, *,
                           broadcast_max: int = 50_000_000):
    """One-row census of an undirected simple graph given as an edge
    Dataset with string or integer endpoints (each undirected edge once,
    any orientation): node count, edge count, wedge count
    (Σ deg·(deg−1)/2), triangle count, and the global clustering
    coefficient 3·triangles / wedges (6dp half-even, null when the graph
    has no wedge).

    The edge list is collected once under ``broadcast_max`` to build the
    CSR + packed sorted edge array (vocabulary-bounded by contract —
    loud failure beyond the budget); the triangle scan itself runs
    distributed: a Dataset re-materialized from the edge table streams
    through ``map_batches``, each batch expanding its edges' candidate
    common-neighbors against the broadcast CSR with one vectorized
    ``searchsorted`` membership probe into the packed edge array — no
    per-edge Python loop.  Returns a one-row ``pyarrow.Table``.
    """
    import ray
    import ray.data as rd

    parts, over = collect_up_to(edges, broadcast_max)
    if over:
        raise RuntimeError(
            "edge list exceeded the adjacency broadcast budget; this census "
            "expects a vocabulary-bounded graph — co-partition wedges by "
            "center-node hash for larger graphs")
    et = pa.concat_tables(parts) if parts else None
    empty = pa.table({
        "n_nodes": pa.array([0], pa.int64()),
        "n_edges": pa.array([0], pa.int64()),
        "n_wedges": pa.array([0], pa.int64()),
        "n_triangles": pa.array([0], pa.int64()),
        "clustering": pa.array([None], pa.float64())})
    if et is None or et.num_rows == 0:
        return empty

    import pandas as pd
    a_raw = et[a_col].to_numpy(zero_copy_only=False)
    b_raw = et[b_col].to_numpy(zero_copy_only=False)
    codes, _uniques = pd.factorize(np.concatenate([a_raw, b_raw]))
    n = int(codes.max()) + 1
    u = codes[:len(a_raw)].astype(np.int64)
    v = codes[len(a_raw):].astype(np.int64)
    # canonical (lo, hi), dedup defensively (callers pass simple graphs)
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    keep = lo != hi  # drop self-loops
    lo, hi = lo[keep], hi[keep]
    packed = np.unique(lo * np.int64(n) + hi)
    lo = (packed // n).astype(np.int64)
    hi = (packed % n).astype(np.int64)
    n_edges = len(packed)

    deg = np.bincount(np.concatenate([lo, hi]), minlength=n) \
        .astype(np.int64)
    n_nodes = int((deg > 0).sum())
    n_wedges = int((deg * (deg - 1) // 2).sum())

    # CSR over BOTH directions, neighbor lists sorted by construction
    heads = np.concatenate([lo, hi])
    tails = np.concatenate([hi, lo])
    order = np.lexsort((tails, heads))
    heads, tails = heads[order], tails[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, heads + 1, 1)
    indptr = np.cumsum(indptr)
    side = ray.put((indptr, tails, packed, np.int64(n)))

    def tri_part(b: pa.Table, s=side) -> pa.Table:
        ip, nbr, pk, nn = ray.get(s) if not isinstance(s, tuple) else s
        x = b["lo"].to_numpy(zero_copy_only=False)
        y = b["hi"].to_numpy(zero_copy_only=False)
        cnt = ip[x + 1] - ip[x]
        total = int(cnt.sum())
        if total == 0:
            return pa.table({"t": pa.array([0], pa.int64())})
        eidx = np.repeat(np.arange(len(x), dtype=np.int64), cnt)
        # flat gather of every edge's adj[x] slice
        starts = ip[x]
        flat = np.arange(total, dtype=np.int64) \
            - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(starts, cnt)
        z = nbr[flat]
        m = z > y[eidx]                      # z > max(x, y): count once
        if not m.any():
            return pa.table({"t": pa.array([0], pa.int64())})
        probe = y[eidx][m] * nn + z[m]       # is (y, z) an edge?
        pos = np.searchsorted(pk, probe)
        pos_c = np.clip(pos, 0, len(pk) - 1)
        t = int((pk[pos_c] == probe).sum())
        return pa.table({"t": pa.array([t], pa.int64())})

    edge_ds = rd.from_arrow(pa.table({"lo": pa.array(lo), "hi": pa.array(hi)}))
    tp, _ = collect_up_to(edge_ds.map_batches(tri_part,
                                              batch_format="pyarrow"),
                          1_000_000)
    n_tri = int(pc.sum(pa.concat_tables(tp)["t"]).as_py() or 0) if tp else 0
    clus = (round(3.0 * n_tri / n_wedges, 6) if n_wedges else None)
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "clustering": pa.array([clus], pa.float64())})


def pagerank_on_edges(edges, a_col: str, b_col: str, *, iters: int = 3,
                      damping: float = 0.85,
                      broadcast_max: int = 50_000_000):
    """Fixed-iteration PageRank over an undirected edge list (each edge
    walked both ways), uniform init 1/n, update
    ``(1−d)/n + d·Σ pr(u)/deg(u)`` — the iterative-algorithm shape on
    Ray Data: per iteration the VERTEX STATE (pr/deg, node-bounded)
    broadcasts via ``ray.put`` and the EDGE STREAM reduces per-batch
    (dst, contribution) partials into one node-bounded groupby; the
    driver only holds node-sized vectors. A fixed ``iters`` keeps the
    result SQL-expressible (the oracle unrolls the same updates).

    Returns a ``pyarrow.Table`` of (node, pr) over every node incident
    to an edge, pr rounded half-even to 6dp (absorbing distributed
    summation-order ulps — contributions are ~1/n, double error ~1e-16
    relative).
    """
    import ray
    import ray.data as rd

    parts, over = collect_up_to(edges, broadcast_max)
    if over:
        raise RuntimeError(
            "edge list exceeded the vertex-state broadcast budget; "
            "co-partition by dst hash for larger graphs")
    et = pa.concat_tables(parts) if parts else None
    if et is None or et.num_rows == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "pr": pa.array([], pa.float64())})

    import pandas as pd
    a_raw = et[a_col].to_numpy(zero_copy_only=False)
    b_raw = et[b_col].to_numpy(zero_copy_only=False)
    codes, uniques = pd.factorize(np.concatenate([a_raw, b_raw]))
    n = int(codes.max()) + 1
    u = codes[:len(a_raw)].astype(np.int64)
    v = codes[len(a_raw):].astype(np.int64)
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    keep = lo != hi
    packed = np.unique(lo[keep] * np.int64(n) + hi[keep])
    lo = (packed // n).astype(np.int64)
    hi = (packed % n).astype(np.int64)
    src = np.concatenate([lo, hi])
    dst = np.concatenate([hi, lo])
    deg = np.bincount(src, minlength=n).astype(np.float64)

    edge_ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                      "dst": pa.array(dst)}))
    pr = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        w = pr / deg                      # per-source outgoing share
        ref = ray.put(w)

        def contrib(b: pa.Table, s=ref) -> pa.Table:
            ww = ray.get(s) if not isinstance(s, np.ndarray) else s
            d = b["dst"].to_numpy(zero_copy_only=False)
            c = ww[b["src"].to_numpy(zero_copy_only=False)]
            uk, inv = np.unique(d, return_inverse=True)
            s_ = np.zeros(len(uk))
            np.add.at(s_, inv, c)
            return pa.table({"dst": pa.array(uk), "s": pa.array(s_)})

        from ray.data.aggregate import Sum
        agg = (edge_ds.map_batches(contrib, batch_format="pyarrow")
               .groupby("dst").aggregate(Sum("s", alias_name="s")))
        ap, _ = collect_up_to(agg, broadcast_max)  # node-bounded
        at = pa.concat_tables(ap)
        pr = np.full(n, base)
        idx = at["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr[idx] += damping * at["s"].to_numpy(zero_copy_only=False)

    return pa.table({
        "node": pa.array(uniques),
        "pr": pa.array(np.round(pr, 6), pa.float64(), from_pandas=True)})


def kcore_on_edges(edges, a_col: str, b_col: str, *, k: int = 2,
                   iters: int = 3, broadcast_max: int = 50_000_000):
    """Fixed-iteration k-core peeling over an undirected edge list — the
    degeneracy-ordering shape on Ray Data: per iteration the ALIVE
    vertex mask (node-bounded, one byte per node) broadcasts via
    ``ray.put`` and the EDGE STREAM reduces per-batch (node, degree)
    partials into one node-bounded groupby; nodes whose degree in the
    surviving subgraph falls below ``k`` die. A fixed ``iters`` keeps
    the result SQL-expressible (the oracle unrolls the same subgraph
    restrictions). Exact integers end to end.

    Returns a ``pyarrow.Table`` of (node, degree): each node still
    incident to an edge after ``iters`` peels, with its degree in that
    final subgraph (isolated survivors drop out, matching the SQL
    degree-table form).
    """
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    empty = pa.table({"node": pa.array([], pa.string()),
                      "degree": pa.array([], pa.int64())})
    parts, over = collect_up_to(edges, broadcast_max)
    if over:
        raise RuntimeError(
            "edge list exceeded the vertex-state broadcast budget; "
            "co-partition by node hash for larger graphs")
    et = pa.concat_tables(parts) if parts else None
    if et is None or et.num_rows == 0:
        return empty

    a_raw = et[a_col].to_numpy(zero_copy_only=False)
    b_raw = et[b_col].to_numpy(zero_copy_only=False)
    codes, uniques = pd.factorize(np.concatenate([a_raw, b_raw]))
    n = int(codes.max()) + 1
    u = codes[:len(a_raw)].astype(np.int64)
    v = codes[len(a_raw):].astype(np.int64)
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    keep = lo != hi
    packed = np.unique(lo[keep] * np.int64(n) + hi[keep])
    if not len(packed):
        return empty
    lo = (packed // n).astype(np.int64)
    hi = (packed % n).astype(np.int64)
    edge_ds = rd.from_arrow(pa.table({
        "src": pa.array(np.concatenate([lo, hi])),
        "dst": pa.array(np.concatenate([hi, lo]))}))

    def degrees(mask: np.ndarray) -> np.ndarray:
        ref = ray.put(mask)

        def degp(b: pa.Table, s=ref) -> pa.Table:
            m = ray.get(s) if not isinstance(s, np.ndarray) else s
            su = b["src"].to_numpy(zero_copy_only=False)
            sv = b["dst"].to_numpy(zero_copy_only=False)
            live = m[su] & m[sv]
            uk, cnt = np.unique(su[live], return_counts=True)
            return pa.table({"node": pa.array(uk),
                             "c": pa.array(cnt.astype(np.int64))})

        agg = (edge_ds.map_batches(degp, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("c", alias_name="c")))
        ap, _ = collect_up_to(agg, broadcast_max)  # node-bounded
        deg = np.zeros(n, np.int64)
        if ap:
            at = pa.concat_tables(ap)
            idx = at["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            deg[idx] = at["c"].to_numpy(zero_copy_only=False)
        return deg

    alive = np.ones(n, bool)
    for _ in range(iters):
        nxt = alive & (degrees(alive) >= k)
        if (nxt == alive).all():
            break                 # fixed point: further peels are no-ops
        alive = nxt
    deg = degrees(alive)
    out = alive & (deg > 0)
    return pa.table({"node": pa.array(np.asarray(uniques)[out]),
                     "degree": pa.array(deg[out])})


def bipartite_degree_census(ds, a_col: str, b_col: str):
    """Degree distribution of BOTH sides of a bipartite relation (e.g.
    part—supplier from lineitem): one row per (side, degree) with the node
    count — the shape diagnostic for co-occurrence joins (a fat-degree
    node is the block that straggles them). Returns (side, degree,
    n_nodes) with side ∈ {a_col, b_col}.

    Distributed shape: per-batch DISTINCT (a, b) partials + one groupby
    dedupe the edges (exchange bounded by distinct pairs); the edge set
    materializes once and feeds two grouped counts, each reduced to
    per-batch (degree, n) histogram partials before a tiny final sum."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ._collect import guarded_groupby

    def dedup(b: pa.Table) -> pa.Table:
        d = (b.select([a_col, b_col]).drop_null()
             .group_by([a_col, b_col]).aggregate([([], "count_all")])
             .select([a_col, b_col]))
        return d.append_column("_one",
                               pa.array(np.ones(d.num_rows, np.int8)))

    # high-cardinality reductions go through the guarded driver merge —
    # a Ray hash groupby at ~|edges| key cardinality pays ~10 s of
    # shuffle latency at sf0.1 (measured); distributed fallback above
    # the budget
    edges = guarded_groupby(ds.map_batches(dedup, batch_format="pyarrow"),
                            [a_col, b_col],
                            [("_one", "min")]).materialize()

    def side_census(node_col: str, label: str):
        def degp(b: pa.Table) -> pa.Table:
            agg = (b.select([node_col])
                   .append_column("_c", pa.array(
                       np.ones(b.num_rows, np.int64)))
                   .group_by(node_col).aggregate([("_c", "sum")]))
            return pa.table({node_col: agg[node_col],
                             "c": pc.cast(agg["_c_sum"], pa.int64())})

        deg = guarded_groupby(
            edges.map_batches(degp, batch_format="pyarrow"),
            [node_col], [("c", "sum")])

        def hist(b: pa.Table) -> pa.Table:
            agg = (pa.table({"degree": pc.cast(b["c_sum"], pa.int64())})
                   .group_by("degree").aggregate([([], "count_all")]))
            return pa.table({"degree": agg["degree"],
                             "n": agg["count_all"]})

        out = (deg.map_batches(hist, batch_format="pyarrow")
               .groupby("degree").aggregate(Sum("n", alias_name="n")))
        return out.map_batches(
            lambda b: pa.table({
                "side": pa.array(np.repeat(label, b.num_rows)),
                "degree": b["degree"],
                "n_nodes": pc.cast(b["n"], pa.int64())}),
            batch_format="pyarrow")

    return side_census(a_col, a_col).union(side_census(b_col, b_col))
