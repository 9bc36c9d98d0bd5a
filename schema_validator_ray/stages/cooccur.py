"""Key co-occurrence similarity join: pairs of keys sharing ≥ ``min_shared``
distinct items — the set-similarity workhorse behind "suppliers stocking the
same parts", "users touching the same files", "docs citing the same URLs".

Shape (never all-pairs over keys):
1. distinct (key, item) — per-batch distinct partials → one groupby; the
   working set is the BIPARTITE EDGE LIST, not keys²;
2. pair generation inside ``groupby(item).map_groups``: an item with d
   keys yields d·(d−1)/2 pairs — bounded by the item-degree cap, which
   RAISES by default when exceeded (a hot item would silently dominate
   the pair volume and any cap would drop genuine pairs; cap the degree
   upstream or opt into ``on_hot_item="skip"``);
3. distributed ``groupby(a, b).count`` — the shared-item count per pair —
   then the ``min_shared`` filter.

At 10^12 edges the exchanges are: edge-list dedup (bounded by distinct
edges per batch) and the pair stream (Σ d_i² over items — the degree cap
is exactly the knob that keeps this sub-quadratic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def cooccurrence_pairs(ds, key_col: str, item_col: str, *,
                       min_shared: int = 2, max_item_degree: int = 10_000,
                       on_hot_item: str = "error"):
    """Dataset of (a, b, n_shared): unordered key pairs (a < b) sharing at
    least ``min_shared`` distinct ``item_col`` values."""
    if on_hot_item not in ("error", "skip"):
        raise ValueError("on_hot_item must be 'error' or 'skip'")
    from ray.data.aggregate import Min, Sum

    # per-batch distinct via group_by, then global distinct
    def dpart(b: pa.Table) -> pa.Table:
        t = b.select([key_col, item_col]).drop_null()
        d = t.group_by([key_col, item_col]).aggregate([])
        return d.append_column("_one",
                               pa.array(np.ones(d.num_rows, np.int8)))

    edges = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby([key_col, item_col])
             .aggregate(Min("_one", alias_name="_one")))

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], g[key_col].type),
                          "b": pa.array([], g[key_col].type)})
        ks = g[key_col]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        d = len(ks)
        if d > max_item_degree:
            if on_hot_item == "error":
                raise ValueError(
                    f"cooccurrence_pairs: item "
                    f"{g[item_col][0].as_py()!r} has degree {d} "
                    f"(max_item_degree={max_item_degree}) — pairs would "
                    f"be dropped; cap the degree upstream or pass "
                    f"on_hot_item='skip'")
            print(f"cooccurrence_pairs: skipping hot item (degree {d})")
            return empty
        if d < 2:
            return empty
        ks = ks.take(pc.sort_indices(ks))
        ii, jj = np.triu_indices(d, k=1)
        return pa.table({"a": ks.take(pa.array(ii)),
                         "b": ks.take(pa.array(jj))})

    cand = edges.groupby(item_col).map_groups(pairs, batch_format="pyarrow")

    def count_part(t: pa.Table) -> pa.Table:
        agg = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table({"a": agg["a"], "b": agg["b"],
                         "n_shared": pc.cast(agg["count_all"], pa.int64())})

    counted = (cand.map_batches(count_part, batch_format="pyarrow")
               .groupby(["a", "b"])
               .aggregate(Sum("n_shared", alias_name="n_shared")))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_shared"],
                                         pa.scalar(min_shared)))

    return counted.map_batches(keep, batch_format="pyarrow")
