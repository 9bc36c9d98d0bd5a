"""Skew-aware large-large joins: key salting.

A plain hash join sends every row of a hot key to ONE aggregator partition —
the classic straggler at web scale (one viral user id, one blank-image
phash). Salting splits the hot key's probe side across ``n_salts``
partitions and replicates the build side once per salt, turning a single
overloaded partition into ``n_salts`` even ones at the cost of a
``n_salts×`` copy of the (smaller) build side. Use when the build side is
too big to broadcast (`ray.put` membership in referential.py covers the
small case) but much smaller than the probe side.

The salt assignment is a per-batch round-robin — any distribution works
(the join result is salt-invariant, only the partition sizes change), and
round-robin is the one that's perfectly even WITHIN every hot key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def salted_inner_join(left, right, *, left_on: str, right_on: str,
                      n_salts: int = 8, num_partitions: int | None = None):
    """INNER JOIN ``left`` (large, possibly hot-keyed) with ``right``
    (smaller, replicated ``n_salts``×) on ``left_on = right_on``. Result
    columns = left columns + right columns (salt dropped); row multiplicity
    matches a plain inner join (each build dup appears once per salt, and a
    probe row matches only its own salt's replica)."""
    from .referential import default_join_partitions

    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    nparts = num_partitions or default_join_partitions(8)

    def add_salt(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_salt", pa.array(np.arange(b.num_rows, dtype=np.int32)
                              % n_salts))

    def replicate(b: pa.Table) -> pa.Table:
        reps = [b.append_column("_salt",
                                pa.array(np.full(b.num_rows, s, np.int32)))
                for s in range(n_salts)]
        return pa.concat_tables(reps)

    l = left.map_batches(add_salt, batch_format="pyarrow")
    r = right.map_batches(replicate, batch_format="pyarrow")
    j = l.join(r, join_type="inner", num_partitions=nparts,
               on=(left_on, "_salt"), right_on=(right_on, "_salt"))
    return j.map_batches(lambda b: b.drop_columns(["_salt"]),
                         batch_format="pyarrow")


def join_cardinality_report(left, right, key: str, *,
                            level_budget: int = 20_000_000):
    """EXACT size of the inner equi-join on ``key`` WITHOUT executing it —
    |A ⨝ B| = Σ_k f_A(k)·f_B(k) over matched keys — plus the hottest
    key's contribution: the planner-style diagnostic that tells you
    whether a join is safe to run and whether one key will straggle it
    (pair it with the salted-join path when max_key_rows dominates).
    Returns a 1-row pandas DataFrame (est_rows, n_matched_keys,
    max_key_rows).

    Distributed shape: each side reduces to a per-batch key-frequency
    partial + one groupby-sum (exchange bounded by distinct keys, never
    rows); the two key censuses meet on the driver behind a loud
    ``level_budget`` via one sorted merge — the joined PAYLOAD never
    moves at all."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def census(ds):
        def part(b: pa.Table) -> pa.Table:
            agg = (pa.table({"k": b[key]}).drop_null()
                   .group_by("k").aggregate([([], "count_all")]))
            return pa.table({"k": agg["k"], "f": agg["count_all"]})

        cen = (ds.map_batches(part, batch_format="pyarrow")
               .groupby("k").aggregate(Sum("f", alias_name="f")))
        parts, over = collect_up_to(cen, level_budget)
        if over:
            raise ValueError("join_cardinality_report: key census "
                             "exceeds the level budget")
        if not parts:
            return np.array([], np.int64), np.array([], np.int64)
        t = pa.concat_tables(parts)
        order = pc.sort_indices(t, sort_keys=[("k", "ascending")])
        t = t.take(order)
        return (t["k"].to_numpy(zero_copy_only=False),
                t["f"].to_numpy(zero_copy_only=False).astype(np.int64))

    ka, fa = census(left)
    kb, fb = census(right)
    if len(ka) == 0 or len(kb) == 0:
        return pd.DataFrame({"est_rows": [0], "n_matched_keys": [0],
                             "max_key_rows": [0]}).astype("int64")
    pos = np.searchsorted(ka, kb)
    valid = pos < len(ka)
    match = np.zeros(len(kb), dtype=bool)
    match[valid] = ka[pos[valid]] == kb[valid]
    prod = fa[pos[match]] * fb[match]
    return pd.DataFrame({
        "est_rows": [int(prod.sum())],
        "n_matched_keys": [int(match.sum())],
        "max_key_rows": [int(prod.max()) if len(prod) else 0]})
