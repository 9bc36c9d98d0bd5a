"""Distributed uniqueness check — real semantics for the reference's `unique`
placeholder (rule/other.go:311-316: always-pass).

Scale design (SURVEY §7.3): a naive ``groupby(key).count`` shuffles EVERY row. We
pre-aggregate inside ``map_batches`` first — one (key, count) row per distinct key
per batch — so only per-batch distinct keys enter the shuffle. For skewed keys (the
hot-phash fixture) this per-batch combine IS the salting: each batch acts as one
salt bucket, hot keys collapse to ≤1 row per batch before the exchange, so no single
reducer sees more than num_batches rows for any key (two-phase salted aggregate).

Violation listing broadcasts the (small) duplicate-key set via ``ray.put`` and
filters inside ``map_batches`` — a broadcast semi-join, no second shuffle. The
duplicate-key set is bounded by the violation rate, not the data size; above
``max_broadcast_keys`` the listing switches to a hash-partitioned
``Dataset.join`` semi-join instead (no driver set at all — the path for
pathological inputs where most keys duplicate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _PartialCounts:
    """Per-batch combiner: (key, count) per distinct key (or key tuple) in
    the batch."""

    def __init__(self, key):
        self.keys = [key] if isinstance(key, str) else list(key)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null keys are not "duplicates of each other" (missing keys are the
        # `required` rule's business) — drop them before counting
        agg = (batch.select(self.keys).drop_null()
               .group_by(self.keys)
               .aggregate([([], "count_all")]))
        cols = {k: agg[k] for k in self.keys}
        cols["cnt"] = pc.cast(agg["count_all"], pa.int64())
        return pa.table(cols)


def duplicate_keys(ds, key, *, batch_size: int = 65536,
                   reduce_partitions: int | None = 8,
                   driver_merge_max: int = 5_000_000):
    """Dataset of (key, dup_count) for keys appearing more than once; ``key``
    may be one column name or a list (composite uniqueness — the reference's
    `unique` over multiple fields). The shuffle (or driver merge) sees only
    pre-aggregated partials.

    Below ``driver_merge_max`` partial rows, the narrow (key, count) partials
    are merged with ONE driver-side pyarrow group_by and returned as a
    from_arrow Dataset — Ray's sort-based aggregate pays fixed per-stage costs
    that dwarf small inputs (the flagship uses the identical threshold
    pattern). Above it, the distributed groupby path runs; per-batch combine
    bounds hot keys at ≤1 row per batch either way. ``reduce_partitions``
    coalesces partials before the distributed groupby (≈ cores at cluster
    scale, or None to keep input partitioning)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    keys = [key] if isinstance(key, str) else list(key)
    partials = ds.map_batches(_PartialCounts(keys), batch_format="pyarrow",
                              batch_size=batch_size)
    if driver_merge_max:
        from ._collect import collect_up_to

        parts, over = collect_up_to(partials, driver_merge_max)
        if not over:
            if not parts:
                sch = ds.schema()
                types = dict(zip(sch.names, sch.types))
                cols = {k: pa.array([], types[k]) for k in keys}
                cols["dup_count"] = pa.array([], pa.int64())
                return rd.from_arrow(pa.table(cols))
            agg = (pa.concat_tables(parts).group_by(keys)
                   .aggregate([("cnt", "sum")]))
            dup = agg.filter(pc.greater(agg["cnt_sum"], 1))
            cols = {k: dup[k] for k in keys}
            cols["dup_count"] = pc.cast(dup["cnt_sum"], pa.int64())
            return rd.from_arrow(pa.table(cols))
        # fall through: too many partials — recompute distributed from source
        partials = ds.map_batches(_PartialCounts(keys),
                                  batch_format="pyarrow",
                                  batch_size=batch_size)
    if reduce_partitions:
        partials = partials.repartition(reduce_partitions)
    totals = partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(
        Sum("cnt", alias_name="dup_count"))
    return totals.filter(expr="dup_count > 1")


class _EmitDupViolations:
    def __init__(self, key: str, dup_ref, id_column: str, rule_id: str):
        self.key = key
        self.dup_ref = dup_ref
        self.id_column = id_column
        self.rule_id = rule_id
        self._dups_arr: pa.Array | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self._dups_arr is None:
            import ray

            vals = [v for v in ray.get(self.dup_ref) if v is not None]
            self._dups_arr = pa.array(sorted(vals), type=col.type)
        mask = pc.is_in(col, value_set=self._dups_arr)
        bad = batch.filter(mask)
        vals = pc.cast(bad[self.key], pa.string())
        return pa.table({
            self.id_column: pc.cast(bad[self.id_column], pa.string()),
            "rule_id": pa.array([self.rule_id] * bad.num_rows, pa.string()),
            "column": pa.array([self.key] * bad.num_rows, pa.string()),
            "offending_value": vals,
        })


def uniqueness_violations(ds, key: str, *, id_column: str,
                          rule_id: str | None = None,
                          batch_size: int = 65536,
                          max_broadcast_keys: int = 5_000_000):
    """Violation rows (id, rule_id, column, offending_value) — one per row whose
    ``key`` value occurs more than once across the whole dataset.

    Two passes over the input (count, then emit); pass 1 ships only pre-aggregated
    (key, count) partials through the shuffle, pass 2 is a broadcast filter.
    """
    import ray

    rule_id = rule_id or f"unique:{key}"
    dups_tbl = duplicate_keys(ds, key, batch_size=batch_size)
    dup_values = set()
    over_budget = False
    for b in dups_tbl.iter_batches(batch_size=65536, batch_format="pyarrow"):
        dup_values.update(b[key].to_pylist())
        if len(dup_values) > max_broadcast_keys:
            over_budget = True
            break
    if over_budget:
        # hash-partitioned semi-join fallback: the duplicate-key table stays
        # distributed, every row whose key matches joins against it — no
        # driver set at all (pathological inputs where most keys duplicate)
        from .referential import default_join_partitions

        dups_tbl = duplicate_keys(ds, key, batch_size=batch_size,
                                  driver_merge_max=0)
        joined = ds.select_columns([id_column, key]).join(
            dups_tbl.select_columns([key]), join_type="inner",
            num_partitions=default_join_partitions(), on=(key,))
        return joined.map_batches(
            lambda b: pa.table({
                id_column: pc.cast(b[id_column], pa.string()),
                "rule_id": pa.array([rule_id] * b.num_rows, pa.string()),
                "column": pa.array([key] * b.num_rows, pa.string()),
                "offending_value": pc.cast(b[key], pa.string()),
            }), batch_format="pyarrow")
    dup_ref = ray.put(dup_values)
    return ds.map_batches(
        _EmitDupViolations(key, dup_ref, id_column, rule_id),
        batch_format="pyarrow", batch_size=batch_size)


class _PartialPairCounts:
    """Per-batch combiner for FD checking: one (det, dep, cnt) row per
    distinct determinant/dependent pair in the batch."""

    def __init__(self, det: str, dep: str):
        self.det = det
        self.dep = dep

    def __call__(self, batch: pa.Table) -> pa.Table:
        agg = (batch.select([self.det, self.dep]).drop_null()
               .group_by([self.det, self.dep])
               .aggregate([([], "count_all")]))
        return pa.table({
            self.det: agg[self.det],
            self.dep: agg[self.dep],
            "cnt": pc.cast(agg["count_all"], pa.int64()),
        })


def fd_violations(ds, det: str, dep: str, *, batch_size: int = 65536,
                  reduce_partitions: int | None = 8,
                  driver_merge_max: int = 5_000_000):
    """Functional-dependency check ``det -> dep``: determinant values that
    map to MORE than one distinct dependent value, with the distinct-value
    and row counts — the cross-column determinism validation a schema rule
    can't express row-locally (e.g. "every source publishes in one language",
    "one image_id carries one phash").

    Output columns: ``det`` (original name), ``n_values`` (distinct dependent
    values observed), ``n_rows`` (rows carrying that determinant). Rows with a
    null determinant or dependent are excluded (missingness is the `required`
    rule's business, same policy as :func:`duplicate_keys`).

    Scale shape: the per-batch combine collapses each batch to its distinct
    (det, dep) pairs before ANY exchange, so the shuffle volume is bounded by
    pairs-per-batch, never row count — a hot determinant contributes at most
    |batch| pair rows. The pair→determinant reduction is two narrow groupbys;
    below ``driver_merge_max`` partial rows a single driver-side pyarrow
    group_by finishes (the identical guarded-merge pattern as
    :func:`duplicate_keys`), with the distributed path as fallback."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    partials = ds.map_batches(_PartialPairCounts(det, dep),
                              batch_format="pyarrow", batch_size=batch_size)

    def _finish(pairs: pa.Table) -> pa.Table:
        per_det = (pairs.group_by(det)
                   .aggregate([("cnt", "sum"), ([], "count_all")]))
        out = per_det.filter(pc.greater(per_det["count_all"], 1))
        return pa.table({
            det: out[det],
            "n_values": pc.cast(out["count_all"], pa.int64()),
            "n_rows": pc.cast(out["cnt_sum"], pa.int64()),
        })

    if driver_merge_max:
        from ._collect import collect_up_to

        parts, over = collect_up_to(partials, driver_merge_max)
        if not over:
            if not parts:
                sch = ds.schema()
                types = dict(zip(sch.names, sch.types))
                return rd.from_arrow(pa.table({
                    det: pa.array([], types[det]),
                    "n_values": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                }))
            agg = (pa.concat_tables(parts).group_by([det, dep])
                   .aggregate([("cnt", "sum")]))
            pairs = pa.table({det: agg[det], dep: agg[dep],
                              "cnt": agg["cnt_sum"]})
            return rd.from_arrow(_finish(pairs))
        partials = ds.map_batches(_PartialPairCounts(det, dep),
                                  batch_format="pyarrow",
                                  batch_size=batch_size)
    if reduce_partitions:
        partials = partials.repartition(reduce_partitions)
    pairs = (partials.groupby([det, dep])
             .aggregate(Sum("cnt", alias_name="cnt")))
    per_det = (pairs.groupby(det)
               .aggregate(Count(alias_name="n_values"),
                          Sum("cnt", alias_name="n_rows")))
    per_det = per_det.filter(expr="n_values > 1")
    return per_det.map_batches(
        lambda b: pa.table({
            det: b[det],
            "n_values": pc.cast(b["n_values"], pa.int64()),
            "n_rows": pc.cast(b["n_rows"], pa.int64()),
        }), batch_format="pyarrow")


def dedup_exact(ds, key: str, *, order_col: str | None = None,
                n_shards: int = 64):
    """Exact dedup keeping full surviving rows: one deterministic
    representative per key (the row minimizing ``order_col``, or an arbitrary
    stable row if no order column is given — pass ``order_col`` whenever
    determinism matters across re-blocking).

    Scale shape: a per-batch combine keeps ONE candidate row per key per batch
    first (bounding any hot key to ≤ num_batches rows before the exchange),
    then a coarse ``groupby(hash(key) % n_shards)`` re-picks vectorized inside
    each shard — no per-key group calls, no full-row shuffle of duplicates.
    For a *duplicate check* use :func:`duplicate_keys`, whose shuffle sees
    only (key, count) partials."""

    def pick(b):
        if order_col is not None:
            b = b.sort_values(order_col, kind="stable")
        return b.drop_duplicates(key, keep="first")

    def pick_and_shard(b):
        out = pick(b).copy()
        import pyarrow as _pa

        from .referential import _hash_keys

        out["_shard"] = (_hash_keys(_pa.array(np.asarray(out[key])))
                         % np.uint64(n_shards)).astype(np.int32)
        return out

    part = ds.map_batches(pick_and_shard, batch_format="pandas")
    return (part.groupby("_shard")
            .map_groups(pick, batch_format="pandas")
            .map_batches(lambda b: b.drop(columns=["_shard"]),
                         batch_format="pandas"))


def k_anonymity(ds, cols: list[str], *, k: int = 10):
    """k-anonymity census over quasi-identifier columns ``cols``: the size
    of every equivalence class (distinct quasi-identifier tuple) plus a
    ``k_ok`` flag — classes with fewer than ``k`` members re-identify
    their rows and fail the privacy gate (Sweeney's criterion; the privacy
    companion of the PII census).

    Distributed shape (the duplicate_keys partial pattern): per-batch
    group_by bounds the exchange at distinct-tuples-per-batch, one
    groupby-sum merges, a map flags. Nulls form their own class (an
    unknown quasi-identifier still partitions the table)."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        agg = b.select(cols).group_by(cols).aggregate([([], "count_all")])
        return agg.rename_columns(cols + ["n"])

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(cols).aggregate(Sum("n", alias_name="n")))
    return agg.map_batches(
        lambda b: pa.table({**{c: b[c] for c in cols},
                            "n": pc.cast(b["n"], pa.int64()),
                            "k_ok": pc.greater_equal(b["n"],
                                                     pa.scalar(k))}),
        batch_format="pyarrow")


def blocking_key_audit(ds, specs: dict[str, list[str]]):
    """Entity-resolution blocking-key audit: for each candidate blocking
    key (a named column set), the block count, the total candidate-pair
    workload Σ c·(c−1)/2, and the largest block — the numbers that decide
    whether a linkage run is feasible (pairs) and whether one hot block
    will straggle it (max_block). Returns one row per key:
    (key_name, n_blocks, n_pairs, max_block).

    Distributed shape: per key, per-batch tuple-count partials (the
    k_anonymity pattern) → one groupby-sum → a 3-number fold; the audits
    for all keys share the single input read."""
    import pandas as pd
    from ray.data.aggregate import Sum

    rows = []
    for name, cols in specs.items():
        def part(b: pa.Table, cols=cols) -> pa.Table:
            agg = (b.select(cols).group_by(cols)
                   .aggregate([([], "count_all")]))
            return agg.rename_columns(cols + ["c"])

        agg = (ds.map_batches(part, batch_format="pyarrow")
               .groupby(cols).aggregate(Sum("c", alias_name="c")))

        def fold(b: pa.Table) -> pa.Table:
            c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "n_blocks": pa.array([len(c)], pa.int64()),
                "n_pairs": pa.array([int((c * (c - 1) // 2).sum())],
                                    pa.int64()),
                "max_block": pa.array([int(c.max()) if len(c) else 0],
                                      pa.int64())})

        t = (agg.map_batches(fold, batch_format="pyarrow").to_pandas())
        rows.append((name, int(t["n_blocks"].sum()),
                     int(t["n_pairs"].sum()),
                     int(t["max_block"].max()) if len(t) else 0))
    return pd.DataFrame(rows, columns=["key_name", "n_blocks", "n_pairs",
                                       "max_block"])
