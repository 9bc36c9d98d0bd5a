"""Distributed as-of join — an operator Ray Data lacks natively.

For every left row, attach the latest right row of the same key with
``right.ts <= left.ts`` (SQL: ``ASOF LEFT JOIN``). The naive expression
(groupby(key) with both sides' full history in one group) has the same hot-key
failure as naive windows, so this uses a skew-safe sharded-bucket shuffle plus
a carry-in pass:

1. Both sides bucket on floor(ts / bucket); the shuffle key is
   (hash(key) % n_shards, bucket // blk_factor) — coarse enough that Ray's
   per-group overhead stays negligible (a few hundred groups, not one per
   (key, bucket)), fine enough that a hot key is bounded by its event rate
   over blk_factor buckets, never its total history.
2. Per (key, bucket), the LAST right row is reduced out (per-batch partial,
   then a vectorized per-shard forward-fill) — the "summary" stream,
   O(active buckets), not rows.
3. Left-active buckets merge with the right summaries per shard; a groupby-
   ffill emits one carry-in row per LEFT-active bucket holding the latest
   right row from any EARLIER bucket. Sparse right sides never explode into
   per-bucket copies.
4. Left rows + right rows + carry-in rows shuffle on the sharded-bucket key;
   inside each group one ``pd.merge_asof(by=key)`` resolves every key's
   matches vectorized.

Assumptions (documented): right side has at most one row per (key, ts) — ties
at equal ts have no deterministic order, so pre-aggregate the right side
(e.g. groupby(key, ts).max(value)) first, as the driver query does; value
columns are numeric (matched values ride as float64, null = no match).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .referential import _hash_keys


def _bkt_of(arr: np.ndarray, bucket_ns: int) -> np.ndarray:
    return arr.astype("datetime64[ns]").astype(np.int64) // bucket_ns


def _shard_of(col: pa.Array | pa.ChunkedArray, n_shards: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (_hash_keys(col) % np.uint64(n_shards)).astype(np.int32)


def _conform(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in t.column_names:
            cols.append(pc.cast(t[f.name], f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def asof_join(left_ds, right_ds, *, key: str, ts: str,
              value_cols: list[str], bucket: str = "auto",
              right_suffix: str = "_r", n_shards: int = 32,
              blk_factor: int = 16,
              broadcast_right_max: int = 1_000_000):
    """Returns a Dataset of all left columns plus, per ``value_cols`` entry,
    ``<col><right_suffix>`` (and ``<ts><right_suffix>``) from the matched
    right row; nulls when the key has no earlier-or-equal right row.

    When the right side fits under ``broadcast_right_max`` rows (probed with
    an early-stopping stream — a checkpoint/dimension stream usually does),
    it is broadcast once via ``ray.put`` and the whole join runs map-side
    with one ``pd.merge_asof`` per left batch: zero shuffle, no sort stage,
    and the left side streams. Above the cap (or with the cap set to 0) the
    skew-safe sharded-bucket shuffle below runs instead.

    ``bucket="auto"`` (default) calibrates the bucket span from a sampled
    quantile pre-pass over the left timestamp column — resolved lazily,
    only when the shuffle path actually runs (the broadcast fast path needs
    no buckets and pays no pre-pass)."""
    out_ts = f"{ts}{right_suffix}"
    out_vals = [f"{c}{right_suffix}" for c in value_cols]

    left_schema = left_ds.schema()
    lsch = pa.schema(list(zip(left_schema.names, left_schema.types)))
    ts_type = lsch.field(ts).type
    left_cols = list(lsch.names)

    out_schema_final = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field(out_ts, ts_type)]
        + [pa.field(oc, pa.float64()) for oc in out_vals])

    if broadcast_right_max:
        import ray

        from ._collect import collect_up_to

        parts, over = collect_up_to(right_ds, broadcast_right_max)
        if not over:
            if parts:
                rt = pa.concat_tables(parts)
                rdf = pd.DataFrame({key: rt[key].to_numpy(
                    zero_copy_only=False),
                    out_ts: rt[ts].to_numpy(zero_copy_only=False)})
                for c, oc in zip(value_cols, out_vals):
                    rdf[oc] = rt[c].to_numpy(
                        zero_copy_only=False).astype(np.float64)
                rdf = rdf.sort_values(out_ts,
                                      kind="stable").reset_index(drop=True)
            else:
                rdf = pd.DataFrame({key: pd.Series([], dtype="object"),
                                    out_ts: pd.Series([],
                                                      dtype="datetime64[ns]"),
                                    **{oc: pd.Series([], dtype=np.float64)
                                       for oc in out_vals}})
            ref = ray.put(rdf)

            def bcast_asof(df: pd.DataFrame) -> pd.DataFrame:
                r = ray.get(ref)
                le = df.sort_values(ts, kind="stable")
                if r.empty:
                    out = le.copy()
                    out[out_ts] = pd.NaT
                    for oc in out_vals:
                        out[oc] = np.nan
                    return out[left_cols + [out_ts, *out_vals]]
                merged = pd.merge_asof(le, r, left_on=ts, right_on=out_ts,
                                       by=key, direction="backward",
                                       allow_exact_matches=True)
                return merged[left_cols + [out_ts, *out_vals]]

            return (left_ds.map_batches(bcast_asof, batch_format="pandas")
                    .map_batches(lambda b: _conform(b, out_schema_final),
                                 batch_format="pyarrow"))

    if bucket == "auto":
        from ._calibrate import calibrate_bucket_width

        # blk_factor buckets merge into one shuffle block, so target
        # n_shards × blk_factor buckets ≈ n_shards blocks of work
        w = calibrate_bucket_width(left_ds, ts,
                                   target_buckets=n_shards * blk_factor)
        bucket_ns = (int(w.value) if isinstance(w, pd.Timedelta)
                     else max(int(w), 1))
    else:
        bucket_ns = pd.Timedelta(bucket).value

    # unified schema for the (left ∪ right ∪ carry) grouped shuffle
    uschema = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field("_shard", pa.int32()), pa.field("_blk", pa.int64()),
           pa.field("_side", pa.int8())]
        + [pa.field(oc, pa.float64()) for oc in out_vals]
        + [pa.field(out_ts, ts_type)])
    # summaries: markers (kind 0) + right-lasts (kind 1)
    sschema = pa.schema(
        [lsch.field(key), pa.field("_shard", pa.int32()),
         pa.field("_bkt", pa.int64()), pa.field("_kind", pa.int8()),
         pa.field(ts, ts_type)]
        + [pa.field(oc, pa.float64()) for oc in out_vals])

    def tag_left(b: pa.Table) -> pa.Table:
        bkt = _bkt_of(b[ts].to_numpy(zero_copy_only=False), bucket_ns)
        t = b.append_column("_shard",
                            pa.array(_shard_of(b[key], n_shards)))
        t = t.append_column("_blk", pa.array(bkt // blk_factor, pa.int64()))
        t = t.append_column("_side", pa.array(np.zeros(len(bkt), np.int8)))
        return _conform(t, uschema)

    def tag_right(b: pa.Table) -> pa.Table:
        bkt = _bkt_of(b[ts].to_numpy(zero_copy_only=False), bucket_ns)
        cols = {key: b[key],
                "_shard": pa.array(_shard_of(b[key], n_shards)),
                "_blk": pa.array(bkt // blk_factor, pa.int64()),
                "_side": pa.array(np.ones(len(bkt), np.int8)),
                out_ts: b[ts]}
        for c, oc in zip(value_cols, out_vals):
            cols[oc] = pc.cast(b[c], pa.float64())
        return _conform(pa.table(cols), uschema)

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow")
    right_tagged = right_ds.map_batches(tag_right, batch_format="pyarrow")

    # --- summaries --------------------------------------------------------
    def left_bucket_partial(b: pa.Table) -> pa.Table:
        bkt = _bkt_of(b[ts].to_numpy(zero_copy_only=False), bucket_ns)
        d = (pa.table({key: b[key], "_bkt": pa.array(bkt, pa.int64())})
             .group_by([key, "_bkt"]).aggregate([]))
        d = d.append_column("_shard",
                            pa.array(_shard_of(d[key], n_shards)))
        d = d.append_column("_kind", pa.array(np.zeros(d.num_rows, np.int8)))
        return _conform(d, sschema)

    def right_last_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           "_bkt": _bkt_of(
                               b[ts].to_numpy(zero_copy_only=False),
                               bucket_ns),
                           ts: b[ts].to_numpy(zero_copy_only=False)})
        for c, oc in zip(value_cols, out_vals):
            df[oc] = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
        df = (df.sort_values(ts, kind="stable")
              .groupby([key, "_bkt"], as_index=False).last())
        df["_kind"] = np.int8(1)
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.append_column("_shard", pa.array(_shard_of(t[key], n_shards)))
        return _conform(t, sschema)

    lb = left_ds.map_batches(left_bucket_partial, batch_format="pyarrow")
    rl = right_ds.map_batches(right_last_partial, batch_format="pyarrow")

    def carry_fill(g: pd.DataFrame) -> pd.DataFrame:
        # one shard = many keys; vectorized: sort so that within a key and
        # bucket every marker (_kind 0) precedes the right-lasts, then a
        # per-key forward-fill carries the latest EARLIER right state onto
        # each marker row
        g = g.sort_values([key, "_bkt", "_kind", ts],
                          kind="stable").reset_index(drop=True)
        is_r = (g["_kind"] == 1).to_numpy()
        state = g[[ts, *out_vals]].where(pd.Series(is_r, index=g.index))
        filled = state.groupby(g[key]).ffill()
        markers = (~is_r) & filled[ts].notna().to_numpy()
        out = pd.DataFrame({key: g.loc[markers, key].to_numpy(),
                            "_bkt": g.loc[markers, "_bkt"].to_numpy(),
                            ts: filled.loc[markers, ts].to_numpy()})
        for oc in out_vals:
            out[oc] = filled.loc[markers, oc].to_numpy()
        # markers can repeat across per-batch partials — one carry per bucket
        return out.drop_duplicates([key, "_bkt"])

    # the summary stream is O(active buckets); below the threshold one driver
    # pandas pass replaces a full distributed sort-groupby (same pattern as
    # duplicate_keys); above it, the per-shard distributed path runs
    summaries = lb.union(rl)
    carries = None
    from ._collect import collect_up_to

    driver_merge_max = 5_000_000
    parts, over = collect_up_to(summaries, driver_merge_max)
    if not over:
        import ray.data as rd

        if parts:
            df = pa.concat_tables(parts).to_pandas()
            cdf = carry_fill(df)
            carries = rd.from_arrow(_conform(
                pa.Table.from_pandas(cdf, preserve_index=False),
                pa.schema([lsch.field(key), pa.field("_bkt", pa.int64()),
                           pa.field(ts, ts_type)]
                          + [pa.field(oc, pa.float64())
                             for oc in out_vals])))
        else:
            carries = rd.from_arrow(pa.schema(
                [lsch.field(key), pa.field("_bkt", pa.int64()),
                 pa.field(ts, ts_type)]
                + [pa.field(oc, pa.float64())
                   for oc in out_vals]).empty_table())
    else:
        lb2 = left_ds.map_batches(left_bucket_partial,
                                  batch_format="pyarrow")
        rl2 = right_ds.map_batches(right_last_partial,
                                   batch_format="pyarrow")
        carries = lb2.union(rl2).groupby("_shard").map_groups(
            carry_fill, batch_format="pandas")

    def tag_carry(b: pa.Table) -> pa.Table:
        bkt = b["_bkt"].to_numpy(zero_copy_only=False)
        t = pa.table({key: b[key],
                      "_shard": pa.array(_shard_of(b[key], n_shards)),
                      "_blk": pa.array(bkt // blk_factor, pa.int64()),
                      "_side": pa.array(np.ones(b.num_rows, np.int8)),
                      out_ts: b[ts]})
        for oc in out_vals:
            t = t.append_column(oc, pc.cast(b[oc], pa.float64()))
        return _conform(t, uschema)

    carry_tagged = carries.map_batches(tag_carry, batch_format="pyarrow")

    # --- main grouped as-of: one merge_asof per (shard, bucket-block) -----
    def group_asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0]
        right = g[g["_side"] == 1]
        l = left[left_cols].sort_values(ts, kind="stable")
        r = (right[[key, out_ts, *out_vals]]
             .sort_values(out_ts, kind="stable"))
        merged = pd.merge_asof(l, r, left_on=ts, right_on=out_ts,
                               by=key, direction="backward",
                               allow_exact_matches=True)
        return merged[left_cols + [out_ts, *out_vals]]

    everything = left_tagged.union(right_tagged).union(carry_tagged)
    grouped = everything.groupby(["_shard", "_blk"]).map_groups(
        group_asof, batch_format="pandas")
    # pandas promotes int left-columns to float through the null-bearing
    # union (right/carry rows have null left payloads) — cast back
    out_schema = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field(out_ts, ts_type)]
        + [pa.field(oc, pa.float64()) for oc in out_vals])
    return grouped.map_batches(lambda b: _conform(b, out_schema),
                               batch_format="pyarrow")
