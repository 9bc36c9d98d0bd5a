"""Distributed as-of join — an operator Ray Data lacks natively.

For every left row, attach the latest right row of the same key with
``right.ts <= left.ts`` (SQL: ``ASOF LEFT JOIN``). The naive expression
(groupby(key) with both sides' full history in one group) has the same hot-key
failure as naive windows, so this uses the skew-safe (key, coarse time-bucket)
shuffle plus a carry-in pass:

1. Both sides bucket on (key, floor(ts / bucket)).
2. Per (key, bucket), the LAST right row is reduced out (per-batch partial,
   then a tiny groupby) — the "summary" stream, O(active buckets), not rows.
3. Left-active buckets (distinct (key, bucket) of the left side — another tiny
   summary) merge with the right summaries per key, sorted by bucket: a single
   forward walk emits one carry-in row per LEFT-active bucket holding the
   latest right row from any EARLIER bucket. Group size here is #buckets per
   key, never #rows — sparse right sides don't explode into per-bucket copies.
4. Left rows + right rows + carry-in rows shuffle on (key, bucket); inside
   each group a sorted searchsorted resolves the as-of match exactly.

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


def _bkt_of(arr: np.ndarray, bucket_ns: int) -> np.ndarray:
    return arr.astype("datetime64[ns]").astype(np.int64) // bucket_ns


def _conform(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in t.column_names:
            cols.append(pc.cast(t[f.name], f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def asof_join(left_ds, right_ds, *, key: str, ts: str,
              value_cols: list[str], bucket: str = "6h",
              right_suffix: str = "_r"):
    """Returns a Dataset of all left columns plus, per ``value_cols`` entry,
    ``<col><right_suffix>`` (and ``<ts><right_suffix>``) from the matched
    right row; nulls when the key has no earlier-or-equal right row."""
    bucket_ns = pd.Timedelta(bucket).value
    out_ts = f"{ts}{right_suffix}"
    out_vals = [f"{c}{right_suffix}" for c in value_cols]

    left_schema = left_ds.schema()
    lsch = pa.schema(list(zip(left_schema.names, left_schema.types)))
    ts_type = lsch.field(ts).type
    left_cols = list(lsch.names)

    # unified schema for the (left ∪ right ∪ carry) grouped shuffle
    uschema = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field("_bkt", pa.int64()), pa.field("_side", pa.int8())]
        + [pa.field(oc, pa.float64()) for oc in out_vals])
    # summaries: markers (kind 0) + right-lasts (kind 1)
    sschema = pa.schema(
        [lsch.field(key), pa.field("_bkt", pa.int64()),
         pa.field("_kind", pa.int8()), pa.field(ts, ts_type)]
        + [pa.field(oc, pa.float64()) for oc in out_vals])

    def tag_left(b: pa.Table) -> pa.Table:
        bkt = _bkt_of(b[ts].to_numpy(zero_copy_only=False), bucket_ns)
        t = b.append_column("_bkt", pa.array(bkt, pa.int64()))
        t = t.append_column("_side", pa.array(np.zeros(len(bkt), np.int8)))
        return _conform(t, uschema)

    def tag_right(b: pa.Table) -> pa.Table:
        bkt = _bkt_of(b[ts].to_numpy(zero_copy_only=False), bucket_ns)
        cols = {key: b[key], ts: b[ts],
                "_bkt": pa.array(bkt, pa.int64()),
                "_side": pa.array(np.ones(len(bkt), np.int8))}
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
        d = d.append_column("_kind",
                            pa.array(np.zeros(d.num_rows, np.int8)))
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
        return _conform(pa.Table.from_pandas(df, preserve_index=False),
                        sschema)

    lb = left_ds.map_batches(left_bucket_partial, batch_format="pyarrow")
    rl = right_ds.map_batches(right_last_partial, batch_format="pyarrow")

    def carry_fill(g: pd.DataFrame) -> pd.DataFrame:
        # markers (_kind 0) sort before right-lasts within a bucket, so a
        # marker at bucket b sees only right state from buckets < b; multiple
        # right-last partials for one bucket resolve by ts (last wins)
        g = g.sort_values(["_bkt", "_kind", ts], kind="stable")
        prev_ts, prev_vals = None, None
        rows = []
        seen: set = set()
        kvals = g[key].to_numpy()
        bvals = g["_bkt"].to_numpy()
        kinds = g["_kind"].to_numpy()
        tvals = g[ts].to_numpy()
        vmat = g[out_vals].to_numpy() if out_vals else None
        for i in range(len(g)):
            if kinds[i] == 0:
                b = bvals[i]
                if prev_ts is not None and b not in seen:
                    rows.append((kvals[i], b, prev_ts, *prev_vals))
                seen.add(b)
            else:
                prev_ts = tvals[i]
                prev_vals = tuple(vmat[i]) if vmat is not None else ()
        return pd.DataFrame(rows, columns=[key, "_bkt", ts, *out_vals])

    carries = lb.union(rl).groupby(key).map_groups(carry_fill,
                                                   batch_format="pandas")

    def tag_carry(b: pa.Table) -> pa.Table:
        t = b.append_column("_side",
                            pa.array(np.ones(b.num_rows, np.int8)))
        return _conform(t, uschema)

    carry_tagged = carries.map_batches(tag_carry, batch_format="pyarrow")

    # --- main grouped as-of ----------------------------------------------
    def group_asof(g: pd.DataFrame) -> pd.DataFrame:
        right = g[g["_side"] == 1].sort_values(ts, kind="stable")
        left = g[g["_side"] == 0].copy()
        rts = right[ts].to_numpy()
        lts = left[ts].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        matched_ts = np.full(
            len(left), np.datetime64("NaT"),
            dtype=rts.dtype if len(rts) else lts.dtype)
        if len(rts):
            matched_ts[ok] = rts[idx[ok]]
        left[out_ts] = matched_ts
        for oc in out_vals:
            vals = np.full(len(left), np.nan)
            if len(right):
                vals[ok] = right[oc].to_numpy()[idx[ok]]
            left[oc] = vals
        return left[left_cols + [out_ts, *out_vals]]

    everything = left_tagged.union(right_tagged).union(carry_tagged)
    grouped = everything.groupby([key, "_bkt"]).map_groups(
        group_asof, batch_format="pandas")
    # pandas promotes int left-columns to float through the null-bearing
    # union (right/carry rows have null left payloads) — cast back
    out_schema = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field(out_ts, ts_type)]
        + [pa.field(oc, pa.float64()) for oc in out_vals])
    return grouped.map_batches(lambda b: _conform(b, out_schema),
                               batch_format="pyarrow")
