"""Partitioned analytic (SQL window) functions: running sum, lag, ntile,
rank / dense_rank / percent_rank.

SQL shape: ``f(...) OVER (PARTITION BY key ORDER BY order_col, tiebreak)``.
Ray Data has no window functions; the naive expression — ``groupby(key)
.map_groups(sort + scan)`` — puts a key's ENTIRE history on one worker, which
a hot key breaks at scale. These operators reuse the skew-safe shape proven by
``windows.sessionize``: the shuffle key is ``(shard(key), coarse bucket of
order_col)``, so one worker holds at most (bucket span × key rate) rows. Each
group computes LOCAL scans and emits one tiny summary row per (key, bucket);
the summaries (|keys| × |buckets|, streamed under ``summary_merge_max``)
chain-merge on the driver into per-(key, bucket) carry-in values broadcast via
``ray.put`` and applied map-side. Above the guard, falls back to the exact
single-shuffle ``groupby(key).map_groups`` path (hot-key bounded by the
largest key's history — documented, loud).

All three are deterministic: within-key order is (order_col, tiebreak), and
ties land in the same bucket (the bucket is a pure function of order_col), so
tie handling is always local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._calibrate import resolve_bucket_width
from .windows import _shard_series

_SUMMARY_MERGE_MAX = 5_000_000


def _order_ints(series) -> np.ndarray:
    """Order column as int64: ns for datetimes, raw for ints."""
    v = series.to_numpy()
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[ns]").astype(np.int64)
    return v.astype(np.int64, copy=False)


def _bucket_of(series, bucket_width) -> np.ndarray:
    """Coarse range bucket of the order column (pure function of the value,
    so equal order values — potential ties — always share a bucket)."""
    v = series.to_numpy()
    if np.issubdtype(v.dtype, np.datetime64):
        ns = v.astype("datetime64[ns]").astype(np.int64)
        return ns // int(pd.Timedelta(bucket_width).value)
    return np.floor(v.astype(np.float64) / float(bucket_width)).astype(np.int64)


def _collect_summaries(tagged, cols: list[str],
                       summary_merge_max: int):
    """Stream the _side==1 rows to the driver under the merge guard.
    Returns (DataFrame | None); None means over budget."""
    parts, total = [], 0
    for b in (tagged.filter(expr="_side == 1")
              .iter_batches(batch_size=1 << 20, batch_format="pandas")):
        if len(b):
            parts.append(b[cols])
            total += len(b)
        if total > summary_merge_max:
            return None
    if not parts:
        return pd.DataFrame({c: [] for c in cols})
    return pd.concat(parts, ignore_index=True)


def _key_segments(kv: pd.Series) -> np.ndarray:
    """Boolean break mask: True where a new key's run starts (input sorted)."""
    return (kv != kv.shift()).to_numpy()


def _bucket_of_col(col, bucket_width) -> np.ndarray:
    """Arrow column → int64 bucket ids (same math as ``_bucket_of``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind == "M":
        ns = v.astype("datetime64[ns]").astype(np.int64)
        return ns // int(pd.Timedelta(bucket_width).value)
    return np.floor(v.astype(np.float64) / float(bucket_width)).astype(np.int64)


def _adjacent_break(col, n: int) -> np.ndarray:
    """True where row i differs from row i−1 (row 0 always True) — the
    Arrow-native ``_key_segments`` over a sorted column; nulls break a run
    exactly like the pandas ``NaN != NaN`` they replace."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ne = pc.fill_null(pc.not_equal(col.slice(1), col.slice(0, n - 1)), True)
    return np.r_[True, ne.to_numpy(zero_copy_only=False)]


def _probe_summary(b: pa.Table, key: str, sdf: pd.DataFrame,
                   val_cols: list[str],
                   dtypes: list | None = None,
                   fills: list | None = None) -> list[np.ndarray]:
    """Vectorized carry-in lookup for an Arrow batch: factorize the batch's
    (key, _bkt) pairs and merge ONLY the distinct pairs against the
    broadcast summary frame — the per-row work is a single int gather, and
    pandas touches |distinct pairs| rows, never the event stream. Missing
    pairs carry 0 (a bucket with no earlier carry)."""
    kv = b[key].to_numpy(zero_copy_only=False)
    bv = b["_bkt"].to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(pd.MultiIndex.from_arrays([kv, bv]))
    pairs = pd.DataFrame({key: uniq.get_level_values(0),
                          "_bkt": uniq.get_level_values(1)})
    m = pairs.merge(sdf, on=[key, "_bkt"], how="left") if len(sdf) else \
        pairs.assign(**{c: np.nan for c in val_cols})
    if dtypes is None:
        dtypes = [np.int64] * len(val_cols)
    if fills is None:
        fills = [0] * len(val_cols)
    return [m[c].fillna(f).to_numpy(dtype=d)[codes]
            for c, d, f in zip(val_cols, dtypes, fills)]


def running_sum(ds, *, key: str, order_col: str, value: str,
                tiebreak: str, out_col: str = "running_sum",
                bucket_width="auto", n_shards: int = 32,
                summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``SUM(value) OVER (PARTITION BY key ORDER BY order_col, tiebreak)``
    (cumulative / inclusive). Local cumsum per (key, bucket) group + one
    summary row per (key, bucket) carrying the bucket total; driver
    prefix-sums the totals per key into carry-in offsets."""
    import ray

    in_cols = list(ds.schema().names)
    bucket_width = resolve_bucket_width(ds, order_col, bucket_width)

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.append_column("_bkt", pa.array(
            _bucket_of_col(b[order_col], bucket_width), pa.int64()))
        from .asof import _shard_of
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_scan(g: pa.Table) -> pa.Table:
        n = g.num_rows
        t = g.take(pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_bkt", "ascending"),
                          (order_col, "ascending"),
                          (tiebreak, "ascending")]))
        brk = _adjacent_break(t[key], n) | _adjacent_break(t["_bkt"], n)
        vals = t[value].to_numpy(zero_copy_only=False)
        # integer inputs accumulate exactly (int64); floats keep float64 —
        # bucket-total association then differs from a sequential scan by
        # O(eps · magnitude), fine under rounded comparison, never for ints
        vals = vals.astype(np.int64 if np.issubdtype(vals.dtype, np.integer)
                           else np.float64)
        cs = np.cumsum(vals)
        seg = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1
        base = np.r_[cs.dtype.type(0), cs[:-1]][seg]   # cumsum before segment
        local = cs - base[seg_id]
        tb = t.select(in_cols + ["_bkt"])
        ev = (tb.append_column("_lsum", pa.array(local))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        last = np.r_[seg[1:] - 1, n - 1]         # last row of each segment
        summ = (tb.take(pa.array(last))
                .append_column("_lsum", pa.array(local[last]))
                .append_column("_side",
                               pa.array(np.ones(len(last), np.int8))))
        return pa.concat_tables([ev, summ])

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_scan, batch_format="pyarrow").materialize())

    s = _collect_summaries(tagged, [key, "_bkt", "_lsum"], summary_merge_max)
    if s is None:
        return _exact_running_sum(ds, key=key, order_col=order_col,
                                  value=value, tiebreak=tiebreak,
                                  out_col=out_col)

    if len(s):
        s = s.sort_values([key, "_bkt"], kind="stable").reset_index(drop=True)
        brk = _key_segments(s[key])
        tot = np.cumsum(s["_lsum"].to_numpy())
        seg = np.flatnonzero(brk)
        zero = tot.dtype.type(0)
        base = np.r_[zero, tot[:-1]][seg]
        off = np.r_[zero, tot[:-1]] - base[np.cumsum(brk) - 1]  # exclusive
        s["_off"] = off
        s = s[s["_off"] != 0]                    # first buckets carry nothing
    else:
        s = s.assign(_off=pd.Series([], dtype="float64"))
    ref = ray.put(s[[key, "_bkt", "_off"]])

    def finalize(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        lsum = b["_lsum"].to_numpy(zero_copy_only=False)
        is_int = np.issubdtype(lsum.dtype, np.integer)
        (off,) = _probe_summary(b, key, r, ["_off"],
                                [np.int64 if is_int else np.float64])
        res = lsum + off
        if is_int:
            res = res.astype(np.int64)           # offsets exact below 2^53
        return b.select(in_cols).append_column(out_col, pa.array(res))

    return (tagged.filter(expr="_side == 0")
            .map_batches(finalize, batch_format="pyarrow"))


def _exact_running_sum(ds, *, key, order_col, value, tiebreak, out_col):
    """Single-shuffle exact fallback: one worker per key (hot-key bounded)."""
    in_cols = list(ds.schema().names)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, order_col, tiebreak], kind="stable")
             .reset_index(drop=True))
        brk = _key_segments(g[key])
        vals = g[value].to_numpy()
        vals = vals.astype(np.int64 if np.issubdtype(vals.dtype, np.integer)
                           else np.float64)
        cs = np.cumsum(vals)
        seg = np.flatnonzero(brk)
        base = np.r_[cs.dtype.type(0), cs[:-1]][seg]
        g[out_col] = cs - base[np.cumsum(brk) - 1]
        return g[in_cols + [out_col]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def lag_gap_us(ds, *, key: str, ts: str, tiebreak: str,
               out_col: str = "gap_us", bucket_width="auto",
               n_shards: int = 32,
               summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY key ORDER BY ts,
    tiebreak)`` with -1 for a key's first row (no previous event). The only
    cross-bucket fact a row needs is the previous bucket's LAST timestamp for
    its key — exactly one summary row per (key, bucket)."""
    import ray

    in_cols = list(ds.schema().names)
    bucket_width = resolve_bucket_width(ds, ts, bucket_width)

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.append_column("_bkt", pa.array(
            _bucket_of_col(b[ts], bucket_width), pa.int64()))
        from .asof import _shard_of
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_scan(g: pa.Table) -> pa.Table:
        n = g.num_rows
        t = g.take(pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_bkt", "ascending"),
                          (ts, "ascending"), (tiebreak, "ascending")]))
        brk = _adjacent_break(t[key], n) | _adjacent_break(t["_bkt"], n)
        us = (t[ts].to_numpy(zero_copy_only=False)
              .astype("datetime64[ns]").astype(np.int64) // 1000)
        gap = us - np.r_[0, us[:-1]]
        gap[brk] = -1                            # unknown: resolve via carry-in
        tb = t.select(in_cols + ["_bkt"])
        ev = (tb.append_column("_gap", pa.array(gap))
              .append_column("_first", pa.array(brk.astype(np.int8)))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        seg = np.flatnonzero(brk)
        last = np.r_[seg[1:] - 1, n - 1]
        summ = (tb.take(pa.array(last))
                .append_column("_gap", pa.array(us[last]))  # bucket-last µs
                .append_column("_first",
                               pa.array(np.zeros(len(last), np.int8)))
                .append_column("_side",
                               pa.array(np.ones(len(last), np.int8))))
        return pa.concat_tables([ev, summ])

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_scan, batch_format="pyarrow").materialize())

    s = _collect_summaries(tagged, [key, "_bkt", "_gap"], summary_merge_max)
    if s is None:
        return _exact_lag_gap(ds, key=key, ts=ts, tiebreak=tiebreak,
                              out_col=out_col)

    if len(s):
        s = s.sort_values([key, "_bkt"], kind="stable").reset_index(drop=True)
        new_key = _key_segments(s[key])
        prev = np.r_[-1, s["_gap"].to_numpy()[:-1]]
        prev[new_key] = -1                       # key's first bucket: none
        s["_prev_us"] = prev
        s = s[s["_prev_us"] >= 0][[key, "_bkt", "_prev_us"]]
    else:
        s = s.assign(_prev_us=pd.Series([], dtype="int64"))[
            [key, "_bkt", "_prev_us"]]
    ref = ray.put(s)

    def finalize(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        sentinel = np.iinfo(np.int64).min        # no real epoch equals it
        (prev,) = _probe_summary(b, key, r, ["_prev_us"],
                                 fills=[sentinel])
        us = (b[ts].to_numpy(zero_copy_only=False)
              .astype("datetime64[ns]").astype(np.int64) // 1000)
        first = b["_first"].to_numpy(zero_copy_only=False).astype(bool)
        gap = b["_gap"].to_numpy(zero_copy_only=False).copy()
        hit = first & (prev != sentinel)
        gap[hit] = us[hit] - prev[hit]
        return b.select(in_cols).append_column(out_col, pa.array(gap))

    return (tagged.filter(expr="_side == 0")
            .map_batches(finalize, batch_format="pyarrow"))


def lead_gap_us(ds, *, key: str, ts: str, tiebreak: str,
                out_col: str = "gap_us", bucket_width="auto",
                n_shards: int = 32,
                summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``LEAD(epoch_us(ts)) OVER (PARTITION BY key ORDER BY ts, tiebreak) -
    epoch_us(ts)`` with -1 for a key's last row — the mirror of
    :func:`lag_gap_us`; the cross-bucket fact is the NEXT bucket's FIRST
    timestamp per key, so summaries shift one bucket backwards in the
    driver merge."""
    import ray

    in_cols = list(ds.schema().names)
    bucket_width = resolve_bucket_width(ds, ts, bucket_width)

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.append_column("_bkt", pa.array(
            _bucket_of_col(b[ts], bucket_width), pa.int64()))
        from .asof import _shard_of
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_scan(g: pa.Table) -> pa.Table:
        n = g.num_rows
        t = g.take(pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_bkt", "ascending"),
                          (ts, "ascending"), (tiebreak, "ascending")]))
        brk = _adjacent_break(t[key], n) | _adjacent_break(t["_bkt"], n)
        us = (t[ts].to_numpy(zero_copy_only=False)
              .astype("datetime64[ns]").astype(np.int64) // 1000)
        nxt = np.r_[us[1:], 0] - us
        last = np.r_[brk[1:], True]              # segment-last rows
        nxt[last] = -1                           # unknown: resolve via carry
        tb = t.select(in_cols + ["_bkt"])
        ev = (tb.append_column("_gap", pa.array(nxt))
              .append_column("_last", pa.array(last.astype(np.int8)))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        first = np.flatnonzero(brk)
        summ = (tb.take(pa.array(first))
                .append_column("_gap", pa.array(us[first]))  # bucket-FIRST
                .append_column("_last",
                               pa.array(np.zeros(len(first), np.int8)))
                .append_column("_side",
                               pa.array(np.ones(len(first), np.int8))))
        return pa.concat_tables([ev, summ])

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_scan, batch_format="pyarrow").materialize())

    s = _collect_summaries(tagged, [key, "_bkt", "_gap"], summary_merge_max)
    if s is None:
        return _exact_lead_gap(ds, key=key, ts=ts, tiebreak=tiebreak,
                               out_col=out_col)

    if len(s):
        s = s.sort_values([key, "_bkt"], kind="stable").reset_index(drop=True)
        same_key_next = np.r_[(s[key].to_numpy()[1:]
                               == s[key].to_numpy()[:-1]), False]
        nxt = np.r_[s["_gap"].to_numpy()[1:], -1]
        nxt[~same_key_next] = -1                 # key's last bucket: none
        s["_next_us"] = nxt
        s = s[s["_next_us"] >= 0][[key, "_bkt", "_next_us"]]
    else:
        s = s.assign(_next_us=pd.Series([], dtype="int64"))[
            [key, "_bkt", "_next_us"]]
    ref = ray.put(s)

    def finalize(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        sentinel = np.iinfo(np.int64).min
        (nxt,) = _probe_summary(b, key, r, ["_next_us"], fills=[sentinel])
        us = (b[ts].to_numpy(zero_copy_only=False)
              .astype("datetime64[ns]").astype(np.int64) // 1000)
        last = b["_last"].to_numpy(zero_copy_only=False).astype(bool)
        gap = b["_gap"].to_numpy(zero_copy_only=False).copy()
        hit = last & (nxt != sentinel)
        gap[hit] = nxt[hit] - us[hit]
        return b.select(in_cols).append_column(out_col, pa.array(gap))

    return (tagged.filter(expr="_side == 0")
            .map_batches(finalize, batch_format="pyarrow"))


def _exact_lead_gap(ds, *, key, ts, tiebreak, out_col):
    in_cols = list(ds.schema().names)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, ts, tiebreak], kind="stable")
             .reset_index(drop=True))
        us = _order_ints(g[ts]) // 1000
        gap = np.r_[us[1:], 0] - us
        gap[np.r_[_key_segments(g[key])[1:], True]] = -1
        g[out_col] = gap
        return g[in_cols + [out_col]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def _exact_lag_gap(ds, *, key, ts, tiebreak, out_col):
    in_cols = list(ds.schema().names)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, ts, tiebreak], kind="stable")
             .reset_index(drop=True))
        us = _order_ints(g[ts]) // 1000
        gap = us - np.r_[0, us[:-1]]
        gap[_key_segments(g[key])] = -1
        g[out_col] = gap
        return g[in_cols + [out_col]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def ntile(ds, *, key: str, order_col: str, tiebreak: str, n: int,
          out_col: str = "tile", bucket_width="auto", n_shards: int = 32,
          summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``NTILE(n) OVER (PARTITION BY key ORDER BY order_col, tiebreak)``
    (SQL semantics: the first ``count % n`` tiles get ``ceil(count/n)`` rows).
    Local ranks per (key, bucket) + per-(key, bucket) count summaries; the
    driver prefix-sums counts into global rank offsets and per-key totals."""
    import ray

    in_cols = list(ds.schema().names)
    bucket_width = resolve_bucket_width(ds, order_col, bucket_width)

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.append_column("_bkt", pa.array(
            _bucket_of_col(b[order_col], bucket_width), pa.int64()))
        from .asof import _shard_of
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_scan(g: pa.Table) -> pa.Table:
        n = g.num_rows
        t = g.take(pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_bkt", "ascending"),
                          (order_col, "ascending"),
                          (tiebreak, "ascending")]))
        brk = _adjacent_break(t[key], n) | _adjacent_break(t["_bkt"], n)
        idx = np.arange(n, dtype=np.int64)
        seg = np.flatnonzero(brk)
        lrank = idx - seg[np.cumsum(brk) - 1]
        base = t.select(in_cols + ["_bkt"])
        ev = (base.append_column("_lrank", pa.array(lrank))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        last = np.r_[seg[1:] - 1, n - 1]
        summ = (base.take(pa.array(last))
                .append_column("_lrank", pa.array(lrank[last] + 1))
                .append_column("_side",
                               pa.array(np.ones(len(last), np.int8))))
        return pa.concat_tables([ev, summ])

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_scan, batch_format="pyarrow").materialize())

    s = _collect_summaries(tagged, [key, "_bkt", "_lrank"], summary_merge_max)
    if s is None:
        return _exact_ntile(ds, key=key, order_col=order_col,
                            tiebreak=tiebreak, n=n, out_col=out_col)

    if len(s):
        s = s.sort_values([key, "_bkt"], kind="stable").reset_index(drop=True)
        brk = _key_segments(s[key])
        cnt = s["_lrank"].to_numpy()
        tot = np.cumsum(cnt)
        seg = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1
        base = np.r_[0, tot[:-1]][seg]
        s["_off"] = np.r_[0, tot[:-1]] - base[seg_id]      # exclusive prefix
        key_tot = (tot[np.r_[seg[1:] - 1, len(s) - 1]] - base)[seg_id]
        s["_tot"] = key_tot
        s = s[[key, "_bkt", "_off", "_tot"]]
    else:
        s = s.assign(_off=pd.Series([], dtype="int64"),
                     _tot=pd.Series([], dtype="int64"))[
            [key, "_bkt", "_off", "_tot"]]
    ref = ray.put(s)

    def finalize(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        off, g = _probe_summary(b, key, r, ["_off", "_tot"])
        rank = b["_lrank"].to_numpy(zero_copy_only=False) + off
        return (b.select(in_cols)
                .append_column(out_col, pa.array(_ntile_of(rank, g, n))))

    return (tagged.filter(expr="_side == 0")
            .map_batches(finalize, batch_format="pyarrow"))


def _ntile_of(rank: np.ndarray, total: np.ndarray, n: int) -> np.ndarray:
    """SQL NTILE: with g rows and n tiles, the first g % n tiles hold
    ceil(g/n) rows, the rest floor(g/n). rank is 0-based; result 1-based."""
    q = total // n
    big = total % n
    cut = big * (q + 1)
    small_q = np.maximum(q, 1)                   # q==0 → all rows below cut
    return np.where(rank < cut,
                    rank // np.maximum(q + 1, 1),
                    big + (rank - cut) // small_q).astype(np.int64) + 1


def _exact_ntile(ds, *, key, order_col, tiebreak, n, out_col):
    in_cols = list(ds.schema().names)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, order_col, tiebreak], kind="stable")
             .reset_index(drop=True))
        brk = _key_segments(g[key])
        idx = np.arange(len(g), dtype=np.int64)
        seg = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1
        rank = idx - seg[seg_id]
        last = np.r_[seg[1:] - 1, len(g) - 1]
        total = (rank[last] + 1)[seg_id]
        g[out_col] = _ntile_of(rank, total, n)
        return g[in_cols + [out_col]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def rows_moving_sum(ds, *, key: str, order_col: str, value: str,
                    tiebreak: str, k: int,
                    sum_col: str = "w_sum", cnt_col: str = "w_cnt",
                    bucket_width="auto", n_shards: int = 32,
                    summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``SUM(value) / COUNT(*) OVER (PARTITION BY key ORDER BY order_col,
    tiebreak ROWS BETWEEN k PRECEDING AND CURRENT ROW)`` — the ROWS-frame
    window family (``sliding_sum`` in windows.py is the RANGE-frame one).

    Same skew-safe (shard(key), order bucket) shuffle as ``running_sum``;
    the cross-bucket fact is richer: a row in the first ``k`` positions of
    its (key, bucket) segment needs the last ``k - pos`` VALUES of the key's
    preceding buckets, so each segment's summary is its last ``min(k, len)``
    value rows (≤ k per (key, bucket), still summary-sized for small k).
    The driver sorts summaries by (key, bucket, local order); within a key
    that concatenation of bucket tails has the property that the k rows
    before a bucket's first summary row ARE the rolling last-k values, so
    carry-in reduces to (start offset, available rows) per (key, bucket)
    plus ONE prefix-sum array over all summary values — fully vectorized,
    no per-key walk, and the broadcast is two flat arrays. Short windows
    add ``cs[start] - cs[start - take]`` map-side. Exact ``groupby(key)``
    fallback above the summary budget."""
    import ray

    if k < 0:
        raise ValueError("k must be >= 0")
    in_cols = list(ds.schema().names)
    # coarser grid than the rank family: each (key, bucket) segment emits a
    # k-row TAIL summary (not one row), so summary volume scales with
    # k × buckets — shards already provide the baseline parallelism
    bucket_width = resolve_bucket_width(ds, order_col, bucket_width,
                                        target_buckets=8)

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.append_column("_bkt", pa.array(
            _bucket_of_col(b[order_col], bucket_width), pa.int64()))
        from .asof import _shard_of
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_scan(g: pa.Table) -> pa.Table:
        n = g.num_rows
        t = g.take(pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_bkt", "ascending"),
                          (order_col, "ascending"),
                          (tiebreak, "ascending")]))
        brk = _adjacent_break(t[key], n) | _adjacent_break(t["_bkt"], n)
        idx = np.arange(n, dtype=np.int64)
        seg = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1
        p = idx - seg[seg_id]                        # local position
        vals = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        cs = np.cumsum(vals)
        lo = idx - np.minimum(p, k)                  # window start index
        lsum = cs[idx] - (cs[lo] - vals[lo])
        tb = t.select(in_cols + ["_bkt"])
        ev = (tb.append_column("_lsum", pa.array(lsum))
              .append_column("_lcnt", pa.array(np.minimum(p, k) + 1))
              .append_column("_need", pa.array(np.maximum(k - p, 0)))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        seg_end = np.r_[seg[1:] - 1, n - 1][seg_id]
        tail = (seg_end - idx) < k if k else np.zeros(n, bool)
        ti = np.flatnonzero(tail)
        summ = (tb.take(pa.array(ti))
                .append_column("_lsum", pa.array(vals[ti]))  # raw value
                .append_column("_lcnt", pa.array(p[ti]))     # replay order
                .append_column("_need",
                               pa.array(np.zeros(len(ti), np.int64)))
                .append_column("_side",
                               pa.array(np.ones(len(ti), np.int8))))
        return pa.concat_tables([ev, summ])

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_scan, batch_format="pyarrow").materialize())

    s = _collect_summaries(tagged, [key, "_bkt", "_lsum", "_lcnt"],
                           summary_merge_max)
    if s is None:
        return _exact_rows_moving(ds, key=key, order_col=order_col,
                                  value=value, tiebreak=tiebreak, k=k,
                                  sum_col=sum_col, cnt_col=cnt_col)

    if len(s) and k:
        s = (s.sort_values([key, "_bkt", "_lcnt"], kind="stable")
             .reset_index(drop=True))
        kv = s[key].to_numpy()
        bv = s["_bkt"].to_numpy()
        grp_brk = np.r_[True, (kv[1:] != kv[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(grp_brk)
        key_brk = np.r_[True, kv[1:] != kv[:-1]]
        key_id = np.cumsum(key_brk) - 1
        key_start = np.flatnonzero(key_brk)[key_id[starts]]
        avail = np.minimum(starts - key_start, k)
        g_tbl = pd.DataFrame({key: kv[starts], "_bkt": bv[starts],
                              "_cstart": starts.astype(np.int64),
                              "_avail": avail.astype(np.int64)})
        g_tbl = g_tbl[g_tbl["_avail"] > 0]
        cs = np.r_[0.0, np.cumsum(s["_lsum"].to_numpy())]
    else:
        g_tbl = pd.DataFrame({key: [], "_bkt": [],
                              "_cstart": pd.Series([], dtype="int64"),
                              "_avail": pd.Series([], dtype="int64")})
        cs = np.zeros(1)
    ref = ray.put((g_tbl, cs))

    def finalize(b: pa.Table) -> pa.Table:
        g, csum = ray.get(ref)
        wsum = b["_lsum"].to_numpy(zero_copy_only=False)
        wcnt = b["_lcnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        need = b["_need"].to_numpy(zero_copy_only=False)
        if need.max(initial=0) > 0 and len(g):
            avail, start = _probe_summary(b, key, g, ["_avail", "_cstart"])
            take = np.minimum(need, avail)
            wsum = wsum + (csum[start] - csum[start - take])
            wcnt = wcnt + take
        return (b.select(in_cols)
                .append_column(sum_col, pa.array(wsum, pa.float64()))
                .append_column(cnt_col, pa.array(wcnt)))

    return (tagged.filter(expr="_side == 0")
            .map_batches(finalize, batch_format="pyarrow"))


def _exact_rows_moving(ds, *, key, order_col, value, tiebreak, k,
                       sum_col, cnt_col):
    in_cols = list(ds.schema().names)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, order_col, tiebreak], kind="stable")
             .reset_index(drop=True))
        grp = g.groupby(key, sort=False)[value]
        g[sum_col] = grp.transform(
            lambda v: v.rolling(k + 1, min_periods=1).sum())
        g[cnt_col] = grp.transform(
            lambda v: v.rolling(k + 1, min_periods=1).count()).astype(np.int64)
        return g[in_cols + [sum_col, cnt_col]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def group_zscore_outliers(ds, *, value_col: str, group_col: str,
                          threshold: float = 3.0, out_cols=None):
    """Rows whose value deviates more than ``threshold`` standard deviations
    from their group's mean — the classic distribution-based validation
    check. Two passes, zero wide shuffle:

    1. tiny per-group (n, sum, sum-of-squares) aggregate — per-batch partials
       bound the exchange at |groups| rows per batch;
    2. the per-group (mean, std) table broadcasts via ``ray.put`` and the
       filter runs map-only (population std, matching SQL
       ``sqrt(sq/n - (sv/n)^2)``).

    Groups with zero variance emit no rows (any deviation would be infinite,
    equal values are never outliers) — the SQL oracle's division by zero
    yields NULL/inf comparisons that drop the same rows."""
    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        # drop null groups AND null/NaN values: SQL sum/stddev ignore NULLs
        # — one NULL value would NaN-poison the whole group's (sv, sq) (and
        # worse: a NaN partial row is silently SKIPPED by the downstream
        # Sum, dropping the entire batch's contribution), and a NULL key
        # factorizes to code −1 (a negative np.bincount index)
        b = b.select([group_col, value_col]).drop_null()
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = b[group_col].to_numpy(zero_copy_only=False)
        fin = ~np.isnan(v)
        v, keys = v[fin], keys[fin]
        codes, uniq = pd.factorize(keys)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        sv = np.zeros(len(uniq)); np.add.at(sv, codes, v)
        sq = np.zeros(len(uniq)); np.add.at(sq, codes, v * v)
        return pa.table({group_col: pa.array(uniq, b[group_col].type),
                         "n": pa.array(n, pa.int64()),
                         "sv": pa.array(sv, pa.float64()),
                         "sq": pa.array(sq, pa.float64())})

    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(group_col)
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sv", alias_name="sv"),
                        Sum("sq", alias_name="sq")))
    rows = stats.take_all()   # |groups| rows — tiny by construction
    mean_std = {}
    for r in rows:
        n = float(r["n"])
        mean = r["sv"] / n
        var = r["sq"] / n - mean * mean
        mean_std[r[group_col]] = (mean, np.sqrt(var) if var > 0 else 0.0)
    ref = ray.put(mean_std)

    def flag(b: pa.Table) -> pa.Table:
        ms = ray.get(ref)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = b[group_col].to_numpy(zero_copy_only=False)
        # vectorized lookup via factorize (one dict probe per DISTINCT key);
        # null-key rows (factorize code −1) are never outliers — indexing
        # mu[-1] would silently test them against the LAST group's stats
        codes, uniq = pd.factorize(keys)
        keep = np.zeros(len(codes), bool)
        valid = codes >= 0
        if len(uniq) and valid.any():
            mu = np.array([ms.get(u, (np.nan, 0.0))[0] for u in uniq])
            sd = np.array([ms.get(u, (np.nan, 0.0))[1] for u in uniq])
            cv = codes[valid]
            sdv = sd[cv]
            with np.errstate(divide="ignore", invalid="ignore"):
                z = np.abs((v[valid] - mu[cv]) / sdv)
            keep[valid] = (sdv > 0) & (z > threshold)
        out = b.filter(pa.array(keep))
        return out.select(out_cols) if out_cols else out

    return ds.map_batches(flag, batch_format="pyarrow")


def _mad_flag(ds, med: dict, mad: dict, *, value_col, group_col, k,
              out_cols):
    """Map-only final filter shared by both mad_outliers paths."""
    import ray

    ref = ray.put((med, mad))

    def flag(b: pa.Table) -> pa.Table:
        mm, dd = ray.get(ref)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(
            b[group_col].to_numpy(zero_copy_only=False))
        # null-group rows (factorize code −1) are never outliers — the SQL
        # oracle's JOIN USING(group) drops them; indexing mu[-1] would
        # silently test them against the LAST group's stats
        keep = np.zeros(len(codes), bool)
        valid = codes >= 0
        if len(uniq) and valid.any():
            mu = np.array([mm.get(u, np.nan) for u in uniq])
            ma = np.array([dd.get(u, np.nan) for u in uniq])
            cv = codes[valid]
            keep[valid] = np.abs(v[valid] - mu[cv]) > k * ma[cv]  # NaN→False
        out = b.filter(pa.array(keep))
        return out.select(out_cols) if out_cols else out

    return ds.map_batches(flag, batch_format="pyarrow")


def _mad_two_selection_path(ds, *, value_col, group_col, k, bucket_width,
                            out_cols):
    """Fallback path: two full ``grouped_exact_quantile`` distributed
    selections over a materialized narrow column (the pre-round-4 shape —
    always exact, ~2× the passes of the digest-steered fast path)."""
    import ray

    from schema_validator_ray.stages.stats import grouped_exact_quantile

    narrow = ds.select_columns([group_col, value_col]).materialize()
    med_rows = grouped_exact_quantile(
        narrow, group_col, value_col, 0.5, bucket_width=bucket_width,
        out_col="med").take_all()                      # |groups| rows
    med = {r[group_col]: r["med"] for r in med_rows}
    med_ref = ray.put(med)

    def absdev(b: pa.Table) -> pa.Table:
        mm = ray.get(med_ref)
        t = b.select([group_col, value_col]).drop_null()
        codes, uniq = pd.factorize(
            t[group_col].to_numpy(zero_copy_only=False))
        mu = np.array([mm.get(u, np.nan) for u in uniq])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({group_col: t[group_col],
                         "_absdev": pa.array(np.abs(v - mu[codes]),
                                             pa.float64())})

    dev = narrow.map_batches(absdev, batch_format="pyarrow")
    mad_rows = grouped_exact_quantile(
        dev, group_col, "_absdev", 0.5, bucket_width=bucket_width,
        out_col="mad").take_all()
    mad = {r[group_col]: r["mad"] for r in mad_rows}
    return _mad_flag(ds, med, mad, value_col=value_col, group_col=group_col,
                     k=k, out_cols=out_cols)


def _weighted_pick(vals: np.ndarray, cnts: np.ndarray, idx: int):
    """idx-th (0-based) element of the sorted multiset given (sorted
    distinct value, count) arrays; None when idx is out of range."""
    if idx < 0:
        return None
    cum = np.cumsum(cnts)
    if len(cum) == 0 or idx >= cum[-1]:
        return None
    return float(vals[int(np.searchsorted(cum, idx, side="right"))])


def mad_outliers(ds, *, value_col: str, group_col: str, k: float = 3.5,
                 bucket_width="auto", out_cols=None,
                 probe_budget: int = 5_000_000):
    """Rows whose value deviates more than ``k`` median-absolute-deviations
    from their group's MEDIAN — the robust companion of
    ``group_zscore_outliers`` (a z-score is itself dragged by the outliers
    it hunts; median/MAD is not). Exact quantile_disc medians, so the SQL
    oracle matches bit-for-bit.

    Digest-steered fused design — FOUR passes (the former shape paid eight:
    materialize + two width calibrations + two 2-pass selections + flag):

    1. ONE storage scan materializes the pruned (group, value) columns with
       per-(key, batch) t-digest partials FUSED into the same pass (union
       schema, ``_side`` flag); the driver merges the small blobs per key —
       giving exact per-key counts and approximate quantiles.
    2. The digests STEER an exact median selection: a per-key rank window
       [q(0.43), q(0.57)] broadcasts; one pass over the pinned narrow rows
       emits the EXACT count of rows strictly below each key's window plus
       (key, value, count) distinct partials inside it. ``target − below``
       indexes the weighted window values → exact quantile_disc median.
       Digest error can NEVER produce a wrong answer, only a missed window
       — which falls back LOUDLY to the two-selection path.
    3. Same window trick on ``|v − med|`` (window bounds from the digest's
       CDF mass folded around the exact median) → exact MAD.
    4. Map-only flag over the original dataset.

    Groups where MAD = 0 (more than half the values identical) flag every
    ``v != median`` row, same as the SQL comparison. ``bucket_width`` only
    parameterizes the fallback path."""
    import math

    import ray

    from ..functions.sketches import TDigest
    from ._collect import collect_up_to

    def fallback(reason: str):
        print(f"mad_outliers: digest-steered fast path unavailable "
              f"({reason}) — using the two-selection path")
        return _mad_two_selection_path(
            ds, value_col=value_col, group_col=group_col, k=k,
            bucket_width=bucket_width, out_cols=out_cols)

    vtype = pa.float64()

    def mat_with_digests(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col]).drop_null()
        n = t.num_rows
        kt = t[group_col]
        if isinstance(kt, pa.ChunkedArray):
            kt = kt.combine_chunks()
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rows = pa.table({group_col: kt, value_col: pa.array(v, vtype),
                         "_blob": pa.nulls(n, pa.binary()),
                         "_side": pa.array(np.zeros(n, np.int8))})
        if n == 0:
            return rows
        codes, uniq = pd.factorize(kt.to_numpy(zero_copy_only=False))
        order = np.argsort(codes, kind="stable")
        cs, vs = codes[order], v[order]
        seg = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.r_[seg[1:], n]
        blobs = []
        for s_, e_ in zip(seg, ends):
            td = TDigest()
            td.add(vs[s_:e_])
            blobs.append(td.dumps())
        dig = pa.table({group_col: kt.take(pa.array(order[seg])),
                        value_col: pa.nulls(len(seg), vtype),
                        "_blob": pa.array(blobs, pa.binary()),
                        "_side": pa.array(np.ones(len(seg), np.int8))})
        return pa.concat_tables([rows, dig])

    tagged = (ds.map_batches(mat_with_digests, batch_format="pyarrow")
              .materialize())
    narrow = tagged.filter(expr="_side == 0")

    dparts, over = collect_up_to(tagged.filter(expr="_side == 1"),
                                 probe_budget)
    if over:
        return fallback("digest partials exceed the probe budget")
    # batch the per-key merge: one concatenate + one compress per key
    acc: dict = {}
    for p in dparts:
        for kv, blob in zip(p[group_col].to_pylist(),
                            p["_blob"].to_pylist()):
            acc.setdefault(kv, []).append(blob)
    digs = {}
    for kv, blobs in acc.items():
        tds = [TDigest.loads(x) for x in blobs]
        td = tds[0]
        if len(tds) > 1:
            td.means = np.concatenate([t.means for t in tds])
            td.weights = np.concatenate([t.weights for t in tds])
            td.n = float(sum(t.n for t in tds))
            td._min = min(t._min for t in tds)
            td._max = max(t._max for t in tds)
            td._compress()
        digs[kv] = td
    if not digs:
        return _mad_flag(ds, {}, {}, value_col=value_col,
                         group_col=group_col, k=k, out_cols=out_cols)

    targets = {kv: max(math.ceil(0.5 * round(td.n)) - 1, 0)
               for kv, td in digs.items()}

    def window_probe(lo: dict, hi: dict, transform_med: dict | None):
        """One pass over the pinned narrow rows: per key, exact strictly-
        below-window count + (value, count) distinct partials inside the
        window. ``transform_med`` switches the probed quantity from v to
        |v − med|."""
        ref = ray.put((lo, hi, transform_med))

        def probe(b: pa.Table) -> pa.Table:
            LO, HI, MED = ray.get(ref)
            keys = b[group_col].to_numpy(zero_copy_only=False)
            v = b[value_col].to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(keys)
            la = np.array([LO.get(u, np.inf) for u in uniq])
            ha = np.array([HI.get(u, -np.inf) for u in uniq])
            if MED is not None:
                mu = np.array([MED.get(u, np.nan) for u in uniq])
                v = np.abs(v - mu[codes])
            lov, hiv = la[codes], ha[codes]
            below = v < lov
            nb = np.bincount(codes[below], minlength=len(uniq))
            inw = (v >= lov) & (v <= hiv)
            ic, iv = codes[inw], v[inw]
            o = np.lexsort((iv, ic))
            ic, iv = ic[o], iv[o]
            brk = np.r_[True, (ic[1:] != ic[:-1]) | (iv[1:] != iv[:-1])]
            seg = np.flatnonzero(brk)
            cnt = np.diff(np.r_[seg, len(ic)])
            kt = pa.array(uniq, b[group_col].type)
            t_below = pa.table({group_col: kt,
                                "v": pa.nulls(len(uniq), pa.float64()),
                                "n": pa.array(nb.astype(np.int64)),
                                "s": pa.array(np.zeros(len(uniq), np.int8))})
            t_win = pa.table({group_col: kt.take(pa.array(ic[seg])),
                              "v": pa.array(iv[seg], pa.float64()),
                              "n": pa.array(cnt.astype(np.int64)),
                              "s": pa.array(np.ones(len(seg), np.int8))})
            return pa.concat_tables([t_below, t_win])

        parts, p_over = collect_up_to(
            narrow.map_batches(probe, batch_format="pyarrow"), probe_budget)
        if p_over:
            return None, None
        below: dict = {}
        win: dict = {}
        for p in parts:
            kv_l = p[group_col].to_pylist()
            vv = p["v"].to_numpy(zero_copy_only=False)
            nn = p["n"].to_numpy(zero_copy_only=False)
            ss = p["s"].to_numpy(zero_copy_only=False)
            for kv, val, cnt, sd in zip(kv_l, vv, nn, ss):
                if sd == 0:
                    below[kv] = below.get(kv, 0) + int(cnt)
                else:
                    win.setdefault(kv, {})
                    win[kv][val] = win[kv].get(val, 0) + int(cnt)
        return below, win

    def pick_all(below: dict, win: dict):
        out = {}
        for kv, tgt in targets.items():
            idx = tgt - below.get(kv, 0)
            w = win.get(kv, {})
            vals = np.array(sorted(w))
            cnts = np.array([w[x] for x in vals]) if len(vals) else \
                np.array([], np.int64)
            got = _weighted_pick(vals, cnts, idx)
            if got is None:
                return None
            out[kv] = got
        return out

    lo = {kv: td.quantile(0.43) for kv, td in digs.items()}
    hi = {kv: td.quantile(0.57) for kv, td in digs.items()}
    below, win = window_probe(lo, hi, None)
    if below is None:
        return fallback("median window exceeds the probe budget")
    med = pick_all(below, win)
    if med is None:
        return fallback("median rank fell outside the digest window")

    # MAD window: fold the digest CDF around the exact median on a value
    # grid — mass(t) = CDF(med + t) − CDF(med − t) is monotone in t
    lo2, hi2 = {}, {}
    for kv, td in digs.items():
        m = med[kv]
        tmax = max(td._max - m, m - td._min, 0.0)
        if tmax == 0.0:
            lo2[kv] = hi2[kv] = 0.0
            continue
        ts = np.linspace(0.0, tmax, 512)
        mass = td.cdf(m + ts) - td.cdf(m - ts)
        i_lo = int(np.searchsorted(mass, 0.43, side="left"))
        i_hi = int(np.searchsorted(mass, 0.57, side="right"))
        lo2[kv] = float(ts[max(i_lo - 1, 0)])
        hi2[kv] = float(ts[min(i_hi, len(ts) - 1)])
    below2, win2 = window_probe(lo2, hi2, med)
    if below2 is None:
        return fallback("MAD window exceeds the probe budget")
    mad = pick_all(below2, win2)
    if mad is None:
        return fallback("MAD rank fell outside the digest window")

    return _mad_flag(ds, med, mad, value_col=value_col, group_col=group_col,
                     k=k, out_cols=out_cols)


def rank_window(ds, *, key: str, order_col: str, bucket_width="auto",
                n_shards: int = 32,
                summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``RANK() / DENSE_RANK() / PERCENT_RANK() OVER (PARTITION BY key ORDER
    BY order_col)`` — tie-aware (rows with equal order_col share a rank; no
    tiebreak column enters the ordering, exactly like SQL).

    Same skew-safe shape as ``ntile``: shuffle on (shard(key), value
    bucket); ties share a bucket because the bucket is a pure function of
    the value, so tie handling is always local. Summaries carry per-(key,
    bucket) row count AND distinct-value count; the driver prefix-sums both
    into carry-in offsets (rank needs rows-before, dense_rank needs
    distincts-before) plus per-key totals for percent_rank. Falls back to
    the exact ``groupby(key)`` path above ``summary_merge_max``."""
    import ray

    sch = ds.schema()
    if sch is None:        # schema-less = zero rows after an upstream map
        return ds
    in_cols = list(sch.names)
    bucket_width = resolve_bucket_width(ds, order_col, bucket_width)

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.append_column("_bkt", pa.array(
            _bucket_of_col(b[order_col], bucket_width), pa.int64()))
        from .asof import _shard_of
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_scan(g: pa.Table) -> pa.Table:
        n = g.num_rows
        t = g.take(pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (order_col, "ascending")]))
        seg_brk = _adjacent_break(t[key], n)
        val_brk = seg_brk | _adjacent_break(t[order_col], n)
        idx = np.arange(n, dtype=np.int64)
        seg = np.flatnonzero(seg_brk)
        seg_id = np.cumsum(seg_brk) - 1
        run_start = np.flatnonzero(val_brk)[np.cumsum(val_brk) - 1]
        lt = run_start - seg[seg_id]                 # rows strictly below
        run_id = np.cumsum(val_brk) - 1
        dlt = run_id - run_id[seg[seg_id]]           # distincts strictly below
        base = t.select(in_cols + ["_bkt"])
        ev = (base.append_column("_lt", pa.array(lt))
              .append_column("_dlt", pa.array(dlt))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        last = np.r_[seg[1:] - 1, n - 1]
        summ = (base.take(pa.array(last))
                .append_column("_lt", pa.array((idx - seg[seg_id])[last] + 1))
                .append_column("_dlt", pa.array(dlt[last] + 1))
                .append_column("_side",
                               pa.array(np.ones(len(last), np.int8))))
        return pa.concat_tables([ev, summ])

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_scan, batch_format="pyarrow").materialize())

    s = _collect_summaries(tagged, [key, "_bkt", "_lt", "_dlt"],
                           summary_merge_max)
    if s is None:
        return _exact_rank(ds, key=key, order_col=order_col)

    if len(s):
        s = s.sort_values([key, "_bkt"], kind="stable").reset_index(drop=True)
        brk = _key_segments(s[key])
        seg = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1

        def _exclusive(col):
            tot = np.cumsum(s[col].to_numpy())
            base = np.r_[0, tot[:-1]][seg]
            off = np.r_[0, tot[:-1]] - base[seg_id]
            key_tot = (tot[np.r_[seg[1:] - 1, len(s) - 1]] - base)[seg_id]
            return off, key_tot

        s["_off"], s["_tot"] = _exclusive("_lt")
        s["_doff"], _ = _exclusive("_dlt")
        s = s[[key, "_bkt", "_off", "_doff", "_tot"]]
    else:
        s = s.assign(_off=pd.Series([], dtype="int64"),
                     _doff=pd.Series([], dtype="int64"),
                     _tot=pd.Series([], dtype="int64"))[
            [key, "_bkt", "_off", "_doff", "_tot"]]
    ref = ray.put(s)

    def finalize(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        off, doff, tot = _probe_summary(b, key, r, ["_off", "_doff", "_tot"])
        rank = b["_lt"].to_numpy(zero_copy_only=False) + off + 1
        dense = b["_dlt"].to_numpy(zero_copy_only=False) + doff + 1
        pct = np.where(tot > 1, (rank - 1) / np.maximum(tot - 1, 1), 0.0)
        return (b.select(in_cols)
                .append_column("rank", pa.array(rank))
                .append_column("dense_rank", pa.array(dense))
                .append_column("pct_rank", pa.array(pct)))

    return (tagged.filter(expr="_side == 0")
            .map_batches(finalize, batch_format="pyarrow"))


def _exact_rank(ds, *, key, order_col):
    in_cols = list(ds.schema().names)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, order_col], kind="stable")
             .reset_index(drop=True))
        seg_brk = _key_segments(g[key])
        val_brk = seg_brk | (g[order_col] != g[order_col].shift()).to_numpy()
        idx = np.arange(len(g), dtype=np.int64)
        seg = np.flatnonzero(seg_brk)
        seg_id = np.cumsum(seg_brk) - 1
        run_start = np.flatnonzero(val_brk)[np.cumsum(val_brk) - 1]
        rank = run_start - seg[seg_id] + 1
        run_id = np.cumsum(val_brk) - 1
        dense = run_id - run_id[seg[seg_id]] + 1
        last = np.r_[seg[1:] - 1, len(g) - 1]
        tot = ((idx - seg[seg_id])[last] + 1)[seg_id]
        g["rank"] = rank
        g["dense_rank"] = dense
        g["pct_rank"] = np.where(tot > 1, (rank - 1)
                                 / np.maximum(tot - 1, 1), 0.0)
        return g[in_cols + ["rank", "dense_rank", "pct_rank"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def global_rank(ds, *, order_col: str, bucket_width="auto",
                summary_merge_max: int = _SUMMARY_MERGE_MAX):
    """``RANK()/DENSE_RANK()/PERCENT_RANK() OVER (ORDER BY order_col)`` with
    an EMPTY partition clause — the global CDF / quantile-normalization
    transform (map a score to its corpus-wide percentile). Reuses
    ``rank_window`` with a constant key: the shuffle key degenerates to the
    VALUE BUCKET alone, so parallelism comes from the value range (size
    ``bucket_width`` to the data's spread) and the carry-in summary chain is
    one row per bucket."""
    in_cols = list(ds.schema().names)
    # n_shards=1 here: ALL parallelism comes from the value buckets, so
    # calibrate to a finer grid than the sharded operators
    bucket_width = resolve_bucket_width(ds, order_col, bucket_width,
                                        target_buckets=256)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_g", pa.array(np.zeros(b.num_rows, np.int8)))

    out = rank_window(ds.map_batches(tag, batch_format="pyarrow"),
                      key="_g", order_col=order_col,
                      bucket_width=bucket_width, n_shards=1,
                      summary_merge_max=summary_merge_max)

    def drop(b: pa.Table) -> pa.Table:
        return b.select(in_cols + ["rank", "dense_rank", "pct_rank"])

    return out.map_batches(drop, batch_format="pyarrow")


def grouped_gap_quantiles(ds, *, user_col: str, type_col: str, ts_col: str,
                          tiebreak: str, qs, out_cols,
                          n_shards: int = 64):
    """Exact quantiles, per ``type_col``, of the µs gaps between CONSECUTIVE
    events of the same (user, type) — the inter-arrival profile behind
    bot / scraper detection and session-gap calibration (a type whose
    median gap collapses is machine traffic).

    Stage 1 ships only (user, type, epoch-µs, tiebreak) through a 64-way
    USER-shard groupby (never per-user groups) and emits (type, gap) rows
    with one vectorized lexsort + adjacent-diff per shard; stage 2 is the
    existing two-pass exact grouped selection (`grouped_exact_quantiles`),
    whose exchange is count partials + |types|×|qs| picked rows. Matches
    ``quantile_disc`` over the SQL LAG gaps."""
    from .stats import grouped_exact_quantiles

    def part(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        t = pa.table({user_col: b[user_col], type_col: b[type_col],
                      "_us": pc.cast(ts, pa.int64()),
                      tiebreak: b[tiebreak]}).drop_null()
        return t.append_column("_shard", pa.array(_shard_of(t[user_col],
                                                            n_shards)))

    def gaps(g: pa.Table) -> pa.Table:
        empty = pa.table({type_col: pa.array([], g[type_col].type),
                          "gap_us": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        users, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        types, _ = pd.factorize(g[type_col].to_numpy(zero_copy_only=False))
        us = g["_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = g[tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, us, types, users))
        same = (users[order][1:] == users[order][:-1]) & (
            types[order][1:] == types[order][:-1])
        gap = us[order][1:] - us[order][:-1]
        idx = order[1:][same]
        return pa.table({type_col: g[type_col].take(pa.array(idx)),
                         "gap_us": pa.array(gap[same])})

    gap_ds = (ds.map_batches(part, batch_format="pyarrow")
              .groupby("_shard")
              .map_groups(gaps, batch_format="pyarrow"))
    return grouped_exact_quantiles(gap_ds, type_col, "gap_us", list(qs),
                                   out_cols=list(out_cols))


def group_minmax_scale(ds, *, value_col: str, group_col: str,
                       out_col: str = "scaled", keep_cols=None):
    """Per-group min-max feature scaling: ``(v - min) / (max - min)`` within
    each group (0.0 for a constant group) — the normalization transform a
    feature-engineering pipeline applies before training. Two passes, zero
    wide shuffle: a |groups|-row (min, max) aggregate broadcast via
    ``ray.put``, then a map-only scale. Scaled values round to 6 digits
    (matching the oracle's ``round_even``); null keys/values pass through
    with a null scaled value, as SQL arithmetic would produce."""
    import ray
    from ray.data.aggregate import Max, Min

    def partial(b: pa.Table) -> pa.Table:
        b = b.select([group_col, value_col]).drop_null()
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = b[group_col].to_numpy(zero_copy_only=False)
        fin = ~np.isnan(v)
        v, keys = v[fin], keys[fin]
        codes, uniq = pd.factorize(keys)
        lo = np.full(len(uniq), np.inf); np.minimum.at(lo, codes, v)
        hi = np.full(len(uniq), -np.inf); np.maximum.at(hi, codes, v)
        return pa.table({group_col: pa.array(uniq, b[group_col].type),
                         "lo": pa.array(lo, pa.float64()),
                         "hi": pa.array(hi, pa.float64())})

    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(group_col)
             .aggregate(Min("lo", alias_name="lo"),
                        Max("hi", alias_name="hi")))
    bounds = {r[group_col]: (r["lo"], r["hi"])
              for r in stats.take_all()}   # |groups| rows — tiny
    ref = ray.put(bounds)

    def scale(b: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = b[group_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        out = np.full(len(codes), np.nan)
        valid = (codes >= 0) & ~np.isnan(v)
        if len(uniq) and valid.any():
            lo = np.array([bd.get(u, (np.nan, np.nan))[0] for u in uniq])
            hi = np.array([bd.get(u, (np.nan, np.nan))[1] for u in uniq])
            cv = codes[valid]
            rng = hi[cv] - lo[cv]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = (v[valid] - lo[cv]) / rng
            s[rng == 0] = 0.0
            out[valid] = np.round(s, 6)
        cols = b.select(keep_cols) if keep_cols else b
        return cols.append_column(out_col, pa.array(out, from_pandas=True))

    return ds.map_batches(scale, batch_format="pyarrow")


def keyed_gaps(ds, *, key: str, ts_col: str, tiebreak: str,
               out_col: str = "gap_us", unit_us: int = 1,
               n_shards: int = 64):
    """(key, gap) rows between CONSECUTIVE records of the same key ordered
    by (ts, tiebreak), gap expressed in integer multiples of ``unit_us``
    (floor division — pass 86_400_000_000 for whole days). The reusable
    inter-arrival primitive behind reorder-interval and churn features.

    Same scale shape as :func:`grouped_gap_quantiles`: a narrow 3-column
    pass through a 64-way key-shard groupby (never per-key groups), one
    vectorized lexsort + adjacent-diff per shard."""

    def part(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        t = pa.table({key: b[key], "_us": pc.cast(ts, pa.int64()),
                      tiebreak: b[tiebreak]}).drop_null()
        return t.append_column("_shard", pa.array(_shard_of(t[key],
                                                            n_shards)))

    def gaps(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], g[key].type),
                          out_col: pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        keys, _ = pd.factorize(g[key].to_numpy(zero_copy_only=False))
        us = g["_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = g[tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, us, keys))
        same = keys[order][1:] == keys[order][:-1]
        gap = (us[order][1:] - us[order][:-1]) // np.int64(unit_us)
        idx = order[1:][same]
        return pa.table({key: g[key].take(pa.array(idx)),
                         out_col: pa.array(gap[same])})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(gaps, batch_format="pyarrow"))


def id_islands(ds, col: str):
    """Gaps-and-islands sequence-integrity check: collapse the DISTINCT
    integer values of ``col`` into maximal runs of consecutive values and
    return one row per run (island_start, island_end, island_len) — the
    "which id ranges are missing from this feed" audit (the gaps are the
    complement between consecutive islands).

    Fully distributed, no driver pass: per-batch unique partials + one
    groupby dedupe the ids; :func:`global_rank` (rank == row_number on
    distinct values) assigns each id its global position through the
    calibrated value-bucket carry-in chain, so ``id − rank`` is constant
    exactly within an island (the classic SQL trick, made distributed);
    a final groupby over that constant emits min/max/count per island.
    Every exchange is bounded by distinct ids, and the output by the
    island count."""
    from ray.data.aggregate import Count, Max, Min

    def uniq(b: pa.Table) -> pa.Table:
        arr = pc.unique(pc.drop_null(b[col].combine_chunks()))
        return pa.table({col: pc.cast(arr, pa.int64())})

    import ray.data as rd

    empty = pa.table({"island_start": pa.array([], pa.int64()),
                      "island_end": pa.array([], pa.int64()),
                      "island_len": pa.array([], pa.int64())})
    distinct = (ds.map_batches(uniq, batch_format="pyarrow")
                .groupby(col).aggregate(Count(alias_name="_c")))
    if distinct.schema() is None:              # empty input short-circuit
        return rd.from_arrow(empty)
    ranked = global_rank(distinct.map_batches(
        lambda b: b.select([col]), batch_format="pyarrow"), order_col=col)
    grouped = ranked.map_batches(
        lambda b: pa.table({
            col: b[col],
            "_grp": pc.subtract(b[col], pc.cast(b["rank"], pa.int64()))}),
        batch_format="pyarrow")
    agg = (grouped.groupby("_grp")
           .aggregate(Min(col, alias_name="island_start"),
                      Max(col, alias_name="island_end"),
                      Count(alias_name="island_len")))
    return agg.map_batches(
        lambda b: pa.table({
            "island_start": pc.cast(b["island_start"], pa.int64()),
            "island_end": pc.cast(b["island_end"], pa.int64()),
            "island_len": pc.cast(b["island_len"], pa.int64())}),
        batch_format="pyarrow")


def woe_iv(ds, *, order_col: str, tiebreak: str, target_col: str,
           n_bins: int = 10):
    """Weight-of-evidence / information-value report: equal-frequency
    ``NTILE(n_bins)`` bins over ``order_col`` (an INTEGER column — rank
    integers, never rounded floats), with the per-bin predictiveness of the
    binary ``target_col``: WOE_i = ln((pos_i/pos_tot)/(neg_i/neg_tot)) and
    its IV term (pos_i/pos_tot − neg_i/neg_tot)·WOE_i — the classic
    scorecard feature audit (Σ iv_term = the feature's IV).

    Distributed shape: the calibrated-bucket :func:`ntile` machinery
    assigns bins (one narrow exchange over value buckets), per-batch
    (bin, n, n_pos) partials bound the second exchange at n_bins rows per
    batch, and the WOE table computes vectorized on the ≤ n_bins-row
    census. Bins where either class is empty get null woe/iv_term (the
    unsmoothed WOE is undefined there). Counts are exact int64, so the
    ratios are identical doubles on both engine and SQL sides."""
    import pandas as pd

    from ._collect import collect_up_to

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            order_col: b[order_col], tiebreak: b[tiebreak],
            "_pos": pc.cast(pc.cast(b[target_col], pa.bool_()), pa.int64()),
            "_g": pa.array(np.zeros(b.num_rows, np.int8))})

    binned = ntile(ds.map_batches(tag, batch_format="pyarrow"),
                   key="_g", order_col=order_col, tiebreak=tiebreak,
                   n=n_bins, out_col="bin", n_shards=1)

    def part(b: pa.Table) -> pa.Table:
        agg = (pa.table({"bin": pc.cast(b["bin"], pa.int64()),
                         "pos": b["_pos"]})
               .group_by("bin")
               .aggregate([("pos", "sum"), ([], "count_all")]))
        return pa.table({"bin": agg["bin"], "n": agg["count_all"],
                         "n_pos": agg["pos_sum"]})

    parts, over = collect_up_to(
        binned.map_batches(part, batch_format="pyarrow"), 1_000_000)
    if over:
        raise RuntimeError("woe_iv: bin census exceeded driver budget")
    empty = pd.DataFrame({"bin": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "n_pos": pd.Series([], dtype="int64"),
                          "woe": pd.Series([], dtype="float64"),
                          "iv_term": pd.Series([], dtype="float64")})
    if not parts:
        return empty
    a = (pa.concat_tables(parts).group_by("bin")
         .aggregate([("n", "sum"), ("n_pos", "sum")]).to_pandas()
         .sort_values("bin"))
    n = a["n_sum"].to_numpy(np.int64)
    npos = a["n_pos_sum"].to_numpy(np.int64)
    nneg = n - npos
    pt, nt = float(npos.sum()), float(nneg.sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        pr, nr = npos / pt, nneg / nt
        woe = np.log(pr / nr)
        iv = (pr - nr) * woe
    bad = (npos == 0) | (nneg == 0)
    return pd.DataFrame({
        "bin": a["bin"].to_numpy(np.int64),
        "n": n, "n_pos": npos,
        "woe": np.where(bad, np.nan, np.round(woe, 6)),
        "iv_term": np.where(bad, np.nan, np.round(iv, 6))})
