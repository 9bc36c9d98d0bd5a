"""Distributed interval (range) join — point-in-interval matching.

For every left row, attach the interval row(s) of the same key whose
``[start, end]`` contains the left row's ``ts`` (SQL: ``JOIN ... ON key AND ts
BETWEEN start AND end``). Ray Data has no native range join; the distributed
shape mirrors the sharded skew-safe window/as-of pattern:

1. Left rows bucket on floor(ts / bucket); the shuffle key is
   (hash(key) % n_shards, bucket // blk_factor) — a few hundred coarse groups
   (Ray's per-group overhead would dominate with one group per (key, bucket)),
   hot keys bounded by rate x blk_factor x bucket.
2. Each interval row is replicated into EVERY bucket it overlaps — the only
   data expansion, bounded by interval_span / bucket. Intervals longer than
   ``max_span_buckets`` buckets are rejected loudly rather than silently
   exploding (pick a bucket ≳ the typical interval length). Replicas of one
   source row always land in distinct (shard, block) groups, so no dedup is
   needed and duplicated input intervals keep SQL join multiplicity.
3. Inside each group a per-key vectorized stabbing scan (two-sided
   searchsorted over start + running-max end) emits one output row per
   (left row, containing interval) with no per-row Python loop.

Left rows with no containing interval are dropped (inner join) or kept with
nulls (``how="left"``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .asof import _conform, _shard_of


_BCAST_IV_CACHE: dict = {}


def _stab_all_keys(kc_iv: np.ndarray, s: np.ndarray, e: np.ndarray,
                   kc_l: np.ndarray, lts: np.ndarray):
    """Interval stabbing across EVERY key in one shot — no per-key loop.

    ``kc_iv``/``s``/``e`` describe intervals sorted by (key code, start);
    ``kc_l``/``lts`` are left rows in ANY order (key codes < 0 = key absent
    from the interval side). Returns (li, ii): aligned global index pairs
    with kc equal and s[ii] <= lts[li] <= e[ii].

    Same lo/hi candidate-rank logic as the per-key version (hi = #(s <= t),
    lo = first rank whose running-max end reaches t), but the searchsorted
    runs over RANK-COMPOSITE keys (key_code * C + dense time rank, C = #
    distinct times + 1): ranks preserve order/equality, the composite is
    globally sorted because the per-key sequences are, and — unlike
    key_code * ns — it cannot overflow int64. Missing keys land on a block
    boundary in both composites, so hi == lo and they match nothing."""
    n_iv, n_l = len(s), len(lts)
    if n_iv == 0 or n_l == 0:
        z = np.array([], np.int64)
        return z, z
    # per-key running max of end (keys are contiguous in kc_iv)
    cm = pd.Series(e).groupby(kc_iv).cummax().to_numpy()

    def comp(sorted_side: np.ndarray, probe: np.ndarray):
        u = np.unique(np.concatenate([sorted_side, probe]))
        c = np.int64(len(u) + 1)
        return (kc_iv * c + np.searchsorted(u, sorted_side),
                kc_l * c + np.searchsorted(u, probe))

    cs, cl = comp(s, lts)
    hi = np.searchsorted(cs, cl, side="right")
    cs2, cl2 = comp(cm, lts)
    lo = np.searchsorted(cs2, cl2, side="left")
    counts = hi - lo
    li = np.repeat(np.arange(n_l), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ii = (np.arange(counts.sum()) - np.repeat(cum, counts)
          + np.repeat(lo, counts))
    keep = e[ii] >= lts[li]
    return li[keep], ii[keep]


def _iv_sorted_cached(ref, key: str, start: str, end: str):
    """Per-worker-process cache of the broadcast interval table, start-sorted
    within key blocks with a key -> code map (built once per broadcast ref,
    not once per batch)."""
    hexid = ref.hex()
    ent = _BCAST_IV_CACHE.get(hexid)
    if ent is None:
        import ray

        df = ray.get(ref)
        codes, uniq = pd.factorize(df[key], sort=False)
        s_ns = df[start].to_numpy().astype("datetime64[ns]").astype(np.int64)
        order = np.lexsort((s_ns, codes))
        ivs = df.iloc[order].reset_index(drop=True)
        ent = (dict(zip(uniq, range(len(uniq)))),
               codes[order].astype(np.int64),
               s_ns[order],
               ivs[end].to_numpy().astype("datetime64[ns]")
               .astype(np.int64),
               ivs)
        _BCAST_IV_CACHE.clear()   # hold at most one broadcast table
        _BCAST_IV_CACHE[hexid] = ent
    return ent


def interval_join(left_ds, intervals_ds, *, key: str, ts: str,
                  start: str, end: str, payload_cols: list[str],
                  bucket: str = "auto", how: str = "inner",
                  max_span_buckets: int = 1024, n_shards: int = 32,
                  blk_factor: int = 16,
                  broadcast_intervals_max: int = 0):
    """Returns left columns + ``start``/``end`` + ``payload_cols`` of every
    containing interval. ``payload_cols`` must be numeric (ride as float64).

    Setting ``broadcast_intervals_max`` > 0 enables a map-side fast path
    for interval tables under that many rows (probed with an
    early-stopping stream): broadcast once via ``ray.put``, one stabbing
    pass per left batch — zero shuffle, no bucketing/span guard, left
    side streams. OPT-IN (default 0) because the probe serializes the
    interval-side execution: it pays off for pre-materialized or cheap
    interval tables, and measurably loses when the intervals are
    themselves a derived shuffle (e.g. session windows) that the sharded
    path would run concurrently with the left scan."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket == "auto":
        # calibrate from the LEFT timestamps only (the interval side is
        # often itself a derived shuffle — pre-scanning it would recompute
        # it); the max_span_buckets guard below stays the loud backstop if
        # intervals turn out to be long relative to the calibrated width
        from ._calibrate import calibrate_bucket_width

        w = calibrate_bucket_width(left_ds, ts,
                                   target_buckets=n_shards * blk_factor)
        bucket_ns = (int(w.value) if isinstance(w, pd.Timedelta)
                     else max(int(w), 1))
    else:
        bucket_ns = pd.Timedelta(bucket).value

    left_schema = left_ds.schema()
    lsch = pa.schema(list(zip(left_schema.names, left_schema.types)))
    ts_type = lsch.field(ts).type
    left_cols = list(lsch.names)

    uschema = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field("_shard", pa.int32()), pa.field("_blk", pa.int64()),
           pa.field("_side", pa.int8()),
           pa.field(start, ts_type), pa.field(end, ts_type)]
        + [pa.field(c, pa.float64()) for c in payload_cols])

    def _ns(a: np.ndarray) -> np.ndarray:
        return a.astype("datetime64[ns]").astype(np.int64)

    def tag_left(b: pa.Table) -> pa.Table:
        bkt = _ns(b[ts].to_numpy(zero_copy_only=False)) // bucket_ns
        t = b.append_column("_shard", pa.array(_shard_of(b[key], n_shards)))
        t = t.append_column("_blk", pa.array(bkt // blk_factor, pa.int64()))
        t = t.append_column("_side", pa.array(np.zeros(len(bkt), np.int8)))
        return _conform(t, uschema)

    def explode_intervals(b: pa.Table) -> pa.Table:
        s_ns = _ns(b[start].to_numpy(zero_copy_only=False))
        e_ns = _ns(b[end].to_numpy(zero_copy_only=False))
        b0 = s_ns // bucket_ns
        b1 = e_ns // bucket_ns
        span = b1 - b0 + 1
        if (span > max_span_buckets).any():
            worst = int(span.max())
            raise ValueError(
                f"interval spans {worst} buckets (> {max_span_buckets}); "
                f"raise `bucket` toward the typical interval length")
        # replicate per covered BLOCK (coarser than bucket: fewer copies)
        blk0 = b0 // blk_factor
        blk1 = b1 // blk_factor
        reps = (blk1 - blk0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(reps)), reps)
        offs = (np.concatenate([np.arange(r) for r in reps])
                if len(reps) else np.array([], np.int64))
        take = pa.array(idx)
        keys_rep = b[key].take(take)
        cols = {key: keys_rep,
                "_shard": pa.array(_shard_of(keys_rep, n_shards)),
                "_blk": pa.array(blk0[idx] + offs, pa.int64()),
                "_side": pa.array(np.ones(len(idx), np.int8)),
                start: b[start].take(take),
                end: b[end].take(take)}
        for c in payload_cols:
            cols[c] = pc.cast(b[c].take(take), pa.float64())
        return _conform(pa.table(cols), uschema)

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow")
    iv_tagged = intervals_ds.map_batches(explode_intervals,
                                         batch_format="pyarrow")

    out_cols = left_cols + [start, end, *payload_cols]

    def join_left_frame(left: pd.DataFrame, kc_l: np.ndarray,
                        ivs: pd.DataFrame, kc_iv: np.ndarray,
                        s_ns: np.ndarray, e_ns: np.ndarray) -> pd.DataFrame:
        """Attach containing intervals to a left frame given the (key code,
        start)-sorted interval arrays — one `_stab_all_keys` call per frame,
        no per-key iteration. Shared by the sharded group join and the
        broadcast fast path."""
        lts_np = left[ts].to_numpy()
        lts_dtype = lts_np.dtype
        li, ii = _stab_all_keys(
            kc_iv, s_ns, e_ns, kc_l,
            lts_np.astype("datetime64[ns]").astype(np.int64))
        lf = left.reset_index(drop=True)
        out = lf.iloc[li][left_cols].reset_index(drop=True)
        if len(ii):
            ivm = ivs.iloc[ii].reset_index(drop=True)
            out[start] = ivm[start].to_numpy()
            out[end] = ivm[end].to_numpy()
            for c in payload_cols:
                out[c] = ivm[c].to_numpy()
        else:
            out[start] = np.array([], dtype=lts_dtype)
            out[end] = np.array([], dtype=lts_dtype)
            for c in payload_cols:
                out[c] = np.array([])
        if how == "left":
            matched = np.zeros(len(lf), bool)
            matched[li] = True
            if (~matched).any():
                um = lf[~matched][left_cols].copy()
                um[start] = np.full((~matched).sum(), np.datetime64("NaT"),
                                    lts_dtype)
                um[end] = um[start]
                for c in payload_cols:
                    um[c] = np.nan
                out = pd.concat([out, um], ignore_index=True)
        return out[out_cols]

    def group_join(g: pd.DataFrame) -> pd.DataFrame:
        # No replica dedup needed: replicas of one interval row go to
        # DISTINCT _blk values (same shard), so each source row appears at
        # most once per group — and genuinely duplicated input intervals
        # correctly emit one output row per duplicate (SQL join semantics).
        iv = g[g["_side"] == 1]
        left = g[g["_side"] == 0]
        if len(left) == 0:
            return g.iloc[0:0][out_cols]
        codes, _ = pd.factorize(
            pd.concat([left[key], iv[key]], ignore_index=True), sort=False)
        kc_l = codes[:len(left)].astype(np.int64)
        kc_iv = codes[len(left):].astype(np.int64)
        s_ns = _ns(iv[start].to_numpy())
        order = np.lexsort((s_ns, kc_iv))
        ivs = iv.iloc[order].reset_index(drop=True)
        return join_left_frame(left, kc_l, ivs, kc_iv[order], s_ns[order],
                               _ns(ivs[end].to_numpy()))

    out_schema = pa.schema(
        [lsch.field(c) for c in left_cols]
        + [pa.field(start, ts_type), pa.field(end, ts_type)]
        + [pa.field(c, pa.float64()) for c in payload_cols])

    if broadcast_intervals_max:
        import ray

        parts, total, over = [], 0, False
        for b in intervals_ds.iter_batches(batch_size=1 << 20,
                                           batch_format="pyarrow"):
            if b.num_rows:
                parts.append(b.select([key, start, end, *payload_cols]))
                total += b.num_rows
            if total > broadcast_intervals_max:
                over = True
                break
        if not over:
            if parts:
                iv_df = pa.concat_tables(parts).to_pandas()
            else:
                iv_df = pd.DataFrame(
                    {key: pd.Series([], dtype="object"),
                     start: pd.Series([], dtype="datetime64[ns]"),
                     end: pd.Series([], dtype="datetime64[ns]"),
                     **{c: pd.Series([], dtype=np.float64)
                        for c in payload_cols}})
            for c in payload_cols:
                iv_df[c] = iv_df[c].astype(np.float64)
            ref = ray.put(iv_df)

            def bcast(df: pd.DataFrame) -> pd.DataFrame:
                kmap, kc_iv, s_ns, e_ns, ivs = _iv_sorted_cached(
                    ref, key, start, end)
                kc_l = (df[key].map(kmap).fillna(-1)
                        .astype(np.int64).to_numpy())
                return join_left_frame(df, kc_l, ivs, kc_iv, s_ns, e_ns)

            return (left_ds.map_batches(bcast, batch_format="pandas")
                    .map_batches(lambda b: _conform(b, out_schema),
                                 batch_format="pyarrow"))

    grouped = left_tagged.union(iv_tagged).groupby(
        ["_shard", "_blk"]).map_groups(group_join, batch_format="pandas")
    return grouped.map_batches(lambda b: _conform(b, out_schema),
                               batch_format="pyarrow")
