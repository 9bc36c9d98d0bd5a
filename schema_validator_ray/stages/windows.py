"""Windowed aggregates over a timestamped event stream.

Ray Data has no event-time windows; per the guide, the batch-engine expression
is: partition by key (groupby shuffle), sort by ts within the group, window with
pandas. Within-group order is established by an explicit sort, so input order
never matters.

- tumbling_window: fully pre-aggregable (combine per batch, merge with a small
  groupby) — no row-level shuffle.
- sliding_count / session_windows: SKEW-SAFE — the shuffle key is
  (key, coarse time bucket), never the bare key, so one hot key with 10^9
  events is bounded per worker by its event rate x bucket span rather than its
  total history. sliding_count duplicates the trailing window-sized overlap
  into the next bucket (owner/context rows); session_windows computes local
  per-bucket sessions, then merges boundary-adjacent sessions in a second
  groupby whose group size is #buckets per key, not #events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, *, key: str, ts: str, value: str, every: str = "hour",
                    driver_merge_max: int = 5_000_000):
    """(key, window_start, n, total) — partial/combiner pattern: per-batch
    pyarrow group_by, merged by one driver-side group_by below
    ``driver_merge_max`` partial rows (the partials are already tiny) or a
    distributed Ray groupby above it."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        win = pc.floor_temporal(b[ts], unit=every)
        t = pa.table({key: b[key], "window_start": win, value: b[value]})
        agg = t.group_by([key, "window_start"]).aggregate(
            [(value, "count"), (value, "sum")])
        return pa.table({
            key: agg[key],
            "window_start": agg["window_start"],
            "n": pc.cast(agg[f"{value}_count"], pa.int64()),
            "total": agg[f"{value}_sum"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if driver_merge_max:
        parts, total, over = [], 0, False
        for b in partials.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"):
            if b.num_rows:
                parts.append(b)
                total += b.num_rows
            if total > driver_merge_max:
                over = True
                break
        if not over and parts:
            agg = (pa.concat_tables(parts).group_by([key, "window_start"])
                   .aggregate([("n", "sum"), ("total", "sum")]))
            return rd.from_arrow(pa.table({
                key: agg[key], "window_start": agg["window_start"],
                "n": pc.cast(agg["n_sum"], pa.int64()),
                "total": agg["total_sum"]}))
        if not over and not parts:
            pass  # empty input: fall through to the lazy distributed path
        else:
            partials = ds.map_batches(partial, batch_format="pyarrow")
    return (partials
            .repartition(8)
            .groupby([key, "window_start"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total", alias_name="total")))


def _ts_ns(series) -> np.ndarray:
    return series.to_numpy().astype("datetime64[ns]").astype(np.int64)


def _col_ts_ns(col) -> np.ndarray:
    """Arrow timestamp column → int64 ns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (col.to_numpy(zero_copy_only=False)
            .astype("datetime64[ns]").astype(np.int64))


def _codes_of(col) -> np.ndarray:
    """Injective int codes of an Arrow column for numpy lexsort: integers
    pass through, everything else dictionary-encodes (C-speed, no Python
    object comparisons)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False)
    return col.dictionary_encode().indices.to_numpy(zero_copy_only=False)


def _shard_series(series, n_shards: int) -> np.ndarray:
    import pyarrow as _pa

    from .referential import _hash_keys

    return (_hash_keys(_pa.array(np.asarray(series)))
            % np.uint64(n_shards)).astype(np.int32)


def grouped_topk(ds, *, key: str, order_col: str, k: int,
                 tie_col: str | None = None, n_shards: int = 32):
    """Top-k rows per key by ``order_col`` descending (ties broken by
    ``tie_col`` ascending for determinism). Two-stage: each batch emits its
    own per-key top-k (bounding any key's shuffle rows at k x num_batches),
    then a coarse hash-shard groupby re-picks vectorized — no per-key group
    calls, no full shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sort_keys = ([(key, "ascending"), (order_col, "descending")]
                 + ([(tie_col, "ascending")] if tie_col else []))

    def topk_table(t: pa.Table) -> pa.Table:
        # Arrow-native per-key head-k: one multi-key sort, then a vectorized
        # within-run rank over the key-sorted order (no pandas round-trip)
        if t.num_rows == 0:
            return t
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        kv = t[key].to_numpy(zero_copy_only=False)
        new = np.r_[True, kv[1:] != kv[:-1]]
        seg_start = np.flatnonzero(new)
        rank = np.arange(len(kv)) - seg_start[np.cumsum(new) - 1]
        return t.filter(pa.array(rank < k))

    def partial(b: pa.Table) -> pa.Table:
        out = topk_table(b)
        from .asof import _shard_of

        return out.append_column("_shard",
                                 pa.array(_shard_of(out[key], n_shards)))

    def final(g: pa.Table) -> pa.Table:
        return topk_table(g.drop_columns(["_shard"]))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("_shard").map_groups(final, batch_format="pyarrow")


def _sliding(ds, *, key: str, ts: str, window: str, bucket_multiple: int,
             n_shards: int, out_col: str, group_fn):
    """Shared Arrow-native owner/context skeleton for the sliding family:
    map-side explode tags every event with (shard, time bucket) plus
    duplicated *context* rows for events inside the trailing window of the
    next bucket's start, so each (shard, bucket) group sees every owner's
    full trailing window locally. ``group_fn(tt, aux, win_ns) -> np.ndarray``
    computes the per-key window values over one key's time-sorted segment."""
    win_ns = pd.Timedelta(window).value
    bucket_ns = win_ns * bucket_multiple
    helper = ["_tns", "_bkt", "_shard", "_own"]

    def explode(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        t_ns = _col_ts_ns(b[ts])
        bkt = t_ns // bucket_ns
        shard = _shard_of(b[key], n_shards)
        n = len(t_ns)
        own = (b.append_column("_tns", pa.array(t_ns))
               .append_column("_bkt", pa.array(bkt))
               .append_column("_shard", pa.array(shard))
               .append_column("_own", pa.array(np.ones(n, bool))))
        ctx_idx = np.flatnonzero(t_ns >= (bkt + 1) * bucket_ns - win_ns)
        if not len(ctx_idx):
            return own
        take = pa.array(ctx_idx)
        ctx = (b.take(take)
               .append_column("_tns", pa.array(t_ns[ctx_idx]))
               .append_column("_bkt", pa.array(bkt[ctx_idx] + 1))
               .append_column("_shard", pa.array(shard[ctx_idx]))
               .append_column("_own",
                              pa.array(np.zeros(len(ctx_idx), bool))))
        return pa.concat_tables([own, ctx])

    def per_group(g: pa.Table) -> pa.Table:
        # one (shard, bucket) group = many keys; per-key searchsorted over
        # contiguous key segments of the (key-code, ts)-lexsorted order
        if g.num_rows == 0:
            return g.drop_columns(helper).append_column(
                out_col, pa.array(np.empty(0, group_fn["dtype"])))
        kcodes = _codes_of(g[key])
        tns = g["_tns"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tns, kcodes))
        kv, t = kcodes[order], tns[order]
        aux = group_fn["prep"](g, order)
        seg = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        seg = np.r_[seg, len(kv)]
        out = np.empty(len(kv), group_fn["dtype"])
        for a, b_ in zip(seg[:-1], seg[1:]):
            out[a:b_] = group_fn["win"](
                t[a:b_], None if aux is None else aux[a:b_], win_ns)
        res = (g.take(pa.array(order))
               .append_column(out_col, pa.array(out)))
        own = res["_own"].to_numpy(zero_copy_only=False)
        return res.filter(pa.array(own)).drop_columns(helper)

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["_shard", "_bkt"])
            .map_groups(per_group, batch_format="pyarrow"))


def sliding_count(ds, *, key: str, ts: str, window: str = "1h",
                  bucket_multiple: int = 64, n_shards: int = 32):
    """Per event: number of events of the same key within the trailing window
    (inclusive). Equivalent SQL: COUNT(*) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT ROW).

    Skew-safe shape: events shuffle on (hash(key) % n_shards, time bucket of
    ``bucket_multiple`` x window) — a few hundred COARSE groups (Ray's
    per-group overhead is ~ms, so one group per (key, bucket) would dominate
    small inputs), each processed with a vectorized per-key pass. Each event
    is an *owner* row in its own bucket; events inside the trailing window of
    the next bucket's start are duplicated there as *context* rows, so every
    owner sees its full trailing window locally. A hot key is bounded by its
    event rate over one bucket + one window, never its total history;
    duplication overhead is 1/bucket_multiple of the stream in expectation.
    Arrow-native end to end (zero-copy blocks, no pandas round-trip)."""

    def win(tt, _aux, win_ns):
        return (np.searchsorted(tt, tt, side="right")
                - np.searchsorted(tt, tt - win_ns, side="left"))

    return _sliding(ds, key=key, ts=ts, window=window,
                    bucket_multiple=bucket_multiple, n_shards=n_shards,
                    out_col="cnt_window",
                    group_fn={"prep": lambda g, order: None,
                              "win": win, "dtype": np.int64})


def sliding_sum(ds, *, key: str, ts: str, value: str, window: str = "1h",
                bucket_multiple: int = 64, n_shards: int = 32,
                round_digits: int = 6):
    """Per event: SUM(value) of the same key within the trailing window
    (inclusive). SQL: SUM(value) OVER (PARTITION BY key ORDER BY ts RANGE
    BETWEEN INTERVAL window PRECEDING AND CURRENT ROW). Same skew-safe
    sharded owner/context shape as :func:`sliding_count`; in-group sums via
    per-key prefix sums (rounded to ``round_digits`` for cross-engine float
    comparability). SQL window SUM skips NULLs — treated as 0 here (an
    all-null window yields 0.0 vs SQL NULL; documented divergence)."""

    def prep(g: pa.Table, order: np.ndarray) -> np.ndarray:
        v = pc.cast(g[value], pa.float64()).to_numpy(zero_copy_only=False)
        return np.nan_to_num(v)[order]

    def win(tt, vv, win_ns):
        cum = np.concatenate([[0.0], np.cumsum(vv)])
        lo = np.searchsorted(tt, tt - win_ns, side="left")
        hi = np.searchsorted(tt, tt, side="right")
        return np.round(cum[hi] - cum[lo], round_digits)

    return _sliding(ds, key=key, ts=ts, window=window,
                    bucket_multiple=bucket_multiple, n_shards=n_shards,
                    out_col="sum_window",
                    group_fn={"prep": prep, "win": win,
                              "dtype": np.float64})


def _collapse_session_chains(g: pd.DataFrame, delta: pd.Timedelta,
                             key: str) -> pd.DataFrame:
    """Merge per-bucket local sessions of the same key that touch across
    bucket boundaries. Buckets partition time, so a key's sessions never
    interleave: new chain where the gap to the previous session's end exceeds
    delta; transitive chains collapse by cumsum (a local session always
    starts after the previous one's end within a key)."""
    g = g.sort_values([key, "session_start"],
                      kind="stable").reset_index(drop=True)
    kv = g[key]
    new_key = (kv != kv.shift()).to_numpy()
    starts = _ts_ns(g["session_start"])
    ends = _ts_ns(g["session_end"])
    gap_prev = starts - np.r_[0, ends[:-1]]
    brk = new_key | (gap_prev > delta.value)
    cid = np.cumsum(brk)
    out = (g.assign(_cid=cid).groupby("_cid")
           .agg(**{key: (key, "first"),
                   "session_start": ("session_start", "min"),
                   "session_end": ("session_end", "max"),
                   "n_events": ("n_events", "sum")}))
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.reset_index(drop=True)[
        [key, "session_start", "session_end", "n_events"]]


def session_windows(ds, *, key: str, ts: str, gap: str = "30min",
                    bucket_multiple: int = 64, n_shards: int = 32,
                    summary_merge_max: int = 5_000_000):
    """Session assignment: events of a key closer than ``gap`` share a session.
    Returns one row per session: (key, session_start, session_end, n_events).

    ONE event shuffle: phase 1 computes sessions locally per (shard, time
    bucket of ``bucket_multiple`` x gap) with one vectorized pandas groupby
    per group — per-key size bounded by the bucket span — and flags BOUNDARY
    sessions (within ``gap`` of a bucket edge, the only ones that can merge
    across buckets; expected fraction ~ 2/bucket_multiple). Non-boundary
    sessions are final as-is; boundary summaries chain-merge on the driver
    (stream guarded by ``summary_merge_max``) and come back as a small table
    unioned with the rest. Above the guard, falls back to a second
    per-shard groupby over ALL session summaries — O(#buckets) rows per
    key, never #events."""
    import ray.data as rd

    from .asof import _conform

    delta = pd.Timedelta(gap)
    bucket_ns = delta.value * bucket_multiple
    sch = ds.schema()
    kt = sch.types[sch.names.index(key)]
    if isinstance(kt, pa.DataType):
        key_type = kt
    else:
        # pandas-backed dataset: PandasBlockSchema carries numpy dtypes /
        # python classes; object dtype means strings in this engine
        try:
            key_type = pa.from_numpy_dtype(np.dtype(kt))
        except (TypeError, pa.ArrowNotImplementedError):
            key_type = pa.string()
    out_schema = pa.schema([(key, key_type),
                            ("session_start", pa.timestamp("ns")),
                            ("session_end", pa.timestamp("ns")),
                            ("n_events", pa.int64())])

    def bucketize(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        t = b.append_column("_bkt", pa.array(_col_ts_ns(b[ts]) // bucket_ns,
                                             pa.int64()))
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_sessions(g: pa.Table) -> pa.Table:
        # numpy throughout: dictionary codes + lexsort beat a string sort,
        # and session bounds come from break-segment arithmetic, not a
        # groupby-agg (sessions are contiguous runs after the sort)
        bkt = int(g["_bkt"][0].as_py())
        codes = _codes_of(g[key])
        ts_ns = _col_ts_ns(g[ts])
        order = np.lexsort((ts_ns, codes))
        c = codes[order]
        t_ns = ts_ns[order]
        new_key = np.r_[True, c[1:] != c[:-1]]
        brk = new_key | np.r_[False, (t_ns[1:] - t_ns[:-1]) > delta.value]
        seg = np.flatnonzero(brk)
        last = np.r_[seg[1:] - 1, len(t_ns) - 1]
        s_ns = t_ns[seg]
        e_ns = t_ns[last]
        karr = g[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        return pa.table({
            key: karr.take(pa.array(order[seg])),
            "session_start": pa.array(s_ns.astype("datetime64[ns]")),
            "session_end": pa.array(e_ns.astype("datetime64[ns]")),
            "n_events": pa.array(np.diff(np.r_[seg, len(t_ns)])
                                 .astype(np.int64)),
            "_bdry": pa.array(np.where(
                (s_ns - bkt * bucket_ns <= delta.value)
                | ((bkt + 1) * bucket_ns - e_ns <= delta.value),
                np.int8(1), np.int8(0))),
        })

    local = (ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby(["_shard", "_bkt"]).map_groups(
                 local_sessions, batch_format="pyarrow").materialize())

    parts, total, over = [], 0, False
    for b in (local.filter(expr="_bdry == 1")
              .iter_batches(batch_size=1 << 20, batch_format="pandas")):
        if len(b):
            parts.append(b[[key, "session_start", "session_end", "n_events"]])
            total += len(b)
        if total > summary_merge_max:
            over = True
            break
    if over:
        with_shard = local.map_batches(
            lambda b: b.assign(_shard=_shard_series(b[key], n_shards)),
            batch_format="pandas")
        return with_shard.groupby("_shard").map_groups(
            lambda g: _collapse_session_chains(g, delta, key),
            batch_format="pandas")

    interior = (local.filter(expr="_bdry == 0")
                .map_batches(lambda b: _conform(b, out_schema),
                             batch_format="pyarrow"))
    if not parts:
        return interior
    merged = _collapse_session_chains(
        pd.concat(parts, ignore_index=True), delta, key)
    merged_ds = rd.from_arrow(
        _conform(pa.Table.from_pandas(merged, preserve_index=False),
                 out_schema))
    return interior.union(merged_ds)


def sessionize(ds, *, key: str, ts: str, gap: str = "30min",
               bucket_multiple: int = 64, n_shards: int = 32,
               summary_merge_max: int = 5_000_000):
    """Per-EVENT session assignment: every input row comes back with its
    session's (session_start, session_end). Equivalent SQL: MIN/MAX(ts) OVER
    (PARTITION BY key, session-id) where session-id is the running count of
    gaps > ``gap``.

    ONE event shuffle (vs session_windows + interval_join = two): the same
    skew-safe (shard, coarse-bucket) groups that derive local sessions also
    tag each event with its LOCAL bounds; only BOUNDARY sessions (within
    ``gap`` of a bucket edge — the only ones that can merge across buckets)
    emit summary rows. Cross-bucket chains collapse on the driver (stream
    guarded by ``summary_merge_max``) into a remap of (key, local start) →
    final bounds, broadcast via ``ray.put`` — chain-bounded, tiny. Events
    keep their local bounds unless remapped. Above the guard, falls back to
    the session_windows + interval_join composition (second shuffle)."""
    import ray

    delta = pd.Timedelta(gap)
    bucket_ns = delta.value * bucket_multiple
    in_cols = list(ds.schema().names)
    sch = ds.schema()
    import pyarrow as pa

    from .asof import _conform
    out_schema = pa.schema(
        list(zip(sch.names, sch.types))
        + [("session_start", pa.timestamp("ns")),
           ("session_end", pa.timestamp("ns"))])

    def bucketize(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        t = b.append_column("_bkt", pa.array(_col_ts_ns(b[ts]) // bucket_ns,
                                             pa.int64()))
        return t.append_column("_shard",
                               pa.array(_shard_of(b[key], n_shards)))

    def local_assign(g: pa.Table) -> pa.Table:
        n = g.num_rows
        codes = _codes_of(g[key])
        ts_ns_all = _col_ts_ns(g[ts])
        order = np.lexsort((ts_ns_all, codes))
        t = g.take(pa.array(order))
        c = codes[order]
        t_ns = ts_ns_all[order]
        new_key = np.r_[True, c[1:] != c[:-1]]
        brk = new_key | np.r_[False, (t_ns[1:] - t_ns[:-1]) > delta.value]
        seg = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1
        last = np.r_[seg[1:] - 1, n - 1]
        starts_ns = t_ns[seg]
        ends_ns = t_ns[last]
        base = t.select(in_cols)
        ev = (base
              .append_column("session_start",
                             pa.array(starts_ns[seg_id].astype(
                                 "datetime64[ns]")))
              .append_column("session_end",
                             pa.array(ends_ns[seg_id].astype(
                                 "datetime64[ns]")))
              .append_column("_side", pa.array(np.zeros(n, np.int8))))
        # boundary sessions only: the sole candidates for cross-bucket merges
        bkt = int(t["_bkt"][0].as_py())
        is_b = ((starts_ns - bkt * bucket_ns <= delta.value)
                | ((bkt + 1) * bucket_ns - ends_ns <= delta.value))
        if is_b.any():
            bi = np.flatnonzero(is_b)
            # each boundary session's first event row rides as the (ignored)
            # payload filler — keeps dtypes identical across groups
            summ = (base.take(pa.array(seg[bi]))
                    .append_column("session_start",
                                   pa.array(starts_ns[bi].astype(
                                       "datetime64[ns]")))
                    .append_column("session_end",
                                   pa.array(ends_ns[bi].astype(
                                       "datetime64[ns]")))
                    .append_column("_side",
                                   pa.array(np.ones(len(bi), np.int8))))
            ev = pa.concat_tables([ev, summ])
        return ev

    tagged = (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby(["_shard", "_bkt"]).map_groups(
                  local_assign, batch_format="pyarrow").materialize())

    # ---- driver-side chain merge over the boundary summaries (guarded) ----
    parts, total, over = [], 0, False
    for b in (tagged.filter(expr="_side == 1")
              .iter_batches(batch_size=1 << 20, batch_format="pandas")):
        if len(b):
            parts.append(b[[key, "session_start", "session_end"]])
            total += len(b)
        if total > summary_merge_max:
            over = True
            break
    if over:
        from .interval import interval_join

        sw = session_windows(ds, key=key, ts=ts, gap=gap,
                             bucket_multiple=bucket_multiple,
                             n_shards=n_shards)
        return interval_join(ds, sw, key=key, ts=ts,
                             start="session_start", end="session_end",
                             payload_cols=[], how="inner")

    remap = pd.DataFrame({key: pd.Series([], dtype="object"),
                          "session_start": pd.Series(
                              [], dtype="datetime64[ns]"),
                          "_fs": pd.Series([], dtype="datetime64[ns]"),
                          "_fe": pd.Series([], dtype="datetime64[ns]")})
    if parts:
        s = (pd.concat(parts, ignore_index=True)
             .sort_values([key, "session_start"], kind="stable")
             .reset_index(drop=True))
        kv = s[key]
        new_key = (kv != kv.shift()).to_numpy()
        starts = _ts_ns(s["session_start"])
        ends = _ts_ns(s["session_end"])
        brk = new_key | (starts - np.r_[0, ends[:-1]] > delta.value)
        cid = np.cumsum(brk) - 1
        seg = np.flatnonzero(brk)
        counts = np.diff(np.r_[seg, len(s)])
        fs = s["session_start"].to_numpy()[seg][cid]
        fe = (s.assign(_cid=cid).groupby("_cid")["session_end"]
              .max().to_numpy()[cid])
        chained = counts[cid] > 1          # remap only sessions that merged
        remap = pd.DataFrame({key: kv.to_numpy()[chained],
                              "session_start":
                                  s["session_start"].to_numpy()[chained],
                              "_fs": fs[chained], "_fe": fe[chained]})
    ref = ray.put(remap)

    def apply_remap(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        ss = (b["session_start"].to_numpy(zero_copy_only=False)
              .astype("datetime64[ns]"))
        se = (b["session_end"].to_numpy(zero_copy_only=False)
              .astype("datetime64[ns]"))
        if len(r):
            kv = b[key].to_numpy(zero_copy_only=False)
            # distinct (key, local session start) pairs only touch pandas;
            # per-row work is one int gather
            codes, uniq = pd.factorize(pd.MultiIndex.from_arrays([kv, ss]))
            pairs = pd.DataFrame({key: uniq.get_level_values(0),
                                  "session_start": uniq.get_level_values(1)})
            m = pairs.merge(r, on=[key, "session_start"], how="left")
            fs = m["_fs"].to_numpy().astype("datetime64[ns]")[codes]
            fe = m["_fe"].to_numpy().astype("datetime64[ns]")[codes]
            hit = ~np.isnat(fs)
            ss = np.where(hit, fs, ss)
            se = np.where(hit, fe, se)
        return (b.select(in_cols)
                .append_column("session_start", pa.array(ss))
                .append_column("session_end", pa.array(se)))

    events = tagged.filter(expr="_side == 0")
    return (events.map_batches(apply_remap, batch_format="pyarrow")
            .map_batches(lambda b: _conform(b, out_schema),
                         batch_format="pyarrow"))
