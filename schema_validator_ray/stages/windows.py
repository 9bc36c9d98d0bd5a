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


def tumbling_window(ds, *, key: str, ts: str, value: str, every: str = "hour"):
    """(key, window_start, n, total) — partial/combiner pattern: per-batch
    pyarrow group_by, merged by a small Ray groupby."""
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

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(8)
            .groupby([key, "window_start"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total", alias_name="total")))


def _ts_ns(series) -> np.ndarray:
    return series.to_numpy().astype("datetime64[ns]").astype(np.int64)


def sliding_count(ds, *, key: str, ts: str, window: str = "1h",
                  bucket_multiple: int = 64):
    """Per event: number of events of the same key within the trailing window
    (inclusive). Equivalent SQL: COUNT(*) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT ROW).

    Skew-safe shape: events shuffle on (key, time bucket of
    ``bucket_multiple`` x window). Each event is an *owner* row in its own
    bucket; events inside the trailing window of the next bucket's start are
    duplicated there as *context* rows, so every owner sees its full trailing
    window locally. Per-group memory is bounded by the key's event rate over
    one bucket + one window, never its total history. Duplication overhead is
    1/bucket_multiple of the stream in expectation."""
    delta = pd.Timedelta(window)
    win_ns = delta.value
    bucket_ns = win_ns * bucket_multiple

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        t_ns = _ts_ns(b[ts])
        bkt = t_ns // bucket_ns
        own = b.copy()
        own["_bkt"] = bkt
        own["_own"] = True
        next_start = (bkt + 1) * bucket_ns
        ctx_mask = t_ns >= next_start - win_ns
        ctx = b[ctx_mask].copy()
        ctx["_bkt"] = bkt[ctx_mask] + 1
        ctx["_own"] = False
        return pd.concat([own, ctx], ignore_index=True)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable").reset_index(drop=True)
        t = g[ts].to_numpy()
        left = np.searchsorted(t, t - delta.to_numpy(), side="left")
        right = np.searchsorted(t, t, side="right")  # peer rows (equal ts) count
        g["cnt_window"] = (right - left).astype(np.int64)
        g = g[g["_own"]]
        return g.drop(columns=["_bkt", "_own"]).reset_index(drop=True)

    exploded = ds.map_batches(explode, batch_format="pandas")
    return exploded.groupby([key, "_bkt"]).map_groups(per_group,
                                                      batch_format="pandas")


def session_windows(ds, *, key: str, ts: str, gap: str = "30min",
                    bucket_multiple: int = 64):
    """Session assignment: events of a key closer than ``gap`` share a session.
    Returns one row per session: (key, session_start, session_end, n_events).

    Skew-safe two-phase shape: phase 1 computes sessions locally per
    (key, time bucket of ``bucket_multiple`` x gap) — group size bounded by the
    bucket span. Phase 2 merges sessions that touch across bucket boundaries
    (chains merge transitively) in a per-key group whose size is the number of
    session summaries, bounded by #buckets, never #events."""
    delta = pd.Timedelta(gap)
    bucket_ns = delta.value * bucket_multiple

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["_bkt"] = _ts_ns(b[ts]) // bucket_ns
        return out

    def local_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable").reset_index(drop=True)
        t = g[ts]
        new_session = (t.diff() > delta).cumsum()
        out = g.groupby(new_session).agg(
            session_start=(ts, "min"), session_end=(ts, "max"),
            n_events=(ts, "size"))
        out[key] = g[key].iloc[0]
        return out[[key, "session_start", "session_end", "n_events"]]

    def merge_boundary(g: pd.DataFrame) -> pd.DataFrame:
        # buckets partition time, so sessions of one key never interleave:
        # sort by start, merge any session starting within gap of the running
        # end (transitive chains collapse in one pass)
        g = g.sort_values("session_start", kind="stable").reset_index(drop=True)
        starts = _ts_ns(g["session_start"])
        ends = _ts_ns(g["session_end"])
        n = g["n_events"].to_numpy()
        o_start, o_end, o_n = [], [], []
        for i in range(len(g)):
            if o_end and starts[i] - o_end[-1] <= delta.value:
                o_end[-1] = max(o_end[-1], ends[i])
                o_n[-1] += int(n[i])
            else:
                o_start.append(starts[i])
                o_end.append(ends[i])
                o_n.append(int(n[i]))
        unit = g["session_start"].to_numpy().dtype
        return pd.DataFrame({
            key: g[key].iloc[0],
            "session_start": np.array(o_start, "datetime64[ns]").astype(unit),
            "session_end": np.array(o_end, "datetime64[ns]").astype(unit),
            "n_events": np.array(o_n, np.int64),
        })

    local = (ds.map_batches(bucketize, batch_format="pandas")
             .groupby([key, "_bkt"]).map_groups(local_sessions,
                                                batch_format="pandas"))
    return local.groupby(key).map_groups(merge_boundary, batch_format="pandas")
