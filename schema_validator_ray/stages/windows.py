"""Windowed aggregates over a timestamped event stream.

Ray Data has no event-time windows; per the guide, the batch-engine expression
is: partition by key (groupby shuffle), sort by ts within the group, window with
pandas. Ordering assumption: correctness requires all rows of a key in one
group — guaranteed by ``groupby(key)``; within-group order is established by an
explicit sort, so input order never matters.

- tumbling_window: fully pre-aggregable (combine per batch, merge with a small
  groupby) — no row-level shuffle.
- sliding_count / session_windows: need the full per-key history -> map_groups.
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


def sliding_count(ds, *, key: str, ts: str, window: str = "1h"):
    """Per event: number of events of the same key within the trailing window
    (inclusive). Equivalent SQL: COUNT(*) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT ROW)."""
    delta = pd.Timedelta(window)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable").reset_index(drop=True)
        t = g[ts].to_numpy()
        left = np.searchsorted(t, t - delta.to_numpy(), side="left")
        right = np.searchsorted(t, t, side="right")  # peer rows (equal ts) count
        g["cnt_window"] = (right - left).astype(np.int64)
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def session_windows(ds, *, key: str, ts: str, gap: str = "30min"):
    """Session assignment: events of a key closer than ``gap`` share a session.
    Returns one row per session: (key, session_start, session_end, n_events)."""
    delta = pd.Timedelta(gap)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable").reset_index(drop=True)
        t = g[ts]
        new_session = (t.diff() > delta).cumsum()
        out = g.groupby(new_session).agg(
            session_start=(ts, "min"), session_end=(ts, "max"),
            n_events=(ts, "size"))
        out[key] = g[key].iloc[0]
        return out[[key, "session_start", "session_end", "n_events"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
