"""Windowed conversion funnel — the product-analytics sequence operator
(did the user do step1, then step2 within W of step1, then step3 within W of
step2, …), new-engine surface (the reference has no event analytics; cited
vs SURVEY.md §2.7 windowed-operator family).

Distributed shape: ONE exchange. Events pre-filter map-side to the step
types (columns pruned to (user, ts µs, step index) — three narrow columns),
hash-partition by user, and each ``groupby(user)`` group walks the step
chain with numpy masks: t1 = min ts of step 1, t_i = min ts of step i in
``(t_{i-1}, t_{i-1}+window]``. A group is bounded by ONE user's step-typed
events — the same bound the equivalent SQL chain of correlated mins has; no
join, no broadcast, nothing driver-side.

(The first cut composed per-step ``Dataset.join``s; Ray 2.49 emits
zero-column pandas blocks for empty aggregate/join partitions and a
downstream join fails on them nondeterministically — "No match or multiple
matches for key field reference". The single-groupby shape is both immune
and one exchange instead of 2(n−1).)

Timestamps stay int64 microseconds throughout — results hash-compare
bit-exactly against the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def funnel(events, *, user_col: str, ts_col: str, type_col: str,
           steps: list[str], window_us: int):
    """Per-user funnel table: (user, t1, …, tn) where t1 = first ``steps[0]``
    event and t_i = first ``steps[i-1]`` event in ``(t_{i-1}, t_{i-1} +
    window_us]`` — NULL from the first missed step on. Rows: every user who
    completed step 1."""
    step_ix = {s: i for i, s in enumerate(steps)}
    n = len(steps)
    t_cols = [f"t{i}" for i in range(1, n + 1)]

    def narrow(b: pa.Table) -> pa.Table:
        m = pc.is_in(b[type_col], value_set=pa.array(steps))
        t = b.filter(m)
        # index_in maps each row's type to its step index; normalize the
        # timestamp to µs BEFORE the int cast (pandas-origin columns are ns)
        ix = pc.index_in(t[type_col], value_set=pa.array(steps))
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: t[user_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_step": pc.cast(ix, pa.int8())})

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["_ts"].to_numpy()
        st = g["_step"].to_numpy()
        out = {}
        prev = None
        for i in range(n):
            mine = ts[st == i]
            if prev is None:                       # step 1: plain min
                cand = mine
            else:
                cand = mine[(mine > prev) & (mine <= prev + window_us)]
            if len(cand) == 0:
                if i == 0:
                    return pd.DataFrame(
                        {user_col: pd.Series([], dtype=g[user_col].dtype)}
                        | {c: pd.Series([], dtype="float64")
                           for c in t_cols})
                # remaining steps are unreachable
                for j in range(i, n):
                    out[t_cols[j]] = np.nan
                break
            prev = int(cand.min())
            out[t_cols[i]] = float(prev)
        # epoch-µs as float64 (exact below 2^53): the NULL-able funnel tail
        # must round-trip as NaN to compare against SQL
        return pd.DataFrame({user_col: [g[user_col].iloc[0]]}
                            | {c: np.array([out[c]], np.float64)
                               for c in t_cols})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby(user_col)
            .map_groups(walk, batch_format="pandas"))


def followed_by(events, *, user_col: str, ts_col: str, type_col: str,
                id_col: str, first: str, then: str, window_us: int,
                out_col: str = "next_us"):
    """Per-EVENT sequence matching (``funnel`` is per-user): every
    ``first``-type event followed by a ``then``-type event of the same user
    strictly after it and within ``window_us``. Returns (id, user,
    ``out_col`` = the FIRST such follower's epoch-µs).

    One narrow hash exchange by user SHARD (Ray's per-group map_groups cost
    × |users| would dominate — the cooccurrence lesson); within a shard one
    lexsort groups the users and a tiny per-user ``searchsorted`` of the
    follower timestamps against the lead timestamps runs over each run —
    no pair materialization, hot user bounded by their own events."""
    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        m = pc.is_in(b[type_col], value_set=pa.array([first, then]))
        t = b.filter(m)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: t[user_col],
            id_col: t[id_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_lead": pc.cast(pc.equal(t[type_col], pa.scalar(first)),
                             pa.int8()),
            "_shard": pa.array(_shard_of(t[user_col], 64))})

    def match_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], g[id_col].type),
                          user_col: pa.array([], g[user_col].type),
                          out_col: pa.array([], pa.int64())})
        n = g.num_rows
        if n == 0:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        lead = g["_lead"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((ts, lead, codes))
        cs, tss, ld = codes[order], ts[order], lead[order]
        seg = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.r_[seg[1:], n]
        out_idx, out_nxt = [], []
        for s, e in zip(seg, ends):
            l_seg = ld[s:e]
            k = int(l_seg.argmax()) if l_seg.any() else (e - s)
            b_ts = tss[s:s + k]                     # followers sort first
            a_ts = tss[s + k:e]
            if not len(a_ts) or not len(b_ts):
                continue
            pos = np.searchsorted(b_ts, a_ts, side="right")  # first b > a
            ok = pos < len(b_ts)
            nxt = b_ts[np.minimum(pos, len(b_ts) - 1)]
            hit = ok & (nxt <= a_ts + window_us)
            if hit.any():
                out_idx.append(np.flatnonzero(hit) + s + k)
                out_nxt.append(nxt[hit])
        if not out_idx:
            return empty
        take = pa.array(order[np.concatenate(out_idx)])
        return pa.table({
            id_col: (g[id_col].combine_chunks() if isinstance(
                g[id_col], pa.ChunkedArray) else g[id_col]).take(take),
            user_col: (g[user_col].combine_chunks() if isinstance(
                g[user_col], pa.ChunkedArray)
                else g[user_col]).take(take),
            out_col: pa.array(np.concatenate(out_nxt).astype(np.int64))})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(match_shard, batch_format="pyarrow"))


WEEK_US = 7 * 86_400_000_000


def cohort_retention(events, *, user_col: str, ts_col: str,
                     bucket_us: int = WEEK_US):
    """Cohort retention matrix: users bucketed by their FIRST-activity week
    (cohort), counted once per (cohort, offset) cell where offset = weeks
    since the cohort week they were active again — the standard
    product-retention table, over integer epoch-µs week buckets (identical
    arithmetic on both engine and SQL sides).

    Distributed shape, one row-level exchange: per-batch DISTINCT
    (user, week) partials bound a hot user's shuffle rows at one per batch
    per active week; ``groupby(user)`` derives cohort = min(week) and emits
    each user's ≤|weeks| (cohort, offset) rows; per-batch (cohort, offset,
    count) partials then reduce in a tiny groupby (cells ≤ weeks²)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def weeks(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        # integer division (epochs are positive, trunc == floor) — the same
        # `epoch_us(ts) // bucket` the SQL oracle computes
        w = pc.divide(pc.cast(ts, pa.int64()),
                      pa.scalar(int(bucket_us), pa.int64()))
        t = pa.table({user_col: b[user_col], "_w": w}).drop_null()
        return t.group_by([user_col, "_w"]).aggregate([])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["_w"].to_numpy())
        return pd.DataFrame({"cohort": np.full(len(w), w[0], np.int64),
                             "offset": (w - w[0]).astype(np.int64)})

    cells = (events.map_batches(weeks, batch_format="pyarrow")
             .groupby(user_col)
             .map_groups(per_user, batch_format="pandas"))

    def part(b: pa.Table) -> pa.Table:
        agg = b.group_by(["cohort", "offset"]).aggregate([([], "count_all")])
        return pa.table({"cohort": agg["cohort"], "offset": agg["offset"],
                         "n": pc.cast(agg["count_all"], pa.int64())})

    return (cells.map_batches(part, batch_format="pyarrow")
            .groupby(["cohort", "offset"])
            .aggregate(Sum("n", alias_name="n_users")))
