"""Windowed conversion funnel — the product-analytics sequence operator
(did the user do step1, then step2 within W of step1, then step3 within W of
step2, …), new-engine surface (the reference has no event analytics; cited
vs SURVEY.md §2.7 windowed-operator family).

Distributed shape: ONE exchange. Events pre-filter map-side to the step
types (columns pruned to (user, ts µs, step index) — three narrow columns),
hash-partition by user SHARD (64 shards, not per-user groups: Ray's
per-group invocation cost × |users| would dominate at 10^8 users — the
``followed_by`` lesson), and each shard walks ALL its users' step chains
simultaneously with ``np.minimum.at`` scatter-mins over factorized user
codes: t1[u] = min ts of step 1, t_i[u] = min ts of step i in
``(t_{i-1}[u], t_{i-1}[u]+window]``. Work per shard is O(n_steps × rows),
fully vectorized; a hot user is bounded by their own step-typed events.

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
        from .asof import _shard_of

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
            "_step": pc.cast(ix, pa.int8()),
            "_shard": pa.array(_shard_of(t[user_col], 64))})

    def walk_shard(g: pa.Table) -> pa.Table:
        utype = g[user_col].type
        empty = pa.table({user_col: pa.array([], utype)}
                         | {c: pa.array([], pa.float64()) for c in t_cols})
        if g.num_rows == 0:
            return empty
        codes, uniq = pd.factorize(
            g[user_col].to_numpy(zero_copy_only=False))
        # epoch-µs as float64 (exact below 2^53): the NULL-able funnel tail
        # must round-trip as NaN to compare against SQL
        ts = g["_ts"].to_numpy(zero_copy_only=False).astype(np.float64)
        st = g["_step"].to_numpy(zero_copy_only=False)
        nu = len(uniq)
        prev: np.ndarray | None = None
        outs: list[np.ndarray] = []
        for i in range(n):
            acc = np.full(nu, np.inf)
            m = st == i
            if prev is None:                       # step 1: plain min
                cm = m
            else:                                  # min in (prev, prev+W]
                p = prev[codes]
                cm = m & (ts > p) & (ts <= p + window_us)
            np.minimum.at(acc, codes[cm], ts[cm])
            outs.append(acc)
            prev = acc                             # inf propagates: no
            #                                        candidate beats it
        keep = np.isfinite(outs[0])                # completed step 1
        if not keep.any():
            return empty
        return pa.table(
            {user_col: pa.array(uniq[keep], utype)}
            # from_pandas=True: NaN (missed step) -> Arrow null, matching
            # the SQL oracle's NULL funnel tail
            | {c: pa.array(np.where(np.isfinite(v[keep]), v[keep], np.nan),
                           from_pandas=True)
               for c, v in zip(t_cols, outs)})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(walk_shard, batch_format="pyarrow"))


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


def transition_counts(events, *, user_col: str, ts_col: str, type_col: str,
                      tiebreak_col: str):
    """Markov transition counts over per-user event sequences: for every
    adjacent pair of events of the same user (ordered by ``ts_col`` then
    ``tiebreak_col`` — the same total order as SQL's ``LAG() OVER (PARTITION
    BY user ORDER BY ts, id)``), count (prev_type -> next_type). Returns a
    Dataset of (prev_type, next_type, n) — at most |types|² rows.

    Distributed shape, one narrow exchange: events project map-side to four
    columns (user, µs, tiebreak, type), hash-partition by user SHARD (64
    shards, never per-user groups — the ``followed_by`` lesson), and each
    shard lexsorts once, dictionary-encodes the types, and reduces every
    same-user adjacent pair to per-shard (prev, next, count) partials via one
    ``np.unique`` over packed int codes. The final groupby sums |shards| ×
    |types|² partial rows — tiny regardless of event volume."""
    from ray.data.aggregate import Sum

    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: b[user_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_tb": b[tiebreak_col],
            "_ty": b[type_col],
            "_shard": pa.array(_shard_of(b[user_col], 64))})

    def count_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({"prev_type": pa.array([], pa.string()),
                          "next_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        tb = g["_tb"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g["_ty"].combine_chunks())
        ty = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        k = len(vocab)
        order = np.lexsort((tb, ts, codes))
        cs, tys = codes[order], ty[order]
        m = cs[1:] == cs[:-1]
        if not m.any():
            return empty
        key = tys[:-1][m] * k + tys[1:][m]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"prev_type": vocab.take(pa.array(uk // k)),
                         "next_type": vocab.take(pa.array(uk % k)),
                         "n": pa.array(cnt.astype(np.int64))})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(count_shard, batch_format="pyarrow")
            .groupby(["prev_type", "next_type"])
            .aggregate(Sum("n", alias_name="n")))


def sequence_ngram_counts(events, *, user_col: str, ts_col: str,
                          type_col: str, tiebreak_col: str, n: int = 3):
    """Counts of length-``n`` consecutive type sequences within each
    user's event stream (ordered by ``ts_col`` then ``tiebreak_col`` —
    the same total order as SQL's chained ``LEAD() OVER (PARTITION BY
    user ORDER BY ts, id)``). Returns a Dataset of (t1..tn, cnt), at
    most |types|ⁿ rows — the path-mining generalization of
    ``transition_counts`` (n=2).

    Same distributed shape as transition_counts: one narrow 64-way
    user-shard exchange; each shard lexsorts once, dictionary-encodes
    the types and reduces every same-user n-window to per-shard packed
    int-code partials via one ``np.unique``; the final groupby sums
    |shards| × |types|ⁿ partial rows."""
    from ray.data.aggregate import Sum

    if n < 2:
        raise ValueError("n must be >= 2")
    out_cols = [f"t{i + 1}" for i in range(n)]

    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: b[user_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_tb": b[tiebreak_col],
            "_ty": b[type_col],
            "_shard": pa.array(_shard_of(b[user_col], 64))})

    def count_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {c: pa.array([], pa.string()) for c in out_cols}
            | {"cnt": pa.array([], pa.int64())})
        if g.num_rows < n:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        tb = g["_tb"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g["_ty"].combine_chunks())
        ty = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        k = len(vocab)
        if k ** n >= 2 ** 62:  # packed-code overflow guard
            raise ValueError(f"type vocabulary too large to pack: {k}^{n}")
        order = np.lexsort((tb, ts, codes))
        cs, tys = codes[order], ty[order]
        w = len(cs) - (n - 1)
        # window is within one user iff its first and last rows share it
        m = cs[:w] == cs[n - 1:]
        if not m.any():
            return empty
        key = np.zeros(int(m.sum()), np.int64)
        for j in range(n):
            key = key * k + tys[j:j + w][m]
        uk, cnt = np.unique(key, return_counts=True)
        cols = {}
        for j in range(n - 1, -1, -1):
            cols[out_cols[j]] = vocab.take(pa.array(uk % k))
            uk = uk // k
        cols["cnt"] = pa.array(cnt.astype(np.int64))
        return pa.table({c: cols[c] for c in out_cols} | {"cnt": cols["cnt"]})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(count_shard, batch_format="pyarrow")
            .groupby(out_cols)
            .aggregate(Sum("cnt", alias_name="cnt")))


def conversion_latency(events, *, user_col: str, ts_col: str, type_col: str,
                       first: str, then: str, out_col: str = "latency_s"):
    """Per-user conversion latency: seconds from the user's FIRST
    ``first``-type event to the first ``then``-type event at-or-after it
    (unwindowed — the time-to-convert distribution input). Rows: converting
    users only, (user, ``out_col`` float64 seconds).

    One narrow exchange, no join: events pre-filter map-side to the two
    types, hash-partition by user SHARD (a shard holds ALL of its users'
    rows, so the per-user reduction is globally correct), and each shard
    runs two ``np.minimum.at`` scatter-mins over factorized user codes —
    first-``first`` µs, then first-``then`` µs among rows at-or-after it.
    int64 µs throughout; the final divide-by-1e6 matches the SQL oracle's
    ``epoch_us`` arithmetic bit-exactly."""
    sent = np.iinfo(np.int64).max

    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        m = pc.is_in(b[type_col], value_set=pa.array([first, then]))
        t = b.filter(m)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: t[user_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_lead": pc.cast(pc.equal(t[type_col], pa.scalar(first)),
                             pa.int8()),
            "_shard": pa.array(_shard_of(t[user_col], 64))})

    def reduce_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({user_col: pa.array([], g[user_col].type),
                          out_col: pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        codes, uniq = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        lead = g["_lead"].to_numpy(zero_copy_only=False).astype(bool)
        nu = len(uniq)
        fc = np.full(nu, sent)
        np.minimum.at(fc, codes[lead], ts[lead])
        after = ~lead & (ts >= fc[codes])        # `then` rows at/after first
        fp = np.full(nu, sent)
        np.minimum.at(fp, codes[after], ts[after])
        keep = (fc < sent) & (fp < sent)
        if not keep.any():
            return empty
        lat = (fp[keep] - fc[keep]).astype(np.float64) / 1_000_000.0
        return pa.table({user_col: pa.array(uniq[keep], g[user_col].type),
                         out_col: pa.array(lat)})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(reduce_shard, batch_format="pyarrow"))


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
    per active week; a 64-way user-SHARD groupby (not per-user groups —
    Ray's per-group invocation cost × |users| would dominate at 10^8
    users) derives each user's cohort = min(week) via a scatter-min over
    factorized codes and emits per-shard (cohort, offset, count) partials;
    a tiny final groupby (cells ≤ weeks²) sums them."""
    from ray.data.aggregate import Sum

    def weeks(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        # integer division (epochs are positive, trunc == floor) — the same
        # `epoch_us(ts) // bucket` the SQL oracle computes
        w = pc.divide(pc.cast(ts, pa.int64()),
                      pa.scalar(int(bucket_us), pa.int64()))
        t = pa.table({user_col: b[user_col], "_w": w}).drop_null()
        t = t.group_by([user_col, "_w"]).aggregate([])
        return t.append_column("_shard", pa.array(_shard_of(t[user_col],
                                                            64)))

    def shard_cells(g: pa.Table) -> pa.Table:
        empty = pa.table({"cohort": pa.array([], pa.int64()),
                          "offset": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        w = g["_w"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (user, week): batch partials can repeat a pair across
        # batches — keep first occurrence in (code, week) sort order
        order = np.lexsort((w, codes))
        cs, ws = codes[order], w[order]
        first = np.r_[True, (cs[1:] != cs[:-1]) | (ws[1:] != ws[:-1])]
        cs, ws = cs[first], ws[first]
        cohort = np.full(codes.max() + 1, np.iinfo(np.int64).max)
        np.minimum.at(cohort, cs, ws)
        cells = np.stack([cohort[cs], ws - cohort[cs]], axis=1)
        uc, cnt = np.unique(cells, axis=0, return_counts=True)
        return pa.table({"cohort": pa.array(uc[:, 0]),
                         "offset": pa.array(uc[:, 1]),
                         "n": pa.array(cnt.astype(np.int64))})

    return (events.map_batches(weeks, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(shard_cells, batch_format="pyarrow")
            .groupby(["cohort", "offset"])
            .aggregate(Sum("n", alias_name="n_users")))


DAY_US = 24 * 3600 * 1_000_000


def dau_wau_stickiness(events, *, user_col: str, ts_col: str,
                       day_us: int = DAY_US, days_per_week: int = 7):
    """Weekly engagement stickiness: per integer epoch week, the
    distinct weekly actives (WAU), the sum of daily distinct actives
    (day_actives = Σ_days DAU), and stickiness = day_actives / 7 / WAU
    — the avg-DAU/WAU product-health ratio over the same integer
    epoch-µs buckets as :func:`cohort_retention`.

    Same one-exchange shape: per-batch DISTINCT (user, day) partials
    (a hot user ships ≤1 row per batch per active day), a 64-way
    user-shard groupby — each user lives in exactly ONE shard, so
    per-shard distinct counts sum to the global counts — and a
    |weeks|-row final aggregate."""
    from ray.data.aggregate import Sum

    def days(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        d = pc.divide(pc.cast(ts, pa.int64()),
                      pa.scalar(int(day_us), pa.int64()))
        t = pa.table({user_col: b[user_col], "_d": d}).drop_null()
        t = t.group_by([user_col, "_d"]).aggregate([])
        return t.append_column("_shard", pa.array(_shard_of(t[user_col],
                                                            64)))

    def shard_weeks(g: pa.Table) -> pa.Table:
        empty = pa.table({"week": pa.array([], pa.int64()),
                          "day_actives": pa.array([], pa.int64()),
                          "wau": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        d = g["_d"].to_numpy(zero_copy_only=False).astype(np.int64)
        # batch partials can repeat a (user, day) pair — global distinct here
        order = np.lexsort((d, codes))
        cs, ds_ = codes[order], d[order]
        first = np.r_[True, (cs[1:] != cs[:-1]) | (ds_[1:] != ds_[:-1])]
        cs, ds_ = cs[first], ds_[first]
        w = ds_ // days_per_week
        wk_da, da = np.unique(w, return_counts=True)
        uw = np.unique(np.stack([cs, w], axis=1), axis=0)
        wk_wa, wa = np.unique(uw[:, 1], return_counts=True)
        weeks_all = np.union1d(wk_da, wk_wa)
        da_full = np.zeros(len(weeks_all), dtype=np.int64)
        da_full[np.searchsorted(weeks_all, wk_da)] = da
        wa_full = np.zeros(len(weeks_all), dtype=np.int64)
        wa_full[np.searchsorted(weeks_all, wk_wa)] = wa
        return pa.table({"week": pa.array(weeks_all),
                         "day_actives": pa.array(da_full),
                         "wau": pa.array(wa_full)})

    agg = (events.map_batches(days, batch_format="pyarrow")
           .groupby("_shard")
           .map_groups(shard_weeks, batch_format="pyarrow")
           .groupby("week")
           .aggregate(Sum("day_actives", alias_name="day_actives"),
                      Sum("wau", alias_name="wau")))
    return agg.map_batches(
        lambda b: pa.table({
            "week": pc.cast(b["week"], pa.int64()),
            "wau": pc.cast(b["wau"], pa.int64()),
            "day_actives": pc.cast(b["day_actives"], pa.int64()),
            "stickiness": pa.array(np.round(
                np.asarray(b["day_actives"], dtype=np.float64)
                / float(days_per_week)
                / np.asarray(b["wau"], dtype=np.float64), 6)),
        }), batch_format="pyarrow")


def session_entry_exit(events, *, user_col: str, ts_col: str,
                       type_col: str, tiebreak_col: str,
                       gap: str = "30min"):
    """Session entry/exit path census: sessionize each user's events with a
    ``gap`` inactivity cutoff (a strictly-larger gap starts a new session —
    the :func:`windows.session_windows` convention), then count sessions by
    their (first event type, last event type) pair, events ordered by
    ``ts_col`` then ``tiebreak_col`` (SQL's ``PARTITION BY user ORDER BY
    ts, id`` total order). Returns a Dataset of (entry_type, exit_type, n)
    — at most |types|² rows; the landing/leaving-page census of web
    analytics.

    Distributed shape, one narrow exchange (the transition_counts
    skeleton): events project map-side to four columns, hash-partition by
    user SHARD (64 shards, never per-user groups); each shard lexsorts
    once, splits sessions with one vectorized gap comparison, picks the
    first/last row of each session via the break-flag cumsum, and reduces
    to per-shard (entry, exit, count) partials via one ``np.unique`` over
    packed int codes. The final groupby sums |shards| × |types|² rows."""
    from ray.data.aggregate import Sum

    gap_us = int(pd.Timedelta(gap).value // 1_000)

    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: b[user_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_tb": b[tiebreak_col],
            "_ty": b[type_col],
            "_shard": pa.array(_shard_of(b[user_col], 64))})

    def count_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({"entry_type": pa.array([], pa.string()),
                          "exit_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        tb = g["_tb"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g["_ty"].combine_chunks())
        ty = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        k = len(vocab)
        order = np.lexsort((tb, ts, codes))
        cs, tss, tys = codes[order], ts[order], ty[order]
        brk = np.ones(len(cs), dtype=bool)      # row 0 always starts one
        brk[1:] = (cs[1:] != cs[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        starts = np.flatnonzero(brk)            # first row of each session
        ends = np.empty_like(starts)            # last row of each session
        ends[:-1] = starts[1:] - 1
        ends[-1] = len(cs) - 1
        key = tys[starts] * k + tys[ends]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"entry_type": vocab.take(pa.array(uk // k)),
                         "exit_type": vocab.take(pa.array(uk % k)),
                         "n": pa.array(cnt.astype(np.int64))})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(count_shard, batch_format="pyarrow")
            .groupby(["entry_type", "exit_type"])
            .aggregate(Sum("n", alias_name="n")))


def session_conversion(events, *, user_col: str, ts_col: str,
                       type_col: str, tiebreak_col: str,
                       target_type: str, gap: str = "30min"):
    """Conversion rate by session ENTRY type: sessionize (``gap``
    inactivity cutoff, strictly-greater convention) and, for each entry
    event type, count sessions and sessions containing at least one
    ``target_type`` event — "which landing event leads to a purchase".
    Returns a Dataset (entry_type, n_sessions, n_converted, conv_rate 6dp);
    the rate divides exact int64 counts.

    Distributed shape = the :func:`session_entry_exit` skeleton (64-way
    user-shard exchange, one lexsort per shard); conversion is one
    ``np.logical_or.at`` scatter over session ids, and the final groupby
    sums |shards| × |types| partial rows."""
    from ray.data.aggregate import Sum

    gap_us = int(pd.Timedelta(gap).value // 1_000)

    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            user_col: b[user_col],
            "_ts": pc.cast(ts, pa.int64()),
            "_tb": b[tiebreak_col],
            "_ty": b[type_col],
            "_shard": pa.array(_shard_of(b[user_col], 64))})

    def count_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({"entry_type": pa.array([], pa.string()),
                          "n_sessions": pa.array([], pa.int64()),
                          "n_converted": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        codes, _ = pd.factorize(g[user_col].to_numpy(zero_copy_only=False))
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        tb = g["_tb"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g["_ty"].combine_chunks())
        ty = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        hit = pc.equal(g["_ty"], pa.scalar(target_type)) \
            .combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((tb, ts, codes))
        cs, tss = codes[order], ts[order]
        tys, hits = ty[order], hit[order]
        brk = np.ones(len(cs), dtype=bool)
        brk[1:] = (cs[1:] != cs[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        sid = np.cumsum(brk) - 1                # 0-based session ids
        n_sess = int(sid[-1]) + 1
        conv = np.zeros(n_sess, dtype=bool)
        np.logical_or.at(conv, sid, hits)
        entry = tys[np.flatnonzero(brk)]        # per-session entry code
        n = np.zeros(len(vocab), dtype=np.int64)
        nc = np.zeros(len(vocab), dtype=np.int64)
        np.add.at(n, entry, 1)
        np.add.at(nc, entry, conv.astype(np.int64))
        keep = n > 0
        idx = np.flatnonzero(keep)
        return pa.table({"entry_type": vocab.take(pa.array(idx)),
                         "n_sessions": pa.array(n[idx]),
                         "n_converted": pa.array(nc[idx])})

    agg = (events.map_batches(narrow, batch_format="pyarrow")
           .groupby("_shard")
           .map_groups(count_shard, batch_format="pyarrow")
           .groupby("entry_type")
           .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                      Sum("n_converted", alias_name="n_converted")))
    return agg.map_batches(
        lambda b: pa.table({
            "entry_type": b["entry_type"],
            "n_sessions": pc.cast(b["n_sessions"], pa.int64()),
            "n_converted": pc.cast(b["n_converted"], pa.int64()),
            "conv_rate": pa.array(np.round(
                np.asarray(b["n_converted"], dtype=np.float64)
                / np.asarray(b["n_sessions"], dtype=np.float64), 6))}),
        batch_format="pyarrow")


def km_survival(events, *, user_col: str, ts_col: str,
                censor_days: int = 7):
    """Kaplan–Meier user-lifetime curve WITH right-censoring: a user's
    lifetime is last-event − first-event (whole days); users still active
    within ``censor_days`` of the corpus's last timestamp are CENSORED
    (their death is unobserved — dropping them, as the naive survival
    curve does, biases lifetimes down). Returns one row per observed
    death time: (t_days, n_risk, n_events, surv 6dp) where surv is the
    product-limit estimator Π(1 − d/n) over death times ≤ t.

    Distributed shape: per-batch (user, min µs, max µs) partials → one
    groupby min/max (exchange bounded by users-per-batch); the corpus max
    comes from the same partials; per-user rows reduce AGAIN map-side to
    (duration, n, d) cells bounded by distinct durations, and the tiny
    census (≤ observation-window days) folds into the KM table on the
    driver. Every (1 − d/n) divides exact int64 counts and the ascending
    cumulative product is a left fold — matching SQL's windowed
    ``product()`` bit for bit."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    from ._collect import collect_up_to

    DAY = 86_400_000_000

    def narrow(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        t = pa.table({user_col: b[user_col],
                      "_us": pc.cast(ts, pa.int64())})
        agg = t.group_by(user_col).aggregate([("_us", "min"),
                                              ("_us", "max")])
        return pa.table({user_col: agg[user_col],
                         "first_us": agg["_us_min"],
                         "last_us": agg["_us_max"]})

    users = (events.map_batches(narrow, batch_format="pyarrow")
             .groupby(user_col)
             .aggregate(Min("first_us", alias_name="first_us"),
                        Max("last_us", alias_name="last_us"))
             .materialize())                    # reused: corpus max + cells
    mx_t = users.aggregate(Max("last_us"))
    empty = pd.DataFrame({"t_days": pd.Series([], dtype="int64"),
                          "n_risk": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "surv": pd.Series([], dtype="float64")})
    if not mx_t or mx_t.get("max(last_us)") is None:
        return empty
    corpus_max = int(mx_t["max(last_us)"])
    cutoff = corpus_max - censor_days * DAY

    def cells(b: pa.Table) -> pa.Table:
        first = b["first_us"].to_numpy(zero_copy_only=False)
        last = b["last_us"].to_numpy(zero_copy_only=False)
        t = (last - first) // DAY
        obs = (last <= cutoff).astype(np.int64)
        agg = (pa.table({"t_days": pa.array(t), "obs": pa.array(obs)})
               .group_by("t_days")
               .aggregate([("obs", "sum"), ([], "count_all")]))
        return pa.table({"t_days": agg["t_days"], "d": agg["obs_sum"],
                         "n": agg["count_all"]})

    parts, over = collect_up_to(
        users.map_batches(cells, batch_format="pyarrow"), 2_000_000)
    if over:
        raise RuntimeError("km_survival: duration census exceeded the "
                           "driver budget — bucket durations first")
    cen = (pa.concat_tables(parts).group_by("t_days")
           .aggregate([("d", "sum"), ("n", "sum")]).to_pandas()
           .sort_values("t_days"))
    n = cen["n_sum"].to_numpy(np.int64)
    d = cen["d_sum"].to_numpy(np.int64)
    # at-risk = everyone with duration >= t (censored count until their
    # censor time, the KM convention)
    n_risk = np.cumsum(n[::-1])[::-1]
    keep = d > 0                                # curve steps at death times
    factors = 1.0 - d[keep] / n_risk[keep].astype(np.float64)
    return pd.DataFrame({
        "t_days": cen["t_days"].to_numpy(np.int64)[keep],
        "n_risk": n_risk[keep],
        "n_events": d[keep],
        "surv": np.round(np.cumprod(factors), 6)})


def max_streak_histogram(events, *, user_col: str, ts_col: str):
    """Histogram of each user's LONGEST run of consecutive active days —
    the habit-strength census behind DAU stickiness. Returns a Dataset of
    (streak_days, n_users), exact integers.

    Distributed shape, one narrow exchange: batches project map-side to
    per-batch-DISTINCT (user, day-ordinal, shard) triples (the partial
    bounds the exchange at user-days-per-batch), hash-partition by user
    SHARD (64 shards — never per-user groups), and each shard lexsorts
    once, dedupes repeated user-days vectorially, run-lengths the
    consecutive-day segments, reduces to per-user max via
    ``np.maximum.at``, and emits a (streak, n_users) partial. The final
    groupby sums |shards| × |streak-lengths| rows — tiny at any scale.
    """
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def narrow(b: pa.Table) -> pa.Table:
        from .asof import _shard_of

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        # integer µs // DAY_US (ts >= epoch, so truncation == floor) —
        # float division could misplace exact-midnight boundaries
        t = pa.table({
            "u": b[user_col],
            "d": pc.divide(pc.cast(ts, pa.int64()),
                           pa.scalar(DAY_US, pa.int64()))}).drop_null()
        d = t.group_by(["u", "d"]).aggregate([])
        return d.append_column("_shard",
                               pa.array(_shard_of(d["u"], 64)))

    def scan_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({"streak_days": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        codes, _ = pd.factorize(g["u"].to_numpy(zero_copy_only=False))
        day = g["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((day, codes))
        c, d = codes[order], day[order]
        keep = np.r_[True, (c[1:] != c[:-1]) | (d[1:] != d[:-1])]
        c, d = c[keep], d[keep]          # global dedupe: a user is whole here
        brk = np.r_[True, (c[1:] != c[:-1]) | (d[1:] - d[:-1] != 1)]
        seg_id = np.cumsum(brk) - 1
        lens = np.bincount(seg_id)
        seg_user = c[np.flatnonzero(brk)]
        umax = np.zeros(int(c.max()) + 1, np.int64)
        np.maximum.at(umax, seg_user, lens)
        uk, cnt = np.unique(umax[umax > 0], return_counts=True)
        return pa.table({"streak_days": pa.array(uk),
                         "n_users": pa.array(cnt.astype(np.int64))})

    return (events.map_batches(narrow, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(scan_shard, batch_format="pyarrow")
            .groupby("streak_days")
            .aggregate(Sum("n_users", alias_name="n_users")))
