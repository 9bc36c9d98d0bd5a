"""Deterministic sampling for training-data curation.

Reservoir/random sampling is wrong for resumable 100-TB jobs: re-running a
failed partition must select the SAME rows. Both samplers here are pure
functions of the row id — map-only (no shuffle, no driver state), restart-safe,
and exactly reproducible in SQL for the oracle gate.

- ``hash_sample``: keep rows where a 32-bit multiplicative hash of the id
  lands under ``rate`` (Knuth's 2654435761 constant). Map-only.
- ``stratified_sample``: equalize strata (e.g. languages): pass 1 is a
  pre-aggregated count per stratum (tiny groupby — only per-batch (stratum,
  count) partials shuffle); the per-stratum keep-thresholds broadcast; pass 2
  is the same map-only hash filter with a per-row threshold lookup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = 2654435761  # golden-ratio multiplicative hashing constant
M32 = 1 << 32


def _hash32(ids: np.ndarray, seed: int) -> np.ndarray:
    """((id + seed) * KNUTH) mod 2^32 — matches the SQL expression
    ``((id + seed) * 2654435761) % 4294967296`` exactly for non-negative ids.
    The seed is mixed BEFORE the multiply: an additive post-multiply seed only
    rotates the keep-interval by seed/2^32 and barely changes the sample."""
    return ((ids.astype(np.uint64) + np.uint64(seed))
            * np.uint64(KNUTH)) % np.uint64(M32)


def threshold_for(rate: float) -> int:
    """Integer keep-threshold: float64 multiply + truncation, the same
    operation DuckDB's CAST(x * 4294967296 AS BIGINT) performs."""
    return int(min(max(rate, 0.0), 1.0) * M32)


def hash_sample(ds, id_col: str, rate: float, *, seed: int = 0):
    """Keep ~``rate`` of rows, deterministically by id. Map-only."""
    thr = threshold_for(rate)

    def pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(_hash32(ids, seed) < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def hash_split(ds, id_col: str, fractions: dict[str, float], *,
               seed: int = 0, out_col: str = "split"):
    """Deterministic train/val/test assignment: the hash's position in [0, 1)
    picks the split by cumulative fraction. Map-only, restart-safe, and every
    row lands in exactly one split (fractions must sum to 1.0)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    names = list(fractions)
    # exact cumulative fractions (Fraction, not float cumsum): 0.9 + 0.05
    # float-accumulates to 0.9500000000000001, which could truncate to a
    # different integer threshold than threshold_for(0.95) computed directly
    # — the oracle SQL inlines the direct form, so both sides must agree
    from fractions import Fraction

    acc = Fraction(0)
    cum = []
    for n in names:
        acc += Fraction(fractions[n]).limit_denominator(10 ** 9)
        cum.append(float(acc))
    bounds = np.array([threshold_for(c) for c in cum[:-1]] + [M32],
                      np.uint64)

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        h = _hash32(ids, seed)
        idx = np.searchsorted(bounds, h, side="right")
        return b.append_column(
            out_col, pa.array([names[i] for i in idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def cap_per_group(ds, *, group_col: str, id_col: str, n: int,
                  seed: int = 0, n_shards: int = 32):
    """Deterministic per-group contribution cap: keep at most ``n`` rows per
    group, chosen as the ``n`` smallest ``_hash32(id)`` values (a fixed
    uniform sample of each group, stable across reruns and re-sharding —
    the standard guard against one source dominating a training mix).

    Composition: map-only hash column + ``grouped_topk`` (per-batch top-n
    partials bound any group's shuffle rows at n × num_batches; a hot source
    never concentrates more than that). Equivalent SQL:
    ``QUALIFY ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    ((id + seed) * 2654435761) % 4294967296, id) <= n``."""
    from .windows import grouped_topk

    def add_key(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        h = _hash32(ids, seed)
        # grouped_topk picks DESCENDING; flip so smallest hash wins
        neg = (np.uint64(M32 - 1) - h).astype(np.int64)
        return b.append_column("_caph", pa.array(neg, pa.int64()))

    capped = grouped_topk(ds.map_batches(add_key, batch_format="pyarrow"),
                          key=group_col, order_col="_caph", k=n,
                          tie_col=id_col, n_shards=n_shards)
    return capped.map_batches(lambda b: b.drop_columns(["_caph"]),
                              batch_format="pyarrow")


def stratum_counts(ds, strata_col: str):
    """Tiny distributed count per stratum (pre-agg partials only)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        agg = (b.select([strata_col]).drop_null().group_by(strata_col)
               .aggregate([([], "count_all")]))
        return pa.table({strata_col: agg[strata_col],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(8).groupby(strata_col)
              .aggregate(Sum("cnt", alias_name="cnt")))
    out: dict = {}
    for b in totals.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        out.update(zip(b[strata_col].to_pylist(), b["cnt"].to_pylist()))
    return out


def stratified_sample(ds, id_col: str, strata_col: str, *, target_per_stratum: int,
                      seed: int = 0):
    """Downsample every stratum toward ``target_per_stratum`` rows
    (deterministic expectation, not exact count): stratum s keeps rows at rate
    min(1, target/count_s). Two passes: tiny count groupby, then a map-only
    hash filter with the per-stratum thresholds broadcast via ``ray.put``."""
    import ray

    counts = stratum_counts(ds, strata_col)
    thresholds = {s: threshold_for(min(1.0, target_per_stratum / c))
                  for s, c in counts.items()}
    ref = ray.put(thresholds)

    def pick(b: pa.Table) -> pa.Table:
        thr_map = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        strata = b[strata_col].to_pylist()
        thr = np.fromiter((thr_map.get(s, 0) for s in strata), np.uint64,
                          len(strata))
        return b.filter(pa.array(_hash32(ids, seed) < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def global_enumerate(ds, sort_cols=None, *, out_col: str = "pos"):
    """Assign every row its GLOBAL 0-based position (after an optional
    distributed sort) — Ray Data has no zipWithIndex, so this drops to raw
    Ray tasks for exactly the part the Dataset API cannot express: blocks
    stay in the object store, one tiny remote task per block appends the
    position column from the block's cumulative offset; only the per-block
    row COUNTS touch the driver. ``sort_cols`` must be a total order (add a
    unique tiebreak column) for deterministic output."""
    import ray
    import ray.data as rd

    mat = (ds.sort(sort_cols) if sort_cols else ds).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def add_pos(t: pa.Table, offset: int) -> pa.Table:
        return t.append_column(out_col, pa.array(
            np.arange(offset, offset + t.num_rows, dtype=np.int64)))

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    return rd.from_arrow_refs(
        [add_pos.remote(r, int(o)) for r, o in zip(refs, offsets)])


def shuffle_deterministic(ds, id_col: str, *, seed: int = 0,
                          out_col: str = "pos"):
    """Deterministic global corpus shuffle for training: rows ordered by the
    seeded multiplicative hash of the id (ties broken by id), each assigned
    its global shuffle position. Restart-safe — a pure function of the id
    set, independent of blocking; reproducible in SQL as ROW_NUMBER() OVER
    (ORDER BY ((id + seed) * 2654435761) % 4294967296, id) - 1."""
    def add_hash(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.append_column("_shuffle_key",
                               pa.array(_hash32(ids, seed).astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = global_enumerate(hashed, ["_shuffle_key", id_col], out_col=out_col)
    return out.drop_columns(["_shuffle_key"])


def weighted_sample_topk(ds, id_col: str, weight_col: str, k: int, *,
                         seed: int = 0):
    """Deterministic weighted sample without replacement (Efraimidis &
    Spirakis 2006, public algorithm): row i gets key u_i^(1/w_i) with
    u_i = (hash32(id) + 0.5) / 2^32, and the k largest keys win — each row's
    inclusion probability is proportional to its weight, yet the selection
    is a pure function of (id, weight, seed): map-only, restart-safe, and
    reproducible in SQL (``ORDER BY pow(u, 1.0/w) DESC, id LIMIT k``).

    Distributed shape: per-batch local top-k (argpartition) bounds the
    exchange at k rows per batch; the global sort+limit runs over that tiny
    partial stream, never the full input. Weights must be > 0."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("_wkey", pa.array([], pa.float64()))
        ids = b[id_col].to_numpy(zero_copy_only=False)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if (w <= 0).any():
            raise ValueError(f"{weight_col} must be strictly positive")
        u = (_hash32(ids, seed).astype(np.float64) + 0.5) / M32
        key = np.power(u, 1.0 / w)
        if len(key) > k:
            top = np.argpartition(key, len(key) - k)[len(key) - k:]
            b = b.take(pa.array(np.sort(top)))
            key = key[np.sort(top)]
        return b.append_column("_wkey", pa.array(key, pa.float64()))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = (parts.sort(key=["_wkey", id_col], descending=[True, False])
           .limit(k))
    return out.drop_columns(["_wkey"])


def budget_mix(ds, *, id_col: str, group_col: str, weight_col: str,
               budgets: dict | None = None, default_budget: int | None = None,
               seed: int = 0):
    """Training-mix sampling under per-source token budgets: keep a
    deterministic hash-sample of each source sized so its EXPECTED kept
    weight (tokens/chars) matches the source's budget — the "mix web at 2×
    books" curation step, restart-safe like every sampler here.

    Pass 1 is a tiny pre-aggregated per-source weight census (per-batch
    (source, Σweight) partials, |sources| rows out); keep-thresholds are
    EXACT integers ``min(2^32, (budget << 32) // total)`` — integer
    arithmetic on both engine and SQL sides, so no float-rounding drift can
    desync the oracle (the hash_split lesson). Pass 2 is the map-only hash
    filter; oversubscribed budgets (≥ total) keep the whole source."""
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    budgets = budgets or {}

    def part(b: pa.Table) -> pa.Table:
        t = b.select([group_col, weight_col]).drop_null()
        agg = t.group_by(group_col).aggregate([(weight_col, "sum")])
        return pa.table({group_col: agg[group_col],
                         "s": pc.cast(agg[f"{weight_col}_sum"], pa.int64())})

    totals = (ds.map_batches(part, batch_format="pyarrow")
              .groupby(group_col).aggregate(Sum("s", alias_name="s")))
    thr = {}
    for r in totals.take_all():                   # |sources| rows — tiny
        bgt = budgets.get(r[group_col], default_budget)
        if bgt is None:
            raise ValueError(
                f"budget_mix: no budget for source {r[group_col]!r} and no "
                "default_budget")
        thr[r[group_col]] = min(M32, (int(bgt) << 32) // max(int(r["s"]), 1))
    ref = ray.put(thr)

    def pick(b: pa.Table) -> pa.Table:
        t = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            b[group_col].to_numpy(zero_copy_only=False))
        # null-source rows (factorize code −1) drop, matching the oracle's
        # JOIN USING(source); tv[-1] would apply the last source's threshold
        keep = np.zeros(len(codes), bool)
        valid = codes >= 0
        if len(uniq) and valid.any():
            tv = np.array([t.get(u, 0) for u in uniq], np.uint64)
            keep[valid] = _hash32(ids[valid], seed) < tv[codes[valid]]
        return b.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


def assign_range_partitions(ds, col: str, n_parts: int, *,
                            out_col: str = "part_id"):
    """EXACT range-partition assignment — the planning half of a global
    sort / range-sharded export: boundaries are the bit-exact
    ``quantile_disc`` values at i/n_parts (i = 1..n_parts-1, via
    :func:`stats.exact_quantiles`), and a row's partition id is the count
    of boundaries STRICTLY below its value (boundary ties land left, SQL
    ``count(*) where b < v`` semantics; NULL values get partition 0 —
    ``b < NULL`` is never true). Map-only after the quantile pre-pass:
    write each part to its own directory and the output is globally
    range-ordered and resumable without ever running a full-table sort.
    Skew note: quantile boundaries equalize ROW COUNTS per part by
    construction — a hot single value spanning multiple quantiles
    collapses its boundaries and lands in one part (ties-left keeps the
    assignment deterministic)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from .stats import exact_quantiles

    qs = [i / n_parts for i in range(1, n_parts)]
    qt = exact_quantiles(ds, col, qs)
    bounds = np.sort(qt["value"].to_numpy(zero_copy_only=False)
                     .astype(np.float64))
    ref = ray.put(bounds)

    def assign(b: pa.Table) -> pa.Table:
        import ray as _ray

        bd = _ray.get(ref)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        pid = np.searchsorted(bd, v, side="left")
        pid[np.isnan(v)] = 0
        return b.append_column(out_col, pa.array(pid.astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow")


def balanced_resample(ds, label_col: str, *, factor_cap: int = 8,
                      labels_max: int = 1_000_000):
    """Deterministic class-balanced oversampling: each row repeats
    ``min(factor_cap, floor(max_class_count / class_count))`` times
    (≥1), appending a 1-based ``rep`` index — the reproducible
    "duplicate the minority classes to parity" pass a training-prep
    pipeline runs before shuffling (downstream dedup-by-(id, rep) or
    epoch-level shuffling treats each repetition as a distinct sample).

    Movement: a (label, count) census (per-batch partials, loud
    ``labels_max`` budget) broadcasts the factor map once; the explode is
    MAP-ONLY (np.repeat + vectorized per-row rep indices) and output
    volume is bounded by ``factor_cap`` × input."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def census(b: pa.Table) -> pa.Table:
        t = b.select([label_col]).drop_null()
        agg = t.group_by(label_col).aggregate([([], "count_all")])
        return pa.table({label_col: agg[label_col],
                         "n": pc.cast(agg["count_all"], pa.int64())})

    counts = (ds.map_batches(census, batch_format="pyarrow")
              .groupby(label_col).aggregate(Sum("n", alias_name="n")))
    parts, over = collect_up_to(counts, labels_max)
    if over:
        raise ValueError(f"balanced_resample: label cardinality exceeds "
                         f"labels_max={labels_max}")
    if not parts:
        return ds.map_batches(
            lambda b: b.append_column("rep", pa.array(
                np.ones(b.num_rows, np.int64))).filter(
                pa.array(np.zeros(b.num_rows, bool))),
            batch_format="pyarrow")
    ct = pa.concat_tables(parts)
    labs = ct[label_col].to_numpy(zero_copy_only=False)
    ns = ct["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    mx = ns.max()
    fct = np.minimum(factor_cap, np.floor(mx / ns)).astype(np.int64)
    fct = np.maximum(fct, 1)
    order = np.argsort(labs, kind="stable")
    ref = ray.put((labs[order], fct[order]))

    def explode(b: pa.Table) -> pa.Table:
        import ray as _ray

        ls, fs = _ray.get(ref)
        t = b.filter(pc.is_valid(b[label_col]))
        if t.num_rows == 0:
            return t.append_column("rep", pa.array([], pa.int64()))
        lv = t[label_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ls, lv)
        idx[idx == len(ls)] = 0
        reps = np.where(ls[idx] == lv, fs[idx], 1).astype(np.int64)
        take = np.repeat(np.arange(t.num_rows), reps)
        total = int(reps.sum())
        rep_no = (np.arange(total)
                  - np.repeat(np.cumsum(reps) - reps, reps) + 1)
        return t.take(pa.array(take)).append_column(
            "rep", pa.array(rep_no.astype(np.int64)))

    return ds.map_batches(explode, batch_format="pyarrow")


def systematic_sample(ds, key_col: str, *, k: int, offset: int = 1):
    """Systematic (every-k-th) sample by GLOBAL position over ``key_col``
    order: keep the rows whose 1-based row number ≡ ``offset`` (mod k) —
    the survey-sampling design that guarantees perfectly even coverage of
    the key range (hash sampling guarantees only expectation). Requires a
    unique key (rank == row_number then); returns keep-all-columns + pos.

    Distributed shape: the calibrated-value-bucket :func:`global_rank`
    chain assigns positions (one narrow exchange, carry-in summaries),
    then a map-only modulo filter."""
    from .analytics import global_rank

    in_cols = list(ds.schema().names)
    ranked = global_rank(ds, order_col=key_col)

    def pick(b: pa.Table) -> pa.Table:
        pos = pc.cast(b["rank"], pa.int64()).to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(pos % k == (offset % k)))
        return pa.table({**{c: t[c] for c in in_cols},
                         "pos": pc.cast(t["rank"], pa.int64())})

    return ranked.map_batches(pick, batch_format="pyarrow")
