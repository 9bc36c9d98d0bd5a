"""Distribution-drift checks: KS statistic on t-digest CDFs (numeric columns),
PSI on categorical value distributions and fixed-bin histograms (intensity).

North-rule functionality with no reference analogue (SURVEY §2.7). A *reference
profile* is built once from a trusted split (or an earlier run) and stored as JSON
-able dict; each validation run builds the same profile from the new data (via the
pre-aggregated sketch stage in stats.py) and compares:

- numeric: KS = max |cdf_ref(x) - cdf_new(x)| evaluated on the union of centroid
  locations; fail at ks > threshold (default 0.15);
- categorical / histogram: PSI = sum((p-q) * ln(p/q)) over categories/bins with
  epsilon smoothing; fail at psi > threshold (default 0.25, the classic industry
  cutoff).
"""

from __future__ import annotations

import numpy as np

from ..functions.sketches import TDigest
from .stats import ColumnProfile

KS_THRESHOLD = 0.15
PSI_THRESHOLD = 0.25
_EPS = 1e-6


def ks_statistic(ref: TDigest, new: TDigest) -> float:
    if ref.n == 0 or new.n == 0:
        return 0.0
    xs = np.unique(np.concatenate([ref.means, new.means]))
    return float(np.max(np.abs(ref.cdf(xs) - new.cdf(xs))))


def psi(p_counts: dict, q_counts: dict) -> float:
    keys = sorted(set(p_counts) | set(q_counts), key=str)
    p = np.array([max(p_counts.get(k, 0), 0) for k in keys], np.float64)
    q = np.array([max(q_counts.get(k, 0), 0) for k in keys], np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0
    p = np.maximum(p / p.sum(), _EPS)
    q = np.maximum(q / q.sum(), _EPS)
    return float(np.sum((p - q) * np.log(p / q)))


def psi_hist(p_hist: np.ndarray, q_hist: np.ndarray) -> float:
    p = np.asarray(p_hist, np.float64)
    q = np.asarray(q_hist, np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0
    p = np.maximum(p / p.sum(), _EPS)
    q = np.maximum(q / q.sum(), _EPS)
    return float(np.sum((p - q) * np.log(p / q)))


def compare_profiles(ref: dict[str, ColumnProfile], new: dict[str, ColumnProfile],
                     *, ks_threshold: float = KS_THRESHOLD,
                     psi_threshold: float = PSI_THRESHOLD) -> list[dict]:
    """Per-column drift verdicts: [{column, metric, value, threshold, ok}]."""
    out = []
    for name, rp in ref.items():
        np_ = new.get(name)
        if np_ is None:
            continue
        if isinstance(rp, np.ndarray):  # fixed-bin histogram (e.g. __intensity__)
            v = psi_hist(rp, np.asarray(np_))
            out.append({"column": name, "metric": "psi", "value": v,
                        "threshold": psi_threshold, "ok": v <= psi_threshold})
            continue
        if rp.tdigest is not None and np_.tdigest is not None:
            ks = ks_statistic(rp.tdigest, np_.tdigest)
            out.append({"column": name, "metric": "ks", "value": ks,
                        "threshold": ks_threshold, "ok": ks <= ks_threshold})
        if rp.cms is not None and np_.cms is not None:
            v = psi(dict(rp.cms.top(32)), dict(np_.cms.top(32)))
            out.append({"column": name, "metric": "psi", "value": v,
                        "threshold": psi_threshold, "ok": v <= psi_threshold})
    return out


def merge_histograms(hist_batches) -> np.ndarray:
    """Sum fixed-bin histogram partials (e.g. the decode stage's per-image
    intensity histograms) into one global histogram."""
    total = None
    for h in hist_batches:
        a = np.asarray(h, np.int64)
        a = a.sum(axis=0) if a.ndim == 2 else a
        total = a if total is None else total + a
    return total if total is not None else np.zeros(0, np.int64)


def value_emd(ds, *, value_col: str, group_col: str, a, b,
              bucket_width="auto"):
    """EXACT 1-D Wasserstein-1 distance (earth-mover distance, EMD) between
    the empirical distributions of ``value_col`` for groups ``a`` and ``b``
    — the drift metric that, unlike KS, weighs HOW FAR mass moved, not just
    the worst CDF gap: EMD = ∫ |F_a(x) − F_b(x)| dx.

    Distributed shape (no global sort, no driver value collect): rows
    reduce to DISTINCT-value (v, count_a, count_b) cells (per-batch partial
    + one groupby-sum); cells hash-partition by auto-calibrated VALUE
    BUCKET (the rank_window pattern — ~256 range partitions, ties always
    local); per-bucket summaries (Σa, Σb, min/max v) prefix-sum on the
    driver into carry-in cumulative counts + the previous bucket's max
    value; a second per-bucket pass integrates its |F_a − F_b| segments
    locally. The |buckets| partial integrals sum in bucket order. The SQL
    oracle spells the identical left-point Riemann sum with window
    functions; 6dp rounding absorbs summation-order ulps.

    Returns a 1-row pandas DataFrame (emd, n_a, n_b) — empty if either
    group has no non-null values."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from ._calibrate import resolve_bucket_width
    from .analytics import _bucket_of_col

    empty = pd.DataFrame({"emd": pd.Series([], dtype="float64"),
                          "n_a": pd.Series([], dtype="int64"),
                          "n_b": pd.Series([], dtype="int64")})

    def narrow(batch):
        import pyarrow as pa

        m = pc.is_in(batch[group_col], value_set=pa.array([a, b]))
        t = batch.filter(m)
        t = t.filter(pc.is_valid(t[value_col]))
        ca = pc.cast(pc.equal(t[group_col], pa.scalar(a)), pa.int64())
        cb = pc.cast(pc.equal(t[group_col], pa.scalar(b)), pa.int64())
        per = pa.table({"v": pc.cast(t[value_col], pa.float64()),
                        "ca": ca, "cb": cb})
        agg = per.group_by("v").aggregate([("ca", "sum"), ("cb", "sum")])
        return pa.table({"v": agg["v"], "ca": agg["ca_sum"],
                         "cb": agg["cb_sum"]})

    cells = (ds.map_batches(narrow, batch_format="pyarrow")
             .groupby("v")
             .aggregate(Sum("ca", alias_name="ca"),
                        Sum("cb", alias_name="cb")))
    width = resolve_bucket_width(cells, "v", bucket_width,
                                 target_buckets=256)

    def bucketize(batch):
        import pyarrow as pa

        return batch.append_column(
            "_bkt", pa.array(_bucket_of_col(batch["v"], width), pa.int64()))

    tagged = cells.map_batches(bucketize, batch_format="pyarrow") \
                  .materialize()
    s = (tagged.groupby("_bkt")
         .aggregate(Sum("ca", alias_name="sa"), Sum("cb", alias_name="sb"),
                    Min("v", alias_name="vmin"), Max("v", alias_name="vmax"))
         .to_pandas())
    if not len(s):
        return empty
    s = s.sort_values("_bkt").reset_index(drop=True)
    na, nb = int(s["sa"].sum()), int(s["sb"].sum())
    if na == 0 or nb == 0:
        return empty
    cum_a = np.r_[0, np.cumsum(s["sa"].to_numpy())[:-1]]
    cum_b = np.r_[0, np.cumsum(s["sb"].to_numpy())[:-1]]
    prev_x = np.r_[np.nan, s["vmax"].to_numpy(np.float64)[:-1]]
    carry = {int(k): (int(ca0), int(cb0), float(px))
             for k, ca0, cb0, px in zip(s["_bkt"], cum_a, cum_b, prev_x)}
    ref = ray.put((carry, float(na), float(nb)))

    def integrate(g):
        import pyarrow as pa

        out_empty = pa.table({"_bkt": pa.array([], pa.int64()),
                              "part": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return out_empty
        c, fa_n, fb_n = ray.get(ref)
        bkt = int(g["_bkt"][0].as_py())
        ca0, cb0, px = c[bkt]
        t = g.take(pc.sort_indices(g, sort_keys=[("v", "ascending")]))
        v = t["v"].to_numpy(zero_copy_only=False)
        fa = (ca0 + np.cumsum(t["ca"].to_numpy(zero_copy_only=False))) / fa_n
        fb = (cb0 + np.cumsum(t["cb"].to_numpy(zero_copy_only=False))) / fb_n
        part = float(np.sum(np.diff(v) * np.abs(fa[:-1] - fb[:-1])))
        if not np.isnan(px):            # segment reaching back to the
            part += (v[0] - px) * abs(ca0 / fa_n - cb0 / fb_n)  # prev bucket
        return pa.table({"_bkt": pa.array([bkt], pa.int64()),
                         "part": pa.array([part], pa.float64())})

    parts = (tagged.groupby("_bkt")
             .map_groups(integrate, batch_format="pyarrow").to_pandas())
    parts = parts.sort_values("_bkt")   # deterministic summation order
    return pd.DataFrame({"emd": [float(np.round(parts["part"].sum(), 6))],
                         "n_a": pd.array([na], dtype="int64"),
                         "n_b": pd.array([nb], dtype="int64")})


def daily_categorical_psi(ds, *, ts_col: str, cat_col: str):
    """Daily drift monitor: PSI of each day's categorical distribution of
    ``cat_col`` against the FIRST observed day (the reference slice) — the
    production "is today's event mix still shaped like launch day" alarm,
    the per-period generalization of the split-half ``lang_drift_psi``
    check. Same convention as :func:`psi`: probabilities over the global
    category alphabet, clamped at 1e-6 so zero-count categories contribute
    finite terms.

    Distributed shape: rows reduce map-side to per-batch (day, category)
    count partials (bounded by days x |alphabet| per batch, never event
    rows); one groupby-sum merges them; the resulting census is tiny
    (days x categories) so the PSI table computes vectorized on the
    driver. Returns a pandas DataFrame (day str 'YYYY-MM-DD', psi double
    6dp, drift_ok bool vs PSI_THRESHOLD), reference day included (psi 0).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def narrow(b: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(
            pc.cast(b[ts_col], pa.timestamp("us")), unit="day"),
            format="%Y-%m-%d")
        agg = (pa.table({"day": day, "cat": b[cat_col]})
               .group_by(["day", "cat"]).aggregate([([], "count_all")]))
        return pa.table({"day": agg["day"], "cat": agg["cat"],
                         "n": agg["count_all"]})

    parts, over = collect_up_to(
        ds.map_batches(narrow, batch_format="pyarrow"), 2_000_000)
    if not over:
        census = (pa.concat_tables(parts).group_by(["day", "cat"])
                  .aggregate([("n", "sum")]).rename_columns(
                      ["day", "cat", "n"]).to_pandas())
    else:
        census = (ds.map_batches(narrow, batch_format="pyarrow")
                  .groupby(["day", "cat"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    if census.empty:
        return pd.DataFrame({"day": pd.Series([], dtype="object"),
                             "psi": pd.Series([], dtype="float64"),
                             "drift_ok": pd.Series([], dtype="bool")})
    # pivot to days x global alphabet; absent cells are zero counts
    grid = (census.pivot_table(index="day", columns="cat", values="n",
                               aggfunc="sum", fill_value=0)
            .sort_index().sort_index(axis=1))
    counts = grid.to_numpy(np.float64)
    p = np.maximum(counts / counts.sum(axis=1, keepdims=True), _EPS)
    q = p[0]                                    # first observed day
    vals = np.round(np.sum((p - q) * np.log(p / q), axis=1), 6)
    return pd.DataFrame({"day": list(grid.index), "psi": vals,
                         "drift_ok": vals <= PSI_THRESHOLD})


def value_ks(ds, *, value_col: str, group_col: str, a, b,
             bucket_width="auto"):
    """EXACT two-sample Kolmogorov–Smirnov statistic between the empirical
    distributions of ``value_col`` for groups ``a`` and ``b``:
    KS = max_v |F_a(v) − F_b(v)| evaluated at every distinct value — the
    exactness companion of the t-digest KS in :func:`compare_profiles`,
    and the worst-gap complement of :func:`value_emd` (which integrates
    the same CDF difference instead of maxing it).

    Same distributed shape as value_emd: rows reduce to distinct-value
    (v, count_a, count_b) cells; cells hash-partition by calibrated VALUE
    BUCKET; per-bucket carry-in cumulative counts come from the bucket
    summaries; each bucket maxes its own |F_a − F_b| locally and the
    ≤ |buckets| partial maxima fold on the driver. Every CDF value divides
    exact int64 cumulative counts, so engine and SQL operate on identical
    doubles. Returns a 1-row pandas DataFrame (ks 6dp, n_a, n_b)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from ._calibrate import resolve_bucket_width
    from .analytics import _bucket_of_col

    empty = pd.DataFrame({"ks": pd.Series([], dtype="float64"),
                          "n_a": pd.Series([], dtype="int64"),
                          "n_b": pd.Series([], dtype="int64")})

    def narrow(batch):
        import pyarrow as pa

        m = pc.is_in(batch[group_col], value_set=pa.array([a, b]))
        t = batch.filter(m)
        t = t.filter(pc.is_valid(t[value_col]))
        ca = pc.cast(pc.equal(t[group_col], pa.scalar(a)), pa.int64())
        cb = pc.cast(pc.equal(t[group_col], pa.scalar(b)), pa.int64())
        per = pa.table({"v": pc.cast(t[value_col], pa.float64()),
                        "ca": ca, "cb": cb})
        agg = per.group_by("v").aggregate([("ca", "sum"), ("cb", "sum")])
        return pa.table({"v": agg["v"], "ca": agg["ca_sum"],
                         "cb": agg["cb_sum"]})

    cells = (ds.map_batches(narrow, batch_format="pyarrow")
             .groupby("v")
             .aggregate(Sum("ca", alias_name="ca"),
                        Sum("cb", alias_name="cb")))
    width = resolve_bucket_width(cells, "v", bucket_width,
                                 target_buckets=256)

    def bucketize(batch):
        import pyarrow as pa

        return batch.append_column(
            "_bkt", pa.array(_bucket_of_col(batch["v"], width), pa.int64()))

    tagged = cells.map_batches(bucketize, batch_format="pyarrow") \
                  .materialize()
    s = (tagged.groupby("_bkt")
         .aggregate(Sum("ca", alias_name="sa"), Sum("cb", alias_name="sb"))
         .to_pandas())
    if not len(s):
        return empty
    s = s.sort_values("_bkt").reset_index(drop=True)
    na, nb = int(s["sa"].sum()), int(s["sb"].sum())
    if na == 0 or nb == 0:
        return empty
    cum_a = np.r_[0, np.cumsum(s["sa"].to_numpy())[:-1]]
    cum_b = np.r_[0, np.cumsum(s["sb"].to_numpy())[:-1]]
    carry = {int(k): (int(ca0), int(cb0))
             for k, ca0, cb0 in zip(s["_bkt"], cum_a, cum_b)}
    ref = ray.put((carry, float(na), float(nb)))

    def bucket_max(g):
        import pyarrow as pa

        out_empty = pa.table({"_bkt": pa.array([], pa.int64()),
                              "part": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return out_empty
        c, fa_n, fb_n = ray.get(ref)
        bkt = int(g["_bkt"][0].as_py())
        ca0, cb0 = c[bkt]
        t = g.take(pc.sort_indices(g, sort_keys=[("v", "ascending")]))
        fa = (ca0 + np.cumsum(t["ca"].to_numpy(zero_copy_only=False))) / fa_n
        fb = (cb0 + np.cumsum(t["cb"].to_numpy(zero_copy_only=False))) / fb_n
        part = float(np.max(np.abs(fa - fb)))
        return pa.table({"_bkt": pa.array([bkt], pa.int64()),
                         "part": pa.array([part], pa.float64())})

    parts = (tagged.groupby("_bkt")
             .map_groups(bucket_max, batch_format="pyarrow").to_pandas())
    return pd.DataFrame({"ks": [float(np.round(parts["part"].max(), 6))],
                         "n_a": pd.array([na], dtype="int64"),
                         "n_b": pd.array([nb], dtype="int64")})
