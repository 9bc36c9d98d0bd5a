"""Bucket-width auto-calibration (stages/_calibrate): width tracks the
OBSERVED order-column density, so a 100×-denser stream gets a 100×-finer
bucket grid instead of the 12× wall-time cliff BASELINE.md documents for a
mis-sized constant width. Pinned here:

- the width is span/target for uniform data, numeric and temporal;
- a single extreme outlier does not stretch the grid (quantile span, not
  min/max);
- rank_window / rows_moving_sum with the "auto" default match the exact
  per-key oracle on BOTH a normal and a 100×-compressed stream, and the
  calibrated bucket count stays near target on both (the structural
  no-cliff property — group count is density-invariant).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from schema_validator_ray.stages._calibrate import calibrate_bucket_width


def _events(n=6000, span_s=10**6, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 50, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, span_s, n), unit="s"),
        "value": rng.normal(size=n).round(3),
    })


def test_width_tracks_span_numeric(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    v = rng.uniform(0, 1000, 20000)
    w = calibrate_bucket_width(
        rd.from_arrow(pa.table({"x": v})).repartition(8), "x",
        target_buckets=64)
    span = np.quantile(v, 0.99) - np.quantile(v, 0.01)
    assert span / 64 * 0.5 < w < span / 64 * 2

    # one extreme outlier must not stretch the grid (p99-p01, not max-min)
    v2 = np.r_[v, 1e12]
    w2 = calibrate_bucket_width(
        rd.from_arrow(pa.table({"x": v2})).repartition(8), "x",
        target_buckets=64)
    assert w2 < w * 3


def test_width_temporal_and_empty(ray_session):
    import ray.data as rd

    df = _events(4000, span_s=30 * 86400)
    w = calibrate_bucket_width(rd.from_pandas(df).repartition(4), "ts")
    assert isinstance(w, pd.Timedelta)
    assert pd.Timedelta("4h") < w < pd.Timedelta("30h")   # ~30d/64

    empty = rd.from_pandas(df.iloc[:0])
    assert calibrate_bucket_width(empty, "ts") == pd.Timedelta(1)
    one = rd.from_arrow(pa.table({"x": [5.0] * 100}))
    assert calibrate_bucket_width(one, "x") == 1.0        # constant column


def _exact_rank_oracle(df):
    g = df.sort_values(["user_id", "value"], kind="stable")
    r = g.groupby("user_id")["value"].rank(method="min").astype(np.int64)
    return dict(zip(g["event_id"], r))


def test_rank_window_auto_no_cliff_on_100x_density(ray_session):
    """Same rows, order values compressed 100× — auto width must follow the
    density (bucket count stays ~target) and results stay exact."""
    import ray.data as rd

    from schema_validator_ray.stages.analytics import rank_window

    rng = np.random.default_rng(7)
    base = pd.DataFrame({
        "event_id": np.arange(8000, dtype=np.int64),
        "user_id": rng.integers(0, 40, 8000).astype(np.int64),
        "value": rng.uniform(0, 200_000, 8000).round(2),
    })
    for dens in (1.0, 100.0):
        df = base.assign(value=(base["value"] / dens).round(4))
        ds = rd.from_pandas(df).repartition(8)
        w = calibrate_bucket_width(ds, "value", target_buckets=64)
        span = (df["value"].quantile(0.99) - df["value"].quantile(0.01))
        n_buckets = span / w
        assert 20 < n_buckets < 200, (dens, n_buckets)    # density-invariant
        out = rank_window(ds, key="user_id", order_col="value").to_pandas()
        want = _exact_rank_oracle(df)
        got = dict(zip(out["event_id"], out["rank"]))
        assert got == want, f"density {dens}"


def test_rows_moving_sum_auto_dense_stream(ray_session):
    """100×-compressed timestamps: auto-width rows_moving_sum still matches
    the pandas rolling oracle."""
    import ray.data as rd

    from schema_validator_ray.stages.analytics import rows_moving_sum

    df = _events(5000, span_s=10**6 // 100, seed=11)
    out = (rows_moving_sum(rd.from_pandas(df).repartition(8),
                           key="user_id", order_col="ts", value="value",
                           tiebreak="event_id", k=3)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    g = (df.sort_values(["user_id", "ts", "event_id"], kind="stable")
         .reset_index(drop=True))
    roll = g.groupby("user_id")["value"].rolling(4, min_periods=1)
    g["w_sum"] = roll.sum().reset_index(level=0, drop=True)
    g = g.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(out["w_sum"].to_numpy(), g["w_sum"].to_numpy())
