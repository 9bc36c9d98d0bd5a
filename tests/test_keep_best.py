"""Argmax dedup (keep_best_rows / dedup_keep_latest) and grouped_corr.

Covers: winner semantics vs a pandas oracle, tie-breaking, the distributed
(over-budget) re-pick parity, empty input, and corr vs numpy.corrcoef."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from schema_validator_ray.stages.dedup import (dedup_keep_latest,
                                               keep_best_rows)
from schema_validator_ray.stages.stats import grouped_corr


def _events_df(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 97, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.normal(size=n),
    })


def _expected_latest(df):
    return (df.sort_values(["user_id", "ts", "event_id"],
                           ascending=[True, False, True])
            .drop_duplicates("user_id").sort_values("user_id")
            .reset_index(drop=True))


def test_dedup_keep_latest_matches_pandas(ray_session):
    import ray.data as rd

    df = _events_df()
    out = (dedup_keep_latest(rd.from_pandas(df), "user_id", "ts", "event_id")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = _expected_latest(df)
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_keep_best_over_budget_parity(ray_session):
    """driver_merge_max=0 forces the distributed groupby re-pick; results
    must match the driver-merge path exactly."""
    import ray.data as rd

    df = _events_df(1500, seed=11)
    ds = rd.from_pandas(df).repartition(8)
    a = (keep_best_rows(ds, "user_id", [("ts", True), ("event_id", False)])
         .to_pandas().sort_values("user_id").reset_index(drop=True))
    b = (keep_best_rows(ds, "user_id", [("ts", True), ("event_id", False)],
                        driver_merge_max=0)
         .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[b.columns.tolist()], b)


def test_keep_best_ties_break_deterministically(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", "a", "b"], "ts": [5, 5, 1],
                       "id": [9, 3, 1]})
    out = (keep_best_rows(rd.from_pandas(df), "k",
                          [("ts", True), ("id", False)])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["id"].tolist() == [3, 1]


def test_keep_best_empty(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                       "ts": pd.Series([], dtype="int64")})
    out = keep_best_rows(rd.from_pandas(df), "k", [("ts", True)])
    assert out.count() == 0


def test_grouped_corr_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame({
        "g": rng.integers(0, 4, n).astype(np.int64),
        "x": rng.normal(size=n),
    })
    df["y"] = 0.6 * df["x"] + rng.normal(scale=0.5, size=n)
    out = (grouped_corr(rd.from_pandas(df).repartition(6), "g", "x", "y")
           .to_pandas().set_index("g").sort_index())
    for g, sub in df.groupby("g"):
        exp = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert out.loc[g, "corr"] == pytest.approx(exp, abs=1e-9)
        assert out.loc[g, "n"] == len(sub)


def test_grouped_corr_zero_variance_is_null(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"g": [1, 1, 1], "x": [2.0, 2.0, 2.0],
                       "y": [1.0, 2.0, 3.0]})
    out = grouped_corr(rd.from_pandas(df), "g", "x", "y").to_pandas()
    assert out["corr"].isna().all()


def test_keep_best_hot_key(ray_session):
    """One key holds 90% of rows: the per-batch winner pick must bound the
    exchange (partials ≤ keys-per-batch) and still return the exact winner."""
    import ray.data as rd

    n = 20000
    rng = np.random.default_rng(13)
    hot = rng.random(n) < 0.9
    df = pd.DataFrame({
        "k": np.where(hot, 7, rng.integers(0, 50, n)).astype(np.int64),
        "ts": rng.integers(0, 10**9, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    out = (keep_best_rows(rd.from_pandas(df).repartition(16), "k",
                          [("ts", True), ("id", False)])
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.sort_values(["k", "ts", "id"], ascending=[True, False, True])
           .drop_duplicates("k").sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_rank_window_hot_key_buckets(ray_session):
    """Skewed key with a wide value range: ranks stay exact across many
    value buckets (carry-in offsets chain through every bucket)."""
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.analytics import rank_window

    rng = np.random.default_rng(17)
    n = 12000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.85, 1,
                      rng.integers(2, 6, n)).astype(np.int64),
        "v": rng.integers(0, 10000, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    out = (rank_window(rd.from_pandas(df).repartition(8), key="k",
                       order_col="v", bucket_width=250.0)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, CAST(rank() OVER w AS BIGINT) AS rank,
               CAST(dense_rank() OVER w AS BIGINT) AS dense_rank
          FROM df WINDOW w AS (PARTITION BY k ORDER BY v) ORDER BY id""").df()
    assert out["rank"].tolist() == exp["rank"].tolist()
    assert out["dense_rank"].tolist() == exp["dense_rank"].tolist()


def test_keep_best_null_keys_form_one_partition(ray_session):
    """SQL ROW_NUMBER() OVER (PARTITION BY key) puts every NULL key in ONE
    partition with one winner (review fix: pc.equal(null,null)->null used
    to keep ALL null-key rows). Driver-merge and distributed paths agree."""
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", None, "a", None, None, "b"],
                       "ts": [5, 9, 7, 3, 9, 1],
                       "id": [1, 2, 3, 4, 5, 6]})
    for budget in (5_000_000, 0):
        out = (keep_best_rows(rd.from_pandas(df).repartition(3), "k",
                              [("ts", True), ("id", False)],
                              driver_merge_max=budget)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert out["id"].tolist() == [2, 3, 6], f"budget={budget}"
