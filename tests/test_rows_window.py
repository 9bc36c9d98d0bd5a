"""ROWS-frame moving window (`rows_moving_sum`): DuckDB window parity with
cross-bucket carry chains, hot keys, and the exact fallback path."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from schema_validator_ray.stages.analytics import (rows_moving_sum,
                                                   _exact_rows_moving)


def _oracle(df: pd.DataFrame, k: int) -> pd.DataFrame:
    return duckdb.sql(f"""
        SELECT id,
               ROUND(SUM(v) OVER w, 6) AS w_sum,
               CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt
          FROM df
        WINDOW w AS (PARTITION BY k ORDER BY o, id
                     ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)
         ORDER BY id""").df()


def _run(df: pd.DataFrame, k: int, **kw):
    import ray.data as rd
    out = (rows_moving_sum(rd.from_pandas(df).repartition(8), key="k",
                           order_col="o", value="v", tiebreak="id", k=k, **kw)
           .to_pandas().sort_values("id").reset_index(drop=True))
    out["w_sum"] = out["w_sum"].round(6)
    return out


def _mkdf(n: int, n_keys: int, seed: int, hot: float = 0.0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    if hot:
        keys = np.where(rng.random(n) < hot, 0, keys)
    return pd.DataFrame({"k": keys,
                         "o": rng.integers(0, 5000, n).astype(np.int64),
                         "v": np.round(rng.random(n) * 100, 2),
                         "id": np.arange(n, dtype=np.int64)})


@pytest.mark.parametrize("k", [0, 1, 3, 7])
def test_rows_moving_matches_sql(ray_session, k):
    df = _mkdf(4000, 25, seed=k + 1)
    out = _run(df, k, bucket_width=500.0)       # ~10 buckets → real carries
    exp = _oracle(df, k)
    assert out["w_sum"].tolist() == exp["w_sum"].tolist()
    assert out["w_cnt"].tolist() == exp["w_cnt"].tolist()


def test_rows_moving_narrow_buckets_chain(ray_session):
    """Bucket width smaller than the window: a single window spans MANY
    buckets, so carries must chain across sparse predecessors."""
    df = _mkdf(1500, 8, seed=9)
    out = _run(df, 6, bucket_width=40.0)        # ~125 buckets, k=6
    exp = _oracle(df, 6)
    assert out["w_sum"].tolist() == exp["w_sum"].tolist()
    assert out["w_cnt"].tolist() == exp["w_cnt"].tolist()


def test_rows_moving_hot_key(ray_session):
    df = _mkdf(12000, 40, seed=3, hot=0.9)
    out = _run(df, 3, bucket_width=250.0)
    exp = _oracle(df, 3)
    assert out["w_sum"].tolist() == exp["w_sum"].tolist()


def test_rows_moving_duplicate_order_values(ray_session):
    """Ties in the order column resolve by the tiebreak, locally."""
    df = _mkdf(2000, 10, seed=5)
    df["o"] = df["o"] // 100 * 100              # heavy ties
    out = _run(df, 4, bucket_width=300.0)
    exp = _oracle(df, 4)
    assert out["w_sum"].tolist() == exp["w_sum"].tolist()
    assert out["w_cnt"].tolist() == exp["w_cnt"].tolist()


def test_rows_moving_fallback_parity(ray_session):
    """Over-budget path (summary_merge_max=0) gives identical answers."""
    import ray.data as rd
    df = _mkdf(1200, 6, seed=11)
    ds = rd.from_pandas(df).repartition(6)
    a = _run(df, 3, bucket_width=400.0)
    b = (_exact_rows_moving(ds, key="k", order_col="o", value="v",
                            tiebreak="id", k=3, sum_col="w_sum",
                            cnt_col="w_cnt")
         .to_pandas().sort_values("id").reset_index(drop=True))
    b["w_sum"] = b["w_sum"].round(6)
    assert a["w_sum"].tolist() == b["w_sum"].tolist()
    assert a["w_cnt"].tolist() == b["w_cnt"].astype(np.int64).tolist()


def test_lead_gap_matches_sql(ray_session):
    """LEAD across bucket boundaries, hot key, duplicate timestamps."""
    import ray.data as rd

    from schema_validator_ray.stages.analytics import lead_gap_us

    rng = np.random.default_rng(29)
    n = 8000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.8, 1,
                      rng.integers(2, 30, n)).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**9, n) * 1000, unit="us", origin="2024-01-01"),
        "id": np.arange(n, dtype=np.int64),
    })
    df.loc[::11, "ts"] = df["ts"].iloc[0]        # heavy ties
    out = (lead_gap_us(rd.from_pandas(df).repartition(8), key="k", ts="ts",
                       tiebreak="id", bucket_width="2min")
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, COALESCE(LEAD(epoch_us(ts)) OVER (
                   PARTITION BY k ORDER BY ts, id) - epoch_us(ts), -1)
               AS gap_us FROM df ORDER BY id""").df()
    assert out["gap_us"].astype(np.int64).tolist() == \
        exp["gap_us"].astype(np.int64).tolist()
