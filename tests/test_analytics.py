"""Partitioned analytic (window) functions vs DuckDB window-function
references: running sum, lag, ntile — skew-safe path, exact single-shuffle
fallback, SQL tile-size semantics, cross-bucket carry-in."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from schema_validator_ray.stages.analytics import (
    _ntile_of,
    lag_gap_us,
    ntile,
    running_sum,
)


def _frame(seed=0, n=4000, keys=12):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, keys, n)
    key[: n // 4] = 3          # hot key: 25% of all rows span every bucket
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 200 * 86_400_000_000, n).astype("timedelta64[us]"))
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": key.astype(np.int64),
        "ts": ts,
        "v": rng.integers(1, 1000, n).astype(np.int64),
        "x": rng.normal(size=n) * 100.0,
    })


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(_frame()).repartition(8)


def _oracle(df, sql):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(sql).df()


def test_running_sum_int_exact(ray_session, ds):
    out = running_sum(ds, key="k", order_col="ts", value="v",
                      tiebreak="id", out_col="rs",
                      bucket_width="7d").to_pandas()
    ref = _oracle(_frame(), """
        SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY ts, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM t""")
    m = (out[["id", "rs"]].sort_values("id").reset_index(drop=True)
         .merge(ref.sort_values("id").reset_index(drop=True), on="id"))
    assert len(m) == len(ref)
    assert (m["rs_x"].to_numpy() == m["rs_y"].to_numpy()).all()
    assert np.issubdtype(out["rs"].dtype, np.integer)


def test_running_sum_float(ray_session, ds):
    out = running_sum(ds, key="k", order_col="ts", value="x",
                      tiebreak="id", out_col="rs",
                      bucket_width="7d").to_pandas()
    ref = _oracle(_frame(), """
        SELECT id, SUM(x) OVER (PARTITION BY k ORDER BY ts, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM t""")
    m = (out[["id", "rs"]].sort_values("id").reset_index(drop=True)
         .merge(ref.sort_values("id").reset_index(drop=True), on="id"))
    assert np.allclose(m["rs_x"], m["rs_y"], atol=1e-6)


def test_running_sum_fallback_parity(ray_session, ds):
    """summary_merge_max=0 forces the exact groupby(key) fallback; results
    must match the skew-safe path exactly (int values)."""
    a = (running_sum(ds, key="k", order_col="ts", value="v", tiebreak="id",
                     out_col="rs", bucket_width="7d")
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (running_sum(ds, key="k", order_col="ts", value="v", tiebreak="id",
                     out_col="rs", bucket_width="7d", summary_merge_max=0)
         .to_pandas().sort_values("id").reset_index(drop=True))
    assert (a["rs"].to_numpy() == b["rs"].to_numpy()).all()


def test_lag_gap(ray_session, ds):
    out = lag_gap_us(ds, key="k", ts="ts", tiebreak="id", out_col="g",
                     bucket_width="7d").to_pandas()
    ref = _oracle(_frame(), """
        SELECT id, COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY k ORDER BY ts, id), -1) AS g FROM t""")
    m = (out[["id", "g"]].sort_values("id").reset_index(drop=True)
         .merge(ref.sort_values("id").reset_index(drop=True), on="id"))
    assert len(m) == len(ref)
    assert (m["g_x"].to_numpy() == m["g_y"].to_numpy()).all()
    # every key's global first row is -1, exactly once per key
    first = out[out["g"] == -1]
    assert len(first) == out["k"].nunique()


def test_lag_gap_fallback_parity(ray_session, ds):
    a = (lag_gap_us(ds, key="k", ts="ts", tiebreak="id", out_col="g",
                    bucket_width="7d")
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (lag_gap_us(ds, key="k", ts="ts", tiebreak="id", out_col="g",
                    bucket_width="7d", summary_merge_max=0)
         .to_pandas().sort_values("id").reset_index(drop=True))
    assert (a["g"].to_numpy() == b["g"].to_numpy()).all()


def test_ntile_semantics_vs_duckdb(ray_session, ds):
    out = ntile(ds, key="k", order_col="x", tiebreak="id", n=7,
                out_col="t7", bucket_width=50.0).to_pandas()
    ref = _oracle(_frame(), """
        SELECT id, NTILE(7) OVER (PARTITION BY k ORDER BY x, id) AS t7
        FROM t""")
    m = (out[["id", "t7"]].sort_values("id").reset_index(drop=True)
         .merge(ref.sort_values("id").reset_index(drop=True), on="id"))
    assert len(m) == len(ref)
    assert (m["t7_x"].to_numpy() == m["t7_y"].to_numpy().astype(np.int64)).all()


def test_ntile_fallback_parity(ray_session, ds):
    a = (ntile(ds, key="k", order_col="x", tiebreak="id", n=4, out_col="q",
               bucket_width=50.0)
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (ntile(ds, key="k", order_col="x", tiebreak="id", n=4, out_col="q",
               bucket_width=50.0, summary_merge_max=0)
         .to_pandas().sort_values("id").reset_index(drop=True))
    assert (a["q"].to_numpy() == b["q"].to_numpy()).all()


def test_ntile_small_groups(ray_session):
    """Groups smaller than n: SQL gives each row its own tile 1..g."""
    import ray.data as rd

    df = pd.DataFrame({"id": np.arange(5, dtype=np.int64),
                       "k": np.int64([1, 1, 1, 2, 2]),
                       "x": np.float64([5.0, 1.0, 3.0, 2.0, 4.0])})
    out = (ntile(rd.from_pandas(df), key="k", order_col="x", tiebreak="id",
                 n=10, out_col="t", bucket_width=1.0)
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    assert out["t"].tolist() == [1, 2, 3, 1, 2]


def test_ntile_of_formula():
    # g=10, n=4 -> sizes 3,3,2,2 (first g%n tiles get ceil(g/n))
    r = np.arange(10)
    g = np.full(10, 10)
    assert _ntile_of(r, g, 4).tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_running_sum_ties_same_order_value(ray_session):
    """Equal (ts) order values resolve by tiebreak identically to SQL."""
    import ray.data as rd

    ts = np.full(6, np.datetime64("2024-03-01", "us"))
    df = pd.DataFrame({"id": np.int64([5, 3, 1, 2, 4, 0]),
                       "k": np.int64([1] * 6),
                       "ts": ts,
                       "v": np.int64([10, 20, 30, 40, 50, 60])})
    out = (running_sum(rd.from_pandas(df), key="k", order_col="ts",
                       value="v", tiebreak="id", out_col="rs",
                       bucket_width="1d")
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = _oracle(df, """
        SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY ts, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM t
        ORDER BY id""")
    assert out["rs"].tolist() == ref["rs"].tolist()


def test_rank_window_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.analytics import rank_window

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 800).astype(np.int64),
        "v": rng.integers(0, 40, 800).astype(np.float64),  # many ties
        "id": np.arange(800, dtype=np.int64),
    })
    out = (rank_window(rd.from_pandas(df).repartition(6), key="k",
                       order_col="v", bucket_width=7.0)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, CAST(rank() OVER w AS BIGINT) AS rank,
               CAST(dense_rank() OVER w AS BIGINT) AS dense_rank,
               percent_rank() OVER w AS pct_rank
          FROM df WINDOW w AS (PARTITION BY k ORDER BY v)
         ORDER BY id""").df()
    assert out["rank"].tolist() == exp["rank"].tolist()
    assert out["dense_rank"].tolist() == exp["dense_rank"].tolist()
    assert np.allclose(out["pct_rank"], exp["pct_rank"])


def test_rank_window_fallback_parity(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import rank_window

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 300).astype(np.int64),
        "v": rng.integers(0, 10, 300).astype(np.int64),
        "id": np.arange(300, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(4)
    a = (rank_window(ds, key="k", order_col="v", bucket_width=3.0)
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (rank_window(ds, key="k", order_col="v", bucket_width=3.0,
                     summary_merge_max=0)
         .to_pandas().sort_values("id").reset_index(drop=True))
    for c in ("rank", "dense_rank", "pct_rank"):
        assert a[c].tolist() == b[c].tolist(), c


def test_rank_window_single_row_partition_pct_zero(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import rank_window

    df = pd.DataFrame({"k": [1, 2, 2], "v": [5.0, 1.0, 2.0],
                       "id": [0, 1, 2]})
    out = (rank_window(rd.from_pandas(df), key="k", order_col="v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out.loc[0, "pct_rank"] == 0.0
    assert out.loc[2, "pct_rank"] == 1.0


def test_mad_outliers_vs_duckdb(ray_session):
    """Robust outliers match the SQL median/MAD formulation exactly,
    including a zero-MAD group (every non-median row flags) and null
    values (never flagged)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.analytics import mad_outliers

    rng = np.random.default_rng(6)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "zero_mad"], n),
        "v": rng.normal(50, 10, n).round(2)})
    df.loc[df["g"] == "zero_mad", "v"] = 7.0          # constant group...
    spike = df.index[df["g"] == "zero_mad"][:5]
    df.loc[spike, "v"] = 9.0                          # ...plus 5 deviants
    df.loc[::97, "v"] = np.nan                        # nulls never flag
    df.loc[3, "v"] = 500.0                            # an obvious outlier

    out = (mad_outliers(rd.from_pandas(df).repartition(8),
                        value_col="v", group_col="g", k=3.5,
                        bucket_width=5.0,
                        out_cols=["event_id", "g", "v"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH med AS (SELECT g, quantile_disc(v, 0.5) AS med
                       FROM df GROUP BY 1),
             mad AS (SELECT e.g, quantile_disc(abs(e.v - m.med), 0.5) AS mad
                       FROM df e JOIN med m USING (g) GROUP BY 1)
        SELECT e.event_id, e.g, e.v
          FROM df e JOIN med m USING (g) JOIN mad d USING (g)
         WHERE abs(e.v - m.med) > 3.5 * d.mad
         ORDER BY e.event_id""").df()
    assert out["event_id"].tolist() == exp["event_id"].tolist()
    assert 3 in out["event_id"].values
    assert set(spike) <= set(out["event_id"].values)   # zero-MAD deviants


def test_global_rank_vs_duckdb(ray_session):
    """Empty-partition-clause rank/dense/pct vs SQL, heavy ties across
    bucket boundaries, plus the over-budget exact fallback."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.analytics import global_rank

    rng = np.random.default_rng(8)
    df = pd.DataFrame({"id": np.arange(3000, dtype=np.int64),
                       "v": rng.integers(0, 40, 3000).astype(np.float64)})
    exp = duckdb.sql("""
        SELECT id, CAST(rank() OVER w AS BIGINT) AS rank,
               CAST(dense_rank() OVER w AS BIGINT) AS dense_rank,
               percent_rank() OVER w AS pct_rank
          FROM df WINDOW w AS (ORDER BY v) ORDER BY id""").df()
    for budget in (5_000_000, 1):
        got = (global_rank(rd.from_pandas(df).repartition(8),
                           order_col="v", bucket_width=7.0,
                           summary_merge_max=budget)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert got["rank"].tolist() == exp["rank"].tolist(), budget
        assert got["dense_rank"].tolist() == exp["dense_rank"].tolist()
        assert np.array_equal(got["pct_rank"].to_numpy(),
                              exp["pct_rank"].to_numpy())


def test_mad_outliers_null_group_rows_never_flag(ray_session):
    """Rows with a null group are dropped (the SQL JOIN semantics), never
    tested against another group's stats; an all-null-group batch is safe."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.analytics import mad_outliers

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "event_id": np.arange(600, dtype=np.int64),
        "g": ["a"] * 300 + ["b"] * 200 + [None] * 100,
        "v": np.r_[rng.normal(1, 0.1, 300), rng.normal(100, 0.1, 200),
                   np.full(100, 1.0)]})
    df.loc[0, "v"] = 50.0                           # real outlier in a
    out = (mad_outliers(rd.from_pandas(df).repartition(6),
                        value_col="v", group_col="g", k=3.5,
                        bucket_width=1.0,
                        out_cols=["event_id", "g", "v"])
           .to_pandas())
    assert 0 in out["event_id"].values
    assert out["g"].notna().all()                   # no null-group rows


def test_mad_outliers_fast_path_matches_fallback(ray_session):
    """The digest-steered 4-pass path and the two-selection fallback must
    agree exactly — including a heavy-duplicate group (MAD 0) and a tiny
    group. A shrunken probe_budget forces the fallback for the B side."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.analytics import mad_outliers

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n + 3, dtype=np.int64),
        "event_type": (["a"] * (n // 2) + ["dup"] * (n // 2 - 1)
                       + ["tiny"] + ["a", "dup", "tiny"]),
        "value": np.r_[rng.normal(0, 2, n // 2).round(3),
                       np.full(n // 2 - 1, 7.0), 5.0,
                       50.0, 9.0, 5.0],
    })
    ds = rd.from_pandas(df).repartition(7)
    fast = sorted(r["event_id"] for r in mad_outliers(
        ds, value_col="value", group_col="event_type", k=3.5).take_all())
    slow = sorted(r["event_id"] for r in mad_outliers(
        ds, value_col="value", group_col="event_type", k=3.5,
        probe_budget=2).take_all())     # forces the two-selection fallback
    assert fast == slow and len(fast) > 0
    assert n in fast        # the planted 50.0 in group a
    assert n + 1 in fast    # 9.0 in the MAD-0 dup group (!= median 7.0)
