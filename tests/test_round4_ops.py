"""Round-4 operator batch: multi-quantile grouped selection, winsorize,
key co-occurrence pairs, cross-table edit-distance join."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _df(n=3000, seed=17):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.lognormal(3, 1, n).round(4),
    })


def test_grouped_exact_quantiles_matches_duckdb(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_exact_quantiles

    df = _df()
    out = (grouped_exact_quantiles(rd.from_pandas(df).repartition(8),
                                   "k", "v", [0.25, 0.5, 0.75],
                                   out_cols=["p25", "med", "p75"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, quantile_disc(v, 0.25) AS p25,
               quantile_disc(v, 0.50) AS med,
               quantile_disc(v, 0.75) AS p75
          FROM df GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_exact_quantiles_fallback_parity(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_exact_quantiles

    df = _df(800, seed=3)
    ds = rd.from_pandas(df).repartition(4)
    a = (grouped_exact_quantiles(ds, "k", "v", [0.1, 0.9])
         .to_pandas().sort_values("k").reset_index(drop=True))
    b = (grouped_exact_quantiles(ds, "k", "v", [0.1, 0.9],
                                 summary_merge_max=1)
         .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[b.columns.tolist()], b)


def test_winsorize_drops_null_key_and_value(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import winsorize_by_group

    df = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                       "k": ["a", "a", "a", "a", None, "a"],
                       "v": [1.0, 2.0, 3.0, 100.0, 5.0, None]})
    out = (winsorize_by_group(rd.from_pandas(df), "k", "v",
                              lo_q=0.25, hi_q=0.75, out_col="w",
                              keep_cols=["id", "k"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["id"].tolist() == [1, 2, 3, 4]     # null key + null v dropped
    # quantile_disc over [1,2,3,100]: p25=1 (ceil(1)-1=0), p75=3
    assert out["w"].tolist() == [1.0, 2.0, 3.0, 3.0]


def test_cooccurrence_pairs_brute_force(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.cooccur import cooccurrence_pairs

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({"u": rng.integers(0, 30, n),
                       "it": rng.integers(0, 120, n)})
    out = (cooccurrence_pairs(rd.from_pandas(df).repartition(6), "u", "it",
                              min_shared=3)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    e = df.drop_duplicates()
    sets = {u: set(g["it"]) for u, g in e.groupby("u")}
    us = sorted(sets)
    exp = [(a, b, len(sets[a] & sets[b]))
           for i, a in enumerate(us) for b in us[i + 1:]
           if len(sets[a] & sets[b]) >= 3]
    got = list(map(tuple, out[["a", "b", "n_shared"]].values.tolist()))
    assert got == exp and len(exp) > 10


def test_cooccurrence_hot_item_budget(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.cooccur import cooccurrence_pairs

    df = pd.DataFrame({"u": np.arange(50), "it": np.zeros(50, np.int64)})
    ds = rd.from_pandas(df)
    with pytest.raises(Exception) as ei:
        cooccurrence_pairs(ds, "u", "it", max_item_degree=10).to_pandas()
    assert "degree" in str(ei.value)
    out = cooccurrence_pairs(ds, "u", "it", max_item_degree=10,
                             on_hot_item="skip").to_pandas()
    assert len(out) == 0


def test_edit_distance_join_matches_duckdb(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.fuzzy import edit_distance_join

    side_a = pd.DataFrame({"x": ["cat", "dog", "cart", "smart", "cat"]})
    side_b = pd.DataFrame({"y": ["cats", "dig", "cart", "start", "bat"]})
    out = (edit_distance_join(rd.from_pandas(side_a), rd.from_pandas(side_b),
                              "x", "y")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT DISTINCT l.x AS a, r.y AS b
          FROM side_a l JOIN side_b r ON levenshtein(l.x, r.y) <= 1
         ORDER BY a, b""").df()
    assert out.values.tolist() == exp.values.tolist()
    # within-side near-pairs must NOT appear ("cat"/"cart" both sides apart)
    assert ["cart", "cart"] in out.values.tolist()


def test_cooccurrence_over_budget_parity(ray_session):
    """driver_merge_max=1 forces the fully distributed path (global groupby
    distinct + per-item map_groups + pair groupby); results must match the
    driver fast path exactly."""
    import ray.data as rd

    from schema_validator_ray.stages.cooccur import cooccurrence_pairs

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"u": rng.integers(0, 20, 2000),
                       "it": rng.integers(0, 60, 2000)})
    ds = rd.from_pandas(df).repartition(5)
    a = (cooccurrence_pairs(ds, "u", "it", min_shared=4)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    b = (cooccurrence_pairs(ds, "u", "it", min_shared=4,
                            driver_merge_max=1)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["a", "b", "n_shared"]],
                                  b[["a", "b", "n_shared"]])


def test_grouped_exact_quantile_temporal_column(ray_session):
    """Auto width on a TIMESTAMP value column (calibrate returns a
    Timedelta, which must convert to the ns float grid, not crash)."""
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_exact_quantile

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 1000),
        "ts": pd.to_datetime(rng.integers(0, 10**6, 1000), unit="s"),
    })
    out = (grouped_exact_quantile(rd.from_pandas(df).repartition(4),
                                  "k", "ts", 0.5, out_col="med")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, epoch_us(quantile_disc(ts, 0.5)) * 1000.0 AS med
          FROM df GROUP BY k ORDER BY k""").df()
    assert np.allclose(out["med"].to_numpy(dtype=np.float64),
                       exp["med"].to_numpy())
