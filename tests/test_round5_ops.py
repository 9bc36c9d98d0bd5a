"""Round-5 corpus-shaping operators: adaptive per-group quantile gate,
embedding centroid outliers, k-NN label agreement."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_filter_by_group_quantile_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import filter_by_group_quantile

    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b", "b", "b"],
        "id": [1, 2, 3, 4, 5, 6, 7],
        "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, np.nan],
    })
    # quantile_disc(v, 0.5): group a -> 2.0, group b -> 10.0
    out = filter_by_group_quantile(
        rd.from_pandas(df).repartition(3), "k", "v", q=0.5,
        keep_cols=["id", "k"], thr_col="thr").to_pandas()
    got = out.sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == [2, 3, 4, 5, 6]       # 1.0 < 2.0, nan drop
    assert got[got["k"] == "a"]["thr"].unique().tolist() == [2.0]
    assert got[got["k"] == "b"]["thr"].unique().tolist() == [10.0]


def test_filter_by_group_quantile_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.stats import filter_by_group_quantile

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 400),
        "id": np.arange(400),
        "v": np.round(rng.normal(0, 5, 400), 6),
    })
    out = (filter_by_group_quantile(rd.from_pandas(df).repartition(4),
                                    "k", "v", q=0.25,
                                    keep_cols=["id", "k"], thr_col="thr")
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH thr AS (SELECT k, quantile_disc(v, 0.25) AS t
                       FROM df GROUP BY k)
        SELECT df.id, df.k, df.v, thr.t
          FROM df JOIN thr USING (k) WHERE df.v >= thr.t
         ORDER BY df.id""").df()
    assert out["id"].tolist() == exp["id"].tolist()
    assert np.allclose(out["thr"].to_numpy(), exp["t"].to_numpy())
