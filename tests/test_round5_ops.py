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


def test_centroid_outliers_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import centroid_outliers

    # label 0: three vectors near +x, one pointing -x (the outlier);
    # label 1: two near +y, none below the threshold
    rows = [
        {"vec_id": 1, "label": 0, "embedding": [1.0, 0.1]},
        {"vec_id": 2, "label": 0, "embedding": [1.0, -0.1]},
        {"vec_id": 3, "label": 0, "embedding": [0.9, 0.0]},
        {"vec_id": 4, "label": 0, "embedding": [-1.0, 0.0]},
        {"vec_id": 5, "label": 1, "embedding": [0.0, 1.0]},
        {"vec_id": 6, "label": 1, "embedding": [0.1, 1.0]},
    ]
    out = centroid_outliers(rd.from_items(rows).repartition(2),
                            emb_col="embedding", id_col="vec_id",
                            label_col="label", max_cos=0.0).to_pandas()
    assert out["vec_id"].tolist() == [4]
    assert out["centroid_cos"].iloc[0] < 0.0


def test_centroid_outliers_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.similarity import centroid_outliers

    rng = np.random.default_rng(11)
    n, dim = 300, 16
    df = pd.DataFrame({
        "vec_id": np.arange(n),
        "label": rng.integers(0, 4, n),
        "embedding": rng.normal(0, 1, (n, dim)).round(4).tolist(),
    })
    out = (centroid_outliers(rd.from_pandas(df).repartition(4),
                             emb_col="embedding", id_col="vec_id",
                             label_col="label", max_cos=0.1)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH dims AS (
          SELECT label, i, avg(v) AS m
            FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS i FROM df)
           GROUP BY label, i),
        cent AS (SELECT label, list(m ORDER BY i) AS c FROM dims
                  GROUP BY label)
        SELECT df.vec_id, df.label,
               round(list_cosine_similarity(df.embedding, cent.c), 6) AS cc
          FROM df JOIN cent USING (label)
         WHERE round(list_cosine_similarity(df.embedding, cent.c), 6) < 0.1
         ORDER BY df.vec_id""").df()
    assert out["vec_id"].tolist() == exp["vec_id"].tolist()
    assert np.allclose(out["centroid_cos"].to_numpy(), exp["cc"].to_numpy(),
                       atol=1e-9)


def test_knn_label_agreement_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import knn_label_agreement

    # two tight clusters; vec 4 sits in cluster A but carries label 1
    rows = [
        {"vec_id": 1, "label": 0, "embedding": [1.0, 0.0]},
        {"vec_id": 2, "label": 0, "embedding": [0.99, 0.01]},
        {"vec_id": 3, "label": 0, "embedding": [0.98, -0.01]},
        {"vec_id": 4, "label": 1, "embedding": [0.97, 0.02]},   # mislabel
        {"vec_id": 5, "label": 1, "embedding": [0.0, 1.0]},
        {"vec_id": 6, "label": 1, "embedding": [0.01, 0.99]},
    ]
    out = (knn_label_agreement(rd.from_items(rows).repartition(2),
                               emb_col="embedding", id_col="vec_id",
                               label_col="label", k=2)
           .to_pandas().set_index("vec_id"))
    assert out.loc[4, "agree_frac"] == 0.0        # both NNs are label 0
    assert out.loc[1, "agree_frac"] == 1.0
    assert (out["n_neighbors"] == 2).all()


def test_knn_label_agreement_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.similarity import knn_label_agreement

    rng = np.random.default_rng(13)
    n, dim = 200, 8
    df = pd.DataFrame({
        "vec_id": np.arange(n),
        "label": rng.integers(0, 3, n),
        "embedding": rng.normal(0, 1, (n, dim)).round(4).tolist(),
    })
    out = (knn_label_agreement(rd.from_pandas(df).repartition(4),
                               emb_col="embedding", id_col="vec_id",
                               label_col="label", k=5)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH pairs AS (
          SELECT a.vec_id, a.label, b.label AS nl
            FROM df a JOIN df b ON a.vec_id <> b.vec_id
          QUALIFY ROW_NUMBER() OVER (PARTITION BY a.vec_id
              ORDER BY round(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 6) DESC, b.vec_id) <= 5)
        SELECT vec_id, label, count(*) AS nn,
               CAST(sum((nl = label)::int) AS DOUBLE) / count(*) AS af
          FROM pairs GROUP BY vec_id, label ORDER BY vec_id""").df()
    assert out["vec_id"].tolist() == exp["vec_id"].tolist()
    assert np.array_equal(out["agree_frac"].to_numpy(), exp["af"].to_numpy())


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
