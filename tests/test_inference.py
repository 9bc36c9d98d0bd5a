"""Model-scoring actor pool: numpy parity (single vector + prototype
matrix), zero-vector/null handling, actor-pool execution."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_df(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=dim).astype(np.float32).tolist()
                      for _ in range(n)]})


def test_model_score_single_vector_matches_numpy(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.inference import model_score

    df = _emb_df()
    w = np.sin(np.arange(1, 17))
    out = (model_score(rd.from_pandas(df).repartition(4), "embedding",
                       "vec_id", w)
           .to_pandas().set_index("vec_id")["score"])
    wn = w / np.linalg.norm(w)
    for vid, e in zip(df["vec_id"], df["embedding"]):
        v = np.asarray(e, np.float64)
        exp = float(v / np.linalg.norm(v) @ wn)
        assert abs(out[vid] - exp) < 1e-12


def test_model_score_prototypes_argmax(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.inference import model_score

    df = _emb_df(n=100, dim=8, seed=9)
    W = np.random.default_rng(1).normal(size=(4, 8))
    out = (model_score(rd.from_pandas(df), "embedding", "vec_id", W)
           .to_pandas().set_index("vec_id"))
    Wn = W / np.linalg.norm(W, axis=1, keepdims=True)
    for vid, e in zip(df["vec_id"], df["embedding"]):
        v = np.asarray(e, np.float64)
        s = (v / np.linalg.norm(v)) @ Wn.T
        assert out.loc[vid, "cls"] == int(np.argmax(s))
        assert abs(out.loc[vid, "score"] - s.max()) < 1e-12


def test_model_score_zero_and_null_rows(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.inference import model_score

    df = pd.DataFrame({
        "vec_id": pd.array([0, 1, 2], dtype="int64"),
        "embedding": [[1.0, 0.0], [0.0, 0.0], None]})
    out = model_score(rd.from_pandas(df), "embedding", "vec_id",
                      np.array([1.0, 1.0])).to_pandas()
    # zero vector has no cosine; null embedding dropped (SQL semantics)
    assert out["vec_id"].tolist() == [0]
    assert abs(out["score"].iloc[0] - 1 / np.sqrt(2)) < 1e-12
