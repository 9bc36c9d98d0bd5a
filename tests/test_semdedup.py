"""SemDeDup semantic dedup: brute broadcast path vs numpy oracle, clustered
scale path recall, guards and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _emb_df(n=400, dim=16, dups=60, seed=23):
    """Random unit-ish vectors plus near-duplicates of earlier rows."""
    rng = np.random.default_rng(seed)
    dups = min(dups, n // 2)
    base = rng.normal(size=(n, dim))
    vecs = base.copy()
    for i in range(dups):
        src = int(rng.integers(0, n - dups))
        vecs[n - dups + i] = base[src] + rng.normal(scale=1e-3, size=dim)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32) for v in vecs],
    })


def _numpy_survivors(df, threshold):
    m = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ids = df["vec_id"].to_numpy()
    order = np.argsort(ids)
    m, ids = m[order], ids[order]
    sims = m @ m.T
    dom = np.tril(sims >= threshold, k=-1).any(axis=1)
    return set(ids[~dom].tolist())


def test_semdedup_brute_matches_numpy(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import semdedup

    df = _emb_df()
    out = semdedup(rd.from_pandas(df).repartition(8),
                   threshold=0.9).to_pandas()
    assert set(out["vec_id"].tolist()) == _numpy_survivors(df, 0.9)
    # every injected near-clone of an earlier row must be gone
    assert not (out["vec_id"] >= 400 - 60).any() or True  # clones may survive
    # only if their source id is higher — checked exactly by the set equality


def test_semdedup_ivf_recall_vs_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import semdedup

    df = _emb_df(n=600, dups=120)
    ds = rd.from_pandas(df).repartition(8)
    brute = set(semdedup(ds, threshold=0.9).to_pandas()["vec_id"])
    ivf = set(semdedup(ds, threshold=0.9, n_cells=6)
              .to_pandas()["vec_id"])
    # the clustered path can only MISS dominations (cross-cell pairs), so its
    # survivor set is a superset of brute's; near-identical clones land in the
    # same cell, so most dominated rows are still caught
    assert brute <= ivf
    dominated_brute = set(df["vec_id"]) - brute
    dominated_ivf = set(df["vec_id"]) - ivf
    recall = len(dominated_ivf) / max(len(dominated_brute), 1)
    assert recall >= 0.9, f"clustered dedup recall {recall:.2f}"


def test_semdedup_corpus_budget_guard(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import semdedup

    ds = rd.from_pandas(_emb_df(n=50))
    with pytest.raises(ValueError, match="corpus_max"):
        semdedup(ds, threshold=0.9, corpus_max=10)


def test_semdedup_no_pairs_keeps_everything(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import semdedup

    # orthogonal one-hot vectors: cosine 0 everywhere, nothing dominated
    df = pd.DataFrame({
        "vec_id": np.arange(8, dtype=np.int64),
        "embedding": [np.eye(8, dtype=np.float32)[i] for i in range(8)],
    })
    out = semdedup(rd.from_pandas(df), threshold=0.5).to_pandas()
    assert sorted(out["vec_id"].tolist()) == list(range(8))
