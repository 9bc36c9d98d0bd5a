"""Product-quantization ANN: code round-trip shape, ADC recall vs the exact
brute-force baseline on clustered synthetic embeddings, determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _clustered(n=2000, d=64, n_clusters=20, seed=5):
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, d)) * 3
    lab = rng.integers(0, n_clusters, n)
    return cents[lab] + rng.standard_normal((n, d)) * 0.5


def test_pq_recall_vs_brute(ray_session):
    import ray
    import ray.data as rd

    from schema_validator_ray.stages.pq import (pq_encode, pq_knn,
                                                train_pq_codebooks)
    from schema_validator_ray.stages.similarity import knn_brute

    x = _clustered()
    df = pd.DataFrame({"vec_id": np.arange(len(x), dtype=np.int64),
                       "embedding": list(x)})
    ds = rd.from_pandas(df).repartition(6)
    queries = x[:8]

    books = train_pq_codebooks(x[:1024], m=8, nbits=8, iters=6)
    assert books.shape == (8, 256, 8)
    codes = pq_encode(ds, ray.put(books))
    ct = codes.take_all()
    assert len(ct) == len(x) and len(ct[0]["code"]) == 8

    from schema_validator_ray.stages.pq import pq_knn_rerank

    k = 10
    approx = pq_knn(codes, queries, books, k=k).to_pandas()
    rerank = pq_knn_rerank(codes, ds, queries, books, k=k,
                           rerank_factor=8).to_pandas()
    exact = knn_brute(ds, queries, k=k).to_pandas()
    raw_recalls, rr_recalls = [], []
    for qi in range(len(queries)):
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        r = set(rerank[rerank["query_id"] == qi]["neighbor_id"])
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        assert len(a) == k and len(r) == k
        raw_recalls.append(len(a & e) / k)
        rr_recalls.append(len(r & e) / k)
    # raw ADC on tight within-cluster neighbors: compression error swamps
    # tiny distance gaps — the shortlist is still good, so re-ranking
    # against the full-precision column recovers near-exact recall
    assert np.mean(raw_recalls) >= 0.3, raw_recalls
    assert np.mean(rr_recalls) >= 0.9, rr_recalls

    # determinism: a second run returns the identical table
    again = pq_knn(codes, queries, books, k=k).to_pandas()
    a1 = approx.sort_values(["query_id", "adist", "neighbor_id"]).reset_index(
        drop=True)
    a2 = again.sort_values(["query_id", "adist", "neighbor_id"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(a1, a2)


def test_pq_dim_guard():
    from schema_validator_ray.stages.pq import train_pq_codebooks

    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(np.zeros((100, 62)), m=8)
