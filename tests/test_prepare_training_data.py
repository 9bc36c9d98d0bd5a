"""End-to-end training-data prep invariants: deterministic under re-blocking,
splits partition the kept set, packs respect the budget and never straddle a
split boundary, near-dup chains collapse."""

import numpy as np
import pandas as pd
import pytest


def test_prepare_training_data_invariants(ray_session):
    import ray.data as rd

    from schema_validator_ray.pipelines.prepare_training_data import (
        prepare_training_data,
    )

    rng = np.random.default_rng(14)
    n = 400
    vocab = np.array(["alpha", "bridge", "copper", "delta", "ember", "forest",
                      "granite", "harbor", "island", "jasper", "kettle",
                      "lumen", "meadow", "nickel", "orchid", "pine", "quartz",
                      "river", "slate", "timber", "umber", "violet", "willow",
                      "xenon", "yarrow", "zephyr"])
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(n)]
    texts[5] = texts[3]                                   # exact dup
    words = texts[3].split()
    words[0], words[11] = "changed", "words"
    texts[7] = " ".join(words)                            # near dup of 3
    texts[9] = "x"                                        # fails min_tokens
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})

    def run(parts):
        res = prepare_training_data(
            rd.from_pandas(df).repartition(parts), min_quality=0.3,
            min_tokens=10, near_dup_threshold=0.5, pack_budget=512)
        return (res["dataset"].to_pandas()
                .sort_values("doc_id").reset_index(drop=True)), res["stats"]

    out, stats = run(4)
    out2, _ = run(9)
    pd.testing.assert_frame_equal(out, out2)        # re-blocking invariant

    kept = set(out["doc_id"])
    assert 9 not in kept                            # quality/token filter
    assert 5 not in kept                            # exact dup dropped
    assert 7 not in kept and 3 in kept              # near dup dropped, rep kept
    assert out["doc_id"].is_unique

    # splits partition; packs stay within one split and within budget
    assert set(out["split"]) <= {"train", "val", "test"}
    per_pack = out.groupby("pack_id")
    assert (per_pack["split"].nunique() == 1).all()
    sums = per_pack["n_tokens"].sum()
    oversize_packs = set(out[out["oversize"]]["pack_id"])
    ok = sums[~sums.index.isin(oversize_packs)]
    assert (ok <= 512).all()
    # every pack id carries its split prefix
    assert (out.apply(lambda r: r["pack_id"].startswith(r["split"] + "/"),
                      axis=1)).all()


def test_prepare_training_data_chunked_invariants(ray_session):
    """Capstone v2: chunk-level dataset with doc-level splits — no document's
    chunks straddle splits, per-split shuffle positions are a permutation,
    packs never mix splits and respect the budget (or are flagged)."""
    from schema_validator_ray.pipelines.prepare_training_data import (
        prepare_training_data_chunked,
    )
    from schema_validator_ray.sources.pq_read import read_parquet_clean

    ds = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                            columns=["doc_id", "text"])
    res = prepare_training_data_chunked(ds, min_quality=0.5, min_tokens=10,
                                        near_dup_threshold=0.5,
                                        max_tokens=32, pack_budget=128)
    df = res["dataset"].to_pandas()
    assert len(df) > 0
    assert (df.groupby("doc_id")["split"].nunique() == 1).all()
    for s, sub in df.groupby("split"):
        assert sorted(sub["pos"]) == list(range(len(sub))), s
    packs = df.groupby("pack_id")
    assert (packs["split"].nunique() == 1).all()
    sums = packs["n_tokens"].sum()
    flagged = packs["oversize"].any()
    assert ((sums <= 128) | flagged).all()
    assert (df["n_tokens"] <= 32).all()
    # determinism across re-blocking
    df2 = prepare_training_data_chunked(
        read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).repartition(7),
        min_quality=0.5, min_tokens=10, near_dup_threshold=0.5,
        max_tokens=32, pack_budget=128)["dataset"].to_pandas()
    a = df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    b = df2.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert a[["doc_id", "chunk_id", "split", "pos", "pack_id"]].equals(
        b[["doc_id", "chunk_id", "split", "pos", "pack_id"]])
