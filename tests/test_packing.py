"""Sequence packing invariants: budget respected, all docs assigned exactly
once, deterministic under re-blocking, oversize docs flagged as singletons."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def toks_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 3000
    toks = rng.integers(5, 400, n)
    toks[rng.choice(n, 10, replace=False)] = 900  # oversize (> budget 512)
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_tokens": toks.astype(np.int64)})), n


def test_pack_greedy_invariants(toks_ds, ray_session):
    from schema_validator_ray.stages.packing import pack_greedy

    ds, n = toks_ds
    out = pack_greedy(ds, "doc_id", "n_tokens", budget=512,
                      n_shards=8).to_pandas()
    assert len(out) == n
    assert out["doc_id"].is_unique
    sums = out.groupby("pack_id")["n_tokens"].sum()
    over = out[out["oversize"]]
    ok_packs = sums[~sums.index.isin(over["pack_id"])]
    assert (ok_packs <= 512).all()
    # oversize docs are singletons and flagged
    assert len(over) == 10
    per_pack = out.groupby("pack_id").size()
    assert (per_pack[over["pack_id"]] == 1).all()
    # determinism across re-blocking
    out2 = pack_greedy(ds.repartition(11), "doc_id", "n_tokens", budget=512,
                       n_shards=8).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a["pack_id"] == b["pack_id"]).all()
    # packing efficiency: average non-oversize pack at least half full
    assert ok_packs.mean() >= 0.5 * 512


def test_length_buckets_cover_all(toks_ds, ray_session):
    from schema_validator_ray.stages.packing import (bucket_padding_stats,
                                                     length_buckets)

    ds, n = toks_ds
    lb = length_buckets(ds, "n_tokens").to_pandas()
    assert len(lb) == n
    assert ((2.0 ** lb["bucket"]) >= lb["n_tokens"]).all()
    assert ((2.0 ** (lb["bucket"] - 1)) < lb["n_tokens"]).all()
    stats = bucket_padding_stats(ds, "n_tokens").to_pandas()
    assert stats["n_docs"].sum() == n
    assert ((stats["pad_waste"] >= 0) & (stats["pad_waste"] < 1)).all()


def test_chunk_documents_reassembly(ray_session):
    """Chunks per doc: correct count, ordered ids, and rejoining the chunks
    with single spaces reproduces the whitespace-normalized document."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.packing import chunk_documents

    rng = np.random.default_rng(8)
    docs = []
    for i in range(30):
        n = int(rng.integers(0, 40))
        docs.append(" ".join(f"w{i}_{j}" for j in range(n)))
    docs.append(None)
    tbl = pa.table({"doc_id": pa.array(list(range(31)), pa.int64()),
                    "text": pa.array(docs)})
    out = (chunk_documents(rd.from_arrow(tbl).repartition(3), "text",
                           "doc_id", max_tokens=7).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    assert 30 not in set(out.doc_id)                  # null text: no chunks
    for i in range(30):
        toks = docs[i].split(" ") if docs[i] else [""]
        n_tok = len(docs[i].split()) if docs[i] else 0
        sub = out[out.doc_id == i]
        want_chunks = max(1, -(-n_tok // 7)) if docs[i] else 1
        if docs[i] == "":
            assert list(sub.chunk) == [""]
            continue
        assert list(sub.chunk_id) == list(range(want_chunks))
        assert " ".join(sub.chunk) == docs[i]


def test_chunk_documents_messy_whitespace(ray_session):
    """Tabs/newlines/runs split like the SQL oracle's regex; chunk joins
    normalize to single spaces."""
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.packing import chunk_documents

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a\tb\n\nc   d\r\ne", " lead and trail "]),
    }))
    out = (chunk_documents(ds, "text", "doc_id", max_tokens=3)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk) == ["a b c", "d e"]
    # leading AND trailing whitespace yield empty edge tokens (same as SQL)
    d2 = out[out.doc_id == 2]
    assert " ".join(d2.chunk) == " lead and trail "
