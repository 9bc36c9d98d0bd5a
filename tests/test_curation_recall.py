"""Curation pipeline behavior + ANN recall measurements."""

import numpy as np
import pyarrow as pa
import pytest


def test_curate_documents(ray_session):
    import ray.data as rd

    from schema_validator_ray.pipelines.curate_documents import curate_documents

    rows = []
    good = ("a perfectly reasonable document with plenty of words and letters "
            "that clearly passes every quality bar we could set here today")
    for i in range(30):
        rows.append((i, f"{good} variant {i}"))
    rows.append((100, good + " variant 0"))      # exact dup of doc 0... no:
    rows[-1] = (100, rows[0][1])                 # exact duplicate of doc 0
    rows.append((101, "!!! ??? ###"))            # low quality
    rows.append((102, "too short"))              # too few tokens
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    res = curate_documents(ds, min_quality=0.5, min_tokens=10)
    kept = set(res["curated"].to_pandas().doc_id)
    assert 0 in kept and 100 not in kept          # dedup keeps min id
    assert 101 not in kept and 102 not in kept    # filters
    assert res["stats"]["kept"] == len(kept) == 30


def test_ivf_recall_at_5(ray_session):
    """IVF with n_probe=2 of 8 cells must recover most of the brute-force
    top-5 (deterministic seeded data — the measured recall is stable)."""
    import ray.data as rd

    from schema_validator_ray.stages.similarity import IVFIndex, knn_brute

    rng = np.random.default_rng(17)
    mat = rng.standard_normal((600, 32))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(600), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), 32),
    })
    ds = rd.from_arrow(tbl)
    queries = mat[:10]
    exact = knn_brute(ds, queries, k=5).to_pandas()
    ivf = IVFIndex(n_cells=8, n_probe=2).build(ds).search(queries, k=5).to_pandas()
    hits = tot = 0
    for qi in range(10):
        want = set(exact[exact.query_id == qi].neighbor_id)
        got = set(ivf[ivf.query_id == qi].neighbor_id)
        hits += len(want & got)
        tot += len(want)
    recall = hits / tot
    assert recall >= 0.5, recall   # 2/8 cells probed; recall well above chance
    # full probe == exact (already covered elsewhere, re-assert cheaply)
    full = IVFIndex(n_cells=8, n_probe=8).build(ds).search(queries, k=5).to_pandas()
    for qi in range(10):
        assert (set(full[full.query_id == qi].neighbor_id)
                == set(exact[exact.query_id == qi].neighbor_id))


def test_manifest_digest_change_triggers_rerun(ray_session, tmp_path):
    import os

    from schema_validator_ray.pipelines.validate_images import run_resumable
    from schema_validator_ray.sources.synth import write_images_dataset

    d = tmp_path / "imgs"
    paths = write_images_dataset(str(d), 600, seed=3, shards=2)
    out = str(tmp_path / "out")
    r1 = run_resumable(paths, out, decode=False, job_id="a")
    assert len(r1["ran"]) == 2
    # touch one input file's content -> its digest changes -> re-run just it
    import pyarrow.parquet as pq

    t = pq.read_table(paths[0])
    pq.write_table(t, paths[0])  # rewrite => new mtime/size-digest
    os.utime(paths[0], (0, 0))
    os.utime(paths[0])
    r2 = run_resumable(paths, out, decode=False, job_id="b")
    assert len(r2["ran"]) == 1 and len(r2["skipped"]) == 1
    pid = r2["ran"][0]
    assert r2["manifest"][pid]["attempt"] == 2


def test_curate_near_dup_removal(ray_session):
    import ray.data as rd

    from schema_validator_ray.pipelines.curate_documents import curate_documents

    base = ("the quick brown fox jumps over the lazy dog while the river "
            "flows gently through the quiet green valley under a pale sky")
    rows = [(i, f"distinct document {i} with unrelated content body "
             + " ".join(f"tok{i}_{j}" for j in range(15))) for i in range(20)]
    rows.append((200, base))
    rows.append((201, base.replace("quiet", "silent")))  # near dup of 200
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    res = curate_documents(ds, min_quality=0.3, min_tokens=5, near_dup=True,
                           near_dup_threshold=0.7)
    kept = set(res["curated"].to_pandas().doc_id)
    assert 200 in kept and 201 not in kept   # near-dup drops the higher id
    assert res["stats"]["near_dup_dropped"] == 1


def test_curate_near_dup_transitive_chain(ray_session):
    """A near-dup CHAIN a~b~c (where a,c may not collide directly) collapses
    to one survivor via connected components."""
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.pipelines.curate_documents import (
        curate_documents,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find some tasty food " * 3)
    b = base.replace("quick", "rapid")
    c = b.replace("lazy", "idle").replace("green", "dark")
    others = [f"completely unrelated document number {i} with plenty of "
              f"distinct words to pass the quality and token filters easily "
              f"padding padding {i} " * 3 for i in range(10)]
    df = pd.DataFrame({"doc_id": list(range(13)),
                       "text": [base, b, c] + others})
    res = curate_documents(rd.from_pandas(df), min_quality=0.3, min_tokens=5,
                           near_dup=True, near_dup_threshold=0.5)
    kept = sorted(r["doc_id"] for r in res["curated"].take_all())
    assert 0 in kept                       # chain survivor = min id
    assert 1 not in kept and 2 not in kept # whole chain collapsed
    assert res["stats"]["near_dup_dropped"] >= 2
