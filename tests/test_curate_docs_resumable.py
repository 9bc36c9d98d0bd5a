"""Resumable document-curation capstone: phase-1 kill/resume byte
parity, shard skip on resume, param invalidation, streaming dedup
against a prior run's seen snapshot."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_corpus(tmp_path, n_shards=3):
    """Planted structure: exact dups across shards, a shared 40+ char
    span, junk-quality rows, embedding near-dups."""
    rng = np.random.default_rng(11)
    span = "this exact forty-plus character span is copied verbatim " \
           "between documents"
    rows = []
    for i in range(24):
        base = (f"document number {i} has plenty of ordinary readable "
                f"words to clear the quality and token thresholds "
                f"{'x' * (i % 3)} end")
        if i in (4, 9):
            base = rows[1]["text"]          # exact dups of doc 1
        if i in (6, 13):
            base = f"intro {i} {span} outro with extra filler words " \
                   f"to stay past the token minimum for curation"
        if i == 17:
            base = "@@@@ ###"               # junk: fails quality
        rows.append({"doc_id": np.int64(i), "text": base})
    t = pa.Table.from_pylist(rows)
    shards = []
    per = len(rows) // n_shards
    for s in range(n_shards):
        p = str(tmp_path / f"docs-{s}.parquet")
        pq.write_table(t.slice(s * per, per), p)
        shards.append(p)
    # embeddings: doc 8 is a near-dup of doc 3 (cos ~1)
    emb = rng.normal(size=(24, 8))
    emb[8] = emb[3] + 1e-4
    ep = str(tmp_path / "emb.npq")  # not *.parquet: the CLI globs the dir
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(24, dtype=np.int64)),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in emb],
                              pa.list_(pa.float32()))}), ep)
    return shards, ep


def _curated(out_dir):
    files = sorted(glob.glob(f"{out_dir}/curated/part-*/curated.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return (t.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_curate_docs_kill_after_phase1_resumes_identically(
        ray_session, tmp_path):
    from schema_validator_ray.pipelines.curate_documents import (
        run_curate_docs_resumable,
    )

    shards, ep = _mk_corpus(tmp_path)
    kw = dict(embeddings_path=ep, min_quality=0.5, min_tokens=8,
              span_k=40, sem_threshold=0.95)

    # reference: uninterrupted run
    out_a = str(tmp_path / "a")
    ra = run_curate_docs_resumable(shards, out_a, **kw)
    assert ra["failed"] == [] and len(ra["ran"]) == 3
    da = _curated(out_a)

    # killed after phase 1, then resumed: byte-identical output
    out_b = str(tmp_path / "b")
    rb1 = run_curate_docs_resumable(shards, out_b,
                                    stop_after_phase1=True, **kw)
    assert rb1["ran"] == [] and rb1["phase1"]["dropped"] > 0
    rb2 = run_curate_docs_resumable(shards, out_b, **kw)
    assert len(rb2["ran"]) == 3
    db = _curated(out_b)
    pd.testing.assert_frame_equal(da, db)

    # planted structure actually exercised every stage
    assert 17 not in da["doc_id"].values              # quality drop
    assert 4 not in da["doc_id"].values               # exact-dup loser
    assert 9 not in da["doc_id"].values
    assert 1 in da["doc_id"].values                   # dup winner kept
    assert 8 not in da["doc_id"].values               # semdedup dominated
    assert 3 in da["doc_id"].values
    t6 = da.set_index("doc_id")["text_dedup"]
    assert "copied verbatim" in t6[6]                 # span winner intact
    assert "copied verbatim" not in t6[13]            # span excised

    # resume: nothing re-runs
    rb3 = run_curate_docs_resumable(shards, out_b, **kw)
    assert rb3["ran"] == [] and len(rb3["skipped"]) == 3

    # parameter change invalidates phase 1 AND all shards
    rb4 = run_curate_docs_resumable(shards, out_b, embeddings_path=ep,
                                    min_quality=0.5, min_tokens=8,
                                    span_k=40, sem_threshold=0.5)
    assert len(rb4["ran"]) == 3 and rb4["skipped"] == []


def test_curate_docs_prior_seen_streaming_dedup(ray_session, tmp_path):
    """A second feed curated against the first run's seen snapshot drops
    every doc whose content an earlier run already admitted."""
    from schema_validator_ray.pipelines.curate_documents import (
        run_curate_docs_resumable,
    )

    shards, ep = _mk_corpus(tmp_path)
    kw = dict(min_quality=0.5, min_tokens=8, span_k=40)
    out1 = str(tmp_path / "run1")
    r1 = run_curate_docs_resumable(shards, out1, **kw)
    d1 = _curated(out1)

    # feed 2: half re-crawled (same text), half genuinely new
    old = pq.read_table(shards[0])
    new_rows = [{"doc_id": np.int64(100 + i),
                 "text": f"a genuinely new crawl document {i} with "
                         f"enough distinct words to pass every filter"}
                for i in range(4)]
    recrawl = old.to_pylist()
    for r in recrawl:
        r["doc_id"] = np.int64(r["doc_id"] + 200)   # new ids, same text
    feed2 = str(tmp_path / "feed2.parquet")
    pq.write_table(pa.Table.from_pylist(new_rows + recrawl), feed2)

    out2 = str(tmp_path / "run2")
    r2 = run_curate_docs_resumable(
        [feed2], out2, prior_seen=os.path.join(out1, "seen"), **kw)
    d2 = _curated(out2)
    assert r2["phase1"]["prior_seen_dropped"] > 0
    # every survivor is from the new half; no re-crawled text survives
    assert set(d2["doc_id"]) <= {100, 101, 102, 103}
    assert not set(d2["text_dedup"]) & set(d1["text_dedup"])


def test_cli_curate_docs(ray_session, tmp_path):
    """Drive the curate-docs subcommand end-to-end: run then resume."""
    import contextlib
    import io
    import json

    from schema_validator_ray.cli import main

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shards, ep = _mk_corpus(docs_dir)

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["curate-docs", "--input", str(docs_dir),
                       "--out", str(tmp_path / "cur"),
                       "--embeddings", ep,
                       "--min-quality", "0.5", "--min-tokens", "8"])
        return rc, json.loads(buf.getvalue().strip().splitlines()[-1])

    rc, s = run()
    assert rc == 0 and s["ran"] == 3 and s["failed"] == []
    assert 0 < s["curated_rows"] < 24 and s["dropped"] > 0
    rc2, s2 = run()
    assert rc2 == 0 and s2["ran"] == 0 and s2["skipped"] == 3
