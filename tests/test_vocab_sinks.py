"""Vocabulary top-k operator and partitioned parquet sink."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def test_vocab_topk_counts_and_ties(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import vocab_topk

    ds = rd.from_arrow(pa.table({"text": [
        "the cat and the dog", "The DOG runs fast!", None, "cat,cat; zebra",
        "", "a-b b2c the"]})).repartition(3)
    got = vocab_topk(ds, "text", 4).take_all()
    # the=4, cat=3, dog=2, then the count-1 tie block ascending: "a" first
    assert [(r["word"], r["cnt"]) for r in got] == [
        ("the", 4), ("cat", 3), ("dog", 2), ("a", 1)]


def test_write_partitioned_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from schema_validator_ray.sources.sinks import (
        list_partitions,
        read_partitioned,
        write_partitioned,
    )

    tbl = pa.table({"doc_id": list(range(12)),
                    "lang": ["en", "de", "en", "fr"] * 3,
                    "n": [float(i) for i in range(12)]})
    out = str(tmp_path / "parts")
    write_partitioned(rd.from_arrow(tbl).repartition(4), out, "lang")
    assert list_partitions(out, "lang") == ["de", "en", "fr"]
    # hive layout on disk: one dir per value, real parquet files inside
    en_files = [f for f in os.listdir(os.path.join(out, "lang=en"))
                if f.endswith(".parquet")]
    assert en_files
    assert pq.read_table(
        os.path.join(out, "lang=en", en_files[0])).num_rows >= 1
    back = read_partitioned(out).take_all()
    assert len(back) == 12
    got = sorted((r["doc_id"], r["lang"], r["n"]) for r in back)
    want = sorted(zip(tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist(),
                      tbl["n"].to_pylist()))
    assert got == want
