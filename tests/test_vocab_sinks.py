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


def test_ivf_cells_as_storage_partitions(ray_session, tmp_path):
    """The SCALE.md claim made concrete: IVF cell id is the storage partition
    key — cell-assigned embeddings written hive-partitioned, so a probe of
    n_probe cells reads only those directories."""
    import numpy as np
    import ray.data as rd

    from schema_validator_ray.sources.sinks import (
        list_partitions,
        read_partitioned,
        write_partitioned,
    )
    from schema_validator_ray.stages.similarity import IVFIndex

    rng = np.random.default_rng(4)
    mat = rng.standard_normal((200, 8))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), 8),
    })
    ivf = IVFIndex(n_cells=4, n_probe=2).build(rd.from_arrow(tbl))
    out = str(tmp_path / "cells")
    # embedding (fixed_size_list) is kept out of the partitioned write here —
    # the on-disk demo only needs (id, cell); real tables keep the vectors
    ids_cells = ivf._assigned.map_batches(
        lambda b: pa.table({"vec_id": b["vec_id"], "cell": b["cell"]}),
        batch_format="pyarrow")
    write_partitioned(ids_cells, out, "cell")
    parts = list_partitions(out, "cell")
    assert len(parts) >= 2                      # multiple populated cells
    # pruned read of ONE cell returns exactly that cell's members
    one = parts[0]
    sub = read_partitioned(out + f"/cell={one}").take_all()
    cells = ivf._assigned.to_pandas().set_index("vec_id")["cell"]
    assert len(sub) > 0
    assert all(cells[r["vec_id"]] == int(one) for r in sub)
    total = sum(len(read_partitioned(out + f"/cell={p}").take_all())
                for p in parts)
    assert total == 200


def test_bucket_join_matches_plain_join(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.sources.sinks import bucket_join, write_bucketed

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 300).astype(np.int64),
        "a": np.arange(300, dtype=np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(25, 75, 120).astype(np.int64),
        "b": np.arange(120, dtype=np.int64) * 10})
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_pandas(left).repartition(5), ld, "k", 8)
    write_bucketed(rd.from_pandas(right).repartition(3), rd_, "k", 8)

    got = (bucket_join(ld, rd_, "k", n_buckets=8)
           .to_pandas().sort_values(["k", "a", "b"]).reset_index(drop=True))
    exp = (left.merge(right, on="k")
           .sort_values(["k", "a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "a", "b"]], exp[["k", "a", "b"]])


def test_bucket_join_left_outer_null_keys(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.sources.sinks import bucket_join, write_bucketed

    left = pd.DataFrame({"k": pd.array([1, 2, None, 4], dtype="Int64"),
                         "a": ["w", "x", "y", "z"]})
    right = pd.DataFrame({"k": pd.array([2, None], dtype="Int64"),
                          "b": pd.array([20, 99], dtype="Int64")})
    ld, rdir = str(tmp_path / "lo_l"), str(tmp_path / "lo_r")
    write_bucketed(rd.from_pandas(left), ld, "k", 4)
    write_bucketed(rd.from_pandas(right), rdir, "k", 4)
    got = (bucket_join(ld, rdir, "k", n_buckets=4, join_type="left outer")
           .to_pandas().sort_values("a").reset_index(drop=True))
    # null keys never match; the null-key LEFT row survives unmatched
    assert got["a"].tolist() == ["w", "x", "y", "z"]
    assert got["b"].fillna(-1).tolist() == [-1, 20, -1, -1]


def test_bucket_join_column_pruning(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.sources.sinks import bucket_join, write_bucketed

    left = pd.DataFrame({"k": [1, 2], "a": [1, 2], "junk": ["p", "q"]})
    right = pd.DataFrame({"k": [1, 2], "b": [5, 6]})
    ld, rdir = str(tmp_path / "cp_l"), str(tmp_path / "cp_r")
    write_bucketed(rd.from_pandas(left), ld, "k", 2)
    write_bucketed(rd.from_pandas(right), rdir, "k", 2)
    out = bucket_join(ld, rdir, "k", n_buckets=2,
                      columns_l=["k", "a"]).to_pandas()
    assert sorted(out.columns) == ["a", "b", "k"]


def test_bucket_join_semi_anti(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.sources.sinks import bucket_join, write_bucketed

    left = pd.DataFrame({"k": [1, 2, 3, 4], "a": ["w", "x", "y", "z"]})
    right = pd.DataFrame({"k": [2, 4, 4], "b": [1, 2, 3]})
    ld, rdir = str(tmp_path / "sa_l"), str(tmp_path / "sa_r")
    write_bucketed(rd.from_pandas(left), ld, "k", 3)
    write_bucketed(rd.from_pandas(right), rdir, "k", 3)
    semi = bucket_join(ld, rdir, "k", n_buckets=3,
                       join_type="left semi").to_pandas()
    assert sorted(semi["a"]) == ["x", "z"]  # one row per left match
    anti = bucket_join(ld, rdir, "k", n_buckets=3,
                       join_type="left anti").to_pandas()
    assert sorted(anti["a"]) == ["w", "y"]
