"""Regression tests for the third review batch."""

import numpy as np
import pyarrow as pa
import pytest

from schema_validator_ray import CompileError, compile_ruleset


def test_binary_column_size_rules_no_utf8_cast():
    """min/max/len on a binary column must measure raw bytes (image payloads
    are not valid UTF-8)."""
    blobs = [b"\xff\xfe\x00abc", b"x", None]
    tbl = pa.table({"bytes": pa.array(blobs, pa.binary())})
    pm, v = compile_ruleset({"bytes": "min=2"}, tbl.schema).evaluate(tbl)
    assert list(pm) == [True, False, False]
    pm, _ = compile_ruleset({"bytes": "len=6"}, tbl.schema).evaluate(tbl)
    assert list(pm) == [True, False, False]


def test_narrow_int_key_hashing():
    from schema_validator_ray.functions.sketches import hash_column
    from schema_validator_ray.stages.referential import _hash_keys

    for t in (pa.int16(), pa.int32(), pa.uint32()):
        col = pa.array([1, 2, None, 3], type=t)
        assert len(_hash_keys(col)) == 4
        assert len(hash_column(col)) == 4


def test_manifest_survives_crashed_tmp_file(tmp_path):
    from schema_validator_ray.state.manifest import Manifest

    man = Manifest(str(tmp_path))
    man.record(partition_id="00000", input_path=__file__, status="done",
               attempt=1, rows=10, failed_rows=0, violations=0,
               wall_seconds=0.1, job_id="j")
    # simulate a crash mid-record: a truncated stray file in the manifest dir
    (tmp_path / "manifest" / ".tmp-deadbeef").write_bytes(b"truncated garbage")
    (tmp_path / "manifest" / "not-a-manifest.parquet").write_bytes(b"junk")
    rows = man.load()  # must not raise on non-part files
    assert rows["00000"]["status"] == "done"


def test_out_of_range_param_is_compile_error():
    tbl = pa.table({"u": pa.array([1, 2], pa.uint32())})
    with pytest.raises(CompileError):
        compile_ruleset({"u": "min=-1"}, tbl.schema)


def test_latitude_nan_passes_go_parity():
    """Go strconv.ParseFloat('NaN') succeeds and NaN fails neither bound ->
    the reference PASSES 'NaN' (rule/format.go:360-367)."""
    tbl = pa.table({"x": pa.array(["NaN", "nan", "+NaN", "91.0", "45.0"])})
    pm, _ = compile_ruleset({"x": "latitude"}, tbl.schema).evaluate(tbl)
    assert list(pm) == [True, True, True, False, True]


def test_bloom_null_keys_flagged(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.referential import referential_violations

    main = rd.from_arrow(pa.table({"k": pa.array(["x", None, ""])}))
    side = pa.table({"k": pa.array(["x", ""])})
    out = referential_violations(main, side, "k",
                                 bloom_bits=1 << 16).to_pandas()
    # null is always missing even though "" is present in the side table
    assert len(out) == 1 and out.k.isna().iloc[0]


def test_failed_rows_metric_counts_rows_not_distinct_ids(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from schema_validator_ray.pipelines.validate_images import validate_images
    from schema_validator_ray.sources.synth import synth_batch

    tbl = synth_batch(0, 400, seed=21, clean=True)
    # force 10 rows to share image_id "" and fail `required`
    ids = tbl["image_id"].to_pylist()
    for i in range(10):
        ids[i] = ""
    tbl = tbl.set_column(0, "image_id", pa.array(ids, pa.string()))
    d = tmp_path / "imgs"
    d.mkdir()
    pq.write_table(tbl, str(d / "part-0.parquet"))
    res = validate_images(str(d), decode=False)
    res["violations"].count()
    assert res["failed_rows"] >= 10  # 10 rows, not 1 distinct empty id
