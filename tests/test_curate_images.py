"""Image-curation capstone: planted clone clusters keep only the best
resolution, blurry/saturated/undecodable/invalid-field rows drop, stats
ledger adds up, re-run determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa

from schema_validator_ray.functions import imagecodec as codec


def _img(rng, w, h):
    return rng.integers(0, 256, size=(h, w)).astype(np.uint8)


def _table():
    rng = np.random.default_rng(4)
    rows = []

    def add(iid, px, fmt="png", w=None, h=None, phash=None, blob=None):
        rows.append({
            "image_id": iid,
            "bytes": blob if blob is not None else codec.encode(px, fmt),
            "w": np.int32(w if w is not None else px.shape[1]),
            "h": np.int32(h if h is not None else px.shape[0]),
            "fmt": fmt,
            "phash": np.int64(phash if phash is not None
                              else np.uint64(codec.phash64(px))
                              .astype(np.int64)),
        })

    base = _img(rng, 40, 30)
    # clone cluster: same phash, three resolutions -> only big-1 survives
    add("big-1", _img(rng, 80, 60), phash=7)
    add("mid-1", _img(rng, 40, 30), phash=7)
    add("small-1", _img(rng, 20, 15), phash=7)
    # near-clone (1 bit off) of the cluster, even bigger -> it wins instead
    add("huge-1", _img(rng, 100, 80), phash=7 ^ (1 << 20))
    # healthy singletons
    add("solo-1", base)
    add("solo-2", _img(rng, 33, 44))
    # blurry: constant pixels -> sharpness 0
    add("blurry", np.full((30, 30), 128, np.uint8))
    # saturated: all-white
    add("satur", np.full((30, 30), 255, np.uint8))
    # undecodable payload
    add("broken", None, blob=b"not an image at all", w=10, h=10,
        phash=12345)
    # invalid fields (payload encoded as png; the FIELD lies)
    px = _img(rng, 10, 10)
    add("badfmt", px, fmt="bmp", blob=codec.encode(px, "png"))
    add("badw", _img(rng, 10, 10), w=-5)
    return pa.Table.from_pylist(rows)


def test_curate_images_end_to_end(ray_session):
    import ray.data as rd

    from schema_validator_ray.pipelines.curate_images import curate_images

    t = _table()
    res = curate_images(rd.from_arrow(t).repartition(3),
                        min_sharpness=0.5, max_saturated_frac=0.9)
    got = sorted(res["curated"].to_pandas()["image_id"])
    # huge-1 wins the phash cluster (hamming(7, 7^2^20)=1 <= 3, max area);
    # big/mid/small dominated; blurry (sharpness 0), satur (frac 1.0),
    # broken (undecodable), badfmt/badw (field validation) all drop
    assert got == ["huge-1", "solo-1", "solo-2"]
    s = res["stats"]
    assert s["input_rows"] == 11
    assert s["after_field_validation"] == 9
    assert s["after_quality_filter"] == 6
    assert s["dominated_near_dups"] == 3
    assert s["curated_rows"] == 3

    # deterministic on re-run and re-partitioning
    res2 = curate_images(rd.from_arrow(t).repartition(5),
                         min_sharpness=0.5, max_saturated_frac=0.9,
                         collect_stats=False)
    assert sorted(res2["curated"].to_pandas()["image_id"]) == got


def test_curate_images_no_dups(ray_session):
    import ray.data as rd

    from schema_validator_ray.pipelines.curate_images import curate_images

    rng = np.random.default_rng(9)
    rows = []
    for i in range(6):
        px = rng.integers(0, 256, size=(20, 20)).astype(np.uint8)
        rows.append({"image_id": f"i{i}", "bytes": codec.encode(px, "png"),
                     "w": np.int32(20), "h": np.int32(20), "fmt": "png",
                     "phash": np.int64(rng.integers(-2**62, 2**62))})
    res = curate_images(rd.from_arrow(pa.Table.from_pylist(rows)),
                        collect_stats=False)
    assert res["curated"].count() == 6


def test_run_curate_resumable(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from schema_validator_ray.pipelines.curate_images import (
        curate_images, run_curate_resumable)

    t = _table()
    shards = []
    for i in range(3):  # 3 shards; the clone cluster SPANS shards
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(t.slice(i * 4, 4), p)
        shards.append(p)
    out = str(tmp_path / "out")

    r1 = run_curate_resumable(shards, out, min_sharpness=0.5,
                              max_saturated_frac=0.9)
    assert sorted(r1["ran"]) == ["00000", "00001", "00002"]
    assert r1["skipped"] == [] and r1["failed"] == []
    assert r1["dominated"] == 3

    # union of per-shard outputs == the single-pass capstone's curated set
    import glob

    got = sorted(pa.concat_tables(
        [pq.read_table(f) for f in
         glob.glob(f"{out}/curated/part-*/curated.parquet")]
    )["image_id"].to_pylist())
    import ray.data as rd

    exp = sorted(curate_images(rd.from_arrow(t), min_sharpness=0.5,
                               max_saturated_frac=0.9,
                               collect_stats=False)["curated"]
                 .to_pandas()["image_id"])
    assert got == exp == ["huge-1", "solo-1", "solo-2"]

    # resume: nothing re-runs, dominated set reused from its digest cache
    r2 = run_curate_resumable(shards, out, min_sharpness=0.5,
                              max_saturated_frac=0.9)
    assert r2["ran"] == [] and len(r2["skipped"]) == 3
    assert r2["dominated"] == 3

    # touching one input invalidates ONLY that shard (digest mismatch) —
    # and the dominated cache (inputs digest changed) recomputes
    import time as _t

    _t.sleep(1.1)
    d0 = pq.read_table(shards[0])
    pq.write_table(d0, shards[0])  # rewrite -> new mtime digest
    r3 = run_curate_resumable(shards, out, min_sharpness=0.5,
                              max_saturated_frac=0.9)
    assert r3["ran"] == ["00000"] and len(r3["skipped"]) == 2

    # changing a curation PARAMETER invalidates everything: the dominated
    # cache and all done shards (round-4 advice — same inputs, new
    # thresholds must not reuse stale state)
    r4 = run_curate_resumable(shards, out, min_sharpness=0.0,
                              max_saturated_frac=1.0)
    assert sorted(r4["ran"]) == ["00000", "00001", "00002"]
    assert r4["skipped"] == []
    # relaxed thresholds admit blurry + satur into the phash pass, where
    # hamming(0, 7) = 3 absorbs them into huge-1's cluster: the dominated
    # set MUST be recomputed (5, was 3) — stale-cache reuse would keep 3
    assert r4["dominated"] == 5


def test_cli_curate(ray_session, tmp_path):
    """Drive the curate subcommand end-to-end: run then resume."""
    import contextlib
    import io
    import json

    from schema_validator_ray.cli import main
    from schema_validator_ray.sources.synth import write_images_dataset

    d = tmp_path / "imgs"
    write_images_dataset(str(d), 300, seed=6, shards=2)

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["curate", "--input", str(d),
                       "--out", str(tmp_path / "cur")])
        return rc, json.loads(buf.getvalue().strip().splitlines()[-1])

    rc, s = run()
    assert rc == 0 and s["ran"] == 2 and s["failed"] == []
    assert 0 < s["curated_rows"] <= 300
    rc2, s2 = run()
    assert rc2 == 0 and s2["ran"] == 0 and s2["skipped"] == 2
