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
