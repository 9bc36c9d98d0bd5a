"""Pixel-intensity histogram drift (north star: intensity histograms feed the
KS/PSI drift check): identical splits pass, brightness-shifted split fails."""

import numpy as np
import pyarrow as pa
import pytest

from schema_validator_ray.functions import imagecodec as codec
from schema_validator_ray.sources.synth import SCHEMA


def _table(seed: int, n: int = 300, bright: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in range(n):
        w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        px = rng.integers(0, 128, (h, w), dtype=np.uint8)  # dark-ish base
        if bright:
            px = np.clip(px.astype(np.int32) + bright, 0, 255).astype(np.uint8)
        blob = codec.encode(px, "png")
        ids.append(f"id{seed}-{i}")
        blobs.append(blob)
        ws.append(w)
        hs.append(h)
        fmts.append("png")
        caps.append("caption text")
        phs.append(codec.phash64(px))
    return pa.table({"image_id": pa.array(ids), "bytes": pa.array(blobs, pa.binary()),
                     "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
                     "fmt": pa.array(fmts), "caption": pa.array(caps),
                     "phash": pa.array(phs, pa.int64())})


def _profile_of(tmp_path, name, tbl, ray_session):
    import pyarrow.parquet as pq

    from schema_validator_ray.pipelines.validate_images import validate_images

    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, str(d / "part-0.parquet"))
    res = validate_images(str(d), decode=True)
    res["violations"].count()  # consume
    return res["profile"]


def test_intensity_histogram_collected_and_drift(ray_session, tmp_path):
    from schema_validator_ray.stages.drift import compare_profiles

    prof_a = _profile_of(tmp_path, "a", _table(1), ray_session)
    prof_b = _profile_of(tmp_path, "b", _table(2), ray_session)
    prof_shifted = _profile_of(tmp_path, "c", _table(3, bright=100), ray_session)

    assert "__intensity__" in prof_a
    assert int(prof_a["__intensity__"].sum()) > 0

    same = {d["column"]: d for d in compare_profiles(prof_a, prof_b)}
    assert same["__intensity__"]["ok"], same["__intensity__"]

    drift = {d["column"]: d for d in compare_profiles(prof_a, prof_shifted)}
    assert not drift["__intensity__"]["ok"], drift["__intensity__"]


def test_profile_save_load_roundtrip_with_intensity(ray_session, tmp_path):
    from schema_validator_ray.stages.drift import compare_profiles
    from schema_validator_ray.stages.stats import load_profiles, save_profiles

    prof = _profile_of(tmp_path, "s", _table(5), ray_session)
    path = str(tmp_path / "ref.pkl")
    save_profiles(prof, path)
    loaded = load_profiles(path)
    assert set(loaded) == set(prof)
    res = {d["column"]: d for d in compare_profiles(loaded, prof)}
    assert all(v["ok"] for v in res.values())
