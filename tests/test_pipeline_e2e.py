"""End-to-end flagship pipeline over the synthetic image/caption table (FIXTURES
F1): seeded violations are recovered exactly; per-partition resume (F7); drift
fixtures (F6): identical split passes, shifted split fails."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from schema_validator_ray.pipelines.validate_images import (
    IMAGE_SPEC,
    run_resumable,
    validate_images,
)
from schema_validator_ray.sources.synth import (
    synth_batch,
    write_captions_side_table,
    write_images_dataset,
)

N_ROWS = 3000


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("svr")
    write_images_dataset(str(d / "images"), N_ROWS, seed=42, shards=4)
    write_captions_side_table(str(d / "captions.parquet"), str(d / "images"))
    return d


def _oracle_row_violations(tbl: pa.Table) -> dict[str, int]:
    """Independent row-at-a-time oracle for the metadata rules (mirrors the
    reference's per-record semantics; deliberately NOT the vectorized code path)."""
    import re
    import uuid as uuid_mod

    counts: dict[str, int] = {}

    def bump(rule):
        counts[rule] = counts.get(rule, 0) + 1

    uuid_re = re.compile(
        r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
        r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
    for row in tbl.to_pylist():
        iid = row["image_id"]
        if not iid:
            bump("required")
        if not uuid_re.match(iid):  # rules run in order, no short-circuit:
            bump("uuid")            # "" fails required AND uuid (schema/field.go:16-29)
        for c in ("w", "h"):
            v = row[c]
            if v is None or v == 0:
                bump("required")
            v0 = 0 if v is None else v  # nil coerces to zero (pinned divergence)
            if v0 < 1:
                bump("min")
            if v0 > 65535:
                bump("max")
        if not row["fmt"]:
            bump("required")
        if row["fmt"] not in ("png", "jpeg", "webp"):
            bump("oneof")  # "" is not in the oneof set either
        cap = row["caption"]
        if not cap:
            bump("required")
        else:
            if any(not (0x20 <= ord(ch) <= 0x7E) for ch in cap):
                bump("printascii")
            if len(cap.encode()) > 2000:
                bump("max")
    return counts


def test_metadata_rules_match_row_oracle(data_dir, ray_session):
    res = validate_images(str(data_dir / "images"), decode=False)
    vio = res["violations"].to_pandas()
    got = vio[~vio.rule_id.str.startswith(("unique", "referential", "image"))]
    got_counts = got.groupby("rule_id").size().to_dict()

    import pyarrow.dataset as pads

    tbl = pads.dataset(str(data_dir / "images")).to_table()
    want = _oracle_row_violations(tbl)
    assert got_counts == want


def test_uniqueness_finds_seeded_duplicates(data_dir, ray_session):
    from schema_validator_ray.stages.uniqueness import duplicate_keys

    import ray.data as rd

    ds = rd.read_parquet(str(data_dir / "images"), columns=["image_id", "phash"])
    dup_ids = duplicate_keys(ds, "image_id").to_pandas()
    # exact: compare against pandas value_counts
    import pyarrow.dataset as pads

    pdf = pads.dataset(str(data_dir / "images")).to_table(
        columns=["image_id", "phash"]).to_pandas()
    vc = pdf.image_id.value_counts()
    want = set(vc[vc > 1].index)
    assert set(dup_ids.image_id) == want
    assert dict(zip(dup_ids.image_id, dup_ids.dup_count)) == vc[vc > 1].to_dict()

    dup_ph = duplicate_keys(ds, "phash").to_pandas()
    vcp = pdf.phash.value_counts()
    assert set(dup_ph.phash) == set(vcp[vcp > 1].index)
    # the seeded hot bucket exists and is skewed
    assert vcp.iloc[0] > 3


def test_referential_violations_exact(data_dir, ray_session):
    import pyarrow.dataset as pads

    import ray.data as rd

    from schema_validator_ray.stages.referential import referential_violations

    ds = rd.read_parquet(str(data_dir / "images"), columns=["image_id"])
    got = referential_violations(ds, str(data_dir / "captions.parquet"),
                                 "image_id").to_pandas()
    img_ids = pads.dataset(str(data_dir / "images")).to_table(
        columns=["image_id"])["image_id"].to_pylist()
    cap_ids = set(pq.read_table(str(data_dir / "captions.parquet"),
                                columns=["image_id"])["image_id"].to_pylist())
    want = [i for i in img_ids if i not in cap_ids]
    assert sorted(got.image_id) == sorted(want)
    assert len(want) > 0


def test_referential_bloom_mode(data_dir, ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.referential import referential_violations

    ds = rd.read_parquet(str(data_dir / "images"), columns=["image_id"])
    exact = referential_violations(
        ds, str(data_dir / "captions.parquet"), "image_id").to_pandas()
    bloom = referential_violations(
        ds, str(data_dir / "captions.parquet"), "image_id",
        bloom_bits=1 << 20).to_pandas()
    # bloom has no false negatives: everything it flags is a subset of exact
    assert set(bloom.image_id) <= set(exact.image_id)
    # and with 2^20 bits for ~3k keys, FP≈0 → equal in practice
    assert len(bloom) >= 0.95 * len(exact)


def test_decode_leg_catches_truncation_and_dims(data_dir, ray_session):
    res = validate_images(str(data_dir / "images"), decode=True)
    vio = res["violations"].to_pandas()
    img = vio[vio.rule_id.str.startswith("image_")]
    assert (img.rule_id == "image_decode").sum() > 0
    assert (img.rule_id == "image_dims").sum() > 0
    # clean table produces zero image violations
    clean = synth_batch(0, 300, seed=9, clean=True)
    from schema_validator_ray.stages.images import DecodeCheckStage, image_violations

    out = image_violations(DecodeCheckStage()(clean))
    assert out.num_rows == 0


def test_drift_identical_passes_shifted_fails(ray_session, tmp_path):
    import ray.data as rd

    from schema_validator_ray.stages.drift import compare_profiles
    from schema_validator_ray.stages.stats import profile_dataset

    a = synth_batch(0, 2000, seed=1, clean=True)
    b = synth_batch(2000, 2000, seed=1, clean=True)
    # shifted: double w
    import pyarrow.compute as pc

    shifted = b.set_column(b.schema.get_field_index("w"), "w",
                           pc.cast(pc.multiply(b["w"], 3), pa.int32()))
    pa_ds = lambda t: rd.from_arrow(t)
    prof_a = profile_dataset(pa_ds(a), numeric=("w", "h"), categorical=("fmt",))
    prof_b = profile_dataset(pa_ds(b), numeric=("w", "h"), categorical=("fmt",))
    prof_s = profile_dataset(pa_ds(shifted), numeric=("w", "h"), categorical=("fmt",))

    same = {d["column"]: d for d in compare_profiles(prof_a, prof_b)
            if d["metric"] == "ks"}
    assert all(v["ok"] for v in same.values()), same
    drifted = {d["column"]: d for d in compare_profiles(prof_a, prof_s)
               if d["metric"] == "ks"}
    assert not drifted["w"]["ok"]
    assert drifted["h"]["ok"]


def test_resume_skips_done_partitions(data_dir, ray_session, tmp_path):
    out = str(tmp_path / "out")
    paths = sorted(
        os.path.join(str(data_dir / "images"), f)
        for f in os.listdir(str(data_dir / "images")))
    r1 = run_resumable(paths[:2], out, decode=False, job_id="j1")
    assert len(r1["ran"]) == 2 and not r1["skipped"]
    # second run over all 4: first two are skipped, outputs identical
    r2 = run_resumable(paths, out, decode=False, job_id="j2")
    assert sorted(r2["skipped"]) == sorted(r1["ran"])
    assert len(r2["ran"]) == 2
    man = r2["manifest"]
    assert all(v["status"] == "done" for v in man.values())
    # a fresh full run produces the same violation multiset as the resumed union
    fresh_dir = str(tmp_path / "fresh")
    r3 = run_resumable(paths, fresh_dir, decode=False, job_id="j3")
    assert len(r3["ran"]) == 4

    def all_viol(root):
        frames = []
        vdir = os.path.join(root, "violations")
        for part in sorted(os.listdir(vdir)):
            frames.append(pq.read_table(
                os.path.join(vdir, part, "violations.parquet")).to_pandas())
        import pandas as pd

        df = pd.concat(frames).sort_values(
            ["image_id", "rule_id", "column"]).reset_index(drop=True)
        return df

    pd1, pd2 = all_viol(out), all_viol(fresh_dir)
    assert pd1.equals(pd2)


def test_resume_fragments_parquet(data_dir, ray_session, tmp_path):
    """Fragment-level resume over a parquet dir: manifest rows carry stable
    frag-NNNNN ids + digests; an unchanged fragment is skipped, a touched
    one re-runs with a bumped attempt."""
    from schema_validator_ray.pipelines.validate_images import (
        run_resumable_fragments,
    )

    out = str(tmp_path / "out")
    img_dir = str(data_dir / "images")
    r1 = run_resumable_fragments(img_dir, out, decode=False, job_id="j1")
    n = len(r1["ran"])
    assert n >= 2 and not r1["skipped"]
    assert all(p.startswith("frag-") for p in r1["ran"])
    r2 = run_resumable_fragments(img_dir, out, decode=False, job_id="j2")
    assert not r2["ran"] and len(r2["skipped"]) == n
    # digest change (rewrite one shard) re-runs exactly that fragment
    victim = sorted(os.listdir(img_dir))[0]
    vp = os.path.join(img_dir, victim)
    t = pq.read_table(vp)
    pq.write_table(t, vp)  # rewrite -> new mtime/size digest
    r3 = run_resumable_fragments(img_dir, out, decode=False, job_id="j3")
    assert r3["ran"] == ["frag-00000"] and len(r3["skipped"]) == n - 1
    assert r3["manifest"]["frag-00000"]["attempt"] == 2


def test_resume_fragments_lance(ray_session, tmp_path):
    """Gated: exercises the Lance get_fragments() path when the package is
    available (absent in this container — the parquet test above proves the
    fragment-id manifest flow on the fallback)."""
    pytest.importorskip("lance")
    import lance

    from schema_validator_ray.pipelines.validate_images import (
        run_resumable_fragments,
    )
    from schema_validator_ray.sources.lance_io import scan_fragments
    from schema_validator_ray.sources.synth import synth_batch

    tbl = synth_batch(0, 300, seed=3)
    path = str(tmp_path / "imgs.lance")
    lance.write_dataset(tbl, path, max_rows_per_file=100)
    frags = scan_fragments(path)
    assert len(frags) >= 2
    out = str(tmp_path / "out")
    r1 = run_resumable_fragments(path, out, decode=False, job_id="j1")
    assert len(r1["ran"]) == len(frags)
    r2 = run_resumable_fragments(path, out, decode=False, job_id="j2")
    assert not r2["ran"] and len(r2["skipped"]) == len(frags)


def _vio_keyset(res):
    df = res["violations"].to_pandas()
    return set(map(tuple, df[["image_id", "rule_id", "column",
                              "offending_value"]].itertuples(index=False)))


def test_ref_strategy_shuffle_matches_broadcast(data_dir, ray_session):
    """Forcing the hash-partitioned shuffle anti-join through the flagship
    yields the identical violation multiset as the broadcast default, and the
    auto switch picks shuffle when the side exceeds the broadcast budget."""
    imgs, caps = str(data_dir / "images"), str(data_dir / "captions.parquet")
    base = _vio_keyset(validate_images(imgs, captions_path=caps, decode=False,
                                       ref_strategy="broadcast"))
    shuf = _vio_keyset(validate_images(imgs, captions_path=caps, decode=False,
                                       ref_strategy="shuffle"))
    assert shuf == base
    # auto + tiny budget must route to shuffle and still match
    auto = _vio_keyset(validate_images(imgs, captions_path=caps, decode=False,
                                       ref_strategy="auto",
                                       ref_broadcast_max=10))
    assert auto == base


def test_ref_strategy_bloom_is_sound(data_dir, ray_session):
    """Bloom referential: every flagged row is truly missing (soundness) and
    with 16 bits/key the seeded fixture's misses are all found; non-referential
    rules are untouched."""
    imgs, caps = str(data_dir / "images"), str(data_dir / "captions.parquet")
    base = _vio_keyset(validate_images(imgs, captions_path=caps, decode=False,
                                       ref_strategy="broadcast"))
    bloom = _vio_keyset(validate_images(imgs, captions_path=caps, decode=False,
                                        ref_strategy="bloom",
                                        ref_bloom_bits=16 * N_ROWS))
    base_ref = {t for t in base if t[1] == "referential"}
    bloom_ref = {t for t in bloom if t[1] == "referential"}
    assert bloom_ref <= base_ref                      # sound
    assert len(bloom_ref) >= 0.9 * len(base_ref)      # near-complete here
    assert {t for t in bloom if t[1] != "referential"} == \
        {t for t in base if t[1] != "referential"}


def test_resumable_per_partition_drift_verdict(ray_session, tmp_path):
    """North rule: each partition emits pass/fail + metrics. A clean shard
    validated against its own profile passes; against a reference whose w
    distribution is shifted, the partition fails with drift_ok=False."""
    import uuid as _uuid

    import numpy as np

    from schema_validator_ray.pipelines.validate_images import run_resumable
    from schema_validator_ray.stages.stats import (
        profile_dataset,
        save_profiles,
    )
    from schema_validator_ray.sources.pq_read import read_parquet_clean

    rng = np.random.default_rng(3)
    n = 400

    def clean_table(w_scale: int) -> pa.Table:
        return pa.table({
            "image_id": pa.array([str(_uuid.UUID(int=i + 1)) for i in range(n)]),
            "w": pa.array((rng.integers(10, 90, n) * w_scale)
                          .astype(np.int32)),
            "h": pa.array(rng.integers(10, 90, n).astype(np.int32)),
            "fmt": pa.array(rng.choice(["png", "jpeg", "webp"], n)),
            "caption": pa.array([f"caption {i}" for i in range(n)]),
            "phash": pa.array(np.arange(n, dtype=np.int64) * 7919),
        })

    shard = str(tmp_path / "clean.parquet")
    pq.write_table(clean_table(1), shard)
    profs = profile_dataset(read_parquet_clean(shard),
                            numeric=("w", "h"), categorical=("fmt",))
    ref_path = str(tmp_path / "ref.profile")
    save_profiles(profs, ref_path)
    from schema_validator_ray.stages.stats import load_profiles

    ref = load_profiles(ref_path)

    out1 = str(tmp_path / "out1")
    r1 = run_resumable([shard], out1, decode=False, reference_profile=ref)
    row = list(r1["manifest"].values())[0]
    assert row["verdict"] == "pass" and row["drift_ok"] is True

    shifted = str(tmp_path / "shifted.parquet")
    pq.write_table(clean_table(5), shifted)
    out2 = str(tmp_path / "out2")
    r2 = run_resumable([shifted], out2, decode=False, reference_profile=ref)
    row = list(r2["manifest"].values())[0]
    assert row["drift_ok"] is False and row["verdict"] == "fail"


def test_resumable_isolates_broken_partition(data_dir, ray_session, tmp_path):
    """A corrupt shard records a failed manifest row and the run continues;
    the next invocation retries ONLY the broken partition (attempt+1) and
    succeeds once the shard is repaired."""
    import shutil as _sh

    paths = sorted(
        os.path.join(str(data_dir / "images"), f)
        for f in os.listdir(str(data_dir / "images")))[:3]
    work = tmp_path / "shards"
    work.mkdir()
    local = []
    for p in paths:
        dst = work / os.path.basename(p)
        _sh.copy(p, dst)
        local.append(str(dst))
    victim = local[1]
    good_bytes = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")

    out = str(tmp_path / "out")
    r1 = run_resumable(local, out, decode=False, job_id="j1")
    assert len(r1["ran"]) == 2 and r1["failed"] == ["00001"]
    row = r1["manifest"]["00001"]
    assert row["status"] == "failed" and row["verdict"] == "fail"

    with open(victim, "wb") as f:
        f.write(good_bytes)
    r2 = run_resumable(local, out, decode=False, job_id="j2")
    assert r2["ran"] == ["00001"] and not r2["failed"]
    assert len(r2["skipped"]) == 2
    assert r2["manifest"]["00001"]["status"] == "done"
    assert r2["manifest"]["00001"]["attempt"] == 2
