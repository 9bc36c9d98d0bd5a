"""Flagship pipeline: full validation of the canonical image/caption table.

Composition (each leg is an independent lazy Dataset; nothing materializes the
input mid-pipeline):

  metadata leg   read(columns w/o bytes)  -> RuleStage(row-local rules)  -> violations
  decode leg     read(id,bytes,w,h,phash) -> ImageViolationsStage (actor pool,
                 small batches — the bytes column is wide)               -> violations
  uniqueness     pre-aggregated (key,count) partials -> groupby -> broadcast filter
  referential    captions key side broadcast -> anti-join filter          -> violations
  stats/drift    ColumnProfilerStage partials -> driver merge -> KS/PSI verdicts

Two separate column-pruned reads beat one fat read: the metadata leg streams
thousands of rows per block while the decode leg uses small batches (SURVEY §7.4.8).
"""

from __future__ import annotations

import time
from typing import Any

import pyarrow as pa

from ..engine import RuleStage
from ..stages.drift import compare_profiles
from ..stages.images import ImageViolationsStage
from ..stages.referential import referential_violations
from ..stages.stats import profile_dataset
from ..stages.uniqueness import uniqueness_violations

# row-local rules for the input_hint schema (the reference-rule profile for the
# image table; see FIXTURES.md F1 for which seeded violation trips which rule)
IMAGE_SPEC: dict[str, str] = {
    "image_id": "required|uuid",
    "w": "required|min=1|max=65535",
    "h": "required|min=1|max=65535",
    "fmt": "required|oneof=png,jpeg,webp",
    "caption": "required|printascii|max=2000",
}

META_COLUMNS = ["image_id", "w", "h", "fmt", "caption", "phash"]
DECODE_COLUMNS = ["image_id", "bytes", "w", "h", "phash"]
VIOLATION_COLUMNS = ["image_id", "rule_id", "column", "offending_value"]


def _std(ds):
    return ds.select_columns(VIOLATION_COLUMNS)


def validate_images(input_dir: str, *, captions_path: str | None = None,
                    reference_profile: dict | None = None,
                    decode: bool = True,
                    meta_batch_size: int = 8192,
                    decode_batch_size: int = 512,
                    decode_concurrency: int | None = None) -> dict[str, Any]:
    """Returns lazy Datasets + driver-side small results:
       {violations: Dataset, profile: {col: ColumnProfile}, drift: [verdicts],
        summary: fn() -> dict}  — callers consume/write what they need."""
    import ray.data as rd

    meta = rd.read_parquet(input_dir, columns=META_COLUMNS)

    legs = [
        _std(meta.map_batches(
            RuleStage(IMAGE_SPEC, id_column="image_id", mode="violations"),
            batch_format="pyarrow", batch_size=meta_batch_size)),
        uniqueness_violations(meta, "image_id", id_column="image_id",
                              rule_id="unique:image_id"),
        uniqueness_violations(meta, "phash", id_column="image_id",
                              rule_id="unique:phash"),
    ]

    if captions_path is not None:
        # output already has columns (image_id, rule_id, column, offending_value)
        legs.append(referential_violations(
            meta.select_columns(["image_id"]), captions_path, "image_id"))

    if decode:
        imgs = rd.read_parquet(input_dir, columns=DECODE_COLUMNS)
        kwargs: dict[str, Any] = {"batch_format": "pyarrow",
                                  "batch_size": decode_batch_size}
        if decode_concurrency:
            kwargs["concurrency"] = decode_concurrency
        legs.append(imgs.map_batches(ImageViolationsStage(), **kwargs))

    violations = legs[0]
    for leg in legs[1:]:
        violations = violations.union(leg)

    profile = profile_dataset(meta, numeric=("w", "h"),
                              categorical=("fmt",), keys=("image_id", "phash"))
    drift = (compare_profiles(reference_profile, profile)
             if reference_profile else [])

    return {"violations": violations, "profile": profile, "drift": drift}


def run_partition(input_path: str, *, captions_path: str | None = None,
                  decode: bool = True) -> dict[str, Any]:
    """One partition (shard) end-to-end; returns materialized small outputs for
    the manifest runner: violations table + verdict counts."""
    import ray.data as rd

    res = validate_images(input_path, captions_path=captions_path, decode=decode)
    vio: pa.Table = pa.concat_tables(
        [b for b in res["violations"].iter_batches(batch_size=65536,
                                                   batch_format="pyarrow")]
        or [pa.schema([(c, pa.string()) for c in VIOLATION_COLUMNS]).empty_table()])
    n_rows = rd.read_parquet(input_path, columns=["image_id"]).count()
    failed = len(set(vio["image_id"].to_pylist()))
    return {"violations": vio, "rows": n_rows, "failed_rows": failed,
            "profile": res["profile"]}


def run_resumable(input_paths: list[str], out_dir: str, *,
                  captions_path: str | None = None, decode: bool = True,
                  job_id: str = "job") -> dict[str, Any]:
    """Manifest-driven resumable run: partitions already recorded done (with a
    matching input digest) are skipped; each partition's outputs land atomically
    before its manifest row is written (state/manifest.py)."""
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import Manifest, atomic_output_dir, promote

    man = Manifest(out_dir)
    inputs = {f"{i:05d}": p for i, p in enumerate(sorted(input_paths))}
    done = man.done_partitions(inputs)
    ran, skipped = [], []

    for pid, path in inputs.items():
        if pid in done:
            skipped.append(pid)
            continue
        t0 = time.perf_counter()
        attempt = man.next_attempt(pid)
        out = run_partition(path, captions_path=captions_path, decode=decode)
        tmp, final = atomic_output_dir(out_dir, "violations", pid)
        pq.write_table(out["violations"], os.path.join(tmp, "violations.parquet"))
        promote(tmp, final)
        man.record(partition_id=pid, input_path=path, status="done",
                   attempt=attempt, rows=out["rows"],
                   failed_rows=out["failed_rows"],
                   violations=out["violations"].num_rows,
                   wall_seconds=time.perf_counter() - t0, job_id=job_id)
        ran.append(pid)
    return {"ran": ran, "skipped": skipped, "manifest": man.load()}
