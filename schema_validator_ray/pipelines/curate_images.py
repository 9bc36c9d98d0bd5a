"""Image-curation capstone — the image-side flagship, mirroring
``curate_documents`` over the north-rule image table: field validation +
decoded quality metrics + phash near-dup canonicalization, the shape of a
web-crawl image curation pass before training.

Composition (streaming; nothing corpus-sized ever reaches the driver):

    read(image_id, bytes, w, h, fmt, phash)
      -> field validation (map-only: id present, w/h positive, fmt known)
      -> quality metrics (ImageQualityStage task pool: decode via the
         stand-in codec; real PIL slots in at the imagecodec seam) and a
         map-only threshold filter (undecodable -> dropped, lineage-safe)
      -> phash near-dup clusters -> keep each cluster's BEST-RESOLUTION
         member (hamming_canonicalize; dominated members dropped)
      -> curated Dataset + per-stage counts

Per-stage counts come from cheap ``count()`` actions on the narrow id
column — acceptable bookkeeping at any scale (each is a metadata-only
count of an already-planned stage), and the pipeline's data path stays
lazy end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import hamming_canonicalize
from ..stages.multimodal import ImageQualityStage

# same oneof set as the flagship's rule spec (validate_images.py:37)
_KNOWN_FMTS = ("png", "jpeg", "webp")


def _valid_fields(b: pa.Table) -> pa.Table:
    ok = pc.and_(pc.and_(pc.is_valid(b["image_id"]),
                         pc.greater(pc.coalesce(b["w"], -1), 0)),
                 pc.and_(pc.greater(pc.coalesce(b["h"], -1), 0),
                         pc.is_in(pc.utf8_lower(pc.coalesce(
                             pc.cast(b["fmt"], pa.string()), "")),
                             value_set=pa.array(_KNOWN_FMTS))))
    return b.filter(ok)


def _quality_filter(min_sharpness: float, max_saturated_frac: float):
    quality = ImageQualityStage()

    def score_and_filter(b: pa.Table) -> pa.Table:
        m = quality(b.select(["image_id", "bytes"]))
        keep = pc.and_(
            pc.and_(m["ok"],
                    pc.greater_equal(pc.coalesce(m["sharpness"], -1.0),
                                     min_sharpness)),
            pc.less_equal(pc.coalesce(m["saturated_frac"], 2.0),
                          max_saturated_frac))
        keep = pc.fill_null(keep, False)
        return b.filter(keep)

    return score_and_filter


def curate_images(ds, *, min_sharpness: float = 0.5,
                  max_saturated_frac: float = 0.9,
                  max_hamming: int = 3, max_bucket_size: int = 4096,
                  collect_stats: bool = True) -> dict:
    """Returns ``{curated: Dataset(image_id), stats: dict}``.

    Deterministic: quality metrics are pure functions of the payload, and
    the near-dup keep-rule is argmax(w*h, tie -> min image_id) per
    cluster, so re-runs and re-orderings produce the same curated set.
    ``ds`` needs columns (image_id, bytes, w, h, fmt, phash)."""
    stats: dict = {}
    if collect_stats:
        stats["input_rows"] = ds.count()

    valid = ds.map_batches(_valid_fields, batch_format="pyarrow")
    if collect_stats:
        stats["after_field_validation"] = valid.count()

    # quality: task pool (an actor pool here starved small sessions —
    # see the images_quality livelock note); join metrics back by
    # computing them inline so bytes never re-read
    score_and_filter = _quality_filter(min_sharpness, max_saturated_frac)

    passed = valid.map_batches(score_and_filter, batch_format="pyarrow")
    if collect_stats:
        stats["after_quality_filter"] = passed.count()

    # near-dup canonicalization over the SURVIVORS' phash: dominated
    # members (same cluster, worse resolution / higher id) drop
    def add_area(b: pa.Table) -> pa.Table:
        return b.append_column("area", pc.cast(
            pc.multiply(pc.cast(b["w"], pa.int64()),
                        pc.cast(b["h"], pa.int64())), pa.int64()))

    narrow = passed.select_columns(
        ["image_id", "phash", "w", "h"]).map_batches(
        add_area, batch_format="pyarrow")
    canon = hamming_canonicalize(narrow, "phash", "image_id",
                                 order=[("area", True)],
                                 max_hamming=max_hamming,
                                 max_bucket_size=max_bucket_size)
    ct = canon.to_pandas()  # cluster members only — duplication-bounded
    dominated = [] if ct.empty else sorted(
        ct.loc[ct["image_id"] != ct["canonical_id"], "image_id"].tolist())
    import ray

    dref = ray.put(set(dominated))

    def drop_dominated(b: pa.Table) -> pa.Table:
        import ray as _ray

        dom = _ray.get(dref)
        t = b.select(["image_id"])
        if not dom:
            return t
        ids = t["image_id"].to_pylist()
        return t.filter(pa.array(
            np.fromiter((i not in dom for i in ids), bool, len(ids))))

    curated = passed.map_batches(drop_dominated, batch_format="pyarrow")
    if collect_stats:
        stats["dominated_near_dups"] = len(dominated)
        stats["curated_rows"] = curated.count()
    return {"curated": curated, "stats": stats,
            "dominated_ids": dominated}


def run_curate_resumable(input_paths: list, out_dir: str, *,
                         min_sharpness: float = 0.5,
                         max_saturated_frac: float = 0.9,
                         max_hamming: int = 3,
                         max_bucket_size: int = 4096,
                         job_id: str = "job") -> dict:
    """Manifest-driven resumable curation over parquet shards — the
    capstone's production shape (north rule: per-partition lineage +
    metrics, crash-safe re-runs).

    Two phases, because near-dup clusters SPAN shards (curation is not
    per-shard decomposable):

    1. **global dominated set** — the same validate → quality →
       canonicalize pass as :func:`curate_images` over ALL shards, saving
       only the dominated ids (duplication-bounded) to
       ``out_dir/dominated.parquet``, keyed by the inputs' digests so a
       changed input invalidates it. At 100 TB you'd persist the quality
       metrics table too and make phase 2 a pure metadata filter; here
       phase 2 re-decodes per shard (2× decode is the documented price of
       shard-level resume without a metrics table).
    2. **per-shard rewrite** — field validation + quality filter + drop
       dominated, written atomically per shard, then the manifest row;
       shards recorded done with a matching digest are skipped on resume.

    Returns {ran, skipped, failed, curated_rows, dominated}.
    """
    import json
    import os
    import time

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..state.manifest import (Manifest, _digest, atomic_output_dir,
                                  promote)

    os.makedirs(out_dir, exist_ok=True)
    inputs = {f"{i:05d}": p for i, p in enumerate(sorted(input_paths))}
    # Curation parameters are part of every cache key: re-running with a
    # different threshold on the same out_dir must invalidate BOTH the
    # phase-1 dominated set and the per-shard done markers (round-4
    # advice — otherwise output silently mixes old and new thresholds).
    params_sig = (f"ms={min_sharpness!r},sf={max_saturated_frac!r},"
                  f"hd={max_hamming},bk={max_bucket_size}")
    inputs_digest = "|".join(f"{k}:{_digest(p)}" for k, p in inputs.items())
    inputs_digest += f"|params:{params_sig}"

    # ---- phase 1: global dominated set (cached by inputs digest) -------
    dom_path = os.path.join(out_dir, "dominated.parquet")
    meta_path = os.path.join(out_dir, "dominated.json")
    dominated: list
    if (os.path.exists(dom_path) and os.path.exists(meta_path)
            and json.load(open(meta_path)).get("inputs") == inputs_digest):
        dominated = pq.read_table(dom_path)["image_id"].to_pylist()
    else:
        ds = rd.read_parquet(list(inputs.values()),
                             columns=["image_id", "bytes", "w", "h",
                                      "fmt", "phash"])
        res = curate_images(ds, min_sharpness=min_sharpness,
                            max_saturated_frac=max_saturated_frac,
                            max_hamming=max_hamming,
                            max_bucket_size=max_bucket_size,
                            collect_stats=False)
        dominated = sorted(res["dominated_ids"])
        tmp = dom_path + ".tmp"
        pq.write_table(pa.table({"image_id": pa.array(
            dominated, pa.string())}), tmp)
        os.replace(tmp, dom_path)
        mt = meta_path + ".tmp"
        json.dump({"inputs": inputs_digest, "n": len(dominated)},
                  open(mt, "w"))
        os.replace(mt, meta_path)

    dref = ray.put(set(dominated))
    score_and_filter = _quality_filter(min_sharpness, max_saturated_frac)

    def drop_dom(b: pa.Table) -> pa.Table:
        import ray as _ray

        dom = _ray.get(dref)
        if not dom:
            return b
        ids = b["image_id"].to_pylist()
        return b.filter(pa.array(np.fromiter(
            (i not in dom for i in ids), bool, len(ids))))

    # ---- phase 2: per-shard rewrite under the manifest ------------------
    man = Manifest(out_dir)
    shard_digests = {pid: f"{_digest(p)}|{params_sig}"
                     for pid, p in inputs.items()}
    done = man.done_fragments(shard_digests)
    ran, skipped, failed = [], [], []
    curated_rows = 0
    for pid, path in inputs.items():
        if pid in done:
            skipped.append(pid)
            continue
        t0 = time.perf_counter()
        attempt = man.next_attempt(pid)
        try:
            shard = rd.read_parquet([path],
                                    columns=["image_id", "bytes", "w",
                                             "h", "fmt", "phash"])
            out = (shard.map_batches(_valid_fields, batch_format="pyarrow")
                   .map_batches(score_and_filter, batch_format="pyarrow")
                   .map_batches(drop_dom, batch_format="pyarrow")
                   .map_batches(lambda b: b.select(
                       ["image_id", "w", "h", "fmt"]),
                       batch_format="pyarrow"))
            chunks = [b for b in out.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)
                      if b.num_rows]
            tbl = pa.concat_tables(chunks) if chunks else pa.table({
                "image_id": pa.array([], pa.string()),
                "w": pa.array([], pa.int32()),
                "h": pa.array([], pa.int32()),
                "fmt": pa.array([], pa.string())})
        except Exception as exc:  # noqa: BLE001 — isolate the shard
            print(f"[curate-resumable] partition {pid} failed: {exc!r}")
            man.record(partition_id=pid, input_path=path, status="failed",
                       attempt=attempt, rows=0, failed_rows=0,
                       violations=0,
                       wall_seconds=time.perf_counter() - t0,
                       job_id=job_id, verdict="fail",
                       input_digest=shard_digests[pid])
            failed.append(pid)
            continue
        in_rows = pq.read_metadata(path).num_rows
        tmp, final = atomic_output_dir(out_dir, "curated", pid)
        pq.write_table(tbl, os.path.join(tmp, "curated.parquet"))
        promote(tmp, final)
        man.record(partition_id=pid, input_path=path, status="done",
                   attempt=attempt, rows=in_rows,
                   failed_rows=in_rows - tbl.num_rows,
                   violations=in_rows - tbl.num_rows,
                   wall_seconds=time.perf_counter() - t0, job_id=job_id,
                   verdict="pass", input_digest=shard_digests[pid])
        curated_rows += tbl.num_rows
        ran.append(pid)
    return {"ran": ran, "skipped": skipped, "failed": failed,
            "curated_rows": curated_rows, "dominated": len(dominated)}
