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

    def valid_fields(b: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(b["image_id"]),
                             pc.greater(pc.coalesce(b["w"], -1), 0)),
                     pc.and_(pc.greater(pc.coalesce(b["h"], -1), 0),
                             pc.is_in(pc.utf8_lower(pc.coalesce(
                                 pc.cast(b["fmt"], pa.string()), "")),
                                 value_set=pa.array(_KNOWN_FMTS))))
        return b.filter(ok)

    valid = ds.map_batches(valid_fields, batch_format="pyarrow")
    if collect_stats:
        stats["after_field_validation"] = valid.count()

    # quality: task pool (an actor pool here starved small sessions —
    # see the images_quality livelock note); join metrics back by
    # computing them inline so bytes never re-read
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
    return {"curated": curated, "stats": stats}
