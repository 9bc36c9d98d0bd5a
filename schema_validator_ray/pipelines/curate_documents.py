"""Document-curation pipeline — the text-side flagship: rule validation +
quality scoring + language-ID + exact dedup + (optional) near-dup removal, the
shape of a training-data curation pass.

Composition (streaming; the only shuffle is the exact-dedup pre-aggregated
groupby; near-dup pair finding reuses the MinHash-LSH stage):

    read(doc_id, text[, lang])
      -> map_batches(AnnotateStage)        # quality, tokens, lang_pred, hash
      -> filter(quality >= min_quality AND n_tokens >= min_tokens)
      -> exact dedup: (content_hash, min doc_id) partials -> groupby -> keep set
      -> [optional] MinHash-LSH pairs -> connected components -> keep each
         near-dup cluster's min doc_id (transitive: chains collapse)
      -> curated Dataset
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import content_hash, lang_id, quality_score, token_count


class AnnotateStage:
    """(doc_id, text, ...) -> + (quality, n_tokens, lang_pred, content_hash)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return (batch
                .append_column("quality", quality_score(col))
                .append_column("n_tokens", token_count(col))
                .append_column("lang_pred", lang_id(col))
                .append_column("content_hash", content_hash(col)))


def curate_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     min_quality: float = 0.5, min_tokens: int = 10,
                     near_dup: bool = False, near_dup_threshold: float = 0.85,
                     batch_size: int = 8192):
    """Returns {curated: Dataset, stats: dict}. Deterministic: exact dedup
    keeps the min id per content hash; near-dup removal drops the max id of
    each verified pair."""
    import ray

    from ray.data.aggregate import Min

    annotated = ds.map_batches(AnnotateStage(text_col),
                               batch_format="pyarrow", batch_size=batch_size)

    def keep_mask(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["quality"], min_quality),
                    pc.greater_equal(b["n_tokens"], min_tokens))
        return b.filter(m)

    filtered = annotated.map_batches(keep_mask, batch_format="pyarrow")
    filtered = filtered.materialize()  # reused: dedup partials + final filter

    def partial_min(b: pa.Table) -> pa.Table:
        agg = b.group_by("content_hash").aggregate([(id_col, "min")])
        return agg.rename_columns(["content_hash", id_col])

    keep_ids: set = set()
    keep = (filtered.map_batches(partial_min, batch_format="pyarrow")
            .repartition(8).groupby("content_hash")
            .aggregate(Min(id_col, alias_name=id_col)))
    for b in keep.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        keep_ids.update(b[id_col].to_pylist())

    drop_near = set()
    if near_dup:
        from ..stages.dedup import connected_components, minhash_lsh_pairs

        pairs = minhash_lsh_pairs(filtered.select_columns([id_col, text_col]),
                                  text_col, id_col,
                                  threshold=near_dup_threshold)
        # transitive cluster dedup: survivors = component min ids (chains
        # a~b~c collapse to one doc even when a,c are not a direct pair)
        survivors = pairs.filter(
            pc.and_(pc.is_in(pairs["a"], value_set=pa.array(sorted(keep_ids))),
                    pc.is_in(pairs["b"],
                             value_set=pa.array(sorted(keep_ids)))))
        comp = connected_components(survivors)
        for i, rep in zip(comp["id"].to_pylist(), comp["rep"].to_pylist()):
            if i != rep:
                drop_near.add(i)

    final_keep = keep_ids - drop_near
    ref = ray.put(pa.array(sorted(final_keep)))

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col], value_set=ray.get(ref)))

    curated = filtered.map_batches(pick, batch_format="pyarrow")
    stats = {"kept": len(final_keep), "near_dup_dropped": len(drop_near)}
    return {"curated": curated, "stats": stats}
