"""End-to-end training-data preparation — the composition the engine exists
for, wiring every curation stage into one deterministic pass:

    read(doc_id, text)
      -> clean_text (HTML strip / control chars / whitespace)      map-only
      -> annotate (quality, tokens, lang, content hash)            map-only
      -> filter (min_quality, min_tokens)                          map-only
      -> exact dedup (hash -> min-id survivors)                    pre-agg
      -> near-dup removal (MinHash-LSH -> connected components)    bucketed
      -> train/val/test assignment (hash_split)                    map-only
      -> per-SPLIT greedy sequence packing (packs never straddle
         a split boundary — mixing train/val rows in one pack
         would leak)                                               sharded

Everything is a pure function of (doc ids, text, seed): re-running a failed
partition reproduces identical rows, splits, and pack assignments.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def prepare_training_data(ds, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          min_quality: float = 0.5, min_tokens: int = 10,
                          near_dup: bool = True,
                          near_dup_threshold: float = 0.85,
                          splits: dict[str, float] | None = None,
                          pack_budget: int | None = None,
                          seed: int = 0):
    """Returns {dataset: Dataset(doc_id, n_tokens, split[, pack_id,
    oversize]), stats: dict}."""
    from ..functions.text import clean_text
    from ..stages.sampling import hash_split
    from .curate_documents import curate_documents

    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}

    cleaned = ds.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            text_col: clean_text(b[text_col])}),
        batch_format="pyarrow")
    res = curate_documents(cleaned, id_col=id_col, text_col=text_col,
                           min_quality=min_quality, min_tokens=min_tokens,
                           near_dup=near_dup,
                           near_dup_threshold=near_dup_threshold)
    curated = res["curated"].map_batches(
        lambda b: pa.table({id_col: b[id_col], "n_tokens": b["n_tokens"]}),
        batch_format="pyarrow")
    assigned = hash_split(curated, id_col, splits, seed=seed)

    if pack_budget is None:
        return {"dataset": assigned, "stats": res["stats"]}

    # pack WITHIN each split (a pack must never mix train and eval rows);
    # pack ids get the split prefix so they are globally unique
    from ..stages.packing import pack_greedy

    assigned = assigned.materialize()  # reused once per split
    legs = []
    for name in splits:
        sub = assigned.filter(expr=f"split == '{name}'")
        packed = pack_greedy(sub, id_col, "n_tokens", budget=pack_budget)
        legs.append(packed.map_batches(
            lambda b, _n=name: pa.table({
                id_col: b[id_col],
                "n_tokens": b["n_tokens"],
                "split": pa.array([_n] * b.num_rows, pa.string()),
                "pack_id": pc.binary_join_element_wise(
                    pa.array([_n] * b.num_rows, pa.string()),
                    pc.cast(b["pack_id"], pa.string()), "/"),
                "oversize": b["oversize"],
            }), batch_format="pyarrow"))
    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    return {"dataset": out, "stats": res["stats"]}
