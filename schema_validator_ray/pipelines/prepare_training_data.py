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


def prepare_training_data_chunked(ds, *, id_col: str = "doc_id",
                                  text_col: str = "text",
                                  min_quality: float = 0.5,
                                  min_tokens: int = 10,
                                  near_dup: bool = True,
                                  near_dup_threshold: float = 0.85,
                                  splits: dict[str, float] | None = None,
                                  max_tokens: int = 128,
                                  pack_budget: int | None = None,
                                  seed: int = 0):
    """Capstone v2 — the context-length variant of the preparation flow:

        clean -> curate (quality/token filter, exact + near dedup)
              -> train/val/test split BY DOCUMENT (a document's chunks
                 never straddle splits — chunk-level splitting would leak
                 shared context across train and eval)             map-only
              -> context-length chunking (``max_tokens`` per chunk) map-only
              -> deterministic per-split chunk shuffle (global
                 position within each split)                       sort+tasks
              -> optional per-split greedy packing of chunks       sharded

    Returns {dataset: Dataset(doc_id, chunk_id, n_tokens, split, pos
    [, pack_id, oversize]), stats}. Pure function of (ids, text, seed)."""
    from ..functions.text import clean_text, token_count
    from ..stages.packing import chunk_documents
    from ..stages.sampling import hash_split, shuffle_deterministic
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
    assigned = hash_split(
        res["curated"].select_columns([id_col, text_col]),
        id_col, splits, seed=seed)
    chunked = chunk_documents(assigned, text_col, id_col,
                              max_tokens=max_tokens, keep_cols=["split"])

    def add_uid_tokens(b: pa.Table) -> pa.Table:
        # unique per chunk, order-stable: (doc_id << 20) | chunk_id — chunk
        # counts are bounded far below 2^20 by max_tokens vs document size
        uid = pc.add(pc.multiply(b[id_col], 1 << 20), b["chunk_id"])
        return (b.append_column("_uid", pc.cast(uid, pa.int64()))
                .append_column("n_tokens", token_count(b["chunk"])))

    chunked = chunked.map_batches(add_uid_tokens,
                                  batch_format="pyarrow").materialize()

    legs = []
    for name in splits:
        sub = chunked.filter(expr=f"split == '{name}'")
        if pack_budget is not None:
            # pack first (pack_greedy projects to its own columns), then
            # recover doc/chunk ids from the invertible uid and shuffle —
            # shuffle_deterministic passes every column through
            from ..stages.packing import pack_greedy

            packed = pack_greedy(sub, "_uid", "n_tokens",
                                 budget=pack_budget)
            sub = packed.map_batches(
                lambda b, _n=name: pa.table({
                    id_col: pc.cast(
                        pc.divide(b["_uid"], 1 << 20), pa.int64()),
                    "chunk_id": pc.cast(
                        pc.bit_wise_and(b["_uid"], (1 << 20) - 1),
                        pa.int64()),
                    "_uid": b["_uid"],
                    "n_tokens": b["n_tokens"],
                    "split": pa.array([_n] * b.num_rows, pa.string()),
                    "pack_id": pc.binary_join_element_wise(
                        pa.array([_n] * b.num_rows, pa.string()),
                        pc.cast(b["pack_id"], pa.string()), "/"),
                    "oversize": b["oversize"],
                }), batch_format="pyarrow")
        shuffled = shuffle_deterministic(sub, "_uid", seed=seed,
                                         out_col="pos")
        keep = [id_col, "chunk_id", "n_tokens", "split", "pos"]
        if pack_budget is not None:
            keep += ["pack_id", "oversize"]
        legs.append(shuffled.select_columns(keep))
    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    return {"dataset": out, "stats": res["stats"]}
