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


def run_curate_docs_resumable(input_paths: list, out_dir: str, *,
                              embeddings_path: str | None = None,
                              min_quality: float = 0.75,
                              min_tokens: int = 15, span_k: int = 40,
                              sem_threshold: float = 0.3,
                              prior_seen: str | None = None,
                              seen_spill_threshold: int = 5_000_000,
                              job_id: str = "job",
                              stop_after_phase1: bool = False) -> dict:
    """Manifest-driven resumable document curation over parquet shards —
    the text-side production capstone (the analogue of
    curate_images.run_curate_resumable), wiring quality filtering, exact
    dedup, STREAMING dedup against prior runs (seen-key index with
    spill), semantic dedup (SemDeDup drop set) and exact shared-span
    REMOVAL into one two-phase crash-safe pipeline.

    Phase 1 — **global decisions** (cached by the inputs+params digest;
    every artifact is duplication/overlap-bounded, never corpus-sized):

    - ``global_drop.parquet``: exact-dup losers (non-min ids of dup
      content hashes), docs whose content hash a PRIOR run admitted
      (``prior_seen`` snapshot, restored into a spill-backed
      :class:`SeenKeyIndex`), and SemDeDup-dominated ids
      (``semdedup(..., invert=True)``) when ``embeddings_path`` is given
      (doc_id must align with the embedding table's vec_id).
    - ``span_dup_h.parquet`` + ``span_winner.parquet``: the broadcastable
      span-removal state (:func:`stages.spans.span_removal_state`)
      computed over the KEPT docs only.
    - ``seen/``: the updated seen-key snapshot (prior + this run) for the
      next incremental feed.

    Phase 2 — **per-shard rewrite** (manifest rows; shards whose input
    digest + params match a done row are skipped on resume): quality
    filter is shard-local and recomputed; global drops and span state
    broadcast via ``ray.put``; output is (doc_id, text_dedup) written
    atomically per shard. Deterministic end to end, so a killed run
    resumes to byte-identical output.
    """
    import json
    import os
    import time

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..stages.spans import _SpanRemover, span_removal_state
    from ..state.manifest import (Manifest, _digest, atomic_output_dir,
                                  promote)
    from ..state.seen_index import SeenKeyIndex

    os.makedirs(out_dir, exist_ok=True)
    inputs = {f"{i:05d}": p for i, p in enumerate(sorted(input_paths))}
    params_sig = (f"mq={min_quality!r},mt={min_tokens},k={span_k},"
                  f"st={sem_threshold!r},emb={bool(embeddings_path)},"
                  f"prior={prior_seen or ''}")
    inputs_digest = ("|".join(f"{k}:{_digest(p)}"
                              for k, p in inputs.items())
                     + f"|params:{params_sig}")

    dec_path = os.path.join(out_dir, "decisions.json")
    drop_path = os.path.join(out_dir, "global_drop.parquet")
    duph_path = os.path.join(out_dir, "span_dup_h.parquet")
    win_path = os.path.join(out_dir, "span_winner.parquet")

    def quality_pass(ds):
        ann = ds.map_batches(AnnotateStage("text"), batch_format="pyarrow")
        return ann.map_batches(
            lambda b: b.filter(pc.and_(
                pc.greater_equal(b["quality"], min_quality),
                pc.greater_equal(b["n_tokens"], min_tokens))),
            batch_format="pyarrow")

    # ---- phase 1: global decisions (cached) -----------------------------
    if (all(os.path.exists(p) for p in (dec_path, drop_path, duph_path,
                                        win_path))
            and json.load(open(dec_path)).get("inputs") == inputs_digest):
        decisions = json.load(open(dec_path))
    else:
        from ray.data.aggregate import Count, Min

        ds = rd.read_parquet(list(inputs.values()),
                             columns=["doc_id", "text"])
        filtered = quality_pass(ds).select_columns(
            ["doc_id", "content_hash"]).materialize()

        def part_min(b: pa.Table) -> pa.Table:
            agg = b.group_by("content_hash").aggregate(
                [("doc_id", "min"), ("doc_id", "count")])
            return pa.table({"content_hash": agg["content_hash"],
                             "doc_id": agg["doc_id_min"],
                             "n": pc.cast(agg["doc_id_count"], pa.int64())})

        from ray.data.aggregate import Sum

        mins = (filtered.map_batches(part_min, batch_format="pyarrow")
                .groupby("content_hash")
                .aggregate(Min("doc_id", alias_name="doc_id"),
                           Sum("n", alias_name="n")))

        # exact-dup losers: duplication-bounded (hash, min) map broadcast
        dup_map = {}
        for b in mins.iter_batches(batch_size=1 << 20,
                                   batch_format="pyarrow"):
            t = b.filter(pc.greater(b["n"], 1))
            dup_map.update(zip(t["content_hash"].to_pylist(),
                               t["doc_id"].to_pylist()))
        dmref = ray.put(dup_map)

        def losers(b: pa.Table) -> pa.Table:
            import ray as _ray

            dm = _ray.get(dmref)
            hs = b["content_hash"].to_pylist()
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (h in dm and int(i) != dm[h] for h, i in zip(hs, ids)),
                bool, len(hs))
            return pa.table({"doc_id": b["doc_id"].filter(pa.array(keep))})

        drop_ids = set()
        for b in (filtered.map_batches(losers, batch_format="pyarrow")
                  .iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow")):
            drop_ids.update(b["doc_id"].to_pylist())

        # streaming dedup vs PRIOR runs: restore the snapshot, annotate
        # the distinct-hash stream; hashes a prior run admitted drop
        # their min doc too. New hashes are admitted as a side effect.
        idx = SeenKeyIndex(n_shards=8, hash_keys=True,
                           spill_dir=os.path.join(out_dir, "seen_spill"),
                           spill_threshold=seen_spill_threshold)
        if prior_seen:
            idx.restore_from(prior_seen)
        n_prior_dropped = 0
        seen_rows = idx.annotate_seen(
            mins.select_columns(["content_hash", "doc_id"]),
            "content_hash")
        for b in seen_rows.iter_batches(batch_size=1 << 20,
                                        batch_format="pyarrow"):
            t = b.filter(b["_seen"])
            ids = t["doc_id"].to_pylist()
            drop_ids.update(ids)
            n_prior_dropped += len(ids)
        idx.snapshot_to(os.path.join(out_dir, "seen"))

        # semantic dedup drop set (duplication-bounded)
        n_sem_dropped = 0
        if embeddings_path:
            from ..stages.similarity import semdedup

            emb = rd.read_parquet([embeddings_path],
                                  columns=["vec_id", "embedding"])
            for b in (semdedup(emb, emb_col="embedding", id_col="vec_id",
                               threshold=sem_threshold, invert=True)
                      .iter_batches(batch_size=1 << 20,
                                    batch_format="pyarrow")):
                ids = b["vec_id"].to_pylist()
                drop_ids.update(ids)
                n_sem_dropped += len(ids)

        # span-removal state over the KEPT docs only
        dref = ray.put(drop_ids)

        def drop_globals(b: pa.Table) -> pa.Table:
            import ray as _ray

            dr = _ray.get(dref)
            if not dr:
                return b
            ids = b["doc_id"].to_pylist()
            return b.filter(pa.array(np.fromiter(
                (i not in dr for i in ids), bool, len(ids))))

        kept = (quality_pass(rd.read_parquet(list(inputs.values()),
                                             columns=["doc_id", "text"]))
                .select_columns(["doc_id", "text"])
                .map_batches(drop_globals, batch_format="pyarrow"))
        dup_h, winner = span_removal_state(kept, "text", "doc_id",
                                           k=span_k)
        if winner is None:
            raise ValueError(
                "run_curate_docs_resumable: span winner set exceeds the "
                "driver budget; raise driver_merge_max in "
                "span_removal_state or curate without span removal")

        def _atomic_write(tbl: pa.Table, path: str) -> None:
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)

        _atomic_write(pa.table({"doc_id": pa.array(sorted(drop_ids),
                                                   pa.int64())}), drop_path)
        _atomic_write(pa.table({"h": pa.array(dup_h, pa.int64())}),
                      duph_path)
        _atomic_write(pa.table({
            "g": pa.array(list(winner.keys()), pa.string()),
            "w": pa.array(list(winner.values()), pa.int64())}), win_path)
        decisions = {"inputs": inputs_digest, "dropped": len(drop_ids),
                     "prior_seen_dropped": n_prior_dropped,
                     "sem_dropped": n_sem_dropped,
                     "dup_spans": len(dup_h)}
        tmp = dec_path + ".tmp"
        json.dump(decisions, open(tmp, "w"))
        os.replace(tmp, dec_path)

    if stop_after_phase1:
        return {"phase1": decisions, "ran": [], "skipped": [],
                "failed": [], "curated_rows": 0}

    # ---- phase 2: per-shard rewrite under the manifest -------------------
    drop_ids = set(pq.read_table(drop_path)["doc_id"].to_pylist())
    dup_h = pq.read_table(duph_path)["h"].to_numpy(zero_copy_only=False)
    wt = pq.read_table(win_path)
    winner = dict(zip(wt["g"].to_pylist(), wt["w"].to_pylist()))
    dref = ray.put(drop_ids)
    remover = (None if len(dup_h) == 0 else
               _SpanRemover("text", "doc_id", span_k, "text_dedup",
                            ray.put(np.ascontiguousarray(dup_h)),
                            ray.put(winner)))

    def drop_and_strip(b: pa.Table) -> pa.Table:
        import ray as _ray

        dr = _ray.get(dref)
        if dr:
            ids = b["doc_id"].to_pylist()
            b = b.filter(pa.array(np.fromiter(
                (i not in dr for i in ids), bool, len(ids))))
        t = b.select(["doc_id", "text"])
        if remover is None:
            return pa.table({
                "doc_id": t["doc_id"],
                "text_dedup": pc.coalesce(pc.cast(t["text"], pa.string()),
                                          "")})
        return remover(t)

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
            shard = rd.read_parquet([path], columns=["doc_id", "text"])
            out = (quality_pass(shard)
                   .select_columns(["doc_id", "text"])
                   .map_batches(drop_and_strip, batch_format="pyarrow"))
            chunks = [b for b in out.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)
                      if b.num_rows]
            tbl = pa.concat_tables(chunks) if chunks else pa.table({
                "doc_id": pa.array([], pa.int64()),
                "text_dedup": pa.array([], pa.string())})
        except Exception as exc:  # noqa: BLE001 — isolate the shard
            print(f"[curate-docs] partition {pid} failed: {exc!r}")
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
    return {"phase1": decisions, "ran": ran, "skipped": skipped,
            "failed": failed, "curated_rows": curated_rows}
