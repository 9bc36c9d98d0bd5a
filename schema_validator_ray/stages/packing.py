"""Sequence packing / length bucketing for training-batch construction.

- ``length_buckets``: map-only power-of-two length bands + a per-band padding
  -waste aggregate (what fraction of a padded batch would be pad tokens) —
  the standard pre-step for bucketed batching. Fully SQL-expressible.
- ``pack_greedy``: assign documents to fixed-token-budget packs. Greedy
  packing is inherently sequential, so the distributed-deterministic shape is
  greedy WITHIN (hash(id) % n_shards) shards, docs visited in id order: packs
  never exceed the budget (docs above the budget get a singleton pack,
  flagged), assignment is a pure function of (id set, budget, n_shards) —
  independent of blocking — and shards pack in parallel. Cross-shard packing
  could reduce the pack count by at most ~n_shards packs (one partially-filled
  tail pack per shard), negligible at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def length_buckets(ds, token_col: str):
    """Append ``bucket`` = ceil(log2(max(tokens,1))) — docs in the same bucket
    pad to at most 2x their own length."""

    def assign(b: pa.Table) -> pa.Table:
        n = b[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.ceil(np.log2(np.maximum(n, 1))).astype(np.int64)
        return b.append_column("bucket", pa.array(bucket, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def bucket_padding_stats(ds, token_col: str):
    """Per length-bucket: (bucket, n_docs, total_tokens, padded_tokens,
    pad_waste) where padding is to the bucket's max length 2^bucket.
    Partial/combiner: per-batch pyarrow group_by, driver merge (buckets are
    O(log max_len) — a handful of rows)."""

    def partial(b: pa.Table) -> pa.Table:
        n = b[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.ceil(np.log2(np.maximum(n, 1))).astype(np.int64)
        t = pa.table({"bucket": pa.array(bucket), token_col: pa.array(n)})
        agg = t.group_by("bucket").aggregate(
            [(token_col, "count"), (token_col, "sum")])
        return pa.table({
            "bucket": agg["bucket"],
            "n_docs": pc.cast(agg[f"{token_col}_count"], pa.int64()),
            "total_tokens": pc.cast(agg[f"{token_col}_sum"], pa.int64()),
        })

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=1 << 16, batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "total_tokens": pa.array([], pa.int64()),
                         "padded_tokens": pa.array([], pa.int64()),
                         "pad_waste": pa.array([], pa.float64())})
    agg = (pa.concat_tables(parts).group_by("bucket")
           .aggregate([("n_docs", "sum"), ("total_tokens", "sum")]))
    bucket = agg["bucket"].to_numpy(zero_copy_only=False)
    n_docs = agg["n_docs_sum"].to_numpy(zero_copy_only=False)
    tot = agg["total_tokens_sum"].to_numpy(zero_copy_only=False)
    padded = n_docs * (2 ** bucket.astype(np.int64))
    waste = np.round(1.0 - tot / np.maximum(padded, 1), 6)
    order = np.argsort(bucket)
    return pa.table({
        "bucket": pa.array(bucket[order], pa.int64()),
        "n_docs": pa.array(n_docs[order], pa.int64()),
        "total_tokens": pa.array(tot[order], pa.int64()),
        "padded_tokens": pa.array(padded[order], pa.int64()),
        "pad_waste": pa.array(waste[order], pa.float64()),
    })


def pack_greedy(ds, id_col: str, token_col: str, *, budget: int,
                n_shards: int = 64):
    """(id, n_tokens, pack_id:string, oversize:bool) — greedy fixed-budget
    packing within hash shards; ``pack_id`` = "<shard>:<k>". Deterministic
    under re-blocking (ids visited sorted within their shard)."""
    from .referential import _hash_keys

    def add_shard(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        shard = (_hash_keys(ids) % np.uint64(n_shards)).astype(np.int32)
        return pa.table({id_col: ids,
                         token_col: pc.cast(b[token_col], pa.int64()),
                         "_shard": pa.array(shard, pa.int32())})

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        shard = int(g["_shard"].iloc[0])
        toks = g[token_col].to_numpy()
        pack = np.empty(len(g), np.int64)
        oversize = toks > budget
        cur, used = 0, 0
        for i in range(len(g)):
            t = int(toks[i])
            if t > budget:       # singleton pack, flagged
                cur += 1 if used else 0
                pack[i] = cur
                cur += 1
                used = 0
                continue
            if used + t > budget:
                cur += 1
                used = 0
            pack[i] = cur
            used += t
        return pd.DataFrame({
            id_col: g[id_col],
            "n_tokens": toks,
            "pack_id": [f"{shard}:{p}" for p in pack],
            "oversize": oversize,
        })

    sharded = ds.map_batches(add_shard, batch_format="pyarrow")
    return sharded.groupby("_shard").map_groups(pack_shard,
                                               batch_format="pandas")


def chunk_documents(ds, text_col: str, id_col: str, *, max_tokens: int = 128,
                    chunk_col: str = "chunk_id", out_text: str = "chunk",
                    keep_cols: list[str] | None = None):
    """Context-length chunking: split each document into consecutive
    ``max_tokens``-token chunks (whitespace tokenization, chunks re-joined
    with single spaces — deterministic and reproduced exactly by the SQL
    ``string_split_regex`` / ``array_to_string`` oracle). Map-only: one
    input row explodes into ceil(tokens / max_tokens) output rows; null
    text emits no chunks; empty text emits one empty chunk (split('') is
    [''], matching SQL). The inner loop runs per chunk RANK (bounded by
    the longest document), each rank fully vectorized."""
    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nt = np.nan_to_num(nt.astype(np.float64), nan=0.0)
        n_chunks = np.ceil(nt / max_tokens).astype(np.int64)
        idx = np.repeat(np.arange(len(nt)), n_chunks)
        starts = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        cid = np.arange(int(n_chunks.sum())) - np.repeat(starts, n_chunks)
        ids_col = b[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids_rep = ids_col.take(pa.array(idx))
        toks_rep = toks.take(pa.array(idx))
        out = np.empty(len(idx), object)
        for r in range(int(cid.max()) + 1 if len(cid) else 0):
            sel = cid == r
            sub = toks_rep.filter(pa.array(sel))
            joined = pc.binary_join(
                pc.list_slice(sub, r * max_tokens, (r + 1) * max_tokens),
                " ")
            out[sel] = joined.to_numpy(zero_copy_only=False)
        cols = {id_col: ids_rep,
                chunk_col: pa.array(cid, pa.int64()),
                out_text: pa.array(out, pa.string())}
        for c in keep_cols or []:
            extra = b[c]
            if isinstance(extra, pa.ChunkedArray):
                extra = extra.combine_chunks()
            cols[c] = extra.take(pa.array(idx))
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")
