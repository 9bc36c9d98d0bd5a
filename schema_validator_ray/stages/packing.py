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
