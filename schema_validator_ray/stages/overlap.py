"""Cross-source contamination / overlap matrix: for every pair of corpus
sources, the number of DISTINCT word k-grams they share. The standard
pre-training diagnostic for "how much of source B is already in source A"
(public methodology: n-gram overlap audits in GPT-3 / The Pile papers).

Distributed shape (the minhash/ngram-jaccard coarse-shard pattern):

1. map_batches: per-batch DISTINCT (shingle, source) records tagged with
   ``_grp = hash(shingle) % n_groups`` — a few dozen coarse Ray groups, never
   one group per shingle (per-group overhead would dominate).
2. ``groupby(_grp).map_groups``: all copies of a shingle land in one group,
   so an in-group composite ``np.unique`` gives the GLOBAL distinct
   (shingle, source) set; per-shingle segments then emit source pairs via
   ``triu_indices`` over at most |sources| entries, pre-aggregated to
   (source_a, source_b, n) inside the group.
3. A final tiny ``groupby(a, b).sum`` merges the per-group counts —
   output cardinality is C(|sources|, 2), not data-sized.

At 10^12 rows the only wide exchange is the distinct-shingle stream (step
1→2), which shrinks with per-batch dedup; shingles would ride as 64-bit
hashes there (exact strings kept here for the bit-exact SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import word_kgrams


def source_overlap(ds, text_col: str, source_col: str, *, k: int = 3,
                   n_groups: int = 64):
    """Returns a Dataset of (source_a, source_b, n_shared) with
    source_a < source_b (string order) and n_shared = count of distinct
    shared word k-grams."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        rows, sh = word_kgrams(b[text_col], k)
        src = b[source_col].take(pa.array(rows))
        t = pa.table({"sh": sh, "src": src})
        # per-batch distinct bounds the shuffle at batch vocabulary
        t = t.group_by(["sh", "src"]).aggregate([])
        h = pd.util.hash_array(
            t["sh"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        grp = pa.array((h % np.uint64(n_groups)).astype(np.int32), pa.int32())
        return t.append_column("_grp", grp)

    def group_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"source_a": pa.array([], pa.string()),
                          "source_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        sh = g["sh"].to_numpy(zero_copy_only=False)
        src = g["src"].to_numpy(zero_copy_only=False)
        sh_codes, _ = pd.factorize(sh)
        src_codes, src_uniq = pd.factorize(src)
        n_src = len(src_uniq)
        if n_src > 64:
            raise ValueError(
                f"{n_src} distinct sources exceed the 64-bit mask; shard "
                "the source universe across mask words for wider corpora")
        # sort source names once so emitted pairs are (min, max) by string
        order = np.argsort(src_uniq.astype(str))
        rank = np.empty(n_src, np.int64)
        rank[order] = np.arange(n_src)
        names_sorted = src_uniq.astype(str)[order]
        # one uint64 presence mask per shingle — fully vectorized; pair
        # enumeration then loops only over DISTINCT masks (tiny: bounded by
        # observed source combinations, not shingles)
        masks = np.zeros(sh_codes.max() + 1, np.uint64)
        np.bitwise_or.at(masks, sh_codes,
                         np.uint64(1) << rank[src_codes].astype(np.uint64))
        uniq_masks, mask_counts = np.unique(masks, return_counts=True)
        pair_counts: dict[tuple[int, int], int] = {}
        for m, cnt in zip(uniq_masks, mask_counts):
            bits = np.flatnonzero(
                (m >> np.arange(n_src, dtype=np.uint64)) & np.uint64(1))
            for x in range(len(bits)):
                for y in range(x + 1, len(bits)):
                    key = (int(bits[x]), int(bits[y]))
                    pair_counts[key] = pair_counts.get(key, 0) + int(cnt)
        if not pair_counts:
            return empty
        ka = [names_sorted[a] for a, _ in pair_counts]
        kb = [names_sorted[b] for _, b in pair_counts]
        return pa.table({"source_a": pa.array(ka, pa.string()),
                         "source_b": pa.array(kb, pa.string()),
                         "n": pa.array(list(pair_counts.values()),
                                       pa.int64())})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("_grp").map_groups(group_pairs, batch_format="pyarrow")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("n", alias_name="n_shared")))
