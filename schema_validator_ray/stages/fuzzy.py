"""Fuzzy (edit-distance) string similarity join.

Completes the near-duplicate family (exact hash, MinHash-Jaccard, SimHash /
Hamming, n-gram Jaccard, embedding cosine — stages/dedup.py) with the
typo-class metric: pairs of values within Levenshtein distance 1.

Shape (never all-pairs):
1. distinct values — per-batch distinct partials → groupby (fuzzy matching
   runs on the value DICTIONARY, which is vocabulary-bounded, not on rows);
2. SymDelete blocking (symmetric-deletion spell-check indexing, public
   SymSpell technique): each value explodes into its ≤ (len+1) single-
   deletion variants; two values at edit distance ≤ 1 ALWAYS share a
   variant (substitution: deleting the differing position from both gives
   the same string; insert/delete: the shorter IS a deletion of the longer);
3. per-bucket pair generation inside ``groupby(bucket).map_groups`` with a
   mega-bucket cap, distributed ``groupby(a, b)`` pair dedup;
4. exact ed≤1 verification (shared deletion only guarantees ed ≤ 2):
   same-length values must differ in ≤ 1 position, length-±1 values must
   align around one gap — both O(len) checks, no DP table.

The dictionary pass bounds every later stage: candidate volume is
O(vocabulary × value length), independent of row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAX_BUCKET = 2000  # pairs per bucket cap: ~2M comparisons worst case


def _ed_le_1(a: str, b: str) -> bool:
    """Exact Levenshtein ≤ 1 without a DP table (O(len))."""
    la, lb = len(a), len(b)
    if a == b:
        return True
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit_distance_pairs(ds, col: str, *, max_dist: int = 1,
                        max_bucket: int = _MAX_BUCKET):
    """All unordered pairs of DISTINCT ``col`` values with Levenshtein
    distance ≤ 1 (``max_dist`` other than 1 is not implemented — the
    SymDelete index generalizes but verification would need banded DP).
    Returns columns (a, b) with a < b lexically."""
    if max_dist != 1:
        raise NotImplementedError("only max_dist=1 is implemented")
    from ray.data.aggregate import Min

    def distinct_part(b: pa.Table) -> pa.Table:
        u = pc.unique(b[col].drop_null())
        return pa.table({"v": u,
                         "_c": pa.array(np.ones(len(u), np.int8))})

    vocab = (ds.map_batches(distinct_part, batch_format="pyarrow")
             .groupby("v").aggregate(Min("_c", alias_name="_c"))
             .map_batches(lambda t: t.drop_columns(["_c"]),
                          batch_format="pyarrow"))

    def explode(b: pa.Table) -> pa.Table:
        keys, vals = [], []
        for v in b["v"].to_pylist():
            keys.append(v)                    # the value itself
            vals.append(v)
            for i in range(len(v)):           # all single deletions
                keys.append(v[:i] + v[i + 1:])
                vals.append(v)
        return pa.table({"bucket": pa.array(keys, pa.string()),
                         "v": pa.array(vals, pa.string())})

    exploded = vocab.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        vs = sorted(set(g["v"].to_pylist()))
        n = len(vs)
        if n < 2 or n > max_bucket:
            if n > max_bucket:
                print(f"edit_distance_pairs: skipping mega-bucket "
                      f"({n} members)")
            return empty
        a_l, b_l = [], []
        for i in range(n):
            for j in range(i + 1, n):
                if _ed_le_1(vs[i], vs[j]):
                    a_l.append(vs[i])
                    b_l.append(vs[j])
        if not a_l:
            return empty
        return pa.table({"a": pa.array(a_l, pa.string()),
                         "b": pa.array(b_l, pa.string())})

    cand = exploded.groupby("bucket").map_groups(pairs,
                                                 batch_format="pyarrow")
    # a pair can collide in several deletion buckets: distributed dedup
    return (cand.map_batches(
        lambda t: t.append_column("_one", pa.array(np.ones(t.num_rows,
                                                           np.int8))),
        batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Min("_one", alias_name="_one"))
        .map_batches(lambda t: t.drop_columns(["_one"]),
                     batch_format="pyarrow"))
