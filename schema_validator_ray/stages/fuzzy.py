"""Fuzzy (edit-distance) string similarity join.

Completes the near-duplicate family (exact hash, MinHash-Jaccard, SimHash /
Hamming, n-gram Jaccard, embedding cosine — stages/dedup.py) with the
typo-class metric: pairs of values within Levenshtein distance ``max_dist``
(1 or 2).

Shape (never all-pairs):
1. distinct values — per-batch distinct partials → groupby (fuzzy matching
   runs on the value DICTIONARY, which is vocabulary-bounded, not on rows);
2. SymDelete blocking (symmetric-deletion spell-check indexing, public
   SymSpell technique): each value explodes into every variant reachable by
   deleting ≤ ``max_dist`` characters. Two values at edit distance ≤ d
   ALWAYS share such a variant (each edit op touches one position; deleting
   the touched positions from both sides converges on a common string) —
   the standard SymSpell completeness guarantee;
3. per-bucket pair generation inside ``groupby(bucket).map_groups`` with a
   mega-bucket cap, distributed ``groupby(a, b)`` pair dedup;
4. exact ed ≤ d verification: d=1 uses the O(len) alignment check, d=2 a
   banded (Ukkonen width 2d+1) early-exit DP — shared deletion variants only
   guarantee ed ≤ 2d, so verification is load-bearing.

The dictionary pass bounds every later stage: candidate volume is
O(vocabulary × value length^d), independent of row count.

A deletion bucket larger than ``max_bucket`` RAISES by default (an
over-large bucket means dropped genuine pairs — the repo's loud-budget
convention); pass ``on_mega_bucket="skip"`` to opt into best-effort.
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


def _ed_le(a: str, b: str, d: int) -> bool:
    """Exact Levenshtein ≤ d via banded DP (band 2d+1, early exit when a
    whole row exceeds d). O(len × d) — strings here are dictionary values,
    not documents."""
    if d == 1:
        return _ed_le_1(a, b)
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return False
    if a == b:
        return True
    inf = d + 1
    prev = [j if j <= d else inf for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(1, i - d)
        hi = min(lb, i + d)
        cur = [inf] * (lb + 1)
        if i <= d:
            cur[0] = i
        ca = a[i - 1]
        best = cur[0]
        for j in range(lo, hi + 1):
            v = prev[j - 1] + (ca != b[j - 1])
            if prev[j] + 1 < v:
                v = prev[j] + 1
            if cur[j - 1] + 1 < v:
                v = cur[j - 1] + 1
            if v <= d:
                cur[j] = v
                if v < best:
                    best = v
        if best > d:
            return False
        prev = cur
    return prev[lb] <= d


def _deletes(v: str, d: int) -> set:
    """All distinct strings reachable from ``v`` by ≤ d character
    deletions (including ``v`` itself)."""
    res = {v}
    frontier = {v}
    for _ in range(d):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1:])
        frontier = nxt - res
        res |= frontier
    return res


def edit_distance_pairs(ds, col: str, *, max_dist: int = 1,
                        max_bucket: int = _MAX_BUCKET,
                        on_mega_bucket: str = "error"):
    """All unordered pairs of DISTINCT ``col`` values with Levenshtein
    distance ≤ ``max_dist`` (1 or 2). Returns columns (a, b) with
    a < b lexically.

    ``on_mega_bucket``: ``"error"`` (default) raises when a deletion bucket
    exceeds ``max_bucket`` (skipping would silently drop genuine pairs);
    ``"skip"`` opts into best-effort with a logged skip."""
    if max_dist not in (1, 2):
        raise NotImplementedError("only max_dist in (1, 2) is implemented")
    if on_mega_bucket not in ("error", "skip"):
        raise ValueError("on_mega_bucket must be 'error' or 'skip'")
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
            for k in _deletes(v, max_dist):
                keys.append(k)
                vals.append(v)
        return pa.table({"bucket": pa.array(keys, pa.string()),
                         "v": pa.array(vals, pa.string())})

    exploded = vocab.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        vs = sorted(set(g["v"].to_pylist()))
        n = len(vs)
        if n > max_bucket:
            if on_mega_bucket == "error":
                raise ValueError(
                    f"edit_distance_pairs: deletion bucket "
                    f"{g['bucket'][0].as_py()!r} has {n} members "
                    f"(max_bucket={max_bucket}) — pairs would be dropped; "
                    f"raise max_bucket or pass on_mega_bucket='skip'")
            print(f"edit_distance_pairs: skipping mega-bucket ({n} members)")
            return empty
        if n < 2:
            return empty
        a_l, b_l = [], []
        for i in range(n):
            # banded length filter: values are length-sorted only weakly by
            # lexical order, so filter per pair (O(1) before the DP)
            for j in range(i + 1, n):
                if _ed_le(vs[i], vs[j], max_dist):
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


def edit_distance_join(ds_a, ds_b, col_a: str, col_b: str, *,
                       max_dist: int = 1, max_bucket: int = _MAX_BUCKET,
                       on_mega_bucket: str = "error"):
    """Record linkage across TWO tables: all (a, b) pairs with a a distinct
    ``col_a`` value of ``ds_a``, b a distinct ``col_b`` value of ``ds_b``,
    and Levenshtein(a, b) ≤ ``max_dist`` (equal values included — distance
    0). Same SymDelete dictionary blocking as ``edit_distance_pairs``; a
    side tag rides the exploded variants so pair generation only crosses
    sides inside a bucket (never within one table)."""
    if max_dist not in (1, 2):
        raise NotImplementedError("only max_dist in (1, 2) is implemented")
    if on_mega_bucket not in ("error", "skip"):
        raise ValueError("on_mega_bucket must be 'error' or 'skip'")
    from ray.data.aggregate import Min

    def vocab_of(ds, col, side):
        def distinct_part(b: pa.Table) -> pa.Table:
            u = pc.unique(b[col].drop_null())
            return pa.table({"v": pc.cast(u, pa.string()),
                             "_c": pa.array(np.ones(len(u), np.int8))})

        return (ds.map_batches(distinct_part, batch_format="pyarrow")
                .groupby("v").aggregate(Min("_c", alias_name="_c"))
                .map_batches(
                    lambda t: pa.table({
                        "v": t["v"],
                        "side": pa.array(
                            np.full(t.num_rows, side, np.int8))}),
                    batch_format="pyarrow"))

    vocab = vocab_of(ds_a, col_a, 0).union(vocab_of(ds_b, col_b, 1))

    def explode(b: pa.Table) -> pa.Table:
        keys, vals, sides = [], [], []
        for v, s in zip(b["v"].to_pylist(), b["side"].to_pylist()):
            for k in _deletes(v, max_dist):
                keys.append(k)
                vals.append(v)
                sides.append(s)
        return pa.table({"bucket": pa.array(keys, pa.string()),
                         "v": pa.array(vals, pa.string()),
                         "side": pa.array(sides, pa.int8())})

    exploded = vocab.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        sides = g["side"].to_numpy(zero_copy_only=False)
        va = sorted(set(np.asarray(g["v"].to_pylist(),
                                   object)[sides == 0].tolist()))
        vb = sorted(set(np.asarray(g["v"].to_pylist(),
                                   object)[sides == 1].tolist()))
        n = len(va) + len(vb)
        if n > max_bucket:
            if on_mega_bucket == "error":
                raise ValueError(
                    f"edit_distance_join: deletion bucket "
                    f"{g['bucket'][0].as_py()!r} has {n} members "
                    f"(max_bucket={max_bucket}) — pairs would be dropped; "
                    f"raise max_bucket or pass on_mega_bucket='skip'")
            print(f"edit_distance_join: skipping mega-bucket ({n} members)")
            return empty
        if not va or not vb:
            return empty
        a_l, b_l = [], []
        for x in va:
            for y in vb:
                if _ed_le(x, y, max_dist):
                    a_l.append(x)
                    b_l.append(y)
        if not a_l:
            return empty
        return pa.table({"a": pa.array(a_l, pa.string()),
                         "b": pa.array(b_l, pa.string())})

    cand = exploded.groupby("bucket").map_groups(pairs,
                                                 batch_format="pyarrow")
    return (cand.map_batches(
        lambda t: t.append_column("_one", pa.array(np.ones(t.num_rows,
                                                           np.int8))),
        batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Min("_one", alias_name="_one"))
        .map_batches(lambda t: t.drop_columns(["_one"]),
                     batch_format="pyarrow"))
