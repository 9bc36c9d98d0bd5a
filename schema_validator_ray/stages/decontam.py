"""Benchmark decontamination: drop training documents that share any word
k-gram with an evaluation set (Brown et al. 2020 GPT-3 appendix C / Lee et al.
2022 dedup papers — public methodology).

Distributed shape (100-TB honest):

- The EVAL side is small by definition (benchmarks are thousands of docs, not
  billions). Its distinct shingle strings are collected once behind a loud
  size budget and broadcast via ``ray.put`` — read once per worker process
  (cached by object ref, not re-shipped per batch).
- The TRAIN side streams: one map-only ``map_batches`` pass computes each
  batch's k-grams (vectorized Arrow join of k shifted token views — no
  per-doc Python loop) and keeps rows with zero overlap. No shuffle at all.
- At real scale the broadcast payload is the 64-bit shingle-hash array (plus
  a Bloom filter in front); candidate hits then confirm against the exact
  strings stored alongside. Here the eval shingle vocabulary is small enough
  that the exact sorted-string membership test IS the confirm step, keeping
  the operator bit-exact with the SQL oracle.

The reference engine has no corpus-level operators (SURVEY.md §2.7); this is
part of the training-data surface the north star adds on top.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import word_kgrams

# eval shingle vocabularies beyond this explode the broadcast; at that point
# the right design is a shuffle semi-join on shingle hash (referential.py's
# shuffle strategy) — raise loudly rather than silently degrade
EVAL_SHINGLES_MAX = 50_000_000

_BCAST_SH_CACHE: dict = {}


def eval_shingles(eval_ds, text_col: str, k: int = 8) -> np.ndarray:
    """Distinct word k-gram strings of the eval corpus (sorted numpy str
    array). Per-batch dedup bounds what reaches the driver at each batch's
    shingle vocabulary, not its token count."""

    def partial(b: pa.Table) -> pa.Table:
        _, sh = word_kgrams(b[text_col], k)
        return pa.table({"sh": pc.unique(sh)})

    from ._collect import collect_up_to

    tabs, over = collect_up_to(
        eval_ds.map_batches(partial, batch_format="pyarrow"),
        EVAL_SHINGLES_MAX)
    if over:
        raise ValueError(
            f"eval shingle vocabulary exceeds {EVAL_SHINGLES_MAX}; "
            "use a shuffle semi-join on shingle hash instead of the "
            "broadcast path")
    parts = [t["sh"] for t in tabs]
    if not parts:
        return np.empty(0, dtype=object)
    allsh = pa.concat_arrays([p.combine_chunks() if isinstance(
        p, pa.ChunkedArray) else p for p in parts])
    return np.unique(allsh.to_numpy(zero_copy_only=False))


def _shingles_cached(ref) -> np.ndarray:
    hexid = ref.hex()
    ent = _BCAST_SH_CACHE.get(hexid)
    if ent is None:
        import ray

        ent = ray.get(ref)
        _BCAST_SH_CACHE.clear()  # hold at most one broadcast set
        _BCAST_SH_CACHE[hexid] = ent
    return ent


def decontaminate(train_ds, eval_ds, *, text_col: str, k: int = 8):
    """Filter ``train_ds`` down to rows sharing NO word k-gram with
    ``eval_ds``. Map-only over the training side; eval shingles broadcast
    once. Docs with fewer than k tokens can never be contaminated."""
    import ray

    sh_sorted = eval_shingles(eval_ds, text_col, k)
    ref = ray.put(sh_sorted)

    def keep_clean(b: pa.Table) -> pa.Table:
        ev = _shingles_cached(ref)
        if len(ev) == 0 or b.num_rows == 0:
            return b
        rows, sh = word_kgrams(b[text_col], k)
        if len(rows) == 0:
            return b
        sh_np = sh.to_numpy(zero_copy_only=False)
        # sorted membership probe (searchsorted beats np.isin's re-sort of
        # the big side: eval side is pre-sorted once at broadcast time)
        pos = np.searchsorted(ev, sh_np)
        pos[pos == len(ev)] = 0
        hit = ev[pos] == sh_np
        bad_rows = np.unique(rows[hit])
        mask = np.ones(b.num_rows, bool)
        mask[bad_rows] = False
        return b.filter(pa.array(mask))

    return train_ds.map_batches(keep_clean, batch_format="pyarrow")
