"""Exact shared-span duplication over a text column.

The grid-exact variant of exact substring dedup (cf. Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", which uses a
suffix array): every character k-gram of every doc is a span candidate, so
any shared substring of length >= k between two docs is caught — no suffix
array, no approximation. This is the EXACT complement to MinHash/SimHash:
those find mostly-similar docs cheaply; this finds verbatim copied spans.

No analogue in the reference (weilence/schema-validator is a per-record
rule engine); part of the training-data surface SURVEY §2.7 adds.

Data movement (see SCALE.md) — the naive shape would shuffle the full
k-gram string stream (~(k+16)x the text volume); instead:

1. pass A ships ONLY per-batch (span-hash, count) int64 partials
   (combinable, ~8 bytes per text char before in-batch dedup) to find span
   hashes seen in >= 2 docs — driver pyarrow merge under a loud budget,
   distributed groupby above it;
2. the duplicated-hash set (bounded by the corpus's verbatim-duplication
   volume, tiny on real data) broadcasts once via ``ray.put``;
3. pass B re-explodes and keeps only records whose hash is in the set —
   the surviving (hash, span, id) stream is duplication-sized, NOT
   corpus-sized — and every decision is verified against the span STRING,
   so hash collisions cannot create false positives.

Both passes are map-only; the only all-to-all in the common case is the
(h, n) partial exchange. Every driver merge sits behind ``collect_up_to``
with the distributed coarse-hash-group shuffle as the loud fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import hash64_ints
from ._collect import collect_up_to

# One StringArray's int32 offsets cap its value buffer at 2 GiB; a single
# doc whose unique-window count × k exceeds this must be chunked (module
# constant so tests can exercise the chunk path without a 2 GiB doc).
_I32_OFFSET_LIMIT = 2**31

_N_GROUPS = 256  # coarse shuffle groups (the repo's standard pattern)


class _SpanExplode:
    """map_batches stage: (text, id) -> per-doc-distinct (h, g, id) span
    records.

    ASCII fast path: one sliding_window_view over the UTF-8 bytes, per-doc
    dedup via a void view + np.unique, the output string array built
    zero-copy from the unique-window buffer. Non-ASCII rows (byte length
    != char length, so byte windows would not match SQL's character
    substring) fall back to per-row character windowing.
    """

    def __init__(self, text_col: str, id_col: str, k: int,
                 hashes_only: bool = False):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.hashes_only = hashes_only
        self.weights = np.power(np.uint64(1315423911),
                                np.arange(k, dtype=np.uint64),
                                dtype=np.uint64)

    def _hash_rows(self, mat: np.ndarray) -> np.ndarray:
        # polynomial over the first k BYTES (ties only partition work; the
        # span string itself is the verified key)
        return hash64_ints((mat.astype(np.uint64) * self.weights[:mat.shape[1]])
                           .sum(axis=1, dtype=np.uint64)).view(np.int64)

    def _empty(self) -> pa.Table:
        cols = {"h": pa.array([], pa.int64())}
        if not self.hashes_only:
            cols["g"] = pa.array([], pa.string())
            cols[self.id_col] = pa.array([], pa.int64())
        return pa.table(cols)

    def pos_hashes(self, t: str) -> np.ndarray:
        """Per-START-POSITION span hashes for one doc (NO per-doc dedup) —
        the removal pass needs every window instance, not the distinct set.
        Returns an int64 array of length ``len(t) - k + 1`` (empty when the
        doc is shorter than k)."""
        k = self.k
        if len(t) < k:
            return np.empty(0, np.int64)
        b = t.encode()
        if len(b) == len(t):  # ASCII: byte grid == char grid
            mat = np.lib.stride_tricks.sliding_window_view(
                np.frombuffer(b, np.uint8), k)
        else:
            n = len(t) - k + 1
            mat = np.zeros((n, k), np.uint8)
            for j in range(n):
                eb = t[j:j + k].encode()[:k]
                mat[j, :len(eb)] = np.frombuffer(eb, np.uint8)
        return self._hash_rows(mat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        spans_parts: list[pa.Array] = []
        hash_parts: list[np.ndarray] = []
        id_parts: list[np.ndarray] = []
        for i, t in enumerate(texts):
            t = t or ""
            if len(t) < k:
                continue
            b = t.encode()
            if len(b) == len(t):  # pure-ASCII: byte grid == char grid
                w = np.lib.stride_tricks.sliding_window_view(
                    np.frombuffer(b, np.uint8), k)
                u = np.unique(np.ascontiguousarray(w)
                              .view(np.dtype((np.void, k))).ravel())
                n = len(u)
                buf = u.tobytes()
                mat = np.frombuffer(buf, np.uint8).reshape(n, k)
                if not self.hashes_only:
                    if (n + 1) * k < _I32_OFFSET_LIMIT:
                        offsets = pa.array(
                            np.arange(n + 1, dtype=np.int32) * k)
                        spans_parts.append(pa.StringArray.from_buffers(
                            n, offsets.buffers()[1], pa.py_buffer(buf)))
                    else:
                        # int32 offsets would overflow (one doc's unique
                        # windows × k > 2 GiB): chunk the span list so each
                        # StringArray stays under the int32 offset limit
                        step = max(1, (_I32_OFFSET_LIMIT - 1) // k - 1)
                        for s0 in range(0, n, step):
                            m = min(step, n - s0)
                            off = pa.array(
                                np.arange(m + 1, dtype=np.int32) * k)
                            spans_parts.append(pa.StringArray.from_buffers(
                                m, off.buffers()[1],
                                pa.py_buffer(buf[s0 * k:(s0 + m) * k])))
            else:  # multibyte chars: per-row character windows
                uniq = sorted({t[j:j + k] for j in range(len(t) - k + 1)})
                n = len(uniq)
                # hash the first k bytes of each span's utf-8 encoding
                mat = np.zeros((n, k), np.uint8)
                for r, s in enumerate(uniq):
                    eb = s.encode()[:k]
                    mat[r, :len(eb)] = np.frombuffer(eb, np.uint8)
                if not self.hashes_only:
                    spans_parts.append(pa.array(uniq, pa.string()))
            hash_parts.append(self._hash_rows(mat))
            if not self.hashes_only:
                id_parts.append(np.full(n, ids[i], np.int64))
        if not hash_parts:
            return self._empty()
        cols = {"h": pa.array(np.concatenate(hash_parts))}
        if not self.hashes_only:
            cols["g"] = pa.concat_arrays(spans_parts)
            cols[self.id_col] = pa.array(np.concatenate(id_parts))
        return pa.table(cols)


def _edges_from_records(t: pa.Table, id_col: str) -> pa.Table:
    """Distinct star edges (a = span's min id, b = higher id sharing it)
    from (g, id) span records — span-STRING-exact via group_by + index_in."""
    if t.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    mins = t.group_by("g").aggregate([(id_col, "min")])
    idx = pc.index_in(t["g"], value_set=mins["g"].combine_chunks())
    minid = pc.take(mins[f"{id_col}_min"], idx)
    mask = pc.greater(t[id_col], minid)
    a = pc.filter(minid, mask).to_numpy(zero_copy_only=False)
    b = pc.filter(t[id_col], mask).to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    u = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"a": pa.array(u[:, 0].astype(np.int64)),
                     "b": pa.array(u[:, 1].astype(np.int64))})


def _edges_shuffle(exploded, id_col: str, *, n_groups: int = _N_GROUPS):
    """Over-budget fallback: shuffle (h, g, id) records into coarse hash
    groups, compute exact edges per group, dedup with a distributed
    two-key groupby. Correct at any scale; pays the full string shuffle."""
    from ray.data.aggregate import Count

    def add_grp(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.append_column("_grp", pa.array(
            (h.astype(np.uint64) % np.uint64(n_groups)).astype(np.int32)))

    def group_edges(g: pa.Table) -> pa.Table:
        return _edges_from_records(g, id_col)

    edges = (exploded.map_batches(add_grp, batch_format="pyarrow")
             .groupby("_grp").map_groups(group_edges, batch_format="pyarrow"))
    return (edges.groupby(["a", "b"]).aggregate(Count())
            .select_columns(["a", "b"]))


def _dup_hash_array(narrow, text_col: str, id_col: str, k: int,
                    driver_merge_max: int):
    """Sorted int64 array of span hashes seen in >= 2 docs, or ``None``
    when even the duplicated-hash set blows the budget (callers pick their
    own heavy fallback — the set itself is duplication-bounded, so None
    means the corpus is duplication-dominated)."""
    from ray.data.aggregate import Sum

    hasher = _SpanExplode(text_col, id_col, k, hashes_only=True)

    def h_counts(b: pa.Table) -> pa.Table:
        t = hasher(b)
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        agg = t.group_by("h").aggregate([("h", "count")])
        return pa.table({"h": agg["h"], "n": pc.cast(agg["h_count"],
                                                     pa.int64())})

    hc = narrow.map_batches(h_counts, batch_format="pyarrow")
    parts, over = collect_up_to(hc, driver_merge_max)
    if not over:
        if parts:
            m = pa.concat_tables(parts).group_by("h").aggregate(
                [("n", "sum")])
            m = m.filter(pc.greater(m["n_sum"], 1))
            return np.sort(m["h"].to_numpy(zero_copy_only=False))
        return np.empty(0, np.int64)
    # distributed count, then only hashes seen >= 2x come back (that set
    # is duplication-bounded); if even IT blows the budget, return None
    dups = (hc.groupby("h").aggregate(Sum("n", alias_name="n"))
            .map_batches(lambda t: pa.table(
                {"h": pc.filter(t["h"], pc.greater(t["n"], 1))}),
                batch_format="pyarrow"))
    dparts, dover = collect_up_to(dups, driver_merge_max)
    if dover:
        return None
    return np.sort(np.concatenate(
        [p["h"].to_numpy(zero_copy_only=False) for p in dparts])
        if dparts else np.empty(0, np.int64))


def _span_edges(ds, text_col: str, id_col: str, *, k: int,
                driver_merge_max: int = 4_000_000):
    """Distinct share-a-span star edges.

    Returns ``(table, dataset)`` — exactly one non-None: a driver-side
    pa.Table when every budget holds (the common case: edges are bounded
    by verbatim duplication), else a distributed Dataset from the shuffle
    fallback.
    """
    import ray

    narrow = ds.select_columns([id_col, text_col])
    dup_h = _dup_hash_array(narrow, text_col, id_col, k, driver_merge_max)
    if dup_h is None:
        exploded = narrow.map_batches(
            _SpanExplode(text_col, id_col, k), batch_format="pyarrow")
        return None, _edges_shuffle(exploded, id_col)

    if len(dup_h) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())}), None

    ref = ray.put(dup_h)
    explode = _SpanExplode(text_col, id_col, k)

    def survivors(b: pa.Table) -> pa.Table:
        import ray as _ray

        t = explode(b)
        if t.num_rows == 0:
            return t
        dh = _ray.get(ref)
        h = t["h"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(dh, h)
        idx[idx == len(dh)] = 0
        return t.filter(pa.array(dh[idx] == h))

    surv = narrow.map_batches(survivors, batch_format="pyarrow")
    sparts, sover = collect_up_to(surv, driver_merge_max)
    if sover:
        return None, _edges_shuffle(surv, id_col)
    if not sparts:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())}), None
    return _edges_from_records(
        pa.concat_tables(sparts).select(["g", id_col]), id_col), None


def shared_span_docs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                     k: int = 40, driver_merge_max: int = 4_000_000):
    """Docs that share at least one exact ``k``-char span with a LOWER-id
    doc (the deterministic keep-first convention every dedup op here uses).
    Returns a Dataset with the dominated ``id_col`` values, one row each.

    SQL-exact: ``SELECT DISTINCT a.doc_id FROM shingles a JOIN shingles b
    ON a.g = b.g AND b.doc_id < a.doc_id`` — star edges always point at
    the span min, and min < id covers exactly the lower-id witnesses.
    """
    import ray.data as rd

    et, eds = _span_edges(ds, text_col, id_col, k=k,
                          driver_merge_max=driver_merge_max)
    if et is not None:
        u = np.unique(et["b"].to_numpy(zero_copy_only=False))
        return rd.from_arrow(pa.table({id_col: pa.array(
            u.astype(np.int64))}))

    def only_b(t: pa.Table) -> pa.Table:
        u = np.unique(t["b"].to_numpy(zero_copy_only=False))
        return pa.table({id_col: pa.array(u.astype(np.int64))})

    from ray.data.aggregate import Count

    return (eds.map_batches(only_b, batch_format="pyarrow")
            .groupby(id_col).aggregate(Count()).select_columns([id_col]))


def span_dup_components(ds, text_col: str = "text", id_col: str = "doc_id",
                        *, k: int = 40, driver_merge_max: int = 4_000_000):
    """Connected components of the share-a-``k``-char-span graph: every doc
    that shares a span with any other gets (``id_col``, ``canonical_id``)
    where canonical_id = the component's min doc id. Star edges per span
    preserve components exactly (a span's sharers form a clique; each
    member is connected to the span min). Singleton docs are not emitted —
    matching the SQL oracle's edge-driven recursive closure.
    """
    import ray.data as rd

    from .dedup import connected_components, connected_components_ds

    et, eds = _span_edges(ds, text_col, id_col, k=k,
                          driver_merge_max=driver_merge_max)
    if et is not None:
        labels = connected_components(et, a_col="a", b_col="b")
        return rd.from_arrow(pa.table({
            id_col: pc.cast(labels["id"], pa.int64()),
            "canonical_id": pc.cast(labels["rep"], pa.int64())}))
    labels = connected_components_ds(eds, a_col="a", b_col="b")
    return labels.map_batches(
        lambda t: pa.table({id_col: pc.cast(t["id"], pa.int64()),
                            "canonical_id": pc.cast(t["rep"], pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicated-span REMOVAL — the actual dedup output (cleaned text), not
# just flags: the operation Lee et al. 2022 run with a suffix array.


def _strip_spans(t: str, starts: np.ndarray, k: int) -> str:
    """Remove every char covered by a window starting at ``starts`` —
    coverage union via a +1/−1 delta array + cumsum, one vectorized pass."""
    delta = np.zeros(len(t) + 1, np.int32)
    np.add.at(delta, starts, 1)
    np.add.at(delta, np.minimum(starts + k, len(t)), -1)
    covered = np.cumsum(delta[:-1]) > 0
    if not covered.any():
        return t
    b = t.encode()
    if len(b) == len(t):  # ASCII: mask the byte array directly
        return np.frombuffer(b, np.uint8)[~covered].tobytes().decode()
    return "".join(np.array(list(t), dtype=object)[~covered])


class _SpanRemover:
    """map_batches stage: rebuild each doc's text with duplicated spans
    excised. Candidate windows come from a searchsorted against the
    broadcast dup-hash array; only those few consult the (span -> min id)
    winner dict — so the per-doc work is one vectorized hash pass plus
    duplication-bounded dict lookups, never a per-window Python loop."""

    def __init__(self, text_col, id_col, k, out_col, dup_ref, winner_ref):
        self.text_col, self.id_col, self.k = text_col, id_col, k
        self.out_col = out_col
        self.dup_ref, self.winner_ref = dup_ref, winner_ref
        self.hasher = _SpanExplode(text_col, id_col, k, hashes_only=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        dup_h = ray.get(self.dup_ref)
        winner = ray.get(self.winner_ref)
        k = self.k
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out = []
        for i, t in enumerate(batch[self.text_col].to_pylist()):
            t = t or ""
            h = self.hasher.pos_hashes(t)
            if len(h) == 0 or len(dup_h) == 0:
                out.append(t)
                continue
            idx = np.searchsorted(dup_h, h)
            idx[idx == len(dup_h)] = 0
            cand = np.flatnonzero(dup_h[idx] == h)
            did = int(ids[i])
            starts = [j for j in cand
                      if winner.get(t[j:j + k], did) < did]
            out.append(_strip_spans(t, np.asarray(starts, np.int64), k)
                       if starts else t)
        return pa.table({self.id_col: batch[self.id_col],
                         self.out_col: pa.array(out, pa.string())})


def span_removal_state(ds, text_col: str = "text", id_col: str = "doc_id",
                       *, k: int = 40, driver_merge_max: int = 4_000_000
                       ) -> tuple[np.ndarray, dict | None]:
    """Compute the BROADCASTABLE state the map-only span-removal pass
    needs: (sorted dup-span hash array, span-string -> winner-min-id
    dict). Both are duplication-bounded, so a resumable pipeline can
    persist them between phases and rebuild any shard independently
    (see pipelines/curate_documents.run_curate_docs_resumable).

    Returns ``(dup_h, None)`` when the winner collect exceeds
    ``driver_merge_max`` (callers fall back to the shuffle path in
    :func:`dedup_spans_remove`); raises when the dup-hash set alone is
    over budget (duplication-dominated corpus — the fallback would
    shuffle ~k× the text)."""
    import ray

    narrow = ds.select_columns([id_col, text_col])
    dup_h = _dup_hash_array(narrow, text_col, id_col, k, driver_merge_max)
    if dup_h is None:
        raise ValueError(
            "span_removal_state: the duplicated-span-hash set alone "
            f"exceeds driver_merge_max={driver_merge_max} — the corpus is "
            "duplication-dominated; raise driver_merge_max or run "
            "shared_span_docs + drop whole docs instead")
    if len(dup_h) == 0:
        return dup_h, {}
    dup_ref = ray.put(dup_h)
    explode = _SpanExplode(text_col, id_col, k)

    def survivors(b: pa.Table) -> pa.Table:
        import ray as _ray

        t = explode(b)
        if t.num_rows == 0:
            return t
        dh = _ray.get(dup_ref)
        h = t["h"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(dh, h)
        idx[idx == len(dh)] = 0
        return t.filter(pa.array(dh[idx] == h))

    surv = narrow.map_batches(survivors, batch_format="pyarrow")
    sparts, sover = collect_up_to(surv, driver_merge_max)
    if sover:
        return dup_h, None
    winner: dict = {}
    if sparts:
        st = pa.concat_tables(sparts)
        mins = st.group_by("g").aggregate([(id_col, "min")])
        winner = dict(zip(mins["g"].to_pylist(),
                          mins[f"{id_col}_min"].to_pylist()))
    return dup_h, winner


def apply_span_removal(ds, state: tuple[np.ndarray, dict], *,
                       text_col: str = "text", id_col: str = "doc_id",
                       k: int = 40, out_col: str = "text_dedup"):
    """Map-only duplicated-span excision against a precomputed
    :func:`span_removal_state` — one broadcast, no shuffle, shard-
    independent (the resumable-pipeline phase-2 shape)."""
    import ray

    narrow = ds.select_columns([id_col, text_col])
    dup_h, winner = state
    if len(dup_h) == 0:
        return narrow.map_batches(
            lambda b: pa.table({
                id_col: b[id_col],
                out_col: pc.coalesce(pc.cast(b[text_col], pa.string()),
                                     "")}),
            batch_format="pyarrow")
    return narrow.map_batches(
        _SpanRemover(text_col, id_col, k, out_col, ray.put(dup_h),
                     ray.put(winner)),
        batch_format="pyarrow")


def dedup_spans_remove(ds, text_col: str = "text", id_col: str = "doc_id",
                       *, k: int = 40, driver_merge_max: int = 4_000_000,
                       out_col: str = "text_dedup"):
    """EXACT duplicated-span removal (the cleaned-corpus output of exact
    substring dedup, Lee et al. 2022): every char of every doc covered by a
    ``k``-char window whose exact string also occurs in a LOWER-id doc is
    removed; the span's winner doc (corpus-min ``id_col``) keeps its text
    untouched. Returns one row per input doc: (``id_col``, ``out_col``)
    with null text coalesced to ''.

    Data movement: the dup-hash pre-pass + winner-dict collect are the
    spans-module shape (int64 partials, duplication-bounded survivors);
    the rebuild is MAP-ONLY against the two broadcasts. When the winner
    set blows the driver budget, the fallback shuffles only dup-hash-
    filtered (still duplication-bounded) position records by coarse hash
    group, resolves winners per group, and rebuilds inside
    ``groupby(id)`` — the full corpus text never re-exchanges more than
    once. A corpus whose duplicated-hash SET alone exceeds the budget is
    duplication-dominated; that degenerate case raises loudly (position
    records would be ~k× the text volume) rather than silently shipping
    petabytes."""
    import ray
    import ray.data as rd

    narrow = ds.select_columns([id_col, text_col])
    dup_h, winner = span_removal_state(ds, text_col, id_col, k=k,
                                       driver_merge_max=driver_merge_max)
    if winner is not None:
        return apply_span_removal(ds, (dup_h, winner), text_col=text_col,
                                  id_col=id_col, k=k, out_col=out_col)
    dup_ref = ray.put(dup_h)

    # distributed fallback: dup-filtered POSITION records (id, pos, g)
    # shuffle once by coarse span-hash group; winners resolve per group and
    # the (id, pos) removal list — duplication-bounded — flows into a
    # groupby(id) rebuild alongside the doc texts.
    hasher = _SpanExplode(text_col, id_col, k, hashes_only=True)

    def explode_pos(b: pa.Table) -> pa.Table:
        import ray as _ray

        dh = _ray.get(dup_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        rid, rpos, rg, rh = [], [], [], []
        for i, t in enumerate(b[text_col].to_pylist()):
            t = t or ""
            h = hasher.pos_hashes(t)
            if len(h) == 0:
                continue
            idx = np.searchsorted(dh, h)
            idx[idx == len(dh)] = 0
            cand = np.flatnonzero(dh[idx] == h)
            for j in cand:
                rid.append(int(ids[i]))
                rpos.append(int(j))
                rg.append(t[j:j + k])
                rh.append(int(h[j]))
        # group by the DETERMINISTIC span hash (python's hash() is salted
        # per process — same string, different group on another worker)
        grp = (np.array(rh, np.int64).view(np.uint64) % np.uint64(_N_GROUPS)
               if rh else np.empty(0, np.uint64))
        return pa.table({"_grp": pa.array(grp.astype(np.int32)),
                         id_col: pa.array(rid, pa.int64()),
                         "pos": pa.array(rpos, pa.int64()),
                         "g": pa.array(rg, pa.string())})

    def group_removals(g: pa.Table) -> pa.Table:
        mins = g.group_by("g").aggregate([(id_col, "min")])
        idx = pc.index_in(g["g"], value_set=mins["g"].combine_chunks())
        minid = pc.take(mins[f"{id_col}_min"], idx)
        keep = pc.greater(g[id_col], minid)
        return pa.table({id_col: pc.filter(g[id_col], keep),
                         "pos": pc.filter(g["pos"], keep)})

    removal = (narrow.map_batches(explode_pos, batch_format="pyarrow")
               .groupby("_grp")
               .map_groups(group_removals, batch_format="pyarrow"))
    tagged_docs = narrow.map_batches(
        lambda b: pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "pos": pa.nulls(b.num_rows, pa.int64()),
            "txt": pc.coalesce(pc.cast(b[text_col], pa.string()), "")}),
        batch_format="pyarrow")
    tagged_rem = removal.map_batches(
        lambda b: pa.table({id_col: pc.cast(b[id_col], pa.int64()),
                            "pos": b["pos"],
                            "txt": pa.nulls(b.num_rows, pa.string())}),
        batch_format="pyarrow")

    def rebuild(g: pa.Table) -> pa.Table:
        txts = g["txt"].drop_null()
        t = txts[0].as_py() if len(txts) else ""
        starts = g["pos"].drop_null().to_numpy(zero_copy_only=False)
        did = g[id_col][0].as_py()
        return pa.table({id_col: pa.array([did], pa.int64()),
                         out_col: pa.array(
                             [_strip_spans(t, starts.astype(np.int64), k)
                              if len(starts) else t], pa.string())})

    return (tagged_docs.union(tagged_rem).groupby(id_col)
            .map_groups(rebuild, batch_format="pyarrow"))
