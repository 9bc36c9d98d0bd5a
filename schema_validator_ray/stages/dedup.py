"""Deduplication suite over the documents table: exact, MinHash-LSH, SimHash,
exact n-gram Jaccard verification, embedding-cosine near-dup.

Scale shapes (each documented where it deviates from naive):

- **exact**: content-hash column added vectorized in ``map_batches``; duplicate
  *detection* reuses the pre-aggregated uniqueness stage (only per-batch distinct
  hashes shuffle); duplicate *removal* is groupby(hash).head(1).
- **MinHash-LSH**: signatures per batch (actor-friendly stage) -> explode to
  narrow (bucket, id) rows -> collided buckets via the pre-aggregated
  uniqueness pattern (bounded by the duplicate rate, broadcast once) -> member
  rows re-derived WITH their signatures riding along -> pair generation AND
  signature verification inside ``groupby("bucket").map_groups`` — nothing but
  the final (a, b, est) pairs ever reaches the driver. Mega-buckets above
  ``max_bucket_size`` are skipped (logged worker-side): a degenerate bucket
  (e.g. empty docs colliding in every band) would otherwise be O(b^2).
- **SimHash**: 64-bit signs of weighted token hashes; candidates = equal 16-bit
  bank (4 banks = Hamming<=3 guarantee via pigeonhole); the simhash rides with
  the (bank-bucket, id) rows so exact-Hamming verification also happens inside
  ``groupby(bucket).map_groups`` — same fully-distributed shape as MinHash.
- **embedding**: random-hyperplane LSH buckets -> within-bucket pairwise cosine
  (distributed via ``groupby("bucket").map_groups``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import char_shingles, content_hash, jaccard
from .uniqueness import duplicate_keys

# pair-enumeration chunk: bounds the (pairs x num_perm) comparison matrix a
# single map_groups call holds (2^18 pairs x 128 bytes ~= 32 MB)
_PAIR_CHUNK = 1 << 18


def _collided_keys(ds, col: str, *, driver_merge_max: int = 5_000_000,
                   max_broadcast: int = 5_000_000) -> tuple[set, int]:
    """(keys of ``ds[col]`` occurring more than once, total rows under those
    keys) — the row total drives downstream strategy switches.

    Below ``driver_merge_max`` partial rows the per-batch (key, count) partials
    are merged with ONE driver-side pyarrow group_by — they are already narrow
    and in the object store, so this is milliseconds and skips a full Ray
    sort-groupby's fixed stage costs (the same pattern the flagship uses for
    its duplicate-key sets). Above it, falls back to the distributed
    ``duplicate_keys`` groupby (per-batch combine bounds hot keys)."""
    from ._collect import collect_up_to
    from .uniqueness import _PartialCounts

    partials = ds.map_batches(_PartialCounts(col), batch_format="pyarrow")
    parts, over = collect_up_to(partials, driver_merge_max)
    if not over:
        if not parts:
            return set(), 0
        merged = pa.concat_tables(parts).group_by(col).aggregate(
            [("cnt", "sum")])
        dup = merged.filter(pc.greater(merged["cnt_sum"], 1))
        n_rows = int(pc.sum(dup["cnt_sum"]).as_py() or 0)
        return set(dup[col].to_pylist()), n_rows
    out: set = set()
    n_rows = 0
    for b in duplicate_keys(ds, col, driver_merge_max=0).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        out.update(b[col].to_pylist())
        n_rows += int(pc.sum(b["dup_count"]).as_py() or 0)
        if len(out) > max_broadcast:
            raise MemoryError(
                f"collided-key set for {col!r} exceeds broadcast budget "
                f"({max_broadcast}); run exact dedup first")
    return out, n_rows


# ---------------------------------------------------------------------------
# exact dedup


class AddContentHash:
    def __init__(self, text_col: str, out_col: str = "content_hash"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(self.out_col, content_hash(batch[self.text_col]))


def exact_duplicate_groups(ds, text_col: str, id_col: str):
    """Dataset of (content_hash, dup_count) for texts occurring more than once."""
    hashed = ds.select_columns([id_col, text_col]).map_batches(
        AddContentHash(text_col), batch_format="pyarrow")
    return duplicate_keys(hashed, "content_hash")


def dedup_exact_keep_min(ds, text_col: str, id_col: str, *,
                         driver_merge_max: int = 5_000_000):
    """Survivors of exact dedup: per distinct text keep the row with min id.
    Pre-aggregates (hash, min_id) per batch before the exchange — the full
    rows never shuffle. Below ``driver_merge_max`` partial rows the partials
    merge with one driver-side pyarrow group_by (same threshold pattern as
    ``duplicate_keys``); above it, a distributed groupby-min."""
    import ray.data as rd
    from ray.data.aggregate import Min

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        AddContentHash(text_col), batch_format="pyarrow")

    def partial_min(b: pa.Table) -> pa.Table:
        agg = b.group_by("content_hash").aggregate([(id_col, "min")])
        return agg.rename_columns(["content_hash", id_col])

    partials = hashed.map_batches(partial_min, batch_format="pyarrow")
    if driver_merge_max:
        from ._collect import collect_up_to

        parts, over = collect_up_to(partials, driver_merge_max)
        if not over:
            if not parts:
                return partials
            merged = (pa.concat_tables(parts).group_by("content_hash")
                      .aggregate([(id_col, "min")])
                      .rename_columns(["content_hash", id_col]))
            return rd.from_arrow(merged)
        partials = hashed.map_batches(partial_min, batch_format="pyarrow")
    return partials.repartition(8).groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# argmax dedup — keep the "best" row per key (e.g. newest crawl snapshot)


def _pick_best(t: pa.Table, key: str, sort_keys: list[tuple[str, str]]
               ) -> pa.Table:
    """First row per key after an Arrow multi-key sort — vectorized
    (sort_indices + shifted-equality first-occurrence mask, no row loop)."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(t, sort_keys=[(key, "ascending"), *sort_keys])
    st = t.take(idx)
    k = st[key]
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    # null-aware adjacent equality: NULL keys form ONE partition with one
    # winner (SQL ROW_NUMBER() OVER (PARTITION BY key) semantics — NULLs
    # group together). pc.equal(null, null) is null, so fill with the
    # both-null test instead of blanket True (which kept EVERY null-key row)
    hi, lo = k.slice(1), k.slice(0, len(k) - 1)
    eq = pc.or_(pc.fill_null(pc.equal(hi, lo), False),
                pc.and_(pc.is_null(hi), pc.is_null(lo)))
    first = pa.concat_arrays([pa.array([True]), pc.invert(eq)])
    return st.filter(first)


def keep_best_rows(ds, key: str, order: list[tuple[str, bool]], *,
                   driver_merge_max: int = 5_000_000):
    """One surviving row per ``key``: the first under ``order`` — a list of
    (column, descending) pairs, ties broken by the later entries (callers
    should end with a unique column so the winner is deterministic).

    Distributed shape (recrawl dedup at 10^12 rows): each batch reduces to
    one winner row per local key before anything shuffles, so the exchange
    is bounded by keys-per-batch x row width, not input rows. Below
    ``driver_merge_max`` partial rows the winners merge with one driver-side
    pick (same threshold pattern as ``dedup_exact_keep_min``); above it, a
    distributed ``groupby(key).map_groups`` re-pick over the partials."""
    import ray.data as rd

    sort_keys = [(c, "descending" if d else "ascending") for c, d in order]

    def partial(b: pa.Table) -> pa.Table:
        return _pick_best(b, key, sort_keys)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if driver_merge_max:
        from ._collect import collect_up_to

        parts, over = collect_up_to(partials, driver_merge_max)
        if not over:
            if not parts:
                return partials
            return rd.from_arrow(
                _pick_best(pa.concat_tables(parts), key, sort_keys))
        partials = ds.map_batches(partial, batch_format="pyarrow")

    def re_pick(t: pa.Table) -> pa.Table:
        return _pick_best(t, key, sort_keys)

    # Ray's sort-based groupby cannot partition on null keys (None is not
    # orderable against real values in the boundary search), so the
    # distributed fallback splits them out. Null-key partials are already
    # reduced to <=1 winner row per batch, so the null side is
    # block-count-bounded and finishes with one driver pick.
    def keep_nonnull(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[key]))

    def keep_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t[key]))

    nn = (partials.map_batches(keep_nonnull, batch_format="pyarrow")
          .groupby(key).map_groups(re_pick, batch_format="pyarrow"))
    from ._collect import collect_up_to

    null_parts, n_over = collect_up_to(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(keep_null, batch_format="pyarrow"), 1_000_000)
    if n_over:
        raise ValueError("keep_best_rows: null-key winner partials exceed "
                         "the 1M-row driver budget — drop null keys "
                         "upstream")
    if not null_parts:
        return nn
    import ray.data as rd
    null_win = rd.from_arrow(
        _pick_best(pa.concat_tables(null_parts), key, sort_keys))
    return nn.union(null_win)


def dedup_keep_latest(ds, key: str, ts_col: str, tiebreak: str, *,
                      driver_merge_max: int = 5_000_000):
    """Recrawl dedup: per key keep the newest row (max ``ts_col``), ties to
    the smallest ``tiebreak`` — SQL ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY ts DESC, tiebreak) = 1``."""
    return keep_best_rows(ds, key, [(ts_col, True), (tiebreak, False)],
                          driver_merge_max=driver_merge_max)


# ---------------------------------------------------------------------------
# MinHash + LSH


def _perm_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2 ** 61 - 1, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2 ** 61 - 1, num_perm, dtype=np.uint64)
    return a, b


class MinHashStage:
    """(id, text) -> (id, sig: fixed_size_list<int64>[num_perm]). Permutation
    params are built once per actor in __init__."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 128,
                 shingle_k: int = 5, seed: int = 1234):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingles(text or "", self.shingle_k)
        if sh.size == 0:
            return np.zeros(self.num_perm, np.uint64)
        # h_i(x) = a_i * x + b_i (mod 2^64) — min over shingles, vectorized
        prod = np.multiply.outer(self.a, sh)  # (num_perm, |sh|) with wraparound
        return (prod + self.b[:, None]).min(axis=1)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """Batch-vectorized: shingle sets concatenated, one numpy pass per
        permutation with a segmented min (np.minimum.reduceat) — no per-doc
        Python/numpy-call overhead."""
        shingle_sets = [char_shingles(t or "", self.shingle_k) for t in texts]
        lens = np.array([s.size for s in shingle_sets], np.int64)
        sigs = np.zeros((len(texts), self.num_perm), np.uint64)
        nonempty = lens > 0
        if not nonempty.any():
            return sigs
        concat = np.concatenate([s for s in shingle_sets if s.size])
        starts = np.zeros(int(nonempty.sum()), np.int64)
        np.cumsum(lens[nonempty][:-1], out=starts[1:])
        for p in range(self.num_perm):
            vals = self.a[p] * concat + self.b[p]
            sigs[nonempty, p] = np.minimum.reduceat(vals, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        sigs = self.signatures(texts)
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel().astype(np.int64), pa.int64()), self.num_perm),
        })


def _sig_matrix(col) -> np.ndarray:
    """fixed_size_list<int64> column -> (n, num_perm) int64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.flatten().to_numpy(zero_copy_only=False)
                      ).reshape(len(col), -1)


def _band_buckets(sig: np.ndarray, bands: int, rows: int) -> list[list[str]]:
    """Per band, the bucket string of every row: "<band>:<hash-of-segment>".
    Shared by the narrow explode and the member (sig-carrying) explode so the
    two phases agree bit-for-bit."""
    out = []
    for b in range(bands):
        seg = np.ascontiguousarray(sig[:, b * rows:(b + 1) * rows])
        out.append([
            f"{b}:{hashlib.blake2b(seg[i].tobytes(), digest_size=8).hexdigest()}"
            for i in range(sig.shape[0])])
    return out


class _BandExplode:
    """Emit one narrow (bucket, id) row per band — never text or signatures.
    This feeds collided-bucket detection only."""

    def __init__(self, id_col: str, bands: int, rows: int):
        self.id_col = id_col
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.string()),
                             self.id_col: ids})
        sig = _sig_matrix(batch["sig"])
        per_band = _band_buckets(sig, self.bands, self.rows)
        out_bucket: list[str] = []
        for bk in per_band:
            out_bucket.extend(bk)
        out_ids = pa.concat_arrays([ids] * self.bands)
        return pa.table({
            "bucket": pa.array(out_bucket, pa.string()),
            self.id_col: out_ids,
        })


class _MemberExplode:
    """Second pass over the signature table: emit (bucket, id, sig) ONLY for
    rows landing in a collided bucket. The collided-bucket set is broadcast via
    ``ray.put`` (bounded by the duplicate rate, same argument as
    ``uniqueness_violations``); signatures ride along so verification happens
    inside the bucket group without any further lookup."""

    def __init__(self, id_col: str, bands: int, rows: int, dup_ref):
        self.id_col = id_col
        self.bands = bands
        self.rows = rows
        self.dup_ref = dup_ref
        self._dups: pa.Array | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._dups is None:
            self._dups = ray.get(self.dup_ref)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sig_col = batch["sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.string()),
                             self.id_col: ids, "sig": sig_col})
        sig = _sig_matrix(sig_col)
        per_band = _band_buckets(sig, self.bands, self.rows)
        parts = []
        for bk in per_band:
            t = pa.table({"bucket": pa.array(bk, pa.string()),
                          self.id_col: ids, "sig": sig_col})
            parts.append(t.filter(pc.is_in(t["bucket"], value_set=self._dups)))
        return pa.concat_tables(parts)


class _BucketPairsEst:
    """map_groups worker: one collided bucket -> verified pairs
    (a, b, jaccard_est >= threshold). est = fraction of equal minhash
    components; all signatures are present on the group rows."""

    def __init__(self, id_col: str, threshold: float, max_bucket_size: int):
        self.id_col = id_col
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size

    def __call__(self, g: pa.Table) -> pa.Table:
        ids_col = g[self.id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        empty = pa.table({"a": ids_col.slice(0, 0), "b": ids_col.slice(0, 0),
                          "jaccard_est": pa.array([], pa.float64())})
        n = g.num_rows
        if n < 2:
            return empty
        if n > self.max_bucket_size:
            print(f"[minhash-lsh] skipping mega-bucket of size {n} "
                  f"(cap {self.max_bucket_size})")
            return empty
        ids = ids_col.to_numpy(zero_copy_only=False)
        sig = _sig_matrix(g["sig"])
        order = np.argsort(ids, kind="stable")
        ids, sig = ids[order], sig[order]
        ii, jj = np.triu_indices(n, k=1)
        a_out, b_out, e_out = [], [], []
        for s in range(0, len(ii), _PAIR_CHUNK):
            ci, cj = ii[s:s + _PAIR_CHUNK], jj[s:s + _PAIR_CHUNK]
            est = (sig[ci] == sig[cj]).mean(axis=1)
            keep = est >= self.threshold
            a_out.append(ids[ci[keep]])
            b_out.append(ids[cj[keep]])
            e_out.append(np.round(est[keep], 6))
        a_np = np.concatenate(a_out)
        if a_np.size == 0:
            return empty
        return pa.table({
            "a": pa.array(a_np, type=ids_col.type),
            "b": pa.array(np.concatenate(b_out), type=ids_col.type),
            "jaccard_est": pa.array(np.concatenate(e_out), pa.float64()),
        })


def minhash_lsh_pairs(ds, text_col: str, id_col: str, *, num_perm: int = 128,
                      bands: int = 16, threshold: float = 0.5,
                      batch_size: int = 4096, concurrency: int | None = None,
                      max_bucket_size: int = 1024,
                      max_broadcast_buckets: int = 5_000_000,
                      sig_shuffle_max_rows: int = 200_000) -> pa.Table:
    """Near-duplicate pairs (id_a, id_b, jaccard_est >= threshold), fully
    distributed: candidate generation AND signature verification run inside
    ``groupby("bucket").map_groups`` over collided-bucket members; the driver
    only ever holds the collided-bucket id set (bounded by the duplicate rate)
    and the final pair table (tiny relative to input by construction — if it
    weren't, the corpus is mostly duplicates and exact dedup should run first).
    """
    import ray
    from ray.data.aggregate import Min

    rows = num_perm // bands
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage(text_col, id_col, num_perm), **kwargs)
    # materialized because it feeds two passes (bucket detect + member pass);
    # at 10^9+ docs (~1 KB/doc of signatures) skip the materialize and let
    # each pass recompute — signatures are a pure seeded function of text
    sigs_mat = sigs.materialize()

    banded = sigs_mat.map_batches(_BandExplode(id_col, bands, rows),
                                  batch_format="pyarrow")

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard_est": pa.array([], pa.float64())})

    # collided buckets via the pre-aggregated uniqueness pattern: per-batch
    # (bucket,count) partials, driver-merged below threshold with distributed
    # fallback; broadcast once
    dup_buckets, dup_rows = _collided_keys(
        banded, "bucket", max_broadcast=max_broadcast_buckets)
    if not dup_buckets:
        return empty
    dup_ref = ray.put(pa.array(sorted(dup_buckets)))

    # coarse-group buckets (hash(bucket) % n_groups): under heavy duplication
    # nearly every bucket collides, and one Ray group per bucket pays ~ms of
    # per-group overhead x 10^4-10^6 buckets; iterating buckets vectorized
    # inside a few hundred groups removes that while keeping the same bound
    n_groups = 256

    def add_grp(t: pa.Table) -> pa.Table:
        bk = t["bucket"].to_pylist()
        grp = np.fromiter(
            (int(hashlib.blake2b(b.encode(), digest_size=4).hexdigest(), 16)
             % n_groups for b in bk), np.int32, len(bk))
        return t.append_column("_grp", pa.array(grp, pa.int32()))

    def _per_bucket(g: pa.Table, fn) -> pa.Table:
        order = pc.sort_indices(g["bucket"])
        g = g.take(order)
        bk = g["bucket"].to_numpy(zero_copy_only=False)
        seg = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        seg = np.r_[seg, len(bk)]
        parts = [fn(g.slice(a, b - a)) for a, b in zip(seg[:-1], seg[1:])]
        return pa.concat_tables(parts) if parts else fn(g)

    if dup_rows <= sig_shuffle_max_rows:
        # sig-carrying path: signatures ride with the member rows, pairs are
        # generated AND verified inside the bucket groups (one shuffle)
        members = sigs_mat.map_batches(
            _MemberExplode(id_col, bands, rows, dup_ref),
            batch_format="pyarrow")
        est_fn = _BucketPairsEst(id_col, threshold, max_bucket_size)

        def bucket_pairs(g: pa.Table) -> pa.Table:
            return _per_bucket(g, est_fn)

        pairs = members.map_batches(add_grp, batch_format="pyarrow").groupby(
            "_grp").map_groups(bucket_pairs, batch_format="pyarrow")
        # the same pair surfaces once per colliding band with identical est —
        # distributed dedup, only (a, b, est) rows shuffle
        deduped = pairs.groupby(["a", "b"]).aggregate(
            Min("jaccard_est", alias_name="jaccard_est"))
    else:
        # heavy-duplication path: shipping ~1 KB signatures once per (band,
        # member) would shuffle bands x corpus bytes; instead generate
        # candidate pairs over NARROW (bucket, id) rows, dedup, then verify by
        # joining each side's signature on (hash-partitioned, one sig per doc)
        from ray.data.aggregate import Count

        from .referential import default_join_partitions

        def members_narrow(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["bucket"],
                                     value_set=ray.get(dup_ref)))

        def cand_fn(g: pa.Table) -> pa.Table:
            ids_col = g[id_col]
            if isinstance(ids_col, pa.ChunkedArray):
                ids_col = ids_col.combine_chunks()
            n = g.num_rows
            if n < 2 or n > max_bucket_size:
                if n > max_bucket_size:
                    print(f"[minhash-lsh] skipping mega-bucket of size {n} "
                          f"(cap {max_bucket_size})")
                return pa.table({"a": ids_col.slice(0, 0),
                                 "b": ids_col.slice(0, 0)})
            ids = np.sort(ids_col.to_numpy(zero_copy_only=False),
                          kind="stable")
            ii, jj = np.triu_indices(n, k=1)
            return pa.table({"a": pa.array(ids[ii], ids_col.type),
                             "b": pa.array(ids[jj], ids_col.type)})

        def bucket_cands(g: pa.Table) -> pa.Table:
            return _per_bucket(g, cand_fn)

        cand = (banded.map_batches(members_narrow, batch_format="pyarrow")
                .map_batches(add_grp, batch_format="pyarrow")
                .groupby("_grp").map_groups(bucket_cands,
                                            batch_format="pyarrow"))
        ded = (cand.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
               .select_columns(["a", "b"]))
        npart = default_join_partitions(16)

        def pack(side: str):
            # Arrow's acero join rejects fixed_size_list payload columns —
            # ship signatures as raw little-endian bytes instead
            def f(t: pa.Table) -> pa.Table:
                m = _sig_matrix(t["sig"])
                blobs = [m[i].tobytes() for i in range(m.shape[0])]
                return pa.table({side: t[id_col],
                                 f"sig_{side}": pa.array(blobs, pa.binary())})
            return f

        sa = sigs_mat.map_batches(pack("a"), batch_format="pyarrow")
        sb = sigs_mat.map_batches(pack("b"), batch_format="pyarrow")
        j2 = (ded.join(sa, join_type="inner", num_partitions=npart,
                       on=("a",))
              .join(sb, join_type="inner", num_partitions=npart, on=("b",)))

        def est_verify(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"a": t["a"], "b": t["b"],
                                 "jaccard_est": pa.array([], pa.float64())})
            sig_a = np.frombuffer(
                b"".join(t["sig_a"].to_pylist()), np.int64
            ).reshape(t.num_rows, -1)
            sig_b = np.frombuffer(
                b"".join(t["sig_b"].to_pylist()), np.int64
            ).reshape(t.num_rows, -1)
            est = (sig_a == sig_b).mean(axis=1)
            keep = est >= threshold
            kept = t.filter(pa.array(keep))
            return pa.table({"a": kept["a"], "b": kept["b"],
                             "jaccard_est": pa.array(
                                 np.round(est[keep], 6), pa.float64())})

        deduped = j2.map_batches(est_verify, batch_format="pyarrow")

    chunks = list(deduped.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"))
    if not chunks:
        return empty
    tbl = pa.concat_tables(chunks)
    return tbl.sort_by([("a", "ascending"), ("b", "ascending")])


def verify_pairs_exact_jaccard(ds, pairs: pa.Table, text_col: str, id_col: str,
                               *, shingle_k: int = 5,
                               threshold: float = 0.5,
                               sim_fn=None) -> pa.Table:
    """Exact n-gram Jaccard over candidate pairs, fully distributed: the
    candidate id set broadcasts once (duplicate-rate-bounded), ONLY candidate
    docs are re-read, and each doc's text joins onto its pairs via two
    hash-partitioned ``Dataset.join``s — the shingle computation runs inside
    ``map_batches``; the driver holds just the id set and the verified pairs.

    ``sim_fn(text_a, text_b) -> float`` overrides the similarity (default:
    Jaccard over hashed byte ``shingle_k``-grams)."""
    import ray
    import ray.data as rd

    from .referential import default_join_partitions

    if sim_fn is None:
        def sim_fn(x, y):
            return jaccard(char_shingles(x or "", shingle_k),
                           char_shingles(y or "", shingle_k))

    empty = pa.table({"a": pairs["a"].slice(0, 0),
                      "b": pairs["b"].slice(0, 0),
                      "jaccard": pa.array([], pa.float64())})
    need = set(pairs["a"].to_pylist()) | set(pairs["b"].to_pylist())
    if not need:
        return empty
    ref = ray.put(pa.array(sorted(need)))

    def pick(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[id_col], value_set=ray.get(ref))
        return b.filter(mask).select([id_col, text_col])

    docs = ds.map_batches(pick, batch_format="pyarrow")
    np_join = default_join_partitions(8)

    def ren(side: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({side: b[id_col], f"text_{side}": b[text_col]})
        return f

    pairs_ds = rd.from_arrow(pairs.select(["a", "b"]))
    j1 = pairs_ds.join(docs.map_batches(ren("a"), batch_format="pyarrow"),
                       join_type="inner", num_partitions=np_join, on=("a",))
    j2 = j1.join(docs.map_batches(ren("b"), batch_format="pyarrow"),
                 join_type="inner", num_partitions=np_join, on=("b",))

    def verify(b: pa.Table) -> pa.Table:
        a_ids = b["a"].to_pylist()
        b_ids = b["b"].to_pylist()
        ta = b["text_a"].to_pylist()
        tb = b["text_b"].to_pylist()
        a_l, b_l, j_l = [], [], []
        for a, bb, x, y in zip(a_ids, b_ids, ta, tb):
            j = sim_fn(x, y)
            if j >= threshold:
                a_l.append(a)
                b_l.append(bb)
                j_l.append(round(j, 6))
        return pa.table({"a": pa.array(a_l, b["a"].type),
                         "b": pa.array(b_l, b["b"].type),
                         "jaccard": pa.array(j_l, pa.float64())})

    out = j2.map_batches(verify, batch_format="pyarrow")
    chunks = [c for c in out.iter_batches(batch_size=1 << 20,
                                          batch_format="pyarrow")
              if c.num_rows]
    if not chunks:
        return empty
    return pa.concat_tables(chunks).sort_by(
        [("a", "ascending"), ("b", "ascending")])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (prefix filtering)


def _cp_shingles(text: str, k: int) -> np.ndarray:
    """Distinct character ``k``-grams of ``text`` as sorted fixed-width byte
    records (k UTF-32-LE code points = 4k bytes each, space-padded to ``k``
    characters). Character semantics — not bytes — so a DuckDB
    ``substring(text, i, k)`` oracle reproduces the set exactly; texts
    containing U+0000 are out of scope (SQL strings cannot hold NUL)."""
    cps = np.frombuffer((text or "").encode("utf-32-le"), dtype="<u4")
    if len(cps) < k:
        cps = np.pad(cps, (0, k - len(cps)), constant_values=32)
    win = np.ascontiguousarray(np.lib.stride_tricks.sliding_window_view(cps, k))
    return np.unique(win.view(f"S{4 * k}").ravel())


def ngram_jaccard_pairs(ds, text_col: str, id_col: str, *, k: int = 5,
                        threshold: float = 0.8, n_groups: int = 256,
                        max_bucket_size: int = 65536,
                        max_candidates: int = 5_000_000) -> pa.Table:
    """EXACT character-n-gram Jaccard similarity join: all pairs (a, b,
    jaccard >= threshold) over distinct ``k``-gram sets — no sketching, no
    estimate. Never all-pairs: candidate generation uses PREFIX FILTERING
    (Chaudhuri et al. SSJoin / Bayardo et al. All-Pairs): under any global
    ordering of the shingle universe, two sets with J >= t must share a
    shingle among each one's first ``n - ceil(t*n) + 1`` shingles, so only
    that prefix is exploded (~(1-t) of the shingle volume) and only prefix
    co-occurrence creates a candidate. Distributed shape mirrors the
    minhash path:

    1. map_batches: per doc, sorted distinct shingle records; emit
       (group = hash(shingle) % n_groups, shingle, id, set size) for the
       prefix only.
    2. groupby(group) — coarse shards, never one Ray group per shingle —
       vectorized per-shingle segments inside; pairs length-filtered
       (min >= t * max) with a loud mega-bucket cap.
    3. distributed groupby(a, b) dedup of candidates, then exact verify via
       the hash-partitioned joins of ``verify_pairs_exact_jaccard`` with
       the same code-point shingles.

    At 10^12 scale the prefix explode is the only wide exchange and shrinks
    as threshold rises; candidate count is bounded by the near-dup rate."""
    import math

    import ray
    from ray.data.aggregate import Count

    rec_bytes = 4 * k

    def prefix_explode(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col]
        pre_parts, id_idx, sizes = [], [], []
        for i, t in enumerate(texts):
            recs = _cp_shingles(t, k)
            n = len(recs)
            p = n - math.ceil(threshold * n) + 1
            pre_parts.append(recs[:p])
            id_idx.append(np.full(p, i, np.int64))
            sizes.append(np.full(p, n, np.int64))
        pre = (np.concatenate(pre_parts) if pre_parts
               else np.array([], f"S{rec_bytes}"))
        grams = pa.Array.from_buffers(
            pa.binary(rec_bytes), len(pre),
            [None, pa.py_buffer(pre.tobytes())])
        u8 = np.frombuffer(pre.tobytes(), np.uint8).reshape(-1, rec_bytes)
        w = np.power(np.uint64(1099511628211),
                     np.arange(rec_bytes, dtype=np.uint64), dtype=np.uint64)
        grp = ((u8.astype(np.uint64) * w).sum(axis=1, dtype=np.uint64)
               % np.uint64(n_groups)).astype(np.int32)
        take = pa.array(np.concatenate(id_idx) if id_idx
                        else np.array([], np.int64))
        return pa.table({
            "_grp": pa.array(grp, pa.int32()),
            "g": grams,
            "id": ids.take(take),
            "n": pa.array(np.concatenate(sizes) if sizes
                          else np.array([], np.int64), pa.int64()),
        })

    def group_pairs(g: pa.Table) -> pa.Table:
        ids_col = g["id"]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        empty = pa.table({"a": ids_col.slice(0, 0), "b": ids_col.slice(0, 0)})
        if g.num_rows < 2:
            return empty
        order = pc.sort_indices(g["g"])
        g = g.take(order)
        gr = np.frombuffer(b"".join(g["g"].to_pylist()),
                           f"S{rec_bytes}")
        seg = np.r_[np.flatnonzero(np.r_[True, gr[1:] != gr[:-1]]), len(gr)]
        ids = g["id"].to_numpy(zero_copy_only=False)
        sz = g["n"].to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        for s0, s1 in zip(seg[:-1], seg[1:]):
            m = s1 - s0
            if m < 2:
                continue
            if m > max_bucket_size:
                print(f"[ngram-jaccard] skipping mega-shingle bucket of size "
                      f"{m} (cap {max_bucket_size})")
                continue
            ii, jj = np.triu_indices(m, k=1)
            sa, sb = sz[s0 + ii], sz[s0 + jj]
            keep = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb)
            ia, ib = ids[s0 + ii[keep]], ids[s0 + jj[keep]]
            a_out.append(np.minimum(ia, ib))
            b_out.append(np.maximum(ia, ib))
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out), ids_col.type),
                         "b": pa.array(np.concatenate(b_out), ids_col.type)})

    cand = (ds.select_columns([id_col, text_col])
            .map_batches(prefix_explode, batch_format="pyarrow")
            .groupby("_grp").map_groups(group_pairs, batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
            .select_columns(["a", "b"]))

    from ._collect import collect_up_to

    parts, over = collect_up_to(cand, max_candidates)
    if over:
        raise ValueError(
            f"ngram_jaccard_pairs: >{max_candidates} candidate pairs — "
            f"the corpus is dominated by near-duplicates; run exact "
            f"dedup first or raise `threshold`")
    sch = ds.schema()
    t0 = sch.types[sch.names.index(id_col)]
    id_type = t0 if isinstance(t0, pa.DataType) else pa.int64()
    if not parts:
        return pa.table({"a": pa.array([], id_type),
                         "b": pa.array([], id_type),
                         "jaccard": pa.array([], pa.float64())})
    pairs = pa.concat_tables(parts)

    def cp_sim(x: str, y: str) -> float:
        ra, rb = _cp_shingles(x, k), _cp_shingles(y, k)
        if len(ra) and len(rb):
            pos = np.clip(np.searchsorted(ra, rb), 0, len(ra) - 1)
            inter = int((ra[pos] == rb).sum())
        else:
            inter = 0
        union = len(ra) + len(rb) - inter
        return inter / union if union else 1.0

    return verify_pairs_exact_jaccard(
        ds, pairs, text_col, id_col, threshold=threshold, sim_fn=cp_sim)


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """(id, text) -> (id, simhash:int64, bank0..bank3:int32) — 16-bit banks for
    Hamming<=3 candidate generation by pigeonhole."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> int:
        import re

        toks = re.findall(r"\w+", (text or "").lower())
        if not toks:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                            "little") for t in toks), np.uint64, len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        val = np.uint64(0)
        for i in range(64):
            if score[i] > 0:
                val |= np.uint64(1) << np.uint64(i)
        return int(val.astype(np.int64))

    @staticmethod
    def simhash_batch(texts: list[str]) -> np.ndarray:
        """Batch-vectorized: tokens hashed once per UNIQUE token across the
        batch, per-doc bit scores via a segmented sum — no per-doc numpy-call
        overhead. Bit-identical to simhash64 per doc."""
        import re

        tok_lists = [re.findall(r"\w+", (t or "").lower()) for t in texts]
        vocab: dict = {}
        for toks in tok_lists:
            for t in toks:
                vocab[t] = None
        out = np.zeros(len(texts), np.int64)
        if not vocab:
            return out
        keys = list(vocab)
        from ..functions.sketches import hash64_strings

        hs = dict(zip(keys, hash64_strings(keys)))
        lens = np.array([len(t) for t in tok_lists], np.int64)
        flat = np.fromiter((hs[t] for toks in tok_lists for t in toks),
                           np.uint64, int(lens.sum()))
        if flat.size == 0:
            return out
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1)).astype(np.int32)
        contrib = 2 * bits - 1
        starts = np.zeros(len(texts), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        nonempty = lens > 0
        sums = np.add.reduceat(contrib, starts[nonempty], axis=0)
        pos = sums > 0
        vals = (pos.astype(np.uint64)
                @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
        out[nonempty] = vals.astype(np.int64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        # per-doc loop is cache-resident and beats a batched (tokens x 64)
        # matrix here (measured: the batch variant was ~3x slower)
        sh = np.fromiter((self.simhash64(t) for t in texts), np.int64,
                         len(texts))
        u = sh.view(np.uint64)
        banks = [((u >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int32)
                 for i in range(4)]
        cols = {self.id_col: batch[self.id_col],
                "simhash": pa.array(sh, pa.int64())}
        for i, bk in enumerate(banks):
            cols[f"bank{i}"] = pa.array(bk, pa.int32())
        return pa.table(cols)


class _BankBucketExplode:
    """(id, simhash, bank0..3) -> 4 narrow rows (bkt:int32, id, simhash) where
    bkt = bank_index*2^16 + bank_value — one combined key for all 4 banks so a
    single groupby covers the whole candidate space. The simhash rides along
    for in-group verification."""

    def __init__(self, id_col: str):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sh = batch["simhash"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        parts = []
        for bank in range(4):
            bv = batch[f"bank{bank}"].to_numpy(zero_copy_only=False)
            bkt = (bank << 16) | bv.astype(np.int64)
            parts.append(pa.table({
                "bkt": pa.array(bkt.astype(np.int32), pa.int32()),
                self.id_col: ids,
                "simhash": sh,
            }))
        return pa.concat_tables(parts)


class _BankPairsHamming:
    """map_groups worker: one collided bank bucket -> pairs with exact
    Hamming(simhash) <= max_hamming."""

    def __init__(self, id_col: str, max_hamming: int, max_bucket_size: int):
        self.id_col = id_col
        self.max_hamming = max_hamming
        self.max_bucket_size = max_bucket_size

    def __call__(self, g: pa.Table) -> pa.Table:
        ids_col = g[self.id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        empty = pa.table({"a": ids_col.slice(0, 0), "b": ids_col.slice(0, 0),
                          "hamming": pa.array([], pa.int32())})
        n = g.num_rows
        if n < 2:
            return empty
        if n > self.max_bucket_size:
            print(f"[simhash] skipping mega-bucket of size {n} "
                  f"(cap {self.max_bucket_size})")
            return empty
        ids = ids_col.to_numpy(zero_copy_only=False)
        sh = g["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order].view(np.uint64)
        ii, jj = np.triu_indices(n, k=1)
        a_out, b_out, h_out = [], [], []
        for s in range(0, len(ii), _PAIR_CHUNK):
            ci, cj = ii[s:s + _PAIR_CHUNK], jj[s:s + _PAIR_CHUNK]
            xors = sh[ci] ^ sh[cj]
            ham = np.unpackbits(
                xors.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            keep = ham <= self.max_hamming
            a_out.append(ids[ci[keep]])
            b_out.append(ids[cj[keep]])
            h_out.append(ham[keep].astype(np.int32))
        a_np = np.concatenate(a_out)
        if a_np.size == 0:
            return empty
        return pa.table({
            "a": pa.array(a_np, type=ids_col.type),
            "b": pa.array(np.concatenate(b_out), type=ids_col.type),
            "hamming": pa.array(np.concatenate(h_out), pa.int32()),
        })


class _HashToBanks:
    """(id, hash:int64) -> (id, simhash, bank0..3) — 16-bit bands of ANY int64
    hash column (text simhash, image phash, hyperplane signature), so one pair
    machinery serves them all."""

    def __init__(self, hash_col: str, id_col: str):
        self.hash_col = hash_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch[self.hash_col]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        u = h.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        cols = {self.id_col: batch[self.id_col],
                "simhash": pc.cast(h, pa.int64())}
        for i in range(4):
            bk = ((u >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int32)
            cols[f"bank{i}"] = pa.array(bk, pa.int32())
        return pa.table(cols)


def simhash_pairs(ds, text_col: str, id_col: str, *, max_hamming: int = 3,
                  batch_size: int = 4096, max_bucket_size: int = 1024,
                  max_broadcast_buckets: int = 5_000_000) -> pa.Table:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Signature stage +
    the generic :func:`hash_hamming_pairs` band machinery."""
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        SimHashStage(text_col, id_col), batch_format="pyarrow",
        batch_size=batch_size)
    return hash_hamming_pairs(sigs, "simhash", id_col, max_hamming=max_hamming,
                              max_bucket_size=max_bucket_size,
                              max_broadcast_buckets=max_broadcast_buckets)


def hash_hamming_pairs(ds, hash_col: str, id_col: str, *, max_hamming: int = 3,
                       max_bucket_size: int = 1024,
                       max_broadcast_buckets: int = 5_000_000) -> pa.Table:
    """All (a, b, hamming) pairs with Hamming(hash) <= max_hamming over any
    int64 hash column. Candidates from 4x16-bit bank equality — pigeonhole-
    COMPLETE for Hamming<=3 (3 bit flips cannot touch all 4 banks) — verified
    by exact popcount inside ``groupby(bucket).map_groups``; the hash travels
    with the bucket rows, so the driver only holds the collided-bucket set and
    the final pairs. Identical values (e.g. hot phash buckets) collide in all
    4 banks and come out as hamming=0 pairs, capped by ``max_bucket_size``."""
    import ray
    from ray.data.aggregate import Min

    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "4x16-bit banding is only complete for max_hamming <= 3")

    sigs = ds.select_columns([id_col, hash_col]).map_batches(
        _HashToBanks(hash_col, id_col), batch_format="pyarrow")

    exploded = sigs.map_batches(_BankBucketExplode(id_col),
                                batch_format="pyarrow").materialize()
    esch = exploded.schema()
    idt = dict(zip(esch.names, esch.types))[id_col]

    empty = pa.table({"a": pa.array([], idt),
                      "b": pa.array([], idt),
                      "hamming": pa.array([], pa.int32())})

    dup_vals, _ = _collided_keys(exploded.select_columns(["bkt"]), "bkt",
                                 max_broadcast=max_broadcast_buckets)
    if not dup_vals:
        return empty
    ref = ray.put(pa.array(sorted(dup_vals), pa.int32()))

    def members(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        return t.filter(pc.is_in(t["bkt"], value_set=_ray.get(_ref)))

    # same coarse-grouping as the minhash path: iterate buckets vectorized
    # inside ~256 groups instead of one Ray group per collided bank value
    n_groups = 256
    ham_fn = _BankPairsHamming(id_col, max_hamming, max_bucket_size)

    def add_grp(t: pa.Table) -> pa.Table:
        bk = t["bkt"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_grp", pa.array((bk.astype(np.int64) % n_groups).astype(np.int32),
                             pa.int32()))

    def bank_pairs(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g["bkt"])
        g = g.take(order)
        bk = g["bkt"].to_numpy(zero_copy_only=False)
        seg = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        seg = np.r_[seg, len(bk)]
        parts = [ham_fn(g.slice(a, b - a)) for a, b in zip(seg[:-1], seg[1:])]
        return pa.concat_tables(parts) if parts else ham_fn(g)

    pairs = (exploded.map_batches(members, batch_format="pyarrow")
             .map_batches(add_grp, batch_format="pyarrow")
             .groupby("_grp").map_groups(bank_pairs, batch_format="pyarrow"))
    deduped = pairs.groupby(["a", "b"]).aggregate(
        Min("hamming", alias_name="hamming"))

    chunks = list(deduped.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"))
    if not chunks:
        return empty
    tbl = pa.concat_tables(chunks).sort_by(
        [("a", "ascending"), ("b", "ascending")])
    return pa.table({"a": tbl["a"], "b": tbl["b"],
                     "hamming": pc.cast(tbl["hamming"], pa.int32())})


def connected_components_ds(pairs_ds, all_ids_ds=None, *,
                            a_col: str = "a", b_col: str = "b",
                            max_iter: int = 64, n_shards: int = 64,
                            partitions: int = 16):
    """Fully distributed connected components over a pair-graph Dataset:
    min-label propagation along edges plus pointer jumping
    (rep <- rep[rep]) each round, converging in O(log diameter) rounds —
    the scale path when the pair list exceeds the driver budget.

    Returns a Dataset of (id, rep) with rep = min id of the component.
    Labels only decrease and every label value is itself an id with a
    label row, so the sharded lookup is total. No ``Dataset.join``: the
    label lookups run as the repo's standard sharded
    ``groupby(shard).map_groups`` pattern (acero joins reject the
    schema-less empty blocks Ray's shuffle emits for empty partitions, and
    Ray 2.49 joins deadlock when partitions exceed CPUs). The loop stops
    on the first round whose labels are unchanged — a fixpoint, since the
    update is deterministic."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    from .asof import _conform, _shard_of

    # Two loop invariants keep per-iteration cost CONSTANT:
    # 1. every materialize is preceded by a repartition — Ray's sort-based
    #    groupby inherits its partition count from the input block count,
    #    and unions ADD block counts (else blocks grow ~4x per round);
    # 2. each materialized result is re-wrapped via from_arrow_refs
    #    (zero-copy: the blocks stay put) — a MaterializedDataset carries
    #    its full stats/lineage tree, and self-referencing unions double
    #    that tree per round, which in Ray 2.49 doubles driver overhead
    #    per iteration even though the plans and data are constant.
    def _sever(mat):
        return rd.from_arrow_refs(mat.to_arrow_refs())

    edges = _sever(pairs_ds.map_batches(
        lambda b: pa.table({"a": b[a_col], "b": b[b_col]}),
        batch_format="pyarrow").repartition(partitions).materialize())
    esch = edges.schema()
    ktype = dict(zip(esch.names, esch.types))["a"]
    usch = pa.schema([pa.field("key", ktype), pa.field("id", ktype),
                      pa.field("rep", ktype),
                      pa.field("_shard", pa.int32()),
                      pa.field("_side", pa.int8())])

    def _tag(t: pa.Table, side: int) -> pa.Table:
        sh = pa.array(_shard_of(t["key"], n_shards))
        t = t.append_column("_shard", sh)
        t = t.append_column("_side", pa.array(
            np.full(t.num_rows, side, np.int8)))
        return _conform(t, usch)

    def lookup(g: pa.Table) -> pa.Table:
        """Resolve member rows (side=1: key, id) against label rows
        (side=0: key, rep) of the same shard -> (id=member id, rep of key).
        Vectorized: labels sorted by key once, one searchsorted."""
        side = g["_side"].to_numpy(zero_copy_only=False)
        labs = g.filter(pa.array(side == 0))
        mems = g.filter(pa.array(side == 1))
        if mems.num_rows == 0 or labs.num_rows == 0:
            return pa.table({"id": _combine(g["id"]).slice(0, 0),
                             "rep": _combine(g["rep"]).slice(0, 0)})
        order = pc.sort_indices(labs["key"])
        labs = labs.take(order)
        lk = _combine(labs["key"]).to_numpy(zero_copy_only=False)
        mk = _combine(mems["key"]).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(lk, mk)  # exact: every member key has a label
        return pa.table({"id": mems["id"],
                         "rep": _combine(labs["rep"]).take(pa.array(pos))})

    def endpoints(b: pa.Table) -> pa.Table:
        col = pa.concat_arrays([_combine(b["a"]), _combine(b["b"])])
        return pa.table({"id": col})

    labels = (edges.map_batches(endpoints, batch_format="pyarrow")
              .groupby("id").aggregate(Count(alias_name="_c"))
              .map_batches(lambda b: pa.table({"id": b["id"],
                                               "rep": b["id"]}),
                           batch_format="pyarrow")
              .repartition(partitions).materialize())
    labels = _sever(labels)

    def as_label_rows(b: pa.Table) -> pa.Table:
        return _tag(pa.table({"key": b["id"], "rep": b["rep"]}), 0)

    def as_edge_rows(b: pa.Table) -> pa.Table:
        # both directions: a looks up b's label and vice versa
        key = pa.concat_arrays([_combine(b["a"]), _combine(b["b"])])
        nid = pa.concat_arrays([_combine(b["b"]), _combine(b["a"])])
        return _tag(pa.table({"key": key, "id": nid}), 1)

    def as_self_rows(b: pa.Table) -> pa.Table:
        return _tag(pa.table({"key": b["id"], "rep": b["rep"]}), 0)

    def as_member_rows(b: pa.Table) -> pa.Table:
        return _tag(pa.table({"key": b["rep"], "id": b["id"]}), 1)

    n_edges = edges.count()
    if n_edges:
        for it in range(max_iter):
            # edge-min step: neighbours' labels become candidates
            cand = (labels.map_batches(as_label_rows,
                                       batch_format="pyarrow")
                    .union(edges.map_batches(as_edge_rows,
                                             batch_format="pyarrow"))
                    .groupby("_shard").map_groups(lookup,
                                                  batch_format="pyarrow"))
            stepped = _sever(
                labels.union(cand).groupby("id")
                .aggregate(Min("rep", alias_name="rep"))
                .repartition(partitions)
                .materialize())  # consumed twice below
            # pointer jump: rep <- rep[rep] (labels only decrease)
            jumped = (stepped.map_batches(as_self_rows,
                                          batch_format="pyarrow")
                      .union(stepped.map_batches(as_member_rows,
                                                 batch_format="pyarrow"))
                      .groupby("_shard").map_groups(lookup,
                                                    batch_format="pyarrow")
                      .repartition(partitions).materialize())
            jumped = _sever(jumped)
            # converged when no id's label moved this round (old vs new)
            changed = (labels.union(jumped).groupby("id")
                       .aggregate(Min("rep", alias_name="_lo"),
                                  Max("rep", alias_name="_hi"))
                       .map_batches(
                           lambda b: pa.table({"n": pa.array(
                               [int(pc.sum(pc.cast(
                                   pc.not_equal(b["_lo"], b["_hi"]),
                                   pa.int64())).as_py() or 0)],
                               pa.int64())}),
                           batch_format="pyarrow").sum("n"))
            labels = jumped
            if not changed:
                break

    if all_ids_ds is not None:
        singles = all_ids_ds.map_batches(
            lambda b: pa.table({"id": _combine(b[b.column_names[0]]),
                                "rep": _combine(b[b.column_names[0]])}),
            batch_format="pyarrow")
        # ids already labelled keep their rep (rep <= id), new ids get self
        labels = (labels.union(singles).groupby("id")
                  .aggregate(Min("rep", alias_name="rep")))
    return labels


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def connected_components(pairs: pa.Table, all_ids=None,
                         a_col: str = "a", b_col: str = "b",
                         driver_pairs_max: int = 5_000_000) -> pa.Table:
    """(id, rep) — connected components of the near-duplicate pair graph,
    rep = min id of the component (the survivor a cluster dedup keeps).

    Driver-side union-find below ``driver_pairs_max`` pairs: the pair list
    is bounded by the duplicate rate (same budget argument as every verify
    step downstream of LSH — if pairs rival the corpus size, exact dedup
    should run first). Above the budget, delegates to the distributed
    label-propagation path (:func:`connected_components_ds`). ``all_ids``
    (an iterable or a Dataset) adds singleton rows (rep = self) for ids in
    no pair."""
    if pairs.num_rows > driver_pairs_max:
        import ray.data as rd

        ids_ds = None
        if all_ids is not None:
            if hasattr(all_ids, "iter_batches"):
                ids_ds = all_ids
            else:
                ids_ds = rd.from_arrow(pa.table({"id": pa.array(
                    sorted(all_ids))}))
        out = connected_components_ds(rd.from_arrow(pairs), ids_ds,
                                      a_col=a_col, b_col=b_col)
        chunks = list(out.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"))
        return pa.concat_tables(chunks).sort_by([("id", "ascending")])

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs[a_col].to_pylist(), pairs[b_col].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    ids: set = set(parent)
    ids.update(pairs[a_col].to_pylist())
    ids.update(pairs[b_col].to_pylist())
    if all_ids is not None:
        if hasattr(all_ids, "iter_batches"):
            for b in all_ids.iter_batches(batch_size=1 << 16,
                                          batch_format="pyarrow"):
                ids.update(b[b.column_names[0]].to_pylist())
        else:
            ids.update(all_ids)
    out_ids = sorted(ids)
    return pa.table({
        "id": pa.array(out_ids),
        "rep": pa.array([find(i) for i in out_ids]),
    })


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


class HyperplaneLSHStage:
    """(id, embedding) -> (id, bucket:int32, embedding) via sign bits of K random
    hyperplanes (built once per actor)."""

    def __init__(self, emb_col: str, id_col: str, dim: int, n_planes: int = 12,
                 seed: int = 7):
        self.emb_col = emb_col
        self.id_col = id_col
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({self.id_col: batch[self.id_col],
                             "bucket": pa.array([], pa.int32()),
                             self.emb_col: batch[self.emb_col]})
        emb = batch[self.emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False),
                         np.float64).reshape(len(emb), -1)
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norm, 1e-12)
        bits = (mat @ self.planes) > 0
        bucket = bits @ (1 << np.arange(bits.shape[1]))
        return pa.table({
            self.id_col: batch[self.id_col],
            "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
            self.emb_col: batch[self.emb_col],
        })


def embedding_near_dup_pairs(ds, emb_col: str, id_col: str, dim: int, *,
                             threshold: float = 0.95, n_planes: int = 12,
                             max_bucket_size: int = 8192,
                             n_groups: int = 64) -> pa.Table:
    """Pairs with cosine >= threshold found within LSH buckets. High-cosine
    pairs collide with high probability; brute-force inside each bucket only
    (buckets above ``max_bucket_size`` are skipped with a worker-side log).
    The shuffle groups ``bucket % n_groups`` — 2^n_planes individual buckets
    would each pay Ray's per-group overhead — and iterates buckets vectorized
    inside the group."""
    bucketed = ds.select_columns([id_col, emb_col]).map_batches(
        HyperplaneLSHStage(emb_col, id_col, dim, n_planes),
        batch_format="pyarrow")
    def add_grp(t: pa.Table) -> pa.Table:
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_grp", pa.array((bk % n_groups).astype(np.int32), pa.int32()))

    bucketed = bucketed.map_batches(add_grp, batch_format="pyarrow")

    def within(g: pa.Table) -> pa.Table:
        # Arrow-native: sort the group by bucket once, segment-scan buckets,
        # vectorized cosine inside each segment (no pandas conversion).
        order = pc.sort_indices(g["bucket"])
        g = g.take(order)
        bk = g["bucket"].to_numpy(zero_copy_only=False)
        ids_col = g[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        emb = g[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        empty_g = pa.table({"a": ids_col.slice(0, 0),
                            "b": ids_col.slice(0, 0),
                            "cosine": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty_g
        mat_all = np.asarray(emb.flatten().to_numpy(zero_copy_only=False),
                             np.float64).reshape(g.num_rows, -1)
        mat_all = mat_all / np.maximum(
            np.linalg.norm(mat_all, axis=1, keepdims=True), 1e-12)
        ids_np = ids_col.to_numpy(zero_copy_only=False)
        seg = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        seg = np.r_[seg, len(bk)]
        a_l, b_l, c_l = [], [], []
        for s0, s1 in zip(seg[:-1], seg[1:]):
            n = int(s1 - s0)
            if n < 2:
                continue
            if n > max_bucket_size:
                print(f"[emb-lsh] skipping mega-bucket of size {n} "
                      f"(cap {max_bucket_size})")
                continue
            mat = mat_all[s0:s1]
            ids = ids_np[s0:s1]
            sims = mat @ mat.T
            ii, jj = np.triu_indices(n, k=1)
            keep = sims[ii, jj] >= threshold
            a_l.append(np.minimum(ids[ii[keep]], ids[jj[keep]]))
            b_l.append(np.maximum(ids[ii[keep]], ids[jj[keep]]))
            c_l.append(np.round(sims[ii, jj][keep], 6))
        if not a_l:
            return empty_g
        return pa.table({"a": pa.array(np.concatenate(a_l), ids_col.type),
                         "b": pa.array(np.concatenate(b_l), ids_col.type),
                         "cosine": pa.array(np.concatenate(c_l),
                                            pa.float64())})

    out = bucketed.groupby("_grp").map_groups(within, batch_format="pyarrow")
    # each id lands in exactly one bucket so pairs are already unique, but the
    # distributed groupby dedup (same shape as the minhash path) keeps the
    # stage robust if a multi-band variant ever emits a pair twice — no
    # driver-side drop_duplicates over the full pair set
    from ray.data.aggregate import Min
    ded = out.groupby(["a", "b"]).aggregate(Min("cosine",
                                                alias_name="cosine"))
    chunks = list(ded.iter_batches(batch_size=1 << 20,
                                   batch_format="pyarrow"))
    if not chunks:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return pa.concat_tables(chunks).sort_by(
        [("a", "ascending"), ("b", "ascending")])


# ---------------------------------------------------------------------------
# near-dup cluster canonicalization — pick the BEST member per cluster
# (north-rule image curation: keep the highest-resolution copy of each
# phash near-dup cluster, map every member to it)


def hamming_canonicalize(ds, hash_col: str, id_col: str, *,
                         order: list, max_hamming: int = 3,
                         max_bucket_size: int = 1024,
                         driver_merge_max: int = 5_000_000):
    """(``id_col``, ``canonical_id``) for every member of a Hamming-
    near-dup cluster on ``hash_col``: clusters are connected components of
    the Hamming<=``max_hamming`` pair graph (:func:`hash_hamming_pairs`,
    4x16-bit banding), and each cluster's canonical is the member that
    wins ``order`` — a list of (column, descending) pairs, ties broken by
    min ``id_col``. Singletons are not emitted (nothing to redirect).

    Movement: pairs and components are duplication-bounded (the pair pass
    already enforces bucket caps + loud budgets); the member->rep mapping
    broadcasts once; the score scan is map-only with per-batch winner
    partials (``keep_best_rows`` shape), so the full table never shuffles.
    """
    import ray
    import ray.data as rd

    from ._collect import collect_up_to

    pairs = hash_hamming_pairs(ds, hash_col, id_col,
                               max_hamming=max_hamming,
                               max_bucket_size=max_bucket_size)
    if pairs.num_rows == 0:
        idt = pairs["a"].type  # hash_hamming_pairs carried the id type
        return rd.from_arrow(pa.table({
            id_col: pa.array([], idt), "canonical_id": pa.array([], idt)}))
    labels = connected_components(pairs, a_col="a", b_col="b",
                                  driver_pairs_max=driver_merge_max)
    member_rep = dict(zip(labels["id"].to_pylist(),
                          labels["rep"].to_pylist()))
    mref = ray.put(member_rep)

    score_cols = [c for c, _ in order]

    def members(b: pa.Table) -> pa.Table:
        import ray as _ray

        mr = _ray.get(mref)
        t = b.select([id_col, *score_cols])
        ids = t[id_col].to_pylist()
        keep = np.fromiter((i in mr for i in ids), bool, len(ids))
        t = t.filter(pa.array(keep))
        reps = [mr[i] for i, k in zip(ids, keep) if k]
        return t.append_column("_rep", pa.array(reps))

    scored = ds.map_batches(members, batch_format="pyarrow")
    winners = keep_best_rows(scored, "_rep", [*order, (id_col, False)],
                             driver_merge_max=driver_merge_max)
    wparts, wover = collect_up_to(winners.select_columns(["_rep", id_col]),
                                  driver_merge_max)
    if wover:  # cannot happen when the CC above fit the same budget
        raise ValueError(
            "hamming_canonicalize: winner table exceeds driver_merge_max "
            f"({driver_merge_max}) — raise the budget")
    canon = {}
    for p in wparts:
        canon.update(zip(p["_rep"].to_pylist(), p[id_col].to_pylist()))
    mids = labels["id"].to_pylist()
    return rd.from_arrow(pa.table({
        id_col: pa.array(mids),
        "canonical_id": pa.array([canon[member_rep[i]] for i in mids])}))
