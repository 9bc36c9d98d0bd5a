"""Deduplication suite over the documents table: exact, MinHash-LSH, SimHash,
exact n-gram Jaccard verification, embedding-cosine near-dup.

Scale shapes (each documented where it deviates from naive):

- **exact**: content-hash column added vectorized in ``map_batches``; duplicate
  *detection* reuses the pre-aggregated uniqueness stage (only per-batch distinct
  hashes shuffle); duplicate *removal* is groupby(hash).head(1).
- **MinHash-LSH**: signatures per batch (actor-friendly stage) -> explode to
  (band, band_hash, id) rows — the only shuffled payload is 3 small columns,
  never text -> groupby bands -> candidate pairs -> verify by signature-estimated
  Jaccard (no second pass over text). Exact-Jaccard verification is a separate
  opt-in that re-reads only candidate docs via broadcast id-set filter.
- **SimHash**: 64-bit signs of weighted token hashes; candidates = equal 16-bit
  bank (4 banks = Hamming<=3 guarantee via pigeonhole); verify exact Hamming.
- **embedding**: random-hyperplane LSH buckets -> within-bucket pairwise cosine.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import char_shingles, content_hash, jaccard
from .uniqueness import duplicate_keys


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


def dedup_exact_keep_min(ds, text_col: str, id_col: str):
    """Survivors of exact dedup: per distinct text keep the row with min id.
    Pre-aggregates (hash, min_id) per batch before the shuffle, then a tiny
    groupby-min — the full rows never shuffle."""
    from ray.data.aggregate import Min

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        AddContentHash(text_col), batch_format="pyarrow")

    def partial_min(b: pa.Table) -> pa.Table:
        agg = b.group_by("content_hash").aggregate([(id_col, "min")])
        return agg.rename_columns(["content_hash", id_col])

    partials = hashed.map_batches(partial_min, batch_format="pyarrow")
    return partials.repartition(8).groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH


def _perm_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2 ** 61 - 1, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2 ** 61 - 1, num_perm, dtype=np.uint64)
    return a, b


class MinHashStage:
    """(id, text) -> (id, sig: fixed_size_list<uint64>[num_perm]). Permutation
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


class _BandExplode:
    """Emit one (bucket, id) row per band: bucket = "<band>:<hash-of-segment>".
    Only these two narrow columns ever shuffle — never text or signatures."""

    def __init__(self, id_col: str, bands: int, rows: int):
        self.id_col = id_col
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        if not ids:
            return pa.table({"bucket": pa.array([], pa.string()),
                             self.id_col: batch[self.id_col]})
        sig = np.asarray(batch["sig"].combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)).reshape(len(ids), -1)
        out_bucket, out_id = [], []
        for b in range(self.bands):
            seg = sig[:, b * self.rows:(b + 1) * self.rows]
            for i in range(len(ids)):
                out_bucket.append(
                    f"{b}:{hashlib.blake2b(seg[i].tobytes(), digest_size=8).hexdigest()}")
            out_id.extend(ids)
        return pa.table({
            "bucket": pa.array(out_bucket, pa.string()),
            self.id_col: pa.array(out_id),
        })


def minhash_lsh_pairs(ds, text_col: str, id_col: str, *, num_perm: int = 128,
                      bands: int = 16, threshold: float = 0.5,
                      batch_size: int = 4096, concurrency: int | None = None):
    """Near-duplicate pairs (id_a, id_b, jaccard_est >= threshold).

    Returns a pyarrow Table (candidate pairs are tiny relative to input by
    construction — if they weren't, the corpus is mostly duplicates and exact
    dedup should run first)."""
    rows = num_perm // bands
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage(text_col, id_col, num_perm), **kwargs)
    sigs_mat = sigs.materialize()  # reused twice (banding + verification)

    banded = sigs_mat.map_batches(_BandExplode(id_col, bands, rows),
                                  batch_format="pyarrow")

    # collided buckets via the pre-aggregated uniqueness pattern (per-batch
    # (bucket,count) partials -> small groupby); then broadcast-filter the
    # banded rows down to members of collided buckets — tiny by construction
    import ray

    dup_buckets = set()
    for b in duplicate_keys(banded, "bucket").iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        dup_buckets.update(b["bucket"].to_pylist())
    if not dup_buckets:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard_est": pa.array([], pa.float64())})
    dup_ref = ray.put(pa.array(sorted(dup_buckets)))

    def members(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["bucket"], value_set=ray.get(dup_ref)))

    import pandas as pd

    mem = pa.concat_tables(list(
        banded.map_batches(members, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    pair_rows: set[tuple] = set()
    for _, g in mem.to_pandas().groupby("bucket")[id_col]:
        pair_rows.update(itertools.combinations(sorted(g.tolist()), 2))
    if not pair_rows:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard_est": pa.array([], pa.float64())})
    srt = sorted(pair_rows)
    pairs = pd.DataFrame({"a": [p[0] for p in srt], "b": [p[1] for p in srt]})

    # verify via signatures: est J = fraction of equal minhash components
    need = set(pairs.a) | set(pairs.b)
    sig_map: dict = {}
    for b in sigs_mat.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        ids = b[id_col].to_pylist()
        mat = np.asarray(b["sig"].combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)).reshape(len(ids), -1)
        for i, d in enumerate(ids):
            if d in need:
                sig_map[d] = mat[i]
    est = np.array([
        float((sig_map[a] == sig_map[b]).mean()) for a, b in zip(pairs.a, pairs.b)])
    keep = est >= threshold
    return pa.table({
        "a": pa.array(pairs.a[keep].to_numpy()),
        "b": pa.array(pairs.b[keep].to_numpy()),
        "jaccard_est": pa.array(np.round(est[keep], 6)),
    })


def verify_pairs_exact_jaccard(ds, pairs: pa.Table, text_col: str, id_col: str,
                               *, shingle_k: int = 5,
                               threshold: float = 0.5) -> pa.Table:
    """Exact n-gram Jaccard over candidate pairs: re-reads ONLY candidate docs
    (broadcast id-set filter), computes set Jaccard."""
    import ray

    need = set(pairs["a"].to_pylist()) | set(pairs["b"].to_pylist())
    if not need:
        return pa.table({"a": pairs["a"], "b": pairs["b"],
                         "jaccard": pa.array([], pa.float64())})
    ref = ray.put(pa.array(sorted(need)))

    def pick(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[id_col], value_set=ray.get(ref))
        return b.filter(mask)

    docs = {}
    for b in (ds.select_columns([id_col, text_col])
              .map_batches(pick, batch_format="pyarrow")
              .iter_batches(batch_size=1 << 16, batch_format="pyarrow")):
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            docs[d] = char_shingles(t or "", shingle_k)
    a_l, b_l, j_l = [], [], []
    for a, bb in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        j = jaccard(docs[a], docs[bb])
        if j >= threshold:
            a_l.append(a)
            b_l.append(bb)
            j_l.append(round(j, 6))
    return pa.table({"a": pa.array(a_l), "b": pa.array(b_l),
                     "jaccard": pa.array(j_l, pa.float64())})


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        sigs = self.signatures(texts)
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel().astype(np.int64), pa.int64()), self.num_perm),
        })


class _BandExplode:
    """Emit one (bucket, id) row per band: bucket = "<band>:<hash-of-segment>".
    Only these two narrow columns ever shuffle — never text or signatures."""

    def __init__(self, id_col: str, bands: int, rows: int):
        self.id_col = id_col
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        if not ids:
            return pa.table({"bucket": pa.array([], pa.string()),
                             self.id_col: batch[self.id_col]})
        sig = np.asarray(batch["sig"].combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)).reshape(len(ids), -1)
        out_bucket, out_id = [], []
        for b in range(self.bands):
            seg = sig[:, b * self.rows:(b + 1) * self.rows]
            for i in range(len(ids)):
                out_bucket.append(
                    f"{b}:{hashlib.blake2b(seg[i].tobytes(), digest_size=8).hexdigest()}")
            out_id.extend(ids)
        return pa.table({
            "bucket": pa.array(out_bucket, pa.string()),
            self.id_col: pa.array(out_id),
        })


def minhash_lsh_pairs(ds, text_col: str, id_col: str, *, num_perm: int = 128,
                      bands: int = 16, threshold: float = 0.5,
                      batch_size: int = 4096, concurrency: int | None = None):
    """Near-duplicate pairs (id_a, id_b, jaccard_est >= threshold).

    Returns a pyarrow Table (candidate pairs are tiny relative to input by
    construction — if they weren't, the corpus is mostly duplicates and exact
    dedup should run first)."""
    rows = num_perm // bands
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage(text_col, id_col, num_perm), **kwargs)
    sigs_mat = sigs.materialize()  # reused twice (banding + verification)

    banded = sigs_mat.map_batches(_BandExplode(id_col, bands, rows),
                                  batch_format="pyarrow")

    # collided buckets via the pre-aggregated uniqueness pattern (per-batch
    # (bucket,count) partials -> small groupby); then broadcast-filter the
    # banded rows down to members of collided buckets — tiny by construction
    import ray

    dup_buckets = set()
    for b in duplicate_keys(banded, "bucket").iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        dup_buckets.update(b["bucket"].to_pylist())
    if not dup_buckets:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard_est": pa.array([], pa.float64())})
    dup_ref = ray.put(pa.array(sorted(dup_buckets)))

    def members(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["bucket"], value_set=ray.get(dup_ref)))

    import pandas as pd

    mem = pa.concat_tables(list(
        banded.map_batches(members, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    pair_rows: set[tuple] = set()
    for _, g in mem.to_pandas().groupby("bucket")[id_col]:
        pair_rows.update(itertools.combinations(sorted(g.tolist()), 2))
    if not pair_rows:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard_est": pa.array([], pa.float64())})
    srt = sorted(pair_rows)
    pairs = pd.DataFrame({"a": [p[0] for p in srt], "b": [p[1] for p in srt]})

    # verify via signatures: est J = fraction of equal minhash components
    need = set(pairs.a) | set(pairs.b)
    sig_map: dict = {}
    for b in sigs_mat.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        ids = b[id_col].to_pylist()
        mat = np.asarray(b["sig"].combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)).reshape(len(ids), -1)
        for i, d in enumerate(ids):
            if d in need:
                sig_map[d] = mat[i]
    est = np.array([
        float((sig_map[a] == sig_map[b]).mean()) for a, b in zip(pairs.a, pairs.b)])
    keep = est >= threshold
    return pa.table({
        "a": pa.array(pairs.a[keep].to_numpy()),
        "b": pa.array(pairs.b[keep].to_numpy()),
        "jaccard_est": pa.array(np.round(est[keep], 6)),
    })


def verify_pairs_exact_jaccard(ds, pairs: pa.Table, text_col: str, id_col: str,
                               *, shingle_k: int = 5,
                               threshold: float = 0.5) -> pa.Table:
    """Exact n-gram Jaccard over candidate pairs: re-reads ONLY candidate docs
    (broadcast id-set filter), computes set Jaccard."""
    import ray

    need = set(pairs["a"].to_pylist()) | set(pairs["b"].to_pylist())
    if not need:
        return pa.table({"a": pairs["a"], "b": pairs["b"],
                         "jaccard": pa.array([], pa.float64())})
    ref = ray.put(pa.array(sorted(need)))

    def pick(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[id_col], value_set=ray.get(ref))
        return b.filter(mask)

    docs = {}
    for b in (ds.select_columns([id_col, text_col])
              .map_batches(pick, batch_format="pyarrow")
              .iter_batches(batch_size=1 << 16, batch_format="pyarrow")):
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            docs[d] = char_shingles(t or "", shingle_k)
    a_l, b_l, j_l = [], [], []
    for a, bb in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        j = jaccard(docs[a], docs[bb])
        if j >= threshold:
            a_l.append(a)
            b_l.append(bb)
            j_l.append(round(j, 6))
    return pa.table({"a": pa.array(a_l), "b": pa.array(b_l),
                     "jaccard": pa.array(j_l, pa.float64())})


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


def simhash_pairs(ds, text_col: str, id_col: str, *, max_hamming: int = 3,
                  batch_size: int = 4096) -> pa.Table:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Candidates from
    4x16-bit bank equality (complete for Hamming<=3), verified exactly."""
    import ray

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        SimHashStage(text_col, id_col), batch_format="pyarrow",
        batch_size=batch_size).materialize()

    pair_set = set()
    for bank in range(4):
        col = f"bank{bank}"
        # collided bank values (pre-aggregated counts), then broadcast filter
        dup_vals = set()
        for b in duplicate_keys(sigs.select_columns([col]), col).iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"):
            dup_vals.update(b[col].to_pylist())
        if not dup_vals:
            continue
        ref = ray.put(pa.array(sorted(dup_vals), pa.int32()))

        def pick(t: pa.Table, _col=col) -> pa.Table:
            return t.select([_col, id_col, "simhash"]).filter(
                pc.is_in(t[_col], value_set=ray.get(ref)))

        mem = pa.concat_tables(list(
            sigs.map_batches(pick, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
        for _, g in mem.to_pandas().groupby(col):
            sh = dict(zip(g[id_col], g["simhash"]))
            for a, bb in itertools.combinations(sorted(g[id_col].tolist()), 2):
                ham = bin((int(sh[a]) ^ int(sh[bb])) & 0xFFFFFFFFFFFFFFFF).count("1")
                if ham <= max_hamming:
                    pair_set.add((a, bb, ham))
    rows = sorted(pair_set)
    return pa.table({
        "a": pa.array([r[0] for r in rows]),
        "b": pa.array([r[1] for r in rows]),
        "hamming": pa.array([r[2] for r in rows], pa.int32()),
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
                             threshold: float = 0.95,
                             n_planes: int = 12) -> pa.Table:
    """Pairs with cosine >= threshold found within LSH buckets. High-cosine pairs
    collide with high probability; brute-force inside each bucket only."""
    bucketed = ds.select_columns([id_col, emb_col]).map_batches(
        HyperplaneLSHStage(emb_col, id_col, dim, n_planes),
        batch_format="pyarrow")

    def within(g):
        import pandas as pd

        ids = g[id_col].to_numpy()
        mat = np.vstack(g[emb_col].to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame({
            "a": np.minimum(ids[ii[keep]], ids[jj[keep]]),
            "b": np.maximum(ids[ii[keep]], ids[jj[keep]]),
            "cosine": np.round(sims[ii, jj][keep], 6),
        })

    out = bucketed.groupby("bucket").map_groups(within, batch_format="pandas")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        or [pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})])
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return pa.Table.from_pandas(df, preserve_index=False)
