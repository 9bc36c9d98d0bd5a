"""Product-quantization (PQ) compressed ANN over the embedding column.

The 100-TB memory path the IVF scan still lacks: a 64-dim float64 embedding
is 512 bytes; its PQ code is ``m`` bytes (64× smaller at m=8), so a node
holds the codes of billions of vectors in RAM and the full-precision column
never leaves storage after encoding.

- **Training** (`train_pq_codebooks`): per-subspace k-means on a driver-side
  SAMPLE (the IVF `train_centroids` pattern — the sample is the only thing
  that leaves the cluster; one cheap limit-read).
- **Encoding** (`PQEncodeStage`): map-only actor stage; codebooks broadcast
  once via ``ray.put``, each batch argmins per subspace — a (batch,
  n_centroids) matmul per subspace, no Python loop over rows.
- **Search** (`pq_knn`): asymmetric-distance (ADC) top-k. Per query a
  (m, n_centroids) lookup table of squared subvector distances; per batch
  the distance is a fancy-indexed gather-sum over the code columns. Same
  per-batch-partial → ``groupby(query_id)`` exact reduce as the brute path,
  so the driver sees k rows per query regardless of corpus size.

Vectors are L2-normalized before encoding, so squared L2 = 2 − 2·cos and
ADC ranking approximates the brute cosine ranking; recall is pinned in
tests against `knn_brute`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _normalize, _to_matrix


def train_pq_codebooks(sample: np.ndarray, *, m: int = 8, nbits: int = 8,
                       iters: int = 10, seed: int = 7) -> np.ndarray:
    """(m, n_centroids, d//m) codebooks from per-subspace Lloyd k-means on
    a normalized sample. ``n_centroids = min(2**nbits, len(sample) // 2)``
    so a small sample cannot demand more centroids than it can fill."""
    x = _normalize(np.asarray(sample, np.float64))
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    ncent = max(2, min(2 ** nbits, n // 2))
    rng = np.random.default_rng(seed)
    books = np.empty((m, ncent, sub))
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cent = xs[rng.choice(n, ncent, replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1) \
                if n * ncent * sub < 50_000_000 else None
            if d2 is None:
                # chunked distance for big samples
                d2 = np.empty((n, ncent))
                for s in range(0, n, 4096):
                    blk = xs[s:s + 4096]
                    d2[s:s + 4096] = ((blk ** 2).sum(1, keepdims=True)
                                      - 2 * blk @ cent.T
                                      + (cent ** 2).sum(1))
            assign = d2.argmin(1)
            for c in range(ncent):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(0)
                else:                             # re-seed empty cell
                    cent[c] = xs[rng.integers(0, n)]
        books[j] = cent
    return books


class PQEncodeStage:
    """(id, embedding) → (id, code: list<uint8>[m]) map-only actor stage."""

    def __init__(self, emb_col: str, id_col: str, books_ref):
        self.emb_col = emb_col
        self.id_col = id_col
        self.books_ref = books_ref
        self._books: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._books is None:
            self._books = ray.get(self.books_ref)
        books = self._books
        m, ncent, sub = books.shape
        if batch.num_rows == 0:
            return pa.table({self.id_col: batch[self.id_col],
                             "code": pa.array([], pa.list_(pa.uint8(), m))})
        x = _normalize(_to_matrix(batch[self.emb_col]))
        codes = np.empty((len(x), m), np.uint8)
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            cent = books[j]
            d2 = ((xs ** 2).sum(1, keepdims=True) - 2 * xs @ cent.T
                  + (cent ** 2).sum(1))
            codes[:, j] = d2.argmin(1).astype(np.uint8)
        return pa.table({
            self.id_col: batch[self.id_col],
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m)})


def pq_encode(ds, books_ref, *, emb_col: str = "embedding",
              id_col: str = "vec_id", concurrency: int = 4):
    """Encode the corpus — returns a Dataset of (id, code)."""
    return ds.select_columns([id_col, emb_col]).map_batches(
        PQEncodeStage(emb_col, id_col, books_ref),
        batch_format="pyarrow", concurrency=concurrency)


class _PQTopK:
    def __init__(self, id_col: str, luts_ref, k: int):
        self.id_col = id_col
        self.luts_ref = luts_ref
        self.k = k
        self._luts: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._luts is None:
            self._luts = ray.get(self.luts_ref)
        luts = self._luts                          # (nq, m, ncent)
        nq, m, _ = luts.shape
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "adist": pa.array([], pa.float64())})
        code_col = batch["code"]
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes = (np.asarray(code_col.flatten().to_numpy(
            zero_copy_only=False), np.int64).reshape(len(code_col), m))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        cols = np.arange(m)
        out_q, out_id, out_d = [], [], []
        k = min(self.k, len(ids))
        for qi in range(nq):
            d = luts[qi][cols, codes].sum(1)       # (batch,) gather-sum
            top = np.argpartition(d, k - 1)[:k]
            out_q.append(np.full(k, qi, np.int64))
            out_id.append(ids[top])
            out_d.append(d[top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_id)),
            "adist": pa.array(np.concatenate(out_d), pa.float64())})


def pq_knn(codes_ds, queries: np.ndarray, books: np.ndarray, *,
           id_col: str = "vec_id", k: int = 10):
    """ADC top-k over an encoded corpus. Returns a Dataset of
    (query_id, neighbor_id, adist) — k rows per query, distance ascending,
    ties broken by neighbor id (deterministic)."""
    import ray

    q = _normalize(np.asarray(queries, np.float64))
    m, ncent, sub = books.shape
    luts = np.empty((len(q), m, ncent))
    for j in range(m):
        qs = q[:, j * sub:(j + 1) * sub]           # (nq, sub)
        cent = books[j]                            # (ncent, sub)
        luts[:, j, :] = ((qs ** 2).sum(1, keepdims=True)
                         - 2 * qs @ cent.T + (cent ** 2).sum(1))
    luts_ref = ray.put(luts)
    partials = codes_ds.map_batches(_PQTopK(id_col, luts_ref, k),
                                    batch_format="pyarrow")

    def topk_group(df):
        df = df.copy()
        df["adist"] = df["adist"].round(9)
        return (df.sort_values(["adist", "neighbor_id"],
                               ascending=[True, True]).head(k))

    return partials.groupby("query_id").map_groups(topk_group,
                                                   batch_format="pandas")


def pq_knn_rerank(codes_ds, full_ds, queries: np.ndarray,
                  books: np.ndarray, *, emb_col: str = "embedding",
                  id_col: str = "vec_id", k: int = 10,
                  rerank_factor: int = 4):
    """PQ search with exact re-ranking — the production shape: the
    compressed-domain ADC scan shortlists ``k × rerank_factor`` candidates
    per query (first pass touches only the m-byte codes), then ONE pass
    over the full-precision column computes exact cosine for candidate rows
    only and keeps the true top-k. The candidate table is k·factor rows per
    query — broadcast-sized regardless of corpus size."""
    import ray

    cand = pq_knn(codes_ds, queries, books, id_col=id_col,
                  k=k * rerank_factor)
    cand_pairs: dict = {}
    union_ids = set()
    for r in cand.take_all():                      # nq × k·factor rows
        cand_pairs.setdefault(int(r["neighbor_id"]), set()).add(
            int(r["query_id"]))
        union_ids.add(int(r["neighbor_id"]))
    q = _normalize(np.asarray(queries, np.float64))
    ref = ray.put((cand_pairs, np.array(sorted(union_ids), np.int64), q))

    def exact_scores(b: pa.Table) -> pa.Table:
        pairs, uids, qm = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(uids, ids)
        hit = ((pos < len(uids))
               & (uids[np.minimum(pos, max(len(uids) - 1, 0))] == ids)) \
            if len(uids) else np.zeros(len(ids), bool)
        if not hit.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        t = b.filter(pa.array(hit))
        x = _normalize(_to_matrix(t[emb_col]))
        tids = t[id_col].to_numpy(zero_copy_only=False)
        sims = x @ qm.T                            # (|hit|, nq)
        out_q, out_id, out_s = [], [], []
        for i, vid in enumerate(tids):
            for qi in pairs[int(vid)]:
                out_q.append(qi)
                out_id.append(int(vid))
                out_s.append(sims[i, qi])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    scored = full_ds.select_columns([id_col, emb_col]).map_batches(
        exact_scores, batch_format="pyarrow")

    def topk_group(df):
        df = df.copy()
        df["score"] = df["score"].round(9)
        return (df.sort_values(["score", "neighbor_id"],
                               ascending=[False, True]).head(k))

    return scored.groupby("query_id").map_groups(topk_group,
                                                 batch_format="pandas")


def scalar_quant_profile(ds, *, emb_col: str = "embedding",
                         dim_max: int = 65_536):
    """Per-dimension int8 scalar-quantization error profile: for each
    embedding dimension, the symmetric max-abs scale and the worst
    round-trip reconstruction error |v − round_even(v/scale·127)·scale/127|
    — the go/no-go report before shipping a 4× smaller int8 embedding
    table (PQ above is the 64× path; scalar int8 is the cheap first rung).

    Two bounded passes, both map-only plus a dim-sized merge: (1) per-batch
    per-dim max|v| partials (dim rows per batch) → driver max under a loud
    ``dim_max`` budget → scales broadcast once; (2) per-batch per-dim max
    round-trip error partials → the same dim-sized merge. max is
    order-independent, so the result is bit-deterministic and matches the
    SQL unnest formulation exactly (values promote f32→f64 on both
    sides)."""
    import ray
    from ray.data.aggregate import Max

    from ._collect import collect_up_to

    def _mat(b: pa.Table) -> np.ndarray:
        return _to_matrix(b[emb_col])           # f32 -> f64, exact

    def max_part(b: pa.Table) -> pa.Table:
        v = _mat(b)
        if v.shape[1] > dim_max:
            raise ValueError(
                f"scalar_quant_profile: dim {v.shape[1]} > dim_max={dim_max}")
        return pa.table({
            "pos": pa.array(np.arange(1, v.shape[1] + 1, dtype=np.int64)),
            "m": pa.array(np.abs(v).max(axis=0))})

    scales = (ds.map_batches(max_part, batch_format="pyarrow")
              .groupby("pos").aggregate(Max("m", alias_name="scale")))
    sparts, over = collect_up_to(scales, dim_max)
    if over:
        raise ValueError("scalar_quant_profile: per-dim scale table "
                         "exceeds dim_max")
    st = pa.concat_tables(sparts)
    pos = st["pos"].to_numpy(zero_copy_only=False)
    sc = st["scale"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(pos)
    sc = sc[order]                                  # scale[d] at index d-1
    ref = ray.put(sc)

    def err_part(b: pa.Table) -> pa.Table:
        import ray as _ray

        s = _ray.get(ref)
        v = _mat(b)
        with np.errstate(invalid="ignore"):
            q = np.round(v / s * 127.0)             # banker's == round_even
            err = np.abs(v - q * s / 127.0)
        err = np.where(np.isnan(err), 0.0, err)     # dims with scale 0
        return pa.table({
            "pos": pa.array(np.arange(1, v.shape[1] + 1, dtype=np.int64)),
            "e": pa.array(err.max(axis=0))})

    errs = (ds.map_batches(err_part, batch_format="pyarrow")
            .groupby("pos").aggregate(Max("e", alias_name="max_abs_err")))
    sref = ray.put((pos[order], sc))

    def fin(b: pa.Table) -> pa.Table:
        import ray as _ray

        p_sorted, s_sorted = _ray.get(sref)
        p = b["pos"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(p_sorted, p)
        return pa.table({"pos": b["pos"],
                         "scale": pa.array(s_sorted[idx]),
                         "max_abs_err": b["max_abs_err"]})

    return errs.map_batches(fin, batch_format="pyarrow")
