"""Similarity search over an embedding column (list<float>).

- **Brute-force top-k** (baseline): the query matrix is normalized once, shipped
  via ``ray.put`` and read once per worker; each batch computes a matmul against
  it and emits only its per-query top-k partials (k rows per query per batch);
  the global top-k is a ``groupby(query_id)`` second-stage reduce — the full
  score matrix never materializes and the driver sees k rows per query.
- **IVF-style scale path**: coarse centroids from a seeded sample (k-means, few
  iterations, driver-side on the sample only), vectors assigned to nearest cell
  inside ``map_batches``; a query probes the ``n_probe`` nearest cells so only
  those partitions are scanned. Assignment is a narrow column; at cluster scale
  the cell id becomes the partitioning key of the stored table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 1), np.float64)
    if not hasattr(col, "flatten"):     # Ray ArrowTensorArray (ndarray col)
        return np.asarray(col.to_numpy(zero_copy_only=False),
                          np.float64).reshape(len(col), -1)
    return np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                      np.float64).reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _BruteTopK:
    def __init__(self, emb_col: str, id_col: str, q_ref, k: int):
        self.emb_col = emb_col
        self.id_col = id_col
        self.q_ref = q_ref
        self.k = k
        self._q: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        import ray

        if self._q is None:
            self._q = ray.get(self.q_ref)
        mat = _normalize(_to_matrix(batch[self.emb_col]))
        ids = batch[self.id_col].combine_chunks() if isinstance(
            batch[self.id_col], pa.ChunkedArray) else batch[self.id_col]
        ids = ids.to_numpy(zero_copy_only=False)
        sims = mat @ self._q.T                       # (batch, n_queries)
        k = min(self.k, sims.shape[0])
        top = np.argpartition(-sims, k - 1, axis=0)[:k]   # (k, n_queries)
        nq = sims.shape[1]
        out_q = np.repeat(np.arange(nq), k)
        out_id = ids[top.T.ravel()]
        out_s = sims[top.T.ravel(), out_q]
        return pa.table({
            "query_id": pa.array(out_q.astype(np.int64)),
            "neighbor_id": pa.array(out_id),
            "score": pa.array(out_s, pa.float64()),
        })


def knn_brute(ds, queries: np.ndarray, *, emb_col: str = "embedding",
              id_col: str = "vec_id", k: int = 10,
              batch_size: int = 8192) -> pa.Table:
    """Exact cosine top-k for each query row. Returns
    (query_id, neighbor_id, score) sorted by (query_id, -score, neighbor_id);
    scores rounded to 6 decimals for cross-engine comparability."""
    import ray

    q = _normalize(np.asarray(queries, np.float64))
    q_ref = ray.put(q)
    partials = ds.select_columns([id_col, emb_col]).map_batches(
        _BruteTopK(emb_col, id_col, q_ref, k),
        batch_format="pyarrow", batch_size=batch_size)
    # merge partials DISTRIBUTED: groupby(query_id) second-stage top-k — each
    # reducer sees only that query's k-per-batch partials and emits k rows, so
    # the driver collects exactly k x n_queries rows no matter the block count

    def topk_group(df):
        df = df.copy()
        df["score"] = df["score"].round(6)
        return (df.sort_values(["score", "neighbor_id"],
                               ascending=[False, True]).head(k))

    merged = partials.groupby("query_id").map_groups(
        topk_group, batch_format="pandas")
    import pandas as pd

    frames = [b.to_pandas() for b in merged.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")]
    df = pd.concat(frames) if frames else pd.DataFrame(
        columns=["query_id", "neighbor_id", "score"])
    df = (df.sort_values(["query_id", "score", "neighbor_id"],
                         ascending=[True, False, True]).reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


def _topk_rows(sims: np.ndarray, k: int, tie_margin: int = 64) -> np.ndarray:
    """Per-row top-k column indices ordered by (score DESC, column ASC) —
    O(N) argpartition + an O(m log m) sort of the m = k+tie_margin candidate
    slice instead of a full O(N log N) row sort. Exact: a row whose k-th
    score ties the worst candidate (the tie could extend past the slice)
    falls back to the full stable sort."""
    n = sims.shape[1]
    m = min(k + tie_margin, n)
    if m >= n:
        return np.argsort(-sims, axis=1, kind="stable")[:, :k]
    part = np.argpartition(-sims, m - 1, axis=1)[:, :m]
    psims = np.take_along_axis(sims, part, 1)
    # row-wise order by (-score primary, column index secondary)
    ord2 = np.lexsort((part, -psims), axis=1)[:, :k]
    top = np.take_along_axis(part, ord2, 1)
    kth = np.take_along_axis(psims, ord2[:, k - 1:k], 1).ravel()
    bad = kth <= psims.min(axis=1)
    if bad.any():
        top[bad] = np.argsort(-sims[bad], axis=1, kind="stable")[:, :k]
    return top


class _SelfJoinTopK:
    """Per-batch exact top-k against the broadcast corpus matrix. ids_all is
    sorted ascending so a STABLE argsort over -scores breaks score ties by
    neighbor_id — the same (score DESC, neighbor_id ASC) order the SQL
    QUALIFY oracle uses."""

    def __init__(self, emb_col: str, id_col: str, ref, k: int,
                 label_col: str | None = None):
        self.emb_col = emb_col
        self.id_col = id_col
        self.ref = ref
        self.k = k
        self.label_col = label_col  # set -> SAME-label columns masked too
        self._corpus = None
        self._buf = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        idt = batch.schema.field(self.id_col).type  # int64 OR string ids
        empty = pa.table({"vec_id": pa.array([], idt),
                          "neighbor_id": pa.array([], idt),
                          "cosine": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        import ray

        if self._corpus is None:
            self._corpus = ray.get(self.ref)
        ids_all, mat_all = self._corpus[0], self._corpus[1]
        labels_all = self._corpus[2] if len(self._corpus) > 2 else None
        mat = _normalize(_to_matrix(batch[self.emb_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        labs = (batch[self.label_col].to_numpy(zero_copy_only=False)
                if self.label_col else None)
        n = len(ids_all)
        k = min(self.k, n - 1)
        if k <= 0:
            return empty
        # Chunk the (rows x N) score matrix through ONE reused buffer:
        # peak memory stays chunk x N regardless of batch size, and the
        # pages are touched once (fresh per-step allocations of the full
        # matrix dominate wall time on slow-page-fault hosts).
        chunk = max(1, (4 << 20) // (8 * n))
        if self._buf is None or self._buf.shape != (chunk, n):
            self._buf = np.empty((chunk, n), np.float64)
        out_id, out_nb, out_s = [], [], []
        for s in range(0, len(ids), chunk):
            sub = mat[s:s + chunk]
            sims = np.dot(sub, mat_all.T, out=self._buf[:len(sub)])
            np.round(sims, 6, out=sims)               # oracle 6dp tie order
            sims[ids[s:s + chunk, None] == ids_all[None, :]] = -np.inf
            if labs is not None:
                sims[labs[s:s + chunk, None] == labels_all[None, :]] \
                    = -np.inf
            order = _topk_rows(sims, k)
            scores = np.take_along_axis(sims, order, 1)
            # A row with fewer than k unmasked candidates (label masking can
            # eliminate most of the corpus) would otherwise emit -inf-scored
            # same-label / self entries — emit min(k, valid) rows instead,
            # matching the SQL QUALIFY oracle.
            valid = (scores > -np.inf).ravel()
            out_id.append(np.repeat(ids[s:s + chunk], k)[valid])
            out_nb.append(ids_all[order.ravel()[valid]])
            out_s.append(scores.ravel()[valid].copy())
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_id), idt),
            "neighbor_id": pa.array(np.concatenate(out_nb), idt),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def knn_self_join(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
                  k: int = 5, batch_size: int = 4096,
                  max_broadcast_rows: int = 2_000_000):
    """Exact cosine k-NN JOIN of a table with itself (every vector's top-k
    most-similar OTHER vectors): the id-sorted corpus matrix broadcasts once
    via ``ray.put`` (zero-copy numpy read per task), each batch is one matmul
    + stable top-k, and — because every batch sees the whole right side — the
    result is final map-side, no merge stage. Exact-baseline shape: the
    corpus must fit the broadcast budget; above it use ``knn_join_ivf``
    (cell-co-partitioned, approximate)."""
    import ray

    t = _gather_corpus(ds, emb_col, id_col, max_broadcast_rows)
    ids_all = t[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids_all, kind="stable")
    ids_all = np.ascontiguousarray(ids_all[order])
    if np.issubdtype(ids_all.dtype, np.integer):
        ids_all = ids_all.astype(np.int64)  # string ids stay object
    mat_all = _normalize(_to_matrix(t[emb_col]))[order]
    ref = ray.put((ids_all, np.ascontiguousarray(mat_all)))
    return ds.select_columns([id_col, emb_col]).map_batches(
        _SelfJoinTopK(emb_col, id_col, ref, k),
        batch_format="pyarrow", batch_size=batch_size)


def _gather_corpus(ds, emb_col: str, id_col: str,
                   max_rows: int, extra_cols: list | None = None
                   ) -> pa.Table:
    from ._collect import collect_up_to

    cols = [id_col, emb_col, *(extra_cols or [])]
    parts, over = collect_up_to(ds.select_columns(cols), max_rows)
    if over:
        raise ValueError(
            f"knn_self_join corpus exceeds the {max_rows}-row broadcast "
            "budget; use knn_join_ivf (cell-co-partitioned) instead")
    if not parts:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             emb_col: pa.array([], pa.list_(pa.float32()))}
            | {c: pa.array([], pa.int64()) for c in (extra_cols or [])})
    return pa.concat_tables(parts)


def knn_join_ivf(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
                 k: int = 5, n_cells: int = 16, n_probe: int = 4,
                 sample_rows: int = 2048, batch_size: int = 4096,
                 driver_merge_max: int = 5_000_000):
    """Approximate cosine k-NN self-join at corpus scale: vectors co-partition
    by nearest-centroid cell, every vector additionally PROBES its n_probe
    nearest cells (explode to n_probe narrow candidate rows), and each
    ``groupby(cell)`` group runs one members × probes matmul emitting
    per-probe top-k partials; a ``groupby(vec_id)`` second stage merges them.
    Nothing broadcasts but the (n_cells × dim) centroid matrix; the cell id
    is the storage partition key at scale. Approximate (recall set by
    n_probe/n_cells) — pin recall in tests, not equality."""
    import pandas as pd

    import ray

    sample = ds.select_columns([emb_col]).limit(sample_rows)
    mat = np.vstack([
        _to_matrix(b[emb_col]) for b in
        sample.iter_batches(batch_size=sample_rows, batch_format="pyarrow")])
    cent = train_centroids(mat, n_cells)
    cent_ref = ray.put(cent)

    def tag(b: pa.Table) -> pa.Table:
        """Each row -> 1 member row (own cell) + n_probe probe rows."""
        if b.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                emb_col: pa.array([], b.schema.field(emb_col).type),
                "cell": pa.array([], pa.int32()),
                "is_probe": pa.array([], pa.int8())})
        c = ray.get(cent_ref)
        m = _normalize(_to_matrix(b[emb_col]))
        near = np.argsort(-(m @ c.T), axis=1, kind="stable")
        npb = min(n_probe, near.shape[1])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        emb = b[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        member = pa.table({
            id_col: pa.array(ids, pa.int64()),
            emb_col: emb,
            "cell": pa.array(near[:, 0].astype(np.int32)),
            "is_probe": pa.array(np.zeros(len(ids), np.int8))})
        reps = pa.table({
            id_col: pa.array(np.repeat(ids, npb), pa.int64()),
            emb_col: emb.take(pa.array(np.repeat(np.arange(len(ids)), npb))),
            "cell": pa.array(near[:, :npb].ravel().astype(np.int32)),
            "is_probe": pa.array(np.ones(len(ids) * npb, np.int8))})
        return pa.concat_tables([member, reps])

    tagged = ds.select_columns([id_col, emb_col]).map_batches(
        tag, batch_format="pyarrow", batch_size=batch_size)

    def cell_topk(df: pd.DataFrame) -> pd.DataFrame:
        members = df[df["is_probe"] == 0]
        probes = df[df["is_probe"] == 1]
        if not len(members) or not len(probes):
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        m_ids = members[id_col].to_numpy()
        ms = np.argsort(m_ids, kind="stable")
        m_ids = m_ids[ms]
        m_mat = _normalize(np.vstack(members[emb_col].to_numpy()[ms])
                           .astype(np.float64))
        p_ids = probes[id_col].to_numpy()
        p_mat = _normalize(np.vstack(probes[emb_col].to_numpy())
                           .astype(np.float64))
        sims = np.round(p_mat @ m_mat.T, 6)
        sims[p_ids[:, None] == m_ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        out = pd.DataFrame({
            "vec_id": np.repeat(p_ids, kk).astype(np.int64),
            "neighbor_id": m_ids[order.ravel()].astype(np.int64),
            "cosine": np.take_along_axis(sims, order, 1).ravel()})
        return out[np.isfinite(out["cosine"])]

    partials = tagged.groupby("cell").map_groups(
        cell_topk, batch_format="pandas")

    # The per-probe partials are tiny (<= (n_probe+1) x k rows per vector),
    # so below the budget ONE driver merge replaces a second sort-groupby's
    # fixed costs; above it, the distributed groupby(vec_id) merge runs over
    # the SAME pinned partials — materialize first so the over-budget path
    # never re-executes the heavy cell matmul stage.
    if driver_merge_max:
        import ray.data as rd

        from ._collect import collect_up_to

        partials = partials.materialize()
        parts, over = collect_up_to(partials, driver_merge_max,
                                    batch_format="pandas")
        if not over:
            if not parts:
                return partials
            allp = (pd.concat(parts)
                    .drop_duplicates(["vec_id", "neighbor_id"])
                    .sort_values(["vec_id", "cosine", "neighbor_id"],
                                 ascending=[True, False, True]))
            out = allp.groupby("vec_id", sort=True).head(k)
            return rd.from_pandas(out.reset_index(drop=True))

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates(["vec_id", "neighbor_id"])
                .sort_values(["cosine", "neighbor_id"],
                             ascending=[False, True]).head(k))

    return partials.groupby("vec_id").map_groups(
        merge_topk, batch_format="pandas")


def kmeans(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
           k: int = 8, iters: int = 10, seed: int = 11,
           batch_size: int = 4096, tol: float = 1e-6):
    """Distributed Lloyd's k-means over the WHOLE dataset (cosine/spherical:
    vectors and centroids unit-normalized — the embedding-native metric;
    ``train_centroids`` is the sampled sketch used for IVF, this is the full
    clustering operator).

    Each iteration is ONE streaming pass: centroids broadcast via
    ``ray.put``, every batch emits k partial rows (cell, count, vector sum)
    — the exchange is O(k × dim × batches), never O(rows) — and the driver
    merges them in (cell, batch) order (deterministic summation). Empty
    cells keep their previous centroid. Stops early when total centroid
    movement drops below ``tol``.

    Returns ``(assigned_ds, centroids, inertia_per_iter)`` where
    ``assigned_ds`` appends a ``cluster`` column map-side (one extra pass)
    and inertia is Σ(1 − cos) of the assignment pass of each iteration."""
    import ray

    sample = ds.select_columns([emb_col]).limit(max(4 * k, 256))
    mat = np.vstack([
        _to_matrix(b[emb_col]) for b in
        sample.iter_batches(batch_size=1 << 20, batch_format="pyarrow")])
    # iter_batches does NOT guarantee block arrival order — sort the
    # sample lexicographically so the seeded init picks the same rows no
    # matter how the executor interleaved (was a load-dependent flake)
    mat = mat[np.lexsort(mat.T[::-1])]
    rng = np.random.default_rng(seed)
    cent = _normalize(np.asarray(mat, np.float64))[
        rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    inertia_hist: list[float] = []

    def partials_fn(cent_ref):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "cell": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "sum": pa.array([], pa.list_(pa.float64())),
                    "loss": pa.array([], pa.float64())})
            c = ray.get(cent_ref)
            m = _normalize(_to_matrix(b[emb_col]))
            sims = m @ c.T
            cell = sims.argmax(axis=1)
            best = sims[np.arange(len(m)), cell]
            n = np.bincount(cell, minlength=len(c)).astype(np.int64)
            s = np.zeros((len(c), m.shape[1]))
            np.add.at(s, cell, m)
            loss = np.zeros(len(c))
            np.add.at(loss, cell, 1.0 - best)
            keep = n > 0
            return pa.table({
                "cell": pa.array(np.flatnonzero(keep).astype(np.int32)),
                "n": pa.array(n[keep], pa.int64()),
                "sum": pa.array(list(s[keep]), pa.list_(pa.float64())),
                "loss": pa.array(loss[keep], pa.float64())})
        return fn

    # pin the NARROW working set (the embedding column only) in the object
    # store once — every Lloyd pass re-reads it from plasma instead of
    # re-scanning storage; spills to disk if it outgrows memory
    emb = ds.select_columns([emb_col]).materialize()
    for _ in range(iters):
        cent_ref = ray.put(cent)
        rows = []
        for b in emb.map_batches(
                partials_fn(cent_ref), batch_format="pyarrow",
                batch_size=batch_size).iter_batches(
                batch_format="pandas", batch_size=None):
            rows.append(b)
        import pandas as pd

        if not rows:
            break
        allp = pd.concat(rows).sort_values("cell", kind="stable")
        new = cent.copy()
        moved = 0.0
        tot_loss = float(np.sort(allp["loss"].to_numpy()).sum())
        for cell, g in allp.groupby("cell", sort=True):
            sums = np.vstack(g["sum"].to_numpy())
            # canonical summation order (partials arrive in task-completion
            # order, which is not deterministic): sort rows by (n, sum
            # vector) before reducing so reruns are bit-identical
            order = np.lexsort(
                tuple(sums.T[::-1]) + (g["n"].to_numpy(),))
            s = np.sum(sums[order], axis=0)
            v = s / max(float(g["n"].sum()), 1.0)
            nv = v / max(np.linalg.norm(v), 1e-12)
            moved += float(np.linalg.norm(nv - cent[cell]))
            new[cell] = nv
        inertia_hist.append(tot_loss)
        cent = new
        if moved < tol:
            break

    final_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int32())})
        c = ray.get(final_ref)
        m = _normalize(_to_matrix(b[emb_col]))
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array((m @ c.T).argmax(axis=1).astype(np.int32))})

    assigned = ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow", batch_size=batch_size)
    return assigned, cent, inertia_hist


# ---------------------------------------------------------------------------
# IVF


def train_centroids(sample: np.ndarray, n_cells: int, iters: int = 8,
                    seed: int = 11) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (the sample is small by
    construction; at scale this is a `random_sample` of the dataset)."""
    rng = np.random.default_rng(seed)
    s = _normalize(np.asarray(sample, np.float64))
    cent = s[rng.choice(len(s), size=min(n_cells, len(s)), replace=False)]
    for _ in range(iters):
        assign = (s @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = s[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _normalize(cent)
    return cent


class AssignCellStage:
    def __init__(self, emb_col: str, cent_ref):
        self.emb_col = emb_col
        self.cent_ref = cent_ref
        self._cent = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cell", pa.array([], pa.int32()))
        import ray

        if self._cent is None:
            self._cent = ray.get(self.cent_ref)
        mat = _normalize(_to_matrix(batch[self.emb_col]))
        cell = (mat @ self._cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cell, pa.int32()))


class IVFIndex:
    """IVF over a Ray Dataset: build assigns every vector to a cell (one pass);
    search scans only the ``n_probe`` closest cells per query."""

    def __init__(self, n_cells: int = 16, n_probe: int = 4):
        self.n_cells = n_cells
        self.n_probe = n_probe
        self.centroids: np.ndarray | None = None
        self._assigned = None
        self.emb_col = "embedding"
        self.id_col = "vec_id"

    def build(self, ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
              sample_rows: int = 2048):
        import ray

        self.emb_col, self.id_col = emb_col, id_col
        sample = ds.select_columns([emb_col]).limit(sample_rows)
        mat = np.vstack([
            _to_matrix(b[emb_col]) for b in
            sample.iter_batches(batch_size=sample_rows, batch_format="pyarrow")])
        self.centroids = train_centroids(mat, self.n_cells)
        cent_ref = ray.put(self.centroids)
        self._assigned = ds.select_columns([id_col, emb_col]).map_batches(
            AssignCellStage(emb_col, cent_ref), batch_format="pyarrow"
        ).materialize()
        return self

    def search(self, queries: np.ndarray, k: int = 10) -> pa.Table:
        """Distributed probe: the (query matrix, probe lists) broadcast once;
        each batch of the assigned table filters to probed cells, computes the
        matmul and emits per-query top-k partials; a groupby(query_id) second
        stage reduces them so the driver sees k rows per query — same shape as
        ``knn_brute``, no driver-side matmul loop."""
        import pandas as pd
        import pyarrow.compute as pc

        import ray

        q = _normalize(np.asarray(queries, np.float64))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, : self.n_probe]
        cells_needed = pa.array(sorted({int(c) for c in probe.ravel()}),
                                pa.int32())
        ref = ray.put((q, probe))
        emb_col, id_col = self.emb_col, self.id_col

        def partial_topk(b: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "neighbor_id": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64())})
            b = b.filter(pc.is_in(b["cell"], value_set=cells_needed))
            if b.num_rows == 0:
                return empty
            qm, pr = ray.get(ref)
            mat = _normalize(_to_matrix(b[emb_col]))
            ids = b[id_col].to_numpy(zero_copy_only=False)
            cells = b["cell"].to_numpy(zero_copy_only=False)
            sims = mat @ qm.T
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qm)):
                mask = np.isin(cells, pr[qi])
                if not mask.any():
                    continue
                s = sims[mask, qi]
                kk = min(k, len(s))
                sel = np.argpartition(-s, kk - 1)[:kk]
                out_q.append(np.full(kk, qi, np.int64))
                out_id.append(ids[mask][sel])
                out_s.append(s[sel])
            if not out_q:
                return empty
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            })

        partials = self._assigned.map_batches(partial_topk,
                                              batch_format="pyarrow")

        def topk_group(df):
            df = df.copy()
            df["score"] = df["score"].round(6)
            return (df.sort_values(["score", "neighbor_id"],
                                   ascending=[False, True]).head(k))

        merged = partials.groupby("query_id").map_groups(
            topk_group, batch_format="pandas")
        frames = [b.to_pandas() for b in merged.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")]
        df = pd.concat(frames) if frames else pd.DataFrame(
            columns=["query_id", "neighbor_id", "score"])
        df = (df.sort_values(["query_id", "score", "neighbor_id"],
                             ascending=[True, False, True])
              .reset_index(drop=True))
        return pa.Table.from_pandas(df, preserve_index=False)


def dim_covariance(ds, *, emb_col: str, dims: int | None = None):
    """Population covariance matrix of an embedding column (upper triangle,
    1-based dims) — the PCA / whitening preprocessing pass. Each batch ships
    one ``X.T @ X`` worth of sufficient statistics: d(d+1)/2 rows of
    (i, j, n, sx, sy, sxy), so the exchange is O(dim² × batches), never
    O(rows × dim). One tiny groupby merges; the closed form
    ``sxy/n − (sx/n)(sy/n)`` matches SQL ``covar_pop`` (6dp rounded)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], pa.int64()),
                          "j": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.float64()),
                          "sy": pa.array([], pa.float64()),
                          "sxy": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        arr = b[emb_col].combine_chunks() if isinstance(
            b[emb_col], pa.ChunkedArray) else b[emb_col]
        lens = np.asarray(arr.value_lengths())
        dim = int(lens[0])
        if not (lens == dim).all():
            raise ValueError("ragged embedding lists are not supported")
        m = (arr.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, dim))
        if dims is not None:
            m = m[:, :dims]
        d = m.shape[1]
        iu, ju = np.triu_indices(d)
        sxy = (m.T @ m)[iu, ju]
        s = m.sum(axis=0)
        n = np.full(len(iu), m.shape[0], np.int64)
        return pa.table({"i": pa.array((iu + 1).astype(np.int64)),
                         "j": pa.array((ju + 1).astype(np.int64)),
                         "n": pa.array(n),
                         "sx": pa.array(s[iu], pa.float64()),
                         "sy": pa.array(s[ju], pa.float64()),
                         "sxy": pa.array(sxy, pa.float64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["i", "j"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxy", alias_name="sxy")))

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.float64)
        sx = b["sx"].to_numpy()
        sy = b["sy"].to_numpy()
        sxy = b["sxy"].to_numpy()
        cov = sxy / n - (sx / n) * (sy / n)
        return pa.table({"i": b["i"], "j": b["j"],
                         "cov": pa.array(np.round(cov, 6), pa.float64())})

    return merged.map_batches(fin, batch_format="pyarrow")


def pca_project(ds, *, emb_col: str, id_col: str = "vec_id",
                n_components: int = 2, out_col: str = "pc",
                driver_cov_max_dim: int = 2048):
    """PCA projection of the embedding column onto its top
    ``n_components`` principal axes — the dimensionality-reduction /
    whitening prep pass before clustering or ANN.

    Distributed shape: the covariance SUFFICIENT STATISTICS come from the
    same O(dim² × batches) exchange as ``dim_covariance`` (rows never
    shuffle); the dim×dim eigendecomposition runs on the driver (guarded —
    dim > ``driver_cov_max_dim`` means this isn't a covariance-PCA-shaped
    problem); mean + axes broadcast via ``ray.put`` and the projection is
    one map-only matmul per batch. Axis SIGNS are fixed deterministically
    (largest-|component| entry made positive) so re-runs and re-blockings
    agree."""
    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], pa.int64()),
                          "j": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.float64()),
                          "sxy": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        m = _to_matrix(b[emb_col])
        d = m.shape[1]
        if d > driver_cov_max_dim:
            raise ValueError(f"pca_project: dim {d} exceeds "
                             f"driver_cov_max_dim={driver_cov_max_dim}")
        iu, ju = np.triu_indices(d)
        sxy = (m.T @ m)[iu, ju]
        s = m.sum(axis=0)
        return pa.table({"i": pa.array(iu.astype(np.int64)),
                         "j": pa.array(ju.astype(np.int64)),
                         "n": pa.array(np.full(len(iu), m.shape[0],
                                               np.int64)),
                         "sx": pa.array(np.where(iu == ju, s[iu], 0.0),
                                        pa.float64()),
                         "sxy": pa.array(sxy, pa.float64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["i", "j"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sxy", alias_name="sxy"))).take_all()
    if not merged:
        return ds.map_batches(
            lambda b: pa.table({id_col: b[id_col].slice(0, 0),
                                out_col: pa.array([], pa.list_(
                                    pa.float64(), n_components))}),
            batch_format="pyarrow")
    d = max(int(r["i"]) for r in merged) + 1
    n = float(next(r["n"] for r in merged))
    mean = np.zeros(d)
    s2 = np.zeros((d, d))
    for r in merged:
        i, j = int(r["i"]), int(r["j"])
        s2[i, j] = s2[j, i] = r["sxy"]
        if i == j:
            mean[i] = r["sx"] / n
    cov = s2 / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)                      # ascending
    axes = v[:, ::-1][:, :n_components]             # top components
    # deterministic sign: the largest-magnitude entry of each axis positive
    flip = axes[np.abs(axes).argmax(axis=0), np.arange(axes.shape[1])] < 0
    axes[:, flip] *= -1
    ref = ray.put((mean, axes))

    def project(b: pa.Table) -> pa.Table:
        mu, ax = ray.get(ref)
        m = _to_matrix(b[emb_col])
        pcs = (m - mu) @ ax
        return pa.table({
            id_col: b[id_col],
            out_col: pa.FixedSizeListArray.from_arrays(
                pa.array(pcs.ravel(), pa.float64()), ax.shape[1])})

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow")


def grouped_dim_stats(ds, *, emb_col: str, group_col: str):
    """Per-(group, dimension) statistics of a fixed-width embedding list
    column — label centroids plus per-dimension min/max — WITHOUT exploding
    rows through a shuffle.

    Per-batch partials: the (rows x dim) block is reshaped once; per-group
    sums come from one ``np.add.at`` over the factorized group codes, so each
    batch ships |groups_in_batch| x dim narrow partial rows. A tiny
    ``groupby(group, pos)`` merges them. At 10^12 rows the exchange is
    O(groups x dim x batches), never O(rows x dim)."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], b[group_col].type),
                          "pos": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64()),
                          "vmin": pa.array([], pa.float64()),
                          "vmax": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        arr = b[emb_col].combine_chunks() if isinstance(
            b[emb_col], pa.ChunkedArray) else b[emb_col]
        lens = np.asarray(arr.value_lengths())
        dim = int(lens[0])
        if not (lens == dim).all():
            raise ValueError("ragged embedding lists are not supported")
        m = (arr.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, dim))
        codes, uniq = pd.factorize(
            b[group_col].to_numpy(zero_copy_only=False))
        ng = len(uniq)
        sums = np.zeros((ng, dim), np.float64)
        np.add.at(sums, codes, m)
        mins = np.full((ng, dim), np.inf)
        np.minimum.at(mins, codes, m)
        maxs = np.full((ng, dim), -np.inf)
        np.maximum.at(maxs, codes, m)
        counts = np.bincount(codes, minlength=ng).astype(np.int64)
        gvals = pa.array(np.repeat(uniq, dim), b[group_col].type)
        return pa.table({
            group_col: gvals,
            "pos": pa.array(np.tile(np.arange(1, dim + 1), ng), pa.int64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "vmin": pa.array(mins.ravel(), pa.float64()),
            "vmax": pa.array(maxs.ravel(), pa.float64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([group_col, "pos"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s", alias_name="s"),
                      Min("vmin", alias_name="vmin"),
                      Max("vmax", alias_name="vmax")))

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False)
        return pa.table({group_col: b[group_col], "pos": b["pos"],
                         "n": b["n"],
                         "mean_v": pa.array(s / n, pa.float64()),
                         "vmin": b["vmin"], "vmax": b["vmax"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def centroid_outliers(ds, *, emb_col: str, id_col: str, label_col: str,
                      max_cos: float = 0.0, cells_max: int = 50_000_000):
    """Embedding-based label-noise / junk filter: emit rows whose cosine to
    their OWN label's centroid is below ``max_cos`` — the "this example
    doesn't look like its class" curation signal (the CLIP-score-style
    filter applied to any labeled embedding table).

    Distributed shape: pass 1 is ``grouped_dim_stats`` (per-batch np.add.at
    partials, the exchange is |labels| x dim narrow rows per batch, never
    rows x dim); the |labels| x dim centroid table is a bounded driver
    collect (loud guard) broadcast once via ``ray.put``; pass 2 is map-only
    cosine against the looked-up centroid. ``centroid_cos`` is rounded to
    6dp and the threshold compares the ROUNDED value so the DuckDB oracle
    (avg per dim + list_cosine_similarity) matches bit-for-bit."""
    import ray

    from ._collect import collect_up_to

    stats = grouped_dim_stats(ds, emb_col=emb_col, group_col=label_col)
    parts, over = collect_up_to(stats, cells_max)
    if over:
        raise ValueError(
            f"centroid table exceeds {cells_max} cells — bucket the label "
            "space or co-partition by label instead of broadcasting")
    import pandas as pd

    dfs = [p.select([label_col, "pos", "mean_v"]).to_pandas()
           for p in parts if p.num_rows]
    cmat: dict = {}
    if dfs:
        df = pd.concat(dfs).sort_values([label_col, "pos"])
        cmat = {lv: g["mean_v"].to_numpy(np.float64)
                for lv, g in df.groupby(label_col, sort=False)}
    ref = ray.put(cmat)

    def score(b: pa.Table) -> pa.Table:
        import pandas as pd

        m = ray.get(ref)
        emb = _to_matrix(b[emb_col])
        labs = b[label_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(labs)
        dim = emb.shape[1] if emb.ndim == 2 else 0
        cmat_b = np.stack([m.get(u, np.full(dim, np.nan)) for u in uniq]) \
            if len(uniq) else np.zeros((0, dim))
        cc = cmat_b[np.maximum(codes, 0)] if len(uniq) else emb
        num = np.einsum("ij,ij->i", emb, cc)
        denom = np.linalg.norm(emb, axis=1) * np.linalg.norm(cc, axis=1)
        cos = num / np.maximum(denom, 1e-300)
        cos[codes < 0] = np.nan
        cos6 = np.round(cos, 6)
        keep = ~np.isnan(cos6) & (cos6 < max_cos)
        out = pa.table({id_col: b[id_col], label_col: b[label_col],
                        "centroid_cos": pa.array(cos6, pa.float64())})
        return out.filter(pa.array(keep))

    return ds.map_batches(score, batch_format="pyarrow")


def grouped_mean_pairwise_cosine(ds, *, emb_col: str, group_col: str,
                                 id_col: str | None = None):
    """Mean pairwise cosine similarity WITHIN each group — the embedding
    diversity / redundancy score per label or source (high mean = the
    group's vectors are near-duplicates; a curation signal before
    dedup/mixing). Exact, WITHOUT materializing any pair:

        Σ_{i<j} cos(v_i, v_j) = (‖Σ v̂‖² − n) / 2    (v̂ unit-normalized)

    so per-batch partials are just (group, n, per-dim sums of v̂) — the
    ``grouped_dim_stats`` exchange shape, O(groups × dim × batches) — and
    the finish divides by n(n−1)/2 on the ≤|groups|×dim aggregate. Groups
    with a single vector emit NULL (no pairs)."""
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], b[group_col].type),
                          "pos": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        m = _normalize(_to_matrix(b[emb_col]))
        codes, uniq = pd.factorize(
            b[group_col].to_numpy(zero_copy_only=False))
        ng, dim = len(uniq), m.shape[1]
        sums = np.zeros((ng, dim), np.float64)
        np.add.at(sums, codes, m)
        counts = np.bincount(codes, minlength=ng).astype(np.int64)
        return pa.table({
            group_col: pa.array(np.repeat(uniq, dim), b[group_col].type),
            "pos": pa.array(np.tile(np.arange(dim), ng), pa.int64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([group_col, "pos"])
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group_col, sort=True):
            # canonical (pos) order so reruns are bit-identical
            sub = sub.sort_values("pos")
            n = int(sub["n"].iloc[0])
            sq = float((sub["s"].to_numpy() ** 2).sum())
            mean = round((sq - n) / (n * (n - 1)), 6) if n > 1 else np.nan
            out.append((g, n, mean))
        return pd.DataFrame(out, columns=[group_col, "n", "mean_cos"])

    # |groups| x dim rows — driver-finished like the covariance operator
    parts = [b for b in agg.iter_batches(batch_format="pandas",
                                         batch_size=None) if len(b)]
    if not parts:
        sch = ds.schema()
        gtype = dict(zip(sch.names, sch.types))[group_col]
        return rd.from_arrow(pa.table({
            group_col: pa.array([], gtype),
            "n": pa.array([], pa.int64()),
            "mean_cos": pa.array([], pa.float64())}))
    return rd.from_pandas(finish(pd.concat(parts, ignore_index=True)))


def label_cosine_margin(ds, *, emb_col: str, id_col: str, label_col: str,
                        cells_max: int = 50_000_000):
    """Silhouette-style label-quality margin per row: ``a_self`` = mean
    cosine to the OTHER members of the row's own label, ``b_other`` = the
    best (max) mean cosine to any other label, ``margin = a_self −
    b_other``. Negative margin = this row sits closer to another class than
    to its own — the per-example mislabel signal (the cosine analogue of the
    silhouette a/b decomposition, which IS centroid-sufficient for cosine:
    mean_j cos(v, u_j) = v̂ · Σ û_j / n).

    Distributed shape: pass 1 reuses the per-label normalized-sum partial
    (exchange = |labels| × dim narrow rows per batch); the ≤|labels| × dim
    aggregate is a loud-guarded driver collect broadcast once via
    ``ray.put``; pass 2 is a map-only (batch × labels) matmul. Rows whose
    label has a single member (a undefined) are dropped on both engines.
    6dp rounding absorbs dot-with-sum vs mean-of-cosines ulps."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({label_col: pa.array([], b[label_col].type),
                          "pos": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        m = _normalize(_to_matrix(b[emb_col]))
        codes, uniq = pd.factorize(
            b[label_col].to_numpy(zero_copy_only=False))
        ng, dim = len(uniq), m.shape[1]
        sums = np.zeros((ng, dim), np.float64)
        np.add.at(sums, codes, m)
        counts = np.bincount(codes, minlength=ng).astype(np.int64)
        return pa.table({
            label_col: pa.array(np.repeat(uniq, dim), b[label_col].type),
            "pos": pa.array(np.tile(np.arange(dim), ng), pa.int64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([label_col, "pos"])
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))
    parts, over = collect_up_to(agg, cells_max)
    if over:
        raise ValueError(
            f"label-sum table exceeds {cells_max} cells — bucket the label "
            "space or co-partition by label instead of broadcasting")
    dfs = [p.select([label_col, "pos", "n", "s"]).to_pandas()
           for p in parts if p.num_rows]
    labels: list = []
    S = np.zeros((0, 0))
    counts = np.zeros(0, np.int64)
    if dfs:
        df = pd.concat(dfs).sort_values([label_col, "pos"])
        labels = list(df[label_col].unique())
        dim = int(df["pos"].max()) + 1
        S = df["s"].to_numpy(np.float64).reshape(len(labels), dim)
        counts = df.groupby(label_col, sort=False)["n"].first() \
                   .to_numpy(np.int64)
    ref = ray.put((labels, S, counts))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          label_col: pa.array([], b[label_col].type),
                          "a_self": pa.array([], pa.float64()),
                          "b_other": pa.array([], pa.float64()),
                          "margin": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        labs_all, smat, cnts = ray.get(ref)
        if len(labs_all) < 2:
            return empty
        lab_ix = {lv: i for i, lv in enumerate(labs_all)}
        m = _normalize(_to_matrix(b[emb_col]))
        labs = b[label_col].to_numpy(zero_copy_only=False)
        own = np.array([lab_ix[lv] for lv in labs])
        dots = m @ smat.T                               # (batch, labels)
        sd = np.einsum("ij,ij->i", m, m)                # self-cosine ≈ 1
        n_own = cnts[own]
        rows = np.arange(len(own))
        a = (dots[rows, own] - sd) / np.maximum(n_own - 1, 1)
        other = dots / cnts[None, :]
        other[rows, own] = -np.inf
        bo = other.max(axis=1)
        keep = n_own >= 2
        a6, b6 = np.round(a, 6), np.round(bo, 6)
        mg6 = np.round(a - bo, 6)
        out = pa.table({id_col: b[id_col], label_col: b[label_col],
                        "a_self": pa.array(a6, pa.float64()),
                        "b_other": pa.array(b6, pa.float64()),
                        "margin": pa.array(mg6, pa.float64())})
        return out.filter(pa.array(keep))

    return ds.map_batches(score, batch_format="pyarrow")


class _DominatedStage:
    """Map-only 'has a lower-id neighbor above threshold' check against a
    broadcast normalized corpus matrix (ray.put once, ray.get once per actor
    process — never per batch)."""

    def __init__(self, emb_col: str, id_col: str, ref, threshold: float,
                 invert: bool = False):
        self.emb_col = emb_col
        self.id_col = id_col
        self.ref = ref
        self.threshold = threshold
        self.invert = invert    # True -> emit the DOMINATED ids instead
        self._corpus = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({self.id_col: pa.array([], pa.int64())})
        import ray

        if self._corpus is None:
            self._corpus = ray.get(self.ref)
        ids_all, mat_all = self._corpus
        m = _normalize(_to_matrix(batch[self.emb_col]))
        ids = batch[self.id_col].combine_chunks() if isinstance(
            batch[self.id_col], pa.ChunkedArray) else batch[self.id_col]
        ids = ids.to_numpy(zero_copy_only=False)
        sims = m @ mat_all.T                                  # (batch, N)
        dom = ((sims >= self.threshold)
               & (ids_all[None, :] < ids[:, None])).any(axis=1)
        keep = dom if self.invert else ~dom
        return pa.table({self.id_col: pa.array(ids[keep], pa.int64())})


def semdedup(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
             threshold: float = 0.3, n_cells: int | None = None,
             sample_rows: int = 2048, batch_size: int = 2048,
             corpus_max: int = 2_000_000, invert: bool = False):
    """Semantic dedup over an embedding column (SemDeDup-style): a row
    SURVIVES iff no lower-id row has cosine similarity >= ``threshold`` with
    it. The rule is non-iterative ("dominated by any earlier row", not
    "earlier *kept* row"), so it is deterministic, order-free and exactly
    SQL-expressible (``NOT EXISTS (... b.id < a.id AND cos >= t)``).

    Two paths:

    - ``n_cells=None`` — exact/brute verification baseline: the normalized
      corpus matrix + id vector broadcast ONCE via ``ray.put`` (guarded by
      ``corpus_max``); each batch runs one matmul against it and a vectorized
      any-lower-id-neighbor reduction. Map-only, zero shuffle,
      O(N^2 / workers) compute — the baseline the scale path is pinned
      against.
    - ``n_cells=K`` — the SemDeDup scale shape: vectors are assigned to their
      nearest coarse centroid (seeded driver-side k-means on a sample, same
      machinery as IVF) and domination is checked WITHIN each cell via
      ``groupby(cell).map_groups``. Cross-cell near-duplicates are missed by
      construction — the documented approximation of the published method —
      and recall vs the brute path is pinned in tests. At 100 TB the cell id
      is the storage partition key: nothing broadcasts but K centroids, and
      the only exchange is the cell-key shuffle.

    Returns a Dataset with the surviving ``id_col`` values
    (``invert=True`` returns the DOMINATED ids instead — the
    duplication-bounded drop set a resumable curation pipeline persists).
    """
    import ray

    if n_cells is None:
        n = ds.count()
        if n > corpus_max:
            raise ValueError(
                f"semdedup brute path needs the corpus broadcast "
                f"({n} rows > corpus_max={corpus_max}); pass n_cells=K "
                f"for the cluster-partitioned scale path")
        tbls = [b for b in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow")]
        t = pa.concat_tables(tbls) if tbls else pa.table(
            {id_col: pa.array([], pa.int64()), emb_col: pa.array([], pa.list_(pa.float32()))})
        ids_all = np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64)
        mat_all = _normalize(_to_matrix(t[emb_col]))
        ref = ray.put((ids_all, mat_all))
        return ds.select_columns([id_col, emb_col]).map_batches(
            _DominatedStage(emb_col, id_col, ref, threshold, invert),
            batch_format="pyarrow", batch_size=batch_size)

    sample = ds.select_columns([emb_col]).limit(sample_rows)
    mat = np.vstack([_to_matrix(b[emb_col]) for b in sample.iter_batches(
        batch_size=sample_rows, batch_format="pyarrow")])
    cent_ref = ray.put(train_centroids(mat, n_cells))
    assigned = ds.select_columns([id_col, emb_col]).map_batches(
        AssignCellStage(emb_col, cent_ref), batch_format="pyarrow",
        batch_size=batch_size)
    thr = threshold
    ecol, icol = emb_col, id_col

    def cell_survivors(df):
        import pandas as pd

        ids = df[icol].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(np.vstack(df[ecol].to_numpy()[order]).astype(np.float64))
        sims = m @ m.T
        # strictly-lower-id comparisons only (rows sorted by id)
        dom = (np.tril(sims >= thr, k=-1)).any(axis=1)
        kp = dom if invert else ~dom
        return pd.DataFrame({icol: ids[kp].astype(np.int64)})

    return assigned.groupby("cell").map_groups(cell_survivors)


def mmr_select(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
               query_vec, k: int = 20, lam: float = 0.5,
               candidate_pool: int = 1024):
    """Maximal-Marginal-Relevance selection — the diverse-subset pick a
    curation pass runs after scoring (coreset / dedup-aware top-k):
    greedily take the row maximizing

        lam * cos(v, query) - (1 - lam) * max_{s in selected} cos(v, s)

    Distributed shape: one map pass keeps each batch's top-``candidate_
    pool`` by relevance (per-batch partials, ties -> min id), the driver
    merges partials and runs the O(pool × k × dim) greedy on the pooled
    candidates only — the corpus never materializes. The pool bound is
    the documented approximation: a row outside the global relevance
    top-pool cannot be selected (standard MMR-over-shortlist practice).
    Deterministic: float64 scores, ties broken by ascending id.

    Returns a driver pa.Table (id, rank, relevance, mmr_score) — k rows.
    """
    import heapq

    q = np.asarray(query_vec, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)

    def pool_partial(b: pa.Table) -> pa.Table:
        t = b.select([id_col, emb_col]).drop_null()
        if t.num_rows == 0:
            return t
        m = _normalize(_to_matrix(t[emb_col]))
        rel = m @ q
        n = min(candidate_pool, len(rel))
        # top-n by (rel DESC, id ASC): stable argsort over -rel after an
        # id sort gives deterministic tie order
        ids = t[id_col].to_numpy(zero_copy_only=False)
        io = np.argsort(ids, kind="stable")
        keep = io[np.argsort(-rel[io], kind="stable")[:n]]
        return pa.table({id_col: t[id_col].take(pa.array(keep)),
                         emb_col: t[emb_col].take(pa.array(keep)),
                         "_rel": pa.array(rel[keep])})

    parts = list(ds.map_batches(pool_partial, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        sch = ds.schema()
        idt = dict(zip(sch.names, sch.types))[id_col] if sch else pa.int64()
        return pa.table({id_col: pa.array([], idt),
                         "rank": pa.array([], pa.int64()),
                         "relevance": pa.array([], pa.float64()),
                         "mmr_score": pa.array([], pa.float64())})
    t = pa.concat_tables(parts)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    rel = t["_rel"].to_numpy(zero_copy_only=False)
    io = np.argsort(ids, kind="stable")
    order = io[np.argsort(-rel[io], kind="stable")[:candidate_pool]]
    ids, rel = ids[order], rel[order]
    M = _normalize(_to_matrix(t[emb_col]))[order]

    sel: list[int] = []
    max_sim = np.full(len(ids), -np.inf)
    out_rank, out_id, out_rel, out_score = [], [], [], []
    for r in range(min(k, len(ids))):
        if sel:
            score = lam * rel - (1 - lam) * max_sim
        else:
            score = lam * rel
        score[sel] = -np.inf
        # argmax with ascending-id tiebreak (ids sorted into rel order, so
        # walk candidates equal to the max and take the smallest id)
        best = np.flatnonzero(score == score.max())
        i = best[np.argsort(ids[best], kind="stable")[0]]
        sel.append(int(i))
        out_rank.append(r)
        out_id.append(ids[i])
        out_rel.append(float(rel[i]))
        out_score.append(float(score[i]))
        max_sim = np.maximum(max_sim, M @ M[i])
    return pa.table({id_col: pa.array(out_id),
                     "rank": pa.array(out_rank, pa.int64()),
                     "relevance": pa.array(out_rel, pa.float64()),
                     "mmr_score": pa.array(out_score, pa.float64())})


class _LabelAgreeTopK:
    """Per-batch exact top-k (same chunked reused-buffer matmul and 6dp
    stable tie order as :class:`_SelfJoinTopK`) that reduces straight to the
    per-row label-agreement fraction instead of emitting pairs — the k
    neighbor rows never leave the task."""

    def __init__(self, emb_col: str, id_col: str, label_col: str, ref,
                 k: int):
        self.emb_col, self.id_col, self.label_col = emb_col, id_col, label_col
        self.ref, self.k = ref, k
        self._corpus = None
        self._buf = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        idt = batch.schema.field(self.id_col).type
        lt = batch.schema.field(self.label_col).type
        empty = pa.table({self.id_col: pa.array([], idt),
                          self.label_col: pa.array([], lt),
                          "n_neighbors": pa.array([], pa.int64()),
                          "agree_frac": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        import ray

        if self._corpus is None:
            self._corpus = ray.get(self.ref)
        ids_all, mat_all, labels_all = self._corpus
        mat = _normalize(_to_matrix(batch[self.emb_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        labs = batch[self.label_col].to_numpy(zero_copy_only=False)
        n = len(ids_all)
        k = min(self.k, n - 1)
        if k <= 0:
            return empty
        chunk = max(1, (4 << 20) // (8 * n))
        if self._buf is None or self._buf.shape != (chunk, n):
            self._buf = np.empty((chunk, n), np.float64)
        nn = np.empty(len(ids), np.int64)
        agree = np.empty(len(ids), np.float64)
        for s in range(0, len(ids), chunk):
            sub = mat[s:s + chunk]
            sims = np.dot(sub, mat_all.T, out=self._buf[:len(sub)])
            np.round(sims, 6, out=sims)
            sims[ids[s:s + chunk, None] == ids_all[None, :]] = -np.inf
            order = _topk_rows(sims, k)
            scores = np.take_along_axis(sims, order, 1)
            valid = scores > -np.inf
            same = (labels_all[order] == labs[s:s + chunk, None]) & valid
            cnt = valid.sum(1)
            nn[s:s + chunk] = cnt
            agree[s:s + chunk] = same.sum(1) / np.maximum(cnt, 1)
        keep = nn > 0
        return pa.table({self.id_col: pa.array(ids[keep], idt),
                         self.label_col: pa.array(labs[keep], lt),
                         "n_neighbors": pa.array(nn[keep], pa.int64()),
                         "agree_frac": pa.array(agree[keep], pa.float64())})


def knn_label_agreement(ds, *, emb_col: str = "embedding",
                        id_col: str = "vec_id", label_col: str = "label",
                        k: int = 10, batch_size: int = 4096,
                        max_broadcast_rows: int = 2_000_000):
    """Label-noise scoring (Confident-Learning-lite): for every row, the
    fraction of its exact ``k`` nearest OTHER rows (cosine, 6dp stable tie
    order) that share its label. Low agreement = probable mislabel or
    boundary sample — rank by it before relabeling/dropping. Same
    broadcast-matmul shape as :func:`knn_self_join`; the reduction to a
    per-row fraction happens inside the task, so only one narrow row per
    input row leaves the stage. Rows with NULL label/id are excluded from
    both sides."""
    import ray

    clean = ds.select_columns([id_col, emb_col, label_col]).map_batches(
        lambda b: b.drop_null(), batch_format="pyarrow")
    t = _gather_corpus(clean, emb_col, id_col, max_broadcast_rows,
                       extra_cols=[label_col])
    ids_all = t[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids_all, kind="stable")
    ids_all = np.ascontiguousarray(ids_all[order])
    if np.issubdtype(ids_all.dtype, np.integer):
        ids_all = ids_all.astype(np.int64)
    labels_all = np.ascontiguousarray(
        t[label_col].to_numpy(zero_copy_only=False)[order])
    mat_all = _normalize(_to_matrix(t[emb_col]))[order]
    ref = ray.put((ids_all, np.ascontiguousarray(mat_all), labels_all))
    return clean.map_batches(
        _LabelAgreeTopK(emb_col, id_col, label_col, ref, k),
        batch_format="pyarrow", batch_size=batch_size)


def knn_hard_negatives(ds, *, emb_col: str = "embedding",
                       id_col: str = "vec_id", label_col: str = "label",
                       k: int = 5, batch_size: int = 4096,
                       max_broadcast_rows: int = 2_000_000):
    """Hard-negative mining for contrastive training: each row's top-``k``
    most-similar rows with a DIFFERENT label (the near-boundary negatives
    that actually move a contrastive loss). Same exact broadcast-matmul
    shape as :func:`knn_self_join` with a same-label mask on top; rows
    with a NULL label are excluded from both sides (SQL ``<>``
    semantics — NULL labels match nothing)."""
    import ray

    clean = ds.select_columns([id_col, emb_col, label_col]).map_batches(
        lambda b: b.drop_null(), batch_format="pyarrow")
    t = _gather_corpus(clean, emb_col, id_col, max_broadcast_rows,
                       extra_cols=[label_col])
    ids_all = t[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids_all, kind="stable")
    ids_all = np.ascontiguousarray(ids_all[order])
    if np.issubdtype(ids_all.dtype, np.integer):
        ids_all = ids_all.astype(np.int64)
    labels_all = np.ascontiguousarray(
        t[label_col].to_numpy(zero_copy_only=False)[order])
    mat_all = _normalize(_to_matrix(t[emb_col]))[order]
    ref = ray.put((ids_all, np.ascontiguousarray(mat_all), labels_all))
    return clean.map_batches(
        _SelfJoinTopK(emb_col, id_col, ref, k, label_col=label_col),
        batch_format="pyarrow", batch_size=batch_size)


def label_confusion_pairs(ds, *, emb_col: str, label_col: str):
    """Pairwise cosine similarity between LABEL CENTROIDS — the class
    confusability matrix (a pair whose centroids nearly coincide is where
    mislabels hide and contrastive sampling should focus).

    Reuses :func:`grouped_dim_stats`: the only exchange is the
    |labels| x dim sufficient-stats partials; the centroid table collected
    on the driver is |labels| x dim rows (label-alphabet-bounded, never
    data-bounded) and the pair matmul is |labels|^2 driver-side floats.
    Output: (label_a < label_b, cosine rounded to 6)."""
    import ray.data as rd

    stats = grouped_dim_stats(ds, emb_col=emb_col, group_col=label_col)
    rows = stats.to_pandas()  # |labels| x dim — alphabet-bounded
    if not len(rows):
        return rd.from_arrow(pa.table({
            "label_a": pa.array([], pa.int64()),
            "label_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    piv = rows.pivot(index=label_col, columns="pos", values="mean_v")
    piv = piv.sort_index()
    labels = piv.index.to_numpy()
    cents = piv.to_numpy(dtype=np.float64)
    normed = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = normed @ normed.T
    ia, ib = np.triu_indices(len(labels), k=1)
    return rd.from_arrow(pa.table({
        "label_a": pa.array(labels[ia]),
        "label_b": pa.array(labels[ib]),
        "cosine": pa.array(np.round(sims[ia, ib], 6), pa.float64()),
    }))
