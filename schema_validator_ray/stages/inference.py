"""Batched model inference as an actor-pool stage.

The canonical stateful-stage shape the engine is built around: the model
(here a linear / prototype head over the embedding column — the
deterministic stand-in for a real checkpoint, since no ML runtime ships in
this container) loads ONCE per actor in ``__init__``; ``__call__`` scores a
whole Arrow batch with one float64 matmul. Swapping in a real model is a
one-class change: load weights in ``__init__``, keep the batched
``__call__``.

No analogue in the reference (weilence/schema-validator has no scoring);
part of the training-data surface SURVEY §2.7 adds — model-based quality
scoring / classification is the step between heuristic filters and
curation decisions in an LLM data pipeline.

Movement: map-only. The weight matrix rides inside the actor (sent once at
actor launch), embeddings never leave their blocks, output is one score —
or (class, score) — per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _normalize, _to_matrix


class ModelScoreStage:
    """Callable class for ``map_batches(..., concurrency=N)``: cosine score
    against a single weight vector, or argmax class over a (k, dim)
    prototype matrix. All math in float64 (the SQL oracle reproduces the
    single-vector score bit-for-bit under 1e-6 rounding)."""

    def __init__(self, emb_col: str, id_col: str, weights,
                 out_col: str = "score", normalize: bool = True):
        # "model load" — once per actor, never per batch
        W = np.asarray(weights, np.float64)
        self.single = W.ndim == 1
        W = np.atleast_2d(W)
        self.W = _normalize(W).T if normalize else W.T  # (dim, k)
        self.emb_col, self.id_col = emb_col, id_col
        self.out_col = out_col
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.select([self.id_col, self.emb_col]).drop_null()
        X = _to_matrix(t[self.emb_col])
        if X.shape[0] == 0:
            cols = {self.id_col: t[self.id_col],
                    self.out_col: pa.array([], pa.float64())}
            if not self.single:
                cols["cls"] = pa.array([], pa.int64())
            return pa.table(cols)
        norms = np.linalg.norm(X, axis=1)
        if self.normalize:
            keep = norms > 0  # zero vectors have no cosine — drop, like SQL
            t, X, norms = (t.filter(pa.array(keep)), X[keep], norms[keep])
            X = X / norms[:, None]
        S = X @ self.W  # ONE matmul per batch
        cols = {self.id_col: t[self.id_col]}
        if self.single:
            cols[self.out_col] = pa.array(S[:, 0])
        else:
            cls = np.argmax(S, axis=1)  # ties -> lowest class id
            cols["cls"] = pa.array(cls.astype(np.int64))
            cols[self.out_col] = pa.array(S[np.arange(len(cls)), cls])
        return pa.table(cols)


def model_score(ds, emb_col: str, id_col: str, weights, *,
                out_col: str = "score", normalize: bool = True,
                concurrency: int = 2, batch_size: int = 4096):
    """Score every row's embedding against ``weights`` in an actor pool.

    ``concurrency`` actors each hold the weights once; keep it below the
    session CPU count so the upstream read is never starved (an actor pool
    that pins every core livelocks a small session — learned the hard way
    on the image-quality stage)."""
    return ds.map_batches(
        ModelScoreStage, fn_constructor_args=(emb_col, id_col, weights),
        fn_constructor_kwargs={"out_col": out_col, "normalize": normalize},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
