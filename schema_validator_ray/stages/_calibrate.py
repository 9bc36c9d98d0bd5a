"""Bucket-width auto-calibration from a one-pass t-digest of the order column.

The (shard, bucket) analytics operators shuffle on a coarse range bucket of
the order column. A constant default width silently degrades when the data
density shifts (BASELINE.md documents a 12× wall-time cliff when the span is
mis-sized): too wide → one bucket holds everything (hot-key parallelism
collapses), too narrow → |keys| × |buckets| summaries blow the merge budget.
This helper derives the width from the OBSERVED distribution: one cheap
pre-pass over the single order column builds per-batch t-digest partials
(``functions.sketches.TDigest``), the driver merges them (one small blob per
batch) and sizes

    width = (p99 − p01) / target_buckets

— the interquantile span is robust to outliers that would stretch a min/max
range (one stray epoch-0 timestamp must not collapse the real data into a
single bucket). Returns the width types the operators accept: a float for
numeric order columns, a ``pd.Timedelta`` for datetimes.

At 10^12 rows this is a map-only scan of one narrow column with a
digest-sized exchange (nothing row-sized moves); the operators that call it
already make a full materializing pass over the same input, so the pre-pass
adds one streaming read, not a new shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import TDigest

# quantile pair used for the span: wide enough to see the real spread,
# clipped enough to shrug off point outliers
_Q_LO, _Q_HI = 0.01, 0.99


def _is_temporal(ds, order_col: str) -> bool:
    sch = ds.schema()
    if sch is None:
        return False
    try:
        t = sch.types[sch.names.index(order_col)]
    except ValueError:
        return False
    if isinstance(t, pa.DataType):
        return pa.types.is_timestamp(t) or pa.types.is_date(t)
    try:                       # pandas-backed block: numpy dtype / class
        return np.issubdtype(np.dtype(t), np.datetime64)
    except TypeError:
        return False


def calibrate_bucket_width(ds, order_col: str, *, target_buckets: int = 64):
    """Sampled-quantile bucket width for ``order_col`` (see module doc).

    Empty/constant columns degrade to width 1 (1 ns for datetimes) — a
    single bucket, which is also the only correct answer there."""
    temporal = _is_temporal(ds, order_col)

    def part(b: pa.Table) -> pa.Table:
        v = b[order_col].to_numpy(zero_copy_only=False)
        if v.dtype.kind == "M":
            v = v.astype("datetime64[ns]").astype(np.int64)
            v = v[v != np.iinfo(np.int64).min]   # NaT, not a real epoch
        td = TDigest()
        td.add(v.astype(np.float64))
        return pa.table({"d": pa.array([td.dumps()], pa.binary())})

    merged = TDigest()
    for b in (ds.select_columns([order_col])
              .map_batches(part, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        for blob in b["d"].to_pylist():
            merged = merged.merge(TDigest.loads(blob))

    if merged.n == 0:
        return pd.Timedelta(1) if temporal else 1.0
    span = merged.quantile(_Q_HI) - merged.quantile(_Q_LO)
    if not np.isfinite(span) or span <= 0:
        span = merged._max - merged._min
    if not np.isfinite(span) or span <= 0:
        return pd.Timedelta(1) if temporal else 1.0   # constant column
    width = max(span / max(target_buckets, 1), 1e-9)
    if temporal:
        return pd.Timedelta(max(int(width), 1))
    return float(width)


def resolve_bucket_width(ds, order_col: str, bucket_width, *,
                         target_buckets: int = 64):
    """Pass-through unless ``bucket_width == "auto"`` (the operators'
    default), in which case calibrate from the data."""
    if isinstance(bucket_width, str) and bucket_width == "auto":
        return calibrate_bucket_width(ds, order_col,
                                      target_buckets=target_buckets)
    return bucket_width
