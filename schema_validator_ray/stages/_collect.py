"""Shared driver-side collect-under-budget primitive.

Several operators use the same fast path: stream narrow PRE-AGGREGATED
partials to the driver and finish there when they fit a row budget, falling
back to (or erroring toward) a distributed merge when they don't. The loop
is subtle enough to keep in one place — each former copy re-decided batch
format, empty handling, and over-budget behavior slightly differently.
"""

from __future__ import annotations


def collect_up_to(ds, max_rows: int, *, batch_format: str = "pyarrow"):
    """Stream ``ds``'s batches to the driver until ``max_rows`` is exceeded.

    Returns ``(parts, over)``: the list of batches read so far (pyarrow
    Tables or pandas DataFrames per ``batch_format``) and whether the budget
    was blown mid-stream. When ``over`` is True the stream was abandoned
    early — the caller must recompute (or reuse a materialized dataset) for
    its distributed fallback, never reuse ``parts``."""
    parts, total = [], 0
    for b in ds.iter_batches(batch_format=batch_format, batch_size=None):
        n = b.num_rows if batch_format == "pyarrow" else len(b)
        if n:
            parts.append(b)
            total += n
        if total > max_rows:
            return parts, True
    return parts, False
