"""Skew-aware large-large joins: key salting.

A plain hash join sends every row of a hot key to ONE aggregator partition —
the classic straggler at web scale (one viral user id, one blank-image
phash). Salting splits the hot key's probe side across ``n_salts``
partitions and replicates the build side once per salt, turning a single
overloaded partition into ``n_salts`` even ones at the cost of a
``n_salts×`` copy of the (smaller) build side. Use when the build side is
too big to broadcast (`ray.put` membership in referential.py covers the
small case) but much smaller than the probe side.

The salt assignment is a per-batch round-robin — any distribution works
(the join result is salt-invariant, only the partition sizes change), and
round-robin is the one that's perfectly even WITHIN every hot key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_inner_join(left, right, *, left_on: str, right_on: str,
                      n_salts: int = 8, num_partitions: int | None = None):
    """INNER JOIN ``left`` (large, possibly hot-keyed) with ``right``
    (smaller, replicated ``n_salts``×) on ``left_on = right_on``. Result
    columns = left columns + right columns (salt dropped); row multiplicity
    matches a plain inner join (each build dup appears once per salt, and a
    probe row matches only its own salt's replica)."""
    from .referential import default_join_partitions

    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    nparts = num_partitions or default_join_partitions(8)

    def add_salt(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_salt", pa.array(np.arange(b.num_rows, dtype=np.int32)
                              % n_salts))

    def replicate(b: pa.Table) -> pa.Table:
        reps = [b.append_column("_salt",
                                pa.array(np.full(b.num_rows, s, np.int32)))
                for s in range(n_salts)]
        return pa.concat_tables(reps)

    l = left.map_batches(add_salt, batch_format="pyarrow")
    r = right.map_batches(replicate, batch_format="pyarrow")
    j = l.join(r, join_type="inner", num_partitions=nparts,
               on=(left_on, "_salt"), right_on=(right_on, "_salt"))
    return j.map_batches(lambda b: b.drop_columns(["_salt"]),
                         batch_format="pyarrow")
