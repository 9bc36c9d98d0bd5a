"""Partitioned parquet sinks — the resumable-output shape for 100 TB runs.

``write_partitioned`` writes one hive-style directory per key value
(``out/<col>=<value>/*.parquet``) via Ray's native ``write_parquet``
partitioning: each block writes its own files (no extra shuffle), a failed
run re-writes only the partitions its manifest has not committed, and
downstream readers prune partitions with the standard hive filters
(``read_parquet(out, columns=..., filter=...)``).
"""

from __future__ import annotations

import os


def write_partitioned(ds, out_dir: str, by: str | list[str], *,
                      mode: str = "overwrite") -> str:
    """Write ``ds`` as hive-partitioned parquet under ``out_dir``.

    ``by`` is one column name or a list (nesting order = list order). No
    shuffle is added: rows of the same key written by different blocks land
    as separate files in the same partition directory, which parquet readers
    merge transparently — at scale, repartition on the key first only if a
    file-per-block explosion matters for the target filesystem."""
    cols = [by] if isinstance(by, str) else list(by)
    ds.write_parquet(out_dir, partition_cols=cols, mode=mode)
    return out_dir


def read_partitioned(path: str, columns: list[str] | None = None, **kw):
    """Read a hive-partitioned directory back (partition columns restored).

    Goes through pyarrow's dataset reader (Ray's read_parquet) so partition
    filters prune directories before any byte is read."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kw)


def list_partitions(path: str, col: str) -> list[str]:
    """Partition values present on disk (directory listing, no data read)."""
    pre = f"{col}="
    return sorted(d[len(pre):] for d in os.listdir(path)
                  if d.startswith(pre)
                  and os.path.isdir(os.path.join(path, d)))
