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


# ---------------------------------------------------------------------------
# bucketed (co-partitioned) storage + bucket-local join — the 100-TB way to
# make a recurring large-large join SHUFFLE-FREE: pay one hash exchange at
# write time (or none, as here: bucket tagging is map-only and files land
# per bucket), then every later join of tables bucketed on the same key
# with the same n_buckets runs bucket-by-bucket with zero data movement.


def write_bucketed(ds, out_dir: str, key: str, n_buckets: int, *,
                   mode: str = "overwrite") -> str:
    """Tag each row with ``bucket = stable_hash(key) % n_buckets`` (the
    repo's deterministic avalanche/blake2b hash — consistent across runs,
    processes, and table sides) and write hive-partitioned by it. Rows of
    one key always land in one bucket directory regardless of which block
    wrote them. (The partition dir is ``bucket=N``, not ``_bucket=N`` —
    pyarrow dataset discovery silently ignores underscore-prefixed paths.)
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.sketches import hash_column

    def tag(b: pa.Table) -> pa.Table:
        if "bucket" in b.schema.names:
            raise ValueError("write_bucketed: input already has a "
                             "'bucket' column")
        col = b[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bkt = (hash_column(col) % np.uint64(n_buckets)).astype(np.int64)
        return b.append_column("bucket", pa.array(bkt))

    return write_partitioned(ds.map_batches(tag, batch_format="pyarrow"),
                             out_dir, "bucket", mode=mode)


class _BucketJoiner:
    """One task per bucket: read both sides' bucket directory, hash-join
    in-memory with Arrow. Nothing ever crosses tasks — co-partitioned
    storage IS the shuffle, amortized across every downstream join."""

    def __init__(self, left_dir, right_dir, key, columns_l, columns_r,
                 join_type, right_key=None):
        import pyarrow as pa
        import pyarrow.dataset as pads

        self.left_dir, self.right_dir = left_dir, right_dir
        self.key = key
        self.right_key = right_key or key
        self.join_type = join_type

        def plan(root, columns):
            sch = pads.dataset(root, format="parquet",
                               partitioning="hive").schema
            cols = columns or [n for n in sch.names if n != "bucket"]
            empty = pa.table({c: pa.array([], sch.field(c).type)
                              for c in cols})
            return cols, empty

        self.columns_l, self._empty_l = plan(left_dir, columns_l)
        self.columns_r, self._empty_r = plan(right_dir, columns_r)

    def _read(self, root, bucket, columns, empty):
        import os

        import pyarrow.dataset as pads

        p = os.path.join(root, f"bucket={bucket}")
        if not os.path.isdir(p):
            return empty
        return pads.dataset(p, format="parquet").to_table(columns=columns)

    def __call__(self, batch):
        import pyarrow as pa

        out = []
        for bucket in batch["bucket"].to_pylist():
            lt = self._read(self.left_dir, bucket, self.columns_l,
                            self._empty_l)
            rt = self._read(self.right_dir, bucket, self.columns_r,
                            self._empty_r)
            # SQL null semantics: null keys never MATCH, but an outer
            # side keeps its null-key rows unmatched — so only drop nulls
            # on sides that are inner under this join type
            if self.join_type in ("inner", "left outer", "left semi",
                                  "left anti"):
                rt = rt.filter(rt[self.right_key].is_valid())
            if self.join_type in ("inner", "right outer", "right semi",
                                  "right anti"):
                lt = lt.filter(lt[self.key].is_valid())
            out.append(lt.join(rt, keys=self.key,
                               right_keys=self.right_key,
                               join_type=self.join_type))
        return pa.concat_tables(out)


def bucket_join(left_dir: str, right_dir: str, key: str, *,
                n_buckets: int, right_key: str | None = None,
                columns_l: list[str] | None = None,
                columns_r: list[str] | None = None,
                join_type: str = "inner"):
    """Join two :func:`write_bucketed` tables (same ``key`` hash, same
    ``n_buckets``) bucket-by-bucket with NO shuffle: the driver fans out
    one task per bucket id; each task reads exactly its two bucket
    directories (column-pruned) and joins in memory. Returns a Dataset of
    the joined rows. Skew note: a hot key concentrates in one bucket —
    size ``n_buckets`` so the largest bucket's two sides fit a worker, or
    fall back to the salted shuffle join for that key."""
    import pyarrow as pa
    import ray.data as rd

    ids = rd.from_arrow(pa.table({"bucket": pa.array(
        list(range(n_buckets)), pa.int64())})).repartition(n_buckets)
    joiner = _BucketJoiner(left_dir, right_dir, key, columns_l, columns_r,
                           join_type, right_key=right_key)
    return ids.map_batches(joiner, batch_format="pyarrow", batch_size=1)
