"""Lance table I/O — gated behind an import-try (the ``lance`` package is not in
this container; the ``input_hint`` names Lance as the canonical storage, so the
API surface is ready and falls back to sharded parquet transparently).

``read_images(path)`` returns a ray Dataset regardless of the underlying format;
``write_table(tbl, path)`` writes Lance when available, parquet otherwise.
"""

from __future__ import annotations

import os

try:
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def is_lance_dataset(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(path: str, columns: list[str] | None = None, *,
               override_num_blocks: int | None = None):
    """ray Dataset over a Lance dataset or a parquet file/directory."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    if HAVE_LANCE and is_lance_dataset(path):
        return rd.read_lance(path, columns=columns, **kwargs)
    from .pq_read import read_parquet_clean

    return read_parquet_clean(path, columns=columns, **kwargs)


def write_table(tbl, path: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if HAVE_LANCE:
        import lance

        lance.write_dataset(tbl, path)
        return path
    if not isinstance(tbl, pa.Table):
        tbl.write_parquet(path)  # ray Dataset
        return path
    pq.write_table(tbl, path if path.endswith(".parquet")
                   else path + ".parquet")
    return path


def fragment_paths(path: str) -> list[str]:
    """Input shards usable as resume partitions (filesystem paths readable by
    the partition runner). Lance fragment-level resume needs a lance-aware
    per-fragment reader which cannot be exercised in this container — raise
    loudly rather than hand fragment IDs to a parquet reader."""
    if HAVE_LANCE and is_lance_dataset(path):
        raise NotImplementedError(
            "Lance fragment-level resume is not wired: partition the dataset "
            "into per-fragment readers via lance.dataset(path).get_fragments() "
            "and a fragment-scan source before using run_resumable")
    if os.path.isdir(path):
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if f.endswith(".parquet"))
    return [path]
