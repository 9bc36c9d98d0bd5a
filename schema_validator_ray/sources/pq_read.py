"""Metadata-clean parquet reads.

Pandas-written parquet files carry a ``b'pandas'`` schema-level metadata blob;
``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` on any schema with
metadata, which disables Ray Data's block-schema deduplication fast path and
spams "Failed to hash the schemas (for deduplication)" from every worker.
Stripping schema-level metadata at the read (field-level metadata is unaffected
and hashes fine) restores the fast path for the whole downstream pipeline.
"""

from __future__ import annotations


def read_parquet_clean(path, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with schema-level metadata stripped."""
    import pyarrow.dataset as pads
    import ray.data as rd

    if "schema" not in kwargs:
        sch = pads.dataset(path).schema
        if sch.metadata:
            sch = sch.remove_metadata()
            if columns:  # the schema override must match the projection
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
    return rd.read_parquet(path, columns=columns, **kwargs)
