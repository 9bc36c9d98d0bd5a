"""Metadata-clean parquet reads.

Pandas-written parquet files carry a ``b'pandas'`` schema-level metadata blob;
``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` on any schema with
metadata, which disables Ray Data's block-schema deduplication fast path and
spams "Failed to hash the schemas (for deduplication)" from every worker.
Stripping schema-level metadata at the read (field-level metadata is unaffected
and hashes fine) restores the fast path for the whole downstream pipeline.
"""

from __future__ import annotations

_BYTES_PER_BLOCK = 8 << 20


def read_parquet_clean(path, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with schema-level metadata stripped and a
    size-aware block count.

    Ray's default parallelism splits every read into ~2x-CPU blocks
    regardless of size; on the small single-row-group test tables that
    means 64 near-empty blocks whose fixed per-block/per-partition costs
    dominate each downstream sort-shuffle (a 100k-row groupby spent 3.4s
    of pure overhead at 32 CPUs). Capping blocks at ~8 MB of file bytes
    keeps one block per row-group-sized chunk on small inputs while real
    (multi-file, multi-GB) inputs keep their natural parallelism. Callers
    needing compute splits on small inputs pass ``override_num_blocks``
    or repartition explicitly."""
    import pyarrow.dataset as pads
    import ray.data as rd

    d = None
    if "schema" not in kwargs:
        d = pads.dataset(path)
        sch = d.schema
        if sch.metadata:
            sch = sch.remove_metadata()
            if columns:  # the schema override must match the projection
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
    if "override_num_blocks" not in kwargs:
        import os

        try:
            files = d.files if d is not None else pads.dataset(path).files
            total = sum(os.path.getsize(f) for f in files)
            import ray

            default = 2 * int(ray.cluster_resources().get("CPU", 16))
            # floor of 8 keeps cheap downstream stages parallel on small
            # inputs without the 2xCPU block explosion
            cap = max(min(8, default), total // _BYTES_PER_BLOCK)
            if cap < default:
                kwargs["override_num_blocks"] = int(cap)
        except (OSError, AttributeError):
            pass
    return rd.read_parquet(path, columns=columns, **kwargs)
