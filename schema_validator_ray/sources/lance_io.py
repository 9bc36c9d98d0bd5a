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
    the partition runner). For Lance datasets use :func:`scan_fragments`,
    which yields per-fragment readers instead of paths."""
    if HAVE_LANCE and is_lance_dataset(path):
        raise NotImplementedError(
            "Lance fragments are not filesystem paths — use scan_fragments() "
            "/ run_resumable_fragments() for Lance fragment-level resume")
    if os.path.isdir(path):
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if f.endswith(".parquet"))
    return [path]


class Fragment:
    """One resumable unit of an input table: a stable id, a content digest
    (manifest rows skip fragments whose digest is unchanged), and a
    column-pruned reader returning a ray Dataset.

    Parquet: one fragment per file; digest is size-mtime. Lance: one fragment
    per ``lance.dataset(path).get_fragments()`` entry; digest is
    (dataset version, fragment row count, data file names) — Lance fragments
    are immutable, so a rewrite surfaces as new file names/version."""

    def __init__(self, frag_id: str, source: str, digest: str, reader):
        self.frag_id = frag_id
        self.source = source
        self.digest = digest
        self._reader = reader

    def read(self, columns: list[str] | None = None, *,
             override_num_blocks: int | None = None):
        return self._reader(columns, override_num_blocks)


def scan_fragments(path: str) -> list[Fragment]:
    """Resume partitions of ``path`` (Lance dataset or parquet file/dir)."""
    if HAVE_LANCE and is_lance_dataset(path):
        import lance

        import ray.data as rd

        ds = lance.dataset(path)
        version = ds.version
        out = []
        for frag in ds.get_fragments():
            fid = frag.fragment_id
            files = ",".join(sorted(f.path() if callable(getattr(f, "path",
                                                                 None))
                                    else str(f.path)
                                    for f in frag.data_files()))
            digest = f"v{version}-r{frag.count_rows()}-{files}"

            def make_reader(fragment):
                def reader(columns, override_num_blocks):
                    tbl = fragment.to_table(columns=columns)
                    d = rd.from_arrow(tbl)
                    if override_num_blocks:
                        d = d.repartition(override_num_blocks)
                    return d
                return reader

            out.append(Fragment(f"frag-{fid:05d}", path, digest,
                                make_reader(frag)))
        return out

    from .pq_read import read_parquet_clean

    def make_pq_reader(p):
        def reader(columns, override_num_blocks):
            kw = {}
            if override_num_blocks:
                kw["override_num_blocks"] = override_num_blocks
            return read_parquet_clean(p, columns=columns, **kw)
        return reader

    out = []
    for i, p in enumerate(fragment_paths(path)):
        st = os.stat(p)
        out.append(Fragment(f"frag-{i:05d}", p,
                            f"{st.st_size}-{int(st.st_mtime)}",
                            make_pq_reader(p)))
    return out
