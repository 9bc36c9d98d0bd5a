"""JSONL / CSV ingestion for the engine (source-format breadth).

The reference consumes schema'd records regardless of carrier
(`validator.Validate` takes decoded values); at cluster scale raw
corpora commonly arrive as JSON-lines or CSV shards long before anyone
converts them to Parquet, so the engine exposes both through Ray Data's
native distributed readers (`read_json` / `read_csv` stream per file —
many shards ⟹ many blocks, no driver funnel).

The ``*_cached`` converters below exist for TESTS AND THE ORACLE GATE
only: they derive a deterministic JSONL/CSV copy of a parquet fixture
under /tmp (content-keyed by path/size/mtime, rewritten only when the
fixture changes) so gate queries can prove the ingestion path is
byte-faithful against the same SQL oracle. Production pipelines read
pre-existing JSONL/CSV; nothing here converts at scale.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def read_jsonl(path, **kwargs):
    """Distributed JSON-lines read (thin wrapper; one block per file /
    piece, streamed — the Ray-native path for raw text corpora)."""
    import ray.data as rd

    return rd.read_json(path, **kwargs)


def read_csv(path, **kwargs):
    """Distributed CSV read (thin wrapper over ``ray.data.read_csv``)."""
    import ray.data as rd

    return rd.read_csv(path, **kwargs)


def _cache_dir(tag: str, src_path: str) -> tuple[str, bool]:
    st = os.stat(src_path)
    key = hashlib.blake2s(
        f"{tag}-{src_path}-{st.st_size}-{int(st.st_mtime)}".encode(),
        digest_size=10).hexdigest()
    d = os.path.join("/tmp", "svr_textio", key)
    done = os.path.join(d, "_DONE")
    return d, os.path.exists(done)


def jsonl_from_parquet_cached(parquet_path: str, columns: list[str]) -> str:
    """Deterministic JSONL copy of selected parquet columns (test
    plumbing — see module docstring). Returns the .jsonl file path."""
    d, done = _cache_dir("jsonl-" + "-".join(columns), parquet_path)
    out = os.path.join(d, "data.jsonl")
    if done:
        return out
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(parquet_path, columns=columns)
    tmp = out + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row, ensure_ascii=False,
                               separators=(",", ":")) + "\n")
    os.replace(tmp, out)
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")
    return out


def csv_from_parquet_cached(parquet_path: str, columns: list[str],
                            transform=None, tag: str = "") -> str:
    """Deterministic CSV copy of selected parquet columns (test plumbing
    — see module docstring). ``transform`` may map the Arrow table first
    (e.g. to integer cents so the CSV carries no float round-trip risk);
    pass a distinct ``tag`` per transform so cache keys don't collide.
    Returns the .csv file path."""
    import pyarrow.csv as pcsv

    d, done = _cache_dir("csv-" + tag + "-" + "-".join(columns),
                         parquet_path)
    out = os.path.join(d, "data.csv")
    if done:
        return out
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(parquet_path, columns=columns)
    if transform is not None:
        t = transform(t)
    tmp = out + ".tmp"
    pcsv.write_csv(t, tmp)
    os.replace(tmp, out)
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")
    return out
