"""Checkpoint manifest: resumable runs with per-partition lineage + metrics.

Layout (the guide's resumable-output pattern; Lance-backed at scale, parquet here):

    out_dir/
      manifest/part-<pid>-attempt<k>.parquet   # one row per completed partition
      violations/part-<pid>/...               # per-partition violation rows
      verdicts/part-<pid>.parquet             # per-partition verdict row

A partition = one input shard (file). Each partition's outputs are written to a
temp dir and renamed into place, THEN its manifest row is appended — so a crash
between the two leaves at worst a re-doable partition, never a half-counted one.
On resume, partitions whose manifest row says ``done`` with a matching input
digest are skipped. Manifest rows carry lineage (input path, row count, digest)
and metrics (rows, violations, wall seconds), per the north rule.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema([
    ("partition_id", pa.string()),
    ("input_path", pa.string()),
    ("input_digest", pa.string()),
    ("status", pa.string()),        # done | failed
    ("attempt", pa.int32()),
    ("rows", pa.int64()),
    ("failed_rows", pa.int64()),
    ("violations", pa.int64()),
    ("wall_seconds", pa.float64()),
    ("job_id", pa.string()),
    ("verdict", pa.string()),       # pass | fail (violations/drift verdict)
    ("drift_ok", pa.bool_()),
])


def _digest(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}-{int(st.st_mtime)}"


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def load(self) -> dict[str, dict]:
        """partition_id -> latest row (highest attempt)."""
        rows: dict[str, dict] = {}
        files = sorted(os.listdir(self.dir))
        for f in files:
            if not (f.startswith("part-") and f.endswith(".parquet")):
                continue
            t = pq.read_table(os.path.join(self.dir, f))
            for r in t.to_pylist():
                cur = rows.get(r["partition_id"])
                if cur is None or r["attempt"] >= cur["attempt"]:
                    rows[r["partition_id"]] = r
        return rows

    def done_partitions(self, inputs: dict[str, str]) -> set[str]:
        """Partitions recorded done whose input digest still matches."""
        return self.done_fragments({pid: _digest(p)
                                    for pid, p in inputs.items()})

    def done_fragments(self, digests: dict[str, str]) -> set[str]:
        """Partitions recorded done whose caller-provided digest matches —
        the digest source can be a file stat OR Lance fragment metadata."""
        done = set()
        for pid, row in self.load().items():
            if (row["status"] == "done" and pid in digests
                    and row["input_digest"] == digests[pid]):
                done.add(pid)
        return done

    def record(self, *, partition_id: str, input_path: str, status: str,
               attempt: int, rows: int, failed_rows: int, violations: int,
               wall_seconds: float, job_id: str,
               input_digest: str | None = None,
               verdict: str = "pass", drift_ok: bool = True) -> None:
        tbl = pa.table({
            "partition_id": [partition_id],
            "input_path": [input_path],
            "input_digest": [input_digest if input_digest is not None
                             else _digest(input_path)],
            "status": [status],
            "attempt": [attempt],
            "rows": [rows],
            "failed_rows": [failed_rows],
            "violations": [violations],
            "wall_seconds": [wall_seconds],
            "job_id": [job_id],
            "verdict": [verdict],
            "drift_ok": [drift_ok],
        }, schema=MANIFEST_SCHEMA)
        # tmp name must NOT end in .parquet: a crash between write and rename
        # would otherwise leave a truncated file that load() picks up forever
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(
            self.dir, f"part-{partition_id}-attempt{attempt}.parquet"))

    def next_attempt(self, partition_id: str) -> int:
        row = self.load().get(partition_id)
        return 1 if row is None else row["attempt"] + 1


def atomic_output_dir(out_dir: str, sub: str, partition_id: str):
    """Context-manager-ish pair: returns (tmp_path, final_path); caller writes to
    tmp then calls ``promote``."""
    final = os.path.join(out_dir, sub, f"part-{partition_id}")
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    return tmp, final


def promote(tmp: str, final: str) -> None:
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
