"""Shared mutable seen-key index — STREAMING dedup state.

The one operator family here that genuinely cannot be a Dataset transform:
"have I ever admitted this key, in THIS run or any previous one?" needs a
mutable set that every concurrently-running map task consults and updates
atomically. That is the raw-actor escape hatch the Ray-Data-first design
reserves for shared mutable state — everything else in this repo is a
`map_batches`/`groupby` composition.

Design (no analogue in the reference — weilence/schema-validator is a
stateless per-record rule engine):

- the key space is hash-partitioned over ``n_shards`` actors
  (:func:`functions.sketches.hash_column` — deterministic blake2b/avalanche,
  never python's process-salted ``hash()``), so admission checks scale out
  and no single actor serializes the stream;
- ``check_and_add`` is atomic per shard (actors process calls one at a
  time): when two in-flight batches carry the same new key, exactly ONE
  wins — the survivor row is first-arrival (non-deterministic), the
  survivor KEY SET is exactly the distinct set (deterministic, and what
  the SQL oracle checks);
- each map task groups its batch's keys per shard and issues one call per
  shard (vectorized routing; no per-key RPC);
- ``snapshot``/``restore`` persist the admitted-key sets to parquet so an
  ingest pipeline resumes dedup across RUNS (the manifest story's
  companion: re-running a partially-ingested feed admits only keys no
  earlier run admitted).

At 10^12 keys the admitted set itself is sharded state sized by the
DISTINCT count; key payloads should be fixed-width content hashes (the
``precomputed uint64`` path), not raw strings — pass ``hash_keys=True`` to
admit on the 64-bit content hash instead of the key value (collision odds
~n²/2^65; acceptable for dedup, not for exact accounting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sketches import hash_column


class _SeenShardImpl:
    """One shard's admitted-key set (plain class; wrapped by ray.remote)."""

    def __init__(self):
        self._seen: set = set()

    def check_and_add(self, keys: list) -> list:
        seen = self._seen
        out = []
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)

    def snapshot(self) -> list:
        return sorted(self._seen)

    def restore(self, keys: list) -> int:
        self._seen.update(keys)
        return len(self._seen)


class SeenKeyIndex:
    """Hash-sharded admitted-key index over ``n_shards`` Ray actors."""

    def __init__(self, n_shards: int = 16, *, hash_keys: bool = False):
        import ray

        self.n_shards = n_shards
        self.hash_keys = hash_keys
        actor = ray.remote(num_cpus=0)(_SeenShardImpl)
        self._shards = [actor.remote() for _ in range(n_shards)]

    # -- routing ----------------------------------------------------------
    def _route(self, col) -> tuple[np.ndarray, list]:
        """(shard id per row, key payload per row)."""
        h = hash_column(col)
        sid = (h % np.uint64(self.n_shards)).astype(np.int64)
        if self.hash_keys:
            keys = h.view(np.int64).tolist()
        else:
            keys = col.to_pylist()
        return sid, keys

    # -- dataset stage -----------------------------------------------------
    def filter_unseen(self, ds, key_col: str):
        """Keep only rows whose ``key_col`` value has never been admitted —
        by this call, an earlier concurrent batch, a previous
        ``filter_unseen`` over another dataset, or a restored snapshot.
        Consume the result fully (it mutates the index as it streams)."""
        shards = self._shards
        n = self.n_shards
        hash_keys = self.hash_keys

        def stage(b: pa.Table) -> pa.Table:
            import ray

            if b.num_rows == 0:
                return b
            col = b[key_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h = hash_column(col)
            sid = (h % np.uint64(n)).astype(np.int64)
            keys = h.view(np.int64).tolist() if hash_keys \
                else col.to_pylist()
            keep = np.zeros(b.num_rows, bool)
            order = np.argsort(sid, kind="stable")
            bounds = np.searchsorted(sid[order], np.arange(n + 1))
            refs, spans = [], []
            for s in range(n):
                lo, hi = bounds[s], bounds[s + 1]
                if lo == hi:
                    continue
                idx = order[lo:hi]
                refs.append(shards[s].check_and_add.remote(
                    [keys[i] for i in idx]))
                spans.append(idx)
            for idx, mask in zip(spans, ray.get(refs)):
                keep[idx] = mask
            return b.filter(pa.array(keep))

        return ds.map_batches(stage, batch_format="pyarrow")

    # -- lifecycle ---------------------------------------------------------
    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self._shards]))

    def snapshot_to(self, path: str) -> int:
        """Persist the admitted sets as one parquet file per shard."""
        import os

        import pyarrow.parquet as pq
        import ray

        os.makedirs(path, exist_ok=True)
        total = 0
        for i, keys in enumerate(
                ray.get([s.snapshot.remote() for s in self._shards])):
            t = pa.table({"key": pa.array(keys)}) if keys else \
                pa.table({"key": pa.array([], pa.int64() if self.hash_keys
                                          else pa.string())})
            pq.write_table(t, os.path.join(path, f"shard-{i:04d}.parquet"))
            total += len(keys)
        return total

    def restore_from(self, path: str) -> int:
        """Re-admit a snapshot's keys (routing re-derives shard ids, so
        ``n_shards`` may differ from the snapshot's)."""
        import glob
        import os

        import pyarrow.parquet as pq
        import ray

        files = sorted(glob.glob(os.path.join(path, "shard-*.parquet")))
        refs = []
        for f in files:
            col = pq.read_table(f)["key"]
            if len(col) == 0:
                continue
            if self.hash_keys:
                # snapshot holds the 64-bit key hashes themselves; the
                # live stage routes by (key-hash % n), so route the stored
                # hash directly — re-hashing it would scatter differently
                h = col.to_numpy(zero_copy_only=False).view(np.uint64)
                keys = col.to_pylist()
            else:
                h = hash_column(col.combine_chunks()
                                if isinstance(col, pa.ChunkedArray) else col)
                keys = col.to_pylist()
            sid = (h % np.uint64(self.n_shards)).astype(np.int64)
            for s in range(self.n_shards):
                ks = [k for k, x in zip(keys, sid) if x == s]
                if ks:
                    refs.append(self._shards[s].restore.remote(ks))
        ray.get(refs)
        return self.size()
