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

**Sizing for 10^12 keys** — the recommended dedup configuration is
``hash_keys=True`` plus a spill directory: admission runs on the 64-bit
content hash (fixed-width, collision odds ~n²/2^65 — acceptable for
dedup, not for exact accounting), and each shard spills its in-memory set
to a SORTED int64 run file on disk whenever it crosses
``spill_threshold`` keys. Spilled runs are probed with an in-RAM Bloom
prefilter (16 bits/key ≈ 2 bytes of RAM per spilled key) followed by a
binary search over the memory-mapped run (the OS page cache manages
residency), so shard RAM is bounded by ``spill_threshold`` live keys +
the Bloom bitmaps regardless of how many keys were ever admitted. String
keys (``hash_keys=False``) keep the exact in-memory set and cannot
spill — exactness for the SQL oracle, RAM-bounded scale via the hash
path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sketches import hash_column

# Two independent Bloom probe mixers (splitmix64 / Murmur3 finalizer
# constants — public-domain integer hash constants).
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xFF51AFD7ED558CCD)


def _bloom_positions(keys_u64: np.ndarray, m_bits: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    mask = np.uint64(m_bits - 1)  # m_bits is a power of two
    h1 = keys_u64 * _MIX1
    h1 ^= h1 >> np.uint64(29)
    h2 = keys_u64 * _MIX2
    h2 ^= h2 >> np.uint64(32)
    return (h1 & mask), (h2 & mask)


class _SeenShardImpl:
    """One shard's admitted-key set (plain class; wrapped by ray.remote).

    With ``spill_dir`` set (int64 keys only): live keys accumulate in a
    python set; crossing ``spill_threshold`` flushes them as a sorted
    ``.npy`` run + an in-RAM Bloom bitmap. Membership = Bloom prefilter
    (no false negatives) → binary-search probe of the memory-mapped run.
    """

    def __init__(self, spill_dir: str | None = None,
                 spill_threshold: int | None = None):
        self._seen: set = set()
        self._spill_dir = spill_dir
        self._threshold = spill_threshold
        self._runs: list[tuple[str, int]] = []   # (path, n_keys)
        self._blooms: list[tuple[np.ndarray, int]] = []  # (bits, m_bits)
        if spill_dir:
            import os

            os.makedirs(spill_dir, exist_ok=True)

    # -- spill machinery ----------------------------------------------------
    def _spill(self) -> None:
        import os

        arr = np.fromiter(self._seen, np.int64, len(self._seen))
        arr.sort()
        path = os.path.join(self._spill_dir,
                            f"run-{len(self._runs):05d}.npy")
        np.save(path, arr)
        m_bits = 1 << max(14, int(np.ceil(np.log2(max(len(arr), 1) * 16))))
        bits = np.zeros(m_bits // 64, np.uint64)
        p1, p2 = _bloom_positions(arr.view(np.uint64), m_bits)
        for p in (p1, p2):
            np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (p & np.uint64(63)))
        self._runs.append((path, len(arr)))
        self._blooms.append((bits, m_bits))
        self._seen.clear()

    def _probe_runs(self, arr: np.ndarray) -> np.ndarray:
        """True where a key exists in any spilled run."""
        seen = np.zeros(len(arr), bool)
        u = arr.view(np.uint64)
        for (path, n), (bits, m_bits) in zip(self._runs, self._blooms):
            rest = ~seen
            if not rest.any():
                break
            p1, p2 = _bloom_positions(u[rest], m_bits)
            hit1 = (bits[(p1 >> np.uint64(6)).astype(np.int64)]
                    >> (p1 & np.uint64(63))) & np.uint64(1)
            hit2 = (bits[(p2 >> np.uint64(6)).astype(np.int64)]
                    >> (p2 & np.uint64(63))) & np.uint64(1)
            cand = np.flatnonzero(rest)[(hit1 & hit2).astype(bool)]
            if not len(cand):
                continue
            run = np.load(path, mmap_mode="r")
            pos = np.searchsorted(run, arr[cand])
            ok = pos < n
            ok[ok] &= run[pos[ok]] == arr[cand[ok]]
            seen[cand[ok]] = True
        return seen

    # -- admission -----------------------------------------------------------
    def check_and_add(self, keys: list) -> list:
        if self._spill_dir and keys:
            arr = np.asarray(keys, np.int64)
            spilled = self._probe_runs(arr)
        else:
            spilled = None
        seen = self._seen
        out = []
        for i, k in enumerate(keys):
            if (spilled is not None and spilled[i]) or k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        if (self._threshold and self._spill_dir
                and len(seen) >= self._threshold):
            self._spill()
        return out

    def size(self) -> int:
        return len(self._seen) + sum(n for _, n in self._runs)

    def snapshot(self) -> list:
        if not self._runs:
            return sorted(self._seen)
        parts = [np.load(p) for p, _ in self._runs]
        if self._seen:
            parts.append(np.fromiter(self._seen, np.int64,
                                     len(self._seen)))
        # runs are disjoint with each other and with the live set by
        # construction (admission always checks runs first), so a plain
        # merge needs no dedup; sort for a canonical snapshot
        return np.sort(np.concatenate(parts)).tolist()

    def restore(self, keys: list) -> int:
        self._seen.update(keys)
        if self._spill_dir and self._runs and self._seen:
            # restored keys may collide with existing runs; drop those so
            # runs and the live set stay mutually disjoint (snapshot
            # concatenates them without dedup)
            arr = np.fromiter(self._seen, np.int64, len(self._seen))
            dup = self._probe_runs(arr)
            if dup.any():
                self._seen = set(arr[~dup].tolist())
        if (self._threshold and self._spill_dir
                and len(self._seen) >= self._threshold):
            self._spill()
        return self.size()


class SeenKeyIndex:
    """Hash-sharded admitted-key index over ``n_shards`` Ray actors.

    For the dedup use at scale, construct with ``hash_keys=True`` and a
    ``spill_dir`` (see module docstring); the default keeps exact string
    keys fully in memory."""

    def __init__(self, n_shards: int = 16, *, hash_keys: bool = False,
                 spill_dir: str | None = None,
                 spill_threshold: int = 5_000_000):
        import os

        import ray

        if spill_dir and not hash_keys:
            raise ValueError(
                "spill_dir requires hash_keys=True: spilled runs are "
                "fixed-width int64 content hashes, not raw key strings")
        self.n_shards = n_shards
        self.hash_keys = hash_keys
        actor = ray.remote(num_cpus=0)(_SeenShardImpl)
        self._shards = [
            actor.remote(
                spill_dir=os.path.join(spill_dir, f"shard-{i:04d}")
                if spill_dir else None,
                spill_threshold=spill_threshold if spill_dir else None)
            for i in range(n_shards)]

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
        Consume the result fully (it mutates the index as it streams).

        Delivery is AT-MOST-ONCE per key, not per row attempt: admission
        mutates shared actor state from inside map tasks, so the stage
        runs with ``max_retries=0`` — a task retry (or re-iterating the
        returned dataset) would re-submit keys the first attempt already
        admitted and silently drop their rows. A worker crash therefore
        fails the run loudly instead; resume by restoring the last
        snapshot and re-running the input partition."""
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

        return ds.map_batches(stage, batch_format="pyarrow",
                              max_retries=0)

    def annotate_seen(self, ds, key_col: str, out_col: str = "_seen"):
        """Like :meth:`filter_unseen` but KEEPS every row, appending a
        boolean ``out_col`` — True where the key was already admitted
        (by a prior run's restored snapshot or an earlier batch). One
        admission pass: unseen keys are admitted as a side effect, so the
        seen/unseen split and the state update cost a single exchange.
        Same at-most-once contract as filter_unseen (max_retries=0)."""
        shards = self._shards
        n = self.n_shards
        hash_keys = self.hash_keys

        def stage(b: pa.Table) -> pa.Table:
            import ray

            if b.num_rows == 0:
                return b.append_column(out_col, pa.array([], pa.bool_()))
            col = b[key_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h = hash_column(col)
            sid = (h % np.uint64(n)).astype(np.int64)
            keys = h.view(np.int64).tolist() if hash_keys \
                else col.to_pylist()
            fresh = np.zeros(b.num_rows, bool)
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
                fresh[idx] = mask
            return b.append_column(out_col, pa.array(~fresh))

        return ds.map_batches(stage, batch_format="pyarrow",
                              max_retries=0)

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
