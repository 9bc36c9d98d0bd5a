"""Referential integrity check: every image row must have a matching row in the
captions side table (and optionally caption text equality).

The reference has no joins at all (SURVEY §2.7) — this is north-rule-new. Strategy:

- **Broadcast semi-join** (default): the key side is `ray.put` once and read once
  per actor/worker, then each batch filters against it — no shuffle at all. Right
  whenever the key set fits in worker memory (at 10^12 rows the captions *keys*
  would not; see below).
- **Bloom-filter broadcast** (`bloom_bits`): constant-size broadcast. Bloom
  membership has false positives, so "missing" determinations are SOUND (every
  row it flags is truly missing) but violations can be under-reported at the
  filter's false-positive rate — size ``bloom_bits`` ≈ 10 bits/key for <1% miss.
- Documented fallback for key sets beyond memory: bucket both sides by
  ``hash(key) % B`` and anti-join per bucket (the guide's partitioned hash join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

RULE_REFERENTIAL = "referential"


class _BloomFilter:
    """Simple double-hashing Bloom filter over stable 64-bit key hashes."""

    def __init__(self, n_bits: int, k: int = 4):
        self.n_bits = int(n_bits)
        self.k = k
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    @staticmethod
    def _hash2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h1 = keys * np.uint64(0x9E3779B97F4A7C15)
        h1 ^= h1 >> np.uint64(32)
        h2 = keys * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
        return h1, h2

    def _positions(self, keys: np.ndarray, i: int) -> np.ndarray:
        h1, h2 = self._hash2(keys)
        return (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)

    def add(self, keys: np.ndarray) -> None:
        for i in range(self.k):
            pos = self._positions(keys, i)
            np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        out = np.ones(len(keys), bool)
        for i in range(self.k):
            pos = self._positions(keys, i)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out


def _hash_keys(col: pa.Array) -> np.ndarray:
    """Stable 64-bit hashes of a key column (string or int)."""
    if pa.types.is_integer(col.type):
        # widen BEFORE filling: the null sentinel does not fit narrow ints
        v = (pc.cast(col, pa.int64()).fill_null(-(2 ** 63))
             .to_numpy(zero_copy_only=False).astype(np.uint64))
        v = v * np.uint64(0xFF51AFD7ED558CCD)
        v ^= v >> np.uint64(33)
        return v
    import hashlib

    vals = col.to_pylist()
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b((x or "").encode(), digest_size=8).digest(),
                        "little") for x in vals),
        dtype=np.uint64, count=len(vals))


class _AntiJoinStage:
    def __init__(self, key: str, keyset_ref, bloom_ref, rule_id: str):
        self.key = key
        self.keyset_ref = keyset_ref
        self.bloom_ref = bloom_ref
        self.rule_id = rule_id
        self._keys_arr = None
        self._bloom = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        col = batch[self.key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.bloom_ref is not None:
            if self._bloom is None:
                self._bloom = ray.get(self.bloom_ref)
            missing = ~self._bloom.contains(_hash_keys(col))
            if col.null_count:
                # null keys are always missing (keep parity with the exact
                # path; hashing would conflate null with "")
                missing |= pc.is_null(col).to_numpy(zero_copy_only=False)
        else:
            if self._keys_arr is None:
                # build the probe array ONCE per worker (nulls in the side
                # table are not matchable keys)
                vals = [v for v in ray.get(self.keyset_ref) if v is not None]
                self._keys_arr = pa.array(sorted(vals), type=col.type)
            mask = pc.is_in(col, value_set=self._keys_arr)
            missing = ~mask.fill_null(False).to_numpy(zero_copy_only=False)
        bad = batch.filter(pa.array(missing))
        return pa.table({
            self.key: pc.cast(bad[self.key], pa.string()),
            "rule_id": pa.array([self.rule_id] * bad.num_rows, pa.string()),
            "column": pa.array([self.key] * bad.num_rows, pa.string()),
            "offending_value": pc.cast(bad[self.key], pa.string()),
        })


def default_join_partitions(cap: int = 64) -> int:
    """Join partition count sized to the session: Ray's JoinOperator keeps one
    receiver actor per partition ALIVE CONCURRENTLY, so asking for more
    partitions than CPUs deadlocks the scheduler (observed: num_partitions=32
    on a 4-CPU session never completes). Clamp to the cluster CPU count."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus))


def referential_violations_shuffle(ds, side_ds, key: str, *,
                                   rule_id: str = RULE_REFERENTIAL,
                                   num_partitions: int | None = None):
    """Shuffle-based anti-join (``Dataset.join(join_type="left_anti")``) — the
    path for side tables too large to broadcast: both sides hash-partition on
    the key, no driver materialization of either side."""
    import pyarrow.compute as pc

    import ray.data as rd

    if num_partitions is None:
        num_partitions = default_join_partitions()

    if isinstance(side_ds, str):
        side_ds = rd.read_parquet(side_ds, columns=[key])
    elif isinstance(side_ds, pa.Table):
        side_ds = rd.from_arrow(side_ds.select([key]))
    else:
        side_ds = side_ds.select_columns([key])
    missing = ds.select_columns([key]).join(
        side_ds, join_type="left_anti", num_partitions=num_partitions,
        on=(key,))
    return missing.map_batches(
        lambda b: pa.table({
            key: pc.cast(b[key], pa.string()),
            "rule_id": pa.array([rule_id] * b.num_rows, pa.string()),
            "column": pa.array([key] * b.num_rows, pa.string()),
            "offending_value": pc.cast(b[key], pa.string()),
        }), batch_format="pyarrow")


def referential_violations(ds, side_ds, key: str, *,
                           rule_id: str = RULE_REFERENTIAL,
                           bloom_bits: int | None = None,
                           batch_size: int = 65536):
    """Anti-semi-join: rows of ``ds`` whose ``key`` has no match in ``side_ds``.

    ``side_ds`` may be a ray Dataset, a pyarrow Table, or a path readable by
    pyarrow. Only the key column of the side table is ever materialized.
    For key sides beyond broadcast budget use
    :func:`referential_violations_shuffle` (hash-partitioned anti-join).
    """
    import ray

    side_keys = _side_key_column(side_ds, key)
    if bloom_bits:
        bloom = _BloomFilter(bloom_bits)
        bloom.add(_hash_keys(side_keys))
        refs = (None, ray.put(bloom))
    else:
        refs = (ray.put(set(side_keys.to_pylist())), None)
    return ds.map_batches(
        _AntiJoinStage(key, refs[0], refs[1], rule_id),
        batch_format="pyarrow", batch_size=batch_size)


class _SemiJoinStage:
    def __init__(self, key: str, keyset_ref):
        self.key = key
        self.keyset_ref = keyset_ref
        self._keys_arr = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        col = batch[self.key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self._keys_arr is None:
            vals = [v for v in ray.get(self.keyset_ref) if v is not None]
            self._keys_arr = pa.array(sorted(vals), type=col.type)
        mask = pc.is_in(col, value_set=self._keys_arr).fill_null(False)
        return batch.filter(mask)


def semi_join_filter(ds, side_ds, key: str, *, side_key: str | None = None,
                     batch_size: int = 65536):
    """SEMI join (SQL ``EXISTS``): keep rows of ``ds`` whose ``key`` HAS a
    match in ``side_ds`` — the positive counterpart of
    :func:`referential_violations`. Exact broadcast set only (a Bloom filter
    is sound for the ANTI direction, where false positives merely re-check,
    but would wrongly KEEP rows here); beyond broadcast budget use
    ``Dataset.join`` with a distinct-keyed side."""
    import ray

    side_keys = _side_key_column(side_ds, side_key or key)
    ref = ray.put(set(side_keys.to_pylist()))
    return ds.map_batches(_SemiJoinStage(key, ref),
                          batch_format="pyarrow", batch_size=batch_size)


def side_key_count(side) -> int:
    """Row count of the side table WITHOUT materializing it: parquet footer
    metadata for paths, ``num_rows`` for in-memory tables, a distributed
    ``count()`` for Datasets. This is the cheap pre-flight that drives the
    broadcast / bloom / shuffle strategy choice."""
    if isinstance(side, pa.Table):
        return side.num_rows
    if isinstance(side, str):
        import pyarrow.dataset as pads

        return sum(f.count_rows() for f in pads.dataset(side).get_fragments())
    return side.count()


def bloom_from_side(side, key: str, n_bits: int,
                    batch_size: int = 1 << 16) -> "_BloomFilter":
    """Build the broadcastable Bloom filter by STREAMING the side keys — peak
    driver memory is the bit array plus one batch, never the full key column."""
    bloom = _BloomFilter(n_bits)
    if isinstance(side, pa.Table):
        it = [side.select([key])]
    elif isinstance(side, str):
        import pyarrow.dataset as pads

        it = pads.dataset(side).to_batches(columns=[key],
                                           batch_size=batch_size)
    else:
        it = side.select_columns([key]).iter_batches(batch_size=batch_size,
                                                     batch_format="pyarrow")
    for b in it:
        col = b[key] if not isinstance(b, pa.RecordBatch) else b.column(0)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col):
            bloom.add(_hash_keys(col))
    return bloom


def _side_key_column(side, key: str) -> pa.Array:
    if isinstance(side, pa.Table):
        col = side[key]
    elif isinstance(side, str):
        import pyarrow.dataset as pads

        col = pads.dataset(side).to_table(columns=[key])[key]
    else:  # ray Dataset — stream only the key column to the driver
        chunks = [b[key] for b in side.select_columns([key])
                  .iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
        col = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                                else c for c in chunks]) if chunks else pa.array([], pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def membership_rate_by_period(ds, side_ds, key: str, ts_col: str, *,
                              unit: str = "month",
                              rate_col: str = "flagged_rate"):
    """Per-time-bucket membership rate: for each ``unit``-truncated period
    of ``ts_col``, the fraction of rows whose ``key`` appears in
    ``side_ds``'s key column — the per-partition referential/quarantine
    verdict ("how many of this month's orders reference a flagged
    account"). The side's key column broadcasts once via ``ray.put`` as a
    SORTED array (searchsorted probe, no Python set); per-batch
    (period, n, n_flagged) partials bound the exchange at
    periods-per-batch; one tiny groupby-sum and an exact-int division
    finish. For beyond-broadcast sides, pre-filter with the
    shuffle/bloom referential paths and feed the survivor ids here."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    side_keys = _side_key_column(side_ds, key)
    sorted_keys = np.sort(side_keys.to_numpy(zero_copy_only=False))
    ref = ray.put(sorted_keys)

    def partial(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        period = pc.floor_temporal(ts, unit=unit)
        k = b[key].to_numpy(zero_copy_only=False)
        if len(keys):
            pos = np.searchsorted(keys, k)
            member = (pos < len(keys)) & (keys[np.minimum(
                pos, len(keys) - 1)] == k)
        else:
            member = np.zeros(len(k), bool)
        t = pa.table({"period": period,
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "flagged": pa.array(member.astype(np.int64))})
        agg = t.group_by("period").aggregate([("n", "sum"),
                                              ("flagged", "sum")])
        return pa.table({"period": agg["period"], "n": agg["n_sum"],
                         "flagged": agg["flagged_sum"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("period")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("flagged", alias_name="flagged")))
    return agg.map_batches(
        lambda b: pa.table({
            "period": b["period"],
            "n": pc.cast(b["n"], pa.int64()),
            "n_flagged": pc.cast(b["flagged"], pa.int64()),
            rate_col: pc.divide(pc.cast(b["flagged"], pa.float64()),
                                pc.cast(b["n"], pa.float64()))}),
        batch_format="pyarrow")
