"""Streaming seen-key index: within-run dedup, cross-dataset state,
snapshot/restore resume, hashed-key mode, concurrency survivor-set."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(keys, start=0):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "id": np.arange(start, start + len(keys), dtype=np.int64),
        "k": keys}))


def test_within_run_distinct_survivors(ray_session):
    from schema_validator_ray.state.seen_index import SeenKeyIndex

    keys = [f"k{i % 7}" for i in range(100)]
    idx = SeenKeyIndex(n_shards=4)
    out = idx.filter_unseen(_mk(keys).repartition(8), "k").to_pandas()
    # survivor ROWS are first-arrival (non-deterministic); the survivor
    # KEY SET is exactly the distinct set, one row each
    assert sorted(out["k"]) == sorted(set(keys))
    assert idx.size() == 7


def test_cross_dataset_state(ray_session):
    from schema_validator_ray.state.seen_index import SeenKeyIndex

    idx = SeenKeyIndex(n_shards=3)
    first = idx.filter_unseen(_mk(["a", "b", "c"]), "k").to_pandas()
    assert set(first["k"]) == {"a", "b", "c"}
    second = idx.filter_unseen(
        _mk(["b", "c", "d", "d"], start=10), "k").to_pandas()
    assert sorted(second["k"]) == ["d"]
    assert idx.size() == 4


def test_snapshot_restore_roundtrip(ray_session, tmp_path):
    from schema_validator_ray.state.seen_index import SeenKeyIndex

    idx = SeenKeyIndex(n_shards=4)
    idx.filter_unseen(_mk(["x", "y", "z"]), "k").materialize()
    p = str(tmp_path / "seen")
    assert idx.snapshot_to(p) == 3

    # a fresh index with a DIFFERENT shard count resumes where we left off
    idx2 = SeenKeyIndex(n_shards=2)
    assert idx2.restore_from(p) == 3
    out = idx2.filter_unseen(_mk(["y", "w", "z", "v"]), "k").to_pandas()
    assert sorted(out["k"]) == ["v", "w"]


def test_hashed_key_mode_int_column(ray_session, tmp_path):
    from schema_validator_ray.state.seen_index import SeenKeyIndex

    ids = [1, 2, 2, 3, 1, 4]
    idx = SeenKeyIndex(n_shards=4, hash_keys=True)
    out = idx.filter_unseen(_mk(ids), "k").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3, 4]
    p = str(tmp_path / "seenh")
    idx.snapshot_to(p)
    idx2 = SeenKeyIndex(n_shards=4, hash_keys=True)
    idx2.restore_from(p)
    assert idx2.filter_unseen(_mk([2, 4, 5]), "k").to_pandas()[
        "k"].tolist() == [5]


def test_null_and_empty_keys(ray_session):
    from schema_validator_ray.state.seen_index import SeenKeyIndex

    idx = SeenKeyIndex(n_shards=2)
    out = idx.filter_unseen(_mk([None, "", None, ""]), "k").to_pandas()
    # value-key mode: None and '' are DISTINCT keys (only the shard
    # routing hash coalesces them onto the same actor); each admits once
    assert len(out) == 2
    assert set(out["k"].map(lambda x: x if isinstance(x, str) else None)) \
        == {None, ""}


def test_spill_requires_hash_keys(ray_session, tmp_path):
    import pytest

    from schema_validator_ray.state.seen_index import SeenKeyIndex

    with pytest.raises(ValueError, match="hash_keys"):
        SeenKeyIndex(n_shards=2, spill_dir=str(tmp_path / "sp"))


def test_spill_survivor_set_exact_and_snapshot_roundtrip(
        ray_session, tmp_path):
    """Admit >10x the spill threshold: the survivor key set must equal the
    distinct set exactly, spilled runs must actually exist on disk, and a
    snapshot -> restore into a FRESH spilling index must filter an
    overlapping second feed byte-identically (round-4 verdict ask #6)."""
    import glob

    from schema_validator_ray.state.seen_index import SeenKeyIndex

    rng = np.random.default_rng(3)
    # 12,000 key ids over a 3,000-distinct space, threshold 100 per shard
    raw = rng.integers(0, 3000, 12_000)
    keys = [f"key-{v}" for v in raw]
    idx = SeenKeyIndex(n_shards=4, hash_keys=True,
                       spill_dir=str(tmp_path / "spill"),
                       spill_threshold=100)
    out = idx.filter_unseen(_mk(keys), "k").to_pandas()
    assert sorted(out["k"].unique()) == sorted(set(keys))
    assert len(out) == len(set(keys))
    assert idx.size() == len(set(keys))
    runs = glob.glob(str(tmp_path / "spill" / "shard-*" / "run-*.npy"))
    assert runs, "threshold 100 over ~750 keys/shard must have spilled"

    snap = str(tmp_path / "snap")
    total = idx.snapshot_to(snap)
    assert total == len(set(keys))

    idx2 = SeenKeyIndex(n_shards=4, hash_keys=True,
                        spill_dir=str(tmp_path / "spill2"),
                        spill_threshold=100)
    assert idx2.restore_from(snap) == len(set(keys))
    # second feed: half overlapping, half new -> only the new half survives
    raw2 = np.concatenate([rng.choice(raw, 500, replace=False),
                           np.arange(10_000, 10_500)])
    keys2 = [f"key-{v}" for v in raw2]
    out2 = idx2.filter_unseen(_mk(keys2), "k").to_pandas()
    assert sorted(out2["k"]) == sorted(f"key-{v}"
                                       for v in range(10_000, 10_500))
    # the restored index's snapshot stays canonical (sorted, no dups)
    snap2 = str(tmp_path / "snap2")
    assert idx2.snapshot_to(snap2) == len(set(keys)) + 500
