"""Engine verdict/annotate modes + skew-boundedness evidence for the
uniqueness shuffle (the pre-batch combine IS the salting: shuffle rows per key
are bounded by the number of batches, not by the key's row count)."""

import numpy as np
import pyarrow as pa
import pytest


def test_verdict_mode_partitioned(ray_session):
    import ray.data as rd

    from schema_validator_ray.engine import validate

    tbl = pa.table({
        "id": pa.array([f"r{i}" for i in range(100)]),
        "grp": pa.array(["a"] * 50 + ["b"] * 50),
        "v": pa.array([i % 10 for i in range(100)], pa.int64()),
    })
    res = validate(rd.from_arrow(tbl), {"v": "min=3"}, id_column="id",
                   partition_column="grp")
    verdicts = res["verdicts"].to_pandas().set_index("partition")
    # per group: i%10 in 0..9, 30% < 3 -> 15 failed of 50
    assert verdicts.loc["a", "rows"] == 50
    assert verdicts.loc["a", "failed_rows"] == 15
    assert verdicts.loc["b", "failed_rows"] == 15
    assert verdicts.loc["a", "violations"] == 15  # per-partition counts real
    assert verdicts.loc["b", "violations"] == 15
    viol = res["violations"].to_pandas()
    assert len(viol) == 30
    # fused and unfused paths agree
    from schema_validator_ray.engine import validate as _validate

    res2 = _validate(rd.from_arrow(tbl), {"v": "min=3"}, id_column="id",
                     partition_column="grp", fused=False)
    v2 = res2["verdicts"].to_pandas().set_index("partition")
    assert v2.loc["a", "failed_rows"] == 15
    assert v2.loc["a", "violations"] == 15


def test_annotate_mode(ray_session):
    import ray.data as rd

    from schema_validator_ray.engine import RuleStage

    tbl = pa.table({"v": pa.array([1, 5, 0], pa.int64())})
    out = (rd.from_arrow(tbl)
           .map_batches(RuleStage({"v": "min=2"}, mode="annotate"),
                        batch_format="pyarrow")
           .to_pandas())
    assert list(out["_valid"]) == [False, True, False]


def test_uniqueness_shuffle_rows_bounded_under_skew(ray_session):
    """200k rows where ONE key holds 50% of rows: the per-batch combiner must
    emit at most (distinct keys per batch) rows — i.e. the hot key contributes
    one row per batch to the shuffle, never 100k."""
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import (
        _PartialCounts,
        duplicate_keys,
    )

    n = 200_000
    rng = np.random.default_rng(0)
    hot = rng.random(n) < 0.5
    keys = np.where(hot, -1, np.arange(n)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(10)

    partials = ds.map_batches(_PartialCounts("k"), batch_format="pyarrow",
                              batch_size=20_000)
    shuffle_rows = partials.count()
    # ~100k distinct cold keys + <=1 hot-key row per batch (~10-ish batches)
    distinct_cold = int((~hot).sum())
    assert shuffle_rows <= distinct_cold + 32
    # and the duplicate detection is still exact
    dups = duplicate_keys(ds, "k").to_pandas()
    assert len(dups) == 1 and dups.k.iloc[0] == -1
    assert dups.dup_count.iloc[0] == int(hot.sum())


def test_compile_error_surfaces_as_job_error(ray_session):
    """The abort channel through Ray: a spec that cannot compile for the
    column type fails the job loudly (never silently recorded as violations)."""
    import pytest
    import ray.data as rd

    from schema_validator_ray.engine import RuleStage

    tbl = pa.table({"flag": pa.array([True, False])})
    ds = rd.from_arrow(tbl).map_batches(
        RuleStage({"flag": "min=3"}), batch_format="pyarrow")
    with pytest.raises(Exception):
        ds.count()


def test_actor_pool_mode(ray_session):
    """concurrency=N runs RuleStage as an actor pool (compile once per actor)
    with identical results to task mode."""
    import ray.data as rd

    from schema_validator_ray.engine import validate

    tbl = pa.table({"id": pa.array([f"r{i}" for i in range(500)]),
                    "v": pa.array([i % 7 for i in range(500)], pa.int64())})
    ds = rd.from_arrow(tbl)
    task = validate(ds, {"v": "min=2"}, id_column="id")["violations"].to_pandas()
    actor = validate(ds, {"v": "min=2"}, id_column="id",
                     concurrency=2)["violations"].to_pandas()
    key = ["id", "rule_id"]
    assert (task.sort_values(key).reset_index(drop=True)[key]
            .equals(actor.sort_values(key).reset_index(drop=True)[key]))


def test_null_keys_do_not_crash_uniqueness(ray_session):
    """Null keys are dropped from duplicate counting (they are `required`'s
    business) and never crash the broadcast set construction."""
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import (
        duplicate_keys,
        uniqueness_violations,
    )

    tbl = pa.table({
        "id": pa.array([f"r{i}" for i in range(8)]),
        "k": pa.array(["a", "a", None, None, None, "b", "c", None]),
    })
    ds = rd.from_arrow(tbl)
    dups = duplicate_keys(ds, "k").to_pandas()
    assert set(dups.k) == {"a"}          # nulls are not duplicates
    v = uniqueness_violations(ds, "k", id_column="id").to_pandas()
    assert sorted(v.id) == ["r0", "r1"]


def test_null_keys_referential(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.referential import referential_violations

    main = rd.from_arrow(pa.table({"k": pa.array(["x", "y", None])}))
    side = pa.table({"k": pa.array(["x", None])})
    out = referential_violations(main, side, "k").to_pandas()
    # y missing; null key has no match either -> flagged
    assert sorted(out.k.fillna("<null>")) == ["<null>", "y"]


def test_eqfield_type_mismatch_rejected_at_compile(ray_session):
    import pytest

    from schema_validator_ray import CompileError, compile_ruleset

    tbl = pa.table({"w": pa.array([1], pa.int64()), "fmt": pa.array(["png"])})
    with pytest.raises(CompileError):
        compile_ruleset({"w": "eqfield=fmt"}, tbl.schema)
    with pytest.raises(CompileError):
        compile_ruleset({"w": "eqfield=missing_col"}, tbl.schema)


def test_datetime_range_check_batch_independent():
    """A non-datetime row in the batch must not disable range checks for
    other rows (fixed: range check runs on the shape-matching subset)."""
    from schema_validator_ray import compile_ruleset

    tbl = pa.table({"d": pa.array(["hello", "2024-13-41 25:70:99",
                                   "2024-01-15 10:30:00", None])})
    cs = compile_ruleset({"d": "datetime"}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    assert list(pm) == [False, False, True, False]


def test_binary_views_large_binary():
    from schema_validator_ray.stages.images import _binary_views

    arr = pa.array([b"abc", None, b"defg"], pa.large_binary())
    views = _binary_views(arr)
    assert bytes(views[0]) == b"abc" and views[1] is None
    assert bytes(views[2]) == b"defg"


def test_uniqueness_join_fallback_matches_broadcast(ray_session):
    """Forcing the hash-partitioned semi-join path (tiny broadcast budget)
    yields the identical violation multiset as the broadcast default."""
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import uniqueness_violations

    df = pd.DataFrame({
        "id": [str(i) for i in range(400)],
        "k": [i % 150 for i in range(400)],   # 100 keys duplicated
    })
    ds = rd.from_pandas(df).repartition(5)

    def rows(out):
        return sorted(map(tuple, out.to_pandas().itertuples(index=False)))

    broad = rows(uniqueness_violations(ds, "k", id_column="id"))
    joined = rows(uniqueness_violations(ds, "k", id_column="id",
                                        max_broadcast_keys=5))
    assert joined == broad and len(broad) > 0
