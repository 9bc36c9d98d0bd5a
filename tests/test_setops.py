"""Distributed INTERSECT / EXCEPT: DuckDB parity, composite keys, hot keys
(the tagged-distinct shape must ship one row per batch per distinct tuple)."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from schema_validator_ray.stages.setops import (except_distinct,
                                                intersect_distinct)


def _mk(seed, n, n_keys):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"k": rng.integers(0, n_keys, n).astype(np.int64),
                         "g": rng.integers(0, 4, n).astype(np.int64)})


@pytest.mark.parametrize("op,sql", [("intersect", "INTERSECT"),
                                    ("except", "EXCEPT")])
def test_setops_single_key_matches_sql(ray_session, op, sql):
    import ray.data as rd
    la, rb = _mk(1, 3000, 120), _mk(2, 3000, 80)   # EXCEPT keeps 80..119
    fn = intersect_distinct if op == "intersect" else except_distinct
    out = (fn(rd.from_pandas(la).repartition(7),
              rd.from_pandas(rb).repartition(5), "k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql(
        f"SELECT k FROM la {sql} SELECT k FROM rb ORDER BY k").df()
    assert out["k"].tolist() == exp["k"].tolist()


def test_setops_composite_key_hot(ray_session):
    """90%-hot composite tuple on both sides: result still exact, and the
    hot tuple appears once (DISTINCT semantics)."""
    import ray.data as rd
    rng = np.random.default_rng(3)
    n = 20000

    def skewed(seed):
        r = np.random.default_rng(seed)
        k = np.where(r.random(n) < 0.9, 5, r.integers(0, 40, n))
        g = np.where(r.random(n) < 0.9, 1, r.integers(0, 6, n))
        return pd.DataFrame({"k": k.astype(np.int64),
                             "g": g.astype(np.int64)})

    la, rb = skewed(4), skewed(9)
    out = (intersect_distinct(rd.from_pandas(la).repartition(16),
                              rd.from_pandas(rb).repartition(16),
                              ["k", "g"])
           .to_pandas().sort_values(["k", "g"]).reset_index(drop=True))
    exp = duckdb.sql("""SELECT k, g FROM la INTERSECT SELECT k, g FROM rb
                        ORDER BY k, g""").df()
    assert out.values.tolist() == exp.values.tolist()
    assert len(out[(out.k == 5) & (out.g == 1)]) == 1


def test_except_empty_right(ray_session):
    """EXCEPT with an empty right side = DISTINCT of the left."""
    import ray.data as rd
    la = _mk(7, 500, 30)
    rb = la.head(0)
    out = (except_distinct(rd.from_pandas(la), rd.from_pandas(rb), "k")
           .to_pandas())
    assert sorted(out["k"].tolist()) == sorted(la["k"].unique().tolist())


@pytest.mark.parametrize("op,sql", [("intersect", "INTERSECT"),
                                    ("except", "EXCEPT")])
def test_set_op_same_source_matches_two_scan(ray_session, op, sql):
    """Fused single-scan path == two-scan path == SQL, including the
    over-budget distributed fallback (driver_merge_max=1)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from schema_validator_ray.stages.setops import set_op_same_source

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 150, n).astype(np.int64),
        "g": rng.integers(0, 4, n).astype(np.int64),
        "side": rng.choice(["a", "b", "c"], n)})
    exp = duckdb.sql(
        f"""SELECT k, g FROM df WHERE side = 'a'
            {sql} SELECT k, g FROM df WHERE side = 'b'
            ORDER BY k, g""").df()
    for budget in (5_000_000, 1):
        out = (set_op_same_source(
                   rd.from_pandas(df).repartition(9), ["k", "g"],
                   lambda b: pc.equal(b["side"], "a"),
                   lambda b: pc.equal(b["side"], "b"),
                   op, driver_merge_max=budget)
               .to_pandas().sort_values(["k", "g"]).reset_index(drop=True))
        assert out.values.tolist() == exp.values.tolist(), budget


def test_semi_join_filter_complements_anti(ray_session):
    """semi(keys) ∪ anti(keys) == all rows; semi keeps exactly the matched
    ones (null keys never match, same as SQL EXISTS)."""
    import ray.data as rd

    from schema_validator_ray.stages.referential import semi_join_filter

    import pyarrow as pa

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5, None, 2], "x": range(7)})
    left["k"] = left["k"].astype("Int64")
    side = pa.table({"k": pa.array([2, 4, 9], pa.int64())})
    out = (semi_join_filter(rd.from_pandas(left), side, "k")
           .to_pandas().sort_values("x").reset_index(drop=True))
    assert out["x"].tolist() == [1, 3, 6]     # rows with k in {2, 4}
