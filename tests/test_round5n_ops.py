"""Round-5 batch-21 operators: fixed-iteration k-core peeling, Theil-T
inequality index, max-activity-streak histogram, sequence conditional
entropy."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

T0 = 1_700_000_000_000_000
DAY = 86_400_000_000


def _entry():
    name = "_entry_n"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _edges(pairs):
    return rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))


def test_kcore_cycle_keeps_tail_peels(ray_session):
    from schema_validator_ray.stages.graph import kcore_on_edges

    # 4-cycle (the 2-core) with a pendant tail 4-5 and an isolated edge
    out = kcore_on_edges(
        _edges([(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (8, 9)]),
        "a", "b", k=2, iters=3)
    got = dict(zip(out["node"].to_pylist(), out["degree"].to_pylist()))
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_path_graph_fully_peels(ray_session):
    from schema_validator_ray.stages.graph import kcore_on_edges

    out = kcore_on_edges(_edges([(1, 2), (2, 3), (3, 4)]), "a", "b",
                         k=2, iters=3)
    assert out.num_rows == 0


def test_kcore_long_chain_needs_iters(ray_session):
    from schema_validator_ray.stages.graph import kcore_on_edges

    # triangle + chain 3-4-5-6: each peel removes one chain node from the
    # far end; 2 iterations leave 4 dangling with degree 1 in the final
    # subgraph, 3 iterations fully strip the chain
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    out3 = kcore_on_edges(_edges(edges), "a", "b", k=2, iters=3)
    got = dict(zip(out3["node"].to_pylist(), out3["degree"].to_pylist()))
    assert got == {1: 2, 2: 2, 3: 2}
    out1 = kcore_on_edges(_edges(edges), "a", "b", k=2, iters=1)
    got1 = dict(zip(out1["node"].to_pylist(), out1["degree"].to_pylist()))
    assert got1[5] == 1 and got1[3] == 3        # chain only part-peeled


def test_theil_equal_values_zero(ray_session):
    from schema_validator_ray.stages.stats import theil_by_group

    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 4 + ["b"] * 3,
        "x": [5, 5, 5, 5, 1, 2, 3]}))
    df = theil_by_group(ds, "g", "x").to_pandas().set_index("g")
    assert df.loc["a", "theil"] == 0.0
    x = np.array([1.0, 2.0, 3.0])
    want = round(float((x * np.log(x)).sum() / x.sum()
                       - np.log(x.sum() / 3)), 6)
    assert df.loc["b", "theil"] == want
    assert int(df.loc["b", "n"]) == 3


def test_theil_drops_nonpositive_and_nulls(ray_session):
    from schema_validator_ray.stages.stats import theil_by_group

    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "a"],
        "x": pa.array([7, 0, -3, None], pa.int64())}))
    df = theil_by_group(ds, "g", "x").to_pandas()
    assert int(df["n"].iloc[0]) == 1
    assert df["theil"].iloc[0] == 0.0           # single value -> no spread


def test_max_streak_histogram(ray_session):
    from schema_validator_ray.stages.funnel import max_streak_histogram

    # user 1: days 0,1,2 then 5,6 (max streak 3; duplicate events on day
    # 1 must not inflate); user 2: single day (streak 1)
    offs = [(1, 0), (1, 1), (1, 1), (1, 2), (1, 5), (1, 6), (2, 3)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([u for u, _ in offs], pa.int64()),
        "ts": pa.array([T0 + d * DAY for _, d in offs],
                       pa.timestamp("us"))}))
    out = max_streak_histogram(ds, user_col="user_id", ts_col="ts") \
        .to_pandas()
    got = dict(zip(out["streak_days"], out["n_users"]))
    assert got == {3: 1, 1: 1}


def test_seq_cond_entropy_deterministic_zero(ray_session, tmp_path):
    # strict alternation a->b->a->b: H(next|prev) = 0
    n = 8
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([1] * n, pa.int64()),
        "ts": pa.array([T0 + i * 1_000_000 for i in range(n)],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b"] * (n // 2), pa.string())}),
        tmp_path / "events.parquet")
    t = _entry().q_events_seq_cond_entropy(str(tmp_path))
    assert t["n_transitions"][0].as_py() == n - 1
    assert t["cond_entropy"][0].as_py() == 0.0


def test_seq_cond_entropy_uniform_ln2(ray_session, tmp_path):
    # from each prev the next is a or b equally often -> H = ln 2
    seq = ["a", "a", "b", "b", "a"]                   # aa ab bb ba
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(seq)), pa.int64()),
        "user_id": pa.array([1] * len(seq), pa.int64()),
        "ts": pa.array([T0 + i * 1_000_000 for i in range(len(seq))],
                       pa.timestamp("us")),
        "event_type": pa.array(seq, pa.string())}),
        tmp_path / "events.parquet")
    t = _entry().q_events_seq_cond_entropy(str(tmp_path))
    assert t["cond_entropy"][0].as_py() == round(float(np.log(2)), 6)
