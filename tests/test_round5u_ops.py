"""Round-5 batch-28 operators: Pareto skyline, Kendall tau-b rank
stability."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    name = "_entry_u"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _write_parts(tmp_path, rows):
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
        "p_size": pa.array([r[2] for r in rows], pa.int32())}),
        tmp_path / "part.parquet")
    return str(tmp_path)


def test_skyline_dominance_and_ties(ray_session, tmp_path):
    # (1.0, 10) dominates (2.0, 5) and (1.0, 8); (3.0, 20) survives via
    # size; the duplicate of the optimum survives too (no strict edge);
    # (0.5, 1) survives via price
    rows = [(1, 1.0, 10), (2, 2.0, 5), (3, 1.0, 8), (4, 3.0, 20),
            (5, 1.0, 10), (6, 0.5, 1)]
    df = _entry().q_part_skyline(_write_parts(tmp_path, rows)).to_pandas()
    assert set(df["p_partkey"]) == {1, 4, 5, 6}


def test_skyline_equal_price_cheaper_tie_kills(ray_session, tmp_path):
    # a strictly cheaper point with the SAME size dominates
    rows = [(1, 1.0, 10), (2, 2.0, 10)]
    df = _entry().q_part_skyline(_write_parts(tmp_path, rows)).to_pandas()
    assert set(df["p_partkey"]) == {1}


def test_tau_b_perfect_and_reversed(ray_session, tmp_path):
    # suppliers with identical rank order in both years -> tau_b = 1;
    # build lineitem rows whose 1999 and 2000 revenues preserve order
    rows = []
    for s in range(1, 6):
        rows.append((s, "1999-06-01", float(100 * s)))
        rows.append((s, "2000-06-01", float(50 * s)))
    pq.write_table(pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_shipdate": pa.array([np.datetime64(r[1], "us") for r in rows],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64())}),
        tmp_path / "lineitem.parquet")
    t = _entry().q_supplier_rank_stability(str(tmp_path))
    assert t["n_suppliers"][0].as_py() == 5
    assert t["tau_b"][0].as_py() == 1.0


def test_tau_b_reversed_order(ray_session, tmp_path):
    rows = []
    for s in range(1, 6):
        rows.append((s, "1999-06-01", float(100 * s)))
        rows.append((s, "2000-06-01", float(100 * (6 - s))))
    pq.write_table(pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_shipdate": pa.array([np.datetime64(r[1], "us") for r in rows],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64())}),
        tmp_path / "lineitem.parquet")
    t = _entry().q_supplier_rank_stability(str(tmp_path))
    assert t["tau_b"][0].as_py() == -1.0
