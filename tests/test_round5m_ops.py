"""Round-5 batch-20 operators: ABC/Pareto classification, market-basket
pair lift, daily new-vs-returning census, order-line sequence integrity."""

import importlib.util
import sys

import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_700_000_000_000_000  # µs epoch base for handmade timestamps
DAY = 86_400_000_000


def _entry():
    name = "_entry_m"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _write_lineitem(tmp_path, partkeys, orderkeys, prices=None, lns=None):
    n = len(partkeys)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orderkeys, pa.int64()),
        "l_partkey": pa.array(partkeys, pa.int64()),
        "l_linenumber": pa.array(lns or [1] * n, pa.int32()),
        "l_extendedprice": pa.array(prices or [1.0] * n, pa.float64())}),
        tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_part_abc_classes_boundaries(ray_session, tmp_path):
    # cents 80 / 15 / 5: cum shares 80% / 95% / 100% — the inclusive
    # boundary tests put one part in each class
    sf = _write_lineitem(tmp_path, [1, 2, 3], [10, 11, 12],
                         prices=[0.80, 0.15, 0.05])
    df = _entry().q_part_abc_classes(sf).to_pandas()
    got = {r.abc_class: (r.n_parts, r.revenue_cents)
           for r in df.itertuples()}
    assert got == {"A": (1, 80), "B": (1, 15), "C": (1, 5)}


def test_part_abc_classes_sums_per_part(ray_session, tmp_path):
    # part 1 split over two rows still counts once with summed revenue
    sf = _write_lineitem(tmp_path, [1, 1, 2], [10, 11, 12],
                         prices=[0.40, 0.40, 0.20])
    df = _entry().q_part_abc_classes(sf).to_pandas()
    got = {r.abc_class: (r.n_parts, r.revenue_cents)
           for r in df.itertuples()}
    assert got["A"] == (1, 80)
    assert sum(n for n, _ in got.values()) == 2
    assert sum(c for _, c in got.values()) == 100


def test_basket_pair_lift_values(ray_session, tmp_path):
    # orders: 1 -> {1,2,3}, 2 -> {1,2}, 3 -> {9}; only (1,2) has
    # support >= 2; lift = n*N/(c1*c2) = 2*3/(2*2) = 1.5
    sf = _write_lineitem(tmp_path,
                         [1, 2, 3, 1, 2, 9], [1, 1, 1, 2, 2, 3])
    t = _entry().q_basket_pair_lift(sf)
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert len(df) == 1
    r = df.iloc[0] if hasattr(df, "iloc") else df
    assert int(r["part_a"]) == 1 and int(r["part_b"]) == 2
    assert int(r["n_orders_shared"]) == 2
    assert float(r["lift"]) == 1.5


def test_basket_pair_lift_dedupes_repeated_lines(ray_session, tmp_path):
    # the same (part, order) edge twice must not inflate support
    sf = _write_lineitem(tmp_path, [1, 1, 2, 1, 2], [1, 1, 1, 2, 2])
    t = _entry().q_basket_pair_lift(sf)
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert len(df) == 1
    assert int(df.iloc[0]["n_orders_shared"]) == 2


def test_daily_new_returning_split(ray_session, tmp_path):
    # user 1 active day0+day1 (returning on day1); user 2 first on day1
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([T0, T0 + 1, T0 + DAY, T0 + DAY + 5],
                       pa.timestamp("us"))}), tmp_path / "events.parquet")
    df = _entry().q_daily_new_returning(str(tmp_path))
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    assert len(df) == 2
    d0, d1 = df.iloc[0], df.iloc[1]
    assert (d0["new_users"], d0["returning_users"], d0["active_users"]) \
        == (1, 0, 1)
    assert (d1["new_users"], d1["returning_users"], d1["active_users"]) \
        == (1, 1, 2)


def test_order_line_integrity_census(ray_session, tmp_path):
    # order 1: 1,2,3 complete; order 2: 1,1,2 dup (no gap);
    # order 3: 2,3 gap (offset start); order 4: 1,3 gap (hole)
    sf = _write_lineitem(
        tmp_path, [1] * 10, [1, 1, 1, 2, 2, 2, 3, 3, 4, 4],
        lns=[1, 2, 3, 1, 1, 2, 2, 3, 1, 3])
    df = _entry().q_order_line_integrity(sf).to_pandas()
    r = df.iloc[0]
    assert int(r["n_orders"]) == 4
    assert int(r["n_complete"]) == 1
    assert int(r["n_with_dups"]) == 1
    assert int(r["n_with_gaps"]) == 2
