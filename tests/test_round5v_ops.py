"""Round-5 batch-29 operators: Cochran–Armitage trend test, grouped mode
with pinned ties."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    name = "_entry_v"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _orders(tmp_path, rows):
    pq.write_table(pa.table({
        "o_orderdate": pa.array([np.datetime64(d, "us") for d, _ in rows],
                                pa.timestamp("us")),
        "o_orderstatus": pa.array([s for _, s in rows], pa.string())}),
        tmp_path / "orders.parquet")
    return str(tmp_path)


def test_trend_monotone_positive(ray_session, tmp_path):
    # F-share 0/10, 5/10, 10/10 across three years -> strong + trend
    rows = []
    for y, kf in [(1998, 0), (1999, 5), (2000, 10)]:
        for i in range(10):
            rows.append((f"{y}-06-01", "F" if i < kf else "O"))
    t = _entry().q_order_f_share_trend(_orders(tmp_path, rows))
    assert t["n_years"][0].as_py() == 3
    assert t["n"][0].as_py() == 30
    # T = sum t*(k - n*pbar), pbar=0.5: 0*(0-5)+1*(5-5)+2*(10-5)=10
    assert t["t_stat"][0].as_py() == 10.0
    assert t["z"][0].as_py() > 3.0


def test_trend_flat_zero(ray_session, tmp_path):
    rows = []
    for y in (1998, 1999, 2000):
        for i in range(10):
            rows.append((f"{y}-06-01", "F" if i < 5 else "O"))
    t = _entry().q_order_f_share_trend(_orders(tmp_path, rows))
    assert t["t_stat"][0].as_py() == 0.0
    assert t["z"][0].as_py() == 0.0


def test_grouped_mode_tiebreak(ray_session, tmp_path):
    # group 'A': 2.0 x2, 5.0 x2 tie -> smallest (2.0) wins;
    # group 'B': clear mode 7.0
    g = ["A", "A", "A", "A", "B", "B", "B"]
    v = [2.0, 2.0, 5.0, 5.0, 7.0, 7.0, 1.0]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(g, pa.string()),
        "l_quantity": pa.array(v, pa.float64())}),
        tmp_path / "lineitem.parquet")
    df = _entry().q_lineitem_qty_mode(str(tmp_path)).to_pandas() \
        .set_index("l_returnflag")
    assert df.loc["A", "mode_qty"] == 2.0 and int(df.loc["A", "n"]) == 2
    assert df.loc["B", "mode_qty"] == 7.0 and int(df.loc["B", "n"]) == 2
