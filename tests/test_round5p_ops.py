"""Round-5 batch-23 operators: one-pass correlation matrix, p-chart
control limits, grouped geometric mean, near-dup cluster-size census."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_700_000_000_000_000
DAY = 86_400_000_000


def _entry():
    name = "_entry_p"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_corr_matrix_matches_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 500
    q = rng.uniform(1, 50, n)
    price = q * 100 + rng.normal(0, 10, n)        # strongly correlated
    disc = rng.uniform(0, 0.1, n)
    tax = np.zeros(n)       # constant 0: variance cancels EXACTLY -> null
    # (a nonzero float constant leaves ~1e-12 cancellation residue whose
    # sign is summation-order-dependent — not a stable null test)
    pq.write_table(pa.table({
        "l_quantity": q, "l_extendedprice": price,
        "l_discount": disc, "l_tax": tax}), tmp_path / "lineitem.parquet")
    df = _entry().q_lineitem_corr_matrix(str(tmp_path)).to_pandas()
    got = {(r.metric_x, r.metric_y): r.corr for r in df.itertuples()}
    assert len(got) == 6
    want = np.corrcoef(q, price)[0, 1]
    assert abs(got[("l_quantity", "l_extendedprice")] - want) < 1e-5
    # constant column: variance term 0 -> null on the guarded branch
    assert all(np.isnan(v) for k, v in got.items() if "l_tax" in k)
    assert int(df["n"].iloc[0]) == n


def test_pchart_flags_shifted_day(ray_session, tmp_path):
    # 4 days at 50% purchase share, one day at 100% of 40 events ->
    # that day breaches the +3 sigma limit
    rows = []
    for d in range(4):
        for i in range(40):
            rows.append((d, "purchase" if i % 2 == 0 else "click"))
    for i in range(40):
        rows.append((4, "purchase"))
    pq.write_table(pa.table({
        "ts": pa.array([T0 + d * DAY + i * 1_000_000
                        for i, (d, _) in enumerate(rows)],
                       pa.timestamp("us")),
        "event_type": pa.array([t for _, t in rows], pa.string())}),
        tmp_path / "events.parquet")
    df = _entry().q_purchase_share_pchart(str(tmp_path)).to_pandas()
    assert len(df) == 5
    assert list(df["out_of_control"]) == [False] * 4 + [True]
    assert df["share"].iloc[4] == 1.0
    assert (df["lcl"] < df["ucl"]).all()


def test_geomean_matches_closed_form(ray_session, tmp_path):
    pq.write_table(pa.table({
        "o_orderpriority": ["a", "a", "a", "b", "b"],
        "o_totalprice": [1.0, 10.0, 100.0, 4.0, 9.0]}),
        tmp_path / "orders.parquet")
    df = _entry().q_order_price_geomean(str(tmp_path)).to_pandas() \
        .set_index("o_orderpriority")
    assert df.loc["a", "geomean"] == 10.0
    assert df.loc["b", "geomean"] == 6.0
    assert int(df.loc["a", "n"]) == 3


def test_neardup_cluster_census_on_testdata(ray_session):
    # histogram of MinHash components at sf0.001: sizes >= 2 (pair-graph
    # nodes only), total docs in clusters == sum(size * count)
    t = _entry().q_neardup_cluster_census("/root/testdata/sf0.001")
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert (df["cluster_size"] >= 2).all()
    assert (df["n_clusters"] >= 1).all()
