"""Round-5 batch-30 operators: seasonal-residual anomaly, part price
dispersion, weekend lift."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_700_000_000_000_000  # 2023-11-14 (a Tuesday) 22:13:20 UTC
DAY = 86_400_000_000


def _entry():
    name = "_entry_w"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_monthly_anomaly_flags_spike(ray_session, tmp_path):
    # three years x 4 months of steady $100, one month spiked to $900:
    # only that cell flags (two years would split the spike 50/50
    # between year mean and month effect and dodge the 2-sigma fence)
    rows = []
    for y in (1999, 2000, 2001):
        for m in (1, 2, 3, 4):
            v = 900.0 if (y, m) == (2000, 3) else 100.0
            rows.append((f"{y}-{m:02d}-10", v))
    pq.write_table(pa.table({
        "o_orderdate": pa.array([np.datetime64(d, "us") for d, _ in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([v for _, v in rows], pa.float64())}),
        tmp_path / "orders.parquet")
    df = _entry().q_monthly_revenue_anomaly(str(tmp_path)).to_pandas()
    flagged = df[df["anomaly"]]
    assert len(flagged) == 1
    assert (int(flagged["year"].iloc[0]),
            int(flagged["month"].iloc[0])) == (2000, 3)


def test_part_price_dispersion_ranks_spread(ray_session, tmp_path):
    # part 1: unit prices 100 and 500 cents (spread 400);
    # part 2: constant unit price (spread 0)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([1.0, 10.0, 3.0, 6.0], pa.float64()),
        "l_quantity": pa.array([1.0, 2.0, 1.0, 2.0], pa.float64())}),
        tmp_path / "lineitem.parquet")
    df = _entry().q_part_price_dispersion(str(tmp_path)).to_pandas()
    assert list(df["p_partkey"]) == [1, 2]
    r = df.iloc[0]
    assert (int(r["min_unit_cents"]), int(r["max_unit_cents"]),
            int(r["spread_cents"])) == (100, 500, 400)
    assert int(df.iloc[1]["spread_cents"]) == 0


def test_weekend_lift(ray_session, tmp_path):
    # T0 is a Tuesday; +4 days = Saturday. 5 weekday clicks, 2 weekend
    # clicks -> lift = (2/2)/(5/5) = 1.0; 'wd' type weekday-only -> 0.
    rows = []
    for i in range(5):
        rows.append((T0 + i * 60_000_000, "click"))        # Tuesday
    rows.append((T0 + 4 * DAY, "click"))                   # Saturday
    rows.append((T0 + 5 * DAY, "click"))                   # Sunday
    rows.append((T0, "wd"))
    pq.write_table(pa.table({
        "ts": pa.array([t for t, _ in rows], pa.timestamp("us")),
        "event_type": pa.array([g for _, g in rows], pa.string())}),
        tmp_path / "events.parquet")
    df = _entry().q_weekend_lift_by_type(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert int(df.loc["click", "n_weekday"]) == 5
    assert int(df.loc["click", "n_weekend"]) == 2
    assert df.loc["click", "weekend_lift"] == 1.0  # (2/2) / (5/5)
    assert int(df.loc["wd", "n_weekend"]) == 0
    assert df.loc["wd", "weekend_lift"] == 0.0


def test_cohens_d_matches_closed_form(ray_session, tmp_path):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [5.0, 6.0, 7.0, 8.0]
    pq.write_table(pa.table({
        "event_type": pa.array(["click"] * 4 + ["purchase"] * 4),
        "value": pa.array(a + b, pa.float64())}),
        tmp_path / "events.parquet")
    t = _entry().q_events_value_cohens_d(str(tmp_path))
    av, bv = np.array(a), np.array(b)
    sp = np.sqrt((3 * av.var(ddof=1) + 3 * bv.var(ddof=1)) / 6)
    want = round(float((av.mean() - bv.mean()) / sp), 6)
    assert t["cohens_d"][0].as_py() == want
    assert t["n_click"][0].as_py() == 4


def test_first_touch_census(ray_session, tmp_path):
    # user 1: view -> purchase (buyer, first=view); user 2: click only
    # (never buys, excluded); user 3: purchase first (first=purchase)
    rows = [(0, 1, "view"), (1, 1, "purchase"), (2, 2, "click"),
            (3, 3, "purchase"), (4, 3, "view")]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([T0 + r[0] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}),
        tmp_path / "events.parquet")
    df = _entry().q_first_touch_census(str(tmp_path)).to_pandas()
    got = dict(zip(df["first_type"], df["n_buyers"]))
    assert got == {"view": 1, "purchase": 1}
