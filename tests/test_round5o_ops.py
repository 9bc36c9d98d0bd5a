"""Round-5 batch-22 operators: ER blocking recall audit, purchase-gap CV
bands, seasonal decomposition, one-way ANOVA."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_700_000_000_000_000
MIN = 60_000_000


def _entry():
    name = "_entry_o"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_linkage_block_recall_catches_suffix_blocked_typos(
        ray_session, tmp_path):
    # "cold bolt" vs "old bolt": ed=1, different prefix-4, same suffix-4
    # -> caught only by the suffix pass. "blue gear" / "red gear" share
    # the suffix block but ed>1 -> candidate, not true.
    names = ["cold bolt", "old bolt", "blue gear", "red gear", "zzz"]
    pq.write_table(pa.table({"p_name": pa.array(names * 2, pa.string())}),
                   tmp_path / "part.parquet")
    df = _entry().q_linkage_block_recall(str(tmp_path)).to_pandas()
    r = df.iloc[0]
    assert int(r["n_true"]) == 1
    assert int(r["n_caught"]) == 1
    assert float(r["recall"]) == 1.0
    assert int(r["n_candidates"]) >= 2          # bolt pair + gear pair
    assert 0 < float(r["precision"]) < 1


def test_purchase_gap_cv_bands(ray_session, tmp_path):
    # user 1: perfectly regular gaps (10, 10, 10 min) -> cv 0 'regular';
    # user 2: gaps (1, 1, 100) -> cv ~ 1.37 'bursty' (two gaps alone cap
    # at cv = 1); user 3: one purchase, dropped; user 4: gaps all zero
    # -> 'instant'; clicks ignored.
    rows = []

    def add(u, mins, ty="purchase"):
        rows.append((len(rows), u, T0 + mins * MIN, ty))

    for m in (0, 10, 20, 30):
        add(1, m)
    for m in (0, 1, 2, 102):
        add(2, m)
    add(3, 0)
    add(4, 0)
    add(4, 0)
    add(4, 0)
    add(1, 5, "click")
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string())}),
        tmp_path / "events.parquet")
    out = _entry().q_purchase_gap_cv_bands(str(tmp_path)).to_pandas()
    got = dict(zip(out["band"], out["n_users"]))
    assert got == {"regular": 1, "bursty": 1, "instant": 1}


def test_revenue_seasonal_decomp_effects(ray_session, tmp_path):
    # two years, two months; month 1 runs +50 above each year's mean,
    # month 2 runs -50 below -> effects +-50 dollars exactly
    y = [1995, 1995, 1996, 1996]
    m = [1, 2, 1, 2]
    price = [200.0, 100.0, 400.0, 300.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [np.datetime64(f"{yy}-{mm:02d}-15", "us") for yy, mm
             in zip(y, m)], pa.timestamp("us")),
        "o_totalprice": pa.array(price, pa.float64())}),
        tmp_path / "orders.parquet")
    df = _entry().q_revenue_seasonal_decomp(str(tmp_path)).to_pandas()
    got = dict(zip(df["month"], df["month_effect_dollars"]))
    assert got == {1: 50.0, 2: -50.0}
    assert set(df["n_years"]) == {2}


def test_events_value_anova_matches_closed_form(ray_session, tmp_path):
    vals = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0],
            "c": [10.0, 10.0, 10.0]}
    tys, xs = [], []
    for t, vs in vals.items():
        tys += [t] * len(vs)
        xs += vs
    pq.write_table(pa.table({
        "event_type": pa.array(tys, pa.string()),
        "value": pa.array(xs, pa.float64())}), tmp_path / "events.parquet")
    t = _entry().q_events_value_anova(str(tmp_path))
    groups = [np.array(v) for v in vals.values()]
    allv = np.concatenate(groups)
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    want = (ssb / 2) / (ssw / (len(allv) - 3))
    assert t["k"][0].as_py() == 3
    assert t["n"][0].as_py() == 9
    assert abs(t["f_stat"][0].as_py() - want) < 1e-6
