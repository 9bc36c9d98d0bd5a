"""Round-5 batch-27 operators: Kruskal–Wallis H, Theil–Sen robust trend,
daily Fano dispersion."""

import importlib.util
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

T0 = 1_700_000_000_000_000
DAY = 86_400_000_000


def _entry():
    name = "_entry_t"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_kruskal_matches_brute_midranks(ray_session):
    from schema_validator_ray.stages.stats import kruskal_wallis

    rng = np.random.default_rng(11)
    g = rng.choice(["a", "b", "c", "d"], 400)
    v = rng.integers(0, 25, 400).astype(float) + (g == "d") * 2.0
    out = kruskal_wallis(rd.from_arrow(pa.table({"g": g, "v": v})),
                         "g", "v").to_pandas()
    df = pd.DataFrame({"g": g, "v": v})
    r = df["v"].rank(method="average")
    nn = len(df)
    stat = (12.0 / (nn * (nn + 1))
            * sum(r[df.g == x].sum() ** 2 / (df.g == x).sum()
                  for x in "abcd") - 3 * (nn + 1))
    _, t = np.unique(v, return_counts=True)
    corr = 1 - (t ** 3 - t).sum() / (nn ** 3 - nn)
    assert out["h"].iloc[0] == round(float(stat / corr), 6)
    assert int(out["k"].iloc[0]) == 4 and int(out["n"].iloc[0]) == 400


def test_kruskal_identical_groups_near_zero(ray_session):
    from schema_validator_ray.stages.stats import kruskal_wallis

    # same value multiset in each group -> rank sums proportional -> H ~ 0
    v = list(range(10)) * 2
    g = ["a"] * 10 + ["b"] * 10
    out = kruskal_wallis(rd.from_arrow(pa.table(
        {"g": g, "v": [float(x) for x in v]})), "g", "v").to_pandas()
    assert abs(out["h"].iloc[0]) < 1e-9


def test_theilsen_linear_with_outlier(ray_session, tmp_path):
    # perfect slope of $1/day (100 cents) plus one wild outlier day:
    # the MEDIAN pairwise slope stays 100
    rows = []
    for i in range(15):
        rows.append((f"2000-01-{i+1:02d}", 10.0 + i))
    rows.append(("2000-01-20", 10000.0))
    pq.write_table(pa.table({
        "o_orderdate": pa.array([np.datetime64(d, "us") for d, _ in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([v for _, v in rows], pa.float64())}),
        tmp_path / "orders.parquet")
    t = _entry().q_daily_revenue_theilsen(str(tmp_path))
    assert t["n_days"][0].as_py() == 16
    assert t["n_pairs"][0].as_py() == 120
    assert t["slope_cents_per_day"][0].as_py() == 100.0


def test_daily_fano_constant_vs_bursty(ray_session, tmp_path):
    # type 'flat': exactly 4/day over 5 days -> fano 0;
    # type 'burst': 20 on one day, 0 elsewhere -> fano = var/mean = 16
    rows = []
    for d in range(5):
        for i in range(4):
            rows.append((d, "flat"))
    for i in range(20):
        rows.append((2, "burst"))
    pq.write_table(pa.table({
        "ts": pa.array([T0 + d * DAY + i for i, (d, _) in enumerate(rows)],
                       pa.timestamp("us")),
        "event_type": pa.array([t for _, t in rows], pa.string())}),
        tmp_path / "events.parquet")
    df = _entry().q_event_type_daily_fano(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert df.loc["flat", "fano"] == 0.0
    assert df.loc["flat", "mean_daily"] == 4.0
    # burst: counts (0,0,20,0,0): mean 4, var = (400/5 - 16) = 64, fano 16
    assert df.loc["burst", "fano"] == 16.0
