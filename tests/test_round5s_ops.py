"""Round-5 batch-26 operators: QQ decile drift table, cohort LTV curve,
Dunning G² distinctive terms."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_700_000_000_000_000


def _entry():
    name = "_entry_s"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_qq_table_scaled_distribution(ray_session, tmp_path):
    # purchase values are exactly 2x click values -> every decile ratio 2
    clicks = list(range(1, 101))
    pq.write_table(pa.table({
        "event_type": pa.array(["click"] * 100 + ["purchase"] * 100),
        "value": pa.array([float(v) for v in clicks]
                          + [float(2 * v) for v in clicks], pa.float64()),
        }), tmp_path / "events.parquet")
    t = _entry().q_events_value_qq(str(tmp_path))
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert len(df) == 9
    assert (df["ratio"] == 2.0).all()
    assert df["q_click"].iloc[4] == 50.0        # median of 1..100, disc


def test_cohort_ltv_curve(ray_session, tmp_path):
    # cust 1 first orders 1999 ($1 then $2 in 2000); cust 2 only 2000
    rows = [(1, "1999-05-01", 1.0), (1, "2000-05-01", 2.0),
            (2, "2000-06-01", 5.0)]
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([np.datetime64(r[1], "us") for r in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64())}),
        tmp_path / "orders.parquet")
    df = _entry().q_cohort_ltv_curve(str(tmp_path)).to_pandas()
    got = {(r.cohort_year, r.age): (r.n_customers, r.spend_cents)
           for r in df.itertuples()}
    assert got[(1999, 0)] == (1, 100)
    assert got[(1999, 1)] == (1, 200)
    assert got[(2000, 0)] == (1, 500)


def test_distinctive_terms_flags_slice_word(ray_session, tmp_path):
    # 'hippo' only in en docs, common words everywhere
    en = ["hippo runs fast " * 10] * 5
    de = ["der hund läuft schnell " * 10] * 5
    pq.write_table(pa.table({
        "lang": pa.array(["en"] * 5 + ["de"] * 5),
        "text": pa.array(en + de)}), tmp_path / "documents.parquet")
    t = _entry().q_lang_distinctive_terms(str(tmp_path))
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert len(df) <= 10
    assert "hippo" in set(df["term"])
    r = df[df["term"] == "hippo"].iloc[0]
    assert int(r["n_en"]) == 50 and int(r["n_rest"]) == 0
    assert (df["g2"] > 0).all()
    # ranking is descending on the rounded statistic
    assert (np.diff(df["g2"].to_numpy()) <= 1e-12).all()
