"""Round-5 batch-25 operators: money-grid conformance, sentinel-value
census, normalization dedup gain, stylometry profile."""

import importlib.util
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    name = "_entry_r"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_money_grid_census_counts(ray_session, tmp_path):
    pq.write_table(pa.table({"o_totalprice": pa.array(
        [10.00, 10.005, -3.25, None], pa.float64())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({"l_extendedprice": pa.array(
        [1.23], pa.float64())}), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({"c_acctbal": pa.array(
        [0.0], pa.float64())}), tmp_path / "customer.parquet")
    df = _entry().q_money_grid_census(str(tmp_path)).to_pandas() \
        .set_index("column")
    r = df.loc["orders.o_totalprice"]
    assert int(r["n"]) == 4
    assert int(r["n_on_cent_grid"]) == 2       # 10.00 and -3.25
    assert int(r["n_negative"]) == 1
    assert int(r["n_null"]) == 1


def test_sentinel_value_census(ray_session, tmp_path):
    pq.write_table(pa.table({
        "value": pa.array([0.0, 1.0, 0.0], pa.float64()),
        "props": pa.array(["{}", " ", '{"a":1}'], pa.string())}),
        tmp_path / "events.parquet")
    pq.write_table(pa.table({"text": pa.array(
        ["  ", "NULL", "real text", "n/a", None], pa.string())}),
        tmp_path / "documents.parquet")
    pq.write_table(pa.table({"o_totalprice": pa.array(
        [0.0, 5.0], pa.float64())}), tmp_path / "orders.parquet")
    df = _entry().q_sentinel_value_census(str(tmp_path)).to_pandas()
    got = {(r["column"], r.sentinel): r.n for _, r in df.iterrows()}
    assert got[("events.value", "0.0")] == 2
    assert got[("events.props", "empty/{}")] == 2
    assert got[("documents.text", "blank")] == 1
    assert got[("documents.text", "null-word")] == 2
    assert got[("orders.o_totalprice", "0.0")] == 1


def test_dedup_normalization_gain(ray_session, tmp_path):
    pq.write_table(pa.table({
        "source": ["s"] * 4,
        "text": ["Hello  World", "hello world", "hello world",
                 "different"]}), tmp_path / "documents.parquet")
    df = _entry().q_dedup_normalization_gain(str(tmp_path)).to_pandas()
    r = df.iloc[0]
    # raw: 3 distinct; normalized: "hello world" x3 collapse -> 2
    assert int(r["distinct_raw"]) == 3
    assert int(r["distinct_norm"]) == 2
    assert int(r["extra_dups"]) == 1


def test_stylometry_profile_shares(ray_session, tmp_path):
    pq.write_table(pa.table({
        "source": ["s", "s"],
        "text": ["the cat and the dog", "a mouse"]}),
        tmp_path / "documents.parquet")
    df = _entry().q_source_stylometry_profile(str(tmp_path)).to_pandas()
    got = {r.word: (r.n, r.share) for r in df.itertuples()}
    assert len(got) == 10                        # full 10-word grid
    assert got["the"] == (2, round(2 / 7, 6))
    assert got["and"] == (1, round(1 / 7, 6))
    assert got["a"] == (1, round(1 / 7, 6))
    assert got["of"][0] == 0
