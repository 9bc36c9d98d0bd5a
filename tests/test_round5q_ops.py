"""Round-5 batch-24 operators: spend-tier migration matrix, MinHash
estimate-vs-truth calibration."""

import importlib.util
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    name = "_entry_q"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def test_tier_migration_matrix(ray_session, tmp_path):
    # 8 customers; in 1999 spend ranks 1..8 (quartiles 1..4, two each);
    # in 2000 the order REVERSES -> everyone migrates to the mirrored
    # quartile. Customer 9 only active in 1999 -> dropped.
    rows = []
    for i, c in enumerate(range(1, 9)):
        rows.append((c, "1999-06-01", float(100 * (i + 1))))
        rows.append((c, "2000-06-01", float(100 * (8 - i))))
    rows.append((9, "1999-07-01", 50.0))
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64())}),
        tmp_path / "orders.parquet")
    df = _entry().q_customer_tier_migration(str(tmp_path)).to_pandas()
    got = {(r.tier_from, r.tier_to): r.n_customers for r in df.itertuples()}
    # customer 9's 50.0 shifts 1999 ranks: custs 1..8 hold ranks 2..9 in
    # 1999 -> quartiles (1,1,2,2,3,3,4,4) skip rank-1 slot: cust1 rank2
    # q1, cust2 rank3 q2? NTILE(4) over 9 rows: sizes 3,2,2,2.
    assert int(df["n_customers"].sum()) == 8
    assert (df["tier_from"].between(1, 4)).all()
    assert (df["tier_to"].between(1, 4)).all()
    # reversal: the top-2000 quartile comes from the bottom-1999 ranks
    top_to = {k: v for k, v in got.items() if k[1] == 4}
    assert all(k[0] <= 2 for k in top_to)


def test_minhash_calibration_bands(ray_session, tmp_path):
    # identical docs -> est 1.0 and true 1.0 in the top band
    text = "the quick brown fox jumps over the lazy dog " * 5
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([text, text,
                          "completely different content here " * 6],
                         pa.string())}), tmp_path / "documents.parquet")
    t = _entry().q_minhash_est_calibration(str(tmp_path))
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert len(df) == 1
    r = df.iloc[0]
    assert r["est_band"] == 1.0
    assert int(r["n_pairs"]) == 1
    assert r["mean_est"] == 1.0 and r["mean_true"] == 1.0


def test_minhash_calibration_est_tracks_truth_on_testdata(ray_session):
    t = _entry().q_minhash_est_calibration("/root/testdata/sf0.001")
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    if len(df) == 0:
        return                               # no near-dups at this sf
    # estimates should be calibrated within a band width of the truth
    assert (np.abs(df["mean_est"] - df["mean_true"]) < 0.2).all()
