"""Round-3 additions: cross-source overlap matrix, grouped embedding stats,
z-score outlier detection."""

import numpy as np
import pyarrow as pa


def test_source_overlap_hand_case(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.overlap import source_overlap

    ds = rd.from_items([
        {"src": "a", "text": "one two three four"},
        {"src": "b", "text": "zz one two three yy"},      # shares 1 3-gram
        {"src": "b", "text": "one two three"},            # same shingle again
        {"src": "c", "text": "totally different words here"},
    ])
    out = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap(ds, "text", "src", k=3).take_all()}
    # 'one two three' is the only shared shingle; duplicated in b but
    # counted once (distinct semantics)
    assert out == {("a", "b"): 1}


def test_source_overlap_blocking_invariant(ray_session):
    from schema_validator_ray.sources.pq_read import read_parquet_clean
    from schema_validator_ray.stages.overlap import source_overlap

    docs = read_parquet_clean("/root/testdata/sf0.01/documents.parquet",
                              columns=["text", "source"])

    def as_map(ds):
        return {(r["source_a"], r["source_b"]): r["n_shared"]
                for r in ds.take_all()}

    a = as_map(source_overlap(docs, "text", "source", k=3))
    b = as_map(source_overlap(docs.repartition(11), "text", "source", k=3))
    assert a == b and len(a) > 0


def test_grouped_dim_stats_vs_numpy(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import grouped_dim_stats

    rng = np.random.default_rng(3)
    n, dim = 300, 8
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    lab = rng.integers(0, 4, n).astype(np.int32)
    t = pa.table({"embedding": pa.array(list(emb), pa.list_(pa.float32())),
                  "label": pa.array(lab, pa.int32())})
    out = grouped_dim_stats(rd.from_arrow(t).repartition(5),
                            emb_col="embedding", group_col="label").to_pandas()
    assert len(out) == 4 * dim
    m64 = emb.astype(np.float64)
    for lbl in range(4):
        sub = m64[lab == lbl]
        got = out[out["label"] == lbl].sort_values("pos")
        assert (got["n"].to_numpy() == len(sub)).all()
        assert np.allclose(got["mean_v"].to_numpy(), sub.mean(axis=0))
        assert np.allclose(got["vmin"].to_numpy(), sub.min(axis=0))
        assert np.allclose(got["vmax"].to_numpy(), sub.max(axis=0))


def test_zscore_outliers_vs_numpy(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import group_zscore_outliers

    rng = np.random.default_rng(9)
    n = 5000
    grp = rng.choice(["x", "y", "z"], n)
    val = rng.standard_normal(n) * np.where(grp == "x", 1.0, 5.0)
    ids = np.arange(n)
    t = pa.table({"event_id": ids, "event_type": grp, "value": val})
    got = sorted(r["event_id"] for r in group_zscore_outliers(
        rd.from_arrow(t).repartition(7), value_col="value",
        group_col="event_type", threshold=3.0).take_all())

    want = []
    for g in ("x", "y", "z"):
        v = val[grp == g]
        mu, sd = v.mean(), v.std()
        z = np.abs((v - mu) / sd)
        want.extend(ids[grp == g][z > 3.0].tolist())
    assert got == sorted(want) and len(got) > 0


def test_zscore_outliers_constant_group_emits_nothing(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import group_zscore_outliers

    t = pa.table({"event_id": [1, 2, 3], "event_type": ["c"] * 3,
                  "value": [7.0, 7.0, 7.0]})
    got = group_zscore_outliers(rd.from_arrow(t), value_col="value",
                                group_col="event_type").take_all()
    assert got == []


def test_heavy_hitters_matches_brute_force(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import heavy_hitters_exact

    rng = np.random.default_rng(4)
    # zipf-ish: a few hot keys over a long tail
    keys = np.concatenate([np.repeat(np.arange(5), 150),
                           rng.integers(100, 5000, 8000)])
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(12)
    got = {r["k"]: r["n"] for r in heavy_hitters_exact(
        ds, "k", 100, local_threshold=4).take_all()}
    vals, cnts = np.unique(keys, return_counts=True)
    want = {int(v): int(c) for v, c in zip(vals, cnts) if c >= 100}
    assert got == want and len(want) >= 5


def test_heavy_hitters_pigeonhole_guard_raises(ray_session):
    import pytest
    import ray.data as rd

    from schema_validator_ray.stages.stats import heavy_hitters_exact

    ds = rd.from_arrow(pa.table({"k": np.arange(1000) % 7})).repartition(40)
    # threshold 50 over 40 batches needs local_threshold <= ceil(50/40)=2
    with pytest.raises(ValueError, match="pigeonhole"):
        heavy_hitters_exact(ds, "k", 50, local_threshold=10).take_all()


def test_heavy_hitters_no_false_negatives_across_blocking(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import heavy_hitters_exact

    keys = np.repeat(np.arange(20), 30)   # every key has exactly 30
    ds = rd.from_arrow(pa.table({"k": keys}))
    for parts in (1, 5, 17):
        got = sorted(r["k"] for r in heavy_hitters_exact(
            ds.repartition(parts), "k", 30, local_threshold=1).take_all())
        assert got == list(range(20)), parts


def test_zscore_outliers_null_value_and_null_group(ray_session):
    """A NULL value must not NaN-poison its group's stats (SQL stddev
    ignores NULLs) and NULL-group rows are never outliers (review fix:
    factorize code -1 used to crash bincount / index the last group)."""
    import ray.data as rd

    from schema_validator_ray.stages.analytics import group_zscore_outliers

    rng = np.random.default_rng(13)
    n = 400
    val = np.r_[rng.standard_normal(n - 2), 100.0, 100.0]
    t = pa.table({
        "event_id": pa.array(np.arange(n + 3, dtype=np.int64)),
        "event_type": pa.array(["g"] * n + [None, None, "g"]),
        "value": pa.array(np.r_[val, 0.0, 100.0, np.nan].tolist(),
                          pa.float64()),
    })
    got = sorted(r["event_id"] for r in group_zscore_outliers(
        rd.from_arrow(t).repartition(5), value_col="value",
        group_col="event_type", threshold=3.0).take_all())
    # expected from numpy over the non-null g rows only
    mu, sd = val.mean(), val.std()
    want = sorted(np.arange(n)[np.abs((val - mu) / sd) > 3.0].tolist())
    assert got == want and len(got) >= 2
