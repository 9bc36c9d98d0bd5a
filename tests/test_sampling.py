"""Deterministic sampling: restart-safety (identical rows across runs and
re-blocking), rate accuracy, stratified balancing."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    from schema_validator_ray.sources.pq_read import read_parquet_clean

    return read_parquet_clean("/root/testdata/sf0.01/documents.parquet",
                              columns=["doc_id", "lang"])


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_hash_sample_deterministic_and_rate(docs_ds, ray_session):
    from schema_validator_ray.stages.sampling import hash_sample

    a = _ids(hash_sample(docs_ds, "doc_id", 0.2))
    b = _ids(hash_sample(docs_ds.repartition(7), "doc_id", 0.2))
    assert a == b                          # re-blocking invariant
    n = docs_ds.count()
    assert 0.1 * n <= len(a) <= 0.3 * n    # rate in the right band
    assert _ids(hash_sample(docs_ds, "doc_id", 1.0)) == _ids(docs_ds)
    assert _ids(hash_sample(docs_ds, "doc_id", 0.0)) == []


def test_hash_sample_seed_varies(docs_ds, ray_session):
    from schema_validator_ray.stages.sampling import hash_sample

    a = set(_ids(hash_sample(docs_ds, "doc_id", 0.2, seed=0)))
    b = set(_ids(hash_sample(docs_ds, "doc_id", 0.2, seed=12345)))
    assert a != b


def test_stratified_balances_strata(docs_ds, ray_session):
    import pandas as pd

    from schema_validator_ray.stages.sampling import (stratified_sample,
                                                      stratum_counts)

    counts = stratum_counts(docs_ds, "lang")
    target = 50
    out = stratified_sample(docs_ds, "doc_id", "lang",
                            target_per_stratum=target).to_pandas()
    got = out.groupby("lang").size()
    for lang, c in counts.items():
        if c <= target:        # small strata keep everything
            assert got.get(lang, 0) == c
        else:                  # large strata land near the target
            assert 0.4 * target <= got.get(lang, 0) <= 2.0 * target
    # determinism across runs
    out2 = stratified_sample(docs_ds, "doc_id", "lang",
                             target_per_stratum=target).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))


def test_hash_split_partitions_every_row(docs_ds, ray_session):
    from schema_validator_ray.stages.sampling import hash_split

    out = hash_split(docs_ds, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    n = docs_ds.count()
    assert len(out) == n
    frac = out.groupby("split").size() / n
    assert 0.7 <= frac.get("train", 0) <= 0.9
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    # re-blocking invariant
    out2 = hash_split(docs_ds.repartition(9), "doc_id",
                      {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    with pytest.raises(ValueError):
        hash_split(docs_ds, "doc_id", {"train": 0.5, "val": 0.1})


def test_hash_sample_nested_and_split_consistency(docs_ds, ray_session):
    """Threshold sampling is NESTED: raising the rate only ADDS rows (an
    operational property — resampling at a higher rate reuses all previously
    selected data); and hash_split's first band equals hash_sample at the
    same fraction (same threshold arithmetic)."""
    from schema_validator_ray.stages.sampling import hash_sample, hash_split

    s10 = set(_ids(hash_sample(docs_ds, "doc_id", 0.10)))
    s30 = set(_ids(hash_sample(docs_ds, "doc_id", 0.30)))
    s60 = set(_ids(hash_sample(docs_ds, "doc_id", 0.60)))
    assert s10 <= s30 <= s60

    split = hash_split(docs_ds, "doc_id",
                       {"a": 0.30, "b": 0.70}).to_pandas()
    first_band = set(split[split["split"] == "a"]["doc_id"])
    assert first_band == s30


def test_hash_split_fraction_thresholds_exact(ray_session):
    """Fractions whose float cumsum drifts (0.3+0.3 = 0.6000000000000001)
    must still derive band thresholds identical to threshold_for() on the
    directly-written cumulative values — engine and SQL oracle both inline
    those, so a one-ULP drift would flip rows at the band edge."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.sampling import hash_split, threshold_for

    ids = pa.table({"id": pa.array(np.arange(20000, dtype=np.int64))})
    out = hash_split(rd.from_arrow(ids), "id",
                     {"a": 0.3, "b": 0.3, "c": 0.4}, seed=5).take_all()
    got = {r["id"]: r["split"] for r in out}
    # reference assignment from exact cumulative fractions 0.3, 0.6, 1.0
    t1, t2 = threshold_for(0.3), threshold_for(0.6)
    from schema_validator_ray.stages.sampling import M32, _hash32
    h = _hash32(np.arange(20000, dtype=np.int64), 5)
    want = np.where(h < t1, "a", np.where(h < t2, "b", "c"))
    assert [got[i] for i in range(20000)] == list(want)


def test_shuffle_deterministic_blocking_invariant(ray_session):
    """The global shuffle position is a pure function of the id set:
    identical across block layouts, a permutation of 0..n-1, and matching
    the numpy reference ordering."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.sampling import (
        _hash32,
        shuffle_deterministic,
    )

    ids = np.arange(777, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    outs = []
    for nblocks in (1, 7):
        out = shuffle_deterministic(
            rd.from_arrow(tbl).repartition(nblocks), "doc_id",
            seed=5).take_all()
        outs.append(sorted((r["doc_id"], r["pos"]) for r in out))
    assert outs[0] == outs[1]
    pos = {r[0]: r[1] for r in outs[0]}
    assert sorted(pos.values()) == list(range(777))
    order = ids[np.lexsort((ids, _hash32(ids, 5)))]
    assert [pos[i] for i in order] == list(range(777))


def test_cap_per_group_hot_group_exact(ray_session):
    """A 90%-hot group is capped to exactly n rows, the winners are the
    n smallest hashes, and re-sharding doesn't change the picked set."""
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.sampling import (M32, _hash32,
                                                      cap_per_group)

    rng = np.random.default_rng(23)
    n = 15000
    df = pd.DataFrame({
        "g": np.where(rng.random(n) < 0.9, "hot",
                      rng.integers(0, 8, n).astype(str)),
        "id": np.arange(n, dtype=np.int64),
    })

    def run(parts):
        out = cap_per_group(rd.from_pandas(df).repartition(parts),
                            group_col="g", id_col="id", n=12, seed=5)
        return out.to_pandas().sort_values(["g", "id"]).reset_index(drop=True)

    a, b = run(4), run(19)
    pd.testing.assert_frame_equal(a, b)          # blocking-invariant
    assert (a.groupby("g").size() <= 12).all()
    # winners per group == the 12 smallest (hash, id) pairs
    h = _hash32(df["id"].to_numpy(), 5).astype(np.uint64)
    df2 = df.assign(h=h).sort_values(["g", "h", "id"], kind="stable")
    exp = (df2.groupby("g").head(12)[["g", "id"]]
           .sort_values(["g", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["g", "id"]], exp)


def test_budget_mix(ray_session):
    """Exact SQL parity of the integer thresholds, expected kept weight near
    the budget, oversubscribed budgets keep everything, missing budget is
    loud."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from schema_validator_ray.stages.sampling import budget_mix

    rng = np.random.default_rng(17)
    n = 12000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b", "tiny"], n, p=[0.6, 0.39, 0.01]),
        "w": rng.integers(50, 400, n).astype(np.int64)})
    budgets = {"a": 200_000, "tiny": 10_000_000}     # tiny oversubscribed
    got = (budget_mix(rd.from_pandas(df).repartition(9),
                      id_col="doc_id", group_col="source", weight_col="w",
                      budgets=budgets, default_budget=100_000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH tot AS (SELECT source, CAST(sum(w) AS BIGINT) AS s
                       FROM df GROUP BY 1)
        SELECT d.doc_id, d.source, d.w
          FROM df d JOIN tot USING (source)
         WHERE (d.doc_id * 2654435761) % 4294967296
               < least(4294967296,
                       (CAST(CASE WHEN d.source = 'a' THEN 200000
                                  WHEN d.source = 'tiny' THEN 10000000
                                  ELSE 100000 END AS BIGINT) * 4294967296)
                       // tot.s)
         ORDER BY d.doc_id""").df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # oversubscribed source kept whole
    assert (got["source"] == "tiny").sum() == (df["source"] == "tiny").sum()
    # expected kept weight within 10% of budget for the big sources
    for s, b in (("a", 200_000), ("b", 100_000)):
        kept = got.loc[got["source"] == s, "w"].sum()
        assert abs(kept - b) / b < 0.10, (s, kept)
    with pytest.raises(ValueError, match="no budget"):
        budget_mix(rd.from_pandas(df), id_col="doc_id", group_col="source",
                   weight_col="w", budgets={"a": 1})


def test_budget_mix_null_source_rows_drop(ray_session):
    """Null-source rows drop (oracle JOIN semantics) instead of inheriting
    the last source's threshold."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.sampling import budget_mix

    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "source": ["a"] * 200 + [None] * 200,
        "w": np.full(400, 100, np.int64)})
    out = (budget_mix(rd.from_pandas(df).repartition(5),
                      id_col="doc_id", group_col="source", weight_col="w",
                      budgets={"a": 10_000_000})     # oversubscribed: keep all a
           .to_pandas())
    assert (out["source"] == "a").all()
    assert len(out) == 200


def test_assign_range_partitions_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.sampling import assign_range_partitions

    rng = np.random.default_rng(5)
    v = rng.normal(100, 25, 2000)
    v[::50] = 100.0  # a hot exact value spanning boundaries (ties-left)
    df = pd.DataFrame({"id": np.arange(2000, dtype=np.int64), "v": v})
    df.loc[7, "v"] = None  # null -> partition 0
    out = (assign_range_partitions(rd.from_pandas(df).repartition(6),
                                   "v", 4)
           .to_pandas().set_index("id")["part_id"])
    vv = df["v"].dropna().to_numpy()
    n = len(vv)
    s = np.sort(vv)
    bounds = np.sort([s[max(int(np.ceil(q * n)) - 1, 0)]
                      for q in (0.25, 0.5, 0.75)])
    for i, val in zip(df["id"], df["v"]):
        exp = 0 if pd.isna(val) else int((bounds < val).sum())
        assert out[i] == exp
    # row counts per part are near-equal (within the tie mass)
    counts = out.value_counts()
    assert counts.min() > 300 and counts.max() < 700


def test_balanced_resample(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.sampling import balanced_resample

    # imbalanced: label 0 x 60, label 1 x 12, label 2 x 5, + nulls
    lab = [0] * 60 + [1] * 12 + [2] * 5 + [None] * 3
    df = pd.DataFrame({"id": np.arange(80, dtype=np.int64),
                       "label": pd.array(lab, dtype="Int64")})
    out = (balanced_resample(rd.from_pandas(df).repartition(4), "label",
                             factor_cap=8)
           .to_pandas())
    cnt = out.groupby("label")["id"].count()
    # factors: 0 -> 1, 1 -> floor(60/12)=5, 2 -> floor(60/5)=8 (cap hit... 12)
    assert cnt[0] == 60 and cnt[1] == 12 * 5 and cnt[2] == 5 * 8
    # rep indices are 1..factor per source row
    reps2 = out[out["label"] == 2].groupby("id")["rep"].apply(list)
    assert all(sorted(r) == list(range(1, 9)) for r in reps2)
    # null labels dropped
    assert out["label"].notna().all()

    # cap binds: factor_cap=3 clamps label 2's 12x to 3x
    out2 = (balanced_resample(rd.from_pandas(df), "label", factor_cap=3)
            .to_pandas())
    c2 = out2.groupby("label")["id"].count()
    assert c2[1] == 12 * 3 and c2[2] == 5 * 3
