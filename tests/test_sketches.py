"""Sketch accuracy + mergeability bounds (FIXTURES.md F6)."""

import numpy as np
import pytest

from schema_validator_ray.functions.sketches import (
    HLL,
    CountMin,
    TDigest,
    hash64_ints,
)


def test_hll_accuracy_and_merge():
    h = HLL()
    parts = []
    for i in range(8):
        p = HLL()
        p.add_hashes(hash64_ints(np.arange(i * 10000, i * 10000 + 15000,
                                           dtype=np.int64)))
        parts.append(p)
    for p in parts:
        h.merge(p)
    true = 7 * 10000 + 15000  # overlapping ranges -> 85000 distinct
    assert abs(h.estimate() - true) / true < 0.05


def test_hll_serialization_roundtrip():
    h = HLL()
    h.add_hashes(hash64_ints(np.arange(1000, dtype=np.int64)))
    h2 = HLL.loads(h.dumps())
    assert h2.estimate() == h.estimate()


def test_tdigest_quantiles_known_distribution():
    rng = np.random.default_rng(42)
    data = rng.uniform(0, 1000, 100000)
    t = TDigest()
    for chunk in np.array_split(data, 20):
        part = TDigest()
        part.add(chunk)
        t.merge(part)
    for q in (0.05, 0.5, 0.95):
        assert abs(t.quantile(q) - 1000 * q) < 15, q
    assert t.quantile(0.0) == data.min()


def test_tdigest_serialization():
    t = TDigest()
    t.add(np.arange(1000.0))
    t2 = TDigest.loads(t.dumps())
    assert abs(t2.quantile(0.5) - t.quantile(0.5)) < 1e-9


def test_countmin_planted_heavy_hitters():
    keys = (["hot"] * 9000 + ["warm"] * 3000
            + [f"tail{i}" for i in range(5000)])
    rng = np.random.default_rng(0)
    rng.shuffle(keys)
    parts = []
    for chunk in np.array_split(np.array(keys, object), 6):
        c = CountMin()
        c.add(list(chunk))
        parts.append(c)
    total = parts[0]
    for p in parts[1:]:
        total.merge(p)
    top = total.top(2)
    assert top[0][0] == "hot" and top[1][0] == "warm"
    # CMS overestimates only
    assert top[0][1] >= 9000
    assert top[0][1] <= 9000 + 200


def test_distributed_profile_merge_equals_driver_merge(ray_session):
    """The worker-side tree merge must produce identical exact fields and
    equivalent sketches to the incremental driver merge."""
    import ray.data as rd

    from schema_validator_ray.sources.pq_read import read_parquet_clean
    from schema_validator_ray.stages.stats import profile_dataset

    ds = read_parquet_clean("/root/testdata/sf0.01/lineitem.parquet",
                            columns=["l_quantity", "l_orderkey"])
    a = profile_dataset(ds, numeric=("l_quantity",), keys=("l_orderkey",))
    b = profile_dataset(ds, numeric=("l_quantity",), keys=("l_orderkey",),
                        distributed_merge=True)
    for col in a:
        pa_, pb_ = a[col], b[col]
        assert (pa_.count, pa_.nulls, pa_.vmin, pa_.vmax, pa_.vsum) == \
            (pb_.count, pb_.nulls, pb_.vmin, pb_.vmax, pb_.vsum)
        if pa_.hll is not None:
            assert pa_.hll.estimate() == pb_.hll.estimate()
        if pa_.tdigest is not None:
            # merge order may differ -> tiny quantile drift is allowed
            qa, qb = pa_.tdigest.quantile(0.5), pb_.tdigest.quantile(0.5)
            assert abs(qa - qb) <= 0.05 * max(abs(qa), 1.0)


def test_grouped_tdigest_accuracy(ray_session):
    """Per-group digests merged across blocks land near numpy's true
    quantiles for skewed per-group distributions."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_tdigest

    rng = np.random.default_rng(8)
    frames = []
    truth = {}
    for k, (mu, sig) in {"a": (10, 2), "b": (100, 30), "c": (0.5, 0.1)}.items():
        v = rng.normal(mu, sig, 20000)
        frames.append(pd.DataFrame({"k": k, "v": v}))
        truth[k] = np.quantile(v, [0.1, 0.5, 0.9])
    ds = rd.from_pandas(pd.concat(frames, ignore_index=True)).repartition(16)
    digests = grouped_tdigest(ds, "k", "v")
    assert set(digests) == set(truth)
    for k, td in digests.items():
        for q, want in zip([0.1, 0.5, 0.9], truth[k]):
            got = td.quantile(q)
            span = truth[k][2] - truth[k][0]
            assert abs(got - want) <= 0.05 * span, (k, q, got, want)


def test_grouped_hll_accuracy_and_reblocking(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_hll

    rng = np.random.default_rng(12)
    frames = []
    truth = {}
    for k, card in {"x": 50, "y": 5000, "z": 1}.items():
        v = rng.integers(0, card, 20000)
        frames.append(pd.DataFrame({"k": k, "v": v}))
        truth[k] = len(np.unique(v))
    df = pd.concat(frames, ignore_index=True)
    a = grouped_hll(rd.from_pandas(df).repartition(4), "k", "v")
    b = grouped_hll(rd.from_pandas(df).repartition(17), "k", "v")
    for k, n in truth.items():
        assert abs(a[k].estimate() / n - 1) <= 0.05, (k, a[k].estimate(), n)
        assert a[k].estimate() == b[k].estimate()  # register merges commute


def test_exact_quantiles_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.stats import exact_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, 3000).astype(np.float64)
    vals[::17] = np.nan  # nulls must be dropped, like quantile_disc
    col = pa.array(vals)
    col = col.is_valid().combine_chunks() if False else col
    tbl = pa.table({"x": pa.array([None if np.isnan(v) else v
                                   for v in vals], pa.float64())})
    ds = rd.from_arrow(tbl).repartition(5)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = exact_quantiles(ds, "x", qs).to_pydict()
    con = duckdb.connect()
    con.register("t", tbl)
    for q, v in zip(got["q"], got["value"]):
        want = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert v == want, (q, v, want)
    assert sorted(got["q"]) == qs


def test_exact_quantiles_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.stats import exact_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array([None, None], pa.float64())}))
    out = exact_quantiles(ds, "x", [0.5])
    assert out.num_rows == 0


def test_histogram_fixed_edges_and_nulls(ray_session):
    """width_bucket edge semantics: below-lo -> 0, exact boundary -> upper
    bin, >= hi -> n_bins+1; NULLs excluded; counts exact."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.stats import histogram_fixed

    rng = np.random.default_rng(31)
    v = np.round(rng.random(20000) * 120 - 10, 2)        # spans [-10, 110)
    v[::97] = 50.0                                        # exact boundary
    v[::53] = 100.0                                       # == hi
    df = pd.DataFrame({"v": v})
    df.loc[::41, "v"] = np.nan
    out = (histogram_fixed(rd.from_pandas(df).repartition(9), "v",
                           lo=0.0, hi=100.0, n_bins=10)
           .to_pandas().sort_values("bin").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT CAST(CASE WHEN v < 0.0 THEN 0
                         WHEN v >= 100.0 THEN 11
                         ELSE floor((v - 0.0) / 100.0 * 10) + 1
                    END AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
          FROM df WHERE v IS NOT NULL GROUP BY 1 ORDER BY bin""").df()
    assert out["bin"].tolist() == exp["bin"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()
    assert out["n"].sum() == df["v"].notna().sum()


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9])
def test_grouped_exact_quantile_matches_quantile_disc(ray_session, q):
    """Distributed selection parity with DuckDB quantile_disc per group,
    under a 85%-hot group, duplicate values, and NULLs."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_exact_quantile

    rng = np.random.default_rng(int(q * 100))
    n = 30000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.85, "hot",
                      rng.integers(0, 6, n).astype(str)),
        "v": np.round(rng.random(n) * 1000, 1),   # heavy ties at 1dp
    })
    df.loc[::37, "v"] = np.nan
    out = (grouped_exact_quantile(rd.from_pandas(df).repartition(12),
                                  "k", "v", q, bucket_width=50.0)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql(f"""SELECT k, quantile_disc(v, {q}) AS qvalue
                           FROM df GROUP BY k ORDER BY k""").df()
    assert out["k"].tolist() == exp["k"].tolist()
    assert out["qvalue"].tolist() == exp["qvalue"].tolist()  # bit-exact


def test_grouped_exact_quantile_fallback_parity(ray_session):
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.stats import (
        _exact_grouped_quantile_fallback, grouped_exact_quantile)

    rng = np.random.default_rng(77)
    df = pd.DataFrame({"k": rng.integers(0, 5, 4000).astype(np.int64),
                       "v": rng.integers(0, 500, 4000).astype(np.float64)})
    ds = rd.from_pandas(df).repartition(8)
    a = (grouped_exact_quantile(ds, "k", "v", 0.5, bucket_width=25.0)
         .to_pandas().sort_values("k").reset_index(drop=True))
    b = (_exact_grouped_quantile_fallback(ds, "k", "v", 0.5, "qvalue")
         .to_pandas().sort_values("k").reset_index(drop=True))
    assert a["qvalue"].tolist() == b["qvalue"].tolist()


def test_grouped_entropy_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_entropy

    rng = np.random.default_rng(43)
    n = 15000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.8, 0,
                      rng.integers(1, 40, n)).astype(np.int64),
        "v": rng.choice(list("abcdef"), n, p=[.5, .2, .1, .1, .05, .05]),
    })
    df.loc[::29, "v"] = None                     # entropy() skips NULLs
    out = (grouped_entropy(rd.from_pandas(df).repartition(10), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""SELECT k, ROUND(entropy(v), 6) AS entropy
                          FROM df GROUP BY k ORDER BY k""").df()
    assert out["k"].tolist() == exp["k"].tolist()
    assert np.allclose(out["entropy"], exp["entropy"], atol=2e-6)


def test_chi2_independence(ray_session):
    """Contingency chi-square vs a local numpy reference, including
    zero-observed cells (their (O-E)^2/E = E term must be counted) and the
    cell-budget guard."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from schema_validator_ray.stages.stats import chi2_independence

    rng = np.random.default_rng(4)
    n = 6000
    a = rng.choice(["x", "y", "z"], n, p=[0.5, 0.3, 0.2])
    # b depends on a for 'x' rows -> non-trivial chi2; ('z','h2') never occurs
    b = np.where(a == "x",
                 rng.choice(["h0", "h1"], n, p=[0.8, 0.2]),
                 rng.choice(["h0", "h1", "h2"], n))
    b = np.where((a == "z") & (b == "h2"), "h0", b)
    df = pd.DataFrame({"a": a, "b": b})
    df.loc[::53, "a"] = None                     # nulls drop

    out = (chi2_independence(rd.from_pandas(df).repartition(9), "a", "b")
           .to_pandas())
    d = df.dropna()
    obs = pd.crosstab(d["a"], d["b"]).to_numpy().astype(float)
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / obs.sum()
    assert obs.min() == 0.0                      # the zero cell exists
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert out["chi2"].iloc[0] == round(chi2, 6)
    assert out["dof"].iloc[0] == 2 * 2
    assert out["n"].iloc[0] == len(d)

    with pytest.raises(ValueError, match="budget"):
        chi2_independence(rd.from_pandas(
            pd.DataFrame({"a": np.arange(100), "b": np.arange(100)})),
            "a", "b", level_budget=10)


def test_grouped_linreg(ray_session):
    """Slope/intercept match numpy polyfit per group; zero-x-variance group
    yields NULL; pairwise nulls excluded."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from schema_validator_ray.stages.stats import grouped_linreg

    rng = np.random.default_rng(3)
    n = 5000
    g = rng.choice(["up", "down", "flatx"], n)
    x = rng.uniform(0, 100, n)
    x[g == "flatx"] = 42.0                       # no x variance
    y = np.where(g == "up", 3.0 * x + 7, -1.5 * x + 2) \
        + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    df.loc[::71, "y"] = np.nan
    out = (grouped_linreg(rd.from_pandas(df).repartition(8), "g", "x", "y")
           .to_pandas().set_index("g"))
    for grp, want in (("up", 3.0), ("down", -1.5)):
        sub = df[(df["g"] == grp) & df["y"].notna()]
        slope, intercept = np.polyfit(sub["x"], sub["y"], 1)
        assert out.loc[grp, "slope"] == pytest.approx(slope, rel=1e-6)
        assert out.loc[grp, "intercept"] == pytest.approx(intercept,
                                                          rel=1e-4)
        assert out.loc[grp, "n"] == len(sub)
        assert abs(out.loc[grp, "slope"] - want) < 0.05
    assert np.isnan(out.loc["flatx", "slope"])
    assert np.isnan(out.loc["flatx", "intercept"])


def test_welch_ttest(ray_session):
    """t and dof match scipy-free closed-form reference on planted shift;
    degenerate sides (n<2 / missing group) yield nulls."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from schema_validator_ray.stages.stats import welch_ttest

    rng = np.random.default_rng(5)
    a = rng.normal(10.0, 2.0, 4000)
    b = rng.normal(10.5, 3.0, 2500)
    df = pd.DataFrame({
        "g": ["a"] * len(a) + ["b"] * len(b) + ["c"] * 50,
        "v": np.r_[a, b, rng.normal(0, 1, 50)]})
    df.loc[::113, "v"] = np.nan
    out = (welch_ttest(rd.from_pandas(df).repartition(7), "g", "v", "a", "b")
           .to_pandas().iloc[0])
    aa = df.loc[(df["g"] == "a") & df["v"].notna(), "v"].to_numpy()
    bb = df.loc[(df["g"] == "b") & df["v"].notna(), "v"].to_numpy()
    va, vb = aa.var(ddof=1), bb.var(ddof=1)
    se2 = va / len(aa) + vb / len(bb)
    t_ref = (aa.mean() - bb.mean()) / np.sqrt(se2)
    dof_ref = se2 ** 2 / ((va / len(aa)) ** 2 / (len(aa) - 1)
                          + (vb / len(bb)) ** 2 / (len(bb) - 1))
    assert out["t"] == pytest.approx(t_ref, rel=1e-9)
    assert out["dof"] == pytest.approx(dof_ref, rel=1e-9)
    assert out["n_a"] == len(aa) and out["n_b"] == len(bb)
    # missing side -> nulls
    out2 = (welch_ttest(rd.from_pandas(df), "g", "v", "a", "zzz")
            .to_pandas().iloc[0])
    assert np.isnan(out2["t"]) and out2["n_b"] == 0


def test_histogram_fixed_literal_nan_in_nonnull_column(ray_session):
    """A literal NaN in a float column with null_count == 0 must be masked
    (review fix: floor(NaN) escaped both where-clamps as an undefined
    int64 bin index)."""
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.stats import histogram_fixed

    t = pa.table({"v": pa.array([1.0, np.nan, 5.0, np.nan, 9.0],
                                pa.float64())})
    assert t["v"].null_count == 0
    out = {r["bin"]: r["n"]
           for r in histogram_fixed(rd.from_arrow(t).repartition(2), "v",
                                    lo=0.0, hi=10.0, n_bins=5).take_all()}
    assert out == {1: 1, 3: 1, 5: 1}
