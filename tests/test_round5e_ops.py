"""Round-5 batch-5 operators: per-group Gini, Mann–Whitney U,
lifetime survival curve, Cramér's V, Coleman–Liau readability,
PII census."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute_gini(v: np.ndarray) -> float:
    v = np.sort(v.astype(np.int64))
    n = len(v)
    i = np.arange(1, n + 1, dtype=np.int64)
    s, t = float((i * v).sum()), float(v.sum())
    return round(2.0 * s / (n * t) - (n + 1.0) / n, 6)


def test_gini_by_group_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import gini_by_group

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 500),
        "v": rng.integers(1, 100_000, 500),
        "id": range(500),
    })
    out = (gini_by_group(rd.from_pandas(df).repartition(4), "k", "v",
                         tiebreak="id")
           .to_pandas().set_index("k"))
    for k, sub in df.groupby("k"):
        assert out.loc[k, "n"] == len(sub)
        assert out.loc[k, "gini"] == _brute_gini(sub["v"].to_numpy())


def test_gini_uniform_is_zero(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import gini_by_group

    df = pd.DataFrame({"k": ["a"] * 50, "v": [7] * 50, "id": range(50)})
    out = gini_by_group(rd.from_pandas(df), "k", "v",
                        tiebreak="id").to_pandas()
    assert float(out["gini"].iloc[0]) == 0.0


def test_mann_whitney_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import mann_whitney_u

    rng = np.random.default_rng(5)
    va = np.round(rng.normal(0.0, 1.0, 300), 1)     # forced ties
    vb = np.round(rng.normal(0.4, 1.0, 200), 1)
    df = pd.DataFrame({
        "g": ["a"] * 300 + ["b"] * 200 + ["other"] * 10,
        "v": np.concatenate([va, vb, np.zeros(10)]),
    })
    out = (mann_whitney_u(rd.from_pandas(df).repartition(5), "g", "v",
                          "a", "b").to_pandas().iloc[0])

    # brute midranks over the pooled a+b sample
    pooled = np.concatenate([va, vb])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), np.float64)
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0       # midrank of the tie run
        i = j
    ra = ranks[:300].sum()
    u = ra - 300 * 301 / 2.0
    assert out["n_a"] == 300 and out["n_b"] == 200
    assert abs(out["u_a"] - u) < 1e-6
    _, counts = np.unique(pooled, return_counts=True)
    tie = float((counts.astype(np.int64) ** 3 - counts).sum())
    n = 500.0
    sig2 = 300 * 200 / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
    z = (u - 300 * 200 / 2.0) / np.sqrt(sig2)
    assert abs(out["z"] - z) < 1e-6
    assert abs(out["auc"] - u / (300 * 200)) < 1e-6


def test_survival_curve_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import survival_curve

    # lifetimes in unit=10: user a spans 0 units, b spans 2, c spans 99
    # (clamped to max_k=3)
    rows = []
    for u, ts_list in [("a", [5]), ("b", [0, 25]), ("c", [0, 990])]:
        rows += [{"u": u, "ts": t} for t in ts_list]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = survival_curve(ds, "u", "ts", unit_us=10, max_k=3).to_pandas()
    assert list(out["k"]) == [0, 1, 2, 3]
    # n(k) = users with lifetime >= k units: all 3, then {b,c}, {b,c}, {c}
    assert list(out["n"]) == [3, 2, 2, 1]
    assert list(out["frac"]) == [1.0, round(2 / 3, 6), round(2 / 3, 6),
                                 round(1 / 3, 6)]


def test_survival_curve_distributed_fallback(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import survival_curve

    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame({
        "u": rng.integers(0, 60, n),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
    })
    small = survival_curve(rd.from_pandas(df).repartition(4), "u", "ts",
                           unit_us=100, max_k=5).to_pandas()
    forced = survival_curve(rd.from_pandas(df).repartition(4), "u", "ts",
                            unit_us=100, max_k=5,
                            merge_budget=1).to_pandas()
    assert list(small["n"]) == list(forced["n"])
    assert list(small["frac"]) == list(forced["frac"])


def test_cramers_v_perfect_association(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import cramers_v

    # a determines b exactly -> V = 1
    df = pd.DataFrame({"a": ["x"] * 40 + ["y"] * 60,
                       "b": [1] * 40 + [2] * 60})
    out = cramers_v(rd.from_pandas(df).repartition(3),
                    "a", "b").to_pandas().iloc[0]
    assert out["cramers_v"] == 1.0
    assert out["n"] == 100


def test_cramers_v_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import cramers_v

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], 600),
                       "b": rng.integers(0, 4, 600)})
    out = cramers_v(rd.from_pandas(df).repartition(4),
                    "a", "b").to_pandas().iloc[0]
    ct = pd.crosstab(df["a"], df["b"]).to_numpy().astype(float)
    n = ct.sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    v = np.sqrt(round(chi2, 6) / (n * (min(ct.shape) - 1)))
    assert abs(out["chi2"] - round(chi2, 6)) < 1e-6
    assert abs(out["cramers_v"] - v) < 1e-6


def test_readability_by_group_counts(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import readability_by_group

    df = pd.DataFrame({
        "src": ["a", "a", "b"],
        "text": ["Hello world. Yes!", "Go now?", None],
    })
    out = (readability_by_group(rd.from_pandas(df).repartition(2),
                                "text", "src")
           .to_pandas().set_index("source"))
    # a: letters 19 (HelloworldYes GoNow -> 10+3+2+3=18? count: Helloworld=10,
    # Yes=3, Go=2, now=3 -> 18), words 5, sentences 3
    assert out.loc["a", "n_docs"] == 2
    assert out.loc["a", "letters"] == 18
    assert out.loc["a", "words"] == 5
    assert out.loc["a", "sentences"] == 3
    lper = 18 / 5 * 100.0
    sper = 3 / 5 * 100.0
    assert out.loc["a", "cli"] == round(0.0588 * lper - 0.296 * sper
                                        - 15.8, 6)
    assert out.loc["b", "letters"] == 0 and out.loc["b", "n_docs"] == 1


def test_pii_census_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import pii_census_by_group

    df = pd.DataFrame({
        "src": ["a", "a", "b", "b"],
        "text": ["mail me a@b.com and c@d.org",
                 "no pii here",
                 "call +1 (555) 123-4567 now",
                 None],
    })
    out = (pii_census_by_group(rd.from_pandas(df).repartition(2),
                               "text", "src")
           .to_pandas().set_index("source"))
    assert out.loc["a", "n_docs"] == 2
    assert out.loc["a", "docs_with_email"] == 1
    assert out.loc["a", "n_emails"] == 2
    assert out.loc["a", "n_phones"] == 0
    assert out.loc["b", "docs_with_phone"] == 1
    assert out.loc["b", "n_phones"] == 1
    assert out.loc["b", "n_emails"] == 0
