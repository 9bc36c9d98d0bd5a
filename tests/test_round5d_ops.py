"""Round-5 batch-4 operators: Tukey IQR outliers, exact trimmed mean,
key-size (skew/blocking) histogram, bigram LM scoring, int8 embedding
quantization error profile."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_iqr_outliers_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import iqr_outliers_by_group

    # group a: 1..9 plus a far outlier 100 and a low outlier -50.
    # group b: constant (IQR 0 -> only values != the constant flag).
    df = pd.DataFrame({
        "k": ["a"] * 11 + ["b"] * 4 + [None],
        "v": list(range(1, 10)) + [100.0, -50.0] + [5.0, 5.0, 5.0, 9.0]
             + [1.0],
        "id": range(16),
    })
    out = (iqr_outliers_by_group(rd.from_pandas(df).repartition(3),
                                 "k", "v", keep_cols=["id", "k", "v"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    # a: q1=3, q3=7 (quantile_disc over 11 values), IQR=4,
    # fences [-3, 13] -> 100 and -50 flagged
    assert set(out[out.k == "a"]["v"]) == {100.0, -50.0}
    # b: q1=q3=5 -> fences [5,5] -> 9 flagged
    assert set(out[out.k == "b"]["v"]) == {9.0}
    assert not out["k"].isna().any()


def test_iqr_outliers_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import iqr_outliers_by_group

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 400),
        "v": rng.standard_cauchy(400),
        "id": range(400),
    })
    out = (iqr_outliers_by_group(rd.from_pandas(df).repartition(4),
                                 "k", "v", keep_cols=["id"])
           .to_pandas())
    expect = set()
    for k, sub in df.groupby("k"):
        v = np.sort(sub["v"].to_numpy())
        q1 = v[max(int(np.ceil(0.25 * len(v))) - 1, 0)]
        q3 = v[max(int(np.ceil(0.75 * len(v))) - 1, 0)]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        expect |= set(sub[(sub.v < lo) | (sub.v > hi)]["id"])
    assert set(out["id"]) == expect and len(expect) > 0


def test_trimmed_mean_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import trimmed_mean_by_group

    # 1..20 with a giant tail value; 5%/95% disc quantiles over 21 values
    # are the 2nd and 20th order stats -> band [2, 20]
    df = pd.DataFrame({"k": ["g"] * 21,
                       "v": list(range(1, 21)) + [10_000.0]})
    out = (trimmed_mean_by_group(rd.from_pandas(df).repartition(3),
                                 "k", "v")
           .to_pandas())
    assert out.loc[0, "n_kept"] == 19
    assert out.loc[0, "trimmed_mean"] == round(sum(range(2, 21)) / 19, 6)


def test_trimmed_mean_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import trimmed_mean_by_group

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.choice(["x", "y"], 300),
                       "v": rng.exponential(5.0, 300)})
    out = (trimmed_mean_by_group(rd.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().set_index("k"))
    for k, sub in df.groupby("k"):
        v = np.sort(sub["v"].to_numpy())
        lo = v[max(int(np.ceil(0.05 * len(v))) - 1, 0)]
        hi = v[max(int(np.ceil(0.95 * len(v))) - 1, 0)]
        kept = sub["v"][(sub.v >= lo) & (sub.v <= hi)]
        assert out.loc[k, "n_kept"] == len(kept)
        assert out.loc[k, "trimmed_mean"] == round(kept.mean(), 6)


def test_key_size_histogram_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import key_size_histogram

    # sizes: a->3, b->3, c->1, d->2; null keys dropped
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "b", "c", "d", "d", None]})
    out = (key_size_histogram(rd.from_pandas(df).repartition(3), ["k"])
           .to_pandas().set_index("cluster_size"))
    assert out.loc[1, "n_keys"] == 1 and out.loc[1, "candidate_pairs"] == 0
    assert out.loc[2, "n_keys"] == 1 and out.loc[2, "candidate_pairs"] == 1
    assert out.loc[3, "n_keys"] == 2 and out.loc[3, "candidate_pairs"] == 6
    assert out["n_keys"].sum() == 4


def test_bigram_logprob_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import bigram_logprob_score

    docs = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "mat the on sat cat the",   # same unigrams, different bigrams
        "solo",                     # <2 tokens -> excluded
        "punct, only; here!",
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = (bigram_logprob_score(rd.from_pandas(df).repartition(2),
                                "text", "doc_id")
           .to_pandas().set_index("doc_id")["avg_bigram_logprob"])

    # brute force
    import re
    from collections import Counter
    tok = {i: [w for w in re.split(r"[^a-z0-9]+", d.lower()) if w]
           for i, d in enumerate(docs)}
    pairs = Counter(p for ws in tok.values() for p in zip(ws, ws[1:]))
    first = Counter()
    for (a, _), c in pairs.items():
        first[a] += c
    for i, ws in tok.items():
        ps = list(zip(ws, ws[1:]))
        if not ps:
            assert i not in out.index
            continue
        exp = np.mean([np.log(pairs[p] / first[p[0]]) for p in ps])
        assert abs(out.loc[i] - exp) < 1e-12
    # the shuffled doc must score strictly below the natural ones
    assert out.loc[2] < out.loc[0] and out.loc[2] < out.loc[1]


def test_scalar_quant_profile_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.pq import scalar_quant_profile

    rng = np.random.default_rng(3)
    v = rng.standard_normal((50, 5)).astype(np.float32)
    v[:, 4] = 0.0                                  # zero dim -> scale 0
    df = pd.DataFrame({"embedding": list(v)})
    out = (scalar_quant_profile(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("pos").reset_index(drop=True))
    v64 = v.astype(np.float64)
    scale = np.abs(v64).max(axis=0)
    with np.errstate(invalid="ignore"):
        q = np.round(v64 / scale * 127.0)
        err = np.abs(v64 - q * scale / 127.0)
    err = np.where(np.isnan(err), 0.0, err).max(axis=0)
    assert list(out["pos"]) == [1, 2, 3, 4, 5]
    np.testing.assert_allclose(out["scale"], scale, rtol=0, atol=0)
    np.testing.assert_allclose(out["max_abs_err"], err, rtol=0, atol=0)
    assert out.loc[4, "scale"] == 0.0 and out.loc[4, "max_abs_err"] == 0.0
    # int8 round-trip error is bounded by scale/254
    assert (out["max_abs_err"] <= out["scale"] / 254.0 + 1e-12).all()


def test_ar_bucket_assign_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.multimodal import (
        DEFAULT_AR_BUCKETS, ar_bucket_assign)

    rng = np.random.default_rng(5)
    w = rng.integers(16, 96, 200).astype(np.int64)
    h = rng.integers(16, 96, 200).astype(np.int64)
    df = pd.DataFrame({"image_id": [f"i{i}" for i in range(200)],
                       "w": w, "h": h})
    df.loc[0, "w"] = 0          # dropped
    out = (ar_bucket_assign(rd.from_pandas(df).repartition(3))
           .to_pandas().set_index("image_id"))
    assert "i0" not in out.index and len(out) == 199
    bar = np.log([bw / bh for bw, bh in DEFAULT_AR_BUCKETS])
    for i in (1, 7, 42, 199):
        exp = int(np.abs(np.log(w[i] / h[i]) - bar).argmin())
        assert out.loc[f"i{i}", "bucket_id"] == exp
        assert (out.loc[f"i{i}", "bucket_w"], out.loc[f"i{i}", "bucket_h"]) \
            == DEFAULT_AR_BUCKETS[exp]
    # square-ish images land on the 1024x1024 bucket
    sq = out[(out.w == out.h)]
    assert (sq["bucket_w"] == 1024).all() and (sq["bucket_h"] == 1024).all()


def test_ar_bucket_tie_breaks_to_first(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.multimodal import ar_bucket_assign

    # ladder 2:1 and 1:2 -> ratio 1:1 is equidistant; first entry wins
    df = pd.DataFrame({"image_id": ["a"], "w": [100], "h": [100]})
    out = ar_bucket_assign(rd.from_pandas(df),
                           buckets=[(200, 100), (100, 200)]).to_pandas()
    assert out.loc[0, "bucket_id"] == 0


def test_byte_exact_dedup_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.multimodal import byte_exact_dedup

    df = pd.DataFrame({
        "image_id": ["z", "a", "m", "b", "q"],
        "bytes": [b"xx", b"xx", b"yy", b"zz", None],
    })
    out = byte_exact_dedup(rd.from_pandas(df).repartition(3)).to_pandas()
    # "xx" -> min id "a"; null payload dropped
    assert sorted(out["image_id"]) == ["a", "b", "m"]


def test_byte_exact_dedup_distributed_path(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.multimodal import byte_exact_dedup

    df = pd.DataFrame({
        "image_id": [f"i{i:03d}" for i in range(60)],
        "bytes": [bytes([i % 20]) * 10 for i in range(60)],
    })
    a = sorted(byte_exact_dedup(rd.from_pandas(df).repartition(4))
               .to_pandas()["image_id"])
    b = sorted(byte_exact_dedup(rd.from_pandas(df).repartition(4),
                                driver_merge_max=0)
               .to_pandas()["image_id"])
    assert a == b == [f"i{i:03d}" for i in range(20)]
