"""Round-3 curation operators: repetition quality metrics, benchmark
decontamination, deterministic weighted sampling."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# repetition_stats


def test_repetition_stats_hand_values():
    from schema_validator_ray.functions.text import repetition_stats

    col = pa.array([
        "a b a b\na b a b",      # 2 identical lines; 8 toks, 2 distinct
        "x y z",                 # all unique
        "",                      # no tokens at all
        None,                    # null == empty
        "one one one two",       # top token 3/4
    ])
    out = repetition_stats(col)
    assert out["n_lines"].to_pylist() == [2, 1, 1, 1, 1]
    assert out["dup_line_frac"].to_pylist() == [0.5, 0.0, 0.0, 0.0, 0.0]
    assert out["dup_token_frac"].to_pylist() == [0.75, 0.0, 0.0, 0.0, 0.5]
    top = out["top_token_frac"].to_pylist()
    assert top[0] == 0.5 and top[4] == 0.75 and top[2] == 0.0
    assert abs(top[1] - 1 / 3) < 1e-12


def test_repetition_stats_case_and_punct_fold_into_tokens():
    from schema_validator_ray.functions.text import repetition_stats

    out = repetition_stats(pa.array(["Dog, dog! DOG?"]))
    # one distinct token 'dog' x3
    assert out["dup_token_frac"].to_pylist() == [1.0 - 1.0 / 3.0]
    assert out["top_token_frac"].to_pylist() == [1.0]


def test_ngram_repetition_stats_hand_values():
    from schema_validator_ray.functions.text import ngram_repetition_stats

    col = pa.array([
        "a b a b a b",   # bigrams: ab ba ab ba ab -> n=5, d=2, mx=3
        "x y z",         # xy yz -> all unique
        "w",             # < 2 tokens: no bigrams
        "",              # empty
        None,            # null == empty
    ])
    out = ngram_repetition_stats(col, 2)
    assert out["n_ngrams"].to_pylist() == [5, 2, 0, 0, 0]
    assert out["dup_ngram_frac"].to_pylist() == [1.0 - 2.0 / 5.0, 0.0,
                                                 0.0, 0.0, 0.0]
    assert out["top_ngram_frac"].to_pylist() == [3.0 / 5.0, 0.5,
                                                 0.0, 0.0, 0.0]


def test_ngram_repetition_stats_k3_and_case_fold():
    from schema_validator_ray.functions.text import ngram_repetition_stats

    out = ngram_repetition_stats(
        pa.array(["Cat dog cat Dog cat", "a b"]), 3)
    # trigrams: 'cat dog cat','dog cat dog','cat dog cat' -> n=3, d=2, mx=2
    assert out["n_ngrams"].to_pylist() == [3, 0]
    assert out["dup_ngram_frac"].to_pylist() == [1.0 - 2.0 / 3.0, 0.0]
    assert out["top_ngram_frac"].to_pylist() == [2.0 / 3.0, 0.0]


def test_oov_filter_planted(ray_session):
    import ray.data

    from schema_validator_ray.functions.text import oov_filter

    # vocab_k=2 -> vocabulary {'a','b'} (counts 4 and 3, beat 'z' x2 via
    # count then word tie-break); doc 3 is all-OOV, doc 4 has no tokens
    rows = [
        {"doc_id": 1, "text": "a a b z"},      # oov 1/4 = 0.25 -> keep
        {"doc_id": 2, "text": "a b a b"},      # oov 0.0 -> keep
        {"doc_id": 3, "text": "z q q q"},      # oov 1.0 -> drop
        {"doc_id": 4, "text": ""},             # no tokens -> drop
        {"doc_id": 5, "text": "a w w w"},      # oov 0.75 -> drop
    ]
    ds = ray.data.from_items(rows)
    out = oov_filter(ds, "text", "doc_id", vocab_k=2, max_oov_frac=0.5)
    got = {r["doc_id"]: r for r in out.take_all()}
    assert sorted(got) == [1, 2]
    assert got[1]["n_tokens"] == 4 and got[1]["oov_frac"] == 0.25
    assert got[2]["oov_frac"] == 0.0


# ---------------------------------------------------------------------------
# word_kgrams


def test_word_kgrams_rows_and_joins():
    from schema_validator_ray.functions.text import word_kgrams

    rows, sh = word_kgrams(pa.array(
        ["The quick  brown fox", "too short", None, "a b c d"]), 3)
    assert rows.tolist() == [0, 0, 3, 3]
    assert sh.to_pylist() == ["the quick brown", "quick brown fox",
                              "a b c", "b c d"]


def test_word_kgrams_never_crosses_rows():
    from schema_validator_ray.functions.text import word_kgrams

    # last token of row 0 + first tokens of row 1 must NOT form a shingle
    rows, sh = word_kgrams(pa.array(["p q", "r s"]), 2)
    assert sh.to_pylist() == ["p q", "r s"]
    assert rows.tolist() == [0, 1]


# ---------------------------------------------------------------------------
# decontaminate


def test_decontaminate_drops_only_overlapping_docs(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.decontam import decontaminate

    ev = rd.from_items([
        {"doc_id": 100, "text": "alpha beta gamma delta epsilon"},
    ])
    tr = rd.from_items([
        # shares the 4-gram 'beta gamma delta epsilon'
        {"doc_id": 1, "text": "xx beta gamma delta epsilon yy"},
        {"doc_id": 2, "text": "totally different words entirely here"},
        {"doc_id": 3, "text": "alpha beta gamma"},   # < k tokens overlap only
        {"doc_id": 4, "text": ""},
    ])
    got = sorted(r["doc_id"] for r in
                 decontaminate(tr, ev, text_col="text", k=4).take_all())
    assert got == [2, 3, 4]


def test_decontaminate_blocking_invariant(ray_session):
    import ray.data as rd

    from schema_validator_ray.sources.pq_read import read_parquet_clean
    from schema_validator_ray.stages.decontam import decontaminate

    docs = read_parquet_clean("/root/testdata/sf0.01/documents.parquet",
                              columns=["doc_id", "text"])

    def pick(b: pa.Table, want: bool) -> pa.Table:
        m = b["doc_id"].to_numpy(zero_copy_only=False) % 53 == 0
        return b.filter(pa.array(m if want else ~m))

    ev = docs.map_batches(lambda b: pick(b, True), batch_format="pyarrow")
    tr = docs.map_batches(lambda b: pick(b, False), batch_format="pyarrow")
    a = sorted(r["doc_id"] for r in
               decontaminate(tr, ev, text_col="text", k=4).take_all())
    b = sorted(r["doc_id"] for r in
               decontaminate(tr.repartition(13), ev, text_col="text",
                             k=4).take_all())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# weighted_sample_topk


def _brute_topk(ids: np.ndarray, w: np.ndarray, k: int, seed: int):
    from schema_validator_ray.stages.sampling import M32, _hash32

    u = (_hash32(ids, seed).astype(np.float64) + 0.5) / M32
    key = np.power(u, 1.0 / w.astype(np.float64))
    order = np.lexsort((ids, -key))
    return set(ids[order[:k]].tolist())


def test_weighted_sample_matches_brute_force(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.sampling import weighted_sample_topk

    rng = np.random.default_rng(5)
    ids = np.arange(2000)
    w = rng.integers(1, 1000, 2000)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "wt": w})).repartition(9)
    got = weighted_sample_topk(ds, "doc_id", "wt", 64, seed=2)
    got_ids = {r["doc_id"] for r in got.take_all()}
    assert got_ids == _brute_topk(ids, w, 64, 2)


def test_weighted_sample_prefers_heavy_rows(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.sampling import weighted_sample_topk

    # 100 heavy rows (weight 10_000) vs 900 light rows (weight 1): the
    # sample of 50 must be overwhelmingly heavy
    ids = np.arange(1000)
    w = np.where(ids < 100, 10_000, 1)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "wt": w}))
    got = {r["doc_id"] for r in
           weighted_sample_topk(ds, "doc_id", "wt", 50, seed=0).take_all()}
    assert sum(1 for i in got if i < 100) >= 45


def test_weighted_sample_rejects_nonpositive_weights(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.sampling import weighted_sample_topk

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "wt": [1, 0]}))
    with pytest.raises(Exception, match="strictly positive"):
        weighted_sample_topk(ds, "doc_id", "wt", 1).take_all()


def test_tfidf_top_terms_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.functions.text import tfidf_top_terms

    rng = np.random.default_rng(21)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
            for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": docs})
    out = (tfidf_top_terms(rd.from_pandas(df).repartition(5), "text",
                           "doc_id", k=2)
           .to_pandas().sort_values(["doc_id", "term"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(
                          lower(text), '[^a-z0-9]+')) AS w FROM df),
        tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) tf FROM toks
                WHERE w <> '' GROUP BY doc_id, w),
        dfx AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) df
                 FROM toks WHERE w <> '' GROUP BY w),
        n AS (SELECT CAST(count(*) AS DOUBLE) nn FROM df),
        sc AS (SELECT tf.doc_id, tf.w,
                      round(tf.tf * ln(n.nn / dfx.df), 6) AS score
                 FROM tf JOIN dfx USING (w) CROSS JOIN n)
        SELECT doc_id, w AS term, score FROM sc
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, w ASC) <= 2
        ORDER BY doc_id, term""").df()
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["term"].tolist() == exp["term"].tolist()
    assert np.allclose(out["score"], exp["score"])


def test_tfidf_vocab_budget_loud(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from schema_validator_ray.functions.text import tfidf_top_terms

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "e f g h"]})
    with pytest.raises(MemoryError):
        tfidf_top_terms(rd.from_pandas(df), "text", "doc_id",
                        vocab_broadcast_max=2).materialize()
