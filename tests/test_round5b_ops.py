"""Round-5 batch-2 operators: Markov transition matrix, conversion
latency, TPC-H Q3-shape shipping priority, Zipf slope, cosine label
margin, term burstiness."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events_df(seed=7, n=400, n_users=23):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 3_600_000, n), unit="ms", utc=False),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup"], n),
    })


def test_transition_counts_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.funnel import transition_counts

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 2, 2, 3, 9],
        "ts": pd.to_datetime([10, 20, 30, 10, 15, 5, 1], unit="s"),
        "event_type": ["a", "b", "a", "a", "b", "a", "z"],
    })
    out = transition_counts(
        rd.from_pandas(df).repartition(3), user_col="user_id",
        ts_col="ts", type_col="event_type",
        tiebreak_col="event_id").to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    # user 1: a->b, b->a; user 2: a->b; users 3/9: single events
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_transition_counts_ts_tie_uses_tiebreak(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.funnel import transition_counts

    df = pd.DataFrame({
        "event_id": [2, 1],
        "user_id": [5, 5],
        "ts": pd.to_datetime([100, 100], unit="s"),
        "event_type": ["b", "a"],
    })
    out = transition_counts(
        rd.from_pandas(df), user_col="user_id", ts_col="ts",
        type_col="event_type", tiebreak_col="event_id").to_pandas()
    # event_id 1 ("a") precedes event_id 2 ("b") despite input order
    assert len(out) == 1
    assert (out.iloc[0]["prev_type"], out.iloc[0]["next_type"]) == ("a", "b")


def test_transition_counts_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.funnel import transition_counts

    df = _events_df()
    out = transition_counts(
        rd.from_pandas(df).repartition(5), user_col="user_id",
        ts_col="ts", type_col="event_type",
        tiebreak_col="event_id").to_pandas()
    got = out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute("""
        WITH seq AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events)
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE prev_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(
        got[["prev_type", "next_type", "n"]], exp, check_dtype=False)


def test_conversion_latency_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.funnel import conversion_latency

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 4, 4],
        "ts": pd.to_datetime([10, 40, 20, 50, 30, 5, 100, 100], unit="s"),
        "event_type": ["click", "purchase", "purchase",
                       "purchase", "click",        # u2: purchase AFTER click
                       "purchase",                 # u3: never clicked
                       "click", "purchase"],       # u4: same-instant convert
    })
    out = conversion_latency(
        rd.from_pandas(df).repartition(3), user_col="user_id",
        ts_col="ts", type_col="event_type", first="click",
        then="purchase").to_pandas().sort_values("user_id")
    # u1: click@10 -> first purchase at/after = 20 (not 40); u2: 50-30;
    # u3 dropped; u4: 0s (at-or-after includes the same instant)
    assert out["user_id"].tolist() == [1, 2, 4]
    assert out["latency_s"].tolist() == [10.0, 20.0, 0.0]


def test_conversion_latency_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.funnel import conversion_latency

    df = _events_df(seed=3)
    out = conversion_latency(
        rd.from_pandas(df).repartition(5), user_col="user_id",
        ts_col="ts", type_col="event_type", first="click",
        then="purchase").to_pandas()
    got = out.sort_values("user_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute("""
        WITH fc AS (SELECT user_id, min(ts) AS c_ts
                      FROM events WHERE event_type='click' GROUP BY 1),
        fp AS (SELECT e.user_id, min(e.ts) AS p_ts
                 FROM events e JOIN fc USING (user_id)
                WHERE e.event_type='purchase' AND e.ts >= fc.c_ts
                GROUP BY 1)
        SELECT fc.user_id,
               CAST(epoch_us(fp.p_ts) - epoch_us(fc.c_ts) AS DOUBLE)
                   / 1000000.0 AS latency_s
          FROM fc JOIN fp USING (user_id) ORDER BY 1
    """).df()
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_zipf_slope_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import zipf_slope_by_group

    # counts follow n(r) = 64 / r exactly -> slope of ln n on ln rank = -1
    words = []
    for r, w in enumerate(["aa", "bb", "cc", "dd", "ee", "ff"], start=1):
        words += [w] * (64 // r if r <= 4 else (64 // r))
    df = pd.DataFrame({"source": ["s1"] * 3,
                       "text": [" ".join(words)] + ["", ""]})
    out = zipf_slope_by_group(
        rd.from_pandas(df).repartition(2), "text", "source").to_pandas()
    assert out["source"].tolist() == ["s1"]
    # not exactly -1 (64//r truncates) but close and negative
    assert -1.1 < out["zipf_slope"].iloc[0] < -0.9


def test_zipf_slope_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.functions.text import zipf_slope_by_group

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    p = 1.0 / np.arange(1, 41)
    p /= p.sum()
    docs = [" ".join(rng.choice(vocab, size=rng.integers(20, 80), p=p))
            for _ in range(60)]
    df = pd.DataFrame({
        "doc_id": np.arange(60),
        "source": rng.choice(["web", "books", "code"], 60),
        "text": docs})
    out = zipf_slope_by_group(
        rd.from_pandas(df).repartition(4), "text", "source").to_pandas()
    got = out.sort_values("source").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute("""
        WITH c AS (
          SELECT source AS g, word AS w, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT source, unnest(regexp_split_to_array(
                      lower(COALESCE(text,'')), '[^a-z0-9]+')) AS word
                    FROM documents) t
           WHERE word <> '' GROUP BY 1, 2),
        r AS (SELECT g, ln(CAST(n AS DOUBLE)) AS y,
                     ln(CAST(ROW_NUMBER() OVER (
                         PARTITION BY g ORDER BY n DESC, w ASC) AS DOUBLE))
                         AS x
                FROM c),
        s AS (SELECT g, COUNT(*) AS k, SUM(x) sx, SUM(y) sy,
                     SUM(x*y) sxy, SUM(x*x) sxx FROM r GROUP BY g)
        SELECT g AS source, CAST(k AS BIGINT) AS n_terms,
               round_even((k*sxy - sx*sy) / (k*sxx - sx*sx), 6) AS zipf_slope
          FROM s WHERE k >= 2 ORDER BY source
    """).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_label_margin_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import label_cosine_margin

    # two tight clusters on orthogonal axes + one mislabeled point
    emb = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9],
           [0.95, 0.05]]                     # last one labeled B but near A
    df = pd.DataFrame({
        "vec_id": np.arange(5, dtype=np.int64),
        "embedding": emb,
        "label": np.array([0, 0, 1, 1, 1], np.int32)})
    out = label_cosine_margin(
        rd.from_pandas(df).repartition(2), emb_col="embedding",
        id_col="vec_id", label_col="label").to_pandas()
    out = out.set_index("vec_id")
    assert (out.loc[[0, 1, 2, 3], "margin"] > 0).all()
    assert out.loc[4, "margin"] < 0          # the planted mislabel


def test_label_margin_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.similarity import label_cosine_margin

    rng = np.random.default_rng(5)
    n, d = 120, 8
    emb = rng.normal(size=(n, d))
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [list(map(float, r)) for r in emb],
        "label": rng.integers(0, 4, n).astype(np.int32)})
    out = label_cosine_margin(
        rd.from_pandas(df).repartition(4), emb_col="embedding",
        id_col="vec_id", label_col="label").to_pandas()
    got = out.sort_values("vec_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("embeddings", df)
    exp = con.execute("""
        WITH m AS (
          SELECT a.vec_id, a.label AS la, b.label AS lb,
                 avg(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])))
                     AS mc
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
           GROUP BY 1, 2, 3)
        SELECT vec_id, la AS label,
               round_even(max(CASE WHEN la = lb THEN mc END), 6) AS a_self,
               round_even(max(CASE WHEN la <> lb THEN mc END), 6) AS b_other,
               round_even(max(CASE WHEN la = lb THEN mc END)
                          - max(CASE WHEN la <> lb THEN mc END), 6) AS margin
          FROM m GROUP BY 1, 2
        HAVING max(CASE WHEN la = lb THEN mc END) IS NOT NULL
           AND max(CASE WHEN la <> lb THEN mc END) IS NOT NULL
         ORDER BY vec_id
    """).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_term_burstiness_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import term_burstiness

    # "the" appears once per doc (VMR -> 0: no variance);
    # "cats" is bursty: 4 in one doc, 0 in the rest
    docs = ["the cats cats cats cats"] + ["the"] * 7
    df = pd.DataFrame({"doc_id": np.arange(8), "text": docs})
    out = term_burstiness(
        rd.from_pandas(df).repartition(3), "text", k=2).to_pandas()
    out = out.set_index("term")
    assert out.loc["the", "vmr"] == 0.0
    assert out.loc["cats", "vmr"] > 1.0


def test_term_burstiness_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.functions.text import term_burstiness

    rng = np.random.default_rng(19)
    vocab = [f"t{i}" for i in range(25)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(5, 60)))
            for _ in range(50)]
    df = pd.DataFrame({"doc_id": np.arange(50), "text": docs})
    got = term_burstiness(
        rd.from_pandas(df).repartition(4), "text", k=10).to_pandas()
    got = got.sort_values("term").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute("""
        WITH t AS (
          SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS x
            FROM (SELECT doc_id, unnest(regexp_split_to_array(
                      lower(COALESCE(text,'')), '[^a-z0-9]+')) AS word
                    FROM documents)
           WHERE word <> '' GROUP BY 1, 2),
        nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        s AS (SELECT word, SUM(x) AS sx, SUM(x*x) AS sx2
                FROM t GROUP BY word ORDER BY sx DESC, word ASC LIMIT 10)
        SELECT word AS term, CAST(sx AS BIGINT) AS total,
               round_even(sx / n, 6) AS mean_cnt,
               round_even(((sx2 - sx*sx/n) / (n - 1)) / (sx/n), 6) AS vmr
          FROM s, nd ORDER BY term
    """).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_value_emd_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.drift import value_emd

    # identical distributions -> EMD 0; shifted by +2 -> EMD 2
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4 + ["z"],
        "value": [1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0, 99.0]})
    out = value_emd(rd.from_pandas(df).repartition(3), value_col="value",
                    group_col="g", a="a", b="b")
    assert out["emd"].tolist() == [2.0]
    assert out["n_a"].tolist() == [4] and out["n_b"].tolist() == [4]

    same = value_emd(rd.from_pandas(df[df.g != "b"]), value_col="value",
                     group_col="g", a="a", b="a")
    # degenerate self-comparison guard: a vs a has zero CDF gap
    assert same["emd"].tolist() == [0.0]


def test_value_emd_matches_scipy_and_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.drift import value_emd

    rng = np.random.default_rng(23)
    va = np.round(rng.normal(10, 2, 300), 2)
    vb = np.round(rng.normal(11, 3, 200), 2)
    df = pd.DataFrame({
        "g": ["a"] * 300 + ["b"] * 200,
        "value": np.r_[va, vb]})
    out = value_emd(rd.from_pandas(df).repartition(5), value_col="value",
                    group_col="g", a="a", b="b")

    con = duckdb.connect()
    con.register("events", df.rename(columns={"g": "event_type"}))
    exp = con.execute("""
        WITH ev AS (SELECT value AS v, (event_type='a')::int AS ia,
                           (event_type='b')::int AS ib
                      FROM events WHERE event_type IN ('a','b')
                       AND value IS NOT NULL),
        c AS (SELECT v, SUM(ia) ca, SUM(ib) cb FROM ev GROUP BY v),
        t AS (SELECT v, SUM(ca) OVER (ORDER BY v) cum_a,
                     SUM(cb) OVER (ORDER BY v) cum_b,
                     LEAD(v) OVER (ORDER BY v) nxt FROM c),
        tot AS (SELECT CAST(SUM(ca) AS DOUBLE) na,
                       CAST(SUM(cb) AS DOUBLE) nb FROM c)
        SELECT round_even(SUM((nxt - v) * ABS(cum_a/na - cum_b/nb)), 6)
                   AS emd
          FROM t, tot WHERE nxt IS NOT NULL GROUP BY na, nb
    """).fetchone()[0]
    assert out["emd"].iloc[0] == exp

    try:
        from scipy.stats import wasserstein_distance
        assert abs(out["emd"].iloc[0]
                   - wasserstein_distance(va, vb)) < 1e-6
    except ImportError:
        pass


def test_hapax_rate_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import hapax_rate_by_group

    df = pd.DataFrame({
        "source": ["s1", "s1", "s2"],
        "text": ["aa bb aa", "cc", "xx xx yy zz"]})
    out = hapax_rate_by_group(
        rd.from_pandas(df).repartition(2), "text", "source").to_pandas()
    out = out.set_index("source")
    # s1 vocab {aa:2, bb:1, cc:1} -> 2/3 hapax; s2 {xx:2, yy:1, zz:1} -> 2/3
    assert out.loc["s1", "n_terms"] == 3 and out.loc["s1", "n_hapax"] == 2
    assert out.loc["s2", "hapax_rate"] == 2.0 / 3.0


def test_membership_rate_by_period_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.referential import (
        membership_rate_by_period,
    )

    rows = pd.DataFrame({
        "k": [1, 2, 3, 1, 9],
        "ts": pd.to_datetime(["2024-01-03", "2024-01-20", "2024-02-01",
                              "2024-02-15", "2024-02-20"])})
    side = pd.DataFrame({"k": [1, 3]})
    out = membership_rate_by_period(
        rd.from_pandas(rows).repartition(2), rd.from_pandas(side),
        "k", "ts", unit="month").to_pandas().sort_values("period")
    # Jan: k=1 flagged of {1,2} -> 0.5; Feb: {3,1} flagged of {3,1,9} -> 2/3
    assert out["n"].tolist() == [2, 3]
    assert out["n_flagged"].tolist() == [1, 2]
    assert out["flagged_rate"].tolist() == [0.5, 2.0 / 3.0]
