"""Salted inner join: exact multiplicity under hot probe keys and duplicate
build keys; char-entropy kernel parity with DuckDB."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from schema_validator_ray.stages.joins import salted_inner_join


def test_salted_join_hot_key_and_dup_build(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(41)
    n = 20000
    probe = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.85, 3,
                      rng.integers(0, 60, n)).astype(np.int64),
        "pid": np.arange(n, dtype=np.int64),
    })
    build = pd.DataFrame({
        "bk": np.r_[np.arange(50), [3, 3]].astype(np.int64),  # dup key 3
        "attr": np.r_[np.arange(50), [900, 901]].astype(np.int64),
    })
    out = (salted_inner_join(rd.from_pandas(probe).repartition(16),
                             rd.from_pandas(build), left_on="k",
                             right_on="bk", n_salts=8)
           .to_pandas())
    exp = duckdb.sql("""SELECT k, pid, attr FROM probe
                        JOIN build ON k = bk""").df()
    key = lambda d: sorted(map(tuple, d[["k", "pid", "attr"]].values.tolist()))
    assert key(out) == key(exp)                  # exact multiset equality


def test_salted_join_n_salts_invariant(ray_session):
    import ray.data as rd

    probe = pd.DataFrame({"k": np.arange(200, dtype=np.int64) % 7,
                          "pid": np.arange(200, dtype=np.int64)})
    build = pd.DataFrame({"bk": np.arange(7, dtype=np.int64),
                          "attr": np.arange(7, dtype=np.int64) * 10})

    def run(s):
        return sorted(map(tuple, salted_inner_join(
            rd.from_pandas(probe), rd.from_pandas(build),
            left_on="k", right_on="bk", n_salts=s)
            .to_pandas()[["pid", "attr"]].values.tolist()))

    assert run(1) == run(8)


def test_char_entropy_matches_duckdb(ray_session):
    from schema_validator_ray.functions.text import char_entropy

    texts = ["aaaa", "abab", "hello world", "文字文字abc", "",
             "the quick brown fox jumps over the lazy dog", "x",
             "aabbccddeeff0123456789"]
    got = char_entropy(pa.array(texts)).to_pylist()
    df = pd.DataFrame({"i": range(len(texts)), "t": texts})
    exp = duckdb.sql("""
        SELECT i, ROUND(entropy(c), 6) AS e
          FROM (SELECT i, unnest(string_split(t, '')) AS c FROM df)
         GROUP BY i ORDER BY i""").df()
    # '' produces a single empty-string element in SQL → entropy 0, same as
    # our 0.0 default; it still yields a row there, none needed here
    exp_map = dict(zip(exp["i"], exp["e"]))
    for i, t in enumerate(texts):
        want = exp_map.get(i, 0.0)
        assert abs(got[i] - want) < 1e-9, (t, got[i], want)


def test_dim_covariance_matches_numpy(ray_session):
    """Blocking-invariant sufficient-statistic covariance == np.cov
    (population) to 6dp."""
    import ray.data as rd

    from schema_validator_ray.stages.similarity import dim_covariance

    rng = np.random.default_rng(19)
    n, d = 3000, 6
    x = (rng.random((n, d)) * 10).astype(np.float32)
    tbl = pa.table({"emb": pa.array(list(x), pa.list_(pa.float32()))})

    def run(parts):
        return (dim_covariance(rd.from_arrow(tbl).repartition(parts),
                               emb_col="emb")
                .to_pandas().sort_values(["i", "j"]).reset_index(drop=True))

    a, b = run(3), run(11)
    assert a.values.tolist() == b.values.tolist()      # blocking-invariant
    c = np.cov(x.astype(np.float64).T, bias=True)
    iu, ju = np.triu_indices(d)
    exp = np.round(c[iu, ju], 6)
    assert np.allclose(a["cov"].to_numpy(), exp, atol=2e-6)
