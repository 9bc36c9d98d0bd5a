"""Edit-distance (Levenshtein ≤ 1) similarity join: brute-force parity on a
planted-typo vocabulary; the O(len) ed≤1 kernel against a reference DP."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from schema_validator_ray.stages.fuzzy import _ed_le_1, edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


def test_ed1_kernel_matches_dp():
    rng = np.random.default_rng(5)
    words = ["abc", "abcd", "bbc", "ab", "abce", "xbcd", "", "a", "文字",
             "文学", "abdc", "acbd"]
    for a in words:
        for b in words:
            assert _ed_le_1(a, b) == (_lev(a, b) <= 1), (a, b)


def test_edit_distance_pairs_planted_typos(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = ["widget", "gadget", "sprocket", "flange", "gizmo", "bracket",
            "grommet", "washer", "spindle", "ratchet"]
    vocab = set(base)
    for w in base[:6]:                      # plant sub/del/ins typos
        i = rng.integers(0, len(w))
        vocab.add(w[:i] + "x" + w[i + 1:])  # substitution
        vocab.add(w[:i] + w[i + 1:])        # deletion
        vocab.add(w[:i] + "q" + w[i:])      # insertion
    rows = rng.choice(sorted(vocab), 5000)  # heavy duplication of values
    df = pd.DataFrame({"name": rows})
    out = (edit_distance_pairs(rd.from_pandas(df).repartition(8), "name")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    names = sorted(set(df["name"]))
    exp = sorted((a, b) for i, a in enumerate(names)
                 for b in names[i + 1:] if _lev(a, b) <= 1)
    assert list(map(tuple, out[["a", "b"]].values.tolist())) == exp
    assert len(exp) >= 18                   # the planted typos are found


def test_edit_distance_pairs_matches_duckdb(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"name": ["cat", "bat", "cats", "at", "dog", "dug",
                                "dig", "digs", "cart", "card"] * 50})
    out = (edit_distance_pairs(rd.from_pandas(df), "name")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    exp = duckdb.sql("""
        WITH names AS (SELECT DISTINCT name FROM df)
        SELECT a.name AS a, b.name AS b FROM names a JOIN names b
          ON a.name < b.name AND levenshtein(a.name, b.name) <= 1
        ORDER BY a, b""").df()
    assert out.values.tolist() == exp.values.tolist()


def test_ed_le_2_kernel_matches_dp():
    from schema_validator_ray.stages.fuzzy import _ed_le

    words = ["abc", "abcd", "bbc", "ab", "abce", "xbcd", "", "a", "ax",
             "abdc", "acbd", "abcdef", "azcdzf", "zzzzzz", "abef"]
    for a in words:
        for b in words:
            for d in (1, 2):
                assert _ed_le(a, b, d) == (_lev(a, b) <= d), (a, b, d)


def test_edit_distance_pairs_d2_matches_duckdb(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"name": ["cat", "bat", "cats", "at", "dog", "dug",
                                "dig", "digs", "cart", "card", "carts",
                                "smart", "start", "sport", "spore"] * 40})
    out = (edit_distance_pairs(rd.from_pandas(df), "name", max_dist=2)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    exp = duckdb.sql("""
        WITH names AS (SELECT DISTINCT name FROM df)
        SELECT a.name AS a, b.name AS b FROM names a JOIN names b
          ON a.name < b.name AND levenshtein(a.name, b.name) <= 2
        ORDER BY a, b""").df()
    assert out.values.tolist() == exp.values.tolist()


def test_edit_distance_pairs_d2_brute_force_parity(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    base = ["widget", "gadget", "sprocket", "flange", "gizmo", "bracket"]
    vocab = set(base)
    for w in base:
        i = int(rng.integers(0, len(w) - 1))
        vocab.add(w[:i] + "xy" + w[i + 2:])        # double substitution
        vocab.add(w[:i] + w[i + 2:])               # double deletion
        vocab.add(w[:i] + "qz" + w[i:])            # double insertion
        vocab.add(w[:i] + "x" + w[i + 1:])         # single sub
    names = sorted(vocab)
    df = pd.DataFrame({"name": rng.choice(names, 3000)})
    out = (edit_distance_pairs(rd.from_pandas(df).repartition(6), "name",
                               max_dist=2)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    present = sorted(set(df["name"]))
    exp = sorted((a, b) for i, a in enumerate(present)
                 for b in present[i + 1:] if _lev(a, b) <= 2)
    assert list(map(tuple, out[["a", "b"]].values.tolist())) == exp
    assert len(exp) >= len(base)


def test_edit_distance_mega_bucket_raises_by_default(ray_session):
    """The loud-budget convention: an over-large deletion bucket would drop
    genuine pairs, so it must error unless skipping is opted into."""
    import ray.data as rd

    # many length-1 strings all share the "" deletion bucket
    names = [chr(ord("a") + i) for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame({"name": names * 10}))
    with pytest.raises(Exception) as ei:
        edit_distance_pairs(ds, "name", max_bucket=5).to_pandas()
    assert "mega" in str(ei.value) or "max_bucket" in str(ei.value)
    out = edit_distance_pairs(ds, "name", max_bucket=5,
                              on_mega_bucket="skip").to_pandas()
    # the "" bucket (all 20 singles) was skipped -> no pairs from it
    assert len(out) == 0
