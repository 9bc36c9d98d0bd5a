"""Dedup suite, similarity search, text analysis — planted-duplicate fixtures."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table():
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest chasing birds")
    rows = []
    for i in range(40):
        rows.append((i, f"unique document number {i} about topic {i * 7} "
                     f"with its own content body {i * 13}"))
    rows.append((100, base))
    rows.append((101, base))                           # exact dup of 100
    rows.append((102, base.replace("lazy", "sleepy")))  # near dup of 100
    rows.append((103, "totally different text entirely unrelated content"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


def test_exact_dedup(docs_ds, ray_session):
    from schema_validator_ray.stages.dedup import (
        dedup_exact_keep_min,
        exact_duplicate_groups,
    )

    groups = exact_duplicate_groups(docs_ds, "text", "doc_id").to_pandas()
    assert len(groups) == 1 and groups.dup_count.iloc[0] == 2
    kept = dedup_exact_keep_min(docs_ds, "text", "doc_id").to_pandas()
    assert len(kept) == 43  # 44 rows, one exact dup removed
    assert 100 in set(kept.doc_id) and 101 not in set(kept.doc_id)


def test_minhash_lsh_finds_near_dups(docs_ds, ray_session):
    from schema_validator_ray.stages.dedup import (
        minhash_lsh_pairs,
        verify_pairs_exact_jaccard,
    )

    pairs = minhash_lsh_pairs(docs_ds, "text", "doc_id", threshold=0.5)
    got = {(a, b) for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())}
    assert (100, 101) in got          # exact dup: jaccard 1.0
    assert (100, 102) in got or (101, 102) in got  # near dup
    assert all(a < 40 or a >= 100 for a, _ in got)

    exact = verify_pairs_exact_jaccard(docs_ds, pairs, "text", "doc_id",
                                       threshold=0.5)
    d = {(a, b): j for a, b, j in zip(exact["a"].to_pylist(),
                                      exact["b"].to_pylist(),
                                      exact["jaccard"].to_pylist())}
    assert d[(100, 101)] == 1.0
    assert 0.5 < d.get((100, 102), d.get((101, 102), 0)) < 1.0


def test_simhash_near_dups(docs_ds, ray_session):
    from schema_validator_ray.stages.dedup import simhash_pairs

    pairs = simhash_pairs(docs_ds, "text", "doc_id")
    got = {(a, b): h for a, b, h in zip(pairs["a"].to_pylist(),
                                        pairs["b"].to_pylist(),
                                        pairs["hamming"].to_pylist())}
    assert got.get((100, 101)) == 0   # identical text -> identical simhash
    assert (100, 103) not in got


def test_ngram_jaccard_exact_pairs(docs_ds, ray_session):
    """Prefix-filtered exact Jaccard join agrees with brute-force jaccard
    over the same code-point shingles, and only >= threshold pairs emit."""
    from schema_validator_ray.stages.dedup import (
        _cp_shingles,
        ngram_jaccard_pairs,
    )

    def brute(x, y, k=5):
        ra, rb = _cp_shingles(x, k), _cp_shingles(y, k)
        inter = len(np.intersect1d(ra, rb))
        return inter / (len(ra) + len(rb) - inter)

    tbl = _docs_table()
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = brute(texts[a], texts[b])
            if j >= 0.6:
                want[(a, b)] = round(j, 6)

    pairs = ngram_jaccard_pairs(docs_ds, "text", "doc_id", threshold=0.6)
    got = {(a, b): j for a, b, j in zip(pairs["a"].to_pylist(),
                                        pairs["b"].to_pylist(),
                                        pairs["jaccard"].to_pylist())}
    assert got == want
    assert got[(100, 101)] == 1.0     # exact dup
    assert (100, 102) in got          # near dup above threshold


def test_cp_shingles_short_and_unicode():
    from schema_validator_ray.stages.dedup import _cp_shingles

    # shorter than k: one space-padded shingle, matching SQL rpad semantics
    assert len(_cp_shingles("ab", 5)) == 1
    # (numpy S-dtype scalars strip trailing NULs on extraction)
    assert _cp_shingles("", 5)[0] == (b" \x00\x00\x00" * 5).rstrip(b"\x00")
    # unicode counts CHARACTERS (code points), like DuckDB length/substring
    s = _cp_shingles("héllo wörld", 5)
    assert len(s) == len("héllo wörld") - 4
    # distinctness: repeated text does not inflate the set
    assert len(_cp_shingles("ababababab", 2)) == 2


def test_embedding_near_dup_and_knn(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.dedup import embedding_near_dup_pairs
    from schema_validator_ray.stages.similarity import IVFIndex, knn_brute

    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    # rows 50/51 are near-identical to row 0
    extra = np.vstack([base[0] + 0.01 * rng.standard_normal(16),
                       base[0] + 0.01 * rng.standard_normal(16)])
    mat = np.vstack([base, extra])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(52), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), 16),
    })
    ds = rd.from_arrow(tbl)

    dups = embedding_near_dup_pairs(ds, "embedding", "vec_id", 16,
                                    threshold=0.99)
    got = {(a, b) for a, b in zip(dups["a"].to_pylist(), dups["b"].to_pylist())}
    assert {(0, 50), (0, 51), (50, 51)} <= got

    # brute top-k matches numpy reference exactly
    queries = mat[:3]
    knn = knn_brute(ds, queries, k=5).to_pandas()
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ q.T
    for qi in range(3):
        order = np.lexsort((np.arange(52), -np.round(sims[:, qi], 6)))[:5]
        want = list(order)
        got_ids = knn[knn.query_id == qi].neighbor_id.tolist()
        assert got_ids == want, (qi, got_ids, want)

    # IVF with full probe set == brute results
    ivf = IVFIndex(n_cells=4, n_probe=4).build(ds)
    ivf_res = ivf.search(queries, k=5).to_pandas()
    for qi in range(3):
        assert (ivf_res[ivf_res.query_id == qi].neighbor_id.tolist()
                == knn[knn.query_id == qi].neighbor_id.tolist())


def test_text_functions():
    import pyarrow.compute as pc

    from schema_validator_ray.functions.text import (
        content_hash,
        fingerprint64,
        lang_id,
        quality_score,
        token_count,
    )

    col = pa.array(["hello world foo", "", None, "a b", "der die das und ist"])
    assert token_count(col).to_pylist() == [3, 0, 0, 2, 5]

    langs = lang_id(pa.array([
        "the cat and the dog is in a house",
        "der hund und die katze ist nicht da",
        "el perro y la casa es un lugar",
        "le chien est dans la maison et je suis la",
        "你好世界你好世界你好",
        "xyzzy qwerty",
    ])).to_pylist()
    assert langs == ["en", "de", "es", "fr", "zh", "und"]

    q = quality_score(pa.array(["good plain text " * 20, "!!!???!!!", ""]))
    vals = q.to_pylist()
    assert vals[0] > 0.7 and vals[1] < 0.5 and vals[2] < 0.3

    ch = content_hash(pa.array(["x", "x", "y"])).to_pylist()
    assert ch[0] == ch[1] != ch[2]

    fp = fingerprint64(pa.array(["same doc text here", "same doc text here",
                                 "other"])).to_pylist()
    assert fp[0] == fp[1] != fp[2]


def test_dedup_exact_survivors(ray_session):
    """Full-row survivor dedup: per key the min-order row survives with all
    its columns, stable across re-blocking; hot key bounded by the per-batch
    combine (functionally: result equals a pandas drop_duplicates)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import dedup_exact

    rng = np.random.default_rng(21)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),   # 1 hot key below
        "o": rng.permutation(n).astype(np.int64),
        "payload": rng.random(n),
    })
    df.loc[: n // 2, "k"] = 7  # hot key: half the rows

    got = (dedup_exact(rd.from_pandas(df).repartition(9), "k", order_col="o")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values("o", kind="stable").drop_duplicates("k")
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "o", "payload"]],
                                  want[["k", "o", "payload"]])


def test_connected_components_union_find():
    import pyarrow as pa

    from schema_validator_ray.stages.dedup import connected_components

    # chain 1-2-3, pair 10-11, singleton 99 via all_ids
    pairs = pa.table({"a": pa.array([2, 1, 10], pa.int64()),
                      "b": pa.array([3, 2, 11], pa.int64())})
    out = connected_components(pairs, all_ids=[99, 1])
    m = dict(zip(out["id"].to_pylist(), out["rep"].to_pylist()))
    assert m == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_distributed_over_budget(ray_session):
    """Pairs exceeding the driver budget run the distributed label-propagation
    path and still return the exact min-id components — including a long
    chain (worst case without pointer jumping) and all_ids singletons."""
    import numpy as np
    import pyarrow as pa

    from schema_validator_ray.stages.dedup import connected_components

    rng = np.random.default_rng(5)
    # chain 0-1-...-40, two random clusters, a few cross links
    a = list(range(40))
    b = list(range(1, 41))
    for base in (100, 200):
        members = base + rng.permutation(20)
        a.extend(int(members[i]) for i in range(19))
        b.extend(int(members[i + 1]) for i in range(19))
    pairs = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
    all_ids = list(range(41)) + list(range(100, 120)) + \
        list(range(200, 220)) + [999]
    want = connected_components(pairs, all_ids=all_ids)          # union-find
    got = connected_components(pairs, all_ids=all_ids,
                               driver_pairs_max=0)               # distributed
    assert got.to_pydict() == want.to_pydict()
    m = dict(zip(got["id"].to_pylist(), got["rep"].to_pylist()))
    assert m[40] == 0 and m[119] == 100 and m[219] == 200 and m[999] == 999


def test_connected_components_distributed_string_ids(ray_session):
    import pyarrow as pa

    from schema_validator_ray.stages.dedup import connected_components

    pairs = pa.table({"a": pa.array(["d2", "d1", "x9"]),
                      "b": pa.array(["d3", "d2", "x8"])})
    got = connected_components(pairs, all_ids=["zz", "d1"],
                               driver_pairs_max=0)
    m = dict(zip(got["id"].to_pylist(), got["rep"].to_pylist()))
    assert m == {"d1": "d1", "d2": "d1", "d3": "d1",
                 "x8": "x8", "x9": "x8", "zz": "zz"}


def test_clean_and_redact_kernels():
    import pyarrow as pa

    from schema_validator_ray.functions.text import clean_text, redact_pii

    col = pa.array([
        "<p>Hi <b>there</b></p>\n\n  spaced\tout\x01\x02",
        "reach me at jane.doe+spam@example.co.uk or 020 7946 0958 ok",
        "no pii here", None,
    ])
    cleaned = clean_text(col).to_pylist()
    assert cleaned[0] == "Hi there spaced out"
    assert cleaned[3] == ""
    r = redact_pii(clean_text(col))
    assert "[EMAIL]" in r["text"].to_pylist()[1]
    assert "[PHONE]" in r["text"].to_pylist()[1]
    assert r["n_email"].to_pylist() == [0, 1, 0, 0]
    assert r["n_phone"].to_pylist() == [0, 1, 0, 0]


def test_minhash_pairs_to_distributed_components(ray_session):
    """End-to-end near-dup clustering: MinHash-LSH pairs over a corpus with
    planted clone clusters, fed to the DISTRIBUTED connected-components path
    — survivors (min doc_id per cluster) must match the driver union-find."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from schema_validator_ray.stages.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    rng = np.random.default_rng(21)
    texts, ids = [], []
    base_words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
                  "golf", "hotel", "india", "juliet", "kilo", "lima"]
    did = 0
    for cluster in range(12):
        words = rng.choice(base_words, 30, replace=True)
        doc = " ".join(words) + f" cluster{cluster}"
        for rep in range(4):                     # 4 near-clones per cluster
            texts.append(doc + (" tail" * rep))
            ids.append(did)
            did += 1
    for _ in range(20):                          # unique singletons
        texts.append(" ".join(rng.choice(base_words, 8, replace=False))
                     + f" unique{did}")
        ids.append(did)
        did += 1
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)})).repartition(4)
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)
    assert pairs.num_rows > 0
    want = connected_components(pairs, all_ids=ids)
    got = connected_components(pairs, all_ids=ids, driver_pairs_max=0)
    assert got.to_pydict() == want.to_pydict()
    # every planted cluster collapses to its min id
    m = dict(zip(got["id"].to_pylist(), got["rep"].to_pylist()))
    for c in range(12):
        members = [4 * c + r for r in range(4)]
        reps = {m[x] for x in members}
        assert reps == {4 * c}, (c, reps)
