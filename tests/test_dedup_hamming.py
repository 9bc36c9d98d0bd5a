"""hash_hamming_pairs: the generic int64 Hamming-band near-dup machinery
(text simhash, image phash, any derived 64-bit key).

Reference parity: the reference has no hamming dedup at all — this is one of
the engine's new training-data operators (SURVEY.md §2.7); the 4x16-bit band
scheme is the standard pigeonhole construction (complete for Hamming<=3)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from schema_validator_ray.stages.dedup import hash_hamming_pairs


def _brute_pairs(ids, hashes, max_hamming):
    out = []
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    ids = [ids[i] for i in order]
    hs = np.asarray(hashes, np.int64)[order].view(np.uint64)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = int(bin(int(hs[i] ^ hs[j])).count("1"))
            if d <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, d))
    return sorted(out)


def _got(tbl):
    return sorted(zip(tbl["a"].to_pylist(), tbl["b"].to_pylist(),
                      tbl["hamming"].to_pylist()))


def test_planted_clones_string_ids(ray_session):
    # base value, clones at Hamming 1/2/3 (found), 4 (excluded), far value
    base = 0x0123456789ABCDEF
    rows = {
        "img-a": base,
        "img-b": base ^ (1 << 5),                       # ham 1
        "img-c": base ^ (1 << 17) ^ (1 << 40),          # ham 2 from a
        "img-d": base ^ (1 << 0) ^ (1 << 21) ^ (1 << 63),  # ham 3, sign bit
        "img-e": base ^ 0xF0,                           # ham 4 from a
        "img-f": -0x7EDCBA9876543210,                   # far away
    }
    ids, hs = list(rows), [rows[k] for k in rows]
    ds = rd.from_arrow(pa.table({"image_id": pa.array(ids, pa.string()),
                                 "phash": pa.array(
                                     np.array(hs, np.uint64).view(np.int64),
                                     pa.int64())}))
    got = _got(hash_hamming_pairs(ds, "phash", "image_id", max_hamming=3))
    want = _brute_pairs(ids, np.array(hs, np.uint64).view(np.int64).tolist(), 3)
    assert got == want
    assert ("img-a", "img-b", 1) in got
    assert not any(a == "img-a" and b == "img-e" for a, b, _ in got)


def test_matches_brute_force_random(ray_session):
    rng = np.random.default_rng(3)
    n = 300
    base = rng.integers(-(2 ** 62), 2 ** 62, size=30)
    hs = []
    for i in range(n):
        b = int(base[i % len(base)])
        nflip = int(rng.integers(0, 5))  # 0..4 flips -> some pairs beyond 3
        for pos in rng.choice(64, size=nflip, replace=False):
            b = int(np.uint64(b) ^ (np.uint64(1) << np.uint64(pos)))
        hs.append(int(np.uint64(b).astype(np.int64)))
    ids = list(range(n))
    ds = rd.from_arrow(pa.table({"vid": pa.array(ids, pa.int64()),
                                 "h": pa.array(hs, pa.int64())})).repartition(4)
    got = _got(hash_hamming_pairs(ds, "h", "vid", max_hamming=3,
                                  max_bucket_size=4096))
    assert got == _brute_pairs(ids, hs, 3)
    assert len(got) > 100  # non-vacuous


def test_hot_bucket_exact_dups(ray_session):
    # one hot value repeated 40x (the skewed-phash scenario): all C(40,2)
    # hamming-0 pairs come out, and nothing else
    hot = 0x5A5A5A5A5A5A5A5A
    hs = [hot] * 40 + [int(x) for x in
                       np.random.default_rng(9).integers(-(2 ** 62), 2 ** 62,
                                                         size=200)]
    ids = list(range(len(hs)))
    ds = rd.from_arrow(pa.table({"i": pa.array(ids, pa.int64()),
                                 "h": pa.array(hs, pa.int64())}))
    got = _got(hash_hamming_pairs(ds, "h", "i", max_hamming=0))
    assert len(got) == 40 * 39 // 2
    assert all(d == 0 and a < b < 40 for a, b, d in got)


def test_max_hamming_guard():
    ds = rd.from_arrow(pa.table({"i": pa.array([1], pa.int64()),
                                 "h": pa.array([0], pa.int64())}))
    with pytest.raises(ValueError, match="max_hamming"):
        hash_hamming_pairs(ds, "h", "i", max_hamming=4)


def test_hamming_canonicalize_matches_brute(ray_session):
    """Clusters from union-find over brute hamming<=3 pairs; canonical =
    argmax score, tie min id — string ids, planted flips and singletons."""
    from schema_validator_ray.stages.dedup import hamming_canonicalize

    rng = np.random.default_rng(17)
    base_a = 0x0123456789ABCDEF
    base_b = -0x7EDCBA9876543210
    hs, ids, score = [], [], []
    for i in range(6):      # cluster A: <=3-bit flips off base_a
        v = base_a
        for bit in rng.choice(64, size=i % 4, replace=False):
            v ^= 1 << int(bit)
        hs.append(int(np.uint64(v).astype(np.int64)))
        ids.append(f"img-{i:03d}")
        score.append(int(rng.integers(10, 1000)))
    for i in range(6, 9):   # cluster B: exact dups of base_b
        hs.append(base_b)
        ids.append(f"img-{i:03d}")
        score.append(500)   # ties -> min id wins
    for i in range(9, 30):  # noise singletons
        hs.append(int(rng.integers(-(2 ** 62), 2 ** 62)))
        ids.append(f"img-{i:03d}")
        score.append(int(rng.integers(10, 1000)))

    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "ph": pa.array(hs, pa.int64()),
        "area": pa.array(score, pa.int64())})).repartition(4)
    out = hamming_canonicalize(ds, "ph", "image_id",
                               order=[("area", True)],
                               max_hamming=3, max_bucket_size=4096)
    got = dict(zip(*[out.to_pandas()[c] for c in
                     ("image_id", "canonical_id")]))

    # brute: union-find over hamming<=3 pairs, then argmax(area, -id)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    members = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(np.uint64(hs[x]) ^ np.uint64(hs[y])).count("1")
            if d <= 3:
                members |= {ids[x], ids[y]}
                rx, ry = find(ids[x]), find(ids[y])
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
    best = {}
    for i, s in zip(ids, score):
        if i not in members:
            continue
        r = find(i)
        if r not in best or (-s, i) < (-best[r][1], best[r][0]):
            best[r] = (i, s)
    exp = {i: best[find(i)][0] for i in members}
    assert got == exp
    assert len(got) >= 9  # both planted clusters present


def test_hamming_canonicalize_no_pairs(ray_session):
    from schema_validator_ray.stages.dedup import hamming_canonicalize

    ds = rd.from_arrow(pa.table({
        "i": pa.array(["a", "b"]),
        "h": pa.array([1 << 40, -(1 << 50)], pa.int64()),
        "s": pa.array([1, 2], pa.int64())}))
    out = hamming_canonicalize(ds, "h", "i", order=[("s", True)])
    assert out.count() == 0
