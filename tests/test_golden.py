"""Golden-output regression pins: the exact violation rows of the canonical
seed-42 synthetic table are frozen here. A change to synthesis, rule semantics,
or the evaluator that alters ANY violation row flips these hashes — update them
only for intentional semantic changes (and say so in the commit message).

The north rule requires per-partition violation rows to be exactly reproducible;
these hashes are that property made executable.
"""

import hashlib

import pyarrow as pa

from schema_validator_ray import compile_ruleset
from schema_validator_ray.pipelines.validate_images import IMAGE_SPEC
from schema_validator_ray.sources.synth import synth_batch

GOLDEN_META_HASH = "3d57ae0201c2b356e5815e79"
GOLDEN_META_ROWS = 158
GOLDEN_META_FAILED = 105


def _hash_violations(v: pa.Table) -> str:
    rows = sorted(
        f"{r['row_index']}|{r['rule_id']}|{r['column']}|{r['offending_value']}"
        for r in v.to_pylist())
    return hashlib.blake2b("\n".join(rows).encode(), digest_size=12).hexdigest()


def test_golden_metadata_violations():
    tbl = synth_batch(0, 2000, seed=42)
    cs = compile_ruleset(IMAGE_SPEC, tbl.schema)
    pm, v = cs.evaluate(tbl, id_column="image_id")
    assert v.num_rows == GOLDEN_META_ROWS
    assert int((~pm).sum()) == GOLDEN_META_FAILED
    assert _hash_violations(v) == GOLDEN_META_HASH


def test_golden_stable_across_batch_splits():
    """Evaluating the same rows in two half-batches produces the identical
    violation multiset (per-partition reproducibility under re-blocking)."""
    tbl = synth_batch(0, 2000, seed=42)
    cs = compile_ruleset(IMAGE_SPEC, tbl.schema)
    _, v_full = cs.evaluate(tbl, id_column="image_id")
    a, b = tbl.slice(0, 1000), tbl.slice(1000)
    _, va = cs.evaluate(a, id_column="image_id")
    _, vb = cs.evaluate(b, id_column="image_id")

    def keyset(v, offset=0):
        return sorted((r["row_index"] + offset, r["rule_id"], r["column"])
                      for r in v.to_pylist())

    assert keyset(va) + keyset(vb, offset=1000) == keyset(v_full)


# ---------------------------------------------------------------------------
# near-dup pair pins: outputs of the round-1 (driver-side) LSH implementations
# captured on /root/testdata/sf0.001 — the distributed rewrites must reproduce
# them bit-for-bit (rows sorted, json-dumped, blake2b-12).

GOLDEN_MINHASH_SF0001 = ("fdd550239242e8c37b6715ec", 28)
GOLDEN_SIMHASH_SF0001 = ("4b053973062093abf3bf61e6", 22)


def _hash_pairs(t: pa.Table) -> str:
    import json

    rows = sorted(map(list, zip(*[t[c].to_pylist() for c in t.column_names])))
    rows = [tuple(r) for r in rows]
    return hashlib.blake2b(json.dumps(rows).encode(), digest_size=12).hexdigest()


def test_golden_minhash_pairs(ray_session):
    from schema_validator_ray.stages.dedup import minhash_lsh_pairs
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    t = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.4)
    assert t.column_names == ["a", "b", "jaccard_est"]
    assert t.num_rows == GOLDEN_MINHASH_SF0001[1]
    assert _hash_pairs(t) == GOLDEN_MINHASH_SF0001[0]


def test_golden_simhash_pairs(ray_session):
    from schema_validator_ray.stages.dedup import simhash_pairs
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    t = simhash_pairs(ds, "text", "doc_id", max_hamming=3)
    assert t.column_names == ["a", "b", "hamming"]
    assert t.num_rows == GOLDEN_SIMHASH_SF0001[1]
    assert _hash_pairs(t) == GOLDEN_SIMHASH_SF0001[0]


def test_golden_minhash_narrow_path(ray_session):
    """The heavy-duplication (narrow candidates + sig joins) path must produce
    the identical pair table as the sig-carrying default."""
    from schema_validator_ray.stages.dedup import minhash_lsh_pairs
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    t = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.4,
                          sig_shuffle_max_rows=0)   # force the narrow path
    assert t.num_rows == GOLDEN_MINHASH_SF0001[1]
    assert _hash_pairs(t) == GOLDEN_MINHASH_SF0001[0]
