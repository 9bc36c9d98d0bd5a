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
