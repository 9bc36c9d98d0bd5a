"""Distributed set operations: INTERSECT / EXCEPT (DISTINCT semantics),
single- or composite-key.

The reference's only set machinery is ``oneof`` (literal membership,
/root/reference/rule/other.go:104-111); table-level set ops are new-engine
surface. Shape: each side emits per-batch DISTINCT key tuples tagged with a
side flag (bounding any batch's shuffle rows at its distinct-tuple count — a
hot key contributes one row per batch, not one per occurrence), the union
groupby-MAXes the flags, and a map-side filter keeps the op's membership
pattern. One small exchange over distinct tuples; no row-level shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _keys(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def _tag_distinct(ds, keys: list[str], left: bool):
    l_flag, r_flag = (1, 0) if left else (0, 1)

    def part(b: pa.Table) -> pa.Table:
        u = b.select(keys).group_by(keys).aggregate([])
        n = u.num_rows
        return u.append_column(
            "_l", pa.array([l_flag] * n, pa.int8())).append_column(
            "_r", pa.array([r_flag] * n, pa.int8()))

    return ds.map_batches(part, batch_format="pyarrow")


def _set_op(left, right, key, op: str):
    from ray.data.aggregate import Max

    keys = _keys(key)
    both = (_tag_distinct(left, keys, True)
            .union(_tag_distinct(right, keys, False))
            .groupby(keys if len(keys) > 1 else keys[0])
            .aggregate(Max("_l", alias_name="_l"),
                       Max("_r", alias_name="_r")))

    def pick(b: pa.Table) -> pa.Table:
        in_l = pc.equal(b["_l"], 1)
        in_r = pc.equal(b["_r"], 1)
        mask = pc.and_(in_l, in_r) if op == "intersect" else \
            pc.and_(in_l, pc.invert(in_r))
        return b.filter(mask).select(keys)

    return both.map_batches(pick, batch_format="pyarrow")


def intersect_distinct(left, right, key):
    """``SELECT key(s) FROM left INTERSECT SELECT key(s) FROM right``."""
    return _set_op(left, right, key, "intersect")


def except_distinct(left, right, key):
    """``SELECT key(s) FROM left EXCEPT SELECT key(s) FROM right``."""
    return _set_op(left, right, key, "except")
