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


def _pick_fn(keys: list[str], op: str):
    def pick(b: pa.Table) -> pa.Table:
        in_l = pc.equal(b["_l"], 1)
        in_r = pc.equal(b["_r"], 1)
        mask = pc.and_(in_l, in_r) if op == "intersect" else \
            pc.and_(in_l, pc.invert(in_r))
        return b.filter(mask).select(keys)
    return pick


def _merge_tagged(tagged, keys: list[str], op: str, driver_merge_max: int,
                  rebuild):
    """Merge tagged per-batch distinct partials into the set-op result.

    Near-unique key tuples don't pre-reduce, so Ray's sort-aggregate fixed
    costs dominate the tiny flag merge. Below the budget, merge the narrow
    (keys, _l, _r) partials with ONE driver pyarrow group_by (the
    duplicate_keys fast path); above it, fall through to a distributed
    groupby over a fresh ``rebuild()`` of the partials (the consumed stream
    can't be re-iterated)."""
    from ray.data.aggregate import Max

    pick = _pick_fn(keys, op)
    if driver_merge_max:
        import ray.data as rd

        from ._collect import collect_up_to

        parts, over = collect_up_to(tagged, driver_merge_max)
        if not over:
            if not parts:
                return tagged.map_batches(pick, batch_format="pyarrow")
            agg = (pa.concat_tables(parts).group_by(keys)
                   .aggregate([("_l", "max"), ("_r", "max")]))
            merged = pa.table(
                {k: agg[k] for k in keys}
                | {"_l": agg["_l_max"], "_r": agg["_r_max"]})
            return rd.from_arrow(pick(merged))
        tagged = rebuild()

    both = (tagged.groupby(keys if len(keys) > 1 else keys[0])
            .aggregate(Max("_l", alias_name="_l"),
                       Max("_r", alias_name="_r")))
    return both.map_batches(pick, batch_format="pyarrow")


def _set_op(left, right, key, op: str, driver_merge_max: int = 5_000_000):
    keys = _keys(key)

    def build():
        return (_tag_distinct(left, keys, True)
                .union(_tag_distinct(right, keys, False)))

    return _merge_tagged(build(), keys, op, driver_merge_max, rebuild=build)


def intersect_distinct(left, right, key):
    """``SELECT key(s) FROM left INTERSECT SELECT key(s) FROM right``."""
    return _set_op(left, right, key, "intersect")


def except_distinct(left, right, key):
    """``SELECT key(s) FROM left EXCEPT SELECT key(s) FROM right``."""
    return _set_op(left, right, key, "except")


def set_op_same_source(ds, key, left_mask_fn, right_mask_fn, op: str,
                       driver_merge_max: int = 5_000_000):
    """INTERSECT / EXCEPT where BOTH sides are row subsets of ONE dataset
    (the common "clicked but never purchased" shape): a single scan emits
    each batch's left- and right-side distinct tuples already tagged,
    halving the input read vs two ``except_distinct`` scans. ``*_mask_fn``
    take the batch and return a boolean mask selecting that side's rows."""
    keys = _keys(key)

    def part(b: pa.Table) -> pa.Table:
        outs = []
        for mask_fn, l_flag, r_flag in ((left_mask_fn, 1, 0),
                                        (right_mask_fn, 0, 1)):
            u = (b.filter(mask_fn(b)).select(keys)
                 .group_by(keys).aggregate([]))
            n = u.num_rows
            outs.append(u.append_column(
                "_l", pa.array([l_flag] * n, pa.int8())).append_column(
                "_r", pa.array([r_flag] * n, pa.int8())))
        return pa.concat_tables(outs)

    tagged = ds.map_batches(part, batch_format="pyarrow")
    return _merge_tagged(tagged, keys, op, driver_merge_max,
                         rebuild=lambda: ds.map_batches(
                             part, batch_format="pyarrow"))
