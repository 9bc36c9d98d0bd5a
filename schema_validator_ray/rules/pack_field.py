"""Cross-field (same-record) comparison rules.

Parity: /root/reference/rule/field.go:9-62. All are row-local column-vs-column
predicates — no shuffle is ever needed for these.

``fieldcontains`` / ``fieldexcludes`` have a column-valued pattern, which no Arrow
kernel supports; they fall back to a per-batch Python zip loop (rare rules, not on
hot paths — documented in SURVEY §2.2).
"""

from __future__ import annotations

import numpy as np

from ..registry import CompileContext, register
from .kernels import as_str, compare_field_kernel, get_path


def _field(op: str):
    def factory(ctx: CompileContext):
        return compare_field_kernel(op, ctx.dtype, ctx.param(0), ctx.column,
                                    schema=ctx.schema)

    return factory


register("eqfield")(_field("eq"))
register("nefield")(_field("ne"))
register("gtfield")(_field("gt"))
register("ltfield")(_field("lt"))
register("gtefield")(_field("gte"))
register("ltefield")(_field("lte"))


@register("fieldcontains")
def _fieldcontains(ctx: CompileContext):
    other = ctx.param(0)

    def kernel(col, tbl):
        cur = as_str(col).to_pylist()
        oth = as_str(get_path(tbl, other)).to_pylist()
        return np.fromiter((b in a for a, b in zip(cur, oth)), dtype=bool, count=len(cur))

    return kernel


@register("fieldexcludes")
def _fieldexcludes(ctx: CompileContext):
    other = ctx.param(0)

    def kernel(col, tbl):
        cur = as_str(col).to_pylist()
        oth = as_str(get_path(tbl, other)).to_pylist()
        return np.fromiter((b not in a for a, b in zip(cur, oth)), dtype=bool, count=len(cur))

    return kernel
