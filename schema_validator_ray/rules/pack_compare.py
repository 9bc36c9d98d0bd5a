"""Literal comparison rules: eq / ne / gt / gte / lt / lte (+ ignore-case variants).

Semantics parity: /root/reference/rule/compare.go:11-105 via the shared comparison
core (rule/validators.go:73-136) — including the string byte-length quirk: a numeric
param against a string column compares ``len(value)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

from ..registry import CompileContext, register
from .kernels import as_str, compare_literal_kernel, np_bool


def _literal(op: str):
    def factory(ctx: CompileContext):
        return compare_literal_kernel(op, ctx.dtype, ctx.param(0), ctx.column)

    return factory


for _op in ("eq", "ne", "gt", "gte", "lt", "lte"):
    register(_op)(_literal(_op))


@register("eq_ignore_case")
def _eq_ignore_case(ctx: CompileContext):
    want = ctx.param(0).lower()

    def kernel(col, tbl):
        return np_bool(pc.equal(pc.utf8_lower(as_str(col)), want))

    return kernel


@register("ne_ignore_case")
def _ne_ignore_case(ctx: CompileContext):
    want = ctx.param(0).lower()

    def kernel(col, tbl):
        return ~np_bool(pc.equal(pc.utf8_lower(as_str(col)), want))

    return kernel
