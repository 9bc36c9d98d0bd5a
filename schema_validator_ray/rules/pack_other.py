"""Presence / conditional-requirement / misc rules.

Parity: /root/reference/rule/other.go. Emptiness is ``IsNilOrZero``
(data/value.go:101-118) compiled to a vectorized mask per Arrow type (see
``kernels.is_empty_mask``). The conditional families read sibling columns —
row-local masks, no shuffle.

``unique`` keeps the reference's placeholder semantics (always pass,
rule/other.go:311-316); the *distributed* uniqueness check with real semantics
lives in ``stages/uniqueness.py`` as a table-level operator (the north rule).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import SKIP_REST_IF_EMPTY, CompileContext, register
from .kernels import (
    as_str,
    compare_literal_kernel,
    get_path,
    is_empty_mask,
    np_bool,
    regex_pass,
)


@register("required")
def _required(ctx: CompileContext):
    def kernel(col, tbl):
        return ~is_empty_mask(col)

    return kernel


@register("isdefault")
def _isdefault(ctx: CompileContext):
    def kernel(col, tbl):
        return is_empty_mask(col)

    return kernel


@register("omitempty")
def _omitempty(ctx: CompileContext):
    return SKIP_REST_IF_EMPTY


@register("len")
def _len(ctx: CompileContext):
    n = int(ctx.param(0))
    is_bin = (pa.types.is_binary(ctx.dtype)
              or pa.types.is_large_binary(ctx.dtype))

    def kernel(col, tbl):
        src = col if is_bin else as_str(col)  # no UTF-8 cast for raw bytes
        return np_bool(pc.equal(pc.binary_length(src).fill_null(0), n))

    return kernel


@register("min")
def _min(ctx: CompileContext):
    return compare_literal_kernel("gte", ctx.dtype, ctx.param(0), ctx.column)


@register("max")
def _max(ctx: CompileContext):
    return compare_literal_kernel("lte", ctx.dtype, ctx.param(0), ctx.column)


@register("oneof")
def _oneof(ctx: CompileContext):
    values = pa.array(list(ctx.params), type=pa.string())

    def kernel(col, tbl):
        return np_bool(pc.is_in(as_str(col), value_set=values))

    return kernel


# --- filesystem-flavored rules (env-dependent ones are excluded from the image
# profile; kept for API parity) ----------------------------------------------


@register("dir")
def _dir(ctx: CompileContext):
    def kernel(col, tbl):
        vals = as_str(col).to_pylist()
        return np.fromiter((os.path.isdir(v) for v in vals), bool, len(vals))

    return kernel


@register("file")
def _file(ctx: CompileContext):
    def kernel(col, tbl):
        vals = as_str(col).to_pylist()
        return np.fromiter((os.path.isfile(v) for v in vals), bool, len(vals))

    return kernel


register("dirpath")(lambda ctx: regex_pass(r"^/|/"))


@register("filepath")
def _filepath(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        return (np_bool(pc.match_substring(s, "/"))
                | np_bool(pc.match_substring(s, "\\")))

    return kernel


@register("image")
def _image(ctx: CompileContext):
    # filename-extension membership (rule/other.go:74-82); the real decode check
    # for the image profile is the stages/images.py actor stage
    def kernel(col, tbl):
        return np_bool(pc.match_substring_regex(
            as_str(col), r"(?i)\.(jpg|jpeg|png|gif|bmp|tiff|webp)$"))

    return kernel


@register("unique")
def _unique(ctx: CompileContext):
    # reference placeholder: always passes (rule/other.go:311-316)
    def kernel(col, tbl):
        return np.ones(len(col), bool)

    return kernel


# --- conditional requirement families ----------------------------------------


def _check_sibling(ctx: CompileContext, field: str) -> None:
    """Compile-time existence check for referenced sibling columns — the abort
    channel fires at compile, not inside a Ray task."""
    if ctx.schema is not None:
        from .kernels import _schema_path_type

        _schema_path_type(ctx.schema, field)


def _sibling_eq_mask(tbl: pa.Table, field: str, expected: str) -> np.ndarray:
    """compareValue(Equal, sibling, expected) with the type dispatch resolved on
    the sibling column's Arrow type (string params per the tag DSL)."""
    col = get_path(tbl, field)
    t = col.type
    from .kernels import is_numeric, is_stringlike

    if is_numeric(t):
        try:
            num = float(expected) if pa.types.is_floating(t) else int(expected)
        except ValueError:
            return np.zeros(len(col), bool)
        return np_bool(pc.equal(col, pa.scalar(num, type=t)))
    if is_stringlike(t):
        try:
            iv = int(expected)
            return np_bool(pc.equal(pc.binary_length(col), iv))
        except ValueError:
            return np_bool(pc.equal(col, expected))
    if pa.types.is_boolean(t):
        return np_bool(pc.equal(col, expected.lower() in ("true", "1")))
    return np_bool(pc.equal(as_str(col), expected))


def _required_cond(invert: bool):
    def factory(ctx: CompileContext):
        field, expected = ctx.param(0), ctx.param(1)
        _check_sibling(ctx, field)

        def kernel(col, tbl):
            cond = _sibling_eq_mask(tbl, field, expected)
            if invert:
                cond = ~cond
            return ~(cond & is_empty_mask(col))

        return kernel

    return factory


register("required_if")(_required_cond(invert=False))
register("required_unless")(_required_cond(invert=True))


def _excluded_cond(invert: bool):
    def factory(ctx: CompileContext):
        field, expected = ctx.param(0), ctx.param(1)
        _check_sibling(ctx, field)

        def kernel(col, tbl):
            cond = _sibling_eq_mask(tbl, field, expected)
            if invert:
                cond = ~cond
            return ~(cond & ~is_empty_mask(col))

        return kernel

    return factory


register("excluded_if")(_excluded_cond(invert=False))
register("excluded_unless")(_excluded_cond(invert=True))


def _presence_family(kind: str, required: bool):
    """kind: 'with' (ANY present), 'with_all', 'without' (ANY absent),
    'without_all'. required=True -> value must be present when cond holds;
    False -> value must be empty when cond holds."""

    def factory(ctx: CompileContext):
        fields = list(ctx.params)
        if not fields:
            from ..registry import CompileError

            raise CompileError(f"{kind}: needs at least one field name")
        for f in fields:
            _check_sibling(ctx, f)

        def kernel(col, tbl):
            present = [~is_empty_mask(get_path(tbl, f)) for f in fields]
            stack = np.vstack(present)
            if kind == "with":
                cond = stack.any(axis=0)
            elif kind == "with_all":
                cond = stack.all(axis=0)
            elif kind == "without":
                cond = (~stack).any(axis=0)
            else:  # without_all
                cond = (~stack).all(axis=0)
            empty = is_empty_mask(col)
            if required:
                return ~(cond & empty)
            return ~(cond & ~empty)

        return kernel

    return factory


register("required_with")(_presence_family("with", required=True))
register("required_with_all")(_presence_family("with_all", required=True))
register("required_without")(_presence_family("without", required=True))
register("required_without_all")(_presence_family("without_all", required=True))
register("excluded_with")(_presence_family("with", required=False))
register("excluded_with_all")(_presence_family("with_all", required=False))
register("excluded_without")(_presence_family("without", required=False))
register("excluded_without_all")(_presence_family("without_all", required=False))
