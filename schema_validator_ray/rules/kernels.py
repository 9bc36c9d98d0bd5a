"""Vectorized kernel helpers shared by all rule packs.

Every kernel evaluates a whole Arrow column (one batch) at once and returns a numpy
boolean PASS mask. Null-handling convention (pinned by tests, documented divergences
from the reference in each pack):

- string-class kernels see nulls as ``""`` (the reference coerces nil -> "" via cast,
  so e.g. ``alpha`` passes vacuously on nil — we match that);
- numeric comparison kernels coerce null to the type's ZERO (the same cast-style
  weak typing: null fails ``min=1`` but passes ``max=N`` — missing values are
  `required`'s business; the reference's abort-on-nil channel is surfaced by
  `required`, divergence documented in SURVEY §7.4 and pinned by tests);
- emptiness semantics (``required`` / ``isdefault`` / ``excluded_*``) follow
  ``IsNilOrZero`` (/root/reference/data/value.go:101-118): null OR the type's zero value
  (0, "", empty binary, false); list columns: null only (a non-nil empty Go slice is not
  nil); timestamps: null only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# basic conversions


def combine(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def np_bool(arr, null_value: bool = False) -> np.ndarray:
    """pa.BooleanArray -> np.ndarray[bool] with nulls mapped to null_value."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null(null_value)
    return arr.to_numpy(zero_copy_only=False)


def as_str(col: pa.Array) -> pa.Array:
    """Coerce any column to string (nulls -> ""), mirroring the reference's
    cast-based ``Value.String()`` weak typing."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        s = col
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        s = pc.cast(col, pa.string())
    elif pa.types.is_boolean(t):
        # Go cast.ToString(true) == "true"
        s = pc.if_else(col, "true", "false")
    else:
        s = pc.cast(col, pa.string())
    return combine(pc.fill_null(s, ""))


def str_bytes_len(col: pa.Array) -> np.ndarray:
    """Byte length of the string form (Go ``len(str)`` is bytes, not runes)."""
    return np_bool_to_i64(pc.binary_length(as_str(col)))


def np_bool_to_i64(arr) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)


def is_numeric(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_decimal(t)
    )


def is_listlike(t: pa.DataType) -> bool:
    return (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    )


def is_stringlike(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


# ---------------------------------------------------------------------------
# emptiness (IsNilOrZero)


def is_empty_mask(col: pa.Array) -> np.ndarray:
    """True where the value counts as nil-or-zero."""
    t = col.type
    n = len(col)
    null = np_bool(pc.is_null(col), null_value=False) if col.null_count else np.zeros(n, bool)
    if is_numeric(t):
        zero = np_bool(pc.equal(col, pa.scalar(0, type=t)), null_value=False)
        return null | zero
    if is_stringlike(t):
        zero = np_bool(pc.equal(pc.binary_length(col), 0), null_value=False)
        return null | zero
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        zero = np_bool(pc.equal(pc.binary_length(col), 0), null_value=False)
        return null | zero
    if pa.types.is_boolean(t):
        zero = np_bool(pc.equal(col, False), null_value=False)
        return null | zero
    # lists, structs, maps, timestamps: null only
    return null


# ---------------------------------------------------------------------------
# regex kernels (RE2 via pyarrow => same engine family as Go's regexp; in
# particular `$` means end-of-text, not end-of-line, unlike Python's re)


def regex_pass(pattern: str):
    def kernel(col: pa.Array, tbl: pa.Table) -> np.ndarray:
        return np_bool(pc.match_substring_regex(as_str(col), pattern))

    return kernel


def regex_fail(pattern: str):
    """Pass where the pattern does NOT match."""

    def kernel(col: pa.Array, tbl: pa.Table) -> np.ndarray:
        return ~np_bool(pc.match_substring_regex(as_str(col), pattern))

    return kernel


# ---------------------------------------------------------------------------
# the comparison core — type dispatch resolved once at compile time
# (semantics of compareValue, /root/reference/rule/validators.go:73-136:
#  numeric columns compare numerically; string columns compare by BYTE LENGTH
#  when the param casts to int, else lexically; list columns compare length)

_OPS = {
    "lt": pc.less,
    "lte": pc.less_equal,
    "gt": pc.greater,
    "gte": pc.greater_equal,
    "eq": pc.equal,
    "ne": pc.not_equal,
}

_NP_OPS = {
    "lt": np.less,
    "lte": np.less_equal,
    "gt": np.greater,
    "gte": np.greater_equal,
    "eq": np.equal,
    "ne": np.not_equal,
}


def _try_int(s: str) -> int | None:
    try:
        return int(s)
    except (TypeError, ValueError):
        return None


def _parse_number(s: str, t: pa.DataType):
    try:
        if pa.types.is_floating(t) or pa.types.is_decimal(t):
            return float(s)
        return int(s)
    except (TypeError, ValueError):
        return None


def compare_literal_kernel(op: str, dtype: pa.DataType, param: str, column: str):
    """compareValue against a literal param; dispatch resolved at compile time."""
    from ..registry import CompileError

    pc_op = _OPS[op]
    if is_numeric(dtype):
        num = _parse_number(param, dtype)
        if num is None:
            raise CompileError(
                f"rule {op}={param!r} on numeric column {column!r}: param is not numeric"
            )
        try:
            # built ONCE at compile time: an out-of-range param (min=-1 on an
            # unsigned column) hits the abort channel here, not inside Ray tasks
            lit = pa.scalar(num, type=_widen(dtype))
        except (OverflowError, pa.ArrowInvalid) as e:
            raise CompileError(
                f"rule {op}={param!r} on column {column!r}: {e}") from None

        def kernel(col, tbl):
            # nil coerces to the type's zero value (cast-style weak typing; the
            # reference's abort-on-nil channel is covered by `required` instead)
            return np_bool(pc_op(col.fill_null(0), lit))

        return kernel

    is_bin = pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype)
    if is_stringlike(dtype) or is_bin:
        iv = _try_int(param)
        if iv is not None:
            # the string-length quirk: min=8 on a string is a byte-length
            # bound; binary columns are measured directly (no UTF-8 cast —
            # image payloads are not valid UTF-8)
            def kernel(col, tbl):
                src = col if is_bin else as_str(col)
                ln = pc.binary_length(src).fill_null(0)
                return np_bool(pc_op(ln, pa.scalar(iv, type=pa.int64())))

            return kernel

        if is_bin:
            def kernel(col, tbl):
                return np_bool(pc_op(col, param.encode()))

            return kernel

        def kernel(col, tbl):
            return np_bool(pc_op(as_str(col), param))

        return kernel

    if is_listlike(dtype):
        iv = _try_int(param)
        if iv is None:
            raise CompileError(
                f"rule {op}={param!r} on list column {column!r}: param is not an int"
            )

        def kernel(col, tbl):
            ln = pc.list_value_length(col)
            return np_bool(pc_op(ln, pa.scalar(iv, type=pa.int32())))

        return kernel

    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        # extension beyond the reference (which aborts on time.Time): compare
        # against an ISO timestamp literal
        def kernel(col, tbl):
            return np_bool(pc_op(col, pa.scalar(np.datetime64(param), type=dtype)))

        return kernel

    if pa.types.is_boolean(dtype) and op in ("eq", "ne"):
        # bool equality (cast-coerced param, e.g. when("required","eq","true"))
        want = param.strip().lower() in ("true", "1")

        def kernel(col, tbl):
            return np_bool(pc_op(col.fill_null(False), want))

        return kernel

    raise CompileError(f"unsupported type {dtype} for comparison on column {column!r}")


def _widen(t: pa.DataType) -> pa.DataType:
    if pa.types.is_unsigned_integer(t):
        return pa.uint64()
    if pa.types.is_integer(t):
        return pa.int64()
    return pa.float64()


def compare_field_kernel(op: str, cur_type: pa.DataType, other: str, column: str,
                         schema: pa.Schema | None = None):
    """compareValue against a sibling column (row-local, no shuffle). The type
    pair is resolved at COMPILE time from the table schema, so unsupported
    pairs reject the spec up front (the abort channel) instead of killing Ray
    tasks mid-job."""
    from ..registry import CompileError

    pc_op = _OPS[op]
    ot = _schema_path_type(schema, other) if schema is not None else None

    def pick(other_type):
        if is_numeric(cur_type) and is_numeric(other_type):
            return lambda col, oc: np_bool(pc_op(col.fill_null(0),
                                                 oc.fill_null(0)))
        if is_stringlike(cur_type) and is_numeric(other_type):
            # string vs numeric sibling -> byte-length compare (cast quirk)
            return lambda col, oc: np_bool(
                pc_op(pc.binary_length(as_str(col)), pc.cast(oc, pa.int64())))
        if is_stringlike(cur_type):
            return lambda col, oc: np_bool(pc_op(as_str(col), as_str(oc)))
        if is_listlike(cur_type) and is_numeric(other_type):
            return lambda col, oc: np_bool(
                pc_op(pc.list_value_length(col), pc.cast(oc, pa.int32())))
        return None

    if ot is not None:
        impl = pick(ot)
        if impl is None:
            raise CompileError(
                f"unsupported types for {op}field on {column!r}: "
                f"{cur_type} vs sibling {other!r} ({ot})")

        def kernel(col, tbl):
            return impl(col, get_path(tbl, other))

        return kernel

    # no schema available (direct kernel use): resolve on first batch
    def kernel(col, tbl):
        oc = get_path(tbl, other)
        impl = pick(oc.type)
        if impl is None:
            raise CompileError(f"unsupported types for {op}field on {column!r}")
        return impl(col, oc)

    return kernel


def _schema_path_type(schema: pa.Schema, path: str):
    """Dotted-path type lookup; raises CompileError for missing fields."""
    from ..registry import CompileError

    parts = path.split(".")
    try:
        t = schema.field(parts[0]).type
    except KeyError:
        raise CompileError(f"referenced field {parts[0]!r} not in schema") from None
    for p in parts[1:]:
        if not pa.types.is_struct(t):
            raise CompileError(f"{path!r}: {p!r} parent is not a struct")
        idx = t.get_field_index(p)
        if idx < 0:
            raise CompileError(f"{path!r}: no struct field {p!r}")
        t = t.field(idx).type
    return t


def get_path(tbl: pa.Table, path: str) -> pa.Array:
    """Resolve a dotted path (nested struct access) to a column of the batch."""
    parts = path.split(".")
    col = tbl[parts[0]]
    col = combine(col)
    for p in parts[1:]:
        col = pc.struct_field(col, p)
        col = combine(col)
    return col
