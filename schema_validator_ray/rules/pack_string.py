"""String-class rules (24 rules).

Parity: /root/reference/rule/string.go:12-238. All rules operate on the cast-coerced
string form of the value. Character classes follow Go's unicode.* predicates,
expressed as RE2 classes via pyarrow (same regex engine family as Go's regexp —
in particular ``$`` is end-of-text). ``*`` quantifiers keep the reference's
vacuous-pass-on-empty behavior (a Go range loop over "" never fails).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow.compute as pc

from ..registry import CompileContext, register
from .kernels import as_str, np_bool, regex_fail, regex_pass

# Go unicode.IsSpace ≈ [\t\n\v\f\r ] ∪ U+0085 U+00A0 ∪ \p{Z}
_SPACE = r"\t\n\v\f\r \x{85}\x{a0}\p{Z}"


def _const(pattern: str, negate: bool = False):
    f = regex_fail(pattern) if negate else regex_pass(pattern)
    return lambda ctx: f


register("alpha")(_const(r"^\p{L}*$"))
register("alphaunicode")(_const(r"^\p{L}*$"))
register("alphaspace")(_const(rf"^[\p{{L}}{_SPACE}]*$"))
register("alphanum")(_const(r"^[\p{L}\p{Nd}]*$"))
register("alphanumunicode")(_const(r"^[\p{L}\p{Nd}]*$"))
register("alphanumspace")(_const(rf"^[\p{{L}}\p{{Nd}}{_SPACE}]*$"))
register("ascii")(_const(r"^[\x00-\x7f]*$"))
register("multibyte")(_const(r"[^\x00-\x7f]"))
register("number")(_const(r"^\p{Nd}*$"))
register("numeric")(_const(r"^[\p{Nd}.+-]*$"))
# printable ASCII = [0x20, 0x7E] (unicode.IsPrint ∧ rune<=127)
register("printascii")(_const(r"^[ -~]*$"))


_BOOLEAN_SET = None


@register("boolean")
def _boolean(ctx: CompileContext):
    def kernel(col, tbl):
        global _BOOLEAN_SET
        if _BOOLEAN_SET is None:
            import pyarrow as pa

            _BOOLEAN_SET = pa.array(["true", "false", "1", "0"])
        return np_bool(pc.is_in(as_str(col), value_set=_BOOLEAN_SET))

    return kernel


@register("lowercase")
def _lowercase(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        return np_bool(pc.equal(s, pc.utf8_lower(s)))

    return kernel


@register("uppercase")
def _uppercase(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        return np_bool(pc.equal(s, pc.utf8_upper(s)))

    return kernel


# --- parameterized rules -----------------------------------------------------


@register("contains")
def _contains(ctx: CompileContext):
    sub = ctx.param(0)

    def kernel(col, tbl):
        return np_bool(pc.match_substring(as_str(col), sub))

    return kernel


@register("excludes")
def _excludes(ctx: CompileContext):
    sub = ctx.param(0)

    def kernel(col, tbl):
        return ~np_bool(pc.match_substring(as_str(col), sub))

    return kernel


def _char_class(chars: str) -> str:
    return "[" + "".join(re.escape(c) for c in chars) + "]"


@register("containsany")
def _containsany(ctx: CompileContext):
    return regex_pass(_char_class(ctx.param(0)))


@register("excludesall")
def _excludesall(ctx: CompileContext):
    return regex_fail(_char_class(ctx.param(0)))


@register("containsrune")
def _containsrune(ctx: CompileContext):
    r = ctx.param(0)
    if not r:
        return lambda col, tbl: np.zeros(len(col), bool)
    return regex_pass(re.escape(r[0]))


@register("excludesrune")
def _excludesrune(ctx: CompileContext):
    r = ctx.param(0)
    if not r:
        return lambda col, tbl: np.zeros(len(col), bool)
    return regex_fail(re.escape(r[0]))


@register("startswith")
def _startswith(ctx: CompileContext):
    p = ctx.param(0)

    def kernel(col, tbl):
        return np_bool(pc.starts_with(as_str(col), p))

    return kernel


@register("startsnotwith")
def _startsnotwith(ctx: CompileContext):
    p = ctx.param(0)

    def kernel(col, tbl):
        return ~np_bool(pc.starts_with(as_str(col), p))

    return kernel


@register("endswith")
def _endswith(ctx: CompileContext):
    p = ctx.param(0)

    def kernel(col, tbl):
        return np_bool(pc.ends_with(as_str(col), p))

    return kernel


@register("endsnotwith")
def _endsnotwith(ctx: CompileContext):
    p = ctx.param(0)

    def kernel(col, tbl):
        return ~np_bool(pc.ends_with(as_str(col), p))

    return kernel
