"""Property-based conformance: the vectorized engine vs a row-at-a-time
interpreter of the reference's comparison semantics, over random values.

The interpreter below re-implements compareValue (rule/validators.go:73-136) in
the most literal row-by-row way possible — an independent oracle, deliberately
NOT sharing code with the engine."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from schema_validator_ray import compile_ruleset
from schema_validator_ray.dsl import Rule

OPS = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
}


def row_oracle_compare(op: str, value, param: str) -> bool:
    """compareValue, row-at-a-time: numeric -> numeric compare; string with
    int-castable param -> byte-length compare; else lexical."""
    if isinstance(value, bool):
        raise NotImplementedError
    if isinstance(value, (int, float)):
        return OPS[op](value, type(value)(int(param)) if isinstance(value, int)
                       else float(param))
    try:
        n = int(param)
        return OPS[op](len(value.encode()), n)
    except ValueError:
        return OPS[op](value, param)


ints = st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1)
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20)


@settings(max_examples=200, deadline=None)
@given(op=st.sampled_from(sorted(OPS)), values=st.lists(ints, min_size=1,
                                                        max_size=20),
       param=ints)
def test_numeric_compare_matches_row_oracle(op, values, param):
    tbl = pa.table({"x": pa.array(values, pa.int64())})
    cs = compile_ruleset({"x": [Rule(op, (str(param),))]}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    want = [row_oracle_compare(op, v, str(param)) for v in values]
    assert list(pm) == want


@settings(max_examples=200, deadline=None)
@given(op=st.sampled_from(sorted(OPS)),
       values=st.lists(texts, min_size=1, max_size=20),
       param=st.one_of(ints.map(str), texts.filter(
           lambda s: not _intlike(s) and "," not in s and "|" not in s
           and "=" not in s and s.strip() == s and s)))
def test_string_compare_matches_row_oracle(op, values, param):
    tbl = pa.table({"x": pa.array(values, pa.string())})
    cs = compile_ruleset({"x": [Rule(op, (param,))]}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    want = [row_oracle_compare(op, v, param) for v in values]
    assert list(pm) == want


def _intlike(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


@settings(max_examples=100, deadline=None)
@given(values=st.lists(st.one_of(st.none(), ints), min_size=1, max_size=20))
def test_required_matches_is_nil_or_zero(values):
    tbl = pa.table({"x": pa.array(values, pa.int64())})
    cs = compile_ruleset({"x": "required"}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    want = [v is not None and v != 0 for v in values]
    assert list(pm) == want


@settings(max_examples=100, deadline=None)
@given(values=st.lists(texts, min_size=1, max_size=30), n=st.integers(0, 30))
def test_len_rule_is_byte_length(values, n):
    tbl = pa.table({"x": pa.array(values, pa.string())})
    cs = compile_ruleset({"x": [Rule("len", (str(n),))]}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    want = [len(v.encode()) == n for v in values]
    assert list(pm) == want


@settings(max_examples=150, deadline=None)
@given(rules=st.lists(
    st.tuples(
        st.sampled_from(["required", "alpha", "uuid", "min", "max", "oneof"]),
        st.lists(st.text(alphabet="abcdef123", min_size=1, max_size=6),
                 min_size=0, max_size=3)),
    min_size=1, max_size=6))
def test_dsl_roundtrip(rules):
    """Render a rule list to a tag string and parse it back (grammar
    round-trip; params restricted to separator-free tokens)."""
    from schema_validator_ray.dsl import Rule, parse_tag

    want = []
    parts = []
    for name, params in rules:
        if name in ("min", "max") and not params:
            params = ["1"]
        want.append(Rule(name, tuple(params)))
        parts.append(name + ("=" + ",".join(params) if params else ""))
    tag = "|".join(parts)
    assert parse_tag(tag) == want
