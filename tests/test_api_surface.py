"""Extension surface + structural fixtures.

Mirrors the reference's extension tests (rule/registry_test.go:11-66: custom
`between` / `enum` rules; tag.Config separators; builder API) and the
nested/array fixtures (FIXTURES.md F5, validator_test.go:172-272)."""

import numpy as np
import pyarrow as pa
import pytest

from schema_validator_ray import (
    CompileError,
    Registry,
    array,
    compile_ruleset,
    field,
    obj,
    parse_tag,
    when,
)
from schema_validator_ray.dsl import DslConfig, Rule
from schema_validator_ray.registry import default_registry


# --- tag DSL grammar ---------------------------------------------------------


def test_parse_basic():
    assert parse_tag("required|min=8|oneof=a,b") == [
        Rule("required"), Rule("min", ("8",)), Rule("oneof", ("a", "b"))]


def test_parse_pipe_kept_inside_param():
    # next |-segment is not a validator name nor name=param -> the | belongs to
    # the param (the reference's regex-friendly heuristic, tag/tag.go:57-75)
    rules = parse_tag("contains=a|b-c")
    assert rules == [Rule("contains", ("a|b-c",))]


def test_parse_pipe_splits_before_validator_name():
    rules = parse_tag("contains=a|required")
    assert rules == [Rule("contains", ("a",)), Rule("required")]


def test_parse_custom_separators():
    cfg = DslConfig(rule_splitter=";", name_param_separator=":",
                    params_separator=" ")
    assert parse_tag("required;oneof:a b", cfg) == [
        Rule("required"), Rule("oneof", ("a", "b"))]


def test_parse_empty_and_whitespace():
    assert parse_tag("") == []
    assert parse_tag("  min = 3 ") == [Rule("min", ("3",))]


# --- registry extension ------------------------------------------------------


def test_custom_rule_registration():
    """Parity with registry_test.go: register `between` and `enum` into an
    isolated registry, use them via the DSL."""
    import pyarrow.compute as pc

    from schema_validator_ray.rules.kernels import np_bool

    reg = Registry()

    def between(ctx):
        lo, hi = int(ctx.param(0)), int(ctx.param(1))

        def kernel(col, tbl):
            m = np_bool(pc.greater_equal(col, lo))
            return m & np_bool(pc.less_equal(col, hi))

        return kernel

    reg.register("between", between)

    def enum(ctx):
        values = pa.array(list(ctx.params))

        def kernel(col, tbl):
            return np_bool(pc.is_in(col, value_set=values))

        return kernel

    reg.register("enum", enum)
    reg.alias("one_of_enum", "enum")

    tbl = pa.table({"age": pa.array([25, 5, 200], pa.int64()),
                    "color": pa.array(["red", "blue", "pink"])})
    cs = compile_ruleset({"age": "between=10,150",
                          "color": "one_of_enum=red,green,blue"},
                         tbl.schema, registry=reg)
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [True, False, False]
    got = {(r["row_index"], r["rule_id"]) for r in v.to_pylist()}
    assert got == {(1, "between"), (2, "between"), (2, "one_of_enum")}


def test_unknown_rule_is_compile_error():
    tbl = pa.table({"x": pa.array([1])})
    with pytest.raises(CompileError):
        compile_ruleset({"x": "definitely_not_a_rule"}, tbl.schema)


def test_type_mismatch_is_compile_error():
    """The reference's abort channel (unsupported comparison) surfaces at
    compile time (SURVEY §7.4.3)."""
    tbl = pa.table({"flag": pa.array([True, False])})
    with pytest.raises(CompileError):
        compile_ruleset({"flag": "min=3"}, tbl.schema)


def test_all_161_rules_registered():
    assert len(default_registry.names()) == 161


# --- builder API -------------------------------------------------------------


def test_builder_equivalent_to_dsl():
    spec = obj(
        name=field().required().rule("min", 3),
        tags=array().rule("min", 1).dive(field().required().rule("len", 2)),
        address=obj(street=field().required()),
    ).build()
    tbl = pa.table({
        "name": pa.array(["abcd", "x", None]),
        "tags": pa.array([["ab", "cd"], [], ["x"]],
                         type=pa.list_(pa.string())),
        "address": pa.array([{"street": "s"}, {"street": ""}, {"street": "t"}],
                            type=pa.struct([("street", pa.string())])),
    })
    cs = compile_ruleset(spec, tbl.schema)
    pm, v = cs.evaluate(tbl)
    rows = {(r["row_index"], r["rule_id"], r["column"]) for r in v.to_pylist()}
    assert (0, "min", "name") not in rows
    assert (1, "min", "name") in rows           # len("x") < 3
    assert (1, "min", "tags") in rows           # empty list fails min=1
    assert (2, "len", "tags.[0]") in rows       # element "x" fails len=2
    assert (1, "required", "address.street") in rows


# --- nested / array fixtures (F5) -------------------------------------------


def test_dive_element_rules_and_paths():
    tbl = pa.table({
        "items": pa.array([["aaaa", "bb"], [], None, ["cccc"]],
                          type=pa.list_(pa.string()))})
    cs = compile_ruleset({"items": "min=1|max=10|dive|len=4"}, tbl.schema)
    pm, v = cs.evaluate(tbl)
    rows = {(r["row_index"], r["rule_id"], r["column"]) for r in v.to_pylist()}
    assert (0, "len", "items.[1]") in rows      # "bb"
    assert (1, "min", "items") in rows          # empty list
    # pinned: a null list has no length -> fails min (row 2); row 3 passes
    assert list(pm) == [False, False, False, True]


def test_dive_tag_rename():
    """Parity with WithDiveTag (parser.go:45-49): the list-descent marker is
    renameable; the default word then parses as an (unknown) rule name."""
    tbl = pa.table({
        "items": pa.array([["aaaa", "bb"], ["cccc"]],
                          type=pa.list_(pa.string()))})
    cs = compile_ruleset({"items": "min=1|descend|len=4"}, tbl.schema,
                         dive_tag="descend")
    pm, v = cs.evaluate(tbl)
    rows = {(r["row_index"], r["rule_id"], r["column"]) for r in v.to_pylist()}
    assert (0, "len", "items.[1]") in rows      # "bb" fails element len=4
    assert list(pm) == [False, True]
    # with the marker renamed, bare "dive" is no longer special
    from schema_validator_ray.registry import CompileError
    with pytest.raises(CompileError):
        compile_ruleset({"items": "dive|len=4"}, tbl.schema,
                        dive_tag="descend")


def test_value_types_struct_leaf():
    """Parity with WithValueTypes (parser.go:51-55,156): a struct type listed
    as a value type takes rules whole; descending into it with a nested dict
    spec is a compile error."""
    st = pa.struct([("a", pa.int64())])
    tbl = pa.table({"s": pa.array([{"a": 1}, None], st)})
    cs = compile_ruleset({"s": "required"}, tbl.schema, value_types=(st,))
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [True, False]
    from schema_validator_ray.registry import CompileError
    with pytest.raises(CompileError, match="value type"):
        compile_ruleset({"s": {"a": "required"}}, tbl.schema,
                        value_types=(st,))
    # without the declaration the nested spec still descends fine
    cs2 = compile_ruleset({"s": {"a": "required"}}, tbl.schema)
    pm2, _ = cs2.evaluate(tbl)
    assert list(pm2) == [True, False]


def test_null_list_min_pinned():
    tbl = pa.table({"items": pa.array([None, []],
                                      type=pa.list_(pa.string()))})
    cs = compile_ruleset({"items": "min=1"}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    # pinned: null list fails min (no length), empty list fails min=1
    assert list(pm) == [False, False]


def test_map_column_contents_unvalidated():
    """Parity with parser.go:160-162: map-kind fields produce an empty object
    schema — contents are not validated. Compiling rules for a map column's
    values is simply not expressible in the spec, and a required on the map
    itself checks null-ness only."""
    tbl = pa.table({"attrs": pa.array(
        [[("a", "1")], [], None], type=pa.map_(pa.string(), pa.string()))})
    cs = compile_ruleset({"attrs": "required"}, tbl.schema)
    pm, _ = cs.evaluate(tbl)
    assert list(pm) == [True, True, False]


def test_when_conditional_rules():
    """SchemaModifier equivalent (validator_test.go:377-431): `value` required
    only where type == special."""
    tbl = pa.table({
        "type": pa.array(["special", "special", "normal"]),
        "value": pa.array(["filled", "", ""]),
    })
    cs = compile_ruleset([when("type", "eq", "special",
                               {"value": "required|min=3"})], tbl.schema)
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [True, False, True]


# --- i18n --------------------------------------------------------------------


def test_i18n_translate_batch():
    from schema_validator_ray.i18n import message_for, translate_batch

    v = pa.table({
        "image_id": pa.array(["a"]),
        "rule_id": pa.array(["required"]),
        "column": pa.array(["caption"]),
        "offending_value": pa.array([""]),
    })
    out = translate_batch(v, "en")
    assert out["message"][0].as_py() == "caption is required"
    out_zh = translate_batch(v, "zh-CN")
    assert out_zh["message"][0].as_py() == "caption为必填字段"
    assert message_for("min", "w", ("1",)) == "w must be at least 1"
    # every registered rule renders something
    for name in default_registry.names():
        assert isinstance(message_for(name, "f", ("1", "2")), str)


def test_i18n_register_locale():
    from schema_validator_ray.i18n import message_for, register_locale

    register_locale("fr", {"required": "{field} est requis"})
    assert message_for("required", "nom", (), "fr") == "nom est requis"


def test_lance_io_parquet_fallback(tmp_path, ray_session):
    """lance is absent in this container: read_table/fragment_paths must fall
    back to parquet transparently."""
    import pyarrow.parquet as pq

    from schema_validator_ray.sources.lance_io import (
        HAVE_LANCE,
        fragment_paths,
        read_table,
        write_table,
    )

    assert not HAVE_LANCE  # this container
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    d = tmp_path / "tbl"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    pq.write_table(t, str(d / "part-1.parquet"))
    assert len(fragment_paths(str(d))) == 2
    ds = read_table(str(d), columns=["a"])
    assert ds.count() == 6
    out = write_table(t, str(tmp_path / "out"))
    assert out.endswith(".parquet") or out == str(tmp_path / "out")


def test_error_helpers():
    """HasFieldError / HasErrorCode / Translate parity (schema/error.go:65-93)."""
    from schema_validator_ray.errors import (
        error_counts,
        field_errors,
        has_error_code,
        has_field_error,
        translate,
    )

    tbl = pa.table({"name": pa.array(["", "ok"]),
                    "age": pa.array([0, 5], pa.int64())})
    cs = compile_ruleset({"name": "required", "age": "required|min=1"},
                         tbl.schema)
    _, v = cs.evaluate(tbl)
    assert has_field_error(v, "name") and has_field_error(v, "age")
    assert not has_field_error(v, "other")
    assert has_error_code(v, "required") and not has_error_code(v, "uuid")
    assert field_errors(v, "name").num_rows == 1
    counts = error_counts(v)
    assert counts["required"] == 2 and counts["min"] == 1
    msgs = translate(v)["message"].to_pylist()
    assert "name is required" in msgs


def test_i18n_with_rule_params_from_compiled_set():
    """Messages render the actual rule params (ArgN parity) pulled from the
    compiled plan."""
    from schema_validator_ray.i18n import translate_batch

    tbl = pa.table({"w": pa.array([0], pa.int64())})
    cs = compile_ruleset({"w": "min=5"}, tbl.schema)
    _, v = cs.evaluate(tbl)
    out = translate_batch(v, "en", rule_params=cs.rule_params())
    assert out["message"][0].as_py() == "w must be at least 5"


def test_i18n_every_rule_has_explicit_templates():
    """Catalog-completeness parity with the reference's per-locale YAML files
    (msg.en.yaml / msg.zh-CN.yaml, 162 explicit keys each): every registered
    rule resolves to an explicit own-wording template in BOTH locales, and the
    template renders its params (no fallback to the generic default)."""
    from schema_validator_ray.i18n import has_explicit_template, message_for
    from schema_validator_ray.registry import default_registry

    names = default_registry.names()
    assert len(names) == 161
    for locale in ("en", "zh-CN"):
        for rule in names:
            assert has_explicit_template(rule, locale), (rule, locale)
            msg = message_for(rule, "myfield", ("A", "B"), locale)
            if rule == "omitempty":   # explicit empty skip-marker
                assert msg == ""
                continue
            assert "failed rule" not in msg and "未通过规则" not in msg, (
                rule, locale, msg)
            assert "myfield" in msg, (rule, locale, msg)
        # parameterized rules must actually render the ArgN params
        assert "A" in message_for("min", "f", ("A",), locale)
        assert "A,B" in message_for("oneof", "f", ("A", "B"), locale)
        assert "A" in message_for("required_with", "f", ("A", "B"), locale)
        assert "A" in message_for("datetime", "f", ("A",), locale)


# --- schema deep-merge (AddField collision semantics) -------------------------


def test_merge_specs_field_collision_concats_rules():
    """Parity with mergeSchema (schema/object.go:121-152): a colliding FIELD
    entry concatenates validator lists — a's rules run first, then b's."""
    from schema_validator_ray import merge_specs

    merged = merge_specs({"name": "required"}, {"name": "min=3"})
    assert merged == {"name": ["required", "min=3"]}
    tbl = pa.table({"name": pa.array(["ok", None, "fine"])})
    cs = compile_ruleset(merged, tbl.schema)
    pm, v = cs.evaluate(tbl)
    # "ok" fails min=3 only; None fails required (and skips the rest)
    assert list(pm) == [False, False, True]
    rows = {(r["row_index"], r["rule_id"]) for r in v.to_pylist()}
    assert (0, "min") in rows and (1, "required") in rows


def test_merge_specs_object_collision_recurses():
    """Colliding OBJECT schemas merge per field, recursively; non-colliding
    fields pass through from either side."""
    from schema_validator_ray import merge_specs

    a = {"address": {"zip": "required", "city": "required"},
         "name": "required"}
    b = {"address": {"zip": "min=5|max=5", "country": "required"}}
    merged = merge_specs(a, b)
    assert merged == {
        "address": {"zip": ["required", "min=5|max=5"],
                    "city": "required", "country": "required"},
        "name": "required"}
    st = pa.struct([("zip", pa.string()), ("city", pa.string()),
                    ("country", pa.string())])
    tbl = pa.table({
        "name": pa.array(["John", "Jane"]),
        "address": pa.array([{"zip": "123", "city": "X", "country": "US"},
                             {"zip": "12345", "city": "Y", "country": "US"}],
                            st)})
    pm, v = compile_ruleset(merged, tbl.schema).evaluate(tbl)
    # row 0's zip fails the merged min=5 (the US-zip AddField case,
    # validator_test.go:444-452)
    assert list(pm) == [False, True]
    assert {(r["row_index"], r["rule_id"], r["column"])
            for r in v.to_pylist()} == {(0, "min", "address.zip")}


def test_merge_specs_type_mismatch_and_purity():
    """Object-vs-field collision raises (the reference panics on the type
    assertion); inputs are never mutated."""
    from schema_validator_ray import CompileError, merge_specs

    a = {"address": {"zip": "required"}}
    b = {"address": "required"}
    with pytest.raises(CompileError, match="merge"):
        merge_specs(a, b)
    a2 = {"items": "min=1|dive|len=4"}
    b2 = {"items": ["max=10"]}
    merged = merge_specs(a2, b2)
    assert merged == {"items": ["min=1|dive|len=4", "max=10"]}
    assert a2 == {"items": "min=1|dive|len=4"} and b2 == {"items": ["max=10"]}
