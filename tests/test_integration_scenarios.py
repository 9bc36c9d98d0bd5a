"""Integration scenarios ported from the reference's end-to-end tests
(validator_test.go), re-expressed as table pipelines."""

import pyarrow as pa

from schema_validator_ray import compile_ruleset, field, obj, when


def test_password_confirm_cross_field():
    """validator_test.go:275-310: password required+min=8, confirmPassword
    required + eqfield=password."""
    spec = obj(
        password=field().required().rule("min", 8),
        confirmPassword=field().required().rule("eqfield", "password"),
    ).build()
    tbl = pa.table({
        "password": pa.array(["password123", "password123", "short"]),
        "confirmPassword": pa.array(["password123", "different", "short"]),
    })
    cs = compile_ruleset(spec, tbl.schema)
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [True, False, False]
    rows = {(r["row_index"], r["rule_id"]) for r in v.to_pylist()}
    assert (1, "eqfield") in rows
    assert (2, "min") in rows


def test_map_style_record_validation():
    """validator_test.go:313-342: name required, age min=0 over a weakly-typed
    record (columns are the map keys)."""
    tbl = pa.table({"name": pa.array(["John Doe", ""]),
                    "age": pa.array([30, 30], pa.int64())})
    cs = compile_ruleset({"name": "required", "age": "min=0"}, tbl.schema)
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [True, False]
    assert v.to_pylist()[0]["column"] == "name"


def test_dynamic_form_required_flag():
    """validator_test.go:345-431 (SchemaModifier): a boolean `required` column
    drives whether `value` must be present — vectorized as when() over the
    bool column."""
    tbl = pa.table({
        "type": pa.array(["text", "text", "text"]),
        "value": pa.array(["", "", "some value"]),
        "required": pa.array([True, False, True]),
    })
    spec = [
        {"type": "required"},
        when("required", "eq", "true", {"value": "required"}),
    ]
    cs = compile_ruleset(spec, tbl.schema)
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [False, True, True]
    rows = v.to_pylist()
    assert rows[0]["column"] == "value" and rows[0]["row_index"] == 0


def test_country_dependent_zip():
    """FIXTURES F4 / validator_test.go:479-511 shape: US rows need a 5-char
    zipCode, others don't."""
    tbl = pa.table({
        "country": pa.array(["US", "US", "DE", "US"]),
        "zipCode": pa.array(["12345", "", "", "1234"]),
    })
    spec = [when("country", "eq", "US", {"zipCode": "required|len=5"})]
    cs = compile_ruleset(spec, tbl.schema)
    pm, v = cs.evaluate(tbl)
    assert list(pm) == [True, False, True, False]


def test_conditional_sibling_typo_rejected_at_compile():
    import pytest

    from schema_validator_ray import CompileError

    tbl = pa.table({"a": pa.array(["x"]), "b": pa.array(["y"])})
    for tag in ("required_if=nonexistent,x", "required_with=nonexistent",
                "excluded_without_all=a,missing"):
        with pytest.raises(CompileError):
            compile_ruleset({"a": tag}, tbl.schema)


def test_i18n_per_column_params():
    """max=65535 on w and max=2000 on caption must each render THEIR limit."""
    from schema_validator_ray.i18n import translate_batch

    tbl = pa.table({"w": pa.array([70000], pa.int64()),
                    "caption": pa.array(["x" * 3000])})
    cs = compile_ruleset({"w": "max=65535", "caption": "max=2000"}, tbl.schema)
    _, v = cs.evaluate(tbl)
    msgs = dict(zip(
        translate_batch(v, "en", cs.rule_params())["column"].to_pylist(),
        translate_batch(v, "en", cs.rule_params())["message"].to_pylist()))
    assert msgs["w"] == "w must be at most 65535"
    assert msgs["caption"] == "caption must be at most 2000"
