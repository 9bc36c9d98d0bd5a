"""Rule-spec compiler: spec dict / tag DSL  ->  CompiledRuleSet of vectorized plans.

This replaces the reference's reflection walk (parser.go:57-174) with a pure-Python,
driver-side compile against a ``pyarrow.Schema``: the type dispatch the reference does
per value per record (compareValue, rule/validators.go:73-136) is resolved ONCE per
(column, rule) here, so the hot path is only Arrow kernel calls.

Spec format (one entry per column; nested dicts descend into struct columns):

    spec = {
        "image_id": "required|uuid",
        "w": "required|min=1|max=65535",
        "fmt": "required|oneof=png,jpeg,webp",
        "items": "min=1|max=10|dive|required|len=4",   # list column: dive splits
        "address": {"street": "required"},             # struct column
    }

Conditional rules (the reference's SchemaModifier, schema/schema.go:5-12, vectorized
as mask-gated predicates):

    when("type", "eq", "special", {"value": "required|min=10"})

Ordering semantics: rules run in declaration order per column; ``omitempty`` gates all
LATER rules of that column off for rows where the value is empty (skipRest,
schema/field.go:16-29). Violation rows are ``(row id, rule_id, column, offending
value)``; evaluation order across columns is schema order (deterministic, unlike the
reference's Go-map iteration — divergence is ordering-only, SURVEY §7.4.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsl import DEFAULT_CONFIG, DslConfig, Rule, parse_tag
from .registry import (
    CompileContext,
    CompileError,
    Registry,
    SkipRestIfEmpty,
    default_registry,
)
from .rules.kernels import as_str, combine, get_path, is_empty_mask

DIVE = "dive"

MAX_OFFENDING_LEN = 128


@dataclass(frozen=True)
class When:
    """Conditional rule block: apply ``spec`` only where column <op> value holds."""

    column: str
    op: str           # eq | ne | gt | gte | lt | lte
    value: str
    spec: dict


def when(column: str, op: str, value: str, spec: dict) -> When:
    return When(column, op, str(value), spec)


@dataclass
class PlanRule:
    rule_id: str
    kernel: Any                  # Kernel | SkipRestIfEmpty
    params: tuple[str, ...] = ()


@dataclass
class FieldPlan:
    column: str                  # dotted path
    rules: list[PlanRule]
    # for list columns with dive: rules on elements, evaluated over the flattened
    # child array and reduced back to parents
    element_rules: list[PlanRule] = field(default_factory=list)
    element_type: pa.DataType | None = None
    # mask-gating condition (compiled from When); None = unconditional
    condition: Any = None


def _lookup_type(schema: pa.Schema, path: str) -> pa.DataType:
    parts = path.split(".")
    try:
        t = schema.field(parts[0]).type
    except KeyError:
        raise CompileError(f"column {parts[0]!r} not in schema") from None
    for p in parts[1:]:
        if not pa.types.is_struct(t):
            raise CompileError(f"{path!r}: {p!r} parent is not a struct")
        idx = t.get_field_index(p)
        if idx < 0:
            raise CompileError(f"{path!r}: no struct field {p!r}")
        t = t.field(idx).type
    return t


def _elem_type(t: pa.DataType) -> pa.DataType:
    return t.value_type


class CompiledRuleSet:
    """Ordered per-column predicate plans + batch evaluator.

    The evaluator is the single hot-path function of the engine: it runs inside
    ``map_batches(batch_format="pyarrow")`` on zero-copy Arrow blocks.
    """

    def __init__(self, plans: list[FieldPlan], schema: pa.Schema):
        self.plans = plans
        self.schema = schema

    def rule_params(self) -> dict:
        """(column, rule_id) -> params, plus rule_id -> params fallback for
        rules used with a single param set (i18n ArgN rendering; the (column,
        rule) key disambiguates e.g. max=65535 on w vs max=2000 on caption)."""
        out: dict = {}
        for plan in self.plans:
            for r in list(plan.rules) + list(plan.element_rules):
                out[(plan.column, r.rule_id)] = r.params
                if out.setdefault(r.rule_id, r.params) != r.params:
                    out[r.rule_id] = None  # ambiguous without the column
        return {k: v for k, v in out.items() if v is not None}

    # -- evaluation -----------------------------------------------------------

    def evaluate(self, tbl: pa.Table, id_column: str | None = None):
        """Returns (pass_mask: np.ndarray[bool] per row, violations: pa.Table).

        Violations schema: (row_index:int64[, id:<id type>], rule_id, column,
        offending_value) — matching the north rule's violation-row shape.
        """
        n = tbl.num_rows
        row_pass = np.ones(n, dtype=bool)
        v_idx: list[np.ndarray] = []
        v_rule: list[str] = []
        v_col: list[str] = []
        v_val: list[list[str]] = []

        for plan in self.plans:
            col = get_path(tbl, plan.column)
            active = np.ones(n, dtype=bool)
            if plan.condition is not None:
                active &= plan.condition(tbl)

            for rule in plan.rules:
                if isinstance(rule.kernel, SkipRestIfEmpty):
                    active &= ~is_empty_mask(col)
                    continue
                mask = rule.kernel(col, tbl)
                viol = active & ~mask
                if viol.any():
                    row_pass &= ~viol
                    idx = np.nonzero(viol)[0]
                    v_idx.append(idx)
                    v_rule.append(rule.rule_id)
                    v_col.append(plan.column)
                    # stringify ONLY the violating rows (never the full column)
                    v_val.append(_offending_array(col.take(pa.array(idx))))

            if plan.element_rules:
                self._eval_elements(tbl, plan, active, row_pass,
                                    v_idx, v_rule, v_col, v_val)

        violations = _violations_table(tbl, id_column, v_idx, v_rule, v_col, v_val)
        return row_pass, violations

    def _eval_elements(self, tbl, plan, active, row_pass,
                       v_idx, v_rule, v_col, v_val):
        col = get_path(tbl, plan.column)
        flat = combine(pc.list_flatten(col))
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return
        # element offset within its own list (for the `.{i}` path segment)
        starts = np.nonzero(np.r_[True, parents[1:] != parents[:-1]])[0]
        offsets = np.arange(len(parents))
        offsets -= np.repeat(offsets[starts], np.diff(np.r_[starts, len(parents)]))

        elem_active = active[parents].copy()
        for rule in plan.element_rules:
            if isinstance(rule.kernel, SkipRestIfEmpty):
                elem_active &= ~is_empty_mask(flat)
                continue
            mask = rule.kernel(flat, tbl)
            viol = elem_active & ~mask
            if viol.any():
                idx = np.nonzero(viol)[0]
                bad_parents = parents[idx]
                row_pass[bad_parents] = False
                # one violation row per failing element, appended in BULK; the
                # per-row `column.[i]` paths ride as an array-valued entry
                v_idx.append(bad_parents)
                v_rule.append(rule.rule_id)
                v_col.append(pa.array(
                    [f"{plan.column}.[{offsets[i]}]" for i in idx],
                    pa.string()))
                v_val.append(_offending_array(flat.take(pa.array(idx))))


def _offending_array(col: pa.Array) -> pa.Array:
    """String form of (already violation-filtered) values, truncated — stays
    in Arrow, no Python round-trip."""
    t = col.type
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        lens = pc.binary_length(col).fill_null(0).to_pylist()
        return pa.array([f"<binary {ln}B>" for ln in lens], pa.string())
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        lens = pc.list_value_length(col).fill_null(0).to_pylist()
        return pa.array([f"<list len={ln}>" for ln in lens], pa.string())
    try:
        vals = as_str(col)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array([str(v)[:MAX_OFFENDING_LEN] for v in col.to_pylist()],
                        pa.string())
    return combine(pc.utf8_slice_codeunits(vals, 0, MAX_OFFENDING_LEN))


_VIOLATION_FIELDS = [
    ("row_index", pa.int64()),
    ("rule_id", pa.string()),
    ("column", pa.string()),
    ("offending_value", pa.string()),
]


def violations_schema(id_column: str | None, id_type: pa.DataType = pa.string()) -> pa.Schema:
    fields = [pa.field(n, t) for n, t in _VIOLATION_FIELDS]
    if id_column:
        fields.insert(1, pa.field(id_column, id_type))
    return pa.schema(fields)


def _violations_table(tbl, id_column, v_idx, v_rule, v_col, v_val) -> pa.Table:
    if not v_idx:
        id_t = tbl.schema.field(id_column).type if id_column else pa.string()
        return violations_schema(id_column, id_t).empty_table()
    idx = np.concatenate(v_idx)
    lens = [len(a) for a in v_idx]
    codes = pa.array(np.repeat(np.arange(len(v_rule)), lens).astype(np.int32))

    # rule ids are one constant per group: dictionary-decode, no Python repeat
    rule_ids = pc.cast(pa.DictionaryArray.from_arrays(
        codes, pa.array(v_rule, pa.string())), pa.string())

    # column entries are a constant str per group OR a per-row array (dive)
    col_parts = []
    for entry, ln in zip(v_col, lens):
        if isinstance(entry, str):
            entry = pc.cast(pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(ln, np.int32)), pa.array([entry])),
                pa.string())
        col_parts.append(entry)
    cols = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in col_parts])
    vals = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                             else a for a in v_val])
    arrays = [pa.array(idx, type=pa.int64()), rule_ids, cols, vals]
    names = ["row_index", "rule_id", "column", "offending_value"]
    if id_column:
        ids = combine(tbl[id_column]).take(pa.array(idx))
        arrays.insert(1, ids)
        names.insert(1, id_column)
    return pa.table(dict(zip(names, arrays)))


# ---------------------------------------------------------------------------
# compilation


SpecEntry = Union[str, list, dict]


def compile_ruleset(
    spec: dict[str, SpecEntry] | list,
    schema: pa.Schema,
    *,
    registry: Registry | None = None,
    dsl_config: DslConfig = DEFAULT_CONFIG,
    dive_tag: str = DIVE,
    value_types: tuple[pa.DataType, ...] = (),
) -> CompiledRuleSet:
    """Compile a spec against an Arrow schema. ``spec`` may also be a list whose
    items are dicts or :class:`When` blocks.

    ``dive_tag`` renames the list-descent marker (reference ``WithDiveTag``,
    parser.go:45-49). ``value_types`` lists struct DataTypes that are leaf
    VALUES: rules apply to the struct as a whole and a nested dict spec
    descending into one is a compile error (reference ``WithValueTypes``,
    parser.go:51-55,156 — its default ``time.Time`` entry needs no Arrow
    counterpart because Arrow timestamps are already scalar types)."""
    registry = registry or default_registry
    plans: list[FieldPlan] = []

    blocks: list[tuple[Any, dict]] = []
    if isinstance(spec, dict):
        blocks.append((None, spec))
    else:
        for item in spec:
            if isinstance(item, When):
                blocks.append((item, item.spec))
            else:
                blocks.append((None, item))

    for cond, block in blocks:
        condition = _compile_condition(cond, schema) if cond is not None else None
        for column, entry in _flatten_spec(block, schema, value_types):
            plans.append(
                _compile_field(column, entry, schema, registry, dsl_config,
                               condition, dive_tag))
    return CompiledRuleSet(plans, schema)


def merge_specs(a: dict, b: dict) -> dict:
    """Deep-merge two spec dicts on field-name collision — the reference's
    ``AddField``/``mergeSchema`` semantics (schema/object.go:121-152):
    colliding OBJECT schemas merge recursively per field, colliding FIELD
    schemas concatenate their validator lists (``a``'s rules first, then
    ``b``'s — AddValidator append order). A dict (object) colliding with a
    non-dict (field/array) entry is a :class:`CompileError`, mirroring the
    reference's type-assertion panic. Inputs are not mutated.

    Caveat for list columns: the dive marker is positional in the DSL, so
    concatenating after an entry like ``"min=1|dive|len=4"`` places the
    appended rules in the ELEMENT scope. To add array-level rules to a
    field that dives, splice them before the dive in the left spec's list
    form — the reference merges ArraySchema validators at the array level,
    which the flat tag grammar cannot express positionally."""
    out: dict = {}
    for key in {**a, **b}:
        if key not in a:
            out[key] = b[key]
        elif key not in b:
            out[key] = a[key]
        else:
            ea, eb = a[key], b[key]
            if isinstance(ea, dict) and isinstance(eb, dict):
                out[key] = merge_specs(ea, eb)
            elif isinstance(ea, dict) or isinstance(eb, dict):
                raise CompileError(
                    f"cannot merge object spec with field spec at {key!r}")
            else:
                la = [ea] if isinstance(ea, str) else list(ea)
                lb = [eb] if isinstance(eb, str) else list(eb)
                out[key] = la + lb
    return out


def _flatten_spec(block: dict, schema: pa.Schema,
                  value_types: tuple[pa.DataType, ...] = (), prefix: str = ""):
    for key, entry in block.items():
        path = f"{prefix}{key}"
        if isinstance(entry, dict):
            if value_types and _lookup_type(schema, path) in value_types:
                raise CompileError(
                    f"{path!r} is a declared value type; apply rules to it "
                    f"directly instead of descending with a nested spec")
            yield from _flatten_spec(entry, schema, value_types,
                                     prefix=f"{path}.")
        else:
            yield path, entry


def _compile_field(column, entry, schema, registry, dsl_config, condition,
                   dive_tag: str = DIVE) -> FieldPlan:
    dtype = _lookup_type(schema, column)
    rules = _to_rules(entry, dsl_config)

    is_list = (pa.types.is_list(dtype) or pa.types.is_large_list(dtype)
               or pa.types.is_fixed_size_list(dtype))
    outer, inner = rules, []
    if is_list:
        names = [r.name for r in rules]
        if dive_tag in names:
            cut = names.index(dive_tag)
            outer, inner = rules[:cut], rules[cut + 1:]

    plan = FieldPlan(column=column, rules=[], condition=condition)
    for r in outer:
        plan.rules.append(_compile_rule(r, column, dtype, schema, registry))
    if inner:
        et = _elem_type(dtype)
        plan.element_type = et
        for r in inner:
            plan.element_rules.append(_compile_rule(r, column, et, schema, registry))
    return plan


def _to_rules(entry, dsl_config) -> list[Rule]:
    if isinstance(entry, str):
        return parse_tag(entry, dsl_config)
    rules = []
    for item in entry:
        if isinstance(item, str):
            rules.extend(parse_tag(item, dsl_config))
        elif isinstance(item, Rule):
            rules.append(item)
        elif isinstance(item, tuple):
            name, *params = item
            rules.append(Rule(name, tuple(str(p) for p in params)))
        else:
            raise CompileError(f"bad rule entry {item!r}")
    return rules


def _compile_rule(rule: Rule, column, dtype, schema, registry) -> PlanRule:
    factory = registry.get(rule.name)
    ctx = CompileContext(column=column, dtype=dtype, params=rule.params,
                         schema=schema, registry=registry)
    kernel = factory(ctx)
    return PlanRule(rule_id=rule.name, kernel=kernel, params=rule.params)


def _compile_condition(w: When, schema: pa.Schema):
    """Compile a When condition to a row-mask function (tbl -> np.bool[n])."""
    from .rules.kernels import compare_literal_kernel

    dtype = _lookup_type(schema, w.column)
    kern = compare_literal_kernel(w.op, dtype, w.value, w.column)

    def cond(tbl: pa.Table) -> np.ndarray:
        return kern(get_path(tbl, w.column), tbl)

    return cond
