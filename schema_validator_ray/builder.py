"""Fluent builder API — code-first alternative to the tag DSL.

Parity with the reference's builder surface (builder.go:15-72: Object/Field/Array,
Required/Optional, AddValidator, WithField) producing the same spec structure that
``compile_ruleset`` consumes, so both entry points share one compiler.

    spec = obj(
        image_id=field().required().rule("uuid"),
        w=field().required().rule("min", 1).rule("max", 65535),
        tags=array().rule("min", 1).dive(field().required().rule("len", 4)),
        address=obj(street=field().required()),
    )
    compiled = compile_ruleset(spec.build(), schema)
"""

from __future__ import annotations

from typing import Any

from .dsl import Rule


class FieldBuilder:
    def __init__(self) -> None:
        self._rules: list[Rule] = []

    def rule(self, name: str, *params: Any) -> "FieldBuilder":
        self._rules.append(Rule(name, tuple(str(p) for p in params)))
        return self

    def required(self) -> "FieldBuilder":
        return self.rule("required")

    def optional(self) -> "FieldBuilder":
        return self.rule("omitempty")

    def build(self) -> list[Rule]:
        return list(self._rules)


class ArrayBuilder(FieldBuilder):
    def __init__(self) -> None:
        super().__init__()
        self._element: FieldBuilder | None = None

    def dive(self, element: FieldBuilder) -> "ArrayBuilder":
        self._element = element
        return self

    def build(self) -> list[Rule]:
        rules = list(self._rules)
        if self._element is not None:
            rules.append(Rule("dive"))
            rules.extend(self._element.build())
        return rules


class ObjectBuilder:
    def __init__(self, **fields: "FieldBuilder | ObjectBuilder") -> None:
        self._fields: dict[str, Any] = dict(fields)

    def with_field(self, name: str, fb: "FieldBuilder | ObjectBuilder") -> "ObjectBuilder":
        self._fields[name] = fb
        return self

    def build(self) -> dict:
        return {name: fb.build() for name, fb in self._fields.items()}


def obj(**fields) -> ObjectBuilder:
    return ObjectBuilder(**fields)


def field() -> FieldBuilder:
    return FieldBuilder()


def array() -> ArrayBuilder:
    return ArrayBuilder()
