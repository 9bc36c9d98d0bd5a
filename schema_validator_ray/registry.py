"""Rule registry: name -> compile-time kernel factory.

Mirrors the reference's registry surface (Register / Alias / isolated registries,
/root/reference/rule/registry.go:49-144) but instead of reflected per-value closures a
factory receives a :class:`CompileContext` (column name, Arrow type, params, table
schema) and returns a **vectorized kernel** ``kernel(col: pa.Array, tbl: pa.Table) ->
np.ndarray[bool]`` producing a per-row PASS mask for the whole batch.

Two error channels (parity with rule/registry.go:110-128):
- a kernel returning ``False`` at a row  -> collected violation, evaluation continues;
- a factory raising :class:`CompileError` -> abort (the reference's type-mismatch /
  unsupported-type channel, surfaced at compile time instead of mid-validation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa

Kernel = Callable[[pa.Array, pa.Table], np.ndarray]


class CompileError(Exception):
    """Rule cannot be compiled for this column type / params (abort channel)."""


@dataclass
class CompileContext:
    column: str                    # dotted path of the column being validated
    dtype: pa.DataType             # Arrow type of that column
    params: tuple[str, ...]        # raw string params from the DSL (or typed via builder)
    schema: pa.Schema | None       # full table schema (for cross-field rules)
    registry: "Registry"

    def param(self, i: int = 0) -> str:
        if len(self.params) <= i:
            raise CompileError(
                f"rule on column {self.column!r}: missing param #{i + 1}"
            )
        return self.params[i]


# Marker object returned by the `omitempty` factory: the engine interprets it as
# "gate off all later rules of this column where the value is empty"
# (reference semantics: ctx.SkipRest(), rule/other.go:319-325).
class SkipRestIfEmpty:
    pass


SKIP_REST_IF_EMPTY = SkipRestIfEmpty()


class Registry:
    """name -> factory(CompileContext) -> Kernel | SKIP_REST_IF_EMPTY."""

    def __init__(self) -> None:
        self._rules: dict[str, Callable[[CompileContext], Any]] = {}

    def register(self, name: str, factory: Callable[[CompileContext], Any]) -> None:
        self._rules[name] = factory

    def alias(self, new_name: str, existing: str) -> None:
        if existing not in self._rules:
            raise KeyError(f"cannot alias unknown rule {existing!r}")
        self._rules[new_name] = self._rules[existing]

    def get(self, name: str) -> Callable[[CompileContext], Any]:
        try:
            return self._rules[name]
        except KeyError:
            raise CompileError(f"unknown rule {name!r}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._rules

    def names(self) -> list[str]:
        return sorted(self._rules)


default_registry = Registry()


def register(name: str, registry: Registry | None = None):
    """Decorator: ``@register("myrule")`` on a factory function."""

    def deco(factory):
        (registry or default_registry).register(name, factory)
        return factory

    return deco
