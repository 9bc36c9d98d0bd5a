"""schema_validator_ray — a Ray-Data-native schema + constraint validation engine.

From-scratch re-expression of the capabilities of ``weilence/schema-validator``
(reference at /root/reference, studied for WHAT it computes) as idiomatic Ray Data:
declarative rule specs compile to vectorized Arrow-compute predicate plans evaluated
per batch via ``map_batches`` over zero-copy Arrow blocks; wide checks (uniqueness,
referential integrity, distribution drift) run as pre-aggregated shuffles / broadcast
semi-joins; per-column stats are mergeable sketches held in actor pools.

Nothing here calls ``ray.init()`` — sessions are owned by bench.py / CLI / tests.
"""

from . import rules  # populate the default registry  # noqa: F401
from .builder import array, field, obj
from .compile import (CompiledRuleSet, When, compile_ruleset,
                      merge_specs, when)
from .dsl import DslConfig, Rule, parse_tag
from .errors import error_counts, has_error_code, has_field_error
from .registry import CompileError, Registry, default_registry, register

__all__ = [
    "CompiledRuleSet",
    "CompileError",
    "DslConfig",
    "Registry",
    "Rule",
    "When",
    "array",
    "compile_ruleset",
    "default_registry",
    "error_counts",
    "field",
    "has_error_code",
    "has_field_error",
    "merge_specs",
    "obj",
    "parse_tag",
    "register",
    "when",
]

__version__ = "0.1.0"
