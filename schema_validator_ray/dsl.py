"""Rule-spec DSL parser.

Parses tag strings like ``"required|min=8|oneof=a,b"`` into ``[Rule(name, params)]``.
Grammar semantics mirror the reference's tag DSL (see /root/reference/tag/tag.go:42-119):

- ``|`` splits rules, ``=`` separates name from params, ``,`` splits params.
- A ``|`` that appears *inside* a param section is kept as part of the param when the
  following segment is neither ``name=...``-shaped nor a bare validator name (heuristic
  that keeps regex-ish params intact, tag/tag.go:57-75).
- Params are trimmed; empty params are dropped (tag/tag.go:100-107).
- Validator names start with a letter and contain only letters/underscore
  (tag/tag.go:121-140).

All separators are configurable via :class:`DslConfig` (parity with ``tag.Config``).
This runs on the driver only, at rule-compile time — never in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Rule:
    name: str
    params: tuple[str, ...] = ()


@dataclass(frozen=True)
class DslConfig:
    rule_splitter: str = "|"
    name_param_separator: str = "="
    params_separator: str = ","


DEFAULT_CONFIG = DslConfig()


def _is_validator_name(s: str, cfg: DslConfig) -> bool:
    s = s.strip()
    if not s:
        return False
    for i, ch in enumerate(s):
        if i == 0:
            if not ch.isascii() or not ch.isalpha():
                return False
        elif not ((ch.isascii() and ch.isalpha()) or ch == "_"):
            return False
    return True


def parse_tag(tag: str, cfg: DslConfig = DEFAULT_CONFIG) -> list[Rule]:
    """Tokenize a tag string into rules, keeping ``|`` inside params when the next
    segment cannot be the start of a new rule (the reference's heuristic)."""
    if not tag:
        return []

    rules: list[Rule] = []
    current = ""
    in_param = False

    i = 0
    n = len(tag)
    while i < n:
        ch = tag[i]
        if ch == cfg.name_param_separator:
            in_param = True
            current += ch
        elif ch == cfg.rule_splitter:
            if in_param:
                # peek at the next |-delimited segment
                j = i + 1
                next_part = ""
                while j < n and tag[j] != cfg.rule_splitter:
                    next_part += tag[j]
                    j += 1
                if (
                    cfg.name_param_separator not in next_part
                    and not _is_validator_name(next_part, cfg)
                ):
                    current += ch  # the | belongs to the param
                else:
                    in_param = False
                    if current:
                        rules.append(_parse_rule(current, cfg))
                        current = ""
            else:
                if current:
                    rules.append(_parse_rule(current, cfg))
                    current = ""
        else:
            current += ch
        i += 1

    if current:
        rules.append(_parse_rule(current, cfg))
    return rules


def _parse_rule(rule_str: str, cfg: DslConfig) -> Rule:
    rule_str = rule_str.strip()
    sep = cfg.name_param_separator
    if sep in rule_str:
        before, after = rule_str.split(sep, 1)
        name = before.strip()
        raw = after.strip()
        params: list[str] = []
        if raw:
            for p in raw.split(cfg.params_separator):
                p = p.strip()
                if p:
                    params.append(p)
        return Rule(name, tuple(params))
    return Rule(rule_str, ())
