"""Violation-table helpers — parity with the reference's error-inspection API
(schema/error.go:65-93: HasFieldError / HasErrorCode / Translate) re-expressed
over the violations table/Dataset."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _to_table(violations) -> pa.Table:
    if isinstance(violations, pa.Table):
        return violations
    batches = list(violations.iter_batches(batch_size=1 << 20,
                                           batch_format="pyarrow"))
    return (pa.concat_tables(batches) if batches
            else pa.table({"rule_id": pa.array([], pa.string()),
                           "column": pa.array([], pa.string())}))


def has_field_error(violations, column: str) -> bool:
    t = _to_table(violations)
    return bool(pc.any(pc.equal(t["column"], column)).as_py() or False)


def has_error_code(violations, rule_id: str) -> bool:
    t = _to_table(violations)
    return bool(pc.any(pc.equal(t["rule_id"], rule_id)).as_py() or False)


def field_errors(violations, column: str) -> pa.Table:
    t = _to_table(violations)
    return t.filter(pc.equal(t["column"], column))


def error_counts(violations) -> dict[str, int]:
    t = _to_table(violations)
    agg = t.group_by("rule_id").aggregate([([], "count_all")])
    return dict(zip(agg["rule_id"].to_pylist(),
                    (int(x) for x in agg["count_all"].to_pylist())))


def translate(violations, locale: str = "en"):
    """Attach localized messages (same as i18n.translate_batch for tables,
    i18n.translate for Datasets)."""
    from .i18n import translate as translate_ds
    from .i18n import translate_batch

    if isinstance(violations, pa.Table):
        return translate_batch(violations, locale)
    return translate_ds(violations, locale)
