"""Violation-message localization.

Mirrors the reference's i18n surface (translator + per-locale catalogs with
positional args, /root/reference/i18n/translator.go:56-90) as a driver-side /
``map_batches`` post-processing step over the violations table: ``rule_id`` ->
message template, formatted with the violation's column and rule params.

Catalogs are our own wording (the reference's YAML files are not copied); every
registered rule has a message — explicit templates for parameterized rules,
a generated default otherwise. ``register_locale`` is the extension hook
(parity with Translator.Bundle)."""

from __future__ import annotations

import pyarrow as pa

_EN_OVERRIDES = {
    "required": "{field} is required",
    "omitempty": "",
    "min": "{field} must be at least {p0}",
    "max": "{field} must be at most {p0}",
    "len": "{field} must have length {p0}",
    "eq": "{field} must equal {p0}",
    "ne": "{field} must not equal {p0}",
    "gt": "{field} must be greater than {p0}",
    "gte": "{field} must be at least {p0}",
    "lt": "{field} must be less than {p0}",
    "lte": "{field} must be at most {p0}",
    "oneof": "{field} must be one of: {params}",
    "eqfield": "{field} must equal field {p0}",
    "nefield": "{field} must not equal field {p0}",
    "gtfield": "{field} must be greater than field {p0}",
    "ltfield": "{field} must be less than field {p0}",
    "gtefield": "{field} must be at least field {p0}",
    "ltefield": "{field} must be at most field {p0}",
    "contains": "{field} must contain '{p0}'",
    "excludes": "{field} must not contain '{p0}'",
    "startswith": "{field} must start with '{p0}'",
    "endswith": "{field} must end with '{p0}'",
    "uuid": "{field} must be a valid UUID",
    "email": "{field} must be a valid email address",
    "url": "{field} must be a valid URL",
    "ip": "{field} must be a valid IP address",
    "datetime": "{field} must be a valid datetime",
    "unique": "{field} must be unique",
    "unique:image_id": "duplicate image_id",
    "unique:phash": "duplicate phash",
    "referential": "{field} has no matching row in the side table",
    "image_decode": "image payload failed to decode",
    "image_dims": "decoded image dimensions do not match (w, h)",
    "image_phash": "stored phash does not match decoded pixels",
    "image_psnr": "lossy round-trip PSNR below threshold",
}

_ZH_OVERRIDES = {
    "required": "{field}为必填字段",
    "min": "{field}必须至少为{p0}",
    "max": "{field}必须至多为{p0}",
    "len": "{field}长度必须为{p0}",
    "eq": "{field}必须等于{p0}",
    "oneof": "{field}必须是以下之一: {params}",
    "uuid": "{field}必须是有效的UUID",
    "email": "{field}必须是有效的邮箱地址",
    "unique:image_id": "image_id重复",
    "unique:phash": "phash重复",
    "referential": "{field}在side table中无匹配行",
    "image_decode": "图像解码失败",
    "image_dims": "解码尺寸与(w,h)不符",
    "image_phash": "phash与解码像素不符",
    "image_psnr": "有损往返PSNR低于阈值",
}

_DEFAULTS = {
    "en": "{field} failed rule '{rule}'",
    "zh-CN": "{field}未通过规则'{rule}'",
}

_LOCALES: dict[str, dict[str, str]] = {"en": _EN_OVERRIDES, "zh-CN": _ZH_OVERRIDES}


def register_locale(locale: str, catalog: dict[str, str],
                    default: str | None = None) -> None:
    _LOCALES.setdefault(locale, {}).update(catalog)
    if default:
        _DEFAULTS[locale] = default


def message_for(rule_id: str, field: str, params: tuple[str, ...] = (),
                locale: str = "en") -> str:
    cat = _LOCALES.get(locale, _LOCALES["en"])
    tmpl = cat.get(rule_id, _DEFAULTS.get(locale, _DEFAULTS["en"]))
    subs = {"field": field, "rule": rule_id, "params": ",".join(params)}
    for i, p in enumerate(params):
        subs[f"p{i}"] = p
    try:
        return tmpl.format(**subs)
    except (KeyError, IndexError):
        return _DEFAULTS["en"].format(field=field, rule=rule_id, params="")


def translate_batch(violations: pa.Table, locale: str = "en",
                    rule_params: dict[str, tuple[str, ...]] | None = None
                    ) -> pa.Table:
    """Append a ``message`` column to a violations batch. ``rule_params`` maps
    rule_id -> the compiled params (available from the CompiledRuleSet plans)."""
    import re

    rule_params = rule_params or {}
    rules = violations["rule_id"].to_pylist()
    cols = violations["column"].to_pylist()
    elem = re.compile(r"\.\[\d+\]$")  # element paths carry a `.[i]` suffix

    def params_for(c: str, r: str):
        base = elem.sub("", c)
        return (rule_params.get((c, r)) or rule_params.get((base, r))
                or rule_params.get(r) or ())

    msgs = [message_for(r, c, params_for(c, r), locale)
            for r, c in zip(rules, cols)]
    return violations.append_column("message", pa.array(msgs, pa.string()))


def translate(violations_ds, locale: str = "en",
              rule_params: dict[str, tuple[str, ...]] | None = None):
    """Lazy Dataset variant: map_batches wrapper."""
    return violations_ds.map_batches(
        lambda b: translate_batch(b, locale, rule_params),
        batch_format="pyarrow")
