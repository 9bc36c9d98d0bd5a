"""Violation-message localization.

Mirrors the reference's i18n surface (translator + per-locale catalogs with
positional args, /root/reference/i18n/translator.go:56-90) as a driver-side /
``map_batches`` post-processing step over the violations table: ``rule_id`` ->
message template, formatted with the violation's column and rule params.

Catalogs are our own wording (the reference's YAML files are NOT copied —
reference surface: i18n/msg.en.yaml key list only). Every one of the 161
registered rules has an explicit template in both locales, asserted by
tests/test_api_surface.py; the catalogs are assembled from three layers so the
wording stays consistent per family:

- ``_PARAM_*``: hand-written templates for parameterized rules ({p0}/{params});
- ``_VALID_*``: per-rule noun labels rendered as "must be a valid <label>";
- ``_PROP_*``: full property sentences for content-class rules.

``register_locale`` is the extension hook (parity with Translator.Bundle).
"""

from __future__ import annotations

import pyarrow as pa

# --------------------------------------------------------------------------
# parameterized rules ({p0} = first param, {params} = comma-joined list)

_PARAM_EN = {
    "required": "{field} is required",
    "omitempty": "",
    "isdefault": "{field} must be the zero value",
    "min": "{field} must be at least {p0}",
    "max": "{field} must be at most {p0}",
    "len": "{field} must have length {p0}",
    "eq": "{field} must equal {p0}",
    "ne": "{field} must not equal {p0}",
    "eq_ignore_case": "{field} must equal {p0} (case-insensitive)",
    "ne_ignore_case": "{field} must not equal {p0} (case-insensitive)",
    "gt": "{field} must be greater than {p0}",
    "gte": "{field} must be at least {p0}",
    "lt": "{field} must be less than {p0}",
    "lte": "{field} must be at most {p0}",
    "oneof": "{field} must be one of: {params}",
    "eqfield": "{field} must equal field {p0}",
    "nefield": "{field} must not equal field {p0}",
    "gtfield": "{field} must be greater than field {p0}",
    "gtefield": "{field} must be at least field {p0}",
    "ltfield": "{field} must be less than field {p0}",
    "ltefield": "{field} must be at most field {p0}",
    "fieldcontains": "{field} must contain the value of field {p0}",
    "fieldexcludes": "{field} must not contain the value of field {p0}",
    "contains": "{field} must contain '{p0}'",
    "containsany": "{field} must contain at least one of the characters "
                   "'{p0}'",
    "containsrune": "{field} must contain the character '{p0}'",
    "excludes": "{field} must not contain '{p0}'",
    "excludesall": "{field} must not contain any of the characters '{p0}'",
    "excludesrune": "{field} must not contain the character '{p0}'",
    "startswith": "{field} must start with '{p0}'",
    "endswith": "{field} must end with '{p0}'",
    "startsnotwith": "{field} must not start with '{p0}'",
    "endsnotwith": "{field} must not end with '{p0}'",
    "required_if": "{field} is required when {params}",
    "required_unless": "{field} is required unless {params}",
    "required_with": "{field} is required when any of [{params}] is present",
    "required_with_all": "{field} is required when all of [{params}] are "
                         "present",
    "required_without": "{field} is required when any of [{params}] is "
                        "absent",
    "required_without_all": "{field} is required when all of [{params}] are "
                            "absent",
    "excluded_if": "{field} must be absent when {params}",
    "excluded_unless": "{field} must be absent unless {params}",
    "excluded_with": "{field} must be absent when any of [{params}] is "
                     "present",
    "excluded_with_all": "{field} must be absent when all of [{params}] are "
                         "present",
    "excluded_without": "{field} must be absent when any of [{params}] is "
                        "absent",
    "excluded_without_all": "{field} must be absent when all of [{params}] "
                            "are absent",
    "unique": "{field} must contain unique values",
    "datetime": "{field} must match the datetime layout {p0}",
    "postcode_iso3166_alpha2": "{field} must be a valid postcode of country "
                               "{p0}",
    "postcode_iso3166_alpha2_field": "{field} must be a valid postcode of "
                                     "the country in field {p0}",
    "spicedb": "{field} must be a valid SpiceDB {p0} identifier",
}

_PARAM_ZH = {
    "required": "{field}为必填字段",
    "omitempty": "",
    "isdefault": "{field}必须为零值",
    "min": "{field}不得小于{p0}",
    "max": "{field}不得大于{p0}",
    "len": "{field}的长度必须为{p0}",
    "eq": "{field}必须等于{p0}",
    "ne": "{field}不得等于{p0}",
    "eq_ignore_case": "{field}必须等于{p0}（忽略大小写）",
    "ne_ignore_case": "{field}不得等于{p0}（忽略大小写）",
    "gt": "{field}必须大于{p0}",
    "gte": "{field}不得小于{p0}",
    "lt": "{field}必须小于{p0}",
    "lte": "{field}不得大于{p0}",
    "oneof": "{field}必须是以下值之一：{params}",
    "eqfield": "{field}必须等于字段{p0}",
    "nefield": "{field}不得等于字段{p0}",
    "gtfield": "{field}必须大于字段{p0}",
    "gtefield": "{field}不得小于字段{p0}",
    "ltfield": "{field}必须小于字段{p0}",
    "ltefield": "{field}不得大于字段{p0}",
    "fieldcontains": "{field}必须包含字段{p0}的值",
    "fieldexcludes": "{field}不得包含字段{p0}的值",
    "contains": "{field}必须包含'{p0}'",
    "containsany": "{field}必须包含'{p0}'中的至少一个字符",
    "containsrune": "{field}必须包含字符'{p0}'",
    "excludes": "{field}不得包含'{p0}'",
    "excludesall": "{field}不得包含'{p0}'中的任何字符",
    "excludesrune": "{field}不得包含字符'{p0}'",
    "startswith": "{field}必须以'{p0}'开头",
    "endswith": "{field}必须以'{p0}'结尾",
    "startsnotwith": "{field}不得以'{p0}'开头",
    "endsnotwith": "{field}不得以'{p0}'结尾",
    "required_if": "当{params}时{field}为必填字段",
    "required_unless": "除非{params}，{field}为必填字段",
    "required_with": "当[{params}]中任一字段存在时{field}为必填字段",
    "required_with_all": "当[{params}]中所有字段存在时{field}为必填字段",
    "required_without": "当[{params}]中任一字段缺失时{field}为必填字段",
    "required_without_all": "当[{params}]中所有字段缺失时{field}为必填字段",
    "excluded_if": "当{params}时{field}必须为空",
    "excluded_unless": "除非{params}，{field}必须为空",
    "excluded_with": "当[{params}]中任一字段存在时{field}必须为空",
    "excluded_with_all": "当[{params}]中所有字段存在时{field}必须为空",
    "excluded_without": "当[{params}]中任一字段缺失时{field}必须为空",
    "excluded_without_all": "当[{params}]中所有字段缺失时{field}必须为空",
    "unique": "{field}必须包含唯一值",
    "datetime": "{field}必须符合日期时间格式{p0}",
    "postcode_iso3166_alpha2": "{field}必须是国家{p0}的有效邮政编码",
    "postcode_iso3166_alpha2_field": "{field}必须是字段{p0}所指国家的有效邮政编码",
    "spicedb": "{field}必须是有效的SpiceDB {p0}标识符",
}

# --------------------------------------------------------------------------
# "must be a valid <label>" family — label per rule, rendered below

_VALID_EN = {
    "number": "number",
    "numeric": "numeric value",
    "boolean": "boolean",
    "email": "email address",
    "url": "URL",
    "uri": "URI",
    "http_url": "HTTP URL",
    "https_url": "HTTPS URL",
    "url_encoded": "URL-encoded string",
    "urn_rfc2141": "RFC 2141 URN",
    "datauri": "data URI",
    "base64": "base64 string",
    "base64url": "base64url string",
    "base64rawurl": "unpadded base64url string",
    "json": "JSON document",
    "jwt": "JSON Web Token",
    "uuid": "UUID",
    "uuid3": "UUID v3",
    "uuid4": "UUID v4",
    "uuid5": "UUID v5",
    "uuid_rfc4122": "RFC 4122 UUID",
    "uuid3_rfc4122": "RFC 4122 UUID v3",
    "uuid4_rfc4122": "RFC 4122 UUID v4",
    "uuid5_rfc4122": "RFC 4122 UUID v5",
    "ulid": "ULID",
    "md4": "MD4 hash",
    "md5": "MD5 hash",
    "sha256": "SHA-256 hash",
    "sha384": "SHA-384 hash",
    "sha512": "SHA-512 hash",
    "tiger128": "Tiger-128 hash",
    "tiger160": "Tiger-160 hash",
    "tiger192": "Tiger-192 hash",
    "ripemd128": "RIPEMD-128 hash",
    "ripemd160": "RIPEMD-160 hash",
    "hexadecimal": "hexadecimal string",
    "hexcolor": "hex color",
    "rgb": "RGB color",
    "rgba": "RGBA color",
    "hsl": "HSL color",
    "hsla": "HSLA color",
    "html": "HTML fragment",
    "html_encoded": "HTML-encoded string",
    "latitude": "latitude",
    "longitude": "longitude",
    "ssn": "US social security number",
    "ein": "US employer identification number",
    "e164": "E.164 phone number",
    "credit_card": "credit card number",
    "luhn_checksum": "Luhn-checksummed number",
    "isbn": "ISBN",
    "isbn10": "ISBN-10",
    "isbn13": "ISBN-13",
    "issn": "ISSN",
    "bic": "BIC",
    "bic_iso_9362_2014": "ISO 9362:2014 BIC",
    "btc_addr": "Bitcoin address",
    "btc_addr_bech32": "Bech32 Bitcoin address",
    "eth_addr": "Ethereum address",
    "iso3166_1_alpha2": "ISO 3166-1 alpha-2 country code",
    "iso3166_1_alpha3": "ISO 3166-1 alpha-3 country code",
    "iso3166_1_alpha_numeric": "ISO 3166-1 numeric country code",
    "iso3166_2": "ISO 3166-2 subdivision code",
    "iso4217": "ISO 4217 currency code",
    "bcp47_language_tag": "BCP 47 language tag",
    "timezone": "IANA timezone name",
    "semver": "semantic version",
    "cron": "cron expression",
    "cve": "CVE identifier",
    "mongodb": "MongoDB ObjectID",
    "mongodb_connection_string": "MongoDB connection string",
    "ip": "IP address",
    "ipv4": "IPv4 address",
    "ipv6": "IPv6 address",
    "ip_addr": "resolvable IP address",
    "ip4_addr": "resolvable IPv4 address",
    "ip6_addr": "resolvable IPv6 address",
    "cidr": "CIDR notation",
    "cidrv4": "IPv4 CIDR notation",
    "cidrv6": "IPv6 CIDR notation",
    "mac": "MAC address",
    "tcp_addr": "TCP address",
    "tcp4_addr": "TCPv4 address",
    "tcp6_addr": "TCPv6 address",
    "udp_addr": "UDP address",
    "udp4_addr": "UDPv4 address",
    "udp6_addr": "UDPv6 address",
    "unix_addr": "Unix domain socket address",
    "hostname": "hostname",
    "hostname_rfc1123": "RFC 1123 hostname",
    "hostname_port": "host:port pair",
    "fqdn": "fully qualified domain name",
    "domain": "domain name",
    "port": "port number",
    "file": "path to an existing file",
    "filepath": "file path",
    "dir": "path to an existing directory",
    "dirpath": "directory path",
    "image": "image file",
    "uds_exists": "existing Unix domain socket",
}

_VALID_ZH = {
    "number": "数字",
    "numeric": "数值",
    "boolean": "布尔值",
    "email": "邮箱地址",
    "url": "URL",
    "uri": "URI",
    "http_url": "HTTP URL",
    "https_url": "HTTPS URL",
    "url_encoded": "URL编码字符串",
    "urn_rfc2141": "RFC 2141 URN",
    "datauri": "data URI",
    "base64": "base64字符串",
    "base64url": "base64url字符串",
    "base64rawurl": "无填充base64url字符串",
    "json": "JSON文档",
    "jwt": "JSON Web Token",
    "uuid": "UUID",
    "uuid3": "UUID v3",
    "uuid4": "UUID v4",
    "uuid5": "UUID v5",
    "uuid_rfc4122": "RFC 4122 UUID",
    "uuid3_rfc4122": "RFC 4122 UUID v3",
    "uuid4_rfc4122": "RFC 4122 UUID v4",
    "uuid5_rfc4122": "RFC 4122 UUID v5",
    "ulid": "ULID",
    "md4": "MD4哈希",
    "md5": "MD5哈希",
    "sha256": "SHA-256哈希",
    "sha384": "SHA-384哈希",
    "sha512": "SHA-512哈希",
    "tiger128": "Tiger-128哈希",
    "tiger160": "Tiger-160哈希",
    "tiger192": "Tiger-192哈希",
    "ripemd128": "RIPEMD-128哈希",
    "ripemd160": "RIPEMD-160哈希",
    "hexadecimal": "十六进制字符串",
    "hexcolor": "十六进制颜色",
    "rgb": "RGB颜色",
    "rgba": "RGBA颜色",
    "hsl": "HSL颜色",
    "hsla": "HSLA颜色",
    "html": "HTML片段",
    "html_encoded": "HTML编码字符串",
    "latitude": "纬度",
    "longitude": "经度",
    "ssn": "美国社会安全号码",
    "ein": "美国雇主识别号",
    "e164": "E.164电话号码",
    "credit_card": "信用卡号",
    "luhn_checksum": "通过Luhn校验的号码",
    "isbn": "ISBN",
    "isbn10": "ISBN-10",
    "isbn13": "ISBN-13",
    "issn": "ISSN",
    "bic": "BIC",
    "bic_iso_9362_2014": "ISO 9362:2014 BIC",
    "btc_addr": "比特币地址",
    "btc_addr_bech32": "Bech32比特币地址",
    "eth_addr": "以太坊地址",
    "iso3166_1_alpha2": "ISO 3166-1二位字母国家代码",
    "iso3166_1_alpha3": "ISO 3166-1三位字母国家代码",
    "iso3166_1_alpha_numeric": "ISO 3166-1数字国家代码",
    "iso3166_2": "ISO 3166-2行政区划代码",
    "iso4217": "ISO 4217货币代码",
    "bcp47_language_tag": "BCP 47语言标签",
    "timezone": "IANA时区名称",
    "semver": "语义化版本号",
    "cron": "cron表达式",
    "cve": "CVE编号",
    "mongodb": "MongoDB ObjectID",
    "mongodb_connection_string": "MongoDB连接字符串",
    "ip": "IP地址",
    "ipv4": "IPv4地址",
    "ipv6": "IPv6地址",
    "ip_addr": "可解析的IP地址",
    "ip4_addr": "可解析的IPv4地址",
    "ip6_addr": "可解析的IPv6地址",
    "cidr": "CIDR表示法",
    "cidrv4": "IPv4 CIDR表示法",
    "cidrv6": "IPv6 CIDR表示法",
    "mac": "MAC地址",
    "tcp_addr": "TCP地址",
    "tcp4_addr": "TCPv4地址",
    "tcp6_addr": "TCPv6地址",
    "udp_addr": "UDP地址",
    "udp4_addr": "UDPv4地址",
    "udp6_addr": "UDPv6地址",
    "unix_addr": "Unix域套接字地址",
    "hostname": "主机名",
    "hostname_rfc1123": "RFC 1123主机名",
    "hostname_port": "主机:端口对",
    "fqdn": "完全限定域名",
    "domain": "域名",
    "port": "端口号",
    "file": "指向已存在文件的路径",
    "filepath": "文件路径",
    "dir": "指向已存在目录的路径",
    "dirpath": "目录路径",
    "image": "图像文件",
    "uds_exists": "已存在的Unix域套接字",
}

# --------------------------------------------------------------------------
# property sentences (content-class rules with no parameter)

_PROP_EN = {
    "alpha": "{field} may contain only letters",
    "alphanum": "{field} may contain only letters and digits",
    "alphanumspace": "{field} may contain only letters, digits and spaces",
    "alphanumunicode": "{field} may contain only Unicode letters and digits",
    "alphaspace": "{field} may contain only letters and spaces",
    "alphaunicode": "{field} may contain only Unicode letters",
    "ascii": "{field} may contain only ASCII characters",
    "printascii": "{field} may contain only printable ASCII characters",
    "multibyte": "{field} must contain multibyte characters",
    "lowercase": "{field} must be lowercase",
    "uppercase": "{field} must be uppercase",
}

_PROP_ZH = {
    "alpha": "{field}只能包含字母",
    "alphanum": "{field}只能包含字母和数字",
    "alphanumspace": "{field}只能包含字母、数字和空格",
    "alphanumunicode": "{field}只能包含Unicode字母和数字",
    "alphaspace": "{field}只能包含字母和空格",
    "alphaunicode": "{field}只能包含Unicode字母",
    "ascii": "{field}只能包含ASCII字符",
    "printascii": "{field}只能包含可打印的ASCII字符",
    "multibyte": "{field}必须包含多字节字符",
    "lowercase": "{field}必须为小写",
    "uppercase": "{field}必须为大写",
}

# pipeline-level (non-registry) rule ids emitted by the distributed stages
_PIPELINE_EN = {
    "unique:image_id": "duplicate image_id",
    "unique:phash": "duplicate phash",
    "referential": "{field} has no matching row in the side table",
    "image_decode": "image payload failed to decode",
    "image_dims": "decoded image dimensions do not match (w, h)",
    "image_phash": "stored phash does not match decoded pixels",
    "image_psnr": "lossy round-trip PSNR below threshold",
}

_PIPELINE_ZH = {
    "unique:image_id": "image_id重复",
    "unique:phash": "phash重复",
    "referential": "{field}在side table中无匹配行",
    "image_decode": "图像解码失败",
    "image_dims": "解码尺寸与(w,h)不符",
    "image_phash": "phash与解码像素不符",
    "image_psnr": "有损往返PSNR低于阈值",
}


def _build(param: dict, valid: dict, prop: dict, pipeline: dict,
           valid_tmpl: str) -> dict[str, str]:
    cat = dict(param)
    cat.update({r: valid_tmpl.format(label=lbl) for r, lbl in valid.items()})
    cat.update(prop)
    cat.update(pipeline)
    return cat


_EN = _build(_PARAM_EN, _VALID_EN, _PROP_EN, _PIPELINE_EN,
             "{{field}} must be a valid {label}")
_ZH = _build(_PARAM_ZH, _VALID_ZH, _PROP_ZH, _PIPELINE_ZH,
             "{{field}}必须是有效的{label}")

_DEFAULTS = {
    "en": "{field} failed rule '{rule}'",
    "zh-CN": "{field}未通过规则'{rule}'",
}

_LOCALES: dict[str, dict[str, str]] = {"en": _EN, "zh-CN": _ZH}


def register_locale(locale: str, catalog: dict[str, str],
                    default: str | None = None) -> None:
    _LOCALES.setdefault(locale, {}).update(catalog)
    if default:
        _DEFAULTS[locale] = default


def has_explicit_template(rule_id: str, locale: str) -> bool:
    return rule_id in _LOCALES.get(locale, {})


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
