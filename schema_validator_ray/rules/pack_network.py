"""Network rules (31 rules).

Parity: /root/reference/rule/network.go. IPv4 is a strict dotted-decimal regex
(no leading zeros, matching Go net.ParseIP); IPv6 and CIDR fall back to Python's
``ipaddress`` on the (rare) rows that are not plain IPv4 — still evaluated
batch-at-a-time.

Hermetic divergences (pinned in tests, SURVEY §2.6):
- ``tcp_addr``/``udp_addr``: Go's ResolveTCPAddr may hit DNS; we accept only IP
  literals (v6 in brackets) or "localhost" as host — no DNS in a sealed engine.
- ``tcp4/6_addr``/``udp4/6_addr``: Go LookupPort accepts service names; we accept
  numeric ports 0-65535 only.
- ``uds_exists`` keeps the reference's os.Stat semantics (env-dependent; excluded
  from the image validation profile).
"""

from __future__ import annotations

import ipaddress
import os

import numpy as np
import pyarrow.compute as pc

from ..registry import CompileContext, register
from .kernels import as_str, np_bool, regex_pass

_IPV4 = (r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
         r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$")
_HOSTNAME = r"^[a-zA-Z0-9]([a-zA-Z0-9-.]{0,61}[a-zA-Z0-9])?$"

register("datauri")(lambda ctx: regex_pass(r"^data:[^;]+(;base64)?,.*$"))
register("mac")(lambda ctx: regex_pass(r"^([0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}$"))
register("hostname")(lambda ctx: regex_pass(_HOSTNAME))
register("hostname_rfc1123")(lambda ctx: regex_pass(_HOSTNAME))
register("url")(lambda ctx: regex_pass(r"^https?://[^\s]+$"))
register("http_url")(lambda ctx: regex_pass(r"^https?://[^\s]+$"))
register("https_url")(lambda ctx: regex_pass(r"^https://[^\s]+$"))
register("urn_rfc2141")(
    lambda ctx: regex_pass(r"^urn:[a-zA-Z0-9][a-zA-Z0-9-]{0,31}:[a-zA-Z0-9()+,.:=@;$_!*'-]+$"))


def _is_ip(s: str) -> ipaddress.IPv4Address | ipaddress.IPv6Address | None:
    try:
        return ipaddress.ip_address(s)
    except ValueError:
        return None


def _ip_family(s: str) -> int:
    """0 = not an IP, 4 = v4-form (incl. v4-mapped v6, Go To4()!=nil), 6 = v6."""
    ip = _is_ip(s)
    if ip is None:
        return 0
    if isinstance(ip, ipaddress.IPv4Address):
        return 4
    if ip.ipv4_mapped is not None:
        return 4
    return 6


def _ip_kernel(want):
    """want: callable(family:int) -> bool"""

    def kernel(col, tbl):
        s = as_str(col)
        v4 = np_bool(pc.match_substring_regex(s, _IPV4))
        vals = s.to_pylist()
        out = np.empty(len(vals), bool)
        for i, v in enumerate(vals):
            fam = 4 if v4[i] else (_ip_family(v) if ":" in v else 0)
            out[i] = want(fam)
        return out

    return kernel


for _name in ("ip", "ip_addr"):
    register(_name)(lambda ctx: _ip_kernel(lambda f: f != 0))
for _name in ("ip4_addr", "ipv4"):
    register(_name)(lambda ctx: _ip_kernel(lambda f: f == 4))
for _name in ("ip6_addr", "ipv6"):
    register(_name)(lambda ctx: _ip_kernel(lambda f: f == 6))


def _cidr_family(s: str) -> int:
    """0 invalid, else the family of the address part (Go ParseCIDR)."""
    if s.count("/") != 1:
        return 0
    addr, _, pfx = s.partition("/")
    if not pfx.isdigit():
        return 0
    fam = _ip_family(addr)
    bits = 32 if fam == 4 else 128
    if fam == 0 or int(pfx) > bits:
        return 0
    return fam


def _cidr_kernel(want):
    def kernel(col, tbl):
        vals = as_str(col).to_pylist()
        return np.fromiter((want(_cidr_family(v)) for v in vals), bool, len(vals))

    return kernel


register("cidr")(lambda ctx: _cidr_kernel(lambda f: f != 0))
register("cidrv4")(lambda ctx: _cidr_kernel(lambda f: f == 4))
register("cidrv6")(lambda ctx: _cidr_kernel(lambda f: f == 6))


@register("fqdn")
def _fqdn(ctx: CompileContext):
    # dns.IsFqdn: non-empty and ends with an (unescaped) dot
    def kernel(col, tbl):
        s = as_str(col)
        return np_bool(pc.ends_with(s, ".")) & ~np_bool(pc.ends_with(s, r"\."))

    return kernel


@register("domain")
def _domain(ctx: CompileContext):
    # dns.IsDomainName: packable name — no empty labels, labels <= 63 bytes,
    # total <= 255; a single trailing dot allowed
    def kernel(col, tbl):
        s = as_str(col)
        shape = np_bool(pc.match_substring_regex(
            s, r"^(?:[^.]{1,63}\.)*[^.]{1,63}\.?$"))
        ln = pc.binary_length(s).to_numpy(zero_copy_only=False)
        return shape & (ln <= 255) & (ln > 0)

    return kernel


@register("port")
def _port(ctx: CompileContext):
    from .kernels import is_numeric

    def kernel(col, tbl):
        if is_numeric(col.type):
            v = col.fill_null(-1).to_numpy(zero_copy_only=False)
        else:
            s = as_str(col)
            ok = np_bool(pc.match_substring_regex(s, r"^[+-]?\d+$"))
            v = np.full(len(s), -1, dtype=np.int64)
            lst = s.to_pylist()
            for i in range(len(lst)):
                if ok[i]:
                    v[i] = int(lst[i])
        return (v >= 1) & (v <= 65535)

    return kernel


def _split_host_port(s: str) -> tuple[str, str] | None:
    """net.SplitHostPort semantics: host:port with v6 hosts in brackets."""
    if s.startswith("["):
        end = s.find("]")
        if end < 0 or len(s) <= end + 1 or s[end + 1] != ":":
            return None
        host, port = s[1:end], s[end + 2:]
        return (host, port)
    if s.count(":") != 1:
        return None
    host, _, port = s.partition(":")
    return (host, port)


def _numeric_port_ok(p: str) -> bool:
    return p.isdigit() and int(p) <= 65535


@register("hostname_port")
def _hostname_port(ctx: CompileContext):
    import re

    hostname_re = re.compile(_HOSTNAME)

    def kernel(col, tbl):
        vals = as_str(col).to_pylist()
        out = np.zeros(len(vals), bool)
        for i, v in enumerate(vals):
            hp = _split_host_port(v)
            if hp is None:
                continue
            host, port = hp
            if _ip_family(host) == 0 and not hostname_re.match(host):
                continue
            out[i] = port.isdigit() and 1 <= int(port) <= 65535
        return out

    return kernel


def _l4_addr_factory(family: int | None, resolve: bool = False):
    """family: 4 / 6 / None (any). resolve=True mirrors tcp_addr/udp_addr
    (hermetic: IP literal or 'localhost' only — no DNS)."""

    def factory(ctx: CompileContext):
        def kernel(col, tbl):
            vals = as_str(col).to_pylist()
            out = np.zeros(len(vals), bool)
            for i, v in enumerate(vals):
                hp = _split_host_port(v)
                if hp is None:
                    continue
                host, port = hp
                if not _numeric_port_ok(port):
                    continue
                fam = _ip_family(host)
                if resolve:
                    out[i] = fam != 0 or host == "localhost" or host == ""
                elif family is None:
                    out[i] = fam != 0
                else:
                    out[i] = fam == family
            return out

        return kernel

    return factory


register("tcp4_addr")(_l4_addr_factory(4))
register("tcp6_addr")(_l4_addr_factory(6))
register("udp4_addr")(_l4_addr_factory(4))
register("udp6_addr")(_l4_addr_factory(6))
register("tcp_addr")(_l4_addr_factory(None, resolve=True))
register("udp_addr")(_l4_addr_factory(None, resolve=True))


@register("unix_addr")
def _unix_addr(ctx: CompileContext):
    def kernel(col, tbl):
        s = as_str(col)
        return np_bool(pc.starts_with(s, "/")) | np_bool(pc.starts_with(s, "@"))

    return kernel


@register("uds_exists")
def _uds_exists(ctx: CompileContext):
    # env-dependent by design (parity with rule/network.go:279-289)
    def kernel(col, tbl):
        vals = as_str(col).to_pylist()
        return np.fromiter(
            (v.startswith("@") or os.path.exists(v) for v in vals), bool, len(vals))

    return kernel


@register("uri")
def _uri(ctx: CompileContext):
    # url.ParseRequestURI: absolute URI (scheme:...) or rooted path, no spaces/ctl
    def kernel(col, tbl):
        return np_bool(pc.match_substring_regex(
            as_str(col),
            r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:[^ \x00-\x1f]*|/[^ \x00-\x1f]*)$"))

    return kernel


@register("url_encoded")
def _url_encoded(ctx: CompileContext):
    # no spaces; every % followed by two hex digits (QueryUnescape succeeds)
    def kernel(col, tbl):
        return np_bool(pc.match_substring_regex(
            as_str(col), r"^(?:[^% ]|%[0-9a-fA-F]{2})*$"))

    return kernel
