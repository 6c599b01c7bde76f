"""VRL string / encode / ip / hash function families as Column builders.

Reference registry: /root/reference/website/cue/reference/remap/functions/
(string: upcase..sieve; codec: encode_base64 etc.; ip: ip_aton..; crypto:
md5..uuid). All JVM-side expressions — these compose into remap stages with
zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- case conversions ------------------------------------------------------

_WORD_SPLIT = r"[^a-zA-Z0-9]+|(?<=[a-z0-9])(?=[A-Z])"


def _words(col: Column) -> Column:
    """Lower-cased word array from any of camel/snake/kebab/space forms."""
    return F.filter(
        F.split(F.regexp_replace(col, r"(?<=[a-z0-9])(?=[A-Z])", " "), r"[^a-zA-Z0-9]+"),
        lambda w: w != "",
    )


def snakecase(col: Column) -> Column:
    return F.lower(F.array_join(_words(col), "_"))


def kebabcase(col: Column) -> Column:
    return F.lower(F.array_join(_words(col), "-"))


def screamingsnakecase(col: Column) -> Column:
    return F.upper(F.array_join(_words(col), "_"))


def camelcase(col: Column) -> Column:
    ws = _words(col)
    first = F.lower(F.element_at(ws, 1))
    rest = F.transform(
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda w: F.initcap(F.lower(w)),
    )
    return F.when(F.size(ws) == 0, F.lit("")).otherwise(
        F.concat(first, F.array_join(rest, ""))
    )


def pascalcase(col: Column) -> Column:
    return F.array_join(F.transform(_words(col), lambda w: F.initcap(F.lower(w))), "")


# --- string utilities ------------------------------------------------------

def truncate(col: Column, limit: int, suffix: str = "") -> Column:
    """VRL truncate: cut to `limit` chars, appending suffix if cut."""
    cut = F.substring(col, 1, limit)
    return F.when(F.length(col) > limit, F.concat(cut, F.lit(suffix))).otherwise(col)


def redact(col: Column, patterns: list[str], replacement: str = "[REDACTED]") -> Column:
    """VRL redact(filters: regex list): replace every match."""
    out = col
    for p in patterns:
        out = F.regexp_replace(out, p, replacement)
    return out


def sieve(col: Column, allow: str, replace_with: str = "") -> Column:
    """VRL sieve: keep only substrings matching `allow`, drop the rest."""
    return F.regexp_replace(col, f"(?:(?!{allow}).)+", replace_with)


def strip_ansi_escape_codes(col: Column) -> Column:
    return F.regexp_replace(col, r"\x1b\[[0-9;]*[A-Za-z]", "")


# --- encode / decode -------------------------------------------------------

def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def decode_base64(col: Column) -> Column:
    return F.unbase64(col)


def encode_base16(col: Column) -> Column:
    return F.lower(F.hex(col.cast("binary")))


def decode_base16(col: Column) -> Column:
    return F.unhex(col)


def encode_percent(col: Column) -> Column:
    return F.url_encode(col)


def decode_percent(col: Column) -> Column:
    return F.url_decode(col)


def encode_json(col: Column) -> Column:
    """VRL encode_json on a struct/map column."""
    return F.to_json(col)


def encode_logfmt(cols: dict[str, Column]) -> Column:
    """VRL encode_logfmt: stable key order, key=value pairs."""
    parts = []
    for k in sorted(cols):
        parts.append(F.concat(F.lit(f"{k}="), cols[k].cast("string")))
    return F.concat_ws(" ", *parts)


# --- ip --------------------------------------------------------------------

def ip_aton(col: Column) -> Column:
    """VRL ip_aton: dotted IPv4 -> uint32-as-long."""
    o = F.split(col, r"\.")
    return (
        F.element_at(o, 1).cast("long") * 16777216
        + F.element_at(o, 2).cast("long") * 65536
        + F.element_at(o, 3).cast("long") * 256
        + F.element_at(o, 4).cast("long")
    )


def ip_ntoa(col: Column) -> Column:
    """VRL ip_ntoa: uint32-as-long -> dotted IPv4."""
    return F.concat_ws(
        ".",
        F.floor(col / 16777216).cast("long").cast("string"),
        F.pmod(F.floor(col / 65536), F.lit(256)).cast("long").cast("string"),
        F.pmod(F.floor(col / 256), F.lit(256)).cast("long").cast("string"),
        F.pmod(col, F.lit(256)).cast("long").cast("string"),
    )


def ip_cidr_contains(cidr: str, col: Column) -> Column:
    """VRL ip_cidr_contains for IPv4 CIDRs: mask-and-compare on uint32."""
    net, bits = cidr.split("/")
    bits = int(bits)
    octets = [int(x) for x in net.split(".")]
    net_int = (octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3]
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1) if bits else 0
    return (ip_aton(col).bitwiseAND(F.lit(mask))) == F.lit(net_int & mask)


def ip_subnet(col: Column, bits: int) -> Column:
    """VRL ip_subnet: zero the host bits, return dotted network address."""
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1) if bits else 0
    return ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask)))


# --- hashes ----------------------------------------------------------------

def community_id_v1(
    src_ip: Column, dst_ip: Column, src_port: Column, dst_port: Column, proto: int = 6
) -> Column:
    """Simplified community-id style flow hash: order-normalized 5-tuple ->
    sha1 base64 (deterministic, engine-portable)."""
    a = F.concat_ws(":", src_ip, src_port.cast("string"))
    b = F.concat_ws(":", dst_ip, dst_port.cast("string"))
    lo, hi = F.least(a, b), F.greatest(a, b)
    return F.base64(F.sha1(F.concat_ws("|", F.lit(str(proto)), lo, hi).cast("binary")).cast("binary"))


def chunks(col: Column, chunk_size: int) -> Column:
    """VRL chunks: split a string into an array of <=chunk_size pieces."""
    return F.regexp_extract_all(col, F.lit(f"(.{{1,{chunk_size}}})"), 1)
