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


# --- ipv6 ------------------------------------------------------------------

def ipv6_expand(col: Column) -> Column:
    """Normalize a (hex-group) IPv6 address to its full 8-group,
    zero-padded, lowercase form — the canonical form VRL's ip family
    compares in. Pure array exprs: split on '::', pad the gap with zero
    groups, lpad every group to 4 digits. Addresses with an embedded dotted
    IPv4 tail are not expanded here (see ipv6_to_ipv4)."""
    low = F.lower(F.trim(col))
    has_gap = low.contains("::")
    left = F.filter(F.split(F.substring_index(low, "::", 1), ":"), lambda x: x != "")
    right = F.filter(F.split(F.substring_index(low, "::", -1), ":"), lambda x: x != "")
    plain = F.filter(F.split(low, ":"), lambda x: x != "")
    gap = F.lit(8) - F.size(left) - F.size(right)
    groups = F.when(
        has_gap, F.concat(left, F.array_repeat(F.lit("0"), gap), right)
    ).otherwise(plain)
    padded = F.transform(groups, lambda g: F.lpad(g, 4, "0"))
    return F.when(
        (F.size(groups) == 8) & ~low.contains("."), F.array_join(padded, ":")
    )


def ip_to_ipv6(col: Column) -> Column:
    """VRL ip_to_ipv6: dotted IPv4 -> its IPv4-mapped IPv6 form
    ('::ffff:a.b.c.d'); an address that is already IPv6 passes through."""
    is_v4 = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return F.when(is_v4, F.concat(F.lit("::ffff:"), col)).otherwise(col)


def ipv6_to_ipv4(col: Column) -> Column:
    """VRL ipv6_to_ipv4: an IPv4-mapped IPv6 address back to dotted IPv4.
    Handles the dotted-tail form (any zero-compression: '::ffff:1.2.3.4',
    '0:0:0:0:0:ffff:1.2.3.4') and the hex-tail form
    ('::ffff:0102:0304'); plain IPv4 passes through; anything else ->
    null (VRL errors there)."""
    low = F.lower(F.trim(col))
    is_v4 = low.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    dotted = F.regexp_extract(
        low, r"^(?:0{1,4}(?::0{1,4}){0,4}:|:):?ffff:((?:\d{1,3}\.){3}\d{1,3})$", 1
    )
    expanded = ipv6_expand(low)
    hex_mapped = expanded.isNotNull() & expanded.startswith("0000:0000:0000:0000:0000:ffff:")
    hi = F.conv(F.substring(expanded, 31, 4), 16, 10).cast("long")
    lo = F.conv(F.substring(expanded, 36, 4), 16, 10).cast("long")
    from_hex = F.concat_ws(
        ".",
        F.floor(hi / 256).cast("long").cast("string"),
        F.pmod(hi, F.lit(256)).cast("string"),
        F.floor(lo / 256).cast("long").cast("string"),
        F.pmod(lo, F.lit(256)).cast("string"),
    )
    return (
        F.when(is_v4, low)
        .when(dotted != "", dotted)
        .when(hex_mapped, from_hex)
    )


def hmac_hex(col: Column, key: bytes | str, algorithm: str = "sha256") -> Column:
    """VRL hmac (website/cue/reference/remap/functions/hmac.cue): keyed-hash
    MAC of the column, hex output. No JVM builtin exposes HMAC, so this is
    an Arrow-batched pandas UDF over stdlib hmac/hashlib (the compress.py
    pattern) — batch-at-a-time, never per-row Python. algorithm:
    md5/sha1/sha256/sha512."""
    import hashlib
    import hmac as _hmac

    from pyspark.sql.functions import pandas_udf

    kb = key.encode() if isinstance(key, str) else key
    digestmod = getattr(hashlib, algorithm)

    def mac(data):
        return data.map(
            lambda v: None
            if v is None
            else _hmac.new(kb, v if isinstance(v, bytes) else str(v).encode(), digestmod).hexdigest()
        )

    return pandas_udf(mac, "string")(col)


def encode_punycode(col: Column) -> Column:
    """VRL encode_punycode: IDNA-encode a domain — each non-ASCII label
    becomes 'xn--' + its punycode form, labels lowercased (the VRL
    default). stdlib 'punycode' codec via an Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    def enc_domain(d: str | None):
        if d is None:
            return None
        out = []
        for label in d.lower().split("."):
            if label.isascii():
                out.append(label)
            else:
                out.append("xn--" + label.encode("punycode").decode("ascii"))
        return ".".join(out)

    def enc(data):
        return data.map(enc_domain)

    return pandas_udf(enc, "string")(col)


def decode_punycode(col: Column) -> Column:
    """VRL decode_punycode: reverse of encode_punycode; malformed labels
    yield null (VRL errors there)."""
    from pyspark.sql.functions import pandas_udf

    def dec_domain(d: str | None):
        if d is None:
            return None
        out = []
        for label in d.lower().split("."):
            if label.startswith("xn--"):
                try:
                    out.append(label[4:].encode("ascii").decode("punycode"))
                except (UnicodeError, UnicodeDecodeError):
                    return None
            else:
                out.append(label)
        return ".".join(out)

    def dec(data):
        return data.map(dec_domain)

    return pandas_udf(dec, "string")(col)


def encode_charset(col: Column, charset: str) -> Column:
    """VRL-adjacent charset encode: string -> bytes in the given charset
    (stdlib codecs; unmappable chars -> null, matching VRL's error)."""
    from pyspark.sql.functions import pandas_udf

    def enc(data):
        def one(v):
            if v is None:
                return None
            try:
                return str(v).encode(charset)
            except (UnicodeError, LookupError):
                return None
        return data.map(one)

    return pandas_udf(enc, "binary")(col)


def decode_charset(col: Column, charset: str) -> Column:
    """Bytes in the given charset -> string (invalid sequences -> null)."""
    from pyspark.sql.functions import pandas_udf

    def dec(data):
        def one(v):
            if v is None:
                return None
            try:
                return bytes(v).decode(charset)
            except (UnicodeError, LookupError):
                return None
        return data.map(one)

    return pandas_udf(dec, "string")(col)


def uuid_v4() -> Column:
    """VRL uuid_v4: random v4 UUID per row (non-deterministic — excluded
    from oracle queries; use uuid_v7_deterministic for replayable ids)."""
    return F.uuid()


def uuid_v7_deterministic(ts: Column, entropy: Column) -> Column:
    """VRL uuid_v7 analogue with REPLAYABLE random bits: RFC 9562 v7 layout
    (48-bit unix-ms timestamp, version 7, variant 10) with the random
    sections drawn from md5(entropy) instead of a RNG — time-ordered like
    real v7, deterministic for checkpoint replay / oracle comparison, and
    still unique per distinct (ts, entropy). Pure hex string exprs."""
    ms_hex = F.lpad(F.lower(F.hex(F.unix_millis(ts.cast("timestamp")))), 12, "0")
    h = F.md5(entropy.cast("string"))
    nib = F.substring(h, 4, 1)
    variant_digit = F.element_at(
        F.split(F.lit("8,9,a,b"), ","),
        (F.pmod(F.instr(F.lit("0123456789abcdef"), nib) - 1, F.lit(4)) + 1).cast("int"),
    )
    return F.concat(
        F.substring(ms_hex, 1, 8), F.lit("-"),
        F.substring(ms_hex, 9, 4), F.lit("-7"),
        F.substring(h, 1, 3), F.lit("-"),
        variant_digit, F.substring(h, 5, 3), F.lit("-"),
        F.substring(h, 8, 12),
    )


def crc(col: Column) -> Column:
    """VRL crc (CRC-32/ISO-HDLC): native F.crc32 over the value's bytes."""
    return F.crc32(col.cast("binary"))


def encode_mime_q(col: Column, charset: str = "utf-8") -> Column:
    """VRL encode_mime_q: RFC 2047 Q-encoded word ('=?utf-8?q?...?=') —
    stdlib email.quoprimime via an Arrow-batched pandas UDF."""
    import email.quoprimime as _q

    from pyspark.sql.functions import pandas_udf

    def enc(data):
        return data.map(
            lambda v: None if v is None else _q.header_encode(str(v).encode(charset), charset)
        )

    return pandas_udf(enc, "string")(col)


def decode_mime_q(col: Column) -> Column:
    """VRL decode_mime_q: decode RFC 2047 encoded-words (q and b forms);
    plain text passes through; malformed -> null."""
    import email.header as _h

    from pyspark.sql.functions import pandas_udf

    def dec_one(v):
        if v is None:
            return None
        try:
            parts = []
            for payload, cs in _h.decode_header(str(v)):
                if isinstance(payload, bytes):
                    parts.append(payload.decode(cs or "ascii"))
                else:
                    parts.append(payload)
            return "".join(parts)
        except Exception:
            return None

    def dec(data):
        return data.map(dec_one)

    return pandas_udf(dec, "string")(col)


_AES_MODES = ("ECB", "CBC", "GCM")


def _aes_mode(algorithm: str) -> str:
    """'AES-128-CBC' / 'AES-256-GCM' (VRL naming) -> Spark mode."""
    mode = algorithm.upper().rsplit("-", 1)[-1]
    if mode not in _AES_MODES:
        raise ValueError(f"unsupported AES mode {algorithm!r}; one of {_AES_MODES}")
    return mode


def encrypt(col: Column, key: bytes | str, algorithm: str = "AES-128-CBC",
            iv: bytes | None = None) -> Column:
    """VRL encrypt (website/cue/reference/remap/functions/encrypt.cue) on
    the AES family via Spark's NATIVE aes_encrypt (JVM, codegen — no
    Python): key length picks AES-128/192/256; modes ECB/CBC/GCM. Pass a
    fixed `iv` (16 bytes CBC, 12 GCM) for deterministic/replayable output;
    without it Spark draws a random IV per row (GCM/CBC)."""
    kb = key.encode() if isinstance(key, str) else key
    mode = _aes_mode(algorithm)
    args = [col.cast("binary"), F.lit(kb), F.lit(mode), F.lit("DEFAULT")]
    if iv is not None:
        args.append(F.lit(iv))
    return F.aes_encrypt(*args)


def decrypt(col: Column, key: bytes | str, algorithm: str = "AES-128-CBC") -> Column:
    """VRL decrypt: inverse of encrypt (IV is carried in the ciphertext
    prefix for CBC/GCM, so none is needed here). try-variant semantics:
    use F.try_aes_decrypt via `lenient=True` at call sites needing
    null-on-garbage instead of an error."""
    kb = key.encode() if isinstance(key, str) else key
    return F.aes_decrypt(col, F.lit(kb), F.lit(_aes_mode(algorithm)))


def sha3(col: Column, variant: str = "sha3-256") -> Column:
    """VRL sha3 (SHA3-224/256/384/512): no JVM builtin, so stdlib hashlib
    in an Arrow-batched pandas UDF; hex output."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    name = variant.replace("-", "_").lower()
    if name not in ("sha3_224", "sha3_256", "sha3_384", "sha3_512"):
        raise ValueError(f"unknown sha3 variant {variant!r}")
    fn = getattr(hashlib, name)

    def mac(data):
        return data.map(
            lambda v: None
            if v is None
            else fn(v if isinstance(v, bytes) else str(v).encode()).hexdigest()
        )

    return pandas_udf(mac, "string")(col)


# --- syslog level/severity/facility names (VRL to_syslog_* family,
# website/cue/reference/remap/functions/to_syslog_{level,severity,facility}.cue;
# RFC 5424 tables) ----------------------------------------------------------

SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_level(col: Column) -> Column:
    """VRL to_syslog_level: severity code 0-7 -> keyword; null outside."""
    return F.when(
        col.between(0, 7),
        F.element_at(F.array(*[F.lit(x) for x in SYSLOG_LEVELS]), col.cast("int") + 1),
    )


def to_syslog_severity(col: Column) -> Column:
    """VRL to_syslog_severity: keyword -> code (inverse of to_syslog_level)."""
    out = F.lit(None).cast("int")
    expr = None
    for i, name in enumerate(SYSLOG_LEVELS):
        c = F.when(col == name, F.lit(i))
        expr = c if expr is None else expr.when(col == name, F.lit(i))
    return expr.otherwise(out)


def to_syslog_facility(col: Column) -> Column:
    """VRL to_syslog_facility: facility code 0-23 -> keyword; null outside."""
    return F.when(
        col.between(0, 23),
        F.element_at(
            F.array(*[F.lit(x) for x in SYSLOG_FACILITIES]), col.cast("int") + 1
        ),
    )


def parse_int_vrl(col: Column, base: int | None = None) -> Column:
    """VRL parse_int: string -> integer honoring 0x/0o/0b prefixes when no
    explicit base is given (parse_int.cue). Pure conv exprs."""
    if base is not None:
        return F.conv(col, base, 10).cast("long")
    body = F.substring(col, 3, 64)
    return (
        F.when(col.startswith("0x"), F.conv(body, 16, 10))
        .when(col.startswith("0b"), F.conv(body, 2, 10))
        .when(col.startswith("0o"), F.conv(body, 8, 10))
        .otherwise(F.conv(col, 10, 10))
        .cast("long")
    )


def format_int_vrl(col: Column, base: int = 10) -> Column:
    """VRL format_int: integer -> string in the given base (lowercase)."""
    return F.lower(F.conv(col.cast("string"), 10, base))


# --- deterministic random_* (VRL random_bool/random_int/random_float) ------
# The reference's random_* are RNG-backed and therefore non-replayable; the
# Spark-first variants derive the randomness from md5(seed) so checkpoint
# replay and the DuckDB oracle see identical values — pass a per-row unique
# seed column (e.g. event_id) for i.i.d.-like behavior.

def _rand_bits(seed: Column, tag: str) -> Column:
    h8 = F.substring(F.md5(F.concat(F.lit(tag + "|"), seed.cast("string"))), 1, 8)
    return F.conv(h8, 16, 10).cast("long")


def random_float_seeded(seed: Column, lo: float = 0.0, hi: float = 1.0,
                        tag: str = "rf") -> Column:
    unit = _rand_bits(seed, tag).cast("double") / F.lit(4294967296.0)
    return F.lit(lo) + unit * F.lit(hi - lo)


def random_int_seeded(seed: Column, lo: int, hi: int, tag: str = "ri") -> Column:
    """Uniform integer in [lo, hi) — VRL random_int's half-open range."""
    return (F.lit(lo) + F.pmod(_rand_bits(seed, tag), F.lit(hi - lo))).cast("long")


def random_bool_seeded(seed: Column, tag: str = "rb") -> Column:
    return F.pmod(_rand_bits(seed, tag), F.lit(2)) == 0


# --- friendly ids (VRL uuid_from_friendly_id / encode side) ----------------

_BASE62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def friendly_id_from_uuid(col: Column) -> Column:
    """UUID string -> base62 friendly id (the inverse surface of VRL
    uuid_from_friendly_id, uuid_from_friendly_id.cue). 128-bit base
    conversion exceeds DECIMAL(38) by one bit, so this is an Arrow-batched
    pandas UDF (crypto-family exemption); deterministic."""
    from pyspark.sql.functions import pandas_udf

    def enc(data):
        def one(u):
            if u is None:
                return None
            try:
                n = int(u.replace("-", ""), 16)
            except ValueError:
                return None
            if n == 0:
                return _BASE62[0]
            out = []
            while n:
                n, r = divmod(n, 62)
                out.append(_BASE62[r])
            return "".join(reversed(out))

        return data.map(one)

    return pandas_udf(enc, "string")(col)


def uuid_from_friendly_id(col: Column) -> Column:
    """VRL uuid_from_friendly_id: base62 friendly id -> canonical
    8-4-4-4-12 UUID string; null on non-base62 input (fallible parse)."""
    from pyspark.sql.functions import pandas_udf

    def dec(data):
        def one(s):
            if s is None:
                return None
            n = 0
            for ch in s:
                i = _BASE62.find(ch)
                if i < 0:
                    return None
                n = n * 62 + i
            if n >= 1 << 128:
                return None
            h = f"{n:032x}"
            return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"

        return data.map(one)

    return pandas_udf(dec, "string")(col)


def get_env_var(name: str, default: str | None = None) -> Column:
    """VRL get_env_var: driver-resolved at plan time into a literal column
    (the reference resolves at VRL runtime on one host; on a cluster the
    DRIVER's environment is the deterministic choice — executors may
    differ)."""
    import os

    return F.lit(os.environ.get(name, default))


def get_hostname() -> Column:
    """VRL get_hostname: the driver's hostname as a literal (same
    driver-resolution rationale as get_env_var)."""
    import socket

    return F.lit(socket.gethostname())


# --- seahash (VRL seahash, website/cue/reference/remap/functions/seahash.cue)

_SEA_P = 0x6EED0E9DA4D94A4F
_SEA_M = (1 << 64) - 1


def _sea_diffuse(x: int) -> int:
    x = (x * _SEA_P) & _SEA_M
    x ^= (x >> 32) >> (x >> 60)
    return (x * _SEA_P) & _SEA_M


def seahash_py(data: bytes) -> int:
    """SeaHash (public spec, ticki's seahash crate reference module):
    4-lane state, per-u64 diffuse + lane rotation (equivalent to the
    crate's parallel 4-lane form), zero-padded LE tail, finalize =
    diffuse(a^b^c^d^len). Returned as the unsigned u64."""
    s = [0x16F11FE89B0D677C, 0xB480A793D8E6C86C,
         0x6FE2E5AAF078EBC9, 0x14F994A4C5259381]
    n = len(data)
    for i in range(0, n, 8):
        x = int.from_bytes(data[i : i + 8].ljust(8, b"\0"), "little")
        s = [s[1], s[2], s[3], _sea_diffuse(s[0] ^ x)]
    return _sea_diffuse(s[0] ^ s[1] ^ s[2] ^ s[3] ^ n)


def seahash(col: Column) -> Column:
    """VRL seahash: u64 SeaHash of the string's bytes, wrapped to signed
    i64 exactly like the reference ("results higher than the signed
    maximum wrap around to negative", seahash.cue) — pinned to the
    reference docs' own vectors in tests. Arrow-batched (64-bit wrapping
    multiplies have no JVM-expression form)."""
    from pyspark.sql.functions import pandas_udf

    def fn(data):
        def one(v):
            if v is None:
                return None
            h = seahash_py(str(v).encode("utf-8"))
            return h - (1 << 64) if h >= (1 << 63) else h

        return data.map(one)

    return pandas_udf(fn, "long")(col)


# --- ip_pton / ip_ntop (binary <-> text IPs) -------------------------------

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def is_ipv4(col: Column) -> Column:
    """VRL is_ipv4: dotted-quad shape with in-range octets."""
    o = F.split(col, r"\.")
    in_range = F.forall(o, lambda x: x.cast("int").between(0, 255))
    return col.rlike(_IPV4_RE) & in_range


def is_ipv6(col: Column) -> Column:
    """VRL is_ipv6: parses under ipv6_expand (8 hex groups after gap
    fill), or is an IPv4-mapped dotted-tail form."""
    return ipv6_expand(col).isNotNull() | (
        F.lower(col).rlike(r"^(::ffff:|::|([0-9a-f]{1,4}:){1,6}:?)\d{1,3}(\.\d{1,3}){3}$")
    )


def ip_pton(col: Column) -> Column:
    """VRL ip_pton: text IP -> network-order bytes (4 for v4, 16 for v6).
    Pure exprs: v4 via the aton math, v6 via ipv6_expand + unhex."""
    v4 = F.unhex(F.lpad(F.hex(ip_aton(col)), 8, "0"))
    v6 = F.unhex(F.replace(ipv6_expand(col), F.lit(":"), F.lit("")))
    return F.when(col.rlike(_IPV4_RE), v4).otherwise(v6)


def ip_ntop(col: Column) -> Column:
    """VRL ip_ntop: 4/16-byte binary -> text. v6 renders the canonical
    FULL 8-group form (not zero-compressed — compare after ipv6_expand;
    disclosed subset of Rust's compressed Display)."""
    hx = F.lower(F.hex(col))
    v4 = ip_ntoa(F.conv(hx, 16, 10).cast("long"))
    groups = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.substring(hx, i * 4 + 1, 4),
    )
    v6 = F.array_join(groups, ":")
    return F.when(F.length(col) == 4, v4).when(F.length(col) == 16, v6)


# --- secrets (VRL get_secret/set_secret/remove_secret) ---------------------
# The reference stores secrets in event metadata (vector-core event
# metadata map); the columnar equivalent is a map<string,string> column.

def get_secret(secrets: Column, name: str) -> Column:
    return F.element_at(secrets, F.lit(name))


def set_secret(secrets: Column, name: str, value: Column) -> Column:
    return F.map_concat(
        F.map_filter(secrets, lambda k, _: k != name),
        F.create_map(F.lit(name), value),
    )


def remove_secret(secrets: Column, name: str) -> Column:
    return F.map_filter(secrets, lambda k, _: k != name)


def get_timezone_name(spark) -> Column:
    """VRL get_timezone_name: the session's timezone as a literal (this
    engine pins UTC in get_spark for determinism)."""
    return F.lit(spark.conf.get("spark.sql.session.timeZone"))


def random_bytes_seeded(seed: Column, n: int, tag: str = "rby") -> Column:
    """VRL random_bytes, deterministic-seeded like the other random_*:
    an md5 chain over (tag, seed, block index) concatenated and cut to n
    bytes. Replayable; uniform."""
    blocks = [
        F.md5(F.concat(F.lit(f"{tag}|{i}|"), seed.cast("string")))
        for i in range((n + 15) // 16)
    ]
    return F.unhex(F.substring(F.concat(*blocks), 1, 2 * n))


def unflatten(col: Column) -> Column:
    """VRL unflatten: a map with dotted keys ('a.b.c' -> v) into a nested
    object, returned as a JSON string (pair with from_json at a declared
    schema — Spark columns need static types where VRL's object is
    dynamic). Arrow-batched; later keys win on conflicts like VRL."""
    import json

    from pyspark.sql.functions import pandas_udf

    def fn(data):
        def one(m):
            if m is None:
                return None
            root: dict = {}
            for k, v in m.items():
                cur = root
                parts = k.split(".")
                for p in parts[:-1]:
                    nxt = cur.get(p)
                    if not isinstance(nxt, dict):
                        nxt = {}
                        cur[p] = nxt
                    cur = nxt
                cur[parts[-1]] = v
            return json.dumps(root, sort_keys=True)

        return data.map(one)

    return pandas_udf(fn, "string")(col)


def parse_float_vrl(col: Column) -> Column:
    """VRL parse_float: string -> double, scientific notation included;
    invalid input -> null (the caller's dropped-port reroute handles the
    error arm). try_cast keeps the null semantics under ANSI mode.
    (website/cue/reference/remap/functions/parse_float.cue)."""
    return col.try_cast("double")
