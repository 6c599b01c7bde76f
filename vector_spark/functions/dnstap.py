"""VRL parse_dnstap / parse_proto — framed-protobuf DNS telemetry.

Reference: website/cue/reference/remap/functions/parse_dnstap.cue (output
shape + the public base64 example used as our test fixture) and
parse_proto.cue. The reference decodes with prost against the public
dnstap.proto schema (github.com/dnstap/dnstap.pb); no protobuf jar or
wheel exists in this sandbox, so parse_dnstap carries its own ~60-line
protobuf WIRE-FORMAT walker (varint / 64-bit / length-delimited / 32-bit
field groups are the whole format) specialized to the dnstap schema — an
Arrow-batched pandas UDF in the codec family (the documented slow-path
exemption: byte-walking formats).

Subset vs VRL, disclosed: the deeply nested requestData/responseData
objects are flattened to the DNS header + first question (the fields an
observability pipeline routes on); OPT/EDNS records and answer sections
are not decoded. parse_proto rides Spark's native from_protobuf
(functions/parse.py::parse_protobuf) — the descriptor-file API is the
same surface VRL exposes, skip-if-no-jar.
"""

from __future__ import annotations

import base64

from pyspark.sql import Column
from pyspark.sql import functions as F

# dnstap.proto enum tables (public schema)
MESSAGE_TYPES = {
    1: "AuthQuery", 2: "AuthResponse", 3: "ResolverQuery",
    4: "ResolverResponse", 5: "ClientQuery", 6: "ClientResponse",
    7: "ForwarderQuery", 8: "ForwarderResponse", 9: "StubQuery",
    10: "StubResponse", 11: "ToolQuery", 12: "ToolResponse",
    13: "UpdateQuery", 14: "UpdateResponse",
}
SOCKET_FAMILIES = {1: "INET", 2: "INET6"}
SOCKET_PROTOCOLS = {1: "UDP", 2: "TCP", 3: "DOT", 4: "DOH", 5: "DNSCryptUDP",
                    6: "DNSCryptTCP"}
QTYPE_NAMES = {1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
               16: "TXT", 28: "AAAA", 33: "SRV", 255: "ANY"}

DNSTAP_SCHEMA = (
    "dataType string, messageType string, messageTypeId int, "
    "serverId string, serverVersion string, socketFamily string, "
    "socketProtocol string, sourceAddress string, sourcePort int, "
    "responseAddress string, responsePort int, time long, "
    "timePrecision string, queryZone string, "
    "header_id int, header_qr int, header_opcode int, header_rcode int, "
    "qd_count int, an_count int, ns_count int, ar_count int, "
    "question_name string, question_type string, question_type_id int, "
    "question_class string"
)


def _walk_proto(b: bytes):
    """Yield (field_number, wire_type, value) for one protobuf message.
    Values: int for varint/fixed, bytes for length-delimited."""
    i, n = 0, len(b)
    while i < n:
        tag, i = _varint(b, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(b, i)
        elif wt == 1:
            v, i = int.from_bytes(b[i : i + 8], "little"), i + 8
        elif wt == 2:
            ln, i = _varint(b, i)
            v, i = b[i : i + ln], i + ln
        elif wt == 5:
            v, i = int.from_bytes(b[i : i + 4], "little"), i + 4
        else:
            return  # groups (3/4) unused by dnstap
        yield fno, wt, v


def _varint(b: bytes, i: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        x = b[i]
        out |= (x & 0x7F) << shift
        i += 1
        if not x & 0x80:
            return out, i
        shift += 7


def _addr(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    if len(raw) == 4:
        return ".".join(str(x) for x in raw)
    if len(raw) == 16:
        import ipaddress

        return str(ipaddress.IPv6Address(raw))
    return raw.hex()


def _dns_name(b: bytes, i: int, lower: bool) -> tuple[str, int]:
    """Walk DNS labels from offset i; returns (name., next offset).
    No compression-pointer support (questions never need it)."""
    labels = []
    while i < len(b):
        ln = b[i]
        i += 1
        if ln == 0:
            break
        labels.append(b[i : i + ln].decode("ascii", errors="replace"))
        i += ln
    name = ".".join(labels) + "."
    return (name.lower() if lower else name), i


def _parse_dns_header(msg: bytes, lower: bool) -> dict:
    if len(msg) < 12:
        return {}
    hid = int.from_bytes(msg[0:2], "big")
    flags = int.from_bytes(msg[2:4], "big")
    out = {
        "header_id": hid,
        "header_qr": (flags >> 15) & 1,
        "header_opcode": (flags >> 11) & 0xF,
        "header_rcode": flags & 0xF,
        "qd_count": int.from_bytes(msg[4:6], "big"),
        "an_count": int.from_bytes(msg[6:8], "big"),
        "ns_count": int.from_bytes(msg[8:10], "big"),
        "ar_count": int.from_bytes(msg[10:12], "big"),
    }
    if out["qd_count"]:
        name, i = _dns_name(msg, 12, lower)
        if i + 4 <= len(msg):
            qtype = int.from_bytes(msg[i : i + 2], "big")
            qclass = int.from_bytes(msg[i + 2 : i + 4], "big")
            out.update(
                question_name=name,
                question_type=QTYPE_NAMES.get(qtype, str(qtype)),
                question_type_id=qtype,
                question_class="IN" if qclass == 1 else str(qclass),
            )
    return out


def parse_dnstap_py(b64: str | None, lowercase_hostnames: bool = False) -> dict | None:
    """Decode one base64 dnstap frame to the flattened field dict."""
    if b64 is None:
        return None
    try:
        raw = base64.b64decode(b64)
    except Exception:
        return None
    out: dict = {}
    msg = None
    for fno, _, v in _walk_proto(raw):
        if fno == 1:
            out["serverId"] = v.decode("utf-8", errors="replace")
        elif fno == 2:
            out["serverVersion"] = v.decode("utf-8", errors="replace")
        elif fno == 14:
            msg = v
        elif fno == 15:
            out["dataType"] = "Message" if v == 1 else str(v)
    if msg is None:
        return out or None
    qt_sec = qt_nsec = rt_sec = rt_nsec = None
    query_msg = None
    mtype = None
    for fno, _, v in _walk_proto(msg):
        if fno == 1:
            mtype = v
        elif fno == 2:
            out["socketFamily"] = SOCKET_FAMILIES.get(v, str(v))
        elif fno == 3:
            out["socketProtocol"] = SOCKET_PROTOCOLS.get(v, str(v))
        elif fno == 4:
            out["sourceAddress"] = _addr(v)
        elif fno == 5:
            out["responseAddress"] = _addr(v)
        elif fno == 6:
            out["sourcePort"] = v
        elif fno == 7:
            out["responsePort"] = v
        elif fno == 8:
            qt_sec = v
        elif fno == 9:
            qt_nsec = v
        elif fno == 10:
            query_msg = v
        elif fno == 11:
            name, _ = _dns_name(v, 0, lowercase_hostnames)
            out["queryZone"] = name
        elif fno == 12:
            rt_sec = v
        elif fno == 13:
            rt_nsec = v
        elif fno == 14 and query_msg is None:
            query_msg = v  # response_message when no query side
    if mtype is not None:
        out["messageTypeId"] = mtype
        out["messageType"] = MESSAGE_TYPES.get(mtype, str(mtype))
    # queries stamp query_time, responses response_time (mtype even = response)
    sec, nsec = (rt_sec, rt_nsec) if (mtype or 1) % 2 == 0 else (qt_sec, qt_nsec)
    if sec is None:
        sec, nsec = qt_sec if qt_sec is not None else rt_sec, qt_nsec or rt_nsec
    if sec is not None:
        out["time"] = sec * 1_000_000_000 + (nsec or 0)
        out["timePrecision"] = "ns"
    if query_msg:
        out.update(_parse_dns_header(query_msg, lowercase_hostnames))
    return out


def parse_dnstap(col: Column, lowercase_hostnames: bool = False) -> Column:
    """Column API: base64 dnstap string -> flattened struct
    (DNSTAP_SCHEMA). Arrow-batched; one struct per row, null on
    undecodable input (VRL's fallible parse)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    fields = [f.split(" ")[0] for f in DNSTAP_SCHEMA.split(", ")]

    def decode(data):
        rows = []
        for s in data:
            d = parse_dnstap_py(s, lowercase_hostnames) or {}
            rows.append([d.get(f) for f in fields])
        return pd.DataFrame(rows, columns=fields)

    return pandas_udf(decode, DNSTAP_SCHEMA)(col)
