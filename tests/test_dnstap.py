"""parse_dnstap against the PUBLIC fixture from the reference's own docs
(website/cue/reference/remap/functions/parse_dnstap.cue example) — every
asserted value below is the documented expected output of VRL's
parse_dnstap for this exact base64 payload."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from vector_spark.functions import parse_dnstap
from vector_spark.functions.dnstap import parse_dnstap_py

DOC_FIXTURE = (
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEiEAAAAAAA"
    "AAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3WNlI2kwIAAAAB"
    "AAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACOxjCAG9zVgzWgUDY29t"
    "AGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFtcGxlA2NvbQAABgABAAApBNABAUAAADkA"
    "DwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhlIERTIGZvdW5kIGZvciBkbnNzZWMtZmFpbGVkLm9y"
    "Zy54AQ=="
)


def test_doc_fixture_python():
    d = parse_dnstap_py(DOC_FIXTURE)
    assert d["serverId"] == "james-Virtual-Machine"
    assert d["serverVersion"] == "BIND 9.16.3"
    assert d["dataType"] == "Message"
    assert (d["messageType"], d["messageTypeId"]) == ("ResolverQuery", 3)
    assert (d["socketFamily"], d["socketProtocol"]) == ("INET6", "UDP")
    assert (d["sourceAddress"], d["sourcePort"]) == ("::", 46835)
    assert (d["responseAddress"], d["responsePort"]) == ("2001:502:7094::30", 53)
    assert d["queryZone"] == "com."
    assert (d["time"], d["timePrecision"]) == (1593489007920014129, "ns")
    assert d["header_id"] == 37634
    assert (d["header_qr"], d["header_opcode"], d["header_rcode"]) == (0, 0, 0)
    assert (d["qd_count"], d["an_count"], d["ns_count"], d["ar_count"]) == (1, 0, 0, 1)
    assert d["question_name"] == "facebook1.com."
    assert (d["question_type"], d["question_type_id"]) == ("A", 1)
    assert d["question_class"] == "IN"


def test_doc_fixture_spark_column(spark):
    df = spark.createDataFrame([(1, DOC_FIXTURE), (2, "!!notbase64!!"), (3, None)],
                               "id long, frame string")
    out = df.select("id", parse_dnstap(F.col("frame")).alias("d")).orderBy("id")
    rows = out.collect()
    d = rows[0].d
    assert d.serverId == "james-Virtual-Machine"
    assert d.messageType == "ResolverQuery"
    assert d.question_name == "facebook1.com."
    assert d.time == 1593489007920014129
    # fallible parse: nulls, never exceptions
    assert rows[1].d.serverId is None
    assert rows[2].d.serverId is None


def test_lowercase_hostnames():
    # synthesize a frame with an uppercase qname
    def u(v, n):
        return int(v).to_bytes(n, "big")

    qname = b"\x07EXAMPLE\x03CoM\x00"
    dns = u(513, 2) + u(0, 2) + u(1, 2) + u(0, 2) + u(0, 2) + u(0, 2) + qname + u(1, 2) + u(1, 2)

    def pb_field(fno, wt, payload):
        tag = bytes([(fno << 3) | wt])
        if wt == 2:
            return tag + bytes([len(payload)]) + payload
        return tag + payload

    msg = pb_field(1, 0, b"\x05") + pb_field(10, 2, dns)  # ClientQuery + query_message
    frame = pb_field(15, 0, b"\x01") + pb_field(14, 2, msg)
    b64 = base64.b64encode(frame).decode()
    d = parse_dnstap_py(b64, lowercase_hostnames=True)
    assert d["question_name"] == "example.com."
    assert d["messageType"] == "ClientQuery"
    d2 = parse_dnstap_py(b64)
    assert d2["question_name"] == "EXAMPLE.CoM."
