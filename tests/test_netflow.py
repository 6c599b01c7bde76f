"""NetFlow v9 / IPFIX template-based decoding + the static v7 layout.

Fixtures are hand-assembled packets (RFC 3954 / RFC 7011 wire format) so
every byte offset in the decoder is pinned independently of the encoder
used by the contract query. Reference scope:
lib/codecs/src/decoding/framing/netflow.rs:8-13 (v5/v7/v9/IPFIX).
"""

from __future__ import annotations

from vector_spark.functions import (
    extract_netflow_templates,
    netflow_template_map,
    parse_netflow,
    parse_netflow_v7,
)


def _u(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "big")


# template 256: src/dst v4 addr, src/dst port, pkts, bytes, proto -> 21 B
T256_FIELDS = [(8, 4), (12, 4), (7, 2), (11, 2), (2, 4), (1, 4), (4, 1)]


def _v9_header(count: int, unix_secs: int = 1_700_000_000, source_id: int = 1) -> bytes:
    return (
        _u(9, 2) + _u(count, 2) + _u(0, 4) + _u(unix_secs, 4) + _u(0, 4)
        + _u(source_id, 4)
    )


def _v9_template_packet(tid: int = 256, fields=T256_FIELDS, **hdr) -> bytes:
    body = _u(tid, 2) + _u(len(fields), 2)
    for fid, flen in fields:
        body += _u(fid, 2) + _u(flen, 2)
    fs = _u(0, 2) + _u(4 + len(body), 2) + body
    return _v9_header(1, **hdr) + fs


def _flow_record(src: str, dst: str, sport: int, dport: int, pkts: int,
                 byts: int, proto: int) -> bytes:
    return (
        bytes(int(x) for x in src.split("."))
        + bytes(int(x) for x in dst.split("."))
        + _u(sport, 2) + _u(dport, 2) + _u(pkts, 4) + _u(byts, 4) + _u(proto, 1)
    )


def _v9_data_packet(tid: int, records: list[bytes], **hdr) -> bytes:
    body = b"".join(records)
    pad = (-(4 + len(body))) % 4
    fs = _u(tid, 2) + _u(4 + len(body) + pad, 2) + body + b"\x00" * pad
    return _v9_header(len(records), **hdr) + fs


def _pkt_df(spark, packets: list[bytes]):
    return spark.createDataFrame([(p,) for p in packets], "packet binary")


def test_v9_template_then_data(spark):
    """Template in one packet, data (2 records + pad) in another — the
    cross-packet template-cache behavior the two-pass design exists for."""
    recs = [
        _flow_record("10.0.0.1", "192.168.1.1", 1234, 443, 7, 4321, 6),
        _flow_record("10.0.0.2", "192.168.1.2", 5353, 53, 1, 64, 17),
    ]
    df = _pkt_df(spark, [
        _v9_template_packet(),
        _v9_data_packet(256, recs, unix_secs=1_700_000_100),
    ])
    out = parse_netflow(df).orderBy("rec_idx").collect()
    assert len(out) == 2
    r0 = out[0]
    assert (r0.version, r0.source_id, r0.template_id, r0.rec_idx) == (9, 1, 256, 0)
    assert r0.export_time == 1_700_000_100
    assert dict(r0.fields) == {
        "ipv4_src_addr": "10.0.0.1", "ipv4_dst_addr": "192.168.1.1",
        "l4_src_port": "1234", "l4_dst_port": "443",
        "in_pkts": "7", "in_bytes": "4321", "protocol": "6",
    }
    assert dict(out[1].fields)["ipv4_src_addr"] == "10.0.0.2"
    assert dict(out[1].fields)["protocol"] == "17"


def test_v9_unknown_template_emits_null_fields(spark):
    """Data set without its template: one visible row with fields=NULL
    (the reference warns and skips, netflow.rs:398-410 — we never drop
    silently)."""
    rec = _flow_record("10.0.0.1", "192.168.1.1", 1, 2, 3, 4, 6)
    df = _pkt_df(spark, [_v9_data_packet(300, [rec])])
    out = parse_netflow(df).collect()
    assert len(out) == 1
    assert out[0].template_id == 300
    assert out[0].fields is None


def test_v9_template_refresh_latest_wins(spark):
    """Two definitions of template 256; the later export_time wins (the
    reference's mutable cache overwrite)."""
    short_fields = [(8, 4), (4, 1)]  # 5-byte records
    rec5 = bytes([10, 0, 0, 9]) + _u(6, 1)
    df = _pkt_df(spark, [
        _v9_template_packet(fields=T256_FIELDS, unix_secs=1_700_000_000),
        _v9_template_packet(fields=short_fields, unix_secs=1_700_000_500),
        _v9_data_packet(256, [rec5], unix_secs=1_700_000_600),
    ])
    tmpl = netflow_template_map(df)
    assert tmpl[(9, 1, 256)][1] == [4, 1]  # lens of the refreshed template
    out = parse_netflow(df, templates=tmpl).collect()
    assert len(out) == 1
    assert dict(out[0].fields) == {"ipv4_src_addr": "10.0.0.9", "protocol": "6"}


def test_ipfix_template_and_data_one_packet(spark):
    """IPFIX (v10): 16-byte header, template set id 2, data set 256;
    enterprise-bit field decodes under a synthesized name."""
    # template: ipv4_src_addr(8,4), enterprise (en=9999, id=77, len=2)
    tbody = _u(256, 2) + _u(2, 2)
    tbody += _u(8, 2) + _u(4, 2)
    tbody += _u(0x8000 | 77, 2) + _u(2, 2) + _u(9999, 4)
    tset = _u(2, 2) + _u(4 + len(tbody), 2) + tbody
    rec = bytes([10, 1, 2, 3]) + _u(513, 2)
    dset = _u(256, 2) + _u(4 + len(rec) + 2, 2) + rec + b"\x00\x00"
    total = 16 + len(tset) + len(dset)
    pkt = (
        _u(10, 2) + _u(total, 2) + _u(1_700_000_000, 4) + _u(0, 4) + _u(42, 4)
        + tset + dset
    )
    out = parse_netflow(_pkt_df(spark, [pkt])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.version, r.source_id, r.template_id) == (10, 42, 256)
    assert dict(r.fields) == {"ipv4_src_addr": "10.1.2.3", "field_9999_77": "513"}


def test_template_extraction_pass(spark):
    df = _pkt_df(spark, [_v9_template_packet()])
    t = extract_netflow_templates(df).collect()
    assert len(t) == 1
    assert list(t[0].field_ids) == [f for f, _ in T256_FIELDS]
    assert list(t[0].field_lens) == [l for _, l in T256_FIELDS]


def test_netflow_v7_static(spark):
    """v7 = 24-byte header + 52-byte records (v5 layout + router_sc)."""
    rec = (
        bytes([10, 0, 0, 1]) + bytes([192, 168, 1, 1]) + bytes([0, 0, 0, 0])
        + _u(0, 2) + _u(0, 2)                      # input/output snmp
        + _u(5, 4) + _u(320, 4)                    # packets, bytes
        + _u(0, 4) + _u(0, 4)                      # first, last
        + _u(2222, 2) + _u(80, 2)                  # ports
        + _u(0, 1) + _u(0, 1) + _u(6, 1) + _u(0, 1)  # flags pad, tcpflags?, proto, tos
        + _u(0, 2) + _u(0, 2)                      # src_as, dst_as
        + _u(0, 1) + _u(0, 1) + _u(0, 2)           # masks, flags
        + bytes([172, 16, 0, 1])                   # router_sc
    )
    assert len(rec) == 52
    hdr = (
        _u(7, 2) + _u(1, 2) + _u(0, 4) + _u(1_700_000_000, 4)
        + _u(0, 4) + _u(0, 4) + _u(0, 4)
    )
    df = _pkt_df(spark, [hdr + rec])
    out = parse_netflow_v7(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.srcaddr, r.dstaddr) == ("10.0.0.1", "192.168.1.1")
    assert (r.srcport, r.dstport, r.packets, r.bytes, r.proto) == (2222, 80, 5, 320, 6)
    assert r.router_sc == "172.16.0.1"


def test_ipfix_varlen_fields(spark):
    """RFC 7011 §7 variable-length fields: template length 0xFFFF, each
    record value prefixed by a 1-byte length (255 -> 2-byte). Printable
    values decode as text, binary as hex."""
    tbody = _u(256, 2) + _u(2, 2)
    tbody += _u(8, 2) + _u(4, 2)          # ipv4_src_addr fixed
    tbody += _u(82, 2) + _u(0xFFFF, 2)    # interface_name (82), varlen
    tset = _u(2, 2) + _u(4 + len(tbody), 2) + tbody
    rec1 = bytes([10, 1, 1, 1]) + bytes([4]) + b"eth0"
    rec2 = bytes([10, 1, 1, 2]) + bytes([2]) + b"\x00\xff"   # non-printable
    body = rec1 + rec2
    dset = _u(256, 2) + _u(4 + len(body), 2) + body
    total = 16 + len(tset) + len(dset)
    pkt = (_u(10, 2) + _u(total, 2) + _u(1_700_000_000, 4) + _u(0, 4)
           + _u(7, 4) + tset + dset)
    out = parse_netflow(_pkt_df(spark, [pkt])).orderBy("rec_idx").collect()
    assert len(out) == 2
    assert dict(out[0].fields) == {"ipv4_src_addr": "10.1.1.1", "field_82": "eth0"}
    assert dict(out[1].fields) == {"ipv4_src_addr": "10.1.1.2", "field_82": "00ff"}


def test_ipfix_varlen_long_form(spark):
    """The 255-prefix 3-byte length form for values >= 255 bytes."""
    tbody = _u(256, 2) + _u(1, 2) + _u(82, 2) + _u(0xFFFF, 2)
    tset = _u(2, 2) + _u(4 + len(tbody), 2) + tbody
    val = b"x" * 300
    rec = bytes([255]) + _u(300, 2) + val
    dset = _u(256, 2) + _u(4 + len(rec), 2) + rec
    total = 16 + len(tset) + len(dset)
    pkt = (_u(10, 2) + _u(total, 2) + _u(0, 4) + _u(0, 4) + _u(7, 4)
           + tset + dset)
    out = parse_netflow(_pkt_df(spark, [pkt])).collect()
    assert len(out) == 1
    assert dict(out[0].fields)["field_82"] == "x" * 300


def test_v9_options_template_scope_fields(spark):
    """v9 options template (set 1): scope fields decode under scope_<name>;
    the options data set decodes like any data set."""
    # scope: ipv4_src_addr-as-scope (4B); options: sampler_id(48, 2B)
    tbody = (_u(257, 2) + _u(4, 2) + _u(4, 2)      # tid, scope_len=4B, opt_len=4B
             + _u(8, 2) + _u(4, 2)                  # scope field spec
             + _u(48, 2) + _u(2, 2))                # option field spec
    tset = _u(1, 2) + _u(4 + len(tbody), 2) + tbody
    rec = bytes([10, 9, 9, 9]) + _u(7, 2)
    pad = b"\x00" * 2
    dset = _u(257, 2) + _u(4 + len(rec) + len(pad), 2) + rec + pad
    pkt = (_u(9, 2) + _u(2, 2) + _u(0, 4) + _u(1_700_000_000, 4) + _u(0, 4)
           + _u(1, 4) + tset + dset)
    out = parse_netflow(_pkt_df(spark, [pkt])).collect()
    assert len(out) == 1
    assert dict(out[0].fields) == {
        "scope_ipv4_src_addr": "10.9.9.9", "sampler_id": "7",
    }


def test_ipfix_options_template_scope_count(spark):
    """IPFIX options template (set 3): field_count + scope_field_count
    header form."""
    tbody = (_u(258, 2) + _u(2, 2) + _u(1, 2)      # tid, total=2, scope=1
             + _u(10, 2) + _u(2, 2)                 # scope: input_snmp(10)
             + _u(48, 2) + _u(2, 2))                # option: sampler_id
    tset = _u(3, 2) + _u(4 + len(tbody), 2) + tbody
    rec = _u(3, 2) + _u(9, 2)
    dset = _u(258, 2) + _u(4 + len(rec), 2) + rec
    total = 16 + len(tset) + len(dset)
    pkt = (_u(10, 2) + _u(total, 2) + _u(0, 4) + _u(0, 4) + _u(5, 4)
           + tset + dset)
    out = parse_netflow(_pkt_df(spark, [pkt])).collect()
    assert len(out) == 1
    assert dict(out[0].fields) == {"scope_input_snmp": "3", "sampler_id": "9"}
