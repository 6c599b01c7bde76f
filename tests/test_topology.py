"""Topology compiler — config validation (unknown inputs, cycles), build,
route ports, multi-input merge, sink execution. Mirrors the reference's
compile phase (src/config/compiler.rs:9-117, graph.rs:244) and the
`vector test` harness shape (SURVEY.md §3.3)."""

import pytest

from vector_spark.topology import TopologyError, compile_topology, load_yaml


def _events_rows():
    return [
        (1, "error", 10.0),
        (2, "signup", 200.0),
        (3, "click", 50.0),
    ]


EVENTS_SRC = {
    "type": "inline",
    "rows": _events_rows(),
    "schema": "event_id long, event_type string, value double",
}


def test_end_to_end_topology(spark, tmp_path):
    spec = {
        "sources": {"events": EVENTS_SRC},
        "transforms": {
            "tagged": {
                "type": "remap",
                "inputs": ["events"],
                "set": {"vbucket": "CAST(floor(value / 100) AS INT)"},
            },
            "routed": {
                "type": "route",
                "inputs": ["tagged"],
                "routes": {"errors": "event_type = 'error'", "big": "value > 100"},
            },
        },
        "sinks": {
            "err_sink": {"type": "memory", "inputs": ["routed.errors"]},
            "big_sink": {"type": "memory", "inputs": ["routed.big"]},
            "rest": {"type": "memory", "inputs": ["routed._unmatched"]},
        },
    }
    topo = compile_topology(spec).build(spark)
    out = topo.run()
    assert [r.event_id for r in out["err_sink"]] == [1]
    assert [r.event_id for r in out["big_sink"]] == [2]
    assert [r.event_id for r in out["rest"]] == [3]
    assert out["err_sink"][0]["vbucket"] == 0


def test_bare_multi_port_reference_rejected(spark):
    """Referencing a multi-port transform (route) by bare name is a config
    error — route exposes only named outputs (src/transforms/route.rs), so
    a silent single-port binding would drop every other port's rows."""
    spec = {
        "sources": {"events": EVENTS_SRC},
        "transforms": {
            "routed": {
                "type": "route",
                "inputs": ["events"],
                "routes": {"errors": "event_type = 'error'"},
            },
            "after": {"type": "filter", "inputs": ["routed"], "condition": "1=1"},
        },
    }
    with pytest.raises(TopologyError, match="multi-port"):
        compile_topology(spec).build(spark)
    # sinks hitting the bare name fail the same way
    spec2 = {
        "sources": {"events": EVENTS_SRC},
        "transforms": {
            "routed": {
                "type": "route",
                "inputs": ["events"],
                "routes": {"errors": "event_type = 'error'"},
            },
        },
        "sinks": {"s": {"type": "memory", "inputs": ["routed"]}},
    }
    with pytest.raises(TopologyError, match="multi-port"):
        compile_topology(spec2).build(spark).run()


def test_unknown_input_rejected():
    spec = {
        "sources": {"a": EVENTS_SRC},
        "transforms": {"t": {"type": "filter", "inputs": ["nope"], "condition": "1=1"}},
    }
    with pytest.raises(TopologyError, match="unknown input"):
        compile_topology(spec)


def test_cycle_rejected():
    spec = {
        "sources": {"a": EVENTS_SRC},
        "transforms": {
            "t1": {"type": "filter", "inputs": ["t2"], "condition": "1=1"},
            "t2": {"type": "filter", "inputs": ["t1"], "condition": "1=1"},
        },
    }
    with pytest.raises(TopologyError, match="cycle"):
        compile_topology(spec)


def test_multi_input_union(spark):
    spec = {
        "sources": {"a": EVENTS_SRC, "b": EVENTS_SRC},
        "transforms": {
            "both": {"type": "filter", "inputs": ["a", "b"], "condition": "value > 100"}
        },
        "sinks": {"out": {"type": "memory", "inputs": ["both"]}},
    }
    out = compile_topology(spec).build(spark).run()
    assert len(out["out"]) == 2  # event 2 from each source


def test_enrich_via_provided_table(spark):
    spec = {
        "sources": {"events": EVENTS_SRC},
        "transforms": {
            "enriched": {
                "type": "enrich", "inputs": ["events"],
                "table": "kinds", "keys": [["event_type", "event_type"]],
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["enriched"]}},
    }
    kinds = spark.createDataFrame(
        [("error", "bad"), ("signup", "good")], "event_type string, quality string"
    )
    out = compile_topology(spec).build(spark, tables={"kinds": kinds}).run()
    got = {r.event_id: r.quality for r in out["out"]}
    assert got == {1: "bad", 2: "good", 3: None}


def test_yaml_roundtrip(spark):
    text = """
sources:
  events:
    type: inline
    rows:
      - [1, error]
      - [2, click]
    schema: "event_id long, event_type string"
transforms:
  errs:
    type: filter
    inputs: [events]
    condition: "event_type = 'error'"
sinks:
  out:
    type: memory
    inputs: [errs]
"""
    spec = load_yaml(text)
    spec["sources"]["events"]["rows"] = [tuple(r) for r in spec["sources"]["events"]["rows"]]
    out = compile_topology(spec).build(spark).run()
    assert [r.event_id for r in out["out"]] == [1]


def test_parquet_sink_partitioned(spark, tmp_path):
    path = str(tmp_path / "out")
    spec = {
        "sources": {"events": EVENTS_SRC},
        "transforms": {
            "lab": {"type": "exclusive_route", "inputs": ["events"],
                    "routes": {"errors": "event_type = 'error'"}},
        },
        "sinks": {"out": {"type": "parquet", "inputs": ["lab"], "path": path,
                           "partition_by": ["route"]}},
    }
    compile_topology(spec).build(spark).run()
    back = spark.read.parquet(path)
    assert back.count() == 3
    assert sorted(r.route for r in back.select("route").distinct().collect()) == ["_unmatched", "errors"]


def test_streaming_topology_end_to_end(spark, tmp_path):
    """parquet_stream source -> remap/filter/route -> parquet + memory
    sinks; must equal the batch topology on the same data, and rerunning
    resumes (no duplicates in the parquet sink)."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "error", 10.0), (2, "signup", 200.0), (3, "click", 50.0)],
        "event_id long, event_type string, value double",
    ).write.parquet(src)

    spec = {
        "sources": {"events": {"type": "parquet_stream", "path": src}},
        "transforms": {
            "tagged": {"type": "remap", "inputs": ["events"],
                        "set": {"big": "value > 100"}},
            "routed": {"type": "exclusive_route", "inputs": ["tagged"],
                        "routes": {"errors": "event_type = 'error'",
                                   "big_vals": "big"}},
        },
        "sinks": {
            "mem": {"type": "memory", "inputs": ["routed"]},
            "pq": {"type": "parquet", "inputs": ["routed"],
                    "path": str(tmp_path / "out"), "partition_by": ["route"],
                    "checkpoint": str(tmp_path / "ck_pq")},
        },
    }
    topo = compile_topology(spec)
    out = topo.build(spark).run()
    got = {r.event_id: r.route for r in out["mem"]}
    assert got == {1: "errors", 2: "big_vals", 3: "_unmatched"}
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 3

    # rerun: streaming checkpoints make it a no-op (no duplicate rows)
    topo.build(spark).run()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3


def test_streaming_sink_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "s2")
    spark.range(3).write.parquet(src)
    spec = {
        "sources": {"a": {"type": "parquet_stream", "path": src}},
        "sinks": {"m": {"type": "parquet", "inputs": ["a"],
                         "path": str(tmp_path / "o2")}},
    }
    with pytest.raises(TopologyError, match="checkpoint"):
        compile_topology(spec).build(spark).run()


def test_parse_transform_and_file_sink(spark, tmp_path):
    """Source-decoding codec as a `parse` transform (syslog fields merged
    onto the event) and encoding-codec `file` sink (one json line per
    event) — the Vector decoding.codec / encoding.codec analogues."""
    import json

    spec = {
        "sources": {
            "logs": {
                "type": "inline",
                "rows": [
                    (1, "<34>Jan  5 10:20:30 web1 sshd[77]: login ok"),
                    (2, "<13>Jan  5 10:20:31 db1 cron[12]: job done"),
                ],
                "schema": "event_id long, message string",
            }
        },
        "transforms": {
            "decoded": {
                "type": "parse",
                "inputs": ["logs"],
                "parser": "syslog",
                "column": "message",
                "drop_column": True,
            },
            "errors_only": {
                "type": "filter",
                "inputs": ["decoded"],
                "condition": "severity = 2",  # <34> -> fac 4, sev 2
            },
        },
        "sinks": {
            "out": {
                "type": "file",
                "inputs": ["errors_only"],
                "codec": "json",
                "path": str(tmp_path / "out"),
            }
        },
    }
    res = compile_topology(spec).build(spark).run()
    lines = [
        json.loads(r.value)
        for r in spark.read.text(res["out"]).collect()
    ]
    assert len(lines) == 1
    assert lines[0]["event_id"] == 1
    assert lines[0]["hostname"] == "web1" and lines[0]["appname"] == "sshd"
    assert lines[0]["severity"] == 2 and lines[0]["facility"] == 4
    assert lines[0]["message"] == "login ok"  # extracted body replaced the raw line


def test_parse_transform_unknown_parser_rejected(spark):
    spec = {
        "sources": {"logs": EVENTS_SRC},
        "transforms": {
            "p": {"type": "parse", "inputs": ["logs"], "parser": "nope"}
        },
    }
    with pytest.raises(TopologyError, match="unknown parser"):
        compile_topology(spec).build(spark)


def test_syslog_config_yaml_end_to_end(spark, tmp_path):
    """The shipped configs/syslog_topology.yaml runs end-to-end over
    demo_logs syslog lines (paths rewritten into tmp)."""
    import json
    import pathlib

    from vector_spark.sources.demo_logs import demo_logs

    src = str(tmp_path / "lines")
    demo_logs(spark, 500, "syslog").write.parquet(src)
    spec = load_yaml(str(pathlib.Path(__file__).parent.parent / "configs" / "syslog_topology.yaml"))
    spec["sources"]["syslog_in"]["path"] = src
    for sink in spec["sinks"].values():
        sink["path"] = str(tmp_path / pathlib.Path(sink["path"]).name)
    res = compile_topology(spec).build(spark).run()
    alerts = [json.loads(r.value) for r in spark.read.text(res["alerts_jsonl"]).collect()]
    assert alerts and all(a["severity"] <= 3 for a in alerts)
    assert all("hostname" in a and "appname" in a for a in alerts)
    counts = spark.read.parquet(res["counts"])
    assert counts.count() > 0
    assert {"window_start", "hostname", "appname", "agg_value"} <= set(counts.columns)


def test_netflow_transform_and_sketch_aggregate(spark):
    """Round-3 topology surface: a netflow v5 decoding stage (1 packet ->
    N flow records) feeding an aggregate with value_type: sketch."""
    import datetime as dt

    def u(v, n):
        return int(v).to_bytes(n, "big")

    def v5_packet(unix_secs, flows):
        hdr = u(5, 2) + u(len(flows), 2) + u(0, 4) + u(unix_secs, 4) + u(0, 8) + u(0, 4)
        recs = b""
        for src, byts in flows:
            recs += (bytes(src) + bytes([10, 0, 0, 2]) + b"\x00" * 8
                     + u(1, 4) + u(byts, 4) + b"\x00" * 8
                     + u(1234, 2) + u(80, 2) + b"\x00\x00" + u(6, 1) + b"\x00"
                     + b"\x00" * 8)
        return hdr + recs

    pkts = [
        (bytearray(v5_packet(1_700_000_000, [([10, 0, 0, 1], 100), ([10, 0, 0, 3], 300)])),),
        (bytearray(v5_packet(1_700_000_005, [([10, 0, 0, 1], 500)])),),
    ]
    spec = {
        "sources": {
            "pkts": {"type": "inline", "schema": "packet binary", "rows": pkts},
        },
        "transforms": {
            "flows": {"type": "netflow", "inputs": ["pkts"], "version": "v5"},
            "sk": {
                "type": "aggregate", "inputs": ["flows"],
                "value_type": "sketch", "quantiles": [0.5],
                "window_secs": 3600, "series": ["proto"],
                "value_col": "bytes", "ts_col": "ts",
            },
        },
        "sinks": {
            "raw": {"type": "memory", "inputs": ["flows"]},
            "out": {"type": "memory", "inputs": ["sk"]},
        },
    }
    # sketch needs a timestamp column: map unix_secs in a remap stage
    spec["transforms"]["flows2"] = {
        "type": "remap", "inputs": ["flows"],
        "set": {"ts": "CAST(unix_secs AS TIMESTAMP)"},
    }
    spec["transforms"]["sk"]["inputs"] = ["flows2"]
    topo = compile_topology(spec).build(spark)
    out = topo.run()
    assert len(out["raw"]) == 3                       # 2 + 1 flow records
    srcs = sorted(r.srcaddr for r in out["raw"])
    assert srcs == ["10.0.0.1", "10.0.0.1", "10.0.0.3"]
    sk = out["out"]
    assert len(sk) == 1 and sk[0]["count"] == 3
    assert 90 <= sk[0]["q0_5"] <= 510                  # within the value range


def test_dnstap_parse_transform(spark):
    from test_dnstap import DOC_FIXTURE

    spec = {
        "sources": {
            "frames": {
                "type": "inline", "schema": "id long, message string",
                "rows": [(1, DOC_FIXTURE)],
            },
        },
        "transforms": {
            "parsed": {"type": "parse", "inputs": ["frames"],
                       "parser": "dnstap", "prefix": "dt_"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["parsed"]}},
    }
    out = compile_topology(spec).build(spark).run()
    r = out["out"][0]
    assert r["dt_messageType"] == "ResolverQuery"
    assert r["dt_question_name"] == "facebook1.com."
    assert r["dt_responsePort"] == 53


def test_aggregate_value_type_rejects_unknown(spark):
    spec = {
        "sources": {"e": {"type": "inline", "schema": "ts timestamp, value double, name string", "rows": []}},
        "transforms": {"a": {"type": "aggregate", "inputs": ["e"], "value_type": "bogus"}},
        "sinks": {"out": {"type": "memory", "inputs": ["a"]}},
    }
    with pytest.raises(TopologyError, match="value_type"):
        compile_topology(spec).build(spark)


def test_netflow_config_yaml_end_to_end(spark, tmp_path):
    """The shipped configs/netflow_topology.yaml runs end-to-end over
    hand-encoded v9 packets (paths rewritten into tmp): decode ->
    remap-typed flows -> web/dns routing -> per-minute sums + sketch."""
    import pathlib

    from test_netflow import _flow_record, _v9_data_packet, _v9_template_packet

    src = str(tmp_path / "packets")
    recs1 = [
        _flow_record("10.0.0.1", "1.1.1.1", 40000, 443, 3, 900, 6),
        _flow_record("10.0.0.2", "8.8.8.8", 50000, 53, 1, 80, 17),
    ]
    recs2 = [_flow_record("10.0.0.3", "1.1.1.2", 40001, 80, 2, 400, 6)]
    spark.createDataFrame(
        [
            (bytearray(_v9_template_packet()),),
            (bytearray(_v9_data_packet(256, recs1, unix_secs=1_700_000_000)),),
            (bytearray(_v9_data_packet(256, recs2, unix_secs=1_700_000_090)),),
        ],
        "packet binary",
    ).write.parquet(src)

    spec = load_yaml(str(pathlib.Path(__file__).parent.parent / "configs" / "netflow_topology.yaml"))
    spec["sources"]["packets"]["path"] = src
    for sink in spec["sinks"].values():
        sink["path"] = str(tmp_path / pathlib.Path(sink["path"]).name)
    res = compile_topology(spec).build(spark).run()

    web = spark.read.parquet(res["web_flows"])
    assert sorted(r.srcaddr for r in web.collect()) == ["10.0.0.1", "10.0.0.3"]
    dns = spark.read.parquet(res["dns_flows"])
    assert [r.srcaddr for r in dns.collect()] == ["10.0.0.2"]
    traffic = {(r.proto, r.window_start): r.agg_value
               for r in spark.read.parquet(res["traffic"]).collect()}
    assert traffic[("6", 1_700_000_000 // 60 * 60)] == 900.0
    assert traffic[("6", 1_700_000_090 // 60 * 60)] == 400.0
    assert traffic[("17", 1_700_000_000 // 60 * 60)] == 80.0
    sk = spark.read.parquet(res["sketches"]).collect()
    assert {r.proto: r["count"] for r in sk} == {"6": 2, "17": 1}


def test_netflow_transform_streaming_uses_template_cache(spark, tmp_path):
    """A streaming topology with a netflow stage compiles onto the
    stateful template-cache decoder (batch's up-front collect is
    impossible on a streaming plan) and decodes end-to-end."""
    from test_netflow import _flow_record, _v9_data_packet, _v9_template_packet

    src = str(tmp_path / "nfs_src")
    rec = _flow_record("10.0.0.5", "1.1.1.1", 1234, 443, 1, 64, 6)
    spark.createDataFrame(
        [
            (bytearray(_v9_template_packet()),),
            (bytearray(_v9_data_packet(256, [rec], unix_secs=1_700_000_100)),),
        ],
        "packet binary",
    ).write.parquet(src)
    spec = {
        "sources": {
            "pkts": {"type": "parquet_stream", "path": src},
        },
        "transforms": {
            "flows": {"type": "netflow", "inputs": ["pkts"], "version": "v9"},
        },
        "sinks": {
            "out": {
                "type": "parquet", "inputs": ["flows"],
                "path": str(tmp_path / "nfs_out"),
                "checkpoint": str(tmp_path / "nfs_ck"),
            },
        },
    }
    topo = compile_topology(spec).build(spark)
    topo.run()
    out = spark.read.parquet(str(tmp_path / "nfs_out")).collect()
    assert len(out) == 1
    assert dict(out[0].fields)["ipv4_src_addr"] == "10.0.0.5"


def test_kind_typecheck_metric_into_log_transform():
    """log_to_metric produces metrics; feeding them into log-only
    log_to_metric again (or any log-only transform) must fail at
    compile(), before any Spark job — graph.rs:219-242 analogue."""
    spec = {
        "sources": {"e": {"type": "inline", "rows": [], "schema": "x int"}},
        "transforms": {
            "m": {"type": "log_to_metric", "inputs": ["e"], "metrics": []},
            "bad": {"type": "reduce", "inputs": ["m"], "group_by": ["x"]},
        },
    }
    with pytest.raises(TopologyError, match="Data type mismatch between m"):
        compile_topology(spec)


def test_kind_typecheck_log_into_metric_to_log():
    spec = {
        "sources": {"e": {"type": "inline", "rows": [], "schema": "x int"}},
        "transforms": {"bad": {"type": "metric_to_log", "inputs": ["e"]}},
    }
    with pytest.raises(TopologyError, match="Data type mismatch between e"):
        compile_topology(spec)


def test_kind_typecheck_source_data_kind_and_intersects():
    """A source may declare data_kind: metric; kind-preserving transforms
    (route) pass it through, and the edge check uses INTERSECTS semantics
    (a route fed log+metric may feed both a log-only and a metric-only
    consumer)."""
    spec = {
        "sources": {
            "logs": {"type": "inline", "rows": [], "schema": "x int"},
            "mets": {"type": "inline", "rows": [], "schema": "x int", "data_kind": "metric"},
        },
        "transforms": {
            "both": {"type": "route", "inputs": ["logs", "mets"], "routes": {}},
            "log_side": {"type": "reduce", "inputs": ["both"], "group_by": ["x"]},
            "met_side": {"type": "tag_cardinality_limit", "inputs": ["both"], "limit": 1},
        },
    }
    compile_topology(spec)  # all edges intersect -> no error
    # but a pure-metric source into a log-only transform still fails
    spec_bad = {
        "sources": {"mets": {"type": "inline", "rows": [], "schema": "x int", "data_kind": "metric"}},
        "transforms": {"bad": {"type": "dedupe", "inputs": ["mets"], "fields": ["x"]}},
    }
    with pytest.raises(TopologyError, match="mismatch"):
        compile_topology(spec_bad)


def test_script_transform_in_topology(spark):
    """`script` transform (lua analogue): a pandas batch hook wired into
    the topology compiler by callable — 1->N emit, declared schema.
    The hook is a closure (cloudpickle ships it by value; a module-level
    test function would be pickled by reference and miss on executors)."""
    def _word_hook(pdf):
        ex = pdf.assign(_w=pdf.event_type.str.split("i")).explode("_w")
        ex["part_idx"] = ex.groupby("event_id").cumcount()
        return ex.assign(part=ex._w)[["event_id", "part_idx", "part"]]

    spec = {
        "sources": {"events": EVENTS_SRC},
        "transforms": {
            "scripted": {
                "type": "script",
                "inputs": ["events"],
                "function": _word_hook,
                "schema": "event_id long, part_idx long, part string",
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["scripted"]}},
    }
    out = compile_topology(spec).build(spark).run()
    got = sorted((r.event_id, r.part_idx, r.part) for r in out["out"])
    assert got == [(1, 0, "error"), (2, 0, "s"), (2, 1, "gnup"),
                   (3, 0, "cl"), (3, 1, "ck")]


def test_script_transform_stateful_group_key(spark):
    """group_key= gives the hook one key's FULL batch — per-key state
    (the lua GLOBAL analogue): a running max over each event_type."""
    from vector_spark.operators import script_transform

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 20.0), ("b", 4, 7.0)],
        "k string, event_id long, value double",
    )

    def running_max(pdf):
        pdf = pdf.sort_values("event_id")
        return pdf.assign(run_max=pdf.value.cummax())[
            ["k", "event_id", "run_max"]]

    out = script_transform(
        df, running_max, "k string, event_id long, run_max double",
        group_key="k")
    got = sorted((r.k, r.event_id, r.run_max) for r in out.collect())
    assert got == [("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 20.0),
                   ("b", 4, 7.0)]


def test_script_transform_zero_emit_and_init(spark):
    """0-emit (hook drops everything in a batch) must not break the Arrow
    stream, and `init` passes script globals to the hook."""
    from vector_spark.operators import script_transform

    df = spark.createDataFrame([(1,), (2,), (3,)], "x long")

    def gated(pdf, init):
        out = pdf[pdf.x > init["threshold"]]
        return out.assign(y=out.x * init["scale"])[["x", "y"]]

    out = script_transform(df, gated, "x long, y long",
                           init={"threshold": 2, "scale": 10})
    assert [(r.x, r.y) for r in out.collect()] == [(3, 30)]
    none_pass = script_transform(df, gated, "x long, y long",
                                 init={"threshold": 99, "scale": 1})
    assert none_pass.count() == 0


def test_script_data_kind_declares_output_kind():
    """A user script may change event kind (the reference's lua transform
    can emit metrics from logs, src/transforms/lua/v2/mod.rs); `data_kind:`
    on a script transform declares it for the edge typecheck, so wiring the
    script's output into a metric-only consumer compiles."""
    spec = {
        "sources": {"e": {"type": "inline", "rows": [], "schema": "x int"}},
        "transforms": {
            "to_metric": {
                "type": "script", "inputs": ["e"],
                "function": (lambda pdf: pdf),
                "schema": "x int", "data_kind": "metric",
            },
            "limit": {
                "type": "tag_cardinality_limit", "inputs": ["to_metric"],
                "limit": 1,
            },
        },
    }
    compile_topology(spec)  # metric-kind script output feeds a metric consumer
    # without the declaration the same wiring is rejected: script output
    # defaults to kind-preserving (log), and tag_cardinality_limit is
    # metric-only
    del spec["transforms"]["to_metric"]["data_kind"]
    with pytest.raises(TopologyError, match="mismatch"):
        compile_topology(spec)


def test_tap_samples_component_outputs(spark):
    """`vector tap` analogue: glob-matched component outputs yield up to
    `limit` sample events without running any sink; an unmatched pattern
    is a TopologyError (the reference's invalid-match notification)."""
    spec = {
        "sources": {
            "ev": {
                "type": "inline",
                "rows": [(1, "a"), (2, "b"), (3, "a"), (4, "c")],
                "schema": "x int, k string",
            },
        },
        "transforms": {
            "only_a": {"type": "filter", "inputs": ["ev"], "condition": "k = 'a'"},
        },
        "sinks": {},
    }
    topo = compile_topology(spec).build(spark)
    tapped = topo.tap("only_*", limit=1)
    assert list(tapped) == ["only_a"]
    assert len(tapped["only_a"]) == 1 and tapped["only_a"][0].k == "a"
    # everything, unlimited enough to see full outputs
    all_tapped = topo.tap("*", limit=10)
    assert {r.x for r in all_tapped["only_a"]} == {1, 3}
    assert len(all_tapped["ev"]) == 4
    with pytest.raises(TopologyError, match="matches no component"):
        topo.tap("nope_*")


def test_streaming_sink_config_error_starts_nothing(spark, tmp_path):
    """An invalid streaming sink config (missing checkpoint) must raise at
    run() BEFORE any other streaming query start()s — a mid-loop error may
    never leak an already-running, never-awaited query."""
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "x int, k string").write.parquet(src)
    spec = {
        "sources": {
            "ev": {"type": "parquet_stream", "path": src,
                   "schema": "x int, k string"},
        },
        "transforms": {},
        "sinks": {
            "good": {"type": "memory", "inputs": ["ev"]},
            "bad": {"type": "parquet", "inputs": ["ev"],
                    "path": str(tmp_path / "out")},  # no checkpoint
        },
    }
    before = len(spark.streams.active)
    topo = compile_topology(spec).build(spark)
    with pytest.raises(TopologyError, match="checkpoint"):
        topo.run()
    assert len(spark.streams.active) == before  # nothing started


def test_streaming_sink_timeout_raises(spark, tmp_path):
    """awaitTermination(timeout)'s False return must surface as an error
    (and stop the straggler) instead of silently collecting a partial
    memory sink."""
    src = str(tmp_path / "src")
    spark.createDataFrame([(i, "a") for i in range(100)],
                          "x int, k string").write.parquet(src)
    spec = {
        "sources": {
            "ev": {"type": "parquet_stream", "path": src,
                   "schema": "x int, k string"},
        },
        "transforms": {},
        "sinks": {"out": {"type": "memory", "inputs": ["ev"]}},
    }
    before = len(spark.streams.active)
    topo = compile_topology(spec).build(spark)
    with pytest.raises(TopologyError, match="still running"):
        topo.run(timeout_secs=0.001)  # just-started query must time out
    assert len(spark.streams.active) == before  # straggler stopped


def test_load_toml_vector_style_config(spark):
    """TOML is the reference's native config format: the
    [sources.x]/[transforms.y]/[sinks.z] table layout loads into the same
    spec dict as YAML, compiles, and runs."""
    from vector_spark.topology import load_toml

    spec = load_toml(
        """
[sources.ev]
type = "inline"
rows = [[1, "err"], [2, "ok"], [3, "err"]]
schema = "x int, level string"

[transforms.errors]
type = "filter"
inputs = ["ev"]
condition = "level = 'err'"

[sinks.out]
type = "memory"
inputs = ["errors"]
"""
    )
    got = compile_topology(spec).build(spark).run()
    assert sorted(r.x for r in got["out"]) == [1, 3]


def test_env_interpolation_reference_vectors():
    """Every assertion from the reference's vars.rs test transcribed
    (src/config/vars.rs:80-120): $$ escape, $VAR/${VAR}, greedy names,
    Java-style dotted names, :- vs - empty handling, :? vs ? errors,
    unterminated/${}/ literals pass through."""
    import pytest as _pytest

    from vector_spark.topology import TopologyError, interpolate_env

    vars = {"FOO": "dogs", "FOOBAR": "cats", "FOO.BAR": "turtles", "EMPTY": ""}

    def ok(s):
        return interpolate_env(s, vars)

    def err(s):
        with _pytest.raises(TopologyError):
            interpolate_env(s, vars)

    assert ok("$FOO") == "dogs"
    assert ok("${FOO}") == "dogs"
    assert ok("${FOOBAR}") == "cats"
    assert ok("x${FOOBAR}y") == "xcatsy"
    err("x$FOOBARy")
    assert ok("$ x") == "$ x"
    assert ok("$$FOO") == "$FOO"
    assert ok("$FOO=bar") == "dogs=bar"
    err("$NOT_FOO")
    err("$NOT-FOO")
    assert ok("$FOO.BAR") == "turtles"
    assert ok("${FOO x") == "${FOO x"
    assert ok("${}") == "${}"
    assert ok("${FOO:-cats}") == "dogs"
    assert ok("${NOT:-dogcats}") == "dogcats"
    assert ok("${NOT:-dogs and cats}") == "dogs and cats"
    assert ok("${:-cats}") == "${:-cats}"
    assert ok("${NOT:-}") == ""
    assert ok("${NOT-cats}") == "cats"
    assert ok("${EMPTY-cats}") == ""
    assert ok("${FOO:?error cats}") == "dogs"
    assert ok("${FOO?error cats}") == "dogs"
    assert ok("${EMPTY?error cats}") == ""
    err("${NOT:?error cats}")
    err("${NOT?error cats}")
    err("${EMPTY:?error cats}")


def test_config_loaders_interpolate_env(spark):
    """load_yaml/load_toml interpolate the RAW text before parsing, as the
    reference does; defaults apply; missing-without-default raises with
    every error collected."""
    import pytest as _pytest

    from vector_spark.topology import TopologyError, load_toml, load_yaml

    yml = """
sources:
  ev:
    type: inline
    rows: [[1, "${LEVEL:-err}"]]
    schema: "x int, level string"
sinks:
  out: {type: memory, inputs: [ev]}
"""
    spec = load_yaml(yml, {"UNUSED": "1"})
    assert spec["sources"]["ev"]["rows"] == [[1, "err"]]
    spec = load_yaml(yml, {"LEVEL": "warn"})
    assert spec["sources"]["ev"]["rows"] == [[1, "warn"]]

    toml = 'x = "${A?need A}"\ny = "$B"\n'
    with _pytest.raises(TopologyError) as ei:
        load_toml(toml, {})
    assert "'A'" in str(ei.value) and "'B'" in str(ei.value)
    assert load_toml(toml, {"A": "1", "B": "2"}) == {"x": "1", "y": "2"}


def test_run_pipeline_validate_flag(tmp_path):
    """`run_pipeline.py --validate` = the `vector validate` analogue:
    compiles + typechecks the config WITHOUT starting Spark, exit 0 on a
    good config, EX_CONFIG(78) + collected errors on a bad one."""
    import json as _json
    import subprocess
    import sys as _sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "scripts" / "run_pipeline.py"
    good = tmp_path / "good.yaml"
    good.write_text(
        "sources:\n"
        "  ev: {type: inline, rows: [[1]], schema: 'x int'}\n"
        "sinks:\n"
        "  out: {type: memory, inputs: [ev]}\n"
    )
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        "sources:\n"
        "  ev: {type: inline, rows: [[1]], schema: 'x int'}\n"
        "sinks:\n"
        "  out: {type: memory, inputs: [nope]}\n"
    )
    r = subprocess.run(
        [_sys.executable, str(script), "--topology", str(good), "--validate"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert _json.loads(r.stdout)["validated"] is True
    r = subprocess.run(
        [_sys.executable, str(script), "--topology", str(bad), "--validate"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 78
    out = _json.loads(r.stdout)
    assert out["validated"] is False and "nope" in out["errors"][0]


def test_topology_error_carries_structured_errors():
    """TopologyError.errors is one entry PER error — a user message that
    itself contains '; ' (the ${VAR:?msg} flag) must not fragment when a
    reporter lists the errors (run_pipeline --validate reads .errors
    instead of re-splitting the joined string)."""
    import pytest

    from vector_spark.topology import TopologyError, interpolate_env

    with pytest.raises(TopologyError) as ei:
        interpolate_env("a: ${TOKEN:?set TOKEN; see docs}\nb: $MISSING", {})
    errs = ei.value.errors
    assert len(errs) == 2
    assert any("set TOKEN; see docs" in e for e in errs)
    assert str(ei.value) == "; ".join(errs)  # joined message unchanged


def test_run_pipeline_validate_reports_parse_and_io_errors(tmp_path):
    """--validate must REPORT (exit 78 + errors JSON), not traceback, the
    common non-TopologyError failures: missing config file and YAML syntax
    errors — `vector validate` reports those too."""
    import json as _json
    import subprocess
    import sys as _sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "scripts" / "run_pipeline.py"

    r = subprocess.run(
        [_sys.executable, str(script), "--topology",
         str(tmp_path / "nonexistent.yaml"), "--validate"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 78, r.stderr
    out = _json.loads(r.stdout)
    assert out["validated"] is False and "FileNotFoundError" in out["errors"][0]

    bad = tmp_path / "bad.yaml"
    bad.write_text("sources: [unclosed\n  nope: {")
    r = subprocess.run(
        [_sys.executable, str(script), "--topology", str(bad), "--validate"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 78, r.stderr
    out = _json.loads(r.stdout)
    assert out["validated"] is False and len(out["errors"]) == 1


def test_run_pipeline_runs_toml_topology_and_compacts(spark, tmp_path, capsys, monkeypatch):
    """The run path must accept the same config formats --validate
    certifies (TOML used to be validated with load_toml but RUN with
    load_yaml), and --topology --compact must actually compact the
    partitioned parquet sinks (the flag was silently ignored on the
    topology branch)."""
    import json as _json
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import run_pipeline

    out_dir = tmp_path / "routed"
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        "[sources.ev]\n"
        'type = "inline"\n'
        "rows = [[0, \"a\"], [1, \"b\"], [2, \"a\"], [3, \"b\"]]\n"
        'schema = "id int, day string"\n'
        "[sinks.out]\n"
        'type = "parquet"\n'
        'mode = "append"\n'
        f'path = "{out_dir}"\n'
        'inputs = ["ev"]\n'
        'partition_by = ["day"]\n'
    )
    # pre-fragment the sink so the compaction pass has work to report
    for _ in range(3):
        spark.createDataFrame([(9, "a"), (8, "b")], "id int, day string") \
            .repartition(2, "id").write.mode("append") \
            .partitionBy("day").parquet(str(out_dir))

    monkeypatch.setattr(
        _sys, "argv",
        ["run_pipeline.py", "--topology", str(cfg), "--compact"],
    )
    run_pipeline.main()
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["sinks"]["out"] == str(out_dir)
    comp = report["compaction"]["out"]
    assert comp["partitions_compacted"] == 2
    rows_after = spark.read.parquet(str(out_dir)).count()
    assert rows_after == 4 + 6


def test_run_pipeline_test_flag(spark, tmp_path, capsys, monkeypatch):
    """--test = the `vector test c.yaml` CLI analogue: runs the config's
    tests: blocks through vector_spark.testing.run_unit_tests, exit 0 when
    green, exit 1 + failure strings when an assertion misses."""
    import json as _json
    import sys as _sys
    from pathlib import Path

    import pytest

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import run_pipeline

    cfg = tmp_path / "suite.yaml"
    cfg.write_text(
        "transforms:\n"
        "  only_errors: {type: filter, inputs: [x], condition: \"lvl = 'error'\"}\n"
        "tests:\n"
        "  - name: keeps errors\n"
        "    insert_at: only_errors\n"
        "    schema: 'id long, lvl string'\n"
        "    inputs: [[1, error], [2, click]]\n"
        "    outputs:\n"
        "      - extract_from: only_errors\n"
        "        conditions: [\"id = 1\"]\n"
        "        count: 1\n"
    )
    monkeypatch.setattr(_sys, "argv", ["run_pipeline.py", "--topology", str(cfg), "--test"])
    with pytest.raises(SystemExit) as ei:
        run_pipeline.main()
    assert ei.value.code == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report == {"tests": 1, "passed": 1, "failures": []}

    cfg.write_text(cfg.read_text().replace("count: 1", "count: 2"))
    monkeypatch.setattr(_sys, "argv", ["run_pipeline.py", "--topology", str(cfg), "--test"])
    with pytest.raises(SystemExit) as ei:
        run_pipeline.main()
    assert ei.value.code == 1
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tests"] == 1 and report["passed"] == 0 and report["failures"]


def test_topology_dot_rendering(tmp_path):
    """topology_dot / --graph = the `vector graph` analogue: trapezium
    sources, diamond transforms, invtrapezium sinks; port-qualified inputs
    become labeled edges from the base component (graph.rs:99-150)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    import pytest

    from vector_spark.topology import TopologyError, topology_dot

    spec = {
        "sources": {"ev": {"type": "inline", "rows": [(1,)], "schema": "x int"}},
        "transforms": {
            "routed": {"type": "route", "inputs": ["ev"],
                       "routes": {"errors": "x = 1"}},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["routed.errors"]}},
    }
    dot = topology_dot(spec)
    assert dot.startswith("digraph {\n") and dot.endswith("}\n")
    assert '"ev" [shape=trapezium]' in dot
    assert '"routed" [shape=diamond]' in dot
    assert '"ev" -> "routed"' in dot
    assert '"routed" -> "out" [label="errors"]' in dot
    assert '"out" [shape=invtrapezium]' in dot

    with pytest.raises(TopologyError):  # invalid specs must not render
        topology_dot({"sources": {}, "sinks": {"s": {"inputs": ["nope"]}}})

    script = Path(__file__).resolve().parent.parent / "scripts" / "run_pipeline.py"
    cfg = tmp_path / "g.yaml"
    cfg.write_text(
        "sources:\n  ev: {type: inline, rows: [[1]], schema: 'x int'}\n"
        "sinks:\n  out: {type: memory, inputs: [ev]}\n"
    )
    r = subprocess.run(
        [_sys.executable, str(script), "--topology", str(cfg), "--graph"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("digraph {") and '"ev" -> "out"' in r.stdout


def test_component_types_listing():
    """component_types / --list = the `vector list` analogue (list.rs):
    the transform listing is derived from the kind-typecheck registry, so
    every transform the compiler typechecks is listed and vice versa."""
    import json as _json
    import subprocess
    import sys as _sys
    from pathlib import Path

    from vector_spark.topology import _TRANSFORM_KINDS, component_types

    types = component_types()
    assert set(types) == {"sources", "transforms", "sinks", "enrichment_tables"}
    assert types["transforms"] == sorted(_TRANSFORM_KINDS)
    assert {"remap", "filter", "route", "reduce", "aggregate"} <= set(types["transforms"])
    assert "parquet" in types["sources"] and "parquet" in types["sinks"]

    script = Path(__file__).resolve().parent.parent / "scripts" / "run_pipeline.py"
    r = subprocess.run(
        [_sys.executable, str(script), "--list"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert _json.loads(r.stdout) == types


def test_frames_transform_heroku_and_docker(spark):
    """The `frames` transform kind: 1->N body decoders as topology
    stages — struct decoders expand fields as event columns, string
    framers emit a `frame` column."""
    import struct as _s

    from vector_spark.topology import compile_topology

    body = ("83 <40>1 2012-11-30T06:45:29+00:00 hostX appY web.3 - up\n"
            "short\n")
    spec = {
        "sources": {"drains": {
            "type": "inline",
            "rows": [(1, body)],
            "schema": "req_id long, message string",
        }},
        "transforms": {
            "events": {"type": "frames", "inputs": ["drains"],
                       "decoder": "heroku_logplex"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["events"]}},
    }
    rows = compile_topology(spec).build(spark).run()["out"]
    assert len(rows) == 1
    r = rows[0]
    assert r["req_id"] == 1 and r["frame_idx"] == 0
    assert (r["host"], r["app_name"], r["proc_id"], r["message"]) == (
        "hostX", "appY", "web.3", "up")

    blob = bytes([1, 0, 0, 0]) + _s.pack(">I", 3) + b"abc"
    spec2 = {
        "sources": {"conns": {
            "type": "inline",
            "rows": [(9, bytearray(blob))],
            "schema": "cid long, buf binary",
        }},
        "transforms": {
            "frames": {"type": "frames", "inputs": ["conns"],
                       "decoder": "docker_stream", "column": "buf"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["frames"]}},
    }
    rows2 = compile_topology(spec2).build(spark).run()["out"]
    assert [(r["cid"], r["stream"], r["payload"]) for r in rows2] == [
        (9, "stdout", "abc")]


def test_frames_transform_stats_formats(spark):
    """The r5 stats-document decoders ride the same `frames` kind: one
    scraped body row -> N metric-event rows with expanded columns."""
    import json as _json

    from vector_spark.topology import compile_topology

    ecs = _json.dumps({"cid1": {
        "read": "2026-01-01T00:00:00.000000Z",
        "memory_stats": {"usage": 41},
        "networks": {"eth0": {"rx_bytes": 7}},
    }})
    esdb = _json.dumps({
        "proc": {"id": 2, "mem": 11,
                 "diskIo": {"readBytes": 1, "writtenBytes": 2,
                            "readOps": 3, "writeOps": 4}},
        "sys": {"freeMem": 12},
    })
    spec = {
        "sources": {
            "ecs": {"type": "inline", "rows": [(1, ecs)],
                    "schema": "scrape_id long, message string"},
            "esdb": {"type": "inline", "rows": [(2, esdb)],
                     "schema": "scrape_id long, message string"},
        },
        "transforms": {
            "ecs_m": {"type": "frames", "inputs": ["ecs"],
                      "decoder": "ecs_metrics"},
            "esdb_m": {"type": "frames", "inputs": ["esdb"],
                       "decoder": "eventstoredb_stats"},
        },
        "sinks": {
            "a": {"type": "memory", "inputs": ["ecs_m"]},
            "b": {"type": "memory", "inputs": ["esdb_m"]},
        },
    }
    res = compile_topology(spec).build(spark).run()
    got_a = {(r["name"], r["device"]): r["value"] for r in res["a"]}
    assert got_a[("memory_used_bytes", None)] == 41.0
    assert got_a[("network_receive_bytes_total", "eth0")] == 7.0
    assert all(r["container_id"] == "cid1" for r in res["a"])
    got_b = {r["name"]: r["value"] for r in res["b"]}
    assert len(got_b) == 6 and got_b["memory_free_bytes"] == 12.0


def test_frames_transform_unknown_decoder(spark):
    from vector_spark.topology import compile_topology, TopologyError
    import pytest as _pt

    spec = {
        "sources": {"s": {"type": "inline", "rows": [(1, "x")],
                          "schema": "a long, message string"}},
        "transforms": {"f": {"type": "frames", "inputs": ["s"],
                             "decoder": "nope"}},
        "sinks": {"out": {"type": "memory", "inputs": ["f"]}},
    }
    with _pt.raises(TopologyError, match="unknown frames decoder"):
        compile_topology(spec).build(spark).run()


def test_merge_partial_transform_end_to_end(spark):
    """parse: cri -> merge_partial -> filter as a topology — the
    kubernetes_logs story end-to-end: split CRI lines reassemble into one
    event before routing."""
    from vector_spark.topology import compile_topology

    ts = "2016-10-06T00:17:09Z"
    spec = {
        "sources": {"pods": {
            "type": "inline",
            "rows": [
                ("pod-a", 1, f"{ts} stdout P json partial "),
                ("pod-a", 2, f"{ts} stdout P line continues "),
                ("pod-a", 3, f"{ts} stdout F here"),
                ("pod-b", 1, f"{ts} stderr F whole"),
            ],
            "schema": "file string, line_no long, message string",
        }},
        "transforms": {
            "decoded": {"type": "parse", "inputs": ["pods"],
                        "parser": "cri", "column": "message"},
            "merged": {"type": "merge_partial", "inputs": ["decoded"],
                       "key_cols": ["file"], "order_col": "line_no"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["merged"]}},
    }
    rows = compile_topology(spec).build(spark).run()["out"]
    got = {(r["file"], r["line_no"]): (r["message"], r["partial"])
           for r in rows}
    assert got[("pod-a", 1)] == ("json partial line continues here", False)
    assert got[("pod-b", 1)] == ("whole", False)
    assert len(got) == 2


def test_merge_partial_transform_streaming_dispatch(spark, tmp_path):
    """merge_partial in a STREAMING topology dispatches to
    stream_merge_partial_lines (checkpointed state), draining under
    availableNow to the same merged events as the batch path."""
    from vector_spark.topology import compile_topology

    src = str(tmp_path / "mp_src")
    spark.createDataFrame(
        [("fa", 1, "a-", True), ("fa", 2, "b", False), ("fb", 1, "c", False)],
        "file string, line_no long, message string, partial boolean",
    ).coalesce(1).write.parquet(src)
    spec = {
        "sources": {"lines": {"type": "parquet_stream", "path": src}},
        "transforms": {
            "merged": {"type": "merge_partial", "inputs": ["lines"],
                       "key_cols": ["file"], "order_col": "line_no"},
        },
        "sinks": {"out": {
            "type": "parquet", "inputs": ["merged"],
            "path": str(tmp_path / "mp_out"),
            "checkpoint": str(tmp_path / "mp_ck"),
        }},
    }
    res = compile_topology(spec).build(spark).run()
    got = sorted(
        (r["file"], r["message"], r["partial"])
        for r in spark.read.parquet(res["out"]).collect()
    )
    assert got == [("fa", "a-b", False), ("fb", "c", False)]
