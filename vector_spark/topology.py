"""Topology compiler: declarative config (dict / YAML) -> DataFrame DAG.

The reference is config-driven: TOML/YAML defines sources -> transforms ->
sinks with named inputs; `config::compiler::compile`
(/root/reference/src/config/compiler.rs:9-117) validates names, builds the
graph, typechecks edges, rejects cycles; the topology builder then wires
components (/root/reference/src/topology/builder.rs:113,774). This module
is the same lifecycle re-expressed for Spark: compile(spec) validates and
topologically orders the graph, build(spark) resolves each component to a
DataFrame — after which Catalyst is the physical planner (SURVEY.md §3.1).

Component model:
  * sources: parquet path / registered DataFrame / inline rows
  * transforms: one entry per operator family (remap, filter, route,
    exclusive_route, enrich, dedupe, sample, reduce, aggregate, throttle,
    log_to_metric, metric_to_log, tag_cardinality_limit, hash_replace)
  * multiple `inputs` merge by unionByName — Vector's many-inputs-one-
    component stream merge (src/config/graph.rs:88+)
  * route exposes named ports referenced as "component.port"
    (route.rs multi-match semantics; `_unmatched` included)
  * sinks: parquet/noop/memory writers with optional partition_by —
    Vector's templated partitioned batching (SURVEY.md §2.5)

Per-event expressions are SQL strings compiled by Catalyst (`F.expr`) —
the VRL-subset surface (vector_spark.functions.vrl helps build them).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import (
    dedupe,
    enrich_between,
    enrich_equi,
    exclusive_route,
    filter_events,
    hash_replace,
    log_to_metric,
    metric_to_log,
    reduce_sessions,
    sample,
    tag_cardinality_limit,
    throttle,
)
from .operators.aggregate import aggregate_metrics
from .operators.log_to_metric import MetricSpec
from .operators.route import route as route_op


class TopologyError(ValueError):
    """Config-time error (unknown input, cycle, bad type) — the analogue of
    the reference's compile-phase errors (compiler.rs:9-117). `errors`
    carries the individual messages structurally (one entry per error) so
    CLI reporters never have to re-split the joined string — a message
    that itself contains '; ' must not fragment."""

    def __init__(self, msg: str, errors: list[str] | None = None):
        super().__init__(msg)
        self.errors = list(errors) if errors is not None else [msg]


@dataclass
class Topology:
    spec: dict[str, Any]
    order: list[str]

    def build(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
    ) -> "BuiltTopology":
        """Resolve every component to a DataFrame, in dependency order."""
        nodes: dict[str, DataFrame] = {}
        tables = tables or {}

        multi_ports: dict[str, list[str]] = {}

        def resolve(ref: str) -> DataFrame:
            if ref in nodes:
                return nodes[ref]
            if ref in multi_ports:
                raise TopologyError(
                    f"{ref!r} is a multi-port transform; reference a port "
                    f"explicitly: {', '.join(f'{ref}.{p}' for p in multi_ports[ref])}"
                )
            raise TopologyError(f"unresolved input {ref!r}")

        def merged(cfg: dict) -> DataFrame:
            dfs = [resolve(i) for i in cfg["inputs"]]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out

        sources = self.spec.get("sources", {})
        transforms = self.spec.get("transforms", {})
        for name in self.order:
            if name in sources:
                nodes[name] = _build_source(spark, sources[name], tables)
            elif name in transforms:
                cfg = transforms[name]
                built = _build_transform(cfg, merged(cfg), resolve, tables, spark)
                if isinstance(built, dict):  # multi-port (route)
                    for port, df in built.items():
                        nodes[f"{name}.{port}"] = df
                    # bare-name reference to a multi-port transform is a
                    # config error, matching the reference: route exposes
                    # ONLY named outputs (src/transforms/route.rs — the
                    # transform registers one output per route key, no
                    # default output), so `inputs: [routed]` is rejected at
                    # compile time there and resolve() raises here.
                    multi_ports[name] = list(built)
                else:
                    nodes[name] = built
        return BuiltTopology(self.spec, nodes, multi_ports)


@dataclass
class BuiltTopology:
    spec: dict[str, Any]
    nodes: dict[str, DataFrame]
    multi_ports: dict[str, list[str]] = field(default_factory=dict)

    def __getitem__(self, ref: str) -> DataFrame:
        if ref not in self.nodes and ref in self.multi_ports:
            raise TopologyError(
                f"{ref!r} is a multi-port transform; reference a port "
                f"explicitly: {', '.join(f'{ref}.{p}' for p in self.multi_ports[ref])}"
            )
        return self.nodes[ref]

    def sink_frames(self) -> dict[str, DataFrame]:
        out = {}
        for name, cfg in self.spec.get("sinks", {}).items():
            dfs = [self[i] for i in cfg["inputs"]]
            df = dfs[0]
            for d in dfs[1:]:
                df = df.unionByName(d, allowMissingColumns=True)
            out[name] = df
        return out

    def tap(self, pattern: str = "*", limit: int = 10) -> dict[str, list]:
        """`vector tap` analogue (lib/vector-tap/src/topology.rs: observe
        sample events flowing out of components matched by a glob
        pattern, without touching the sinks). Returns
        {component_or_port: [Row, ...]} with up to `limit` events each.

        Batch frames sample via limit(n) — a cheap separate job per tapped
        edge that scans only until `limit` rows are produced (Spark's
        CollectLimit incremental strategy), so tapping a 100 TB pipeline
        costs a few partitions, not a pass. Streaming frames are skipped
        (the reference taps a running topology's in-flight stream; our
        streaming edges are observable through their sinks/checkpoints) —
        they appear in the result as an empty list so the pattern match is
        still visible, mirroring the reference's matched-component
        notifications."""
        import fnmatch

        out: dict[str, list] = {}
        for ref, df in self.nodes.items():
            if not fnmatch.fnmatch(ref, pattern):
                continue
            out[ref] = [] if df.isStreaming else df.limit(limit).collect()
        if not out:
            raise TopologyError(
                f"tap pattern {pattern!r} matches no component output"
            )
        return out

    def run(
        self, timeout_secs: int = 300, max_concurrent_sinks: int = 4
    ) -> dict[str, Any]:
        """Execute every sink. parquet sinks write (partitioned if asked);
        noop sinks just materialize; memory sinks collect (tests only).

        Sinks execute CONCURRENTLY: batch sinks on a bounded driver thread
        pool, and every streaming sink is start()ed before any is awaited.
        The reference's topology drives all sinks in parallel off the
        shared fan-out (src/topology/builder.rs); the Spark analogue is
        concurrent job submission — independent sink jobs share the
        executors and the scheduler interleaves their stages. This is pure
        scheduling (each sink's plan is unchanged) and measured 1.5x
        end-to-end on the two-sink pages pipeline; at cluster scale it is
        what keeps a multi-sink topology from serializing N full scans.

        Streaming inputs (parquet_stream sources) run each sink as a
        writeStream with availableNow (drain-and-stop) and a per-sink
        checkpoint (cfg['checkpoint']) — restartable like any Structured
        Streaming query. Stateless transforms (remap/filter/route/enrich/
        log_to_metric/...) compose onto streams unchanged; stateful batch
        operators (window-rank based) need their streaming twins
        (vector_spark.streaming)."""
        results: dict[str, Any] = {}
        frames = self.sink_frames()
        batch_sinks = [n for n, d in frames.items() if not d.isStreaming]
        stream_sinks = [n for n, d in frames.items() if d.isStreaming]
        # validate EVERY streaming sink config before the first start(): a
        # mid-loop config error must never leave an earlier query running
        # unawaited (the sequential code could not; neither may this)
        for name in stream_sinks:
            cfg = self.spec["sinks"][name]
            kind = cfg.get("type", "noop")
            if kind == "parquet" and not cfg.get("checkpoint"):
                raise TopologyError(
                    f"streaming sink {name!r} needs a 'checkpoint' dir"
                )
            if kind not in ("parquet", "memory"):
                raise TopologyError(f"streaming sink type {kind!r} unsupported")
        # start every streaming sink FIRST (start() returns immediately),
        # then run the batch pool, then drain the streams — all sink
        # classes overlap, like the reference's all-sinks-in-parallel model
        started = self._start_stream_sinks(stream_sinks, frames, results)
        if len(batch_sinks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                min(max_concurrent_sinks, len(batch_sinks))
            ) as pool:
                futures = {
                    n: pool.submit(self._run_batch_sink, n, frames[n])
                    for n in batch_sinks
                }
                for n, fut in futures.items():
                    results[n] = fut.result()
        elif batch_sinks:
            n = batch_sinks[0]
            results[n] = self._run_batch_sink(n, frames[n])
        # every streaming sink is already running; drain them all.
        # awaitTermination(timeout) returns False when the query is STILL
        # RUNNING at the deadline — treat that as an error rather than
        # silently collecting a partial memory sink (stop the stragglers
        # first so no query outlives run()).
        timed_out = [
            name for name, _df, _kind, q in started
            if not q.awaitTermination(timeout_secs)
        ]
        if timed_out:
            for name, _df, _kind, q in started:
                if name in timed_out:
                    q.stop()
            raise TopologyError(
                f"streaming sink(s) {timed_out!r} still running after "
                f"{timeout_secs}s awaitTermination timeout"
            )
        for name, df, kind, q in started:
            if kind == "memory":
                results[name] = df.sparkSession.sql(f"select * from {name}").collect()
        return results

    def _start_stream_sinks(
        self, stream_sinks: list, frames: dict, results: dict
    ) -> list:
        started: list[tuple[str, Any, str, Any]] = []
        for name in stream_sinks:
            df = frames[name]
            cfg = self.spec["sinks"][name]
            kind = cfg.get("type", "noop")
            ck = cfg.get("checkpoint")
            if kind == "parquet":
                if not ck:
                    raise TopologyError(f"streaming sink {name!r} needs a 'checkpoint' dir")
                w = df.writeStream.format("parquet").option("path", cfg["path"])
                if cfg.get("partition_by"):
                    w = w.partitionBy(*cfg["partition_by"])
                results[name] = cfg["path"]
            elif kind == "memory":
                # memory sink is test-only and cannot recover from a
                # checkpoint — always use a fresh ephemeral one
                import tempfile

                ck = tempfile.mkdtemp(prefix="vs_memsink_ck_")
                w = df.writeStream.format("memory").queryName(name)
            else:
                raise TopologyError(f"streaming sink type {kind!r} unsupported")
            q = (
                w.option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            started.append((name, df, kind, q))
        return started

    def _run_batch_sink(self, name: str, df: DataFrame) -> Any:
        """One batch sink's write — called concurrently from run()'s pool
        (one driver thread per sink; Spark job submission is thread-safe
        and independent jobs share the executors)."""
        cfg = self.spec["sinks"][name]
        kind = cfg.get("type", "noop")
        if kind == "parquet":
            w = df.write.mode(cfg.get("mode", "overwrite"))
            if cfg.get("partition_by"):
                w = w.partitionBy(*cfg["partition_by"])
            w.parquet(cfg["path"])
            return cfg["path"]
        if kind == "file":
            # encoding-codec sink (Vector sink `encoding.codec`,
            # lib/codecs serializers): events serialized one-per-line
            codec = cfg.get("codec", "json")
            if codec == "json":
                val = F.to_json(F.struct(*df.columns))
            elif codec == "logfmt":
                from .functions import encode_logfmt

                val = encode_logfmt({c: F.col(c) for c in df.columns})
            elif codec == "csv":
                val = F.to_csv(F.struct(*df.columns))
            elif codec == "raw":
                val = F.col(cfg["column"]).cast("string")
            else:
                raise TopologyError(f"unknown sink codec {codec!r}")
            (
                df.select(val.alias("value"))
                .write.mode(cfg.get("mode", "overwrite"))
                .text(cfg["path"])
            )
            return cfg["path"]
        if kind == "noop":
            df.write.format("noop").mode("overwrite").save()
            return None
        if kind == "memory":
            return df.collect()
        raise TopologyError(f"unknown sink type {kind!r}")


def compile_topology(spec: dict[str, Any]) -> Topology:
    """Validate names/inputs, reject cycles, topologically order components."""
    sources = spec.get("sources", {})
    transforms = spec.get("transforms", {})
    sinks = spec.get("sinks", {})
    if not sources:
        raise TopologyError("topology needs at least one source")
    dup = set(sources) & set(transforms)
    if dup:
        raise TopologyError(f"names used as both source and transform: {sorted(dup)}")

    def base(ref: str) -> str:
        return ref.split(".", 1)[0]

    known = set(sources) | set(transforms)
    deps: dict[str, set[str]] = {name: set() for name in known}
    for name, cfg in transforms.items():
        ins = cfg.get("inputs")
        if not ins:
            raise TopologyError(f"transform {name!r} has no inputs")
        for ref in ins:
            if base(ref) not in known:
                raise TopologyError(f"transform {name!r}: unknown input {ref!r}")
            deps[name].add(base(ref))
        # an enrich `table` naming another component is a dependency too
        # (externally-provided tables are resolved at build time instead)
        tref = cfg.get("table")
        if tref and base(tref) in known:
            deps[name].add(base(tref))
    for name, cfg in sinks.items():
        for ref in cfg.get("inputs", []):
            if base(ref) not in known:
                raise TopologyError(f"sink {name!r}: unknown input {ref!r}")

    # Kahn topo-sort; leftover nodes => cycle (graph.rs:244 analogue)
    order: list[str] = []
    ready = sorted(n for n in known if not deps[n])
    pending = {n: set(d) for n, d in deps.items() if d}
    while ready:
        n = ready.pop()
        order.append(n)
        for m in sorted(pending):
            pending[m].discard(n)
            if not pending[m]:
                del pending[m]
                ready.append(m)
    if pending:
        raise TopologyError(f"cycle detected involving {sorted(pending)}")
    _typecheck_kinds(sources, transforms, sinks, order, base)
    return Topology(spec, order)


# Event-kind signatures per transform type: (accepted input kinds, output).
# Mirrors each reference transform's Input/outputs declaration; the edge
# check itself mirrors Graph::typecheck (src/config/graph.rs:219-242):
# an edge is valid iff the upstream's output kinds INTERSECT the
# downstream's accepted kinds. Output "same" = kind-preserving.
_ALL_KINDS = frozenset({"log", "metric", "trace"})
_TRANSFORM_KINDS: dict[str, tuple[frozenset, object]] = {
    "remap": (_ALL_KINDS, "same"),
    "script": (_ALL_KINDS, "same"),
    "filter": (_ALL_KINDS, "same"),
    "route": (_ALL_KINDS, "same"),
    "exclusive_route": (_ALL_KINDS, "same"),
    "parse": (frozenset({"log"}), "log"),
    "netflow": (frozenset({"log"}), "log"),
    "frames": (frozenset({"log"}), "log"),
    "merge_partial": (frozenset({"log"}), "log"),
    "enrich": (frozenset({"log"}), "log"),
    "dedupe": (frozenset({"log"}), "log"),
    "sample": (frozenset({"log", "trace"}), "same"),
    "reduce": (frozenset({"log"}), "log"),
    "throttle": (frozenset({"log"}), "log"),
    "hash_replace": (frozenset({"log"}), "log"),
    # our aggregate also implements the windowed log rollup, so unlike the
    # reference's metric-only aggregate.rs it accepts both kinds
    "aggregate": (frozenset({"log", "metric"}), "metric"),
    "log_to_metric": (frozenset({"log"}), "metric"),
    "metric_to_log": (frozenset({"metric"}), "log"),
    "tag_cardinality_limit": (frozenset({"metric"}), "metric"),
}


_SOURCE_TYPES = ("inline", "parquet", "parquet_stream", "table")
_SINK_TYPES = ("file", "memory", "noop", "parquet")


def component_types() -> dict[str, list[str]]:
    """Available component types — the `vector list` analogue
    (/root/reference/src/list.rs:24-40: sources/transforms/sinks/
    enrichment_tables). Transforms come straight from the kind-typecheck
    registry so the listing cannot drift from what compiles; enrichment
    tables are the `enrich` transform's `table`/CSV-dim surface
    (operators/enrich.py)."""
    return {
        "sources": sorted(_SOURCE_TYPES),
        "transforms": sorted(_TRANSFORM_KINDS),
        "sinks": sorted(_SINK_TYPES),
        "enrichment_tables": ["csv_file", "dataframe", "geoip_mmdb"],
    }


def topology_dot(spec: dict[str, Any]) -> str:
    """GraphViz DOT rendering of a topology spec — the `vector graph`
    analogue (/root/reference/src/graph.rs:80-150): sources as trapezium,
    transforms as diamond, sinks as invtrapezium; a port-qualified input
    (`routed.errors`) becomes an edge from the base component labeled with
    the port. Compiles the spec first so only valid topologies render."""
    compile_topology(spec)  # surface config errors with their real messages

    def edge(ref: str, to: str) -> str:
        comp, _, port = ref.partition(".")
        if port:
            return f'  "{comp}" -> "{to}" [label="{port}"]\n'
        return f'  "{ref}" -> "{to}"\n'

    dot = "digraph {\n"
    for name in spec.get("sources", {}):
        dot += f'  "{name}" [shape=trapezium]\n'
    for name, cfg in spec.get("transforms", {}).items():
        dot += f'  "{name}" [shape=diamond]\n'
        for ref in cfg.get("inputs", []):
            dot += edge(ref, name)
    for name, cfg in spec.get("sinks", {}).items():
        dot += f'  "{name}" [shape=invtrapezium]\n'
        for ref in cfg.get("inputs", []):
            dot += edge(ref, name)
    return dot + "}\n"


def _typecheck_kinds(sources, transforms, sinks, order, base) -> None:
    """Compile-time Log/Metric/Trace edge compatibility — errors BEFORE any
    Spark job, like the reference's graph typecheck, instead of a later
    (and noisier) Catalyst column-resolution failure. All incompatible
    edges are collected, sorted, deduped, and reported together
    (graph.rs:219-242 semantics)."""
    out_kinds: dict[str, frozenset] = {}
    for name, cfg in sources.items():
        out_kinds[name] = frozenset({cfg.get("data_kind", "log")})
    errors: list[str] = []
    for name in order:
        if name not in transforms:
            continue
        cfg = transforms[name]
        accepted, produces = _TRANSFORM_KINDS.get(cfg.get("type"), (_ALL_KINDS, "same"))
        if cfg.get("type") == "script" and "data_kind" in cfg:
            # a user script may change event kind (the reference's lua
            # transform can emit metrics from logs); let the config declare
            # the output kind like a source does
            produces = cfg["data_kind"]
        in_kinds: set[str] = set()
        for ref in cfg.get("inputs", []):
            from_ty = out_kinds.get(base(ref), _ALL_KINDS)
            if not from_ty & accepted:
                errors.append(
                    f"Data type mismatch between {ref} ({'+'.join(sorted(from_ty))})"
                    f" and {name} ({'+'.join(sorted(accepted))})"
                )
            in_kinds |= from_ty & accepted
        if produces == "same":
            out_kinds[name] = frozenset(in_kinds) or frozenset({"log"})
        else:
            out_kinds[name] = frozenset({produces})
    # sinks accept every kind, as in the reference's Node::Sink — no check
    if errors:
        errors = sorted(set(errors))
        raise TopologyError("; ".join(errors), errors)


_ENV_INTERP = None  # compiled lazily: topology import must stay cheap


def interpolate_env(
    text: str, vars: dict[str, str] | None = None
) -> str:
    """Environment-variable interpolation over RAW config text, before any
    parse — the reference's semantics exactly (src/config/vars.rs:12-75):
    ``$$`` escapes a literal ``$``; ``$VAR`` / ``${VAR}`` substitute (a
    missing variable is an ERROR, not silently empty); ``${VAR:-d}`` falls
    back when unset OR empty, ``${VAR-d}`` only when unset; ``${VAR:?msg}``
    errors when unset or empty, ``${VAR?msg}`` when unset. Names are
    ``[:word:].`` as in the reference. All errors are collected and raised
    together as one TopologyError."""
    import os
    import re

    global _ENV_INTERP
    if _ENV_INTERP is None:
        _ENV_INTERP = re.compile(
            r"\$\$|\$([\w.]+)|\$\{([\w.]+)(?:(:?-|:?\?)([^}]*))?\}",
            re.ASCII,  # the reference's [:word:] class is ASCII-only
        )
    if vars is None:
        vars = dict(os.environ)
    errors: list[str] = []

    def sub(m: re.Match) -> str:
        name = m.group(1) or m.group(2)
        if name is None:
            return "$"  # the $$ escape
        flags = m.group(3) or ""
        def_or_err = m.group(4) or ""
        val = vars.get(name)
        if flags == ":-":
            return val if val else def_or_err
        if flags == "-":
            return val if val is not None else def_or_err
        if flags == ":?":
            if val:
                return val
            errors.append(
                f"Non-empty environment variable required in config. "
                f"name = {name!r}, error = {def_or_err!r}"
            )
            return ""
        if flags == "?":
            if val is not None:
                return val
            errors.append(
                f"Missing environment variable required in config. "
                f"name = {name!r}, error = {def_or_err!r}"
            )
            return ""
        if val is not None:
            return val
        errors.append(f"Missing environment variable in config. name = {name!r}")
        return ""

    out = _ENV_INTERP.sub(sub, text)
    if errors:
        uniq = sorted(set(errors))
        raise TopologyError("; ".join(uniq), uniq)
    return out


def load_yaml(path_or_text: str, vars: dict[str, str] | None = None) -> dict[str, Any]:
    import yaml

    if "\n" not in path_or_text:
        with open(path_or_text) as f:
            path_or_text = f.read()
    return yaml.safe_load(interpolate_env(path_or_text, vars))


def load_toml(path_or_text: str, vars: dict[str, str] | None = None) -> dict[str, Any]:
    """TOML config loader — the reference's NATIVE config format
    (`vector --config c.toml`; YAML/JSON are the alternates, same tree:
    src/config/loading). The [sources.x]/[transforms.y]/[sinks.z] table
    layout maps 1:1 onto the spec dict compile_topology takes. Like the
    reference, env interpolation runs over the raw text before the parse."""
    import tomllib

    if "\n" not in path_or_text:
        with open(path_or_text, "rb") as f:
            path_or_text = f.read().decode("utf-8")
    return tomllib.loads(interpolate_env(path_or_text, vars))


# -- component builders ------------------------------------------------------

def _build_source(spark: SparkSession, cfg: dict, tables: dict[str, DataFrame]) -> DataFrame:
    kind = cfg.get("type", "parquet")
    if kind == "parquet":
        return spark.read.parquet(cfg["path"])
    if kind == "parquet_stream":
        # continuous-mode source: the file-source checkpoint (managed by the
        # sink's checkpointLocation) makes the topology resumable, the
        # reference's source-checkpointing role (SURVEY §2.4 file source)
        schema = cfg.get("schema") or spark.read.parquet(cfg["path"]).schema
        reader = spark.readStream.schema(schema)
        if cfg.get("glob"):
            reader = reader.option("pathGlobFilter", cfg["glob"])
        return reader.parquet(cfg["path"])
    if kind == "table":
        if cfg["name"] not in tables:
            raise TopologyError(f"table source {cfg['name']!r} not provided")
        return tables[cfg["name"]]
    if kind == "inline":
        return spark.createDataFrame(cfg["rows"], cfg["schema"])
    raise TopologyError(f"unknown source type {kind!r}")


def _as_specs(raw: list[dict]) -> list[MetricSpec]:
    out = []
    for s in raw:
        out.append(
            MetricSpec(
                s["metric_type"],
                s["name"],
                value=F.expr(s["value"]) if "value" in s else None,
                namespace=s.get("namespace", ""),
                kind=s.get("kind"),
                when=F.expr(s["when"]) if "when" in s else None,
            )
        )
    return out


def _build_transform(cfg, df, resolve, tables, spark):
    kind = cfg["type"]
    if kind == "remap":
        if cfg.get("emit"):
            # 1->N emit: `. = [...]` in VRL (vrl_target.rs:137-173) — an
            # array<struct> expression whose elements become the new events
            # (reference behavior case remap_emit_multiple)
            return df.select(*cfg.get("keep", []), F.inline(F.expr(cfg["emit"])))
        for col in cfg.get("drop", []):
            df = df.drop(col)
        if cfg.get("required"):
            # error handling: rows with null required outputs reroute to the
            # `dropped` port (remap.rs:339-359 semantics); ports are
            # <name>.ok / <name>.dropped
            from .operators.remap import remap_with_errors

            return remap_with_errors(
                df, cfg.get("set", {}), required=cfg["required"],
                component_id=cfg.get("component_id", "remap"),
                reroute_dropped=cfg.get("reroute_dropped", True),
            )
        for col, expr in cfg.get("set", {}).items():
            df = df.withColumn(col, F.expr(expr))
        return df
    if kind == "parse":
        # the source-decoding codec surface (Vector `decoding.codec` /
        # lib/codecs deserializers) as a transform: named parser over one
        # column, extracted fields merged onto the event
        from .functions import (
            parse_aws_alb_log,
            parse_aws_vpc_flow_log,
            parse_combined_log,
            parse_common_log,
            parse_influxdb_line,
            parse_linux_authorization,
            parse_syslog,
        )

        def _dnstap_fields(c):
            from .functions import parse_dnstap
            from .functions.dnstap import DNSTAP_SCHEMA

            d = parse_dnstap(c, lowercase_hostnames=cfg.get("lowercase_hostnames", False))
            # one UDF call expression shared by every getField — the
            # Python-UDF extractor dedupes identical calls, so the frame
            # decodes once per row, not once per field
            return {f.split(" ")[0]: d.getField(f.split(" ")[0])
                    for f in DNSTAP_SCHEMA.split(", ")}

        def _struct_fields(fn, names):
            # struct-returning decoders exposed at the same dict[str,
            # Column] surface as the named parsers (the shared struct
            # expression dedupes in codegen — one decode per row)
            def go(c):
                s = fn(c)
                return {n: s[n] for n in names}
            return go

        from .functions import (
            parse_cri,
            parse_docker_log,
            parse_journald,
            parse_nginx_stub_status,
        )

        parsers: dict[str, Callable] = {
            "syslog": lambda c: parse_syslog(c, rfc=cfg.get("rfc", "3164")),
            # platform/agent source formats (platform_logs.py)
            "cri": _struct_fields(
                parse_cri, ["message", "stream", "partial", "ts_us"]),
            "docker_json": _struct_fields(
                parse_docker_log, ["message", "stream", "partial", "ts_us"]),
            "journald": _struct_fields(
                parse_journald, ["message", "host", "priority", "unit", "ts_us"]),
            "nginx_stub_status": _struct_fields(
                parse_nginx_stub_status,
                ["active", "accepts", "handled", "requests",
                 "reading", "writing", "waiting"]),
            "common_log": parse_common_log,
            "combined_log": parse_combined_log,
            "aws_vpc_flow_log": lambda c: parse_aws_vpc_flow_log(c, format=cfg.get("format")),
            "aws_alb_log": parse_aws_alb_log,
            "linux_authorization": parse_linux_authorization,
            "influxdb": parse_influxdb_line,
            "dnstap": _dnstap_fields,
        }
        if cfg["parser"] not in parsers:
            raise TopologyError(
                f"unknown parser {cfg['parser']!r}; one of {sorted(parsers)}"
            )
        fields = parsers[cfg["parser"]](F.col(cfg.get("column", "message")))
        prefix = cfg.get("prefix", "")
        # ONE atomic projection (withColumns): every extracted field is
        # computed against the ORIGINAL row. Sequential withColumn would
        # let an extracted field named like the source column (syslog's
        # `message` body) overwrite it mid-chain and corrupt later fields.
        out = df.withColumns({f"{prefix}{name}": col for name, col in fields.items()})
        emitted = {f"{prefix}{n}" for n in fields}
        src_col = cfg.get("column", "message")
        if cfg.get("drop_column", False) and src_col not in emitted:
            # when an extracted field shares the source column's name
            # (syslog's message body), it already replaced it — keep it
            out = out.drop(src_col)
        return out
    if kind == "netflow":
        # packet-framing decoder (NetflowDecoder, netflow.rs:8-13): one
        # packet row -> N flow-record rows; replaces the event stream like
        # remap's `emit`. version v5/v7 are static layouts (pure exprs),
        # v9/ipfix go through the two-pass template machinery.
        from .functions import parse_netflow, parse_netflow_v5, parse_netflow_v7

        version = cfg.get("version", "v9")
        col = cfg.get("column", "packet")
        if version == "v5":
            return parse_netflow_v5(df, col)
        if version == "v7":
            return parse_netflow_v7(df, col)
        if version in ("v9", "ipfix"):
            if df.isStreaming:
                # the two-pass batch path collects a template map up front,
                # which a streaming plan cannot do — use the stateful
                # template-cache decoder (checkpoint-persistent)
                from .streaming import stream_parse_netflow

                return stream_parse_netflow(df, col)
            return parse_netflow(df, col)
        raise TopologyError(f"unknown netflow version {version!r}")
    if kind == "frames":
        # 1->N frame/batch decoders as a topology stage — the netflow
        # kind generalized to every array-returning decoder in the
        # library (lib/codecs framing + the batch-body source formats):
        # one buffer/body row -> N event rows. String framers emit a
        # `frame` column; struct decoders expand their fields as event
        # columns (one atomic withColumns against the exploded row, the
        # parse-transform convention; `prefix` avoids collisions).
        from .functions import (
            frame_character_delimited,
            frame_docker_stream,
            frame_length_delimited,
            frame_newline_delimited,
            frame_octet_counting,
            frame_warc,
            parse_datadog_logs,
            parse_ecs_metrics,
            parse_eventstoredb_stats,
            parse_heroku_logplex,
            parse_loki_push,
            parse_lumberjack,
            parse_mongodb_server_status,
            parse_native_proto,
            parse_prometheus_remote_write,
            parse_s3_event_notification,
        )

        col = cfg.get("column", "message")
        name = cfg.get("decoder")
        framers: dict[str, Callable] = {
            "newline": frame_newline_delimited,
            "character": lambda c: frame_character_delimited(
                c, cfg.get("delimiter", ",")),
            "octet": frame_octet_counting,
            "length_delimited": lambda c: frame_length_delimited(
                c, cfg.get("prefix_bytes", 4)),
            "warc": frame_warc,
        }
        struct_decoders: dict[str, Callable] = {
            "lumberjack": parse_lumberjack,
            "loki_push": parse_loki_push,
            "heroku_logplex": parse_heroku_logplex,
            "docker_stream": frame_docker_stream,
            "native_proto": parse_native_proto,
            "prometheus_remote_write": parse_prometheus_remote_write,
            "datadog_logs": parse_datadog_logs,
            "s3_notification": parse_s3_event_notification,
            "ecs_metrics": parse_ecs_metrics,
            "eventstoredb_stats": parse_eventstoredb_stats,
            "mongodb_server_status": parse_mongodb_server_status,
        }
        keep = [c for c in df.columns
                if c != col or not cfg.get("drop_column", True)]
        if name in framers:
            return df.select(
                *keep,
                F.posexplode(framers[name](F.col(col))).alias(
                    "frame_idx", cfg.get("frame_column", "frame")),
            )
        if name in struct_decoders:
            ex = df.select(
                *keep,
                F.posexplode(struct_decoders[name](F.col(col))).alias(
                    "frame_idx", "_r"),
            )
            names = ex.schema["_r"].dataType.names
            prefix = cfg.get("prefix", "")
            return ex.withColumns(
                {f"{prefix}{n}": F.col("_r")[n] for n in names}
            ).drop("_r")
        raise TopologyError(
            f"unknown frames decoder {name!r}; one of "
            f"{sorted([*framers, *struct_decoders])}"
        )
    if kind == "merge_partial":
        # the kubernetes_logs partial-event merger as a topology stage
        # (partial_events_merger.rs) — batch window op, or the
        # checkpointed streaming state machine with expiration flush when
        # the input is a stream (the netflow-kind dispatch pattern)
        keys = cfg.get("key_cols", ["file"])
        keys = [keys] if isinstance(keys, str) else list(keys)
        order = cfg.get("order_col", "event_id")
        msg = cfg.get("message_col", "message")
        part = cfg.get("partial_col", "partial")
        if df.isStreaming:
            from .streaming import stream_merge_partial_lines

            return stream_merge_partial_lines(
                df, tuple(keys), order, msg, part,
                expiration_secs=cfg.get("expiration_secs"),
            )
        from .functions import merge_partial_lines

        return merge_partial_lines(df, tuple(keys), order, msg, part)
    if kind == "filter":
        return filter_events(df, cfg["condition"])
    if kind == "route":
        return route_op(df, cfg["routes"], unmatched=cfg.get("unmatched", True))
    if kind == "exclusive_route":
        return exclusive_route(df, cfg["routes"])
    if kind == "enrich":
        dim = tables.get(cfg["table"]) or resolve(cfg["table"])
        if cfg.get("ip_range"):
            from .operators import enrich_ip_range

            r = cfg["ip_range"]
            return enrich_ip_range(
                df, dim, r["ip"],
                start_col=r.get("start", "ip_start"),
                end_col=r.get("end", "ip_end"),
                prefix_bits=r.get("prefix_bits", 16),
                numeric=r.get("numeric", False),
            )
        keys = [tuple(k) for k in cfg["keys"]]
        if cfg.get("between"):
            b = cfg["between"]
            return enrich_between(df, dim, keys[0], ts_col=b["ts"],
                                  from_col=b.get("from", "valid_from"),
                                  to_col=b.get("to", "valid_to"))
        return enrich_equi(df, dim, keys,
                           case_insensitive=cfg.get("case_insensitive", False))
    if kind == "dedupe":
        return dedupe(df, match=cfg.get("match"), ignore=cfg.get("ignore"),
                      order_by=cfg.get("order_by", "event_id"),
                      keep=cfg.get("keep", "first"),
                      lru_window=cfg.get("lru_window", 0))
    if kind == "sample":
        return sample(df, cfg["rate"], key_field=cfg.get("key_field"),
                      exclude=F.expr(cfg["exclude"]) if cfg.get("exclude") else None,
                      method=cfg.get("method", "xxhash"))
    if kind == "reduce":
        merges = {k: tuple(v) for k, v in cfg.get("merge", {}).items()}
        return reduce_sessions(
            df, cfg["group_by"], merges,
            ts_col=cfg.get("ts_col", "ts"),
            gap_secs=cfg.get("gap_secs", 30.0),
            order_col=cfg.get("order_by"),
            starts_when=F.expr(cfg["starts_when"]) if cfg.get("starts_when") else None,
            ends_when=F.expr(cfg["ends_when"]) if cfg.get("ends_when") else None,
            max_events=cfg.get("max_events"),
            end_every_secs=cfg.get("end_every_secs"),
            hot_split=cfg.get("hot_split"),
        )
    if kind == "aggregate":
        vt = cfg.get("value_type")
        common = dict(
            window_secs=cfg.get("window_secs", 10),
            ts_col=cfg.get("ts_col", "ts"),
            series_cols=cfg.get("series"),
            value_col=cfg.get("value_col", "value"),
        )
        if vt == "set":
            from .operators import aggregate_set

            return aggregate_set(df, **common)
        if vt == "histogram":
            from .operators import aggregate_histogram

            return aggregate_histogram(df, cfg["buckets"], **common)
        if vt == "summary":
            from .operators import aggregate_summary

            return aggregate_summary(
                df, cfg.get("quantiles", [0.5, 0.9, 0.99]),
                approx=cfg.get("approx", False), **common,
            )
        if vt == "sketch":
            from .operators import aggregate_sketch

            return aggregate_sketch(
                df, cfg.get("quantiles", [0.5, 0.9, 0.99]),
                eps=cfg.get("eps", 1.0 / 128), **common,
            )
        if vt is not None:
            raise TopologyError(f"unknown aggregate value_type {vt!r}")
        return aggregate_metrics(
            df, cfg.get("mode", "sum"),
            kind_col=cfg.get("kind_col"),
            order_col=cfg.get("order_by"),
            **common,
        )
    if kind == "throttle":
        return throttle(
            df, cfg["threshold"], cfg["window_secs"], cfg["key_cols"],
            ts_col=cfg.get("ts_col", "ts"), order_col=cfg.get("order_by"),
            exclude=F.expr(cfg["exclude"]) if cfg.get("exclude") else None,
        )
    if kind == "log_to_metric":
        if cfg.get("all_metrics"):
            # the reference's all_metrics flag: `metrics` is ignored and
            # metric-shaped logs convert straight back (rs:489-856)
            from .operators import log_to_metric_all

            return log_to_metric_all(
                df, json_col=cfg.get("column", "message"),
                carry=cfg.get("carry"),
            )
        return log_to_metric(df, _as_specs(cfg["metrics"]), carry=cfg.get("carry"))
    if kind == "metric_to_log":
        return metric_to_log(df)
    if kind == "tag_cardinality_limit":
        return tag_cardinality_limit(
            df, cfg["tags"], value_limit=cfg.get("value_limit", 500),
            order_col=cfg.get("order_by", "event_id"),
            action=cfg.get("action", "drop_tag"),
        )
    if kind == "hash_replace":
        return hash_replace(df, cfg["keys"], order_col=cfg.get("order_by", "event_id"))
    if kind == "script":
        # lua-transform analogue (src/transforms/lua/v2/mod.rs): the user
        # hook is a pandas batch function (callable in the spec dict, or a
        # "module:function" dotted path for YAML configs), declared output
        # schema, 0..N emit; group_key enables per-key state (lua GLOBAL)
        from .operators.script import script_transform

        fn = cfg["function"]
        if isinstance(fn, str):
            import importlib

            mod, _, name = fn.partition(":")
            fn = getattr(importlib.import_module(mod), name)
        return script_transform(
            df, fn, cfg["schema"],
            init=cfg.get("init"), group_key=cfg.get("group_key"))
    raise TopologyError(f"unknown transform type {kind!r}")
