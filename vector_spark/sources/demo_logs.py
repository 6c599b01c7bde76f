"""demo_logs source — deterministic synthetic log lines in the reference's
generator formats.

Reference: /root/reference/src/sources/demo_logs.rs:47-170 — formats
ApacheCommon, ApacheError, Syslog (RFC5424), BsdSyslog (RFC3164), Json,
with configurable count. Our version is a pure function of (seed, row id)
over spark.range — distributed, no driver loops, reproducible at any
partitioning (same contract as sources/pages.py).

Round-trip property used by tests and the driver contract: every format
here is parseable by the corresponding functions/parse.py parser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FORMATS = ("apache_common", "apache_error", "syslog", "bsd_syslog", "json",
           "shuffle", "sample_file")

_METHODS = ["GET", "POST", "PUT", "DELETE", "HEAD"]
_PATHS = ["/index.html", "/api/v1/users", "/static/app.js", "/login", "/health"]
_STATUSES = [200, 201, 301, 400, 404, 500, 503]
_HOSTS = ["alpha", "bravo", "charlie", "delta"]
_APPS = ["nginx", "sshd", "cron", "app"]
_MESSAGES = [
    "connection established", "request completed", "cache miss",
    "retrying upstream", "session expired",
]


def _pick(seed: int, arr: list) -> Column:
    idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(len(arr)))
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx + 1).cast("int"))


def demo_logs(
    spark: SparkSession,
    n: int,
    fmt: str = "syslog",
    seed: int = 42,
    partitions: int | None = None,
    lines: list[str] | None = None,
    sequence: bool = False,
    sample_path: str | None = None,
    time_format: str = "%Y-%m-%d %H:%M:%S",
) -> DataFrame:
    """(id long, ts timestamp, line string) in the requested format.

    `shuffle` (demo_logs.rs:145-152, 258-267): each output line is one of
    `lines` (deterministic pick standing in for the reference's
    rand::choose), prefixed with the generation index when
    `sequence=True`; an empty list raises (ShuffleDemoLogsItemsEmpty).
    `sample_file` (demo_logs.rs:134-144, 197-246): `sample_path` is a
    two-column CSV of (time_prefix, time_suffix) rows chosen ROUND-ROBIN
    by generation index, with the event timestamp strftime-formatted via
    `time_format` spliced between them; empty file / empty time_format
    raise (SampleFileDemoLogsEmpty / SampleFileTimeFormatEmpty). The CSV
    is config-sized and read once driver-side (the reference's
    build_gen_ctx), then embedded as a literal array — the generator
    itself stays a pure distributed function of the row id."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumn("_seq", F.col("id"))
    df = df.withColumn("id", F.xxhash64(F.col("id"), F.lit(seed)) % F.lit(2**40))
    ts = F.timestamp_seconds(
        F.lit(1_700_000_000) + F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(86400))
    )
    ip = F.format_string(
        "10.%d.%d.%d",
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(256)).cast("int"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(256)).cast("int"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(256)).cast("int"),
    )
    host = _pick(5, _HOSTS)
    app = _pick(6, _APPS)
    method, path = _pick(7, _METHODS), _pick(8, _PATHS)
    status = _pick(9, _STATUSES)
    size = F.pmod(F.xxhash64("id", F.lit(10)), F.lit(50_000))
    pri = F.pmod(F.xxhash64("id", F.lit(11)), F.lit(192)).cast("int")
    pid = F.pmod(F.xxhash64("id", F.lit(12)), F.lit(65536)).cast("int")
    msg = _pick(13, _MESSAGES)

    if fmt == "shuffle":
        if not lines:
            raise ValueError(
                "a non-empty list of lines is required for the shuffle format"
            )
        picked = F.element_at(
            F.array(*[F.lit(x) for x in lines]),
            (F.pmod(F.xxhash64("id", F.lit(16)), F.lit(len(lines))) + 1).cast("int"),
        )
        line = (
            F.format_string("%d %s", F.col("_seq"), picked)
            if sequence else picked
        )
        return df.select("id", ts.alias("ts"), line.alias("line"))
    if fmt == "sample_file":
        import csv

        from ..functions.vrl import _strftime_lit

        if not time_format:
            raise ValueError(
                "a non-empty time format is required for sample file format"
            )
        if not sample_path:
            raise ValueError(
                "a sample_path is required for sample file format"
            )
        with open(sample_path, newline="") as fh:
            data = [(row[0] if row else "", row[1] if len(row) > 1 else "")
                    for row in csv.reader(fh)]
        if not data:
            raise ValueError(
                "a non-empty sample log file is required for sample file format"
            )
        df = df.withColumn("_ts", ts)
        pick = F.element_at(
            F.array(*[
                F.struct(F.lit(p).alias("p"), F.lit(s).alias("s"))
                for p, s in data
            ]),
            (F.pmod(F.col("_seq"), F.lit(len(data))) + 1).cast("int"),
        )
        line = F.concat(
            pick["p"], _strftime_lit(time_format, "_ts"), pick["s"]
        )
        return df.select("id", F.col("_ts").alias("ts"), line.alias("line"))
    if fmt == "apache_common":
        line = F.format_string(
            '%s - user%d [%s] "%s %s HTTP/1.1" %d %d',
            ip, F.pmod(F.xxhash64("id", F.lit(14)), F.lit(100)).cast("int"),
            F.date_format(ts, "dd/MMM/yyyy:HH:mm:ss Z"),
            method, path, status, size,
        )
    elif fmt == "apache_error":
        line = F.format_string(
            "[%s] [error] [client %s] %s",
            F.date_format(ts, "EEE MMM dd HH:mm:ss yyyy"), ip, msg,
        )
    elif fmt == "syslog":  # RFC5424
        line = F.format_string(
            "<%d>1 %s %s %s %d ID%d - %s",
            pri, F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            host, app, pid, F.pmod(F.xxhash64("id", F.lit(15)), F.lit(1000)).cast("int"), msg,
        )
    elif fmt == "bsd_syslog":  # RFC3164
        line = F.format_string(
            "<%d>%s %s %s[%d]: %s",
            pri, F.date_format(ts, "MMM dd HH:mm:ss"), host, app, pid, msg,
        )
    else:  # json
        line = F.to_json(
            F.struct(
                ts.cast("string").alias("timestamp"),
                host.alias("host"),
                app.alias("service"),
                status.alias("status"),
                msg.alias("message"),
            )
        )
    return df.select("id", ts.alias("ts"), line.alias("line"))
