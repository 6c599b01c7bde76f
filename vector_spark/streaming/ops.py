"""Structured Streaming variants of the stateful operators.

The reference is a continuous-stream engine; its stateful transforms flush
on wall-clock (aggregate interval_ms, reduce expire_after_ms, throttle
window) — processing-time semantics with no watermarks (SURVEY.md §2.9).
Our batch operators re-base those onto event time for determinism; this
module provides the continuous counterparts on readStream:

  * stream_aggregate    — tumbling event-time window + watermark
                          (transforms/aggregate.rs:109-320 re-based)
  * stream_dedupe       — dropDuplicatesWithinWatermark on the match keys
                          (transforms/dedupe/transform.rs bounded cache;
                          the watermark horizon plays the LRU role)
  * stream_reduce_sessions — session_window(gap) grouping
                          (transforms/reduce expire_after_ms semantics)
  * stream_throttle     — applyInPandasWithState token-count per
                          (key, window) (transforms/throttle.rs GCRA),
                          Arrow-batched state updates, no per-row Python
                          at the Spark level
  * stream_pages_pipeline — the full north-rule topology as a streaming
                          query (parse/enrich are stateless and reuse the
                          batch column logic verbatim)

Batch is the correctness anchor: each of these, run with
trigger(availableNow=True) over a bounded source, must equal its batch
twin — that equivalence is what tests/test_streaming.py asserts and what
lets the DuckDB oracle check streaming results too.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_aggregate(
    df: DataFrame,
    mode: str,
    window_secs: int,
    ts_col: str = "ts",
    series_cols: list[str] | None = None,
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time aggregate with late-data watermark."""
    series_cols = series_cols or ["name"]
    agg = {
        "sum": F.sum(value_col),
        "count": F.count(value_col).cast("double"),
        "max": F.max(value_col),
        "min": F.min(value_col),
        "mean": F.avg(value_col),
        "stdev": F.stddev_pop(value_col),
    }[mode]
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, f"{window_secs} seconds"), *series_cols)
        .agg(agg.alias("agg_value"))
    )
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        *series_cols,
        "agg_value",
    )


def stream_dedupe(
    df: DataFrame,
    match: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first event per match-key within the watermark horizon.
    The horizon bounds state exactly like the reference's LRU cache bounds
    its memory (dedupe/mod.rs:24-28) — a time bound instead of a count."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(match)


def stream_reduce_sessions(
    df: DataFrame,
    group_by: list[str],
    gap_secs: float,
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-gap collapse via session_window — the streaming twin of
    reduce_sessions (sum/count merges; first/last need the batch path)."""
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, f"{int(gap_secs)} seconds"), *group_by)
        .agg(
            F.count(F.lit(1)).alias("events_merged"),
            F.sum(value_col).alias("value_sum"),
        )
    )
    return out.select(
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        *group_by,
        "events_merged",
        "value_sum",
    )


def _py(v):
    """numpy/pandas scalar -> plain JSON-serializable Python value."""
    if v is None:
        return None
    if hasattr(v, "item"):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_py(x) for x in v]
    return v


def _merge_step(partial: dict, col: str, strategy: str, v):
    """Fold one event's value into the per-session partial for `col` —
    the streaming counterpart of each MERGE_STRATEGIES aggregate
    (operators/reduce.py:26-46; reference merge_strategy.rs:17-62)."""
    v = _py(v)
    if strategy == "discard":
        partial.setdefault(col, v)
    elif strategy == "retain":
        partial[col] = v
    elif strategy == "sum":
        partial[col] = (partial.get(col) or 0) + (v or 0)
    elif strategy == "max":
        if v is not None and (col not in partial or v > partial[col]):
            partial[col] = v
    elif strategy == "min":
        if v is not None and (col not in partial or v < partial[col]):
            partial[col] = v
    elif strategy == "count":
        partial[col] = partial.get(col, 0) + (0 if v is None else 1)
    elif strategy in ("array", "concat", "concat_newline", "concat_raw"):
        if v is not None:
            partial.setdefault(col, []).append(v)
    elif strategy == "flat_unique":
        acc = partial.setdefault(col, [])
        for x in v or []:
            if x not in acc:
                acc.append(x)
    elif strategy == "shortest_array":
        if v is not None and (col not in partial or len(v) < len(partial[col])):
            partial[col] = v
    elif strategy == "longest_array":
        if v is not None and (col not in partial or len(v) > len(partial[col])):
            partial[col] = v
    else:
        raise ValueError(f"unknown merge strategy: {strategy}")


_CONCAT_SEP = {"concat": " ", "concat_newline": "\n", "concat_raw": ""}


def _merge_final(partial: dict, col: str, strategy: str):
    v = partial.get(col)
    if strategy in _CONCAT_SEP:
        return _CONCAT_SEP[strategy].join(str(x) for x in (v or []))
    if strategy == "array" and v is None:
        return []
    return v


def stream_reduce_merges(
    df: DataFrame,
    group_by: list[str],
    gap_secs: float,
    merges: dict[str, tuple[str, str]],
    types: dict[str, str] | None = None,
    ts_col: str = "ts",
    max_events: int | None = None,
    end_every_secs: float | None = None,
) -> DataFrame:
    """Full-merge-parity streaming reduce — the continuous twin of
    reduce_sessions with ALL 13 merge strategies (discard/retain/sum/max/
    min/count/array/concat x3/flat_unique/shortest/longest_array), plus
    max_events and end_every_secs cyclic flushes
    (reduce/transform.rs:155-310, merge_strategy.rs:17-62).

    merges: {out_col: (strategy, in_col)}; types: {out_col: spark type
    string} for non-string outputs (default string). State per group =
    (session_start_us, chunk_start_us, last_us, count, partial-merge JSON)
    in applyInPandasWithState — the partial is exactly the per-session
    accumulator the reference's ReduceState holds, so memory is bounded by
    the open session (max_events bounds it hard). Completed chunks emit
    per micro-batch; the open chunk survives restarts in the streaming
    checkpoint. The whole per-group micro-batch is materialized + sorted
    before the event loop (Arrow chunks are not mutually ordered); late
    data across micro-batches follows at-arrival semantics.

    Output: group keys, session_start_us, ts_end_us (epoch-us of the
    chunk's first/last event — the batch twin's ts/ts_end), events_merged,
    then one column per merge. Equality with reduce_sessions under
    trigger(availableNow) is asserted in tests/test_streaming.py."""
    import json

    import pandas as pd

    types = types or {}
    key_schema = ", ".join(f"{k} string" for k in group_by)
    merge_schema = ", ".join(f"{c} {types.get(c, 'string')}" for c in merges)
    out_schema = (
        f"{key_schema}, session_start_us long, ts_end_us long, "
        f"events_merged int, {merge_schema}"
    )
    state_schema = "sess_us long, chunk_us long, last_us long, n int, partial string"
    gap_us = int(gap_secs * 1_000_000)
    period_us = int(end_every_secs * 1_000_000) if end_every_secs else None
    in_cols = [ic for _, ic in merges.values()]

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.exists:
            sess, chunk, last, n, pjson = state.get
            partial = json.loads(pjson) if pjson else {}
        else:
            sess, chunk, last, n, partial = None, None, None, 0, {}
        rows = []

        def flush(new_session: bool):
            nonlocal sess, chunk, last, n, partial
            if n:
                rows.append(
                    (*key, chunk, last, n,
                     *[_merge_final(partial, c, s) for c, (s, _) in merges.items()])
                )
            chunk, n, partial = None, 0, {}
            if new_session:
                sess, last = None, None

        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames).sort_values(ts_col)
            for row in pdf.itertuples(index=False):
                ts = getattr(row, ts_col)
                us = int(ts.timestamp() * 1_000_000)
                # gap detection keys off `last`, not `n`: a chunk flush
                # (max_events / period) leaves n==0 but the session open
                if last is not None and (us - last > gap_us):
                    flush(new_session=True)
                if period_us and sess is not None and chunk is not None:
                    # cyclic flush: period index measured from the
                    # SESSION's first event (batch _chunk_t semantics)
                    if (us - sess) // period_us != (chunk - sess) // period_us:
                        flush(new_session=False)
                if sess is None:
                    sess = us
                if chunk is None:
                    chunk = us
                last = us
                n += 1
                for out_col, (strategy, in_col) in merges.items():
                    _merge_step(partial, out_col, strategy, getattr(row, in_col))
                if max_events and n >= max_events:
                    flush(new_session=False)
        # keep state whenever a session is open, even with an empty chunk
        # (n==0 right after a max_events/period flush): gap detection and
        # the period anchor must survive into the next micro-batch
        if n or sess is not None:
            state.update((sess, chunk, last, n, json.dumps(partial)))
        else:
            state.remove()
        yield pd.DataFrame(
            rows,
            columns=[*group_by, "session_start_us", "ts_end_us",
                     "events_merged", *merges],
        )

    return df.groupBy(*group_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_reduce_max_events(
    df: DataFrame,
    group_by: list[str],
    gap_secs: float,
    max_events: int | None = None,
    end_every_secs: float | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of reduce_sessions(max_events=N, end_every_secs=P)
    with a sum merge — kept as the contract-query surface; a thin wrapper
    over stream_reduce_merges (the full-parity engine)."""
    out = stream_reduce_merges(
        df, group_by, gap_secs,
        merges={"value_sum": ("sum", value_col)},
        types={"value_sum": "double"},
        ts_col=ts_col, max_events=max_events, end_every_secs=end_every_secs,
    )
    return out.select(*group_by, "session_start_us", "events_merged", "value_sum")


def stream_throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Token-count rate limiter with explicit state: at most `threshold`
    events pass per (key, tumbling window). State = events admitted in the
    current window; Arrow-batched via applyInPandasWithState."""
    import pandas as pd

    key_schema = ", ".join(f"{k} string" for k in key_cols)
    out_schema = f"{key_schema}, ts timestamp, admitted int"
    state_schema = "win long, used int"

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        win, used = state.get if state.exists else (-1, 0)
        rows = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            # one sort over the whole per-group micro-batch: Arrow chunk
            # boundaries (~10k rows) are not ordered relative to each other
            for ts in pd.concat(frames).sort_values(ts_col)[ts_col]:
                w = int(ts.timestamp()) // window_secs
                if w != win:
                    win, used = w, 0
                if used < threshold:
                    used += 1
                    rows.append((*key, ts, used))
        state.update((win, used))
        yield pd.DataFrame(rows, columns=[*key_cols, ts_col, "admitted"])

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_hash_replace(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming hash_replace (transforms/hash_replace/mod.rs:161-236):
    first occurrence of a value per key keeps the raw payload, repeats keep
    only the md5. State = the set of seen value-hashes per key (the Cuckoo-
    filter role), carried across micro-batches via applyInPandasWithState."""
    import hashlib

    import pandas as pd

    key_schema = ", ".join(f"{k} string" for k in key_cols)
    out_schema = f"{key_schema}, {ts_col} timestamp, {value_col} string, {value_col}_hash string"
    state_schema = "seen array<string>"

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        rows = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames).sort_values(ts_col)
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                h = hashlib.md5(str(val).encode()).hexdigest()
                rows.append((*key, ts, None if h in seen else val, h))
                seen.add(h)
        state.update((list(seen),))
        yield pd.DataFrame(rows, columns=[*key_cols, ts_col, value_col, f"{value_col}_hash"])

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    value_limit: int,
    key_cols: list[str],
    ts_col: str = "ts",
    action: str = "drop_tag",
) -> DataFrame:
    """Streaming tag_cardinality_limit (tag_cardinality_limit/config.rs:
    18-100): per group, accept only the first `value_limit` distinct tag
    values ever seen (across micro-batches); on exceed either null the tag
    (drop_tag) or drop the event (drop_event)."""
    import pandas as pd

    key_schema = ", ".join(f"{k} string" for k in key_cols)
    out_schema = f"{key_schema}, {ts_col} timestamp, {tag_col} string"
    state_schema = "allowed array<string>"

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        allowed = list(state.get[0]) if state.exists else []
        allow_set = set(allowed)
        rows = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames).sort_values(ts_col)
            for ts, tag in zip(pdf[ts_col], pdf[tag_col]):
                if tag in allow_set:
                    rows.append((*key, ts, tag))
                elif len(allowed) < value_limit:
                    allowed.append(tag)
                    allow_set.add(tag)
                    rows.append((*key, ts, tag))
                elif action == "drop_tag":
                    rows.append((*key, ts, None))
                # drop_event: emit nothing
        state.update((allowed,))
        yield pd.DataFrame(rows, columns=[*key_cols, ts_col, tag_col])

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_parse_netflow(df: DataFrame, packet_col: str = "packet") -> DataFrame:
    """Continuous NetFlow v9/IPFIX decoding with a PERSISTENT template
    cache — the reference's actual model (NetflowDecoder holds a mutable
    NetflowParser per connection, netflow.rs:72-95): templates seen in any
    micro-batch decode data packets in every later batch, surviving
    restarts in the streaming checkpoint.

    The exporter key (version, source_id/observation_domain) is sliced out
    of the packet header with pure hex exprs — no Python before the
    groupBy — so template state shards across exporters exactly like the
    reference shards parsers across connections. Within a batch, packets
    process in export-time order (template refresh before later data).
    Data sets with no known template emit the visible null-fields row."""
    import json

    import pandas as pd

    from ..functions.netflow import (
        RECORD_SCHEMA,
        VARLEN,
        _field_name,
        _parse_options_templates,
        _parse_templates,
        _render,
        _render_varlen,
        _walk_packet,
    )

    hx = F.lower(F.hex(F.col(packet_col)))
    version = F.conv(F.substring(hx, 1, 4), 16, 10).cast("int")
    source_id = F.when(
        version == 9, F.conv(F.substring(hx, 33, 8), 16, 10)
    ).when(version == 10, F.conv(F.substring(hx, 25, 8), 16, 10)).cast("long")
    keyed = df.select(
        version.alias("_v"), source_id.alias("_sid"), F.col(packet_col)
    ).filter(F.col("_v").isin(9, 10))

    state_schema = "tmpl string"

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        tmpl: dict = json.loads(state.get[0]) if state.exists else {}
        rows = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames)
            # order by export time so a template refresh precedes the data
            # that follows it (the arrival-order proxy available in batch)
            pkts = sorted(
                (bytes(p) for p in pdf[packet_col] if p is not None),
                key=lambda b: int.from_bytes(
                    b[8:12] if b[0:2] == b"\x00\x09" else b[4:8], "big"
                ),
            )
            for raw in pkts:
                for ver, et, sid, set_id, payload in _walk_packet(raw):
                    if (ver == 9 and set_id == 0) or (ver == 10 and set_id == 2):
                        for tid, ids, lens, ens, scopes in _parse_templates(ver, payload):
                            tmpl[str(tid)] = [ids, lens, ens, scopes]
                        continue
                    if (ver == 9 and set_id == 1) or (ver == 10 and set_id == 3):
                        for tid, ids, lens, ens, scopes in _parse_options_templates(ver, payload):
                            tmpl[str(tid)] = [ids, lens, ens, scopes]
                        continue
                    if set_id < 256:
                        continue
                    spec = tmpl.get(str(set_id))
                    if spec is None:
                        rows.append((ver, et, sid, set_id, 0, None))
                        continue
                    ids, lens, ens, scopes = spec
                    names = [
                        _field_name(i_, e_, s_)
                        for i_, e_, s_ in zip(ids, ens, scopes)
                    ]
                    rec_idx, i = 0, 0
                    if VARLEN not in lens:
                        rec_size = sum(lens)
                        if rec_size == 0:
                            continue
                        while i + rec_size <= len(payload):
                            fields, j = {}, i
                            for name, ie_id, flen, en in zip(names, ids, lens, ens):
                                fields[name] = _render(ie_id, en, payload[j : j + flen])
                                j += flen
                            rows.append((ver, et, sid, set_id, rec_idx, fields))
                            i, rec_idx = j, rec_idx + 1
                    else:
                        min_size = sum(l if l != VARLEN else 1 for l in lens)
                        while len(payload) - i >= min_size:
                            if len(payload) - i <= 3 and not any(payload[i:]):
                                break
                            fields, j, ok = {}, i, True
                            for name, ie_id, flen, en in zip(names, ids, lens, ens):
                                if flen == VARLEN:
                                    ln = payload[j]
                                    j += 1
                                    if ln == 255:
                                        ln = int.from_bytes(payload[j : j + 2], "big")
                                        j += 2
                                    if j + ln > len(payload):
                                        ok = False
                                        break
                                    fields[name] = _render_varlen(payload[j : j + ln])
                                    j += ln
                                else:
                                    if j + flen > len(payload):
                                        ok = False
                                        break
                                    fields[name] = _render(ie_id, en, payload[j : j + flen])
                                    j += flen
                            if not ok:
                                break
                            rows.append((ver, et, sid, set_id, rec_idx, fields))
                            i, rec_idx = j, rec_idx + 1
        state.update((json.dumps(tmpl),))
        yield pd.DataFrame(
            rows,
            columns=["version", "export_time", "source_id", "template_id",
                     "rec_idx", "fields"],
        )

    return keyed.groupBy("_v", "_sid").applyInPandasWithState(
        fn, RECORD_SCHEMA, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_route_to_sinks(
    df: DataFrame,
    conditions: dict,
    sink_dir: str,
    checkpoint_dir: str,
    partition_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Streaming multi-sink fan-out — the reference's core topology shape
    (sources -> route -> N sinks, splunk_hec_route_s3 regression case):
    each micro-batch is routed (multi-match copy semantics) and written in
    ONE pass partitioned by route (+ optional template-style partition
    cols), so adding sinks costs nothing extra.

    Exactly-once: foreachBatch alone is at-least-once (a crash between the
    batch write and the streaming-checkpoint commit replays the batch on
    restart). We make the replay idempotent by keying every write on the
    deterministic `batch_id` Structured Streaming hands foreachBatch: each
    batch lands in its own `_batch=<id>` partition via DYNAMIC overwrite, so
    a replayed batch atomically replaces its previous (possibly partial)
    output instead of appending duplicates — write-idempotence + checkpoint
    resume = end-to-end exactly-once, the same redo-into-own-partition
    protocol as runtime/checkpoint.py. Returns the started StreamingQuery
    (availableNow by default: drain-and-stop, the testable mode; pass
    available_now=False for continuous).
    """
    part_cols = ["_batch", "route", *(partition_cols or [])]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.route import routed_union

        routed = routed_union(batch_df, conditions).withColumn("_batch", F.lit(batch_id))
        (
            routed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(sink_dir)
        )

    writer = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_pages_pipeline(
    pages: DataFrame,
    geo: DataFrame,
    lang: DataFrame,
    window_secs: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming parse -> enrich -> route -> windowed aggregate; the
    stateless stages reuse the exact batch logic (same Column exprs)."""
    from ..plans.pages import parse_pages, PAGE_ROUTES
    from ..operators.route import routed_union

    parsed = parse_pages(pages)
    enriched = parsed.join(broadcast(geo), "tld", "left").join(
        broadcast(lang), "lang", "left"
    )
    routed = routed_union(enriched, PAGE_ROUTES)
    out = (
        routed.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", f"{window_secs} seconds"), "route", "geo_region")
        .agg(F.count(F.lit(1)).alias("events"), F.sum("html_bytes").alias("bytes"))
    )
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        "route", "geo_region", "events", "bytes",
    )


def stream_incremental_dedup(
    delta: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    near: bool = False,
    num_hashes: int = 6,
    band_size: int = 2,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Streaming twin of datapipe.incremental_dedup: a stream of new docs
    LEFT-joins (stream-static, append-safe, no watermark needed) the batch
    corpus's md5 -> min(id) lookup; `near=True` adds the MINHASH tier with
    the identical hash family (dedup.band_key_cols), exact tier taking
    precedence — closing VERDICT_r3 item 4.

    The near tier avoids any streaming-side aggregation (which would need
    watermark state): the STATIC side pre-aggregates each LSH bucket into
    a candidate list (band_key -> [(corpus id, shingles)...], the LSH
    index table a production pipeline maintains), the stream row does one
    stateless stream-static LEFT join PER BAND on its band-key column, and
    the per-doc "min matching corpus id" collapses to a narrow expression
    fold over the concatenated candidate arrays — exact-Jaccard verify and
    argmin inside the row, ZERO streaming state. Hot buckets inflate the
    static index rows, not stream state; production caps them when
    building the index (same knob as minhash_lsh_pairs' AQE note).

    At scale the static side is the maintained dedup-lookup/index table;
    Spark re-plans it per micro-batch, picking up corpus updates between
    batches."""
    from ..datapipe.dedup import band_key_cols, shingle_docs

    dh = F.md5(F.col(text_col).cast("binary"))
    lookup = (
        corpus.select(dh.alias("_h"), F.col(id_col).alias("_cid"))
        .groupBy("_h")
        .agg(F.min("_cid").alias("_ex"))
    )
    if not near:
        return (
            delta.select(F.col(id_col).alias("_did"), dh.alias("_h"))
            .join(lookup, "_h", "left")
            .select(
                F.col("_did").alias(id_col),
                F.col("_ex").isNull().alias("novel"),
                F.col("_ex").alias("dup_of"),
            )
        )

    n_bands = num_hashes // band_size
    c_sh = shingle_docs(corpus, text_col, shingle_n)
    c_bands = band_key_cols(c_sh, num_hashes, band_size)
    # the static LSH index: one row per (band_key) with its candidate list;
    # array_distinct on the key side mirrors _band_buckets (a doc whose
    # bands collide lands in the bucket once)
    index = (
        corpus.select(
            F.col(id_col).alias("_cid"),
            c_sh.alias("_csh"),
            F.explode(F.array_distinct(F.array(*c_bands))).alias("_bk"),
        )
        .groupBy("_bk")
        .agg(F.collect_list(F.struct("_cid", "_csh")).alias("_cands"))
    )

    d_sh = shingle_docs(delta, text_col, shingle_n)
    d_bands = band_key_cols(d_sh, num_hashes, band_size)
    out = delta.select(
        F.col(id_col).alias("_did"),
        dh.alias("_h"),
        d_sh.alias("_sh"),
        *[b.alias(f"_k{i}") for i, b in enumerate(d_bands)],
    ).join(lookup, "_h", "left")
    for i in range(n_bands):
        idx_i = index.select(
            F.col("_bk").alias(f"_k{i}"), F.col("_cands").alias(f"_cands{i}")
        )
        out = out.join(idx_i, f"_k{i}", "left")
    all_cands = F.flatten(
        F.filter(
            F.array(*[F.col(f"_cands{i}") for i in range(n_bands)]),
            lambda c: c.isNotNull(),
        )
    )

    def _verify_min(acc, c):
        inter = F.size(F.array_intersect(F.col("_sh"), c["_csh"])).cast("double")
        union = (F.size("_sh") + F.size(c["_csh"])).cast("double") - inter
        hit = F.round(inter / union, 4) >= threshold
        better = hit & (acc.isNull() | (c["_cid"] < acc))
        return F.when(better, c["_cid"]).otherwise(acc)

    near_min = F.aggregate(all_cands, F.lit(None).cast("long"), _verify_min)
    dup = F.coalesce(F.col("_ex"), near_min)
    return out.select(
        F.col("_did").alias(id_col), dup.isNull().alias("novel"), dup.alias("dup_of")
    )


def stream_bloom_probe(
    delta: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Streaming twin of datapipe.bloom_filter_probe: each streamed doc is
    checked against the BATCH-built Bloom word table. The batch twin
    explodes positions and groupBy-folds per id — a streaming aggregation
    that would need watermark state — so the twin restructures: one
    stateless stream-static LEFT join per hash index i (k small, default
    5), each attaching word_bits_i to the row, with the all-k-bits-set
    fold evaluated in-row. Zero streaming state, no watermark. Corpus
    updates between micro-batches are picked up because Spark re-plans the
    static side per batch (same property stream_incremental_dedup relies
    on).

    Scale: k broadcast-hash joins against a <=m/63-row static table; text
    never leaves the scan."""
    from ..datapipe.dedup import _bloom_positions

    out = delta.select(
        F.col(id_col), F.col(text_col),
        _bloom_positions(F.col(text_col), k, m_bits).alias("_ps"),
    )
    hit_cols = []
    for i in range(k):
        pos = F.element_at("_ps", i + 1)
        out = out.withColumn(f"_w{i}", (pos / 63).cast("long")) \
                 .withColumn(f"_m{i}", F.expr(
                     f"shiftleft(CAST(1 AS BIGINT), CAST(element_at(_ps, {i + 1}) % 63 AS INT))"))
        side = bloom.select(F.col("word_idx").alias(f"_w{i}"),
                            F.col("word_bits").alias(f"_b{i}"))
        out = out.join(F.broadcast(side), f"_w{i}", "left")
        hit_cols.append(
            F.col(f"_b{i}").isNotNull()
            & (F.col(f"_b{i}").bitwiseAND(F.col(f"_m{i}")) == F.col(f"_m{i}")))
    maybe = hit_cols[0]
    for h in hit_cols[1:]:
        maybe = maybe & h
    return out.select(F.col(id_col), maybe.alias("maybe_dup"))


def stream_hll_sketch(
    df: DataFrame, value_col: str, p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming twin of datapipe.freq.hll_sketch: maintain the 2^p-row
    register table over an unbounded stream. State is a bounded
    max-per-bucket aggregation — at most 2^p rows when ungrouped, so no
    watermark is needed there. Registers only grow, so every update is
    monotone and restart-safe.

    Sink contract: run with outputMode('complete'), or 'update' ONLY
    into a keyed upsert sink (foreachBatch MERGE on the register key).
    'update' into an append-style sink (parquet/file) accumulates stale
    duplicate bucket rows and hll_estimate would silently over-count
    n_present — the estimator assumes one row per register key.

    With group_cols the state is groups x 2^p rows; for TIME-DERIVED
    group columns (the hll_windowed twin) that grows by one register
    group per window forever — emit closed windows and compact (e.g.
    foreachBatch upsert + retention delete), or bound the key space,
    before running such a query unboundedly."""
    from ..datapipe.freq import hll_sketch as _batch

    # the batch builder is pure column expressions over one groupBy —
    # structurally valid on a streaming DataFrame as-is; re-use it so the
    # register math can never drift between batch and stream
    return _batch(df, value_col, p, group_cols=group_cols)


def stream_count_min(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 2048,
) -> DataFrame:
    """Streaming twin of datapipe.freq.count_min_build: rolling frequency
    cells over an unbounded stream. Bounded state (<= depth*width rows),
    no watermark; outputMode('complete'), or 'update' only into a keyed
    upsert sink (same contract as stream_hll_sketch — append-style sinks
    accumulate stale duplicate cells). Counts are additive, so
    micro-batch increments fold exactly — the streaming table equals the
    batch sketch over the same prefix (equality-tested)."""
    from ..datapipe.freq import count_min_build as _batch

    return _batch(df, value_col, depth, width)


def stream_script_stateful(
    df: DataFrame,
    fn,
    key_cols: list[str],
    out_schema: str,
) -> DataFrame:
    """Streaming twin of operators.script.script_transform — the full lua
    analogue (src/transforms/lua/v2/mod.rs): a user hook with PERSISTENT
    per-key state across micro-batches and restarts.

    The hook is `fn(key_tuple, pdf, state_dict) -> (out_pdf, new_state)`:
    it receives one key's micro-batch as a pandas DataFrame plus that
    key's state as a plain dict, emits 0..N rows against `out_schema`,
    and returns the updated state. State is carried as a JSON document in
    the checkpoint (the same generic-state discipline as
    stream_reduce_merges), so it survives restarts and is inspectable —
    the distributed-correct form of lua's script GLOBAL: one state per
    key, never one mutable global across 1000 executors.

    Scale: state volume = keys x state size, partitioned by key like any
    stateful streaming op; the hook only ever sees one key's batch."""
    import json as _json

    import pandas as pd

    def wrapper(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        frames = [p for p in pdfs if len(p)]
        if not frames:
            # no events for this key this micro-batch (timeout-less ops
            # shouldn't be called, but stay lua-faithful: no events -> the
            # hook doesn't run, state untouched)
            return
        st = _json.loads(state.get[0]) if state.exists else {}
        out, new_st = fn(key, pd.concat(frames), st)
        state.update((_json.dumps(new_st, sort_keys=True),))
        if out is not None and len(out):
            yield out

    return df.groupBy(*key_cols).applyInPandasWithState(
        wrapper, out_schema, "state_json string", "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_multiline(
    df: DataFrame,
    start_pattern: str,
    condition_pattern: str | None = None,
    mode: str = "continue_through",
    key_cols: list[str] | str = "host",
    order_col: str = "event_id",
    line_col: str = "line",
    join_with: str = "\n",
    timeout_secs: float | None = None,
) -> DataFrame:
    """Streaming twin of operators.multiline.multiline_agg — the reference's
    line_agg state machine run continuously per source key, with the open
    buffer held in the streaming checkpoint across micro-batches and
    restarts (lib/vector-common/src/multiline/line_agg.rs:120-215: one
    `Logic` per source with a stashed buffer and a wall-clock timeout).

    All four modes follow the exact occupied/vacant rules of the batch
    operator (see operators/multiline.py — incl. EndExclude re-processing
    and the opener-never-condition-checked vacant rule). The one semantics
    the batch twin cannot express is carried here: `timeout_secs` is the
    reference's `timeout_ms` (line_agg.rs:64-79) — a buffer idle past the
    timeout flushes on its own via ProcessingTimeTimeout, instead of only
    at end-of-input. With timeout_secs=None the open buffer waits for data
    (NoTimeout), which is what makes availableNow runs deterministic and
    equal to the batch twin on closed buffers.

    Start/condition matching runs JVM-side (rlike BEFORE the shuffle); the
    pandas fold consumes precomputed booleans plus the line text it must
    buffer. Within a micro-batch lines are sorted by `order_col`; across
    micro-batches at-arrival semantics apply (the stream_reduce_merges
    discipline). Scale: state volume = open buffers x buffered text,
    partitioned by source key — the same bound as the reference's per-file
    Logic map."""
    import json as _json

    import pandas as pd

    from vector_spark.operators.multiline import MODES

    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cond = condition_pattern if condition_pattern is not None else start_pattern

    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_schema = ", ".join(f"{k} {by_name[k]}" for k in keys)
    out_schema = (
        f"{key_schema}, {line_col} string, first_{order_col} {by_name[order_col]}, "
        f"last_{order_col} {by_name[order_col]}, n_lines long"
    )
    # first/last carry the order column's own type (timestamp order columns
    # are the common case per the batch twin); n_lines is long like F.count
    state_schema = (
        f"buf string, first {by_name[order_col]}, "
        f"last {by_name[order_col]}, n long"
    )

    flagged = df.select(
        *keys,
        order_col,
        line_col,
        F.coalesce(F.col(line_col).rlike(start_pattern), F.lit(False)).alias("_s"),
        F.coalesce(F.col(line_col).rlike(cond), F.lit(False)).alias("_c"),
    )
    out_cols = [*keys, line_col, f"first_{order_col}", f"last_{order_col}", "n_lines"]

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.exists:
            buf_json, first, last, n = state.get
            buf = _json.loads(buf_json)
        else:
            buf, first, last, n = [], None, None, 0
        open_ = n > 0
        rows = []

        def emit():
            nonlocal buf, first, last, n, open_
            if n:
                rows.append((*key, join_with.join(buf), first, last, n))
            buf, first, last, n, open_ = [], None, None, 0, False

        def append(line, o):
            nonlocal buf, first, last, n
            buf.append(line)
            first = o if first is None else first
            last = o
            n += 1

        def fresh(line, o, s_i):
            # vacant buffer: only start_pattern is consulted
            # (line_agg.rs:349-365); a non-start line emits standalone
            nonlocal open_
            append(line, o)
            if s_i:
                open_ = True
            else:
                emit()

        if getattr(state, "hasTimedOut", False):
            emit()  # the reference's timeout_ms flush (line_agg.rs:64-79)
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames).sort_values(order_col)
            # explicit column zip: itertuples renames _-prefixed fields.
            # .tolist() (not .values) on the order column so datetime64
            # becomes pd.Timestamp, int64 a python int — native objects the
            # state serializer and the typed output column both accept
            for s_i, c_i, line, o in zip(
                pdf["_s"].values, pdf["_c"].values,
                pdf[line_col].values, pdf[order_col].tolist(),
            ):
                s_i, c_i = bool(s_i), bool(c_i)
                if not open_:
                    fresh(line, o, s_i)
                elif mode == "continue_through":
                    if c_i:
                        append(line, o)
                    else:  # EndExclude: flush, then re-process as fresh
                        emit()
                        fresh(line, o, s_i)
                elif mode == "continue_past":
                    append(line, o)
                    if not c_i:
                        emit()
                elif mode == "halt_before":
                    if c_i:  # EndExclude on a condition match
                        emit()
                        fresh(line, o, s_i)
                    else:
                        append(line, o)
                else:  # halt_with
                    append(line, o)
                    if c_i:
                        emit()
        if n:
            state.update((_json.dumps(buf), first, last, n))
            if timeout_secs is not None:
                state.setTimeoutDuration(int(timeout_secs * 1000))
        else:
            state.remove()
        yield pd.DataFrame(rows, columns=out_cols)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_secs is not None
        else GroupStateTimeout.NoTimeout
    )
    return flagged.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def stream_merge_partial_lines(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    message_col: str = "message",
    partial_col: str = "partial",
    expiration_secs: float | None = None,
) -> DataFrame:
    """Streaming twin of functions.platform_logs.merge_partial_lines — and
    the shape the reference ACTUALLY runs: the kubernetes_logs partial
    merger is a stream stage with a wall-clock expiration
    (partial_events_merger.rs:83-160, EXPIRATION_TIME line 30).

    Per key (= one log FILE) the open run's partial lines buffer in the
    streaming state; a non-partial line closes the run and emits one
    merged event (messages concatenated in order, no separator, all other
    columns from the FIRST line of the run — the merger extends the
    buffered first event). `expiration_secs` is the reference's
    expiration: a run idle past it flushes on ProcessingTimeTimeout,
    emitted still-`partial`. With None the buffer waits for its closer
    (NoTimeout) — availableNow runs then equal the batch twin on closed
    runs (the stream_multiline discipline).

    Output schema == input schema. State = one open run per key: the
    buffered text plus the first row's column values (typed state fields,
    no serialization loss). Scale: state volume = open runs x buffered
    text, keyed by file — the same bound as the reference's in-memory
    HashMap of partial events."""
    import json as _json

    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    carried = [c for c in df.columns
               if c not in (*keys, message_col, partial_col)]
    out_cols = list(df.columns)
    out_schema = ", ".join(f"{c} {by_name[c]}" for c in out_cols)
    state_schema = "buf string, n long, " + ", ".join(
        f"{c} {by_name[c]}" for c in carried
    )

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.exists:
            buf_json, n, *first_vals = state.get
            buf = _json.loads(buf_json)
        else:
            buf, n, first_vals = [], 0, None
        rows = []

        def emit(still_partial: bool):
            nonlocal buf, n, first_vals
            if n:
                vals = dict(zip(carried, first_vals))
                vals.update(dict(zip(keys, key)))
                vals[message_col] = "".join(buf)
                vals[partial_col] = still_partial
                rows.append(tuple(vals[c] for c in out_cols))
            buf, n, first_vals = [], 0, None

        if getattr(state, "hasTimedOut", False):
            emit(True)  # the merger's expiration flush, still-partial
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames).sort_values(order_col)
            import numpy as _np

            def _native(v):
                # numpy scalars -> python natives for the state serializer
                # and the typed output columns (the stream_multiline
                # .tolist() lesson); pd.Timestamp passes through
                return v.item() if isinstance(v, _np.generic) else v

            for row in pdf.to_dict("records"):
                if n == 0:
                    first_vals = [_native(row[c]) for c in carried]
                buf.append(row[message_col])
                n += 1
                # NULL partial (None or NaN) normalizes to not-partial —
                # same coalesce as the batch twin, so availableNow
                # equality holds for null flags
                p = row[partial_col]
                is_partial = p is not None and p == p and bool(p)
                if not is_partial:
                    emit(False)
        if n:
            state.update((_json.dumps(buf), n, *first_vals))
            if expiration_secs is not None:
                state.setTimeoutDuration(int(expiration_secs * 1000))
        else:
            state.remove()
        yield pd.DataFrame(rows, columns=out_cols)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expiration_secs is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
