"""User-scripted transform — the Spark-first analogue of the reference's
`lua` transform (src/transforms/lua/v2/mod.rs: a user hook receives each
event and may emit 0..N events, with persistent script globals and an
optional per-key state; hooks.init/process/shutdown lifecycle).

Instead of a per-event scripting VM (Lua runs once per event on one core),
the user hook here is a PANDAS BATCH FUNCTION: it receives an Arrow batch
as a pandas DataFrame and returns a pandas DataFrame of emitted events —
0..N per input row is just the output length. This is the one place
arbitrary user Python is the *point* of the operator (the same
justification the reference has for embedding a Lua VM), and the Arrow
batch transport keeps it off the per-row slow path: a vectorized hook runs
at pandas speed, and even a loopy hook beats per-event FFI.

Mapping of the reference's lua features:
  * hooks.process (event -> 0..N events)  -> `fn` via mapInPandas
  * hooks.init (script globals)           -> `init` dict passed to fn
  * per-key script state (lua `GLOBAL`)   -> `group_key=` switches to
    applyInPandas: fn sees one key's FULL batch and can fold state across
    it (the distributed-correct reading of cross-event state: global
    mutable state cannot exist on 1000 executors, per-key state can)
  * hooks.shutdown / timers               -> n/a in batch (a streaming
    script would use applyInPandasWithState's timeout — see
    streaming/ops.py for the state/timeout patterns)

100 TB scale: stateless scripts are embarrassingly parallel (one Arrow
batch at a time, no shuffle). group_key scripts shuffle once on the key —
same contract as reduce; keys must be finer than "one giant group".
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def script_transform(
    df: DataFrame,
    fn: Callable,
    schema: str,
    init: dict | None = None,
    group_key: str | list[str] | None = None,
) -> DataFrame:
    """Apply a user hook `fn(pdf [, init]) -> pdf` emitting 0..N rows per
    input row, with output columns per `schema` (a DDL string — declared
    up front exactly like the reference's lua `version = "2"` typedefs).

    Stateless (default): mapInPandas — fn is called once per Arrow batch.
    With `group_key`: applyInPandas — fn is called once per key group and
    may carry state across that key's events (lua GLOBAL analogue)."""
    wants_init = init is not None

    def _call(pdf):
        return fn(pdf, init) if wants_init else fn(pdf)

    if group_key is not None:
        keys = [group_key] if isinstance(group_key, str) else list(group_key)
        return df.groupBy(*keys).applyInPandas(_call, schema=schema)

    def _map(batches):
        for pdf in batches:
            out = _call(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_map, schema=schema)
