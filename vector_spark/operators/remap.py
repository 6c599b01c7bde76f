"""remap with error handling — the dropped-port semantics.

Reference: remap compiles a VRL program per event; on runtime error or
abort the event is (configurably) dropped to a `dropped` output port,
annotated with `metadata.dropped.{reason, message, component_id}`
(/root/reference/src/transforms/remap.rs:339-359,484-545).

Spark expressions don't throw per-row — a failed parse/cast yields null.
So the Spark-native equivalent of "VRL runtime error" is: a REQUIRED
output field came out null while its input was non-null. `remap_with_errors`
evaluates the expressions once, tags each row with an `_error` struct
(null = ok), and fans out to (ok, dropped) — the same
boolean-column + filter pattern route uses, one scan, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def remap_with_errors(
    df: DataFrame,
    exprs: dict[str, Column | str],
    required: list[str] | None = None,
    component_id: str = "remap",
    reroute_dropped: bool = True,
) -> dict[str, DataFrame]:
    """Apply remap expressions; rows whose `required` outputs are null go to
    the `dropped` port annotated with a `dropped` metadata struct.

    Returns {"ok": ..., "dropped": ...}; with reroute_dropped=False the
    dropped rows are discarded (drop_on_error semantics) and only "ok"
    is returned — matching remap.rs's drop_on_error/reroute_dropped config.
    """
    out = df
    for name, expr in exprs.items():
        out = out.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr)
    required = required if required is not None else list(exprs)
    if not required:
        # no required outputs -> no row can error; the dropped port is
        # structurally empty, so just return the remapped frame as `ok`
        return {"ok": out}
    err_field = None
    for name in required:
        reason = F.when(
            F.col(name).isNull(),
            F.lit(f"required field {name!r} is null after remap"),
        )
        err_field = reason if err_field is None else F.coalesce(err_field, reason)
    tagged = out.withColumn(
        "_error",
        F.when(
            err_field.isNotNull(),
            F.struct(
                err_field.alias("reason"),
                F.lit(component_id).alias("component_id"),
                F.lit("error").alias("kind"),
            ),
        ),
    )
    ok = tagged.filter(F.col("_error").isNull()).drop("_error")
    if not reroute_dropped:
        return {"ok": ok}
    dropped = tagged.filter(F.col("_error").isNotNull()).withColumn(
        "dropped", F.col("_error")
    ).drop("_error")
    return {"ok": ok, "dropped": dropped}
