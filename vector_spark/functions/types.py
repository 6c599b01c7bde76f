"""VRL type-predicate and coercion family — the dynamic-typing tail.

VRL values are dynamically typed; a DataFrame column is statically typed,
so most of these are only meaningful against a STRING cell holding an
encoded value (the shape VRL actually meets them in: a JSON field pulled
out of a payload). The is_*/to_* functions here take that string-encoded
view; on an already-typed column the native answer is a literal
(`is_integer` of a LongType column is `lit(True)`), which is why these
never appeared in a fixture until the completionist sweep.

References: website/cue/reference/remap/functions/{is_json,is_nullish,
to_bool,to_int,format_number,contains_all,match_any,match_array,
assert_eq}.cue. All pure Column expressions — scan-speed, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRUE_WORDS = ("true", "t", "yes", "y", "1")
_FALSE_WORDS = ("false", "f", "no", "n", "0")


def is_json(col: Column) -> Column:
    """String parses as JSON (any JSON type, scalars included)."""
    return col.isNotNull() & F.try_parse_json(col).isNotNull()


def is_array_str(col: Column) -> Column:
    return is_json(col) & F.trim(col).startswith("[")


def is_object_str(col: Column) -> Column:
    return is_json(col) & F.trim(col).startswith("{")


def is_string_str(col: Column) -> Column:
    return is_json(col) & F.trim(col).startswith('"')


def is_null_str(col: Column) -> Column:
    """The encoded JSON null (a missing cell is SQL NULL, not VRL null)."""
    return F.trim(col) == "null"


def is_boolean_str(col: Column) -> Column:
    return F.trim(col).isin("true", "false")


def is_integer_str(col: Column) -> Column:
    return col.rlike(r"^\s*-?\d+\s*$")


def is_float_str(col: Column) -> Column:
    """JSON float: has a fraction and/or exponent (integers are is_integer)."""
    return col.rlike(r"^\s*-?\d+(\.\d+([eE][+-]?\d+)?|[eE][+-]?\d+)\s*$")


def is_timestamp_str(col: Column) -> Column:
    return col.try_cast("timestamp").isNotNull()


def is_empty(col: Column) -> Column:
    """Empty string (array/map columns: use F.size(col) == 0 natively)."""
    return F.length(col) == 0


def is_nullish(col: Column) -> Column:
    """VRL is_nullish: SQL NULL, empty/whitespace-only string, or '-'."""
    t = F.trim(col)
    return col.isNull() | (t == "") | (t == "-")


def to_bool_vrl(col: Column) -> Column:
    """VRL to_bool word table; unmappable input -> null (error arm)."""
    t = F.lower(F.trim(col))
    return (
        F.when(t.isin(*_TRUE_WORDS), F.lit(True))
        .when(t.isin(*_FALSE_WORDS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def to_int_vrl(col: Column) -> Column:
    """Integer parse; non-integral input -> null. Guarded by the integer
    regex so engines that round a '1.9' cast can never diverge."""
    return F.when(is_integer_str(col), col.try_cast("long"))


def to_float_vrl(col: Column) -> Column:
    return col.try_cast("double")


def to_string_vrl(col: Column) -> Column:
    return col.cast("string")


def format_number_vrl(col: Column, scale: int = 2) -> Column:
    """Grouped thousands + fixed decimals (VRL format_number defaults)."""
    return F.format_number(col, scale)


def contains_all(col: Column, substrings: list[str]) -> Column:
    """True iff every substring occurs (plan-time literal list)."""
    out = F.lit(True)
    for s in substrings:
        out = out & col.contains(s)
    return out


def match_any(col: Column, patterns: list[str]) -> Column:
    """True iff any regex matches (plan-time literal list)."""
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def match_array(arr: Column, pattern: str, match_all: bool = False) -> Column:
    """VRL match_array: any (or all) element of an array column matches."""
    fn = F.forall if match_all else F.exists
    return fn(arr, lambda x: x.rlike(pattern))


def assert_eq(a: Column, b: Column, message: str = "assert_eq failed") -> Column:
    """Plan-embedded equality assertion: returns `a` when a <=> b, else the
    query errors at action time (compile stays lazy, like find_table_row's
    ambiguity guard)."""
    return F.when(F.assert_true(a.eqNullSafe(b), F.lit(message)).isNull(), a)
