"""VRL stdlib subset as Column helpers.

The reference executes compiled VRL programs per event
(/root/reference/src/transforms/remap.rs:556-640); its stdlib has 186
functions (website/cue/reference/remap/functions/). We cover the parse /
template surface the north rule uses with pure JVM-side Column expressions —
no Python in the hot path (whole-stage codegen keeps these in one stage).
Mappings per SURVEY.md §2.7.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_json_field(col: Column, path: str, cast: str | None = None) -> Column:
    """VRL parse_json + path access -> get_json_object (JVM-side)."""
    out = F.get_json_object(col, f"$.{path}")
    return out.cast(cast) if cast else out


_NAMED_GROUP = re.compile(r"\(\?P<[^>]+>")


def java_regex(pattern: str) -> str:
    """Python named-group syntax -> JVM-safe: named groups become plain
    capturing groups (java.util.regex rejects `(?P<` outright and forbids
    underscores in group names; we address groups by index anyway, and
    indexes are unchanged by dropping the names). Python's `\\Z`
    (absolute end of input) becomes Java's `\\z` — Java's own `\\Z`
    matches BEFORE a final line terminator (like its `$`), which is NOT
    the Python semantic and would silently drop a trailing NEL/U+2028
    from a message capture (the parse_cri hypothesis find)."""
    out = _NAMED_GROUP.sub("(", pattern)
    return out.replace(r"\Z", r"\z")


def parse_regex(col: Column, pattern: str) -> dict[str, Column]:
    """VRL parse_regex: named capture groups -> {name: Column}.

    Compiles the pattern once at plan-build time (Python re) to discover
    group names, then emits one JVM-side regexp_extract per group (Catalyst
    folds these into a single codegen stage).
    """
    compiled = re.compile(pattern)
    jp = java_regex(pattern)
    return {
        name: F.regexp_extract(col, jp, idx)
        for name, idx in compiled.groupindex.items()
    }


def parse_key_value(col: Column, pair_sep: str = " ", kv_sep: str = "=") -> Column:
    """VRL parse_key_value / parse_logfmt -> map<string,string>."""
    return F.str_to_map(col, F.lit(pair_sep), F.lit(kv_sep))


def parse_url_parts(col: Column) -> dict[str, Column]:
    """VRL parse_url -> scheme/host/path/query columns."""
    return {
        "scheme": F.parse_url(col, F.lit("PROTOCOL")),
        "host": F.parse_url(col, F.lit("HOST")),
        "path": F.parse_url(col, F.lit("PATH")),
        "query": F.parse_url(col, F.lit("QUERY")),
    }


_TEMPLATE_RE = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


def render_template(template: str, ts_col: str | None = None) -> Column:
    """Vector Template rendering (/root/reference/src/template.rs:149-234):
    `{{ field.path }}` substitution + strftime %Y/%m/%d expansion against the
    event timestamp — as a concat of literals, columns, and date_format.
    """
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(template):
        if m.start() > pos:
            parts.append(_strftime_lit(template[pos : m.start()], ts_col))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(_strftime_lit(template[pos:], ts_col))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


_STRFTIME_MAP = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm", "%S": "ss",
    "%j": "DDD", "%F": "yyyy-MM-dd", "%y": "yy", "%b": "MMM", "%B": "MMMM",
    "%a": "EEE", "%A": "EEEE", "%T": "HH:mm:ss",
}

_STRFTIME_TOKEN = re.compile("|".join(re.escape(k) for k in _STRFTIME_MAP))


def _strftime_lit(text: str, ts_col: str | None) -> Column:
    if not (ts_col and _STRFTIME_TOKEN.search(text)):
        return F.lit(text)
    # build a datetime pattern where literal runs are single-quoted (pattern
    # letters like the y/M/d in "year=" must not be interpreted)
    parts: list[str] = []
    pos = 0
    for m in _STRFTIME_TOKEN.finditer(text):
        if m.start() > pos:
            parts.append("'" + text[pos : m.start()].replace("'", "''") + "'")
        parts.append(_STRFTIME_MAP[m.group(0)])
        pos = m.end()
    if pos < len(text):
        parts.append("'" + text[pos:].replace("'", "''") + "'")
    return F.date_format(F.col(ts_col), "".join(parts))
