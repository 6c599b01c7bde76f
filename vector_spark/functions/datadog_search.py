"""Datadog search syntax -> Spark Column translator.

Reference: Condition::DatadogSearch (/root/reference/src/conditions/mod.rs:
23-37; grammar in the datadog-search-syntax crate) — the query language
used by Datadog log filters: `field:value`, quoted phrases, wildcards,
ranges, boolean operators. Used by filter/route conditions.

Supported subset (covers the operators the reference's own tests exercise):
  status:error                  field equality
  status:(error OR warn)       field-value alternation
  host:web-*                   trailing/leading wildcard -> LIKE
  "exact phrase"               substring match on the default field
  @attr.key:value              attribute path -> nested/getField access
  count:[1 TO 10]              inclusive range
  count:>5  count:>=5 ...      comparisons
  a AND b / a OR b / NOT a / -a   boolean combinators (AND is the default
                                   for juxtaposition)
  *:*  or  *                   match-all

  term~2 / field:value~1         fuzzy match -> JVM levenshtein bound
  /regex/  field:/regex/          regex literal -> rlike (pattern must not
                                   contain spaces/parens — tokenizer subset)

Unsupported (raise ValueError): nested facets beyond one level of dotted
path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b) |
        (?P<or>OR\b) |
        (?P<not>NOT\b) |
        (?P<minus>-) |
        (?P<phrase>"[^"]*") |
        (?P<term>[^\s()]+)
    )""",
    re.VERBOSE,
)


def _tokens(query: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(query):
        m = _TOKEN.match(query, pos)
        if not m:
            raise ValueError(f"datadog search: cannot tokenize at {query[pos:]!r}")
        if m.end() == pos:
            break
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
        pos = m.end()
    return out


_RANGE = re.compile(r"^\[(\S+) TO (\S+)\]$")
_FUZZY = re.compile(r"^(.*?)~(\d+)?$")
_CMP = re.compile(r"^(>=|<=|>|<)(.+)$")


def _field_col(field: str) -> Column:
    if field.startswith("@"):
        field = field[1:]
    col = F.col(field.split(".")[0])
    for part in field.split(".")[1:]:
        col = col.getField(part)
    return col


def _value_predicate(field: str, value: str) -> Column:
    col = _field_col(field)
    if value == "*":
        return col.isNotNull()
    m = _RANGE.match(value)
    if m:
        lo, hi = m.group(1), m.group(2)
        return col.between(_lit(lo), _lit(hi))
    m = _CMP.match(value)
    if m:
        op, v = m.group(1), _lit(m.group(2))
        return {"<": col < v, "<=": col <= v, ">": col > v, ">=": col >= v}[op]
    if value.startswith('"') and value.endswith('"'):
        value = value[1:-1]
    if "*" in value:
        return col.cast("string").like(value.replace("*", "%"))
    return col.cast("string") == value


def _lit(text: str):
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return text.strip('"')


class _Parser:
    """Recursive descent: OR < AND (implicit between adjacent terms) < NOT."""

    def __init__(self, tokens: list[tuple[str, str]], default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def parse(self) -> Column:
        out = self.parse_or()
        if self.i != len(self.toks):
            raise ValueError(f"datadog search: trailing tokens {self.toks[self.i:]}")
        return out

    def parse_or(self) -> Column:
        left = self.parse_and()
        while self.peek()[0] == "or":
            self.i += 1
            left = left | self.parse_and()
        return left

    def parse_and(self) -> Column:
        left = self.parse_unary()
        while True:
            kind, _ = self.peek()
            if kind == "and":
                self.i += 1
                left = left & self.parse_unary()
            elif kind in ("term", "phrase", "lparen", "not", "minus"):
                left = left & self.parse_unary()  # juxtaposition = AND
            else:
                return left

    def parse_unary(self) -> Column:
        kind, val = self.peek()
        if kind in ("not", "minus"):
            self.i += 1
            return ~self.parse_unary()
        if kind == "lparen":
            self.i += 1
            inner = self.parse_or()
            if self.peek()[0] != "rparen":
                raise ValueError("datadog search: unbalanced parentheses")
            self.i += 1
            return inner
        if kind == "phrase":
            self.i += 1
            phrase = val[1:-1]
            return F.col(self.default_field).contains(phrase)
        if kind == "term":
            self.i += 1
            return self.parse_term(val)
        raise ValueError(f"datadog search: unexpected token {val!r}")

    def parse_term(self, term: str) -> Column:
        if term in ("*", "*:*"):
            return F.lit(True)
        fuzz = _FUZZY.match(term)
        if fuzz:
            body, dist = fuzz.group(1), int(fuzz.group(2) or 2)
            if ":" in body:
                field, value = body.split(":", 1)
                return F.levenshtein(
                    _field_col(field).cast("string"), F.lit(value)
                ) <= dist
            # bare fuzzy word: any whitespace token of the default field
            # within edit distance (JVM levenshtein inside exists())
            return F.exists(
                F.split(F.col(self.default_field), r"\s+"),
                lambda t: F.levenshtein(t, F.lit(body)) <= dist,
            )
        if ":" not in term:
            if len(term) > 2 and term.startswith("/") and term.endswith("/"):
                return F.col(self.default_field).rlike(term[1:-1])
            # bare word: substring on the default field
            return F.col(self.default_field).contains(term)
        field, value = term.split(":", 1)
        if len(value) > 2 and value.startswith("/") and value.endswith("/"):
            # regex literal (no spaces/parens inside — tokenizer subset)
            return _field_col(field).cast("string").rlike(value[1:-1])
        if value.startswith("[") and not value.endswith("]"):
            # range literal was split on whitespace: rejoin "[lo TO hi]"
            while self.i < len(self.toks):
                kind, v = self.toks[self.i]
                if kind != "term":
                    raise ValueError("datadog search: unterminated range")
                self.i += 1
                value += " " + v
                if v.endswith("]"):
                    break
        if value == "" and self.peek()[0] == "lparen":
            # "field:(...)" — the tokenizer split at the paren
            self.i += 1
            value = "("
        if value.startswith("("):
            # field:(a OR b ...) alternation — consume until rparen
            vals = []
            if value != "(":
                vals.append(value[1:])
            while True:
                kind, v = self.peek()
                if kind == "rparen":
                    self.i += 1
                    break
                if kind in ("or", "and"):
                    self.i += 1
                    continue
                if kind in ("term", "phrase"):
                    self.i += 1
                    vals.append(v.rstrip(")"))
                    if v.endswith(")"):
                        break
                    continue
                raise ValueError("datadog search: bad alternation")
            preds = [_value_predicate(field, v) for v in vals if v]
            out = preds[0]
            for p in preds[1:]:
                out = out | p
            return out
        return _value_predicate(field, value)


def datadog_search(query: str, default_field: str = "message") -> Column:
    """Compile a Datadog search query to a boolean Column."""
    return _Parser(_tokens(query), default_field).parse()
