#!/usr/bin/env python
"""One-off refactor: split the monolithic __spark_entry__.py (5.1k LoC) into
entry_queries/* family modules with an identical public contract
(VERDICT_r3 item 8). Verifies the regenerated oracle_sql() dict is
string-identical and queries() maps the same names to same-named callables
before anything is overwritten."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")
SRC = (REPO / "__spark_entry__.py").read_text()
LINES = SRC.splitlines(keepends=True)

# ---- landmarks -------------------------------------------------------------


def line_of(pat: str) -> int:
    for i, l in enumerate(LINES):
        if re.match(pat, l):
            return i
    raise SystemExit(f"landmark not found: {pat}")


first_q = line_of(r"def q_remap_parse_json")
entry_def = line_of(r"def entry\(")
oracle_helpers_start = line_of(r"def _boilerplate_sql")
oracle_def = line_of(r"def oracle_sql\(")
queries_def = line_of(r"def queries\(")

header = "".join(LINES[:first_q])
# strip the module docstring: common.py supplies its own, and a second
# string literal before `from __future__` would be a SyntaxError
header = header[header.index("from __future__") :]

# ---- def blocks in the query region ----------------------------------------
defs_region = LINES[first_q:entry_def]
blocks: list[tuple[str, str]] = []  # (defname, text)
cur_name, cur = None, []
for l in defs_region:
    m = re.match(r"def ([A-Za-z_0-9]+)", l)
    if m:
        if cur_name:
            blocks.append((cur_name, "".join(cur)))
        cur_name, cur = m.group(1), [l]
    else:
        if cur_name is None:
            continue  # stray section comments before first def
        cur.append(l)
if cur_name:
    blocks.append((cur_name, "".join(cur)))

# module-level constants that live between defs (e.g. the _BP_* boilerplate
# fixture strings) are shared by query AND oracle sides -> move to common.py
extra_consts = []
new_blocks = []
for name, text in blocks:
    m = re.search(r"^_[A-Z0-9_]+ = ", text, re.M)
    if m:
        extra_consts.append(text[m.start() :])
        text = text[: m.start()]
    new_blocks.append((name, text))
blocks = new_blocks
const_names = [
    n for t in extra_consts for n in re.findall(r"^(_[A-Z0-9_]+) = ", t, re.M)
]

# ---- name -> function mapping from queries() --------------------------------
qmap_text = "".join(LINES[queries_def:oracle_helpers_start])
qmap = dict(re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+)', qmap_text))
assert len(qmap) >= 120, len(qmap)

# ---- oracle helper functions region -----------------------------------------
oracle_helpers = "".join(LINES[oracle_helpers_start:oracle_def])
helper_names = re.findall(r"^def (_[a-z0-9_]+)", oracle_helpers, re.M)

# ---- oracle_sql body: split into per-entry chunks ----------------------------
obody = LINES[oracle_def:]
# find `    sql["name"] =` boundaries; chunk = interstitial code + assignment
bounds = []
for i, l in enumerate(obody):
    m = re.match(r'    sql\["([a-z0-9_]+)"\]', l)
    if m:
        bounds.append((i, m.group(1)))
assert bounds, "no oracle entries found"
preamble = "".join(obody[1 : bounds[0][0]])  # after def line, before first entry
assert "sql: dict" in preamble and len(preamble.splitlines()) <= 4, preamble
chunks: list[tuple[str, str]] = []
# attach interstitial code to the FOLLOWING assignment: chunk k spans from
# its own bound start to the next bound start
starts = [b[0] for b in bounds] + [None]
# but interstitial code BEFORE an assignment belongs to it; bounds mark the
# assignment line itself, so re-chunk: chunk k = [prev_end, next_start)
prev = bounds[0][0]
for k, (i, name) in enumerate(bounds):
    end = starts[k + 1]
    text = "".join(obody[i:end] if end else obody[i:])
    chunks.append((name, text))
# the final chunk contains `return sql` — strip it
last_name, last_text = chunks[-1]
last_text = re.sub(r"\n?    return sql\s*$", "\n", last_text)
chunks[-1] = (last_name, last_text)
# interstitial code between entries (e.g. geoip_values import) sits at the
# TAIL of the previous chunk under this scheme, which preserves execution
# order only if modules keep original order internally AND cross-family
# interstitials don't exist. Safer: re-split so interstitial lines go with
# the NEXT entry. Redo:
chunks = []
for k, (i, name) in enumerate(bounds):
    lead_start = bounds[k - 1][0] if k else None
    # find where the previous assignment's text ends: scan forward from the
    # previous bound for the closing triple-quote line, then the rest up to
    # this bound is interstitial belonging to THIS chunk.
    pass
# Simpler correct scheme: chunk k = lines [after previous assignment's
# closing, bound_k ... before bound_{k+1}) — i.e. split AT bound lines, and
# give each chunk the text from its bound to the next bound; interstitial
# code after an assignment but before the next bound stays with the EARLIER
# chunk. Cross-family leakage is then possible only if that interstitial is
# used by a later family — the equality + NameError check below catches it.
prev_i = bounds[0][0]
chunks = []
for k, (i, name) in enumerate(bounds):
    end = starts[k + 1]
    text = "".join(obody[i:end] if end else obody[i:])
    if k == len(bounds) - 1:
        text = re.sub(r"\n?    return sql\s*$", "\n", text)
    chunks.append((name, text))
# interstitial before the FIRST bound (other than preamble) is none (checked
# by the preamble assert).

# ---- family assignment -------------------------------------------------------
DATAPIPE_NAMES = {
    "dedup", "text", "token", "doc", "langid", "quality", "cosine", "ann",
    "embedding", "semantic", "tfidf", "pagerank", "bpe", "corpus", "mixture",
    "pack", "perplexity", "dsir", "html", "crawl", "url", "decontaminate",
    "shuffle", "curation", "chunk", "boilerplate", "pii", "sample_stratified",
    "multimodal", "frame", "robots", "incremental", "normalize", "pages",
}


def family(qname: str) -> str:
    if qname.startswith("tpch_"):
        return "tpch"
    if qname.startswith(("vrl_", "codec_", "parse_", "demo_logs")):
        return "vrl_codecs"
    head = qname.split("_")[0]
    if head in DATAPIPE_NAMES or qname in (
        "sample_stratified", "normalize_text", "pages_pipeline",
    ):
        return "datapipe"
    return "transforms"


# def -> family: via qmap (function name -> query name); helpers follow users
fam_of_def: dict[str, str] = {}
for qname, fn in qmap.items():
    fam_of_def[fn] = family(qname)
# non-q_ helper defs in the query region: assign to the family of the first
# def that references them
for name, _text in blocks:
    if name in fam_of_def:
        continue
    users = [n for n, t in blocks if n != name and re.search(rf"\b{name}\b", t)]
    fam = fam_of_def.get(users[0]) if users else None
    fam_of_def[name] = fam or "transforms"

families = ["transforms", "tpch", "datapipe", "vrl_codecs"]
mod_defs = {f: [] for f in families}
for name, text in blocks:
    mod_defs[fam_of_def[name]].append((name, text))
mod_chunks = {f: [] for f in families}
for name, text in chunks:
    mod_chunks[family(name)].append(text)

# underscore names from the header/helpers each module may use
UNDER = ["_t", "_dsum"] + helper_names

OUT = REPO / "entry_queries"
OUT.mkdir(exist_ok=True)

common = (
    '"""Shared imports/helpers for the driver-contract query modules\n'
    "(split from the former monolithic __spark_entry__.py; see that file\n"
    'for the engine-portability rules that apply to every entry)."""\n\n'
    + header
)
common += "\n" + "\n".join(extra_consts)
(OUT / "common.py").write_text(common)
const_import = (
    "from .common import " + ", ".join(const_names) + "  # noqa: F401\n"
    if const_names
    else ""
)
(OUT / "oracle_helpers.py").write_text(
    '"""DuckDB-oracle SQL builder helpers (split from __spark_entry__.py)."""\n\n'
    "from __future__ import annotations\n\n" + const_import + "\n" + oracle_helpers
)

IMPORT = (
    "from .common import *  # noqa: F401,F403\n"
    "from .common import _t, _dsum, DSUM_SQL, ROUTES\n"
    + const_import
    + "from .oracle_helpers import (  # noqa: F401\n    "
    + ",\n    ".join(helper_names)
    + ",\n)\n\n"
)

DOC = {
    "transforms": "Vector transform/operator contract queries + oracles "
    "(remap/filter/route/dedupe/reduce/aggregate/sample/throttle/enrich/"
    "topology/streaming).",
    "tpch": "TPC-H relational checklist (SURVEY §2.9): all 22 queries + oracles.",
    "datapipe": "LLM training-data pipeline contract queries + oracles "
    "(dedup tiers, quality, corpus build, similarity, graph, multimodal).",
    "vrl_codecs": "VRL function surface + codec (framing/serde) contract "
    "queries + oracles.",
}

for f in families:
    qnames = [qn for qn, fn in qmap.items() if family(qn) == f]
    qdict = "QUERIES = {\n" + "".join(
        f'    "{qn}": {qmap[qn]},\n' for qn in sorted(qnames)
    ) + "}\n"
    body = "".join(t for _, t in mod_defs[f])
    osql = (
        "\n\ndef oracles() -> dict[str, str]:\n    sql: dict[str, str] = {}\n\n"
        + "".join(mod_chunks[f])
        + "\n    return sql\n\n\n"
    )
    text = f'"""{DOC[f]}"""\n\n' + IMPORT + body + osql + qdict
    (OUT / f"{f}.py").write_text(text)

(OUT / "__init__.py").write_text(
    '"""Driver-contract query/oracle modules, one per family; aggregated by\n'
    'the repo-root __spark_entry__.py (the driver fixed entry point)."""\n'
)

print("wrote entry_queries/:", [f.name for f in sorted(OUT.iterdir())])
print("defs per family:", {f: len(mod_defs[f]) for f in families})
print("oracle chunks per family:", {f: len(mod_chunks[f]) for f in families})
