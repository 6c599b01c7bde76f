"""Full-PSL parse_etld tests.

Reference semantics: website/cue/reference/remap/functions/parse_etld.cue
({etld, etld_plus, known_suffix}; implicit '*' default rule for unknown
suffixes). The property test drives the Spark broadcast join ladder against
an independent pure-Python implementation of the published PSL algorithm
(publicsuffix.org/list/) over hosts synthesized from real rules."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.functions.psl import load_psl_rules, parse_etld_psl, psl_dim

RULES = load_psl_rules()


# ---------------------------------------------------------------------------
# independent reference model (per publicsuffix.org/list/ algorithm)
# ---------------------------------------------------------------------------


def _ref_etld(host: str, plus: int = 0) -> tuple[str, str, bool]:
    labels = host.rstrip(".").lower().split(".")
    exc_len = None
    norm_len = None
    for rule, k, is_exc in RULES:
        rl = rule.split(".")
        if k > len(labels):
            continue
        tail = labels[-k:]
        ok = all(r == "*" or r == t for r, t in zip(rl, tail))
        if not ok:
            continue
        if is_exc:
            exc_len = max(exc_len or 0, k - 1)
        else:
            norm_len = max(norm_len or 0, k)
    known = exc_len is not None or norm_len is not None
    ps = exc_len if exc_len is not None else (norm_len if norm_len is not None else 1)
    etld = ".".join(labels[-ps:])
    etld_plus = ".".join(labels[-min(ps + plus, len(labels)) :])
    return etld, etld_plus, known


def _run(spark, hosts, plus=0):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = parse_etld_psl(df, "host", psl_dim(spark), plus_parts=plus)
    return {
        r.host: (r.etld, r.etld_plus, r.known_suffix)
        for r in out.select("host", "etld", "etld_plus", "known_suffix").collect()
    }


# ---------------------------------------------------------------------------


def test_cue_examples(spark):
    """The three documented parse_etld.cue examples."""
    got = _run(spark, ["sub.sussex.ac.uk", "vector.acmecorp"], plus=0)
    assert got["sub.sussex.ac.uk"] == ("ac.uk", "ac.uk", True)
    assert got["vector.acmecorp"] == ("acmecorp", "acmecorp", False)
    got1 = _run(spark, ["sub.sussex.ac.uk"], plus=1)
    assert got1["sub.sussex.ac.uk"] == ("ac.uk", "sussex.ac.uk", True)


def test_wildcard_and_exception_rules(spark):
    """*.ck makes foo.ck a public suffix; !www.ck carves www.ck back out."""
    got = _run(
        spark,
        ["foo.ck", "bar.foo.ck", "www.ck", "deep.www.ck", "city.kawasaki.jp", "z.y.kawasaki.jp"],
        plus=1,
    )
    assert got["foo.ck"] == ("foo.ck", "foo.ck", True)
    assert got["bar.foo.ck"] == ("foo.ck", "bar.foo.ck", True)
    assert got["www.ck"] == ("ck", "www.ck", True)
    assert got["deep.www.ck"] == ("ck", "www.ck", True)
    assert got["city.kawasaki.jp"] == ("kawasaki.jp", "city.kawasaki.jp", True)
    assert got["z.y.kawasaki.jp"] == ("y.kawasaki.jp", "z.y.kawasaki.jp", True)


def test_private_section_and_case(spark):
    got = _run(spark, ["a.b.GitHub.IO", "x.blogspot.com."], plus=1)
    assert got["a.b.GitHub.IO"] == ("github.io", "b.github.io", True)
    assert got["x.blogspot.com."] == ("blogspot.com", "x.blogspot.com", True)


def test_plan_has_no_shuffle(spark):
    """The ladder must stay map-side: broadcast hash joins only, zero
    Exchange operators introduced by parse_etld_psl (100 TB invariant)."""
    df = spark.createDataFrame([("a.b.co.uk",)], "host string")
    out = parse_etld_psl(df, "host", psl_dim(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_url_filter_psl_domain(spark):
    from vector_spark.datapipe.urls import url_filter

    df = spark.createDataFrame(
        [(1, "https://Shop.Example.CO.UK/a?utm_source=x"), (2, "http://a.b.github.io/")],
        "doc_id int, url string",
    )
    out = {r.doc_id: r.domain for r in url_filter(df, psl=psl_dim(spark)).collect()}
    assert out[1] == "example.co.uk"
    assert out[2] == "b.github.io"


# hosts synthesized from real rules: take a rule, materialize '*' labels,
# optionally prepend extra labels / strip labels to hit partial matches
@st.composite
def psl_hosts(draw):
    rule, _, _ = RULES[draw(st.integers(min_value=0, max_value=len(RULES) - 1))]
    labels = [
        draw(st.sampled_from(["x", "www", "foo"])) if l == "*" else l
        for l in rule.split(".")
    ]
    extra = draw(st.integers(min_value=0, max_value=3))
    labels = [f"l{i}" for i in range(extra)] + labels
    strip = draw(st.integers(min_value=0, max_value=min(2, len(labels) - 1)))
    return ".".join(labels[strip:])


@settings(max_examples=12, deadline=None)
@given(hosts=st.lists(psl_hosts(), min_size=1, max_size=25, unique=True), plus=st.integers(0, 2))
def test_matches_reference_model(spark, hosts, plus):
    got = _run(spark, hosts, plus=plus)
    for h in hosts:
        assert got[h] == _ref_etld(h, plus), h


def test_package_zip_importable(tmp_path):
    """spark-submit --py-files ships vector_spark.zip; executors import
    from INSIDE the archive, so the package (incl. the PSL data fixture,
    read via importlib.resources) must work under zipimport with no
    filesystem fallback. Runs in a clean subprocess so the repo dir can't
    shadow the zip."""
    import pathlib
    import subprocess
    import sys
    import zipfile

    repo = pathlib.Path(__file__).resolve().parent.parent
    zp = tmp_path / "vector_spark.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for f in sorted((repo / "vector_spark").rglob("*")):
            if f.is_file() and "__pycache__" not in f.parts:
                z.write(f, f.relative_to(repo))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import vector_spark; "
        "assert vector_spark.__file__.startswith(sys.argv[1]), vector_spark.__file__; "
        "from vector_spark.functions.psl import load_psl_rules; "
        "rs = load_psl_rules(); assert len(rs) > 5000, len(rs); "
        "print('OK', len(rs))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zp)],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("OK ")


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
