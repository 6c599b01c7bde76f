"""BPE learn/encode tests (public recipe: Sennrich et al. 2016 §3.2).

The hypothesis property checks the one-merge-per-step leftmost-best
encoder (the DuckDB oracle's formulation) against the all-occurrences
apply loop (bpe_encode_word) — the two are equivalent for any CONSISTENT
learned table, which is what keeps the bpe_encode oracle hash-exact."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.datapipe.bpe import (
    _merge_all,
    bpe_encode,
    bpe_encode_word,
    bpe_learn,
    bpe_learn_py,
)


def test_learn_sennrich_example():
    """The paper's classic vocabulary: es -> est -> lo -> low ... and
    'lowest' (unseen) segments to low+est."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_learn_py(freqs, 4)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est"]


def test_learned_table_is_consistent():
    """Any pair referencing a merged token must rank after the merge that
    created it — the invariant the oracle's one-at-a-time encoder needs."""
    freqs = {w: (i % 7) + 1 for i, w in enumerate(
        ["spark", "sparks", "sparkle", "stream", "streams", "batch", "batches",
         "the", "them", "then", "join", "joins", "joined"])}
    merges = bpe_learn_py(freqs, 30)
    created = {}
    for i, (a, b) in enumerate(merges):
        for tok in (a, b):
            if len(tok) > 1:
                assert tok in created and created[tok] < i, (tok, i)
        created.setdefault(a + b, i)


def _encode_one_at_a_time(word: str, ranks) -> list[str]:
    """Independent model: merge ONE occurrence per step — lowest rank,
    leftmost position (exactly the recursive-CTE oracle)."""
    toks = list(word)
    while True:
        best = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return toks
        i = best[1]
        toks[i : i + 2] = [toks[i] + toks[i + 1]]


words_st = st.text(alphabet=string.ascii_lowercase[:6], min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(corpus=st.dictionaries(words_st, st.integers(1, 9), min_size=1, max_size=15),
       probe=words_st, n=st.integers(1, 25))
def test_encoders_agree_and_roundtrip(corpus, probe, n):
    merges = bpe_learn_py(corpus, n)
    ranks = {p: i for i, p in enumerate(merges)}
    fast = bpe_encode_word(probe, ranks)
    assert "".join(fast) == probe  # lossless
    assert fast == _encode_one_at_a_time(probe, ranks)


def test_merge_all_overlap():
    assert _merge_all(tuple("aaa"), ("a", "a")) == ("aa", "a")
    assert _merge_all(tuple("aaaa"), ("a", "a")) == ("aa", "aa")


def test_spark_learn_and_encode(spark):
    rows = [(1, "spark join join spark"), (2, "join the stream"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe_learn(df, num_merges=10)
    # partitioning invariance: same table at different parallelism
    merges8 = bpe_learn(df.repartition(8), num_merges=10)
    assert merges == merges8
    ranks = {p: i for i, p in enumerate(merges)}
    out = {
        r.doc_id: r.tokens
        for r in bpe_encode(df, merges).select("doc_id", "tokens").collect()
    }
    want1 = []
    for w in "spark join join spark".split():
        want1 += bpe_encode_word(w, ranks)
    assert out[1] == want1
    assert out[3] is None  # null text passes through as null


def test_bpe_vocab_and_token_ids(spark):
    """Vocab ids are dense 0..V-1 in lexicographic order and partitioning-
    invariant; bpe_token_ids inverts through the vocab back to the exact
    bpe_encode token stream; out-of-vocab subwords map to -1."""
    from vector_spark.datapipe import bpe_encode, bpe_token_ids, bpe_vocab

    rows = [(1, "spark spark spark joins"), (2, "the stream joins the batch")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_learn(df, num_merges=4)
    vdf = bpe_vocab(df, merges)
    vocab = {r.token: r.token_id for r in vdf.collect()}
    toks = sorted(vocab)
    assert [vocab[t] for t in toks] == list(range(len(toks)))  # dense, ordered
    again = {r.token: r.token_id for r in bpe_vocab(df.repartition(7), merges).collect()}
    assert again == vocab

    enc = {r.doc_id: r.tokens for r in bpe_encode(df, merges).collect()}
    ids = {r.doc_id: r.token_ids for r in bpe_token_ids(df, merges, vocab).collect()}
    inv = {v: k for k, v in vocab.items()}
    for d in (1, 2):
        assert [inv[i] for i in ids[d]] == enc[d]

    oov = spark.createDataFrame([(9, "zzzzq")], "doc_id long, text string")
    (row,) = bpe_token_ids(oov, merges, vocab).collect()
    assert -1 in row.token_ids  # unseen characters -> unk


def test_pack_sequences_token_exact(spark):
    """n_tokens_col drives packing with tokenizer-exact counts: totals per
    doc must equal size(bpe tokens)+1 (eos), not the whitespace count."""
    from pyspark.sql import functions as F

    from vector_spark.datapipe import pack_sequences

    rows = [(1, "spark spark spark"), (2, "join the stream")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_learn(df, num_merges=3)
    ranks = {p: i for i, p in enumerate(merges)}
    enc = bpe_encode(df, merges).withColumn("n_bpe", F.size("tokens").cast("long"))
    packed = pack_sequences(
        enc.select("doc_id", "text", "n_bpe"), seq_len=8, n_tokens_col="n_bpe"
    )
    per_doc = {
        r.doc_id: r.total
        for r in packed.groupBy("doc_id").agg(F.sum("n_tokens").alias("total")).collect()
    }
    for doc_id, text in rows:
        want = sum(len(bpe_encode_word(w, ranks)) for w in text.lower().split()) + 1
        assert per_doc[doc_id] == want, (doc_id, per_doc, want)
