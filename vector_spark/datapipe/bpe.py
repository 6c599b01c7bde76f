"""Deterministic BPE: learn a merge table, encode text to subword tokens.

Closes the tokenizer loop around text.py::bpe_pair_counts (which computes
ONE merge round's statistic): `bpe_learn` iterates the rounds to a learned
merge table, `bpe_encode` applies it so pack_sequences / token budgets can
be token-exact instead of regex-approximate. Public recipe: Sennrich,
Haddow & Birch 2016 (arXiv:1508.07909) §3.2 — count adjacent symbol pairs
over the word-frequency dictionary, merge the most frequent pair
everywhere, repeat. Determinism: ties broken by (count desc, pair
lexicographic asc); encoding applies merges by rank (lowest first), all
occurrences left-to-right.

Scale shape (100 TB):
- learn: ONE corpus shuffle (word-frequency groupBy with map-side combine —
  the exchange carries per-partition DISTINCT words, never raw tokens);
  the merge iteration then runs driver-side over the (pruned) dictionary,
  exactly like real tokenizer trainers — the dictionary, not the corpus,
  is the training input. `max_vocab_words` + `min_freq` bound the driver
  set; the cut is frequency-ranked with word tie-breaks, so it is
  partitioning-invariant.
- encode: ZERO shuffles — an Arrow-batched pandas UDF walks each doc's
  words with a per-batch word→tokens memo (Python cost ~ distinct words
  per batch, not corpus tokens). The dictionary-join alternative
  (encode distinct words, join back) would shuffle the exploded corpus
  twice; inline-with-memo keeps the fact table narrow and scan-parallel.

No reference-engine counterpart (the reference has no tokenizer); cited
recipe is the public paper.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_parallelism

_INF = float("inf")


# ---------------------------------------------------------------------------
# pure-Python learner / encoder cores (driver-side; also the test reference)
# ---------------------------------------------------------------------------


def _merge_all(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge every occurrence of `pair`, scanning left to right."""
    out: list[str] = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def bpe_learn_py(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Sennrich §3.2 over a word-frequency dict. Returns the merge table in
    rank order. Deterministic: best pair = (max count, lexicographically
    smallest pair)."""
    words: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        if w:
            t = tuple(w)
            words[t] = words.get(t, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, f in words.items():
            for a, b in zip(w, w[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        rebuilt: dict[tuple[str, ...], int] = {}
        for w, f in words.items():
            m = _merge_all(w, best)
            rebuilt[m] = rebuilt.get(m, 0) + f
        words = rebuilt
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a rank-ordered merge table to one word (classic tokenizer
    apply loop): repeatedly find the lowest-rank adjacent pair present and
    merge ALL its occurrences left-to-right, until none applies."""
    toks = list(word)
    while len(toks) >= 2:
        best_rank = _INF
        best_pair = None
        for a, b in zip(toks, toks[1:]):
            r = ranks.get((a, b), _INF)
            if r < best_rank:
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        toks = list(_merge_all(tuple(toks), best_pair))
    return toks


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def bpe_learn(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    max_vocab_words: int = 100_000,
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn a merge table from a corpus: one word-frequency shuffle, then
    the driver-side Sennrich loop over the top-`max_vocab_words` dictionary
    (frequency-ranked, word-lexicographic tie-break — the cut is
    partitioning-invariant, so the learned table is replayable at any
    parallelism)."""
    words = (
        ensure_parallelism(df)
        .select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") >= min_freq)
        .orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(max_vocab_words)
    )
    freqs = {r.w: r.f for r in words.collect()}
    return bpe_learn_py(freqs, num_merges)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize `text_col` into subword tokens with the learned merge
    table: adds `out_col` (array<string>, whitespace words expanded to
    their BPE segments in order). Arrow-batched pandas UDF, zero shuffle;
    a per-batch memo makes the Python cost proportional to distinct words
    per batch (Zipf makes that small), not corpus tokens."""
    return ensure_parallelism(df).withColumn(
        out_col, _encode_udf(merges)(F.col(text_col))
    )


def _encode_udf(merges: list[tuple[str, str]], vocab: dict[str, int] | None = None):
    """THE tokenization walk shared by bpe_encode and bpe_token_ids —
    one body so the lower()/split()/None semantics can never drift
    between the subword-string and token-id surfaces. `vocab` switches
    the per-word memo from subword strings to ids (-1 = unk)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>" if vocab is None else "array<int>")
    def enc(texts):
        memo: dict[str, list] = {}

        def one(t):
            if t is None:
                return None
            out: list = []
            for w in t.lower().split():
                hit = memo.get(w)
                if hit is None:
                    segs = bpe_encode_word(w, ranks)
                    hit = memo[w] = (
                        segs if vocab is None else [vocab.get(s, -1) for s in segs]
                    )
                out.extend(hit)
            return out

        return texts.map(one)

    return enc


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """The (token, token_id) vocabulary induced by the merge table over
    this corpus: every distinct subword bpe_encode emits, ids dense
    0..V-1 in lexicographic (binary UTF-8) token order — deterministic at
    any parallelism, reproducible by a SQL oracle's row_number.

    Cost shape: the corpus is NOT re-encoded — distinct words are
    extracted first (one map-side-combined shuffle over the Zipf-bounded
    word dictionary, the same cut bpe_learn makes), and only the
    dictionary rows run the Arrow encode. The single-partition window at
    the end is justified: V is bounded by |alphabet| + len(merges)
    (tokenizer-sized, thousands), independent of corpus size."""
    from pyspark.sql import Window

    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("w")
        )
        .distinct()
    )
    enc = bpe_encode(words, merges, text_col="w")
    toks = enc.select(F.explode("tokens").alias("token")).distinct()
    w = Window.orderBy("token")
    return toks.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int")
    )


def bpe_token_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Tokenize straight to TOKEN IDS (array<int>) — what the training
    shards actually store. Same zero-shuffle Arrow walk and per-batch word
    memo as bpe_encode (the shared _encode_udf body, so tokenization can
    never drift between the string and id surfaces), fused with the vocab
    lookup so the corpus is tokenized once, not twice; `vocab` is the
    collected bpe_vocab mapping (tokenizer-sized, broadcast in the UDF
    closure — the dict is V entries, never corpus-scale). Unknown
    subwords map to -1 (unk)."""
    return ensure_parallelism(df).withColumn(
        out_col, _encode_udf(merges, vocab)(F.col(text_col))
    )
