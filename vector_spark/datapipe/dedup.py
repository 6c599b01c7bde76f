"""Document deduplication for training-data pipelines.

Four tiers, all engine-portable (md5 as the hash family so a SQL oracle can
reproduce them bit-for-bit) and all shuffle-disciplined for 100 TB:

  * exact_dedup       — hash-groupBy on md5(text): one shuffle on a 32-byte
                        key, map-side partial agg.
  * minhash_lsh_pairs — shingle -> k minhashes -> banded LSH buckets ->
                        candidate pairs -> exact Jaccard verify. The only
                        pairwise work happens inside LSH buckets, never
                        all-pairs; bucket skew is bounded by banding.
  * simhash           — 16-bit near-dup fingerprint from token hashes; a
                        narrow map (no shuffle) producing a clusterable key.
  * bloom_filter_*    — probabilistic membership tier (Dolma-style): a
                        sparse bit table built with positions-only shuffles
                        and broadcast to the probe; bounded memory at any
                        corpus size, zero false negatives.

No Python in any of these: shingling/minhashing are higher-order column
functions (transform/filter/aggregate), executed in whole-stage codegen.
(One justified exception: ngram_jaccard_pairs' "bitmap" regime is an
Arrow-cogrouped numpy popcount matmul — a bit-parallel kernel no JVM
expression can express; its exact output filter still runs Spark-side.)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import ensure_parallelism

MOD = 1_000_000_007


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per distinct text; exact, by content hash."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def shingle_docs(df: DataFrame, text_col: str = "text", n: int = 3) -> Column:
    """Distinct n-word shingles of the text (single-space tokenization)."""
    words = F.split(F.col(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.array_distinct(shingles)


def _minhash(shingles: Column, perm: int) -> Column:
    """Min over shingles of md5(perm || '|' || shingle) — one 'permutation'
    of the md5 hash family (lexicographic min over uniform hex strings)."""
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{perm}|"), s).cast("binary"))))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 6,
    band_size: int = 2,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold).

    Candidate generation: docs sharing any LSH band bucket; verification:
    exact shingle-set Jaccard. Scale: the band-bucket self-join shuffles on
    the bucket hash; AQE splits skewed buckets."""
    assert num_hashes % band_size == 0
    df = ensure_parallelism(df)  # minhashing is per-row expensive
    docs = df.select(F.col(id_col).alias("doc"), shingle_docs(df, text_col, shingle_n).alias("sh"))
    buckets = _band_buckets(docs, num_hashes, band_size)
    # candidate pairs carry ids only through the shuffle; shingle arrays are
    # joined back afterwards (cheaper exchange at scale)
    left = buckets.select(F.col("doc").alias("doc_a"), "band_key")
    right = buckets.select(F.col("doc").alias("doc_b"), "band_key")
    cand = (
        left.join(right, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pairs = (
        cand.join(docs.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(docs.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = F.round(inter / union, 4)
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


def _hexval(c: Column) -> Column:
    """Hex digit char -> 0..15 via ascii arithmetic (portable to ANSI SQL)."""
    a = F.ascii(c)
    return F.when(a <= 57, a - 48).otherwise(a - 87)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """16-bit SimHash over distinct tokens. Bit j of a token's signature is
    the parity of hex digit j of md5(token); the fingerprint bit is the sign
    of the summed +/-1 votes. Pure column expressions, no shuffle."""
    df = ensure_parallelism(df)  # 16 md5-vote folds per row
    tokens = F.array_distinct(F.split(F.col(text_col), " "))
    hashes = F.transform(tokens, lambda t: F.md5(t.cast("binary")))

    def vote_fn(j: int):
        # closure factory: a default-arg lambda would change the lambda arity
        return lambda acc, h: acc + (_hexval(F.substring(h, j + 1, 1)) % 2) * 2 - 1

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), vote_fn(j))
        out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return df.select(F.col(id_col), out.alias("simhash"))


def _hamming_block_plan(
    bits: int, n_blocks: int, max_hamming: int
) -> list[tuple[int, list[tuple[int, int]]]]:
    """The Manku block-combination key plan: one entry per
    (n_blocks - max_hamming)-subset of blocks, as
    (combo_idx, [(bit_offset, bit_width), ...]). Blocks are nearly equal
    width (the first bits % n_blocks blocks get the extra bit)."""
    from itertools import combinations

    widths = [bits // n_blocks + (1 if i < bits % n_blocks else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    combo_size = n_blocks - max_hamming
    plan = []
    for ci, combo in enumerate(combinations(range(n_blocks), combo_size)):
        plan.append((ci, [(offsets[b], widths[b]) for b in combo]))
    return plan


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    n_blocks: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs within Hamming distance `max_hamming` of each
    other's SimHash fingerprint — the Manku/Jain/Sarma WWW'07 web-crawl
    dedup algorithm ("Detecting Near-Duplicates for Web Crawling"), the
    near tier the reference's dedupe transform (src/transforms/dedupe)
    leaves to offline jobs.

    Candidate generation is the pigeonhole block-combination trick, never
    all-pairs: split the b-bit fingerprint into `n_blocks` nearly-equal
    contiguous blocks. A pair at Hamming distance <= d differs in at most d
    blocks, so it agrees EXACTLY on some (n_blocks - d)-subset; candidates
    are an equi-join on (combo_idx, packed bits of that subset), one join
    key per C(n_blocks, n_blocks-d) combination — Manku's production scheme
    (6 blocks / 20 tables for d=3 at 64 bits). Verification is
    bit_count(xor) on the joined fingerprints; the theorem makes recall
    exact, so output equals the brute-force pair set (which is exactly how
    the oracle recomputes it).

    100 TB scale: the exploded join input is C(n_blocks, n_blocks-d) small
    rows per doc carrying (id, fingerprint, combo key) — text never leaves
    the scan. Key width grows with combo size (default 6 blocks -> ~16-bit
    keys from 32-bit fingerprints), so bucket occupancy falls exponentially
    with corpus entropy; residual hot keys (e.g. all-zero fingerprints from
    empty docs) are AQE-skew-splittable plain equi-joins. The pair-distinct
    is one shuffle on (doc_a, doc_b). Default n_blocks = max_hamming + 1
    degenerates to the single-block pigeonhole (combo size 1).
    """
    assert bits <= 32, "md5 hex-digit vote family provides at most 32 bits"
    fp = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    return hamming_pairs(
        fp, fingerprint_col="simhash", id_col=id_col,
        bits=bits, max_hamming=max_hamming, n_blocks=n_blocks,
    )


def hamming_pairs(
    fp: DataFrame,
    fingerprint_col: str,
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    n_blocks: int | None = None,
) -> DataFrame:
    """The Manku block-combination hamming-ball join over PRECOMPUTED
    fingerprints (any integer column up to 64 bits — simhash, image
    aHash/pHash, audio chromaprint blocks): emits (doc_a, doc_b, hamming)
    for every unordered pair within `max_hamming`. Recall is exact by the
    pigeonhole theorem; see simhash_hamming_pairs for the plan/scale
    analysis (this is its join body, factored out so other modalities
    reuse it). Fingerprint windows that include bit 63 are safe: the
    arithmetic shiftright's sign-extension is masked off by the
    block-width AND."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    assert max_hamming < n_blocks <= bits <= 64

    def packed_key(combo: list[tuple[int, int]]) -> Column:
        key = F.lit(0).cast("long")
        shift = 0
        for off, width in combo:
            blk = F.shiftright(fingerprint_col, off).bitwiseAND(F.lit((1 << width) - 1))
            key = key + F.shiftleft(blk, shift)
            shift += width
        assert shift <= 63, "packed combo key must fit a signed long"
        return key

    plan = _hamming_block_plan(bits, n_blocks, max_hamming)
    keys = fp.select(
        F.col(id_col).alias("doc"),
        F.col(fingerprint_col).alias("_fp"),
        F.explode(
            F.array(*[
                F.struct(F.lit(ci).alias("combo_idx"), packed_key(combo).alias("combo_bits"))
                for ci, combo in plan
            ])
        ).alias("k"),
    ).select("doc", "_fp", "k.combo_idx", "k.combo_bits")
    left = keys.select(
        F.col("doc").alias("doc_a"), F.col("_fp").alias("fp_a"), "combo_idx", "combo_bits"
    )
    right = keys.select(
        F.col("doc").alias("doc_b"), F.col("_fp").alias("fp_b"), "combo_idx", "combo_bits"
    )
    return (
        left.join(right, ["combo_idx", "combo_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(fp_a ^ fp_b)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "counts",
    block_buckets: int | None = None,
    max_vocab: int = 16384,
) -> DataFrame:
    """EXACT character-n-gram Jaccard near-dup pairs (doc_a < doc_b,
    round(jaccard, 4) >= threshold) — the exact tier between md5 dedup and
    the approximate minhash/simhash tiers (reference analogue: dedupe's
    full-event match, src/transforms/dedupe/common.rs, generalized to set
    similarity). All three methods produce IDENTICAL output
    (equality-tested); they trade differently with the corpus:

    * "counts" (default): inverted-index count join — explode distinct
      grams, self-equi-join on gram, |a∩b| = per-pair row count (grams are
      distinct per doc), union from broadcast sizes. No gram arrays ever
      cross a shuffle and there is no per-pair array_intersect. Cost is
      sum(df^2) over gram frequencies — the right plan when the gram
      vocabulary is small/dense relative to the corpus (measured 22s ->
      1.3s warm on the sf0.01 fixture, whose 500 short docs share a tiny
      vocabulary). On Zipf web text the hot grams square — use "prefix".
    * "prefix": PREFIX FILTERING (Chaudhuri et al. ICDE'06; Bayardo, Ma &
      Srikant, WWW'07 "Scaling Up All Pairs Similarity Search"). Order
      every doc's grams by the GLOBAL (frequency, gram) total order —
      rarest first — and keep the first |g| - ceil(t'*|g|) + 1 as its
      prefix (t' = t - 5e-5: the output filter is on ROUND(j,4), which raw
      j >= t - 5e-5 can pass, so the bound uses the slack and verification
      re-applies the exact rounded filter). Lemma (via the globally
      smallest common gram w: >= overlap-1 common grams order after w and
      overlap >= ceil(t'*|x|) on each side, so w is within both prefixes):
      every qualifying pair collides in the prefix equi-join. Hot grams
      are exactly what frequency-ranking pushes OUT of prefixes, so the
      candidate join never squares on stopword-like grams; candidates are
      then verified with one array_intersect each. The web-scale plan.
    * "bitmap": DENSE-VOCABULARY regime (small gram universe, high doc
      frequencies — where prefix filtering cannot prune and counts
      squares). Each doc's gram set becomes a bit vector over the global
      vocabulary; docs hash into `block_buckets` buckets and every bucket
      PAIR (i<=j, the triangle join) is one cogrouped Arrow task whose
      numpy boolean matmul computes ALL pairwise intersection counts in
      the block bit-parallel (the chemistry-fingerprint Tanimoto-search
      layout — no JVM expression can express a popcount matmul, the
      justified-Python criterion). Only (doc_a, doc_b, |a∩b|) rows above
      a loose prefilter leave the UDF; the EXACT round(jaccard,4) filter
      is applied Spark-side from broadcast set sizes, so results are
      engine-exact vs the oracle. Cost is n²/2 word-ops over
      vocab/64-long words — on the sf0.1 fixture (5000 docs, 377-gram
      vocabulary, median pairwise jaccard 0.45, 850k qualifying pairs:
      the OUTPUT itself is Θ(n²)) this replaces the counts plan's ~1.5B
      join rows with 12.5M×6-word AND-popcounts. Guarded by `max_vocab`:
      a web-scale vocabulary raises and points at "prefix".
    * "auto": one tiny distinct-count job on the gram vocabulary picks
      "bitmap" when it fits `max_vocab`, else "prefix".
    * "brute": all-pairs theta-join — O(n^2) BNLJ, verification baseline
      only.

    At 100 TB none of these is the first tier — minhash_lsh_pairs is (its
    recall<1 trade documented there); this op is the exact-answer tool for
    bounded candidate sets and the oracle anchor for the approximate tiers.

    NULL text is treated as "" (all methods, so the IDENTICAL-output
    contract holds: a raw null gram would survive brute's array_intersect
    but vanish from the index methods' equi-joins). threshold must be in
    (0, 1]: at 0 every disjoint pair qualifies, which only the all-pairs
    plans could emit — that is brute-force enumeration, not similarity
    search.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold!r}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(txt) - (n - 1), F.lit(1))),
            lambda i: txt.substr(i, F.lit(n)),
        )
    )
    docs = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_doc"), grams.alias("_g"))
        .withColumn("_sz", F.size("_g"))
    )
    va = docs.select(F.col("_doc").alias("doc_a"), F.col("_g").alias("_ga"), F.col("_sz").alias("_sa"))
    vb = docs.select(F.col("_doc").alias("doc_b"), F.col("_g").alias("_gb"), F.col("_sz").alias("_sb"))
    arr_inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    arr_jac = F.round(arr_inter / (F.col("_sa") + F.col("_sb") - arr_inter), 4)

    if method == "brute":
        pairs = va.join(vb, F.col("doc_a") < F.col("doc_b"))
        return pairs.select("doc_a", "doc_b", arr_jac.alias("jaccard")).filter(
            F.col("jaccard") >= threshold
        )

    toks = docs.select("_doc", "_sz", F.explode("_g").alias("_gram"))

    def _finish(inter: DataFrame) -> DataFrame:
        """(doc_a, doc_b, _i) -> exact round(jaccard,4) filter via the
        broadcast size dim — the shared engine-exact tail."""
        sizes = docs.select("_doc", "_sz")
        jac = F.round(
            F.col("_i") / (F.col("_sa") + F.col("_sb") - F.col("_i")), 4
        )
        return (
            inter.join(
                F.broadcast(sizes.select(F.col("_doc").alias("doc_a"), F.col("_sz").alias("_sa"))),
                "doc_a",
            )
            .join(
                F.broadcast(sizes.select(F.col("_doc").alias("doc_b"), F.col("_sz").alias("_sb"))),
                "doc_b",
            )
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )

    if method == "counts":
        ta = toks.select(F.col("_doc").alias("doc_a"), "_gram")
        tb = toks.select(F.col("_doc").alias("doc_b"), "_gram")
        return _finish(
            ta.join(tb, ["_gram"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("_i"))
        )

    if method == "auto":
        vocab_n = toks.select("_gram").distinct().count()
        method = "bitmap" if vocab_n <= max_vocab else "prefix"

    if method == "bitmap":
        inter = _bitmap_intersections(
            df, threshold, n, text_col, id_col, block_buckets, max_vocab
        )
        jac = F.round(
            F.col("_i") / (F.col("_sa") + F.col("_sb") - F.col("_i")), 4
        )
        return (
            inter.select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )

    if method != "prefix":
        raise ValueError(f"unknown method {method!r} (counts|prefix|bitmap|auto|brute)")

    freq = toks.groupBy("_gram").agg(F.count(F.lit(1)).alias("_df"))
    ranked = toks.join(freq, "_gram").withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("_doc").orderBy(F.col("_df").asc(), F.col("_gram").asc())
        ),
    )
    t_pf = max(threshold - 5e-5, 0.0)  # rounding slack: see docstring
    # -1e-9 before ceil: the float product can land 1 ulp ABOVE the exact
    # integer (fl(t_pf*sz) = k+eps -> ceil k+1 instead of k), which would
    # SHORTEN the prefix past the lemma's bound and drop a qualifying
    # pair. The epsilon only ever lengthens the prefix (safe direction).
    plen = F.col("_sz") - F.ceil(F.lit(t_pf) * F.col("_sz") - F.lit(1e-9)) + 1
    prefix = ranked.filter(F.col("_r") <= plen).select("_doc", "_gram")
    cand = (
        prefix.alias("pa")
        .join(
            prefix.alias("pb"),
            (F.col("pa._gram") == F.col("pb._gram")) & (F.col("pa._doc") < F.col("pb._doc")),
        )
        .select(F.col("pa._doc").alias("doc_a"), F.col("pb._doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cand.join(va, "doc_a").join(vb, "doc_b")
    return verified.select("doc_a", "doc_b", arr_jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _bitmap_intersections(
    df: DataFrame,
    threshold: float,
    n: int,
    text_col: str,
    id_col: str,
    block_buckets: int | None,
    max_vocab: int,
) -> DataFrame:
    """(doc_a, doc_b, _i=|a∩b|, _sa, _sb) for every candidate pair, via the
    triangle block join + numpy boolean matmul (see ngram_jaccard_pairs
    "bitmap").

    ONE Spark job: docs hash into B buckets and each (id, text) row — the
    cheapest possible payload, ~text_len bytes — is replicated by explode
    to the B+1 blocks containing its bucket (the classic triangle-join
    communication bound, O(n·B) with B ≈ sqrt(2·parallelism)). Every
    bucket PAIR (i<=j) is one cogrouped Arrow task that shingles its docs
    in Python (plain slicing — identical semantics to the Spark substr
    expression, property-tested), indexes them against a BLOCK-LOCAL
    vocabulary (intersections never need a global bit assignment — that
    insight removes the global vocab job, the bit join, and the size-dim
    joins the first cut of this kernel paid ~3 scans for), and computes
    all pairwise intersections as one float32 BLAS matmul (exact for
    counts < 2^24; vocab capped far below). Set sizes are the matrix row
    sums, so the exact round(jaccard,4) filter downstream needs no join.
    Only pairs passing a LOOSE prefilter leave Python; the exact filter is
    Spark-side so results stay engine-exact vs the SQL oracle. The
    max_vocab guard raises inside the kernel (zero extra jobs) when a
    block's vocabulary shows the corpus is not in the dense regime.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    n_buckets = block_buckets or max(
        2, math.isqrt(2 * spark.sparkContext.defaultParallelism - 1) + 1
    )
    base = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("_doc"),
            # null -> "" matches the expression path's coalesce (and keeps
            # the Python shingler total: len(None) would TypeError)
            F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
            F.pmod(F.xxhash64(id_col), F.lit(n_buckets)).cast("int").alias("_bkt"),
        )
    )
    # triangle replication via explode (no join): a doc in bucket b serves
    # as LEFT input for blocks (b, j>=b) and RIGHT input for blocks
    # (i<=b, b); each unordered bucket pair is exactly one cogroup task.
    # Right-side columns are suffixed so the self-cogroup resolves
    # unambiguously.
    left = base.select(
        "_doc",
        "_txt",
        F.col("_bkt").alias("_bi"),
        F.explode(F.sequence("_bkt", F.lit(n_buckets - 1))).alias("_bj"),
    )
    right = base.select(
        F.col("_doc").alias("_doc_r"),
        F.col("_txt").alias("_txt_r"),
        F.explode(F.sequence(F.lit(0), "_bkt")).alias("_bi_r"),
        F.col("_bkt").alias("_bj_r"),
    )

    t_pre = max(threshold - 1e-3, 0.0)  # loose: exact round-filter downstream

    def grams(text) -> set:
        # same semantics as the substr expression: positions 1..max(L-n+1,1),
        # trailing grams shorter than n (and "" for empty text) included
        text = text or ""  # Arrow may still surface nulls as None
        return {text[i : i + n] for i in range(max(len(text) - n + 1, 1))}

    def block(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        same = key[0] == key[1]
        if l.empty or r.empty or (same and len(l) < 2):
            return pd.DataFrame({"doc_a": [], "doc_b": [], "_i": [], "_sa": [], "_sb": []})

        lsets = [grams(t) for t in l["_txt"]]
        rsets = lsets if same else [grams(t) for t in r["_txt_r"]]
        vocab: dict = {}
        for s in lsets:
            for g in s:
                if g not in vocab:
                    vocab[g] = len(vocab)
        if not same:
            for s in rsets:
                for g in s:
                    if g not in vocab:
                        vocab[g] = len(vocab)
        if len(vocab) > max_vocab:
            raise ValueError(
                f"block gram vocabulary {len(vocab)} exceeds max_vocab="
                f"{max_vocab}: the bitmap regime needs a small dense "
                "universe — use method='prefix'"
            )

        def pack(sets):
            m = np.zeros((len(sets), len(vocab)), dtype=np.float32)
            for row, s in enumerate(sets):
                m[row, [vocab[g] for g in s]] = 1.0
            return m

        la = pack(lsets)
        rb = la if same else pack(rsets)
        inter = np.rint(la @ rb.T).astype(np.int64)
        sa, sb = la.sum(1).astype(np.int64), rb.sum(1).astype(np.int64)
        union = sa[:, None] + sb[None, :] - inter
        mask = inter >= t_pre * union
        a_ids = l["_doc"].to_numpy()
        b_ids = a_ids if same else r["_doc_r"].to_numpy()
        if same:
            mask &= a_ids[:, None] < b_ids[None, :]
        ai, bi = np.nonzero(mask)
        A, B = a_ids[ai], b_ids[bi]
        swap = A > B
        return pd.DataFrame(
            {
                "doc_a": np.where(swap, B, A),
                "doc_b": np.where(swap, A, B),
                "_i": inter[ai, bi],
                "_sa": np.where(swap, sb[bi], sa[ai]),
                "_sb": np.where(swap, sa[ai], sb[bi]),
            }
        )

    id_type = dict(base.dtypes)["_doc"]
    return (
        left.groupby("_bi", "_bj")
        .cogroup(right.groupby("_bi_r", "_bj_r"))
        .applyInPandas(
            block, f"doc_a {id_type}, doc_b {id_type}, _i long, _sa long, _sb long"
        )
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int | None = 3,
    min_chars: int = 0,
) -> DataFrame:
    """Cross-document span-level exact dedup — the C4 / RefinedWeb / Dolma
    "line-wise dedup" pass generalized to a parameterizable unit: split each
    document into spans (consecutive `span_words`-word blocks, or
    newline-delimited lines when span_words=None), drop every span whose
    exact content already occurred earlier in the corpus (first occurrence
    by (doc_id, span_no) survives), and reassemble the survivors in
    document order. Spans shorter than `min_chars` characters are exempt
    (always kept) — the standard guard that stops blank/boilerplate lines
    from being deleted corpus-wide.

    Returns (doc_id, text_dedup, n_spans, n_removed); a document whose
    every span was removed is still emitted with text_dedup = ''.

    Scale shape (100 TB): first-occurrence detection is a groupBy on
    md5(span) with a map-side partial MIN — a corpus-hot span collapses to
    one row per task before the exchange, so skew dies in the partial agg.
    The keep-join back to the exploded spans shuffles the span text once
    (AQE splits any residual hot key), and reassembly is one groupBy on
    doc_id. Three narrow-payload exchanges total, no window over a
    skewable partition.
    """
    sep = " " if span_words is not None else "\n"
    if span_words is None:
        spans_arr = F.split(F.col(text_col), "\n")
    else:
        words = F.split(F.col(text_col), " ")
        k = span_words
        nblocks = F.greatest(F.ceil(F.size(words) / F.lit(k)), F.lit(1)).cast("int")
        spans_arr = F.transform(
            F.sequence(F.lit(0), nblocks - 1),
            lambda i: F.array_join(F.slice(words, i * k + 1, k), " "),
        )
    # single use of the input: removed spans are FLAGGED (not filtered) so
    # the reassembly groupBy also yields n_spans/n_removed — no second
    # scan of the source, no join back to a per-doc base (collect_list
    # skips the nulls the when() leaves for dropped spans)
    lines = df.select(
        F.col(id_col), F.posexplode(spans_arr).alias("span_no", "span")
    ).withColumn("sh", F.md5(F.col("span").cast("binary")))
    firsts = lines.groupBy("sh").agg(
        F.min(F.struct(F.col(id_col), F.col("span_no"))).alias("first")
    )
    kept = (F.length("span") < min_chars) | (
        (F.col(id_col) == F.col(f"first.{id_col}"))
        & (F.col("span_no") == F.col("first.span_no"))
    )
    flagged = lines.join(firsts, "sh").select(
        id_col, "span_no", "span", kept.alias("_kept")
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("_kept"), F.struct("span_no", "span")))
                ),
                lambda s: s.span,
            ),
            sep,
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_spans"),
        (F.count(F.lit(1)) - F.sum(F.col("_kept").cast("long"))).alias("n_removed"),
    ).select(id_col, "text_dedup", "n_spans", "n_removed")


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Distributed connected components by min-label propagation with
    pointer jumping (the label-contraction half of Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond"): every node's label
    converges to the MINIMUM id in its component — the canonical
    cluster id, independent of partitioning or iteration order.

    Per round: (1) label <- min(label, neighbors' labels) — one join +
    map-side-combined min keyed by node id, ids only through the shuffle;
    (2) label <- label(label) — pointer jump, which halves remaining
    chain depth, so rounds = O(log diameter) instead of O(diameter);
    near-dup graphs have tiny diameters, so 2-4 rounds in practice.
    Convergence is probed with a LIMIT-1 existence job per round (cheap:
    it short-circuits on the first changed label); each round's labels
    are persisted and the previous round unpersisted, so lineage stays
    bounded. Raises RuntimeError if max_iters rounds don't converge
    (log2(diameter) > max_iters never happens on real dedup graphs).

    Returns (id_col, cluster_id, cluster_size); singletons are their own
    cluster of size 1.
    """
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .union(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("lab")
    ).persist()
    converged = False
    for _ in range(max_iters):
        nbr = (
            edges.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy("b")
            .agg(F.min("lab").alias("nlab"))
            .withColumnRenamed("b", "node")
        )
        # least() skips nulls, so un-neighbored nodes keep their label
        stepped = labels.join(nbr, "node", "left").select(
            "node", F.least("lab", "nlab").alias("lab")
        )
        parents = stepped.select(F.col("node").alias("p"), F.col("lab").alias("plab"))
        jumped = (
            stepped.join(parents, stepped["lab"] == parents["p"])
            .select("node", F.col("plab").alias("lab"))
            .persist()
        )
        changed = (
            jumped.join(labels.withColumnRenamed("lab", "old"), "node")
            .filter(F.col("lab") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = jumped
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lab").select(
        F.col("node").alias(id_col),
        F.col("lab").alias("cluster_id"),
        F.col("cluster_size"),
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    max_iters: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTER IDS: the union-find view of fuzzy dedup that
    dedup_ladder deliberately avoids (its pair-membership removal keeps a
    superset of one-per-component). Here the full equivalence classes are
    materialized — (doc_id, cluster_id, cluster_size) with cluster_id =
    min doc id in the component — which is what a corpus audit or a
    "keep the best doc per cluster" policy needs, not just survivor ids.

    Pipeline: MinHash+LSH verified pairs (ids-only bucket shuffle) ->
    min-label propagation with pointer jumping (O(log diameter) rounds;
    see connected_components). Deterministic at any parallelism, so the
    SQL oracle reproduces it via a recursive transitive closure."""
    pairs = minhash_lsh_pairs(
        df, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    ).persist()
    out = connected_components(
        df.select(id_col), pairs, id_col=id_col, max_iters=max_iters
    )
    return out


def dedup_ladder(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """The composed training-data dedup ladder: exact tier then near-dup
    tier, one surviving doc per duplicate neighborhood.

    1. exact: keep the min id per md5(text) (exact_dedup).
    2. near-dup: MinHash+LSH pairs over the exact survivors; any doc that
       is the HIGHER id of a pair is removed (the lower id represents the
       neighborhood). Deterministic without union-find: removal by
       pair-membership is a superset of one-per-connected-component — a
       chain a<b<c removes b and c, keeping a.

    Returns (doc_id, dup_count) — the exact-tier duplicate count rides
    along so downstream sampling can weight by it. Scale: tier 1 is one
    hash-shuffle; tier 2 is the banded pair join over the (already
    deduplicated) survivor set; the final anti-join is ids-only.
    """
    exact = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col), "dup_count"
    )
    survivors = exact.join(df.select(id_col, text_col), id_col)
    pairs = minhash_lsh_pairs(
        survivors, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    removed = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return (
        exact.join(removed, id_col, "left_anti")
        .select(id_col, "dup_count")
    )


def band_key_cols(sh: Column, num_hashes: int, band_size: int) -> list[Column]:
    """One md5 band key per LSH band over a shingle-array column — THE hash
    family (md5('i|shingle') minhash, md5 of the '|'-joined band) shared by
    minhash_lsh_pairs, incremental_dedup, and the streaming twin
    (streaming/ops.py::stream_incremental_dedup), so their buckets are
    interchangeable."""
    mhs = [_minhash(sh, i) for i in range(num_hashes)]
    return [
        F.md5(
            F.concat_ws("|", *[mhs[b * band_size + j] for j in range(band_size)]).cast(
                "binary"
            )
        )
        for b in range(num_hashes // band_size)
    ]


def _band_buckets(
    docs: DataFrame, num_hashes: int, band_size: int
) -> DataFrame:
    """(doc, sh) -> (doc, band_key): the banded-LSH bucket rows."""
    bands = band_key_cols(F.col("sh"), num_hashes, band_size)
    return docs.select(
        "doc", F.explode(F.array_distinct(F.array(*bands))).alias("band_key")
    )


def incremental_dedup(
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
    """Crawl-maintenance dedup: classify each DELTA doc against the
    EXISTING corpus — the incremental path a 100 TB pipeline runs per
    crawl snapshot instead of re-deduping everything. Delta-vs-delta
    duplicates are the batch operators' job and are NOT flagged here.

    Exact tier: corpus md5 -> min(id) lookup table (in production a
    maintained table; here one map-side-combined shuffle over the corpus),
    LEFT-joined to the delta by content hash. `near=True` adds the
    minhash tier: band buckets for BOTH sides with the identical hash
    family as minhash_lsh_pairs, a delta-x-corpus bucket equi-join
    (ids only through the shuffle), exact-Jaccard verification, min
    matching corpus id. Exact match takes precedence over near.

    Returns (id_col, novel, dup_of): novel=true when no corpus doc
    matches; dup_of = the lowest matching corpus id else null.

    At scale: the delta is small relative to the corpus, so the bucket
    join is delta-bucket-driven; corpus-side signatures are recomputed
    here but in production persist as the LSH index table the same
    dataflow maintains."""
    dh = F.md5(F.col(text_col).cast("binary"))
    c_ex = (
        corpus.select(dh.alias("_h"), F.col(id_col).alias("_cid"))
        .groupBy("_h")
        .agg(F.min("_cid").alias("_ex"))
    )
    d = delta.select(F.col(id_col).alias("_did"), dh.alias("_h"))
    out = d.join(c_ex, "_h", "left")
    if near:
        ddocs = delta.select(
            F.col(id_col).alias("doc"), shingle_docs(delta, text_col, shingle_n).alias("sh")
        )
        cdocs = corpus.select(
            F.col(id_col).alias("doc"), shingle_docs(corpus, text_col, shingle_n).alias("sh")
        )
        db = _band_buckets(ensure_parallelism(ddocs), num_hashes, band_size).select(
            F.col("doc").alias("_did"), "band_key"
        )
        cb = _band_buckets(ensure_parallelism(cdocs), num_hashes, band_size).select(
            F.col("doc").alias("_cid"), "band_key"
        )
        cand = db.join(cb, "band_key").select("_did", "_cid").distinct()
        pairs = cand.join(
            ddocs.select(F.col("doc").alias("_did"), F.col("sh").alias("sh_a")), "_did"
        ).join(cdocs.select(F.col("doc").alias("_cid"), F.col("sh").alias("sh_b")), "_cid")
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
        near_min = (
            pairs.filter(F.round(inter / union, 4) >= threshold)
            .groupBy("_did")
            .agg(F.min("_cid").alias("_near"))
        )
        out = out.join(near_min, "_did", "left")
        dup = F.coalesce(F.col("_ex"), F.col("_near"))
    else:
        dup = F.col("_ex")
    return out.select(
        F.col("_did").alias(id_col), dup.isNull().alias("novel"), dup.alias("dup_of")
    )


def dedup_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): delete every token that lies inside a
    k-token window whose exact content occurs >= min_count times anywhere
    in the corpus (including overlapping repeats within one document).
    This is the duplicated-k-gram-coverage formulation of the paper's
    suffix-array pass — a position survives iff NO length-k window through
    it repeats — the same semantics production Bloom-filter variants use,
    re-expressed as Spark relational algebra instead of a suffix array.

    Returns (doc_id, text_dedup, n_tokens, n_removed) for every input doc;
    documents shorter than k tokens are untouched by construction.

    Scale shape (100 TB): the only corpus-wide state is the k-gram
    occurrence count — a groupBy on md5(gram) whose map-side partial agg
    collapses corpus-hot grams per task before the exchange (same skew
    immunity as dedup_spans). Occurrence rows carry (hash, id, pos) ONLY
    — gram text never crosses a shuffle — and the duplicate set flows
    back via a semi-join on the hash. Per-doc reassembly is one groupBy
    on doc_id followed by an in-row interval-cover filter whose cost is
    n_words x n_duplicated_positions, bounded by document length. Three
    narrow exchanges total, no window, no all-pairs anything."""
    df = ensure_parallelism(df)  # gram md5s are per-row expensive
    # NULL text behaves as '' (the oracle's coalesce) so "every input doc
    # comes back" holds with non-null outputs
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(words)
    # gram starts 0..n-k; guarded sequence (sequence() rejects empty bounds)
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = df.select(
        F.col(id_col),
        F.explode(starts).alias("pos"),
        F.md5(F.array_join(F.slice(words, F.col("pos") + 1, k), " ").cast("binary")).alias("gh"),
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gh")
    )
    covered = (
        grams.join(dup, "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("_ps"))
    )
    out = df.select(id_col, text_col).join(covered, id_col, "left")
    ps = F.coalesce(F.col("_ps"), F.array().cast("array<int>"))
    kept = F.filter(
        words,
        lambda w, i: ~F.exists(ps, lambda p: (p <= i) & (i < p + k)),
    )
    return out.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text_dedup"),
        F.size(words).cast("long").alias("n_tokens"),
        (F.size(words) - F.size(kept)).cast("long").alias("n_removed"),
    )


# --------------------------------------------------------------------------
# Bloom-filter membership tier (Dolma / CCNet-style dedup at corpus scale)

def _bloom_positions(col: Column, k: int, m_bits: int) -> Column:
    """k deterministic bit positions in [0, m_bits) for a text value:
    position_i = int(md5(i || '|' || text)[:15 hex]) % m_bits. md5 keeps
    the hash family engine-portable (DuckDB reproduces it bit-for-bit);
    15 hex chars < 2^60 so the modulo stays in BIGINT."""
    return F.array(*[
        (F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), col).cast("binary")), 1, 15), 16, 10)
         .cast("long") % m_bits).alias(f"p{i}")
        for i in range(k)
    ])


def bloom_filter_build(
    df: DataFrame, text_col: str = "text", k: int = 5,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Build a Bloom filter over md5-positions of a text column as a SPARSE
    (word_idx, word_bits) table: bit b of word w is set iff some document
    hashed to position w*64+b.

    100 TB scale: the ONLY shuffle carries (word_idx, one-bit mask) pairs —
    k rows per document, 16 bytes each — combined map-side by bit_or
    partial aggregation; no text crosses the exchange. The result is at
    most m_bits/64 rows (m=2^27 -> <=2 M rows ~= 32 MB), broadcastable to
    the probe side. This is the bounded-memory membership tier the exact
    md5 join cannot provide when the corpus no longer fits a shuffle
    (Dolma's dedupe uses the same construction with a fixed FP budget).
    Reference capability: dedupe transform cache semantics
    (src/transforms/dedupe.rs) generalized to corpus membership."""
    pos = df.select(F.explode(_bloom_positions(F.col(text_col), k, m_bits)).alias("pos"))
    # shiftleft's Python builder takes only literal shift counts; the SQL
    # form accepts a column
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
    return (
        pos.groupBy((F.col("pos") / 63).cast("long").alias("word_idx"))
        .agg(F.bit_or(mask).alias("word_bits"))
    )


def bloom_filter_probe(
    df: DataFrame, bloom: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", k: int = 5, m_bits: int = 1 << 20,
) -> DataFrame:
    """Probe each document against a built filter -> (id, maybe_dup).
    maybe_dup = ALL k positions hit set bits (false positives possible at
    the configured rate, false negatives impossible — pinned by test).

    100 TB scale: positions explode to k ids-only rows, broadcast-hash-join
    against the filter words (the filter is small by construction), and a
    groupBy(id) with a bool_and partial agg; text never leaves the scan."""
    probes = df.select(
        F.col(id_col),
        F.posexplode(_bloom_positions(F.col(text_col), k, m_bits)).alias("i", "pos"),
    ).select(
        id_col,
        (F.col("pos") / 63).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("mask"),
    )
    joined = probes.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.col("word_bits").isNotNull()
           & (F.col("word_bits").bitwiseAND(F.col("mask")) == F.col("mask")))
    return joined.groupBy(id_col).agg(F.bool_and(hit).alias("maybe_dup"))
