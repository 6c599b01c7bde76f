"""Text analysis for training-data curation: quality scoring, token
counting, fingerprinting, n-gram language ID.

All pure column expressions (codegen, zero Python, no shuffle) — at 100 TB
these run at scan speed inside the same stage as the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import ensure_parallelism

MOD = 1_000_000_007

STOPWORDS = ["the", "a", "and", "of", "to"]

# character-trigram profiles for language ID: the classic n-gram approach
# (Cavnar & Trenkle '94) with the 24 highest-frequency trigrams per language
# drawn from public letter-frequency tables (spaces count — " th"/"er " are
# the strongest signals). Score = fraction of the text's trigrams present in
# the profile; prediction = argmax (ties -> lexicographic).
LANG_TRIGRAMS = {
    "en": [
        " th", "the", "he ", "ing", "ng ", " an", "and", "nd ", "ed ",
        " to", "to ", "er ", " of", "of ", "at ", " in", "ion", "on ",
        " is", "is ", "en ", " be", "es ", " re",
    ],
    "de": [
        "er ", "en ", "ch ", "der", " de", "die", " di", "ie ", "ein",
        " ei", "ich", "sch", "und", " un", "nd ", "ung", "gen", " ge",
        "ten", "cht", "das", " da", "ber", "ne ",
    ],
    "fr": [
        " de", "de ", "es ", "le ", " le", "ent", "nt ", "la ", " la",
        "et ", " et", "ion", "on ", "re ", " re", "une", " un", "ur ",
        "que", " qu", "ue ", "ais", "our", " pa",
    ],
    # es vs pt is the discriminative pair: both share de/que/ent cores, so
    # each profile carries its unique markers (es: el/la/ión/y; pt: ão/ção/
    # do/da/em/um) — tests/test_datapipe.py separates them on real sentences
    "es": [
        " de", "de ", " la", "la ", "os ", " qu", "que", "ue ", "el ",
        " el", "en ", " en", "ent", "nte", " co", "con", "es ", " es",
        "ión", "ció", "ado", " y ", "del", "a l",
    ],
    "pt": [
        " de", "de ", " a ", "os ", "as ", " qu", "que", "ue ", "ão ",
        "ção", " co", "com", "do ", " do", "da ", " da", "em ", " em",
        "ent", "nte", " um", "uma", "par", "ara",
    ],
    "it": [
        " di", "di ", " co", "to ", "la ", " la", "no ", "ne ", "re ",
        "che", " ch", "he ", "ion", "zio", "one", "lla", "ell", "del",
        " de", "ta ", "ato", " un", "na ", "e d",
    ],
    "nl": [
        "en ", " de", "de ", "et ", " he", "het", "an ", " va", "van",
        "n d", "een", " ee", "er ", "der", " ge", "ijk", "aar", "oor",
        " vo", "te ", " en", "at ", " da", "ver",
    ],
    "sv": [
        "en ", " de", "de ", "et ", "ar ", " oc", "och", "ch ", " at",
        "att", "tt ", " är", "är ", " so", "som", "om ", " fö", "för",
        "ör ", "ing", "ng ", "det", "den", " ha",
    ],
    "pl": [
        "ie ", " ni", "nie", " po", " pr", "prz", "rze", " w ", "na ",
        " na", "ch ", " do", " za", "ego", "go ", " je", "st ", "owa",
        "wie", "ych", "ej ", " si", "się", "ani",
    ],
    "id": [
        "an ", " me", "ng ", "ang", " di", "kan", " ke", " se", "eng",
        "nga", " da", "dan", "ah ", "yan", " be", "ber", "nya", "ya ",
        " pe", "per", "ter", "men", " ya", "ada",
    ],
    "ro": [
        " de", "de ", " în", "în ", "ul ", "ui ", "lui", " cu", "cu ",
        "re ", "are", " ca", "că ", " că", "ea ", "le ", " pe", "pe ",
        " și", "și ", "te ", "ate", "rea", " la",
    ],
    "tr": [
        " bi", "bir", "ir ", "lar", "ler", "an ", "en ", "in ", "ın ",
        " de", "de ", "da ", " ve", "ve ", "ar ", "eri", "arı", "er ",
        "ik ", " ka", " ya", "ile", "le ", "nda",
    ],
    "cs": [
        " př", "pře", " ne", "ní ", "ou ", " po", " se", "se ", " na",
        "na ", " je", "je ", "ho ", "ce ", " st", "ost", " to", "to ",
        "la ", "ně ", " že", "že ", "pro", " pr",
    ],
    # da vs no vs sv is the Scandinavian discriminative trio: the shared
    # er/en/et/de/og/at core is useless, so each profile leans on its
    # orthographic markers (da: af/med/ere; no: av/på/ikk/jeg; sv: och/är/
    # att/som — redundant with the sv profile above)
    "da": [
        "er ", "en ", "et ", " de", "de ", "der", " og", "og ", " at",
        "at ", " fo", "for", " ti", "til", "il ", "ke ", "ed ", " me",
        "med", "nde", "ere", " ha", "det", " af",
    ],
    "no": [
        "er ", "en ", "et ", " de", "de ", "det", " og", "og ", " at",
        "at ", "for", " fo", "til", " ti", "ikk", "kke", " av", "av ",
        " på", "på ", "jeg", " je", "ter", "ene",
    ],
    "fi": [
        "en ", "in ", "an ", "on ", " on", "ssa", "ssä", "sta", "tä ",
        "ta ", "aan", "een", "lla", "llä", "ist", "sen", "nen", " ja",
        "ja ", "ksi", "ell", "itt", "tte", "ain",
    ],
    "hu": [
        " a ", " az", "az ", " me", "meg", "el ", "en ", "ek ", "et ",
        "tt ", "ett", "nek", "nak", "ség", "és ", " és", "egy", " eg",
        " sz", "sze", "hog", "ogy", "gy ", "ban",
    ],
    # ca vs es/pt: els/ls / i /ió endings are the Catalan markers against
    # the shared de/que/ent Romance core
    "ca": [
        " de", "de ", "es ", " la", "la ", "el ", " el", " qu", "que",
        "ue ", "ent", "nt ", " i ", "els", "ls ", " pe", "per", "er ",
        "ió ", "ció", "at ", " le", "les", "una",
    ],
    "vi": [
        " ng", "ng ", "nh ", " nh", " th", " ch", "ông", " kh", "khô",
        "hôn", " đư", "đượ", "ược", " củ", "của", "ủa ", " và", "và ",
        " cá", "các", " mộ", "một", "ột ", "iệc",
    ],
    "ru": [
        " пр", "про", " не", "не ", " на", "на ", " то", "то ", "ть ",
        "ет ", "ние", "ени", "ого", "го ", " по", "ств", " ко", "ая ",
        "ли ", " ст", "ать", " в ", "ост", "ов ",
    ],
}


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/word/stopword-ratio quality features per doc."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words).cast("long")
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast("long")
    n_distinct = F.size(F.array_distinct(words)).cast("long")
    avg_word_len = F.round(
        (F.length(F.col(text_col)) - (n_words - 1)).cast("double") / n_words, 4
    )
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.round(n_stop.cast("double") / n_words, 4).alias("stopword_ratio"),
        F.round(n_distinct.cast("double") / n_words, 4).alias("distinct_ratio"),
        avg_word_len.alias("avg_word_len"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter runs, digit
    runs, and single non-space symbols counted separately)."""
    ws = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    bpe = F.regexp_count(F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")).cast("long")
    return df.select(F.col(id_col), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Two fingerprints: content md5 of the normalized text, and a rolling
    polynomial hash (h = h*31 + ascii(first char of token) mod p) — the
    order-sensitive cheap fingerprint."""
    norm = F.lower(F.trim(F.col(text_col)))
    tokens = F.split(norm, " ")
    rolling = F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.ascii(F.substring(t, 1, 1))) % MOD,
    )
    return df.select(
        F.col(id_col),
        F.md5(norm.cast("binary")).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


def langid(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: list[str] | None = None,
) -> DataFrame:
    """Character-trigram language ID: extract every char trigram of the
    lowercased text (pure JVM exprs — sequence + substr, scan-speed), score
    each language as the fraction of trigrams present in its 24-trigram
    profile, predict argmax (ties -> lexicographic). Texts shorter than 3
    chars score 0.0 everywhere.

    Cost is linear in the number of profiles (one lookahead-regex scan per
    language); `languages` restricts scoring to a subset so a pipeline that
    only cares about, say, en/de/fr pays for 3 scans, not 20."""
    langs = sorted(_langid_profiles(languages))
    scores = langid_scores(text_col, languages)
    df = ensure_parallelism(df)  # one regex scan per profile per row
    # two-stage: scores materialize as attributes, then the argmax chain
    # references the attributes — each regex appears ONCE in the plan
    # (CollapseProject keeps the stage split: the scores are non-cheap
    # and multiply-referenced). See langid_pick's composition rule.
    staged = df.select(
        F.col(id_col), *[scores[l].alias(f"score_{l}") for l in langs]
    )
    return staged.select(
        F.col(id_col),
        *[F.col(f"score_{l}") for l in langs],
        langid_pick(langs, lambda l: F.col(f"score_{l}")).alias("predicted_lang"),
    )


def _langid_profiles(languages: list[str] | None) -> dict[str, list[str]]:
    if languages is not None:
        unknown = set(languages) - set(LANG_TRIGRAMS)
        if unknown:
            raise ValueError(f"unknown language profiles: {sorted(unknown)}")
        return {k: LANG_TRIGRAMS[k] for k in languages}
    return LANG_TRIGRAMS


def langid_scores(
    text_col: str = "text", languages: list[str] | None = None
) -> dict[str, Column]:
    """Per-language trigram-hit-ratio score expressions, lang -> Column.
    hits = positions where any profile trigram starts. A zero-width
    lookahead alternation counts OVERLAPPING occurrences in one regex
    scan (the engine advances one char per zero-width match) — ~20x
    faster than materializing the n-2 trigram array per doc and
    filtering it, and exactly equal to that count."""
    profiles = _langid_profiles(languages)
    norm = F.lower(F.col(text_col))
    n_tri = F.length(norm) - 2
    return {
        lang: F.when(
            n_tri >= 1,
            F.round(
                F.regexp_count(
                    norm, F.lit("(?=(?:" + "|".join(profile) + "))")
                ).cast("double")
                / n_tri.cast("double"),
                4,
            ),
        ).otherwise(F.lit(0.0))
        for lang, profile in profiles.items()
    }


def langid_pick(langs: list[str], score) -> Column:
    """Argmax with lexicographic tie-break (first sorted lang wins on >=)
    over per-language score columns; `score` maps lang -> Column.

    COMPOSITION RULE: pass ATTRIBUTE references (stage the raw score
    expressions in their own projection first, as langid()/crawl_pipeline
    do). The tie-break chain references every score 2*(n-1) times — built
    over the raw regexp expressions it duplicates each regex ~40x into
    the plan (measured: a 461 KB physical plan with 1520 embedded regex
    scans and whole-stage codegen bailing out)."""
    order = sorted(langs)
    best = None
    for lang in order:
        cond = None
        for other in order:
            if other == lang:
                continue
            c = (score(lang) > score(other)) if other < lang else (score(lang) >= score(other))
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit(order[0]))


def langid_exprs(text_col: str = "text", languages: list[str] | None = None) -> dict[str, Column]:
    """The langid output as an ordered name->Column dict for SINGLE-
    projection fusion. The predicted_lang chain embeds every score
    expression ~2n times — fine for few languages, pathological for all
    20 (see langid_pick); wide-profile composers should stage
    langid_scores() as columns and apply langid_pick over the attributes
    instead (langid()/curation_pipeline/crawl_pipeline do)."""
    profiles = _langid_profiles(languages)
    scores = langid_scores(text_col, languages)
    out: dict[str, Column] = {f"score_{lang}": scores[lang] for lang in sorted(profiles)}
    out["predicted_lang"] = langid_pick(sorted(profiles), lambda l: scores[l])
    return out


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def quality_filter_gopher(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 — the
    standard public web-text curation gates, also used by C4/RefinedWeb
    variants): word-count bounds, mean-word-length bounds, symbol-to-word
    ratio (# and ... as junk markers), and required stopword presence.
    Emits one boolean per rule plus the conjunctive `keep` — callers filter
    on `keep` or inspect per-rule flags for curation dashboards. Pure
    column expressions: runs at scan speed, no shuffle, trivially
    partition-parallel at 100 TB."""
    exprs = gopher_quality_exprs(
        text_col, min_words, max_words, min_avg_word_len, max_avg_word_len,
        max_symbol_ratio, min_stopword_hits,
    )
    return df.select(F.col(id_col), *[v.alias(k) for k, v in exprs.items()])


def gopher_quality_exprs(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    words: Column | None = None,
) -> dict[str, Column]:
    """quality_filter_gopher's output as an ordered name->Column dict, for
    fusing into a wider single-scan projection (curation_pipeline). Pass
    `words` to reuse a pre-staged tokenization column (splitting is
    otherwise re-embedded in every expression — HOFs don't codegen, so a
    fused filter would re-split per rule)."""
    if words is None:
        words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n_words = F.size(words).cast("long")
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    avg_wl = F.round(total_word_chars.cast("double") / F.greatest(n_words, F.lit(1)), 4)
    n_symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"#|\.\.\.", ""))
    )
    sym_ratio = F.round(n_symbols.cast("double") / F.greatest(n_words, F.lit(1)), 4)
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(GOPHER_STOPWORDS)))
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_wl = (avg_wl >= min_avg_word_len) & (avg_wl <= max_avg_word_len)
    ok_sym = sym_ratio <= max_symbol_ratio
    ok_stop = stop_hits >= min_stopword_hits
    return {
        "n_words": n_words,
        "avg_word_len": avg_wl,
        "symbol_ratio": sym_ratio,
        "stopword_hits": stop_hits.cast("long"),
        "ok_word_count": ok_words,
        "ok_word_len": ok_wl,
        "ok_symbols": ok_sym,
        "ok_stopwords": ok_stop,
        "keep": ok_words & ok_wl & ok_sym & ok_stop,
    }


# Gopher repetition thresholds (Rae et al. 2021, Table A1): a document is
# dropped when the most frequent n-gram covers too much of it, or too many
# of its characters sit inside n-grams that occur more than once.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _ngram_run_stats(words: Column, n: int) -> Column:
    """Fold a doc's sorted word-n-gram array into
    struct(top_chars, dup_chars) in ONE pass — no explode, no shuffle.
    top_chars = top_count * len(top_gram) for the most frequent n-gram if
    it occurs >= 2 times else 0 (ties -> lexicographically smallest gram);
    dup_chars = sum over grams occurring >= 2 times of count * len(gram)
    (overlap-ignoring charge, the common public reimplementation of the
    Gopher appendix).

    Built for INTERPRETED evaluation: higher-order functions never enter
    whole-stage codegen, so the merge lambda runs tree-walk per element —
    the state is lean and every heavy reference is a lambda variable
    (a struct-rebuilding finalize embedded per field cost ~7x this
    formulation on 54-word docs). The tie-break needs only strict '>':
    runs close in ascending gram order, so on a tie the incumbent is
    already the lexicographically smaller gram."""
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    srt = F.array_sort(grams)
    zero = F.lit(0).cast("long")

    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("top_cnt"),
        F.lit("").alias("top_gram"),
        zero.alias("dup_chars"),
    )

    def merge(acc, g):
        same = acc["prev"] == g
        better = (~same) & (acc["run"] > acc["top_cnt"])
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(better, acc["run"]).otherwise(acc["top_cnt"]).alias("top_cnt"),
            F.when(better, acc["prev"]).otherwise(acc["top_gram"]).alias("top_gram"),
            (
                acc["dup_chars"]
                + F.when(
                    (~same) & (acc["run"] >= 2), acc["run"] * F.length(acc["prev"])
                ).otherwise(zero)
            ).alias("dup_chars"),
        )

    def finish(acc):
        last_better = acc["run"] > acc["top_cnt"]
        top_cnt = F.when(last_better, acc["run"]).otherwise(acc["top_cnt"])
        top_gram = F.when(last_better, acc["prev"]).otherwise(acc["top_gram"])
        dup = acc["dup_chars"] + F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(zero)
        return F.struct(
            F.when(top_cnt >= 2, top_cnt * F.length(top_gram)).otherwise(zero).alias("top_chars"),
            dup.alias("dup_chars"),
        )

    return F.aggregate(srt, init, merge, finish)


def repetition_filter_gopher(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram_max: dict[int, float] | None = None,
    dup_ngram_max: dict[int, float] | None = None,
) -> DataFrame:
    """The repetition half of the Gopher quality rules (Rae et al. 2021
    §A1.1, Table A1), complementing quality_filter_gopher's length/symbol/
    stopword gates: per n, the fraction of the document's characters
    covered by its single most frequent word-n-gram
    (top_{n}gram_frac = top_count * len(top_gram) / n_chars) and the
    fraction sitting inside n-grams that occur more than once
    (dup_{n}gram_frac = sum(count * len(gram) for count >= 2) / n_chars).
    Emits one fraction + ok flag per rule and the conjunctive `keep`.

    Defaults are the published thresholds: top 2/3/4-grams capped at
    20/18/16%, duplicated 5..10-grams capped at 15..10%.

    Scale: each rule is one array_sort + one fold over the row's own
    n-grams — pure JVM expressions, zero Python, zero shuffle; the whole
    filter runs inside the scan stage at 100 TB. The DuckDB oracle uses
    the opposite formulation (unnest -> GROUP BY -> max/sum) on purpose.

    Implementation: three STAGED projections (words -> one fold struct per
    rule -> fracs/flags). HOF folds evaluate interpreted, so each fold
    must run exactly once per row; Catalyst's CollapseProject keeps the
    stages apart because the intermediate aliases are referenced more
    than once."""
    top_ngram_max = GOPHER_TOP_NGRAM_MAX if top_ngram_max is None else top_ngram_max
    dup_ngram_max = GOPHER_DUP_NGRAM_MAX if dup_ngram_max is None else dup_ngram_max
    all_ns = sorted(set(top_ngram_max) | set(dup_ngram_max))
    df = ensure_parallelism(df)  # ~1 ms/doc of interpreted folds: spread it
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    s1 = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        words.alias("_w"),
    )
    s2 = s1.select(
        id_col,
        "n_chars",
        *[_ngram_run_stats(F.col("_w"), n).alias(f"_st{n}") for n in all_ns],
    )
    denom = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    cols = [F.col(id_col), F.col("n_chars")]
    keep = F.lit(True)
    for n, mx in sorted(top_ngram_max.items()):
        frac = F.round(F.col(f"_st{n}.top_chars").cast("double") / denom, 4)
        ok = frac <= mx
        cols += [frac.alias(f"top_{n}gram_frac"), ok.alias(f"ok_top_{n}gram")]
        keep = keep & ok
    for n, mx in sorted(dup_ngram_max.items()):
        frac = F.round(F.col(f"_st{n}.dup_chars").cast("double") / denom, 4)
        ok = frac <= mx
        cols += [frac.alias(f"dup_{n}gram_frac"), ok.alias(f"ok_dup_{n}gram")]
        keep = keep & ok
    return s2.select(*cols, keep.alias("keep"))


def gopher_repetition_exprs(
    text_col: str = "text",
    top_ngram_max: dict[int, float] | None = None,
    dup_ngram_max: dict[int, float] | None = None,
    words: Column | None = None,
) -> dict[str, Column]:
    """repetition_filter_gopher's output as an ordered name->Column dict,
    for fusing into a wider single-scan projection (curation_pipeline).
    Selecting ALL entries evaluates each rule's fold up to twice (frac +
    ok); prefer selecting only what the fusion needs (`keep` costs one
    fold per rule) and pass a pre-staged `words` column — the staged
    repetition_filter_gopher is the every-column path."""
    top_ngram_max = GOPHER_TOP_NGRAM_MAX if top_ngram_max is None else top_ngram_max
    dup_ngram_max = GOPHER_DUP_NGRAM_MAX if dup_ngram_max is None else dup_ngram_max
    if words is None:
        words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n_chars = F.length(F.col(text_col)).cast("long")
    denom = F.greatest(n_chars, F.lit(1)).cast("double")
    out: dict[str, Column] = {"n_chars": n_chars}
    keep = F.lit(True)
    for n, mx in sorted(top_ngram_max.items()):
        st = _ngram_run_stats(words, n)
        frac = F.round(st["top_chars"].cast("double") / denom, 4)
        ok = frac <= mx
        out[f"top_{n}gram_frac"] = frac
        out[f"ok_top_{n}gram"] = ok
        keep = keep & ok
    for n, mx in sorted(dup_ngram_max.items()):
        st = _ngram_run_stats(words, n)
        frac = F.round(st["dup_chars"].cast("double") / denom, 4)
        ok = frac <= mx
        out[f"dup_{n}gram_frac"] = frac
        out[f"ok_dup_{n}gram"] = ok
        keep = keep & ok
    out["keep"] = keep
    return out


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard LLM training-data prep step (context-window packing input).
    Tokens are whitespace words; window i starts at i*stride
    (stride = chunk_tokens - overlap) and carries up to chunk_tokens
    words. A tail window whose content lies entirely inside the previous
    window's overlap is not emitted:
    n_chunks = 1 if n <= chunk_tokens else ceil((n - overlap) / stride).

    Emits (doc_id, chunk_id, chunk_text, n_tokens). Pure column
    expressions + one posexplode — a narrow map at any scale (output rows
    ≈ input tokens / stride, no shuffle)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)) / F.lit(stride))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * stride + 1, chunk_tokens), " "),
    )
    out = df.select(F.col(id_col), n.alias("_n"), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
    n_tokens = F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_id") * stride).cast("long")
    return out.select(id_col, "chunk_id", "chunk_text", n_tokens.alias("n_tokens"))


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
    terminal_re: str = r'[.!?"”]$',
) -> DataFrame:
    """C4's published LINE-wise cleaning rules (Raffel et al. 2020 §2.2,
    the pass that turned Common Crawl into C4), the per-line complement of
    the doc-level Gopher gates: keep a line iff it ends in terminal
    punctuation, has >= min_words words, and doesn't mention "javascript";
    then keep the DOC iff >= min_lines lines survive and the page contains
    neither "lorem ipsum" nor a curly brace. The reference's remap+filter
    pair can express the doc gate but not the line surgery — this is the
    datapipe-native op a curation topology calls between html_text and the
    dedup tiers.

    Emits (doc_id, text_clean, n_lines, n_kept, keep) for every input row
    (gate projected, not filtered — callers compose; same convention as
    quality_filter_gopher).

    Scale: in-row array folds over split(text, '\\n') — scan-speed, zero
    shuffle, whole-stage codegen; nothing here can skew."""
    lines = F.split(F.col(text_col), "\n")
    words_of = lambda l: F.size(F.filter(F.split(l, " "), lambda w: w != ""))  # noqa: E731
    line_ok = lambda l: (  # noqa: E731
        F.rtrim(l).rlike(terminal_re)
        & (words_of(l) >= min_words)
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, line_ok)
    low = F.lower(F.col(text_col))
    keep_doc = (
        (F.size(kept) >= min_lines)
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        keep_doc.alias("keep"),
    )


def badwords_filter(
    df: DataFrame,
    words: list[str] | tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4's published word-blocklist gate (Raffel et al. 2020 §2.2: drop
    any page containing a word from a banned-word list — the same rule
    RefinedWeb/FineWeb keep as a URL+content word filter). The list is a
    caller parameter: curation stacks vendor their own (C4 used the public
    "List of Dirty, Naughty, Obscene..." repo); tests use neutral stand-ins.

    Matching is whole-token on a shared deterministic tokenization —
    lower(text) split on `[^a-z0-9]+` — NOT a substring scan, so "scanner"
    never trips a "scan" entry and both engines agree byte-for-byte. The
    list rides in the plan as a LITERAL array (blocklists are
    tokenizer-sized: the public lists are 100s-2000s of words), so the
    gate is an in-row `filter` fold over the token array: scan-speed, zero
    shuffle, zero Python, nothing to skew. A corpus-sized list would
    instead need the tokens exploded into a broadcast semi-join — that
    formulation is the dedup ladder's, deliberately not this one's.

    Emits (doc_id, n_bad, bad_distinct, keep) for every input row (gate
    projected, not filtered — callers compose; the c4_line_filter
    convention): n_bad = total banned-token occurrences, bad_distinct =
    how many list entries appear at least once, keep = n_bad == 0.
    """
    bad = F.array(*[F.lit(w.lower()) for w in dict.fromkeys(words)])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    hits = F.filter(toks, lambda t: F.array_contains(bad, t))
    return df.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_bad"),
        F.size(F.array_distinct(hits)).cast("long").alias("bad_distinct"),
        (F.size(hits) == 0).alias("keep"),
    )


# PII patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookarounds, ASCII \d and \b in both engines) so the DuckDB oracle can
# run the identical expressions. Redaction order matters only for
# overlaps; counts are per-pattern on the ORIGINAL text.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"(?:\+\d{7,15}|\b\d{3}-\d{3}-\d{4})\b", "[PHONE]"),
    "ccn": (r"\b\d{13,16}\b", "[CCN]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """PII detection + redaction for training-data curation: per document,
    the count of each PII pattern (email / SSN / phone / credit-card-like
    digit run / IPv4) on the original text, and the text with every match
    replaced by its placeholder, applied in dict order (the datapipe-level
    sweep over VRL's single-pattern `redact`,
    website/cue/reference/remap/functions/redact.cue).

    Pure regexp_count/regexp_replace column expressions — scan-speed, no
    shuffle, no Python."""
    df = ensure_parallelism(df)  # 2 regex scans per pattern per doc
    pats = PII_PATTERNS if patterns is None else patterns
    cols = [F.col(id_col)]
    red = F.col(text_col)
    for name, (pat, repl) in pats.items():
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl.replace("$", r"\$"))
    cols.append(red.alias("text_redacted"))
    return df.select(*cols)


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic quota sampling: keep exactly min(k, |stratum|) rows
    per stratum, chosen by md5(stratum || id) rank (id tie-break) — the
    data-mixing primitive (fixed per-source / per-language budgets) whose
    selection is reproducible across runs and engines.

    Scale: one shuffle on the strata columns + a per-stratum window
    bounded by the stratum's row count; hot strata are bounded by k in the
    OUTPUT but still sort their full input partition — for corpus-scale
    strata (e.g. one language = 40% of 100 TB), pre-filter with a cheap
    hash-threshold pass (sample_hash at ~2k/|stratum|) before ranking."""
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat_ws("|", *[F.col(c).cast("string") for c in strata_cols],
                    F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*strata_cols).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def bpe_pair_counts(
    df: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """One BPE-training merge round (Sennrich et al. 2016 §3.2): count
    adjacent character pairs across the corpus, weighted by word frequency
    — the statistic a tokenizer trainer computes to pick the next merge.

    Dataflow: explode to words -> word-frequency groupBy (map-side combine
    collapses each partition's dictionary, so the shuffle carries DISTINCT
    words per partition, not tokens) -> per distinct word, adjacent pairs
    via a transform over char positions (narrow — pair expansion happens
    AFTER frequency aggregation, on the small distinct-word set) -> pair
    groupBy sum -> global top-n (rounded rank ties broken by pair text).

    Returns (rank, pair_left, pair_right, pair_count) — rank 1 is the
    merge BPE would perform next. At 100 TB the token explosion never
    crosses a shuffle un-aggregated; both exchanges carry dictionaries.
    """
    words = (
        ensure_parallelism(df)
        .select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pair_pos = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.struct(
            F.col("w").substr(i, F.lit(1)).alias("a"),
            F.col("w").substr(i + 1, F.lit(1)).alias("b"),
        ),
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(F.col("f"), F.explode(pair_pos).alias("p"))
        .select(F.col("p.a").alias("pair_left"), F.col("p.b").alias("pair_right"), "f")
        .groupBy("pair_left", "pair_right")
        .agg(F.sum("f").alias("pair_count"))
    )
    w = Window.orderBy(
        F.col("pair_count").desc(), F.col("pair_left").asc(), F.col("pair_right").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("rank", "pair_left", "pair_right", "pair_count")
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keywords by smoothed tf-idf:
    score = tf * ln((N + 1) / (df + 1)), rounded to 6 decimals (the repo's
    cross-engine float convention), ties broken by term text.

    Dataflow: explode -> (doc, term) count with map-side combine
    (shuffle 1 carries per-partition distinct doc-term cells) -> document
    frequency groupBy over the term dictionary (shuffle 2, dictionary-
    sized) -> term-keyed equi-join of the two (sort-merge at scale; the
    term dictionary is NOT broadcastable at 100 TB) + one broadcast
    corpus-count row -> per-doc top-k window (shuffle 3 on doc id).
    Returns (doc_id, rank, term, tf, score)."""
    toks = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_row = df.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_row))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log((F.col("_n").cast("double") + 1.0) / (F.col("_df").cast("double") + 1.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "score")
    )


def corpus_stats(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus observability report over ROLLUP(group_cols): per slice and
    for every prefix total (lang, lang x source, grand total) — docs,
    whitespace tokens, chars, distinct texts, mean tokens/doc. The thing a
    curation run publishes after every stage.

    ROLLUP expands the grouping sets map-side and partially aggregates
    before any exchange; the exact distinct-text count makes the whole
    thing Spark's two-phase distinct aggregate, so every shuffle carries
    (grouping, md5) keys — 32-byte dictionary traffic, never payloads
    (plan-asserted). Swap countDistinct for approx_count_distinct when a
    mergeable single-pass sketch is preferred over exactness at 100 TB."""
    toks = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    return (
        ensure_parallelism(df)
        .select(
            *group_cols,
            toks.alias("_t"),
            F.length(text_col).cast("long").alias("_c"),
            F.md5(F.col(text_col).cast("binary")).alias("_h"),
        )
        .rollup(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_t").alias("tokens"),
            F.sum("_c").alias("chars"),
            F.countDistinct("_h").alias("distinct_texts"),
            F.round(F.sum("_t").cast("double") / F.count(F.lit(1)), 4).alias("avg_tokens"),
        )
    )


def normalize_text(
    df: DataFrame,
    form: str = "NFC",
    lower: bool = False,
    collapse_ws: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode-normalize text (NFC/NFKC/NFD/NFKD) — the canonicalization
    every dedup/fingerprint pipeline applies before hashing, so 'café'
    composed and decomposed hash identically.

    The JVM SQL surface has no normalizer, so this is one of the repo's
    few justified Python paths: an Arrow-batched pandas_udf
    (Series.str.normalize — vectorized ICU-backed C, never per-row
    Python objects), narrow, in the scan stage. `lower`/`collapse_ws`
    stay JVM expressions around it. Returns (id_col, text_col)."""
    import pandas as pd  # noqa: F401  (documents the Arrow batch contract)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.str.normalize(form)

    out = _norm(F.col(text_col))
    if lower:
        out = F.lower(out)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.select(F.col(id_col), out.alias(text_col))
