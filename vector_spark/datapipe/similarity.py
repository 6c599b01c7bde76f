"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against all candidates; the dot product is a higher-order `zip_with` +
`aggregate` fold, entirely JVM-side. At 100 TB the query side is broadcast
and the candidate scan is embarrassingly parallel: no shuffle except the
final per-query top-k (tiny).

Scale path: random-hyperplane LSH — deterministic pseudo-hyperplanes from a
seeded hash (no stored model), bucket on the sign-bit signature, search only
the query's bucket. Trades recall for a candidate-set reduction of ~2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..session import ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order fold — bit-reproducible across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _argmax_centroid(cents_row: DataFrame, base: DataFrame) -> DataFrame:
    """Assign every `base` row (_id, _v, _n) to its nearest centroid via a
    NARROW expression fold over the one collected centroid row (zero
    assignment exchanges): max rounded-6 cosine, tie -> lowest cid.
    `cents_row` is a single-row frame with `_cents: array<struct>`."""

    def _fold(acc, c):
        cs = F.round(_dot(F.col("_v"), c["_cv"]) / (F.col("_n") * c["_cn"]), 6)
        better = (cs > acc["cs"]) | ((cs == acc["cs"]) & (c["_cid"] < acc["cid"]))
        return F.when(better, F.struct(cs.alias("cs"), c["_cid"].alias("cid"))).otherwise(acc)

    best = F.aggregate(
        F.col("_cents"),
        F.struct(F.lit(-2.0).cast("double").alias("cs"), F.lit(-1).cast("long").alias("cid")),
        _fold,
    )
    return (
        base.join(broadcast(cents_row))
        .withColumn("_best", best)
        .select(
            "_id", "_v", "_n",
            F.col("_best.cid").alias("cluster"),
            F.col("_best.cs").alias("cos_centroid"),
        )
    )


def _collect_cents_row(cents: DataFrame) -> DataFrame:
    return cents.groupBy().agg(
        F.collect_list(F.struct("_cid", "_cv", "_cn")).alias("_cents")
    )


def lloyd_centroids(
    base: DataFrame, n_centroids: int, rounds: int = 1
) -> DataFrame:
    """Deterministic k-means centroids: seeds = the `n_centroids` LOWEST-id
    vectors present, then `rounds` Lloyd updates — each recomputes every
    centroid as the per-dimension mean of its assigned vectors
    (DECIMAL(25,6)-exact sums / exact count, so both engines produce the
    identical double) and keeps the SEED vector for a cluster that captured
    nothing (only possible when two seeds are identical). Cluster labels
    stay the seed ids, so downstream contracts are unchanged.

    Why: lowest-id seeds can all land in one dense region; one update
    materially improves cluster BALANCE — the quantity that bounds per-task
    pairwise work in semantic_dedup and probe fan-in in IVF — at zero
    determinism cost (VERDICT_r3 item 7).

    Scale: per round, ONE extra exchange pair — posexplode to
    (cluster, dim, val) with map-side partial aggregation (each partition
    ships at most n_centroids x dims partials), then an n_centroids-row
    rollup. Assignment itself stays a narrow fold.

    `base` columns: _id, _v (array<double>), _n (norm). Returns
    (_cid, _cv, _cn)."""
    seeds = base.orderBy("_id").limit(n_centroids).select(
        F.col("_id").alias("_cid"), F.col("_v").alias("_cv"), F.col("_n").alias("_cn")
    )
    cents = seeds
    for _ in range(rounds):
        cells = _argmax_centroid(_collect_cents_row(cents), base)
        means = (
            cells.select("cluster", F.posexplode("_v").alias("_pos", "_val"))
            .groupBy("cluster", "_pos")
            .agg(
                (
                    F.sum(F.col("_val").cast("decimal(25,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("_m")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                    lambda s: s["_m"],
                ).alias("_mv")
            )
        )
        nv = F.coalesce(F.col("_mv"), F.col("_cv"))
        cents = (
            seeds.join(means, seeds["_cid"] == means["cluster"], "left")
            .select(
                "_cid",
                nv.alias("_cv"),
                F.sqrt(_dot(nv, nv)).alias("_cn"),
            )
        )
    return cents


def cosine_topk(
    df: DataFrame,
    query_ids: list[int] | Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank, cosine).

    Deterministic: rank orders by rounded cosine desc then neighbor id —
    rounding makes the ordering stable across engines/float paths."""
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    norm = F.sqrt(_dot(F.col("_v"), F.col("_v")))
    base = base.withColumn("_n", norm)
    if isinstance(query_ids, list):
        qfilter = F.col("_id").isin(query_ids)
    else:
        qfilter = query_ids
    q = base.filter(qfilter).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), F.col("_n").alias("_qn")
    )
    c = base.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_cv"), F.col("_n").alias("_cn"))
    sims = (
        c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    brute_force: bool = False,
    dims: int = 64,
    bands: int = 4,
    band_planes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) — the embedding tier of the dedup ladder (exact -> minhash ->
    simhash -> embedding).

    Default path (scale-safe): banded random-hyperplane LSH, the same trade
    as minhash banding. Each vector gets `bands` independent sign-bit
    signatures (band_planes planes each, plan-time literal hyperplanes from
    make_planes so an external oracle can replay them); candidate pairs are
    those agreeing on ANY band's full signature — an equi-join on
    (band, signature) carrying ONLY ids through the shuffle — and every
    candidate is then verified against the true cosine. Recall < 1 by
    construction (a pair whose angle splits every band is missed); more
    bands raise recall, more planes/band cut candidates. The plan is hash
    joins only — never BroadcastNestedLoopJoin / CartesianProduct.

    brute_force=True keeps the exact all-pairs theta-join (O(n^2) — the
    verification baseline for small n, never for 100 TB).
    """
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    base = base.withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    cos_ab = F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
    if brute_force:
        a = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
        b = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        return pairs.select("id_a", "id_b", cos_ab.alias("cosine")).filter(
            F.col("cosine") >= threshold
        )

    band_structs = []
    for b in range(bands):
        planes = make_planes(dims, band_planes, seed=seed + 101 * b)
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                lsh_signature_from_planes(F.col("_v"), planes).alias("sig"),
            )
        )
    sigs = base.select("_id", F.explode(F.array(*band_structs)).alias("bs")).select(
        "_id", F.col("bs.band").alias("_band"), F.col("bs.sig").alias("_sig")
    )
    left = sigs.select(F.col("_band").alias("b1"), F.col("_sig").alias("s1"), F.col("_id").alias("id_a"))
    right = sigs.select(F.col("_band").alias("b2"), F.col("_sig").alias("s2"), F.col("_id").alias("id_b"))
    cand = (
        left.join(
            right,
            (F.col("b1") == F.col("b2"))
            & (F.col("s1") == F.col("s2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    verified = cand.join(va, "id_a").join(vb, "id_b")
    return verified.select("id_a", "id_b", cos_ab.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def ivf_ann_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_rounds: int = 1,
) -> DataFrame:
    """IVF-flat ANN: deterministic centroids — the `n_centroids` lowest-id
    vectors as seeds, refined by `lloyd_rounds` deterministic Lloyd updates
    (lloyd_centroids: DECIMAL-exact means, fully reproducible) — every
    vector assigned to its nearest centroid (one broadcast pass), queries
    probe their `n_probe` nearest cells. Recall < 1; candidate set shrinks
    ~n_probe/n_centroids.

    Plan (VERDICT_r4 item 1): the CORPUS side is assigned with the narrow
    `_argmax_centroid` expression fold — zero exchanges, scan-speed, the
    same fold semantic_dedup/embedding_outliers use (rounded-6 cosine, tie
    -> lowest cid, so the assignment is bit-identical to the old
    row_number path). Only the QUERY rows (always a tiny list) pay the
    (query x n_centroids) window for their top-n_probe cells. Nothing in
    the plan shuffles on the corpus `_id` (plan-asserted in tests)."""
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    base = base.withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    # seeds refined by one deterministic Lloyd round (cluster balance bounds
    # probe fan-in; labels stay the seed ids)
    cents = lloyd_centroids(base, n_centroids, rounds=lloyd_rounds)
    # nearest centroid per vector: narrow fold, max cosine, tie -> lowest cid
    cells = _argmax_centroid(_collect_cents_row(cents), base).select(
        "_id", "_v", "_n", F.col("cluster").alias("_cell")
    )
    # query rows only: rank ALL centroids to find the n_probe nearest cells
    qbase = base.filter(F.col("_id").isin(query_ids))
    qsims = qbase.join(broadcast(cents), how="cross").select(
        "_id", "_cid",
        F.round(_dot(F.col("_v"), F.col("_cv")) / (F.col("_n") * F.col("_cn")), 6).alias("_cs"),
    )
    w = Window.partitionBy("_id").orderBy(F.col("_cs").desc(), F.col("_cid").asc())
    probes = (
        qsims.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .select(F.col("_id").alias("query_id"), F.col("_cid").alias("_cell"))
    )
    q = qbase.select(
        F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), F.col("_n").alias("_qn")
    )
    cand = cells.join(broadcast(probes), ["_cell"]).filter(F.col("_id") != F.col("query_id"))
    scored = cand.join(broadcast(q), ["query_id"]).select(
        "query_id",
        F.col("_id").alias("neighbor_id"),
        F.round(_dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_n")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def make_planes(dims: int, n_planes: int, seed: int = 7) -> list[list[int]]:
    """Deterministic +/-1 hyperplanes from md5(seed|plane|dim) parity —
    computed at PLAN time in Python, so the identical constants can be
    embedded in a SQL oracle (engine-portable, no runtime hash calls)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()[0] % 2 else -1
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def lsh_signature_from_planes(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-bit signature against precomputed +/-1 planes: bit p = sign of
    <v, plane_p>. The weighted sum is a zip_with against a literal array —
    whole-stage codegen, no hash calls per row."""
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        comp = F.round(
            F.aggregate(
                F.zip_with(vec, lits, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,  # engine-portable sign test (summation-order float noise)
        )
        sig = sig + F.when(comp > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_signature(vec: Column, dims: int, planes: int = 8, seed: int = 7) -> Column:
    """Random-hyperplane signature without a stored model: plane p's
    component d is a deterministic +/-1 from xxhash64(seed, p, d). The sign
    of <v, plane> contributes bit p."""
    def plane_fn(p: int):
        return lambda x, i: x * (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) * 2 - 1
        ).cast("double")

    sig = F.lit(0)
    for p in range(planes):
        comp = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dims - 1)), plane_fn(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(comp > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_ann_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 6,
) -> DataFrame:
    """ANN top-k searching only the query's LSH bucket (recall < 1)."""
    plane_vecs = make_planes(dims, planes)
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        lsh_signature_from_planes(_as_double(F.col(vec_col)), plane_vecs).alias("_bucket"),
    ).withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    q = base.filter(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), F.col("_n").alias("_qn"), "_bucket"
    )
    sims = (
        base.join(broadcast(q), ["_bucket"])
        .filter(F.col("_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            F.round(_dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_n")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_rounds: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    embedding clustering — cluster every vector to its nearest centroid,
    then prune WITHIN each cluster any doc whose cosine to a lower-id
    cluster-mate is >= threshold. Clustering makes the pairwise step
    tractable: the all-pairs comparison is confined to a cluster, so the
    self-join is an equi-join on the cluster key (shuffle size ~= sum of
    cluster sizes squared / n, not n^2). Pairs across clusters are never
    compared — that recall loss is the SemDeDup trade, same as the paper.

    Deviations from the paper, for determinism + oracle replay (the repo
    convention used by every dedup tier, see dedup.py::exact_dedup):
    centroid seeds are the `n_centroids` LOWEST-id vectors actually present
    (a global ids-only top-k — no assumption that ids start at 0; same
    seeding as ivf_ann_topk) refined by `lloyd_rounds` deterministic Lloyd
    updates (lloyd_centroids: DECIMAL-exact per-dimension means, replayable
    in any engine), and the kept representative is
    the LOWEST id in a duplicate relation (the paper keeps the lowest
    centroid-similarity example). Cosines round to 6 decimals before every
    comparison so ordering is stable across engines/float paths.

    Returns (vec_id, cluster, cos_centroid, keep) for EVERY input row —
    keep=false marks the pruned duplicates.

    At 100 TB: centroid assignment is a NARROW pass — the centroid set is
    collected into one broadcast array row and the argmax is an expression
    fold (order-independent comparator, so collect_list order can't leak),
    so assignment adds zero exchanges; the only data shuffle is the
    cluster-keyed self-join, where `n_centroids` is the knob bounding
    per-task pair work (size it so n/k ~= 10k docs/cluster); AQE skew-join
    splits a hot cluster.
    """
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    base = base.withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    # seeds + deterministic Lloyd refinement (cluster balance bounds the
    # per-task pairwise work below); assignment stays a narrow fold
    cents_row = _collect_cents_row(lloyd_centroids(base, n_centroids, rounds=lloyd_rounds))
    cells = _argmax_centroid(cents_row, base)
    a = cells.select(F.col("cluster").alias("_ca"), F.col("_id").alias("_ida"),
                     F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = cells.select(F.col("cluster").alias("_cb"), F.col("_id").alias("_idb"),
                     F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    dup_ids = (
        a.join(b, (F.col("_ca") == F.col("_cb")) & (F.col("_ida") < F.col("_idb")))
        .filter(
            F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
            >= threshold
        )
        .select(F.col("_idb").alias("_dup"))
        .dropDuplicates(["_dup"])
    )
    return (
        cells.join(dup_ids, cells["_id"] == dup_ids["_dup"], "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            "cos_centroid",
            F.col("_dup").isNull().alias("keep"),
        )
    )


def embedding_outliers(
    df: DataFrame,
    n_centroids: int = 16,
    min_cos: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_rounds: int = 1,
) -> DataFrame:
    """Embedding-space OUTLIER pruning — the prototypicality filter of
    Sorscher et al. 2022 ("Beyond neural scaling laws": rank examples by
    distance to their cluster prototype) as a curation gate: a vector
    whose rounded cosine to its assigned centroid falls below `min_cos`
    sits off the corpus manifold (OCR noise, wrong-modality embeds,
    garbage pages) and is flagged keep=false. The complement of
    semantic_dedup: that prunes points too CLOSE to a neighbor, this
    prunes points too FAR from every prototype; the two share the same
    deterministic lowest-id + Lloyd-refined centroids (lloyd_centroids),
    so a curation topology computes the centroid set once.

    Returns (vec_id, cluster, cos_centroid, keep) for every input row.

    At 100 TB this is the cheapest embedding gate in the suite: the
    centroid set collapses to ONE broadcast row and the assignment is a
    narrow expression fold — zero data exchanges beyond lloyd_centroids'
    bounded (n_centroids x dims) partials."""
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    base = base.withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    cents_row = _collect_cents_row(
        lloyd_centroids(base, n_centroids, rounds=lloyd_rounds)
    )
    cells = _argmax_centroid(cents_row, base)
    return cells.select(
        F.col("_id").alias(id_col),
        "cluster",
        "cos_centroid",
        (F.col("cos_centroid") >= F.lit(min_cos)).alias("keep"),
    )


def decontaminate_semantic(
    df: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_vec_col: str | None = None,
    bench_id_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-tier benchmark decontamination — the semantic complement
    of corpus.decontaminate's word-n-gram rule: a paraphrased eval item
    shares no 13-gram with its source but still sits at high cosine, so
    training docs whose embedding is >= `threshold` cosine to ANY
    benchmark embedding are flagged (the published embedding-dedup /
    contamination sweep shape, e.g. SemDeDup Abbas et al. 2023 §A applied
    cross-corpus).

    Output per input doc: nearest benchmark id (lowest id on rounded-6
    ties; -1 when the benchmark is empty), the rounded-6 max cosine, and
    keep = max_cos < threshold.

    100 TB plan: an eval suite is SMALL by construction (10^3..10^5 rows),
    so the WHOLE benchmark rides one collected broadcast row and the scan
    side is a narrow expression fold per doc — ZERO exchanges of the
    corpus, no LSH recall trade, embarrassingly parallel (the
    _argmax_centroid device). A benchmark too big to broadcast is the
    embedding_near_dup_pairs banded-LSH join instead — that op exists;
    this one is deliberately the exact tier."""
    bvec = bench_vec_col or vec_col
    bid = bench_id_col or id_col
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    base = base.withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    # the benchmark IS the "centroid" set: reuse the shared broadcast-fold
    # argmax (same rounded-6 cosine, -2.0/-1 init, lowest-id tie-break)
    bench_cents = benchmark.select(
        F.col(bid).alias("_cid"),
        _as_double(F.col(bvec)).alias("_cv"),
    ).withColumn("_cn", F.sqrt(_dot(F.col("_cv"), F.col("_cv"))))
    assigned = _argmax_centroid(_collect_cents_row(bench_cents), base)
    return assigned.select(
        F.col("_id").alias(id_col),
        F.col("cluster").alias("bench_id"),
        F.col("cos_centroid").alias("max_cos"),
        (F.col("cos_centroid") < F.lit(threshold)).alias("keep"),
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    scale = max|x| / 127, q_i = floor(x_i * 127 / max|x| + 0.5) — the
    standard scalar-quantized ANN index layout (public FAISS SQ8 /
    ScaNN recipe family). A zero vector quantizes to zeros with scale 0.

    floor(r + 0.5) rather than round(): IEEE-754 double multiply/divide
    then floor is bit-identical in any engine, so the quantization is
    hash-exact replayable (ties at .5 have no engine-dependent branch),
    where round()'s half-even/half-up tie rules differ across engines.

    100 TB: this is the index-build map — narrow, zero shuffle, output
    4x smaller than float32 (the win: a quantized ANN index's bucket
    shuffles and broadcast centroids move 4x less data, and integer dot
    products vectorize). Quantized cosine needs no dequantization: the
    per-vector scales cancel, cos = dot(q1,q2)/sqrt(|q1|^2*|q2|^2) —
    see quantized_cosine_topk."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    q = F.when(
        mx == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x * 127.0 / mx + F.lit(0.5)).cast("int"))
    )
    keep = [c for c in df.columns if c != vec_col]
    return df.select(
        *keep, (mx / 127.0).alias("scale"), q.alias("qvec")
    )


def quantized_cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over the INT8-quantized index — the
    baseline the quantized IVF/LSH tiers compare against, and the proof
    that the scales cancel: cosine(q1*s1, q2*s2) =
    dot(q1,q2)/sqrt(||q1||^2 ||q2||^2) uses integer dot products only
    (exact in binary64 up to 2^53 — dims*127^2 is far below), so the
    rounded scores are engine-exact, not approximately equal.

    Same contract as cosine_topk (rank by rounded-6 cosine desc, id
    tiebreak); scores differ from the float path only by quantization
    error (~1e-3 at dims=64). 100 TB: the candidate side carries
    (id, int8 vec) — 4x less shuffle/broadcast traffic than float."""
    qz = quantize_embeddings(ensure_parallelism(df), vec_col, id_col)
    base = qz.select(
        F.col(id_col).alias("_id"),
        "qvec",
        F.aggregate(
            "qvec", F.lit(0).cast("long"),
            lambda acc, x: acc + (x * x).cast("long"),
        ).alias("_n2"),
    )
    q = base.filter(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"),
        F.col("qvec").alias("_qv"),
        F.col("_n2").alias("_qn2"),
    )
    c = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("qvec").alias("_cv"),
        F.col("_n2").alias("_cn2"),
    )
    dot = F.aggregate(
        F.zip_with("_qv", "_cv", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sims = c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.when(
            (F.col("_qn2") == 0) | (F.col("_cn2") == 0), F.lit(0.0)
        ).otherwise(
            F.round(
                dot.cast("double")
                / F.sqrt(F.col("_qn2").cast("double") * F.col("_cn2").cast("double")),
                6,
            )
        ).alias("cosine_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_q")
    )
