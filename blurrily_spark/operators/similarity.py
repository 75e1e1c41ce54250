"""Embedding similarity search: brute-force cosine top-k + IVF scale path.

Over an ``array<float>`` embedding column. The dot product is a pure SQL
fold (``aggregate(zip_with(...))``) -- JVM-side, deterministic
left-to-right accumulation, no Python in the hot path.

* :func:`cosine_topk`   -- exact brute force: broadcast the query vectors,
  score every corpus row, per-query window top-k. The correctness baseline.
* :func:`ivf_topk`      -- IVF-style ANN: corpus is bucketed by nearest
  coarse centroid; queries probe only ``nprobe`` nearest buckets, cutting
  scored candidates by ~n_centroids/nprobe. Same scoring expression, so
  results are a subset of brute force (exact within probed buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    """Ordered-fold dot product of two array<numeric> columns, as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _py_l2_norm(vec) -> float:
    """Driver-side twin of :func:`l2_norm`: strictly sequential
    left-to-right double accumulation, so the result is bit-identical to
    the JVM fold (both are correctly-rounded IEEE-754 ops in the same
    order -- the same argument as :func:`_probe_buckets`)."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _dlit(x) -> str:
    """SQL text of one exact double literal. ``repr(float)`` round-trips
    finite doubles exactly and SQL decimal/scientific literals cast to the
    nearest double, so the value is bit-identical to ``F.lit(float(x))``;
    non-finite values (possible in dirty embeddings picked up as centroid
    seeds) take the string-cast spelling instead of generating an
    unparseable bare ``nan``/``inf`` token."""
    import math

    v = float(x)
    if math.isfinite(v):
        return f"CAST({v!r} AS DOUBLE)"
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"


def _lit_vec(vec):
    """Literal ``array<double>`` built in ONE ``F.expr`` py4j call instead
    of one ``F.lit`` round-trip per element (a 64-dim codebook of 16
    centroids otherwise costs ~1000 driver round-trips per operator call);
    element-exact per :func:`_dlit`."""
    return F.expr("array(%s)" % ", ".join(_dlit(x) for x in vec))


def _dot_sql(col_name: str, vec) -> str:
    """SQL text of ``dot(col, literal vec)`` -- the same ordered
    zip_with/aggregate fold as :func:`dot` (identical casts, double 0.0
    init, left-to-right accumulation), emitted as a string so an unrolled
    k-centroid score array costs ONE py4j call instead of ~10 per
    centroid."""
    arr = "array(%s)" % ", ".join(_dlit(x) for x in vec)
    return (
        f"aggregate(zip_with(`{col_name}`, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _lit_mat(vecs):
    """Literal ``array<array<double>>`` in one py4j call (see _lit_vec)."""
    inner = ", ".join(
        "array(%s)" % ", ".join(_dlit(x) for x in v)
        for v in vecs
    )
    return F.expr(f"array({inner})")


def _cos_pre(a, b, na, nb):
    """``cosine(a, b)`` with both row norms already materialized as
    columns: ``dot/(na*nb)`` is the same expression tree in the same
    order as ``dot/(l2_norm(a)*l2_norm(b))`` -- bit-identical output --
    but each norm is computed once per ROW instead of once per PAIR,
    cutting ~2/3 of the per-pair fold work (guide §1.2: per-task work)."""
    return dot(a, b) / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cos, rank).

    The query side is broadcast (ANN query batches are dimension-sized);
    ties broken by vec_id ASC for determinism.
    """
    from blurrily_spark.config import spread_small_input

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qv"),
            l2_norm(F.col(query_vec_col)).alias("_qn"),
        )
    )
    scored = spread_small_input(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    ).crossJoin(q).select(
        "query_id",
        "vec_id",
        _cos_pre(F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn")).alias("cos"),
    )
    win = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: nearest centroid by cosine.

    ``centroids`` is a small driver-side list (the coarse codebook --
    at scale it comes out of a sampled k-means; here any deterministic
    sample works). Shipped as a literal array-of-arrays, evaluated JVM-side.
    """
    # Per-centroid scores as an UNROLLED array over a staged row norm: the
    # old transform() over a literal centroid array recomputed l2_norm(vec)
    # once per centroid and l2_norm(c) once per (row, centroid); here the
    # row norm is one staged column (multi-referenced, so CollapseProject
    # cannot re-inline it -- the add_trigrams staging argument) and each
    # centroid norm is a Python-computed literal (bit-identical to the JVM
    # fold: same IEEE ops in the same order, see _py_l2_norm). Same scores,
    # same bucket, ~2x less fold work per row.
    pre = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_nv"),
    )
    scores = F.expr(
        "array(%s)"
        % ", ".join(
            f"{_dot_sql('_v', c)} / (_nv * {_dlit(_py_l2_norm(c))})"
            for c in centroids
        )
    )
    bucket = F.array_position(scores, F.array_max(scores)) - 1
    # the staged row norm rides along as _n so consumers scoring pairs
    # (semantic_dedup) or probes (ivf_topk) need not re-fold it per row
    return pre.select(
        "vec_id",
        "_v",
        bucket.cast("int").alias("bucket"),
        F.col("_nv").alias("_n"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN top-k probing the nprobe nearest centroid buckets per query.

    Bucketed corpus joins query probes on bucket id -- at scale the corpus
    is *stored* partitioned by bucket, so a probe scans only its partitions
    (partition pruning does the IVF inverted-list lookup): that layout is
    :func:`save_ivf_index` + :func:`ivf_topk_stored`, which is plan- and
    behaviorally-verified to touch only probed buckets.
    """
    from blurrily_spark.config import spread_small_input

    bucketed = assign_buckets(spread_small_input(corpus), centroids, id_col, vec_col)

    cents = _lit_mat(centroids)
    qscores = F.transform(cents, lambda c: cosine(F.col("_qv"), c))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qv"),
        l2_norm(F.col(query_vec_col)).alias("_qn"),
        qscores.alias("_cs"),
    )
    # nprobe nearest buckets: rank centroid scores, keep top nprobe indices
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    ranked = F.reverse(F.array_sort(F.zip_with(F.col("_cs"), idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))))
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda p: p["i"])
    q = q.select("query_id", "_qv", "_qn", F.explode(probes).alias("bucket"))

    joined = bucketed.join(F.broadcast(q), "bucket")
    scored = joined.select(
        "query_id",
        "vec_id",
        _cos_pre(F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn")).alias("cos"),
    )
    win = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index: the corpus written ``partitionBy(bucket)``
    (one directory per inverted list) with the coarse codebook stored
    alongside as ``_ivf_codebook`` JSON.

    This is the storage layout :func:`ivf_topk`'s docstring promises: a
    probe against the stored index becomes a *partition-pruned* scan --
    Spark's directory pruning IS the inverted-list lookup, so a
    ``nprobe``/``k``-bucket query reads only those buckets' files and
    never touches the rest of the corpus (verified by plan + inputFiles
    in tests/test_similarity.py). At 100 TB this is the difference
    between scanning ~nprobe/n_lists of the corpus and scanning all of
    it; re-clustering is a rewrite of this table (Iceberg/Delta partition
    evolution on a real cluster).
    """
    import json

    from blurrily_spark.streaming.sink import publish_small_file

    assigned = assign_buckets(corpus, centroids, id_col, vec_col)
    (
        assigned.select("vec_id", F.col("_v").alias("embedding"), "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    publish_small_file(
        corpus.sparkSession,
        f"{path.rstrip('/')}/_ivf_codebook",
        json.dumps(centroids).encode("utf-8"),
    )


def load_ivf_codebook(spark, path: str) -> list[list[float]]:
    """The coarse codebook stored by :func:`save_ivf_index`."""
    import json

    from blurrily_spark.streaming.sink import read_small_file

    raw = read_small_file(spark, f"{path.rstrip('/')}/_ivf_codebook")
    if raw is None:
        raise FileNotFoundError(f"no _ivf_codebook at {path!r}")
    return json.loads(raw.decode("utf-8"))


def _probe_buckets(qvec: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """nprobe nearest centroid indices for one query vector, driver-side.

    Bit-for-bit the same scores as :func:`ivf_topk`'s JVM path: both run a
    strictly sequential left-to-right double accumulation, so Python and
    whole-stage-codegen produce identical IEEE-754 results; the tie rule
    (score DESC, bucket index DESC) mirrors the reversed array_sort there.
    """
    import math

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def _norm(a):
        acc = 0.0
        for x in a:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    qn = _norm(qvec)
    scores = [_dot(qvec, c) / (qn * _norm(c)) for c in centroids]
    order = sorted(range(len(centroids)), key=lambda i: (scores[i], i), reverse=True)
    return order[:nprobe]


def ivf_topk_stored(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int = 100_000,
) -> DataFrame:
    """:func:`ivf_topk` against a :func:`save_ivf_index` table, with the
    probed buckets pushed into the scan as a partition filter.

    The query batch is collected driver-side (ANN query batches are small
    by contract -- they are broadcast in every variant here) to compute
    each query's ``nprobe`` buckets; the corpus read then carries
    ``bucket IN (union of probed buckets)``, which Spark turns into
    directory-level partition pruning -- only the probed inverted lists
    are listed, opened, or scored. Identical results to :func:`ivf_topk`
    with the stored codebook.

    The driver-side collect is bounded: past ``max_queries`` rows (default
    100k -- at typical dims that is well under a gigabyte of vectors, and
    past it the probe union approaches all buckets so pruning buys nothing
    anyway) the call fails loudly instead of OOMing the driver; route big
    query sets through the DataFrame-native :func:`ivf_topk`, which keeps
    the assignment distributed.
    """
    centroids = load_ivf_codebook(spark, path)
    qrows = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_topk_stored collects the query batch driver-side and is "
            f"capped at max_queries={max_queries} rows; use ivf_topk (the "
            f"DataFrame-native path, distributed bucket assignment) for "
            f"larger query sets"
        )
    probe_rows = []
    for r in qrows:
        qv = list(map(float, r["_qv"]))
        for b in _probe_buckets(qv, centroids, nprobe):
            probe_rows.append((r["query_id"], qv, b))
    probes = spark.createDataFrame(
        probe_rows, f"query_id long, _qv array<double>, bucket int"
    )
    all_buckets = sorted({b for _, _, b in probe_rows})
    corpus = (
        spark.read.parquet(path)
        .where(F.col("bucket").isin(all_buckets))
        .select("vec_id", "embedding", "bucket", l2_norm(F.col("embedding")).alias("_n"))
    )
    scored = corpus.join(
        F.broadcast(probes.withColumn("_qn", l2_norm(F.col("_qv")))), "bucket"
    ).select(
        "query_id",
        "vec_id",
        _cos_pre(F.col("embedding"), F.col("_qv"), F.col("_n"), F.col("_qn")).alias("cos"),
    )
    win = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def assign_buckets_df(
    corpus: DataFrame,
    cents_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantization against a *DataFrame* codebook (bucket, cvec).

    The scale path when the codebook is too large to ship as a plan literal
    (e.g. k = 4096 IVF lists): broadcast-join corpus x codebook, score, and
    keep the per-vector argmax via a window. Same tie rule as
    :func:`assign_buckets` (max cosine, then lowest bucket id).
    """
    scored = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    ).crossJoin(F.broadcast(cents_df.select("bucket", "cvec"))).select(
        "vec_id", "_v", "bucket", cosine(F.col("_v"), F.col("cvec")).alias("_s")
    )
    win = Window.partitionBy("vec_id").orderBy(F.col("_s").desc(), F.col("bucket").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select("vec_id", "_v", F.col("bucket").cast("int").alias("bucket"))
    )


def maxmin_centroids(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_seed_scan: int = 100_000,
) -> list[list[float]]:
    """Deterministic farthest-first (maxmin) seeding: start from the
    lowest-id vector, then repeatedly take the vector with the smallest
    maximum cosine to any chosen seed (ties -> lowest id). The k-means++
    idea without its randomness, so both scaling runs and the test oracle
    share a codebook. k driver-side jobs of one distributed argmin each.

    Seeding quality does not need the full corpus, and k full scans would
    dominate codebook training at 100 TB: when the corpus exceeds
    ``max_seed_scan`` rows, the k argmin scans run over a deterministic
    hash-sample of ~max_seed_scan vectors (``pmod(xxhash64(id), m) = 0`` --
    partitioning-independent, so every run and parallelism level draws the
    SAME sample, unlike ``DataFrame.sample``). Lloyd iterations in
    :func:`kmeans_centroids` (the quality driver) stay full-corpus.
    """
    n = corpus.count()
    if n > max_seed_scan:
        m = n // max_seed_scan + 1
        corpus = corpus.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
    first = (
        corpus.orderBy(F.col(id_col).asc()).limit(1).select(vec_col).collect()[0][0]
    )
    cents = [list(map(float, first))]
    for _ in range(k - 1):
        lits = _lit_mat(cents)
        near = F.array_max(F.transform(lits, lambda c: cosine(F.col(vec_col), c)))
        row = (
            corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), near.alias("_near"))
            .orderBy(F.col("_near").asc(), F.col("_id").asc())
            .limit(1)
            .collect()[0]
        )
        cents.append(list(map(float, row["_v"])))
    return cents


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeding: str = "maxmin",
) -> list[list[float]]:
    """Lloyd-iteration coarse codebook (cosine assignment, mean update).

    Fully distributed per iteration: assign (JVM cosine) -> posexplode ->
    groupBy(bucket, dim) mean -> collect k*dim floats to the driver (the
    codebook is dimension-sized by construction). Deterministic: seeds are
    farthest-first from the lowest-id vector (``seeding='maxmin'``) or the
    k lowest-id vectors (``seeding='lowid'``). Empty buckets keep their
    previous centroid.
    """
    if seeding == "maxmin":
        cents = maxmin_centroids(corpus, k, id_col, vec_col)
    else:
        cents = take_centroids(corpus, k, id_col, vec_col)
    for _ in range(iterations):
        assigned = assign_buckets(corpus, cents, id_col, vec_col)
        means = (
            assigned.select("bucket", F.posexplode("_v").alias("dim", "val"))
            .groupBy("bucket", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_bucket: dict[int, dict[int, float]] = {}
        for r in means:
            by_bucket.setdefault(r["bucket"], {})[r["dim"]] = r["m"]
        new_cents = []
        for b, old in enumerate(cents):
            dims = by_bucket.get(b)
            if dims:
                new_cents.append([dims[i] for i in range(len(old))])
            else:
                new_cents.append(old)
        cents = new_cents
    return cents


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact brute force.

    All-pairs cosine with ``id_a < id_b`` -- the O(n^2) correctness
    baseline that validates :func:`rp_lsh_near_dup_pairs` (the scale path).
    Returns (id_a, id_b, cos).
    """
    from blurrily_spark.config import spread_small_input

    withn = spread_small_input(emb).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    a = withn.select(
        F.col("id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = withn.select(
        F.col("id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _cos_pre(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def random_hyperplanes(n_bits: int, dim: int, seed: int = 11) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for angular (sign-bit) LSH."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def rp_signature(vec_col, planes: list[list[float]]):
    """Sign-bit sketch of a vector: bit_j = 1 iff dot(v, plane_j) > 0.

    Packed into one BIGINT (n_bits <= 62). Charikar's angular LSH:
    P[bit differs] = angle(u, v) / pi, so near-duplicate vectors share
    almost every bit and Hamming-chunk blocking applies unchanged.
    """
    assert len(planes) <= 62
    if isinstance(vec_col, str):
        # generated-SQL path (one py4j call for all n_bits plane dots --
        # the Column loop cost ~1.5s of driver time per operator call);
        # term-for-term the same expressions as the Column path below
        return F.expr(
            " + ".join(  # disjoint bits: + == OR
                f"shiftleft(CASE WHEN {_dot_sql(vec_col, p)} > 0 "
                f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END, {j})"
                for j, p in enumerate(planes)
            )
        )
    sig = None
    for j, p in enumerate(planes):
        plane = _lit_vec(p)
        bit = F.when(dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig + term  # disjoint bits: + == OR
    return sig


def rp_lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 32,
    max_hamming: int = 6,
    seed: int = 11,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dups at scale: random-hyperplane LSH + exact rescore.

    1. sketch every vector to an ``n_bits`` sign-bit signature (one scan,
       pure JVM folds);
    2. block on ``max_hamming + 1`` signature chunks (pigeonhole: any pair
       within Hamming <= max_hamming collides on some chunk) -- equi-joins,
       never all-pairs;
    3. exact cosine rescore ``>= threshold`` per candidate.

    Precision is exact (step 3); recall is the probability that a
    qualifying pair lands within ``max_hamming`` sketch bits -- for
    cos >= 0.95 and 32 bits, P[bit differs] <= acos(.95)/pi ~ 0.101, so
    P[Hamming <= 6] > 0.97 per pair (measured in tests). More bits buy
    recall at scale; the blocking contract itself is threshold-derived,
    as in :func:`blurrily_spark.operators.dedup.simhash_near_dups`.
    """
    from blurrily_spark.functions.hashing import chunk_bounds

    from blurrily_spark.config import spread_small_input

    if dim is None:
        first = emb.select(F.size(vec_col)).first()
        dim = int(first[0])
    planes = random_hyperplanes(n_bits, dim, seed)
    sigs = spread_small_input(emb).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
        rp_signature(vec_col, planes).alias("sig"),
    )
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright("sig", lo).bitwiseAND(F.lit((1 << (hi - lo)) - 1)).alias("ckey"),
        )
        for c, (lo, hi) in enumerate(chunk_bounds(max_hamming + 1, n_bits))
    ]
    chunks = sigs.select(
        "id", "_v", "_n", F.explode(F.array(*chunk_structs)).alias("ck")
    ).select(
        "id", "_v", "_n",
        F.col("ck.chunk").alias("chunk"), F.col("ck.ckey").alias("ckey"),
    )
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "chunk", "ckey",
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "chunk", "ckey",
    )
    # cosine rescore + threshold BEFORE the pair dedup: the cosine is a pure
    # function of the pair (identical on every chunk collision of the same
    # pair, so filter/dedup commute), and scoring per collision row is a few
    # hundred FLOPs while deduplicating first would shuffle both full
    # embedding vectors per collision -- the dedup then carries 24 bytes per
    # QUALIFYING pair instead of ~2*dim*4 bytes per raw collision (the same
    # shuffle-narrowing as dedup.simhash_near_dups).
    return (
        a.join(b, ["chunk", "ckey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _cos_pre(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "min_id",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings against a coarse codebook, call members of the same
    cluster whose cosine exceeds ``threshold`` semantic duplicates, and
    keep one representative per connected duplicate group.

    Returns one row per input vector: ``(id, keep_id, is_dup)`` -- the same
    retained-corpus face as :func:`blurrily_spark.operators.dedup.near_dedup`,
    so the two compose (lexical MinHash pass, then a semantic pass over the
    survivors' embeddings).

    ``keep`` elects the representative inside each duplicate group:

    - ``'min_id'`` -- smallest id (deterministic; consistent with every
      other dedup operator here, and what the DuckDB oracle re-derives);
    - ``'far_from_centroid'`` -- the paper's rule: keep the member with the
      LOWEST cosine to its cluster centroid (the one adding most diversity
      to the retained set); ties break to the lowest id. A group that CC
      merged across buckets still elects exactly one keeper (each member's
      centroid cosine is measured against its own bucket).

    Scale shape: pairwise work happens only INSIDE a cluster -- the paper
    sizes k ~ sqrt(n) precisely so clusters stay small -- and it is an
    equi-join on ``bucket``, never an all-pairs product. Threshold fires
    before the edges shuffle into CC; CC iterates over the dup graph only
    (tiny relative to the corpus); one final left join paints keepers back.
    Nothing lives driver-side but the codebook itself.
    """
    from blurrily_spark.operators.cluster import connected_components

    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"keep must be 'min_id' or 'far_from_centroid', got {keep!r}")

    from blurrily_spark.config import spread_small_input

    assigned = assign_buckets(spread_small_input(emb), centroids, id_col, vec_col)
    # Row norms materialized BELOW the pair join (bit-identical cosine, see
    # _cos_pre): the within-cluster join scores ~|cluster|^2 pairs, so
    # computing each norm once per row instead of once per pair removes
    # ~2/3 of the fold work in the dominant stage; assign_buckets already
    # staged the norm as _n.
    withn = assigned.select("vec_id", "_v", "bucket", "_n")
    a = withn.select(
        F.col("vec_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "bucket",
    )
    b = withn.select(
        F.col("vec_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket",
    )
    edges = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            _cos_pre(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"))
            >= threshold
        )
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comps = connected_components(edges).withColumnRenamed("ref", "id")
    ids = assigned.select(F.col("vec_id").cast("long").alias("id"))
    if keep == "min_id":
        keep_col = F.coalesce("entity_id", F.col("id"))
        return ids.join(comps, "id", "left").select(
            "id",
            keep_col.alias("keep_id"),
            (keep_col != F.col("id")).cast("int").alias("is_dup"),
        )
    # far_from_centroid: keeper = argmin (centroid cosine, id) per component.
    # min(struct(...)) is one partial-aggregating shuffle over dup-group
    # members only -- no window, no id negation (ANSI-safe tie-break).
    cents = _lit_mat(centroids)
    ccos = cosine(F.col("_v"), F.element_at(cents, F.col("bucket") + 1))
    members = assigned.select(
        F.col("vec_id").cast("long").alias("id"), ccos.alias("_ccos")
    ).join(comps, "id")
    keepers = (
        members.groupBy("entity_id")
        .agg(F.min(F.struct(F.col("_ccos"), F.col("id"))).alias("_k"))
        .select("entity_id", F.col("_k.id").alias("_keeper"))
    )
    keep_col = F.coalesce("_keeper", F.col("id"))
    return (
        ids.join(comps, "id", "left")
        .join(keepers, "entity_id", "left")
        .select(
            "id",
            keep_col.alias("keep_id"),
            (keep_col != F.col("id")).cast("int").alias("is_dup"),
        )
    )


def take_centroids(
    corpus: DataFrame,
    n: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse codebook: the n lowest-id vectors.

    A stand-in for sampled k-means (out of scope for the engine itself);
    deterministic so tests and both scaling runs share a codebook.
    """
    rows = corpus.orderBy(F.col(id_col).asc()).limit(n).select(vec_col).collect()
    return [list(map(float, r[0])) for r in rows]
