"""Deduplication operators for large-scale text corpora.

Beyond the reference's scope (blurrily only fuzzy-*finds*), these are the
dedup primitives a training-data pipeline needs, built on the same
normalize/shingle machinery:

* exact duplicates       -- hash-groupBy on normalized text;
* n-gram Jaccard         -- exact set similarity over word shingles;
* MinHash + LSH          -- the scale path: signature banding turns the
  quadratic all-pairs problem into an equi-join on band keys;
* SimHash                -- 64-bit fingerprints, near-dups via Hamming
  distance with band-exact-match blocking.

All hot-path expressions are JVM-side (xxhash64, higher-order functions);
ANSI mode is respected -- MinHash permutations run in the Mersenne-prime
modular space (p = 2^31 - 1) so no multiplication can overflow int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blurrily_spark.functions.tokenizer import normalize

MERSENNE = 2_147_483_647  # 2^31 - 1


def _norm_col(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("_norm", normalize(F.col(text_col)))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized text: every row labeled with its canonical
    (minimum) id; ``is_dup`` marks rows that would be dropped.

    One shuffle (hash partition by text hash); the window min is computed
    per normalized-text group.
    """
    win = Window.partitionBy("_norm")
    return (
        _norm_col(df, text_col)
        .withColumn("canonical_id", F.min(id_col).over(win))
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
        .select(F.col(id_col), "canonical_id", "is_dup")
    )


def word_shingles(col, w: int = 3):
    """Sliding word w-grams over normalized text, as array<string>.

    Pure SQL: split -> transform(sequence) -> dedup. Empty/short texts
    yield the whole text as a single shingle.
    """
    words = F.split(col, " ")
    n = F.size(words)
    return F.array_distinct(
        F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(0), n - F.lit(w)),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, w)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def shingle_pairs_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (the brute-force baseline).

    Explode shingles -> self-join on shingle -> count intersections ->
    jaccard vs per-doc shingle counts. Quadratic in the worst case; the
    scale path is :func:`minhash_lsh_pairs`, which this validates.
    """
    sh = (
        _norm_col(df, text_col)
        .select(F.col(id_col).alias("id"), F.explode(word_shingles(F.col("_norm"), w)).alias("sh"))
        .distinct()
    )
    counts = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "jaccard")
    )


def _permutation_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutations."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE - 1), rng.randrange(0, MERSENNE - 1))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    num_hashes: int = 32,
    seed: int = 7,
) -> DataFrame:
    """MinHash signatures: (id, sig array<long> of length num_hashes).

    sig_j = min over shingles s of ((a_j * (xxhash64(s) mod p) + b_j) mod p).
    Modular arithmetic keeps every product < 2^62 (ANSI-safe). All JVM-side:
    one xxhash64 per shingle, then `num_hashes` array_min(transform(...)).
    """
    params = _permutation_params(num_hashes, seed)
    base = _norm_col(df, text_col).select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(F.col("_norm"), w),
            lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE)),
        ).alias("_h"),
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_h"),
                    lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE)),
                )
            )
            for a, b in params
        ]
    )
    return base.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate near-dup candidate pairs via LSH banding.

    Signatures are cut into ``bands`` bands of ``num_hashes/bands`` rows;
    a pair collides if any band matches exactly. Returns
    ``(id_a, id_b, est_jaccard)`` where est_jaccard is the fraction of
    matching signature positions. The pair-generation join is an equi-join
    on (band_idx, band_hash) -- linear in colliding docs, never all-pairs.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, w, num_hashes, seed)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            "_",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bhash"),
                ),
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))

    a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bhash")
    b = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bhash")
    cand = (
        a.join(b, ["band", "bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(
        num_hashes
    ))
    return cand.select("id_a", "id_b", est.alias("est_jaccard"))


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over normalized word tokens: (id, simhash long).

    bit_k(doc) = sign of sum over tokens of (+1 if bit k of xxhash64(token)
    else -1). Computed as 64 conditional sums after one explode -- a single
    aggregation pass, no Python.
    """
    toks = _norm_col(df, text_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col("_norm"), " ")).alias("tok"),
    )
    toks = toks.withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{k}")
        for k in range(64)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    fp = None
    for k in range(64):
        bit = F.when(F.col(f"b{k}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, k)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select("id", fp.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Blocking: split the 64-bit fingerprint into 4 16-bit chunks; any pair
    within Hamming<=3 must match on at least one chunk exactly (pigeonhole),
    so candidates come from 4 equi-joins, never a cross join.
    """
    fps = simhash64(df, id_col, text_col)
    chunks = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ckey"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.ckey").alias("ckey"))
    a = chunks.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "chunk", "ckey")
    b = chunks.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "chunk", "ckey")
    cand = (
        a.join(b, ["chunk", "ckey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
