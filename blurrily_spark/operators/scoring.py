"""Pairwise scoring: blurrily's (matches, weight) order + Jaro-Winkler tie-break.

The reference ranks on (matches DESC, weight ASC) and leaves full ties in
*unspecified* order (unstable qsort, ext/blurrily/storage.c:566). Per the
north star, this module adds a Jaro-Winkler similarity computed in batched
Arrow/pandas UDFs **strictly below** the (matches, weight) order -- it can
reorder only rows the reference itself leaves unordered, so reference
rankings are preserved by construction.

Pair score components:
* ``matches``      -- shared unique trigram count (F4 semantics);
* ``jaccard``      -- matches / |T(a) ∪ T(b)| (size-normalized matchiness);
* ``weight_delta`` -- |weight_a - weight_b| (the length-difference weighting);
* ``jw``           -- Jaro-Winkler over the normalized texts (tie-break only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ch:
                match_a[i] = True
                match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions / 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler_py(a: str | None, b: str | None, p: float = 0.1, max_prefix: int = 4) -> float | None:
    """Plain-Python Jaro-Winkler (golden model + UDF kernel)."""
    if a is None or b is None:
        return None
    j = _jaro(a, b)
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over two string columns."""
    return pd.Series(
        [jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
    )


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    compute_jw: bool = True,
) -> DataFrame:
    """Attach score components to candidate pairs.

    ``records`` is ``(ref, norm)`` (+ optionally ``n_trigrams``) -- the
    normalized-text side table kept alongside the postings (the reference
    never stores strings, README.md:125-127, so text-based tie-breaking is
    an extension that needs this side table).

    Returns pairs + ``weight_delta`` (+ ``jw`` when requested). Ordering
    convention for consumers: (matches DESC, weight_delta ASC, jw DESC,
    ref_a ASC, ref_b ASC).
    """
    out = pairs.withColumn(
        "weight_delta", F.abs(F.col("weight_a") - F.col("weight_b"))
    )
    if compute_jw:
        texts = records.select(F.col("ref"), F.col("norm"))
        out = (
            out.join(
                texts.withColumnRenamed("ref", "ref_a").withColumnRenamed(
                    "norm", "_norm_a"
                ),
                "ref_a",
            )
            .join(
                texts.withColumnRenamed("ref", "ref_b").withColumnRenamed(
                    "norm", "_norm_b"
                ),
                "ref_b",
            )
            .withColumn("jw", jaro_winkler("_norm_a", "_norm_b"))
            .drop("_norm_a", "_norm_b")
        )
    return out


def with_edit_distance(
    pairs: DataFrame,
    records: DataFrame,
    max_dist: int | None = None,
    text_col: str = "norm",
) -> DataFrame:
    """Attach the exact Levenshtein distance to candidate pairs.

    The classic edit-distance similarity join, expressed the way every
    other scorer here is: blocking proposes candidates, this rescored them
    exactly. ``records`` is the ``(ref, <text_col>)`` side table (same
    contract as :func:`score_pairs`). Adds an ``edit_dist`` int column;
    with ``max_dist`` set, pairs farther apart are dropped.

    Scale shape: two equi-joins to fetch the texts, then per-row JVM work
    -- no extra shuffle. With ``max_dist`` the plan applies two sound
    prunes in cost order: the length-difference filter
    ``||a| - |b|| <= k`` is free (edit distance is bounded below by the
    length gap) and discards most non-matching pairs before any DP; the
    remaining pairs run the JVM's THRESHOLDED Levenshtein
    (``levenshtein(a, b, k)``, early exit, O(k * min-len) band instead of
    the full O(|a| * |b|) table) which returns -1 past k -- the final
    ``>= 0`` filter keeps exactly the within-k pairs. Both engines'
    ``levenshtein`` is the standard unit-cost edit distance, so the result
    is integer-exact across engines.
    """
    if max_dist is not None and max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    texts = records.select(F.col("ref"), F.col(text_col).alias("_t"))
    if max_dist is None:
        out = pairs.join(
            texts.select(F.col("ref").alias("ref_a"), F.col("_t").alias("_ta")), "ref_a"
        ).join(
            texts.select(F.col("ref").alias("ref_b"), F.col("_t").alias("_tb")), "ref_b"
        )
        return out.withColumn("edit_dist", F.levenshtein("_ta", "_tb")).drop(
            "_ta", "_tb"
        )
    # Decide with small rows, move big rows once (guide §8): the length-gap
    # prune needs only LENGTHS, so a per-ref aggregated (ref, min_len,
    # max_len) table joins first -- exactly one row per ref, so join
    # multiplicity is untouched even when ``records`` carries duplicate
    # refs -- and a pair survives the conservative interval test iff SOME
    # text combination could pass ``|len gap| <= k``. Only survivors join
    # the full text payloads, where the EXACT per-row length filter (same
    # predicate as before this optimization) and the thresholded
    # levenshtein run unchanged: identical rows out, far fewer strings
    # shuffled in.
    lens = texts.groupBy("ref").agg(
        F.min(F.length("_t")).alias("_lmin"), F.max(F.length("_t")).alias("_lmax")
    )
    gap = F.greatest(
        F.col("_lmin_a") - F.col("_lmax_b"),
        F.col("_lmin_b") - F.col("_lmax_a"),
        F.lit(0),
    )
    pruned = (
        pairs.join(
            lens.select(
                F.col("ref").alias("ref_a"),
                F.col("_lmin").alias("_lmin_a"),
                F.col("_lmax").alias("_lmax_a"),
            ),
            "ref_a",
        )
        .join(
            lens.select(
                F.col("ref").alias("ref_b"),
                F.col("_lmin").alias("_lmin_b"),
                F.col("_lmax").alias("_lmax_b"),
            ),
            "ref_b",
        )
        .where(gap <= F.lit(int(max_dist)))
        .drop("_lmin_a", "_lmax_a", "_lmin_b", "_lmax_b")
    )
    out = (
        pruned.join(
            texts.select(F.col("ref").alias("ref_a"), F.col("_t").alias("_ta")), "ref_a"
        )
        .join(
            texts.select(F.col("ref").alias("ref_b"), F.col("_t").alias("_tb")), "ref_b"
        )
        .where(F.abs(F.length("_ta") - F.length("_tb")) <= F.lit(int(max_dist)))
        .withColumn(
            "edit_dist", F.levenshtein(F.col("_ta"), F.col("_tb"), int(max_dist))
        )
        .where(F.col("edit_dist") >= 0)
    )
    return out.drop("_ta", "_tb")


def match_edges(
    scored_pairs: DataFrame,
    jaccard_threshold: float | None = None,
    min_matches: int | None = None,
    jw_threshold: float | None = None,
) -> DataFrame:
    """Thresholded match decisions -> edge list for clustering."""
    out = scored_pairs
    if jaccard_threshold is not None:
        out = out.where(F.col("jaccard") >= jaccard_threshold)
    if min_matches is not None:
        out = out.where(F.col("matches") >= min_matches)
    if jw_threshold is not None:
        out = out.where(F.col("jw") >= jw_threshold)
    return out.select(F.col("ref_a").alias("src"), F.col("ref_b").alias("dst"))


def token_sort_key(col):
    """Word-order-insensitive canonical form: whitespace tokens sorted and
    re-joined (fuzzywuzzy's token_sort transform). Input should already be
    normalized ([a-z ]); pure JVM array ops, no UDF."""
    return F.concat_ws(
        " ", F.sort_array(F.filter(F.split(col, " "), lambda w: w != F.lit("")))
    )


def token_sort_ratio(a, b):
    """Token-sort similarity ratio in [0, 1]:
    ``1 - levenshtein(sort(a), sort(b)) / max(len)`` -- fuzzywuzzy's
    token_sort_ratio re-expressed on the JVM (both engines' builtin
    ``levenshtein`` is the standard integer edit distance, so the score
    is exactly reproducible in SQL). Word-order swaps ("john smith" vs
    "smith john") score 1.0 where raw edit distance would not; two empty
    strings score 1.0. A tie-break refinement like Jaro-Winkler in
    :func:`score_pairs`: at scale, compute it only on pairs that already
    passed the cheap set-similarity threshold, never on the raw candidate
    set."""
    sa, sb = token_sort_key(a), token_sort_key(b)
    mx = F.greatest(F.length(sa), F.length(sb))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(sa, sb) / mx
    )
