"""Read-path operator: the FIND query (reference F1-F6).

``find(needle, limit)`` -- ext/blurrily/storage.c:477-580 -- re-expressed as
one declarative Spark plan per *batch* of queries:

    queries -> tokenize (F1) -> explode -> equi-join postings on trigram (F2)
            -> groupBy(query_id, ref) count (F3+F4)
            -> rank (matches DESC, weight ASC, ref ASC) (F5)
            -> per-query top-k (F6)

* F2 gather = the blocking join; the reference copies <= len+1 posting
  lists (storage.c:497-520) -- Spark touches only matching trigram keys.
* F4 matches(ref) = |T(query) ∩ T(doc)| (storage.c:527-563); both sides are
  deduped so ``count(*)`` is the intersection size.
* F5 rank: "first results share the most trigrams; amongst equals,
  lightest first" (storage.h:99-109, comparator storage.c:129-138). The
  reference's qsort leaves full (matches, weight) ties unordered; we add
  ``ref ASC`` as a deterministic third key (its own integration spec
  expects insertion order [123, 456], spec/integration_spec.rb:37-42).
* F6 limit: default 10 (lib/blurrily/defaults.rb:6); ``limit <= 0`` =>
  default (ext/blurrily/map_ext.c:142-146).

Scale notes: the query side is broadcast when it is a needle batch
(broadcast hash join, no shuffle of the postings); for huge query batches
set ``broadcast_queries=False`` to let AQE pick shuffle-hash/SMJ on
``trigram``, which co-locates for free when postings are bucketed by
trigram. The per-query top-k compiles to WindowGroupLimit (rank-limit
pushdown), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blurrily_spark.config import LIMIT_DEFAULT
from blurrily_spark.functions.tokenizer import add_trigrams, normalize


def find(
    postings: DataFrame,
    queries: DataFrame,
    query_text_col: str = "needle",
    query_id_col: str = "query_id",
    limit: int | None = None,
    limit_col: str | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batch FIND: one ranked result set per query row.

    Returns ``(query_id, ref, matches, weight, rank)`` with at most
    ``limit`` rows per query, ordered by (matches DESC, weight ASC,
    ref ASC). ``limit_col`` (per-query limit) takes precedence over the
    scalar ``limit``; both default to LIMIT_DEFAULT=10.
    """
    # normalize in its own projection: the NFKD pandas UDF cannot appear
    # inside the transform() lambda of trigrams() (Spark forbids Python UDFs
    # in higher-order functions), so F1 is a two-step select.
    q = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        normalize(F.col(query_text_col)).alias("_norm"),
        *(
            [
                # coalesce: a NULL per-query limit means "missing" and falls
                # back to the default (a bare when().otherwise() would
                # propagate NULL and `rank <= NULL` drops every row).
                F.coalesce(
                    F.when(F.col(limit_col).cast("int") <= 0, F.lit(LIMIT_DEFAULT))
                    .otherwise(F.col(limit_col).cast("int")),
                    F.lit(LIMIT_DEFAULT),
                ).alias("_limit")
            ]
            if limit_col
            else []
        ),
    )
    q = add_trigrams(q, "_norm", "_tg").select(
        "query_id",
        F.explode("_tg").alias("trigram"),
        *(["_limit"] if limit_col else []),
    )
    if broadcast_queries:
        q = F.broadcast(q)

    joined = q.join(postings, "trigram")

    aggs = [
        F.count(F.lit(1)).alias("matches"),
        F.min("weight").alias("weight"),  # all postings of a ref share one weight
    ]
    if limit_col:
        aggs.append(F.min("_limit").alias("_limit"))
    scored = joined.groupBy("query_id", "ref").agg(*aggs)

    win = Window.partitionBy("query_id").orderBy(
        F.col("matches").desc(), F.col("weight").asc(), F.col("ref").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(win))

    if limit_col:
        k = F.col("_limit")
    else:
        eff = LIMIT_DEFAULT if limit is None or limit <= 0 else int(limit)
        k = F.lit(eff)
    return ranked.where(F.col("rank") <= k).select(
        "query_id", "ref", "matches", "weight", "rank"
    )


def find_one(
    postings: DataFrame,
    needle: str,
    limit: int = LIMIT_DEFAULT,
) -> DataFrame:
    """Single-needle FIND (the reference's ``Map#find`` signature).

    Compiles to TakeOrderedAndProject (no window) -- the single-query fast
    path. Returns ``(ref, matches, weight)`` ordered like F5.
    """
    spark = postings.sparkSession
    q = spark.createDataFrame([(0, needle)], "query_id long, needle string")
    res = find(postings, q, limit=limit)
    return res.orderBy("rank").select("ref", "matches", "weight")
