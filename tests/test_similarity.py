"""ANN quality gates: IVF recall at the shipped settings, codebook
assignment equivalence (literal vs DataFrame), subset-of-brute-force."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from blurrily_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"
# shipped ANN settings (__spark_entry__.q_ann_ivf)
ANN_K, ANN_NPROBE, ANN_ITERS = 16, 11, 4


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()
    df.count()
    yield df
    df.unpersist()


def _split(emb):
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return emb.where(F.col("vec_id") >= 8), q


def test_ivf_recall_at_shipped_params(spark, emb):
    """The driver's ann_ivf_topk settings must deliver recall@5 >= 0.9.

    This corpus is near-isotropic (within-label mean cosine ~0.02), so 0.9
    recall honestly costs probing ~11/16 of the buckets; clustered corpora
    prune much deeper at equal recall. The point of the gate is that the
    shipped settings never silently regress below the documented floor.
    """
    corpus, q = _split(emb)
    bf = {(r["query_id"], r["vec_id"])
          for r in similarity.cosine_topk(corpus, q, k=5).collect()}
    cents = similarity.kmeans_centroids(corpus, k=ANN_K, iterations=ANN_ITERS)
    got = {(r["query_id"], r["vec_id"])
           for r in similarity.ivf_topk(corpus, q, cents, k=5, nprobe=ANN_NPROBE).collect()}
    recall = len(got & bf) / len(bf)
    assert recall >= 0.9, f"recall {recall}"


def test_ivf_results_subset_of_probed_brute_force(spark, emb):
    """IVF invariant: every returned neighbor is a true brute-force top
    candidate *within the probed buckets* (exactness inside the probe set),
    and cos values match the exact scorer."""
    corpus, q = _split(emb)
    cents = similarity.take_centroids(corpus, 8)
    ivf = similarity.ivf_topk(corpus, q, cents, k=5, nprobe=8)  # probe all
    bf = similarity.cosine_topk(corpus, q, k=5)
    a = {(r["query_id"], r["vec_id"], round(r["cos"], 9), r["rank"]) for r in ivf.collect()}
    b = {(r["query_id"], r["vec_id"], round(r["cos"], 9), r["rank"]) for r in bf.collect()}
    assert a == b  # nprobe = k buckets => IVF degenerates to brute force


def test_assign_buckets_df_matches_literal(spark, emb):
    corpus, _ = _split(emb)
    cents = similarity.take_centroids(corpus, 8)
    lit = similarity.assign_buckets(corpus, cents)
    cents_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "bucket int, cvec array<double>"
    )
    viadf = similarity.assign_buckets_df(corpus, cents_df)
    got_a = {(r["vec_id"], r["bucket"]) for r in lit.collect()}
    got_b = {(r["vec_id"], r["bucket"]) for r in viadf.collect()}
    assert got_a == got_b


def test_rp_lsh_subset_of_brute_with_high_recall(spark):
    """RP-LSH near-dups: exact precision (cosine rescore) and measured
    recall vs the brute-force baseline on the injected-dup corpus."""
    import __spark_entry__ as em

    brute = {
        (r["id_a"], r["id_b"]) for r in em.q_cosine_near_dups(spark, SF_DIR).collect()
    }
    rp = {
        (r["id_a"], r["id_b"]) for r in em.q_rp_lsh_near_dups(spark, SF_DIR).collect()
    }
    assert rp <= brute  # precision exact by construction
    assert brute, "dup injection must produce qualifying pairs"
    recall = len(rp & brute) / len(brute)
    assert recall >= 0.95, f"recall {recall}"


def test_maxmin_seeding_deterministic(spark, emb):
    corpus, _ = _split(emb)
    a = similarity.maxmin_centroids(corpus, 4)
    b = similarity.maxmin_centroids(corpus, 4)
    assert a == b
    assert len(a) == 4 and len(set(map(tuple, a))) == 4  # distinct seeds


def test_maxmin_sampled_seeding_deterministic_and_recall(spark, emb):
    """Sample-first seeding: forcing the hash-sample path (tiny
    max_seed_scan) must stay deterministic across invocations and keep the
    shipped recall gate -- seeding quality, not seeding coverage, drives
    codebook quality (the Lloyd iterations stay full-corpus)."""
    import __spark_entry__ as em
    from blurrily_spark.operators import similarity

    corpus = emb.where(F.col("vec_id") >= 8)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    seeds1 = similarity.maxmin_centroids(corpus, k=em.ANN_K, max_seed_scan=50)
    seeds2 = similarity.maxmin_centroids(corpus, k=em.ANN_K, max_seed_scan=50)
    assert seeds1 == seeds2  # hash-sample is partitioning-independent

    # full kmeans (shipped iteration count) with the sampled seeding still
    # meets the recall gate
    cents = seeds1
    for _ in range(em.ANN_ITERS):
        assigned = similarity.assign_buckets(corpus, cents)
        means = (
            assigned.select("bucket", F.posexplode("_v").alias("dim", "val"))
            .groupBy("bucket", "dim").agg(F.avg("val").alias("m")).collect()
        )
        by_b = {}
        for r in means:
            by_b.setdefault(r["bucket"], {})[r["dim"]] = r["m"]
        cents = [
            [by_b[b][i] for i in range(len(old))] if b in by_b else old
            for b, old in enumerate(cents)
        ]
    bf = {(r["query_id"], r["vec_id"])
          for r in similarity.cosine_topk(corpus, q, k=5).collect()}
    got = {(r["query_id"], r["vec_id"])
           for r in similarity.ivf_topk(corpus, q, cents, k=5, nprobe=em.ANN_NPROBE).collect()}
    assert len(got & bf) / len(bf) >= 0.9


def test_stored_ivf_partition_pruning_and_equality(spark, emb, tmp_path):
    """Round-3 verdict #4: the stored IVF layout delivers the docstring's
    promise -- a probe against save_ivf_index's partitionBy(bucket) table
    scans ONLY the probed buckets' files (directory pruning = inverted-list
    lookup) and returns results identical to the in-memory ivf_topk."""
    corpus, q = _split(emb)
    cents = similarity.take_centroids(corpus, 8)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(corpus, path, cents)

    expected = {
        (r["query_id"], r["vec_id"], round(r["cos"], 9), r["rank"])
        for r in similarity.ivf_topk(corpus, q, cents, k=5, nprobe=2).collect()
    }
    got_df = similarity.ivf_topk_stored(spark, path, q, k=5, nprobe=2)
    got = {
        (r["query_id"], r["vec_id"], round(r["cos"], 9), r["rank"])
        for r in got_df.collect()
    }
    assert got == expected

    # pruning: with a small query batch and nprobe=1 only a few buckets are
    # probed -- assert the scan's input files all come from those bucket
    # directories and that unprobed bucket directories exist and were NOT
    # touched (this near-isotropic corpus probes ALL buckets at the larger
    # batch above, which is a recall property, not a pruning failure)
    q_small = q.where(F.col("query_id") < 2)
    sg = similarity.ivf_topk_stored(spark, path, q_small, k=5, nprobe=1)
    assert sg.count() > 0
    centroids = similarity.load_ivf_codebook(spark, path)
    probed = set()
    for r in q_small.collect():
        probed.update(
            similarity._probe_buckets(list(map(float, r["query_vec"])), centroids, 1)
        )
    all_buckets = {
        r["bucket"] for r in spark.read.parquet(path).select("bucket").distinct().collect()
    }
    assert probed < all_buckets, "test needs unprobed buckets to prove pruning"
    # plan-level: the scan carries the bucket IN (...) as a PARTITION filter
    # (directory pruning), not a post-scan data filter
    pruned = spark.read.parquet(path).where(F.col("bucket").isin(sorted(probed)))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1]
    small_expected = {
        (r["query_id"], r["vec_id"], round(r["cos"], 9)) for r in sg.collect()
    }
    # behavioral: DELETE every unprobed bucket directory -- the stored probe
    # must not notice (its answer never touches unprobed inverted lists)
    import shutil

    for b in all_buckets - probed:
        shutil.rmtree(str(tmp_path / "ivf" / f"bucket={b}"))
    again = {
        (r["query_id"], r["vec_id"], round(r["cos"], 9))
        for r in similarity.ivf_topk_stored(spark, path, q_small, k=5, nprobe=1).collect()
    }
    assert again == small_expected


def test_stored_ivf_query_batch_cap(spark, emb, tmp_path):
    """Round-4 verdict #7: ivf_topk_stored's driver-side query collect is
    bounded -- past max_queries it fails loudly with a pointer to the
    DataFrame-native ivf_topk path instead of OOMing the driver."""
    import pytest

    corpus, q = _split(emb)
    cents = similarity.take_centroids(corpus, 4)
    path = str(tmp_path / "ivf_cap")
    similarity.save_ivf_index(corpus, path, cents)

    n_q = q.count()
    assert n_q > 3
    # under the cap: works
    ok = similarity.ivf_topk_stored(spark, path, q, k=3, nprobe=1, max_queries=n_q)
    assert ok.count() > 0
    # over the cap: loud error naming the escape hatch
    with pytest.raises(ValueError, match="ivf_topk"):
        similarity.ivf_topk_stored(spark, path, q, k=3, nprobe=1, max_queries=3)


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# ---------------------------------------------------------------------------

SEM_CORPUS = [
    # cluster A (centroid [1,0,0,0]): 1 ~ 2 near-identical, 3 same bucket
    # but below threshold to both
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.999, 0.02, 0.0, 0.0]),
    (3, [0.8, 0.6, 0.0, 0.0]),
    # cluster B (centroid [0,1,0,0]): 10 ~ 11 near-identical
    (10, [0.0, 1.0, 0.0, 0.0]),
    (11, [0.02, 0.999, 0.0, 0.0]),
]
SEM_CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def _sem_df(spark):
    return spark.createDataFrame(
        SEM_CORPUS, "vec_id long, embedding array<double>"
    )


def test_semantic_dedup_planted_groups_min_id(spark):
    out = similarity.semantic_dedup(_sem_df(spark), SEM_CENTS, threshold=0.95)
    got = {r["id"]: (r["keep_id"], r["is_dup"]) for r in out.collect()}
    assert got == {
        1: (1, 0),
        2: (1, 1),
        3: (3, 0),  # same bucket as 1/2 but cos < threshold -> singleton
        10: (10, 0),
        11: (10, 1),
    }


def test_semantic_dedup_far_from_centroid_keeper(spark):
    """The paper's keeper rule: within a dup group, retain the member
    LEAST similar to its cluster centroid (most diversity kept). Here 2
    and 11 are the perturbed members, so they win over the exemplars."""
    out = similarity.semantic_dedup(
        _sem_df(spark), SEM_CENTS, threshold=0.95, keep="far_from_centroid"
    )
    got = {r["id"]: (r["keep_id"], r["is_dup"]) for r in out.collect()}
    assert got == {
        1: (2, 1),
        2: (2, 0),
        3: (3, 0),
        10: (11, 1),
        11: (11, 0),
    }


def test_semantic_dedup_invalid_keep_raises(spark):
    with pytest.raises(ValueError, match="far_from_centroid"):
        similarity.semantic_dedup(_sem_df(spark), SEM_CENTS, keep="nope")


def test_semantic_dedup_single_cluster_matches_brute_cc(spark, emb):
    """k=1 degenerates to all-pairs-within-one-cluster: the result must
    equal a Python union-find over the brute-force qualifying pairs."""
    base = emb.where(F.col("vec_id") < 30).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("vec"),
    )
    v = F.col("vec")
    shifted = F.concat(F.slice(v, 2, F.size(v) - 1), F.slice(v, 1, 1))
    dup = F.zip_with(v, shifted, lambda a, b: a + F.lit(0.05) * b)
    corpus = base.unionByName(
        base.select((F.col("vec_id") + 1000).alias("vec_id"), dup.alias("vec"))
    )
    cents = similarity.take_centroids(corpus, 1, vec_col="vec")
    out = similarity.semantic_dedup(corpus, cents, threshold=0.95, vec_col="vec")

    pairs = similarity.cosine_near_dup_pairs(
        corpus, threshold=0.95, vec_col="vec"
    ).collect()
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = [r["vec_id"] for r in corpus.select("vec_id").collect()]
    expected = {i: min(find(i), i) if i in parent else i for i in ids}
    got = {r["id"]: r["keep_id"] for r in out.collect()}
    assert got == expected
    # every injected dup must actually be flagged (cos ~ 0.9987 >> 0.95)
    flagged = {r["id"] for r in out.collect() if r["is_dup"] == 1}
    assert len(flagged) >= 30


def test_semantic_dedup_plan_has_no_cartesian(spark):
    """The within-cluster pair join must be an equi-join on bucket -- a
    cartesian product over the corpus would be the SemDeDup scale bug."""
    plan = similarity.semantic_dedup(
        _sem_df(spark), SEM_CENTS, threshold=0.95
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
