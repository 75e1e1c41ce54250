"""Physical-plan regression gates.

Asserts the plan properties the engine's 100 TB design depends on, so a
refactor that silently reintroduces a Python eval node, loses a pushdown,
or degrades a join strategy fails CI instead of shipping:

* full-corpus scans over ASCII data carry NO Python/Arrow eval node
  (tokenizer tiers 1-3 + the adaptive split plan);
* subset predicates reach the parquet scan (PushedFilters);
* FIND's per-query top-k compiles to WindowGroupLimit (rank-limit
  pushdown), its gather join broadcasts the needle side;
* brute-force cosine scoring broadcasts the query batch -- never a
  CartesianProduct.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


NO_PYTHON_QUERIES = [
    "index_build",       # postings build (adaptive normalize, staged trigrams)
    "dedup_exact",       # full-corpus normalize scan
    "doc_fingerprint",   # normalize + rolling-hash fold
    "token_count",
    "quality_score",
    "lang_id",
    "minhash_signatures",  # portable hash family is pure SQL
    "minhash_lsh_pairs",
    "near_dedup",        # LSH pairs -> CC -> keeper join, end to end
    "duplicate_spans",   # rolling window fingerprints, pure HOF SQL
    "near_dedup_cross",  # new x ref banded join + max(struct) best match
    "simhash_fingerprints",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "blocking_pairs",
    "pairs_jaccard",
    "index_stats",
    "index_delete",
    "events_window_agg",
    "cosine_topk",
    "ann_ivf_fixed",
    "cosine_near_dups",
    "rp_lsh_near_dups",
    "duplicate_span_positions",
    "cut_duplicate_spans",
    "repetition_stats",
    "scrub_pii",
    "sample_stratified",
    "split_corpus",
    "sorted_neighborhood",
    "golden_records",
    "sessionize",
    "session_stats",
    "fs_match_weights",   # FS weights are literal arithmetic, pure codegen
    "fs_estimate_mu",     # tagged explode + groupBy, no Python
    "cluster_metrics",    # contingency-table aggregates, scaled-int math
    "incremental_entities",
    "meta_blocking",      # node-stat groupBy + equi-joins + filter, pure SQL
    "blocking_metrics",   # truth-table aggregates, integer math
    "block_filtering",    # broadcast df counts + per-ref window, pure SQL
    "threshold_sweep",    # one conditional-sum aggregate + stack unpivot
    "cluster_stats",      # CC assignment + edge-count joins, no Python
    "token_blocking",     # adaptive normalize + token self-join, pure SQL
    "edit_distance_join", # JVM banded levenshtein after length prefilter
    "set_similarity",     # four codegen'd divisions over the count joins
    "idf_cosine_pairs",   # scaled-int idf sums, float only in the division
    "multipass_blocking", # tagged union + one pair-keyed aggregation
]


@pytest.mark.parametrize("name", NO_PYTHON_QUERIES)
def test_no_python_eval_node_on_ascii_corpora(spark, name):
    plan = _plan(em.queries()[name](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, (
        f"{name}: Python eval node in plan"
    )


def test_subset_predicate_pushed_to_scan(spark):
    plan = _plan(em.q_pairs(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,100)" in plan.replace(" ", ""), plan[:1500]


def test_find_plan_shape(spark):
    plan = _plan(em.q_find(spark, SF_DIR))
    # per-query top-k is a rank-limit pushdown, not a global sort
    assert "WindowGroupLimit" in plan
    # the needle batch is broadcast against postings
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cosine_topk_broadcasts_queries(spark):
    plan = _plan(em.q_cosine_topk(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_scan_prunes_columns(spark):
    """The postings build must read only (doc_id, text), not every
    documents column."""
    plan = _plan(em.q_index_build(spark, SF_DIR))
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:1500]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"doc_id", "text"}, cols


def test_scrub_pii_is_one_scan_no_shuffle(spark):
    """scrub_pii is a single codegen'd projection: one scan, zero
    exchanges (nothing to shuffle -- per-row regex work only)."""
    plan = _plan(em.queries()["scrub_pii"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan


@pytest.mark.parametrize("name", ["sample_stratified", "split_corpus"])
def test_sampling_is_one_scan_no_shuffle(spark, name):
    """Deterministic sampling/splitting is a pure row-local decision:
    one scan, zero exchanges -- the property that makes it free at any
    corpus size (and independent of partitioning, which is also why the
    result is reproducible)."""
    plan = _plan(em.queries()[name](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan


def test_repetition_stats_gram_side_is_single_scan(spark):
    """The three gram statistics ride ONE tagged explode: two corpus scans
    total (grams + the line-stats join side), never one per gram size."""
    plan = _plan(em.queries()["repetition_stats"](spark, SF_DIR))
    assert plan.count("Scan parquet") <= 2, "gram passes re-split per size"


def test_fs_score_adds_no_exchange(spark):
    """fs_score is a single codegen'd projection over its input: the
    per-level weights are literals in the plan (element_at on a literal
    array), so scoring adds zero exchanges beyond the pair source --
    the property that keeps it free over 10^12 candidate pairs."""
    from pyspark.sql import functions as F

    from blurrily_spark.operators.linkage import FieldModel, fs_score

    fm = FieldModel("j", "lvl", m=(0.2, 0.8), u=(0.9, 0.1))
    base = spark.range(100).select(
        (F.col("id") % 2).cast("int").alias("lvl")
    )
    before = base._jdf.queryExecution().executedPlan().toString()
    after = fs_score(base, [fm])._jdf.queryExecution().executedPlan().toString()
    assert after.count("Exchange") == before.count("Exchange") == 0
    assert "ArrowEvalPython" not in after and "BatchEvalPython" not in after
