"""Distributed clustering-quality metrics (the correctness-gate math at scale).

The pytest harness computes pairwise F1 with driver-side itertools -- fine
for spec corpora, O(n^2) death at 10^12 turns. This module computes the same
metric with joins:

* same-cluster pair counts per labeling are Σ c*(c-1)/2 over cluster sizes
  (one groupBy each);
* true positives are pairs co-clustered in BOTH labelings, i.e. the
  cluster-size aggregation of the (pred_label, true_label) contingency
  table -- again one groupBy.

No pair materialization anywhere; three aggregations total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _same_pairs(df: DataFrame, label_col: str) -> int:
    row = (
        df.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .collect()[0]
    )
    return int(row["p"] or 0)


def pairwise_f1(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "ref",
    pred_col: str = "entity_id",
    truth_col: str = "entity_true",
) -> dict[str, float]:
    """Pairwise precision/recall/F1 of ``pred`` clusters against ``truth``.

    Both inputs are (id, label); ids joined inner (ids missing from either
    side are excluded -- callers align universes first).
    """
    joined = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p")).join(
        truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")), "_id"
    ).cache()
    try:
        pred_pairs = _same_pairs(joined, "_p")
        true_pairs = _same_pairs(joined, "_t")
        tp = int(
            joined.groupBy("_p", "_t")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
            .collect()[0]["p"]
            or 0
        )
    finally:
        joined.unpersist()
    precision = tp / pred_pairs if pred_pairs else 0.0
    recall = tp / true_pairs if true_pairs else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp_pairs": tp,
        "pred_pairs": pred_pairs,
        "true_pairs": true_pairs,
    }
