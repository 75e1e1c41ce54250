"""Corpus-level analysis ops: decontamination, boilerplate n-grams, TF-IDF
(python-model equivalence + edge cases)."""

from __future__ import annotations

import math

import pytest

from blurrily_spark.functions.tokenizer import normalize_py
from blurrily_spark.operators.corpus import (
    frequent_ngrams,
    ngram_contamination,
    tfidf_top_terms,
)

TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "short doc"),  # < n words: whole text is the single gram
    (4, "the quick brown fox jumps over the lazy dog tonight again and again"),
]
# holdout leaks doc 1's text verbatim (prefix) and doc 3's whole text;
# doc 2 and the unique tail of doc 4 stay clean
HOLDOUT = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "short doc"),
    (102, "completely unrelated evaluation benchmark prompt text here okay"),
]


def _grams(text: str, n: int) -> set[str]:
    ws = normalize_py(text).split(" ")
    return {" ".join(ws[i : i + n]) for i in range(max(len(ws) - n, 0) + 1)}


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("hash_fn", ["exact", "fast"])
def test_contamination_matches_python_model(spark, hash_fn):
    n = 8
    hold = set().union(*(_grams(t, n) for _, t in HOLDOUT))
    exp = {}
    for ref, t in TRAIN:
        g = _grams(t, n)
        hit = len(g & hold)
        exp[ref] = (len(g), hit, round(hit / len(g), 6), int(hit >= 1))
    got = {
        r["id"]: (
            r["n_grams"],
            r["n_contaminated"],
            r["contamination"],
            r["is_contaminated"],
        )
        for r in ngram_contamination(
            _df(spark, TRAIN), _df(spark, HOLDOUT), n=n, hash_fn=hash_fn
        ).collect()
    }
    assert got == exp
    # the crafted corpus exercises all three cases
    assert got[1][3] == 1 and got[3][3] == 1 and got[2][3] == 0


def test_contamination_min_hits_threshold(spark):
    out = {
        r["id"]: r["is_contaminated"]
        for r in ngram_contamination(
            _df(spark, TRAIN), _df(spark, HOLDOUT), n=8, min_hits=2
        ).collect()
    }
    # doc 1 shares two 8-grams with the holdout (>= min_hits); doc 3's one
    # whole-text overlap falls below the threshold
    assert out[3] == 0 and out[1] == 1


def test_frequent_ngrams_model(spark):
    n, min_df = 2, 2
    per_doc = [(ref, normalize_py(t).split(" ")) for ref, t in TRAIN]
    occ: dict[str, int] = {}
    docs: dict[str, set] = {}
    for ref, ws in per_doc:
        gl = [" ".join(ws[i : i + n]) for i in range(max(len(ws) - n, 0) + 1)]
        for g in gl:
            occ[g] = occ.get(g, 0) + 1
            docs.setdefault(g, set()).add(ref)
    exp = sorted(
        ((g, len(docs[g]), occ[g]) for g in occ if len(docs[g]) >= min_df),
        key=lambda x: (-x[1], -x[2], x[0]),
    )[:5]
    got = [
        (r["gram"], r["n_docs"], r["n_occurrences"])
        for r in frequent_ngrams(_df(spark, TRAIN), n=n, k=5, min_df=min_df).collect()
    ]
    assert got == exp
    assert got[0][0] in {"the quick", "quick brown", "brown fox", "fox jumps",
                         "jumps over", "over the", "the lazy", "lazy dog"}


def test_tfidf_top_terms_model(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry banana date"),
    ]
    got = tfidf_top_terms(_df(spark, rows), k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: apple (tf=2, df=1) dominates; banana (df=3) scores ln(1)=0
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["apple", "banana"]
    assert d1[0]["tf"] == 2 and d1[0]["df_term"] == 1
    assert d1[0]["tfidf"] == pytest.approx(round(2 * math.log(3 / 1), 6))
    assert d1[1]["tfidf"] == 0.0
    # ties on tfidf break by term ASC -> deterministic ranks everywhere
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["term"] for r in d2] == ["cherry", "banana"]
    # every doc emits at most k rows with ranks 1..k
    assert all(len(v) <= 2 for v in by_doc.values())
    assert all([r["rank"] for r in sorted(v, key=lambda r: r["rank"])]
               == list(range(1, len(v) + 1)) for v in by_doc.values())


def test_tfidf_window_group_limit_plan(spark):
    """The per-doc top-k must push below the window sort
    (WindowGroupLimit), not rank the full term list and filter after."""
    rows = [(i, f"w{i} common word") for i in range(20)]
    plan = tfidf_top_terms(_df(spark, rows), k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
