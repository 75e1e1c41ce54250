"""Tokenizer goldens from the reference spec suite (FIXTURES.md §5).

Every expectation cites the reference file:line it pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blurrily_spark.functions.tokenizer import (
    normalize,
    normalize_py,
    tokenize_py,
    trigram_to_string,
    trigrams,
    trigrams_py,
    trigrams_udf,
)

# (input, expected normalized) -- lib/blurrily/map.rb:40-47 + README.md:104-105
NORMALIZE_CASES = [
    ("london", "london"),
    ("London", "london"),
    ("Puy-de-Dôme", "puy de dome"),
    ("@€%é", "e"),  # spec/blurrily/map_spec.rb:55-59
    ("", ""),
    ("  a   b  ", "a b"),
    ("New York", "new york"),
    ("lonXdon", "lonxdon"),
    ("a1b2", "a b"),  # digits -> space
]

# (input, expected unique-trigram count) -- spec/blurrily/map_spec.rb:32-59
COUNT_CASES = [
    ("foobar", 7),
    ("", 1),
    ("@€%é", 2),
    ("london", 7),
    ("paris", 6),
    ("New York", 9),  # README.md:117-119
]


def test_normalize_py():
    for raw, expected in NORMALIZE_CASES:
        assert normalize_py(raw) == expected, raw


def test_trigrams_py_counts():
    for raw, n in COUNT_CASES:
        assert len(tokenize_py(raw)) == n, raw


def test_trigrams_py_new_york_strings():
    # README.md:117-119: **n *ne new ew* w*y *yo yor ork rk*
    got = {trigram_to_string(c) for c in tokenize_py("New York")}
    assert got == {"**n", "*ne", "new", "ew*", "w*y", "*yo", "yor", "ork", "rk*"}


def test_empty_string_is_star_star_star():
    assert tokenize_py("") == [0]
    assert trigram_to_string(0) == "***"


def test_diacritics_equivalence():
    # README.md:104-105: 'Puy-de-Dôme' tokenizes like 'puy de dome'
    assert tokenize_py("Puy-de-Dôme") == tokenize_py("puy de dome")


def test_spark_normalize_matches_python(spark):
    df = spark.createDataFrame([(s,) for s, _ in NORMALIZE_CASES], "raw string")
    got = df.select("raw", normalize("raw").alias("norm")).collect()
    for row in got:
        assert row["norm"] == normalize_py(row["raw"]), row["raw"]


def test_spark_trigrams_match_python(spark):
    inputs = [s for s, _ in NORMALIZE_CASES] + [s for s, _ in COUNT_CASES]
    df = spark.createDataFrame([(s,) for s in set(inputs)], "raw string")
    got = (
        df.withColumn("norm", normalize("raw"))
        .select(
            "raw",
            F.array_sort(trigrams("norm")).alias("tg"),
            F.array_sort(trigrams_udf("norm")).alias("tg_udf"),
        )
        .collect()
    )
    for row in got:
        expected = tokenize_py(row["raw"])
        assert row["tg"] == expected, row["raw"]
        assert row["tg_udf"] == expected, row["raw"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spark_matches_python_on_random_strings(spark, seed):
    """Property: the SQL-expression path == the pure-Python golden model."""
    import random

    rng = random.Random(seed)
    # exercise all four normalize tiers: clean, ASCII, Latin-translate, NFKD UDF
    alphabet = "abcdefghijklmnopqrstuvwxyz ABCDEFGH-123éüßçøñāĳﬁµ€λЖ中\t"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = (
        df.withColumn("norm", normalize("raw"))
        .select("raw", "norm", F.array_sort(trigrams("norm")).alias("tg"))
        .collect()
    )
    for row in got:
        assert row["norm"] == normalize_py(row["raw"]), repr(row["raw"])
        assert row["tg"] == tokenize_py(row["raw"]), repr(row["raw"])


def test_trigrams_py_deduplicates():
    # 'aaaa' -> padded '**aaaa*': windows **a *aa aaa aaa aa* -> 5 windows, 4 unique...
    # verify against explicit set computation
    norm = "aaaa"
    padded = "**aaaa*"
    expected = sorted(
        {
            sum(
                (28**i) * (ord(ch) - 96)
                for i, ch in enumerate(padded[k : k + 3])
                if "a" <= ch <= "z"
            )
            for k in range(len(norm) + 1)
        }
    )
    assert trigrams_py(norm) == expected


def test_with_normalized_matches_python(spark):
    from blurrily_spark.functions.tokenizer import with_normalized

    samples = [s for s, _ in NORMALIZE_CASES] + [
        "λambda Жук 中文 mixed", "çökmüş ÄÖÜ", "ĳsberg ﬁne", None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = {r["raw"]: r["norm"] for r in with_normalized(df, "raw", "norm").collect()}
    assert len(got) == len(set(samples))
    for s in samples:
        assert got[s] == normalize_py(s), repr(s)


def test_multiline_clean_line_divergence(spark):
    """Documented intentional divergence (ADVICE r1): Ruby's clean-path
    regex /^([a-z ])+$/ (map.rb:41) anchors per LINE, so 'abc\n12' keeps
    its digits in the reference ('abc 12'); we anchor over the whole
    string, so the strip branch runs and digits fold to spaces ('abc').
    Normalized output is therefore always pure [a-z ], which keeps the
    base-28 encoding total. This test pins OUR contract so any future
    change is deliberate."""
    s = "abc\n12"
    assert normalize_py(s) == "abc"
    got = (
        spark.createDataFrame([(s,)], "t string")
        .select(normalize(F.col("t")).alias("n"))
        .first()["n"]
    )
    assert got == "abc"
    # the strip branch must also keep treating \n as whitespace-folding
    assert normalize_py("ab\ncd") == "ab cd"


def test_adaptive_with_normalized_ascii_plan_has_no_python_node(spark):
    """VERDICT r1 #8: full-corpus scans over ASCII/Latin data must not
    carry an Arrow/Python eval node. adaptive=True probes once and
    compiles a single-scan pure-JVM plan when no tier-4 rows exist."""
    from blurrily_spark.functions.tokenizer import with_normalized

    ascii_df = spark.createDataFrame(
        [("Hello, World 42",), ("plain text",), (None,)], "t string"
    )
    out = with_normalized(ascii_df, "t", "n", adaptive=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert [r["n"] for r in out.orderBy("t").collect()] == [
        None, "hello world", "plain text"
    ]

    # exotic rows still take the exact-NFKD branch and stay correct
    mixed = spark.createDataFrame([("ascii only",), ("日本語 text",)], "t string")
    got = {
        r["t"]: r["n"]
        for r in with_normalized(mixed, "t", "n", adaptive=True).collect()
    }
    assert got["ascii only"] == "ascii only"
    assert got["日本語 text"] == normalize_py("日本語 text")


def test_with_normalized_auto_skips_probe_on_computed_and_streaming(spark, tmp_path):
    """Round-2 ADVICE: adaptive='auto' probes only file-backed batch inputs.
    Computed inputs keep a lazy union plan (no eager job at operator
    construction); streaming inputs no longer throw; file-backed ASCII
    corpora still compile to the single pure-JVM scan."""
    from pyspark.sql import functions as F

    from blurrily_spark.functions.tokenizer import with_normalized

    # computed input: construction is lazy -> the split-union plan (with the
    # null-gated Arrow branch) is returned, proving the probe did not run
    computed = spark.createDataFrame([("abc",)], "text string")
    plan = with_normalized(
        computed, "text", adaptive="auto"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "Union" in plan

    # file-backed ASCII input: the probe runs and the plan is pure JVM
    p = str(tmp_path / "ascii.parquet")
    computed.write.parquet(p)
    plan2 = with_normalized(
        spark.read.parquet(p), "text", adaptive="auto"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan2 and "Union" not in plan2

    # streaming input: operator construction must not launch a probe job
    from blurrily_spark.operators.dedup import exact_duplicates
    from blurrily_spark.sources.synth import TRANSCRIPTS_SCHEMA

    sdf = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(str(tmp_path))
    out = exact_duplicates(sdf, id_col="conv_id", text_col="text")
    assert out.isStreaming
