"""Repetition-filter statistics (Gopher/MassiveText-style signals)."""

from __future__ import annotations

from blurrily_spark.operators.textstats import repetition_stats


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["id"]: r for r in repetition_stats(df).collect()}


def test_repetition_stats_goldens(spark):
    got = _stats(
        spark,
        [
            # 3 lines, one duplicated -> dup_line_frac 1/3; 'spam' stuffed
            (1, "spam spam spam eggs\nham and eggs\nspam spam spam eggs"),
            # clean doc: all words distinct, nothing repeats
            (2, "every word here appears exactly once friend"),
            # single word repeated: top_word_frac 1.0, all trigrams dup
            (3, "go go go go go go"),
        ],
    )
    r1 = got[1]
    assert r1["n_lines"] == 3
    assert abs(r1["dup_line_frac"] - 1 / 3) < 1e-6
    assert r1["n_words"] == 11
    assert abs(r1["top_word_frac"] - 6 / 11) < 1e-6  # 'spam' x6
    # normalized text joins lines with a space, so bigrams cross line
    # boundaries: 10 bigrams total, 'spam spam' occurs 4x
    assert abs(r1["top_bigram_frac"] - 4 / 10) < 1e-6

    r2 = got[2]
    assert r2["dup_line_frac"] == 0.0
    assert abs(r2["top_word_frac"] - 1 / 7) < 1e-6
    assert r2["dup_trigram_frac"] == 0.0

    r3 = got[3]
    assert r3["top_word_frac"] == 1.0
    assert r3["top_bigram_frac"] == 1.0
    assert r3["dup_trigram_frac"] == 1.0  # 'go go go' x4, all dup mass


def test_repetition_stats_short_docs(spark):
    got = _stats(spark, [(1, "one"), (2, "two words")])
    assert got[1]["top_bigram_frac"] == 0.0  # no bigrams
    assert got[1]["dup_trigram_frac"] == 0.0
    assert got[2]["n_words"] == 2
    assert got[2]["top_bigram_frac"] == 1.0  # exactly one bigram


def test_scrub_pii_goldens(spark):
    from blurrily_spark.operators.textstats import scrub_pii

    rows = [
        (1, "mail me at a.b+c@foo-bar.org or see https://x.io/p?q=z@y.com now"),
        (2, "server at 192.168.0.1 and 10.0.0.7 responded"),
        (3, "nothing to scrub here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    # the email inside the URL's query string belongs to the URL (order:
    # URL replaced first), so only ONE email is counted/redacted
    assert got[1]["clean_text"] == "mail me at <EMAIL> or see <URL> now"
    assert got[1]["n_urls"] == 1 and got[1]["n_emails"] == 1 and got[1]["n_ipv4"] == 0
    assert got[2]["clean_text"] == "server at <IP> and <IP> responded"
    assert got[2]["n_ipv4"] == 2
    assert got[3]["clean_text"] == rows[2][1]
    assert (got[3]["n_urls"], got[3]["n_emails"], got[3]["n_ipv4"]) == (0, 0, 0)


def test_scrub_pii_randomized_python_oracle(spark):
    """Staged-regex parity with a pure-Python oracle applying the same
    PII_PATTERNS in the same order (counts taken on the text each stage
    actually sees)."""
    import random
    import re

    from blurrily_spark.operators.textstats import PII_PATTERNS, scrub_pii

    rng = random.Random(17)
    frags = [
        "plain words here", "x@y.org", "http://a.b/c?e=f@g.h", "1.2.3.4",
        "https://deep.example/path", "no-at-sign.com", "999.999.999.999",
        "a@b", "user.name+tag@host.co", "trailing dot 1.2.3.4.5",
    ]
    texts = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 8))))
        for i in range(30)
    ]

    def oracle(t):
        counts = {}
        for name, pattern, token in PII_PATTERNS:
            counts[name] = len(re.findall(pattern, t))
            t = re.sub(pattern, token, t)
        return t, counts["url"], counts["email"], counts["ipv4"]

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    for i, t in texts:
        exp_text, nu, ne, nip = oracle(t)
        r = got[i]
        assert r["clean_text"] == exp_text, (t, r["clean_text"], exp_text)
        assert (r["n_urls"], r["n_emails"], r["n_ipv4"]) == (nu, ne, nip), t
