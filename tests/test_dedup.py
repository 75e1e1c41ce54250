"""near_dedup: end-to-end retained-corpus semantics (LSH -> CC -> keeper).

Exactness vs the DuckDB re-derivation is covered by the parametrized
entry-oracle gate (tests/test_entry_oracle.py::test_query_matches_oracle
[near_dedup]); this file pins the operator's semantics on crafted data."""

from __future__ import annotations

from blurrily_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong coffee behind the old stone bridge at dawn every single day"
)
UNIQUE = (
    "completely unrelated payload about spark physical plans adaptive "
    "execution shuffle partitions and broadcast joins in a columnar engine"
)


def _corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE[: int(len(BASE) * 0.9)]),   # near-dup of 1
        (3, BASE[: int(len(BASE) * 0.8)]),   # near-dup of 1 and 2
        (4, UNIQUE),                          # singleton
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dedup_clusters_and_keepers(spark):
    out = {r["id"]: r for r in dedup.near_dedup(_corpus(spark)).collect()}
    assert set(out) == {1, 2, 3, 4}
    # the whole near-dup chain collapses onto the smallest id
    assert out[1]["keep_id"] == 1 and out[1]["is_dup"] == 0
    assert out[2]["keep_id"] == 1 and out[2]["is_dup"] == 1
    assert out[3]["keep_id"] == 1 and out[3]["is_dup"] == 1
    # singletons keep themselves
    assert out[4]["keep_id"] == 4 and out[4]["is_dup"] == 0


def test_near_dedup_retained_corpus(spark):
    docs = _corpus(spark)
    flags = dedup.near_dedup(docs)
    kept = docs.join(
        flags.where("is_dup = 0").withColumnRenamed("id", "doc_id").select("doc_id"),
        "doc_id",
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]


def test_near_dedup_threshold_one_keeps_everything(spark):
    # est_jaccard never reaches 1.0 for the truncated dups at threshold > max
    out = {r["id"]: r["is_dup"] for r in dedup.near_dedup(_corpus(spark), threshold=1.01).collect()}
    assert out == {1: 0, 2: 0, 3: 0, 4: 0}


def test_duplicate_spans_flags_shared_windows(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly w=8 words
    rows = [
        (1, shared + " unique tail one here now"),
        (2, "different head words go here " + shared),
        (3, "totally disjoint text with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.duplicate_spans(df, w=8).collect()}
    # docs 1 and 2 share the 8-word window; doc 3 shares nothing
    assert out[1]["n_dup_windows"] >= 1 and out[2]["n_dup_windows"] >= 1
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_fraction"] == 0.0
    # window count: n_words - w + 1 (doc 3 has 9 words)
    assert out[3]["n_windows"] == 9 - 8 + 1


def test_duplicate_spans_short_doc_is_one_window(spark):
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "other short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.duplicate_spans(df, w=8).collect()}
    assert out[1]["n_windows"] == 1 and out[1]["dup_fraction"] == 1.0
    assert out[2]["dup_fraction"] == 1.0
    assert out[3]["n_dup_windows"] == 0


def test_duplicate_spans_fast_hash_matches_exact(spark):
    rows = [
        (i, f"prefix {i} the quick brown fox jumps over the lazy dog suffix {i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = sorted(tuple(r) for r in dedup.duplicate_spans(df, w=6).collect())
    fast = sorted(tuple(r) for r in dedup.duplicate_spans(df, w=6, hash_fn="fast").collect())
    assert exact == fast


def test_near_dedup_against_matches_and_orientation(spark):
    ref = spark.createDataFrame([(10, BASE), (11, UNIQUE)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (1, BASE[: int(len(BASE) * 0.9)]),  # near-dup of ref 10
            (2, "entirely fresh content about nothing previously retained ever"),
            (10, UNIQUE),                        # id collides with ref 10, text = ref 11
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in dedup.near_dedup_against(new, ref).collect()}
    assert out[1]["is_dup"] == 1 and out[1]["matched_ref_id"] == 10
    assert out[2]["is_dup"] == 0 and out[2]["matched_ref_id"] is None
    # id equality across corpora must not suppress a genuine text match
    assert out[10]["is_dup"] == 1 and out[10]["matched_ref_id"] == 11


def test_near_dedup_against_tie_breaks_to_smallest_ref(spark):
    # two identical reference docs: the match must pick the smaller id
    ref = spark.createDataFrame([(21, BASE), (20, BASE)], "doc_id long, text string")
    new = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    row = dedup.near_dedup_against(new, ref).collect()[0]
    assert row["matched_ref_id"] == 20 and row["est_jaccard"] == 1.0


def test_duplicate_spans_stride_subsamples_windows(spark):
    text = " ".join(f"w{i}" for i in range(20))  # 20 words -> 13 windows at w=8
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    full = {r["id"]: r for r in dedup.duplicate_spans(df, w=8).collect()}
    strided = {r["id"]: r for r in dedup.duplicate_spans(df, w=8, stride=4).collect()}
    assert full[1]["n_windows"] == 13
    # starts 0,4,8,12 -> 4 windows; identical docs still fully flagged
    assert strided[1]["n_windows"] == 4
    assert strided[1]["dup_fraction"] == 1.0


def test_near_dedup_rejects_string_ids(spark):
    df = spark.createDataFrame([("a", BASE)], "doc_id string, text string")
    import pytest

    with pytest.raises(ValueError, match="integral 'doc_id'"):
        dedup.near_dedup(df)
    with pytest.raises(ValueError, match="integral 'doc_id'"):
        dedup.near_dedup_against(df, df)


def test_duplicate_spans_randomized_python_oracle(spark):
    """Seeded random corpora vs an independent pure-Python recomputation.

    Inputs are pre-normalized (lowercase ASCII words), so normalization is
    the identity and the Python oracle only has to replicate the window
    semantics: positional w-windows (whole text when shorter), a window is
    dup iff it appears verbatim in >= 2 distinct docs."""
    import random

    rng = random.Random(99)
    # alphabetic-only vocab: S1 normalization strips digits (base-28
    # alphabet is a-z + space), which would collapse tok0/tok1/... to 'tok'
    vocab = [f"tok{chr(97 + i)}" for i in range(12)]  # toka..tokl
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(2, 30))] for i in range(40)
    }
    w, stride = 5, 2

    def windows(ws):
        if len(ws) < w:
            return [" ".join(ws)]
        return [" ".join(ws[i : i + w]) for i in range(0, len(ws) - w + 1, stride)]

    per_doc = {i: windows(ws) for i, ws in docs.items()}
    from collections import Counter

    df_count = Counter()
    for i, wins in per_doc.items():
        for win in set(wins):
            df_count[win] += 1
    expected = {
        i: (len(wins), sum(1 for win in wins if df_count[win] >= 2))
        for i, wins in per_doc.items()
    }

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs.items()], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_windows"], r["n_dup_windows"])
        for r in dedup.duplicate_spans(df, w=w, stride=stride, hash_fn="fast").collect()
    }
    assert got == expected


def test_near_dedup_randomized_planted_groups(spark):
    """Planted duplicate groups vs a pure-Python expectation.

    Each base document draws from its OWN disjoint vocabulary slice, so
    documents of different groups share zero shingles (est_jaccard = 0)
    while exact copies share all of them (est_jaccard = 1) -- the expected
    clustering is exactly text-equality, independent of hash internals."""
    import random

    rng = random.Random(7)
    rows, next_id = [], 0
    expected_keeper = {}
    for g in range(8):
        vocab = [f"w{chr(97 + g)}{chr(97 + j)}" for j in range(8)]  # group-private
        text = " ".join(rng.choice(vocab) for _ in range(25))
        n_copies = rng.randint(1, 4)
        ids = list(range(next_id, next_id + n_copies))
        next_id += n_copies
        for i in ids:
            rows.append((i, text))
            expected_keeper[i] = min(ids)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in dedup.near_dedup(df, threshold=0.5).collect()}
    assert {i: r["keep_id"] for i, r in got.items()} == expected_keeper
    for i, r in got.items():
        assert r["is_dup"] == (1 if expected_keeper[i] != i else 0)


def test_stored_banded_reference_skips_resigning(spark, tmp_path, monkeypatch):
    """Round-3 verdict #5: save_banded_signatures persists the reference
    side once; near_dedup_against_stored signs ONLY the new batch
    (call-count pin) and returns output identical to the unstored call."""
    ref = spark.createDataFrame([(10, BASE), (11, UNIQUE)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, BASE[: int(len(BASE) * 0.9)]), (2, "entirely fresh content here")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ref_sigs")
    dedup.save_banded_signatures(ref, path, num_hashes=16, bands=4, seed=11)

    direct = sorted(
        dedup.near_dedup_against(
            new, ref, num_hashes=16, bands=4, seed=11
        ).collect(),
        key=lambda r: r["id"],
    )

    calls: list[str] = []
    real_sig = dedup.minhash_signatures

    def counting_sig(df, *a, **k):
        calls.append("sig")
        return real_sig(df, *a, **k)

    monkeypatch.setattr(dedup, "minhash_signatures", counting_sig)
    stored = sorted(
        dedup.near_dedup_against_stored(new, path).collect(),
        key=lambda r: r["id"],
    )
    assert len(calls) == 1, "reference side was re-signed"
    assert [tuple(r) for r in stored] == [tuple(r) for r in direct]

    # stored meta drives the new side's parameters (w/num_hashes/seed):
    # a default-parameter direct call would NOT match this output shape
    _, meta = dedup.load_banded_signatures(spark, path)
    assert meta["num_hashes"] == 16 and meta["bands"] == 4 and meta["seed"] == 11


def test_load_banded_signatures_guards(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        dedup.load_banded_signatures(spark, str(tmp_path / "nope"))


def _span_oracle(texts: dict[int, str], w: int, min_docs: int, stride: int = 1):
    """Pure-Python oracle: windows per doc (with offsets), dup-window set,
    covered positions, and kept text -- mirrors normalize + clamp rules."""
    from blurrily_spark.functions.tokenizer import normalize_py

    wins: dict[int, list[tuple[int, str]]] = {}
    for i, t in texts.items():
        ws = normalize_py(t).split(" ")
        n = len(ws)
        starts = list(range(0, max(n - w, 0) + 1, stride))
        wins[i] = [(s, " ".join(ws[s : s + w])) for s in starts]
    from collections import Counter

    docs_per_win = Counter()
    for i, lst in wins.items():
        for win in {win for _, win in lst}:
            docs_per_win[win] += 1
    dup = {win for win, c in docs_per_win.items() if c >= min_docs}
    positions = {
        (i, s, win) for i, lst in wins.items() for (s, win) in lst if win in dup
    }
    kept = {}
    for i, t in texts.items():
        ws = normalize_py(t).split(" ")
        covered = set()
        for (j, s, win) in positions:
            if j == i:
                covered.update(range(s, min(s + w, len(ws))))
        kept_words = [wd for p, wd in enumerate(ws) if p not in covered]
        kept[i] = (" ".join(kept_words), len(ws), len(kept_words))
    return positions, kept


def test_span_positions_and_cut_golden(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    texts = {
        1: f"one unique prefix here {shared} and a unique tail one",
        2: f"totally different opener {shared} closing words differ two",
        3: "no overlap with anyone at all in this document text",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    exp_pos, exp_kept = _span_oracle(texts, w=8, min_docs=2)
    got_pos = {
        (r["id"], r["start_word"], r["win"])
        for r in dedup.duplicate_span_positions(df, w=8).collect()
    }
    assert got_pos == exp_pos
    assert any(r[0] == 1 for r in got_pos) and any(r[0] == 2 for r in got_pos)
    got_kept = {
        r["id"]: (r["kept_text"], r["n_words"], r["n_kept_words"])
        for r in dedup.cut_duplicate_spans(df, w=8, hash_fn="exact").collect()
    }
    assert got_kept == exp_kept
    assert got_kept[3][2] == got_kept[3][1]  # doc 3 untouched: nothing cut


def test_span_cut_randomized_python_oracle(spark):
    import random

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        texts = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40)))
            for i in range(14)
        }
        df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        w, stride = rng.choice([(4, 1), (5, 2), (3, 1)])
        exp_pos, exp_kept = _span_oracle(texts, w=w, min_docs=2, stride=stride)
        got_pos = {
            (r["id"], r["start_word"], r["win"])
            for r in dedup.duplicate_span_positions(
                df, w=w, stride=stride
            ).collect()
        }
        assert got_pos == exp_pos, f"positions mismatch (trial {trial}, w={w})"
        got_kept = {
            r["id"]: (r["kept_text"], r["n_words"], r["n_kept_words"])
            for r in dedup.cut_duplicate_spans(
                df, w=w, stride=stride, hash_fn="fast"
            ).collect()
        }
        assert got_kept == exp_kept, f"kept-text mismatch (trial {trial}, w={w})"


def test_fully_duplicated_doc_cuts_to_empty(spark):
    same = "exact same words in both documents for the whole text body"
    df = spark.createDataFrame([(1, same), (2, same)], "doc_id long, text string")
    got = {r["id"]: r for r in dedup.cut_duplicate_spans(df, w=5).collect()}
    assert got[1]["kept_text"] == "" and got[1]["n_kept_words"] == 0
    assert got[2]["kept_text"] == "" and got[2]["n_words"] > 0


def test_jaccard_join_exact_equals_brute(spark):
    """Prefix filtering is an exact method: across thresholds and a seeded
    random corpus (injected near-dups + unique tails), the prefix-filtered
    join must return the IDENTICAL pair set, intersections, and jaccard
    values as the brute all-pairs baseline."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(2, 25))]
        rows.append((i, " ".join(words)))
        if i % 4 == 0:  # a truncated near-duplicate
            rows.append((100 + i, " ".join(words[: max(2, len(words) * 3 // 4)])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8, 1.0):
        brute = sorted(
            (r["id_a"], r["id_b"], r["inter"], round(r["jaccard"], 9))
            for r in dedup.shingle_pairs_jaccard(df, threshold=t).collect()
        )
        fast = sorted(
            (r["id_a"], r["id_b"], r["inter"], round(r["jaccard"], 9))
            for r in dedup.jaccard_join_exact(df, threshold=t).collect()
        )
        assert fast == brute, f"threshold {t}"
        assert brute, f"threshold {t}: degenerate test (no qualifying pairs)"


def test_jaccard_join_exact_validates_threshold(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        dedup.jaccard_join_exact(df, threshold=0.0)
