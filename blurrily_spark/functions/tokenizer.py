"""Trigram tokenization pipeline (reference operators S1-S5).

Re-creates the observable semantics of mezis/blurrily's normalization and
trigram tokenizer as Spark SQL *expressions* (JVM-side, whole-stage codegen)
with a vectorized Arrow/pandas UDF only for the Unicode NFKD fold that SQL
cannot express.

Reference semantics (cited into /root/reference):

* S1 normalize  -- ``lib/blurrily/map.rb:40-47``: downcase; unless the result
  already matches ``/^([a-z ])+$/``: NFKD-decompose, strip non-ASCII bytes,
  replace every non-``[a-z]`` char with a space; always collapse whitespace
  runs to one space and strip both ends.
* S2 pad        -- ``ext/blurrily/tokeniser.c:65-70``: wrap as ``**<text>*``
  and turn inner spaces into ``*``.
* S3 window     -- ``ext/blurrily/tokeniser.c:72-75``: emit ``len(text)+1``
  sliding 3-char windows (empty string => 1 window ``***``).
* S4 encode     -- ``ext/blurrily/tokeniser.c:21-31``: base-28 positional
  code ``c0 + 28*c1 + 784*c2`` with ``*``/non-letter => 0, a..z => 1..26.
  Max code ``'zzz'`` = 21138, fits uint16.
* S5 dedup      -- ``ext/blurrily/tokeniser.c:93-118``: unique trigram codes
  (sortedness there is an implementation artifact; only set semantics are
  observable).

Design note (Spark-first): the whole pipeline is expressible with built-in
functions (``lower``/``regexp_replace``/``translate``/``transform``/
``sequence``/``array_distinct``), so at 100 TB the tokenizer runs entirely
inside whole-stage codegen with zero Python in the hot path. The pandas UDF
(`nfkd_fold`) is reached only by rows that contain non-ASCII bytes after
lowering; an all-ASCII corpus never leaves the JVM.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

TRIGRAM_BASE = 28  # ext/blurrily/tokeniser.h:22 (alphabet {*, a..z} = 28 symbols)
TRIGRAM_COUNT = TRIGRAM_BASE**3  # 21952 possible codes; ext/blurrily/storage.c:30

# lib/blurrily/map.rb:41 (note: `+` => empty string is NOT clean).
# Intentional divergence from a reference quirk: Ruby's /^([a-z ])+$/ anchors
# ^/$ per *line*, so a multiline needle with one fully-clean line skips the
# strip branch entirely and keeps digits/diacritics in the normalized output
# ("abc\n12" -> "abc 12"); the C tokenizer then encodes those bytes as
# 0-symbols. We anchor over the whole string: the strip branch runs whenever
# ANY character is outside [a-z ] ("abc\n12" -> "abc"). Deliberate -- the
# line-dependent leakage is an artifact no reference spec covers, and a
# guaranteed [a-z ] output alphabet is what makes the base-28 encoding total
# (tests/test_tokenizer.py::test_multiline_clean_line_divergence).
_CLEAN_RE = "^[a-z ]+$"
_ASCII_RE = "^[\\x00-\\x7F]*$"


def _build_latin_fold() -> tuple[str, str, str]:
    """Chars whose NFKD-then-ASCII-strip result is <= 1 ASCII char, so the
    fold is expressible as a JVM ``translate`` (1:1 map or delete).

    Covers Latin-1 Supplement, Latin Extended-A/B and combining marks --
    i.e. virtually all real-world Latin-script text. Multi-char
    decompositions (ﬁ -> fi, ĳ -> ij, ...) are excluded and fall through to
    the exact NFKD pandas UDF.
    Returns (regex char-class of covered chars, translate src, translate dst
    [shorter => trailing src chars are deleted]).
    """
    mapped: list[tuple[str, str]] = []
    deleted: list[str] = []
    for cp in list(range(0x00A0, 0x0250)) + list(range(0x0300, 0x0370)):
        ch = chr(cp)
        if ch != ch.lower():  # translate runs on lowered text
            continue
        target = "".join(
            c for c in unicodedata.normalize("NFKD", ch) if ord(c) < 128
        )
        if len(target) == 1:
            mapped.append((ch, target))
        elif len(target) == 0:
            deleted.append(ch)
    src = "".join(m[0] for m in mapped) + "".join(deleted)
    dst = "".join(m[1] for m in mapped)
    char_class = "^[\\x00-\\x7F" + src + "]*$"
    return char_class, src, dst


_LATIN_RE, _LATIN_SRC, _LATIN_DST = _build_latin_fold()


# ---------------------------------------------------------------------------
# Pure-Python reference implementation (golden model for tests + oracle gen).
# ---------------------------------------------------------------------------

def normalize_py(s: str | None) -> str | None:
    """Python twin of S1 (lib/blurrily/map.rb:40-47)."""
    if s is None:
        return None
    result = s.lower()
    if not re.fullmatch(r"[a-z ]+", result):
        decomposed = unicodedata.normalize("NFKD", result)
        decomposed = "".join(ch for ch in decomposed if ord(ch) < 128)
        result = re.sub(r"[^a-z]", " ", decomposed)
    return re.sub(r"\s+", " ", result).strip()


def trigrams_py(norm: str | None) -> list[int] | None:
    """Python twin of S2-S5 (ext/blurrily/tokeniser.c:65-118).

    Input must already be normalized. Returns the sorted unique trigram
    codes; ``''`` yields ``[0]`` (the ``***`` trigram).
    """
    if norm is None:
        return None
    padded = "**" + norm.replace(" ", "*") + "*"
    codes = set()
    for k in range(len(norm) + 1):
        code = 0
        for i in range(3):
            ch = padded[k + i]
            if "a" <= ch <= "z":
                code += (TRIGRAM_BASE**i) * (ord(ch) - 96)
        codes.add(code)
    return sorted(codes)


def tokenize_py(s: str | None) -> list[int] | None:
    """normalize + trigrams in one call (the reference's put/find prep)."""
    return trigrams_py(normalize_py(s))


# ---------------------------------------------------------------------------
# Vectorized Arrow/pandas UDF for the NFKD fold (slow path only).
# ---------------------------------------------------------------------------

@F.pandas_udf(StringType())
def nfkd_fold(s: pd.Series) -> pd.Series:
    """NFKD-decompose, strip non-ASCII, non-[a-z] -> space.

    Only invoked for rows whose lowered text contains non-ASCII bytes
    (lib/blurrily/map.rb:42's multibyte branch). Arrow-batched; the per-row
    body is unavoidable because unicodedata has no columnar form.
    """

    def fold(x: str | None) -> str | None:
        if x is None:
            return None
        d = unicodedata.normalize("NFKD", x)
        d = d.encode("ascii", "ignore").decode("ascii")
        return re.sub(r"[^a-z]", " ", d)

    return s.map(fold)


@F.pandas_udf(ArrayType(IntegerType()))
def trigrams_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer (S2-S5) over *normalized* text.

    Provided for API parity with the north-star's "vectorized Arrow UDF"
    phrasing and as a fallback; the production path is :func:`trigrams`,
    which compiles to pure JVM expressions.
    """
    return s.map(trigrams_py)


# ---------------------------------------------------------------------------
# Spark SQL expression pipeline (the production path).
# ---------------------------------------------------------------------------

def normalize(col: Column | str) -> Column:
    """S1 as a Column expression.

    Three-way branch mirroring lib/blurrily/map.rb:40-47:
      1. already ``^[a-z ]+$`` after lower  -> unchanged (clean path);
      2. ASCII-only                         -> SQL ``[^a-z] -> ' '`` (NFKD is
         the identity on ASCII, so the multibyte branch degenerates to a
         regexp_replace that codegen handles);
      3. otherwise                          -> :func:`nfkd_fold` pandas UDF.
    Whitespace collapse + trim always apply (map.rb:46).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    # Four tiers, cheapest first; tiers 1-3 are pure JVM expressions:
    #   1. already clean                         -> unchanged
    #   2. ASCII                                 -> regexp fold
    #   3. Latin-script (1:1 NFKD decomposable)  -> translate fold
    #   4. anything else                         -> exact NFKD pandas UDF
    # The Arrow UDF node is evaluated for every row regardless of the WHEN
    # branch taken (Catalyst extracts Python UDFs unconditionally), so gate
    # its *input* to NULL for tier 1-3 rows -- the Python side then does no
    # unicodedata work and ships nothing back for the dominant case.
    needs_udf = ~(c.rlike(_ASCII_RE) | c.rlike(_LATIN_RE))  # Or short-circuits
    folded = nfkd_fold(F.when(needs_udf, c))
    base = (
        F.when(c.rlike(_CLEAN_RE), c)
        .when(c.rlike(_ASCII_RE), F.regexp_replace(c, "[^a-z]", " "))
        .when(
            ~needs_udf,
            F.regexp_replace(F.translate(c, _LATIN_SRC, _LATIN_DST), "[^a-z]", " "),
        )
        .otherwise(folded)
    )
    return F.trim(F.regexp_replace(base, "\\s+", " "))


def _normalize_jvm(c: Column) -> Column:
    """Tiers 1-3 only (caller guarantees no tier-4 rows): pure JVM."""
    base = (
        F.when(c.rlike(_CLEAN_RE), c)
        .when(c.rlike(_ASCII_RE), F.regexp_replace(c, "[^a-z]", " "))
        .otherwise(
            F.regexp_replace(F.translate(c, _LATIN_SRC, _LATIN_DST), "[^a-z]", " ")
        )
    )
    return F.trim(F.regexp_replace(base, "\\s+", " "))


def with_normalized(
    df,
    text_col: str,
    out_col: str = "norm",
    adaptive: bool | str = False,
    spread: bool = False,
):
    """Bulk normalization with a plan-level split: rows whose lowered text is
    ASCII/Latin take a branch containing NO Python node at all (the Arrow
    UDF node would otherwise round-trip every row, nulls included), and only
    genuinely non-Latin rows flow through the exact-NFKD UDF branch. The
    union preserves S1 semantics exactly; row order is not preserved (no
    engine operator depends on it).

    ``spread=True`` re-spreads a tiny file-backed scan across the session's
    shuffle parallelism (:func:`blurrily_spark.config.spread_small_input`)
    AFTER the probe, so the normalization and everything stacked on top of
    it parallelize instead of running on the 1-2 tasks a single-row-group
    file yields; a no-op at real corpus sizes.

    ``adaptive=True`` first runs a cheap single-column probe (filter +
    limit 1, column-pruned at the scan): if the input has no tier-4 rows --
    the overwhelmingly common case for real corpora -- the returned plan is
    ONE scan of pure JVM expressions with no Python node and no union at
    all. The probe is an eager job, so it is illegal on streaming
    DataFrames and wasteful on expensive computed inputs; ``adaptive=
    'auto'`` (what the engine's operators pass) probes only when the input
    is batch AND file-backed (``df.inputFiles()`` non-empty => the second
    scan is a cheap column-pruned file read), and otherwise falls back to
    the lazy union plan -- so operator construction never launches a job on
    computed inputs and never throws on streaming ones.
    """
    from blurrily_spark.config import spread_small_input, tune_session

    tune_session(df.sparkSession)
    if adaptive == "auto":
        adaptive = (not df.isStreaming) and bool(df.inputFiles())
    probe_df = df
    if spread:
        # spread the returned plan only -- the probe below keeps running on
        # the raw scan (column-pruned, no shuffle)
        df = spread_small_input(df)
    c = F.lower(F.col(text_col))
    # ASCII test first: Spark's Or codegen short-circuits, so the expensive
    # ~300-char Latin class regex only ever runs on non-ASCII rows
    # (measured 10x on an ASCII-dominant corpus).
    latin_ok = c.rlike(_ASCII_RE) | c.rlike(_LATIN_RE)
    if adaptive:
        # a parallel any() aggregation, NOT filter+limit(1): when no row
        # matches (the common all-ASCII/Latin case) limit(1) degenerates to
        # serial partition waves (CollectLimit scale-up), which caps scaling;
        # the aggregation is one fully-parallel column-pruned scan.
        has_exotic = probe_df.agg(
            F.max(
                F.when(~latin_ok & F.col(text_col).isNotNull(), 1).otherwise(0)
            ).alias("x")
        ).collect()[0]["x"]
        if not has_exotic:
            return df.withColumn(out_col, _normalize_jvm(c))
    latin = df.where(latin_ok | F.col(text_col).isNull()).withColumn(
        out_col, _normalize_jvm(c)
    )
    exotic = df.where(~latin_ok).withColumn(
        out_col, F.trim(F.regexp_replace(nfkd_fold(c), "\\s+", " "))
    )
    return latin.unionByName(exotic)


def _enc(ch: Column) -> Column:
    """S4 single-char code: a..z -> 1..26, anything else -> 0."""
    a = F.ascii(ch)
    return F.when((a >= 97) & (a <= 122), a - 96).otherwise(F.lit(0))


def padded(norm: Column | str) -> Column:
    """S2: ``**<text>*`` with spaces -> ``*`` (tokeniser.c:65-70)."""
    c = F.col(norm) if isinstance(norm, str) else norm
    return F.concat(F.lit("**"), F.translate(c, " ", "*"), F.lit("*"))


def trigrams(norm: Column | str) -> Column:
    """S2-S5 as one Column expression over *normalized* text.

    ``array_distinct(transform(sequence(0, len), k -> code(window_k)))`` --
    len+1 windows (tokeniser.c:72-75), base-28 encode (tokeniser.c:21-31),
    set-dedup (tokeniser.c:93-118).

    NOTE: convenient for small/query-side expressions, but the padding
    expression is evaluated inside the lambda (per character access =
    O(n^2) interpreted work per row). Bulk paths must use
    :func:`add_trigrams`, which stages padded -> char codes -> windows as
    materialized columns so every lambda access is an O(1) element_at.
    """
    c = F.col(norm) if isinstance(norm, str) else norm
    p = padded(c)
    one = F.lit(1)

    def code(k: Column) -> Column:
        c0 = _enc(p.substr(k + one, one))
        c1 = _enc(p.substr(k + F.lit(2), one))
        c2 = _enc(p.substr(k + F.lit(3), one))
        return (c0 + c1 * TRIGRAM_BASE + c2 * TRIGRAM_BASE * TRIGRAM_BASE).cast("int")

    return F.array_distinct(F.transform(F.sequence(F.lit(0), F.length(c)), code))


def codes_from_padded(p: Column | str) -> Column:
    """Per-character base-28 codes of the padded string, as array<int>."""
    c = F.col(p) if isinstance(p, str) else p
    return F.transform(F.split(c, ""), _enc)


def trigrams_from_codes(codes: Column | str, norm_len: Column) -> Column:
    """Windowed trigram codes from a *materialized* char-code array.

    Each lambda access is element_at (O(1)); the char codes are computed
    once per row by :func:`codes_from_padded`. This is the bulk/hot path.
    """
    cc = F.col(codes) if isinstance(codes, str) else codes

    def code(k: Column) -> Column:
        c0 = F.element_at(cc, k + F.lit(1))
        c1 = F.element_at(cc, k + F.lit(2))
        c2 = F.element_at(cc, k + F.lit(3))
        return (c0 + c1 * TRIGRAM_BASE + c2 * TRIGRAM_BASE * TRIGRAM_BASE).cast("int")

    return F.array_distinct(F.transform(F.sequence(F.lit(0), norm_len), code))


def add_trigrams(df, norm_col: str, out_col: str = "trigrams"):
    """Staged bulk tokenization over an existing normalized column.

    norm -> padded -> char codes -> windowed trigram codes, each as its own
    column so Catalyst keeps them materialized (the codes array is
    referenced three times per window, which blocks project-collapse
    re-inlining) and lambda bodies never recompute string expressions.
    """
    from blurrily_spark.config import tune_session

    tune_session(df.sparkSession)
    out = (
        df.withColumn("__pad", padded(F.col(norm_col)))
        .withColumn("__codes", codes_from_padded(F.col("__pad")))
        .withColumn(
            out_col, trigrams_from_codes(F.col("__codes"), F.length(F.col(norm_col)))
        )
    )
    return out.drop("__pad", "__codes")


def with_trigrams(df, text_col: str, out_col: str = "trigrams", norm_col: str | None = None):
    """normalize + trigrams over a DataFrame: raw text -> array<int> column.

    Two projections by construction: Spark forbids Python UDFs (the NFKD
    branch of :func:`normalize`) inside higher-order-function lambdas, so
    the normalized text must be materialized as its own column before
    :func:`trigrams` references it.
    """
    tmp = norm_col or "__norm"
    out = df.withColumn(tmp, normalize(F.col(text_col)))
    out = out.withColumn(out_col, trigrams(F.col(tmp)))
    if norm_col is None:
        out = out.drop(tmp)
    return out


def trigram_to_string(code: int) -> str:
    """Decode a trigram code back to its 3-char form (tokeniser.c:35-46)."""
    out = []
    for k in range(3):
        elem = code // (TRIGRAM_BASE**k) % TRIGRAM_BASE
        out.append("*" if elem == 0 else chr(ord("a") + elem - 1))
    return "".join(out)
