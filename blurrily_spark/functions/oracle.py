"""DuckDB oracle SQL fragments mirroring the Spark operators.

These templates re-express the engine's semantics in ANSI-ish SQL that
DuckDB runs over the same parquet tables, for the driver's side-by-side
correctness gate. The normalization fragment assumes ASCII input (true for
the driver's `documents` table); the NFKD branch is identity there, so the
SQL is exact. Non-ASCII corpora are covered by the pytest golden suite
instead.
"""

from __future__ import annotations

NORM = (
    "trim(regexp_replace(regexp_replace(lower({text}), '[^a-z]', ' ', 'g'),"
    " '[ ]+', ' ', 'g'))"
)


def norm_cte(alias: str, table_sql: str, ref: str, text: str) -> str:
    """CTE ``{alias}_norm(ref, norm)``."""
    norm = NORM.format(text=text)
    return (
        f"{alias}_norm AS (SELECT {ref} AS ref, {norm} AS norm FROM {table_sql})"
    )


def _enc(pos: str) -> str:
    c = f"ascii(substr(p, CAST({pos} AS INT), 1))"
    return f"(CASE WHEN {c} BETWEEN 97 AND 122 THEN {c} - 96 ELSE 0 END)"


def trigram_ctes(alias: str) -> str:
    """CTEs from ``{alias}_norm`` to ``{alias}_tg(ref, trigram, weight)``.

    Mirrors tokenizer S2-S5: pad ``**text*``, len+1 windows, base-28 encode,
    distinct. ``weight`` = normalized length (the reference's default).
    """
    return f"""{alias}_pad AS (
  SELECT ref, norm, '**' || replace(norm, ' ', '*') || '*' AS p,
         length(norm) AS n
  FROM {alias}_norm
),
{alias}_k AS (
  SELECT ref, norm, p, unnest(range(0, n + 1)) AS k FROM {alias}_pad
),
{alias}_tg AS (
  SELECT DISTINCT ref,
    CAST({_enc('k+1')} + 28 * {_enc('k+2')} + 784 * {_enc('k+3')} AS INTEGER) AS trigram,
    CAST(length(norm) AS INTEGER) AS weight
  FROM {alias}_k
)"""


def postings_sql(table_sql: str, ref: str, text: str, alias: str = "hay") -> str:
    """Full postings query: (trigram, ref, weight)."""
    return f"""WITH {norm_cte(alias, table_sql, ref, text)},
{trigram_ctes(alias)}
SELECT trigram, ref, weight FROM {alias}_tg"""


def queries_values(needles: list[tuple[int, str]]) -> str:
    """VALUES literal ``q(query_id, needle)``."""
    rows = ", ".join(f"(CAST({qid} AS BIGINT), '{s}')" for qid, s in needles)
    return f"(VALUES {rows}) AS q(query_id, needle)"


def find_sql(
    table_sql: str,
    ref: str,
    text: str,
    needles: list[tuple[int, str]],
    limit: int = 10,
) -> str:
    """The FIND oracle: gather-join, group-count, rank, top-k."""
    return f"""WITH {norm_cte('hay', table_sql, ref, text)},
{trigram_ctes('hay')},
{norm_cte('qq', queries_values(needles), 'query_id', 'needle')},
{trigram_ctes('qq')},
scored AS (
  SELECT q.ref AS query_id, h.ref, count(*) AS matches, min(h.weight) AS weight
  FROM qq_tg q JOIN hay_tg h USING (trigram)
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, ref, matches, weight,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY matches DESC, weight ASC, ref ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, ref, matches, weight, rank FROM ranked WHERE rank <= {limit}"""


def pairs_ctes(alias: str = "hay") -> str:
    """CTEs from ``{alias}_tg`` to ``pairs(ref_a, ref_b, matches, jaccard)``."""
    return f"""tc AS (
  SELECT ref, count(*) AS n_tg FROM {alias}_tg GROUP BY ref
),
rawpairs AS (
  SELECT a.ref AS ref_a, b.ref AS ref_b, count(*) AS matches
  FROM {alias}_tg a JOIN {alias}_tg b
    ON a.trigram = b.trigram AND a.ref < b.ref
  GROUP BY 1, 2
),
pairs AS (
  SELECT ref_a, ref_b, matches,
         round(matches / CAST(ta.n_tg + tb.n_tg - matches AS DOUBLE), 6) AS jaccard
  FROM rawpairs
  JOIN tc ta ON ta.ref = ref_a
  JOIN tc tb ON tb.ref = ref_b
)"""


def cc_sql(table_sql: str, ref: str, text: str, threshold: float) -> str:
    """Connected components over thresholded match edges, via a recursive
    min-label-propagation CTE (exact oracle at test scale)."""
    return f"""WITH RECURSIVE {norm_cte('hay', table_sql, ref, text)},
{trigram_ctes('hay')},
{pairs_ctes('hay')},
edges AS (
  SELECT ref_a AS src, ref_b AS dst FROM pairs WHERE jaccard >= {threshold}
),
nodes AS (
  SELECT DISTINCT ref FROM (
    SELECT src AS ref FROM edges UNION ALL SELECT dst AS ref FROM edges
  )
),
undirected AS (
  SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
),
walk(node, label) AS (
  SELECT ref, ref FROM nodes
  UNION
  SELECT u.dst, w.label FROM walk w JOIN undirected u ON u.src = w.node
)
SELECT node AS ref, CAST(min(label) AS BIGINT) AS entity_id
FROM walk GROUP BY node"""
