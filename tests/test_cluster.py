"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

from blurrily_spark.operators.cluster import assign_entities, connected_components


def union_find_components(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = component min
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


def _check(spark, edges, nodes=None):
    nodes = nodes or {n for e in edges for n in e}
    expected = union_find_components(edges, nodes)
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(n,) for n in sorted(nodes)], "ref long")
    got = {r["ref"]: r["entity_id"] for r in assign_entities(ndf, edf).collect()}
    assert got == expected


def test_simple_chain(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4)])


def test_two_components(spark):
    _check(spark, [(1, 2), (5, 6), (6, 7), (2, 1)])


def test_star_and_cycle(spark):
    _check(spark, [(10, 1), (10, 2), (10, 3), (20, 21), (21, 22), (22, 20)])


def test_self_loops_ignored(spark):
    _check(spark, [(1, 1), (1, 2), (3, 3)], nodes={1, 2, 3})


def test_random_graphs(spark):
    rng = random.Random(7)
    nodes = list(range(100))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(120)
    ]
    _check(spark, edges, nodes=set(n for e in edges for n in e))


def test_assign_entities_includes_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "ref long")
    edges = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    got = {r["ref"]: r["entity_id"] for r in assign_entities(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 5}


def test_iteration_checkpoints_are_freed(spark):
    """Superseded per-round localCheckpoints must be unpersisted as the loop
    advances -- leaked blocks sit in the unified memory pool until the next
    periodic JVM GC and measurably slow every subsequent job in the session
    (observed 3x on an unrelated aggregation). Only the final round's
    checkpoint may remain, and the labels must still be readable from it."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # a 64-node chain needs several large-star/small-star rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    labels = connected_components(edges)
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, f"leaked {after - before} checkpoint RDDs"
    got = {r["ref"]: r["entity_id"] for r in labels.collect()}
    assert set(got.values()) == {0} and len(got) == 65


def test_one_job_per_iteration(spark):
    """Round-3 verdict #2: the convergence fingerprint rides on the
    checkpoint materialization via observe() -- each large-star/small-star
    round costs exactly ONE job (previously two: checkpoint + a separate
    count/bit_xor pass). Budget: 1 initial canonical checkpoint + 1 job per
    round; the final labels aggregation runs lazily on collect, outside the
    measured span."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    stats: dict = {}
    sc = spark.sparkContext
    # AQE splits one action into one job per shuffle stage, which would make
    # the job count measure plan depth, not action count -- switch it off so
    # jobs == actions for the pinned span
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc-jobs-pin", "count jobs per CC round")
    try:
        labels = connected_components(edges, stats=stats)
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    rounds = stats["rounds"]
    assert rounds >= 3  # a 64-chain takes several rounds; sanity
    jobs = len(sc.statusTracker().getJobIdsForGroup("cc-jobs-pin"))
    assert jobs <= rounds + 1, (
        f"{jobs} jobs for {rounds} rounds -- fingerprint is paying a "
        "separate pass again"
    )
    # and the labels are still correct
    got = {r["ref"]: r["entity_id"] for r in labels.collect()}
    assert set(got.values()) == {0} and len(got) == 65


def test_golden_records_survivorship(spark):
    from blurrily_spark.operators.cluster import golden_records

    records = spark.createDataFrame(
        [
            (1, "aaaa"),       # entity 1: len 4
            (2, "bbbbbb"),     # entity 1: len 6 -> survivor
            (3, "cccccc"),     # entity 1: len 6, higher ref -> loses tie to 2
            (7, "dd"),         # singleton entity
            (9, "eee"),        # entity 9: len 3 -> survivor (10 shorter)
            (10, "ff"),
        ],
        "ref long, text string",
    )
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "ref long, entity_id long",
    )
    got = {
        r["entity_id"]: (
            r["n_members"], r["canonical_ref"], r["canonical_len"], r["canonical_text"]
        )
        for r in golden_records(records, assignments).collect()
    }
    assert got == {
        1: (3, 2, 6, "bbbbbb"),
        7: (1, 7, 2, "dd"),
        9: (2, 9, 3, "eee"),
    }


def test_golden_records_no_window(spark):
    """Survivorship is one partial-aggregating min(struct) -- no Window
    operator (per-entity sort) anywhere in the plan."""
    from blurrily_spark.operators.cluster import golden_records

    records = spark.range(100).selectExpr(
        "id AS ref", "repeat('x', CAST(pmod(id, 7) AS INT) + 1) AS text"
    )
    assignments = spark.range(100).selectExpr("id AS ref", "pmod(id, 10) AS entity_id")
    plan = (
        golden_records(records, assignments)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_golden_records_null_text_loses(spark):
    """Null text must not win the min(struct) election (nulls sort first
    in Spark struct ordering): it ranks as the empty string, so any
    non-empty member survives instead."""
    from blurrily_spark.operators.cluster import golden_records

    recs = spark.createDataFrame(
        [(1, None), (2, "bb"), (5, None), (6, None)], "ref long, text string"
    )
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5)], "ref long, entity_id long"
    )
    got = {
        r["entity_id"]: (r["canonical_ref"], r["canonical_len"], r["canonical_text"])
        for r in golden_records(recs, asg).collect()
    }
    assert got[1] == (2, 2, "bb")
    assert got[5] == (5, 0, "")  # all-null entity: lowest ref, empty survivor
