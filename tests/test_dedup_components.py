"""Connected-components dedup clustering: Spark BSP result vs an
independent union-find ground truth over the same verified-pair graph."""

from tests.conftest import SF_SMOKE

from oct_report_ocr_spark.operators import dedup


def _union_find_partition(pairs):
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return comps


def test_components_match_union_find(spark):
    rows = dedup.q_dedup_components(spark, SF_SMOKE).collect()
    got = {r.doc_id: (r.component_id, r.n_members) for r in rows}

    pairs = (
        dedup._verify_pairs(
            spark, SF_SMOKE, dedup.q_minhash_lsh_pairs_capped(spark, SF_SMOKE)
        )
        .select("doc_a", "doc_b")
        .unionAll(
            dedup.q_dedup_heavy_pass(spark, SF_SMOKE).select("doc_a", "doc_b")
        )
        .distinct()
        .collect()
    )
    assert pairs, "test graph is vacuous at this sf"
    truth = _union_find_partition([(p.doc_a, p.doc_b) for p in pairs])

    # same node set, and per node: component id == min member of its
    # union-find class, n_members == class size
    want = {}
    for root, members in truth.items():
        for m in members:
            want[m] = (min(members), len(members))
    assert got == want

    # transitivity the per-pair survivor verdict cannot express: at least
    # one component must be larger than a single edge (chained dups)
    assert any(n > 2 for _, n in got.values())


def test_survivors_complement_cluster_losers(spark):
    from pyspark.sql import functions as F

    from oct_report_ocr_spark.operators.relational import load

    comp = {
        r.doc_id: r.component_id
        for r in dedup.q_dedup_components(spark, SF_SMOKE).collect()
    }
    losers = {d for d, c in comp.items() if d != c}
    all_docs = {
        r.doc_id
        for r in load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id")
        .collect()
    }
    rows = dedup.q_dedup_survivors(spark, SF_SMOKE).collect()
    got = {r.doc_id: r.is_cluster_rep for r in rows}
    assert set(got) == all_docs - losers
    # flag semantics: True iff the doc heads a (≥2-member) dup cluster
    reps = {d for d, c in comp.items() if d == c}
    for doc_id, flag in got.items():
        assert flag == (doc_id in reps)
    assert any(got.values()) and not all(got.values())


def test_kernel_deep_chain_converges_log_rounds(spark):
    """A 500-node path graph has diameter 499 >> CC_MAX_ROUNDS: plain
    min propagation cannot converge inside the round budget, so this
    passing proves the star iterations contract super-linearly."""
    n = 500
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a: long, doc_b: long"
    )
    rows = dedup.components_from_pairs(spark, pairs).collect()
    assert len(rows) == n
    assert all(r.component_id == 0 and r.n_members == n for r in rows)


def test_kernel_descending_id_path_regression(spark):
    """Round-4 regression (found by the 16×-scale run, VERDICT r03 item
    6): on a path whose node ids DESCEND along the propagation
    direction — the heavy-pass sorted neighborhood emits exactly this
    when a template family's secondary order anti-correlates with
    doc_id — the old min-label + pointer-jumping loop degenerated to
    O(diameter) rounds (a 212-node ring in the sf1.6 corpus crawled 2
    nodes/round past CC_MAX_ROUNDS). The alternating large-star/
    small-star kernel must converge well inside the budget, in ~log₂ n
    iterations."""
    n = 2000
    # ids descending along the path, plus skip-2 links and a ring
    # closure — the sf1.6 structure, scaled up
    edges = [(n - i, n - i - 1) for i in range(n - 1)]
    edges += [(n - i, n - i - 2) for i in range(n - 2)]
    edges += [(n, 1)]
    pairs = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    stats: list = []
    rows = dedup.components_from_pairs(spark, pairs, stats=stats).collect()
    assert len(rows) == n
    assert all(r.component_id == 1 and r.n_members == n for r in rows)
    rounds = len([s for s in stats if "round" in s])
    assert rounds <= 16, f"star loop took {rounds} rounds on a 2000-node ring"


def test_kernel_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = sorted(
        {tuple(sorted(rng.sample(range(200), 2))) for _ in range(120)}
    )
    pairs = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    rows = dedup.components_from_pairs(spark, pairs).collect()
    truth = _union_find_partition(edges)
    want = {}
    for _, members in truth.items():
        for m in members:
            want[m] = (min(members), len(members))
    assert {r.doc_id: (r.component_id, r.n_members) for r in rows} == want


def test_components_edge_endpoints_agree(spark):
    rows = dedup.q_dedup_components(spark, SF_SMOKE).collect()
    label = {r.doc_id: r.component_id for r in rows}
    pairs = (
        dedup._verify_pairs(
            spark, SF_SMOKE, dedup.q_minhash_lsh_pairs_capped(spark, SF_SMOKE)
        )
        .select("doc_a", "doc_b")
        .collect()
    )
    for p in pairs:
        assert label[p.doc_a] == label[p.doc_b]


def test_components_empty_pair_set(spark):
    """An empty pair graph must converge immediately to an empty result
    (the no-duplicates crawl window), not hang or raise on the None
    convergence metric."""
    from oct_report_ocr_spark.operators.dedup import components_from_pairs

    empty = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    out = components_from_pairs(spark, empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "component_id", "n_members"]
