"""connected_components: alternating large-star/small-star CC over
candidate-pair edge lists (the cluster step after LSH pair generation).

Reference semantics: every node appearing in the pair list is labeled with
the smallest node id reachable from it. Verified against a pure-Python
union-find on deterministic random graphs plus adversarial shapes (long
path, star, two planted clusters joined by a bridge, singleton edge).
"""
import random

import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.docdedup import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min id in component
    comp = {}
    for n in parent:
        comp[n] = find(n)
    return comp


def _run(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


CASES = {
    "path": [(i, i + 1) for i in range(60)],
    "star": [(0, i) for i in range(1, 40)],
    "reversed_path": [(i + 1, i) for i in range(40)],
    "two_clusters_bridge": (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
        + [(4, 100)]
    ),
    "singleton_edge": [(7, 7), (9, 11)],
    "self_loops_only": [(3, 3), (5, 5)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_union_find_on_shapes(spark, name):
    edges = CASES[name]
    got = _run(spark, edges)
    want = _union_find([(u, v) for u, v in edges if u != v])
    # self-loop-only nodes still appear, labeled by themselves
    for u, v in edges:
        want.setdefault(u, u)
        want.setdefault(v, v)
    assert got == want


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randrange(40, 160))]
        got = _run(spark, edges)
        want = _union_find([(u, v) for u, v in edges if u != v])
        for u, v in edges:
            want.setdefault(u, u)
            want.setdefault(v, v)
        assert got == want, f"trial {trial}"


def test_long_path_converges_in_log_rounds(spark):
    # a 500-node path is the worst case for naive propagation (500 rounds);
    # star contraction must converge within the max_iter guard
    edges = [(i, i + 1) for i in range(500)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 501


def test_component_label_is_min_id(spark):
    got = _run(spark, [(50, 20), (20, 90), (5, 90), (300, 200)])
    assert got == {5: 5, 20: 5, 50: 5, 90: 5, 200: 200, 300: 200}


def test_empty_pairs(spark):
    df = (
        spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        .where(F.lit(False))
    )
    assert connected_components(df).count() == 0


def test_dedup_near_picks_longest_then_smallest_id(spark):
    from cdcrypt.operators.docdedup import dedup_near
    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text of all"), (3, "medium len"),
         (10, "same"), (11, "same"),       # tie on length -> min id wins
         (20, "loner untouched by pairs"),
         (30, None)],                       # null text, paired with 31
        "doc_id long, text string")
    docs = docs.union(spark.createDataFrame([(31, "real")],
                                            "doc_id long, text string"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (30, 31)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["component"], r["n_in_cluster"])
           for r in dedup_near(docs, pairs).collect()}
    assert out == {
        2: (1, 3),     # longest of {1,2,3}
        10: (10, 2),   # tie -> smaller id
        20: (20, 1),   # singleton survives
        31: (30, 2),   # real text beats null
    }


def test_dedup_near_survivor_count(spark):
    from cdcrypt.operators.docdedup import dedup_near
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)],
        "doc_id long, text string")
    # chain 0-1-2-...-9 into one cluster; 40 singletons remain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long")
    out = dedup_near(docs, pairs)
    assert out.count() == 41
    assert out.where("n_in_cluster = 10").count() == 1
