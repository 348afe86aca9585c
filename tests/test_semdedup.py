"""SemDeDup spec (operators/similarity.py semdedup): planted near-duplicate
groups recovered under the kmeans assigner (exactly one survivor per
planted group — the lowest id), the greedy non-transitive keep rule, a
pure-Python brute-force equality for the LSH assigner (the gate's path),
and the mega-cluster skip valve."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.similarity import lsh_planes, semdedup

DIM = 16


def _mk(rng, n_groups=6, dups_per_group=3, n_noise=40):
    """Planted corpus: n_groups tight clusters of near-identical vectors
    (pairwise cos > 0.99) + well-separated noise."""
    rows = []
    vid = 0
    truth = []
    for g in range(n_groups):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        group = []
        for _ in range(dups_per_group):
            v = base + rng.standard_normal(DIM) * 0.01
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            group.append(vid)
            vid += 1
        truth.append(group)
    for _ in range(n_noise):
        v = rng.standard_normal(DIM)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    return rows, truth


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(x * x for x in b)))


@pytest.fixture(scope="module")
def planted(spark):
    rows, truth = _mk(np.random.default_rng(7))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df, truth


def test_kmeans_planted_groups_one_survivor(planted):
    df, truth = planted
    out = {r.vec_id: r.keep
           for r in semdedup(df, threshold=0.98, assigner="kmeans",
                             n_clusters=8, seed=3).collect()}
    assert len(out) == df.count()
    for group in truth:
        kept = [i for i in group if out[i]]
        # a tight planted group lands in one kmeans cell; the greedy sweep
        # keeps exactly its lowest id
        assert kept == [min(group)], (group, kept)
    # noise vectors (pairwise far) all survive
    noise = [i for i in out if all(i not in g for g in truth)]
    assert all(out[i] for i in noise)


def test_greedy_rule_is_not_transitive_closure(spark):
    """Chain a-b-c where sim(a,b) and sim(b,c) pass but sim(a,c) does not:
    the greedy sweep drops b (lower neighbor a) AND c iff c has a lower
    PASSING neighbor — here sim(b,c) passes and b < c, so c drops too even
    though b itself was dropped (the reference implementation's
    upper-triangular max, not a survivor-aware pass)."""
    a = [1.0] + [0.0] * (DIM - 1)
    theta = math.radians(22)
    b = [math.cos(theta), math.sin(theta)] + [0.0] * (DIM - 2)
    c = [math.cos(2 * theta), math.sin(2 * theta)] + [0.0] * (DIM - 2)
    assert _cos(a, b) > 0.92 and _cos(b, c) > 0.92 and _cos(a, c) < 0.92
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id bigint, embedding array<float>")
    out = {r.vec_id: r.keep
           for r in semdedup(df, threshold=0.92, assigner="kmeans",
                             n_clusters=1).collect()}
    assert out == {0: True, 1: False, 2: False}


def _brute_lsh_semdedup(rows, threshold, bits, seed):
    planes = lsh_planes(DIM, bits, seed)
    def bucket(v):
        sig = 0
        for i, p in enumerate(planes):
            if sum(x * y for x, y in zip(v, p)) >= 0:
                sig |= 1 << i
        return sig
    by_cluster = {}
    for vid, v in rows:
        by_cluster.setdefault(bucket(v), []).append((vid, v))
    keep = {}
    for members in by_cluster.values():
        members.sort()
        for i, (vid, v) in enumerate(members):
            keep[vid] = not any(
                round(_cos(v, u), 4) >= threshold
                for _, u in members[:i])
    return keep


def test_lsh_assigner_matches_bruteforce(planted):
    df, _ = planted
    got = {r.vec_id: r.keep
           for r in semdedup(df, threshold=0.9, assigner="lsh",
                             bits=4, seed=11).collect()}
    rows = [(r.vec_id, [float(x) for x in r.embedding])
            for r in df.collect()]
    assert got == _brute_lsh_semdedup(rows, 0.9, bits=4, seed=11)


def test_max_cluster_size_skips_mega_cluster(spark):
    """A cluster over the valve keeps ALL its rows (dedup skipped), while
    normal clusters still dedup."""
    base = [1.0] + [0.0] * (DIM - 1)
    mega = [(i, base) for i in range(10)]           # identical -> 1 cluster
    other = [(100, [0.0, 1.0] + [0.0] * (DIM - 2)),
             (101, [0.0, 1.0] + [0.0] * (DIM - 2))]
    df = spark.createDataFrame(mega + other,
                               "vec_id bigint, embedding array<float>")
    out = {r.vec_id: r.keep
           for r in semdedup(df, threshold=0.99, assigner="lsh", bits=4,
                             max_cluster_size=5).collect()}
    assert all(out[i] for i in range(10))           # mega cluster skipped
    assert out[100] and not out[101]                # normal dedup ran


def test_bad_assigner_raises(spark):
    df = spark.createDataFrame([(0, [1.0] * DIM)],
                               "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="assigner"):
        semdedup(df, assigner="dbscan")
