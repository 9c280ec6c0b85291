"""Tests for pipeline/similarity.py semdedup — SemDeDup-style
embedding-cluster dedup composed from ivf_assign + within-cluster exact
cosine pairs + connected_components + dedup_by_groups."""

import numpy as np
import pytest

from incubator_druid_spark.pipeline.similarity import semdedup


def _unit(v):
    a = np.array(v, dtype=np.float64)
    return (a / np.linalg.norm(a)).tolist()


@pytest.fixture(scope="module")
def toy(spark):
    # two well-separated clusters; within cluster A, vectors 0/1/2 are
    # near-identical (a dup chain), 3 is distinct; cluster B: 10/11 are
    # dups, 12 distinct
    rows = [
        (0, _unit([1.0, 0.0, 0.0]), 0.9),
        (1, _unit([1.0, 0.01, 0.0]), 0.5),
        (2, _unit([1.0, 0.02, 0.0]), 0.7),
        (3, _unit([0.7, 0.7, 0.0]), 0.1),
        (10, _unit([0.0, 0.0, 1.0]), 0.2),
        (11, _unit([0.0, 0.01, 1.0]), 0.8),
        (12, _unit([0.0, 0.6, 0.8]), 0.3),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "quality"])


CENTS = np.array([_unit([1.0, 0.1, 0.0]), _unit([0.0, 0.1, 1.0])])


def test_semdedup_keeps_min_id_per_component(toy):
    kept = sorted(r["vec_id"]
                  for r in semdedup(toy, CENTS, threshold=0.999).collect())
    # {0,1,2} collapse to 0; {10,11} collapse to 10; 3 and 12 survive
    assert kept == [0, 3, 10, 12]


def test_semdedup_keep_by_keeps_best_quality(toy):
    kept = sorted(r["vec_id"]
                  for r in semdedup(toy, CENTS, threshold=0.999,
                                    keep_by="quality").collect())
    # component {0,1,2}: best quality 0.9 -> 0; {10,11}: 0.8 -> 11
    assert kept == [0, 3, 11, 12]


def test_semdedup_no_cross_cluster_pairs(toy):
    # with a sky-high threshold nothing pairs: everything survives
    kept = semdedup(toy, CENTS, threshold=1.1).count()
    assert kept == toy.count()


def test_semdedup_refuses_oversized_cluster(toy):
    with pytest.raises(ValueError, match="max_cluster"):
        semdedup(toy, CENTS, threshold=0.999, max_cluster=2)


def test_semdedup_pair_space_is_cluster_bounded(toy):
    """The within-cluster join must key on the cluster id — assert the
    optimized plan contains an equi-join (hash/sortmerge), not a
    cartesian product."""
    out = semdedup(toy, CENTS, threshold=0.999)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _join_path_pairs(spark, assigned_rows, dim, threshold):
    """The historical within-cluster self-join, kept as the reference:
    bit-for-bit what _cluster_pairs_arrow must reproduce."""
    from pyspark.sql import functions as F

    from incubator_druid_spark.pipeline.similarity import (_paired_cosine,
                                                           norm_fixed)
    assigned = spark.createDataFrame(
        assigned_rows, "vec_id long, embedding array<double>, __ivf int")
    a = assigned.select("__ivf", F.col("vec_id").alias("id_a"),
                        F.col("embedding").alias("va"),
                        norm_fixed("embedding", dim).alias("__na"))
    b = assigned.select("__ivf", F.col("vec_id").alias("id_b"),
                        F.col("embedding").alias("vb"),
                        norm_fixed("embedding", dim).alias("__nb"))
    sim = _paired_cosine(dim, "va", "vb")
    return (a.join(b, ["__ivf"]).filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", sim.alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def test_cluster_pairs_arrow_matches_join_path(spark):
    """The Arrow within-cluster kernel must emit EXACTLY the pair set the
    join path emits — same left-fold float arithmetic, same strict
    id_a < id_b, same null/NaN handling."""
    from incubator_druid_spark.pipeline.similarity import \
        _cluster_pairs_arrow

    rng = np.random.default_rng(7)
    dim = 16
    rows = []
    for i in range(400):
        v = rng.normal(size=dim)
        if i % 97 == 0:
            v = None            # null vector: must never pair
        else:
            v = v.tolist()
        rows.append((i, v, int(i % 3)))
    # duplicated near-identical vectors to guarantee pairs exist
    base = rng.normal(size=dim)
    for i in range(400, 420):
        rows.append((i, (base + rng.normal(size=dim) * 1e-3).tolist(),
                     int(i % 3)))
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, __ivf int")
    got = sorted((r["id_a"], r["id_b"]) for r in _cluster_pairs_arrow(
        assigned, "vec_id", "embedding", dim, 0.8).collect())
    want = sorted((r["id_a"], r["id_b"]) for r in _join_path_pairs(
        spark, rows, dim, 0.8).collect())
    assert got == want and len(got) > 0


def test_cluster_pairs_arrow_null_element(spark):
    """A null ELEMENT inside a uniform-dim vector null-propagates in the
    chain (pair dropped); the kernel must agree."""
    from incubator_druid_spark.pipeline.similarity import \
        _cluster_pairs_arrow
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, None], 0), (3, [1.0, 1e-9], 0),
            (4, [1.0, 0.0], 0)]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, __ivf int")
    got = sorted((r["id_a"], r["id_b"]) for r in _cluster_pairs_arrow(
        assigned, "vec_id", "embedding", 2, 0.999).collect())
    want = sorted((r["id_a"], r["id_b"]) for r in _join_path_pairs(
        spark, rows, 2, 0.999).collect())
    assert got == want
    assert all(2 not in p for p in got)
