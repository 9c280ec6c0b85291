"""Round-9 optimization: unrolled fixed-dim vector math must be
bit-identical to the HOF reference on uniform frames, and the operators
must transparently fall back to the exact HOF path on ragged frames —
in both ANSI modes (an unguarded unrolled chain would THROW on ragged
arrays under ANSI; the _all_dim gate must make that unreachable)."""

import pytest

from pyspark.sql import functions as F

from incubator_druid_spark.pipeline import similarity as S


@pytest.fixture(scope="module")
def spark():
    import os
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from incubator_druid_spark import get_spark
    sp = get_spark(app_name="test-similarity-unrolled")
    sp.sparkContext.setLogLevel("ERROR")
    return sp


UNIFORM = [(1, [1.0, 0.0, 2.0]), (2, [0.5, -1.0, 0.25]),
           (3, None), (4, [3.0, 4.0, 0.0])]
RAGGED = UNIFORM + [(5, [1.0, 2.0]), (6, []), (7, [1.0, 2.0, 3.0, 4.0])]
Q = [0.25, -0.75, 1.5]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_unrolled_bit_identical_on_uniform(spark):
    df = _mk(spark, UNIFORM)
    df = df.withColumn("q", S._lit_vec(Q))
    got = df.select(
        S.cosine(F.col("embedding"), S._lit_vec(Q)).alias("h"),
        S.cosine_lit("embedding", Q).alias("u"),
        S.cosine_fixed("embedding", "q", 3).alias("fx"),
        S.dot(F.col("embedding"), S._lit_vec(Q)).alias("dh"),
        S.dot_lit("embedding", Q).alias("du")).collect()
    for r in got:
        assert r["h"] == r["u"] == r["fx"]
        assert r["dh"] == r["du"]


@pytest.mark.parametrize("ansi", ["false", "true"])
def test_operators_fall_back_on_ragged(spark, ansi):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", ansi)
    try:
        uni, rag = _mk(spark, UNIFORM), _mk(spark, RAGGED)
        assert S._all_dim(uni, "embedding", 3)
        assert not S._all_dim(rag, "embedding", 3)
        # cosine_topk on a ragged frame must not throw (ANSI!) and must
        # equal the HOF reference ordering/values
        got = S.cosine_topk(rag, Q, k=3).collect()
        ref = (rag.select("vec_id",
                          S.cosine(F.col("embedding"),
                                   S._lit_vec(Q)).alias("cosine"))
               .orderBy(F.col("cosine").desc(), "vec_id").limit(3).collect())
        assert [(r["vec_id"], r["cosine"]) for r in got] == \
            [(r["vec_id"], r["cosine"]) for r in ref]
        # pairwise: near-dup on ragged frames keeps HOF semantics
        pairs = S.cosine_near_dup_exact(rag, threshold=-2.0,
                                        id_col="vec_id").collect()
        refp = {(r["id_a"], r["id_b"]): r["cosine"] for r in
                rag.select(F.col("vec_id").alias("id_a"),
                           F.col("embedding").alias("va"))
                .join(rag.select(F.col("vec_id").alias("id_b"),
                                 F.col("embedding").alias("vb")),
                      F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        S.cosine(F.col("va"), F.col("vb")).alias("cosine"))
                .filter(F.col("cosine") >= -2.0).collect()}
        assert {(r["id_a"], r["id_b"]): r["cosine"]
                for r in pairs} == refp
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_ann_lsh_uniform_vs_ragged_consistent(spark):
    uni = _mk(spark, UNIFORM)
    out = S.ann_lsh_topk(uni, Q, k=2, num_planes=8, bands=2)
    assert out.count() <= 2  # candidates pruned by banding; no throw
