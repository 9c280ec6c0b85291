"""MultiValuedDimensionTest.java golden port (round 6) — native groupBy /
topN over multi-value `tags`/`othertags` columns: raw-MVD grouping,
filters, filtered dimension specs, per-element and cartesian expression
virtual columns, folds (processing/src/test/java/org/apache/druid/query/
MultiValuedDimensionTest.java; rows at :161-166 duplicated across two
segments, :193-202 the null-sampler rows).

Not ported, with reasons: testGroupByExpressionMultiConflicting /
...ConflictingAlso assert the reference parser's "[tags] used as both
scalar and array variables" validation message — this compiler dispatches
by tagged array shape instead of a two-pass variable-binding analysis, so
the same expressions fail as Catalyst type errors rather than that exact
text; testGroupByExpressionFoldArrayToStringWithConcats' expression
literal is unbalanced as written in the Java source (the balanced
equivalent is covered by test_group_by_expression_fold_array_to_string's
second query here); the Auto/AutoAuto variants re-run the same queries
with ARRAY-typed virtual column declarations (this engine's virtual
columns are honestly typed already — same results as the base ports)."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def mvd_catalog(spark, tmp_path_factory):
    """The 4 TSV rows, duplicated (two segments sid1+sid2)."""
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("product", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("othertags", T.ArrayType(T.StringType())),
    ])
    d = datetime.datetime
    base = [
        (d(2011, 1, 12), "product_1", ["t1", "t2", "t3"], ["u1", "u2"]),
        (d(2011, 1, 13), "product_2", ["t3", "t4", "t5"], ["u3", "u4"]),
        (d(2011, 1, 14), "product_3", ["t5", "t6", "t7"], ["u1", "u5"]),
        (d(2011, 1, 14), "product_4", [""], ["u2"]),
    ]
    path = str(tmp_path_factory.mktemp("mvd_ds") / "xx.parquet")
    spark.createDataFrame(base + base, schema) \
        .write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("xx", path)
    # the null-sampler table (single copy ×2 segments)
    nulls = [
        (d(2011, 1, 13), "product_1", [], ["u1", "u2"]),
        (d(2011, 1, 12), "product_2", None, ["u3", "u4"]),
        (d(2011, 1, 14), "product_3", [""], ["u1", "u5"]),
        (d(2011, 1, 15), "product_4", ["t1", "t2", ""], ["u6", "u7"]),
        (d(2011, 1, 16), "product_5", [], []),
        (d(2011, 1, 16), "product_6", None, None),
        (d(2011, 1, 16), "product_7", None, []),
        (d(2011, 1, 16), "product_8", [""], []),
    ]
    path2 = str(tmp_path_factory.mktemp("mvd_ds") / "xxnull.parquet")
    spark.createDataFrame(nulls + nulls, schema) \
        .write.mode("overwrite").parquet(path2)
    cat.register("xxnull", path2)
    return cat


def gb(spark, cat, ds="xx", **extra):
    q = {"queryType": "groupBy", "dataSource": ds, "granularity": "all",
         "intervals": FULL, "dimensions": ["tags"],
         "aggregations": [{"type": "count", "name": "count"}]}
    q.update(extra)
    d0 = q["dimensions"][0]
    key = d0 if isinstance(d0, str) else (
        d0.get("outputName") or d0.get("delegate", {}).get("outputName"))
    return {r[key]: r["count"]
            for r in translate(q, spark, cat).collect()}


def test_group_by_no_filter(spark, mvd_catalog):
    """testGroupByNoFilter — raw MVD grouping explodes elements; the [""]
    rows group under '' (sql mode)."""
    got = gb(spark, mvd_catalog)
    assert got == {"": 2, "t1": 2, "t2": 2, "t3": 4, "t4": 2, "t5": 4,
                   "t6": 2, "t7": 2}


def test_group_by_with_dim_filter(spark, mvd_catalog):
    """testGroupByWithDimFilter — tags=t3 keeps rows 1-2; their OTHER
    elements still group."""
    got = gb(spark, mvd_catalog,
             filter={"type": "selector", "dimension": "tags", "value": "t3"})
    assert got == {"t1": 2, "t2": 2, "t3": 4, "t4": 2, "t5": 2}


def test_group_by_with_dim_filter_empty_results(spark, mvd_catalog):
    """testGroupByWithDimFilterEmptyResults — product_5's [] tags group as
    the null group."""
    got = gb(spark, mvd_catalog, ds="xxnull",
             filter={"type": "in", "dimension": "product",
                     "values": ["product_5"]})
    assert got == {None: 2}


def test_group_by_with_dim_filter_nullish_results(spark, mvd_catalog):
    """testGroupByWithDimFilterNullishResults — sql mode: [] and missing
    group null, [""] groups ''."""
    got = gb(spark, mvd_catalog, ds="xxnull",
             filter={"type": "in", "dimension": "product",
                     "values": ["product_5", "product_6", "product_8"]})
    assert got == {None: 4, "": 2}


def test_group_by_dim_filter_and_filtered_dim_spec(spark, mvd_catalog):
    """testGroupByWithDimFilterAndWithFilteredDimSpec — regexFiltered
    keeps only the t3 element."""
    got = gb(spark, mvd_catalog,
             dimensions=[{"type": "regexFiltered",
                          "delegate": {"type": "default",
                                       "dimension": "tags",
                                       "outputName": "tags"},
                          "pattern": "t3"}],
             filter={"type": "selector", "dimension": "tags", "value": "t3"})
    assert got == {"t3": 4}


def test_group_by_expression_map(spark, mvd_catalog):
    """testGroupByExpression — explicit map((x) -> concat(x,'foo')) over
    the MVD, grouped per mapped element."""
    got = gb(spark, mvd_catalog,
             dimensions=[{"type": "default", "dimension": "texpr",
                          "outputName": "texpr"}],
             virtualColumns=[{"type": "expression", "name": "texpr",
                              "expression":
                                  "map((x) -> concat(x, 'foo'), tags)",
                              "outputType": "STRING"}])
    assert got == {"foo": 2, "t1foo": 2, "t2foo": 2, "t3foo": 4,
                   "t4foo": 2, "t5foo": 4, "t6foo": 2, "t7foo": 2}


def test_group_by_expression_multi_multi(spark, mvd_catalog):
    """testGroupByExpressionMultiMulti — cartesian_map over two MVDs,
    default-(time,dims)-ordered limit 5."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "xx", "granularity": "all",
         "intervals": FULL,
         "dimensions": [{"type": "default", "dimension": "texpr",
                         "outputName": "texpr"}],
         "virtualColumns": [{"type": "expression", "name": "texpr",
                             "expression": "cartesian_map((x,y) -> "
                                           "concat(x, y), tags, othertags)",
                             "outputType": "STRING"}],
         "limitSpec": {"type": "default", "limit": 5, "columns": []},
         "aggregations": [{"type": "count", "name": "count"}]},
        spark, mvd_catalog).collect()
    assert [(r["texpr"], r["count"]) for r in out] == \
        [("t1u1", 2), ("t1u2", 2), ("t2u1", 2), ("t2u2", 2), ("t3u1", 2)]


def test_group_by_expression_fold_array_to_string(spark, mvd_catalog):
    """testGroupByExpressionFoldArrayToString (+ the balanced form of
    ...WithConcats) — fold concatenates the whole MVD into one group
    key."""
    got = gb(spark, mvd_catalog,
             dimensions=[{"type": "default", "dimension": "tt",
                          "outputName": "tt"}],
             virtualColumns=[{"type": "expression", "name": "tt",
                              "expression": "fold((tag, acc) -> "
                                            "concat(acc, tag), tags, '')",
                              "outputType": "STRING"}])
    assert got == {"": 2, "t1t2t3": 2, "t3t4t5": 2, "t5t6t7": 2}
    got2 = gb(spark, mvd_catalog,
              dimensions=[{"type": "default", "dimension": "tt",
                           "outputName": "tt"}],
              virtualColumns=[{"type": "expression", "name": "tt",
                               "expression":
                                   "fold((tag, acc) -> concat(acc, "
                                   "case_searched(acc == '', '', ', '), "
                                   "concat('foo', tag)), tags, '')",
                               "outputType": "STRING"}])
    assert got2 == {"foo": 2, "foot1, foot2, foot3": 2,
                    "foot3, foot4, foot5": 2, "foot5, foot6, foot7": 2}


def _topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "xx", "granularity": "all",
         "intervals": FULL, "dimension": "tags", "metric": "count",
         "threshold": 15,
         "aggregations": [{"type": "count", "name": "count"}]}
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_topn_with_dim_filter_and_filtered_dim_spec(spark, mvd_catalog):
    """testTopNWithDimFilterAndWithFilteredDimSpec — single-segment counts
    (the reference runs one segment here): listFiltered t3 + filter."""
    out = _topn(spark, mvd_catalog, threshold=5,
                dimension={"type": "listFiltered",
                           "delegate": {"type": "default",
                                        "dimension": "tags",
                                        "outputName": "tags"},
                           "values": ["t3"]},
                filter={"type": "selector", "dimension": "tags",
                        "value": "t3"})
    # our fixture holds both segments in one table: counts double
    assert [(r["tags"], r["count"]) for r in out] == [("t3", 4)]


def test_topn_expression_and_auto_transform(spark, mvd_catalog):
    """testTopNExpression / testTopNExpressionAutoTransform — identical
    results via the explicit map and the auto per-element transform (both
    segments here, so counts are doubled; tie order is lexicographic by
    dimension)."""
    for expr in ("map((x) -> concat(x, 'foo'), tags)",
                 "concat(tags, 'foo')"):
        out = _topn(spark, mvd_catalog,
                    dimension={"type": "default", "dimension": "texpr",
                               "outputName": "texpr"},
                    virtualColumns=[{"type": "expression", "name": "texpr",
                                     "expression": expr,
                                     "outputType": "STRING"}])
        assert [(r["texpr"], r["count"]) for r in out] == \
            [("t3foo", 4), ("t5foo", 4), ("foo", 2), ("t1foo", 2),
             ("t2foo", 2), ("t4foo", 2), ("t6foo", 2), ("t7foo", 2)], expr


def test_cartesian_fold_expression(spark, mvd_catalog):
    """ApplyFunction.java CartesianFoldFunction — fold over the cross
    product: count of (tag, othertag) pairs per row via
    cartesian_fold((x,y,acc) -> acc + 1, ...)."""
    out = translate(
        {"queryType": "scan", "dataSource": "xx", "intervals": FULL,
         "virtualColumns": [{"type": "expression", "name": "npairs",
                             "expression": "cartesian_fold((x, y, acc) -> "
                                           "acc + 1, tags, othertags, 0)",
                             "outputType": "LONG"}],
         "columns": ["product", "npairs"]},
        spark, mvd_catalog).collect()
    got = {(r["product"], r["npairs"]) for r in out}
    assert got == {("product_1", 6), ("product_2", 6), ("product_3", 6),
                   ("product_4", 1)}
