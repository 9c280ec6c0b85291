"""StringColumnAggregationTest goldens — numeric aggregations over string
columns, single- and multi-valued (processing/src/test/java/org/apache/
druid/query/aggregation/StringColumnAggregationTest.java).

The reference ingests rows i=1..10 with singleValue="i.0" and
multiValue=["i.0", null, "i.0"], then runs the same query over the segment
twice (an incremental and a persisted copy), so every aggregate sees each
row two times (lines 115-128).  Numeric aggregators over a string column
parse each value (decimal strings truncate for the long family); over a
multi-value column they aggregate EVERY element, skipping nulls — the
expecteds pin both: multiSum = 2 * singleSum (two parseable copies per
row), multiMin = 1 (the null element does not become 0)."""

import pytest

from incubator_druid_spark import translate


@pytest.fixture(scope="module")
def stragg_catalog(spark, tmp_path_factory):
    from incubator_druid_spark.catalog import Catalog
    import datetime
    t0 = datetime.datetime(2011, 4, 1)
    rows = []
    for i in range(1, 11):
        val = f"{float(i)}"
        rows.append((t0, val, [val, None, val], 1))
    df = spark.createDataFrame(
        rows * 2,  # the reference queries the same segment twice
        "`__time` timestamp, singleValue string, "
        "multiValue array<string>, count long")
    path = str(tmp_path_factory.mktemp("stragg_ds") / "stragg.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("test", path)
    return cat


AGGS = []
for fam, out in (("Double", "double"), ("Float", "float"), ("Long", "long")):
    for op in ("Sum", "Max", "Min"):
        for src, field in (("single", "singleValue"), ("multi", "multiValue")):
            AGGS.append({"type": f"{out}{op}", "name": f"{src}{fam}{op}",
                         "fieldName": field})
AGGS.append({"type": "longSum", "name": "count", "fieldName": "count"})

N = 10
EXPECT = {
    "count": 2 * N,
    # sums double because the segment is queried twice
    "singleSum": float(N * (N + 1)),
    "multiSum": float(2 * N * (N + 1)),
    "singleMax": float(N), "multiMax": float(N),
    "singleMin": 1.0, "multiMin": 1.0,
}


def _check(row):
    assert row["count"] == EXPECT["count"]
    for fam in ("Double", "Float", "Long"):
        for op in ("Sum", "Max", "Min"):
            for src in ("single", "multi"):
                got = row[f"{src}{fam}{op}"]
                want = EXPECT[f"{src}{op}"]
                if fam == "Long":
                    assert got == int(want), (src, fam, op, got)
                else:
                    assert got == pytest.approx(want, abs=1e-4), \
                        (src, fam, op, got)


def test_group_by(spark, stragg_catalog):
    """testGroupBy (StringColumnAggregationTest.java:141-199)."""
    out = translate({
        "queryType": "groupBy", "dataSource": "test",
        "granularity": "all",
        "intervals": ["1970-01-01/2050-01-01"],
        "aggregations": AGGS,
    }, spark, stragg_catalog).collect()
    assert len(out) == 1
    _check(out[0])


def test_timeseries(spark, stragg_catalog):
    """testTimeseries (StringColumnAggregationTest.java:201-259)."""
    out = translate({
        "queryType": "timeseries", "dataSource": "test",
        "granularity": "all",
        "intervals": ["1970-01-01/2050-01-01"],
        "aggregations": AGGS,
    }, spark, stragg_catalog).collect()
    assert len(out) == 1
    _check(out[0])


def test_multi_value_mean(spark, stragg_catalog):
    """doubleMean over a multi-value column updates once per ELEMENT with
    null elements parsed as 0 (DoubleMeanAggregator.java:48-51: the List
    branch calls Numbers.tryParseDouble(o, 0) per element).  Per row:
    (i + 0 + i) over 3 elements -> total 2*sum(1..10)/(3*10) per segment."""
    out = translate({
        "queryType": "timeseries", "dataSource": "test",
        "granularity": "all",
        "intervals": ["1970-01-01/2050-01-01"],
        "aggregations": [
            {"type": "doubleMean", "name": "singleMean",
             "fieldName": "singleValue"},
            {"type": "doubleMean", "name": "multiMean",
             "fieldName": "multiValue"},
        ],
    }, spark, stragg_catalog).collect()
    assert len(out) == 1
    assert out[0]["singleMean"] == pytest.approx(5.5)
    assert out[0]["multiMean"] == pytest.approx(2 * 55.0 / 30.0)
