"""Schema-evolution hardening beyond the SchemaEvolutionTest matrix
(processing/src/test/java/org/apache/druid/query/SchemaEvolutionTest.java):

1. Epoch ORDER independence — the promotion lattice is commutative, so a
   datasource whose numeric segment sorts before the string one (and vice
   versa) must resolve the same promoted schema and the same query results.
   Druid has no epoch order at all (each segment is queried at its own local
   schema and results merge), so any order sensitivity here would be a bug.
2. groupBy on the promoted column — per-segment typed reads render through
   the string carrier (DimensionHandlerUtils.convertObjectToString: long 10
   -> '10', double 10.1 -> '10.1'), so the same logical row contributes its
   SEGMENT-LOCAL rendering, exactly like Druid's per-segment dimension
   selectors.
3. Numeric bound filter + groupBy combined on the promoted column.

Known, documented adaptation: a SELECTOR (string-equality) filter over a
mixed numeric/string evolution compares the carrier strings, so '9' does not
match a double segment's 9.0 (Druid's per-segment typed predicate would).
The reference's own evolution suite only exercises NUMERIC-ordering bounds,
which the carrier reproduces exactly (numeric ordering casts to double)."""

import datetime
import os
import shutil

import pytest

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

TIMES = ["2000-01-01", "2000-01-02", "2000-01-03",
         "2001-01-01", "2001-01-02", "2001-01-03"]
C1 = ["9", "10.1", "2", "1", "4", "5"]
IVL = ["1000/3000"]


@pytest.fixture(scope="module")
def evo_orders(spark, tmp_path_factory):
    """Two combo datasources of the SAME two segments (c1 string / c1 long)
    whose file names sort in opposite epoch orders."""
    base = tmp_path_factory.mktemp("schema_evo_r7")
    ts = [datetime.datetime.fromisoformat(t) for t in TIMES]
    df_str = spark.createDataFrame(
        [(t, c, 1) for t, c in zip(ts, C1)],
        "`__time` timestamp, c1 string, cnt long")
    df_long = spark.createDataFrame(
        [(t, int(float(c)), 1) for t, c in zip(ts, C1)],
        "`__time` timestamp, c1 long, cnt long")
    df_dbl = spark.createDataFrame(
        [(t, float(c), 1) for t, c in zip(ts, C1)],
        "`__time` timestamp, c1 double, cnt long")
    seg = {}
    for name, df in (("str", df_str), ("long", df_long), ("dbl", df_dbl)):
        p = base / f"seg_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(p))
        seg[name] = p

    cat = Catalog(spark)

    def combo(name, members):
        d = base / name
        d.mkdir()
        for prefix, m in members:
            for fn in os.listdir(seg[m]):
                if fn.endswith(".parquet"):
                    shutil.copy(seg[m] / fn, d / f"{prefix}-{fn}")
        cat.register(name, str(d), schemaEvolution="true")

    # 'a-' sorts before 'z-': string-first vs numeric-first epoch orders
    combo("evo_sf", [("a", "str"), ("z", "long")])
    combo("evo_nf", [("a", "long"), ("z", "str")])
    combo("evo_sld", [("a", "str"), ("m", "long"), ("z", "dbl")])
    combo("evo_dls", [("a", "dbl"), ("m", "long"), ("z", "str")])
    return cat


def _ts_query(spark, cat, ds, aggs, **extra):
    q = {"queryType": "timeseries", "dataSource": ds, "granularity": "all",
         "intervals": IVL, "aggregations": aggs}
    q.update(extra)
    rows = translate(q, spark, cat).collect()
    assert len(rows) == 1
    return rows[0]


AGGS = [
    {"type": "longSum", "name": "a", "fieldName": "c1"},
    {"type": "doubleSum", "name": "b", "fieldName": "c1"},
    {"type": "count", "name": "c"},
]


def test_epoch_order_same_promoted_schema(spark, evo_orders):
    """string<->long promotes to the string carrier in BOTH directions."""
    for ds in ("evo_sf", "evo_nf"):
        df = evo_orders.table(ds)
        assert dict(df.dtypes)["c1"] == "string", ds
        assert df.count() == 12


def test_epoch_order_same_aggregation(spark, evo_orders):
    ra = _ts_query(spark, evo_orders, "evo_sf", AGGS)
    rb = _ts_query(spark, evo_orders, "evo_nf", AGGS)
    # 31 (truncating string parse) + 31 (longs) in either epoch order
    assert (ra["a"], ra["c"]) == (rb["a"], rb["c"]) == (62, 12)
    assert ra["b"] == pytest.approx(rb["b"]) and ra["b"] == pytest.approx(62.1)


def test_epoch_order_three_way(spark, evo_orders):
    ra = _ts_query(spark, evo_orders, "evo_sld", AGGS)
    rb = _ts_query(spark, evo_orders, "evo_dls", AGGS)
    assert (ra["a"], ra["c"]) == (rb["a"], rb["c"]) == (93, 18)
    assert ra["b"] == pytest.approx(rb["b"]) and ra["b"] == pytest.approx(93.2)


def _gb(spark, cat, ds, **extra):
    q = {"queryType": "groupBy", "dataSource": ds, "granularity": "all",
         "intervals": IVL, "dimensions": ["c1"],
         "aggregations": [{"type": "count", "name": "n"}]}
    q.update(extra)
    return {r["c1"]: r["n"] for r in translate(q, spark, cat).collect()}


def test_group_by_promoted_column(spark, evo_orders):
    """groupBy over the evolved column groups each segment's SEGMENT-LOCAL
    rendering: the string epoch contributes '10.1', the long epoch '10'
    (DimensionHandlerUtils.convertObjectToString per segment)."""
    got = _gb(spark, evo_orders, "evo_sf")
    assert got == {"9": 2, "10.1": 1, "10": 1, "2": 2, "1": 2, "4": 2,
                   "5": 2}
    # epoch order must not change the groups
    assert _gb(spark, evo_orders, "evo_nf") == got


def test_group_by_promoted_column_with_numeric_filter(spark, evo_orders):
    """Numeric-ordering bound on the promoted column casts the carrier to
    double per row, reproducing the reference's per-segment typed bounds
    (testNumericEvolutionFiltering's 9<=c1<=11 matches '9', '10.1', 10)."""
    filt = {"type": "bound", "dimension": "c1", "lower": "9", "upper": "11",
            "ordering": "numeric"}
    got = _gb(spark, evo_orders, "evo_sf", filter=filt)
    assert got == {"9": 2, "10.1": 1, "10": 1}


def test_filter_on_promoted_column_epoch_order_invariant(spark, evo_orders):
    filt = {"type": "bound", "dimension": "c1", "lower": "9", "upper": "11",
            "ordering": "numeric"}
    a = _ts_query(spark, evo_orders, "evo_sld", AGGS, filter=filt)
    b = _ts_query(spark, evo_orders, "evo_dls", AGGS, filter=filt)
    # per segment the bound matches two rows (9 and 10.x): longs 9+10=19
    # per epoch, doubles 19.1 for the string/double epochs and 19.0 for
    # the long epoch — SchemaEvolutionTest's 57.2 across its four indexes
    assert (a["a"], a["c"]) == (b["a"], b["c"]) == (57, 6)
    assert a["b"] == pytest.approx(b["b"]) and a["b"] == pytest.approx(57.2)
