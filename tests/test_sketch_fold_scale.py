"""Binary-sketch merges at scale: a degenerate group holding many stored
sketches must never materialize them all in one task.  The prefold
(functions/sketch_fold.py) bounds per-partition state (theta: nominal-k
capped hash set; quantiles: item-capped weighted multiset) and the final
collect_list sees one partial per input partition — the same bound the
reference's fold-into-one-sketch aggregators give
(datasketches/theta/SketchAggregator.java,
quantiles/DoublesSketchMergeAggregator.java)."""

import random
import struct

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog
from incubator_druid_spark.functions import doubles_sketch as ds
from incubator_druid_spark.functions import sketch_fold as sf
from incubator_druid_spark.functions import theta_sketch as th


def _register(spark, tmp_path, rows, schema, parts=8, name="sk"):
    path = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(rows, schema).repartition(parts) \
         .write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register(name, path)
    return cat


def test_theta_degenerate_group_bounded(spark, tmp_path):
    """60k single-item sketches -> one group.  The unbounded design holds
    60k blobs in one list; the fold caps state at the nominal k and the
    estimate stays within theta-sketch error (~1/sqrt(16384) < 1%)."""
    rng = random.Random(7)
    n = 60_000
    hashes = rng.sample(range(1, th._MAX_LONG), n)
    rows = [("2024-01-01T00:00:00", "g",
             bytearray(th.serialize_compact_theta([h]))) for h in hashes]
    cat = _register(spark, tmp_path, rows,
                    "__time string, grp string, sk binary")
    q = {"queryType": "groupBy", "dataSource": "sk", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "thetaSketch", "name": "est",
                           "fieldName": "sk"}]}
    out = translate(q, spark, cat).first()
    assert out["est"] == pytest.approx(n, rel=0.05)


def test_theta_small_group_stays_exact(spark, tmp_path):
    """Below the nominal k the fold is a plain exact union (theta == 1.0) —
    bit-identical to the legacy path, which the oracle entries rely on."""
    rows = [("2024-01-01T00:00:00", grp,
             bytearray(th.serialize_compact_theta([h])))
            for grp, lo in (("a", 0), ("b", 500)) for h in range(lo, lo + 700)]
    cat = _register(spark, tmp_path, rows,
                    "__time string, grp string, sk binary", parts=4)
    q = {"queryType": "groupBy", "dataSource": "sk", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "thetaSketch", "name": "est",
                           "fieldName": "sk"}]}
    out = {r["grp"]: r["est"] for r in translate(q, spark, cat).collect()}
    assert out == {"a": 700.0, "b": 700.0}


def test_doubles_degenerate_group_bounded(spark, tmp_path):
    """200k stored single-value quantile sketches -> one group: compaction
    keeps <= DOUBLES_ITEM_CAP items per partial; the median of 1..200000
    stays within classic-quantiles error."""
    n = 200_000
    rows = [("2024-01-01T00:00:00", "g",
             bytearray(ds.serialize_doubles_compact([float(i)])))
            for i in range(1, n + 1)]
    cat = _register(spark, tmp_path, rows,
                    "__time string, grp string, qs binary")
    q = {"queryType": "groupBy", "dataSource": "sk", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "quantilesDoublesSketch", "name": "med",
                           "fieldName": "qs"}]}
    out = translate(q, spark, cat).first()
    assert out["med"] == pytest.approx(n / 2, rel=0.02)


def test_theta_state_caps_at_nominal_k():
    st = sf._ThetaState()
    blobs = [th.serialize_compact_theta([h])
             for h in range(1, 3 * sf.THETA_NOMINAL_K, 7)]
    for i in range(0, len(blobs), 500):
        st.update(blobs[i:i + 500])
    assert len(st.hashes) <= sf.THETA_NOMINAL_K
    est = th.parse_compact_theta(st.serialize()).estimate
    assert est == pytest.approx(len(blobs), rel=0.05)


def test_doubles_state_caps_and_preserves_n():
    st = sf._DoublesState()
    n = 3 * sf.DOUBLES_ITEM_CAP
    blobs = [ds.serialize_doubles_compact([float(i)]) for i in range(n)]
    for i in range(0, n, 4096):
        st.update(blobs[i:i + 4096])
    v = st.view
    assert len(v.items) <= sf.DOUBLES_ITEM_CAP
    assert sum(w for _, w in v.items) == v.n == n
    assert v.min_item == 0.0 and v.max_item == float(n - 1)
    assert ds.quantile(v, 0.5) == pytest.approx(n / 2, rel=0.02)


def test_doubles_partial_roundtrip():
    view = ds.DoublesSketchView(128, 11, -2.5, 9.0,
                                [(-2.5, 1), (0.0, 2), (3.25, 4), (9.0, 4)])
    back = sf.parse_doubles_partial(sf.serialize_doubles_partial(view))
    assert (back.k, back.n, back.min_item, back.max_item) == (128, 11, -2.5, 9.0)
    assert sorted(back.items) == sorted(view.items)
    empty = sf.parse_doubles_partial(
        sf.serialize_doubles_partial(ds.DoublesSketchView(64, 0, None, None, [])))
    assert empty.is_empty


def test_mixed_aggs_join_back_order(spark, tmp_path):
    """Sketch merges mixed with plain aggregators keep the query's output
    order and values (the join-back reorders to spec order)."""
    rows = [("2024-01-01T00:00:00", "a", i,
             bytearray(th.serialize_compact_theta([i]))) for i in range(10)] \
        + [("2024-01-01T00:00:00", "b", i,
            bytearray(th.serialize_compact_theta([100 + i]))) for i in range(5)]
    cat = _register(spark, tmp_path, rows,
                    "__time string, grp string, v long, sk binary", parts=3)
    q = {"queryType": "groupBy", "dataSource": "sk", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [
             {"type": "count", "name": "cnt"},
             {"type": "thetaSketch", "name": "uniq", "fieldName": "sk"},
             {"type": "longSum", "name": "sv", "fieldName": "v"}]}
    df = translate(q, spark, cat)
    assert df.columns == ["grp", "cnt", "uniq", "sv"]
    out = {r["grp"]: r for r in df.collect()}
    assert (out["a"]["cnt"], out["a"]["uniq"], out["a"]["sv"]) == (10, 10.0, 45)
    assert (out["b"]["cnt"], out["b"]["uniq"], out["b"]["sv"]) == (5, 5.0, 10)


def test_timeseries_all_gran_sketch_only(spark, tmp_path):
    rows = [("2024-01-01T00:00:00", "g",
             bytearray(th.serialize_compact_theta([i]))) for i in range(50)]
    cat = _register(spark, tmp_path, rows,
                    "__time string, grp string, sk binary", parts=4)
    q = {"queryType": "timeseries", "dataSource": "sk", "granularity": "all",
         "intervals": ["2023-01-01/2025-01-01"],
         "aggregations": [{"type": "thetaSketch", "name": "uniq",
                           "fieldName": "sk"}]}
    assert translate(q, spark, cat).first()["uniq"] == 50.0


def test_centroid_state_degenerate_group_bounded(spark, tmp_path):
    """150k stored centroid-state rows -> one group: the fold caps retained
    centroids (adjacent-pair halving) instead of flattening every bin into
    one in-memory list; the median stays within sketch error."""
    from pyspark.sql import functions as F
    n = 150_000
    # one exact centroid per row (value i, weight 1) — rollup-grain state
    src = (spark.range(1, n + 1)
           .select(F.lit("2024-01-01 00:00:00").cast("timestamp")
                    .alias("__time"),
                   F.lit("g").alias("grp"),
                   F.struct(
                       F.col("id").cast("double").alias("mn"),
                       F.col("id").cast("double").alias("mx"),
                       F.array(F.struct(
                           F.col("id").cast("double").alias("x"),
                           F.lit(1.0).alias("y"))).alias("bins"))
                   .alias("qs")))
    path = str(tmp_path / "cent.parquet")
    src.repartition(8).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("cent", path)
    q = {"queryType": "groupBy", "dataSource": "cent", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "quantilesDoublesSketch", "name": "med",
                           "fieldName": "qs"}]}
    out = translate(q, spark, cat).first()
    assert out["med"] == pytest.approx(n / 2, rel=0.02)


def test_centroid_state_cap_preserves_weight():
    st = sf._CentroidState()
    n = 3 * sf.CENTROID_BIN_CAP
    rows = [{"mn": float(i), "mx": float(i),
             "bins": [{"x": float(i), "y": 1.0}]} for i in range(n)]
    for i in range(0, n, 4096):
        st.update(rows[i:i + 4096])
    assert len(st.xs) <= sf.CENTROID_BIN_CAP
    assert sum(st.ws) == pytest.approx(n)
    assert (st.mn, st.mx) == (0.0, float(n - 1))
    back = sf.parse_centroid_partial(st.serialize())
    assert back["mn"] == 0.0 and len(back["bins"]) == len(st.xs)
