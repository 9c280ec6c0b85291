"""Z-order clustering (sources/layout.py) — cell normalization, Morton
interleave, partition locality, and the segment sink's 'zorder'
partitionsSpec producing tight per-file stats on BOTH dimensions."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.sources.layout import (
    cluster_by_zorder,
    zorder_cell,
    zorder_code,
)


def _cells(spark, rows, lo, hi, bits):
    df = spark.createDataFrame([(r,) for r in rows], "x double")
    return [r.c for r in df.select(
        zorder_cell(F.col("x"), lo, hi, bits).alias("c")).collect()]


class TestZorderCell:
    def test_scaling_and_clamp(self, spark):
        out = _cells(spark, [0.0, 5.0, 10.0, -3.0, 99.0, None], 0.0,
                     10.0, 8)
        assert out == [0, 127, 255, 0, 255, 0]

    def test_degenerate_bounds(self, spark):
        assert _cells(spark, [4.0], 7.0, 7.0, 8) == [0]


class TestZorderCode:
    def test_interleave_known_value(self, spark):
        # x=0b11 -> bits 0,2 ; y=0b01 -> bit 1 ; code 0b0111 = 7
        df = spark.createDataFrame([(3, 1)], "x long, y long")
        code = df.select(zorder_code(
            [F.col("x"), F.col("y")], 2).alias("z")).first().z
        assert code == 7

    def test_single_column_is_identity(self, spark):
        df = spark.createDataFrame([(37,)], "x long")
        assert df.select(zorder_code(
            [F.col("x")], 8).alias("z")).first().z == 37

    def test_too_many_bits_raises(self, spark):
        with pytest.raises(ValueError, match="exceeds a long"):
            zorder_code([F.col("x"), F.col("y")], 32)

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            zorder_code([], 8)


class TestClusterByZorder:
    def test_string_column_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], "x int, s string")
        with pytest.raises(ValueError, match="string"):
            cluster_by_zorder(df, ["s"])

    def test_partitions_cover_tight_boxes(self, spark):
        # 64x64 uniform grid -> 16 range partitions on the z-code; each
        # partition's (x, y) bounding box should cover a small fraction
        # of the full square (ideal 1/16; assert well under 1/4 mean).
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"))
        out = cluster_by_zorder(grid, ["x", "y"], bits=6,
                                num_partitions=16)
        boxes = (out.withColumn("pid", F.spark_partition_id())
                    .groupBy("pid")
                    .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
                    .collect())
        assert len(boxes) >= 12
        areas = [(r["max(x)"] - r["min(x)"] + 1)
                 * (r["max(y)"] - r["min(y)"] + 1) for r in boxes]
        assert sum(areas) / len(areas) < 0.25 * 64 * 64

    def test_explicit_bounds_skip_agg(self, spark):
        df = spark.range(100).select(
            F.col("id").cast("double").alias("x"),
            (99 - F.col("id")).cast("double").alias("y"))
        out = cluster_by_zorder(df, ["x", "y"], bits=4, num_partitions=4,
                                bounds={"x": (0.0, 99.0),
                                        "y": (0.0, 99.0)})
        assert out.count() == 100
        assert "__zcode" not in out.columns


def test_ingest_zorder_partitions_spec(spark, tmp_path):
    """'zorder' partitionsSpec: parquet file min/max stats are tight on
    BOTH clustered dimensions — a selective filter on either one prunes
    most files, unlike single_dim which only tightens its own column."""
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    src = str(tmp_path / "src.json")
    n = 4096
    with open(src, "w") as fh:
        for i in range(n):
            # deterministic 64x64 scatter on (u, v)
            fh.write('{"t": "2024-01-01T00:00:00Z", "u": %d, "v": %d}\n'
                     % (i % 64, (i * 37) % 64))
    cat = Catalog(spark)
    spec = {"dataSchema": {
                "dataSource": "zordered",
                "timestampSpec": {"column": "t"},
                "dimensionsSpec": {"dimensions": ["u", "v"]},
                "granularitySpec": {"segmentGranularity": "day"}},
            "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                         "inputFormat": {"type": "json"}},
            "tuningConfig": {"partitionsSpec": {
                "type": "zorder", "partitionDimensions": ["u", "v"],
                "numShards": 16, "bits": 6}}}
    path = ingest(spark, spec, cat, str(tmp_path))

    areas = []
    for f in glob.glob(f"{path}/__bucket=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i
                for i in range(md.num_columns)}
        lo_u = min(md.row_group(g).column(cols["u"]).statistics.min
                   for g in range(md.num_row_groups))
        hi_u = max(md.row_group(g).column(cols["u"]).statistics.max
                   for g in range(md.num_row_groups))
        lo_v = min(md.row_group(g).column(cols["v"]).statistics.min
                   for g in range(md.num_row_groups))
        hi_v = max(md.row_group(g).column(cols["v"]).statistics.max
                   for g in range(md.num_row_groups))
        areas.append((hi_u - lo_u + 1) * (hi_v - lo_v + 1))
    assert len(areas) >= 12
    # mean per-file bounding box well under a quarter of the key square
    assert sum(areas) / len(areas) < 0.25 * 64 * 64
