"""SegmentMetadataQueryTest merge-family tranche (round 6) — analyses over
a genuinely multi-segment datasource (the engine's own day-partitioned
segment sink), matching the reference's broker-side SegmentAnalysis merge
(processing/src/test/java/org/apache/druid/query/metadata/
SegmentMetadataQueryTest.java):

  * testSegmentMetadataQueryWithDefaultAnalysisMerge /
    testSegmentMetadataQueryWithDefaultAnalysisMerge2 /
    testSegmentMetadataQueryWithDefaultAnalysisMerge3 /
    testSegmentMetadataQueryWithHasMultipleValuesMerge — numRows sums
    across segments, min/max and cardinality merge, hasMultipleValues ORs.
  * testDefaultIntervalAndFiltering — segmentMetadata's DEFAULT interval
    is eternity (unlike other query types), and an explicit interval
    restricts the analysis to covered segments only.

Not ported, with reasons: testSerde/testSerdeWithDefaultInterval and
testCacheKeyWithListColumnIncluderator are Jackson/cache-key wire tests
(testAnanlysisTypesBeingSet — the reference's own typo — is a serde shape
check too); testSegmentMetadataQueryWithTimestampSpecMerge,
testSegmentMetadataQueryWithQueryGranularityMerge,
testSegmentMetadataQueryWithAggregatorsMerge,
testSegmentMetadataQueryWithRollupMerge and
testSegmentMetadataQueryWithComplexColumnMerge assert the lenient
null-merge of ingest-spec SIDECARS across
mismatched segments — this engine's rollup sidecar is per-table (one
ingest spec), so there is no mismatched-sidecar state to merge."""

import datetime
import json

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog
from incubator_druid_spark.sources.ingest import ingest


def _two_segment_table(spark, tmp_path):
    """Two day-segments with different value ranges and an MVD that is
    multi-valued only in segment 2."""
    src = str(tmp_path / "rows.json")
    rows = [
        ("2024-01-01T01:00:00Z", "alpha", ["x"], 10),
        ("2024-01-01T02:00:00Z", "beta", ["x"], 20),
        ("2024-01-02T01:00:00Z", "gamma", ["y", "z"], 5),
        ("2024-01-02T02:00:00Z", "alpha", ["y"], 40),
        ("2024-01-02T03:00:00Z", "delta", ["z"], 15),
    ]
    with open(src, "w") as f:
        for t, d, mv, v in rows:
            f.write(json.dumps({"t": t, "d": d, "mv": mv, "v": v}) + "\n")
    spec = {
        "dataSchema": {
            "dataSource": "twoseg",
            "timestampSpec": {"column": "t", "format": "iso"},
            "dimensionsSpec": {"dimensions": [
                "d", "mv", {"type": "long", "name": "v"}]},
            "granularitySpec": {"segmentGranularity": "day"},
        },
        "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                     "inputFormat": {"type": "json"}},
    }
    cat = Catalog(spark)
    ingest(spark, spec, cat, str(tmp_path / "seg"))
    return cat


def test_segment_metadata_default_analysis_merge(spark, tmp_path):
    """testSegmentMetadataQueryWithDefaultAnalysisMerge(+2,3) — merged
    table-level analysis across two day segments."""
    cat = _two_segment_table(spark, tmp_path)
    out = translate(
        {"queryType": "segmentMetadata", "dataSource": "twoseg",
         "analysisTypes": ["cardinality", "minmax"]},
        spark, cat).collect()
    cols = {r["column"]: r for r in out}
    assert cols["d"]["numRows"] == 5            # summed across segments
    assert cols["d"]["cardinality"] == 4        # merged distinct count
    assert cols["d"]["minValue"] == "alpha"     # min across both segments
    assert cols["d"]["maxValue"] == "gamma"
    assert cols["v"]["type"] == "LONG"
    assert cols["mv"]["hasMultipleValues"] is True   # ORed across segments


def test_segment_metadata_default_interval_and_filtering(spark, tmp_path):
    """testDefaultIntervalAndFiltering — no intervals means ETERNITY (all
    segments analyzed); an explicit interval restricts to covered
    segments."""
    cat = _two_segment_table(spark, tmp_path)
    full = translate(
        {"queryType": "segmentMetadata", "dataSource": "twoseg",
         "analysisTypes": ["cardinality", "minmax"]},
        spark, cat).collect()
    assert {r["column"]: r for r in full}["d"]["numRows"] == 5
    day2 = translate(
        {"queryType": "segmentMetadata", "dataSource": "twoseg",
         "intervals": ["2024-01-02T00:00:00Z/2024-01-03T00:00:00Z"],
         "analysisTypes": ["cardinality", "minmax"]},
        spark, cat).collect()
    cols = {r["column"]: r for r in day2}
    assert cols["d"]["numRows"] == 3
    assert cols["d"]["cardinality"] == 3
    assert cols["d"]["minValue"] == "alpha"
    assert cols["d"]["maxValue"] == "gamma"


def test_segment_metadata_no_analysis_types_merge(spark, tmp_path):
    """testSegmentMetadataQueryWithNoAnalysisTypesMerge — empty
    analysisTypes yields types-only columns while numRows still sums
    across segments and the size/cardinality analyses stay unset."""
    cat = _two_segment_table(spark, tmp_path)
    out = translate(
        {"queryType": "segmentMetadata", "dataSource": "twoseg",
         "analysisTypes": []},
        spark, cat).collect()
    cols = {r["column"]: r for r in out}
    assert cols["d"]["type"] == "STRING"
    assert cols["d"]["numRows"] == 5
    assert cols["d"]["cardinality"] is None
    assert cols["d"]["minValue"] is None
    assert cols["d"]["maxValue"] is None
