"""Streaming first-arrival dedup (pipeline/dedup.py dedup_stream):
watermark-bounded dropDuplicatesWithinWatermark over the exact key or the
normalized-text fingerprint.  Streaming state stays bounded by the delay;
the batch fallback gives the same within-horizon answer for parity."""

import json

from pyspark.sql import functions as F


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(x) for x in rows))


SCHEMA = "t timestamp, doc_id long, text string"


def _run_stream(spark, src, sink, ckpt, **kw):
    from incubator_druid_spark.pipeline.dedup import dedup_stream
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out = dedup_stream(stream, time_col="t", **kw)
    q = (out.writeStream.format("parquet")
         .option("path", str(sink)).option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()


def test_streaming_fingerprint_dedup(spark, tmp_path):
    """Duplicated normalized text across micro-batches lands once; a
    casing/punctuation variant counts as the same document."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", [
        {"t": "2024-01-01T10:00:00Z", "doc_id": 1, "text": "Hello, World."},
        {"t": "2024-01-01T10:00:30Z", "doc_id": 2, "text": "fresh content"},
    ])
    _write(src, "b2.json", [
        {"t": "2024-01-01T10:01:00Z", "doc_id": 3, "text": "hello world"},
        {"t": "2024-01-01T10:01:30Z", "doc_id": 4, "text": "another doc"},
    ])
    sink, ckpt = tmp_path / "out", tmp_path / "ck"
    _run_stream(spark, src, sink, ckpt, text_col="text", delay="1 hour")
    got = sorted(r["doc_id"] for r in
                 spark.read.schema(SCHEMA).parquet(str(sink)).collect())
    # doc 3 is the fingerprint-duplicate of doc 1
    assert got == [1, 2, 4]


def test_streaming_key_dedup_resumes_from_checkpoint(spark, tmp_path):
    """Dedup state survives a restart: a key seen before the stop is
    still dropped after resuming from the checkpoint."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", [
        {"t": "2024-01-01T10:00:00Z", "doc_id": 1, "text": "k-a"},
        {"t": "2024-01-01T10:00:10Z", "doc_id": 2, "text": "k-b"},
    ])
    sink, ckpt = tmp_path / "out", tmp_path / "ck"
    _run_stream(spark, src, sink, ckpt, key_cols=["text"], delay="1 hour")
    _write(src, "b2.json", [
        {"t": "2024-01-01T10:02:00Z", "doc_id": 3, "text": "k-a"},
        {"t": "2024-01-01T10:02:10Z", "doc_id": 4, "text": "k-c"},
    ])
    _run_stream(spark, src, sink, ckpt, key_cols=["text"], delay="1 hour")
    got = sorted(r["doc_id"] for r in
                 spark.read.schema(SCHEMA).parquet(str(sink)).collect())
    assert got == [1, 2, 4]


def test_batch_fallback_parity(spark):
    from incubator_druid_spark.pipeline.dedup import dedup_stream
    df = spark.createDataFrame(
        [("2024-01-01T10:00:00", 1, "same doc"),
         ("2024-01-01T10:01:00", 2, "Same DOC!"),
         ("2024-01-01T10:02:00", 3, "different")],
        "t string, doc_id long, text string")
    out = dedup_stream(df, text_col="text", time_col="t")
    assert out.count() == 2
    out2 = dedup_stream(df, key_cols=["text"], time_col="t")
    assert out2.count() == 3


def test_arg_validation(spark):
    import pytest

    from incubator_druid_spark.pipeline.dedup import dedup_stream
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        dedup_stream(df)
    with pytest.raises(ValueError):
        dedup_stream(df, key_cols=["doc_id"], text_col="text")
