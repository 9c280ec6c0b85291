"""Training-data pipeline operator tests: dedup, similarity, text analysis,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, rows


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Synthetic corpus with known near-duplicates."""
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the tall green tree near the river bank today")
    rows_ = [
        (1, base),
        (2, base.replace("today", "tonight")),          # near-dup of 1
        (3, base),                                       # exact dup of 1
        (4, "completely different text about spark sql engines and "
            "columnar storage formats with vectorized execution plans"),
        (5, "another unrelated document mentioning minhash signatures "
            "locality sensitive hashing and jaccard similarity measures"),
    ]
    return spark.createDataFrame(rows_, "doc_id long, text string")


def test_exact_dedup(near_dup_docs):
    from incubator_druid_spark.pipeline.dedup import exact_dedup
    out = exact_dedup(near_dup_docs, ["text"], "doc_id")
    assert out.count() == 4
    kept = dict(rows(out, "doc_id", "dup_count"))
    assert kept[1] == 2  # doc 3 collapsed into doc 1


def test_fingerprint_dedup_normalizes(spark):
    from incubator_druid_spark.pipeline.dedup import fingerprint_dedup
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "other")],
        "doc_id long, text string")
    out = fingerprint_dedup(df, "text", "doc_id")
    assert out.count() == 2


def test_minhash_finds_near_dups(near_dup_docs):
    from incubator_druid_spark.pipeline.dedup import minhash_dedup
    pairs = rows(minhash_dedup(near_dup_docs, "doc_id", "text",
                               threshold=0.5), "id_a", "id_b")
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in pairs)


def test_simhash_near_dups(near_dup_docs):
    from incubator_druid_spark.pipeline.dedup import simhash_candidates
    out = rows(simhash_candidates(near_dup_docs, "doc_id", "text",
                                  max_hamming=10), "id_a", "id_b", "hamming")
    pairs = {(a, b): h for a, b, h in out}
    assert pairs[(1, 3)] == 0          # exact dup → identical signature
    assert (1, 2) in pairs             # near dup within hamming budget
    assert (1, 4) not in pairs


def test_ngram_jaccard(near_dup_docs):
    from incubator_druid_spark.pipeline.dedup import ngram_jaccard
    a = near_dup_docs.filter("doc_id = 1")
    out = ngram_jaccard(a, near_dup_docs, "doc_id", "text")
    j = {r[1]: r[2] for r in rows(out)}
    assert j[3] == 1.0
    assert 0.5 < j[2] < 1.0
    assert j[4] < 0.05


def test_cosine_topk_exact(spark):
    from incubator_druid_spark.pipeline.similarity import cosine_topk
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = cosine_topk(df, [1.0, 0.0], k=2)
    assert [r["vec_id"] for r in out.collect()] == [1, 2]


def test_ann_lsh_recall(spark, catalog):
    """LSH top-k should substantially overlap brute-force top-k."""
    from incubator_druid_spark.pipeline.similarity import (ann_lsh_topk,
                                                           cosine_topk)
    emb = catalog.table("embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in cosine_topk(rest, q, k=10).collect()}
    approx = {r["vec_id"] for r in ann_lsh_topk(rest, q, k=10).collect()}
    assert len(exact & approx) >= 5


def test_embedding_near_dup_pairs(spark):
    from incubator_druid_spark.pipeline.similarity import embedding_near_dup_pairs
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = rows(embedding_near_dup_pairs(df, threshold=0.99), "id_a", "id_b")
    assert out == [(1, 2)]


def test_embedding_near_dup_hot_bucket_capped(spark):
    """1k identical vectors all land in the same LSH bucket in every band —
    without the cap that's ~500k candidate pairs per band; with it the
    bucket is dropped and the join stays bounded.  Distinct near-dups in
    normal-size buckets must still come through."""
    import time
    vecs = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(1000)]
    vecs += [(2001, [0.0, 1.0, 0.001, 0.0]), (2002, [0.0, 0.999, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    from incubator_druid_spark.pipeline.similarity import embedding_near_dup_pairs
    t0 = time.time()
    out = embedding_near_dup_pairs(df, threshold=0.99, max_bucket=64).collect()
    assert time.time() - t0 < 60
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (2001, 2002) in got
    # the hot bucket was dropped, not exploded into ~500k pairs
    assert len(got) < 1000


def test_embedding_near_dup_join_carries_no_vectors(spark):
    """The banded self-join must not shuffle the embedding column — vectors
    join back by id after candidate generation (VERDICT r1 #3)."""
    from incubator_druid_spark.pipeline.similarity import embedding_near_dup_pairs
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>")
    plan = embedding_near_dup_pairs(df, threshold=0.99)._jdf \
        .queryExecution().optimizedPlan().toString()
    import re
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    # the two trailing joins fetch va/vb by id; the candidate self-join
    # (band/bk equi-join) must reference only id/band/bucket-key columns
    self_joins = [ln for ln in joins if "band" in ln]
    assert self_joins, plan
    assert all("embedding" not in ln and "va#" not in ln and "vb#" not in ln
               for ln in self_joins), plan


def test_ivf_centroids_sorted_input_recall(spark):
    """Adversarial fixture (VERDICT r1 #2): vectors written CLUSTERED — all
    of cluster A first, then B, then C.  A head-of-table sample would train
    centroids on cluster A only; the seeded random sample must keep IVF
    recall high on all clusters."""
    import numpy as np
    from incubator_druid_spark.pipeline.similarity import (ann_ivf_topk,
                                                           cosine_topk)
    rng = np.random.default_rng(7)
    centers = np.eye(3, 8)  # 3 well-separated direction clusters in R^8
    rows_ = []
    vid = 0
    for c in range(3):  # sorted/clustered write order
        for _ in range(1400):
            v = centers[c] + 0.05 * rng.standard_normal(8)
            rows_.append((vid, [float(x) for x in v]))
            vid += 1
    # createDataFrame preserves order: a head-of-table sample (the old
    # limit(2048)) would see clusters A and part of B, never C
    df = spark.createDataFrame(rows_, "vec_id long, embedding array<float>")
    # query near cluster C (the LAST cluster in write order)
    q = [float(x) for x in centers[2] + 0.05 * rng.standard_normal(8)]
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
    approx = {r["vec_id"] for r in
              ann_ivf_topk(df, q, k=10, n_clusters=3, nprobe=1).collect()}
    assert len(exact & approx) >= 8


def test_text_analyze(spark):
    from incubator_druid_spark.pipeline.text import analyze
    df = spark.createDataFrame(
        [(1, "The quick brown fox is in the garden with the dog."),
         (2, "le chat est dans la maison et le chien est dans le jardin")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in analyze(df).collect()}
    assert out[1]["n_tokens"] == 11
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "fr"
    assert 0.0 < out[1]["quality"] <= 1.0
    assert out[1]["fingerprint"] != out[2]["fingerprint"]


def test_text_fingerprint_stability(spark):
    from incubator_druid_spark.pipeline.text import fingerprint
    df = spark.createDataFrame(
        [("Hello,   WORLD!",), ("hello world",)], "t string")
    fps = [r["f"] for r in df.select(fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1]


def test_multimodal_image_features(spark):
    from incubator_druid_spark.pipeline.multimodal import (
        attach_media_metadata, decode_image_features)
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff" + b"fakejpegbytes")),
         (2, bytearray(b"\x89PNG" + b"fakepngbytes"))],
        "id long, content binary")
    meta = attach_media_metadata(df)
    mimes = {r["id"]: r["media"]["mime"] for r in meta.collect()}
    assert mimes == {1: "image/jpeg", 2: "image/png"}
    feats = decode_image_features(df, fake=True)
    out = feats.collect()
    assert len(out) == 2
    assert len(out[0]["feat"]) == 8
    assert out[0]["width"] == 224
    # deterministic: same bytes → same features
    again = decode_image_features(df, fake=True).collect()
    assert out[0]["feat"] == again[0]["feat"]


def test_multimodal_real_codec_raises(spark):
    from incubator_druid_spark.pipeline.multimodal import decode_image_features
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, content binary")
    with pytest.raises(Exception):
        decode_image_features(df, fake=False).collect()


def test_video_frame_sampling(spark):
    from incubator_druid_spark.pipeline.multimodal import sample_video_frames
    df = spark.createDataFrame([(1, bytearray(b"0" * 100))],
                               "id long, content binary")
    out = sample_video_frames(df, fake=True).collect()
    assert len(out) >= 1
    assert all(len(r["frame_feat"]) == 8 for r in out)


def test_connected_components_chain_and_clique(spark):
    """CC over a chain (worst case for label propagation), a clique, and an
    isolated pair — group_id is the min member everywhere."""
    from incubator_druid_spark.pipeline.dedup import (connected_components,
                                                      dedup_by_groups)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain 1-5
         (10, 11), (10, 12), (11, 12),          # clique 10-12
         (20, 21)],                             # pair
        "id_a long, id_b long")
    got = {(r["id"], r["group_id"])
           for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
                   (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}
    docs = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    kept = dedup_by_groups(docs, connected_components(pairs), "doc_id")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # losers removed, winners + untouched ids kept
    assert kept_ids == set(range(25)) - {2, 3, 4, 5, 11, 12, 21}


def test_stratified_sample_exact_and_deterministic(spark):
    from incubator_druid_spark.pipeline.sampling import (proportional_sample,
                                                         stratified_sample)
    import pyspark.sql.functions as F
    df = (spark.range(0, 1000).withColumnRenamed("id", "doc_id")
          .withColumn("src", (F.col("doc_id") % 3).cast("string")))
    # tiny stratum: 4 rows only
    df = df.union(spark.createDataFrame(
        [(10_000 + i, "tiny") for i in range(4)], "doc_id long, src string"))
    s = stratified_sample(df, "src", "doc_id", 50)
    counts = {r["src"]: r["c"] for r in
              s.groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts == {"0": 50, "1": 50, "2": 50, "tiny": 4}
    # deterministic: two runs pick identical rows
    ids1 = sorted(r["doc_id"] for r in s.collect())
    ids2 = sorted(r["doc_id"] for r in
                  stratified_sample(df, "src", "doc_id", 50).collect())
    assert ids1 == ids2
    p = proportional_sample(df, "src", "doc_id", 0.1)
    pc = {r["src"]: r["c"] for r in
          p.groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()}
    # ceil(334*0.1)=34, ceil(333*0.1)=34, ceil(4*0.1)=1
    assert pc == {"0": 34, "1": 34, "2": 34, "tiny": 1}


def test_session_window_stats_matches_sessionize(spark):
    """session_window (the streaming-capable path) draws the same session
    boundaries as the window-function sessionizer."""
    import datetime
    import pyspark.sql.functions as F
    from incubator_druid_spark.pipeline.sessions import (session_stats,
                                                         session_window_stats)
    base = datetime.datetime(2024, 1, 1)
    rows_ = []
    for u in (1, 2):
        for off_min in (0, 5, 10, 120, 125, 300):  # 3 sessions per user
            rows_.append((u, base + datetime.timedelta(minutes=off_min + u)))
    df = spark.createDataFrame(rows_, "user_id long, `__time` timestamp")
    a = session_stats(df, gap_minutes=30).collect()
    b = session_window_stats(df, gap_minutes=30).collect()
    assert len(a) == len(b) == 6
    # same (user, n_events) multiset and same session start instants
    sa = sorted((r["user_id"], r["n_events"], r["session_start"]) for r in a)
    sb = sorted((r["user_id"], r["n_events"], r["w_start"]) for r in b)
    assert sa == sb


def test_session_window_streaming(spark, tmp_path):
    """The same operator over readStream: watermarked append-mode sessions
    land in the sink once closed."""
    import datetime
    src = tmp_path / "sess_src"
    src.mkdir()
    base = datetime.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [(1, base), (1, base + datetime.timedelta(minutes=5)),
         (1, base + datetime.timedelta(minutes=120)),
         (2, base + datetime.timedelta(minutes=1)),
         # late-edge event far ahead moves the watermark past the others
         (9, base + datetime.timedelta(hours=12))],
        "user_id long, `__time` timestamp")
    batch.write.mode("overwrite").parquet(str(src))
    from incubator_druid_spark.pipeline.sessions import session_window_stats
    stream = spark.readStream.schema("user_id long, `__time` timestamp") \
        .parquet(str(src))
    out = session_window_stats(stream, gap_minutes=30, watermark_minutes=60)
    q = (out.writeStream.format("memory").queryName("sess_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["n_events"])
           for r in spark.sql("SELECT * FROM sess_mem").collect()}
    # sessions closed before the 12h watermark: user1 x2, user2 x1
    assert got >= {(1, 2), (1, 1), (2, 1)}


def test_stratified_sample_salted_hot_stratum(spark):
    """salts>1 (VERDICT r2 #2): a dominant stratum's rank window splits into
    per-salt tasks — the window partitions by (stratum, salt) in the PLAN —
    while per-salt quotas still sum to exactly n, deterministically."""
    from incubator_druid_spark.pipeline.sampling import (proportional_sample,
                                                         stratified_sample)
    import pyspark.sql.functions as F
    # one 'hot' stratum with 194k of 200k rows + three small ones
    df = (spark.range(0, 200_000).withColumnRenamed("id", "doc_id")
          .withColumn("src", F.when(F.col("doc_id") < 194_000, "hot")
                              .otherwise((F.col("doc_id") % 3).cast("string"))))
    s = stratified_sample(df, "src", "doc_id", 1000, salts=16)
    counts = {r["src"]: r["c"] for r in
              s.groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts == {"hot": 1000, "0": 1000, "1": 1000, "2": 1000}
    # deterministic for a fixed salt count
    ids1 = sorted(r["doc_id"] for r in s.collect())
    ids2 = sorted(r["doc_id"] for r in
                  stratified_sample(df, "src", "doc_id", 1000,
                                    salts=16).collect())
    assert ids1 == ids2
    # the hot stratum's window is salt-partitioned (no single-task sort)
    plan = (stratified_sample(df, "src", "doc_id", 1000, salts=16)
            ._jdf.queryExecution().executedPlan().toString())
    win = plan.split("Window")[1][:400]
    assert "__salt" in win
    # uneven quota split: n=10, salts=4 → 3+3+2+2
    s2 = stratified_sample(df.filter(F.col("src") == "hot"),
                           "src", "doc_id", 10, salts=4)
    assert s2.count() == 10
    # proportional with salts: within `salts` rows of the exact ceil
    p = proportional_sample(df, "src", "doc_id", 0.01, salts=8)
    pc = {r["src"]: r["c"] for r in
          p.groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert 1940 <= pc["hot"] <= 1940 + 8


def test_ivf_index_partition_pruning(spark, tmp_path):
    """write_ivf_index partitions by __ivf; a query through
    ann_ivf_topk_indexed must prune to the probed clusters via Catalyst
    PartitionFilters (directory pruning) — the on-disk 100 TB layout where
    a probe reads nprobe/n_clusters of the bytes."""
    import numpy as np

    from incubator_druid_spark.pipeline.similarity import (
        ann_ivf_topk_indexed, train_ivf_centroids, write_ivf_index)
    rng = np.random.default_rng(3)
    vecs = [(i, (rng.standard_normal(8)
                 + np.eye(8)[i % 4] * 4).tolist()) for i in range(400)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cent = train_ivf_centroids(df, n_clusters=4, seed=7)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(df, path, cent)
    qvec = vecs[0][1]
    out = ann_ivf_topk_indexed(spark, path, qvec, cent, k=5, nprobe=1)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "__ivf" in plan
    got = [r["vec_id"] for r in out.collect()]
    assert got[0] == 0 and len(got) == 5  # query vector finds itself first


def _make_ppm(w, h, rgb):
    return (f"P6\n{w} {h}\n255\n".encode()
            + bytes(rgb) * (w * h))


def _make_bmp(w, h, rgb):
    """Minimal 24-bit bottom-up BI_RGB BMP, solid fill."""
    row = (w * 3 + 3) // 4 * 4
    pix = (bytes(rgb[::-1]) * w + b"\x00" * (row - w * 3)) * h
    size = 54 + len(pix)
    header = (b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + pix


def _make_wav(n, sr, amp_i16):
    import struct
    import wave
    import io
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(struct.pack(f"<{n}h", *([amp_i16] * n)))
    return buf.getvalue()


def test_ppm_bmp_decode_end_to_end(spark):
    """fake=False decodes real P6 PPM and 24-bit BMP bytes: header dims,
    exact solid-fill channel means, zero stds."""
    from incubator_druid_spark.pipeline.multimodal import decode_image_features
    ppm = _make_ppm(6, 4, (255, 0, 128))
    bmp = _make_bmp(5, 3, (0, 255, 64))
    df = spark.createDataFrame([(1, bytearray(ppm)), (2, bytearray(bmp))],
                               "id long, content binary")
    out = {r["id"]: r for r in
           decode_image_features(df, fake=False).collect()}
    r1, r2 = out[1], out[2]
    assert (r1["width"], r1["height"]) == (6, 4)
    assert (r2["width"], r2["height"]) == (5, 3)
    assert r1["mime"] == "image/x-portable-pixmap" and r2["mime"] == "image/bmp"
    assert r1["feat"][:3] == [1.0, 0.0, 128 / 255]
    assert r2["feat"][:3] == [0.0, 1.0, 64 / 255]
    assert r1["feat"][3:6] == [0.0, 0.0, 0.0]  # solid fill → zero std


def test_wav_pcm_decode_end_to_end(spark):
    """fake=False decodes real RIFF/WAV PCM16: exact duration, rate, RMS."""
    from incubator_druid_spark.pipeline.multimodal import extract_audio_features
    wav = _make_wav(1600, 16000, 8192)  # 100 ms, amp 0.25
    df = spark.createDataFrame([(1, bytearray(wav))], "id long, content binary")
    r = extract_audio_features(df, fake=False).collect()[0]
    assert r["duration_ms"] == 100
    assert r["sample_rate"] == 16000
    assert abs(r["loudness"] - 0.25) < 1e-12


def test_video_concatenated_ppm_decode(spark):
    """fake=False samples frames from a concatenated-PPM stream: every_n
    stride, max_frames cap, per-frame solid-fill features."""
    from incubator_druid_spark.pipeline.multimodal import sample_video_frames
    frames = b"".join(_make_ppm(4, 4, (i * 20, 0, 0)) for i in range(10))
    df = spark.createDataFrame([(7, bytearray(frames))], "id long, content binary")
    out = sample_video_frames(df, every_n=3, max_frames=3, fake=False).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    got_r = [round(r["frame_feat"][0] * 255) for r in out]
    assert got_r == [0, 60, 120]


def test_real_codec_formats_still_raise(spark):
    """Formats without a pure-Python decoder (PNG) raise a
    NotImplementedError naming the format under fake=False, not a silent
    fake result; truncated JPEG raises a clear parse error (JPEG itself
    now decodes via pipeline/jpeg.py)."""
    import pytest as _pytest
    from incubator_druid_spark.pipeline.multimodal import (
        decode_image_features, extract_audio_features)
    df = spark.createDataFrame([(1, bytearray(b"\x89PNG\r\npngish"))],
                               "id long, content binary")
    with _pytest.raises(Exception, match="image codec"):
        decode_image_features(df, fake=False).collect()
    dfj = spark.createDataFrame([(1, bytearray(b"\xff\xd8\xffjpegish"))],
                                "id long, content binary")
    with _pytest.raises(Exception, match="truncated"):
        decode_image_features(dfj, fake=False).collect()
    df2 = spark.createDataFrame([(1, bytearray(b"ID3mp3ish"))],
                                "id long, content binary")
    with _pytest.raises(Exception, match="audio codec"):
        extract_audio_features(df2, fake=False).collect()


def test_repeated_ngram_spans(spark):
    """ExactSubstr-style repeated-span detection (round 8): an 8-gram
    shared by two documents marks its start positions in both; a unique
    document reports zeros; sub-n documents report zero grams."""
    from incubator_druid_spark.pipeline.dedup import repeated_ngram_spans
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, shared + " alpha beta"),
        (2, "intro words here " + shared),
        (3, "completely unique text with no repeated spans at all ok"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           repeated_ngram_spans(df, "doc_id", "text", n=8,
                                min_repeats=2).collect()}
    # doc1: 12 tokens → 5 8-gram starts; the 3 grams inside `shared`
    # (10 tokens → 3 grams) also occur in doc2 → 3 repeated starts
    assert out[1]["n_tokens"] == 12
    assert out[1]["repeated_starts"] == 3
    assert out[1]["distinct_repeated"] == 3
    assert out[2]["repeated_starts"] == 3
    assert out[3]["repeated_starts"] == 0
    assert out[3]["distinct_repeated"] == 0
    assert out[4]["n_tokens"] == 2 and out[4]["repeated_starts"] == 0


def test_repeated_ngram_spans_within_doc(spark):
    """min_repeats counts CORPUS occurrences: a doc repeating its own
    8-gram twice crosses the threshold without any second document."""
    from incubator_druid_spark.pipeline.dedup import repeated_ngram_spans
    span = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(7, span + " filler " + span)], "doc_id long, text string")
    out = repeated_ngram_spans(df, "doc_id", "text", n=8,
                               min_repeats=2).collect()[0]
    assert out["repeated_starts"] >= 2
    assert out["distinct_repeated"] >= 1


def test_repeated_ngram_spans_plan_is_aggregated(spark):
    """Plan shape: the corpus-count groupBy is a partial→final
    HashAggregate (map-side combine) and no Python appears."""
    from incubator_druid_spark.pipeline.dedup import repeated_ngram_spans
    df = spark.createDataFrame([(1, "a b c d e f g h i")],
                               "doc_id long, text string")
    plan = repeated_ngram_spans(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_strip_repeated_spans(spark):
    """Cleaning variant: the SECOND occurrence of a corpus-repeated
    8-gram is removed; the first (lowest doc id, position) survives."""
    from incubator_druid_spark.pipeline.dedup import strip_repeated_spans
    span = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    df = spark.createDataFrame(
        [(1, span + " alpha beta"),
         (2, "intro words here " + span),
         (3, "unique text only nothing shared between documents here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           strip_repeated_spans(df, "doc_id", "text", n=8,
                                min_repeats=2).collect()}
    # doc1 holds the first occurrences → untouched
    assert out[1]["removed_tokens"] == 0
    assert out[1]["clean_text"].startswith("the quick brown fox")
    # doc2's copy of the span is the duplicate: its 3 repeated 8-gram
    # starts cover tokens 4..13 (the whole 10-token span) → removed
    assert out[2]["removed_tokens"] == 10
    assert out[2]["clean_text"] == "intro words here"
    assert out[3]["removed_tokens"] == 0


def test_strip_repeated_spans_self_repeat(spark):
    """Within-document duplicate: the second copy of the span drops,
    the first stays."""
    from incubator_druid_spark.pipeline.dedup import strip_repeated_spans
    span = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(7, span + " x " + span)], "doc_id long, text string")
    out = strip_repeated_spans(df, "doc_id", "text", n=8,
                               min_repeats=2).collect()[0]
    assert out["clean_text"] == span + " x"
    assert out["removed_tokens"] == 8


def test_connected_components_driver_path_matches_loop(spark):
    """The bounded driver union-find (small edge sets) must return exactly
    what the distributed label loop returns — random graph + string ids."""
    import random

    from incubator_druid_spark.pipeline.dedup import connected_components
    rng = random.Random(11)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {(r["id"], r["group_id"])
            for r in connected_components(pairs).collect()}
    loop = {(r["id"], r["group_id"])
            for r in connected_components(
                pairs, driver_edge_cap=0).collect()}
    assert fast == loop and len(fast) > 0

    spairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string")
    fast = {(r["id"], r["group_id"])
            for r in connected_components(spairs).collect()}
    assert fast == {("a", "a"), ("b", "a"), ("c", "a"),
                    ("x", "x"), ("y", "x")}
    out = connected_components(spairs)
    assert [f.name for f in out.schema.fields] == ["id", "group_id"]
    assert out.schema["id"].dataType.simpleString() == "string"
