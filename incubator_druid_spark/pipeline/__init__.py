"""Training-data pipeline operators, grouped by module:

* ``text``      — analysis (tokens/quality/lang-ID/fingerprint), Gopher
                  quality rules, C4 page cleaning, repetition signals,
                  PII counting/redaction, Unicode script profile,
                  per-group top terms, corpus profile report,
                  token-budget truncation.
* ``bpe``       — real GPT-2-style BPE tokenization (broadcast
                  merges+vocab, Arrow kernel).
* ``score``     — model-based quality scoring: hashed bag-of-words
                  linear classifier with broadcast weights.
* ``dedup``     — exact / fingerprint dedup, MinHash-LSH, SimHash,
                  n-gram Jaccard, connected-component grouping,
                  repeated-substring (ExactSubstr) span detection +
                  cleaning, watermark-bounded streaming dedup.
* ``decontaminate`` — benchmark decontamination: exact n-gram
                  collision against a broadcast eval corpus, plus the
                  fuzzy MinHash cross-corpus variant.
* ``similarity`` — cosine top-k, hyperplane-LSH and IVF ANN (with a
                  persisted index), embedding near-dup pairs,
                  set-to-set brute-force kNN join, SemDeDup
                  embedding-cluster dedup.
* ``embed``     — text embedding plumbing: batched Arrow kernel with a
                  pluggable model (deterministic hash projection by
                  default).
* ``sampling``  — stratified / proportional sampling, weighted corpus
                  mixing with per-epoch copies.
* ``packing``   — fixed-token chunking, concat-and-cut and next-fit
                  sequence packing, sequence materialization.
* ``sessions``  — event sessionization.
* ``urls``      — URL parse/canonicalize, registrable domains,
                  URL-key dedup, per-domain stats.
* ``warc`` / ``html`` — the Common Crawl front door: WARC record
                  parsing (plain + per-record gzip, byte-range
                  scheduling) and HTML visible-text extraction with
                  link-density boilerplate signals.
* ``webdataset`` — LAION-style tar shards: member byte-range index +
                  per-sample rollup.
* ``chat``      — SFT transcripts: turn parsing, loss-mask spans,
                  conversation shape stats.
* ``multimodal`` / ``probe`` / ``phash`` — binary media columns:
                  header-only probe, MP4 sample + MP3 frame byte-range
                  indexes, pure-Python codec decode (PPM/BMP/JPEG/PNG/
                  GIF/WebP-VP8L/VP8-keyframe/WAV/FLAC/MJPEG-AVI),
                  perceptual dHash/pHash image near-dup.

Import operators from their module (``from
incubator_druid_spark.pipeline.dedup import minhash_dedup``) — modules
stay import-light so a text-only job never touches the codec code.
"""
