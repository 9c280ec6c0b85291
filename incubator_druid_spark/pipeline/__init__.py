"""Training-data pipeline operators, grouped by module:

* ``text``      — analysis (tokens/quality/lang-ID/fingerprint), Gopher
                  quality rules, C4 page cleaning, repetition signals,
                  PII counting/redaction, per-group top terms.
* ``dedup``     — exact / fingerprint dedup, MinHash-LSH, SimHash,
                  n-gram Jaccard, connected-component grouping,
                  repeated-substring (ExactSubstr) span detection +
                  cleaning, watermark-bounded streaming dedup.
* ``decontaminate`` — benchmark decontamination by exact n-gram
                  collision against a broadcast eval corpus.
* ``similarity`` — cosine top-k, hyperplane-LSH and IVF ANN (with a
                  persisted index), embedding near-dup pairs,
                  set-to-set brute-force kNN join.
* ``sampling``  — stratified / proportional sampling, weighted corpus
                  mixing with per-epoch copies.
* ``packing``   — fixed-token chunking, concat-and-cut and next-fit
                  sequence packing, sequence materialization.
* ``sessions``  — event sessionization.
* ``multimodal`` / ``probe`` — binary media columns: header-only probe,
                  MP4 sample index, pure-Python codec decode
                  (PPM/BMP/JPEG/PNG/GIF/WebP/WAV/FLAC/MJPEG-AVI).

Import operators from their module (``from
incubator_druid_spark.pipeline.dedup import minhash_dedup``) — modules
stay import-light so a text-only job never touches the codec code.
"""
