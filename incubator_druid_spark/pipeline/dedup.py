"""Deduplication operators: exact, fingerprint, MinHash+LSH, SimHash.

Scale design (100 TB): every path is shuffle-minimal —
- exact/fingerprint dedup: one hash-partitioned groupBy on a 64-bit key
  (never the full text; the wide column stays un-shuffled until the winner
  is chosen by key).
- MinHash LSH: signatures are computed scan-side as Column expressions
  (xxhash64 per seed — no Python), then ONE explode on (band, bandHash) and
  ONE groupBy to find candidate buckets; verification joins only candidate
  pairs (the classic shingle→minhash→band→bucket-join pipeline).
- SimHash: 64-bit signature via bit-counting HOFs, banded into 4×16-bit keys
  so any pair within Hamming distance 3 shares ≥1 band (pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.text import normalize_text, tokens


# ---------------------------------------------------------------------------
# exact / fingerprint
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id row per exact key.  groupBy on xxhash64(key) keeps the
    shuffle narrow; the representative id is min_by over the hash groups."""
    key = F.xxhash64(*[F.col(c) for c in key_cols])
    return (df.withColumn("__key", key)
              .groupBy("__key")
              .agg(F.min(F.col(id_col)).alias(id_col),
                   F.count(F.lit(1)).alias("dup_count"))
              .drop("__key"))


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact dedup on the normalized-text fingerprint (case/punct/ws
    insensitive).  The regex normalization is the dominant cost and runs
    BEFORE the (8-byte-key) shuffle, so widen a narrow input first — the
    grouping is partitioning-invariant, results identical."""
    fp = F.xxhash64(normalize_text(F.col(text_col)))
    # 64 MB floor: one regex pass over less than that is sub-second on a
    # single core, cheaper than the widening exchange (see _widen_for_explode)
    return (_widen_for_explode(df, by=id_col, min_bytes=64 * 1024 * 1024)
              .withColumn("__fp", fp)
              .groupBy("__fp")
              .agg(F.min(F.col(id_col)).alias(id_col),
                   F.count(F.lit(1)).alias("dup_count"))
              .withColumnRenamed("__fp", "fingerprint"))


def dedup_stream(df: DataFrame, key_cols: list[str] | None = None,
                 text_col: str | None = None, time_col: str = "__time",
                 delay: str = "10 minutes") -> DataFrame:
    """First-arrival-wins dedup for STREAMING ingest: rows whose key (or
    normalized-text fingerprint when `text_col` is given) was already
    seen within the watermark horizon are dropped.

    Streaming shape: withWatermark + dropDuplicatesWithinWatermark —
    per-key state is expired once the event time passes `delay` behind
    the watermark, so state stays bounded at any stream volume (an
    unbounded dropDuplicates would grow state forever on a 100 TB/day
    stream).  A duplicate arriving AFTER its original expired is kept —
    the within-horizon contract; run batch fingerprint_dedup over the
    landed table for the global pass.  On a batch frame this degrades to
    plain dropDuplicates over the same key for parity testing."""
    if (key_cols is None) == (text_col is None):
        raise ValueError("pass exactly one of key_cols / text_col")
    if text_col is not None:
        work = df.withColumn("__dedup_key",
                             F.xxhash64(normalize_text(F.col(text_col))))
    else:
        work = df.withColumn("__dedup_key",
                             F.xxhash64(*[F.col(c) for c in key_cols]))
    if df.isStreaming:
        out = (work.withWatermark(time_col, delay)
                   .dropDuplicatesWithinWatermark(["__dedup_key"]))
    else:
        out = work.dropDuplicates(["__dedup_key"])
    return out.drop("__dedup_key")


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct); empty array under n tokens
    (sequence(1, count<=0) would generate a DESCENDING index list and feed
    slice() a zero start — guard with when())."""
    toks = tokens(normalize_text(text))
    count = F.size(toks) - (n - 1)
    grams = F.when(count >= 1, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))) \
        .otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


#: Universal-hash family shared by BOTH minhash paths (pandas kernel and
#: Column expression) and REPLAYABLE in any ANSI-SQL oracle: the per-shingle
#: base hash is the first 15 hex digits of md5 (a 60-bit int every engine
#: derives identically), reduced mod the Mersenne prime 2^31-1; the k
#: derived hashes are (a_i*base + b_i) mod p with fixed seeded constants.
#: p, a_i, b_i < 2^31 keeps every product within int64 — no overflow
#: divergence between engines.
MINHASH_P = (1 << 31) - 1


def minhash_constants(num_hashes: int = 64):
    """The fixed (a, b) universal-hash constants (deterministic seed)."""
    import numpy as np
    rng = np.random.default_rng(635)
    a = rng.integers(1, MINHASH_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MINHASH_P, size=num_hashes, dtype=np.int64)
    return a, b


def shingle_hash64(shingle: Column) -> Column:
    """60-bit base hash of a shingle: int of md5's first 15 hex digits —
    the SQL-replayable shingle-set representation."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long")


_MD5_MEMO: dict[str, int] = {}


def _md5_worker_memo() -> dict[str, int]:
    """The per-worker-PROCESS shingle-digest cache: Python workers are
    reused across tasks, so boilerplate shingles recurring in other
    partitions (or later jobs) hash once per executor instead of once per
    task.  Bounded by the caller (≤1M entries ≈ 100 MB)."""
    return _MD5_MEMO


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: per seed i, min over shingles of
    (a_i * (md5base % p) + b_i) % p — same family as the pandas kernel.

    Single expression — transform over the seed sequence with a nested
    transform over shingles — so the shingle array is evaluated once per row
    regardless of num_hashes (building one array-min per seed as separate
    top-level expressions made Catalyst re-derive the shingle pipeline 64×).
    Null/empty shingle sets produce null mins — callers filter empties first."""
    a, b = minhash_constants(num_hashes)
    a_arr = F.array(*[F.lit(int(x)) for x in a])
    b_arr = F.array(*[F.lit(int(x)) for x in b])
    base = F.transform(shingle_col, lambda s: shingle_hash64(s) % MINHASH_P)

    def per_seed(i):
        return F.array_min(F.transform(
            base, lambda h: (a_arr[i] * h + b_arr[i]) % MINHASH_P))

    return F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)), per_seed)


def _signature_frame_pandas(df: DataFrame, id_col: str, text_col: str,
                            num_hashes: int, shingle_n: int) -> DataFrame:
    """(id, __sig) via an Arrow-batched numpy kernel.

    The pure-Column signature path is correct, but Catalyst higher-order
    functions are CodegenFallback — every nested transform() runs in the
    expression INTERPRETER, costing ~100ms/doc at 64 hashes.  (A round-6
    attempt to move the base hashing "JVM-side" as
    transform(shingles(text), shingle_hash64) hit exactly that wall: 10×
    slower than this kernel at sf0.1 — shingling must stay OUT of HOF
    space on the hot path.)  This kernel tokenizes + shingles in flat
    Python/C (regex, set, hashlib), computes one 60-bit base hash per
    shingle (md5 hex prefix — the same SQL-replayable base as
    shingle_hash64), and derives the k min-hashes with a vectorized
    (a_i·h + b_i) mod p sweep — the standard universal-hashing
    construction — at ~1ms/doc.  A per-partition memo reuses digests of
    repeated shingles (boilerplate phrases recur across documents).  Arrow
    batch in/out, parallelism = input partitions, no shuffle introduced.
    Identical output to the minhash_signature Column path, so a DuckDB
    oracle can replay the full band/bucket pipeline from the same hashes;
    __sh doubles as the shingle-set representation for the exact Jaccard
    verify stage (set equality on 60-bit hashes ≡ set equality on
    shingles, collision odds ~n²/2^60).
    """
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    mersenne = MINHASH_P
    a, b = minhash_constants(num_hashes)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re
        norm = _re.compile(r"[^a-z0-9\s]")
        ws = _re.compile(r"\s+")
        md5 = hashlib.md5
        memo = _md5_worker_memo()  # worker-process scope: reused across
        # tasks, so repeated boilerplate shingles hash once per executor

        def hash_one(g: str) -> int:
            h = memo.get(g)
            if h is None:
                h = int(md5(g.encode()).hexdigest()[:15], 16)
                if len(memo) < 1_000_000:  # bounded per-worker cache
                    memo[g] = h
            return h

        for pdf in batches:
            ids, offsets, bases = [], [0], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(norm.sub(" ", (text or "").lower()).strip())
                toks = [t for t in toks if t]
                grams = {" ".join(toks[i:i + shingle_n])
                         for i in range(len(toks) - shingle_n + 1)}
                if not grams:
                    continue
                bases.append(np.fromiter((hash_one(g) for g in grams),
                                         dtype=np.int64, count=len(grams)))
                offsets.append(offsets[-1] + len(grams))
                ids.append(rid)
            if not ids:
                # typed empties: default float64 columns break the
                # Arrow conversion to array<long>
                yield pd.DataFrame({
                    id_col: pd.Series([], dtype="int64"),
                    "__sig": pd.Series([], dtype="object"),
                    "__sh": pd.Series([], dtype="object")})
                continue
            # one universal-hash sweep per SEED over the batch's flat
            # shingle vector, per-doc segment minima via minimum.reduceat.
            # Seed-at-a-time beats the (shingles × k) matrix form ~6×:
            # three cache-resident passes over an 8·n-byte vector instead
            # of three allocations of a 512·n-byte matrix.
            all_base = np.concatenate(bases)
            off = np.asarray(offsets[:-1])
            hb = all_base % mersenne
            mins = np.empty((len(ids), len(a)), dtype=np.int64)
            for i in range(len(a)):
                mins[:, i] = np.minimum.reduceat(
                    (hb * a[i] + b[i]) % mersenne, off)
            yield pd.DataFrame({id_col: ids,
                                "__sig": [m.tolist() for m in mins],
                                "__sh": [s.tolist() for s in bases]})

    # id cast to long BEFORE the kernel: the declared schema is long,
    # and an int32 input otherwise breaks the pandas->Arrow conversion
    # of the list columns (ArrowNotImplementedError in the cast path)
    return (df.select(F.col(id_col).cast("long").alias(id_col), text_col)
              .mapInPandas(kernel,
                           schema=f"{id_col} long, __sig array<long>, __sh array<long>"))


def _shingle_frame(df: DataFrame, id_col: str, text_col: str,
                   shingle_n: int) -> DataFrame:
    """(id, __sh) with the shingle computation spread across the cluster and
    persisted: the LSH self-join and the verify join both consume it, and
    without persistence each join branch would re-derive the whole
    regexp+HOF pipeline.  Repartitioning by id first matters when the input
    is a few big files (a 1-file table otherwise serializes the expensive
    projection onto one task — the single-node testdata hits exactly this)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = (df.repartition(parallelism, F.col(id_col))
            .select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("__sh")))
    return sh.persist()


def banded_buckets(with_sig: DataFrame, id_col: str, num_hashes: int,
                   bands: int) -> DataFrame:
    """(id, band, bh) LSH bucket keys from a (id, __sig) frame.  The
    band key is the band's signature slice joined as a string —
    equality-equivalent to hashing it, and replayable in any SQL
    oracle.  Shared by the self-join candidates and the cross-corpus
    fuzzy decontamination."""
    rows = num_hashes // bands
    banded = with_sig.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws(",", *[F.col("__sig")[b * rows + r]
                                        .cast("string")
                                        for r in range(rows)]).alias("bh"))
            for b in range(bands)
        ])).alias("bb"))
    return banded.select(id_col, "bb.band", "bb.bh")


def minhash_lsh_candidates(df: DataFrame, id_col: str, text_col: str,
                           num_hashes: int = 64, bands: int = 16,
                           shingle_n: int = 3, max_bucket: int = 64,
                           _sh: DataFrame | None = None,
                           use_pandas: bool = True) -> DataFrame:
    """→ (id_a, id_b) candidate near-dup pairs from LSH banding.
    rows = num_hashes/bands per band; collision in ANY band → candidate.

    ``max_bucket`` drops buckets larger than the cap before the self-join —
    hot min-hash values (stopword-heavy shingles, boilerplate) otherwise
    produce O(bucket²) pairs; a pair that's a genuine near-dup still collides
    in a *rarer* band with high probability, so the cap costs little recall
    while bounding the join quadratically.  This is what makes the operator
    safe on boilerplate-heavy corpora at 100 TB."""
    rows = num_hashes // bands
    if _sh is not None:
        with_sig = _sh
    elif use_pandas:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        with_sig = _signature_frame_pandas(
            df.repartition(parallelism, F.col(id_col)), id_col, text_col,
            num_hashes, shingle_n).persist()
    else:
        sh_frame = _shingle_frame(df, id_col, text_col, shingle_n)
        sig = minhash_signature(F.col("__sh"), num_hashes)
        with_sig = (sh_frame.select(F.col(id_col), sig.alias("__sig"))
                            .filter(F.col("__sig")[0].isNotNull())
                            .persist())
    buckets = banded_buckets(with_sig, id_col, num_hashes, bands)
    if max_bucket:
        # Bucket-capped pair generation as ONE shuffle instead of the
        # former sizes-groupBy + filter-join + self-join chain (guide §2.4:
        # that shape re-derived the banded explode for each self-join side
        # and paid 5 exchanges; this is 2 — the window and the distinct).
        # The bucket size is pre-counted with a window over (band, bh) and
        # oversized buckets are dropped BEFORE collect_list sees them: the
        # r9 shape filtered on size(__ids) AFTER the aggregation, so a hot
        # bucket (stopword-born band hash on a boilerplate-heavy corpus)
        # materialized its full id list in a single unspillable aggregation
        # buffer first — one multi-GB ArrayBuffer on one reducer at 100 TB
        # (guide §5).  The window buffers only narrow (id, band, bh) rows
        # and spills to disk; the groupBy then reuses the window's
        # (band, bh) hash partitioning (no second exchange) and every
        # collected list is bounded by max_bucket.  The cap bounds the
        # in-bucket pair explode at O(max_bucket²) per group, driver-free,
        # and emits the identical (id_a < id_b) pair set: one row per id
        # per band means sort_array + strictly-later slice == the old
        # l.id < r.id join condition.
        from pyspark.sql import Window
        w = Window.partitionBy("band", "bh")
        sized = (buckets
                 .withColumn("__n", F.count(F.lit(1)).over(w))
                 .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket)))
        grouped = (sized.groupBy("band", "bh")
                   .agg(F.sort_array(F.collect_list(id_col)).alias("__ids")))
        pairs = (grouped
                 .select(F.posexplode("__ids").alias("__i", "id_a"), "__ids")
                 .select("id_a",
                         F.explode(F.slice(
                             F.col("__ids"), F.col("__i") + 2,
                             F.size("__ids"))).alias("id_b"))
                 .distinct())
        return pairs
    # Uncapped path (max_bucket falsy): keep the distributed self-join — a
    # hot bucket would otherwise funnel into one collect_list row.
    pairs = (buckets.alias("l")
             .join(buckets.alias("r"),
                   (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.bh") == F.col("r.bh"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .distinct())
    return pairs


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  threshold: float = 0.8, num_hashes: int = 64,
                  bands: int = 16, shingle_n: int = 3,
                  max_bucket: int = 64, use_pandas: bool = True) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify on
    shingle sets → pairs over threshold.  Returns (id_a, id_b, jaccard).

    The verify stage reuses the persisted signature frame's shingle-hash sets
    (computed in the same Arrow kernel pass as the signatures), so the corpus
    text is read exactly once end-to-end.
    """
    if use_pandas:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        frame = _signature_frame_pandas(
            df.repartition(parallelism, F.col(id_col)), id_col, text_col,
            num_hashes, shingle_n).persist()
    else:
        sh_frame = _shingle_frame(df, id_col, text_col, shingle_n)
        frame = (sh_frame.select(
            F.col(id_col), minhash_signature(F.col("__sh"), num_hashes).alias("__sig"),
            F.transform(F.col("__sh"), shingle_hash64).alias("__sh"))
            .filter(F.col("__sig")[0].isNotNull()).persist())
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands,
                                   shingle_n, max_bucket, _sh=frame)
    sh = frame.select(F.col(id_col), F.col("__sh"))
    j = (cands
         .join(sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
         .join(sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")), "id_b"))
    # |A∪B| = |A|+|B|−|A∩B|: the __sh arrays are SETS (the kernel builds
    # them from a distinct-gram set; the Column path array_distincts), so
    # the arithmetic form is value-identical to size(array_union(...)) and
    # skips materializing a union array per candidate pair — one hash-set
    # build (the intersect) instead of two.  It is also term-for-term the
    # formula the DuckDB oracle replays (x / (sa.n + sb.n − x)).
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (j.select("id_a", "id_b", jac.alias("jaccard"))
             .filter(F.col("jaccard") >= threshold))


def ngram_jaccard(df_a: DataFrame, df_b: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for every cross pair of two (small) sides —
    the brute-force verifier used in tests; production path is minhash_dedup."""
    sa = df_a.select(F.col(id_col).alias("id_a"),
                     shingles(F.col(text_col), n).alias("sh_a"))
    sb = df_b.select(F.col(id_col).alias("id_b"),
                     shingles(F.col(text_col), n).alias("sh_b"))
    j = sa.crossJoin(sb)
    # arithmetic union size: sh_a/sh_b are distinct STRING arrays
    # (shingles() ends in array_distinct), so |A|+|B|−|A∩B| is exact
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return j.select("id_a", "id_b",
                    F.when(union > 0, inter / union).otherwise(0.0).alias("jaccard"))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash signature as a 64-char bit STRING: per token, the 64-bit
    pattern of md5's first 16 hex digits votes +1/-1 per position; the
    signature is the sign vector.  md5 (not xxhash64) so any ANSI-SQL
    oracle can replay the identical bit patterns (hex digit → 4 bits).

    Bit extraction uses lpad(conv(hex, 16, 2)) because Spark's shiftright
    only accepts a literal shift amount inside HOF lambdas.  Everything
    stays in one pass over tokens.

    The md5 bit string is BOUND once per token via a one-element
    transform (r10, guide §1.2): HOF lambdas have no common-subexpression
    reuse, so the historical form — which referenced the bstr expression
    inside the 64-way bit transform — re-ran md5+conv+lpad once per BIT,
    64× per token (measured: the signature projection dominated
    simhash_pairs).  `transform(array(x), f)[0]` is exactly f(x), null
    propagation included, so signatures are bit-identical."""
    toks = tokens(normalize_text(text))
    zeros = F.array_repeat(F.lit(0), bits)

    def vote(acc, t):
        bstr_expr = F.lpad(F.conv(F.substring(F.md5(t), 1, bits // 4), 16, 2),
                           bits, "0")

        def tally(bstr):
            def bit(i):
                return F.when(F.substring(bstr, i, 1) == "1", 1).otherwise(-1)

            return F.zip_with(
                acc, F.transform(F.sequence(F.lit(1), F.lit(bits)), bit),
                lambda a, b: a + b)

        return F.transform(F.array(bstr_expr), tally)[0]

    votes = F.aggregate(toks, zeros, vote)
    return F.array_join(
        F.transform(votes, lambda v: F.when(v > 0, "1").otherwise("0")), "")


def hamming_distance(sig_a: Column, sig_b: Column) -> Column:
    """Hamming distance between two equal-length bit strings."""
    diff = F.zip_with(F.split(sig_a, ""), F.split(sig_b, ""),
                      lambda a, b: F.when(a != b, 1).otherwise(0))
    return F.aggregate(diff, F.lit(0), lambda acc, x: acc + x)


def banded_hamming_pairs(with_sig: DataFrame, id_col: str, sig_col: str,
                         max_hamming: int = 3,
                         bits: int = 64) -> DataFrame:
    """All (id_a, id_b, hamming) pairs with Hamming(bit-string signature)
    <= max_hamming, WITHOUT an all-pairs product: band the signature into
    max_hamming + 1 chunks — two signatures within the threshold must
    agree on at least one whole chunk (pigeonhole), so one equi-join on
    (chunk index, chunk value) generates a complete candidate set; the
    exact Hamming filter then prunes it.  Shared by the text SimHash and
    the image dHash/pHash surfaces (pipeline/phash.py)."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= bits:
        raise ValueError("max_hamming must be in [0, bits - 1]")
    # distribute bits as evenly as possible: chunk c covers
    # [c*bits//n, (c+1)*bits//n)
    bounds = [(c * bits // n_chunks, (c + 1) * bits // n_chunks)
              for c in range(n_chunks)]
    chunks = with_sig.select(
        id_col, sig_col,
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.substring(F.col(sig_col), b0 + 1, b1 - b0)
                      .alias("ck"))
            for c, (b0, b1) in enumerate(bounds)
        ])).alias("cc"))
    chunks = chunks.select(id_col, sig_col, "cc.chunk", "cc.ck")
    pairs = (chunks.alias("l")
             .join(chunks.alias("r"),
                   (F.col("l.chunk") == F.col("r.chunk"))
                   & (F.col("l.ck") == F.col("r.ck"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"),
                     F.col(f"l.{sig_col}").alias("sim_a"),
                     F.col(f"r.{sig_col}").alias("sim_b"))
             .distinct())
    ham = hamming_distance(F.col("sim_a"), F.col("sim_b"))
    return (pairs.select("id_a", "id_b", ham.alias("hamming"))
                 .filter(F.col("hamming") <= max_hamming))


def simhash_candidates(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates where Hamming(simhash) ≤ max_hamming — the
    banded equi-join (banded_hamming_pairs) over the 64-bit SimHash."""
    sig = simhash(F.col(text_col))
    with_sig = df.select(F.col(id_col), sig.alias("__sim"))
    return banded_hamming_pairs(with_sig, id_col, "__sim", max_hamming)


# ---------------------------------------------------------------------------
# near-dup grouping: connected components over candidate pairs
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 20,
                         driver_edge_cap: int = 500_000) -> DataFrame:
    """Group near-duplicate pairs into components: (id, group_id) where
    group_id = the minimum member id of the component.

    Min-label propagation, DataFrame-only: each round joins the current
    labels across the (symmetrized) edge list and takes the elementwise min.
    Converges in O(component diameter) rounds — near-dup components from
    LSH banding are near-cliques (every member shares a bucket with most
    others), so 2-4 rounds is typical regardless of corpus size; the cap is
    a safety net for adversarial chain topologies.

    Small-graph fast path (r9, the broadcast-join adaptivity applied to
    graph state): once the deduped edge list is materialized its exact
    size is known, and when it is at most ``driver_edge_cap`` rows (the
    default bounds the collect at ~8 MB of id pairs — the same order as
    a broadcast relation) the components are computed in one driver-side
    union-find pass instead of 3+ distributed rounds of (join + groupBy
    + checkpoint + convergence action) whose per-round FIXED cost
    dominates any small graph.  Identical output: union-find resolved to
    the minimum member id per component is exactly the fixed point the
    label loop converges to (and unlike the loop it cannot be truncated
    by ``max_iterations``).  A 100 TB LSH edge set (billions of rows)
    takes the distributed loop as before; set ``driver_edge_cap=0`` to
    force it.

    Scale notes (100 TB): per round = one shuffle join on the 64-bit id +
    one groupBy min — both narrow.  Labels are localCheckpoint()ed every
    round so the lineage (and thus task-retry cost + plan size) stays O(1)
    in the round count rather than compounding; the convergence test is a
    count() on the changed set, one action per round.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # localCheckpoint, not persist: persist caches the DATA but keeps the
    # upstream LINEAGE in the plan, so every round's new join re-analyzes
    # and re-optimizes the whole candidate-generation subtree (for the
    # similarity family that subtree carries dim-wide unrolled vector
    # chains — measured seconds of DRIVER plan work per round on a
    # 17-edge graph).  The checkpoint materializes the narrow (src, dst)
    # pairs once and every subsequent round plans against an O(1)-size
    # scan of them (r9, guide §7.3 "very large plans spend minutes in
    # the optimizer — truncate with localCheckpoint").
    edges = (edges.union(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
             .distinct().localCheckpoint())
    n_edges = edges.count()
    if n_edges <= driver_edge_cap:
        return _driver_components(edges)
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("comp", F.col("id")).localCheckpoint())
    for _ in range(max_iterations):
        nbr_min = (edges.join(labels.withColumnRenamed("id", "dst"), "dst")
                   .groupBy("src").agg(F.min("comp").alias("nbr_comp"))
                   .withColumnRenamed("src", "id"))
        # labels only ever DECREASE (elementwise min), so "changed" is
        # exactly the rows where the neighbor min undercut the current
        # label — carry that flag through the checkpoint and sum it from
        # the materialized frame, instead of the historical separate
        # old-vs-new shuffle JOIN per round (r9, guide §2.4: one join +
        # one agg per round, convergence test for free off the
        # checkpointed rows).
        new_labels = (labels.join(nbr_min, "id", "left")
                      .select("id",
                              F.least(F.col("comp"),
                                      F.coalesce("nbr_comp", "comp"))
                               .alias("comp"),
                              (F.coalesce("nbr_comp", "comp") < F.col("comp"))
                               .cast("long").alias("__changed"))
                      .localCheckpoint())
        changed = new_labels.agg(F.sum("__changed")).collect()[0][0]
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("comp").alias("group_id"))


def _driver_components(edges: DataFrame) -> DataFrame:
    """Bounded driver-side union-find over a materialized (src, dst) edge
    frame (caller enforces the size cap).  Returns the same (id, group_id
    = min member id) frame the distributed label loop converges to; ids
    of any orderable type (Python's str comparison is code-point order =
    Spark's UTF-8 binary order, int is int)."""
    import pyspark.sql.types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in edges.collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    roots = {x: find(x) for x in parent}
    for x, r in roots.items():
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    id_type = edges.schema["src"].dataType
    schema = T.StructType([T.StructField("id", id_type),
                           T.StructField("group_id", id_type)])
    rows = [(x, comp_min[r]) for x, r in roots.items()]
    return edges.sparkSession.createDataFrame(rows, schema)


def dedup_by_groups(df: DataFrame, groups: DataFrame, id_col: str,
                    keep_by: str | None = None) -> DataFrame:
    """Keep one representative row per near-dup group; rows that appear
    in no group (singletons) are kept as-is.

    Default representative: the min-id member (id-only joins — the wide
    text column never shuffles).  `keep_by=<column of df>` keeps the
    member with the HIGHEST value of that NUMERIC score column instead
    (ties: lowest id, via min_by on a (negated-score, id) struct — the
    id itself is never negated, so string/UUID ids work) — the 'keep
    the best-quality copy' policy; that variant joins the score column
    (still never the text) into the group frame and picks with one
    min_by aggregate."""
    if keep_by is None:
        losers = groups.filter(F.col("id") != F.col("group_id")).select("id")
        return df.join(losers.withColumnRenamed("id", id_col), id_col,
                       "anti")
    score_type = dict(df.dtypes).get(keep_by, "")
    if score_type.split("(")[0] not in (
            "tinyint", "smallint", "int", "bigint", "float", "double",
            "decimal"):
        raise ValueError(
            f"dedup_by_groups: keep_by column {keep_by!r} has type "
            f"{score_type or '<missing>'}; keep_by must be a numeric "
            "score column (highest wins)")
    scored = (groups
              .join(df.select(F.col(id_col).alias("id"),
                              F.col(keep_by).alias("__score")), "id")
              .groupBy("group_id")
              .agg(F.min_by(
                  "id",
                  F.struct((-F.col("__score")).alias("s"),
                           F.col("id").alias("i"))).alias("__keep")))
    losers = (groups.join(scored, "group_id")
                    .filter(F.col("id") != F.col("__keep"))
                    .select("id"))
    return df.join(losers.withColumnRenamed("id", id_col), id_col, "anti")


def dedup_against(df: DataFrame, corpus_fingerprints: DataFrame,
                  text_col: str = "text",
                  fingerprint_col: str = "fingerprint") -> DataFrame:
    """INCREMENTAL dedup: drop rows whose normalized-text fingerprint
    already exists in a prior corpus (e.g. fingerprint_dedup's output
    persisted as the corpus index, or any frame with a 64-bit
    `fingerprint` column).  One anti-join on the fingerprint — the new
    batch is typically small against a huge index, so this is the
    shuffle-on-8-bytes shape, never the text."""
    fp = F.xxhash64(normalize_text(F.col(text_col)))
    return (df.withColumn("__fp", fp)
              .join(corpus_fingerprints
                    .select(F.col(fingerprint_col).alias("__fp"))
                    .distinct(),
                    "__fp", "anti")
              .drop("__fp"))


def _positioned_grams(df, id_col, text_col, n):
    """(base, grams): base = (id, n_tokens); grams = (id, pos, gram) with
    1-based positions.

    Grams are formed ARRAY-side — posexplode of arrays_zip(toks,
    slice(toks,2,..), …, slice(toks,n,..)), then concat_ws over the
    struct fields — so the FULL token stream never shuffles.  The
    historical shape was posexplode + a per-document lead() window,
    whose exchange+sort of every token row existed only to read each
    row's n-1 successors; zipping the shifted arrays reads them before
    the explode instead.  Two guardrails, both measured:

    - the tokenization is pinned behind a pushdown/collapse barrier
      (monotonically_increasing_id guard, the similarity-family trick):
      CollapseProject would otherwise inline the regex pipeline into
      every one of the n slice references — n regex passes per document
      instead of one.  (The same inlining is why a transform(sequence)
      HOF form was rejected originally: per-GRAM regex, interpreted.)
    - arrays_zip/slice are plain codegen'd expressions, not
      CodegenFallback lambdas, so the whole stage stays compiled.

    Downstream consumers aggregate/join on exact keys (counts,
    min(struct), distinct), so gram row order/partitioning is
    result-invariant."""
    from incubator_druid_spark.pipeline.text import normalize_text, tokens

    toks = tokens(normalize_text(F.col(text_col)))
    # value-preserving non-deterministic guard: blocks CollapseProject
    # from substituting the regex pipeline into the n references below
    pinned = F.when(F.monotonically_increasing_id() >= -1, toks)
    base = df.select(F.col(id_col).alias("__id"), pinned.alias("__toks")) \
             .withColumn("__n_tokens", F.size("__toks"))
    shifted = [F.col("__toks").alias("w0")] + [
        F.slice(F.col("__toks"), k + 1,
                F.greatest(F.size("__toks") - k, F.lit(0))).alias(f"w{k}")
        for k in range(1, n)]
    tok_rows = base.select(
        "__id", "__n_tokens",
        F.posexplode(F.arrays_zip(*shifted)).alias("__pos0", "__z"))
    gram = F.concat_ws(" ", *[F.col(f"__z.w{k}") for k in range(n)])
    grams = (tok_rows
             .filter(F.col("__pos0") + n <= F.col("__n_tokens"))
             .withColumn("__g", gram)
             .select("__id", (F.col("__pos0") + 1).alias("__pos"), "__g"))
    return base.select("__id", "__n_tokens"), grams


def _widen_for_explode(df: DataFrame, by: str | None = None,
                       min_bytes: int = 0) -> DataFrame:
    """CPU-heavy operators (gram explodes, per-document regex passes)
    must not inherit a NARROW input layout (a compactly-written corpus
    can arrive as a handful of parquet splits — measured: a 500k-doc
    replica in 3 partitions ran its gram explode on 3 tasks).  Widen to
    the cluster's parallelism only when the input is narrower — a
    well-partitioned 100 TB corpus passes through untouched.

    Pass ``by`` (a unique id column) where available: hash repartition
    skips the local sort every keyless round-robin repartition pays
    (spark.sql.execution.sortBeforeRepartition — on the one fat input
    partition being widened, that sort is itself single-task) and keeps
    the row→partition mapping deterministic under task retries.

    ``min_bytes`` sets a SIZE floor below which a narrow input is left
    alone: for operators whose per-byte cost is one regex pass (not a
    gram explode), spreading a sub-64 MB input saves less single-core
    time than the exchange's fixed cost (measured: fingerprint_dedup on
    a 584 KB corpus, 0.31 s unwidened vs 0.55 s widened; the win only
    appears once single-core scan time reaches seconds).  The estimate
    is the optimizer's sizeInBytes — COMPRESSED on-disk bytes for a
    parquet scan, so the floor can represent several-fold more raw text;
    when statistics are unknown it defaults to Long.MaxValue, so the
    failure mode is "widen anyway", exactly the pre-floor behavior."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_bytes:
        try:
            # int(str(...)): the scala BigInt proxy isn't auto-converted
            # on every py4j/pyspark version, but its toString always is
            # (r10, ADVICE r9)
            est = int(str(df._jdf.queryExecution().optimizedPlan()
                          .stats().sizeInBytes()))
        except Exception:  # pragma: no cover - py4j surface drift
            est = None
        if est is not None and est < min_bytes:
            return df
    return df.repartition(target, F.col(by)) if by else \
        df.repartition(target)


def repeated_ngram_spans(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 8,
                         min_repeats: int = 2) -> DataFrame:
    """ExactSubstr-style repeated-span detection — the suffix-array
    "dedup repeated substrings" step of training-data pipelines (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better") re-expressed Spark-first over word n-grams: every n-gram
    occurring >= min_repeats times ACROSS THE CORPUS marks the token
    positions it starts, and each document reports how much of it is
    covered by corpus-repeated material.

    Returns (id, n_tokens, repeated_starts, distinct_repeated) — one row
    per input document, zeros for documents with no repeated spans.

    Scale shape (100 TB): one posexplode (the canonical x-tokens row
    multiplication every substring-dedup pays) + a per-document lead()
    window (see _positioned_grams for why not transform/slice), one
    partially-aggregated groupBy(gram) for corpus counts (map-side
    combine keeps the shuffle at distinct-gram cardinality), one shuffle
    join back on the gram key (boilerplate-heavy grams are exactly the
    AQE skew-join case — the session enables it), one per-doc aggregate.
    No driver-side state; no Python in the plan."""
    df = _widen_for_explode(df, by=id_col)
    base, grams = _positioned_grams(df, id_col, text_col, n)
    repeated = (grams.groupBy("__g")
                     .agg(F.count(F.lit(1)).alias("__total"))
                     .filter(F.col("__total") >= min_repeats)
                     .select("__g"))
    hits = (grams.join(repeated, "__g")
                 .groupBy("__id")
                 .agg(F.count(F.lit(1)).alias("repeated_starts"),
                      F.countDistinct("__g").alias("distinct_repeated")))
    return (base
            .join(hits, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.col("__n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce("repeated_starts", F.lit(0))
                     .cast("long").alias("repeated_starts"),
                    F.coalesce("distinct_repeated", F.lit(0))
                     .cast("long").alias("distinct_repeated")))


def strip_repeated_spans(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 8,
                         min_repeats: int = 2) -> DataFrame:
    """The CLEANING half of ExactSubstr dedup (Lee et al. 2022 remove
    every duplicate of a repeated span, keeping one copy): tokens covered
    by a NON-FIRST occurrence of a corpus-repeated word n-gram are
    dropped from the normalized text; the globally first occurrence
    (lowest (doc id, position)) survives.  A token covered by both a
    kept and a duplicate span is dropped (removal wins — documented,
    deterministic).

    Returns (id, clean_text, n_tokens, removed_tokens).

    Scale shape: grams via _positioned_grams (posexplode + lead window),
    the globally-first occurrence per gram is a min(struct(id, pos))
    AGGREGATE — not a row_number window: partial aggregation folds a
    boilerplate gram's millions of occurrences map-side, where a window
    would sort them all in one un-splittable partition — followed by a
    join back on the gram key (AQE skew-splittable) that drops exactly
    the first occurrence; span coverage is a bounded explode (n rows per
    duplicate start), and reassembly is a per-doc sort-aggregate — no
    Python, no driver state."""
    from incubator_druid_spark.pipeline.text import normalize_text, tokens

    df = _widen_for_explode(df, by=id_col)
    base, grams = _positioned_grams(df, id_col, text_col, n)
    firsts = (grams.groupBy("__g")
              .agg(F.count(F.lit(1)).alias("__total"),
                   F.min(F.struct("__id", "__pos")).alias("__first"))
              .filter(F.col("__total") >= min_repeats)
              .select("__g", "__first"))
    dup_starts = (grams.join(firsts, "__g")
                  .filter(~((F.col("__id") == F.col("__first.__id"))
                            & (F.col("__pos") == F.col("__first.__pos"))))
                  .select("__id", "__pos"))
    return _strip_covered_spans(df, base, dup_starts, n, id_col,
                                text_col)


def _strip_covered_spans(df, base, starts, n, id_col, text_col):
    """Shared cleaning tail: expand (id, gram-start) rows to covered
    token positions, drop those tokens, reassemble the normalized text
    per document — used by strip_repeated_spans (duplicate spans) and
    strip_contaminated_spans (eval-overlap spans)."""
    from incubator_druid_spark.pipeline.text import normalize_text, tokens

    covered = (starts
               .select("__id", F.explode(F.sequence(
                   F.col("__pos"), F.col("__pos") + (n - 1)))
                   .alias("__tok"))
               .distinct())
    toks = tokens(normalize_text(F.col(text_col)))
    tok_rows = (df.select(F.col(id_col).alias("__id"),
                          F.posexplode(toks).alias("__tok0", "__word"))
                  .withColumn("__tok", F.col("__tok0") + 1).drop("__tok0"))
    kept = (tok_rows.join(covered, ["__id", "__tok"], "left_anti")
            .groupBy("__id")
            .agg(F.concat_ws(" ", F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__tok"), F.col("__word")))),
                    lambda s: s["__word"])).alias("clean_text"),
                 F.count(F.lit(1)).alias("__kept")))
    return (base
            .join(kept, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce("clean_text", F.lit(""))
                     .alias("clean_text"),
                    F.col("__n_tokens").cast("long").alias("n_tokens"),
                    (F.col("__n_tokens") - F.coalesce("__kept", F.lit(0)))
                    .cast("long").alias("removed_tokens")))


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    sep: str = "\n\n") -> DataFrame:
    """Corpus-wide PARAGRAPH dedup (the Gopher/MassiveText granularity
    between whole-document fingerprint dedup and token-level
    ExactSubstr): split every document on ``sep``, keep only the
    globally-FIRST occurrence of each normalized paragraph (min
    (doc_id, position) — deterministic), drop later repeats anywhere
    in the corpus, and reassemble each document from its survivors.

    Returns (id, clean_text, n_paragraphs, n_dropped); documents whose
    every paragraph was dropped reassemble to ''; null text stays
    null.  Paragraphs that normalize to '' (blank/whitespace) are
    never deduped — they are structure, not content.

    Scale shape: one bounded explode; first-occurrence selection is a
    min(struct) PARTIAL AGGREGATE per fingerprint (map-side combined
    — never a row_number window over a hot boilerplate fingerprint),
    and the join back carries only the 8-byte fingerprint.  The text
    shuffles once, on doc id, for reassembly.  Fingerprints are
    xxhash64 (engine-side); the oracle compares by the normalized
    paragraph itself, so a hash collision would surface as a mismatch
    rather than hide."""
    from incubator_druid_spark.pipeline.text import normalize_text

    paras = (df.select(F.col(id_col), F.posexplode_outer(
                F.split(F.col(text_col), sep))
                .alias("__idx", "__para")))
    norm = normalize_text(F.col("__para"))
    with_fp = paras.withColumn(
        "__fp", F.when(norm != "", F.xxhash64(norm)))
    firsts = (with_fp.filter(F.col("__fp").isNotNull())
              .groupBy("__fp")
              .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                  F.col("__idx").alias("x")))
                    .alias("__first")))
    kept_flag = (F.col("__fp").isNull()
                 | ((F.col("__first.i") == F.col(id_col))
                    & (F.col("__first.x") == F.col("__idx"))))
    marked = (with_fp.join(firsts, "__fp", "left")
              .withColumn("__keep", kept_flag))
    rebuilt = (marked.groupBy(id_col).agg(
        F.concat_ws(sep, F.transform(
            F.array_sort(F.collect_list(F.when(F.col("__keep"),
                F.struct(F.col("__idx"), F.col("__para"))))),
            lambda s: s["__para"])).alias("clean_text"),
        F.count("__idx").alias("n_paragraphs"),
        F.sum((~F.col("__keep")).cast("long")).alias("n_dropped")))
    base = df.select(F.col(id_col), F.col(text_col).isNull()
                     .alias("__isnull"))
    return (base.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.when(F.col("__isnull"), F.lit(None).cast("string"))
                     .otherwise(F.coalesce("clean_text", F.lit("")))
                     .alias("clean_text"),
                    F.coalesce("n_paragraphs", F.lit(0))
                     .alias("n_paragraphs"),
                    F.coalesce("n_dropped", F.lit(0))
                     .alias("n_dropped")))
