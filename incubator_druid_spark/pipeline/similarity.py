"""Similarity search over embedding columns (array<float>).

Two paths, as a production ANN system would tier them:
- brute-force cosine top-k: exact baseline.  The dot product is a zip_with/
  aggregate HOF pair — JVM-evaluated per row, no Python, no shuffle until the
  final TakeOrderedAndProject(k).
- LSH-bucketed (random hyperplane signatures): scale path.  Signature bits are
  literal-vector dot products compiled into the plan (driver-side RNG with a
  fixed seed, so plans are deterministic and executors share the planes for
  free via the serialized plan).  Candidate generation is one equi-join on
  (band, bandkey) — the same shuffle shape as the MinHash pipeline.
- embedding-cosine near-dup pairs for dedup (pipeline.dedup's vector sibling).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# Fixed-dimension unrolled variants.  Catalyst higher-order functions
# (aggregate/zip_with/transform) are CodegenFallback: every element of every
# row pays an interpreted lambda invocation, which made the dot product the
# dominant cost of every cosine operator (a dim-64 cosine evaluates ~5 HOF
# chains per row).  When the dimension is known — a literal query vector,
# trained centroids, or a head-probed corpus — the same left-to-right fold
# can be unrolled into a chain of codegen'd multiply/adds:
#   aggregate(zip_with(a,b,x*y), 0.0, acc+x)  ==  (((0.0 + a0*b0) + a1*b1)...)
# identical association order, so results are BIT-IDENTICAL to the HOF path
# (IEEE-754 doubles on both sides; same float->double coercions).  Rows whose
# array is not exactly `dim` long lazily fall back to the HOF expression, so
# ragged/null inputs keep the exact old semantics (and the unrolled branch
# can never index out of bounds — which would throw under ANSI hosts).
# ---------------------------------------------------------------------------

def _chain_sum(terms) -> Column:
    acc = F.lit(0.0)
    for t in terms:
        acc = acc + t
    return acc


def _py_norm(vec) -> float:
    """Driver-side replica of norm(_lit_vec(vec)): same left fold over the
    same float64 squares, so the literal it produces is bit-identical to
    what the JVM would have computed per row."""
    acc = 0.0
    for v in vec:
        acc = acc + float(v) * float(v)
    return math.sqrt(acc)


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    return _chain_sum([a[i] * b[i] for i in range(dim)])


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(_chain_sum([a[i] * a[i] for i in range(dim)]))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """cosine() unrolled for arrays of exactly `dim` elements; other rows
    fall back (lazily) to the HOF path."""
    d = norm_fixed(a, dim) * norm_fixed(b, dim)
    fast = F.when(d > 0, dot_fixed(a, b, dim) / d).otherwise(F.lit(0.0))
    return F.when((F.size(a) == dim) & (F.size(b) == dim), fast) \
            .otherwise(cosine(a, b))


def dot_lit(a: Column, vec) -> Column:
    """dot(a, _lit_vec(vec)) unrolled (guarded by size(a) == len(vec))."""
    dim = len(vec)
    fast = _chain_sum([a[i] * F.lit(float(v)) for i, v in enumerate(vec)])
    return F.when(F.size(a) == dim, fast).otherwise(dot(a, _lit_vec(vec)))


def cosine_lit(a: Column, vec) -> Column:
    """cosine(a, _lit_vec(vec)) unrolled: the query-side norm collapses to
    a driver-computed literal (bit-identical fold, see _py_norm)."""
    dim = len(vec)
    d = norm_fixed(a, dim) * F.lit(_py_norm(vec))
    dt = _chain_sum([a[i] * F.lit(float(v)) for i, v in enumerate(vec)])
    fast = F.when(d > 0, dt / d).otherwise(F.lit(0.0))
    return F.when(F.size(a) == dim, fast).otherwise(cosine(a, _lit_vec(vec)))


def _cosine_probed(df: DataFrame, vec_col: str):
    """A pairwise cosine builder for frames whose dimension is only known
    at runtime: one head probe picks the unrolled width; the size guard in
    cosine_fixed keeps rows of any other width on the exact HOF path."""
    head = df.select(F.size(F.col(vec_col)).alias("d")) \
             .filter(F.col("d") > 0).first()
    if head is None:
        return cosine
    dim = int(head["d"])
    return lambda a, b: cosine_fixed(a, b, dim)


def cosine_topk(df: DataFrame, query_vec, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query vector.
    Plan: scan → project(similarity) → TakeOrderedAndProject(k) — one pass,
    no shuffle of the vectors themselves."""
    sim = cosine_lit(F.col(vec_col), query_vec)
    return (df.select(F.col(id_col), sim.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col))
              .limit(k))


def knn_join(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str | None = None,
             query_vec_col: str | None = None,
             max_queries: int = 100_000) -> DataFrame:
    """Brute-force k-nearest-neighbor JOIN by cosine: the top-k corpus
    rows for EVERY query row.  Returns (q_id, rank, c_id, cosine), rank
    1-based, ties broken by ascending corpus id.

    Scale shape (100 TB corpus × bounded query set): the query matrix is
    collected once (guarded by `max_queries` — queries are the SMALL
    side by contract; refuse loudly rather than silently collect a
    corpus) and shipped to executors inside an Arrow `mapInPandas`
    kernel that runs one float64 GEMM per corpus batch and emits only
    its batch-local top-k per query — the shuffle carries
    |Q| × partitions × k candidate rows, never the |Q| × |C| cross
    product a crossJoin+window would materialize.  The final per-query
    rank is a window over that bounded candidate set.  (numpy GEMM here
    for the same reason as the minhash kernel: element-wise Catalyst
    HOFs are CodegenFallback and an order of magnitude slower than one
    BLAS call per batch.)"""
    import pandas as pd

    qid_col = query_id_col or id_col
    qvec_col = query_vec_col or vec_col
    # null vectors would turn the numpy matrices into object arrays and
    # crash the GEMM — rows without an embedding simply don't participate
    qrows = (queries.select(qid_col, qvec_col)
             .filter(F.col(qvec_col).isNotNull())
             .limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_join collected more than max_queries={max_queries} query "
            "rows; the query side must be the small one — swap the inputs "
            "or raise max_queries explicitly")
    if not qrows:
        raise ValueError("knn_join: empty query set")
    q_ids = [r[0] for r in qrows]
    if len(set(q_ids)) != len(q_ids):
        # the final rank window partitions by q_id alone, so duplicate
        # query ids with different vectors would interleave into one
        # meaningless top-k — refuse instead of silently merging
        raise ValueError(
            "knn_join: duplicate query ids in the query frame; each query "
            "row must carry a distinct id (dedup the query side first)")
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qm = qm / np.where(qn > 0, qn, 1.0)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["__cid"].to_numpy()
            cm = np.array(list(pdf["__cvec"]), dtype=np.float64)
            cn = np.linalg.norm(cm, axis=1, keepdims=True)
            cm = cm / np.where(cn > 0, cn, 1.0)
            sims = qm @ cm.T  # (|Q|, batch)
            kk = min(k, sims.shape[1])
            out_q, out_c, out_s = [], [], []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                # exact (cosine desc, id asc) order incl. boundary ties
                order = np.lexsort((ids, -row))[:kk]
                out_q.extend([q_ids[qi]] * kk)
                out_c.extend(ids[order])
                out_s.extend(row[order])
            yield pd.DataFrame({"q_id": out_q, "c_id": out_c,
                                "cosine": out_s})

    q_id_type = queries.schema[qid_col].dataType.simpleString()
    c_id_type = corpus.schema[id_col].dataType.simpleString()
    cand = (corpus.select(F.col(id_col).alias("__cid"),
                          F.col(vec_col).cast("array<double>")
                           .alias("__cvec"))
            .filter(F.col("__cvec").isNotNull())
            .mapInPandas(kernel,
                         schema=(f"q_id {q_id_type}, c_id {c_id_type}, "
                                 "cosine double")))
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "c_id")
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k)
                .select("q_id", "rank", "c_id", "cosine"))


def hyperplane_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """LSH signature: one bit per hyperplane (sign of the dot product),
    packed into a long per 16-plane band below."""
    bits = [F.when(dot_lit(vec_col, p) >= 0, 1).otherwise(0) for p in planes]
    return F.array(*bits)


def ann_lsh_topk(df: DataFrame, query_vec, k: int = 10, num_planes: int = 16,
                 bands: int = 4, seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id", probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH prefilter, exact re-rank.

    Rows whose signature matches the query's in ≥1 band are candidates
    (multi-probe within `probe_hamming` on the query side could be added by
    enumerating neighbor signatures; at probe_hamming=1 we accept band-exact
    matches).  At 100 TB the signature projection is computed at ingest and
    stored, making this a partition-pruned equi-join.
    """
    rng = np.random.default_rng(seed)
    dim = len(query_vec)
    planes = rng.standard_normal((num_planes, dim))
    rows = num_planes // bands

    sig = hyperplane_signature(F.col(vec_col), planes)
    qbits = [1 if float(np.dot(query_vec, p)) >= 0 else 0 for p in planes]

    with_sig = df.withColumn("__sig", sig)
    band_match = None
    for b in range(bands):
        bits = [F.col("__sig")[b * rows + r] for r in range(rows)]
        qband = qbits[b * rows:(b + 1) * rows]
        eq = None
        for bit, qb in zip(bits, qband):
            e = bit == qb
            eq = e if eq is None else eq & e
        band_match = eq if band_match is None else band_match | eq

    cands = with_sig.filter(band_match)
    sim = cosine_lit(F.col(vec_col), query_vec)
    return (cands.select(F.col(id_col), sim.alias("cosine"))
                 .orderBy(F.col("cosine").desc(), F.col(id_col))
                 .limit(k))


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (max dot product against
    L2-normalized centroids ≈ max cosine).  The centroid dots are literal-
    vector expressions, so assignment is a scan-side projection — at ingest
    time this materializes the IVF cluster id as a partition/bucket column."""
    dots = [dot_lit(F.col(vec_col), c) for c in centroids]
    scores = F.array(*dots)
    cluster = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return df.withColumn("__ivf", cluster)


def train_ivf_centroids(df: DataFrame, n_clusters: int = 16, sample: int = 2048,
                        iters: int = 8, seed: int = 42,
                        vec_col: str = "embedding",
                        sample_fraction: float = 0.05) -> np.ndarray:
    """Driver-side mini k-means on a sample — the coarse quantizer.  The
    sample is bounded (default 2048 vectors) so training cost is independent
    of table size; at 100 TB you train once and persist the centroids.

    Sampling is a seeded Bernoulli ``df.sample`` (per-row coin flips inside
    each scanned partition) followed by ``limit``: a bare ``limit(sample)``
    would take the head of the first partition — one time/source slice, so
    centroids would be trained on a single skewed region of the corpus.  The
    sample+limit read touches ~sample/fraction rows spread across partitions;
    on clustered/sorted tables lower ``sample_fraction`` (or pass a
    pre-sampled frame) to widen the spread further."""
    rows = (df.select(vec_col)
              .sample(withReplacement=False, fraction=sample_fraction, seed=seed)
              .limit(sample).collect())
    if len(rows) < max(n_clusters, 64):
        # tiny table (or fraction too small): the plain head is the whole set
        rows = df.select(vec_col).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ann_ivf_topk(df: DataFrame, query_vec, k: int = 10, n_clusters: int = 16,
                 nprobe: int = 4, seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k: probe the `nprobe` centroids nearest the query,
    exact-rerank within those clusters only.  With the cluster id stored as a
    partition column the filter becomes partition pruning — the scale path
    reads nprobe/n_clusters of the data."""
    if centroids is None:
        centroids = train_ivf_centroids(df, n_clusters, seed=seed,
                                        vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:nprobe].tolist()

    assigned = ivf_assign(df, centroids, vec_col)
    cands = assigned.filter(F.col("__ivf").isin(probe))
    sim = cosine_lit(F.col(vec_col), query_vec)
    return (cands.select(F.col(id_col), sim.alias("cosine"))
                 .orderBy(F.col("cosine").desc(), F.col(id_col))
                 .limit(k))


def write_ivf_index(df: DataFrame, path: str, centroids: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Materialize the IVF layout: one partition directory per cluster.
    At 100 TB this is the index build — done once, queries then touch only
    nprobe/n_clusters of the files."""
    (ivf_assign(df, centroids, vec_col)
     .write.mode("overwrite").partitionBy("__ivf").parquet(path))


def ann_ivf_topk_indexed(spark, path: str, query_vec, centroids: np.ndarray,
                         k: int = 10, nprobe: int = 4,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """Query a written IVF index: the cluster filter is a PARTITION filter —
    Spark opens only the probed directories (verified in tests via the
    physical plan)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = [int(c) for c in np.argsort(-(centroids @ qn))[:nprobe]]
    df = spark.read.parquet(path).filter(F.col("__ivf").isin(probe))
    sim = cosine_lit(F.col(vec_col), query_vec)
    return (df.select(F.col(id_col), sim.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col))
              .limit(k))


def cosine_near_dup_exact(df: DataFrame, threshold: float = 0.95,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Exact all-pairs near-dup: every (id_a < id_b) pair with cosine ≥
    threshold.  O(n²) dot products — this is the oracle/verifier for the
    LSH path (embedding_near_dup_pairs), and the right tool only for small
    or pre-bucketed slices; at corpus scale use the LSH variant whose
    bucket join prunes the pair space."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = _cosine_probed(df, vec_col)(F.col("va"), F.col("vb"))
    return (j.select("id_a", "id_b", sim.alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def semdedup(df: DataFrame, centroids: np.ndarray, threshold: float = 0.95,
             vec_col: str = "embedding", id_col: str = "vec_id",
             keep_by: str | None = None,
             max_cluster: int = 100_000) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (Abbas et al. 2023,
    arXiv:2303.09540): semantic duplicates are found WITHIN coarse
    clusters only, so the pair space is Σ_c n_c² instead of n².

    Composition of the existing primitives — nothing novel happens here,
    which is the point:
      1. `ivf_assign` each vector to its nearest centroid (scan-side
         literal-vector projection; at ingest this is the partition
         column).
      2. Within each cluster, exact cosine pairs >= threshold (the
         bounded use of the all-pairs shape — see max_cluster below).
      3. `connected_components` over the pair graph.
      4. `dedup_by_groups` keeps one representative per component
         (min id, or the best `keep_by` score).

    Returns the surviving rows of `df` (all original columns).

    Scale contract: the within-cluster join is quadratic in the cluster
    size, so the cap REFUSES clusters larger than `max_cluster` rather
    than silently running an n² join — raise `n_clusters` when training
    the centroids (SemDeDup uses k on the order of sqrt(n), keeping
    E[n_c²] ~ n).  The cluster-size scan is one tiny aggregate
    (n_clusters rows collected, not data)."""
    from incubator_druid_spark.pipeline.dedup import (connected_components,
                                                      dedup_by_groups)
    assigned = ivf_assign(df, centroids, vec_col) \
        .select(F.col(id_col), F.col(vec_col), F.col("__ivf"))
    big = (assigned.groupBy("__ivf")
           .agg(F.count(F.lit(1)).alias("__n"))
           .filter(F.col("__n") > max_cluster).collect())
    if big:
        worst = max(r["__n"] for r in big)
        raise ValueError(
            f"semdedup: {len(big)} cluster(s) exceed max_cluster="
            f"{max_cluster} (largest: {worst} vectors); the within-cluster "
            "pair join is quadratic — train more centroids (raise "
            "n_clusters) or raise max_cluster explicitly")
    a = assigned.select(F.col("__ivf"), F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"))
    b = assigned.select(F.col("__ivf"), F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"))
    sim = cosine_fixed(F.col("va"), F.col("vb"), centroids.shape[1])
    pairs = (a.join(b, ["__ivf"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b", sim.alias("cosine"))
              .filter(F.col("cosine") >= threshold))
    groups = connected_components(pairs)
    return dedup_by_groups(df, groups, id_col, keep_by)


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             num_planes: int = 16, bands: int = 4,
                             seed: int = 42, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             max_bucket: int = 256) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket join on
    banded signatures, exact cosine verify ≥ threshold.
    Returns (id_a, id_b, cosine).

    Scale shape (the two things that matter at 100 TB):
    - the banded self-join carries only ``(id, band, key)`` — the embedding
      vectors (by far the heaviest column) are joined back BY ID only for the
      surviving candidate pairs, so the bands× shuffle amplification applies
      to 24 bytes/row, not the vector payload;
    - ``max_bucket`` drops buckets larger than the cap before the self-join
      (same rationale as minhash_lsh_candidates): a hot bucket — zero/dead
      embeddings, a degenerate cluster all on one side of every plane —
      otherwise emits O(bucket²) pairs.  A genuine near-dup pair still
      collides in a rarer band with high probability.
    """
    rng = np.random.default_rng(seed)
    head = df.select(F.size(F.col(vec_col))).first()
    if head is None or head[0] is None:
        # empty input (or an all-null vector head): no pairs — an
        # unguarded first()[0] would TypeError instead
        id_t = dict(df.dtypes).get(id_col, "bigint")
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_t}, id_b {id_t}, cosine double")
    dim = int(head[0])
    planes = rng.standard_normal((num_planes, dim))
    rows = num_planes // bands

    sig = hyperplane_signature(F.col(vec_col), planes)
    with_sig = df.select(F.col(id_col), sig.alias("__sig"))
    banded = with_sig.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.col("__sig")[b * rows + r].cast("string")
                                for r in range(rows)])).alias("bk"))
            for b in range(bands)
        ])).alias("bb"))
    buckets = banded.select(id_col, "bb.band", "bb.bk")
    if max_bucket:
        sizes = (buckets.groupBy("band", "bk")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket))
                 .drop("__n"))
        buckets = buckets.join(sizes, on=["band", "bk"])
    pairs = (buckets.alias("l")
             .join(buckets.alias("r"),
                   (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.bk") == F.col("r.bk"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .distinct())
    vecs = df.select(F.col(id_col), F.col(vec_col))
    withv = (pairs
             .join(vecs.select(F.col(id_col).alias("id_a"),
                               F.col(vec_col).alias("va")), "id_a")
             .join(vecs.select(F.col(id_col).alias("id_b"),
                               F.col(vec_col).alias("vb")), "id_b"))
    sim = cosine_fixed(F.col("va"), F.col("vb"), dim)
    return (withv.select("id_a", "id_b", sim.alias("cosine"))
                 .filter(F.col("cosine") >= threshold))
