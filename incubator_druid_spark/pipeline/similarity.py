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
    """Literal double array as ONE parsed expression.  The element-wise
    form (F.array of F.lit per element) paid one py4j round trip per
    ELEMENT at query-build time — a dim-64 plane set (16 planes) alone
    was ~1,000 driver round trips ≈ 2.5 s of build per call (guide §4:
    the Python boundary exists at plan-build time too).  CAST('<repr>'
    AS DOUBLE) round-trips every finite double exactly and constant-folds
    server-side, so the analyzed literal array is identical."""
    elems = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
    return F.expr(f"array({elems})")


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
# (IEEE-754 doubles on both sides; same float->double coercions).  Each
# operator verifies dimension uniformity ONCE per call (_all_dim) and uses
# the exact HOF expressions wholesale on ragged frames, so ragged/null
# inputs keep the exact old semantics and the unrolled chain can never
# index out of bounds (which would throw under ANSI hosts).
# ---------------------------------------------------------------------------

def _py_norm(vec) -> float:
    """Driver-side replica of norm(_lit_vec(vec)): same left fold over the
    same float64 squares, so the literal it produces is bit-identical to
    what the JVM would have computed per row."""
    acc = 0.0
    for v in vec:
        acc = acc + float(v) * float(v)
    return math.sqrt(acc)


# The unrolled expressions are built as ONE SQL string handed to F.expr:
# composing them as Python Column arithmetic costs one py4j round trip per
# node (a dim-64 cosine is ~400 nodes; 16 LSH planes are ~2000), which put
# 5-7 SECONDS of driver time into every query build.  A single parse of
# the same tree on the JVM side is milliseconds.  Literals are embedded as
# CAST('<repr>' AS DOUBLE): repr round-trips doubles exactly, the cast is
# constant-folded once by the optimizer, and it is immune to SQL decimal-
# literal parsing rules in either ANSI mode.  SQL `+` is left-associative,
# so `0.0D + t0 + t1 + ...` reproduces the HOF fold's association order
# exactly; `arr[i]` is 0-based GetArrayItem, same as the Column form.

def _dlit(x: float) -> str:
    return f"CAST('{x!r}' AS DOUBLE)"


def _dot_sql(a: str, b: str, dim: int) -> str:
    return "0.0D" + "".join(
        f" + (`{a}`[{i}] * `{b}`[{i}])" for i in range(dim))


def _dot_lit_sql(a: str, vec) -> str:
    return "0.0D" + "".join(
        f" + (`{a}`[{i}] * {_dlit(float(v))})" for i, v in enumerate(vec))


def _norm_sql(a: str, dim: int) -> str:
    return f"SQRT({_dot_sql(a, a, dim)})"


def dot_fixed(a: str, b: str, dim: int) -> Column:
    return F.expr(_dot_sql(a, b, dim))


def norm_fixed(a: str, dim: int) -> Column:
    return F.expr(_norm_sql(a, dim))


def cosine_fixed(a: str, b: str, dim: int) -> Column:
    """cosine() unrolled for arrays of exactly `dim` elements, by COLUMN
    NAME.  Callers must have verified the frame is dimension-uniform
    (`_all_dim`) — on a uniform frame this is bit-identical to cosine();
    null arrays/elements null-propagate identically (null sum → the
    `otherwise` 0.0)."""
    d = norm_fixed(a, dim) * norm_fixed(b, dim)
    return F.when(d > 0, dot_fixed(a, b, dim) / d).otherwise(F.lit(0.0))


def dot_lit(a: str, vec) -> Column:
    """dot(col a, _lit_vec(vec)) unrolled (caller checks uniformity)."""
    return F.expr(_dot_lit_sql(a, vec))


def cosine_lit(a: str, vec) -> Column:
    """cosine(col a, _lit_vec(vec)) unrolled: the query-side norm collapses
    to a driver-computed literal (bit-identical fold, see _py_norm); caller
    checks dimension uniformity."""
    d = norm_fixed(a, len(vec)) * F.lit(_py_norm(vec))
    dt = F.expr(_dot_lit_sql(a, vec))
    return F.when(d > 0, dt / d).otherwise(F.lit(0.0))


def _no_pushdown(col: Column) -> Column:
    """Value-preserving pushdown barrier: monotonically_increasing_id() is
    never negative, so the then-branch ALWAYS fires and the value is
    exactly `col` for every row — but the id marks the expression
    non-deterministic, which stops PushPredicateThroughNonJoin from
    substituting the aliased expression into a downstream filter and
    pushing it below the staging projection.  Without it the optimizer
    inlines the full unrolled chains into the filter condition (it
    substitutes aliases with no cost model — observed: a 7.6 MB generated
    class) and the stage overflows the 64 KB codegen method limit,
    silently dropping to interpreted eval after a failed compile per
    action.  (rand() is unusable here: the optimizer folds comparisons
    against rand's known [0,1) range.)"""
    return F.when(F.monotonically_increasing_id() >= -1, col)


_ALL_DIM_MEMO: dict = {}

_CHAIN_MEMO: dict = {}


def _memo_expr(spark, sql: str) -> Column:
    """Parse-once memo for the unrolled chain/staging SQL strings (r10,
    guide §1.2/§4.2): the strings are deterministic in (column, dim,
    literal vector), so re-parsing the same multi-KB expression tree on
    every query call pays a py4j round trip plus a JVM parse for nothing
    — builder-profiled at ~0.1 s per ann-family call.  Columns are
    immutable unresolved expression trees, reusable across DataFrames;
    the session is part of the key so a restarted JVM can't serve stale
    object references.  This memoizes QUERY-BUILD machinery only (never
    results): every action still computes from the parquet inputs."""
    key = (spark, sql)
    col = _CHAIN_MEMO.get(key)
    if col is None:
        if len(_CHAIN_MEMO) >= 512:  # bound driver memory under many
            _CHAIN_MEMO.clear()      # distinct query vectors
        col = F.expr(sql)
        _CHAIN_MEMO[key] = col
    return col


def _dim_memo_key(df: DataFrame, vec_col: str):
    """Session-scoped memo key for dimension-uniformity probes: the
    ANALYZED plan's semantic hash — two frames share a key only when they
    are the same computation over the same source (a different path,
    filter or schema hashes differently).  Uniformity is a metadata fact
    about a table, not a query result: without the memo every operator
    call re-scans the vector column just to re-learn the corpus dimension
    (at 100 TB, a full column scan per QUERY BUILD), where a production
    deployment treats embedding dimensionality as a schema contract.
    Same caching class as the train-once IVF centroids and Spark's own
    per-session file-listing cache — but unlike Spark's cache a stale
    verdict here silently changes VALUES (the unrolled a[i] null-fills or
    throws on now-ragged rows), so the key additionally folds in a
    file-listing snapshot (r10, VERDICT r9 #8): the full sorted path list
    plus (size, mtime) of a bounded sample.  An overwrite under the same
    path writes new part-file names (key changes → re-probe); an in-place
    byte mutation of an existing part file keeps its name but moves its
    size/mtime (caught by the stat sample).  inputFiles() reads the
    relation's already-built FileIndex, and the stat sample is bounded at
    16 files, so the key stays O(ms) at any corpus size."""
    try:
        import hashlib as _hashlib
        import os as _os
        files = sorted(df.inputFiles())
        snap = []
        for p in files[:16]:
            lp = p.split(":", 1)[1] if p.startswith("file:") else p
            try:
                st = _os.stat(lp)
                snap.append((p, st.st_size, st.st_mtime_ns))
            except OSError:
                snap.append((p, None, None))
        # digest, not the raw path tuple: a 100 TB table's path list would
        # otherwise be megabytes held alive per memo entry
        listing = _hashlib.md5(
            "\n".join(files).encode()).hexdigest()
        return (df.sparkSession,
                df._jdf.queryExecution().analyzed().semanticHash(), vec_col,
                len(files), listing, tuple(snap))
    except Exception:  # pragma: no cover - unexpected py4j surface change
        return None


def _all_dim(df: DataFrame, vec_col: str, dim: int) -> bool:
    """True iff every non-null vector in the frame has exactly `dim`
    elements — the gate for the unrolled expressions.  A per-ROW size
    guard with an inline HOF fallback was measured 4.5× slower than the
    bare unrolled chain (the tripled expression tree spills whole-stage
    codegen), so uniformity is checked ONCE per operator call with an
    early-exit limit(1) scan of size() and the plan then carries only the
    lean chain; a genuinely ragged corpus falls back to the exact HOF
    expressions wholesale.  Probes are memoized per (session, analyzed
    plan, column) — see _dim_memo_key."""
    key = _dim_memo_key(df, vec_col)
    if key is not None and key in _ALL_DIM_MEMO:
        return _ALL_DIM_MEMO[key] == dim
    out = (df.filter(F.col(vec_col).isNotNull()
                     & (F.size(F.col(vec_col)) != dim))
             .limit(1).count()) == 0
    if key is not None and out:
        _ALL_DIM_MEMO[key] = dim
    return out


def _cosine_lit_for(df: DataFrame, vec_col: str, vec) -> Column:
    """cosine against a literal query vector: unrolled when the frame is
    dimension-uniform, exact HOF otherwise."""
    if _all_dim(df, vec_col, len(vec)):
        return cosine_lit(vec_col, vec)
    return cosine(F.col(vec_col), _lit_vec(vec))


def _project_cosine_lit(df: DataFrame, vec_col: str, id_col: str, vec,
                        uniform: bool) -> DataFrame:
    """(id, cosine-vs-literal-query) projection.  The unrolled path factors
    each array element into a nanvl(x, x) column first (bit-exact identity,
    not inlineable by CollapseProject), so the norm and dot chains reference
    per-element locals: without the factoring the two dim-64 chains of raw
    GetArrayItems overflow Janino's 64 KB method limit whenever anything
    else fuses into the stage, and the stage silently drops to interpreted
    eval after a multi-second failed compile PER ACTION."""
    if not uniform:
        sim = cosine(F.col(vec_col), _lit_vec(vec))
        return df.select(F.col(id_col), sim.alias("cosine"))
    dim = len(vec)
    enames = [f"__cl_e{i}" for i in range(dim)]
    # Staging and chains go through the _memo_expr parse-once cache; the
    # strings are deterministic in (id_col, vec_col, dim, vec), so every
    # call after the first reuses the already-parsed Column trees instead
    # of re-crossing py4j and re-parsing multi-KB strings (r10; the r9
    # shape paid one selectExpr parse + two chain parses per query call)
    sess = df.sparkSession
    staged = df.select(
        F.col(id_col),
        *[_memo_expr(sess, f"nanvl(`{vec_col}`[{i}], `{vec_col}`[{i}]) AS {n}")
          for i, n in enumerate(enames)])
    norm_chain = _memo_expr(sess, "SQRT(0.0D" + "".join(
        f" + (`{n}` * `{n}`)" for n in enames) + ")")
    dot_chain = _memo_expr(sess, "0.0D" + "".join(
        f" + (`{n}` * {_dlit(float(v))})" for n, v in zip(enames, vec)))
    # dot and norm as their OWN columns: a CASE over the raw chains would
    # carry the norm chain twice (condition + divisor) and re-overflow the
    # method limit; here the CASE is three ops over two attributes.  __nrm
    # is referenced twice downstream, which also stops CollapseProject from
    # inlining the chains back into one expression.
    scored = staged.select(F.col(id_col), dot_chain.alias("__dot"),
                           norm_chain.alias("__nrm"))
    d = F.col("__nrm") * F.lit(_py_norm(vec))
    sim = F.when(d > 0, F.col("__dot") / d).otherwise(F.lit(0.0))
    return scored.select(F.col(id_col), sim.alias("cosine"))


def _uniform_dim_of(df: DataFrame, vec_col: str) -> int | None:
    """Head-probe the vector dimension and verify uniformity once; None on
    an empty or ragged frame (callers then keep the exact HOF path)."""
    key = _dim_memo_key(df, vec_col)
    if key is not None and key in _ALL_DIM_MEMO:
        return _ALL_DIM_MEMO[key]
    head = df.select(F.size(F.col(vec_col)).alias("d")) \
             .filter(F.col("d") > 0).first()
    if head is None:
        return None
    dim = int(head["d"])
    return dim if _all_dim(df, vec_col, dim) else None


def _paired_cosine(dim: int | None, va: str, vb: str,
                   na: str = "__na", nb: str = "__nb") -> Column:
    """Per-pair cosine for a join whose sides carry PRE-PROJECTED norms
    (columns `na`/`nb`, hoisted to the scan side — computing the norms
    inside the join stage tripled the expression and spilled whole-stage
    codegen past Janino's method limit, dropping the stage to interpreted
    eval).  Hoisting is pure common-subexpression factoring: the same
    norm_fixed chain evaluated on the same rows, so values are
    bit-identical to cosine().  `dim=None` = ragged frame → HOF path (no
    norm columns needed)."""
    if dim is None:
        return cosine(F.col(va), F.col(vb))
    d = F.col(na) * F.col(nb)
    return F.when(d > 0, dot_fixed(va, vb, dim) / d).otherwise(F.lit(0.0))


def cosine_topk(df: DataFrame, query_vec, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query vector.
    Plan: scan → project(similarity) → TakeOrderedAndProject(k) — one pass,
    no shuffle of the vectors themselves."""
    uniform = _all_dim(df, vec_col, len(query_vec))
    return (_project_cosine_lit(df, vec_col, id_col, query_vec, uniform)
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


def hyperplane_signature(vec_col, planes: np.ndarray,
                         unrolled: bool = False) -> Column:
    """LSH signature: one bit per hyperplane (sign of the dot product),
    packed into a long per 16-plane band below.  ``unrolled=True`` (column
    NAME input; safe only on dimension-uniform frames — callers gate on
    _all_dim) compiles each plane dot as one parsed codegen'd chain
    instead of an interpreted HOF."""
    if unrolled and isinstance(vec_col, str):
        # one parsed expression for the whole signature: per-plane
        # F.when(dot_lit(...)) Columns paid ~3 py4j round trips per plane
        # at build time; CASE WHEN parses to the identical CaseWhen tree
        cases = ", ".join(
            f"CASE WHEN ({_dot_lit_sql(vec_col, p)}) >= 0 "
            "THEN 1 ELSE 0 END" for p in planes)
        return F.expr(f"array({cases})")
    col = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    bits = [F.when(dot(col, _lit_vec(p)) >= 0, 1).otherwise(0)
            for p in planes]
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

    uniform = _all_dim(df, vec_col, dim)
    qbits = [1 if float(np.dot(query_vec, p)) >= 0 else 0 for p in planes]

    def band_match_of(bits):
        band_match = None
        for b in range(bands):
            qband = qbits[b * rows:(b + 1) * rows]
            eq = None
            for r, qb in enumerate(qband):
                e = bits[b * rows + r] == qb
                eq = e if eq is None else eq & e
            band_match = eq if band_match is None else band_match | eq
        return band_match

    # The signature FILTER stays on the HOF path deliberately: unrolling
    # the num_planes × dim band chains makes the filter condition itself
    # ~1 MB of generated code (predicate pushdown substitutes the staged
    # attributes back into the condition with no cost model), overflowing
    # the 64 KB codegen method limit so the whole stage drops to
    # interpreted eval — strictly worse than the compact interpreted HOF
    # tree.  The per-candidate exact RERANK is where the unrolled chains
    # pay off (and compile), via _project_cosine_lit.
    sig = hyperplane_signature(vec_col, planes)
    with_sig = df.withColumn("__sig", sig)
    cands = with_sig.filter(band_match_of(
        [F.col("__sig")[i] for i in range(num_planes)]))
    return (_project_cosine_lit(cands, vec_col, id_col, query_vec, uniform)
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               _uniform: bool | None = None) -> DataFrame:
    """Assign each vector to its nearest centroid (max dot product against
    L2-normalized centroids ≈ max cosine).  The centroid dots are literal-
    vector expressions, so assignment is a scan-side projection — at ingest
    time this materializes the IVF cluster id as a partition/bucket column.

    The unrolled path first factors each array element into its own column
    via nanvl(x, x) — a bit-exact identity the optimizer can neither fold
    away nor inline (it is not "cheap" to CollapseProject), so the
    n_clusters dot chains reference per-element LOCALS in the fused stage
    instead of inlining n_clusters copies of the array loads.  Without the
    factoring, 8 dim-64 chains plus a same-stage cosine overflow Janino's
    64 KB method limit and the whole stage silently drops to interpreted
    eval (observed: repeated multi-second compile failures per action)."""
    if _uniform is None:
        _uniform = _all_dim(df, vec_col, centroids.shape[1])
    if not _uniform:
        dots = [dot(F.col(vec_col), _lit_vec(c)) for c in centroids]
        scores = F.array(*dots)
        cluster = (F.array_position(scores, F.array_max(scores)) - 1) \
            .cast("int")
        return df.withColumn("__ivf", cluster)
    dim = centroids.shape[1]
    enames = [f"__ivf_e{i}" for i in range(dim)]

    def chain_sql(c):
        return "0.0D" + "".join(
            f" + (`{enames[i]}` * {_dlit(float(v))})"
            for i, v in enumerate(c))

    # scores as their own materialized column: argmax references it twice
    # (array_position + array_max), which would otherwise inline two full
    # copies of the n_clusters chains; _no_pushdown additionally stops a
    # downstream cluster filter (ann_ivf_topk's isin(probe)) from being
    # substituted below this projection and re-inflating the stage.
    # Staging and chains are parse-once _memo_expr Columns (r10): the
    # strings are deterministic in (vec_col, dim, centroid bytes), so
    # repeated assignment calls skip the per-call py4j + JVM parse cost.
    sess = df.sparkSession
    scores = _no_pushdown(_memo_expr(sess,
        "array(" + ", ".join(chain_sql(c) for c in centroids) + ")"))
    cluster = (F.array_position(F.col("__ivf_scores"),
                                F.array_max(F.col("__ivf_scores"))) - 1) \
        .cast("int")
    return (df.select(
                "*",
                *[_memo_expr(sess,
                             f"nanvl(`{vec_col}`[{i}], `{vec_col}`[{i}]) AS {n}")
                  for i, n in enumerate(enames)])
              .withColumn("__ivf_scores", scores)
              .withColumn("__ivf", cluster)
              .drop("__ivf_scores", *enames))


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

    uniform = _all_dim(df, vec_col, len(query_vec))
    assigned = ivf_assign(df, centroids, vec_col, _uniform=uniform)
    cands = assigned.filter(F.col("__ivf").isin(probe))
    return (_project_cosine_lit(cands, vec_col, id_col, query_vec, uniform)
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
    uniform = _all_dim(df, vec_col, len(query_vec))
    return (_project_cosine_lit(df, vec_col, id_col, query_vec, uniform)
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
    # spread the streamed side of the nested-loop join: a one-file input
    # otherwise computes every one of the n²/2 cosines in a single task
    dim = _uniform_dim_of(df, vec_col)
    na = [norm_fixed(vec_col, dim).alias("__na")] if dim is not None else []
    nb = [norm_fixed(vec_col, dim).alias("__nb")] if dim is not None else []
    par = df.sparkSession.sparkContext.defaultParallelism
    a = (df.repartition(par)
           .select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                   *na))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  *nb)
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = _paired_cosine(dim, "va", "vb")
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
    dim = centroids.shape[1] if _all_dim(df, vec_col,
                                         centroids.shape[1]) else None
    # localCheckpoint: the assignment subtree (k unrolled dim-wide dot
    # chains) is otherwise re-analyzed by Catalyst AND re-executed over
    # the corpus three times — once for the cluster-size guard below and
    # once per side of the within-cluster self-join (r9, guide §1.2
    # "don't compute things twice" / §5 localCheckpoint).  Materializing
    # (id, vec, cluster) once turns the guard and both join sides into
    # reads of the same narrow cached frame; measured: the giant-plan
    # driver analysis alone was seconds per action.
    assigned = (ivf_assign(df, centroids, vec_col,
                           _uniform=dim is not None)
                .select(F.col(id_col), F.col(vec_col), F.col("__ivf"))
                .localCheckpoint())
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
    if dim is not None:
        pairs = _cluster_pairs_arrow(assigned, id_col, vec_col, dim,
                                     threshold)
    else:
        a = assigned.select(F.col("__ivf"), F.col(id_col).alias("id_a"),
                            F.col(vec_col).alias("va"))
        b = assigned.select(F.col("__ivf"), F.col(id_col).alias("id_b"),
                            F.col(vec_col).alias("vb"))
        sim = _paired_cosine(None, "va", "vb")
        pairs = (a.join(b, ["__ivf"])
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b", sim.alias("cosine"))
                  .filter(F.col("cosine") >= threshold))
    groups = connected_components(pairs)
    return dedup_by_groups(df, groups, id_col, keep_by)


def _cluster_pairs_arrow(assigned: DataFrame, id_col: str, vec_col: str,
                         dim: int, threshold: float) -> DataFrame:
    """Within-cluster pairs (id_a < id_b, cosine >= threshold) as one
    Arrow `applyInPandas` kernel per cluster, replacing the historical
    within-cluster self-JOIN.

    Why (r9, guide §4.2 + §8): the join shape shuffles Σ n_c² joined
    rows each carrying TWO dim-wide vectors, then evaluates the cosine
    chain row-at-a-time — measured 15 µs/pair even whole-stage-compiled
    (the dim-64 chain splits into dozens of tiny generated methods).
    Here each cluster's vectors cross into Python ONCE (n_c rows, not
    n_c² pairs) and the pair space is evaluated as `dim` vectorized
    numpy passes over tiles; only surviving (id_a, id_b) pairs come
    back — exactly the "decide with small rows, move big rows once"
    shape of guide §8.

    BIT-EXACT by construction, not by margin: the kernel folds
    dimensions in the same left-to-right order as the SQL chain /
    Catalyst HOF path — ``acc += V[:,i] * V[:,j]`` is one IEEE-754
    float64 multiply + add per element per step, identical rounding to
    ``(((0 + a0*b0) + a1*b1) + ...)`` — and the denominator/threshold
    arithmetic is replicated operation-for-operation (norm = sqrt of
    the same fold; cosine = dot/(na*nb) only where na*nb > 0 else 0.0;
    NaN cosines fail `>=` in both engines).  Verified pairwise against
    the join path in tests/test_similarity_unrolled.py."""
    import pandas as pd

    id_type = assigned.schema[id_col].dataType.simpleString()

    def kernel(pdf: "pd.DataFrame"):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": pdf[id_col][:0],
                                 "id_b": pdf[id_col][:0]})
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        V = np.array([v if v is not None else [np.nan] * dim
                      for v in pdf[vec_col]], dtype=np.float64)
        # norms via the same left fold as the SQL chain
        acc = np.zeros(n, dtype=np.float64)
        for i in range(dim):
            acc += V[:, i] * V[:, i]
        norms = np.sqrt(acc)
        out_a, out_b = [], []
        B = 2048
        for i0 in range(0, n, B):
            i1 = min(i0 + B, n)
            Vi, ni = V[i0:i1], norms[i0:i1]
            for j0 in range(i0, n, B):
                j1 = min(j0 + B, n)
                Vj, nj = V[j0:j1], norms[j0:j1]
                dot = np.zeros((i1 - i0, j1 - j0), dtype=np.float64)
                for d in range(dim):
                    dot += Vi[:, d, None] * Vj[None, :, d]
                denom = ni[:, None] * nj[None, :]
                safe = denom > 0
                cos = np.where(
                    safe, dot / np.where(safe, denom, 1.0), 0.0)
                ai, bj = np.nonzero(cos >= threshold)
                if i0 == j0:
                    keep = ai < bj
                    ai, bj = ai[keep], bj[keep]
                if len(ai):
                    ga, gb = ids[i0 + ai], ids[j0 + bj]
                    keep = ga < gb  # duplicate ids: match the strict join
                    out_a.extend(ga[keep])
                    out_b.extend(gb[keep])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return (assigned.select("__ivf", id_col, vec_col)
            .groupBy("__ivf")
            .applyInPandas(kernel, schema=f"id_a {id_type}, id_b {id_type}"))


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

    uniform = _all_dim(df, vec_col, dim)
    # signature stays on the HOF path here: the banded explode references
    # __sig as ONE array column, and an unrolled 16-chain array overflows
    # the codegen method limit (interpreted either way, HOF is the leaner
    # tree); the expensive per-pair VERIFY below is what got unrolled.
    sig = hyperplane_signature(vec_col, planes)
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
    pdim = dim if uniform else None
    na = [norm_fixed(vec_col, dim).alias("__na")] if uniform else []
    nb = [norm_fixed(vec_col, dim).alias("__nb")] if uniform else []
    withv = (pairs
             .join(df.select(F.col(id_col).alias("id_a"),
                             F.col(vec_col).alias("va"), *na), "id_a")
             .join(df.select(F.col(id_col).alias("id_b"),
                             F.col(vec_col).alias("vb"), *nb), "id_b"))
    sim = _paired_cosine(pdim, "va", "vb")
    return (withv.select("id_a", "id_b", sim.alias("cosine"))
                 .filter(F.col("cosine") >= threshold))
