"""Text embedding at corpus scale — Arrow-batched kernel with a
pluggable model.

The vector half of this package (ANN, kNN join, SemDeDup, cosine
near-dup) consumes an ``array<float>`` column; this operator PRODUCES
it from text.  Real deployments pass ``model=`` a callable
(``list[str] -> np.ndarray [n, dim]`` — a sentence-transformers
``encode``, an ONNX session, a remote batcher); the Spark-side
contract is what matters at 100 TB and is identical for every model:

  * ``mapInPandas`` over Arrow batches — the model sees a BATCH of
    texts (GPU-amortizable), never a row at a time
  * no shuffle: embedding is a projection; parallelism = input
    partitions, each worker loads the model once per executor via the
    ``model_factory`` hook (broadcast-unfriendly model weights load
    from local cache instead of riding the closure)
  * output rides the same partitioning into the ANN index builders

The DEFAULT model is a deterministic hash-projection embedding
(feature hashing into ``dim`` components: component i of a document is
the sum over tokens t of a md5-derived uniform in [-1, 1], then
L2-normalized).  It is NOT a semantic model — it exists so the
plumbing is testable end-to-end and exactly replayable in SQL (same
md5-60bit family as pipeline/score.py), and so downstream operators
have a real vector column to consume in CI.  Swap it for a learned
model in production; nothing else changes.

No counterpart in the reference engine (training-data-pipeline tier,
SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embed_text", "hash_embedding_batch"]

_SCALE = 1_000_000

#: per-worker token-vector memo, keyed by dim (crawl tokens repeat)
_TOKEN_VEC_MEMO: dict[int, dict] = {}


def hash_embedding_batch(texts: list[str], dim: int):
    """The default deterministic model: feature-hash each whitespace
    token into every component via md5(token '#' i), uniform in
    [-1, 1], summed then L2-normalized (zero vector for empty text).
    Exact contract replayed by the SQL oracle."""
    import hashlib

    import numpy as np

    memo = _TOKEN_VEC_MEMO.setdefault(dim, {})
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for r, text in enumerate(texts):
        toks = (text or "").split()
        if not toks:
            continue
        for t in toks:
            v = memo.get(t)
            if v is None:
                v = np.array([
                    (int(hashlib.md5(f"{t}#{i}".encode())
                         .hexdigest()[:15], 16) % (2 * _SCALE + 1)
                     - _SCALE) / _SCALE
                    for i in range(dim)])
                if len(memo) < 500_000:  # bounded per-worker cache
                    memo[t] = v
            out[r] += v
        n = float(np.sqrt((out[r] ** 2).sum()))
        if n > 0:
            out[r] /= n
    return out


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    model: Callable | None = None,
    model_factory: Callable[[], Callable] | None = None,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding array<double>) for every row.  ``model`` embeds a
    batch (``list[str] -> array-like [n, dim]``); ``model_factory``
    builds it lazily ONCE PER WORKER PROCESS (use for heavyweight
    models — the factory runs executor-side, so weights never ride the
    task closure).  Default: the deterministic hash projection."""
    if model is not None and model_factory is not None:
        raise ValueError("pass model or model_factory, not both")
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = model
        if fn is None:
            fn = (model_factory() if model_factory is not None
                  else lambda ts: hash_embedding_batch(ts, dim))
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({id_col: pd.Series([], dtype="object"),
                                    out_col: pd.Series([], dtype="object")})
                continue
            vecs = fn([t if t is not None else ""
                       for t in pdf[text_col]])
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                out_col: [list(map(float, v)) for v in vecs]})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, {out_col} array<double>")
