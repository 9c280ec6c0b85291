"""Perceptual image hashing — the image modality of the dedup family
(text: minhash/simhash, embeddings: cosine banding, images: THIS).

Two classic hashes, both defined INTEGER-EXACT so an ANSI-SQL oracle can
replay the full chain from raw pixels (the same strategy as the VP8
fixture's integer IDCT):

* dHash (difference hash): area-average the grayscale image onto a 9x8
  grid and emit one bit per horizontal neighbor pair.  Box means are
  never materialized as floats — neighbor comparison cross-multiplies
  integer (sum, count) pairs, so unequal box sizes stay exact.
* pHash (DCT hash): area-average onto 32x32, separable 2-D DCT-II with
  a FIXED-POINT cosine table (round(cos((2x+1)*u*pi/64) * 2^14), int64
  matmuls — no floats anywhere), keep the low-frequency 8x8 block, bit =
  coefficient > lower-median of the 64.

Both signatures are 64-char bit STRINGS — the same representation as
pipeline/dedup.py's SimHash, so `hamming_distance` and the banded
equi-join candidate machinery are shared, not duplicated.

Scale shape: hashing is one Arrow `mapInPandas` pass over the binary
column (decode -> two int64 matmuls per image); near-dup pairs band the
64-bit signature into equal chunks and equi-join on (chunk, value) —
Hamming <= (chunks - 1) guarantees a shared chunk by pigeonhole, so the
join finds ALL qualifying pairs without an all-pairs product.  Blobs
never shuffle; only (id, signature) rows do.

Grayscale: (299*R + 587*G + 114*B) // 1000 per pixel (integer ITU-R
BT.601 weights) — chosen over the float luma used by the feature pooler
precisely for oracle replayability.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point DCT basis scale (2^14): C[u][x] = round(cos((2x+1)u*pi/64)
#: * DCT_SCALE).  int64 accumulation bound: 255 * 2^14 * 2^14 * 1024
#: terms ~ 7e16 < 2^63.
DCT_SCALE = 16384


def dct_table(n_out: int = 8, n_in: int = 32) -> list[list[int]]:
    """The (n_out x n_in) fixed-point DCT-II basis table."""
    import math
    return [[round(math.cos((2 * x + 1) * u * math.pi / (2 * n_in))
                   * DCT_SCALE)
             for x in range(n_in)]
            for u in range(n_out)]


def _area_boxes(size: int, cells: int) -> list[tuple[int, int]]:
    """Exact integer box boundaries: cell i covers
    [floor(i*size/cells), floor((i+1)*size/cells))."""
    return [(i * size // cells, (i + 1) * size // cells)
            for i in range(cells)]


def gray_int(arr) -> "object":
    """(h, w, 3) uint8 RGB -> (h, w) int64 integer grayscale."""
    import numpy as np
    a = arr.astype(np.int64)
    return (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000


def dhash64(gray) -> str:
    """64-bit dHash bit string from an integer grayscale array."""
    import numpy as np
    h, w = gray.shape
    xb = _area_boxes(w, 9)
    yb = _area_boxes(h, 8)
    sums = np.empty((8, 9), dtype=np.int64)
    cnts = np.empty((8, 9), dtype=np.int64)
    for j, (y0, y1) in enumerate(yb):
        for i, (x0, x1) in enumerate(xb):
            box = gray[y0:y1, x0:x1]
            sums[j, i] = int(box.sum())
            cnts[j, i] = box.size
    bits = []
    for j in range(8):
        for i in range(8):
            # mean(left) > mean(right), cross-multiplied (exact)
            bits.append("1" if sums[j, i] * cnts[j, i + 1]
                        > sums[j, i + 1] * cnts[j, i] else "0")
    return "".join(bits)


def phash64(gray) -> str:
    """64-bit pHash bit string from an integer grayscale array."""
    import numpy as np
    h, w = gray.shape
    xb = _area_boxes(w, 32)
    yb = _area_boxes(h, 32)
    p32 = np.empty((32, 32), dtype=np.int64)
    for j, (y0, y1) in enumerate(yb):
        for i, (x0, x1) in enumerate(xb):
            box = gray[y0:y1, x0:x1]
            p32[j, i] = int(box.sum()) // box.size
    c = np.array(dct_table(8, 32), dtype=np.int64)
    # separable integer DCT: coeff[u][v] = sum_y C[v][y] * sum_x C[u][x]*p
    coeff = c @ p32.T @ c.T   # (8, 8); [u][v] with u = x-frequency
    flat = coeff.flatten()
    med = int(np.sort(flat)[31])  # lower median of the 64
    return "".join("1" if int(v) > med else "0" for v in flat)


def image_hash_rows(df: DataFrame, content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """Hash every image blob: (id, width, height, dhash64, phash64).

    One Arrow mapInPandas pass; undecodable blobs yield no row (the
    probe-tier contract — filter-before-decode upstream if the corpus
    mixes modalities)."""
    from incubator_druid_spark.pipeline.multimodal import _decode_image

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    arr = _decode_image(bytes(blob))
                except Exception:
                    continue
                g = gray_int(arr)
                out.append({id_col: rid, "width": arr.shape[1],
                            "height": arr.shape[0],
                            "dhash64": dhash64(g), "phash64": phash64(g)})
            cols = [id_col, "width", "height", "dhash64", "phash64"]
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=(f"{id_col} {id_type}, width int, height int, "
                        "dhash64 string, phash64 string"))


def phash_near_dup_pairs(hashes: DataFrame, id_col: str = "doc_id",
                         sig_col: str = "phash64",
                         max_hamming: int = 7) -> DataFrame:
    """Near-dup image pairs where Hamming(signature) <= max_hamming,
    via the shared banded equi-join (pipeline/dedup.py
    banded_hamming_pairs) with enough chunks for completeness."""
    from incubator_druid_spark.pipeline.dedup import banded_hamming_pairs
    return banded_hamming_pairs(hashes.select(F.col(id_col),
                                              F.col(sig_col).alias("__sig")),
                                id_col, "__sig", max_hamming)
