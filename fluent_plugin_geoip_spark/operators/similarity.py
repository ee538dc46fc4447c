"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force top-k — broadcast the query matrix, compute
  per-partition partial top-k with a NumPy matmul inside ``mapInPandas``
  (Arrow-batched), then a cheap global top-k. The baseline every ANN variant
  is checked against.
- ``lsh_topk``: random-hyperplane LSH — native signature (JVM dot products
  via ``F.aggregate``/``zip_with``), bucket equi-join, exact cosine re-rank
  inside buckets. The scale path: the candidate join replaces the full cross
  product with per-bucket blocks.
- ``embedding_near_dupes``: all pairs with cosine ≥ threshold via the same
  LSH bucketing (embedding near-dup dedup for training data).

Scale notes: queries are broadcast (small side); the corpus is only scanned,
never shuffled, in ``cosine_topk``; the global top-k reduces
(partitions × q × k) rows — thousands, not millions. ``lsh_topk`` shuffles
once on bucket keys, which are uniform hashes (no skew).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


# Hard cap on the driver-collected query side: the contract of cosine_topk
# is broadcast-small queries vs a scan-only corpus. 100k × 64-d float64 ≈
# 50 MB broadcast — past that the caller should flip the sides or use
# lsh_topk's join path. Failing fast beats an opaque driver OOM.
MAX_BROADCAST_QUERIES = 100_000


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True,
                max_queries: int = MAX_BROADCAST_QUERIES) -> DataFrame:
    """Exact top-k cosine neighbours for every query row.

    Returns (query_id, neighbor_id, cosine, rank). Ranks are 1-based with a
    deterministic tie-break on neighbor_id. The query side is collected and
    broadcast — guarded by ``max_queries`` (raises instead of OOMing the
    driver; the limit+collect costs no extra job).
    """
    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk broadcasts the query side on the driver; got more "
            f"than max_queries={max_queries} rows — swap corpus/queries or "
            f"use lsh_topk (bucket-join path) for large query sets")
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = _normalize(np.array([r[vec_col] for r in qrows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((qids, qmat))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def partial_topk(batches):
        qids_, qmat_ = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            sims = qmat_ @ mat.T  # (q, batch)
            kk = min(k + (1 if exclude_self else 0), sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids_, kk),
                "neighbor_id": ids[top].ravel(),
                "cosine": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(partial_topk, out_schema)
    if exclude_self:
        partial = partial.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_bucket_pandas(vec_col: str, planes: np.ndarray):
    """Arrow-batched LSH bucket id: ONE (batch × dim) @ (dim × nbits) matmul
    per batch, sign bits packed to a long. ~20× the per-bit JVM fold
    (``lsh_signature_col``) at 64 dims × 8 bits — higher-order functions
    evaluate interpreted, so 8 folds per row cost more than one BLAS call;
    the JVM variant stays as the no-Python reference and the two are pinned
    equal by a test (sign flips would need |dot| within fp rounding of 0,
    probability ~1e-12 for random real-valued vectors)."""
    pl = planes.astype(np.float64).T.copy()          # (dim, nbits)
    weights = (1 << np.arange(pl.shape[1] - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.array(list(v), dtype=np.float64)
        bits = mat @ pl >= 0
        return pd.Series((bits @ weights).astype(np.int64))

    return bucket(F.col(vec_col))


def lsh_signature_col(vec_col: str, planes: np.ndarray):
    """Native LSH bucket id: sign-bit of <v, r_j> per plane, folded to a long.
    The dot products run as JVM ``aggregate(zip_with(...))`` — no Python."""
    nbits = planes.shape[0]
    bit_cols = []
    for j in range(nbits):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x)
        bit_cols.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    sig = F.lit(0).cast("long")
    for b in bit_cols:
        sig = sig * 2 + b
    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nbits: int = 8, n_tables: int = 4, seed: int = 42,
             exclude_self: bool = True,
             use_pandas_sig: bool = True,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ANY of
    ``n_tables`` hash tables; exact cosine re-rank on candidates.

    Recall improves with n_tables; cost is the per-bucket join size. Returns
    the same schema as ``cosine_topk``. Pass ``dim`` (the vector length) to
    skip the fallback one-row probe job that otherwise infers it (ArrayType
    schemas don't carry a length).
    """
    sig = lsh_bucket_pandas if use_pandas_sig else lsh_signature_col
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, nbits, seed + 1000 * t)
        ct = c.withColumn("bucket", sig("cvec", planes))
        qt = q.withColumn("bucket", sig("qvec", planes))
        p = qt.join(ct, "bucket").select("query_id", "cid", "qvec", "cvec")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["query_id", "cid"])
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("cid"))

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = _normalize(np.array(list(a), dtype=np.float64))
        bm = _normalize(np.array(list(b), dtype=np.float64))
        return pd.Series((am * bm).sum(axis=1))

    scored = cand.withColumn("cosine", cos(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("cid").alias("neighbor_id"),
                    "cosine", "rank"))


def embedding_near_dupes(df: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         nbits: int = 8, n_tables: int = 4,
                         seed: int = 42,
                         use_pandas_sig: bool = True,
                         dim: int | None = None) -> DataFrame:
    """Near-duplicate embedding pairs (cosine ≥ threshold) via LSH blocking.
    Returns (id_a, id_b, cosine). Pass ``dim`` to skip the fallback one-row
    probe job that otherwise infers the vector length."""
    sig = lsh_bucket_pandas if use_pandas_sig else lsh_signature_col
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    pairs = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, nbits, seed + 1000 * t)
        bt = base.withColumn("bucket", sig("vec", planes))
        a = bt.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
        b = bt.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
        p = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b")) \
             .select("id_a", "id_b", "vec_a", "vec_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = _normalize(np.array(list(a), dtype=np.float64))
        bm = _normalize(np.array(list(b), dtype=np.float64))
        return pd.Series((am * bm).sum(axis=1))

    return (pairs.withColumn("cosine", cos(F.col("vec_a"), F.col("vec_b")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
