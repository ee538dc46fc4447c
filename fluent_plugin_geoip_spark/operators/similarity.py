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
- ``ivf_topk``: inverted-file ANN — deterministic spherical k-means coarse
  quantizer (``train_ivf_centroids``, driver-side over a bounded sample),
  cell-assignment + nprobe cell probing, exact cosine re-rank. The
  data-adaptive alternative to the data-oblivious LSH tables.

Scale notes: queries are broadcast (small side); the corpus is only scanned,
never shuffled, in ``cosine_topk``; the global top-k reduces
(partitions × q × k) rows — thousands, not millions. ``lsh_topk`` and
``ivf_topk`` shuffle narrow (id, bucket/cell) rows — vectors are re-attached
only to deduplicated candidates, so embeddings never ride the blocking
exchange.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

log = logging.getLogger(__name__)


from dataclasses import dataclass


@dataclass
class CappedPairs:
    """Result of a skew-capped pair search: the verified pairs plus the
    number of over-full buckets the cap dropped (whose pairs are NOT in
    ``pairs``). Returned instead of monkey-patching an attribute onto the
    DataFrame (round-6 ADVICE: a dynamic attribute vanishes on any
    transformation and is invisible to non-Python callers).

    ``pairs`` is PERSISTED (materialized eagerly so the cap accounting is
    exact under AQE) — the caller owns releasing it via :meth:`unpersist`
    once consumed."""

    pairs: DataFrame
    dropped_buckets: int

    def unpersist(self) -> "CappedPairs":
        self.pairs.unpersist()
        return self


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
            if not len(pdf):  # empty Arrow batch → nothing to emit
                continue
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
        if len(v) == 0:  # empty Arrow batch: np.array(list(v)) is 1-D
            return pd.Series([], dtype=np.int64)
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


def lsh_buckets_all_tables(vec_col: str, planes_list: list[np.ndarray],
                           use_pandas: bool = True):
    """``array<long>`` of one bucket id per hash table, computed in ONE
    Arrow crossing: the per-table plane matrices are stacked so a single
    (batch × dim) @ (dim × tables·nbits) BLAS matmul yields every table's
    sign bits at once — vs one crossing + one matmul per table (round 4;
    the multi-table plan previously unioned per-table joins).
    ``use_pandas=False`` composes the no-Python JVM fold per table."""
    if not use_pandas:
        return F.array(*[lsh_signature_col(vec_col, p) for p in planes_list])
    nbits = planes_list[0].shape[0]
    n_tables = len(planes_list)
    stacked = np.concatenate(
        [p.astype(np.float64).T for p in planes_list], axis=1)  # dim × T·nbits
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(list(v), dtype=np.float64)
        bits = (mat @ stacked) >= 0
        b = bits.reshape(len(mat), n_tables, nbits) @ weights
        return pd.Series(list(b.astype(np.int64)))

    return buckets(F.col(vec_col))


def _table_bucket_entries(df: DataFrame, id_out: str,
                          planes_list: list[np.ndarray], vec_col: str = "vec",
                          use_pandas: bool = True) -> DataFrame:
    """Narrow (id, t, bucket) rows — ids only; vectors never enter the
    bucket shuffle (they are re-attached to the few candidates later)."""
    return (df.select(F.col("id").alias(id_out),
                      F.posexplode(lsh_buckets_all_tables(
                          vec_col, planes_list, use_pandas))
                      .alias("t", "bucket")))


def _cos_udf():
    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        am = _normalize(np.array(list(a), dtype=np.float64))
        bm = _normalize(np.array(list(b), dtype=np.float64))
        return pd.Series((am * bm).sum(axis=1))
    # cosine is deterministic in fact; marked nondeterministic so Catalyst
    # doesn't push a threshold Filter beneath the Project and evaluate the
    # UDF twice per candidate (observed: two ArrowEvalPython nodes, one
    # feeding the Filter and one the output Project)
    return cos.asNondeterministic()


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nbits: int = 8, n_tables: int = 4, seed: int = 42,
             exclude_self: bool = True,
             use_pandas_sig: bool = True,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ANY of
    ``n_tables`` hash tables; exact cosine re-rank on candidates.

    Plan shape (round 4): ONE signature crossing per side emitting all
    tables' buckets, ONE narrow (t, bucket) equi-join over id rows, then
    vectors re-attached only to the deduplicated candidates — at scale the
    bucket shuffle moves (id, t, bucket) triples, never embeddings. Recall
    improves with n_tables; cost is the per-bucket join size. Returns the
    same schema as ``cosine_topk``. Pass ``dim`` (the vector length) to
    skip the fallback one-row probe job that otherwise infers it (ArrayType
    schemas don't carry a length).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes_list = [_hyperplanes(dim, nbits, seed + 1000 * t)
                   for t in range(n_tables)]
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    csig = _table_bucket_entries(c, "cid", planes_list, use_pandas=use_pandas_sig)
    qsig = _table_bucket_entries(q, "query_id", planes_list,
                                 use_pandas=use_pandas_sig)
    cand = (qsig.join(csig, ["t", "bucket"])
            .select("query_id", "cid").dropDuplicates(["query_id", "cid"]))
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("cid"))
    cand = (cand
            .join(q.select(F.col("id").alias("query_id"),
                           F.col("vec").alias("qvec")), "query_id")
            .join(c.select(F.col("id").alias("cid"),
                           F.col("vec").alias("cvec")), "cid"))

    scored = cand.withColumn("cosine", _cos_udf()(F.col("qvec"), F.col("cvec")))
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
                         dim: int | None = None,
                         max_bucket: int | None = None
                         ) -> "DataFrame | CappedPairs":
    """Near-duplicate embedding pairs (cosine ≥ threshold) via LSH blocking.
    Pair columns: (id_a, id_b, cosine).

    Plan shape (round 4): one all-tables signature crossing, intra-bucket
    pair expansion on collected id lists (the minhash pattern — no
    vector-carrying self-join), exact cosine only on deduplicated
    candidates.

    ``max_bucket=None`` (the oracle-gated form) keeps exact blocking
    semantics, stays lazy, and returns the plain pairs DataFrame.
    ``max_bucket=N`` drops over-full buckets — at web scale a degenerate
    bucket (e.g. an all-zeros embedding cloud) would otherwise emit O(n²)
    pairs — and returns a :class:`CappedPairs` carrying the dropped-bucket
    count alongside the (eagerly materialized, persisted) pairs; the
    caller owns releasing them via ``CappedPairs.unpersist()``. Pass
    ``dim`` to skip the fallback one-row probe job that otherwise infers
    the vector length."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes_list = [_hyperplanes(dim, nbits, seed + 1000 * t)
                   for t in range(n_tables)]
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    sigs = _table_bucket_entries(base, "id", planes_list,
                                 use_pandas=use_pandas_sig)
    grouped = (sigs.groupBy("t", "bucket")
               .agg(F.collect_list("id").alias("ids"))
               .withColumn("bucket_size", F.size("ids"))
               .filter(F.col("bucket_size") > 1))
    dropped = None
    if max_bucket is not None:
        # Eager persist → count → (post-materialization) unpersist — the
        # lsh_candidate_pairs pattern. Round 5 tried a lazy Observation
        # here, but AQE's empty-relation propagation discards the
        # CollectMetrics result exactly when EVERY bucket is dropped (the
        # replanned subtree becomes a LocalTableScan before metrics
        # publish; measured: AQE on → empty metric row, AQE off →
        # dropped_buckets=1111 on the same data), i.e. the metric vanished
        # in precisely the case it must report. The eager count on the
        # cached buckets is one cheap job and is always correct.
        cached_buckets = grouped.persist()
        dropped = cached_buckets.filter(
            F.col("bucket_size") > max_bucket).count()
        if dropped:
            log.warning(
                "embedding_near_dupes: dropping %d over-full buckets "
                "(> %d ids) — pairs inside them are NOT emitted",
                dropped, max_bucket)
        grouped = cached_buckets.filter(F.col("bucket_size") <= max_bucket)
    # pair expansion as a codegen'd double explode + strict a<b filter
    # (round 9 — see dedup.lsh_candidate_pairs: the interpreted
    # flatten(transform(slice...)) form serialized a mega bucket's whole
    # quadratic expansion into one task's lambda interpreter); bucket ids
    # are unique per (t, bucket), so orientation falls out of the filter
    # and the bucket sort is gone
    pairs = (grouped
             .select(F.explode("ids").alias("a"), F.col("ids"))
             .select("a", F.explode("ids").alias("b"))
             .filter(F.col("a") < F.col("b"))
             .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
             .distinct())
    cand = (pairs
            .join(base.select(F.col("id").alias("id_a"),
                              F.col("vec").alias("vec_a")), "id_a")
            .join(base.select(F.col("id").alias("id_b"),
                              F.col("vec").alias("vec_b")), "id_b"))
    result = (cand.withColumn("cosine",
                              _cos_udf()(F.col("vec_a"), F.col("vec_b")))
              .filter(F.col("cosine") >= threshold)
              .select("id_a", "id_b", "cosine"))
    if max_bucket is not None:
        # the capped form materializes eagerly (like the other dedup ops)
        # so the bucket cache can be released before returning
        result = result.persist()
        result.count()
        cached_buckets.unpersist()
        return CappedPairs(pairs=result, dropped_buckets=dropped)
    return result


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(df: DataFrame, n_cells: int = 16,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        sample_limit: int = 512, iters: int = 5,
                        seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a bounded, id-ordered driver
    sample → (n_cells, dim) L2-normalized centroid matrix.

    The training itself never needs cross-engine restatement: like the LSH
    hyperplanes, the centroids are inlined as literals into both the Spark
    assignment and the SQL oracle, so only assignment/probe/re-rank are on
    the parity hook. At corpus scale train on a sample exactly like this —
    IVF coarse quantizers are always trained on a subset."""
    rows = (df.orderBy(id_col).limit(sample_limit).select(vec_col).collect())
    if len(rows) < n_cells:
        raise ValueError(
            f"train_ivf_centroids: sample has {len(rows)} vectors but "
            f"n_cells={n_cells}; need at least n_cells distinct seed rows — "
            f"lower n_cells or raise sample_limit")
    X = _normalize(np.array([r[0] for r in rows], dtype=np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ _normalize(C).T, axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return _normalize(C)


def _ivf_cell_udf(centroids: np.ndarray):
    """Cell id = argmax cosine vs centroids (first index wins ties — the
    same tie-break the SQL restatement's list_indexof gives). Raw dots
    suffice: per-row normalization scales every dot equally."""
    Ct = centroids.T.copy()  # (dim, n_cells)

    @F.pandas_udf(T.IntegerType())
    def cell(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=np.int32)
        mat = np.array(list(v), dtype=np.float64)
        return pd.Series(np.argmax(mat @ Ct, axis=1).astype(np.int32))

    return cell


def _ivf_probe_udf(centroids: np.ndarray, nprobe: int):
    """Top-``nprobe`` cells per query, ordered by dot DESC then index ASC
    (stable argsort — matches the oracle's row_number tie-break)."""
    Ct = centroids.T.copy()

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(list(v), dtype=np.float64)
        order = np.argsort(-(mat @ Ct), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    return probe


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 16, nprobe: int = 4,
             centroids: np.ndarray | None = None,
             seed: int = 42, exclude_self: bool = True) -> DataFrame:
    """Approximate top-k via an inverted-file index: corpus vectors live in
    their nearest-centroid cell; each query probes its ``nprobe`` nearest
    cells; exact cosine re-ranks the cell-local candidates.

    Plan shape mirrors the round-4 LSH path: one narrow assignment crossing
    per side (ids + cell only in the shuffle), vectors re-attached to
    deduplicated candidates, cosine evaluated once. vs LSH: cells adapt to
    the data distribution (k-means), so recall per candidate is typically
    higher on clustered corpora; nprobe trades recall for candidates.
    Returns (query_id, neighbor_id, cosine, rank)."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_cells, id_col, vec_col,
                                        seed=seed)
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    ccell = c.select(F.col("id").alias("cid"),
                     _ivf_cell_udf(centroids)("vec").alias("cell"))
    qcell = q.select(F.col("id").alias("query_id"),
                     F.explode(_ivf_probe_udf(centroids, nprobe)("vec"))
                     .alias("cell"))
    cand = (qcell.join(ccell, "cell")
            .select("query_id", "cid").dropDuplicates(["query_id", "cid"]))
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("cid"))
    cand = (cand
            .join(q.select(F.col("id").alias("query_id"),
                           F.col("vec").alias("qvec")), "query_id")
            .join(c.select(F.col("id").alias("cid"),
                           F.col("vec").alias("cvec")), "cid"))
    scored = cand.withColumn("cosine", _cos_udf()(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("cid").alias("neighbor_id"),
                    "cosine", "rank"))
