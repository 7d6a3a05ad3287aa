"""Approximate-nearest-neighbor search over embedding columns.

- `cosine_topk_bruteforce`: exact baseline — query vectors broadcast as
  literal arrays; dot/norm in zip_with+aggregate (JVM); window top-k.
- `cosine_topk_lsh`: scale path — random-hyperplane LSH buckets (same
  deterministic planes for corpus and queries) with multi-probe (flip
  each bit once) to keep recall; exact cosine re-rank inside buckets.
  At 10¹² rows the bucket join touches ~(probes/2^planes) of the corpus
  per query instead of all of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda s, z: s + z)


def _lit_vec(v) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in v])


def cosine_topk_bruteforce(
    df: DataFrame,
    queries: list[tuple],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """queries: [(qid, vector)]. Returns (qid, neighbor_id, cosine, rank).

    One pass over the corpus computes every query's scores as independent
    columns (no join, no shuffle of the corpus); the only shuffle is the
    per-query top-k window over corpus_rows × n_queries scored rows.
    """
    vec = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(_dot(vec, vec))
    scored = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(qid)).alias("qid"),
                        (
                            _dot(vec, _lit_vec(q))
                            / (norm * float(np.linalg.norm(np.asarray(q, float))))
                        ).alias("cosine"),
                    )
                    for qid, q in queries
                ]
            )
        ).alias("s"),
    ).select("neighbor_id", "s.qid", "s.cosine")
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "cosine", "rank")
    )


def _plane_buckets(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(size=(n_planes, dim))


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    iters: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Driver-side spherical k-means on a deterministic sample (the IVF
    coarse quantizer). The sample is tiny and bounded; at 10¹² rows this
    is the standard train-small/apply-everywhere pattern.

    The sample is the `sample_rows` smallest xxhash64(vector) rows — a
    deterministic, partition-UNbiased draw executed as one TakeOrdered
    job (per-partition top-k + driver merge), unlike `limit()` which
    takes whatever rows the first partitions yield. Size `n_centroids`
    ~sqrt(corpus rows) at scale so probe cells stay balanced."""
    sample = np.array(
        [
            r[0]
            for r in df.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col)))
            .limit(sample_rows)
            .collect()
        ],
        dtype=np.float64,
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True) + 1e-12
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for ci in range(len(cents)):
            members = sample[assign == ci]
            if len(members):
                v = members.sum(axis=0)
                cents[ci] = v / (np.linalg.norm(v) + 1e-12)
    return cents


def cosine_topk_ivf(
    df: DataFrame,
    queries: list[tuple],
    k: int = 10,
    n_centroids: int | str = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids=None,
) -> DataFrame:
    """IVF scale path: corpus partitioned into centroid cells once; each
    query scans only its `n_probe` nearest cells with exact cosine
    re-ranking. Cell assignment is one Arrow kernel pass; the probe join
    is a broadcast equi-join on cell id — the corpus never shuffles.

    n_centroids="auto" sizes the quantizer to ~sqrt(corpus rows)
    (clamped to [16, 4096]) — index build is O(N) anyway, so the count
    is amortized into the build.

    Pass `centroids` (array-like, one row per centroid) to skip training
    — the production pattern where the quantizer is trained once and
    reused across many query batches, and the path external audits can
    reproduce exactly (assignment is a pure argmax over fixed vectors)."""
    from ..plans.partitioning import widen_narrow_input

    df = widen_narrow_input(df)
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
    else:
        if n_centroids == "auto":
            n_centroids = int(min(4096, max(16, df.count() ** 0.5)))
        cents = train_ivf_centroids(df, n_centroids, vec_col=vec_col, seed=seed)

    def assign(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series((m @ cents.T).argmax(axis=1).astype(np.int64))

    assign_udf = F.pandas_udf(assign, "long")
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("cell", assign_udf("v"))

    spark = df.sparkSession
    qrows = []
    for qid, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        qn = qv / (np.linalg.norm(qv) + 1e-12)
        probes = np.argsort(-(qn @ cents.T))[:n_probe]
        for c in probes:
            qrows.append((int(qid), [float(x) for x in qv], int(c)))
    qdf = spark.createDataFrame(qrows, "qid long, qv array<double>, cell long")

    norm = lambda x: F.sqrt(_dot(x, x))  # noqa: E731
    scored = (
        corpus.join(F.broadcast(qdf), "cell")
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (norm("v") * norm("qv")))
        .select("qid", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_lsh(
    df: DataFrame,
    queries: list[tuple],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed variant: corpus hashed once; each query probes its own
    bucket plus all 1-bit-flip neighbors (multi-probe). The plane dim
    comes from the query vectors — no driver job against the corpus."""
    from ..plans.partitioning import widen_narrow_input

    df = widen_narrow_input(df)
    dim = len(queries[0][1])
    planes = _plane_buckets(n_planes, dim, seed)

    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        key = (((m @ planes.T) > 0) * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(key.astype(np.int64))

    bucket_udf = F.pandas_udf(bucket, "long")
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("bucket", bucket_udf("v"))

    spark = df.sparkSession
    qrows = []
    for qid, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        base = int((((qv @ planes.T) > 0) * (1 << np.arange(n_planes))).sum())
        probes = [base] + [base ^ (1 << i) for i in range(n_planes)]
        for p in probes:
            qrows.append((int(qid), [float(x) for x in qv], int(p)))
    qdf = spark.createDataFrame(qrows, "qid long, qv array<double>, bucket long")

    norm = lambda x: F.sqrt(_dot(x, x))  # noqa: E731
    scored = (
        corpus.join(F.broadcast(qdf), "bucket")
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (norm("v") * norm("qv")))
        .select("qid", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "cosine", "rank")
    )


# --- product quantization (PQ) -------------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    sample_rows: int = 2048,
    iters: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Driver-side PQ training: split dims into `m` subspaces, k-means
    (`k_codes` centroids) per subspace on the same deterministic
    TakeOrdered sample the IVF trainer uses. Returns (m, k_codes,
    dim/m) float64 codebooks.

    PQ is the memory scale path for ANN: a 64-dim float32 vector is
    256 bytes; its PQ codes are `m` small ints — at 10^12 vectors the
    difference between a corpus that fits executor memory and one that
    doesn't."""
    sample = np.array(
        [
            r[0]
            for r in df.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col)))
            .limit(sample_rows)
            .collect()
        ],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    sub = dim // m
    rng = np.random.Generator(np.random.PCG64(seed))
    books = np.zeros((m, k_codes, sub))
    for s in range(m):
        xs = sample[:, s * sub : (s + 1) * sub]
        cents = xs[rng.choice(len(xs), size=min(k_codes, len(xs)), replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(len(cents)):
                members = xs[assign == ci]
                if len(members):
                    cents[ci] = members.mean(axis=0)
        books[s, : len(cents)] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m]): per-subspace argmin-L2 code assignment
    in one Arrow kernel pass (np.argmin first-index tie rule)."""
    m, _, sub = codebooks.shape

    def kernel(vecs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.zeros((len(x), m), dtype=np.int64)
        for s in range(m):
            xs = x[:, s * sub : (s + 1) * sub]
            d2 = ((xs[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    enc = F.pandas_udf(kernel, "array<long>")
    return df.select(F.col(id_col).alias("id"), enc(F.col(vec_col)).alias("codes"))


def cosine_topk_pq(
    df: DataFrame,
    queries: list[tuple],
    k: int = 10,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k: corpus scanned as PQ
    codes only; per query a tiny (m × k_codes) lookup table of partial
    dots/norms is broadcast, and the approximate cosine is

        cos ≈ Σ_s dot(q_s, cb[s, code_s]) / (|q| · sqrt(Σ_s |cb[s, code_s]|²))

    — EXACT given the reconstruction (subspaces are disjoint
    coordinates, cross terms vanish). The scan touches m ints per
    vector, never the float vectors: at 10^12 rows the I/O drops ~16×
    vs full-precision scan; re-rank the top candidates against the true
    vectors downstream when exactness matters."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            df, m=m, k_codes=k_codes, vec_col=vec_col, seed=seed
        )
    m, k_codes, sub = codebooks.shape
    codes = pq_encode(df, codebooks, id_col, vec_col)
    spark = df.sparkSession

    rows = []
    for qid, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        qn = float(np.linalg.norm(qv))
        lut_dot = np.zeros((m, k_codes))
        for s in range(m):
            lut_dot[s] = codebooks[s] @ qv[s * sub : (s + 1) * sub]
        cb_n2 = (codebooks**2).sum(axis=2)  # (m, k_codes)
        rows.append((int(qid), qn, lut_dot, cb_n2))

    def score_factory(qid, qn, lut_dot, cb_n2):
        def kern(codes_s: pd.Series) -> pd.Series:
            c = np.array(list(codes_s), dtype=np.int64)  # (n, m)
            sidx = np.arange(m)[None, :]
            num = lut_dot[sidx, c].sum(axis=1)
            vn = np.sqrt(cb_n2[sidx, c].sum(axis=1))
            return pd.Series(num / (qn * vn + 1e-12))

        return F.pandas_udf(kern, "double")

    out = None
    for qid, qn, lut_dot, cb_n2 in rows:
        scored = codes.select(
            F.lit(qid).alias("qid"),
            F.col("id").alias("neighbor_id"),
            score_factory(qid, qn, lut_dot, cb_n2)(F.col("codes")).alias("cosine_hat"),
        )
        out = scored if out is None else out.unionByName(scored)
    w = Window.partitionBy("qid").orderBy(F.col("cosine_hat").desc(), F.col("neighbor_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "cosine_hat", "rank")
    )


def cosine_topk_ivfpq(
    df: DataFrame,
    queries: list[tuple],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ — the canonical 10^9+-vector ANN layout (FAISS IVFPQ shape,
    built from this module's own pieces): an IVF coarse quantizer prunes
    the corpus to `n_probe` cells per query, and within the probed cells
    the scan touches PQ CODES only (m small ints per vector). Per query
    the work is ~(n_probe/n_centroids) x corpus_rows x m ints — both
    the selectivity knob (n_probe/n_centroids) and the bytes-per-row
    knob (m) are explicit.

    `rerank > 0` re-scores that many ADC candidates with exact cosine
    against the float vectors (a broadcast id-join back to the corpus) —
    the standard accuracy knob; rerank=0 returns pure ADC ranks."""
    if centroids is None:
        centroids = train_ivf_centroids(df, n_centroids, vec_col=vec_col, seed=seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            df, m=m, k_codes=k_codes, vec_col=vec_col, seed=seed
        )
    m, k_codes, sub = codebooks.shape
    cents = np.asarray(centroids, dtype=np.float64)

    def assign(vecs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        return pd.Series((xn @ cents.T).argmax(axis=1).astype(np.int64))

    assign_udf = F.pandas_udf(assign, "long")
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    codes = (
        pq_encode(base.withColumn("cell", assign_udf("v")), codebooks, "id", "v")
        .join(base.select("id", assign_udf("v").alias("cell")), "id")
    )

    spark = df.sparkSession
    qcells = []
    luts = []
    for qid, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        qn_unit = qv / (np.linalg.norm(qv) + 1e-12)
        for c in np.argsort(-(qn_unit @ cents.T))[:n_probe]:
            qcells.append((int(qid), int(c)))
        lut = np.zeros((m, k_codes))
        for s in range(m):
            lut[s] = codebooks[s] @ qv[s * sub : (s + 1) * sub]
        luts.append((int(qid), float(np.linalg.norm(qv)), lut))
    qdf = spark.createDataFrame(qcells, "qid long, cell long")
    cb_n2 = (codebooks**2).sum(axis=2)

    probed = codes.join(F.broadcast(qdf), "cell")

    def kern_factory(lut, qn):
        def kern(codes_s: pd.Series) -> pd.Series:
            c = np.array(list(codes_s), dtype=np.int64)
            sidx = np.arange(m)[None, :]
            num = lut[sidx, c].sum(axis=1)
            vn = np.sqrt(cb_n2[sidx, c].sum(axis=1))
            return pd.Series(num / (qn * vn + 1e-12))

        return F.pandas_udf(kern, "double")

    out = None
    for qid, qn, lut in luts:
        part = probed.filter(F.col("qid") == qid).select(
            "qid",
            F.col("id").alias("neighbor_id"),
            kern_factory(lut, qn)(F.col("codes")).alias("cosine_hat"),
        )
        out = part if out is None else out.unionByName(part)

    w = Window.partitionBy("qid").orderBy(F.col("cosine_hat").desc(), F.col("neighbor_id"))
    adc = out.withColumn("rank", F.row_number().over(w))
    if not rerank:
        return adc.filter(F.col("rank") <= k).select(
            "qid", "neighbor_id", "cosine_hat", "rank"
        )
    cand = adc.filter(F.col("rank") <= max(k, rerank)).select("qid", "neighbor_id")
    qvecs = spark.createDataFrame(
        [(int(qid), [float(x) for x in q]) for qid, q in queries],
        "qid long, qv array<double>",
    )
    norm = lambda x: F.sqrt(_dot(x, x))  # noqa: E731
    exact = (
        cand.join(base.select(F.col("id").alias("neighbor_id"),
                              F.col("v").cast("array<double>").alias("ev")),
                  "neighbor_id")
        .join(F.broadcast(qvecs), "qid")
        .withColumn("cosine", _dot(F.col("ev"), F.col("qv")) / (norm("ev") * norm("qv")))
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "cosine", "rank")
    )
