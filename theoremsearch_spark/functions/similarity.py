"""Similarity search over an embedding column (`array<float>`).

  - brute-force cosine top-k: exact baseline. The query side is tiny →
    broadcast; the corpus side streams through a codegen'd
    zip_with/aggregate dot product — no Python in the row path, no
    shuffle except the final per-query top-k (TakeOrderedAndProject
    shape via window row_number over few query groups).
  - LSH-bucketed ANN (random hyperplanes): the 100 TB path. Corpus
    vectors are hashed once into sign-pattern buckets; queries
    multiprobe their own bucket plus every bucket at Hamming distance 1
    (1 + bits probes) — candidate set is ~n·(1+bits)/2^bits per query.
    Probabilistic recall ⇒ rows-only driver check; recall@10 vs
    brute_force_topk is locked by pytest
    (tests/test_similarity.py::test_ann_lsh_recall).

Replaces the reference's pgvector `<#>` scan
(/root/reference/streamlit_app.py:275,281) with Spark-native physics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from theoremsearch_spark.functions.widen import widen_small_input as _widen
from theoremsearch_spark.operators.relational import t

N_QUERY_VECS = 5
LSH_BITS = 8
PLANES_SEED = 7  # planes are a pure function of (seed, dim): stable across calls


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(F.col(b), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k of `queries` (query_id, qvec) against `emb`
    (vec_id, embedding). Queries broadcast; ties → vec_id ASC."""
    joined = _widen(emb).crossJoin(F.broadcast(queries))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(_cosine("qvec", "embedding"), 4).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def q_ann_brute_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    return brute_force_topk(emb, queries, k=10).orderBy("query_id", "rnk")


def lsh_bucket(emb_col: str, planes: np.ndarray):
    """Sign-pattern bucket id from random hyperplanes (codegen'd)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(emb_col),
                    F.array(*[F.lit(float(v)) for v in planes[i]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i in range(planes.shape[0])
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(emb: DataFrame, queries: DataFrame, dim: int, k: int = 10) -> DataFrame:
    """LSH-bucketed ANN with Hamming-1 multiprobe: each query probes its
    own bucket plus the LSH_BITS single-bit-flip neighbors (near misses
    on one hyperplane are the dominant recall loss). Each corpus vector
    lives in exactly one bucket, so a (query, vector) pair matches at
    most once — no dedup needed. At 10^12 rows the bucket column is a
    partition key — each probe touches one partition."""
    planes = np.random.default_rng(PLANES_SEED).standard_normal((LSH_BITS, dim))
    bucketed = _widen(emb).withColumn("bucket", lsh_bucket("embedding", planes))
    probes = F.explode(
        F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_BITS)],
        )
    )
    qb = queries.withColumn("qbucket", lsh_bucket("qvec", planes)).withColumn(
        "bucket", probes
    ).drop("qbucket")
    joined = bucketed.join(F.broadcast(qb), "bucket")
    scored = joined.select(
        "query_id", "vec_id", F.round(_cosine("qvec", "embedding"), 4).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def q_ann_lsh_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    queries = (
        emb.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    return ann_lsh_topk(emb, queries, dim, k=10).orderBy("query_id", "rnk")


N_CENTROIDS = 64
N_PROBE = 8
KMEANS_ITERS = 8
KMEANS_SAMPLE = 4096


def _kmeans_spherical(X: np.ndarray, k: int, iters: int = KMEANS_ITERS) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd on unit vectors, cosine =
    dot): init = stride sample of the input (reproducible, no RNG),
    assignment = argmax dot, update = renormalized mean; an emptied
    cluster keeps its previous centroid. Returns unit centroids (k, d).

    Driver-side numpy on a bounded SAMPLE — the standard IVF recipe:
    at 10^12 rows you train the coarse quantizer on ~10⁵ sampled
    vectors (constant-size work) and broadcast the centroids; the
    corpus-wide cell assignment stays a codegen'd argmax scan."""
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    stride = max(1, len(Xn) // k)
    C = Xn[::stride][:k].copy()
    for _ in range(iters):
        assign = (Xn @ C.T).argmax(axis=1)
        newC = C.copy()
        for j in range(len(C)):
            members = Xn[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    newC[j] = m / n
        if np.allclose(newC, C, atol=1e-9):
            break
        C = newC
    return C


def _dot(col, vec: "np.ndarray"):
    return F.aggregate(
        F.zip_with(
            F.col(col) if isinstance(col, str) else col,
            F.array(*[F.lit(float(v)) for v in vec]),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ann_ivf_topk(
    emb: DataFrame, queries_pdf, dim: int, k: int = 10,
    n_centroids: int = N_CENTROIDS, n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are assigned to their
    nearest centroid once (the coarse quantizer — spherical k-means
    trained driver-side on a bounded deterministic sample); each query
    probes its `n_probe` nearest centroids and scores only those cells —
    candidate fraction ≈ n_probe/n_centroids of the corpus. The cell
    column is a partition key at scale: one probe = one partition scan,
    same physics as the posting-list index.

    queries_pdf: pandas (query_id, qvec as list) — the query side is
    tiny and its probe lists are computed driver-side in numpy.
    """
    spark = emb.sparkSession
    n = emb.count()
    stride = max(1, n // min(n, KMEANS_SAMPLE))
    sample = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(KMEANS_SAMPLE)
        .select("embedding")
        .collect()
    )
    X = np.array([r["embedding"] for r in sample], dtype=np.float64)
    C = _kmeans_spherical(X, min(n_centroids, len(X)))

    # corpus assignment: one X @ C.T matmul + argmax per Arrow batch
    # (the minhash_sig_udf pattern). An earlier version built a
    # per-centroid codegen struct array and array_max'd it — fine at 16
    # centroids, but the expression tree (and codegen'd method size)
    # grows LINEARLY with n_centroids, and the thousands of cells a
    # 10^12-row corpus needs (cells-as-partitions) would blow up plan
    # size/codegen limits. The vectorized matmul is O(1) plan nodes at
    # any centroid count; centroids ship once per executor as a
    # broadcast. The vector's own norm is constant across cell scores,
    # so argmax over dot(v, unit-centroid) IS the cosine argmax — no
    # normalization needed corpus-side.
    from pyspark.sql.functions import pandas_udf

    C_bc = spark.sparkContext.broadcast(C)

    @pandas_udf("int")
    def cell_of(embs: pd.Series) -> pd.Series:
        X = np.vstack(embs.to_numpy()).astype(np.float64)
        return pd.Series((X @ C_bc.value.T).argmax(axis=1).astype(np.int32))

    cells = _widen(emb).withColumn("cell", cell_of("embedding"))

    # query probes: numpy, driver-side
    Q = np.array(list(queries_pdf["qvec"]), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Qn @ C.T
    probe_rows = [
        (int(qid), int(c))
        for qid, row in zip(queries_pdf["query_id"], sims)
        for c in np.argsort(-row)[:n_probe]
    ]
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")
    qv = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(queries_pdf["query_id"], Q)],
        "query_id long, qvec array<double>",
    )
    cand = cells.join(F.broadcast(probes.join(qv, "query_id")), "cell")
    scored_c = cand.select(
        "query_id", "vec_id", F.round(_cosine("qvec", "embedding"), 4).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored_c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def q_ann_ivf_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    qp = (
        emb.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
        .toPandas()
    )
    dim = len(qp["qvec"].iloc[0])
    return ann_ivf_topk(emb, qp, dim, k=10).orderBy("query_id", "rnk")


def build_ann_index(
    emb: DataFrame, out_dir: str,
    n_centroids: int = N_CENTROIDS,
) -> dict:
    """Persist an IVF index: corpus vectors land in parquet partitioned
    by their cell (`cell=N/` dirs), centroids + metadata in a JSON
    sidecar. This is the ANN analog of the posting-list index — at
    10^12 rows a probe must be a PARTITION-DIRECTORY read, not a
    filter over one monolithic table: `ann_ivf_search` lists only the
    probed `cell=` dirs, so IO per query batch is
    O(n_probe/n_centroids) of the corpus with zero footer reads
    outside the probed cells. The cell column is written by the same
    Arrow-batched matmul UDF as the in-memory path (one `X @ C.T`
    argmax per batch; plan size independent of centroid count)."""
    import json
    import os

    spark = emb.sparkSession
    n = emb.count()
    stride = max(1, n // min(n, KMEANS_SAMPLE))
    sample = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(KMEANS_SAMPLE)
        .select("embedding")
        .collect()
    )
    X = np.array([r["embedding"] for r in sample], dtype=np.float64)
    C = _kmeans_spherical(X, min(n_centroids, len(X)))

    from pyspark.sql.functions import pandas_udf

    C_bc = spark.sparkContext.broadcast(C)

    @pandas_udf("int")
    def cell_of(embs: pd.Series) -> pd.Series:
        Xb = np.vstack(embs.to_numpy()).astype(np.float64)
        return pd.Series((Xb @ C_bc.value.T).argmax(axis=1).astype(np.int32))

    (
        emb.withColumn("cell", cell_of("embedding"))
        .repartition("cell")  # one writer task per cell: no tiny files
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{out_dir}/cells")
    )
    meta = {
        "n_vectors": int(n),
        "n_centroids": int(C.shape[0]),
        "dim": int(C.shape[1]),
        "centroids": [[float(x) for x in row] for row in C],
    }
    tmp = f"{out_dir}/.ivf_meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, f"{out_dir}/ivf_meta.json")
    return {"n_vectors": int(n), "n_centroids": int(C.shape[0])}


def ann_ivf_search(
    spark, out_dir: str, queries_pdf, k: int = 10, n_probe: int = N_PROBE,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index (`build_ann_index`):
    per-query probe cells are computed driver-side against the stored
    centroids, and the scan reads ONLY the probed `cell=N` partition
    dirs — point-lookup physics for vectors. Scoring is the same
    codegen cosine + per-query window top-k as the in-memory path."""
    import json
    import os

    with open(f"{out_dir}/ivf_meta.json") as fh:
        meta = json.load(fh)
    C = np.array(meta["centroids"], dtype=np.float64)

    Q = np.array(list(queries_pdf["qvec"]), dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    sims = Qn @ C.T
    probe_rows = [
        (int(qid), int(c))
        for qid, row in zip(queries_pdf["query_id"], sims)
        for c in np.argsort(-row)[:n_probe]
    ]
    touched = sorted({c for _, c in probe_rows})
    paths = [
        p for c in touched
        if os.path.isdir(p := f"{out_dir}/cells/cell={c}")
    ]
    if not paths:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos double, rnk int"
        )
    # basePath keeps the cell partition column parseable from the
    # selected subdirectories
    cells = (
        spark.read.option("basePath", f"{out_dir}/cells")
        .parquet(*paths)
    )
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")
    qv = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(queries_pdf["query_id"], Q)],
        "query_id long, qvec array<double>",
    )
    cand = cells.join(F.broadcast(probes.join(qv, "query_id")), "cell")
    scored = cand.select(
        "query_id", "vec_id", F.round(_cosine("qvec", "embedding"), 4).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs among the first 50 vectors
    (exact, small block ⇒ SQL oracle)."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = F.round(
        F.aggregate(
            F.zip_with("a.embedding", "b.embedding", lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / (
            F.sqrt(F.aggregate(F.transform("a.embedding", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
            * F.sqrt(F.aggregate(F.transform("b.embedding", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
        ),
        4,
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= 0.2)
        .orderBy("vec_a", "vec_b")
    )


QUERIES = {
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_topk": q_ann_lsh_topk,  # probabilistic — rows-only check
    "ann_ivf_topk": q_ann_ivf_topk,  # probabilistic — rows-only check
    "embedding_near_dup": q_embedding_near_dup,
}

ORACLES = {
    "ann_brute_topk": f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
                   FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[])), 4) AS cos
            FROM embeddings e CROSS JOIN q),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
            FROM scored)
        SELECT query_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 10
        ORDER BY query_id, rnk
    """,
    "embedding_near_dup": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 50 AND b.vec_id < 50
          AND round(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.2
        ORDER BY vec_a, vec_b
    """,
}
