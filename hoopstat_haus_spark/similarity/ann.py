"""Similarity search over embedding columns (`array<float>`).

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus; dot products via higher-order functions
  (JVM-side left fold → bit-deterministic, oracle-matchable). The
  correctness baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  (signs of projections onto xxhash64-derived pseudo-random vectors).
  Each query only scans corpus rows sharing a bucket in at least one of
  the band tables, turning O(N·Q) into ~O(N + Q·bucket). Verified in
  pytest by recall against brute force, not by SQL oracle.

- :func:`ivf_topk` — IVF (inverted-file) ANN: k-means the corpus into
  ``n_lists`` cells (Spark ML kmeans||), assign every corpus vector to
  its cell once, and per query scan only the ``n_probe`` nearest cells
  — the classic FAISS-style IVF-Flat layout expressed as DataFrame ops.

At 100 TB the corpus side stays partitioned; only queries broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a deterministic left fold in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _queries(df: DataFrame) -> DataFrame:
    """Deterministic query subset: every 100th vector."""
    return df.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def brute_force_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = _queries(emb)
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash mix
    (closed form → reproducible across engines and runs)."""
    vals = []
    for j in range(dim):
        h = (plane * 2654435761 + j * 40503 + 12345) % 1000003
        vals.append((h / 1000003.0) * 2.0 - 1.0)
    return vals


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Bit-string signature: sign of ⟨vec, plane_p⟩ per hyperplane."""
    planes = [F.array(*[F.lit(v) for v in _hyperplane(dim, p)]) for p in range(n_planes)]
    bits = [F.when(dot(vec, pl) > 0, F.lit("1")).otherwise(F.lit("0")) for pl in planes]
    return F.concat(*bits)


def lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Banded hyperplane-LSH ANN: candidates share ≥1 signature band."""
    emb = load(spark, sf_dir, "embeddings")
    rows_per_band = n_planes // n_bands

    def banded(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        sig = lsh_signature(F.col(vec_col), dim, n_planes)
        return df.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.substring(sig, b * rows_per_band + 1, rows_per_band).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        ).select(id_col, vec_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    corpus_b = banded(emb, "vec_id", "embedding")
    q_b = banded(_queries(emb), "q_id", "q_vec")
    cand = (
        corpus_b.join(F.broadcast(q_b), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_vec", "vec_id", "embedding")
        .distinct()
    )
    scored = cand.select(
        "q_id", "vec_id", F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).orderBy("q_id", "rnk")


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-Flat ANN: train a coarse quantizer (k-means||), bucket the
    corpus by nearest centroid, and per query scan only the ``n_probe``
    closest cells — O(N·n_probe/n_lists) scored pairs instead of O(N·Q).

    Scale shape: the training pass fits on a deterministic sample; cell
    assignment is ONE model.transform over the corpus (the assignment
    column would be persisted/bucketed in a real deployment); the
    centroid table (n_lists rows) broadcasts to pick each query's probe
    cells; the final join keys on the small int cell id, so the corpus
    is partition-pruned to probed cells before any cosine is computed.
    No SQL oracle (kmeans|| isn't ANSI); recall vs brute force is
    proven in tests/test_dedup_similarity.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    train = emb.filter(F.col("vec_id") % 3 == 0)  # deterministic sample
    model = KMeans(k=n_lists, seed=42, maxIter=10).fit(train)
    corpus = model.transform(emb).withColumnRenamed("prediction", "cell")

    centers = [
        (i, [float(x) for x in c], float(sum(x * x for x in c)))
        for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = spark.createDataFrame(
        centers, schema="cell int, center array<double>, cnorm2 double"
    )
    q = _queries(emb.select("vec_id", "embedding"))
    # each query ranks the (tiny, broadcast) centroid table → probe
    # list. Rank by the SAME metric k-means assigned with (Euclidean):
    # argmin |q−c|² = argmin (|c|² − 2·q·c), |q|² constant per query.
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        "q_id",
        "q_vec",
        "cell",
        (F.col("cnorm2") - 2.0 * dot(F.col("q_vec"), F.col("center"))).alias("cdist"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = qc.withColumn("prnk", F.row_number().over(wq)).filter(F.col("prnk") <= n_probe)

    cand = corpus.join(
        F.broadcast(probes.select("q_id", "q_vec", "cell")), "cell"
    ).filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.select(
        "q_id", "vec_id", F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).orderBy("q_id", "rnk")


def plant_scaled_dups(emb: DataFrame, every: int = 100, scale: float = 1.5) -> DataFrame:
    """Union deterministic planted near-duplicates: every ``every``-th
    vector re-enters with vec_id+10M and each component scaled by
    ``scale``. Cosine is scale-invariant, so each planted copy has
    cosine ≈ 1.0 with its source AND (positive scaling preserves the
    sign of every hyperplane projection) lands in exactly the same LSH
    buckets — the gate provably exercises the candidate→verify path
    instead of passing vacuously on a dup-free fixture."""
    planted = emb.filter(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(scale)).cast("float")).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(planted)


def embedding_near_dups(spark: SparkSession, sf_dir: str, threshold: float = 0.93) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup for vector corpora):
    LSH-bucketed candidates verified by exact cosine ≥ threshold. At
    corpus scale only bucket-mates pair up; the oracle brute-forces the
    fixture (plus planted dups, see :func:`plant_scaled_dups`) to prove
    no pair above threshold is missed AND none below sneaks in — i.e.,
    it checks recall, not just precision (possible here because at
    fixture scale brute force is exact truth; at 100 TB only the LSH
    path runs, without planting)."""
    emb = plant_scaled_dups(load(spark, sf_dir, "embeddings"))
    n_planes, n_bands = 16, 8  # r=2 rows/band → s50 ≈ very permissive, high recall
    rows_per_band = n_planes // n_bands
    sig = lsh_signature(F.col("embedding"), 64, n_planes)
    banded = emb.select(
        "vec_id",
        "embedding",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.substring(sig, b * rows_per_band + 1, rows_per_band).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("vec_id", "embedding", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.col("a.embedding").alias("e1"),
            F.col("b.embedding").alias("e2"),
        )
        .distinct()
    )
    return (
        cand.select("id1", "id2", F.round(cosine(F.col("e1"), F.col("e2")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy("id1", "id2")
    )


_COS_SQL = """
  list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""

ORACLE = {
    "ann_brute_force_topk": f"""
        SELECT q_id, vec_id, cos, rnk FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                 ROUND({_COS_SQL}, 6) AS cos,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ROUND({_COS_SQL}, 6) DESC, c.vec_id ASC) AS rnk
          FROM embeddings q JOIN embeddings c ON q.vec_id % 100 = 0 AND c.vec_id != q.vec_id
        ) WHERE rnk <= 5 ORDER BY q_id, rnk
    """,
    "dedup_embedding_cosine": f"""
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 10000000 AS vec_id,
                 list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT)) AS embedding
          FROM embeddings WHERE vec_id % 100 = 0
        )
        SELECT q.vec_id AS id1, c.vec_id AS id2, ROUND({_COS_SQL}, 6) AS cos
        FROM corpus q JOIN corpus c ON q.vec_id < c.vec_id
        WHERE ROUND({_COS_SQL}, 6) >= 0.93
        ORDER BY id1, id2
    """,
}

QUERIES = {
    "ann_brute_force_topk": brute_force_topk,
    "ann_lsh_topk": lsh_topk,
    "ann_ivf_topk": ivf_topk,
    "dedup_embedding_cosine": embedding_near_dups,
}
