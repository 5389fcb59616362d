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

from hoopstat_haus_spark.operators.common import load, sorted_ids_pairs


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
    """Deterministic GAUSSIAN hyperplane: per-component md5-keyed
    Box-Muller. Gaussian normals make the hyperplane direction uniform
    on the sphere — the distribution for which the banding math's
    p_bit = 1 − θ/π is exact. (The round-≤4 generator was a linear
    congruence of (plane, j); consecutive planes were lattice-correlated,
    so r-bit buckets collapsed to a tiny value set — at 53k rows / r=14
    only ~1k distinct buckets per band materialized and 87% of banded
    rows fell in over-cap buckets. md5 keying has no cross-plane
    structure.) Pure stdlib → bit-reproducible across runs, engines,
    and numpy versions."""
    import hashlib
    import math

    vals = []
    for j in range(dim):
        d = hashlib.md5(f"lshplane:{plane}:{j}".encode()).digest()
        u1 = (int.from_bytes(d[:8], "big") + 1) / (2.0**64 + 2)
        u2 = int.from_bytes(d[8:], "big") / 2.0**64
        vals.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2))
    return vals


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Bit-string signature: sign of ⟨vec, plane_p⟩ per hyperplane.

    Pure-JVM expression — right for NARROW plans (≤ ~64 planes), where
    it stays inside codegen. Wide adaptive plans (hundreds of planes —
    :func:`plan_lsh_bands` at corpus scale) must NOT use this form:
    the nested higher-order dot folds run INTERPRETED in Spark 4 and
    the expression tree is O(planes × dim) nodes; use
    :func:`lsh_signature_udf` (one Arrow-batched GEMM) instead —
    :func:`lsh_banded_groups` picks automatically."""
    planes = [F.array(*[F.lit(v) for v in _hyperplane(dim, p)]) for p in range(n_planes)]
    # A vector whose length ≠ dim null-pads inside zip_with and folds the
    # dot to NULL; a plain otherwise('0') would then collapse EVERY
    # signature to all-zeros — one giant bucket the cap silently drops,
    # i.e. an empty result instead of an error. Guard ONCE per row (a
    # per-bit guard would double every dot fold) and raise loudly.
    err = F.raise_error(
        F.concat(
            F.lit("lsh_signature: embedding length (got "),
            F.coalesce(F.size(vec).cast("string"), F.lit("NULL")),
            F.lit(f") != plane dim {dim}, or NULL component"),
        )
    )
    ok = (F.size(vec) == F.lit(dim)) & ~F.exists(vec, lambda x: x.isNull())
    guard = F.when(ok, F.lit("")).otherwise(err)
    bits = [F.when(dot(vec, pl) > 0, F.lit("1")).otherwise(F.lit("0")) for pl in planes]
    return F.concat(guard, *bits)


# above this plane count the Arrow-GEMM signature wins over the JVM
# expression (whose nested-HOF dots run interpreted in Spark 4)
_SIG_UDF_MIN_PLANES = 64


def _band_structs(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """array<struct<band,bucket>> sliced from a MATERIALIZED signature
    column. The slices are b separate substring references to ``sig``
    (not a transform lambda embedding the signature expression): with
    the signature aliased in its own projection, CollapseProject refuses
    to inline a non-cheap expression referenced more than once, so the
    r·b-plane signature computes ONCE per row — the lambda form
    re-evaluated it per band (b× the dot-fold work; the same
    re-inline trap CLAUDE.md records for MinHash)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.substring(sig, i * rows_per_band + 1, rows_per_band).alias("bucket"),
            )
            for i in range(n_bands)
        ]
    )


def lsh_signature_udf(dim: int, n_planes: int):
    """Vectorized signature for WIDE plans: one numpy GEMM per Arrow
    batch ((batch × dim) @ (dim × planes) → sign bits → bit-string).
    Same hyperplanes as :func:`lsh_signature`; the two paths may
    disagree on a knife-edge projection (float summation order), which
    is harmless — signatures only gate CANDIDATE generation and every
    emitted pair is verified by exact cosine downstream. This is the
    sanctioned Pandas-UDF use: a dense matrix multiply the built-in
    expression language cannot express efficiently."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes_t = np.array(
        [_hyperplane(dim, p) for p in range(n_planes)], dtype=np.float64
    ).T  # dim × planes

    def sig(col):
        if col.empty:
            return pd.Series([], dtype="object")
        x = np.vstack(col.to_numpy()).astype(np.float64)
        bits = x @ planes_t > 0
        lut = np.array(["0", "1"])
        return pd.Series(["".join(lut[row.astype(int)]) for row in bits])

    sig.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(sig, "string")


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
        # signature projected once, sliced per band (see _band_structs)
        return (
            df.select(
                F.col(id_col),
                F.col(vec_col),
                lsh_signature(F.col(vec_col), dim, n_planes).alias("_sig"),
            )
            .select(
                id_col,
                vec_col,
                F.explode(_band_structs(F.col("_sig"), n_bands, rows_per_band)).alias("bb"),
            )
            .select(id_col, vec_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        )

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
    # Training sample is BOUNDED (≈256·n_lists vectors), not a corpus
    # fraction: k-means over a fixed-size deterministic sample costs the
    # same at 100 TB as at 1 GB. orderBy(xxhash64).limit plans as
    # TakeOrdered (per-partition heap, no global sort materialization)
    # and is deterministic for a fixed corpus.
    train = emb.orderBy(F.xxhash64("vec_id"), "vec_id").limit(256 * n_lists)
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


def plan_lsh_bands(
    n_rows: int,
    threshold: float = 0.93,
    max_bucket: int = 64,
    miss_prob: float = 1e-3,
    max_planes: int = 4096,
    strict: bool = False,
    bg_agree: float = 0.60,
) -> tuple[int, int]:
    """Derive (rows_per_band r, n_bands b) from corpus size and target
    recall, so the bucket cap never silently eats the corpus.

    Two forces: (1) bucket granularity must grow with N or every bucket
    exceeds ``max_bucket`` and gets DROPPED — r ≥ log(N / max_bucket) /
    log(1 / bg_agree) keeps the EXPECTED bucket size under the cap.
    ``bg_agree`` is the effective per-bit agreement probability between
    UNRELATED corpus vectors: the naive uniform-hashing rule (0.5,
    i.e. r = log2) under-plans badly in practice because bucket
    collision is E[p_bit^r] over the pair-cosine distribution, and
    Jensen's tail (the many mildly-similar pairs any real or even
    random finite-dimensional corpus has) dominates — measured on
    hash-random corpora: log2-planned r leaves 27% of banded rows in
    over-cap buckets at dim 16 / 20k rows and 97% at dim 16 / 53k.
    0.60 empirically bounds dim ≥ 16 random data and moderate
    embedding anisotropy; raise it for heavily clustered corpora.
    (2) recall at the cosine ``threshold`` must survive the finer
    buckets — with p_bit = 1 − θ/π (θ = arccos threshold), a pair
    collides in one band w.p. p_bit^r, so
    b = ⌈ln(miss_prob) / ln(1 − p_bit^r)⌉ holds
    P(miss) = (1 − p_bit^r)^b ≤ miss_prob exactly.

    r·b is capped at ``max_planes`` (signature cost is r·b dot products
    per row). The default budget of 4096 does NOT bind anywhere in the
    planner's range: the worst case (r capped at 24 — with bg_agree
    0.60 the cap binds from N ≈ 1.4e7 — at the default 0.93/1e-3
    targets) needs r·b = 24·143 = 3432 planes —
    that signature cost is the honest price of 1e-3 miss probability at
    scale, not overhead to be trimmed. Callers wanting cheaper
    signatures pass a lower ``max_planes`` explicitly and accept the
    warned miss rate; recall-gated callers pass ``strict=True`` to turn
    a binding budget into a ValueError instead of a silent recall
    hole. At the ~500-row fixture this plans (5, 10) (the round-2/3
    hand-picked (4, 8) under-bucketed by the same Jensen tail)."""
    import math
    import warnings

    if not 0.0 < bg_agree < 1.0:
        raise ValueError(
            f"bg_agree must be in (0, 1), got {bg_agree}: 1.0 makes the "
            "granularity rule divide by log(1)=0 and values above 1 "
            "silently clamp r to the minimum (the exact under-bucketing "
            "collapse the planner exists to prevent)"
        )
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"cosine threshold must be in (0, 1), got {threshold}")
    r = max(
        4,
        min(
            24,
            math.ceil(
                math.log(max(2.0, n_rows / max_bucket)) / math.log(1.0 / bg_agree)
            ),
        ),
    )
    p_bit = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    p_band = p_bit**r
    b = max(1, math.ceil(math.log(miss_prob) / math.log(1.0 - p_band)))
    if r * b > max_planes:
        capped_b = max(1, max_planes // r)
        achieved = (1.0 - p_band) ** capped_b
        msg = (
            f"plan_lsh_bands: plane budget {max_planes} caps bands at {capped_b} "
            f"(full recall needs {b}); miss probability at cosine {threshold} "
            f"is ~{achieved:.2g} (target {miss_prob:.2g}) — raise max_planes "
            "for full recall"
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
        b = capped_b
    return r, b


def _banded_rows(
    emb: DataFrame, n_planes: int, n_bands: int, dim: int = 64
) -> DataFrame:
    """(vec_id, band, bucket) — one signature computation, pre-shuffle."""
    rows_per_band = n_planes // n_bands
    if n_planes >= _SIG_UDF_MIN_PLANES:
        # wide adaptive plan: one Arrow-batched GEMM per batch — the
        # nested-HOF JVM expression runs interpreted at this width.
        # (The ArrowEvalPython node is also a collapse barrier.)
        sig_expr = lsh_signature_udf(dim, n_planes)(F.col("embedding"))
    else:
        sig_expr = lsh_signature(F.col("embedding"), dim, n_planes)
    # signature in its own projection, sliced via _band_structs: either
    # way the r·b-plane signature is computed exactly once per row
    banded = (
        emb.select("vec_id", sig_expr.alias("_sig"))
        .select(
            "vec_id",
            F.explode(_band_structs(F.col("_sig"), n_bands, rows_per_band)).alias("bb"),
        )
        .select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    return banded


def lsh_banded_groups(
    emb: DataFrame, n_planes: int, n_bands: int, dim: int = 64
) -> DataFrame:
    """(band, bucket, sorted ids) — ONE signature computation and ONE
    shuffle; both the drop-stats accounting and candidate-pair
    generation derive from this frame, so callers that need both (the
    production near-dup path) compute the r·b-plane signature once, not
    once per diagnostic."""
    return (
        _banded_rows(emb, n_planes, n_bands, dim)
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
    )


def drop_stats_from_groups(groups: DataFrame, max_bucket: int = 64) -> DataFrame:
    """One-row accounting of what the bucket cap discards:
    (n_buckets, n_dropped_buckets, rows_in_dropped, drop_frac) where
    drop_frac = banded-row fraction landing in over-cap buckets.
    Production near-dup callers run this when auto-banding so a plan
    that is silently dropping a corpus region surfaces as a warning
    instead of missing recall quietly (a bucket over the cap
    discriminates nothing — but the rows in it still deserve to be
    counted as uncovered)."""
    return _drop_stats(groups.select(F.size("ids").alias("n")), max_bucket)


def _drop_stats(per_bucket: DataFrame, max_bucket: int) -> DataFrame:
    """The one-row accounting over a (n: bucket size) frame."""
    return per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("n") > max_bucket, 1).otherwise(0)).cast("long").alias("n_dropped_buckets"),
        F.sum(F.when(F.col("n") > max_bucket, F.col("n")).otherwise(0)).cast("long").alias("rows_in_dropped"),
        F.round(
            F.sum(F.when(F.col("n") > max_bucket, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("drop_frac"),
    )


def pairs_from_groups(groups: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Candidate pairs (id1 < id2) from banded groups, bucket-CAPPED:
    DROP buckets larger than ``max_bucket`` (a hot bucket — a dense
    embedding cluster — discriminates nothing and would make a banded
    self-join quadratic) and explode pairs from each surviving id list;
    no bucket can contribute more than max_bucket²/2 pairs."""
    kept = groups.filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    pairs = kept.select(F.explode(sorted_ids_pairs("ids", "id1", "id2")).alias("p"))
    return pairs.select(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2")).distinct()


def lsh_bucket_drop_stats(
    emb: DataFrame,
    n_planes: int = 32,
    n_bands: int = 8,
    max_bucket: int = 64,
    dim: int = 64,
) -> DataFrame:
    """Standalone drop accounting (see :func:`drop_stats_from_groups`).
    Aggregates COUNTS per bucket only — no collect_list: a pathological
    over-cap bucket (the exact thing this diagnostic detects) would
    otherwise cost an O(bucket) agg buffer + sort in a pass whose whole
    output is four scalars. Callers that ALSO need candidate pairs
    should build :func:`lsh_banded_groups` once and derive both."""
    per_bucket = (
        _banded_rows(emb, n_planes, n_bands, dim)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _drop_stats(per_bucket.select("n"), max_bucket)


def lsh_candidate_pairs(
    emb: DataFrame,
    n_planes: int = 32,
    n_bands: int = 8,
    max_bucket: int = 64,
    dim: int = 64,
) -> DataFrame:
    """Hyperplane-LSH candidate pairs (id1 < id2), bucket-CAPPED.

    Same shape as ``text.dedup.minhash_lsh_candidates``: one shuffle of
    (band, bucket, vec_id); the band table never materializes twice.

    Banding math (r = n_planes/n_bands rows per band): p_bit(c) =
    1 − θ(c)/π, P(candidate) = 1 − (1 − p_bit^r)^b. Defaults r=4, b=8
    → at cosine 0.93 (θ≈21.6°, p_bit≈0.88) the miss probability is
    (1−0.60)^8 ≈ 7e-4. The bucket CAP needs bucket granularity to grow
    with corpus size — capping with too-coarse buckets silently drops
    everything; :func:`plan_lsh_bands` derives the right r (including
    the non-uniform-bucket correction) and b automatically. ``dim``
    must match the corpus's embedding length — a mismatch raises inside
    the signature expression (it can never silently empty the result)."""
    return pairs_from_groups(lsh_banded_groups(emb, n_planes, n_bands, dim), max_bucket)


def embedding_near_dups(
    spark: SparkSession, sf_dir: str, threshold: float = 0.93, inject: bool = False
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup for vector corpora):
    LSH-bucketed candidates verified by exact cosine ≥ threshold. At
    corpus scale only bucket-mates pair up, and hot buckets are capped
    (:func:`lsh_candidate_pairs`), so candidate generation stays linear.

    ``inject=True`` (driver gate ONLY) unions deterministic planted
    near-duplicates (:func:`plant_scaled_dups`) so the fixture — which
    has no natural dups — exercises the candidate→verify path
    non-vacuously; the oracle brute-forces the same planted corpus to
    prove no pair above threshold is missed AND none below sneaks in.
    Production callers get the operator's true semantics on unmodified
    data (inject defaults OFF).

    The banding plan is ADAPTIVE (:func:`plan_lsh_bands`): rows-per-band
    grows with log2(N/max_bucket) so bucket granularity tracks corpus
    size, and the band count grows to hold the miss probability at
    ``threshold`` — a fixed (32, 8) plan drops most buckets past ~1k
    vectors. The banded groups are built ONCE and localCheckpoint'd:
    the drop-stats accounting AND candidate generation both read the
    materialized frame (round 4 computed the full r·b-plane signature
    twice — once for the warn-only diagnostic, once for the pairs);
    the checkpoint blocks free themselves via the ContextCleaner when
    the result DataFrame is dropped. The drop-stats check warns if a
    significant banded-row fraction lands in over-cap buckets (e.g.
    one giant near-identical cluster), instead of discarding it
    silently. Plan changes never change RESULTS (the output is the
    exact-cosine-verified pair set; banding only affects which pairs
    become candidates, and the plan holds recall at ≤ miss_prob), so
    the driver gate's oracle is plan-independent."""
    import warnings

    emb = load(spark, sf_dir, "embeddings")
    if inject:
        emb = plant_scaled_dups(emb)
    else:
        emb = emb.select("vec_id", "embedding")
    max_bucket = 64
    # one metadata job plans everything: corpus size for the banding
    # math AND the embedding dimensionality (inferred, not assumed 64 —
    # min/max guard ragged corpora, which would otherwise null-pad
    # inside the signature)
    n, dmin, dmax = emb.agg(
        F.count(F.lit(1)), F.min(F.size("embedding")), F.max(F.size("embedding"))
    ).first()
    if dmin != dmax:
        raise ValueError(
            f"embedding_near_dups: ragged embedding lengths [{dmin}, {dmax}] — "
            "LSH needs one dimensionality"
        )
    r, b = plan_lsh_bands(n, threshold=threshold, max_bucket=max_bucket)
    groups = lsh_banded_groups(emb, n_planes=r * b, n_bands=b, dim=dmin).localCheckpoint(
        eager=False
    )
    stats = drop_stats_from_groups(groups, max_bucket).collect()[0]
    if (stats["drop_frac"] or 0.0) > 0.2:
        warnings.warn(
            f"embedding_near_dups: {stats['drop_frac']:.1%} of banded rows fall in "
            f"{stats['n_dropped_buckets']} over-cap buckets (plan r={r}, b={b}) — "
            "near-dups inside those clusters are NOT candidates; raise max_bucket "
            "or pre-split the dense cluster",
            stacklevel=2,
        )
    cand = pairs_from_groups(groups, max_bucket)
    e1 = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"))
    e2 = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"))
    return (
        cand.join(e1, "id1")
        .join(e2, "id2")
        .select("id1", "id2", F.round(cosine(F.col("e1"), F.col("e2")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy("id1", "id2")
    )


def _coverage(truth: DataFrame, cand: DataFrame) -> DataFrame:
    """(n_truth, n_missed) in ONE pass: left-join truth against the
    deduped candidate set and count the unmatched rows."""
    hit = cand.dropDuplicates(["q_id", "vec_id"]).withColumn("_hit", F.lit(1))
    return truth.join(hit, ["q_id", "vec_id"], "left").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).cast("long").alias("n_missed"),
    )


def lsh_recall_gate(spark: SparkSession, sf_dir: str, threshold: float = 0.9) -> DataFrame:
    """Driver-checked LSH recall invariant (replaces the old rows-only
    ``ann_lsh_topk`` gate): compute, IN Spark, the exact truth set
    (query, vec) pairs with cosine ≥ threshold over the planted corpus,
    then subtract the LSH candidate pairs. ``n_missed`` MUST be 0 — the
    oracle recomputes ``n_truth`` brute-force in DuckDB and pins
    ``n_missed`` to the literal 0, so LSH only has to be a superset of
    the truth set. Non-vacuous: the fixture's natural cosine ceiling is
    ≈0.51, so the truth set is exactly the planted 1.5×-scaled dups
    (cos ≈ 1.0), which positive scaling provably lands in the same LSH
    buckets as their sources. Top-k shape stays in :func:`lsh_topk`
    (pytest recall-tested)."""
    corpus = plant_scaled_dups(load(spark, sf_dir, "embeddings"), every=50)
    q = corpus.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10_000_000)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .filter(F.round(cosine(F.col("q_vec"), F.col("embedding")), 6) >= threshold)
        .select("q_id", "vec_id")
    )
    pairs = lsh_candidate_pairs(corpus, n_planes=32, n_bands=8)
    cand = pairs.select(F.col("id1").alias("q_id"), F.col("id2").alias("vec_id")).unionByName(
        pairs.select(F.col("id2").alias("q_id"), F.col("id1").alias("vec_id"))
    )
    return _coverage(truth, cand)


def ivf_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked IVF recall invariant (replaces the old rows-only
    ``ann_ivf_topk`` gate): plant IDENTICAL copies (scale 1.0 — k-means
    cell assignment is Euclidean, not scale-invariant, so only an exact
    copy provably shares its source's cell, which is in turn provably
    the query's rank-1 probe), compute the truth set (cosine rounds to
    1.0) in Spark, and verify IVF's probed candidate pairs cover it.
    Oracle recomputes ``n_truth`` in DuckDB; ``n_missed`` is pinned 0."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n_lists, n_probe = 16, 4
    corpus = plant_scaled_dups(load(spark, sf_dir, "embeddings"), every=50, scale=1.0)
    q = corpus.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10_000_000)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .filter(F.round(cosine(F.col("q_vec"), F.col("embedding")), 6) >= 1.0)
        .select("q_id", "vec_id")
    )
    feat = corpus.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    train = feat.orderBy(F.xxhash64("vec_id"), "vec_id").limit(256 * n_lists)
    model = KMeans(k=n_lists, seed=42, maxIter=10).fit(train)
    assigned = model.transform(feat).select("vec_id", F.col("prediction").alias("cell"))
    centers = [
        (i, [float(x) for x in c], float(sum(x * x for x in c)))
        for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = spark.createDataFrame(centers, schema="cell int, center array<double>, cnorm2 double")
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        "q_id",
        "cell",
        (F.col("cnorm2") - 2.0 * dot(F.col("q_vec"), F.col("center"))).alias("cdist"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = qc.withColumn("prnk", F.row_number().over(wq)).filter(F.col("prnk") <= n_probe)
    cand = assigned.join(F.broadcast(probes.select("q_id", "cell")), "cell").select(
        "q_id", "vec_id"
    )
    return _coverage(truth, cand)


def _gate_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: planted dups ON (fixture has no natural near-dups)."""
    return embedding_near_dups(spark, sf_dir, inject=True)


_COS_SQL = """
  list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""

ORACLE = {
    # Recall-invariant gates: DuckDB recomputes the truth-pair count
    # brute-force over the SAME planted corpus; n_missed is pinned to
    # the literal 0 (the LSH/IVF side only has to be a superset of the
    # truth set — computed entirely in Spark, subtracted there).
    "ann_lsh_recall": f"""
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 10000000 AS vec_id,
                 list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT)) AS embedding
          FROM embeddings WHERE vec_id % 50 = 0
        )
        SELECT COUNT(*) AS n_truth, CAST(0 AS BIGINT) AS n_missed
        FROM corpus q JOIN corpus c
          ON q.vec_id % 50 = 0 AND q.vec_id < 10000000 AND c.vec_id != q.vec_id
        WHERE ROUND({_COS_SQL}, 6) >= 0.9
    """,
    "ann_ivf_recall": f"""
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 10000000 AS vec_id,
                 list_transform(embedding, x -> CAST(x * 1.0 AS FLOAT)) AS embedding
          FROM embeddings WHERE vec_id % 50 = 0
        )
        SELECT COUNT(*) AS n_truth, CAST(0 AS BIGINT) AS n_missed
        FROM corpus q JOIN corpus c
          ON q.vec_id % 50 = 0 AND q.vec_id < 10000000 AND c.vec_id != q.vec_id
        WHERE ROUND({_COS_SQL}, 6) >= 1.0
    """,
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
    "ann_lsh_recall": lsh_recall_gate,
    "ann_ivf_recall": ivf_recall_gate,
    "dedup_embedding_cosine": _gate_embedding_near_dups,
}
