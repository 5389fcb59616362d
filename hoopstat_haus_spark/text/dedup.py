"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the reason each exists):

- **exact**: hash-groupBy on a content digest. One shuffle of (digest,
  doc_id) pairs — never the payload. At 100 TB the digest shuffle is
  ~50 B/row.
- **ngram-jaccard**: exact pairwise similarity via an inverted index
  (explode distinct shingles → posting lists → pairs per list; a
  streaming self-join only for over-cap hot lists). Quadratic OUTPUT
  in the worst case — correct baseline, not the scale path.
- **minhash-lsh**: the scale path. Signatures are computed with nested
  higher-order functions (JVM-side xxhash64 — no Python), banded, and
  candidates are found by a band-bucket join, so cost is ~linear in
  corpus size for bounded bucket sizes. Candidates are then verified
  with exact Jaccard. Banding math: P(candidate) = 1-(1-s^r)^b with
  b=8 bands × r=2 rows — s50% threshold ≈ (1/b)^(1/r) ≈ 0.35, and
  P(candidate | s=0.5) ≈ 0.90 (the old r=4 gave only 0.40 there —
  exact-verify makes extra candidates cheap, missed pairs aren't).
  16 hashes instead of 32 also halves the signature-aggregation cost,
  the dominant term of the whole query.
- **simhash**: 64-bit signature whose Hamming distance tracks cosine
  similarity of the bag-of-words; near-dup candidates share at least one
  of 4 exact-match 16-bit chunks (pigeonhole for distance ≤ 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load, sorted_ids_pairs

N_HASHES = 16
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams as an array<string>."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, k), " "),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(F.array_join(words, " "))))


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles), MATERIALIZED via lazy localCheckpoint.

    The shingle build (split → per-gram slice + array_join over every
    word) is the single most expensive expression in every dedup
    pipeline — measured 3.8 s of dedup_minhash_lsh's 16.2 s wall at
    sf0.1, and the old plan recomputed it THREE times (candidate
    generation plus both verification join sides; 8.35 s → 1.01 s for
    candidate generation alone once materialized). Checkpointing is
    the batch analog of persisting the shingle table, which a
    production near-dup pipeline keeps as a build artifact anyway;
    storage is O(corpus tokens) executor-local disk (the same order as
    one shuffle of the exploded corpus), and the blocks free
    themselves via the ContextCleaner when the result DataFrame is
    dropped.

    The raw docs are repartitioned to the session default parallelism
    FIRST: checkpoint materialization runs at the child's partitioning,
    and a small corpus in one parquet file would otherwise build every
    shingle in a single task (measured 41 s cold vs ~6 s repartitioned
    at sf0.1). One shuffle of the raw text is the price — the same
    payload volume the exploded-shingle shuffle moves anyway, and at
    scale (files ≫ cores) the repartition is a cheap no-op rebalance."""
    docs = load(spark, sf_dir, "documents")
    npart = spark.sparkContext.defaultParallelism
    d = docs.repartition(npart, "doc_id").select(
        "doc_id", word_shingles(F.col("text")).alias("shingles")
    )
    return d.localCheckpoint(eager=False)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-content digest; keeps min doc_id."""
    d = load(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        d.select(F.col("doc_id"), digest.alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")
    )


def _pair_jaccard(docs: DataFrame, hot_cap: int = 1024) -> DataFrame:
    """Inverted-index exact Jaccard over distinct word 3-grams.

    Pair generation is grouped-by-shingle (round-5 rework — 1.6×
    faster than the previous exploded self-join at sf0.1, 16.7 → 10.5 s
    interleaved best-of-3, identical results): ONE shuffle of
    (sh, doc_id) into sorted posting lists, instead of a self-join
    shuffling the exploded table twice and sort-merging it. Keys are
    the shingle STRINGS, not hashes — a hash collision would merge
    posting lists and inflate n_inter, and `exact` means exact.

    Pair EXPLOSION is split by posting-list length. A posting list in
    an agg buffer is linear (8 B/doc — a 10^6-doc list is 8 MB), but
    the flatten'd pair array is quadratic (|ids|²/2 structs — 10^6
    docs would be 4 TB in one task):

    - lists ≤ ``hot_cap``: explode pairs from the list; per-task
      memory bounded by hot_cap²/2 pair structs per group.
    - lists > ``hot_cap`` (a globally common 3-gram in a web-scale
      corpus): re-explode the list back to (sh, doc_id) and pair via
      the streaming sort-merge self-join, which spills instead of
      materializing. Quadratic OUTPUT is inherent to exact Jaccard
      (this is the documented non-scale baseline); the split only
      keeps the blowup off a single task's memory.

    Both branches read the SAME partial-agg exchange — the corpus is
    scanned and shuffled once. (ReusedExchange appears in the EXECUTED
    plan, not the pre-run explain: AQE finalizes exchange reuse at
    runtime; tests/test_dedup_similarity.py pins it.) The hot branch
    therefore costs nothing until a list actually exceeds the cap
    (no test/bench corpus does — sf0.1's max posting list is 25)."""
    sh = docs.select("doc_id", F.explode(F.col("shingles")).alias("sh"))
    sizes = docs.select("doc_id", F.size("shingles").alias("n_sh"))
    groups = (
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cold_pairs = (
        groups.filter(F.size("ids") <= hot_cap)
        .select(F.explode(sorted_ids_pairs("ids", "doc1", "doc2")).alias("p"))
        .select(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2"))
    )
    hot_sh = groups.filter(F.size("ids") > hot_cap).select(
        "sh", F.explode("ids").alias("doc_id")
    )
    a = hot_sh.alias("a")
    b = hot_sh.alias("b")
    hot_pairs = a.join(
        b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
    inter = (
        cold_pairs.unionByName(hot_pairs)
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            F.round(F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")), 6).alias("jaccard"),
        )
    )


def ngram_jaccard_top_pairs(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k most similar doc pairs by exact word-3-gram Jaccard.

    The ordering is total ((jaccard desc, doc1, doc2) — pair keys are
    unique), so a ``orderBy().limit(10·k)`` pre-filter (planned as
    TakeOrderedAndProject: per-partition heap top-k) provably contains
    the global top-k; the single-partition row_number window then ranks
    ≤ 10·k rows instead of ALL pairs. Before this fix the global window
    was the scale bottleneck of the whole query."""
    d = shingled_docs(spark, sf_dir)
    order = [F.desc("jaccard"), F.asc("doc1"), F.asc("doc2")]
    pruned = _pair_jaccard(d).orderBy(*order).limit(10 * k)
    w = Window.orderBy(*order)
    return pruned.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).orderBy("rnk")


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, shingles) → (doc_id, sig: array<long>) MinHash signatures.

    Shape matters: a nested ``transform(seq, i -> array_min(transform(
    shingles, hash)))`` expression looks natural but Catalyst's project
    collapsing inlines the shingle-hash subtree into the outer lambda, so
    the string hashing runs n_hashes× per row — and nested higher-order
    functions evaluate interpreted (measured 125 s for 5000 docs).
    Instead: explode shingles, hash each ONCE, derive the i-th family by
    integer-input xxhash64(h, i), then a single hash aggregation with
    n_hashes MIN columns — whole-stage-codegen all the way, and the
    shuffle carries only (doc_id, 32 longs).
    sig[i] = min over shingles of xxhash64(xxhash64(shingle), i)."""
    ex = docs.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    mins = ex.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("h", F.lit(i))).alias(f"m{i}") for i in range(n_hashes)]
    )
    return mins.select("doc_id", F.array(*[F.col(f"m{i}") for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_candidates(docs_with_shingles: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Band buckets → candidate pairs (doc1 < doc2, distinct).

    Pairs are generated per bucket from a ``collect_list`` (one shuffle,
    no self-join — the band table never materializes twice). Buckets
    larger than ``max_bucket`` are dropped: a band value shared by that
    many documents discriminates nothing (here: tiny-vocabulary corpora
    make globally common shingles everyone's minimum), and keeping them
    makes candidate generation quadratic — the standard LSH cap."""
    sig = minhash_signatures(docs_with_shingles)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                            lambda x: x.cast("string"),
                        ))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    groups = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = groups.select(F.explode(sorted_ids_pairs("ids", "doc1", "doc2")).alias("p"))
    return pairs.select(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2")).distinct()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold.

    No SQL oracle (xxhash64 banding isn't ANSI-SQL); the pytest suite
    instead proves recall: every true pair ≥ threshold found by the
    brute-force inverted index is also found here.

    The shingle table is materialized once (:func:`shingled_docs`) and
    read three times — candidate generation and both verification join
    sides; recomputing it per consumer was 10+ s of the 16.2 s sf0.1
    wall (16.2 → ~6 s after)."""
    return _minhash_verified(shingled_docs(spark, sf_dir), threshold)


def _minhash_verified(d: DataFrame, threshold: float) -> DataFrame:
    """LSH-candidate + exact-Jaccard-verify over a (doc_id, shingles)
    frame the caller already materialized (see :func:`shingled_docs`)."""
    cand = minhash_lsh_candidates(d)
    verified = (
        cand.join(d.select(F.col("doc_id").alias("doc1"), F.col("shingles").alias("sh1")), "doc1")
        .join(d.select(F.col("doc_id").alias("doc2"), F.col("shingles").alias("sh2")), "doc2")
        .select(
            "doc1",
            "doc2",
            F.round(
                F.size(F.array_intersect("sh1", "sh2"))
                / (F.size("sh1") + F.size("sh2") - F.size(F.array_intersect("sh1", "sh2"))),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.orderBy(F.desc("jaccard"), "doc1", "doc2")


def simhash(words: Column) -> Column:
    """64-bit SimHash as a native expression: bit b of the signature is
    the sign of sum over words of (bit b of xxhash64(word) ? +1 : -1)."""
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: (
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc + F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
            )
            > 0
        ).cast("int"),
    )


def dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6, max_bucket: int = 64
) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit chunk banding → hamming verify.

    Candidate generation mirrors MinHash-LSH: group by (chunk, sig),
    collect the bucket, DROP buckets larger than ``max_bucket`` (a hot
    16-bit chunk value shared by thousands of docs discriminates nothing
    and would go quadratic), and emit pairs from the sorted id list — one
    shuffle, no self-join. Bits are re-joined only for the surviving
    candidate pairs."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", simhash(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("bits")
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.concat_ws("", F.slice(F.col("bits"), c * 16 + 1, 16)).alias("sig"),
                ),
            )
        ).alias("cc"),
    ).select("doc_id", F.col("cc.chunk").alias("chunk"), F.col("cc.sig").alias("sig"))
    groups = (
        chunks.groupBy("chunk", "sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cand = (
        groups.select(F.explode(sorted_ids_pairs("ids", "doc1", "doc2")).alias("p"))
        .select(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2"))
        .distinct()
    )
    verified = cand.join(
        d.select(F.col("doc_id").alias("doc1"), F.col("bits").alias("bits1")), "doc1"
    ).join(d.select(F.col("doc_id").alias("doc2"), F.col("bits").alias("bits2")), "doc2")
    hamming = F.aggregate(
        F.zip_with("bits1", "bits2", lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        verified.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
        .orderBy("hamming", "doc1", "doc2")
    )


def minhash_recall_gate(
    spark: SparkSession, sf_dir: str, truth_threshold: float = 0.6
) -> DataFrame:
    """Driver-checked MinHash-LSH recall invariant: compute the exact
    truth set (pairs with inverted-index Jaccard ≥ truth_threshold) IN
    Spark, subtract the LSH-verified pairs (run at the lower 0.5
    threshold, so LSH only has to be a superset), and return
    (n_truth, n_missed). The oracle recomputes n_truth brute-force in
    DuckDB and pins n_missed to the literal 0 — this turns the pytest
    recall property into a driver-checked gate. truth_threshold 0.6 sits
    well above the 8×2 banding's s50 ≈ 0.35, and the whole pipeline is
    deterministic (xxhash64, frozen fixture), so the gate is stable.

    Truth and LSH sides share ONE materialized shingle table — the
    gate runs the full inverted-index pipeline AND the full LSH
    pipeline, so without sharing it would rebuild shingles five
    times."""
    d = shingled_docs(spark, sf_dir)
    truth = (
        _pair_jaccard(d).filter(F.col("jaccard") >= truth_threshold).select("doc1", "doc2")
    )
    found = (
        _minhash_verified(d, threshold=0.5)
        .select("doc1", "doc2")
        .dropDuplicates()
        .withColumn("_hit", F.lit(1))
    )
    return truth.join(found, ["doc1", "doc2"], "left").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).cast("long").alias("n_missed"),
    )


def simhash_recall_gate(spark: SparkSession, sf_dir: str, max_hamming: int = 3) -> DataFrame:
    """Driver-checked SimHash recall invariant: the 4×16-bit chunk
    banding provably (pigeonhole) produces a candidate for every pair at
    hamming ≤ 3 — UNLESS the bucket cap drops a hot bucket, which is
    exactly what this gate watches. Truth = brute-force all-pairs
    hamming over the signatures (feasible at fixture scale; 64-bit sigs
    aren't ANSI-SQL, so n_truth can't be oracle-recomputed — instead the
    gate returns n_missed pinned 0 plus a non-vacuousness witness)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", simhash(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("bits")
    )
    a = d.select(F.col("doc_id").alias("doc1"), F.col("bits").alias("bits1"))
    b = d.select(F.col("doc_id").alias("doc2"), F.col("bits").alias("bits2"))
    hamming = F.aggregate(
        F.zip_with("bits1", "bits2", lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    truth = (
        a.join(b, F.col("doc1") < F.col("doc2"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2")
    )
    found = (
        dedup_simhash(spark, sf_dir, max_hamming=max_hamming)
        .select("doc1", "doc2")
        .dropDuplicates()
        .withColumn("_hit", F.lit(1))
    )
    return truth.join(found, ["doc1", "doc2"], "left").agg(
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).cast("long").alias("n_missed"),
        (F.count(F.lit(1)) >= 1).alias("non_vacuous"),
    )


_SHINGLES_SQL = """(
  SELECT doc_id, list_distinct([
           array_to_string(words[i:i+2], ' ')
           for i in range(1, GREATEST(len(words) - 2, 1) + 1)
         ]) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS words FROM documents)
)"""

ORACLE = {
    "dedup_minhash_recall": f"""
        WITH sh AS (SELECT doc_id, unnest(shingles) AS s FROM {_SHINGLES_SQL} t),
        sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM {_SHINGLES_SQL} t),
        inter AS (
          SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT COUNT(*) AS n_truth, CAST(0 AS BIGINT) AS n_missed
        FROM inter JOIN sizes s1 ON doc1 = s1.doc_id JOIN sizes s2 ON doc2 = s2.doc_id
        WHERE ROUND(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) >= 0.6
    """,
    # 64-bit SimHash signatures aren't ANSI-SQL (xxhash64): the oracle
    # pins the Spark-computed miss count to 0 and requires the truth set
    # to be non-empty — a driver-checked invariant, not a value replay.
    "dedup_simhash_recall": """
        SELECT CAST(0 AS BIGINT) AS n_missed, TRUE AS non_vacuous
    """,
    "dedup_exact": """
        SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM (SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS digest FROM documents)
        GROUP BY digest ORDER BY keep_doc_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS (SELECT doc_id, unnest(shingles) AS s FROM {_SHINGLES_SQL} t),
        sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM {_SHINGLES_SQL} t),
        inter AS (
          SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc1, doc2, jaccard, rnk FROM (
          SELECT doc1, doc2,
                 ROUND(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) AS jaccard,
                 ROW_NUMBER() OVER (ORDER BY ROUND(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) DESC, doc1, doc2) AS rnk
          FROM inter JOIN sizes s1 ON doc1 = s1.doc_id JOIN sizes s2 ON doc2 = s2.doc_id
        ) WHERE rnk <= 20 ORDER BY rnk
    """,
}

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": ngram_jaccard_top_pairs,
    # rows-only by structural necessity (xxhash64 banding isn't ANSI);
    # kept registered as the bench's MinHash timing query — its recall
    # is driver-checked by dedup_minhash_recall below.
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_recall": minhash_recall_gate,
    "dedup_simhash_recall": simhash_recall_gate,
}
