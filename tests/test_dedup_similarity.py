"""Correctness of the non-SQL-expressible ops (no DuckDB oracle):
MinHash-LSH and SimHash dedup, and LSH ANN — each validated against its
exact brute-force counterpart (recall), the standard way to test
probabilistic indexes."""

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load
from hoopstat_haus_spark.similarity.ann import brute_force_topk, lsh_topk
from hoopstat_haus_spark.text.dedup import (
    _pair_jaccard,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_signatures,
    word_shingles,
)

SF = "/root/testdata/sf0.01"


def test_minhash_lsh_finds_all_high_jaccard_pairs(spark):
    """Every true pair with exact Jaccard ≥ 0.6 (well above the s50
    threshold ≈0.59 of the 8×4 banding) must be recalled by LSH."""
    d = load(spark, SF, "documents").select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    truth = {
        (r["doc1"], r["doc2"])
        for r in _pair_jaccard(d).filter(F.col("jaccard") >= 0.6).collect()
    }
    found = {
        (r["doc1"], r["doc2"]) for r in dedup_minhash_lsh(spark, SF, threshold=0.5).collect()
    }
    assert truth, "fixture should contain at least one near-dup pair"
    missing = truth - found
    assert not missing, f"LSH missed {len(missing)}/{len(truth)} true pairs"


def test_minhash_lsh_pairs_verified_no_false_positives(spark):
    """Returned pairs carry exact Jaccard ≥ threshold (verification step)."""
    rows = dedup_minhash_lsh(spark, SF, threshold=0.5).collect()
    assert all(r["jaccard"] >= 0.5 for r in rows)
    assert all(r["doc1"] < r["doc2"] for r in rows)


def test_minhash_signature_shape_and_determinism(spark):
    d = load(spark, SF, "documents").select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    a = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(d).collect()}
    b = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(d).collect()}
    assert a == b
    from hoopstat_haus_spark.text.dedup import N_HASHES
    assert all(len(s) == N_HASHES for s in a.values())


def test_simhash_close_pairs_have_close_bags(spark):
    """SimHash pairs at hamming ≤ 6 should be word-bag similar: sanity
    via exact jaccard of their shingle sets being above the corpus
    median for a sample of pairs."""
    pairs = dedup_simhash(spark, SF, max_hamming=3).limit(20).collect()
    if not pairs:
        pytest.skip("no simhash pairs at this threshold in fixture")
    d = load(spark, SF, "documents").select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    jac = {(r["doc1"], r["doc2"]): r["jaccard"] for r in _pair_jaccard(d).collect()}
    sims = [jac.get((p["doc1"], p["doc2"]), 0.0) for p in pairs]
    assert sum(sims) / len(sims) > 0.1


def test_lsh_ann_recall_vs_brute_force(spark):
    truth = brute_force_topk(spark, SF, k=5).collect()
    approx = lsh_topk(spark, SF, k=5).collect()
    t_sets = {}
    for r in truth:
        t_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    a_sets = {}
    for r in approx:
        a_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [
        len(t_sets[q] & a_sets.get(q, set())) / len(t_sets[q]) for q in t_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4, f"mean recall too low: {recalls}"


def test_embedding_near_dup_finds_planted_duplicates(spark, tmp_path):
    """The fixture corpus has no true near-dups (max pairwise cosine
    ≈0.51), so plant some: copy vectors with a tiny perturbation and
    assert the LSH-bucketed detector recovers every planted pair."""
    import pyspark.sql.functions as FF

    from hoopstat_haus_spark.similarity.ann import embedding_near_dups

    emb = load(spark, SF, "embeddings")
    planted = (
        emb.filter(FF.col("vec_id") % 50 == 0)
        .select(
            (FF.col("vec_id") + 10000).alias("vec_id"),
            FF.transform("embedding", lambda x: x * FF.lit(1.001)).alias("embedding"),
            FF.col("label"),
        )
    )
    out = str(tmp_path / "emb")
    emb.unionByName(planted).write.parquet(f"{out}/embeddings.parquet")
    pairs = {(r["id1"], r["id2"]) for r in embedding_near_dups(spark, out, threshold=0.99).collect()}
    expected = {(i, i + 10000) for i in range(0, 500, 50)}
    assert expected <= pairs, f"missed planted dups: {expected - pairs}"


def test_lsh_candidate_buckets_are_capped(spark):
    """A pathological hot bucket (many identical-direction vectors) must
    contribute ZERO pairs, not a quadratic blow-up: 300 copies of one
    direction all land in the same bucket in every band, which exceeds
    max_bucket and is dropped; the two planted distinct near-dups
    elsewhere are still found."""
    from hoopstat_haus_spark.similarity.ann import lsh_candidate_pairs

    base = load(spark, SF, "embeddings").limit(50).select("vec_id", "embedding")
    hot = (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 7)
        .crossJoin(spark.range(300).select(F.col("id").alias("k")))
        .select(
            (F.col("k") + 1000).alias("vec_id"),
            F.transform("embedding", lambda x: x * (F.lit(1.0))).alias("embedding"),
        )
    )
    corpus = base.unionByName(hot)
    pairs = lsh_candidate_pairs(corpus, max_bucket=64)
    n = pairs.count()
    # uncapped, the hot cluster alone would emit 300*299/2 ≈ 45k pairs
    assert n < 5000, f"bucket cap failed: {n} candidate pairs"


def test_ivf_training_sample_is_bounded(spark):
    """The coarse quantizer must train on a BOUNDED deterministic sample
    (≈256·n_lists rows), never a corpus fraction — at 100 TB a
    fractional sample would k-means terabytes of vectors."""
    from pyspark.ml.functions import array_to_vector

    n_lists = 16
    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    train = emb.orderBy(F.xxhash64("vec_id"), "vec_id").limit(256 * n_lists)
    assert train.count() <= 256 * n_lists
    # and the plan is TakeOrdered (per-partition heap), not a full sort
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan[:500]


def test_ivf_ann_recall_vs_brute_force(spark):
    """IVF with n_probe/n_lists = 4/16 scans ~25% of the corpus per
    query; its top-5 must substantially overlap exact brute force."""
    from hoopstat_haus_spark.similarity.ann import ivf_topk

    truth = brute_force_topk(spark, SF, k=5).collect()
    approx = ivf_topk(spark, SF, k=5).collect()
    t = {}
    for r in truth:
        t.setdefault(r["q_id"], set()).add(r["vec_id"])
    a = {}
    for r in approx:
        a.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [len(t[q] & a.get(q, set())) / len(t[q]) for q in t]
    assert sum(recalls) / len(recalls) >= 0.4, f"mean recall too low: {recalls}"


def test_plan_lsh_bands_fixture_and_scale():
    """Fixture-size corpora keep the hand-picked (4, 8) plan (gate
    parity); large corpora grow r with log2(N/max_bucket) AND grow b to
    hold recall at threshold; the plane budget binds with a warning."""
    import warnings

    from hoopstat_haus_spark.similarity.ann import plan_lsh_bands

    import math

    assert plan_lsh_bands(506, threshold=0.93) == (4, 8)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        r, b = plan_lsh_bands(1_000_000, threshold=0.93)
    assert r == 14  # ceil(log2(1e6/64))
    # b grows toward the exact-recall band count, bounded by the plane
    # budget (a capped plan warns instead of silently under-recalling)
    p_bit = 1.0 - math.acos(0.93) / math.pi
    exact_b = math.ceil(math.log(1e-3) / math.log(1.0 - p_bit**r))
    assert b == min(exact_b, 512 // r)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r9, b9 = plan_lsh_bands(10**9, threshold=0.93)
        assert r9 == 24 and r9 * b9 <= 512
        assert any("plane budget" in str(x.message) for x in w)


def test_lsh_bucket_drop_stats_flags_hot_cluster(spark):
    """The drop-stats accounting must attribute a giant identical-
    direction cluster to over-cap buckets (drop_frac ≫ 0) while a plain
    corpus reports ~0."""
    from hoopstat_haus_spark.similarity.ann import lsh_bucket_drop_stats

    base = load(spark, SF, "embeddings").limit(50).select("vec_id", "embedding")
    hot = (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 7)
        .crossJoin(spark.range(300).select(F.col("id").alias("k")))
        .select(
            (F.col("k") + 1000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.0)).alias("embedding"),
        )
    )
    clean = lsh_bucket_drop_stats(base).collect()[0]
    assert (clean["drop_frac"] or 0.0) < 0.05
    dirty = lsh_bucket_drop_stats(base.unionByName(hot)).collect()[0]
    assert dirty["drop_frac"] > 0.5
    assert dirty["n_dropped_buckets"] >= 1
