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


def test_pair_jaccard_hot_branch_parity_and_single_scan(spark):
    """The posting-list-length split in _pair_jaccard must not change
    results: forcing EVERY shingle down the hot (streaming self-join)
    branch with hot_cap=0 yields the identical pair set as the default
    all-cold path. Both branches must also share one shuffle of the
    exploded corpus — the executed (AQE-final) plan contains a
    ReusedExchange, so the hot fallback never costs a second scan."""
    d = load(spark, SF, "documents").select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    cold = sorted(tuple(r) for r in _pair_jaccard(d).collect())
    hot = sorted(tuple(r) for r in _pair_jaccard(d, hot_cap=0).collect())
    assert cold, "fixture should produce pairs"
    assert cold == hot

    df = _pair_jaccard(d, hot_cap=0)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, "hot/cold branches must share the (sh) exchange"


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
    """r grows with log(N/max_bucket)/log(1/bg_agree) — the round-5
    non-uniform-bucket correction (bg 0.60, not the naive 0.5) — AND b
    grows to hold recall at threshold; the default plane budget binds
    nowhere in range; an explicit tight budget warns (strict raises)."""
    import math
    import warnings

    import pytest

    from hoopstat_haus_spark.similarity.ann import plan_lsh_bands

    def exact_r(n):
        return max(4, min(24, math.ceil(math.log(n / 64) / math.log(1 / 0.60))))

    p_bit = 1.0 - math.acos(0.93) / math.pi

    def exact_b(r):
        return math.ceil(math.log(1e-3) / math.log(1.0 - p_bit**r))

    assert plan_lsh_bands(506, threshold=0.93) == (5, 10)  # was (4, 8) pre-correction
    for n in (506, 53_000, 1_000_000, 10**9):
        r, b = plan_lsh_bands(n, threshold=0.93)
        assert (r, b) == (exact_r(n), exact_b(exact_r(n))), n
        # the default budget (4096) binds NOWHERE: even r capped at 24
        # needs only 24*143 = 3432 planes for full 1e-3 recall
        assert r * b <= 4096
    # an EXPLICIT tight budget still warns (and strict mode raises)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rc, bc = plan_lsh_bands(10**9, threshold=0.93, max_planes=512)
        assert rc == 24 and rc * bc <= 512
        assert any("plane budget" in str(x.message) for x in w)
    with pytest.raises(ValueError, match="plane budget"):
        plan_lsh_bands(10**9, threshold=0.93, max_planes=512, strict=True)
    # degenerate inputs fail loudly, not with a clamped-r recall hole:
    # bg_agree=1.0 divides by log(1)=0, >1 silently clamps r to the
    # minimum (the exact under-bucketing the planner exists to prevent)
    for bad in (0.0, 1.0, 1.2):
        with pytest.raises(ValueError, match="bg_agree"):
            plan_lsh_bands(53_000, bg_agree=bad)
    with pytest.raises(ValueError, match="threshold"):
        plan_lsh_bands(53_000, threshold=1.0)


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


def test_adaptive_banding_at_depth_50k(spark):
    """Round-5 depth gate for the adaptive plan (the regime the round-3
    fixed 32/8 plan silently failed in): a ~50k-vector corpus with a
    planted dense cluster. Asserts (a) the planned r grows past the
    fixture's 4, (b) the dense cluster stays under 20% drop_frac, and
    (c) recall on planted scaled dups >= 0.99 — while the OLD fixed
    plan recalls < 0.5 on the identical corpus."""
    from hoopstat_haus_spark.similarity.ann import (
        drop_stats_from_groups,
        lsh_banded_groups,
        pairs_from_groups,
        plan_lsh_bands,
        plant_scaled_dups,
    )

    N, DIM = 50_000, 32
    idx = F.sequence(F.lit(0), F.lit(DIM - 1))
    base = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            idx,
            lambda j: ((F.pmod(F.xxhash64(F.col("id"), j, F.lit(1)), F.lit(2001)) / 1000.0) - 1.0).cast(
                "float"
            ),
        ).alias("embedding"),
    )
    # dense near-identical cluster: 2.5k rows around one direction
    cluster = spark.range(2_500).select(
        (F.col("id") + 200_000).alias("vec_id"),
        F.transform(
            idx,
            lambda j: (
                F.lit(1.0) + F.pmod(F.xxhash64(F.col("id"), j, F.lit(2)), F.lit(100)) / 5000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    emb = plant_scaled_dups(base, every=100).unionByName(cluster)
    n = emb.count()

    r, b = plan_lsh_bands(n, threshold=0.93)
    assert r > 4, "r must grow past the fixture plan at 50k rows"
    groups = lsh_banded_groups(emb, n_planes=r * b, n_bands=b, dim=DIM).localCheckpoint()
    stats = drop_stats_from_groups(groups).collect()[0]
    assert (stats["drop_frac"] or 0.0) < 0.20, stats
    assert stats["n_dropped_buckets"] >= 1, "the planted cluster must show up in drop accounting"

    planted = {(i, i + 10_000_000) for i in range(0, N, 100)}
    pairs = {
        (r2["id1"], r2["id2"])
        for r2 in pairs_from_groups(groups).collect()
    }
    found = sum(1 for p in planted if p in pairs)
    assert found / len(planted) >= 0.99, f"adaptive recall {found}/{len(planted)}"

    # the old fixed plan on the SAME corpus: r=4 -> 16 bucket values per
    # band for 50k rows, every bucket over the cap, recall collapses
    old_pairs = {
        (r2["id1"], r2["id2"])
        for r2 in pairs_from_groups(lsh_banded_groups(emb, 32, 8, dim=DIM)).collect()
    }
    old_found = sum(1 for p in planted if p in old_pairs)
    assert old_found / len(planted) < 0.5, f"fixed plan unexpectedly recalls {old_found}"


def test_shingled_docs_materializes_at_full_parallelism(spark):
    """The shared shingle table (text/dedup.py::shingled_docs) must
    checkpoint at the session's default parallelism: a one-file corpus
    would otherwise materialize every shingle in a SINGLE task (measured
    41 s vs ~6 s at sf0.1), and every dedup consumer inherits that
    bottleneck. Pins the repartition-before-checkpoint contract."""
    from hoopstat_haus_spark.text.dedup import shingled_docs

    d = shingled_docs(spark, SF)
    assert d.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # and it carries exactly the (doc_id, shingles) schema the consumers join on
    assert [f.name for f in d.schema.fields] == ["doc_id", "shingles"]


def test_lsh_signature_computed_once_per_row(spark):
    # the banded frame's plan must contain each plane's dot fold exactly
    # once — the transform-lambda form re-evaluated the whole signature
    # per band (b× the fold work, the CLAUDE.md MinHash re-inline trap)
    import contextlib
    import io

    from hoopstat_haus_spark.similarity.ann import _banded_rows

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)), lambda i: (i * F.col("id") % 97).cast("float")
        ).alias("embedding"),
    )
    banded = _banded_rows(emb, n_planes=50, n_bands=10)  # narrow JVM path
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        banded.explain("extended")
    opt = buf.getvalue().split("== Optimized Logical Plan ==")[1].split("== Physical Plan ==")[0]
    assert opt.count("zip_with") == 50  # one per plane, not per (plane, band)
    assert banded.count() == 500


def test_lsh_dim_mismatch_raises_not_empty(spark):
    # a wrong plane dim null-pads every dot and used to collapse all
    # signatures to all-zeros → one over-cap bucket → silently EMPTY
    # candidate set; it must raise instead
    import pytest

    from hoopstat_haus_spark.similarity.ann import lsh_candidate_pairs

    emb32 = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)), lambda i: (i * F.col("id") % 97).cast("float")
        ).alias("embedding"),
    )
    with pytest.raises(Exception, match="lsh_signature"):
        lsh_candidate_pairs(emb32, n_planes=16, n_bands=4, dim=64).count()
