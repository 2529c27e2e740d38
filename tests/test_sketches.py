"""Sketch aggregates: mergeability (the property that makes them
100 TB-viable) and accuracy gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_raster_pipelines_spark.operators import sketches


def _regs_dict(df):
    return {r.idx: r.rho for r in df.collect()}


def _hist_dict(df):
    return {r.bin: r.cnt for r in df.collect()}


def test_hll_merge_associative_and_equals_union(spark):
    ids = spark.range(0, 9000).select(F.col("id").cast("string").alias("k"))
    a = ids.where(F.col("k").cast("long") % 3 == 0)
    b = ids.where(F.col("k").cast("long") % 3 == 1)
    c = ids.where(F.col("k").cast("long") % 3 == 2)
    ra, rb, rc = (sketches.hll_registers(x, "k") for x in (a, b, c))
    left = sketches.hll_merge(sketches.hll_merge(ra, rb), rc)
    right = sketches.hll_merge(ra, sketches.hll_merge(rb, rc))
    union = sketches.hll_registers(ids, "k")
    assert _regs_dict(left) == _regs_dict(right) == _regs_dict(union)


def test_hll_dense_mode_accuracy(spark):
    """p=12 → ~1.6% standard error; gate at 5% (3σ) for 30k distinct —
    well past the 2.5m linear-counting threshold, so this exercises the
    harmonic estimator, not the sparse fallback."""
    n = 30000
    ids = spark.range(0, n).select(F.col("id").cast("string").alias("k"))
    row = sketches.hll_distinct(ids, "k").collect()[0]
    assert abs(row.est_milli / 1000.0 - n) / n < 0.05
    assert row.m == 4096 and 0 < row.nonzero <= 4096


def test_hll_sparse_mode_is_linear_counting_and_tight(spark):
    """Below 2.5m the estimator switches to linear counting — relative
    error well under 1% at 500 distinct."""
    n = 500
    ids = spark.range(0, n).select(F.col("id").cast("string").alias("k"))
    row = sketches.hll_distinct(ids, "k").collect()[0]
    assert abs(row.est_milli / 1000.0 - n) / n < 0.01


def test_hll_duplicates_do_not_move_the_sketch(spark):
    ids = spark.range(0, 2000).select(F.col("id").cast("string").alias("k"))
    dup = ids.unionByName(ids).unionByName(ids)
    assert _regs_dict(sketches.hll_registers(ids, "k")) == _regs_dict(
        sketches.hll_registers(dup, "k")
    )


def test_histogram_merge_associative_exact(spark):
    li = spark.range(0, 10000).select(
        ((F.col("id") * 37) % 9973).cast("double").alias("v")
    )
    a = li.where(F.col("v") < 3000)
    b = li.where((F.col("v") >= 3000) & (F.col("v") < 7000))
    c = li.where(F.col("v") >= 7000)
    ska, skb, skc = (sketches.histogram_sketch(x, "v", 0.0, 10000.0, 64) for x in (a, b, c))
    left = sketches.histogram_merge(sketches.histogram_merge(ska, skb), skc)
    right = sketches.histogram_merge(ska, sketches.histogram_merge(skb, skc))
    union = sketches.histogram_sketch(li, "v", 0.0, 10000.0, 64)
    assert _hist_dict(left) == _hist_dict(right) == _hist_dict(union)
    # counts are exactly additive: total preserved
    assert sum(_hist_dict(union).values()) == 10000


def test_histogram_quantiles_rank_guarantee(spark):
    """approx_value's rank error is bounded by one bin's count: the true
    quantile of the uniform ramp lies within ε = (hi−lo)/bins."""
    n, bins, hi = 20000, 128, 20000.0
    ramp = spark.range(0, n).select(F.col("id").cast("double").alias("v"))
    sk = sketches.histogram_sketch(ramp, "v", 0.0, hi, bins)
    rows = sketches.histogram_quantiles(sk, [0.1, 0.5, 0.9], 0.0, hi, bins).collect()
    eps = hi / bins
    for r in rows:
        true_val = r.q * n
        assert abs(r.approx_value - true_val) <= eps + 1.0, (r.q, r.approx_value)
        # integer evidence is self-consistent
        assert r.cum_before < r.q * r.n <= r.cum_before + r.cnt + 1


def test_hll_register_bounds(spark):
    regs = sketches.hll_registers(
        spark.range(0, 5000).select(F.col("id").cast("string").alias("k")), "k"
    ).collect()
    for r in regs:
        assert 0 <= r.idx < 4096
        assert 1 <= r.rho <= 49


def test_hll_p_validation(spark):
    ids = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        sketches.hll_registers(ids, "k", p=3)


def test_cms_merge_equals_union(spark):
    a = spark.range(0, 3000).select((F.col("id") % 37).cast("string").alias("v"))
    b = spark.range(3000, 5000).select((F.col("id") % 53).cast("string").alias("v"))
    whole = sketches.cms_counters(a.unionByName(b), "v")
    merged = sketches.cms_merge(
        sketches.cms_counters(a, "v"), sketches.cms_counters(b, "v")
    )
    df_w = {(r["j"], r["bucket"]): r["cnt"] for r in whole.collect()}
    df_m = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert df_w == df_m


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    # 40 distinct keys << 1024 buckets: collisions unlikely across 4 rows,
    # so min-over-rows should be EXACT for nearly all keys; >= always.
    df = spark.range(0, 8000).select((F.col("id") % 40).cast("string").alias("v"))
    true = {r["v"]: r["c"] for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()}
    est = {
        r["v"]: r["est_count"]
        for r in sketches.cms_estimate(
            sketches.cms_counters(df, "v"), df.select("v").distinct(), "v"
        ).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)  # CMS one-sided error
    exact = sum(1 for k in true if est[k] == true[k])
    assert exact >= 38  # at most a couple of 4-way collisions


def test_cms_heavy_hitters_find_planted_keys(spark):
    # plant two hot keys in a long tail
    hot = spark.range(0, 5000).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT_A")).otherwise(F.lit("HOT_B")).alias("v")
    )
    tail = spark.range(0, 2000).select(F.concat(F.lit("t"), F.col("id")).alias("v"))
    top = sketches.cms_heavy_hitters(hot.unionByName(tail), "v", k=5).collect()
    # both hot keys have true count 2500; collisions may perturb their
    # relative order but never push them below the 1-count tail
    assert {r["v"] for r in top[:2]} == {"HOT_A", "HOT_B"}
    assert top[0]["est_count"] >= 2500 and top[1]["est_count"] >= 2500


# ---- bloom runtime filter (operators/runtime_filters.py) ----------------


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    from ds_raster_pipelines_spark.operators import runtime_filters as rf

    dim = spark.range(0, 50).select((F.col("id") * 7).cast("string").alias("k"))
    fact = spark.range(0, 20000).select((F.col("id") % 1000).cast("string").alias("k"))
    bitmap = rf.bloom_bitmap(dim, "k")
    assert len(bitmap) == rf.BLOOM_M_DEFAULT // 64
    pruned = rf.bloom_prune(fact, "k", bitmap)
    dim_keys = {r["k"] for r in dim.collect()}
    kept = [r["k"] for r in pruned.collect()]
    # no false negatives: every true match survives
    true_matches = [r["k"] for r in fact.collect() if r["k"] in dim_keys]
    assert sorted(k for k in kept if k in dim_keys) == sorted(true_matches)
    # actually prunes: 50 keys in 8192 bits -> fpp well under 1%
    assert len(kept) < len(true_matches) + 0.05 * 20000


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from ds_raster_pipelines_spark.operators import runtime_filters as rf

    dim = spark.range(0, 30).select((F.col("id") * 13 + 1).alias("dk"))
    fact = spark.range(0, 5000).select((F.col("id") % 400).alias("fk"), F.col("id").alias("v"))
    got = rf.bloom_semi_join(fact, dim, "fk", "dk").orderBy("v").collect()
    want = (
        fact.join(dim.withColumnRenamed("dk", "fk").distinct(), "fk", "leftsemi")
        .orderBy("v")
        .collect()
    )
    assert [(r["fk"], r["v"]) for r in got] == [(r["fk"], r["v"]) for r in want]


def test_sampled_candidates_catch_planted_heavy_keys(spark):
    """Planted heavy keys (1000+ rows each) must survive the 1/20
    hash-sample candidate pre-pass, and the sampled heavy-hitter top-k
    must equal the exact-key-space twin's — the sample only thins the
    tail, never a genuine heavy hitter (row-identity hashing keeps ~f/20
    of a key's rows, so f=1000 keeps ~50)."""
    from pyspark.sql import functions as F

    from ds_raster_pipelines_spark.operators.sketches import (
        cms_heavy_hitters,
        sampled_candidates,
    )

    n_tail = 5000
    df = (
        spark.range(n_tail)
        .select(
            F.col("id").alias("rid"),
            F.concat(F.lit("tail"), (F.col("id") % 2500).cast("string")).alias("k"),
        )
        .unionByName(
            spark.range(n_tail, n_tail + 3000).select(
                F.col("id").alias("rid"),
                F.concat(F.lit("HOT"), (F.col("id") % 3).cast("string")).alias("k"),
            )
        )
    )
    cand = sampled_candidates(df, "k", ["rid"], mod=20, take=50)
    got = {r["k"] for r in cand.collect()}
    assert {"HOT0", "HOT1", "HOT2"} <= got
    top_sampled = cms_heavy_hitters(df, "k", k=3, candidates=cand).collect()
    top_exact = cms_heavy_hitters(df, "k", k=3).collect()
    assert [tuple(r) for r in top_sampled] == [tuple(r) for r in top_exact]
