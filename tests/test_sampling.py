"""Sampling/split/decontamination properties (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _docs(spark):
    from dblab_ece_trino_spark.entrypoints import engine_for

    return engine_for(spark, SF_SMALL).catalogs.table("lake.llm.documents")


def test_split_deterministic_across_partitionings(spark):
    """A document's split must not depend on physical layout — the
    reproducibility contract (same assignment at 1 or 1000 partitions)."""
    from dblab_ece_trino_spark.operators.sampling import split_assign

    docs = _docs(spark)
    a = split_assign(docs).select("doc_id", "split")
    b = split_assign(docs.repartition(17)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # ratios roughly honored (256-bucket granularity)
    frac = {
        r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(frac.values())
    assert 0.8 < frac["train"] / total < 0.95
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0


def test_stratified_sample_is_subset_and_seeded(spark):
    from dblab_ece_trino_spark.operators.sampling import stratified_sample

    docs = _docs(spark)
    s1 = stratified_sample(docs, "lang", keep_buckets=64)
    s2 = stratified_sample(docs, "lang", keep_buckets=64)
    assert s1.count() == s2.count()  # same seed -> same sample
    assert s1.join(docs, "doc_id", "left_anti").count() == 0  # subset
    s3 = stratified_sample(docs, "lang", keep_buckets=64, seed="other")
    assert s3.select("doc_id").exceptAll(s1.select("doc_id")).count() > 0
    # every stratum retains ~64/256 of its rows
    kept = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in full.items():
        if n >= 40:
            assert 0.05 < kept.get(lang, 0) / n < 0.6


def test_decontaminate_flags_planted_contamination(spark):
    """A training doc sharing a long verbatim span with a benchmark doc
    must be flagged; unrelated docs must not."""
    from dblab_ece_trino_spark.operators.sampling import decontaminate

    bench = spark.createDataFrame(
        [(1, "the secret benchmark question about spark joins here")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "prefix text the secret benchmark question about spark stuff"),
            (11, "completely unrelated words with no shared trigrams at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.contaminated for r in decontaminate(train, bench).collect()}
    assert out[10] is True
    assert out[11] is False


def test_stratified_invariant_across_partitionings_and_null_strata(spark, duck):
    """Stratified keep-set is layout-independent, and NULL strata hash
    to the sentinel bucket on BOTH engines instead of silently dropping
    (Spark concat is NULL-propagating, DuckDB's is NULL-skipping)."""
    from dblab_ece_trino_spark.operators.sampling import stratified_sample
    from tests.conftest import SF_SMALL, duck_for

    docs = _docs(spark)
    a = stratified_sample(docs, "lang").select("doc_id")
    b = stratified_sample(docs.repartition(100), "lang").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    withnull = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("lang"))
    )
    kept = stratified_sample(withnull, "lang").select("doc_id", "lang")
    got_null_rows = kept.filter(F.col("lang").isNull()).count()
    assert got_null_rows > 0, "NULL-strata rows must still be sampled"
    # oracle agreement on the NULL-strata corpus
    cur = duck_for(duck, SF_SMALL)
    from tests.conftest import assert_matches_oracle
    from dblab_ece_trino_spark.operators.sampling import _md5_bucket_sql

    assert_matches_oracle(
        kept,
        cur,
        f"""
        SELECT doc_id, lang FROM (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang,
                 {_md5_bucket_sql("concat(coalesce(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END, ''), CAST(doc_id AS VARCHAR))", "sample-v1")} AS b
          FROM documents
        ) t WHERE b < 64
        """,
    )


def test_importance_sample_nested_thresholds(spark):
    """Threshold monotonicity: the keep-set at weight w1 <= w2 is a
    subset — the md5 draw is shared, only the integer threshold moves."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.operators.sampling import importance_sample
    from tests.conftest import SF_SMALL
    import pyspark.sql.functions as F

    docs = engine_for(spark, SF_SMALL).catalogs.table("lake.llm.documents")
    half = {r["doc_id"] for r in importance_sample(docs, F.lit(0.5)).collect()}
    full = {r["doc_id"] for r in importance_sample(docs, F.lit(1.0)).collect()}
    quarter = {
        r["doc_id"] for r in importance_sample(docs, F.lit(0.25)).collect()
    }
    assert quarter <= half <= full
    assert len(full) == docs.count()  # weight 1.0 keeps everything
    # rough proportion sanity (md5 uniformity): half keeps ~50% +- 15pp
    frac = len(half) / len(full)
    assert 0.35 < frac < 0.65


def test_importance_sample_partition_invariant(spark):
    """The decision depends only on (seed, id) — repartitioning cannot
    change the kept set."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.operators.sampling import importance_sample
    from tests.conftest import SF_SMALL
    import pyspark.sql.functions as F

    docs = engine_for(spark, SF_SMALL).catalogs.table("lake.llm.documents")
    a = {r["doc_id"] for r in importance_sample(docs, F.lit(0.5)).collect()}
    b = {
        r["doc_id"]
        for r in importance_sample(docs.repartition(13), F.lit(0.5)).collect()
    }
    assert a == b
