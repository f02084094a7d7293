"""Property tests for ANN search (the non-oracle LSH path)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _emb(spark):
    from dblab_ece_trino_spark.entrypoints import engine_for

    return engine_for(spark, SF_SMALL).catalogs.table("lake.llm.embeddings")


def test_lsh_subset_and_recall(spark):
    """LSH top-k ⊆ bucket-mates; recall@5 vs brute force is meaningful."""
    from dblab_ece_trino_spark.operators.similarity import knn_bruteforce, knn_lsh

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    bf = knn_bruteforce(emb, queries, k=5).collect()
    lsh = knn_lsh(emb, queries, k=5, nbits=8).collect()
    bf_pairs = {(r.qid, r.cid) for r in bf}
    lsh_pairs = {(r.qid, r.cid) for r in lsh}
    # scores in the LSH output must equal the exact cosine (re-ranked)
    bf_scores = {(r.qid, r.cid): r.cos for r in bf}
    for r in lsh:
        if (r.qid, r.cid) in bf_scores:
            assert abs(bf_scores[(r.qid, r.cid)] - r.cos) < 1e-9
    recall = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    assert recall >= 0.3, f"LSH recall@5 collapsed: {recall}"


def test_bruteforce_self_excluded_and_ranked(spark):
    from dblab_ece_trino_spark.operators.similarity import knn_bruteforce

    emb = _emb(spark)
    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    by_q = {}
    for r in out:
        assert r.qid != r.cid
        by_q.setdefault(r.qid, []).append(r)
    for _qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.cos for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_ivf_recall_and_exact_scores(spark):
    """IVF candidates re-rank with exact cosine; recall@5 vs brute force
    must be substantial with nprobe=4 of 16 cells."""
    from pyspark.sql import functions as F

    from dblab_ece_trino_spark.operators.similarity import knn_bruteforce, knn_ivf

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    bf = knn_bruteforce(emb, queries, k=5).collect()
    ivf = knn_ivf(emb, queries, k=5, n_clusters=16, nprobe=4).collect()
    bf_scores = {(r.qid, r.cid): r.cos for r in bf}
    for r in ivf:
        if (r.qid, r.cid) in bf_scores:
            assert abs(bf_scores[(r.qid, r.cid)] - r.cos) < 1e-9
    recall = len({(r.qid, r.cid) for r in ivf} & set(bf_scores)) / len(bf_scores)
    assert recall >= 0.5, f"IVF recall@5 too low: {recall}"


def test_ivf_index_deterministic(spark):
    from dblab_ece_trino_spark.operators.similarity import ivf_index

    emb = _emb(spark)
    c1 = {r.cluster: tuple(r.centroid) for r in ivf_index(emb, 8, iters=2).collect()}
    c2 = {r.cluster: tuple(r.centroid) for r in ivf_index(emb, 8, iters=2).collect()}
    assert c1 == c2


def test_semantic_dedup_recovers_planted_twins(spark):
    """Exact copies planted at shifted ids must ALL be recovered with
    their original as canonical and cos exactly 1.0 — identical vectors
    deterministically share an IVF cell, so cluster blocking cannot drop
    a twin; and the near-random corpus (max pairwise cosine ~0.5) must
    contribute no extra pair at threshold 0.9."""
    from dblab_ece_trino_spark.operators.similarity import semantic_dedup

    emb = _emb(spark)
    plants = emb.filter(F.col("vec_id") < 7).withColumn(
        "vec_id", F.col("vec_id") + F.lit(5_000_000)
    )
    got = {
        (r.dup_id, r.canonical_id, r.max_cos)
        for r in semantic_dedup(
            emb.unionByName(plants), threshold=0.9
        ).collect()
    }
    assert got == {(5_000_000 + i, i, 1.0) for i in range(7)}


def test_mips_norm_augmentation_rank_equivalent(spark):
    """The asymmetric-LSH reduction (append sqrt(M² − |v|²) to corpus
    vectors, 0 to queries) must rank candidates identically to the raw
    inner product: with augmented corpus norms all equal to M and a
    fixed query norm, cos_aug = ip / (M·|q|) is a strictly increasing
    map of ip.  This is what lets the sign-LSH / IVF indexes above
    serve MIPS queries unchanged."""
    from dblab_ece_trino_spark.operators.dedup import cosine
    from dblab_ece_trino_spark.operators.similarity import (
        _as_double,
        mips_topk,
    )

    emb = _emb(spark)
    norms = emb.select(
        F.aggregate(
            F.transform(_as_double(F.col("embedding")), lambda x: x * x),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("sq")
    )
    m2 = norms.agg(F.max("sq")).collect()[0][0] + 1e-9
    aug_c = emb.select(
        F.col("vec_id").alias("cid"),
        F.concat(
            _as_double(F.col("embedding")),
            F.array(
                F.sqrt(
                    F.lit(m2)
                    - F.aggregate(
                        F.transform(
                            _as_double(F.col("embedding")), lambda x: x * x
                        ),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    )
                )
            ),
        ).alias("cv"),
    )
    aug_q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.concat(_as_double(F.col("embedding")), F.array(F.lit(0.0))).alias(
            "qv"
        ),
    )
    scored = aug_c.join(F.broadcast(aug_q), F.col("qid") != F.col("cid")).select(
        "qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("s")
    )
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), F.col("cid").asc())
    aug_top = {
        (r.qid, r.rank): r.cid
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    ip_top = {
        (r.qid, r.rank): r.cid
        for r in mips_topk(emb, emb.filter(F.col("vec_id") < 8), k=5).collect()
    }
    assert aug_top == ip_top


def test_quantized_mips_recall(spark):
    """255-level scalar quantization must keep top-5 recall against
    exact MIPS above a floor that holds with wide margin on this corpus
    (deterministic — no RNG, so the measured recall is a constant of
    the data)."""
    from dblab_ece_trino_spark.operators.similarity import (
        mips_topk,
        quantized_mips_topk,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    exact = {(r.qid, r.cid) for r in mips_topk(emb, q, k=5).collect()}
    quant = {(r.qid, r.cid) for r in quantized_mips_topk(emb, q, k=5).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall
