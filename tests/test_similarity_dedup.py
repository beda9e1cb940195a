"""Semantic checks for dedup + similarity (SURVEY.md §2.11): the
fingerprint dedup must actually collapse the word-shuffled duplicates,
simhash must be shuffle-invariant, and IVF must recall most of the
exact top-k on the clustered testdata."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.operators.dedup import (
    dedup_exact, dedup_fingerprint, dedup_minhash, dedup_simhash)
from recommendation_system_spark_ml_spark.operators.similarity import (
    sim_ivf, sim_topk)


def test_fingerprint_collapses_shuffle_dups_exact_does_not(spark):
    n_exact = dedup_exact(spark, SF_SMOKE).count()
    n_fp = dedup_fingerprint(spark, SF_SMOKE).count()
    assert n_fp < n_exact  # shuffled dups are byte-distinct but bag-equal


def test_simhash_identical_for_bag_equal_docs(spark):
    """Docs with equal sorted-word-bag fingerprints must get equal
    simhashes (simhash is computed from the word set)."""
    fp = dedup_fingerprint(spark, SF_SMOKE)
    dup_groups = fp.where(F.col("n_docs") > 1)
    assert dup_groups.count() > 0
    sh = dedup_simhash(spark, SF_SMOKE)
    # distinct simhash count <= distinct fingerprint count
    assert sh.select("simhash").distinct().count() <= fp.count()


def test_minhash_finds_near_dup_pairs(spark):
    pairs = dedup_minhash(spark, SF_SMOKE)
    assert pairs.count() > 0
    assert pairs.agg(F.max("jaccard_dist")).first()[0] <= 0.2


def test_ivf_recall_vs_brute_force(spark):
    exact = {(r.query_id, r.neighbor_id)
             for r in sim_topk(spark, SF_SMOKE).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in sim_ivf(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall@5 too low: {recall:.2f}"


def test_lsh_pairs_nonempty_and_above_threshold(spark):
    from recommendation_system_spark_ml_spark.operators.similarity import sim_lsh
    pairs = sim_lsh(spark, SF_SMOKE)
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(r.cosine >= 0.4 - 1e-6 for r in rows)


def test_lsh_recall_vs_exact_pairs(spark):
    """The banded sign-LSH must recover most of the exact cosine>=0.4
    pair set (these near-uniform vectors are sign-LSH's worst case;
    measured recall 0.86 at sf0.001, 0.80 at sf0.01 -- gate at 0.6),
    and precision is exact by construction (full-precision re-rank)."""
    import duckdb

    from recommendation_system_spark_ml_spark.operators.similarity import sim_lsh
    exact = set(map(tuple, duckdb.sql(f"""
        SELECT a.vec_id, b.vec_id
        FROM read_parquet('{SF_SMOKE}/embeddings.parquet') a
        JOIN read_parquet('{SF_SMOKE}/embeddings.parquet') b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
        """).fetchall()))
    found = {(r.vec_a, r.vec_b) for r in sim_lsh(spark, SF_SMOKE).collect()}
    recall = len(found & exact) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall:.2f}"
    # precision is exact up to the round-4 threshold: every returned
    # pair must clear cosine >= 0.4 within rounding slack of the truth
    near_exact = set(map(tuple, duckdb.sql(f"""
        SELECT a.vec_id, b.vec_id
        FROM read_parquet('{SF_SMOKE}/embeddings.parquet') a
        JOIN read_parquet('{SF_SMOKE}/embeddings.parquet') b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.39995
        """).fetchall()))
    assert found <= near_exact


def test_min_label_components_chain_worst_diameter(spark):
    """A 12-node chain is the worst diameter per edge count: the min
    label crosses one hop per round, forcing >10 rounds and exercising
    the every-5-rounds localCheckpoint lineage truncation. All nodes
    must collapse to component 0; a detached singleton stays alone."""
    import pytest

    from recommendation_system_spark_ml_spark.operators.dedup import (
        min_label_components)

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)] + [(99,)],
                                 "doc_id bigint")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "doc_a bigint, doc_b bigint")
    rows = {r.doc_id: r for r in min_label_components(docs, edges).collect()}
    assert all(rows[i].component == 0 for i in range(n))
    assert all(rows[i].component_size == n for i in range(n))
    assert rows[99].component == 99 and rows[99].component_size == 1
    # the iteration cap fails loudly instead of looping forever
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(docs, edges, max_rounds=3)


def test_min_label_components_empty_edges_all_singletons(spark):
    """No edges: the iteration loop must terminate immediately and
    every doc must come back as its own singleton component (the
    isolated-node join-back path, which the edge-node-restricted
    iteration no longer produces from the loop itself)."""
    from recommendation_system_spark_ml_spark.operators.dedup import (
        min_label_components)

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id bigint")
    edges = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    rows = {r.doc_id: r for r in min_label_components(docs, edges).collect()}
    assert len(rows) == 7
    assert all(rows[i].component == i and rows[i].component_size == 1
               for i in range(7))


def test_sq8_recall_and_quantization_error(spark):
    """Int8 scalar quantization must not change the neighbor ranking
    materially: top-5 overlap vs exact brute force >= 80%, and each
    decoded cosine within 0.02 of the exact value for shared pairs."""
    from recommendation_system_spark_ml_spark.operators.similarity import (
        sim_topk, sim_sq8)

    sf = "/root/testdata/sf0.001"
    exact = {(r.query_id, r.neighbor_id): r.cosine
             for r in sim_topk(spark, sf).collect()}
    quant = {(r.query_id, r.neighbor_id): r.cosine
             for r in sim_sq8(spark, sf).collect()}
    shared = set(exact) & set(quant)
    assert len(shared) >= 0.8 * len(exact)
    assert all(abs(exact[k] - quant[k]) <= 0.02 for k in shared)


def test_pq_recall_vs_brute_force(spark):
    """PQ8x16 ADC + full-precision re-rank of the constant-size
    shortlist must keep >= 75% of the exact top-5 (the testdata
    embeddings are near-uniform on the sphere -- PQ's hardest case --
    so the shortlist does the heavy lifting)."""
    from recommendation_system_spark_ml_spark.operators.similarity import (
        sim_topk, sim_pq)

    sf = "/root/testdata/sf0.001"
    exact = {(r.query_id, r.neighbor_id) for r in sim_topk(spark, sf).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in sim_pq(spark, sf).collect()}
    assert len(exact & approx) >= 0.75 * len(exact)


def test_semantic_dedup_precision_and_recall(spark):
    """SemDeDup cell-bounded dedup: every returned (keeper, removed)
    pair must be a true near-dup at the exact threshold (precision 1.0
    by construction -- exact cosine inside the cell), and the removed
    set must recover >= 0.5 of the exact all-pairs removed set
    (observed 0.74 at sf0.001 with 2-probe assignment; cross-cell
    pairs beyond the runner-up cell are the sacrificed remainder)."""
    import duckdb

    from recommendation_system_spark_ml_spark.operators.dedup import dedup_semantic

    rows = dedup_semantic(spark, SF_SMOKE).collect()
    assert rows, "no semantic dups found at all"
    assert all(r.cosine >= 0.35 - 1e-6 for r in rows)
    assert all(r.keeper_id < r.removed_id for r in rows)
    exact = {r[0] for r in duckdb.sql(f"""
        SELECT DISTINCT b.vec_id
        FROM '{SF_SMOKE}/embeddings.parquet' a
        JOIN '{SF_SMOKE}/embeddings.parquet' b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.35
    """).fetchall()}
    got = {r.removed_id for r in rows}
    assert got <= exact, "semantic dedup returned a non-duplicate"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"semantic dedup recall too low: {recall:.2f}"


def test_ivf_persisted_zero_fits_and_recall(spark, monkeypatch):
    """sim_ivf_persisted: after build_ivf_index the query path must run
    ZERO KMeans fits (KMeans.fit is poisoned after the build), must
    read only the probed cells' partitions (PartitionFilters on the
    cells scan), and must hit the same >= 0.8 recall@5 gate as
    sim_ivf."""
    from pyspark.ml.clustering import KMeans

    from recommendation_system_spark_ml_spark.operators.similarity import (
        build_ivf_index, sim_ivf_persisted)

    build_ivf_index(spark, SF_SMOKE)

    def _no_fit(self, *a, **kw):
        raise AssertionError("KMeans.fit ran on the query path")

    monkeypatch.setattr(KMeans, "fit", _no_fit)
    df = sim_ivf_persisted(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    scan_blocks = [b for b in plan.split("\n\n")
                   if "Scan parquet" in b and "ivf_index/cells" in b]
    assert scan_blocks, "cells index scan missing from plan"
    assert any("PartitionFilters: [" in b and "cell" in b.split(
        "PartitionFilters")[1].splitlines()[0] for b in scan_blocks), (
        "probe cells not pushed as partition filters")
    approx = {(r.query_id, r.neighbor_id) for r in df.collect()}
    exact = {(r.query_id, r.neighbor_id)
             for r in sim_topk(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"persisted-IVF recall@5 too low: {recall:.2f}"


def test_knn_graph_recall_vs_exact(spark):
    """sim_knn_graph (IVF-cell candidates, top-3 per vector) must
    recover most of the exact corpus-wide 3-NN edge set. Near-uniform
    vectors are IVF's worst case (measured curve in the operator
    docstring: 0.81 at the shipped 6 probes); gate at 0.6, the
    sim_lsh worst-case convention."""
    from recommendation_system_spark_ml_spark.operators.similarity import (
        brute_force_topk, sim_knn_graph, KNN_K)
    from recommendation_system_spark_ml_spark.operators.similarity import (
        _corpus)

    corpus = _corpus(spark, SF_SMOKE)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(corpus, corpus, k=KNN_K).collect()}
    approx = {(r.vec_id, r.neighbor_id)
              for r in sim_knn_graph(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"kNN-graph recall@{KNN_K} too low: {recall:.2f}"


def test_minhash_hash_families_agree(spark):
    """dedup_minhash (xxhash64 seeds) and dedup_minhash_checked (md5
    seeds) verify the SAME exact predicate on independently-generated
    candidate sets; each family must recover >= 90% of the pairs the
    other found, or one family's banding (or seeding -- this is the
    test shape that would have caught the lambda-arity bug directly)
    is broken."""
    from recommendation_system_spark_ml_spark.operators.dedup import (
        dedup_minhash_checked)

    xx = {(r.doc_a, r.doc_b) for r in dedup_minhash(spark, SF_SMOKE).collect()}
    md = {(r.doc_a, r.doc_b)
          for r in dedup_minhash_checked(spark, SF_SMOKE).collect()}
    assert len(xx) > 0 and len(md) > 0
    assert len(xx & md) / len(md) >= 0.9, "xxhash family misses md5's pairs"
    assert len(xx & md) / len(xx) >= 0.9, "md5 family misses xxhash's pairs"


def test_leakage_safe_split_never_splits_a_near_dup_pair(spark):
    """The whole point of split_leakage_safe: for EVERY near-dup edge
    (Jaccard >= 0.8 pair), both endpoints carry the same split label.
    Also sanity-check all three labels actually occur and that the
    canonical representative is a member of its own component."""
    from recommendation_system_spark_ml_spark.operators.dedup import (
        _jaccard_edges, dedup_canonical, dedup_components,
        split_leakage_safe)

    splits = split_leakage_safe(spark, SF_SMOKE)
    edges = _jaccard_edges(spark, SF_SMOKE)
    sa = splits.select(F.col("doc_id").alias("doc_a"),
                       F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"),
                       F.col("split").alias("split_b"))
    crossed = (edges.join(sa, "doc_a").join(sb, "doc_b")
               .where(F.col("split_a") != F.col("split_b")))
    assert crossed.count() == 0
    labels = {r.split for r in splits.select("split").distinct().collect()}
    assert labels == {"train", "valid", "test"}

    comp = dedup_components(spark, SF_SMOKE)
    kept = dedup_canonical(spark, SF_SMOKE)
    orphans = (kept.join(
        comp.select(F.col("doc_id").alias("kept_doc_id"),
                    F.col("component").alias("member_component")),
        "kept_doc_id")
        .where(F.col("component") != F.col("member_component")))
    assert orphans.count() == 0
