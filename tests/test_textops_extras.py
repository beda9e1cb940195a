"""Semantic checks for the round-3 training-pipeline additions beyond
the DuckDB oracle parity (which tests/test_oracle_parity.py covers):
the repetition signals must actually rank a looping document worst,
and the interleave mix must be partition-layout-invariant (the
restart-stability claim)."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.operators.textops import (
    pipeline_interleave, text_repetition)


def test_repetition_flags_looping_doc(spark, tmp_path):
    """A document that is one token repeated must score top_unigram
    frac 1.0 / ttr ~0 / dup_bigram 1.0; a all-distinct document the
    opposite. Uses a scratch documents table through the same code."""
    docs = spark.createDataFrame(
        [(1, "spam " * 49 + "spam", "en", "srcX", 5),
         (2, " ".join(f"w{i}" for i in range(50)), "en", "srcX", 5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint")
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    out = {r.doc_id: r for r in text_repetition(spark, str(tmp_path)).collect()}
    assert out[1].top_unigram_frac == 1.0
    assert out[1].dup_bigram_frac >= 0.97  # 48/49 dup ("spam spam" x49)
    assert out[1].type_token_ratio <= 0.05
    assert out[2].top_unigram_frac <= 0.05
    assert out[2].dup_bigram_frac == 0.0
    assert out[2].type_token_ratio == 1.0


def test_interleave_deterministic_and_weighted(spark, tmp_path):
    """The kept set must be a pure function of (doc_id, source) --
    identical across runs AND across input partition layouts (the
    restart-stability rand()/sample() cannot give). Weights must bind:
    src0 keeps everything."""
    from pyspark.sql import functions as F
    from recommendation_system_spark_ml_spark.sources.catalog import load

    rows1 = {r.doc_id for r in pipeline_interleave(spark, SF_SMOKE).collect()}
    rows2 = {r.doc_id for r in pipeline_interleave(spark, SF_SMOKE).collect()}
    assert rows1 == rows2
    # rewrite the same documents in a scrambled 13-partition layout:
    # the gate must keep the exact same ids
    (load(spark, SF_SMOKE, "documents")
     .repartition(13, F.col("text"))
     .write.parquet(str(tmp_path / "documents.parquet")))
    rows3 = {r.doc_id
             for r in pipeline_interleave(spark, str(tmp_path)).collect()}
    assert rows1 == rows3
    # src0 keeps 100%: every src0 doc must be present
    n_src0_all = (load(spark, SF_SMOKE, "documents")
                  .where(F.col("source") == "src0").count())
    n_src0_kept = (pipeline_interleave(spark, SF_SMOKE)
                   .where(F.col("source") == "src0").count())
    assert n_src0_all == n_src0_kept > 0


def test_quality_model_heldout_auc(spark):
    """The distilled quality classifier must actually learn the
    teacher rule: held-out (Knuth 30% split) AUC >= 0.8 -- observed
    ~0.99; scores must be calibrated probabilities in [0, 1]."""
    import pyspark.sql.functions as F
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from recommendation_system_spark_ml_spark.operators.textops import (
        text_quality_model_scores,
    )

    out = text_quality_model_scores(spark, SF_SMOKE).cache()
    try:
        assert out.where((F.col("quality_score") < 0)
                         | (F.col("quality_score") > 1)).count() == 0
        test = (out.where(F.col("split") == "test")
                .withColumn("raw", F.col("quality_score").cast("double")))
        auc = BinaryClassificationEvaluator(
            rawPredictionCol="raw", labelCol="label").evaluate(test)
        assert auc >= 0.8, f"held-out AUC too low: {auc:.3f}"
    finally:
        out.unpersist()


def test_funnel_gopher_stage_consistent_with_per_row_flags(spark):
    """pipeline_funnel_report's gopher_gate stage count must equal the
    number of docs passing BOTH the C4 gate and the funnel's two
    Gopher rules as reported by text_gopher_rules' per-row flags --
    the stage definitions are shared, so the bookkeeping must agree."""
    from pyspark.sql import functions as F

    from recommendation_system_spark_ml_spark.operators.textops import (
        pipeline_funnel_report, text_gopher_rules, text_quality)
    from tests.conftest import SF_SMOKE

    funnel = {r.stage: r.n_docs
              for r in pipeline_funnel_report(spark, SF_SMOKE).collect()}
    flags = text_gopher_rules(spark, SF_SMOKE).alias("g")
    quality = text_quality(spark, SF_SMOKE).alias("q")
    joined = flags.join(quality, "doc_id")
    n = (joined.where((F.col("quality_pass") == 1)
                      & (F.col("r_word_count") == 1)
                      & (F.col("r_stopwords") == 1)).count())
    assert funnel["gopher_gate"] == n
