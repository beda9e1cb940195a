"""Measured scaling curves: run scale-sensitive operators at 1x / 3x /
10x synthetic data multipliers and fit the log-log slope, so the
"would this hold at 1000x?" claims in SCALE.md rest on measurements,
not plan-reading alone.

Method: each multiplier M materializes a derived dataset under /tmp by
unioning M key-shifted copies of the sf0.1 tables (doc_id/vec_id/
event_id/orderkey offsets keep keys distinct; text/vector content is
whats-there repeated, which preserves the operators' selectivity and
collision structure rather than diluting it -- conservative for dedup,
since duplicate groups grow M-fold). Queries run unmodified against
the derived dir through the ordinary catalog; timing is a noop sink of
the full result, warm session, median of REPEAT runs.

slope ~ 1.0 -> linear scaling (shuffle-bound operators on fixed
parallelism); slope >> 1 -> super-linear blow-up (a pair join whose
candidate set grows quadratically, a single-reducer stage saturating).
Sub-linear slopes mean fixed per-query overhead still dominates at
this size. The tool exits non-zero if any operator exceeds SLOPE_GATE;
the measured table lives in SCALE.md ("Measured scaling curves").

Usage: python tools/scale_curve.py [query ...]
Positional names restrict the run to those CURVE_QUERIES entries (the
printed table rows merge into SCALE.md by hand); no args = full sweep.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_system_spark_ml_spark.registry import all_specs
from recommendation_system_spark_ml_spark.session import get_spark
from recommendation_system_spark_ml_spark.sources.catalog import TABLES

BASE_SF = "/root/testdata/sf0.1"
# Override points via env for targeted deep curves, e.g.
# SPARK_GRAFT_SCALE_MULTS=1,10,30 for the r6 "does the incremental
# index probe hold at 30x" validation (r5 verdict task #7).
MULTS = tuple(int(m) for m in os.environ.get(
    "SPARK_GRAFT_SCALE_MULTS", "1,3,10").split(","))
REPEAT = 3
SLOPE_GATE = 1.35  # allow log overhead / constant-cost amortization

# key column to shift per table so copies don't collide
_SHIFT_KEYS = {
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
    "events": ("event_id", 100_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
}

CURVE_QUERIES = (
    "dedup_minhash",          # banded LSH: candidates must not go quadratic
    "dedup_fingerprint",      # hash-groupBy baseline
    "agg_bitmap_distinct",    # two-level bitmap agg
    "ts_gapfill",             # per-key spine + running-frame windows
    "ts_ewma",                # bounded-frame window
    "sample_bottom_k",        # WindowGroupLimit partial top-k
    "text_tfidf",             # explode + join + agg
    "pipeline_end_to_end",    # composed gate->dedup->chunk
    "agg_avg_groupby",        # partial-agg floor
    "window_rank",            # per-entity windows
    "join_bloom_pruned",      # bloom build + pruned join
    "graph_pagerank",         # 10 iterations: per-round join must stay linear
    "dedup_semantic",         # KMeans cells bound the pair join
    "ts_anomaly_mad",         # two exact percentiles per key
    "pipeline_curriculum",    # two-level global rank
    "multimodal_dedup_phash", # Arrow pooling + banded Hamming join
    "sim_knn_graph",          # cell-bounded corpus-wide kNN edges
    "pipeline_token_budget",  # two-level global running sum
    "dedup_containment",      # df-bounded inverted-index pair join
    "pipeline_domain_mixture",  # count agg + broadcast cutoffs + map gate
    "stream_late_data",       # metadata-sized watermark table must stay so
    "window_sliding_distinct",  # 24x membership explode must stay linear
    "dedup_span_merge",       # shingle explode + positions semi-join
    "ts_resample_ohlc",       # one-Exchange window+rollup bar build
    "agg_ks_drift",           # two-level global ECDF cumsum (r5: completes
                              # the two-level-recipe curve family)
    "dedup_minhash_realistic",   # banding efficiency on the long-tail corpus
    "dedup_jaccard_prefix_realistic",  # prefix-filter pruning, same corpus
    "pipeline_contamination_matrix",   # cross-source shingle join volume
    "sim_hybrid_rrf",         # two corpus scans + top-k heaps, no global sort
    "sample_weighted_aes",    # map expression + TakeOrdered heaps
    "analyze_table_stats",    # one-scan multi-distinct Expand
    "stream_dedup_incremental",  # per-batch probe of the persisted index
    "dedup_minhash_incremental",  # LSH band-index probe: batch-not-corpus cost
    "ts_decompose",           # 24x trend explode + calendar-bounded tail
    "ts_autocorrelation",     # bucket self-join x 24 broadcast lags
    "window_rolling_median",  # O(span) frame state, one keyed Exchange
    "pipeline_shard_manifest",  # two-level running sum, byte offsets
    "pipeline_domain_quota",  # WindowGroupLimit cap under domain skew
    "text_top_terms",         # tfidf + WindowGroupLimit keyword cut
    # r7 wave: the scale-hazard-bearing newcomers
    "graph_link_prediction",  # wedge self-join: the quadratic hazard
    "agg_mann_whitney",       # distinct-value two-level cumsum
    "agg_bootstrap_ci",       # x64 map-side explode, one partial agg
    "ml_kmeans_lloyd_exact",  # 3 broadcast-fanout rounds + posexplode agg
    "agg_survival_km",        # duration-histogram cumsums
    "ml_logistic_irls_exact",  # 3 scans + 9-moment partial aggs
    "ml_rec_eval_itemcf",     # CF pair join on the train split + metrics
    "vec_random_projection_jl",  # map-side 16x64 projection, zero shuffle
    "vec_class_centroids",    # 64x posexplode partial-combine
    "dq_expectations",        # one-scan 8-rule conditional-sum audit
    "agg_mutual_information",  # joint-count shuffle, checkpointed cells
    "graph_degree_histogram",  # distinct-edge shuffle + bounded rollup
    "agg_corr_matrix",        # one-scan co-moment state
    "text_lang_confusion",    # map-side scoring + 25-cell agg
    "split_time_based",       # bounds scan + map gate + multi-distinct
    "vec_normalize",          # map-only array expressions
    "ts_changepoint",         # two-level integer CUSUM
    "agg_gini_concentration",  # per-source count + bounded rank window
    "agg_weighted_median",    # two-level cumulative weight
    "text_zipf_slope",        # vocab-bounded two-pass slope
    "window_sliding_distinct_hll",  # sketch-table explode, not rows
    "agg_distribution_shape",  # two-pass centered moments
    "stream_topk_trending",   # windowed counts + bounded rank
    # --- r6 wave ---
    "agg_basket_lift",        # apriori prune + bounded per-order pair join
    "graph_triangle_count",   # degree-ordered wedge join: O(E^1.5) bound
    "agg_rfm_scores",         # per-user agg + ntile over aggregate
    "ts_calendar_profile",    # 168-cell partial agg + bounded peak window
    "pipeline_tokenizer_fertility",  # map regexp counts + catalog keyspace
    "text_readability",       # map-only regexp scoring
    "dedup_cluster_size_dist",  # components + two bounded rollups
    "vec_anisotropy_report",  # 64-cell posexplode + scalar cross
    "vec_top_pc",             # n*d^2 covariance, d^2-cell combine
    "sim_mmr_rerank",         # linear top-k scan + bounded greedy
    # --- r10 wave ---
    "agg_cms_merge",          # two bounded-cell sketch passes + cell join
    "vec_matryoshka_agreement",  # broadcast-probe dual ranking, linear
    "sim_lsh_realistic",      # promoted contract: probe + banded pipeline
)


def build_derived(spark, mult: int) -> str:
    out = f"/tmp/rsml_scale_curve/x{mult}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F
    for t in TABLES:
        src = spark.read.parquet(os.path.join(BASE_SF, f"{t}.parquet"))
        if t in _SHIFT_KEYS and mult > 1:
            key, off = _SHIFT_KEYS[t]
            parts = [src] + [
                src.withColumn(key, F.col(key) + F.lit(i * off))
                for i in range(1, mult)]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = src  # dims stay fixed (their 100 TB behavior too)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    open(marker, "w").write("ok")
    return out


def main() -> None:
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    queries = tuple(q for q in CURVE_QUERIES if not only or q in only)
    spark = get_spark(app_name="scale-curve")
    specs = all_specs()
    dirs = {m: build_derived(spark, m) for m in MULTS}
    results: dict[str, dict] = {}
    for name in queries:
        times = {}
        for m in MULTS:
            runs = []
            for _ in range(REPEAT):
                t0 = time.time()
                (specs[name].fn(spark, dirs[m])
                 .write.format("noop").mode("overwrite").save())
                runs.append(time.time() - t0)
            times[m] = sorted(runs)[len(runs) // 2]
        # least-squares slope of log(t) vs log(m)
        xs = [math.log(m) for m in MULTS]
        ys = [math.log(times[m]) for m in MULTS]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                 / sum((x - mx) ** 2 for x in xs))
        results[name] = {**{f"t{m}": round(times[m], 2) for m in MULTS},
                         "slope": round(slope, 2)}
        print(f"{name:24s} "
              + " ".join(f"{m}x={times[m]:6.2f}s" for m in MULTS)
              + f" slope={slope:5.2f}", flush=True)
    out_path = "/tmp/rsml_scale_curve/results.json"
    json.dump(results, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")
    bad = {k: v for k, v in results.items() if v["slope"] > SLOPE_GATE}
    if bad:
        print("SUPER-LINEAR:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
