"""Round-7 regression tests: the r6 ADVICE divergence classes
(rank-0 covariance, empty contingency margins, pre-1970 calendar
arithmetic) and the sim_lsh/sim_ivf/sim_knn_graph agreement
contracts (r6 verdict task 2)."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_df_matches, oracle_df


def _mini_sf(tmp_path, embeddings=None, documents=None, events=None):
    """Write a degenerate sf dir containing only the named tables."""
    d = str(tmp_path)
    if embeddings is not None:
        pq.write_table(pa.table({
            "vec_id": pa.array(range(len(embeddings)), pa.int64()),
            "embedding": pa.array(embeddings, pa.list_(pa.float32())),
            "label": pa.array([0] * len(embeddings), pa.int32()),
        }), os.path.join(d, "embeddings.parquet"))
    if documents is not None:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(documents)), pa.int64()),
            "text": pa.array([t for t, _, _ in documents], pa.string()),
            "lang": pa.array([l for _, l, _ in documents], pa.string()),
            "source": pa.array([s for _, _, s in documents], pa.string()),
            "n_chars": pa.array([len(t or "") for t, _, _ in documents],
                                pa.int64()),
        }), os.path.join(d, "documents.parquet"))
    if events is not None:
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(events)), pa.int64()),
            "ts": pa.array([e[0] for e in events], pa.timestamp("us")),
            "user_id": pa.array([e[1] for e in events], pa.int64()),
            "event_type": pa.array(["click"] * len(events), pa.string()),
            "value": pa.array([1.0] * len(events), pa.float64()),
            "props": pa.array([None] * len(events), pa.string()),
        }), os.path.join(d, "events.parquet"))
    return d


def _oracle_on(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("embeddings", "documents", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}')")
    return con.execute(sql).df()


def test_vec_top_pc_rank0_covariance_yields_nulls(spark, tmp_path):
    """r6 ADVICE #1: a single embedding row makes the covariance
    rank-0 (all cells 0), the first power-iteration norm is 0, and
    both engines must emit NULL loadings + NULL eigenvalue for every
    dim -- the Spark side used to crash on 0.0 * None at the second
    iteration."""
    from recommendation_system_spark_ml_spark.registry import all_specs
    spec = all_specs()["vec_top_pc"]
    sf = _mini_sf(tmp_path, embeddings=[[1.0] * 8])
    got = spec.fn(spark, sf)
    rows = got.collect()
    assert len(rows) == 8
    assert all(r.loading is None and r.eigenvalue is None for r in rows)
    assert_df_matches(got, _oracle_on(sf, spec.oracle))


def test_vec_top_pc_identical_embeddings_yields_nulls(spark, tmp_path):
    """Same class: many copies of one vector -- centered covariance is
    exactly zero, norm 0 at iteration 1."""
    from recommendation_system_spark_ml_spark.registry import all_specs
    spec = all_specs()["vec_top_pc"]
    sf = _mini_sf(tmp_path, embeddings=[[0.5, -1.0, 2.0, 0.0]] * 6)
    got = spec.fn(spark, sf)
    rows = got.collect()
    assert len(rows) == 4
    assert all(r.loading is None and r.eigenvalue is None for r in rows)
    assert_df_matches(got, _oracle_on(sf, spec.oracle))


def test_chi_square_all_null_margins_one_row(spark, tmp_path):
    """r6 ADVICE #2: when every joint cell has a NULL lang or NULL
    source the margin joins drop everything -- both engines must still
    emit exactly ONE row (global aggregate), chi2 NULL."""
    from recommendation_system_spark_ml_spark.registry import all_specs
    spec = all_specs()["agg_chi_square"]
    sf = _mini_sf(tmp_path, documents=[
        ("aa", None, "src0"), ("bb", "en", None), ("cc", None, None)])
    got = spec.fn(spark, sf)
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0].chi2 is None
    assert_df_matches(got, _oracle_on(sf, spec.oracle))


def test_chi_square_empty_documents_one_row(spark, tmp_path):
    from recommendation_system_spark_ml_spark.registry import all_specs
    spec = all_specs()["agg_chi_square"]
    sf = _mini_sf(tmp_path, documents=[])
    got = spec.fn(spark, sf)
    assert got.count() == 1
    assert_df_matches(got, _oracle_on(sf, spec.oracle))


def test_calendar_profile_pre1970_stays_in_domain(spark, tmp_path):
    """r6 ADVICE #4: negative epochs used to leak dow -3 / hour -7 out
    of the documented Sunday=0..6 / 0..23 domain. Exact floor division
    + pmod keeps every cell in-domain AND on the right calendar day:
    1969-12-31 was a Wednesday (dow 3), 23:00 UTC -> hour 23."""
    from recommendation_system_spark_ml_spark.registry import all_specs
    spec = all_specs()["ts_calendar_profile"]
    # 1969-12-31 23:00:00 UTC = epoch -3600s; 1969-12-28 (Sunday) 00:30
    sf = _mini_sf(tmp_path, events=[
        (-3_600_000_000, 1),                    # Wed 1969-12-31 23:00
        (-4 * 86_400_000_000 + 1_800_000_000, 2),  # Sun 1969-12-28 00:30
        (3_600_000_000, 3),                     # Thu 1970-01-01 01:00
    ])
    got = spec.fn(spark, sf)
    rows = {(r.dow, r.hour): r.n_events for r in got.collect()}
    assert rows == {(3, 23): 1, (0, 0): 1, (4, 1): 1}
    assert_df_matches(got, _oracle_on(sf, spec.oracle))


def test_sim_contracts_hold_at_smoke(spark, duck):
    """The three promoted agreement contracts (r6 verdict task 2):
    every contract boolean TRUE, exact values hash-matching DuckDB."""
    from recommendation_system_spark_ml_spark.registry import all_specs
    specs = all_specs()
    flags = {"sim_lsh": "lsh_count_le_exact", "sim_ivf": "ivf_le_exact",
             "sim_knn_graph": "knn_le_exact"}
    for name, flag in flags.items():
        got = specs[name].fn(spark, SF_SMOKE)
        rows = got.collect()
        assert rows, name
        assert all(getattr(r, flag) for r in rows), name
        assert_df_matches(got, oracle_df(duck, specs[name].oracle, SF_SMOKE))
