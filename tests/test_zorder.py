"""Z-order layout evidence: the claim behind sink_zorder_prune is that
a Morton-clustered file layout prunes scans filtered on EITHER of the
two interleaved dimensions, where a single-column sort only serves its
own column. This test measures it directly from the parquet footers:
count the files whose column min/max box intersects a filter box, for
the z-ordered layout vs a custkey-range-partitioned twin of the same
data at the same file count.
"""

import datetime
import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.session import scratch_path
from recommendation_system_spark_ml_spark.sources.catalog import load


def _files_hit(path: str, custkey_rng=None, date_rng=None) -> tuple[int, int]:
    """(files whose stats intersect the predicate box, total files)."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hits = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i
                 for i in range(meta.num_columns)}
        intersects = True
        for col, rng in (("o_custkey", custkey_rng),
                         ("o_orderdate", date_rng)):
            if rng is None:
                continue
            lo, hi = rng
            st = meta.row_group(0).column(names[col]).statistics
            mn, mx = st.min, st.max
            for g in range(1, meta.num_row_groups):
                s = meta.row_group(g).column(names[col]).statistics
                mn, mx = min(mn, s.min), max(mx, s.max)
            if mx < lo or mn > hi:
                intersects = False
        hits += intersects
    return hits, len(files)


def test_zorder_prunes_both_dimensions_linear_sort_does_not(spark):
    from recommendation_system_spark_ml_spark.operators.formats import (
        sink_zorder_prune)

    # writes the z-ordered layout as a side effect
    sink_zorder_prune(spark, SF_SMOKE).collect()
    zpath = scratch_path(SF_SMOKE, "orders_zorder")

    lpath = scratch_path(SF_SMOKE, "orders_custkey_sorted")
    (load(spark, SF_SMOKE, "orders")
     .repartitionByRange(16, "o_custkey")
     .sortWithinPartitions("o_custkey")
     .write.mode("overwrite").parquet(lpath))

    # parquet date stats may surface as datetime.datetime
    d = (datetime.datetime(1996, 1, 1), datetime.datetime(1996, 3, 31))

    # narrow-date, all-custkey box: the custkey sort is useless (every
    # file spans the full date range); the z-layout must prune.
    z_hits, z_total = _files_hit(zpath, date_rng=d)
    l_hits, l_total = _files_hit(lpath, date_rng=d)
    assert l_hits == l_total, "custkey sort unexpectedly date-clustered"
    assert z_hits < z_total, "z-order produced no date clustering"
    assert z_hits <= z_total // 2, (z_hits, z_total)

    # the 2-D box sink_zorder_prune itself reads: both prune, z at
    # least as hard (it clusters both dims; the sort serves only one).
    z2, _ = _files_hit(zpath, custkey_rng=(0, 1000), date_rng=d)
    l2, _ = _files_hit(lpath, custkey_rng=(0, 1000), date_rng=d)
    assert z2 <= l2, (z2, l2)
