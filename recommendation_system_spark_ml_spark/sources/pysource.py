"""Custom Python data source (Spark 4 DataSource API).

The extension point for sources Spark doesn't ship: internal feature
stores, billing APIs, bespoke file layouts. This one emits a
deterministic synthetic telemetry table -- (sample_id, sensor,
reading) over N partitioned id-ranges -- so the DuckDB oracle can
reproduce it formula-for-formula, proving the reader's partition
planning and row generation are exact.

Scale notes: partitions() returns one split per id-range, so Spark
schedules the generator in parallel exactly like file splits; a real
connector returns one partition per shard/page/segment the backend can
serve independently. The reader runs IN the Python worker (Arrow
batches back to the JVM), which is the documented cost of a Python
source -- format-native JVM sources stay preferred for hot paths.
"""

from __future__ import annotations

import sys

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# The registered DataSource class is cloudpickled to Python workers.
# Classes in importable modules pickle BY REFERENCE, so a worker whose
# sys.path lacks the repo root (driver launched from another cwd) fails
# with ModuleNotFoundError at create_data_source time. Forcing by-value
# pickling ships the class definition inside the pickle instead, making
# the source self-contained -- the same discipline a real connector
# wheel gets from being installed on every executor.
try:
    from pyspark import cloudpickle as _cloudpickle
except ImportError:  # cloudpickle moved around across Spark versions
    import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(sys.modules[__name__])

N_ROWS = 1000
N_PARTS = 8
SENSORS = ("temp", "hum", "pres", "volt")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticTelemetryReader(DataSourceReader):
    def partitions(self):
        step = N_ROWS // N_PARTS
        return [_RangePartition(i * step, min((i + 1) * step, N_ROWS))
                for i in range(N_PARTS)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, SENSORS[i % len(SENSORS)], float((i * i) % 97))


class SyntheticTelemetrySource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> str:
        return "sample_id bigint, sensor string, reading double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticTelemetryReader()

    def simpleStreamReader(self, schema):
        return SyntheticTelemetryStreamReader()


STREAM_STEP = 250  # rows emitted per micro-batch


class SyntheticTelemetryStreamReader:
    """Spark 4 SimpleDataSourceStreamReader: offset-tracked micro-batch
    reads over the same deterministic generator. Offsets are row ids,
    advancing STREAM_STEP per batch until N_ROWS, then stalling (empty
    batches, same offset) -- so processAllAvailable() terminates and
    replays are exact: readBetweenOffsets regenerates any range
    bit-for-bit, which is the recovery contract a real connector
    satisfies from its upstream log/cursor."""

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + STREAM_STEP, N_ROWS)
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the generator is stateless

    @staticmethod
    def _rows(lo: int, hi: int):
        # a copyable LIST ITERATOR, not a generator: Spark's prefetch
        # cache copy.copy()s the returned iterator when a later batch
        # replays from cache (datasource_internal.getCache); generators
        # can't be copied (planPartitions failure, replay path only),
        # while the runner also insists on a true iterator (next()),
        # not a bare sequence. iter(list) satisfies both.
        return iter([(i, SENSORS[i % len(SENSORS)], float((i * i) % 97))
                     for i in range(lo, hi)])


# --- jittered-arrival events stream (late-data confrontation) -------------

LATE_BLOCK = 64    # keep in sync with streaming/latedata.py ARRIVAL_BLOCK
LATE_BATCH = 200   # rows per micro-batch (latedata.BATCH_ROWS)


def _arrival_ordered_events(path: str):
    """(event_id, epoch_second) tuples in the deterministic jittered
    arrival order of streaming/latedata.py: block-local bijection
    i -> (5i+3) mod 64 on event_id. Loaded with pyarrow (driver side,
    bounded: the confrontation runs at sf0.001)."""
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["event_id", "ts"])
    ids = t.column("event_id").to_pylist()
    # epoch -> whole seconds, floor (matches unix_timestamp's
    # truncation on the batch path); divisor from the arrow unit, since
    # the file's TIMESTAMP(NANOS) may surface as ns OR us depending on
    # the pyarrow reader version.
    unit = t.schema.field("ts").type.unit
    div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    ns = t.column("ts").cast("int64").to_pylist()
    rows = []
    for i, n in zip(ids, ns):
        aseq = (i - i % LATE_BLOCK) + (5 * (i % LATE_BLOCK) + 3) % LATE_BLOCK
        rows.append((aseq, i, n // div))
    rows.sort()
    return [(i, es) for _, i, es in rows]


class JitteredEventsStreamReader:
    """Replays the events table in jittered arrival order, LATE_BATCH
    rows per micro-batch -- the real-stream twin of the watermark
    simulation in streaming/latedata.py."""

    def __init__(self, rows):
        self._rows = rows

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + LATE_BATCH, len(self._rows))
        return iter(self._rows[lo:hi]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows[start["next"]:end["next"]])

    def commit(self, end: dict) -> None:
        pass


class JitteredEventsSource(DataSource):
    """option("path", <sf_dir>/events.parquet) -> stream of
    (event_id, es) in deterministic jittered arrival order."""

    @classmethod
    def name(cls) -> str:
        return "jittered_events"

    def schema(self) -> str:
        return "event_id bigint, es bigint"

    def simpleStreamReader(self, schema):
        return JitteredEventsStreamReader(
            _arrival_ordered_events(self.options["path"]))
