"""Custom Python DataSource (Spark 4.x ``pyspark.sql.datasource``) —
the extension surface for sources Spark has no connector for (internal
REST services, bespoke binary formats, synthetic generators).

The engine-relevant parts this demonstrates:
  - ``partitions()`` plans the read's PARALLELISM: each InputPartition
    is shipped to an executor and read independently — the source
    scales out like any file scan (here: contiguous id ranges; for a
    paged API it would be page tokens; for a custom format, byte
    ranges).
  - ``read()`` yields plain tuples through Arrow back to the JVM. This
    is Python-per-row territory — fine for control-plane-sized feeds;
    for bulk data implement the Arrow-batch variant or land files and
    use a native scan.

The generator itself is deterministic (md5 of the row id), so the
source is oracle-checkable — a custom source whose content both
engines can agree on bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _row(i: int) -> tuple:
    import hashlib

    h = hashlib.md5(str(i).encode()).hexdigest()
    return (i, h, int(h[:4], 16))


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SynthDocsReader(DataSourceReader):
    """Deterministic synthetic feed: (id, md5(id), first-4-hex bucket).

    Two wire formats, chosen by option("arrow", "true"|"false"):
    per-row tuples (simple, control-plane economics) or
    pyarrow.RecordBatch per partition — the BULK path: one columnar
    batch crosses Python->JVM instead of N pickled rows."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.parts = int(options.get("parts", 4))
        self.arrow = str(options.get("arrow", "false")).lower() == "true"

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [_IdRange(i, min(i + step, self.n)) for i in range(0, self.n, step)]

    def read(self, part: _IdRange):
        rows = [_row(i) for i in range(part.start, part.end)]
        if not self.arrow:
            yield from rows
            return
        import pyarrow as pa

        ids, hs, buckets = zip(*rows) if rows else ((), (), ())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(hs, pa.string()),
                pa.array(buckets, pa.int64()),
            ],
            names=["id", "h", "bucket"],
        )


def register(spark) -> None:
    spark.dataSource.register(SynthDocsSource)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read of the same deterministic feed:
    each micro-batch is one page of `page` ids; the OFFSET ({"pos": n})
    is the exactly-once contract — Spark checkpoints it, and a crashed
    epoch is re-read via readBetweenOffsets with the SAME bounds, so
    replay produces identical rows (the property the idempotence test
    asserts). This is the shape of a custom Kafka-less queue/API tailer."""

    def __init__(self, options):
        self.page = int(options.get("page", 5))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        end = start["pos"] + self.page
        return iter([_row(i) for i in range(start["pos"], end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(start["pos"], end["pos"])])


class SynthDocsSource(DataSource):
    """spark.read.format("synth_docs").option("n", N).option("parts", P)
    — batch; spark.readStream.format("synth_docs").option("page", K)
    — micro-batched stream over the same feed."""

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str:
        return "id long, h string, bucket long"

    def reader(self, schema):
        return _SynthDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return _SynthStreamReader(self.options)
