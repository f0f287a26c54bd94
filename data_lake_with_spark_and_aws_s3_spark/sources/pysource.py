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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SynthDocsReader(DataSourceReader):
    """Deterministic synthetic feed: (id, md5(id), first-4-hex bucket)."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [_IdRange(i, min(i + step, self.n)) for i in range(0, self.n, step)]

    def read(self, part: _IdRange):
        import hashlib

        for i in range(part.start, part.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, h, int(h[:4], 16))


class SynthDocsSource(DataSource):
    """spark.read.format("synth_docs").option("n", N).option("parts", P)"""

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str:
        return "id long, h string, bucket long"

    def reader(self, schema):
        return _SynthDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsSource)
