"""Custom Python Data Source (Spark 4 DataSource API).

The connector surface of the engine beyond file formats: a
`pyspark.sql.datasource.DataSource` with REAL partition planning —
the driver splits the key range into `partitions` input splits, each
executor reads only its split, and no data ever routes through the
driver. The row contract is a pure function of the row id (portable
60-bit md5), so the driver oracle replays the whole source with
`generate_series` + the same md5 arithmetic — the strongest check a
synthetic source can have: the CONNECTOR (schema, option handling,
split planning, per-split generation) is what's actually under test.

Shape mirrors production sources (JDBC ranges, Kafka topic-partitions,
Iceberg manifests): plan splits on the driver, generate/read rows
inside each split, never collect.
"""
from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition,
)

LANGS = ("en", "de", "fr", "es", "zh")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class SynthDocsDataSource(DataSource):
    """``spark.read.format("fkg_synth").option("n", …)`` source.

    Options: ``n`` rows (default 1000), ``partitions`` splits
    (default 8). Row i = (doc_id=i, lang=md5-bucket, score=md5-unit).
    """

    @classmethod
    def name(cls) -> str:
        return "fkg_synth"

    def schema(self) -> str:
        return "doc_id bigint, lang string, score double"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(
            int(self.options.get("n", 1000)),
            int(self.options.get("partitions", 8)))


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthDocsReader(DataSourceReader):
    def __init__(self, n: int, partitions: int):
        self.n, self.partitions_n = n, max(1, partitions)

    def partitions(self):
        step = -(-self.n // self.partitions_n)  # ceil div
        return [_Range(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, part: _Range):
        for i in range(part.start, part.end):
            lang = LANGS[_h60(f"synth:lang:{i}") % len(LANGS)]
            score = (_h60(f"synth:score:{i}") % 1000000) / 1000000.0
            yield (i, lang, score)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
