"""Spark 4 Python Data Source: split planning + row contract."""
import hashlib

from fashion_knowledge_graph_spark.sources.pysource import (
    LANGS, SynthDocsReader, register,
)


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_partition_planning_covers_range_disjointly():
    r = SynthDocsReader(n=103, partitions=8)
    parts = r.partitions()
    assert len(parts) == 8
    seen = []
    for p in parts:
        seen.extend(range(p.start, p.end))
    assert seen == list(range(103))


def test_source_rows_match_contract(spark):
    register(spark)
    df = (spark.read.format("fkg_synth")
          .option("n", 50).option("partitions", 4).load())
    rows = {r["doc_id"]: (r["lang"], r["score"]) for r in df.collect()}
    assert len(rows) == 50
    for i in range(50):
        lang = LANGS[_h60(f"synth:lang:{i}") % len(LANGS)]
        score = (_h60(f"synth:score:{i}") % 1000000) / 1000000.0
        assert rows[i] == (lang, score)
