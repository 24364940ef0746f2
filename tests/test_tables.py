"""SnapshotTable Iceberg-contract extensions: manifest min/max data
skipping, incremental (CDC) append scans, generic MERGE upsert.

These are metadata-plane operations — at 100 TB the whole point is
that pruning and CDC planning never launch a Spark job; the tests pin
both the row-level semantics (vs. recomputed-from-scratch expected
sets) and the metadata behavior (files actually pruned, no data job
for planning).
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.sources.tables import SnapshotTable


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def test_minmax_pruning_skips_files(spark, tbl):
    # 8 range-clustered files over k=0..799: a 100-wide slice must
    # survive in ≤2 files (boundary rows may straddle one cut)
    df = spark.range(800).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    tbl.write(df.repartitionByRange(8, "k"), mode="overwrite",
              stage="load", stats_cols=["k"])

    kept, total = tbl.prune_files("k", 250, 349)
    assert total == 8
    assert 1 <= len(kept) <= 2

    out = tbl.read_where(spark, "k", 250, 349)
    got = sorted(r["k"] for r in out.collect())
    assert got == list(range(250, 350))
    # exactness must not depend on stats: same rows as full-scan filter
    full = sorted(r["k"] for r in
                  tbl.read(spark).filter("k between 250 and 349").collect())
    assert got == full


def test_minmax_pruning_timestamps(spark, tbl):
    base = datetime.datetime(2024, 1, 1)
    df = spark.range(400).select(
        (F.lit(base) + F.make_interval(hours=F.col("id"))).alias("ts"),
        F.col("id").alias("v"))
    tbl.write(df.repartitionByRange(4, "ts"), mode="overwrite",
              stage="load", stats_cols=["ts"])
    lo = base + datetime.timedelta(hours=100)
    hi = base + datetime.timedelta(hours=150)
    kept, total = tbl.prune_files("ts", lo, hi)
    assert total == 4 and len(kept) <= 2
    assert tbl.read_where(spark, "ts", lo, hi).count() == 51


def test_pruning_keeps_files_without_stats(spark, tbl):
    # first commit without stats_cols → bounds unknown → always kept
    df = spark.range(100).select(F.col("id").alias("k"))
    tbl.write(df, mode="overwrite", stage="load")
    kept, total = tbl.prune_files("k", 5, 6)
    assert kept and len(kept) == total
    assert tbl.read_where(spark, "k", 5, 6).count() == 2


def test_append_inherits_parent_bounds(spark, tbl):
    a = spark.range(100).select(F.col("id").alias("k"))
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    tbl.write(a.coalesce(1), mode="overwrite", stage="a", stats_cols=["k"])
    tbl.write(b.coalesce(1), mode="append", stage="b", stats_cols=["k"])
    kept, total = tbl.prune_files("k", 150, 160)
    assert total == 2 and len(kept) == 1
    assert tbl.read_where(spark, "k", 150, 160).count() == 11


def test_incremental_read_returns_appended_rows_only(spark, tbl):
    a = spark.range(10).select(F.col("id").alias("k"))
    b = spark.range(10, 25).select(F.col("id").alias("k"))
    c = spark.range(25, 30).select(F.col("id").alias("k"))
    s1 = tbl.write(a, mode="overwrite", stage="base")
    s2 = tbl.write(b, mode="append", stage="inc1")
    s3 = tbl.write(c, mode="append", stage="inc2")

    got = sorted(r["k"] for r in tbl.incremental_read(spark, s1).collect())
    assert got == list(range(10, 30))
    got12 = sorted(r["k"] for r in
                   tbl.incremental_read(spark, s1, s2).collect())
    assert got12 == list(range(10, 25))
    got23 = sorted(r["k"] for r in
                   tbl.incremental_read(spark, s2, s3).collect())
    assert got23 == list(range(25, 30))
    # empty range → empty result, same schema
    empty = tbl.incremental_read(spark, s3, s3)
    assert empty.count() == 0 and empty.columns == ["k"]


def test_incremental_read_rejects_overwrite_range(spark, tbl):
    a = spark.range(10).select(F.col("id").alias("k"))
    s1 = tbl.write(a, mode="overwrite", stage="base")
    tbl.write(a, mode="overwrite", stage="rebuild")
    with pytest.raises(ValueError, match="overwrite"):
        tbl.incremental_read(spark, s1)


def test_incremental_read_rejects_non_ancestor(spark, tbl):
    a = spark.range(10).select(F.col("id").alias("k"))
    tbl.write(a, mode="append", stage="base")
    tbl.write(a, mode="append", stage="inc")
    with pytest.raises(ValueError, match="not an ancestor"):
        tbl.incremental_read(spark, 99)


def test_merge_upsert_semantics(spark, tbl):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double")
    src = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)],
        "k int, name string, v double")
    tbl.write(base, mode="overwrite", stage="load")
    tbl.merge(spark, src, ["k"])
    got = sorted(map(tuple, tbl.read(spark).collect()))
    assert got == [(1, "a", 10.0), (2, "B", 99.0),
                   (3, "c", 30.0), (4, "d", 40.0)]
    # time travel still shows pre-merge state
    pre = sorted(r["name"] for r in tbl.read(spark, 1).collect())
    assert pre == ["a", "b", "c"]


def test_prune_is_metadata_only(spark, tbl):
    """planFiles contract: pruning must not launch a Spark job."""
    df = spark.range(100).select(F.col("id").alias("k"))
    tbl.write(df.repartitionByRange(4, "k"), mode="overwrite",
              stage="load", stats_cols=["k"])
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    tbl.prune_files("k", 10, 20)
    tbl.prune_files("k", None, 5)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)


def test_prune_open_ended_bounds(spark, tbl):
    df = spark.range(100).select(F.col("id").alias("k"))
    tbl.write(df.repartitionByRange(4, "k"), mode="overwrite",
              stage="load", stats_cols=["k"])
    kept_lo, total = tbl.prune_files("k", lo=80)
    kept_hi, _ = tbl.prune_files("k", hi=10)
    assert total == 4 and len(kept_lo) == 1 and len(kept_hi) == 1
    assert tbl.read_where(spark, "k", lo=80).count() == 20
    assert tbl.read_where(spark, "k", hi=10).count() == 11


def test_schema_evolution_add_column(spark, tbl):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    s1 = tbl.write(base, mode="overwrite", stage="load")
    evolved = spark.createDataFrame(
        [(3, "c", 9.5)], "k int, v string, score double")
    tbl.write(evolved, mode="append", stage="evolve")

    cur = tbl.read(spark)
    assert cur.columns == ["k", "v", "score"]
    got = {r["k"]: r["score"] for r in cur.collect()}
    assert got == {1: None, 2: None, 3: 9.5}
    # time travel sees the PRE-evolution schema (Iceberg semantics)
    old = tbl.read(spark, s1)
    assert old.columns == ["k", "v"] and old.count() == 2


def test_read_uses_manifest_schema_not_inference(spark, tbl):
    # explicit-schema reads must round-trip types exactly
    from pyspark.sql.types import StructType

    df = spark.createDataFrame(
        [(1, 2.5, "x")], "k bigint, v double, s string")
    tbl.write(df, mode="overwrite", stage="load")
    m = tbl._manifest(1)
    assert StructType.fromJson(m["schema"]) == df.schema
    assert tbl.read(spark).schema == df.schema


def test_compact_merges_small_files(spark, tbl):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(200)],
                               "k int, v string")
    for i in range(5):
        tbl.write(df.filter(F.col("k") % 5 == i).repartition(4),
                  mode="append" if i else "overwrite", stage="ingest")
    pre_sid = tbl.current_snapshot()
    pre_files = tbl._manifest(pre_sid)["files"]
    assert len(pre_files) == 20

    sid = tbl.compact(spark)
    post = tbl._manifest(sid)["files"]
    assert len(post) < len(pre_files)
    # content row-identical
    assert sorted(map(tuple, tbl.read(spark).collect())) == \
        sorted(map(tuple, df.collect()))
    # time travel still reads the pre-compact layout
    assert sorted(map(tuple, tbl.read(spark, pre_sid).collect())) == \
        sorted(map(tuple, df.collect()))
    # compaction is an overwrite: incremental reads across it refuse
    with pytest.raises(ValueError):
        tbl.incremental_read(spark, from_snapshot=pre_sid)


def test_compact_auto_target_and_stats(spark, tbl):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k int")
    for i in range(4):
        tbl.write(df.filter((F.col("k") % 4) == i).repartition(3),
                  mode="append" if i else "overwrite", stage="ingest")
    # tiny files + 128 MB target → exactly 1 output file
    sid = tbl.compact(spark, stats_cols=["k"])
    m = tbl._manifest(sid)
    assert len(m["files"]) == 1
    # stats re-recorded: pruning works after compaction
    kept, total = tbl.prune_files("k", lo=2000, hi=3000)
    assert total == 1 and kept == []
    assert tbl.read_where(spark, "k", lo=10, hi=20).count() == 11


def test_compact_empty_table_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "nothing"))
    with pytest.raises(FileNotFoundError):
        t.compact(spark)


def test_expire_keeps_files_shared_with_retained_appends(spark, tbl):
    df = spark.createDataFrame([(i,) for i in range(30)], "k int")
    for i in range(3):
        tbl.write(df.filter(F.col("k") % 3 == i),
                  mode="append" if i else "overwrite", stage="ingest")
    s1 = 1
    res = tbl.expire_snapshots(keep_last=1)
    # append manifests are cumulative: every data file of s1/s2 is
    # still referenced by s3 → NOTHING may be physically deleted
    assert res["expired"] == [1, 2] and res["files_deleted"] == 0
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == \
        list(range(30))
    with pytest.raises(FileNotFoundError):
        tbl.read(spark, s1)          # expired → no more time travel
    assert tbl.snapshots() == [3]


def test_expire_reclaims_superseded_rewrites(spark, tbl):
    df = spark.createDataFrame([(i,) for i in range(100)], "k int")
    tbl.write(df, mode="overwrite", stage="load")
    tbl.delete_where(spark, F.col("k") >= 50)     # copy-on-write rewrite
    res = tbl.expire_snapshots(keep_last=1)
    assert res["expired"] == [1]
    assert res["files_deleted"] > 0 and res["bytes"] > 0
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == \
        list(range(50))
    # lineage of the current content survives the expired ancestor
    assert tbl.lineage_current()


def test_expire_after_compact_drops_small_files(spark, tbl):
    df = spark.createDataFrame([(i,) for i in range(60)], "k int")
    for i in range(3):
        tbl.write(df.filter(F.col("k") % 3 == i).repartition(4),
                  mode="append" if i else "overwrite", stage="ingest")
    import os
    n_files_before = sum(len(fs) for _, _, fs in os.walk(tbl.data_dir))
    tbl.compact(spark)
    res = tbl.expire_snapshots(keep_last=1)
    n_files_after = sum(len(fs) for _, _, fs in os.walk(tbl.data_dir))
    assert res["files_deleted"] == 12          # all pre-compact files
    assert n_files_after < n_files_before
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == \
        list(range(60))


def test_count_rows_is_metadata_only(spark, tbl):
    df = spark.createDataFrame([(i,) for i in range(123)], "k int")
    tbl.write(df.repartition(4), mode="overwrite", stage="load")
    tbl.write(spark.createDataFrame([(i,) for i in range(7)], "k int"),
              mode="append", stage="more")
    # no active jobs needed: pure manifest arithmetic
    before = spark.sparkContext.statusTracker().getJobIdsForGroup()
    assert tbl.count_rows() == 130
    assert tbl.count_rows(1) == 123          # time-travel count
    after = spark.sparkContext.statusTracker().getJobIdsForGroup()
    assert before == after
    # and stays correct across rewrites
    tbl.delete_where(spark, F.col("k") >= 100)
    assert tbl.count_rows() == tbl.read(spark).count()


def test_write_audit_publish_flow(spark, tbl):
    good = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    tbl.write(good, mode="overwrite", stage="load")

    # stage a bad batch: published readers must NOT see it
    bad = spark.createDataFrame([(3, -1.0)], "k int, v double")
    staged_bad = tbl.write_staged(bad, stage="candidate")
    assert tbl.current_snapshot() == 1
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == [1, 2]
    # the audit runs against the staged snapshot and rejects it
    audit = tbl.read(spark, staged_bad)
    assert audit.filter(F.col("v") < 0).count() > 0

    # stage a good batch, audit passes, publish atomically
    fixed = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)],
                                  "k int, v double")
    staged_ok = tbl.write_staged(fixed, stage="candidate")
    assert tbl.read(spark, staged_ok).filter(F.col("v") < 0).count() == 0
    tbl.publish(staged_ok)
    assert tbl.current_snapshot() == staged_ok
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == [1, 2, 3]

    # a later append allocates past the staged ids (no manifest clash)
    tbl.write(spark.createDataFrame([(4, 40.0)], "k int, v double"),
              mode="append", stage="more")
    assert tbl.current_snapshot() == 4
    assert tbl.count_rows() == 4


def test_write_staged_on_empty_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "wap_new"))
    sid = t.write_staged(spark.createDataFrame([(1,)], "k int"))
    assert t.current_snapshot() is None       # still unpublished
    t.publish(sid)
    assert t.read(spark).count() == 1


def test_diff_append_fast_path_and_rewrite_path(spark, tbl):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)],
                               "k int, v string")
    tbl.write(df, mode="overwrite", stage="load")
    tbl.write(spark.createDataFrame([(100, "new")], "k int, v string"),
              mode="append", stage="more")
    # append-only range → insert-only feed (manifest fast path)
    d = tbl.diff(spark, 1).collect()
    assert [(r["k"], r["op"]) for r in d] == [(100, "insert")]

    tbl.delete_where(spark, F.col("k") < 5)      # rewrite in range
    d2 = {(r["k"], r["op"]) for r in tbl.diff(spark, 1).collect()}
    assert d2 == {(100, "insert")} | {(i, "delete") for i in range(5)}
    # bounded window AFTER the rewrite works too
    assert tbl.diff(spark, 2).count() == 5


def test_diff_multiset_semantics(spark, tbl):
    dup = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")],
                                "k int, v string")
    tbl.write(dup, mode="overwrite", stage="load")
    tbl.write(spark.createDataFrame([(1, "x")], "k int, v string"),
              mode="overwrite", stage="rewrite")
    d = [(r["k"], r["op"]) for r in tbl.diff(spark, 1).collect()]
    # one (1,x) survives; the OTHER copy and (2,y) are deletes
    assert sorted(d) == [(1, "delete"), (2, "delete")]


def test_rollback_restores_state_and_keeps_history(spark, tbl):
    df1 = spark.range(10).select(F.col("id").alias("k"))
    good = tbl.write(df1, mode="overwrite", stage="load")
    bad = tbl.write(spark.range(100, 103).select(F.col("id").alias("k")),
                    mode="append", stage="corrupt")
    rb = tbl.rollback(good)
    # pure metadata: CURRENT content equals the good snapshot exactly
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == \
        list(range(10))
    assert tbl.count_rows() == 10 and tbl.count_rows(bad) == 13
    # the bad snapshot remains time-travelable
    assert sorted(r["k"] for r in
                  tbl.read(spark, snapshot_id=bad).collect()) == \
        list(range(10)) + [100, 101, 102]
    # rollback is itself a commit: parent chain records the audit
    m = tbl._manifest(rb)
    assert m["mode"] == "rollback" and m["rollback_of"] == good
    assert m["parent"] == bad
    # appends continue normally after a rollback
    tbl.write(spark.range(200, 202).select(F.col("id").alias("k")),
              mode="append", stage="more")
    assert tbl.count_rows() == 12


def test_rollback_then_expire_protects_shared_files(spark, tbl):
    df1 = spark.range(5).select(F.col("id").alias("k"))
    good = tbl.write(df1, mode="overwrite", stage="load")
    tbl.write(spark.range(50, 52).select(F.col("id").alias("k")),
              mode="append", stage="bad")
    tbl.rollback(good)
    res = tbl.expire_snapshots(keep_last=1)
    # the rollback manifest references the good snapshot's files, so
    # expiry must NOT reclaim them; the bad append's extra files go
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == \
        list(range(5))
    assert res["files_deleted"] >= 1


def test_rollback_to_expired_snapshot_raises(spark, tbl):
    import pytest as _pytest

    s1 = tbl.write(spark.range(3).select(F.col("id").alias("k")),
                   mode="overwrite", stage="a")
    tbl.write(spark.range(3).select(F.col("id").alias("k")),
              mode="overwrite", stage="b")
    tbl.expire_snapshots(keep_last=1)
    with _pytest.raises(FileNotFoundError):
        tbl.rollback(s1)
