import os

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.sources.matview import IncrementalMV
from fashion_knowledge_graph_spark.sources.tables import SnapshotTable


def _mk(spark, tmp, n=300):
    src = SnapshotTable(os.path.join(tmp, "src"))
    mv = IncrementalMV(src, os.path.join(tmp, "mv"),
                       keys=["k"], sum_cols=["v"])
    df = spark.createDataFrame(
        [(i, i % 7, (i * 13) % 100) for i in range(n)],
        "i long, k long, v long")
    return src, mv, df


def _full(df):
    return {(r["k"]): (r["n"], r["s"]) for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("v").alias("s")).collect()}


def test_mv_incremental_equals_full_recompute(spark, tmp_path):
    src, mv, df = _mk(spark, str(tmp_path))
    for i in range(4):
        src.write(df.filter(F.col("i") % 4 == i).drop("i"),
                  mode="append" if i else "overwrite", stage="cdc")
        mv.refresh(spark)
        got = {r["k"]: (r["n_rows"], r["sum_v"])
               for r in mv.read(spark).collect()}
        want = _full(df.filter(F.col("i") % 4 <= i))
        assert got == want


def test_mv_refresh_is_o_delta_not_full_scan(spark, tmp_path,
                                             monkeypatch):
    """After the first build, refresh must NEVER read the full source
    — poison SnapshotTable.read for the SOURCE table and fold two more
    appends through incremental_read alone."""
    src, mv, df = _mk(spark, str(tmp_path))
    src.write(df.filter(F.col("i") % 3 == 0).drop("i"),
              mode="overwrite", stage="cdc")
    mv.refresh(spark)

    real_read = SnapshotTable.read

    def poisoned(self, spark_, snapshot_id=None):
        if self.root == src.root and snapshot_id is None:
            raise AssertionError("full source scan during incremental "
                                 "refresh")
        return real_read(self, spark_, snapshot_id)

    monkeypatch.setattr(SnapshotTable, "read", poisoned)
    for i in (1, 2):
        src.write(df.filter(F.col("i") % 3 == i).drop("i"),
                  mode="append", stage="cdc")
        mv.refresh(spark)
    monkeypatch.setattr(SnapshotTable, "read", real_read)
    assert {r["k"]: (r["n_rows"], r["sum_v"])
            for r in mv.read(spark).collect()} == _full(df)


def test_mv_refresh_noop_and_avg_derivation(spark, tmp_path):
    src, mv, df = _mk(spark, str(tmp_path))
    src.write(df.drop("i"), mode="overwrite", stage="load")
    sid = mv.refresh(spark)
    n_snaps = len(mv.table.snapshots())
    assert mv.refresh(spark) == sid            # source unchanged
    assert len(mv.table.snapshots()) == n_snaps  # ... and no commit
    row = {r["k"]: r for r in mv.read(spark).collect()}
    for k, r in row.items():
        assert r["avg_v"] == pytest.approx(r["sum_v"] / r["n_rows"])


def test_mv_on_empty_source_raises(spark, tmp_path):
    src = SnapshotTable(os.path.join(str(tmp_path), "none"))
    mv = IncrementalMV(src, os.path.join(str(tmp_path), "mv"),
                       keys=["k"], sum_cols=["v"])
    with pytest.raises(FileNotFoundError):
        mv.refresh(spark)


def test_mv_refresh_survives_source_compaction_and_expiry(spark,
                                                          tmp_path):
    """A source rewrite (compact) between refreshes makes the
    incremental range undefined — refresh must fall back to a full
    rebuild and stay correct, likewise when the last-refresh snapshot
    was expired."""
    src, mv, df = _mk(spark, str(tmp_path))
    src.write(df.filter(F.col("i") % 2 == 0).drop("i").repartition(4),
              mode="overwrite", stage="load")
    mv.refresh(spark)

    src.write(df.filter(F.col("i") % 2 == 1).drop("i").repartition(4),
              mode="append", stage="cdc")
    src.compact(spark)                      # rewrite between refreshes
    mv.refresh(spark)
    assert {r["k"]: (r["n_rows"], r["sum_v"])
            for r in mv.read(spark).collect()} == _full(df)

    src.write(spark.createDataFrame([(99, 7)], "k long, v long"),
              mode="append", stage="late")
    src.expire_snapshots(keep_last=1)       # expire the refresh point
    mv.refresh(spark)
    want = _full(df)
    want[99] = (1, 7)
    assert {r["k"]: (r["n_rows"], r["sum_v"])
            for r in mv.read(spark).collect()} == want


def test_mv_kmv_distinct_incremental_equals_full(spark, tmp_path):
    """The KMV merge property: folding per-delta k-smallest arrays
    must yield EXACTLY the k smallest hashes of the union — so the
    incremental estimate is bit-identical to a one-shot sketch of all
    data. Groups under k values report exact counts."""
    from fashion_knowledge_graph_spark.operators.sketches import (
        kmv_distinct,
    )
    src = SnapshotTable(os.path.join(str(tmp_path), "src"))
    mv = IncrementalMV(src, os.path.join(str(tmp_path), "mv"),
                       keys=["k"], sum_cols=["v"],
                       distinct_cols=["u"], kmv_k=16)
    # group 0: ~150 distinct users (sketch saturates); group 1: 5
    # (exact short-circuit); group 2 has nulls only in one delta
    rows = [(i, 0, i % 997, i * 3 % 100) for i in range(300)]
    rows += [(i + 1000, 1, i % 5, 7) for i in range(40)]
    rows += [(2000, 2, None, 1), (2001, 2, 42, 1)]
    df = spark.createDataFrame(rows, "i long, k long, u long, v long")
    for step in range(3):
        src.write(df.filter(F.col("i") % 3 == step).drop("i"),
                  mode="append" if step else "overwrite", stage="cdc")
        mv.refresh(spark)
    got = {r["k"]: r for r in mv.read(spark).collect()}
    # one-shot sketch over ALL the data, same k
    want = {r["k"]: r for r in
            kmv_distinct(df, ["k"], "u", k=16).collect()}
    for k in (0, 1, 2):
        # kmv_distinct rounds its estimate to 4 decimals; the MV
        # exposes the raw double — same arithmetic either way
        assert round(got[k]["distinct_est_u"], 4) == \
            want[k]["n_distinct_kmv"]
    assert got[1]["distinct_est_u"] == 5.0      # exact below k
    assert got[2]["distinct_est_u"] == 1.0      # nulls never counted
    # stored state is capped at k hashes
    assert all(len(got[k]["kmv_u"]) <= 16 for k in (0, 1, 2))
    # sums/counts still exact alongside the sketch
    assert got[1]["n_rows"] == 40 and got[1]["sum_v"] == 280
