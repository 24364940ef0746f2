import os

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.functions.zorder import (
    bucketize,
    zorder_by,
    zorder_key,
)
from fashion_knowledge_graph_spark.sources.tables import SnapshotTable


def _py_z(vals, bits=16):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


@pytest.fixture()
def grid(spark):
    # two INDEPENDENT uniform dims — the adversarial case for
    # single-column sorting (any linear order leaves the other dim
    # full-range in every file)
    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"))
    return df


def test_zorder_key_matches_python(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select("a", "b", zorder_key(
        [F.col("a"), F.col("b")]).alias("z")).collect()
    for r in out:
        assert r["z"] == _py_z([r["a"], r["b"]])


def test_bucketize_bounds_and_clamp(spark):
    df = spark.createDataFrame([(-5,), (0,), (500,), (1000,), (2000,)],
                               "v long")
    got = [r["b"] for r in
           df.select(bucketize("v", 0, 1000, 16).alias("b")).collect()]
    assert got[0] == 0 and got[1] == 0          # clamp low / lo
    assert got[3] == 65535 and got[4] == 65535  # hi / clamp high
    assert 0 < got[2] < 65535


def test_zorder_enables_multicolumn_pruning(spark, grid, tmp_path):
    specs = [("x", 0, 1000), ("y", 0, 1000)]

    lin = SnapshotTable(os.path.join(tmp_path, "linear"))
    lin.write(grid.repartitionByRange(16, "x").sortWithinPartitions("x"),
              mode="overwrite", stage="load", stats_cols=["x", "y"])
    zt = SnapshotTable(os.path.join(tmp_path, "zordered"))
    zt.write(zorder_by(grid, specs, num_files=16),
             mode="overwrite", stage="load", stats_cols=["x", "y"])

    # first dim: both layouts prune
    lin_x = lin.prune_files("x", lo=100, hi=150)
    z_x = zt.prune_files("x", lo=100, hi=150)
    assert len(lin_x[0]) < lin_x[1]
    assert len(z_x[0]) < z_x[1]

    # SECOND dim: linear sort cannot prune (every file spans all of
    # y); the z-ordered layout must drop at least half the files
    lin_y = lin.prune_files("y", lo=100, hi=150)
    z_y = zt.prune_files("y", lo=100, hi=150)
    assert len(lin_y[0]) == lin_y[1], "control: linear layout keeps all"
    assert len(z_y[0]) <= z_y[1] // 2, \
        f"z-order kept {len(z_y[0])}/{z_y[1]} files on the 2nd dim"

    # exactness: pruned read ≡ plain filter, on both dims
    expect = sorted(r["id"] for r in grid.filter(
        (F.col("y") >= 100) & (F.col("y") <= 150)).collect())
    got = sorted(r["id"] for r in
                 zt.read_where(spark, "y", lo=100, hi=150).collect())
    assert got == expect


def test_zorder_key_overflow_guard():
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2), F.lit(3), F.lit(4)], bits=16)
    with pytest.raises(ValueError):
        bucketize("v", 10, 10, 16)
