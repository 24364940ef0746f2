import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.skew import (
    repartition_by_range,
    salted_broadcast_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key — the head-attribute shape."""
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, "black")
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 37).cast("string")))
        .alias("color"),
        F.col("id").alias("row_id"))
    dim = spark.createDataFrame(
        [("black", 1), ("c1", 2), ("c2", 3), ("white", 4)],
        "color string, code int")
    return big, dim


def test_salted_join_equals_plain_join(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, "color").select("row_id", "code")
    salted = salted_broadcast_join(big, dim, ["color"]) \
        .select("row_id", "code")
    assert sorted(plain.collect()) == sorted(salted.collect())
    assert plain.count() > 4000   # the hot key really is hot


def test_salted_join_left(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, "color", "left").select("row_id", "code")
    salted = salted_broadcast_join(big, dim, ["color"], how="left") \
        .select("row_id", "code")
    assert sorted(plain.collect(), key=str) == \
        sorted(salted.collect(), key=str)


def test_salted_join_spreads_hot_key(spark, skewed):
    """The salt must actually split the hot key's rows across salt
    values (otherwise it's a no-op rename)."""
    big, dim = skewed
    n_salt = 8
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)).cast("int"))
    dist = salted_big.filter(F.col("color") == "black") \
        .groupBy("__salt").count().collect()
    assert len(dist) == n_salt
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)   # roughly even spread


def test_repartition_by_range(spark):
    df = spark.range(0, 1000).select(
        F.concat(F.lit("doc_"), F.col("id").cast("string")).alias("doc_id"))
    out = repartition_by_range(df, "doc_id", n=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 1000


def test_skew_profile_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.skew import skew_profile

    rows = [("hot",)] * 50 + [("warm",)] * 30 + [("a",)] * 10 + \
        [("b",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = [(r["key"], r["n_rows"], r["share"], r["cum_share"], r["rank"])
           for r in skew_profile(df, "k", top=3)
           .orderBy("rank").collect()]
    assert got == [
        ("hot", 50, round(0.5, 9), round(0.5, 9), 1),
        ("warm", 30, round(0.3, 9), round(0.8, 9), 2),
        ("a", 10, round(0.1, 9), round(0.9, 9), 3),   # tie → lex order
    ]


def test_rendezvous_assign_minimal_remap(spark):
    import hashlib

    from fashion_knowledge_graph_spark.operators.skew import (
        rendezvous_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(300)], "k long")
    s3 = ["a", "b", "c"]
    got3 = {r.k: r.shard for r in
            rendezvous_assign(df, "k", s3).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want3 = {i: max(s3, key=lambda s: (h60(f"{s}:{i}"), s))
             for i in range(300)}
    assert got3 == want3
    # roughly balanced
    import collections
    sizes = collections.Counter(got3.values())
    assert all(60 < sizes[s] < 140 for s in s3), sizes
    # remove shard 'c': ONLY c's keys move, everyone else stays put
    got2 = {r.k: r.shard for r in
            rendezvous_assign(df, "k", ["a", "b"]).collect()}
    for k, s in got3.items():
        if s != "c":
            assert got2[k] == s, k
    # validation
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one"):
        rendezvous_assign(df, "k", [])
    with _pytest.raises(ValueError, match="duplicate"):
        rendezvous_assign(df, "k", ["a", "a"])
