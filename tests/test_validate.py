import pytest

from fashion_knowledge_graph_spark.operators.validate import (
    check_constraints,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 10, "A", "x1", 100),
        (2, 99, "A", "x2", 100),     # qty out of range
        (3, None, "B", "x3", 200),   # null qty
        (4, 20, "C", "bad", 200),    # enum + regex violation
        (4, 30, "A", "x4", 999),     # dup id + orphan fk
    ]
    return spark.createDataFrame(
        rows, "id long, qty long, flag string, code string, fk long")


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(100,), (200,)], "k long")


def test_check_constraints_all_rule_types(spark, df, ref):
    rules = [
        {"name": "id_not_null", "type": "not_null", "col": "id"},
        {"name": "qty_not_null", "type": "not_null", "col": "qty"},
        {"name": "qty_1_50", "type": "range", "col": "qty",
         "min": 1, "max": 50},
        {"name": "flag_enum", "type": "enum", "col": "flag",
         "values": ["A", "B"]},
        {"name": "code_shape", "type": "regex", "col": "code",
         "pattern": "^x[0-9]+$"},
        {"name": "id_unique", "type": "unique", "cols": ["id"]},
        {"name": "fk_valid", "type": "foreign_key", "col": "fk",
         "ref": ref, "ref_col": "k"},
    ]
    got = {r.constraint: (r.violations, r.passed)
           for r in check_constraints(df, rules).collect()}
    assert got == {
        "id_not_null": (0, True),
        "qty_not_null": (1, False),
        "qty_1_50": (1, False),      # null qty is NOT a range violation
        "flag_enum": (1, False),
        "code_shape": (1, False),
        "id_unique": (1, False),     # one extra row beyond first id=4
        "fk_valid": (1, False),      # fk=999
    }


def test_check_constraints_composite_unique_and_clean_pass(spark, df, ref):
    rules = [
        {"name": "id_qty_unique", "type": "unique",
         "cols": ["id", "qty"]},     # (4,20) vs (4,30) differ -> ok
        {"name": "fk_not_null", "type": "not_null", "col": "fk"},
    ]
    got = {r.constraint: (r.violations, r.passed)
           for r in check_constraints(df, rules).collect()}
    assert got == {"id_qty_unique": (0, True), "fk_not_null": (0, True)}


def test_check_constraints_single_agg_job(spark, df):
    # every row-level + unique rule compiles into ONE aggregate: the
    # plan contains exactly one pair of HashAggregates (partial+final)
    rules = [
        {"name": "a", "type": "not_null", "col": "id"},
        {"name": "b", "type": "range", "col": "qty", "min": 0,
         "max": 100},
        {"name": "c", "type": "enum", "col": "flag",
         "values": ["A", "B", "C"]},
    ]
    out = check_constraints(df, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2, plan


def test_check_constraints_validation_errors(spark, df):
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(df, [
            {"name": "x", "type": "not_null", "col": "id"},
            {"name": "x", "type": "not_null", "col": "qty"}])
    with pytest.raises(ValueError, match="unknown rule type"):
        check_constraints(df, [{"name": "y", "type": "nope",
                                "col": "id"}])


def test_profile_table_stats(spark):
    from fashion_knowledge_graph_spark.operators.validate import (
        profile_table,
    )
    rows = [(1, "a", 1.5), (2, "b", None), (3, "a", 2.5), (4, None, 0.5)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r.column_name: r for r in
           profile_table(df, ["id", "s", "v"]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_null == 0
    assert got["id"].n_distinct == 4
    assert (got["id"].min_val, got["id"].max_val) == ("1", "4")
    assert got["s"].n_null == 1 and got["s"].null_frac == 0.25
    assert got["s"].n_distinct == 2      # nulls not counted as distinct
    assert (got["s"].min_val, got["s"].max_val) == ("a", "b")
    assert (got["v"].min_val, got["v"].max_val) == ("0.5", "2.5")
