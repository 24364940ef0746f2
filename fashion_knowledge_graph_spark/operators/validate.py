"""Declarative constraint validation compiled to ONE aggregate pass.

The production data-quality gate (Great Expectations / Deequ shape):
a rule list declares what must hold; the validator compiles every
row-level rule into a conditional-sum expression and runs them ALL in
a single partial-agg'd aggregation job — at 10^12 rows the difference
between one scan and one-scan-per-rule IS the feature. Set-level
rules (uniqueness via count−countDistinct) ride the same aggregate;
only referential integrity needs its own (anti-join) pass, one per
FK rule, shuffling on the key alone.

Rule forms (dicts):
  {"name", "type": "not_null",  "col"}
  {"name", "type": "range",     "col", "min", "max"}   # inclusive
  {"name", "type": "enum",      "col", "values": [...]}
  {"name", "type": "regex",     "col", "pattern"}      # full match
  {"name", "type": "unique",    "cols": [...]}         # composite ok
  {"name", "type": "foreign_key", "col", "ref": DataFrame,
   "ref_col"}

``violations`` counts ROWS that break the rule (a NULL in a range /
enum / regex column is NOT a violation of that rule — declare a
not_null rule when nulls are illegal; this keeps each rule's meaning
single and composable). For unique, violations = rows beyond the
first of each duplicated key (count − distinct count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_violation(rule) -> "F.Column":
    c = F.col(rule["col"])
    t = rule["type"]
    if t == "not_null":
        bad = c.isNull()
    elif t == "range":
        bad = c.isNotNull() & ((c < F.lit(rule["min"]))
                               | (c > F.lit(rule["max"])))
    elif t == "enum":
        bad = c.isNotNull() & ~c.isin(*rule["values"])
    elif t == "regex":
        bad = c.isNotNull() & ~c.rlike(rule["pattern"])
    else:  # pragma: no cover - guarded by check_constraints
        raise ValueError(f"unknown row rule type: {t}")
    return F.sum(bad.cast("long")).alias(rule["name"])


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Run every rule → ``(constraint, violations, passed)``, one row
    per rule in DECLARATION order (``ord`` column dropped; order is
    carried by the constraint name being unique)."""
    seen = set()
    for r in rules:
        if r["name"] in seen:
            raise ValueError(f"duplicate constraint name: {r['name']}")
        seen.add(r["name"])

    aggs = []
    for r in rules:
        if r["type"] in ("not_null", "range", "enum", "regex"):
            aggs.append(_row_violation(r))
        elif r["type"] == "unique":
            # struct-wrap the key: countDistinct drops rows where ANY
            # argument is null, but a row with a null key column is
            # still a row that can collide — the struct container is
            # never null, so distinct counting stays null-safe
            key = F.struct(*[F.col(c) for c in r["cols"]])
            aggs.append(
                (F.count(F.lit(1))
                 - F.countDistinct(key)).alias(r["name"]))
        elif r["type"] != "foreign_key":
            raise ValueError(f"unknown rule type: {r['type']}")

    frames = []
    if aggs:
        one = df.agg(*aggs)
        names = [r["name"] for r in rules
                 if r["type"] in ("not_null", "range", "enum",
                                  "regex", "unique")]
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        frames.append(one.select(F.expr(
            f"stack({len(names)}, {stack}) AS (constraint, violations)")))

    for r in rules:
        if r["type"] != "foreign_key":
            continue
        orphans = (df.select(F.col(r["col"]))
                   .filter(F.col(r["col"]).isNotNull())
                   .join(r["ref"].select(
                       F.col(r["ref_col"]).alias(r["col"])).distinct(),
                       r["col"], "left_anti"))
        frames.append(orphans.agg(
            F.lit(r["name"]).alias("constraint"),
            F.count(F.lit(1)).alias("violations")))

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("constraint",
                      F.col("violations").cast("long").alias("violations"),
                      (F.col("violations") == 0).alias("passed"))


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column statistics → one row per column:
    ``(column, n_rows, n_null, null_frac, n_distinct, min_val,
    max_val)`` (min/max rendered as strings so heterogeneous column
    types share one report schema).

    The optimizer-stats shape (Spark's ANALYZE TABLE ... FOR COLUMNS,
    DuckDB/Postgres pg_stats): null fraction and NDV drive join
    ordering and selectivity estimates; min/max seed range pruning.
    All row-level stats ride ONE aggregate pass; the per-column
    DISTINCT counts are exact (each one is its own partial-agg lane —
    Spark plans multi-distinct with one expand, still a single job).
    At 10^12 rows swap the exact NDVs for the KMV sketch
    (``operators/sketches.kmv_distinct``) — the report schema is
    unchanged, which is the point of the string rendering.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    arms = ", ".join(
        f"'{c}', `__null_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols)
    return one.select(
        F.col("__n").alias("n_rows"),
        F.expr(f"stack({len(cols)}, {arms}) AS "
               "(column_name, n_null, n_distinct, min_val, max_val)")) \
        .select("column_name", "n_rows", "n_null",
                F.round(F.col("n_null") / F.col("n_rows"), 6)
                .alias("null_frac"),
                "n_distinct", "min_val", "max_val")
