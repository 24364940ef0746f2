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
