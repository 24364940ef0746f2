"""RDB-to-RDF direct mapping: relational rows -> (subj, pred, obj).

W3C's Direct Mapping (https://www.w3.org/TR/rdb-direct-mapping/)
bootstraps a KG from existing warehouse tables: each row becomes an
IRI subject `<table#pk>`, each column a literal triple
`<table#col>`, each foreign key a reference triple whose object is
the referenced row's IRI. The reference builds its graph only from
extraction output; a production KG-construction pipeline also lifts
the structured side of the business (customers, orders, reference
dims) into the same triple space so BGP/path queries span both.

Scale design: the mapping is a PURE PROJECTION — one narrow scan of
the source table, an array-of-struct literal exploded into the triple
arms. Zero joins, zero shuffles, zero UDFs; Catalyst prunes the scan
to exactly the mapped columns and the explode pipelines inside one
WholeStageCodegen. At 10^12 rows this runs at I/O speed, which is the
point: direct mapping must never be the bottleneck next to extraction.

NULL handling follows the spec: a NULL column simply emits no triple
(filtered after the explode, still codegen-side). Numeric columns take
an explicit printf-style format so the literal form is engine-portable
rather than at the mercy of float-to-string shortest-repr rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def direct_map(df: DataFrame, table: str, pk: str,
               literal_cols: list[str] | None = None,
               fk_map: dict[str, str] | None = None,
               formats: dict[str, str] | None = None) -> DataFrame:
    """One scan -> (subj, pred, obj) triples for a relational table.

    ``literal_cols`` become `<table#col>` literal triples,
    ``fk_map`` maps fk column -> referenced table (object becomes
    `<ref_table#value>`), ``formats`` optionally gives a
    ``format_string`` pattern per column (e.g. ``"%.2f"`` for money)
    so the literal is deterministic across engines.
    """
    literal_cols = literal_cols or []
    fk_map = fk_map or {}
    formats = formats or {}
    subj = F.concat(F.lit(table + "#"), F.col(pk).cast("string"))

    def lit_obj(c: str):
        if c in formats:
            return F.format_string(formats[c], F.col(c))
        return F.col(c).cast("string")

    arms = [F.struct(F.lit(f"{table}#{c}").alias("pred"),
                     lit_obj(c).alias("obj"))
            for c in literal_cols]
    arms += [F.struct(F.lit(f"{table}#ref-{c}").alias("pred"),
                      F.concat(F.lit(ref + "#"),
                               F.col(c).cast("string")).alias("obj"))
             for c, ref in fk_map.items()]
    return (df.select(subj.alias("subj"),
                      F.explode(F.array(*arms)).alias("po"))
            .select("subj", "po.pred", "po.obj")
            .filter(F.col("obj").isNotNull()))
