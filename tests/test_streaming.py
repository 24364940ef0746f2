import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.plans.pipeline import KGPipeline
from fashion_knowledge_graph_spark.streaming import incremental as st


@pytest.fixture(scope="module")
def docs_stream_dir(spark, docs_df, tmp_path_factory):
    """Docs split into several parquet files = several stream batches."""
    d = str(tmp_path_factory.mktemp("docs_stream"))
    docs_df.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streaming_linked_equals_batch(spark, docs_df, catalog_df,
                                       docs_stream_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("swh"))
    ck = str(tmp_path_factory.mktemp("sck"))
    pipe = KGPipeline(warehouse=wh, link_strategy="exact")
    stream = st.stream_docs(spark, docs_stream_dir, max_files_per_trigger=1)
    q = st.stream_linked(stream, catalog_df, pipe, ck)
    q.awaitTermination(300)

    got = pipe.table("linked").read(spark)
    # batch result over the same docs
    wh2 = str(tmp_path_factory.mktemp("bwh"))
    pipe2 = KGPipeline(warehouse=wh2, link_strategy="exact")
    exp = pipe2.stage_linked(docs_df, catalog_df, resume=False)
    key = ["doc_id", "span_idx", "product_id"]
    assert sorted(map(tuple, got.select(*key).collect())) == \
        sorted(map(tuple, exp.select(*key).collect()))
    # multiple micro-batches really ran (≥2 snapshots appended)
    assert len(pipe.table("linked").snapshots()) >= 2


def test_streaming_restart_is_idempotent(spark, docs_df, catalog_df,
                                         docs_stream_dir, tmp_path_factory):
    """Re-starting the stream over the same directory must not
    duplicate linked rows (checkpoint + processed-docs anti-join)."""
    wh = str(tmp_path_factory.mktemp("swh2"))
    ck = str(tmp_path_factory.mktemp("sck2"))
    pipe = KGPipeline(warehouse=wh, link_strategy="exact")
    for _ in range(2):
        stream = st.stream_docs(spark, docs_stream_dir)
        q = st.stream_linked(stream, catalog_df, pipe, ck)
        q.awaitTermination(300)
    got = pipe.table("linked").read(spark)
    n = got.count()
    assert got.dropDuplicates(["doc_id", "span_idx"]).count() == n


def test_stream_event_counts_watermark(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ev"))
    rows = [("2026-01-01 10:05:00", "view", 1.0),
            ("2026-01-01 10:45:00", "view", 2.0),
            ("2026-01-01 11:10:00", "click", 3.0),
            ("2026-01-01 10:20:00", "view", 4.0)]
    spark.createDataFrame(rows, "ts_s string, event_type string, value double") \
        .select(F.col("ts_s").cast("timestamp").alias("ts"),
                "event_type", "value") \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double").parquet(src)
    out = st.stream_event_counts(stream, window="1 hour", watermark="2 hours")
    sink = str(tmp_path_factory.mktemp("sink"))
    ck = str(tmp_path_factory.mktemp("evck"))
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).format("parquet")
         .option("path", sink).start())
    q.awaitTermination(300)
    got = {(str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
           for r in spark.read.parquet(sink).collect()}
    # append mode emits only windows sealed by the watermark; with
    # availableNow the final watermark = max(ts) - 2h ⇒ no window is
    # sealed for this tiny range, so run a second pass with late data
    # via complete-mode memory sink instead for value checks
    out2 = st.stream_event_counts(stream, window="1 hour", watermark="0 seconds")
    q2 = (out2.writeStream.outputMode("complete").format("memory")
          .queryName("evagg").trigger(availableNow=True)
          .option("checkpointLocation", str(tmp_path_factory.mktemp("ck3")))
          .start())
    q2.awaitTermination(300)
    res = {(str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
           for r in spark.sql("select * from evagg").collect()}
    assert res[("2026-01-01 10:00:00", "view")] == (3, 7.0)
    assert res[("2026-01-01 11:00:00", "click")] == (1, 3.0)


def test_stream_tumbling_agg_once_equals_batch(spark, tmp_path_factory):
    """The driver-facing once-runner: a real streaming query over a
    static events file returns exactly the batch aggregation (the
    property that lets stream_windowed_agg carry a full SQL oracle)."""
    src_dir = str(tmp_path_factory.mktemp("ev_once"))
    rows = [(1, "2026-01-01 10:05:00", 7, "view", 1.5, "{}"),
            (2, "2026-01-01 10:45:00", 7, "view", 2.25, "{}"),
            (3, "2026-01-01 11:10:00", 8, "click", 3.0, "{}"),
            (4, "2026-01-01 10:20:00", 9, "view", 4.0, None)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, user_id bigint, "
              "event_type string, value double, props string") \
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value", "props")
    path = src_dir + "/events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(path)

    got = {(r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in st.stream_tumbling_agg_once(spark, path).collect()}
    batch = df.groupBy(
        F.date_format(F.date_trunc("hour", "ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double").alias("total_value"))
    want = {(r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in batch.collect()}
    assert got == want and len(got) == 2

    # single-file (non-dir) inputs stage behind a symlink
    got2 = st.stream_tumbling_agg_once(spark, path).count()
    assert got2 == len(got)


def test_stream_sessionize_state_carries_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: 3 time-ordered files ×
    maxFilesPerTrigger=1 ⇒ 3 micro-batches; sessions spanning batch
    boundaries must merge via state, and the closed-session output
    must equal batch sessionization minus each user's final session."""
    import os
    import time as _time

    from fashion_knowledge_graph_spark.operators import temporal as tp
    from fashion_knowledge_graph_spark.streaming import incremental as sti

    src = str(tmp_path_factory.mktemp("sess_src"))
    base = pd.Timestamp("2026-02-01 00:00:00")
    rows = []
    for u in (1, 2):
        t = base + pd.Timedelta(minutes=u)
        for i in range(12):
            # alternate short gaps (same session) and >30m (new session)
            t = t + pd.Timedelta(minutes=29 if i % 3 else 45)
            rows.append((u * 100 + i, t.to_pydatetime(), u, "view", 1.0, "{}"))
    rows.sort(key=lambda r: r[1])
    sch = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double, props string")
    for part, chunk in enumerate([rows[:8], rows[8:16], rows[16:]]):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(src, f"f{part}"))
        _time.sleep(1.1)   # strictly increasing mtimes → batch order

    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    out = sti.stream_sessionize(stream, gap="30 minutes")
    ck = str(tmp_path_factory.mktemp("sess_ck"))
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sess_mb").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["user_id"], r["session_idx"]): (r["n_events"],
                                              r["session_start"],
                                              r["session_end"])
           for r in spark.sql("select * from sess_mb").collect()}

    batch_df = spark.createDataFrame(rows, sch)
    bounds = tp.session_bounds(batch_df, by="user_id", ts="ts",
                               gap="30 minutes")
    last = {r["user_id"]: r["mx"] for r in bounds.groupBy("user_id")
            .agg(F.max("session_idx").alias("mx")).collect()}
    want = {(r["user_id"], r["session_idx"]): (r["n_events"],
                                               r["session_start"],
                                               r["session_end"])
            for r in bounds.collect()
            if r["session_idx"] < last[r["user_id"]]}
    assert got == want and len(want) >= 4


def test_stream_interval_join_equals_batch(spark, tmp_path_factory):
    """Stream-stream watermarked interval join over a multi-file
    source (forced micro-batch splits) must equal the batch interval
    join — including matches that straddle micro-batch boundaries
    (a view in batch 0 joined by a purchase in batch 2)."""
    import time as _time
    from datetime import datetime

    sch = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double, props string")
    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(i, mins, uid, typ, val=1.0):
        from datetime import timedelta
        return (i, t0 + timedelta(minutes=mins), uid, typ, val, "{}")

    rows = [
        ev(1, 0, 1, "view"), ev(2, 30, 1, "purchase", 9.0),   # in-window
        ev(3, 0, 2, "view"), ev(4, 90, 2, "purchase"),        # too late
        ev(5, 10, 3, "view"), ev(6, 15, 3, "view"),
        ev(7, 40, 3, "purchase", 5.0),                        # joins both
        ev(8, 100, 1, "view"), ev(9, 150, 1, "purchase", 2.0),
        ev(10, 50, 4, "purchase"),                            # no view
    ]
    src = str(tmp_path_factory.mktemp("ssj_src"))
    for part, chunk in enumerate([rows[:4], rows[4:7], rows[7:]]):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(src, f"f{part}"))
        _time.sleep(1.1)

    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = st.stream_interval_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        horizon="1 hour", watermark="10 hours")
    ck = str(tmp_path_factory.mktemp("ssj_ck"))
    q = (out.select("purchase_id", "view_id", "purchase_value")
         .writeStream.outputMode("append").format("memory")
         .queryName("ssj_mb").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["purchase_id"], r["view_id"], r["purchase_value"])
           for r in spark.sql("select * from ssj_mb").collect()}
    want = {(2, 1, 9.0), (7, 5, 5.0), (7, 6, 5.0), (9, 8, 2.0)}
    assert got == want


def test_stream_dedup_within_watermark_semantics(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark: duplicates within the horizon are
    suppressed ACROSS micro-batches; once the event-time watermark
    passes a key's state, the key legitimately re-emits (bounded-state
    dedup, not global distinct)."""
    import os
    import time as _time

    from fashion_knowledge_graph_spark.streaming import incremental as sti

    src = str(tmp_path_factory.mktemp("dedup_src"))
    base = pd.Timestamp("2026-03-01 10:00:00")
    sch = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double, props string")
    mins = pd.Timedelta(minutes=1)
    batches = [
        # batch 1: first sighting of key (1, view)
        [(1, base.to_pydatetime(), 1, "view", 1.0, "{}")],
        # batch 2: duplicate 5 min later (inside the 1 h horizon) —
        # suppressed ACROSS the micro-batch boundary
        [(2, (base + 5 * mins).to_pydatetime(), 1, "view", 1.0, "{}")],
        # batch 3: a far-future key drags the watermark to +540 min,
        # way past key 1's expiry (+65 min)
        [(3, (base + 600 * mins).to_pydatetime(), 2, "buy", 1.0, "{}")],
        # batches 4-5: eviction is visible to arrivals one batch
        # AFTER the watermark passes (measured: the +601 arrival in
        # the same batch as the eviction is still suppressed), so a
        # spacer batch advances things and the +603 re-arrival of the
        # expired key must emit
        [(4, (base + 601 * mins).to_pydatetime(), 1, "view", 1.0, "{}")],
        [(5, (base + 603 * mins).to_pydatetime(), 1, "view", 1.0, "{}")],
    ]
    for part, chunk in enumerate(batches):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(src, f"f{part}"))
        _time.sleep(1.1)   # strictly increasing mtimes → batch order

    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    out = sti.stream_dedup_keys(stream, ["user_id", "event_type"],
                                watermark="1 hour")
    ck = str(tmp_path_factory.mktemp("dedup_ck"))
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_mb").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted(map(tuple,
                     spark.sql("select * from dedup_mb").collect()))
    # (1, view) EXACTLY twice — once before and once after expiry,
    # out of four arrivals: the +5 min duplicate is suppressed across
    # the batch boundary, and post-expiry re-arrival emits again
    assert got == [(1, "view"), (1, "view"), (2, "buy")]


def test_stream_dedup_once_equals_batch_distinct(spark, tmp_path_factory):
    import os

    from fashion_knowledge_graph_spark.streaming import incremental as sti

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "events.parquet")
    got = sorted(map(tuple, sti.stream_dedup_once(spark, path).collect()))
    want = sorted(map(tuple, spark.read.parquet(path)
                      .select("user_id", "event_type").distinct().collect()))
    assert got == want and len(want) > 0


def test_stream_merge_into_upserts_and_fences_replays(spark,
                                                      tmp_path_factory):
    import os

    from fashion_knowledge_graph_spark.sources.tables import SnapshotTable
    from fashion_knowledge_graph_spark.streaming import incremental as sti

    src = str(tmp_path_factory.mktemp("smerge_src"))
    sch = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double, props string")
    base = pd.Timestamp("2026-04-01")
    batches = [
        # batch 0: two keys
        [(1, base.to_pydatetime(), 1, "view", 1.0, "{}"),
         (2, base.to_pydatetime(), 2, "view", 2.0, "{}")],
        # batch 1: overwrites key (1, view) — higher event_id wins
        # within the batch too (4 beats 3)
        [(3, base.to_pydatetime(), 1, "view", 30.0, "{}"),
         (4, base.to_pydatetime(), 1, "view", 40.0, "{}")],
    ]
    for i, chunk in enumerate(batches):
        d = os.path.join(src, f"b{i}")
        spark.createDataFrame(chunk, sch).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        for root_, _, files_ in os.walk(d):
            for fl in files_:
                os.utime(os.path.join(root_, fl), (1e9 + i, 1e9 + i))

    troot = str(tmp_path_factory.mktemp("smerge_tbl")) + "/t"
    got = sti.stream_merge_once(spark, src + "/*", troot)
    state = {(r["user_id"], r["event_type"]): (r["event_id"], r["value"])
             for r in got.collect()}
    assert state == {(1, "view"): (4, 40.0), (2, "view"): (2, 2.0)}

    # a FRESH checkpoint is a new stream identity: its batches
    # re-apply (identical reduced rows ⇒ idempotent content), they are
    # NOT fenced by the old stream's batch ids — bare-id fencing would
    # silently drop a late file that shifts batch numbering
    t = SnapshotTable(troot)

    def rerun():
        q = sti.stream_merge_into(
            spark.readStream.schema(sch).option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
            .select("event_id", "user_id", "event_type", "value"),
            t, ["user_id", "event_type"], "event_id",
            str(tmp_path_factory.mktemp("smerge_ck")))
        q.awaitTermination(300)

    rerun()
    got2 = {(r["user_id"], r["event_type"]): (r["event_id"], r["value"])
            for r in t.read(spark).collect()}
    assert got2 == state                       # content idempotent

    # late file with an mtime BETWEEN the originals shifts the fresh
    # run's batch numbering — its data must still be applied
    late = os.path.join(src, "b_late")
    spark.createDataFrame(
        [(9, pd.Timestamp("2026-04-01").to_pydatetime(), 3, "view",
          9.0, "{}")], sch).coalesce(1) \
        .write.mode("overwrite").parquet(late)
    for root_, _, files_ in os.walk(late):
        for fl in files_:
            os.utime(os.path.join(root_, fl), (1e9 + 0.5, 1e9 + 0.5))
    rerun()
    got3 = {(r["user_id"], r["event_type"]): (r["event_id"], r["value"])
            for r in t.read(spark).collect()}
    assert got3 == {**state, (3, "view"): (9, 9.0)}


def test_stream_cms_equals_batch_sketch(spark, tmp_path):
    """The drained streaming CMS must equal the batch
    cms_term_counts exactly (complete mode ⇒ stream ≡ batch), with
    real collisions at width 4."""
    import pandas as pd

    from fashion_knowledge_graph_spark.operators.sketches import (
        cms_term_counts,
    )
    from fashion_knowledge_graph_spark.streaming.incremental import (
        stream_cms_once,
    )
    from pyspark.sql import functions as F

    p = str(tmp_path / "docs")
    pd.DataFrame({
        "doc_id": list(range(6)),
        "text": ["alpha beta", "beta gamma delta", "alpha alpha",
                 "epsilon zeta", "eta theta iota", "kappa beta"],
        "lang": ["en"] * 6, "source": ["s"] * 6,
        "n_chars": [10] * 6,
    }).to_parquet(p + ".parquet")
    got = {r["term"]: (r["n_exact"], r["n_cms"])
           for r in stream_cms_once(spark, p + ".parquet",
                                    depth=3, width=4).collect()}
    docs = spark.read.parquet(p + ".parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")) \
        .filter("term <> ''")
    exp = {r["term"]: (r["n_exact"], r["n_cms"])
           for r in cms_term_counts(toks, depth=3, width=4).collect()}
    assert got == exp
    assert all(cms >= ex for ex, cms in got.values())
    assert any(cms > ex for ex, cms in got.values())   # collisions real
