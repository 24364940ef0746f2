from datetime import datetime, timedelta

import pandas as pd
import pytest

from fashion_knowledge_graph_spark.operators import temporal as tp


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_matches_pandas_merge_asof(spark):
    left = [(i, i % 3, _ts("2024-01-01T00:00:00") + timedelta(minutes=7 * i))
            for i in range(40)]
    right = [(100 + i, i % 3, _ts("2024-01-01T00:00:00") + timedelta(minutes=11 * i))
             for i in range(25)]
    ldf = spark.createDataFrame(left, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, ts timestamp")
    got = {r["event_id"]: (r["asof_rid"], r["asof_ts"])
           for r in tp.asof_join(ldf, rdf, by="k", ts="ts",
                                 payload_cols=["rid"]).collect()}

    lp = pd.DataFrame(left, columns=["event_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["rid", "k", "ts"]).sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        suffixes=("", "_r"))
    assert len(got) == 40
    for row in ref.itertuples():
        want = (None if pd.isna(row.rid) else int(row.rid))
        g_rid, g_ts = got[row.event_id]
        assert g_rid == want, (row.event_id, g_rid, want)


def test_asof_join_equal_ts_matches(spark):
    # right row at exactly left.ts must match (<= contract)
    t = _ts("2024-05-05T12:00:00")
    ldf = spark.createDataFrame([(1, 0, t)], "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame([(9, 0, t)], "rid long, k long, ts timestamp")
    row = tp.asof_join(ldf, rdf, by="k", ts="ts",
                       payload_cols=["rid"]).collect()[0]
    assert row["asof_rid"] == 9 and row["asof_ts"] == t


def test_sessionize_gap_boundaries(spark):
    base = _ts("2024-03-01T00:00:00")
    rows = [
        (1, base),
        (1, base + timedelta(minutes=29)),          # same session
        (1, base + timedelta(minutes=59, seconds=1)),   # gap >30m → new
        (1, base + timedelta(minutes=89, seconds=1)),   # exactly 30m → same
        (2, base),                                      # other user restarts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["user_id"], str(r["ts"])): r["session_idx"]
           for r in tp.sessionize(df, gap="30 minutes").collect()}
    assert got[(1, str(rows[0][1]))] == 1
    assert got[(1, str(rows[1][1]))] == 1
    assert got[(1, str(rows[2][1]))] == 2
    assert got[(1, str(rows[3][1]))] == 2
    assert got[(2, str(rows[4][1]))] == 1


def test_asof_plan_single_exchange(spark):
    ldf = spark.createDataFrame([(1, 0, _ts("2024-01-01T00:00:00"))],
                                "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame([(9, 0, _ts("2024-01-01T00:00:00"))],
                                "rid long, k long, ts timestamp")
    out = tp.asof_join(ldf, rdf, by="k", ts="ts", payload_cols=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan  # 1 hash + local-table prep
    assert "Join" not in plan, plan           # no join explosion


def test_range_join_matches_bruteforce(spark):
    left = [(i, i % 2, _ts("2024-01-01T00:00:00") + timedelta(minutes=13 * i))
            for i in range(30)]
    right = [(100 + i, i % 2, _ts("2024-01-01T00:00:00") + timedelta(minutes=5 * i))
             for i in range(60)]
    ldf = spark.createDataFrame(left, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, ts timestamp")
    got = {(r["event_id"], r["in_range_rid"])
           for r in tp.range_join(ldf, rdf, by="k", ts="ts",
                                  lookback="30 minutes",
                                  payload_cols=["rid"]).collect()}
    want = {(eid, rid)
            for eid, lk, lt in left for rid, rk, rt in right
            if lk == rk and rt <= lt and (lt - rt) <= timedelta(minutes=30)}
    assert got == want and len(want) > 0
    # boundary: exactly-lookback-old rows are included (>= contract)
    t0 = _ts("2024-06-01T00:00:00")
    l2 = spark.createDataFrame([(1, 0, t0)], "event_id long, k long, ts timestamp")
    r2 = spark.createDataFrame(
        [(8, 0, t0 - timedelta(minutes=30)), (9, 0, t0 - timedelta(minutes=30, seconds=1))],
        "rid long, k long, ts timestamp")
    rows = tp.range_join(l2, r2, by="k", ts="ts", lookback="30 minutes",
                         payload_cols=["rid"]).collect()
    assert {r["in_range_rid"] for r in rows} == {8}


def test_range_join_plan_is_equi_join(spark):
    ldf = spark.createDataFrame([(1, 0, _ts("2024-01-01T00:00:00"))],
                                "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame([(9, 0, _ts("2024-01-01T00:00:00"))],
                                "rid long, k long, ts timestamp")
    out = tp.range_join(ldf, rdf, by="k", ts="ts", lookback="1 hour",
                        payload_cols=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_asof_cogroup_matches_window_form(spark):
    """asof_join_cogroup (cogrouped-map merge_asof) must produce
    exactly the union+window asof_join's rows — including keys with
    no right rows and left-only keys."""
    left = [(i, i % 4, _ts("2024-01-01T00:00:00")
             + timedelta(minutes=7 * i)) for i in range(40)]
    right = [(100 + i, i % 3, _ts("2024-01-01T00:00:00")
              + timedelta(minutes=11 * i)) for i in range(25)]
    ldf = spark.createDataFrame(left, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, ts timestamp")
    a = sorted(tuple(r) for r in tp.asof_join(
        ldf, rdf, by="k", ts="ts", payload_cols=["rid"]).collect())
    b = sorted(tuple(r) for r in tp.asof_join_cogroup(
        ldf, rdf, by="k", ts="ts", payload_cols=["rid"]).collect())
    assert a == b and len(a) == 40


def test_funnel_ordered_semantics(spark):
    from fashion_knowledge_graph_spark.operators.temporal import funnel
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1 completes in order: view@0, click@5, purchase@9
        (1, t0, "view"), (1, t0 + 5 * m, "click"), (1, t0 + 9 * m, "purchase"),
        # user 2: click BEFORE first view → t2 must use the click
        # AFTER the view (none) → stalls at t1; the purchase@8 is
        # unreachable because t2 is NULL
        (2, t0 + 3 * m, "view"), (2, t0 + 1 * m, "click"),
        (2, t0 + 8 * m, "purchase"),
        # user 3: never views → not in the funnel at all
        (3, t0, "click"), (3, t0 + 1 * m, "purchase"),
        # user 4: two views; funnel anchors at the FIRST view; click
        # ties exactly with the first view → strict > excludes it
        (4, t0, "view"), (4, t0, "click"), (4, t0 + 2 * m, "view"),
    ]
    ev = spark.createDataFrame(
        [(u, t, k) for u, t, k in rows],
        "user_id int, ts timestamp, event_type string")
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1] == (t0, t0 + 5 * m, t0 + 9 * m)
    assert got[2] == (t0 + 3 * m, None, None)
    assert got[4] == (t0, None, None)


def test_funnel_rejects_single_step(spark):
    from fashion_knowledge_graph_spark.operators.temporal import funnel

    ev = spark.createDataFrame([(1,)], "user_id int")
    with pytest.raises(ValueError):
        funnel(ev, ["view"])


def test_markov_transitions_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.temporal import (
        markov_transitions,
    )
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    seqs = {1: ["view", "click", "view", "purchase"],
            2: ["view", "view", "click"],
            3: ["click"]}
    eid = 0
    for u, seq in seqs.items():
        for i, s in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, s))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r["from_state"], r["to_state"]): (r["n"], r["p"])
           for r in markov_transitions(df).collect()}

    cnt = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    frm = {}
    for (a, _b), n in cnt.items():
        frm[a] = frm.get(a, 0) + n
    exp = {k: (n, n / frm[k[0]]) for k, n in cnt.items()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-12)
    # single-event user 3 contributes no transition; rows sum to 1
    assert ("click", None) not in got
    for a in frm:
        assert sum(p for (x, _), (_, p) in got.items() if x == a) \
            == pytest.approx(1.0)


def test_markov_transitions_tie_break_is_deterministic(spark):
    """Equal timestamps fall back to the event_id tie-break."""
    from fashion_knowledge_graph_spark.operators.temporal import (
        markov_transitions,
    )
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [(2, t0, 1, "b"), (1, t0, 1, "a"), (3, t0, 1, "c")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r["from_state"], r["to_state"]) for r in
           markov_transitions(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_time_decay_agg_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.temporal import (
        time_decay_agg,
    )
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 31, 12, 0), 1, "view", 10.0),
            (2, dt.datetime(2024, 1, 1, 0, 0), 1, "view", 10.0),
            (3, dt.datetime(2024, 1, 31, 23, 59), 2, "view", 4.0)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    got = {r["user_id"]: (r["n_events"], r["decayed_value"])
           for r in time_decay_agg(df).collect()}
    # day diffs vs 2024-02-01 are date-granular: 1 and 31 days
    exp1 = 10.0 * 0.95 ** 1 + 10.0 * 0.95 ** 31
    assert got[1] == (2, pytest.approx(round(exp1, 6), abs=1e-9))
    assert got[2] == (1, pytest.approx(round(4.0 * 0.95, 6), abs=1e-9))
    # recency dominates: yesterday's 10 outweighs month-old 10
    assert 10.0 * 0.95 ** 1 > 10.0 * 0.95 ** 31 * 4


def test_session_paths_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.temporal import (
        session_paths,
    )
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # user 1: two sessions (gap > 30 min splits), identical first
    # journey "view>click"
    for start in (t0, t0 + dt.timedelta(hours=2)):
        for i, s in enumerate(["view", "click"]):
            rows.append((eid, start + dt.timedelta(minutes=i), 1, s))
            eid += 1
    # user 2: one long session; only the first 2 steps make the path
    for i, s in enumerate(["view", "click", "purchase"]):
        rows.append((eid, t0 + dt.timedelta(minutes=i), 2, s))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = [(r["path"], r["n_sessions"], r["rank"])
           for r in session_paths(df, gap="30 minutes", max_steps=2,
                                  top=10).orderBy("rank").collect()]
    assert got == [("view>click", 3, 1)]

    # max_steps=3 separates user 2's longer journey
    got3 = {r["path"]: r["n_sessions"]
            for r in session_paths(df, gap="30 minutes", max_steps=3,
                                   top=10).collect()}
    assert got3 == {"view>click": 2, "view>click>purchase": 1}


def test_scd2_intervals_collapses_runs_and_marks_current(spark):
    import pandas as pd

    from fashion_knowledge_graph_spark.operators.temporal import (
        scd2_intervals,
    )
    rows = [
        # user 1: A A B A  → 3 intervals; user 2: single event
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 01:00:00", "A"),
        (3, 1, "2024-01-01 02:00:00", "B"),
        (4, 1, "2024-01-01 03:00:00", "A"),
        (5, 2, "2024-01-01 00:30:00", "C"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    out = scd2_intervals(spark.createDataFrame(pdf)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.valid_from_us)
    assert [r.event_type for r in u1] == ["A", "B", "A"]
    # exclusive upper bound = next interval's start; only last open
    assert [r.valid_to_us for r in u1[:-1]] == \
        [u1[1].valid_from_us, u1[2].valid_from_us]
    assert u1[-1].valid_to_us is None
    assert [r.is_current for r in u1] == [False, False, True]
    us = lambda s: int(pd.Timestamp(s).value // 1000)  # noqa: E731
    assert u1[0].valid_from_us == us("2024-01-01 00:00:00")
    assert by_user[2][0].is_current and \
        by_user[2][0].valid_from_us == us("2024-01-01 00:30:00")


def test_scd2_intervals_tiebreak_on_equal_ts(spark):
    import pandas as pd

    from fashion_knowledge_graph_spark.operators.temporal import (
        scd2_intervals,
    )
    # two events at the SAME ts: event_id order decides the sequence
    rows = [(2, 1, "2024-01-01 00:00:00", "B"),
            (1, 1, "2024-01-01 00:00:00", "A")]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    out = sorted(scd2_intervals(spark.createDataFrame(pdf)).collect(),
                 key=lambda r: (r.valid_from_us, r.event_type))
    assert [r.event_type for r in out] == ["A", "B"]
    assert out[1].is_current and not out[0].is_current


def test_kaplan_meier_textbook_curve(spark):
    import pandas as pd

    from fashion_knowledge_graph_spark.operators.temporal import (
        kaplan_meier,
    )
    # classic worked example: events at t=1 (1 death of 5 at risk),
    # t=3 (tie: 2 deaths of 4 at risk after a censoring at t=2)
    rows = [(1, True), (2, False), (3, True), (3, True), (5, False)]
    pdf = pd.DataFrame(rows, columns=["t", "observed"])
    out = {r.t: r for r in
           kaplan_meier(spark.createDataFrame(pdf)).collect()}
    # censor-only times (2, 5) carry no row
    assert sorted(out) == [1, 3]
    assert out[1].n_risk == 5 and out[1].d_events == 1
    assert out[1].survival == round(4 / 5, 6)
    assert out[3].n_risk == 3 and out[3].d_events == 2
    assert out[3].survival == round(4 / 5 * (1 / 3), 6)


def test_kaplan_meier_absorbing_zero(spark):
    import pandas as pd

    from fashion_knowledge_graph_spark.operators.temporal import (
        kaplan_meier,
    )
    # the whole risk set dies at t=4 → S hits exactly 0 and stays 0
    rows = [(1, True), (4, True), (4, True)]
    pdf = pd.DataFrame(rows, columns=["t", "observed"])
    out = {r.t: r for r in
           kaplan_meier(spark.createDataFrame(pdf)).collect()}
    assert out[1].survival == round(2 / 3, 6)
    assert out[4].n_risk == 2 and out[4].d_events == 2
    assert out[4].survival == 0.0


def test_position_attribution_credit_rules(spark):
    import pandas as pd

    from fashion_knowledge_graph_spark.operators.temporal import (
        position_attribution,
    )
    rows = [
        # user 1: 4 views then purchase -> 0.4/0.1/0.1/0.4
        (1, 1, "2024-01-01 01:00", "view"),
        (2, 1, "2024-01-01 02:00", "view"),
        (3, 1, "2024-01-01 03:00", "view"),
        (4, 1, "2024-01-01 04:00", "view"),
        (5, 1, "2024-01-01 05:00", "purchase"),
        # user 2: single view -> 1.0; later 2nd purchase sees 2 views
        (6, 2, "2024-01-01 01:00", "view"),
        (7, 2, "2024-01-01 02:00", "purchase"),
        (8, 2, "2024-01-01 03:00", "view"),
        (9, 2, "2024-01-01 04:00", "purchase"),
        # user 3: purchase with no prior view -> no rows
        (10, 3, "2024-01-01 01:00", "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    out = position_attribution(spark.createDataFrame(pdf)).collect()
    got = {}
    for r in out:
        got.setdefault(r.conv_id, {})[r.touch_id] = r.credit
    assert got[5] == {1: 0.4, 2: 0.1, 3: 0.1, 4: 0.4}
    assert got[7] == {6: 1.0}
    assert got[9] == {6: 0.5, 8: 0.5}
    assert 10 not in got
    # conservation: every attributed conversion's credits sum to 1
    for cid, credits in got.items():
        assert abs(sum(credits.values()) - 1.0) < 1e-9, cid
