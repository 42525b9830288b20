"""Sessionization + as-of join semantics (ops/events.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from kglinker.ops.events import asof_join, sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")


def test_sessionize_gap_semantics(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (0, t.replace(minute=0), 1, "a"),
        (1, t.replace(minute=10), 1, "a"),       # 10 min → same session
        (2, t.replace(minute=40), 1, "a"),       # exactly 30:00 gap → SAME
        (3, t.replace(hour=2), 1, "a"),          # 80 min → new session
        (4, t.replace(minute=5), 2, "a"),        # other user independent
    ]
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(_ev(spark, rows), gap_minutes=30).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_boundary_is_strict(spark):
    t = datetime(2024, 1, 1)
    rows = [(0, t, 1, "a"),
            (1, t.replace(minute=30, second=0, microsecond=1), 1, "a")]
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(_ev(spark, rows), gap_minutes=30).collect()}
    assert got == {0: 1, 1: 2}   # one microsecond past the gap → new session


def test_asof_backward_semantics(spark):
    t = datetime(2024, 1, 1)
    left = _ev(spark, [
        (10, t.replace(hour=1), 1, "purchase"),
        (11, t.replace(hour=3), 1, "purchase"),
        (12, t.replace(minute=1), 2, "purchase"),   # before any signup
    ])
    right = _ev(spark, [
        (20, t.replace(minute=30), 1, "signup"),
        (21, t.replace(hour=2), 1, "signup"),
        (22, t.replace(hour=1), 2, "signup"),
        (23, t.replace(hour=1), 1, "signup"),       # EXACTLY at left 10's ts
    ])
    got = {r["event_id"]: r["asof_id"]
           for r in asof_join(left, right).collect()}
    # left 10 at 01:00: right 23 is simultaneous → inclusive match wins
    # over the earlier 20; left 11 at 03:00 takes the latest (21);
    # left 12 has no prior right in its group → NULL
    assert got == {10: 23, 11: 21, 12: None}


def test_asof_tie_on_right_ts_takes_max_id(spark):
    t = datetime(2024, 1, 1)
    left = _ev(spark, [(10, t.replace(hour=1), 1, "p")])
    right = _ev(spark, [(20, t.replace(minute=5), 1, "s"),
                        (25, t.replace(minute=5), 1, "s")])
    got = asof_join(left, right).collect()
    assert got[0]["asof_id"] == 25


def test_asof_plan_has_no_join(spark):
    """The union-tag formulation must compile to window-over-union — zero
    join operators (the naive range join would be a nested loop)."""
    import contextlib
    import io
    t = datetime(2024, 1, 1)
    left = _ev(spark, [(10, t, 1, "p")])
    right = _ev(spark, [(20, t, 1, "s")])
    df = asof_join(left, right)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Join" not in buf.getvalue()


def test_sessionize_matches_builtin_session_window(spark):
    """Cross-validation against Spark's own session_window (the Structured
    Streaming-native formulation): away from the exact-gap boundary (where
    the conventions differ by documented design: lag-based keeps a
    diff == gap event in the session, session_window starts a new one),
    both must induce the SAME partition of events into sessions."""
    from pyspark.sql import functions as F
    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    # deterministic event times: minutes derived from md5, never exactly
    # on the 30-min gap boundary
    import hashlib
    for user in range(1, 6):
        t_min = 0
        for k in range(40):
            step = int(hashlib.md5(f"{user}:{k}".encode()).hexdigest()[:4],
                       16) % 70 + 1   # 1..70 minutes
            step = step + 1 if step == 30 else step  # dodge the exact boundary
            t_min += step
            rows.append((eid, base + timedelta(minutes=t_min), user, "a"))
            eid += 1
    ev = _ev(spark, rows)
    ours = sessionize(ev, gap_minutes=30)
    ours_sessions = (ours.groupBy("user_id", "session_seq")
                     .agg(F.sort_array(F.collect_list("event_id")).alias("ids")))
    builtin = (ev.groupBy("user_id",
                          F.session_window("ts", "30 minutes").alias("w"))
               .agg(F.sort_array(F.collect_list("event_id")).alias("ids")))
    a = {tuple(r["ids"]) for r in ours_sessions.collect()}
    b = {tuple(r["ids"]) for r in builtin.collect()}
    assert a == b and len(a) > 10


def test_asof_matches_bruteforce_property(spark):
    """Property check over a dense random-ish event set (md5-derived, no
    RNG): the union-tag window as-of equals the brute-force definition
    'latest right with ts <= left.ts, max-id tiebreak' for every left
    row, including duplicate timestamps within and across sides."""
    import hashlib

    def h(tag):
        return int(hashlib.md5(tag.encode()).hexdigest()[:6], 16)

    lefts, rights = [], []
    eid = 0
    for user in range(1, 5):
        for k in range(30):
            # coarse minute grid → plenty of exact ts collisions
            t = datetime(2024, 1, 1) + timedelta(minutes=h(f"L{user}:{k}") % 40)
            lefts.append((eid, t, user, "l")); eid += 1
        for k in range(20):
            t = datetime(2024, 1, 1) + timedelta(minutes=h(f"R{user}:{k}") % 40)
            rights.append((eid, t, user, "r")); eid += 1
    got = {r["event_id"]: r["asof_id"]
           for r in asof_join(_ev(spark, lefts), _ev(spark, rights)).collect()}
    by_user = {}
    for rid, ts, user, _ in rights:
        by_user.setdefault(user, []).append((ts, rid))
    for lid, ts, user, _ in lefts:
        cands = [(rts, rid) for rts, rid in by_user.get(user, [])
                 if rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


def _dense_events():
    """md5-derived dense event set with plenty of exact ts collisions
    (shared by the direction-variant property tests)."""
    import hashlib

    def h(tag):
        return int(hashlib.md5(tag.encode()).hexdigest()[:6], 16)

    lefts, rights = [], []
    eid = 0
    for user in range(1, 5):
        for k in range(30):
            t = datetime(2024, 1, 1) + timedelta(minutes=h(f"L{user}:{k}") % 40)
            lefts.append((eid, t, user, "l")); eid += 1
        for k in range(20):
            t = datetime(2024, 1, 1) + timedelta(minutes=h(f"R{user}:{k}") % 40)
            rights.append((eid, t, user, "r")); eid += 1
    return lefts, rights


def test_asof_forward_matches_bruteforce_property(spark):
    """forward = earliest right with ts >= left.ts, MIN-id tiebreak
    (r3 verdict #6) — verified row-for-row against brute force."""
    lefts, rights = _dense_events()
    got = {r["event_id"]: r["asof_id"]
           for r in asof_join(_ev(spark, lefts), _ev(spark, rights),
                              direction="forward").collect()}
    by_user = {}
    for rid, ts, user, _ in rights:
        by_user.setdefault(user, []).append((ts, rid))
    for lid, ts, user, _ in lefts:
        cands = [(rts, rid) for rts, rid in by_user.get(user, [])
                 if rts >= ts]
        want = min(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


def test_asof_nearest_with_tolerance_matches_bruteforce(spark):
    """nearest = smaller |Δt| of the backward/forward candidates, exact
    tie → backward (pandas merge_asof convention); tolerance_us drops
    candidates farther than the bound. Brute-force replica: the backward
    candidate is the max-(ts,id) among earlier-or-equal rights, the
    forward one the min-(ts,id) among later-or-equal — same tiebreaks as
    the operator — then the nearer valid one wins."""
    tol_us = 10 * 60 * 1_000_000   # 10 minutes
    lefts, rights = _dense_events()
    got = {r["event_id"]: r["asof_id"]
           for r in asof_join(_ev(spark, lefts), _ev(spark, rights),
                              direction="nearest",
                              tolerance_us=tol_us).collect()}
    by_user = {}
    for rid, ts, user, _ in rights:
        by_user.setdefault(user, []).append((ts, rid))
    for lid, ts, user, _ in lefts:
        back = [(rts, rid) for rts, rid in by_user.get(user, [])
                if rts <= ts]
        fwd = [(rts, rid) for rts, rid in by_user.get(user, [])
               if rts >= ts]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        db = (ts - b[0]).total_seconds() * 1e6 if b else None
        df = (f[0] - ts).total_seconds() * 1e6 if f else None
        b_ok = b is not None and db <= tol_us
        f_ok = f is not None and df <= tol_us
        if b_ok and f_ok:
            want = f[1] if df < db else b[1]
        elif b_ok:
            want = b[1]
        elif f_ok:
            want = f[1]
        else:
            want = None
        assert got[lid] == want, (lid, got[lid], want)


def test_asof_backward_tolerance(spark):
    """tolerance_us on the backward default: a match farther back than
    the bound resolves to NULL, an in-bound one survives."""
    t = datetime(2024, 1, 1)
    left = _ev(spark, [(10, t.replace(hour=1), 1, "p"),
                       (11, t.replace(hour=5), 1, "p")])
    right = _ev(spark, [(20, t.replace(minute=55), 1, "s")])
    got = {r["event_id"]: r["asof_id"]
           for r in asof_join(left, right,
                              tolerance_us=10 * 60 * 1_000_000).collect()}
    assert got == {10: 20, 11: None}


def test_asof_variant_plans_have_no_join(spark):
    """forward and nearest keep the union-tag shape: a second sort over
    the same exchange, still ZERO join operators."""
    import contextlib
    import io
    t = datetime(2024, 1, 1)
    left = _ev(spark, [(10, t, 1, "p")])
    right = _ev(spark, [(20, t, 1, "s")])
    for direction in ("forward", "nearest"):
        df = asof_join(left, right, direction=direction,
                       tolerance_us=1_000_000)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Join" not in plan, direction
        assert plan.count("Exchange") <= 2, direction


def test_asof_unknown_direction_raises(spark):
    t = datetime(2024, 1, 1)
    left = _ev(spark, [(10, t, 1, "p")])
    with pytest.raises(ValueError):
        asof_join(left, left, direction="sideways")
