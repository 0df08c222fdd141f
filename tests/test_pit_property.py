"""Property-based PIT-join check: random spines/features over tiny
key+timestamp domains (maximizing ties, duplicates and missing matches)
must agree with a brute-force Python as-of oracle, for both physical
strategies. Complements the fixed cases in test_pit_join.py."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feature_store_api_spark.operators.pit_join import point_in_time_join

BASE = dt.datetime(2024, 1, 1)


def ts(day):
    return BASE + dt.timedelta(days=day)


# tiny domains force collisions: 3 keys x 5 timestamps
spine_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 4)), min_size=1, max_size=12
)
feat_rows = st.lists(
    st.tuples(
        st.integers(1, 3),  # key
        st.integers(0, 4),  # ts day
        st.integers(0, 99),  # value
        st.integers(0, 9),  # precombine
    ),
    min_size=0,
    max_size=12,
)


def brute_force(spine, feats):
    """latest feature row with fts <= ts per key; ties on fts broken by
    highest precombine, then highest value (matching the engine's
    deterministic final tie-break ordering)."""
    out = []
    for label, (k, d) in enumerate(spine):
        cands = [f for f in feats if f[0] == k and f[1] <= d]
        if not cands:
            out.append((label, None))
        else:
            best = max(cands, key=lambda f: (f[1], f[3], f[2]))
            out.append((label, float(best[2])))
    return dict(out)


@pytest.mark.parametrize(
    "strategy", ["union_window", "range_join", "union_window_skew"]
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(spine=spine_rows, feats=feat_rows)
def test_pit_matches_brute_force(spark, strategy, spine, feats):
    spine_df = spark.createDataFrame(
        [(k, ts(d), i) for i, (k, d) in enumerate(spine)],
        "k long, ts timestamp, label int",
    )
    feat_df = spark.createDataFrame(
        [(k, ts(d), float(v), float(p)) for (k, d, v, p) in feats],
        "k long, fts timestamp, v double, pre double",
    ) if feats else spark.createDataFrame([], "k long, fts timestamp, v double, pre double")

    out = point_in_time_join(
        spine_df, feat_df, keys=["k"], spine_ts="ts", feature_ts="fts",
        features=["v"], precombine="pre", strategy=strategy,
    )
    got = {r["label"]: r["v"] for r in out.collect()}
    expected = brute_force(spine, feats)
    assert len(got) == len(spine)
    # equal (fts, pre) pairs leave the winner among equal-precombine rows
    # implementation-defined; accept any candidate with the maximal
    # (fts, pre) when values differ only there
    for label, (k, d) in enumerate(spine):
        exp = expected[label]
        if exp is None:
            assert got[label] is None
        else:
            cands = [f for f in feats if f[0] == k and f[1] <= d]
            top = max(c[1] for c in cands)
            top_pre = max(c[3] for c in cands if c[1] == top)
            allowed = {float(c[2]) for c in cands if c[1] == top and c[3] == top_pre}
            assert got[label] in allowed


def test_label_window_join_matches_brute_force(spark):
    """label_window_join vs a driver-side brute force on random data:
    strictly-after lower bound, inclusive upper bound, LEFT semantics,
    count/sum/avg/min/max agreement."""
    import datetime as dt
    import random

    from feature_store_api_spark.operators.time_series import label_window_join

    rnd = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    spine_rows = [
        (i, rnd.randrange(8), base + dt.timedelta(hours=rnd.randrange(500)))
        for i in range(120)
    ]
    event_rows = [
        (rnd.randrange(8), base + dt.timedelta(hours=rnd.randrange(500)),
         float(rnd.randrange(100)))
        for _ in range(400)
    ]
    # boundary rows: events exactly AT a spine ts (excluded) and exactly
    # AT ts + horizon (included)
    spine_rows.append((900, 0, base))
    event_rows.append((0, base, 1000.0))                      # == ts -> excluded
    event_rows.append((0, base + dt.timedelta(days=2), 500.0))  # == ts+h -> included

    spine = spark.createDataFrame(spine_rows, "event_id long, k long, ts timestamp")
    events = spark.createDataFrame(event_rows, "k long, ets timestamp, v double")
    out = {
        r["event_id"]: (r["label_count"], r["label_sum"], r["label_min"],
                        r["label_max"], r["label_avg"])
        for r in label_window_join(
            spine, events, keys=["k"], spine_ts="ts", event_ts="ets",
            value_col="v", horizon="2 days",
            aggs=("count", "sum", "min", "max", "avg"),
        ).collect()
    }
    assert len(out) == len(spine_rows)
    h = dt.timedelta(days=2)
    for eid, k, ts in spine_rows:
        vals = [v for (ek, ets, v) in event_rows if ek == k and ts < ets <= ts + h]
        cnt, s, mn, mx, avg = out[eid]
        assert cnt == len(vals), (eid, cnt, len(vals))
        if vals:
            assert abs(s - sum(vals)) < 1e-9
            assert mn == min(vals) and mx == max(vals)
            assert abs(avg - sum(vals) / len(vals)) < 1e-9
        else:
            assert s is None and mn is None and mx is None and avg is None
    # the boundary spine row: ts-equal event excluded, ts+h event included
    assert out[900][0] >= 1 and out[900][3] is not None

    # numeric event times + validation errors
    nspine = spark.createDataFrame([(1, 1, 100)], "event_id long, k long, ts long")
    nev = spark.createDataFrame(
        [(1, 100, 9.0), (1, 105, 5.0), (1, 131, 7.0)], "k long, ets long, v double"
    )
    row = label_window_join(
        nspine, nev, keys=["k"], spine_ts="ts", event_ts="ets",
        value_col="v", horizon=30, aggs=("count", "sum"),
    ).collect()[0]
    # ets=100 excluded (strict), 105 in, 131 out (> ts+30)
    assert (row["label_count"], row["label_sum"]) == (1, 5.0)

    import pytest

    with pytest.raises(ValueError):
        label_window_join(nspine, nev, ["k"], "ts", "ets", "v", horizon="3 fortnights")
    with pytest.raises(ValueError):
        label_window_join(nspine, nev, ["k"], "ts", "ets", "v", horizon=0)
    with pytest.raises(ValueError):
        label_window_join(nspine, nev, ["k"], "ts", "ets", "v", "1 day", aggs=("median",))
