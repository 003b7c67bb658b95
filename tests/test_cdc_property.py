"""Property-based check (hypothesis): on arbitrary well-formed change
streams, ``latest_per_key``/``apply_deletes`` agree with a direct
sequential fold of the CDC contract — last writer per (table, key) by
(commit_ts, event_id), deletes drop the key."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_extractor_spark.operators import cdc

# one change record: (event_id drawn unique, table, key, action, val, ts)
_records = st.lists(
    st.tuples(
        st.sampled_from(["customer", "orders"]),
        st.integers(min_value=0, max_value=5),      # key — small domain forces collisions
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=10_000),  # val_cents
        st.integers(min_value=0, max_value=3),       # commit bucket — forces ts ties
    ),
    min_size=1,
    max_size=25,
)


def _python_fold(rows):
    """Ground truth: fold in (commit_ts, event_id) order."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["commit_ts_ms"], r["event_id"])):
        state[(r["table_name"], r["key"])] = r
    return state


@given(_records)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_latest_per_key_matches_sequential_fold(spark, recs):
    rows = [
        {
            "event_id": i,
            "table_name": t,
            "transaction_id": i // 3,
            "commit_ts_ms": 1_704_067_200_000 + bucket * 1000,
            "action": a,
            "key": k,
            "val_cents": v,
        }
        for i, (t, k, a, v, bucket) in enumerate(recs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, table_name string, transaction_id long, "
        "commit_ts_ms long, action string, key long, val_cents long",
    )
    truth = _python_fold(rows)

    got = {
        (r["table_name"], r["key"]): r
        for r in cdc.latest_per_key(df).collect()
    }
    assert set(got) == set(truth)
    for k, r in got.items():
        assert r["last_event_id"] == truth[k]["event_id"], k
        assert r["last_action"] == truth[k]["action"], k
        assert r["last_val_cents"] == truth[k]["val_cents"], k

    survivors = {k for k, r in truth.items() if r["action"] != "D"}
    applied = {
        (r["table_name"], r["key"]) for r in cdc.apply_deletes(df).collect()
    }
    assert applied == survivors


# --- as-of join vs sequential scan ---------------------------------------

_asof_cases = st.lists(
    st.tuples(
        st.booleans(),                              # event or order
        st.integers(min_value=0, max_value=3),      # user/cust key
        st.integers(min_value=0, max_value=8),      # time bucket (s)
        st.integers(min_value=1, max_value=50),     # price
    ),
    min_size=1,
    max_size=20,
)


@given(_asof_cases)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_scan(spark, rows):
    import datetime as dt

    from cdc_extractor_spark.operators import relational

    def ts(s):
        return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            seconds=s
        )

    events, orders = [], []
    for i, (is_event, key, bucket, price) in enumerate(rows):
        if is_event:
            events.append((i, key, ts(bucket), "click", 1.0, "{}"))
        else:
            orders.append((i, key, "O", float(price), ts(bucket), "1-URGENT"))
    if not events:
        events.append((999, 0, ts(0), "click", 1.0, "{}"))
    edf = spark.createDataFrame(
        events,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    odf = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        r["event_id"]: (r["last_orderkey"], r["last_total_cents"])
        for r in relational.asof_join_latest_order(edf, odf).collect()
    }
    # ground truth: linear scan per event — latest (ts, orderkey) at-or-before
    for eid, key, ets, *_ in events:
        cands = [
            (od, ok, round(pr * 100))
            for ok, ck, _, pr, od, _ in orders
            if ck == key and od <= ets
        ]
        expect = (None, None)
        if cands:
            od, ok, cents = max(cands, key=lambda c: (c[0], c[1]))
            expect = (ok, cents)
        assert got[eid] == expect, (eid, got[eid], expect)
