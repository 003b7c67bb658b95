"""Property-based checks (hypothesis) for the round-5 second wave:
ground truths computed by direct Python folds over arbitrary small
inputs — the same discipline as test_cdc_property.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (event_type in tiny domain, day parity, value cents bucket)
_drift_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=1),     # day parity side
        st.integers(min_value=0, max_value=49_000),  # cents
    ),
    min_size=1,
    max_size=40,
)


def _mk_drift_df(spark, rows):
    from pyspark.sql import functions as F

    # Jan 2 2024 is an even epoch day, Jan 3 odd
    data = [
        (1704153600000 + side * 86400000, t, cents / 100.0)
        for (t, side, cents) in rows
    ]
    return spark.createDataFrame(
        data, "ms long, event_type string, value double"
    ).select(F.timestamp_millis("ms").alias("ts"), "event_type", "value")


def _tv_fold(rows):
    """Ground truth: exact total variation over the fixed $25 bins."""
    out = {}
    for t in {r[0] for r in rows}:
        na, nb = {}, {}
        for (tt, side, cents) in rows:
            if tt != t:
                continue
            b = min(19, cents // 2500)
            (na if side == 0 else nb)[b] = (na if side == 0 else nb).get(b, 0) + 1
        ta, tb = sum(na.values()), sum(nb.values())
        if ta == 0 or tb == 0:
            out[t] = (ta, tb, 1000)
            continue
        s = sum(
            abs(na.get(b, 0) * tb - nb.get(b, 0) * ta)
            for b in set(na) | set(nb)
        )
        out[t] = (ta, tb, 1000 * s // (2 * ta * tb))
    return out


@given(_drift_rows)
@settings(**_SETTINGS)
def test_feature_drift_tv_matches_fold(spark, rows):
    from cdc_extractor_spark.operators.analytics import feature_drift_tv

    got = {
        r["event_type"]: (r["n_even_days"], r["n_odd_days"], r["tv_permille"])
        for r in feature_drift_tv(_mk_drift_df(spark, rows)).collect()
    }
    assert got == _tv_fold(rows)


@given(_drift_rows)
@settings(**_SETTINGS)
def test_feature_drift_tv_invariant_to_side_scaling(spark, rows):
    """TV is a distance between NORMALIZED distributions: duplicating
    every even-side row must not change any type's tv_permille (totals
    double, proportions don't)."""
    from cdc_extractor_spark.operators.analytics import feature_drift_tv

    doubled = rows + [r for r in rows if r[1] == 0]
    base = {
        r["event_type"]: r["tv_permille"]
        for r in feature_drift_tv(_mk_drift_df(spark, rows)).collect()
    }
    scaled = {
        r["event_type"]: r["tv_permille"]
        for r in feature_drift_tv(_mk_drift_df(spark, doubled)).collect()
    }
    assert base == scaled


_id_rows = st.lists(
    st.tuples(
        st.sampled_from(["x", "y", "z"]),
        st.integers(min_value=-3, max_value=100_000),
    ),
    min_size=0,
    max_size=50,
)


@given(_id_rows)
@settings(**_SETTINGS)
def test_bitmap_rollup_matches_set_fold(spark, rows):
    from cdc_extractor_spark.functions import sketches

    df = spark.createDataFrame(
        rows or [("x", None)], "event_type string, user_id long"
    )
    got = {
        r["event_type"]: r["n_distinct_users"]
        for r in sketches.bitmap_distinct_rollup(df).collect()
    }
    per = {}
    for t, u in rows:
        per.setdefault(t, set()).add(u)
    union = set().union(*per.values()) if per else set()
    want = {t: len(s) for t, s in per.items()}
    want["__all__"] = len(union)
    assert got == want


_vecs = st.lists(
    st.lists(
        st.floats(
            min_value=-2.0, max_value=2.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=64,
        max_size=64,
    ),
    min_size=2,
    max_size=12,
)


@given(_vecs)
@settings(**_SETTINGS)
def test_hamming_topk_matches_brute_force(spark, vecs):
    from cdc_extractor_spark.functions import similarity

    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = [
        (r["neighbor_id"], r["hamming"], r["rank"])
        for r in similarity.ann_hamming_topk(df, 1, 5)
        .orderBy("rank")
        .collect()
    ]
    # ground truth: sign bits from the FLOAT32 values the frame stores
    import numpy as np

    bits = [np.array(np.array(v, dtype=np.float32) > 0, dtype=int) for v in vecs]
    cands = sorted(
        ((int((bits[0] != bits[i]).sum()), i) for i in range(1, len(vecs))),
    )[:5]
    want = [(i, h, rk + 1) for rk, (h, i) in enumerate(cands)]
    assert got == want
