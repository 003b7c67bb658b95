"""Property-based checks (hypothesis) for the round-6 second wave:
ground truths computed by direct Python folds over arbitrary small
inputs — the same discipline as test_wave_property.py.  Focus is the
algorithmically risky claims: prefix-filter losslessness, segmented
running max ≡ global running max, exact integer moment arithmetic,
power-iteration exactness, RAKE segmentation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ---------------------------------------------------------------- setsim

_basket_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),    # orderkey
        st.integers(min_value=1, max_value=10),   # partkey
    ),
    min_size=1,
    max_size=40,
)


def _setsim_fold(rows, t=500):
    sets: dict[int, set[int]] = {}
    for o, p in rows:
        sets.setdefault(o, set()).add(p)
    out = []
    keys = sorted(sets)
    for ia, a in enumerate(keys):
        for b in keys[ia + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 1000 * inter >= t * union:
                out.append((a, b, inter, union, 1000 * inter // union))
    return sorted(out)


@given(_basket_rows)
@settings(**_SETTINGS)
def test_setsim_prefix_filter_is_lossless(spark, rows):
    from cdc_extractor_spark.functions import dedup

    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = sorted(
        tuple(r) for r in dedup.setsim_prefix_filter_pairs(df).collect()
    )
    assert got == _setsim_fold(rows)


# ------------------------------------------------- order inversion audit

_change_rows = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2"]),
        st.integers(min_value=0, max_value=30),     # txn id
        st.integers(min_value=0, max_value=20_000),  # ts offset ms
    ),
    min_size=1,
    max_size=40,
)


def _inversion_fold(rows, delay_mod=7, delay_ms=5000):
    base = 1_700_000_000_000
    per_table: dict[str, list[tuple[int, int]]] = {}
    for eid, (tbl, txn, off) in enumerate(rows):
        ts2 = base + off - (delay_ms if txn % delay_mod == 0 else 0)
        per_table.setdefault(tbl, []).append((eid, ts2))
    out = {}
    for tbl, evs in per_table.items():
        evs.sort()
        hwm, n_inv, max_lag = None, 0, None
        for _, ts2 in evs:
            if hwm is not None and hwm > ts2:
                n_inv += 1
                lag = hwm - ts2
                max_lag = lag if max_lag is None else max(max_lag, lag)
            hwm = ts2 if hwm is None else max(hwm, ts2)
        n = len(evs)
        out[tbl] = (n, n_inv, 1000 * n_inv // n, max_lag)
    return out


@given(_change_rows)
@settings(**_SETTINGS)
def test_order_inversion_segmented_equals_global(spark, rows):
    from cdc_extractor_spark.operators import cdc

    base = 1_700_000_000_000
    data = [
        (tbl, eid, txn, base + off)
        for eid, (tbl, txn, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "table_name string, event_id long, transaction_id long, "
        "commit_ts_ms long",
    )
    got = {
        r["table_name"]: (
            r["n_rows"], r["n_inverted"], r["inverted_permille"],
            r["max_lag_ms"],
        )
        for r in cdc.order_inversion_audit(df).collect()
    }
    assert got == _inversion_fold(rows)


# ------------------------------------------------------ autocorrelation

_series_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=30),       # hour bucket
        st.integers(min_value=0, max_value=400_000),  # cents
    ),
    min_size=1,
    max_size=40,
)

_ACF_LAGS = (1, 2, 3, 6, 12, 24)


def _acf_fold(rows):
    hourly: dict[tuple[str, int], int] = {}
    for t, b, c in rows:
        hourly[(t, b)] = hourly.get((t, b), 0) + c
    v = {k: cents // 100 for k, cents in hourly.items()}
    out = {}
    for (t, _) in v:
        for lag in _ACF_LAGS:
            pairs = [
                (v[(t, b)], v[(t, b - lag)])
                for (tt, b) in v
                if tt == t and (t, b - lag) in v
            ]
            if not pairs:
                continue
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            num = n * sxy - sx * sy
            dx, dy = n * sxx - sx * sx, n * syy - sy * sy
            # parenthesized: sign applied AFTER the truncating division
            # (sign * a // b would floor the negative product instead)
            acf = (
                (-1 if num < 0 else 1) * ((1000 * num * num) // (dx * dy))
                if dx * dy > 0
                else None
            )
            out[(t, lag)] = (n, acf)
    return out


@given(_series_rows)
@settings(**_SETTINGS)
def test_hourly_autocorrelation_moments(spark, rows):
    from pyspark.sql import functions as F

    from cdc_extractor_spark.operators import analytics

    data = [(b * 3600_000 + 1, t, c / 100.0) for t, b, c in rows]
    df = spark.createDataFrame(
        data, "ms long, event_type string, value double"
    ).select(F.timestamp_millis("ms").alias("ts"), "event_type", "value")
    got = {
        (r["event_type"], r["lag_hours"]): (
            r["n_pairs"], r["acf_sq_signed_permille"],
        )
        for r in analytics.hourly_autocorrelation(df).collect()
    }
    assert got == _acf_fold(rows)


# -------------------------------------------------- power iteration PCA

_vec_rows = st.lists(
    st.lists(
        st.integers(min_value=-8, max_value=8).map(lambda k: k / 8.0),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=6,
)


def _power_fold(vecs, n_iters=2):
    xs = [[round(e * 1000) for e in v] for v in vecs]
    d = 4
    c = [[sum(x[i] * x[j] for x in xs) for j in range(d)] for i in range(d)]
    v = [1000] * d
    for _ in range(n_iters):
        y = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(t) for t in y)
        v = [
            (-1 if y[i] < 0 else 1) * ((1000 * abs(y[i])) // max(m, 1))
            for i in range(d)
        ]
    return {i: v[i] for i in range(d)}


@given(_vec_rows)
@settings(**_SETTINGS)
def test_power_iteration_exact(spark, vecs):
    from pyspark.sql import functions as F

    from cdc_extractor_spark.functions import similarity

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["dim"]: r["loading_permille"]
        for r in similarity.embedding_power_iteration(df).collect()
    }
    assert got == _power_fold(vecs)


# ----------------------------------------------------------------- RAKE

_doc_rows = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=6,
)


def _rake_fold(docs, n_stop=2, top_k=10):
    dfreq: dict[str, set[int]] = {}
    for i, ws in enumerate(docs):
        for w in ws:
            dfreq.setdefault(w, set()).add(i)
    stop = set(
        w
        for w, _ in sorted(
            ((w, len(ds)) for w, ds in dfreq.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:n_stop]
    )
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for ws in docs:
        phrase: list[str] = []
        for w in ws + ["<END>"]:
            if w in stop or w == "<END>":
                for pw in phrase:
                    freq[pw] = freq.get(pw, 0) + 1
                    degree[pw] = degree.get(pw, 0) + len(phrase)
                phrase = []
            else:
                phrase.append(w)
    scored = [
        (w, freq[w], degree[w], 1000 * degree[w] // freq[w]) for w in freq
    ]
    scored.sort(key=lambda r: (-r[3], -r[2], r[0]))
    return sorted(scored[:top_k])


@given(_doc_rows)
@settings(**_SETTINGS)
def test_rake_keywords_fold(spark, docs):
    from cdc_extractor_spark.functions import text as text_fns

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in text_fns.rake_keywords(df, n_stopwords=2, top_k=10).collect()
    )
    assert got == _rake_fold(docs)


# -------------------------------------------------------- snapshot diff

_diff_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),       # key
        st.sampled_from(["I", "U", "D"]),            # action
        st.integers(min_value=0, max_value=9_999),   # cents
        st.integers(min_value=0, max_value=100),     # commit offset s
    ),
    min_size=1,
    max_size=30,
)


def _snapshot(evs, t):
    """evs: [(event_id, key, action, cents, ts)] → {key: cents} live set."""
    latest = {}
    for eid, k, a, c, ts in evs:
        if ts <= t:
            cur = latest.get(k)
            if cur is None or (ts, eid) > (cur[0], cur[1]):
                latest[k] = (ts, eid, a, c)
    return {k: v[3] for k, v in latest.items() if v[2] != "D"}


def _diff_fold(rows, t1, t2):
    base = 1_700_000_000_000
    evs = [
        (eid, k, a, c, base + off * 1000)
        for eid, (k, a, c, off) in enumerate(rows)
    ]
    s1, s2 = _snapshot(evs, base + t1 * 1000), _snapshot(evs, base + t2 * 1000)
    keys = set(s1) | set(s2)
    if not keys:
        return None
    added = sum(1 for k in keys if k not in s1 and k in s2)
    removed = sum(1 for k in keys if k in s1 and k not in s2)
    changed = sum(
        1 for k in keys if k in s1 and k in s2 and s1[k] != s2[k]
    )
    unchanged = sum(
        1 for k in keys if k in s1 and k in s2 and s1[k] == s2[k]
    )
    return (added, removed, changed, unchanged)


@given(_diff_rows, st.integers(min_value=0, max_value=100),
       st.integers(min_value=0, max_value=100))
@settings(**_SETTINGS)
def test_snapshot_diff_fold(spark, rows, ta, tb):
    from cdc_extractor_spark.operators import cdc

    t1, t2 = min(ta, tb), max(ta, tb)
    base = 1_700_000_000_000
    data = [
        ("t", eid, k, a, c, base + off * 1000)
        for eid, (k, a, c, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "table_name string, event_id long, key long, action string, "
        "val_cents long, commit_ts_ms long",
    )
    got = cdc.snapshot_diff(df, base + t1 * 1000, base + t2 * 1000).collect()
    want = _diff_fold(rows, t1, t2)
    if want is None:
        assert got == []
    else:
        assert len(got) == 1
        r = got[0]
        assert (r["n_added"], r["n_removed"], r["n_changed"],
                r["n_unchanged"]) == want


# ------------------------------------------------- centroid shift fold

_shift_vecs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.lists(
            st.integers(min_value=-8, max_value=8).map(lambda k: k / 8.0),
            min_size=4, max_size=4,
        ),
    ),
    min_size=2,
    max_size=12,
)


def _shift_fold(rows):
    agg: dict = {}
    for vid, (lbl, v) in enumerate(rows):
        h = vid % 2
        for d, e in enumerate(v):
            s = agg.setdefault((lbl, d), [0, 0, 0, 0])
            s[2 * h] += round(e * 1_000_000)
            s[2 * h + 1] += 1
    out = {}
    for (lbl, d), (sa, na, sb, nb) in agg.items():
        if na == 0 or nb == 0:
            continue
        # truncating div toward zero (Spark div / DuckDB //), not floor
        qa = abs(sa) // na * (-1 if sa < 0 else 1)
        qb = abs(sb) // nb * (-1 if sb < 0 else 1)
        g = abs(qa - qb)
        e = out.setdefault(lbl, [na, nb, 0, 0])
        e[2] += g
        e[3] = max(e[3], g)
    return {lbl: tuple(v) for lbl, v in out.items()}


@given(_shift_vecs)
@settings(**_SETTINGS)
def test_centroid_shift_fold(spark, rows):
    from cdc_extractor_spark.functions import similarity

    df = spark.createDataFrame(
        [(i, lbl, v) for i, (lbl, v) in enumerate(rows)],
        "vec_id long, label int, embedding array<float>",
    )
    got = {
        r["label"]: (r["n_a"], r["n_b"], r["l1_shift_micro"],
                     r["max_dim_shift_micro"])
        for r in similarity.embedding_centroid_shift(df).collect()
    }
    assert got == _shift_fold(rows)
