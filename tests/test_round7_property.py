"""Property-based checks (hypothesis) for the round-7 additions:
containment prefix-filter losslessness, Heaps-curve exactness, kNN
confusion-matrix consistency, and snapshot-diff NULL-value
classification — ground truths from direct Python folds, same
discipline as test_round6_property.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ----------------------------------------------------------- containment

_basket_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),    # orderkey
        st.integers(min_value=1, max_value=10),   # partkey
    ),
    min_size=1,
    max_size=40,
)


def _containment_fold(rows, t=800):
    sets: dict[int, set[int]] = {}
    for o, p in rows:
        sets.setdefault(o, set()).add(p)
    out = []
    keys = sorted(sets)
    for a in keys:
        for b in keys:
            na, nb = len(sets[a]), len(sets[b])
            if a == b or (na, a) >= (nb, b):
                continue
            inter = len(sets[a] & sets[b])
            if 1000 * inter >= t * na:
                out.append((a, b, na, nb, inter, 1000 * inter // na))
    return sorted(out)


@given(_basket_rows)
@settings(**_SETTINGS)
def test_containment_prefix_filter_is_lossless(spark, rows):
    """The A-prefix ⋈ B-full candidate stage must lose no qualifying
    pair: Spark output == the naive quadratic fold, for arbitrary
    basket structures (subset, disjoint, equal-size tie-break)."""
    from cdc_extractor_spark.functions import dedup

    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = sorted(
        tuple(r)
        for r in dedup.setcontain_prefix_filter_pairs(df).collect()
    )
    assert got == _containment_fold(rows)


# ------------------------------------------------------------ Heaps curve

_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e", "f"]),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=12,
)


def _heaps_fold(doc_words, K=8):
    mx = len(doc_words) - 1
    out = []
    for k in range(1, K + 1):
        thr = (k * mx) // K if mx > 0 else 0
        docs = thr + 1
        toks = sum(len(w) for w in doc_words[: thr + 1])
        vocab = len({t for w in doc_words[: thr + 1] for t in w})
        out.append((k, thr, docs, toks, vocab))
    return out


@given(_docs)
@settings(**_SETTINGS)
def test_vocab_growth_curve_exact(spark, doc_words):
    from cdc_extractor_spark.functions import text

    rows = [(i, " ".join(w)) for i, w in enumerate(doc_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in text.vocab_growth_curve(df).collect()
    )
    assert got == _heaps_fold(doc_words)


# ------------------------------------------------- kNN confusion matrix


def test_knn_confusion_consistent_with_noise_report(spark, sf_dir):
    """The confusion matrix must be the drill-down of the noise
    report: per true label, row-sum == n_eval and off-diagonal sum ==
    n_disagree — both derived from the SAME vote, so any divergence
    means the two paths rank/tie-break differently."""
    from cdc_extractor_spark.functions import similarity
    from cdc_extractor_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    noise = {
        r["label"]: (r["n_eval"], r["n_disagree"])
        for r in similarity.knn_label_agreement(emb).collect()
    }
    cells = similarity.knn_vote_confusion(emb).collect()
    per_true: dict[int, list] = {}
    for r in cells:
        per_true.setdefault(r["true_label"], []).append(r)
    assert set(per_true) == set(noise)
    for label, (n_eval, n_disagree) in noise.items():
        rows = per_true[label]
        assert sum(r["n_queries"] for r in rows) == n_eval
        assert (
            sum(
                r["n_queries"]
                for r in rows
                if r["pred_label"] != r["true_label"]
            )
            == n_disagree
        )


# -------------------------------------------- snapshot diff NULL values


def test_snapshot_diff_null_values_classify_as_present(spark):
    """A live key whose value is NULL on one or both sides must land
    in changed/unchanged (null-safe comparison), never added/removed —
    the exact ADVICE-r6 failure mode of value-nullness classification."""
    from cdc_extractor_spark.operators import cdc

    rows = [
        # key 1: live both sides, NULL -> 5  => changed
        (1, "t", 10, 1000, "I", 1, None),
        (2, "t", 11, 3000, "U", 1, 5),
        # key 2: live both sides, NULL -> NULL => unchanged
        (3, "t", 12, 1000, "I", 2, None),
        # key 3: NULL value inserted after t1 => added (key absent at t1)
        (4, "t", 13, 3000, "I", 3, None),
        # key 4: live at t1 with NULL value, deleted by t2 => removed
        (5, "t", 14, 1000, "I", 4, None),
        (6, "t", 15, 3000, "D", 4, None),
    ]
    ch = spark.createDataFrame(
        rows,
        "event_id long, table_name string, transaction_id long, "
        "commit_ts_ms long, action string, key long, val_cents long",
    )
    out = {r["table_name"]: r for r in cdc.snapshot_diff(ch, 2000, 4000).collect()}
    r = out["t"]
    assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) == (
        1, 1, 1, 1,
    )
