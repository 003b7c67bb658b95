"""Property-based checks (hypothesis) for the round-8 additions:
quota-selection exactness vs a direct Python fold, IVF merge ≡ rebuild
at arbitrary split points on arbitrary vectors, split-leakage pair
conservation, and token-savings accounting — same discipline as
test_round6/7_property.py (ground truths computed by plain folds, not
by SQL)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ------------------------------------------- cluster-balanced selection

_member_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # vec_id
        st.integers(min_value=0, max_value=4),    # label
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _selection_fold(rows, budget=200):
    cells: dict[int, list[int]] = {}
    for vid, lab in rows:
        cells.setdefault(lab, []).append(vid)
    total = len(rows)
    out = []
    for lab, vids in cells.items():
        quota = max(1, budget * len(vids) // total)
        ranked = sorted(
            vids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
        )
        sel = ranked[:quota]
        out.append((lab, len(vids), quota, len(sel), sum(sel)))
    return sorted(out)


@given(_member_rows)
@settings(**_SETTINGS)
def test_cluster_balanced_selection_matches_fold(spark, rows):
    """Quota arithmetic AND the md5-rank member choice must equal the
    direct Python fold for arbitrary cell-size skews (including
    single-member cells, where the floor-1 rule engages)."""
    from pyspark.sql import functions as F

    from cdc_extractor_spark.functions import similarity

    df = spark.createDataFrame(
        [(v, [0.0], l) for v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = sorted(
        tuple(r)
        for r in similarity.cluster_balanced_selection(df)
        .select("label", "n_members", "quota", "n_selected",
                "sum_selected_ids")
        .collect()
    )
    assert got == _selection_fold(rows)


# ----------------------------------------------------- IVF index merge

_vec_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),                  # vec_id
        st.integers(min_value=0, max_value=2),                    # label
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0,
                      allow_nan=False, width=32),
            min_size=3, max_size=3,
        ),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _rebuild_fold(rows, split):
    cells: dict[int, list[tuple[int, list[float]]]] = {}
    for vid, lab, emb in rows:
        cells.setdefault(lab, []).append((vid, emb))
    out = []
    for lab, members in cells.items():
        n = len(members)
        n_new = sum(1 for vid, _ in members if vid >= split)
        fp = 0
        dim = len(members[0][1])
        for pos in range(dim):
            s = sum(
                math.floor((float(e[pos]) + 1.0) * 1_000_000)
                for _, e in members
            )
            fp += s // n
        out.append((lab, n - n_new, n_new, n, fp))
    return sorted(out)


@given(_vec_rows, st.integers(min_value=0, max_value=501))
@settings(**_SETTINGS)
def test_ivf_index_merge_equals_rebuild_fold(spark, rows, split):
    """merge(old partials, new partials) must equal the from-scratch
    Python rebuild for arbitrary vectors and ANY split point —
    including splits that make a cell all-old or all-new."""
    from cdc_extractor_spark.functions import similarity

    df = spark.createDataFrame(
        [(vid, emb, lab) for vid, lab, emb in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = sorted(
        tuple(r)
        for r in similarity.ivf_index_merge(df, split)
        .select("label", "n_old", "n_new", "n_total", "centroid_fp")
        .collect()
    )
    assert got == _rebuild_fold(rows, split)


# ------------------------------------------------ token-savings report

_doc_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),                    # doc_id
        st.sampled_from(["a b c", "a b", "x y z w", "q", "a b c"]),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


def _savings_fold(rows):
    keep: dict[str, int] = {}
    for did, txt, _ in rows:
        keep[txt] = min(keep.get(txt, did), did)
    out: dict[str, list[int]] = {}
    for did, txt, src in rows:
        toks = len([t for t in txt.split(" ") if t])
        agg = out.setdefault(src, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += toks
        if keep[txt] == did:
            agg[2] += 1
            agg[3] += toks
    return sorted((s, *v) for s, v in out.items())


@given(_doc_rows)
@settings(**_SETTINGS)
def test_dedup_token_savings_matches_fold(spark, rows):
    """Keeper attribution across sources (a copy in another source
    loses to the global min doc_id) must match the Python fold."""
    from cdc_extractor_spark.functions import text

    df = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = sorted(
        tuple(r)
        for r in text.dedup_token_savings(df)
        .select("source", "n_docs", "tokens_total", "n_keepers",
                "tokens_kept")
        .collect()
    )
    assert got == _savings_fold(rows)
