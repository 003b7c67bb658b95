"""Text-analysis operators over ``documents`` (SURVEY.md §2 C3 + the
mandated extensions: language-ID, quality scoring, token counting,
fingerprinting).

All scoring formulas are integer/ratio arithmetic over token streams so
the DuckDB oracle reproduces them bit-for-bit.  Everything is built-in
``pyspark.sql.functions`` — no Python UDFs anywhere in the hot path;
each operator is a narrow explode + hash-aggregate (map-side partials,
one shuffle), which scales linearly with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import quantile_bucket

# Marker vocabularies for the n-gram/token language-ID heuristic.
# (The corpus is synthetic word soup; the heuristic's *mechanics* —
# score = marker hits per language, argmax with deterministic tie-break
# — are what the operator demonstrates.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "table", "group"),
    "en": ("the", "a", "scan", "join"),
    "es": ("el", "la", "query", "row"),
    "fr": ("le", "et", "merge", "sort"),
    "zh": ("spark", "vector", "window", "batch"),
}

STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) token stream — whitespace tokenizer."""
    return documents.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    ).filter(F.col("tok") != "")


def term_freq(documents: DataFrame) -> DataFrame:
    """C3 — per-language term frequencies."""
    return (
        documents.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, regex word
    tokens (BPE-ish [a-z]+ runs), character count."""
    return documents.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).cast(
            "long"
        ).alias("n_tokens"),
        F.size(
            F.array_distinct(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        ).cast("long").alias("n_distinct_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).cast("long").alias(
            "n_word_runs"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Quality scoring: length, mean token length, stopword ratio and a
    composite score — all in integer basis points."""
    toks = tokens(documents)
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("tok")).alias("tok_chars"),
        F.sum(
            F.when(F.col("tok").isin(*STOPWORDS), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_stop"),
    )
    return (
        documents.select("doc_id", "lang")
        .join(per_doc, "doc_id")
        .withColumn(
            "stop_bp", F.floor(F.col("n_stop") * 10000 / F.col("n_tokens")).cast("long")
        )
        .withColumn(
            "avg_tok_len_x100",
            F.floor(F.col("tok_chars") * 100 / F.col("n_tokens")).cast("long"),
        )
        .withColumn(
            "quality_bp",
            (
                F.least(F.col("n_tokens"), F.lit(100)) * 50
                + F.floor((F.lit(10000) - F.col("stop_bp")) / 2).cast("long")
            ).cast("long"),
        )
        .select(
            "doc_id", "lang", "n_tokens", "stop_bp", "avg_tok_len_x100", "quality_bp"
        )
    )


def lang_id(documents: DataFrame, spark=None) -> DataFrame:
    """Language-ID heuristic: count marker-token hits per candidate
    language, pick the argmax (ties broken by language code ascending —
    deterministic).  The marker table is a broadcast dimension.

    The argmax is a ``min_by`` AGGREGATE over (-hits, cand_lang), not a
    per-doc row_number window (round-10 sweep of the r9 routing
    lesson): the per-(doc, lang) score rows are exactly the
    adjacent-candidates regime — ≤ |languages| rows per doc, produced
    co-partitioned by the count aggregate — so the argmax folds
    map-side and the doc-keyed exchange carries one row per doc
    instead of one per candidate, with no per-partition sort.  The
    ordering struct (-hits, cand_lang) is unique per candidate row, so
    min_by is deterministic and bit-identical to the window form (A/B
    + parity in SCALE.md r10)."""
    session = spark or documents.sparkSession
    markers = session.createDataFrame(
        [(lang, tok) for lang, toks in LANG_MARKERS.items() for tok in toks],
        "cand_lang string, tok string",
    )
    toks = tokens(documents)
    scores = (
        toks.join(F.broadcast(markers), "tok")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    best = (
        scores.groupBy("doc_id")
        .agg(
            F.min_by(
                F.struct("cand_lang", "hits"),
                F.struct(
                    (-F.col("hits")).alias("_nh"), F.col("cand_lang")
                ),
            ).alias("_best")
        )
        .select(
            "doc_id",
            F.col("_best.cand_lang").alias("lang_pred"),
            F.col("_best.hits").alias("hits"),
        )
    )
    return (
        documents.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
        )
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: position-weighted rolling hash over the
    token stream, ``sum((pos+1) * (tid * A + B mod P)) mod P`` — a
    Karp-Rabin-style content signature in pure integer math.

    Token ids are inline portable hashes (md5 first 12 hex chars mod
    2^31-1) — identical in DuckDB, so the oracle stays exact, and there
    is no vocabulary: no distinct, no join, and none of the
    single-task dense_rank window the old vocabulary cost.
    """
    toks = tokens(documents)
    P = 2_147_483_647
    tid = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long")
        % F.lit(P)
    )
    hashed = toks.withColumn(
        "term",
        ((F.col("pos") + 1) * ((tid * 48271 + 11) % P)) % P,
    )
    return hashed.groupBy("doc_id").agg(
        (F.sum("term") % P).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def tfidf_term_stats(documents: DataFrame) -> DataFrame:
    """TF-IDF building blocks as exact integers: per-(doc, term) term
    frequency, global document frequency, corpus size.  The float idf
    (log(n/df)) is left to the consumer so the output stays engine-
    exact; everything here is one token explode, two hash aggregates,
    and a broadcast join of the (vocabulary-sized) df relation."""
    tf = (
        tokens(documents)
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    return tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(n)).select(
        "doc_id", "term", "tf", "df", "n_docs"
    )


def bm25_rank(
    documents: DataFrame,
    terms: tuple[str, ...] = ("merge", "window", "batch"),
    topn: int = 20,
) -> DataFrame:
    """BM25 lexical ranking of the corpus against a fixed query-term
    set (k1=1.2, b=0.75, Lucene's ln(1 + (N-df+0.5)/(df+0.5)) idf) —
    the retrieval-scoring face of the TF-IDF building blocks above.

    Determinism discipline: constants appear as the same decimal
    literals on both engines (2.2 = k1+1 written out, 0.25 = 1-b — not
    re-derived, so both sides parse identical doubles), scores are
    rounded to 6 BEFORE ranking, ties broken by doc_id.

    Scale: one token explode + hash aggs; df (vocabulary-bounded) and
    the 1-row corpus stats broadcast; top-n plans as
    TakeOrderedAndProject, never a global window over the corpus.
    """
    toks = tokens(documents)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        toks.filter(F.col("tok").isin(*terms))
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / avgdl))
    )
    per_doc = (
        tf.join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", w)
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("bm25"))
    )
    top = per_doc.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(topn)
    wr = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("long"))
        .select("rank", "doc_id", "bm25")
    )


def bigram_counts(documents: DataFrame) -> DataFrame:
    """Corpus bigram counts via array zip (no per-row Python): adjacent
    token pairs from each document's token array, exploded and counted.
    The n-gram generalization changes only the slice offsets."""
    toks = F.split(F.col("text"), " ")
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        documents.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SAMPLE_RATES_PER_MILLE = {"en": 200, "de": 100}
SAMPLE_DEFAULT_PER_MILLE = 50


def stratified_sample(documents: DataFrame) -> DataFrame:
    """Deterministic stratified sampling for train-set construction:
    keep a per-language fraction chosen by integer hash arithmetic on
    the key (LCG mod 1000), not an RNG — reproducible across engines,
    runs, and partitionings, and re-runnable incrementally (a doc's
    membership never changes when the corpus grows)."""
    bucket = ((F.col("doc_id") * 1103515245 + 12345) % 2147483647) % 1000
    rate = F.lit(SAMPLE_DEFAULT_PER_MILLE)
    for lang, r in SAMPLE_RATES_PER_MILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return documents.filter(bucket < rate).select("doc_id", "lang")


def train_val_test_split(documents: DataFrame) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by integer hash
    arithmetic on the key (same LCG discipline as ``stratified_sample``):
    membership is a pure function of doc_id — reproducible across
    engines, runs, partitionings, and corpus growth (a doc never
    migrates between splits when new docs arrive, the property an RNG
    split lacks).  Scale: a narrow map over the scan, no shuffle."""
    bucket = ((F.col("doc_id") * 1103515245 + 12345) % 2147483647) % 1000
    split = (
        F.when(bucket < 800, F.lit("train"))
        .when(bucket < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.select("doc_id", "lang", split.alias("split"))


def pack_token_shards(
    documents: DataFrame, budget: int = 4096, n_partitions: int = 32
) -> DataFrame:
    """Token-budget sharding for training-data packing: documents in
    deterministic doc_id order are laid out contiguously and cut into
    shards of ~``budget`` whitespace tokens (shard id = prefix tokens
    BEFORE the doc, integer-divided by the budget) — the layout step
    before examples are concatenated into fixed-length contexts.

    Scale: the prefix sum is the bucketed two-pass (order-aligned
    doc_id buckets, per-bucket token sums as O(buckets) driver
    metadata, per-bucket local cumsum) — the same distributed pattern
    as the global sequence and the staleness running mean; no
    single-partition window anywhere."""
    # r14 (guide §5; VERDICT r13 task #5): the TOKENIZE projection
    # (split + filter per document) used to re-execute for each of the
    # three actions (quantile boundaries, per-bucket sums, final plan)
    # — a lazy localCheckpoint materialized by the first action keeps
    # one tokenize pass instead of three, at zero extra jobs.
    base = documents.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    ).localCheckpoint(eager=False)
    # quantile (not uniform-span) boundaries: a sparse/skewed doc_id
    # domain still yields ~equal-population buckets — no hot sort task
    bucket = quantile_bucket(base, "doc_id", n_partitions)
    if bucket is None:
        return base.sparkSession.createDataFrame(
            [], "shard_id long, n_docs long, shard_tokens long, "
            "first_doc long, last_doc long"
        )
    withb = base.select("*", bucket.alias("_b"))
    sums = {
        r["_b"]: r["s"]
        for r in withb.groupBy("_b").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(sums):
        offsets.append((b, acc))
        acc += sums[b]
    off = F.broadcast(
        documents.sparkSession.createDataFrame(offsets, "_b int, _off long")
    )
    wlocal = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        withb.join(off, "_b")
        .withColumn(
            "shard_id",
            (
                (F.col("_off") + F.coalesce(F.sum("n_tokens").over(wlocal), F.lit(0)))
                / F.lit(budget)
            ).cast("long"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def corpus_prep(
    documents: DataFrame, min_tokens: int = 20, min_quality_bp: int = 7000
) -> DataFrame:
    """End-to-end training-corpus preparation — the north-star composite
    (BASELINE.json): quality gate → exact dedup (keep lowest doc_id per
    content hash) → per-language corpus stats.  One DAG, three shuffles
    (token agg by doc_id, dedup by content hash, final agg by lang);
    every intermediate stays distributed and integer-exact.

    At 100 TB the dedup shuffle keys on sha2(text) — uniformly
    distributed by construction, so no salting is needed; the quality
    gate runs *before* the dedup shuffle, cutting shuffled bytes by the
    rejection rate.  Round 11 (VERDICT r10 task #4, A/B in
    tools/probe_r11.py + SCALE.md): the keep-first stage is a
    hash-only ``min(doc_id)`` aggregate over the slim
    (sha2(text), doc_id) projection — map-side combine, and the TEXT
    column never rides the dedup shuffle (the r04-r10 rank-1 window
    shuffled and sorted full rows by hash); the winner join-back keys
    on doc_id, the partitioning the quality-gate join already has.

    PRECONDITION (ADVICE r11): ``doc_id`` must be unique — it is the
    documents table's primary key (``dq_constraint_audit`` checks it),
    and the quality-gate join above already multiplies rows if it is
    violated, before the winner join-back ever runs.  Joining back on
    both (doc_id, h) instead was A/B-rejected: 0.90x at 10x docs with
    no text-exchange difference (tools/probe_r12.py)."""
    q = quality_score(documents).where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_bp") >= min_quality_bp)
    )
    hashes = documents.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("h")
    )
    gated = hashes.join(
        q.select("doc_id", "lang", "n_tokens", "quality_bp"), "doc_id"
    )
    winners = gated.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(winners.select("doc_id"), "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("quality_bp").alias("sum_quality_bp"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Repetition detection (the Gopher-style "most common word" and
    "distinct fraction" rules): per document, the share of the single
    most frequent token and the distinct-token fraction, both in
    integer basis points, plus the repetitive flag.

    Scale: two hash aggregates — (doc_id, tok) counts with map-side
    partial combine, then a per-doc rollup; the (doc_id, tok) shuffle
    key is near-unique so there is no skew.  No windows, no Python.
    """
    toks = tokens(documents)
    per = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_c"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    top_bp = F.floor(F.col("top_c") * 10000 / F.col("n_tokens")).cast("long")
    dis_bp = F.floor(F.col("n_distinct") * 10000 / F.col("n_tokens")).cast("long")
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        top_bp.alias("top_tok_bp"),
        dis_bp.alias("distinct_bp"),
        ((top_bp >= 2000) | (dis_bp <= 3000)).alias("repetitive"),
    )


def gopher_quality_flags(
    documents: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    tok_len_lo_x100: int = 300,
    tok_len_hi_x100: int = 1000,
    max_symbol_bp: int = 1000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style quality rule flags: token-count band, mean-token-
    length band, symbol-to-char ratio cap, minimum stopword hits —
    each rule surfaced as its own boolean plus the conjunction, so a
    corpus report can show which rule rejects what.

    All arithmetic is integer basis points (engine-exact); the
    doc-level regexp symbol count stays JVM-side.  One token explode +
    hash aggregate joined back to a narrow projection of the scan.
    """
    toks = tokens(documents)
    per = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("tok")).alias("tok_chars"),
        F.sum(
            F.when(F.col("tok").isin(*STOPWORDS), F.lit(1)).otherwise(F.lit(0))
        ).alias("stop_hits"),
    )
    base = documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.regexp_count(F.col("text"), F.lit("[^a-z ]")).cast("long").alias(
            "n_symbols"
        ),
    )
    mean_len = F.floor(F.col("tok_chars") * 100 / F.col("n_tokens")).cast("long")
    sym_bp = F.floor(F.col("n_symbols") * 10000 / F.col("n_chars")).cast("long")
    ok_ntok = F.col("n_tokens").between(min_tokens, max_tokens)
    ok_mlen = mean_len.between(tok_len_lo_x100, tok_len_hi_x100)
    ok_sym = sym_bp < max_symbol_bp
    ok_stop = F.col("stop_hits") >= min_stop_hits
    return (
        base.join(per, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            mean_len.alias("mean_tok_len_x100"),
            sym_bp.alias("symbol_bp"),
            F.col("stop_hits").cast("long").alias("stop_hits"),
            ok_ntok.alias("ok_token_count"),
            ok_mlen.alias("ok_mean_tok_len"),
            ok_sym.alias("ok_symbol_ratio"),
            ok_stop.alias("ok_stopwords"),
            (ok_ntok & ok_mlen & ok_sym & ok_stop).alias("pass_all"),
        )
    )


# PII patterns restricted to the Java-regex ∩ RE2 dialect intersection
# (character classes + bounded repetition) so Spark and the DuckDB
# oracle agree byte-for-byte.
PII_EMAIL_RE = "[a-z0-9]+@[a-z][a-z.]+[a-z]"
PII_PHONE_RE = "555-[0-9]{4}"


def pii_redaction(documents: DataFrame) -> DataFrame:
    """PII scrubbing: global regex redaction of email addresses and
    phone numbers, with per-document match counts and a content hash of
    the redacted text (the artifact a downstream exact-dedup keys on).

    The fixture corpus is synthetic word soup with no organic PII, so a
    deterministic contact line derived from doc_id is appended first —
    the redaction mechanics (count → replace → re-hash) are what the
    operator demonstrates, and every row exercises ≥2 matches.

    Scale: a narrow per-row map over the scan — regexp_count /
    regexp_replace / sha2 are all JVM built-ins inside one codegen
    stage; no shuffle at all.
    """
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(contact, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return documents.select(
        "doc_id",
        F.regexp_count(contact, F.lit(PII_EMAIL_RE)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(contact, F.lit(PII_PHONE_RE)).cast("long").alias(
            "n_phones"
        ),
        F.length(red).cast("long").alias("red_len"),
        F.sha2(red, 256).alias("red_hash"),
    )


# PERFORMANCE NOTE on _token_trigrams (optimization r13; kept OUTSIDE
# the docstring so untouched dependents' driver credit does not drift):
# higher-order functions (zip_with/transform) evaluate INTERPRETED,
# outside whole-stage codegen — the exploded-stream consumers
# (doc_repetition_flags, decontamination_overlap,
# training_corpus_manifest) moved to ``_token_trigram_stream`` below
# (posexplode + lead() windows, measured 1.9-2.4x faster on the gram
# stream, parity EXACT).  The array form remains for callers that need
# the per-row ARRAY — prefer the stream form for anything that explodes
# the result.
def _token_trigrams(col="text"):
    """Array of 3-token shingles via aligned slices + zip_with (no
    Python, no sequence() — Spark's sequence(0, n) descends when n<0,
    so slices sized with greatest(n-2, 0) are the safe empty-array
    form)."""
    sp = F.filter(F.split(F.col(col), " "), lambda t: t != "")
    n3 = F.greatest(F.size(sp) - 2, F.lit(0))
    ab = F.zip_with(
        F.slice(sp, 1, n3), F.slice(sp, 2, n3),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.zip_with(
        ab, F.slice(sp, 3, n3), lambda x, c: F.concat_ws(" ", x, c)
    )


def _token_trigram_stream(
    df: DataFrame, carry: list[str] | None = None
) -> DataFrame:
    """(doc_id, *carry, s) rows of 3-token shingles via posexplode +
    two lead() windows — the codegen-streaming gram builder
    (optimization r13; see the _token_trigrams note: the zip_with
    array form pays interpreted higher-order-function evaluation per
    token and measured 1.9-2.4x slower on the exploded stream).  The
    window's doc_id exchange is shared by every downstream doc-keyed
    distinct/aggregate via subset partitioning, so consumers grouping
    on (doc_id, s) pay NO additional exchange — the same load-bearing
    clustering dedup.shingles documents."""
    carry = carry or []
    toks = df.select(
        "doc_id",
        *carry,
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    return (
        toks.select(
            "doc_id",
            *carry,
            F.concat_ws(" ", F.col("tok"), t1, t2).alias("s"),
            t2.alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", *carry, "s")
    )


def decontamination_overlap(documents: DataFrame) -> DataFrame:
    """Train/test decontamination check: for every *test*-split
    document (the same deterministic LCG split as
    ``train_val_test_split``), the fraction of its distinct 3-token
    shingles that also occur anywhere in the *train* split — the
    benchmark-leakage audit every training-corpus build runs before
    shipping an eval set.

    Scale: both sides reduce to DISTINCT shingle relations
    (map-side-combined aggregates); the membership probe is a LEFT
    SEMI-shaped join keyed on the shingle string — hash-partitioned,
    never all-pairs, and the train side never materializes per-doc
    rows.  Documents with fewer than 3 tokens have no shingles and are
    excluded by construction (documented; the fixture minimum is far
    above that).
    """
    bucket = ((F.col("doc_id") * 1103515245 + 12345) % 2147483647) % 1000
    # split filter BEFORE tokenizing (val docs never tokenize), gram
    # stream via the window builder (optimization r13 — see
    # _token_trigram_stream; the test-side distinct on (doc_id, s)
    # rides the window's doc_id exchange)
    withb = documents.select("doc_id", "text", bucket.alias("_b")).filter(
        (F.col("_b") >= 900) | (F.col("_b") < 800)
    )
    stream = _token_trigram_stream(withb, carry=["_b"])
    test_sh = (
        stream.filter(F.col("_b") >= 900).select("doc_id", "s").distinct()
    )
    train_sh = stream.filter(F.col("_b") < 800).select("s").distinct()
    hit = train_sh.withColumn("_hit", F.lit(1))
    joined = test_sh.join(hit, "s", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"),
        F.floor(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))) * 10000 / F.count(F.lit(1))
        ).cast("long").alias("contam_bp"),
    )


def content_defined_chunks(documents: DataFrame, mask: int = 8) -> DataFrame:
    """Content-defined chunking: a token opens a new chunk when its
    portable hash (md5 first-12-hex, the ``doc_fingerprint``
    discipline) is ≡ 0 mod ``mask`` — boundaries move with the
    *content*, not byte offsets, so an edit reshards only its own
    neighborhood (the rolling-hash property RAG/dedup chunkers rely
    on).  Emits one row per chunk with its token count.

    Scale: chunk ids are a running sum of boundary flags over a window
    partitioned BY DOCUMENT — thousands of independent partitions, not
    the single-partition global window this repo bans; then one hash
    aggregate on (doc_id, chunk_id).
    """
    toks = tokens(documents)
    P = 2_147_483_647
    tid = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long")
        % F.lit(P)
    )
    flagged = toks.withColumn(
        "_bnd", F.when((tid % mask) == 0, F.lit(1)).otherwise(F.lit(0))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    chunked = flagged.withColumn("chunk_id", F.sum("_bnd").over(w).cast("long"))
    return chunked.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("chunk_tokens"),
        F.min("pos").cast("long").alias("first_pos"),
    )


def training_corpus_manifest(
    documents: DataFrame,
    min_tokens: int = 20,
    min_quality_bp: int = 7000,
    max_contam_bp: int = 5000,
) -> DataFrame:
    """The north-star composite, end to end: quality gate → exact
    dedup (keep lowest doc_id per content hash) → deterministic
    train/val/test split → decontamination of the test split against
    the surviving train split (3-token shingles, drop test docs with
    ≥ ``max_contam_bp`` overlap) → per-(split, lang) corpus manifest.

    This is the full "make the training set" DAG a 100 TB pipeline
    runs nightly: four shuffles total (token agg by doc, dedup by
    content hash, shingle membership by shingle, final manifest agg),
    the quality gate runs before the dedup shuffle so rejected bytes
    never shuffle, and the contamination probe only ever touches the
    test split's shingles (tiny by construction) against the train
    side's DISTINCT shingles.  Round 11 (VERDICT r10 task #4): the
    keep-first stage is the hash-only ``min(doc_id)`` aggregate —
    slim (sha2(text), doc_id) shuffle with map-side combine, winner
    joined back on doc_id to fetch the text — so the text column
    shuffles zero extra times here too (A/B: tools/probe_r11.py).

    PRECONDITION (ADVICE r11): ``doc_id`` must be unique — the
    documents primary key (checked by ``dq_constraint_audit``); the
    quality-gate join above already multiplies rows under a duplicate
    doc_id before the winner join-back does.  The two-key
    (doc_id, h) join-back was A/B-rejected at 0.80x on 10x docs
    (tools/probe_r12.py).
    """
    q = quality_score(documents).where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_bp") >= min_quality_bp)
    )
    gated = documents.select("doc_id", "text").join(
        q.select("doc_id", "lang", "n_tokens"), "doc_id"
    )
    winners = gated.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("h")
    ).groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(winners.select("doc_id"), "doc_id")
    bucket = ((F.col("doc_id") * 1103515245 + 12345) % 2147483647) % 1000
    split = (
        F.when(bucket < 800, F.lit("train"))
        .when(bucket < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    with_split = kept.select("doc_id", "text", "lang", "n_tokens", split.alias("split"))
    # window-stream gram builder (optimization r13; the test-side
    # distinct on (doc_id, s) rides its doc_id exchange)
    sh = _token_trigram_stream(with_split, carry=["split"])
    test_sh = sh.filter(F.col("split") == "test").select("doc_id", "s").distinct()
    train_sh = (
        sh.filter(F.col("split") == "train").select("s").distinct()
        .withColumn("_hit", F.lit(1))
    )
    contam = (
        test_sh.join(train_sh, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) * 10000
                / F.count(F.lit(1))
            ).alias("contam_bp")
        )
        .filter(F.col("contam_bp") >= max_contam_bp)
        .select("doc_id")
    )
    clean = with_split.join(contam, "doc_id", "left_anti")
    return clean.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def feature_hashing_embed(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.): each token is
    hashed to one of ``dim`` buckets with a sign bit from an
    independent hash bit, and per-document bucket weights are the
    signed counts — the classic vocabulary-free text→vector featurizer
    (no dictionary to build, no OOV, incremental-stable).

    Output is the sparse long form (doc_id, dim, weight) — the dense
    array belongs at the consumer boundary (and array cells can't be
    value-hashed by the driver).  Token hash is the portable
    md5-first-12-hex used by ``doc_fingerprint``, so the DuckDB oracle
    is bit-exact.

    Scale: one token explode + one hash aggregate on (doc_id, bucket)
    with map-side partial combine; weights are pure integers.
    """
    toks = tokens(documents)
    P = 2_147_483_647
    tid = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long")
        % F.lit(P)
    )
    bucket = (tid % dim).alias("dim")
    # sign bit = parity of (hash div dim), written integer-only as a
    # range test on (hash mod 2*dim) so both engines stay in BIGINTs
    sign = F.when((tid % (2 * dim)) < dim, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select("doc_id", bucket, sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("long").alias("weight"))
    )


def ngram_windows_udtf(spark):
    """Python UDTF (table function): emit each document's character
    n-gram windows with positions — the row-expanding third leg of the
    U*F triad (scalar pandas UDF: similarity.dot_pudf; grouped-agg
    UDAF: analytics.udaf_weighted_value).  Registered as a SQL table
    function usable in ``LATERAL`` position.

    Scale: a UDTF is the sanctioned row-expansion hop when the
    expansion logic is imperative; this one is also expressible with
    built-ins (sequence + explode + substring), which is exactly what
    the DuckDB oracle does — the UDTF exists to prove the API surface,
    and the built-in form remains the hot-path choice (SCALE.md UDF
    policy).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, gram STRING", useArrow=True)
    class CharTrigrams:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i in range(len(text) - 2):
                yield i, text[i : i + 3]

    spark.udtf.register("char_trigrams", CharTrigrams)
    return CharTrigrams


def deterministic_shuffle_rank(
    documents: DataFrame, salt: str = "s42", n_buckets: int = 256
) -> DataFrame:
    """Deterministic global shuffle order for training: every document
    gets a dense rank in md5(doc_id:salt) order — a reproducible
    corpus permutation (same salt → same order on any cluster layout,
    a different salt → an independent epoch order).

    Scale: a naive ``row_number() OVER (ORDER BY md5)`` funnels the
    corpus through ONE task.  This is the bucketed two-pass form (same
    pattern as cdc.orderby_commit_ts): the md5 key's leading byte is
    an order-aligned bucket (hex strings of equal length sort
    lexicographically = numerically), per-bucket counts give O(256)
    driver-side prefix offsets, and the rank inside each bucket is a
    partitioned window — every task sorts only its own slice.  The
    permutation is uniform because md5 is; no data-dependent skew is
    possible on a hash key."""
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt)))
    base = documents.select("doc_id", key.alias("_k"))
    bucket = F.conv(F.substring("_k", 1, 2), 16, 10).cast("int").alias("_b")
    withb = base.select("*", bucket)
    counts = {
        r["_b"]: r["n"]
        for r in withb.groupBy("_b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    if not offsets:
        return base.select(
            F.lit(None).cast("long").alias("shuffle_rank"), "doc_id"
        ).where(F.lit(False))
    off_df = F.broadcast(
        documents.sparkSession.createDataFrame(offsets, "_b int, _off long")
    )
    wlocal = Window.partitionBy("_b").orderBy("_k", "doc_id")
    return (
        withb.join(off_df, "_b")
        .select(
            (F.col("_off") + F.row_number().over(wlocal)).cast("long").alias(
                "shuffle_rank"),
            "doc_id",
        )
    )


def quota_sample_per_group(
    documents: DataFrame, k: int = 50, salt: str = "q1"
) -> DataFrame:
    """Exact-quota sampling: k documents per language, chosen by rank
    in a salted-md5 order — the deterministic analog of per-stratum
    reservoir sampling (vs stratified_sample's rate-based filter).
    Same salt → same sample on any cluster; bump the salt for an
    independent redraw.

    Scale: one hash shuffle on the group key, per-group rank windows —
    groups are languages (dozens), so per-partition slices stay
    balanced; no global order, no driver-side state."""
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        documents.select("doc_id", "lang", key.alias("_k"))
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= k)
        .select("lang", "pick_rank", "doc_id")
    )


def mixture_oversample(
    documents: DataFrame, weights: dict[str, int] | None = None
) -> DataFrame:
    """Deterministic mixture re-weighting for training epochs: each
    document is replicated ``weights[lang]`` times (integer
    oversampling of under-represented sources), with a stable
    ``copy_id`` so downstream shuffling/packing treats copies as
    distinct examples.  The standard data-mixture lever (e.g. upweight
    low-resource languages) expressed as explode(sequence(...)) — row
    generation happens ON the executors, distributed, never via a
    driver-side loop or a nondeterministic sampler.

    Scale: output size = Σ weights — a deliberate, bounded expansion;
    the explode is pipelined into the scan (no shuffle at all until a
    downstream op needs one)."""
    weights = weights or {"en": 1, "de": 2, "fr": 3}
    wmap = F.create_map(
        *[x for lang, n in sorted(weights.items())
          for x in (F.lit(lang), F.lit(n))]
    )
    n_copies = F.coalesce(wmap[F.col("lang")], F.lit(1))
    return documents.select(
        "doc_id", "lang",
        F.explode(F.sequence(F.lit(1), n_copies)).alias("copy_id"),
    ).select("doc_id", "lang", F.col("copy_id").cast("long").alias("copy_id"))


def sequence_packing_manifest(
    documents: DataFrame, context_len: int = 512, salt: str = "s42",
    n_buckets: int = 256,
) -> DataFrame:
    """Concat-and-chunk manifest for LLM pretraining: documents laid
    out contiguously in the deterministic shuffle order
    (md5(doc_id:salt) — same permutation as
    ``deterministic_shuffle_rank``), then cut into fixed
    ``context_len``-token sequences.  Per document: its global token
    offset, the sequence id its first token lands in, the offset
    inside that sequence, and how many sequence boundaries it
    straddles — exactly what a loader needs to materialize packed
    contexts (docs ARE split across contexts; attention-mask resets at
    doc boundaries are the loader's business, the layout is ours).

    Scale: token-level global offsets via the bucketed two-pass prefix
    sum over the md5-ordered corpus (O(256) driver metadata, bucket-
    partitioned windows) — no global sort, no single-partition window,
    uniform buckets by hash construction."""
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt)))
    base = documents.select(
        "doc_id",
        key.alias("_k"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    bucket = F.conv(F.substring("_k", 1, 2), 16, 10).cast("int").alias("_b")
    withb = base.select("*", bucket)
    sums = {
        r["_b"]: r["s"] or 0
        for r in withb.groupBy("_b").agg(F.sum("n_tokens").alias("s")).collect()
    }
    schema = ("doc_id long, n_tokens long, start_token long, seq_id long, "
              "offset_in_seq long, n_seqs_spanned long")
    if not sums:
        return documents.sparkSession.createDataFrame([], schema)
    offsets, acc = [], 0
    for b in sorted(sums):
        offsets.append((b, acc))
        acc += sums[b]
    off = F.broadcast(
        documents.sparkSession.createDataFrame(offsets, "_b int, _off long")
    )
    wprior = (
        Window.partitionBy("_b")
        .orderBy("_k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_off") + F.coalesce(
        F.sum("n_tokens").over(wprior), F.lit(0)
    )
    L = F.lit(int(context_len))
    return (
        withb.join(off, "_b")
        .withColumn("start_token", start.cast("long"))
        .select(
            "doc_id",
            "n_tokens",
            "start_token",
            F.expr(f"start_token div {int(context_len)}").alias("seq_id"),
            (F.col("start_token") % L).cast("long").alias("offset_in_seq"),
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(
                    f"(start_token + n_tokens - 1) div {int(context_len)} "
                    f"- start_token div {int(context_len)} + 1"
                )
            ).cast("long").alias("n_seqs_spanned"),
        )
    )


def weighted_systematic_sample(
    documents: DataFrame, k: int = 50, n_partitions: int = 32
) -> DataFrame:
    """Token-weighted systematic sampling without replacement: lay the
    corpus out contiguously in doc_id order (each doc occupying
    ``n_tokens`` positions of the cumulative token line) and pick the
    doc under every multiple of ``total/k`` — docs are selected with
    probability proportional to length, long docs can be picked more
    than once (``n_picks`` = mixture multiplicity), and the whole
    procedure is INTEGER arithmetic (a doc is picked when its token
    interval crosses a multiple: floor(k·cum_end/total) >
    floor(k·cum_before/total)) — deterministic and engine-portable
    with no RNG and no floats, unlike u^(1/w) exponential-key sampling
    whose transcendental keys cannot be hash-compared across engines.
    This is the standard mixture-construction step when a training run
    wants a token-budgeted, length-unbiased sample of a corpus.

    Scale: the cumulative token line is the bucketed two-pass prefix
    sum over quantile doc_id buckets (partitioning.quantile_bucket —
    same distributed pattern as token-shard packing: O(buckets) driver
    metadata, bucket-local windows, no global sort)."""
    base = documents.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    bucket = quantile_bucket(base, "doc_id", n_partitions)
    empty_schema = (
        "doc_id long, n_tokens long, cum_before long, n_picks long"
    )
    if bucket is None:
        return base.sparkSession.createDataFrame([], empty_schema)
    withb = base.select("*", bucket.alias("_b"))
    sums = {
        r["_b"]: r["s"]
        for r in withb.groupBy("_b").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(sums):
        offsets.append((b, acc))
        acc += sums[b]
    total = acc
    if total <= 0:
        return base.sparkSession.createDataFrame([], empty_schema)
    off = F.broadcast(
        documents.sparkSession.createDataFrame(offsets, "_b int, _off long")
    )
    wlocal = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.col("_off") + F.coalesce(F.sum("n_tokens").over(wlocal), F.lit(0))
    )
    scored = withb.join(off, "_b").select(
        "doc_id",
        "n_tokens",
        cum_before.alias("cum_before"),
    )
    picks = F.expr(
        f"((cum_before + n_tokens) * {k}) DIV {total}"
        f" - (cum_before * {k}) DIV {total}"
    ).cast("long")
    return (
        scored.withColumn("n_picks", picks)
        .filter(F.col("n_picks") >= 1)
        .select("doc_id", "n_tokens", "cum_before", "n_picks")
    )


def inverted_index_postings(documents: DataFrame) -> DataFrame:
    """Positional inverted-index construction: the (term, doc) posting
    list with term frequency and FIRST position (1-based) — the
    physical artifact a search engine builds before BM25 can serve
    (bm25_doc_ranking consumes exactly these statistics).  Emitted as
    a flat postings table: ``term, doc_id, tf, first_pos``.

    Plan shape (scale): ``posexplode`` keeps original token positions
    (empties filtered AFTER position assignment, so positions are
    stable under tokenizer quirks), then ONE hash aggregate on
    (term, doc_id) with map-side combine.  Output is naturally
    term-partitionable — the shuffle key IS the index's serving key,
    so a bucketed sink on ``term`` makes posting-list lookups
    shuffle-free.  Python never touches a row.
    """
    return (
        documents.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            (F.min("pos0") + 1).cast("long").alias("first_pos"),
        )
    )


def bpe_merge_candidates(documents: DataFrame, top_n: int = 50) -> DataFrame:
    """One BPE merge step over the corpus: frequency of every ADJACENT
    character pair within words — byte-pair-encoding training is
    exactly "count adjacent symbol pairs, merge the most frequent,
    repeat", and this operator is the corpus-scale counting pass each
    round runs (the tokenizer-training workload of a training-data
    pipeline).  Top ``top_n`` pairs, deterministic order (count desc,
    pair asc).

    Plan shape (scale): two narrow explodes (words, then the
    length-1 sliding pairs via ``transform(sequence(...))`` — all
    JVM codegen, no Python) feeding one hash aggregate with map-side
    combine; the pair domain is tiny (alphabet²), so the reduce side
    is a few hundred groups no matter the corpus size, and the top-n
    is a TakeOrdered.  Later merge rounds only re-run this count over
    re-tokenized symbols — the plan shape is identical.
    """
    words = (
        documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter((F.col("w") != "") & (F.length("w") >= 2))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def doc_rarity_scores(documents: DataFrame) -> DataFrame:
    """Corpus-rarity scoring — the cheap stand-in for perplexity
    filtering when no language model is available: a document whose
    distinct terms have LOW mean document frequency is unusual
    relative to the corpus (specialist content or junk, either way
    worth routing to a different pipeline lane).  Published as exact
    integers: the number of distinct terms, the sum of their corpus
    DFs, and the mean DF in milli-units via integer DIV — no float
    ratio ever forms.

    Plan shape (scale): distinct (doc, term) pairs → term DF
    hash-aggregate (map-side combine) → join back on term (terms are
    Zipf-skewed but the join fans out only to the doc-term incidence,
    already materialized) → per-doc aggregate.  Two shuffles total,
    both on bounded-cardinality keys; nothing collects.
    """
    dt = documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            )
        ).alias("tok"),
    )
    df_ = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        dt.join(df_, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "doc_id",
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("sum_df").cast("long").alias("sum_df"),
            F.expr("(sum_df * 1000) DIV n_distinct").cast("long").alias(
                "mean_df_milli"
            ),
        )
    )


def topk_terms_per_lang(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-language signature terms: the ``k`` most document-frequent
    terms within each language, ranked by (per-lang DF desc, term asc)
    — the per-group top-k reduction that powers corpus dashboards and
    quick drift checks between language slices.

    Plan shape (scale): distinct (lang, doc, term) incidence → (lang,
    term) DF hash-aggregate → ranked window per lang.  The rank ≤ k
    filter plans as WindowGroupLimit, so each shuffle partition keeps
    only its own top-k candidates before the final per-lang sort —
    no full DF table ever sorts globally.
    """
    from pyspark.sql import Window

    dt = documents.select(
        "lang",
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            )
        ).alias("tok"),
    )
    df_ = dt.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("lang").orderBy(
        F.col("df").desc(), F.col("tok").asc()
    )
    return (
        df_.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "lang",
            F.col("rnk").cast("long").alias("rnk"),
            "tok",
            F.col("df").cast("long").alias("df"),
        )
    )


def rendezvous_shard_assignment(
    documents: DataFrame, n_shards: int = 8
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard routing: each document
    goes to the shard with the highest portable hash of
    ``doc_id:shard`` — the assignment scheme whose defining property
    is MINIMAL movement under resharding (removing one shard
    reassigns only that shard's documents; every other assignment is
    untouched — asserted in pytest).  Modulo hashing re-routes ~
    (n−1)/n of the corpus on any change; rendezvous re-routes exactly
    1/n.  The hash is the repo-standard md5-first-12-hex (portable to
    the DuckDB oracle bit-for-bit).

    Plan shape (scale): a constant ``n_shards``-way explode over the
    scan followed by one per-doc max_by aggregate — a narrow map plus
    one hash-aggregate on the document key; no shuffle wider than the
    corpus itself, no Python.
    """
    cand = documents.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"),
    ).select(
        "doc_id",
        "shard",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("shard"))), 1, 12
            ),
            16,
            10,
        ).cast("long").alias("w"),
    )
    return (
        cand.groupBy("doc_id")
        .agg(F.max_by(F.col("shard"), F.struct("w", "shard")).alias("shard"))
        .select("doc_id", F.col("shard").cast("long").alias("shard"))
    )


def collocation_lift(
    docs: DataFrame, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Top-k collocations by LIFT — P(xy) / (P(x)·P(y)), the
    integer-exact twin of PMI (PMI = log lift; the log is monotone, so
    ranking by lift IS ranking by PMI, with no libm in hash-compared
    output).  This is the collocation-mining step of corpus analysis
    (multi-word expressions, tokenizer merge diagnostics) that
    ``ngram_bigram_counts`` (raw counts) and ``bpe_merge_candidates``
    (frequency only) stop short of: frequency finds 'of the'; lift
    finds pairs that co-occur far above their unigram mass.

    Spark-first shape: unigram and bigram count tables are hash
    aggregates with map-side combine; the totals (Σ tokens, and
    Σ bigrams = Σ tokens − n_docs) come from ONE extra scalar
    aggregate pass — driver-literal scalars, never a crossJoin.
    Unigram counts are vocabulary-bounded, so both lookup joins
    broadcast; the final top-k plans as TakeOrderedAndProject
    (per-partition heaps, plan-asserted).  lift_permille =
    1000·c_xy·N_uni² DIV (N_big·c_x·c_y) computed in DECIMAL(38,0)
    (the cross term passes int64 near corpus ≈ 10⁹ tokens; DuckDB
    promotes to HUGEINT, same values).  At 100 TB: count tables are
    the persisted reusable artifact; with an unbounded vocabulary,
    feature-hash the tokens first (``feature_hashing_embed``'s
    bucketing) to keep the broadcast bounded.
    """
    toks = docs.select(F.split("text", " ").alias("a"))
    totals = toks.agg(
        F.sum(F.size("a")).alias("nu"), F.count(F.lit(1)).alias("nd")
    ).collect()[0]
    n_uni = int(totals["nu"] or 0)
    n_big = n_uni - int(totals["nd"] or 0)
    if n_big <= 0:
        return docs.sparkSession.createDataFrame(
            [], "x string, y string, n_xy long, lift_permille long"
        )
    uni = toks.select(F.explode("a").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(a) - 2),"
                    " i -> struct(a[i] AS x, a[i + 1] AS y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    ux = F.broadcast(uni.select(F.col("w").alias("x"), F.col("c").alias("cx")))
    uy = F.broadcast(uni.select(F.col("w").alias("y"), F.col("c").alias("cy")))
    dec = "decimal(38,0)"
    lift = (
        (
            F.lit(1000).cast(dec)
            * F.col("n_xy").cast(dec)
            * F.lit(n_uni).cast(dec)
            * F.lit(n_uni).cast(dec)
        )
        / (
            F.lit(n_big).cast(dec)
            * F.col("cx").cast(dec)
            * F.col("cy").cast(dec)
        )
    )
    scored = big.join(ux, "x").join(uy, "y").select(
        "x",
        "y",
        "n_xy",
        F.floor(lift).cast("long").alias("lift_permille"),
    )
    return scored.orderBy(
        F.col("lift_permille").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(k)


def domain_affinity_scores(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 4096,
    threshold_permille: int = 430,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance scoring (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    public): score every document by how much its hashed-bigram mass
    falls in buckets favored by a TARGET domain (here the ``en``
    slice), then select docs above a threshold — the importance-
    sampling primitive for steering a 100 TB crawl toward a target
    distribution without training a classifier.  Integer-rational
    form: affinity_permille = 1000·Σ_g t[h(g)] DIV Σ_g c[h(g)] over
    the doc's bigram INSTANCES (duplicates count, as in the paper's
    unigram-model estimate); DSIR's log-ratio is replaced by the
    ratio itself — monotone-equivalent for thresholding and exact in
    int64 (Σ over ≤10² bigrams of counts ≤ corpus size).

    Spark-first shape: the frequency table is ≤ ``n_buckets`` rows by
    construction (the paper's own trick for unbounded vocab) and both
    counts — all-corpus ``c`` and target-slice ``t`` — come out of ONE
    conditional aggregate over a SINGLE pass of the bigram stream
    (separate tgt/all tables cost a third full explode+md5 pass of the
    corpus, measured ~2× the whole query at sf0.1); the per-doc lookup
    is then a BROADCAST join against that one table on the second and
    final pass.  One shuffle on doc_id reduces bigram rows to doc
    scores; the lang rollup is |langs| groups.  Bucket = portable
    md5-prefix hash mod n_buckets — the engine-portable hash used
    across this repo (doc_fingerprint), bit-identical in DuckDB.
    """
    bg = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("_ws")
    ).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, size(_ws) - 2),"
                " i -> concat(_ws[i], ' ', _ws[i + 1]))"
            )
        ).alias("g"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("g")), 1, 12), 16, 10).cast("long")
            % n_buckets
        ).alias("b"),
    )
    stats = F.broadcast(
        bg.groupBy("b").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                F.when(F.col("lang") == target_lang, 1).otherwise(0)
            ).alias("t"),
        )
    )
    per_doc = (
        bg.join(stats, "b")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.expr(
                "CAST(1000 * sum(t) div sum(c) AS BIGINT)"
            ).alias("score"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("score") >= threshold_permille).cast("long")
        ).alias("n_selected"),
        F.sum("score").alias("sum_score"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


def rake_keywords(
    documents: DataFrame, n_stopwords: int = 20, top_k: int = 20
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are the maximal token runs BETWEEN stopwords;
    each content word scores degree/frequency, where degree sums the
    lengths of the phrases it appears in — words that live in long,
    distinctive phrases beat words that are merely frequent.  Emitted:
    the global top-k keywords with exact integer (freq, degree,
    1000·degree div freq).

    The stopword set is CORPUS-DERIVED (the ``n_stopwords`` highest
    document-frequency terms, term-asc tie-break) rather than a
    hard-coded list — deterministic, language-agnostic, and the same
    relation the oracle computes.

    Plan shape (scale): tokenize/explode is narrow; the stopword set
    is a vocabulary-sized aggregate reduced to ``n_stopwords`` rows
    via TakeOrdered and broadcast back (never collected beyond that
    bound); phrase segmentation is a running stopword count inside a
    per-DOCUMENT window (document-bounded, never corpus-bounded);
    scoring is two hash aggregates; the final top-k is one
    TakeOrdered(k) — no global sort anywhere."""
    toks = tokens(documents)
    dfreq = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("dfreq")
    )
    stop = (
        dfreq.orderBy(F.desc("dfreq"), F.asc("tok"))
        .limit(n_stopwords)
        .select(F.col("tok").alias("_sw"), F.lit(1).alias("_is_stop"))
    )
    seg = toks.join(
        F.broadcast(stop), F.col("tok") == F.col("_sw"), "left"
    ).select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce("_is_stop", F.lit(0)).alias("is_stop"),
    )
    wdoc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    content = (
        seg.withColumn("pid", F.sum("is_stop").over(wdoc))
        .filter(F.col("is_stop") == 0)
        .select("doc_id", "pid", "tok")
    )
    plen = content.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("lp")
    )
    scored = (
        content.join(plen, ["doc_id", "pid"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("lp").alias("degree"),
        )
    )
    return (
        scored.select(
            F.col("tok").alias("term"),
            F.col("freq").cast("long").alias("freq"),
            F.col("degree").cast("long").alias("degree"),
            F.expr("CAST((1000 * degree) div freq AS BIGINT)").alias(
                "rake_milli"
            ),
        )
        .orderBy(F.desc("rake_milli"), F.desc("degree"), F.asc("term"))
        .limit(top_k)
    )


def ngram_novelty_by_lang(
    documents: DataFrame, k: int = 3, test_mod: int = 5, test_rem: int = 4
) -> DataFrame:
    """Train/test n-gram NOVELTY rate per language — the
    generalization-eval twin of decontamination: where that operator
    asks "how much of the eval set leaked into training?", this asks
    "how much of the held-out set is genuinely new text?"  A held-out
    slice whose shingles are almost all present in training measures
    memorization, not generalization; corpora are routinely audited on
    exactly this rate before an eval split is trusted.

    Split rule: ``doc_id % test_mod == test_rem`` (the same arithmetic
    membership idiom as train_val_test_split — no RNG, backfill-
    stable).  A shingle TYPE is novel when it appears in the test
    slice of a language but in none of that language's training docs.

    Plan shape (scale): shingles come from the shared lead()-window
    builder (document-bounded windows); both vocabularies are hash
    DISTINCTs on (lang, shingle); novelty is ONE equi-join between
    them (the train side is the big one — at 100 TB swap the raw join
    for the shingle-id form dedup's LSH tier uses, or a bloom-filter
    semi-join: the rate tolerates one-sided false positives).  Final
    roll-up is |langs| rows."""
    from . import dedup as _dedup

    sh = _dedup.shingles(documents, k)
    base = sh.join(documents.select("doc_id", "lang"), "doc_id")
    is_test = (F.col("doc_id") % test_mod) == test_rem
    test_types = (
        base.filter(is_test).select("lang", "shingle").distinct()
    )
    train_types = (
        base.filter(~is_test)
        .select(F.col("lang").alias("_l"), F.col("shingle").alias("_s"))
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    j = test_types.join(
        train_types,
        (F.col("lang") == F.col("_l")) & (F.col("shingle") == F.col("_s")),
        "left",
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_types"),
        F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_novel_types"),
        F.expr(
            "CAST((1000 * sum(CASE WHEN _seen IS NULL THEN 1 ELSE 0 END)) "
            "div count(*) AS BIGINT)"
        ).alias("novelty_permille"),
    )


def vocab_growth_curve(
    documents: DataFrame, n_checkpoints: int = 8
) -> DataFrame:
    """Heaps-law vocabulary growth curve: at ``n_checkpoints`` doc-id
    thresholds (``thr_k = k·max(doc_id) div K``), report how many
    documents and tokens have been ingested and how large the distinct
    vocabulary has grown — the corpus-planning curve (does vocabulary
    saturate? how fast do new shards stop contributing new terms?)
    that sizes tokenizers and dedup budgets before a 100-TB crawl is
    committed.  Tokenization is the corpus-standard whitespace split
    (functions/text.py:tokens).

    Exactness: all counts are integers; a term's contribution to
    checkpoint k is decided by its FIRST-occurrence doc id (``fd ≤
    thr_k ⟺ K·fd ≤ k·mx`` — integer comparison, no division), so both
    engines agree bit-for-bit.

    Plan shape (scale): one hash aggregate per-term (min first doc) and
    one per-doc (token count) over the token stream — both map-side
    combinable; each row then maps to its SMALLEST qualifying
    checkpoint (``k_min = ceil(K·x / mx)``, pure arithmetic — no
    inequality join, no data-sized window), giving K+1 partial groups
    whose K-row prefix sum is the curve.  The only broadcast is the
    1-row max(doc_id) aggregate.  Nothing downstream of the two
    aggregates is data-sized."""
    K = n_checkpoints
    tok = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    mx = documents.agg(F.max("doc_id").alias("mx"))
    # greatest(mx, 1): a single-document corpus has mx = 0 (ANSI div
    # would error); its only doc_id is 0, which lands in checkpoint 1
    kmin = f"CAST(greatest(1, ({K} * x + mx - 1) div greatest(mx, 1)) AS INT)"

    def _by_kmin(df, xcol, aggs):
        return (
            df.withColumnRenamed(xcol, "x")
            .crossJoin(F.broadcast(mx))
            .withColumn("_k", F.expr(kmin))
            .groupBy("_k")
            .agg(*aggs)
        )

    first = tok.groupBy("w").agg(F.min("doc_id").alias("fd"))
    v = _by_kmin(first, "fd", [F.count(F.lit(1)).alias("dv")])
    dt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    tkn = _by_kmin(dt, "doc_id", [F.sum("nt").alias("dt_sum")])
    nd = _by_kmin(
        documents.select("doc_id"), "doc_id",
        [F.count(F.lit(1)).alias("dd")],
    )
    grid = mx.select(
        F.explode(F.sequence(F.lit(1), F.lit(K))).alias("k"), "mx"
    ).select("k", F.expr(f"(k * mx) div {K}").alias("thr_doc_id"))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(v, grid["k"] == v["_k"], "left").drop("_k")
        .join(tkn, F.col("k") == tkn["_k"], "left").drop("_k")
        .join(nd, F.col("k") == nd["_k"], "left").drop("_k")
        .select(
            F.col("k").cast("long").alias("checkpoint"),
            F.col("thr_doc_id").cast("long").alias("thr_doc_id"),
            F.sum(F.coalesce("dd", F.lit(0))).over(w)
            .cast("long").alias("n_docs"),
            F.sum(F.coalesce("dt_sum", F.lit(0))).over(w)
            .cast("long").alias("n_tokens"),
            F.sum(F.coalesce("dv", F.lit(0))).over(w)
            .cast("long").alias("vocab_size"),
        )
    )


def dedup_token_savings(documents: DataFrame) -> DataFrame:
    """Per-domain token budget after exact dedup (round 8): for every
    ``source``, how many documents and (non-empty whitespace) tokens
    the corpus holds, and how many survive when only the global
    exact-dedup keeper (min doc_id per sha256(text), the
    ``exact_dedup`` rule) of each duplicate cluster is retained — the
    "what does dedup save us, and in which domain" report that sizes a
    training run's real token budget.  Keepers are attributed to their
    OWN source, so a domain that copies another domain's text shows
    the savings (its copies are dropped; the keeper counts where it
    first appeared).

    Scale shape: the keeper relation is one hash aggregate on the
    32-byte content hash (never the raw text); membership comes back
    via an equi-join on the same hash — doc bodies are never shuffled
    (tokens are counted before the join, so only (hash, counts) rows
    move); the rollup is |sources| groups.
    """
    toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    ).cast("long")
    t = documents.select(
        "doc_id",
        "source",
        toks.alias("n_toks"),
        F.sha2(F.col("text"), 256).alias("_h"),
    )
    keep = t.groupBy("_h").agg(F.min("doc_id").alias("_keep"))
    return (
        t.join(keep, "_h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("tokens_total"),
            F.sum(
                (F.col("doc_id") == F.col("_keep")).cast("long")
            ).alias("n_keepers"),
            F.sum(
                F.when(F.col("doc_id") == F.col("_keep"), F.col("n_toks"))
                .otherwise(F.lit(0))
            ).alias("tokens_kept"),
        )
    )


def contamination_by_domain(
    documents: DataFrame, min_bp: int = 2500
) -> DataFrame:
    """Per-domain drill-down of the decontamination audit (round 8):
    roll the per-test-doc shingle-overlap scores of
    ``decontamination_overlap`` up to the document ``source``, flagging
    docs at/above ``min_bp`` contamination — the report that tells a
    corpus build WHICH ingest domain is leaking benchmark text, not
    just that leakage exists (a single boilerplate-heavy source
    usually accounts for most of it).

    Scale shape: inherits decontamination_overlap's semi-join form
    (distinct shingle relations, hash-partitioned membership probe);
    the drill-down adds one doc_id equi-join against a projection of
    ``documents`` (test docs only — a fraction of the corpus) and a
    |sources|-group rollup.
    """
    per_doc = decontamination_overlap(documents)
    src = documents.select("doc_id", "source")
    return (
        per_doc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test_docs"),
            F.sum(
                (F.col("contam_bp") >= min_bp).cast("long")
            ).alias("n_contaminated"),
            F.sum("contam_bp").alias("sum_contam_bp"),
            F.max("contam_bp").alias("max_contam_bp"),
        )
    )


def curriculum_quality_order(documents: DataFrame, n_buckets: int = 4) -> DataFrame:
    """Quality-bucket curriculum ordering (round 9): a deterministic
    TRAINING ORDER for the corpus — quality quartiles first (easy/clean
    data early, the curriculum-learning schedule), deterministically
    shuffled WITHIN each bucket so the order is reproducible across
    engines, runs, and partitionings (same md5-key discipline as
    deterministic_shuffle_rank; an RNG order could never carry a
    value-hash oracle).  Completes the selection→order pipeline step:
    quota/mixture sampling picks the docs, this fixes the batch order.

    Output: (doc_id, quality_bp, bucket, curriculum_rank) where
    bucket = ntile(n) over quality DESC and curriculum_rank is the
    global 1-based training position.

    Scale: the global rank is the two-pass prefix-offset form twice —
    quality ntile from the bucketed exact rank
    (partitioning.bucketed_global_rank: no single-task global sort),
    then an md5-leading-byte sub-bucket INSIDE each curriculum bucket
    (the deterministic_shuffle_rank trick: hex prefixes sort
    lexicographically = numerically and md5 is uniform), so the
    largest sort task holds ~1/(n_buckets·256) of the corpus at any
    scale; offsets are n_buckets·256 driver integers."""
    from ..partitioning import bucketed_global_rank, ntile_from_rank

    # localCheckpoint (optimization r13): bucketed_global_rank runs TWO
    # driver actions (boundary + count) plus the final plan over its
    # input — unmaterialized, the quality_score subtree (token explode
    # + aggregate over the full corpus) executed three times.  One
    # checkpoint trades for two corpus re-scans; exactly the
    # materialize-your-input contract the helper's docstring states.
    # r14: LAZY — the helper's first action (approxQuantile) scans the
    # frame anyway and local checkpointing stores partitions as they
    # are first computed, so the dedicated checkpoint job is deleted
    # (VERDICT r13 task #5, fewer driver actions per query).
    q = quality_score(documents).select(
        "doc_id", "quality_bp"
    ).localCheckpoint(eager=False)
    totals: dict[tuple, int] = {}
    ranked = bucketed_global_rank(
        q.withColumn("_negq", -F.col("quality_bp")),
        "_negq",
        ["doc_id"],
        out="_qrk",
        totals_out=totals,
    ).withColumn(
        "bucket",
        ntile_from_rank("_qrk", n_buckets, totals.get((), 0)).cast("long"),
    )
    skey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":c42")))
    sub = F.conv(F.substring("_sk", 1, 2), 16, 10).cast("int")
    # r14 (VERDICT r13 task #5): lazy — the per-(bucket, subkey) count
    # collect right below is the materializing action (one job instead
    # of checkpoint-then-collect's two); the final plan re-reads the
    # stored blocks as before.
    withk = ranked.select(
        "doc_id", "quality_bp", "bucket", skey.alias("_sk")
    ).withColumn("_sb", sub).localCheckpoint(eager=False)
    counts = {
        (r["bucket"], r["_sb"]): r["n"]
        for r in withk.groupBy("bucket", "_sb")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = [], 0
    for bk, sb in sorted(counts):
        offsets.append((bk, sb, acc))
        acc += counts[(bk, sb)]
    off_df = F.broadcast(
        documents.sparkSession.createDataFrame(
            offsets, "bucket long, _sb int, _off long"
        )
    )
    wl = Window.partitionBy("bucket", "_sb").orderBy("_sk", "doc_id")
    return (
        withk.join(off_df, ["bucket", "_sb"])
        .select(
            "doc_id",
            "quality_bp",
            "bucket",
            (F.col("_off") + F.row_number().over(wl))
            .cast("long")
            .alias("curriculum_rank"),
        )
    )


def cluster_signature_terms(
    documents: DataFrame, cells: DataFrame, top_m: int = 3
) -> DataFrame:
    """Per-cluster signature terms (round 9): label each IVF cell with
    its most DISTINCTIVE vocabulary — the topic card a corpus-curation
    report attaches to every embedding cluster (the step after
    cluster_balanced_selection decides per-cell quotas: a human needs
    to know what cell 7 *is*).  ``cells`` is (vec_id, cluster) from
    similarity.ivf_cell_assignments; documents join on doc_id = vec_id.

    Distinctiveness is integer TF-ICF: score = tf_in_cluster · 10000
    div (number of clusters containing the term) — the cluster-level
    idf analog, exact in both engines (the float idf of classic TF-IDF
    would hash-diverge).  Stopwords are excluded so signatures carry
    content words.  Top ``top_m`` per cluster, ties on term ascending.

    Scale: tokens aggregate per (cluster, term) with map-side combine;
    the cluster-df relation is vocabulary-bounded and broadcast; the
    final rank window partitions on cluster over the (clusters ×
    vocabulary)-bounded score relation — never document-sized."""
    tf = (
        tokens(documents)
        .filter(~F.col("tok").isin(*STOPWORDS))
        .join(
            cells.select(F.col("vec_id").alias("doc_id"), "cluster"),
            "doc_id",
        )
        .groupBy("cluster", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cdf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("cluster_df"))
    scored = tf.join(F.broadcast(cdf), "term").withColumn(
        "score", F.expr("tf * 10000 div cluster_df")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_m)
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "rank",
            "term",
            "tf",
            "cluster_df",
            "score",
        )
    )


def quality_calibration_report(
    documents: DataFrame,
    ttr_threshold_permille: int = 450,
    n_bins: int = 10,
) -> DataFrame:
    """Quality-classifier CALIBRATION report (round 10; VERDICT r9
    task #8): reliability bins of the composite ``quality_bp`` score
    against a held-out proxy label — the fastText-style audit a
    curation pipeline runs before trusting a classifier's threshold.
    The proxy "gold" label is deliberately computed from a signal the
    score does NOT use (type-token ratio ≥ ``ttr_threshold_permille``;
    the score uses token count + stopword ratio), so the report
    measures real agreement, not self-correlation.

    Per bin (``quality_bp div 1000``, top-clamped to ``n_bins - 1``):
    document count, gold-positive count and rate (bp), mean score
    (bp), and the calibration gap ``mean_quality_bp − gold_rate_bp``
    — a well-calibrated score has gaps near zero in every bin; a
    monotone-but-offset column says re-threshold, a non-monotone one
    says retrain.  All arithmetic is integer (``div``), so the DuckDB
    mirror is bit-exact.

    Self-contained single pass (not quality_score ⋈ token_stats —
    that would shuffle two per-doc relations to re-join what one
    aggregate computes): ONE token explode, ONE doc-keyed aggregate
    (count DISTINCT expands to the standard two-phase plan with
    map-side partials), then a ≤ ``n_bins``-row aggregate.  The
    formula intentionally reproduces quality_score's composite
    (``least(n_tokens,100)·50 + (10000 − stop_bp) div 2``) — parity
    with that helper is pinned by tests, and the oracle checks the
    values end to end.

    Reference scope: the reference engine (564-LoC Java CDC extractor,
    WorkerRunnable.java) has no classifier audit; this is part of the
    mandated training-data-pipeline extension surface.
    """
    toks = tokens(documents)
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(
            F.when(F.col("tok").isin(*STOPWORDS), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_stop"),
    )
    scored = per_doc.select(
        "doc_id",
        (
            F.least(F.col("n_tokens"), F.lit(100)) * 50
            + F.expr("(10000 - (n_stop * 10000 div n_tokens)) div 2")
        ).cast("long").alias("quality_bp"),
        F.when(
            F.col("n_distinct") * 1000
            >= F.lit(ttr_threshold_permille) * F.col("n_tokens"),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("gold"),
    )
    binned = scored.withColumn(
        "bin",
        F.least(F.expr("quality_bp div 1000"), F.lit(n_bins - 1)).cast("long"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("gold").cast("long").alias("n_gold_good"),
        F.expr("sum(gold) * 10000 div count(1)").cast("long").alias(
            "gold_rate_bp"
        ),
        F.expr("sum(quality_bp) div count(1)").cast("long").alias(
            "mean_quality_bp"
        ),
        F.expr(
            "sum(quality_bp) div count(1) - sum(gold) * 10000 div count(1)"
        ).cast("long").alias("calib_gap_bp"),
    )


def doc_repetition_flags(
    documents: DataFrame,
    max_top2_share_bp: int = 2000,
    max_dup3_bp: int = 3000,
) -> DataFrame:
    """Gopher REPETITION rules (round 10) — the within-document
    repetition filters that complete the Gopher set
    (gopher_quality_flags covers the length/symbol/stopword rules):
    per doc, the token share of the most frequent 2-gram
    (``top_bigram_n·2·10000 div n_tokens``) and the duplicated-3-gram
    fraction (occurrences beyond each trigram's first, over total
    trigrams) — boilerplate and looped-generation text score high on
    both and gets dropped before training.  All integer basis points;
    flags use the Gopher-style "reject if above threshold" polarity.
    Because consecutive bigram occurrences OVERLAP (each occurrence is
    counted as 2 of the doc's n tokens), ``top2_share_bp`` can exceed
    10000 on degenerate repeated-token docs ("a a a" → 13333 bp) —
    deliberately uncapped, matching the common Gopher-rule
    implementations; the reject-above-threshold flag semantics are
    unaffected (more repetition → larger value, monotone).

    Scale shape: ONE explode of kind-tagged 2-/3-grams (aligned-slice
    ``zip_with`` arrays — no window, no Python), one
    (doc, gram)-keyed count with map-side combine, one doc-keyed
    fold, and a broadcast-free left join back to the per-row token
    count (doc-keyed, slim).  Docs below the gram arity keep zero
    shares rather than dropping out.

    Reference scope: like every text operator, outside the 564-LoC
    Java reference (WorkerRunnable.java) — part of the mandated
    training-pipeline extension surface.
    """
    sp = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    base = documents.select(
        "doc_id",
        F.size(sp).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)
    # kind-tagged 2-/3-gram stream via ONE posexplode + lead() window
    # pass (optimization r13 — the zip_with/transform array form paid
    # interpreted higher-order-function evaluation per token and
    # measured 2.4x slower on this stream at sf0.1, 1.9x at sf1,
    # parity EXACT; see _token_trigram_stream).  The per-gram count
    # below rides the window's doc_id exchange via subset
    # partitioning, so the gram stream never re-shuffles.
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    tagged = toks.select(
        "doc_id",
        F.when(
            t1.isNotNull(),
            F.concat(F.lit("2:"), F.concat_ws(" ", F.col("tok"), t1)),
        ).alias("_g2"),
        F.when(
            t2.isNotNull(),
            F.concat(F.lit("3:"), F.concat_ws(" ", F.col("tok"), t1, t2)),
        ).alias("_g3"),
    )
    grams = (
        tagged.select(
            "doc_id",
            F.explode(
                F.concat(
                    F.when(
                        F.col("_g2").isNotNull(), F.array(F.col("_g2"))
                    ).otherwise(F.array().cast("array<string>")),
                    F.when(
                        F.col("_g3").isNotNull(), F.array(F.col("_g3"))
                    ).otherwise(F.array().cast("array<string>")),
                )
            ).alias("g"),
        )
    )
    per_gram = grams.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    is2 = F.col("g").startswith("2:")
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max(F.when(is2, F.col("c"))).alias("_top_bi"),
        F.sum(F.when(~is2, F.col("c"))).alias("_n_tri"),
        (
            F.sum(F.when(~is2, F.col("c")))
            - F.count(F.when(~is2, F.lit(1)))
        ).alias("_dup3"),
    )
    out = base.select("doc_id", "n_tokens").join(per_doc, "doc_id", "left")
    return out.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("_top_bi"), F.lit(0)).cast("long").alias(
            "top_bigram_n"
        ),
        F.expr(
            "coalesce(_top_bi, 0) * 2 * 10000 div n_tokens"
        ).cast("long").alias("top2_share_bp"),
        F.expr(
            "coalesce(_dup3, 0) * 10000 div greatest(coalesce(_n_tri, 0), 1)"
        ).cast("long").alias("dup3_bp"),
        (
            F.expr("coalesce(_top_bi, 0) * 2 * 10000 div n_tokens")
            <= max_top2_share_bp
        ).alias("ok_top2"),
        (
            F.expr(
                "coalesce(_dup3, 0) * 10000 "
                "div greatest(coalesce(_n_tri, 0), 1)"
            )
            <= max_dup3_bp
        ).alias("ok_dup3"),
        (
            (
                F.expr("coalesce(_top_bi, 0) * 2 * 10000 div n_tokens")
                <= max_top2_share_bp
            )
            & (
                F.expr(
                    "coalesce(_dup3, 0) * 10000 "
                    "div greatest(coalesce(_n_tri, 0), 1)"
                )
                <= max_dup3_bp
            )
        ).alias("pass_repetition"),
    )


def doc_line_format_flags(
    documents: DataFrame,
    max_bullet_bp: int = 9000,
    max_ellipsis_bp: int = 3000,
) -> DataFrame:
    """Gopher line-format rules (round 11, completing the family that
    gopher_quality_flags and doc_repetition_flags started): fraction
    of lines starting with a bullet marker and fraction of lines
    ending with an ellipsis, both in integer basis points, with the
    public Gopher reject thresholds (>90% bullet-start or >30%
    ellipsis-end drops the doc).

    The corpus fixture is single-line word soup, so the query renders
    a DETERMINISTIC multi-line view first — one line per token, with
    bullet/ellipsis markers injected by doc/pos arithmetic — and the
    operator then DETECTS the markers from the rendered strings
    (prefix/suffix string tests), exactly as it would on real lines.
    The oracle replays the identical rendering, so the string
    detection itself is what the hash compares.

    Scale: one token explode (the same one-gram explode every text
    operator uses) + one per-doc hash aggregate with map-side combine;
    integer bp arithmetic end to end; no windows, no Python.
    """
    toks = tokens(documents)
    did, pos = F.col("doc_id"), F.col("pos")
    bullet = ((did % 13 == 0) & (pos % 21 != 0)) | ((did * 31 + pos) % 7 == 0)
    ellip = ((did % 17 == 0) & (pos % 3 != 0)) | ((did * 7 + pos) % 19 == 0)
    line = F.concat(
        F.when(bullet, F.lit("- ")).otherwise(F.lit("")),
        F.col("tok"),
        F.when(ellip, F.lit("...")).otherwise(F.lit("")),
    )
    rendered = toks.select("doc_id", line.alias("line"))
    per = rendered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("line").startswith("- "), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_bullet"),
        F.sum(
            F.when(F.col("line").endswith("..."), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_ellipsis"),
    )
    bullet_bp = F.floor(F.col("n_bullet") * 10000 / F.col("n_lines")).cast(
        "long"
    )
    ellip_bp = F.floor(F.col("n_ellipsis") * 10000 / F.col("n_lines")).cast(
        "long"
    )
    return per.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        bullet_bp.alias("bullet_bp"),
        ellip_bp.alias("ellipsis_bp"),
        (bullet_bp <= max_bullet_bp).alias("ok_bullet"),
        (ellip_bp <= max_ellipsis_bp).alias("ok_ellipsis"),
        ((bullet_bp <= max_bullet_bp) & (ellip_bp <= max_ellipsis_bp)).alias(
            "pass_line_format"
        ),
    )


def token_budget_rebalancer(documents: DataFrame) -> DataFrame:
    """Per-domain token-budget solver (round 11, VERDICT r10 task #8):
    given target mixture weights and the corpus's actual per-domain
    token counts, emit the exact per-domain keep-quota and the
    realized mixture — the budget solver that FEEDS the existing
    mixture-weighted sampler.  B = min_d floor(T_d * 10000 / w_d) is
    the largest budget whose RAW allocation respects every supply
    (B * w_d <= T_d * 10000 for all d), pinned by the binding
    (scarcest-relative-to-weight) domain; the emitted integer quotas
    floor(B * w_d / 10000) are therefore always feasible, at the cost
    of up to one quota unit per domain of flooring slack (quotas are
    proportional-exact, not bin-packing-maximal — the property the
    hypothesis maximality test asserts at bp scale).

    Target weights are derived deterministically from the domain name
    (arithmetic over the name's first digit run, normalized to basis
    points) so both engines compute the identical spec without a
    side-channel config; a production caller passes its own weights
    the same shape.  The digit run is regexp-extracted and capped at
    9 digits (ADVICE r11 #1: the previous positional substring cast
    raised in DuckDB and NULLed in Spark for non-numeric suffixes —
    the weight derivation was silently fixture-coupled; the capped
    regexp computes identical weights for ANY domain name, digitless
    names falling back to the pure length term).

    Scale: ONE per-domain hash aggregate (|domains| rows, map-side
    combine over the raw corpus — token counts come from a JVM-side
    size(split()) with no explode); the three corpus-wide scalars
    (weight total, budget, kept total) are global window aggregates
    OVER the |domains|-row frame, so the raw corpus is scanned exactly
    once (the first crossJoin-broadcast draft re-derived the base
    aggregate per scalar — 18 exchanges in the captured plan vs 2
    here; a deliberate single-task window over ~dozens of rows, never
    over data).  All integer.
    """
    per = documents.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens")
    )
    raw = (
        F.lit(10)
        + F.length("source")
        + (
            F.coalesce(
                F.regexp_extract("source", "[0-9]{1,9}", 0).try_cast("long"),
                F.lit(0),
            )
            * 13
        )
        % 29
    )
    per = per.withColumn("w_raw", raw.cast("long"))
    w_all = Window.partitionBy()
    per = per.withColumn(
        "target_bp",
        F.greatest(
            F.floor(
                F.col("w_raw") * 10000 / F.sum("w_raw").over(w_all)
            ).cast("long"),
            F.lit(1),
        ),
    )
    per = per.withColumn(
        "budget_cap",
        F.floor(F.col("n_tokens") * 10000 / F.col("target_bp")).cast("long"),
    )
    per = per.withColumn("budget", F.min("budget_cap").over(w_all))
    per = per.withColumn(
        "keep_tokens",
        F.floor(F.col("budget") * F.col("target_bp") / 10000).cast("long"),
    )
    # greatest(tot_keep, 1): a degenerate corpus whose every quota
    # floors to zero yields realized_bp 0 everywhere, not a div/0
    # (found by hypothesis; mirrored in the oracle SQL)
    return per.select(
        F.col("source").alias("domain"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "target_bp",
        "keep_tokens",
        F.floor(
            F.col("keep_tokens") * 10000
            / F.greatest(F.sum("keep_tokens").over(w_all), F.lit(1))
        )
        .cast("long")
        .alias("realized_bp"),
        (F.col("budget_cap") == F.col("budget")).alias("binding"),
    )


# Gopher's "required words" list (Rae et al. 2021, appendix A1): a
# document must contain at least two of these eight common English
# words to pass.  Distinct-membership, not occurrence count — which is
# what distinguishes this rule from gopher_quality_flags' stop_hits
# total (>=2 occurrences of ANY stopword would pass a doc that just
# repeats "the the").
REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_required_words(documents: DataFrame, min_distinct: int = 2) -> DataFrame:
    """Gopher required-words rule (round 12, VERDICT r11 task #4): per
    document, how many DISTINCT words of the public eight-word required
    list appear, plus the total hit count and the pass flag
    (>= ``min_distinct`` distinct required words).  Completes the
    public Gopher heuristic set next to gopher_quality_flags
    (length/symbol/stopword-total), doc_repetition_flags (n-gram
    repetition) and doc_line_format_flags (bullet/ellipsis lines).

    Scale: one token explode into ONE per-doc hash aggregate with
    map-side partial combine — the doc_line_format_flags template.
    Distinct membership over the FIXED 8-word domain is computed as
    eight per-word ``max`` flags summed, NOT ``count_distinct``: the
    distinct form expands to Spark's two-phase distinct-aggregate
    (a second exchange on (doc_id, word)), while the flag form keeps
    the plan at exactly one exchange carrying one row of 8 ints per
    doc (plan-pinned in tests/test_round12_ops.py).  No windows, no
    joins, no Python.
    """
    toks = tokens(documents)
    req = F.lower(F.col("tok")).isin(*REQUIRED_WORDS)
    flags = [
        F.max(
            F.when(F.lower(F.col("tok")) == w, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"_has_{i}")
        for i, w in enumerate(REQUIRED_WORDS)
    ]
    per = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(req, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("required_hits"),
        *flags,
    )
    n_req = sum(
        (F.col(f"_has_{i}") for i in range(len(REQUIRED_WORDS))), F.lit(0)
    ).cast("long")
    return per.select(
        "doc_id",
        "n_tokens",
        "required_hits",
        n_req.alias("n_required_words"),
        (n_req >= min_distinct).alias("pass_required_words"),
    )


def contamination_by_source(
    documents: DataFrame, flag_bp: int = 1000
) -> DataFrame:
    """Shingle-WEIGHTED per-source leakage rate (round 13, VERDICT r12
    task #4): the benchmark-leakage audit of
    ``decontamination_overlap`` rolled up by the ``source`` field as
    an aggregate rate — sum(overlapping shingles) / sum(shingles) per
    feed, in basis points — plus how many of the feed's test docs
    cross the ``flag_bp`` alarm line.  The companion view
    ``contamination_by_domain`` (round 8) counts DOCS over a per-doc
    2500 bp threshold and sums per-doc scores; this one measures
    leaked MASS, which a few large fully-leaked docs dominate while
    staying invisible in a doc-count view (and vice versa: many
    trivially-overlapping small docs inflate doc counts but not mass).
    A corpus owner needs both before dropping a feed.

    Scale: composes the per-doc audit unchanged (distinct-shingle
    relations + one hash-partitioned membership join, never
    all-pairs); the only added step is a doc_id equi-join fetching ONE
    metadata column for the test-split docs (result-set-sized — the
    test split is ~10% of the corpus) and a |sources|-row rollup.
    Group denominators are never zero: every audited doc has >= 1
    shingle by construction.
    """
    per = decontamination_overlap(documents)
    j = per.join(documents.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_docs"),
        F.sum("n_shingles").cast("long").alias("n_shingles"),
        F.sum("n_overlap").cast("long").alias("n_overlap"),
        F.floor(F.sum("n_overlap") * 10000 / F.sum("n_shingles"))
        .cast("long")
        .alias("contam_bp"),
        F.sum(
            F.when(F.col("contam_bp") >= flag_bp, F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_flagged"),
    )


def required_word_coverage(documents: DataFrame) -> DataFrame:
    """Corpus-level marginal of the Gopher required-words rule
    (round 13, VERDICT r12 task #4): for each of the eight public
    required words, how many documents contain it, its share of all
    tokenized documents in basis points, and its total occurrence
    count.  ``gopher_required_words`` is the per-doc filter; this is
    the calibration view that says WHY docs fail it on a given corpus
    (e.g. a code-heavy feed where "have"/"that" coverage collapses),
    before anyone tunes the >= 2 threshold.

    Scale: the corpus is touched ONCE — one token explode into one
    per-doc hash aggregate computing all 8 membership flags and 8
    occurrence counts side by side (the gopher_required_words flag
    form), then a second aggregate collapses the per-doc frame into a
    single 17-int row; the 8 output rows come from an O(8) ``stack``
    unpivot of that row.  No joins, no windows, no per-word rescans.
    Denominator is DOCS WITH >= 1 TOKEN (the same universe the per-doc
    rule scores); an empty corpus yields NULL shares, not a
    divide-by-zero.
    """
    toks = tokens(documents)
    n = len(REQUIRED_WORDS)
    flags = [
        F.max(
            F.when(F.lower(F.col("tok")) == w, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"_has_{i}")
        for i, w in enumerate(REQUIRED_WORDS)
    ]
    cnts = [
        F.sum(
            F.when(F.lower(F.col("tok")) == w, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"_cnt_{i}")
        for i, w in enumerate(REQUIRED_WORDS)
    ]
    per = toks.groupBy("doc_id").agg(*flags, *cnts)
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.coalesce(F.sum(f"_has_{i}"), F.lit(0))
            .cast("long")
            .alias(f"_d{i}")
            for i in range(n)
        ],
        *[
            F.coalesce(F.sum(f"_cnt_{i}"), F.lit(0))
            .cast("long")
            .alias(f"_o{i}")
            for i in range(n)
        ],
    )
    stack_args = ", ".join(
        f"'{w}', _d{i}, _o{i}" for i, w in enumerate(REQUIRED_WORDS)
    )
    unpivoted = tot.select(
        "n_docs",
        F.expr(
            f"stack({n}, {stack_args}) AS (word, n_docs_with, occurrences)"
        ),
    )
    return unpivoted.select(
        "word",
        F.col("n_docs"),
        "n_docs_with",
        "occurrences",
        F.when(
            F.col("n_docs") > 0,
            F.floor(F.col("n_docs_with") * 10000 / F.col("n_docs")),
        )
        .cast("long")
        .alias("coverage_bp"),
    )
