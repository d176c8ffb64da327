"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

All hot-path computation is JVM-side column expressions (whole-stage
codegen); the only pandas UDF is the rolling-hash fingerprint.  Every
SQL-expressible operator here deliberately sticks to functions with
identical semantics in DuckDB (``replace``, ``length``, char-class
regexes common to Java regex and RE2) so the driver's oracle checks
compare apples to apples.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from turtle_spark.functions.hashing import rolling_fingerprint_batch, simhash64_batch

# Stopword markers per language — surrounded by spaces so plain
# substring counting (length-difference trick) works identically in
# Spark and DuckDB SQL.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " de la "],
}

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"
_WORD_RE = "[A-Za-z0-9]+"


def _marker_count(col: F.Column, marker: str) -> F.Column:
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def doc_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality statistics — pure column expressions."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_words = F.regexp_count(c, F.lit(_WORD_RE))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_punct.cast("long").alias("n_punct"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(
            n_chars / F.greatest(n_words.cast("double"), F.lit(1.0)), 6
        ).alias("chars_per_word"),
    )


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """N-gram-marker language heuristic, argmax over marker hit counts.

    ``append=True`` keeps the input columns (for funnel composition in
    one narrow pass) instead of projecting down to id + scores."""
    c = F.lower(F.col(text_col))
    scores = {
        lang: sum((_marker_count(c, m) for m in markers), F.lit(0).cast("long"))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(scores)  # deterministic tie-break order
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    # reversed so that earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    head = [F.col("*")] if append else [F.col(id_col)]
    out = docs.select(
        *head,
        *[scores[l].alias(f"score_{l}") for l in langs],
        pred.alias("pred_lang"),
    )
    return out


def token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Whitespace tokens + BPE-ish subword proxy count.

    The subword proxy counts alternating character-class runs
    (letters / digits / other) — a deterministic, SQL-expressible
    stand-in for a real BPE vocabulary (which isn't in this container).
    """
    c = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(c), r"\s+"))
    subword = F.regexp_count(c, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
    head = [F.col("*")] if append else [F.col(id_col)]
    return docs.select(
        *head,
        F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(ws_tokens).cast("long").alias("n_ws_tokens"),
        subword.cast("long").alias("n_subword_tokens"),
    )


def quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Composite document-quality score in [0, 1] — the Gopher/C4-style
    heuristic filter family, as pure column expressions.

    Components (each SQL-expressible with identical DuckDB semantics):
    ``stop_ratio``   English-stopword hits per whitespace token;
    ``alpha_ratio``  alphabetic chars / all chars;
    ``upper_ratio``  uppercase / alphabetic chars (shouting penalty);
    ``score``        0.4·min(5·stop_ratio, 1) + 0.4·alpha_ratio
                     + 0.2·(1 − upper_ratio).
    """
    c = F.col(text_col)
    lower = F.lower(c)
    n_chars = F.greatest(F.length(c), F.lit(1))
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace(c, "[^A-Z]", ""))
    n_ws = F.greatest(
        F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
            F.size(F.split(F.trim(c), r"\s+"))
        ),
        F.lit(1),
    )
    stop_hits = sum(
        (_marker_count(lower, m) for m in LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    stop_ratio = stop_hits / n_ws.cast("double")
    alpha_ratio = n_alpha / n_chars.cast("double")
    upper_ratio = n_upper / F.greatest(n_alpha, F.lit(1)).cast("double")
    score = (
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.4) * alpha_ratio
        + F.lit(0.2) * (F.lit(1.0) - upper_ratio)
    )
    head = [F.col("*")] if append else [F.col(id_col)]
    return docs.select(
        *head,
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(score, 6).alias("score"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprint + 64-bit SimHash.

    Both sketches run their numpy passes across the whole Arrow batch
    (``*_batch`` in functions.hashing) — per-batch Python, zero
    per-row work, outputs bitwise-identical to the per-row forms."""

    @pandas_udf(T.LongType())
    def fp_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(rolling_fingerprint_batch([(t or "") for t in texts]))

    @pandas_udf(T.LongType())
    def sh_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash64_batch([(t or "") for t in texts]))

    return docs.select(
        F.col(id_col),
        fp_udf(F.col(text_col)).alias("fingerprint"),
        sh_udf(F.col(text_col)).alias("simhash"),
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_k`` characteristic terms per document by TF–IDF with
    reciprocal-df weighting (``score = tf / df``).

    Reciprocal df rather than ``ln(N/df)`` on purpose: ``tf`` and
    ``df`` are integers, and one int/int IEEE division is bit-identical
    in every engine, so the oracle can compare scores exactly — a
    transcendental ``ln`` may differ in the last ulp between libm
    implementations and poison a hash comparison.  Ranking is by the
    raw score with a term tiebreak, so ordering is deterministic too.

    Plan shape: one explode + one hash aggregation (doc-term tf), then
    df as a COUNT window over the tf rows keyed by term — not a
    self-join, which would rescan and re-explode the whole corpus
    (exchange reuse does not fire across differently-keyed
    aggregations of the same subtree).  One scan, three shuffles
    (tf agg, term window, per-doc ranking window), nothing collected.
    """
    from pyspark.sql import Window

    words = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    scored = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    ).withColumn("score", F.col("tf") / F.col("df"))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select(
            F.col(id_col),
            F.col("_rn").cast("int").alias("rank"),
            "term",
            F.col("tf").alias("tf"),
            F.col("df").alias("df"),
            F.round("score", 6).alias("score"),
        )
    )


def training_filter(
    docs: DataFrame,
    min_score: float = 0.5,
    min_tokens: int = 20,
    max_tokens: int = 2000,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Composite training-corpus selection — the C4-style funnel that
    every pre-training pipeline runs, composed from this module's
    operators plus exact dedup:

    keep a document iff it (a) is the canonical copy of its exact-hash
    group, (b) language-identifies as ``lang``, (c) scores at least
    ``min_score`` on the composite quality heuristic, and (d) has a
    whitespace-token count in ``[min_tokens, max_tokens]``.

    All stages are column expressions over ONE documents scan (the
    helpers chain in append mode — no self-joins); the only shuffle is
    the dedup window on the 32-byte content hash.  Returns the
    surviving ``(id_col, pred_lang, score, n_ws_tokens)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col), 256))
    canon = docs.withColumn(
        "_canon", F.col(id_col) == F.min(id_col).over(w)
    )
    staged = token_counts(
        quality_score(
            language_id(canon, text_col=text_col, id_col=id_col, append=True),
            text_col=text_col,
            id_col=id_col,
            append=True,
        ),
        text_col=text_col,
        id_col=id_col,
        append=True,
    )
    return staged.where(
        F.col("_canon")
        & (F.col("pred_lang") == lang)
        & (F.col("score") >= min_score)
        & F.col("n_ws_tokens").between(min_tokens, max_tokens)
    ).select(id_col, "pred_lang", "score", "n_ws_tokens")


def cooccurrence_lift(
    docs: DataFrame,
    window: int = 3,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Skip-gram co-occurrence statistics with exact-integer lift.

    For every ordered word pair (a precedes b within ``window`` tokens
    in the same document) returns the top-``top_k`` pairs by count
    with ``lift = (n_pairs * N) / (n_a * n_b)`` — the observed/expected
    co-occurrence ratio whose log is PMI.  The ratio is emitted instead
    of the PMI itself so the value stays an IEEE division of exact
    int64 operands: bit-identical across engines (a transcendental
    ``log`` is monotone, so rankings are unchanged), which is what lets
    the DuckDB oracle hash-match it.

    Plan shape at scale: tokenization is one narrow ``regexp_extract_all``
    pass; the window expansion multiplies the token stream by the
    constant ``window`` (an in-array ``posexplode`` + offset explode,
    no self-join subtree duplication); the (a, b) count is ONE
    map-side-combined shuffle; unigram counts join back on the word
    key.  Nothing driver-side, no cartesian, top-k is a TakeOrdered.

    Int64 headroom: ``n_pairs * N`` overflows int64 only past ~10^18
    token-pair products; at that corpus size switch the lift operands
    to DECIMAL(38,0) (one-line cast) — documented rather than paid now,
    since the DOUBLE result has only 53 bits anyway.
    """
    from turtle_spark.operators.skew import pin

    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    # pinned: the token stream is referenced four times below (pair
    # left end, pair right end, unigram counts, total) and Catalyst
    # evaluates each join branch separately — without the pin that is
    # four scans + four tokenization passes over the corpus
    w = pin(
        docs.select(
            F.col(id_col).alias("_doc"), F.posexplode(words).alias("pos", "word")
        )
    )
    # (doc, pos + d, word_a) for d in 1..window: the "left end" stream,
    # joined back to the token stream on an EQUI key (doc, pos) — the
    # window expansion happens before the shuffle, never as a theta join
    left = w.select(
        "_doc",
        F.col("word").alias("word_a"),
        F.explode(
            F.sequence(F.col("pos") + 1, F.col("pos") + window)
        ).alias("pos"),
    )
    pairs = left.join(w, ["_doc", "pos"]).select(
        "word_a", F.col("word").alias("word_b")
    )
    counts = pairs.groupBy("word_a", "word_b").agg(F.count("*").alias("n_pairs"))
    uni = w.groupBy("word").agg(F.count("*").alias("n"))
    total = w.select(F.count("*").alias("_nt"))
    out = (
        counts.join(uni.select(F.col("word").alias("word_a"), F.col("n").alias("n_a")), "word_a")
        .join(uni.select(F.col("word").alias("word_b"), F.col("n").alias("n_b")), "word_b")
        .crossJoin(F.broadcast(total))
        .select(
            "word_a",
            "word_b",
            "n_pairs",
            "n_a",
            "n_b",
            (
                (F.col("n_pairs") * F.col("_nt")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("n_pairs"), "word_a", "word_b").limit(top_k)


def vocabulary_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    top_k: int = 100,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` vocabulary shifts between two corpus snapshots:
    (word, n_old, n_new, drift) — the distribution-monitoring signal a
    continuously-crawled training corpus needs (a token whose relative
    frequency jumps between yesterday's and today's snapshot is spam,
    a template, or a topical event; either way a curation reviewer
    wants the list).

    ``drift = |n_new * T_old - n_old * T_new|`` where T is the
    snapshot's total token count — the cross-multiplied form of
    ``|p_new - p_old|`` that never divides: every value is an EXACT
    integer (DECIMAL(38,0) products — counts at 10^12 docs overflow
    int64 when cross-multiplied), so the result is bit-identical at
    any parallelism AND expressible in plain portable SQL — this
    operator carries a real DuckDB twin, not a golden.

    Plan: two word-count aggregations (map-side combined), a full
    outer join on the word, one broadcast of the two scalar totals,
    and a TakeOrdered top-k — no window, no global sort.
    """
    ws = "[ \\t\\n\\r]+"

    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.explode(F.split(F.col(text_col), ws)).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word")
            .agg(F.count("*").alias(alias))
        )

    o = counts(old_docs, "n_old")
    n = counts(new_docs, "n_new")
    joined = o.join(n, "word", "full_outer").select(
        "word",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    totals = joined.agg(
        F.sum("n_old").cast("decimal(38,0)").alias("t_old"),
        F.sum("n_new").cast("decimal(38,0)").alias("t_new"),
    )
    drift = F.abs(
        F.col("n_new").cast("decimal(38,0)") * F.col("t_old")
        - F.col("n_old").cast("decimal(38,0)") * F.col("t_new")
    ).cast("decimal(38,0)")
    return (
        joined.join(F.broadcast(totals))
        .where((F.col("n_old") + F.col("n_new")) >= min_count)
        .select("word", "n_old", "n_new", drift.alias("drift"))
        .orderBy(F.col("drift").desc(), F.col("word").asc())
        .limit(top_k)
        # exact integer rendered as text: a 38-digit decimal survives
        # no client's numeric type (pandas demotes it to float64), so
        # the output contract is its decimal string
        .withColumn("drift", F.col("drift").cast("string"))
    )


def script_mix(docs: DataFrame) -> DataFrame:
    """Per-language character-class census of a document corpus:
    Latin letters, digits, whitespace, and non-ASCII code points —
    the script-consistency signal a multilingual training pipeline
    gates on (a ``lang=en`` slice full of non-ASCII is a language-ID
    failure upstream; a code-heavy slice shows up as digit/punct
    skew).

    Pure column census: each class count is ``length(text) -
    length(regexp_replace(text, class, ''))`` — whole-stage codegen,
    no Python, and the classes are explicit code-point ranges so the
    same regex means the same thing in Spark (Java regex) and any
    ANSI-SQL twin (RE2): no ``\\s``/``\\w`` dialect drift.  One
    map-side-combinable aggregation; integer sums only, so the census
    is bit-identical at any parallelism.
    """

    def cnt(pattern: str):
        return F.length("text") - F.length(F.regexp_replace("text", pattern, ""))

    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum(cnt("[A-Za-z]")).alias("n_latin"),
        F.sum(cnt("[0-9]")).alias("n_digits"),
        F.sum(cnt("[ \\t\\n\\r]")).alias("n_ws"),
        F.sum(cnt("[^\\x00-\\x7f]")).alias("n_nonascii"),
    )


def bm25_search(
    docs: DataFrame,
    query_terms: DataFrame,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 full-text ranking with RATIONAL idf (same device as
    ``tfidf_keywords``): per query, the ``top_k`` documents by

        sum over matched terms of
            idf_r(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    where ``idf_r = (N - df + 0.5)/(df + 0.5)`` — the inside of
    Lucene's ``ln(1 + ...)`` idf, kept UN-logged on purpose: every
    operand (N, df, tf, dl) is an exact integer, so the score is a
    fixed chain of correctly-rounded IEEE +,-,*,/ and the DuckDB twin
    hash-matches bit-for-bit, where a transcendental ``ln`` could
    drift a ulp between libms.  (The un-logged variant weights rare
    terms more steeply than classic BM25 — a documented monotone-
    per-term substitution, not an approximation error.)

    ``query_terms``: (query_id, term) rows — the workload side, small
    by assumption, broadcast into the posting join.

    Plan shape at scale: ONE corpus scan -> (doc, term) tf aggregation;
    df via a COUNT window over the tf rows (not a self-join — exchange
    reuse does not fire across differently-keyed aggs); dl/avgdl from
    the same tf rows (sum of tf == token count, so no second scan);
    the query join touches only postings of queried terms.  Shuffles:
    tf agg, term window, per-(query,doc) agg, ranking window.
    """
    from pyspark.sql import Window

    from turtle_spark.operators.skew import pin

    words = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = pin(words.groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    posted = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .join(F.broadcast(query_terms.select("query_id", "term")), "term")
        .join(dl, id_col)
        .join(F.broadcast(stats))
    )
    score_term = (
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b)
                * F.col("dl")
                / (F.col("total_len") / F.col("n_docs"))
            )
        )
    )
    # the cross-term sum folds in TERM-SORTED order (collect -> sort ->
    # left fold), not a bare SUM of doubles: float addition is not
    # associative, so an aggregation-order sum could differ across
    # partitionings (and vs the oracle) on the last ulp — the same
    # reason the golden mirrors use left-fold float order
    per_doc = (
        posted.withColumn("_s", score_term)
        .groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            ).alias("_score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col(id_col)
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            id_col,
            "n_terms_matched",
            F.round("_score", 6).alias("score"),
        )
    )
