"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM-side string/array expressions — at 100 TB these run as maps
inside whole-stage codegen with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators.dedup import tokens

#: Tiny marker lexicons for the n-gram/stopword language heuristic. Real
#: corpora would use character n-gram profiles; the mechanism (count marker
#: hits per language, argmax) is the same and stays expression-only.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "y", "es", "una"),
    "it": ("il", "di", "che", "e", "per"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}


def marker_hits(text_col: str, lang: str) -> Column:
    """Count of tokens belonging to ``lang``'s marker set."""
    toks = tokens(text_col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id_expr(text_col: str = "text") -> Column:
    """Heuristic language ID: argmax of marker-hit counts, deterministic
    alphabetical tie-break, 'und' (undetermined) when no marker hits;
    NULL text -> NULL ('und' means "real text, no markers" — a NULL doc
    has no prediction at all; F7 NULL-text plant)."""
    langs = sorted(LANG_MARKERS)
    best = F.lit("und")
    best_hits = F.lit(0)
    # fold right-to-left so earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        h = marker_hits(text_col, lang)
        best = F.when(h >= F.greatest(best_hits, F.lit(1)), F.lit(lang)).otherwise(best)
        best_hits = F.greatest(best_hits, h)
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(t.isNotNull(), best)


#: Small English stopword list for the stopword-ratio quality signal.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)


def stopword_ratio(text_col: str = "text") -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords;
    NULL for empty documents. Natural prose sits well above 0."""
    toks = tokens(text_col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-signal bundle: lengths, token stats, character-class +
    stopword ratios, and a composite [0,1] score (heuristic linear
    blend)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    nonspace = F.length(F.regexp_replace(t, " ", ""))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    avg_tok = F.when(n_tok > 0, nonspace.cast("double") / n_tok)
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars)
    digit_ratio = F.when(n_chars > 0, digits.cast("double") / n_chars)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars)
    # crude composite: long-enough, alphabetic, not digit/punct heavy
    score = (
        F.least(n_tok.cast("double") / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + F.coalesce(alpha_ratio, F.lit(0.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(F.coalesce(digit_ratio, F.lit(0.0)) * 5, F.lit(1.0)))
        * F.lit(0.1)
        + (F.lit(1.0) - F.least(F.coalesce(punct_ratio, F.lit(0.0)) * 10, F.lit(1.0)))
        * F.lit(0.1)
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("long"),
            "avg_token_len": avg_tok,
            "alpha_ratio": alpha_ratio,
            "digit_ratio": digit_ratio,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stopword_ratio(text_col),
            "quality_score": score,
        }
    )


def fingerprint_expr(text_col: str = "text", prefix_chars: int = 64) -> Column:
    """Normalized-prefix fingerprint: lowercase, collapse whitespace, md5
    the first ``prefix_chars`` — a cheap near-exact-dup key that survives
    trailing edits (the rolling-hash fingerprint's practical cousin)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return F.md5(F.substring(norm, 1, prefix_chars))


def token_count_bpe_ish(text_col: str = "text") -> Column:
    """BPE-ish token estimate without a tokenizer model: count word pieces
    after splitting on whitespace AND on letter/digit/punct boundaries
    (a regex approximation of byte-pair segmentation granularity)."""
    pieces = F.split(
        F.regexp_replace(
            F.col(text_col), "([0-9]+|[^a-zA-Z0-9 ])", " $1 "
        ),
        "\\s+",
        -1,
    )
    return F.size(F.filter(pieces, lambda p: p != F.lit("")))


def word_ngrams_all(text_col: Column | str, n: int) -> Column:
    """ALL word n-grams in order (duplicates kept — unlike
    ``dedup.word_shingles`` this feeds frequency statistics, not set
    hashing). O(tokens) transform, no UDF; < n words -> empty array.

    As in ``dedup.word_shingles``, the token array is bound to a lambda
    variable via a single-element ``transform`` first — referencing the
    raw ``split`` inside the positional lambda re-splits the document for
    every element access (O(tokens^2) per doc)."""

    def grams_of(toks: Column) -> Column:
        cnt = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(-1)))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
            ),
        )
        return F.when(cnt >= n, grams).otherwise(F.array())

    return F.element_at(F.transform(F.array(tokens(text_col)), grams_of), 1)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    'Scaling Language Models', Table A1 repetition filters):

    - ``top2_frac``: occurrences of the most frequent word 2-gram over
      all 2-grams (boilerplate headers/footers push this up);
    - ``dup5_frac``: fraction of word 5-grams that are duplicates
      (1 - distinct/total; copy-paste loops push this up).

    Scale shape: ONE scan. The per-row 5-gram stats ride along the
    2-gram explode as extra columns, then travel through both
    aggregations via ``first`` — no second scan and no doc-keyed join.
    Both shuffles key BY DOCUMENT (plus gram), so corpus-hot n-grams
    cannot skew a partition, and map-side combine collapses within-doc
    duplicates before the wire. The 5-gram array is built once behind a
    Generate barrier (higher-order expressions get no CSE: referencing
    the array from ``size`` and ``array_distinct`` in the same
    projection would otherwise build it twice). Docs under 5 words drop
    (no 5-grams -> repetition undefined), matching shingle drop-out
    semantics elsewhere.
    """
    g5 = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(F.array(word_ngrams_all(F.col(text_col), 5))).alias("g5"),
    )
    rows = g5.select(
        F.col(id_col),
        F.size("g5").alias("n5"),
        F.size(F.array_distinct("g5")).alias("n5_distinct"),
        F.explode(word_ngrams_all(F.col(text_col), 2)).alias("g"),
    ).filter(F.col("n5") > 0)
    stats = (
        rows.groupBy(id_col, "g")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first("n5").alias("n5"),
            F.first("n5_distinct").alias("n5_distinct"),
        )
        .groupBy(id_col)
        .agg(
            F.max("c").alias("top2_cnt"),
            F.sum("c").alias("n2"),
            F.first("n5").alias("n5"),
            F.first("n5_distinct").alias("n5_distinct"),
        )
    )
    return stats.select(
        F.col(id_col),
        F.col("n2").cast("long").alias("n2"),
        F.col("top2_cnt").cast("long").alias("top2_cnt"),
        (F.col("top2_cnt") / F.col("n2")).alias("top2_frac"),
        F.col("n5").cast("long").alias("n5"),
        (
            (F.col("n5") - F.col("n5_distinct")) / F.col("n5")
        ).alias("dup5_frac"),
    )


def split_expr(id_col: str = "doc_id") -> Column:
    """Deterministic train/val/test assignment from a content-free id
    hash: the LAST two hex digits of md5(id) give 256 uniform buckets,
    compared lexicographically — no hex->int conversion, so the same
    expression runs on any engine. 'f8' splits 248/4/4 (~96.9/1.6/1.6%).

    Hash-mod splitting is the standard at 100 TB: membership is a pure
    map (re-runnable, join-free), stable under corpus growth, and
    uncorrelated with any real feature of the data.
    """
    b = F.substring(F.md5(F.col(id_col).cast("string")), 31, 2)
    return (
        F.when(b < F.lit("f8"), F.lit("train"))
        .when(b < F.lit("fc"), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def rebalance_keep_flag(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mix rebalancing: downsample over-represented groups to the size
    of the SMALLEST group, the "uniform mix" a training-data run dials
    toward when one language/source dominates the crawl.

    Each group's keep rate is cap/n_group (cap = min group size); a
    document survives if the first 8 hex chars of md5(id) fall below the
    rate's hex threshold — membership is a content-free pure map, so the
    decision is re-runnable, join-free at apply time, and stable when
    the corpus grows (same properties as ``split_expr``, and the same
    engine-portable lexicographic-hex comparison: the threshold string
    printf('%08x', floor(rate * 16^8)) is computed IN PLAN from the
    group counts). Groups at the cap keep everything (the rate-1.0
    threshold would be 9 hex chars and compare wrong — the CASE guards
    it).

    Scale shape: one groupBy for the counts, a broadcast of the tiny
    (group, n, cap) table back onto the corpus, then a map-side flag —
    no corpus shuffle at all. Returns the input plus (n_group, kept).
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    cap = counts.agg(F.min("n_group").alias("cap"))
    rates = F.broadcast(counts.crossJoin(F.broadcast(cap)))
    thr = F.lower(
        F.lpad(
            F.hex(
                F.floor(
                    F.col("cap").cast("double")
                    / F.col("n_group")
                    * F.lit(4294967296.0)
                )
            ),
            8,
            "0",
        )
    )
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    keep = F.when(F.col("n_group") <= F.col("cap"), F.lit(True)).otherwise(
        h < thr
    )
    return df.join(rates, group_col).withColumn("kept", keep).drop("cap")


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic keyword-extraction
    pass a curation pipeline runs to tag/route documents.

    tfidf = tf * ln(N / df), rounded to 6 dp BEFORE ranking so the rank
    is deterministic across engines (ties broken by term ascending).

    Scale shape: explode -> groupBy(doc, term) with map-side combine ->
    term-keyed aggregate for document frequencies (vocab-sized, far
    smaller than the corpus) -> equi-join tf x df on term -> per-doc
    top-k via a doc-keyed rank window. N arrives by a 1-row broadcast
    crossJoin (scalar graft). No corpus-sized skew key: term frequencies
    follow Zipf, but the tf table is already (doc, term)-deduped before
    the term join, and the rank window keys by document.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf",
        )
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheap stand-in for the KenLM-perplexity quality
    filter every large-scale text pipeline runs (low mean logprob =
    unusual token mix = candidate junk).

    Scale shape: one explode feeds BOTH the vocabulary counts (term-keyed
    aggregate, vocab-sized output) and the per-doc averages; the token
    stream joins the vocabulary on term (broadcastable when the vocab
    fits, shuffled equi-join otherwise) and aggregates back by document.
    The corpus total rides the vocabulary aggregate as a 1-row broadcast.
    Per-token logs are quantized to 2^-26 multiples before the mean so
    the sum is exact in any accumulation order (ADVICE r7: raw
    ROUND(AVG(double), 6) is partition-layout-sensitive); 6-dp output
    rounding kept for presentation.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    scored = toks.join(vocab, "term").crossJoin(F.broadcast(total))
    q = F.lit(float(2**26))
    lp = F.log(F.col("cnt").cast("double") / F.col("total"))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(F.floor(lp * q + F.lit(0.5)) / q), 6).alias(
                "avg_logprob"
            ),
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Fraction of a document's distinct word n-grams whose FIRST corpus
    occurrence (minimum doc id) is this document — a curation-ordering
    signal: low novelty means the document is mostly restating earlier
    material (near-dup tail, boilerplate), high novelty means new text.

    Scale shape: one explode of per-doc distinct shingles; the first
    owner of each shingle comes from a min-window keyed on the shingle
    (rides the same shuffle a groupBy+join would need, without the join
    or the second evaluation of the shingling lineage); per-doc fractions
    aggregate doc-keyed. A corpus-hot shingle lands one window partition
    — linear in its doc frequency, never quadratic. The novel/total
    ratio is an exact-integer division: engine-exact, no rounding.
    """
    from market_microstructure_toolkit_spark.operators.dedup import word_shingles

    grams = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    first = grams.withColumn(
        "first_doc", F.min(id_col).over(Window.partitionBy("g"))
    )
    return (
        first.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col(id_col), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
        )
    )
