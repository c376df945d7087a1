"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting. All JVM-side expressions over the ``documents``
table; every value reproducible in DuckDB SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "et", "est", "un", "une"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]

FINGERPRINT_N = 3


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_measured,
    n_bpe_ish_tokens): whitespace tokens plus a BPE-ish regex token count
    (alpha runs / digit runs / single punctuation as separate tokens)."""
    toks = F.split("text", " ")
    bpe = F.split(F.regexp_replace("text", r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", "$1\x1f"), "\x1f")
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (F.size(bpe) - 1).cast("long").alias("n_bpe_ish_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, stop_ratio, avg_token_len, distinct_ratio, quality):
    length/stopword/diversity heuristics; quality is a bounded composite.
    All double arithmetic rounded to 6dp."""
    toks = F.split("text", " ")
    n = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(list(EN_STOPWORDS)))
    ).cast("double")
    distinct_ratio = F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6)
    avg_len = F.round((F.length("text") - (F.size(toks) - 1)).cast("double") / n, 6)
    stop_ratio = F.round(stop_hits / n, 6)
    # composite as INTEGER milli-units from the rounded components: each term
    # rounds to an integer far from any half-boundary, so engines can never
    # disagree on the last digit (a double-valued composite can land exactly
    # on a 6-dp rounding boundary where round() implementations differ).
    quality_milli = F.least(
        F.lit(1000).cast("long"),
        (
            F.round(distinct_ratio * 500, 0)
            + F.round(F.least(avg_len / F.lit(8.0), F.lit(1.0)) * 300, 0)
            + F.round(F.least(stop_ratio * 5.0, F.lit(1.0)) * 200, 0)
        ).cast("long"),
    )
    return documents.select(
        "doc_id",
        stop_ratio.alias("stop_ratio"),
        avg_len.alias("avg_token_len"),
        distinct_ratio.alias("distinct_ratio"),
        quality_milli.alias("quality_milli"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang): stopword-hit language heuristic with a
    deterministic tie-break (max hits, then lexicographic language code;
    'und' when nothing matches)."""
    toks = F.split("text", " ")
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(list(words)))).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = documents.select("doc_id", *scores)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_STOPWORDS)])
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)).otherwise(pred)
    return scored.select("doc_id", pred.alias("predicted_lang"))


def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): content fingerprint = min md5-hash over word
    3-gram shingles (a 1-hash MinHash / winnowing-lite: stable under
    reordering of surrounding docs, sensitive to content edits)."""
    from .dedup import with_shingles

    h = "cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"
    d = with_shingles(documents)
    return d.select(
        "doc_id",
        F.expr(f"array_min(transform(sh, t -> {h}))").alias("fingerprint"),
    )


# PII masking patterns — deliberately RE2-compatible (no lookarounds, no
# backreferences) so the SAME pattern string behaves identically under
# Spark's Java regex and DuckDB's RE2, making the masking cross-engine
# verifiable. Order matters: emails before phone-ish digit runs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "<CARD>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def mask_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-corpus PII scrub: replace emails / IPv4s / card-number
    shapes / phone-number shapes with typed placeholder tokens, keeping a
    per-kind match count for audit. Map-only (a chain of regexp_replace +
    regexp_count, all JVM-side); the pattern set is the minimal
    high-precision core — a production scrubber extends PII_PATTERNS, and
    every added pattern stays cross-engine checkable as long as it remains
    RE2-compatible."""
    masked = F.col(text_col)
    counts = []
    for kind, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(masked, F.lit(pat)).alias(f"n_{kind}"))
        masked = F.regexp_replace(masked, pat, repl)
    return documents.select(
        *documents.columns,
        *counts,
        masked.alias("masked_text"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals, all-integer.

    (doc_id, n_tokens, n_distinct, top_token_count, n_bigrams,
    n_distinct_bigrams, repetitive) — the duplicate-n-gram family of
    quality filters (Rae et al. 2021 "Scaling Language Models" §A1.1:
    drop docs whose top unigram or duplicate bigram mass is too high).
    Counts stay BIGINT and the flag is decided by integer
    cross-multiplication (top_count * 5 > n  ⇔  top-token fraction > 0.2;
    dup-bigram occurrences * 2 > n_bigrams  ⇔  fraction > 0.5), so the
    result is bit-identical across engines with no float rounding seam.

    Map-only: top_token_count is computed per row as a higher-order
    expression over the distinct-token array (O(distinct·n) per doc,
    JVM-side) instead of an explode → groupBy — at corpus scale a wider
    map beats a token-count-sized shuffle, and document token counts are
    bounded.
    """
    toks = F.split("text", " ")
    n = F.size(toks)
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    bigrams = F.when(n >= 2, F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), i ->"
        " concat(element_at(split(text, ' '), i), ' ',"
        " element_at(split(text, ' '), i + 1)))"
    )).otherwise(F.expr("array()"))
    n_bi = F.size(bigrams)
    n_bi_distinct = F.size(F.array_distinct(bigrams))
    repetitive = (top * 5 > n) | ((n_bi - n_bi_distinct) * 2 > n_bi)
    return documents.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        top.cast("long").alias("top_token_count"),
        n_bi.cast("long").alias("n_bigrams"),
        n_bi_distinct.cast("long").alias("n_distinct_bigrams"),
        repetitive.alias("repetitive"),
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-unigram language-model scoring — the model-free stand-in for
    perplexity filtering: fit P(tok) = count(tok)/total over the corpus
    itself, then score each document by its token log-probabilities.

    Returns (doc_id, n_tokens, sum_lp_micro, mean_lp_micro): total and
    per-token mean log-prob in integer MICRO-NATS (ln(p)·1e6 rounded per
    token TYPE, then integer-summed). Rounding before the sum makes the
    result a sum of BIGINTs — order-free and bit-identical across engines
    and shuffle orders, the same integer-arithmetic discipline as the
    PageRank/quality operators (float sums are shuffle-order dependent in
    the last ulp, which the value-hash gate would see).

    100 TB shape: token streams collapse to per-doc (tok, count) pairs
    before any join (one doc-local agg), the vocabulary is a corpus-level
    two-phase agg, and the scoring join is vocab-sized per probe —
    heavy-hitter token skew lands on the pre-aggregated counts, not the raw
    stream; AQE handles the residual. The corpus total is a 1-row broadcast.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    doc_tok = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("cnt") / F.col("total")) * 1e6)
        .cast("long")
        .alias("lp_micro"),
    )
    return (
        doc_tok.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lp_micro")).cast("long").alias(
                "sum_lp_micro"
            ),
        )
        .withColumn(
            "mean_lp_micro", F.expr("sum_lp_micro DIV n_tokens")
        )
    )


def skipgram_pairs(
    documents: DataFrame, window: int = 2, text_col: str = "text"
) -> DataFrame:
    """Corpus-level skip-gram pair counts → (center, context, cnt): for
    every token position i, every context position j with 1 ≤ |i−j| ≤
    ``window`` contributes one directed (center, context) observation —
    the word2vec/GloVe co-occurrence extraction step of an embedding
    training pipeline (token-window analog of the conversation-level
    entity PMI weights in centrality.entity_pmi).

    Scale shape: the pair list is built ARRAY-SIDE per document (nested
    higher-order ``transform`` over the split array — the repo's
    zero-shuffle extraction discipline), so the only explode is the final
    one feeding a two-phase count aggregate: no self-join on position, no
    window function, one shuffle of (pair, partial-count) rows. Pair
    fan-out is ≤ 2·window per token, output-proportional.
    """
    w = int(window)
    pairs = (
        f"flatten(transform(toks, (t, i) -> "
        f"transform(filter(sequence(greatest(i - {w}, 0), "
        f"least(i + {w}, size(toks) - 1)), j -> j != i), "
        f"j -> struct(t AS center, element_at(toks, j + 1) AS context))))"
    )
    return (
        documents.select(F.split(F.col(text_col), " ").alias("toks"))
        .select(F.explode(F.expr(pairs)).alias("pr"))
        .select(F.col("pr.center").alias("center"), F.col("pr.context").alias("context"))
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF → (doc_id, term, tf, score_micro,
    rank) — the keyword/salience extraction step of a text-curation
    pipeline (what a topic-balancing sampler or an index builder keys on).

    IDF is computed once per term TYPE in integer micro-nats —
    ``idf_micro = round(ln(N / df) · 1e6)`` with N = corpus document count
    and df = the term's document frequency — then ``score_micro = tf ·
    idf_micro`` is a pure integer product: order-free and bit-identical
    across engines (the unigram_logprob micro-nat discipline; the single
    per-type rounding is where the one libm ln lands, never inside a
    float sum). Rank ties break (score desc, term asc) — deterministic.

    Scale shape: token explode collapses doc-locally to (doc_id, term, tf)
    before anything shuffles; df is a corpus two-phase agg; the scoring
    join is vocabulary-sized; N is a 1-row broadcast. The final top-k
    window partitions by doc_id — millions of small groups, the benign
    window shape (no global or few-group sort)."""
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    doc_term = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_tbl = doc_term.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    n_docs = documents.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    idf = df_tbl.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(F.log(F.col("n_docs") / F.col("df")) * 1e6)
        .cast("long")
        .alias("idf_micro"),
    )
    scored = doc_term.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        (F.col("tf") * F.col("idf_micro")).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score_micro", "rank")
    )
