"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, fingerprinting.

Not present in the reference (its only text handling is event-string
routing); these are the north-star extensions (BASELINE.json). Everything is
built-in Catalyst expressions — higher-order array functions over a split
column — so the whole stage is one narrow codegen'd pass over the scan: no
shuffle, no UDF, linear in bytes. That is exactly the shape you want for a
100 TB corpus sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny English stopword list (public-domain common words). Deterministic and
#: mirrored verbatim in the DuckDB oracle.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
]

#: Marker words for the language-ID heuristic, per candidate language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "this"],
    "es": ["el", "la", "de", "que", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}

PUNCT_CLASS = "[.,!?;:]"


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def _count_in(tokens: Column, words: list[str]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordlist, t)))


def text_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document stats + a deterministic quality score.

    quality = 0.5·min(tokens/50, 1) + 0.3·(1 − stopword_ratio) + 0.2·(1 − punct_ratio)
    — a length/punct/stopword composite in [0,1] of the kind used for corpus
    filtering; the exact formula matters only in that it is reproducible.
    ``keep`` passes extra columns through (so downstream rollups ride the
    same scan instead of re-joining on the id).
    """
    t = F.col("__tokens")
    df = docs.withColumn("__tokens", tokens_col(F.col(text_col)))
    token_count = F.size(t)
    char_count = F.length(F.col(text_col))
    punct_count = char_count - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    stop_count = _count_in(t, STOPWORDS)
    stop_ratio = stop_count.cast("double") / token_count
    punct_ratio = punct_count.cast("double") / char_count
    quality = (
        F.lit(0.5) * F.least(token_count.cast("double") / 50, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        token_count.cast("long").alias("token_count"),
        char_count.cast("long").alias("char_count"),
        stop_count.cast("long").alias("stopword_count"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def token_count_bpe(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token estimate: word pieces + standalone punctuation via
    ``\\w+|[^\\w\\s]`` (the classic pre-tokenizer regex). ASCII-equivalent
    between Java regex and RE2, which the oracle relies on."""
    pieces = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+|[^\w\s]"), 0)
    return docs.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("bpe_token_count"),
    )


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """N-gram-style language-ID heuristic: count marker-word hits per
    candidate language, predict the argmax (ties broken by language code
    order, 'unknown' when nothing matches). ``keep`` passes extra columns
    through the same scan (no re-join on the id), as in ``text_stats``."""
    df = docs.withColumn("__tokens", tokens_col(F.col(text_col)))
    t = F.col("__tokens")
    langs = sorted(LANG_MARKERS)
    # stage per-language scores, then the max, as projected columns: the
    # pred chain references each score twice and the max once per branch,
    # and inlined that re-runs every token-filter fold per reference
    scored = df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        *[_count_in(t, LANG_MARKERS[lang]).alias(f"__s_{lang}") for lang in langs],
    ).withColumn("__best", F.greatest(*[F.col(f"__s_{lang}") for lang in langs]))
    pred = F.lit("unknown")
    for lang in reversed(langs):  # earlier lang wins ties → build from the back
        pred = F.when(F.col(f"__s_{lang}") == F.col("__best"), F.lit(lang)).otherwise(pred)
    pred = F.when(F.col("__best") == 0, F.lit("unknown")).otherwise(pred)
    return scored.select(F.col(id_col), *keep, pred.alias("predicted_lang"))


def word_ngrams_col(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams of a token array. Short-doc guard
    (same as dedup.shingles_from_tokens): size<n would make the sequence
    descend and element_at go out of range; such docs yield an empty array
    (so an explode simply drops them)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_counts(
    docs: DataFrame, n: int = 2, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k word n-grams (vocabulary statistics for corpus
    curation). Explode → count → top-k with deterministic tiebreak; the
    count aggregates map-side, so the shuffle carries one row per distinct
    n-gram per partition — not per occurrence."""
    toks_df = docs.select(tokens_col(F.col(text_col)).alias("__toks"))
    grams = toks_df.select(
        F.explode(word_ngrams_col(F.col("__toks"), n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("ngram"))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword extraction
    / corpus-indexing pass. ``idf = ln((N+1)/(df+1)) + 1`` (smoothed, always
    positive), ``tfidf = tf · idf`` rounded to 6 decimals for cross-engine
    reproducibility; ties break term-ASC so the top-k is deterministic.

    Output: (id_col, term, tf, tfidf, rank), rank 1..k.

    Scale shape: explode → groupBy(doc, term) with map-side combine (one
    shuffle of distinct doc-terms, not occurrences) → document frequency
    as a count over a per-term WINDOW on that same frame (one exchange on
    term; the corpus is tokenized exactly once — an aggregate-and-join-back
    form re-scans and re-explodes the whole corpus for the DF table) → one
    window per doc for the top-k. The raw text is never shuffled.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.select(F.count("*").alias("__n"))
    wdf = Window.partitionBy("term")
    scored = (
        tf.withColumn("__df", F.count("*").over(wdf))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def repetition_score(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document repetition: the fraction of word ``n``-grams that are
    repeats of an earlier gram in the same doc
    (``1 − distinct/total``) — the duplicated-boilerplate signal quality
    filters threshold on (high ratio ⇒ templated/spammy text).

    Output: (id_col, n_grams, n_distinct, repetition_ratio). Docs shorter
    than ``n`` tokens have no grams: ratio 0. Pure per-row array math —
    no shuffle, no Python.

    The token and gram arrays are staged through intermediate projections:
    inlining ``tokens_col`` into every ``element_at`` of the gram transform
    re-tokenizes the document once PER GRAM TERM, and referencing the gram
    expression twice (size + array_distinct) doubles it again — measured
    ~20x slower (the same CollapseProject trap decontaminate hit)."""
    return docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col), word_ngrams_col(F.col("__toks"), n).alias("__grams")
    ).select(
        F.col(id_col),
        F.size("__grams").cast("long").alias("n_grams"),
        F.size(F.array_distinct("__grams")).cast("long").alias("n_distinct"),
    ).select(
        id_col,
        "n_grams",
        "n_distinct",
        F.when(
            F.col("n_grams") > 0,
            F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition_ratio"),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into whitespace-token chunks of at most
    ``max_tokens`` tokens, consecutive chunks sharing ``overlap`` tokens —
    the context-windowing pass in front of embedding / pretraining.

    Output: (id_col, chunk_id, n_tokens, chunk_text); chunk_id is 0-based
    within the doc; chunk_text re-joins tokens with single spaces
    (whitespace is normalized by construction). Empty docs yield no rows.

    Whole-stage-codegen shape: tokenize → compute the chunk count
    arithmetically → posexplode a per-doc sequence → slice the token
    array. No shuffle at all; linear in tokens.
    """
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    toks = tokens_col(F.col(text_col))
    ntok = F.size("__toks")
    # sliding windows of max_tokens advancing by stride; the LAST window is
    # the one that reaches the end, so a doc shorter than max_tokens is one
    # chunk and no trailing pure-overlap chunk is emitted
    nchunks = (
        F.lit(1)
        + F.ceil(F.greatest(ntok - max_tokens, F.lit(0)).cast("double") / stride).cast(
            "int"
        )
    )
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(
                F.when(ntok >= 1, F.sequence(F.lit(0), nchunks - 1)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("chunk_id", "__i"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(
                F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens
            ).alias("__chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
        )
    )


def similar_docs_topk(
    docs: DataFrame,
    query_id: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-Jaccard top-``k`` against the document ``query_id`` —
    the text twin of ``similarity.brute_force_topk``: find-similar-docs by
    lexical overlap (dup triage, related-content lookup).

    Output: (id_col, jaccard), score DESC / id ASC — a total order, so the
    top-k set is deterministic. Scale shape: the query's token set is a
    1-row broadcast; the corpus side is one scan computing a per-row set
    intersection, then TakeOrderedAndProject — no shuffle of the corpus,
    same plan at any corpus size. For *all-pairs* similarity use the
    MinHash/SimHash sketches; this is the single-query form.

    If ``query_id`` is absent from ``docs``, the broadcast query side is
    empty and the result is an EMPTY frame — indistinguishable from "no
    similar docs". Validate the id upstream (or check ``q.count()``)
    when the distinction matters; the operator stays lazy/declarative on
    purpose and does not pay a driver-side existence check per call."""
    toks = docs.select(
        F.col(id_col), F.array_distinct(tokens_col(F.col(text_col))).alias("__toks")
    )
    q = toks.filter(F.col(id_col) == query_id).select(
        F.col("__toks").alias("__qtoks")
    )
    union_size = F.size(F.array_union(F.col("__toks"), F.col("__qtoks")))
    jac = F.when(union_size > 0,
                 F.size(F.array_intersect(F.col("__toks"), F.col("__qtoks")))
                 .cast("double") / union_size).otherwise(F.lit(0.0))
    return (
        toks.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.round(jac, 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc(id_col))
        .limit(k)
    )


def token_frequencies(
    docs: DataFrame, k: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level term frequencies, top-``k`` (the Zipf profile): the
    aggregation behind tokenizer/BPE vocabulary work and stopword-list
    tuning. Output (token, n_occurrences, n_docs), count DESC / token ASC
    — a total order, deterministic top-k.

    Scale shape: explode tokens with their doc id, then ONE token-keyed
    aggregation computing count + count_distinct(doc) together (the
    count_distinct Expand doubles pre-shuffle rows, but partial
    aggregation collapses them map-side — measured faster than a
    two-level (token, doc)→(token) rollup, which pays a second full
    exchange; see duplicate_spans for the same trade), then
    TakeOrderedAndProject for the top-k."""
    exploded = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    return (
        exploded.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def collocations(
    docs: DataFrame,
    k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-token collocation mining (the word2phrase / phrase-vocab
    induction signal): top-``k`` bigrams by pointwise mutual information,
    PMI = log[ n·c(ab) / (c(a)·c(b)) ], among bigrams seen at least
    ``min_count`` times.

    log is monotonic, so ranking uses the RATIO itself — scored as
    ``score_ppm = (c_ab · n_tokens · 10⁶) DIV (c_a · c_b)`` with the
    product accumulated in DECIMAL(38,0) and integer-divided: exact on
    any engine at any corpus size (c_ab·n·10⁶ overflows int64 past ~10⁹
    tokens; a float log differs across libms in the last ulp and makes
    top-k ties engine-dependent). Output (token_a, token_b, n_pair,
    score_ppm), score DESC / pair ASC — a total order.

    Scale shape: ONE corpus scan and ONE fact-sized exchange. Each doc's
    token list zips against its 1-shifted self PADDED with a NULL
    sentinel, so every token position emits exactly one (a, b) pair —
    the doc-last position as (token, NULL) — and a single (a, b)-keyed
    count serves BOTH grains: bigram counts are the b-NOT-NULL rows, and
    unigram counts recover exactly as Σ_b count(a, b) (every occurrence
    of t is the `a` of exactly one emitted pair). The aggregated grain
    (distinct bigrams — vocab²-bounded, tiny next to the corpus) is
    materialized once and re-read by the unigram rollup, the 1-row
    total, and the min-count filter, so the corpus is scanned and
    tokenized ONCE (a measured 3.6→2.3 s at the 10× checkpoint vs the
    earlier two-scan spelling; a hash-first two-pass à la
    duplicate_spans slims the exchange rows to 8-byte keys but pays a
    SECOND full scan+tokenize, which measures strictly worse here
    because min_count filters the aggregated grain, not the instance
    stream). Downstream: two slim shuffle joins against the vocab-sized
    unigram rollup (a broadcast would not hold at web scale) and a
    1-row total broadcast; TakeOrdered for the top-k."""
    from ..plans.scale import materialize_once

    toks = docs.select(tokens_col(F.col(text_col)).alias("__toks"))
    rhs = F.concat(
        F.slice(F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
        F.array(F.lit(None).cast("string")),
    )
    grain = materialize_once(
        toks.select(
            F.explode(
                F.zip_with(
                    F.col("__toks"),
                    rhs,
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("__p")
        )
        .groupBy(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
        .agg(F.count("*").alias("__c"))
    )
    uni = (
        grain.filter(F.col("__a") != "")
        .groupBy(F.col("__a").alias("__t"))
        .agg(F.sum("__c").alias("__c"))
    )
    total = uni.agg(F.sum("__c").cast("decimal(38,0)").alias("__n"))
    pairs = grain.filter(
        F.col("__b").isNotNull()
        & (F.col("__a") != "")
        & (F.col("__b") != "")
        & (F.col("__c") >= min_count)
    ).select(
        F.col("__a").alias("token_a"),
        F.col("__b").alias("token_b"),
        F.col("__c").alias("n_pair"),
    )
    ca = uni.select(F.col("__t").alias("token_a"), F.col("__c").alias("__ca"))
    cb = uni.select(F.col("__t").alias("token_b"), F.col("__c").alias("__cb"))
    num = (
        F.col("n_pair").cast("decimal(38,0)")
        * F.col("__n")
        * F.lit(1_000_000).cast("decimal(38,0)")
    )
    den = F.col("__ca").cast("decimal(38,0)") * F.col("__cb").cast("decimal(38,0)")
    return (
        pairs.join(ca, "token_a")
        .join(cb, "token_b")
        .crossJoin(F.broadcast(total))
        .select(
            "token_a",
            "token_b",
            "n_pair",
            num.cast("decimal(38,0)").alias("__num"),
            den.cast("decimal(38,0)").alias("__den"),
        )
        .select(
            "token_a",
            "token_b",
            "n_pair",
            F.expr("CAST(__num DIV __den AS BIGINT)").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), F.asc("token_a"), F.asc("token_b"))
        .limit(k)
    )


def type_token_ratio(
    docs: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-stratum lexical diversity: type-token ratio (distinct tokens /
    total tokens) — the quick Heaps-law diagnostic that separates
    boilerplate-heavy feeds (low TTR: templates, logs) from diverse prose
    before any model-based quality scoring.

    Output (stratum, n_docs, n_tokens, n_types, ttr_ppm) with
    ``ttr_ppm = n_types·10⁶ DIV n_tokens`` — integer-exact, no float
    division. One explode + ONE (stratum, token)-free aggregation:
    count + count_distinct share a single stratum-keyed exchange
    (count_distinct's Expand collapses map-side, same trade as
    token_frequencies)."""
    exploded = docs.select(
        F.col(by), F.col("doc_id"), F.explode(tokens_col(F.col(text_col))).alias("__t")
    ).filter(F.col("__t") != "")
    return (
        exploded.groupBy(by)
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_tokens"),
            F.count_distinct("__t").alias("n_types"),
        )
        .select(
            F.col(by),
            "n_docs",
            "n_tokens",
            "n_types",
            F.expr("CAST((n_types * CAST(1000000 AS BIGINT)) DIV n_tokens AS BIGINT)").alias(
                "ttr_ppm"
            ),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` tokens — the coverage check run before committing
    to a tokenizer vocabulary, and a quality signal (high OOV ⇒ noisy or
    off-domain text). Output: (id, n_tokens, oov_tokens, oov_rate), rate
    rounded to 6 decimals; empty docs emit 0 tokens and rate 0.0.

    Scale shape: the vocabulary is a corpus-wide top-k (one token-keyed
    aggregation + TakeOrdered — deterministic via the (count DESC, token
    ASC) total order) that collapses to ``vocab_size`` rows and BROADCASTS
    into the membership probe, so the per-doc pass is one exploded scan,
    a broadcast LEFT JOIN, and a doc-keyed count pair — the corpus text
    never shuffles, only (doc_id, token) pairs do, and a 100 TB corpus
    probes the same tiny in-memory vocab on every executor."""
    exploded = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    vocab = (
        exploded.groupBy("token")
        .agg(F.count("*").alias("__cnt"))
        .orderBy(F.desc("__cnt"), F.asc("token"))
        .limit(vocab_size)
        .select(F.col("token").alias("__vtok"))
    )
    flagged = exploded.join(
        F.broadcast(vocab), F.col("token") == F.col("__vtok"), "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__vtok").isNull(), 1).otherwise(0)).alias("oov_tokens"),
    )
    # right join keeps token-less docs (empty/whitespace text) at 0/0
    return docs.select(F.col(id_col)).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("oov_tokens", F.lit(0)).alias("oov_tokens"),
        F.round(
            F.coalesce(
                F.col("oov_tokens") / F.nullif(F.col("n_tokens"), F.lit(0)), F.lit(0.0)
            ),
            6,
        ).alias("oov_rate"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text.
    Stable across engines (vs engine-specific hash functions), usable as an
    exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def rare_bigram_rate(
    docs: DataFrame,
    rare_below: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """KenLM-lite fluency signal without a language model: the fraction of
    a document's adjacent-token bigrams that are RARE in the corpus
    (corpus count < ``rare_below``). Gibberish, OCR noise, and shuffled
    text score high; natural prose reuses the corpus's common transitions
    and scores low — the cheap stand-in for perplexity filtering when no
    model is available, and exact integers end to end (a real LM score
    averages float log-probs, which no two engines agree on).

    Output: (id_col, n_bigrams, n_rare, rare_ppm) with
    ``rare_ppm = n_rare·10⁶ DIV n_bigrams`` (docs with < 2 tokens: 0/0/0).

    Scale shape: the corpus bigram count table aggregates on the bigram
    key ONCE (map-side partials) and joins back to the exploded doc
    bigrams as a shuffle join on the same key — two passes over the
    bigram stream, nothing wider than (gram, count) shuffles; the
    doc-grain rollup shuffles (doc, flags). At 100 TB the count table is
    vocab²-bounded but long-tail-light (rare grams ARE the tail; the
    common grams that dominate row count hash-join against a heavy-hitter
    fraction of the table)."""
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    )
    grams = toks.select(
        F.col(id_col),
        F.explode(word_ngrams_col(F.col("__toks"), 2)).alias("__g"),
    )
    counts = grams.groupBy("__g").agg(F.count("*").alias("__c"))
    flagged = (
        grams.join(counts, "__g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("__c") < rare_below, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
    )
    return (
        docs.select(id_col)
        .join(flagged, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_rare"), F.lit(0)).cast("long").alias("n_rare"),
            F.coalesce(
                F.expr("CAST((n_rare * CAST(1000000 AS BIGINT)) DIV n_bigrams AS BIGINT)"),
                F.lit(0),
            ).cast("long").alias("rare_ppm"),
        )
    )


def source_vocab_overlap(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Pairwise token-vocabulary Jaccard BETWEEN SOURCES — the
    corpus-mixing diagnostic ("how lexically similar are my data
    sources") run before setting mixture weights: for each source pair
    (source_a < source_b), both vocab sizes, the shared-vocabulary count,
    and Jaccard.

    Same machinery as ``analytics.audience_overlap``
    (:func:`analytics.pairwise_set_overlap`) with elements = distinct
    tokens, sets = sources: one token-keyed membership exchange (bitmask
    ``bit_or`` for ≤ 63 sources), pair fan-out ≤ |sources|²/2 per token,
    totals broadcast back. The token universe scales with the corpus;
    the source cardinality is small by definition — ``sets`` is the
    pruned one-column source scan so discovery never re-runs the token
    explode. The oracle keeps the DISTINCT + self-join spelling."""
    from .analytics import pairwise_set_overlap

    toks = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("element"),
        F.col(source_col).alias("set_id"),
    ).filter(F.col("element") != "")
    return pairwise_set_overlap(toks, sets=docs.select(F.col(source_col))).select(
        F.col("set_a").alias("source_a"),
        F.col("set_b").alias("source_b"),
        F.col("n_a").alias("vocab_a"),
        F.col("n_b").alias("vocab_b"),
        F.col("n_both").alias("vocab_shared"),
        "jaccard",
    )


def token_length_distribution(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Token-length histogram over the corpus: per length, total token
    occurrences and distinct token types — the tokenizer-QA scan run
    before fitting a BPE vocabulary (a heavy tail of 50-char "tokens"
    means the pre-tokenizer is broken; a spike at 1 means the corpus is
    CJK or the splitter is over-eager).

    One explode + ONE aggregation at token-length grain (map-side
    combined; ≤ max-token-length groups — the distinct-type count plans
    as one Expand, same trade as ``token_frequencies``). Output
    (token_len, n_occurrences, n_types), length ASC."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy(F.length("__t").cast("long").alias("token_len"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("__t").alias("n_types"),
        )
        .orderBy(F.asc("token_len"))
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the
    gibberish/compressibility proxy quality pipelines threshold on:
    natural prose sits in a narrow entropy band, while base64 blobs,
    minified JS, and key-mash spam land far outside it. Output
    (id_col, n_chars, n_distinct_chars, char_entropy); empty/NULL docs
    have no characters and drop out (both engines agree).

    Same single-pass identity as ``graph.transition_entropy``:
    H = ln N − (Σ c·ln c)/N over per-(doc, char) counts — but the result
    is DOC-GRAIN, so no shuffle is needed at all: an Arrow ``mapInPandas``
    pass builds every doc's character histogram in one vectorized numpy
    sweep per batch (codepoints via ``utf-32-le``, per-(doc, codepoint)
    counts via one ``np.unique`` on a fused int64 key, segment sums via
    ``np.add.reduceat``) and emits the finished row. This replaced the r8
    explode → (doc, codepoint)-keyed hash-agg → doc rollup, whose explode
    volume (one row per character occurrence) held it at 2.1–2.4× the
    DuckDB control at the 10× checkpoint; the histogram pass touches each
    byte once and never exchanges. Rounding is ``floor(x·1e6 + 0.5)/1e6``
    — positive-value HALF_UP, matching both engines' ``round(x, 6)``; the
    ``+ 0.0`` canonicalizes IEEE −0.0 for single-character docs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_distinct_chars", T.LongType()),
            T.StructField("char_entropy", T.DoubleType()),
        ]
    )

    def hist_batches(batches):
        for pdf in batches:
            texts = pdf[text_col]
            keep = texts.notna() & (texts.str.len() > 0)
            ids = pdf[id_col][keep]
            kept = texts[keep]
            if len(kept) == 0:
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "n_chars": pd.array([], dtype="int64"),
                        "n_distinct_chars": pd.array([], dtype="int64"),
                        "char_entropy": pd.array([], dtype="float64"),
                    }
                )
                continue
            lens = kept.str.len().to_numpy(dtype=np.int64)
            # one codepoint int per character; utf-32-le is a straight
            # codepoint dump, so len(str) == #codepoints == #chars
            codes = np.frombuffer(
                "".join(kept.tolist()).encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            # fused (doc, codepoint) key: codepoints < 0x110000 by definition
            uk, counts = np.unique(doc_idx * 0x110000 + codes, return_counts=True)
            udoc = uk // 0x110000  # sorted; every kept doc has >=1 run
            starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
            ends = np.r_[starts[1:], len(udoc)]
            c = counts.astype(np.float64)
            snlogn = np.add.reduceat(c * np.log(c), starts)
            n = lens.astype(np.float64)
            ent = np.floor((np.log(n) - snlogn / n) * 1e6 + 0.5) / 1e6 + 0.0
            yield pd.DataFrame(
                {
                    id_col: ids.to_numpy(),
                    "n_chars": lens,
                    "n_distinct_chars": (ends - starts).astype(np.int64),
                    "char_entropy": ent,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(hist_batches, out_schema)


def readability_scores(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source Flesch-style readability rollup — the fluency screen a
    pretraining mix applies per data source (legalese and ELI5 forums sit
    ~60 Flesch points apart). Syllables are approximated by VOWEL RUNS
    (`[aeiou]+` — the standard dictionary-free proxy) and sentences by
    terminal-punctuation runs (min 1 per doc, so punctuation-free text is
    one long sentence rather than a division by zero).

    Flesch = 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word),
    computed from per-source EXACT INTEGER sums (three regexp/array
    counts per row, one map-side-combined aggregation — the double math
    happens once per source on top of exact sums, so both engines agree
    bit-for-bit). Output (source, n_docs, n_words, n_sentences,
    n_syllables, words_per_sentence, syllables_per_word, flesch)."""
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.size(F.filter(tokens_col(F.col(text_col)), lambda t: t != "")).alias("__w"),
        F.greatest(
            F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
        ).alias("__s"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiou]+")).alias("__y"),
    )
    g = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__w").cast("long").alias("n_words"),
        F.sum("__s").cast("long").alias("n_sentences"),
        F.sum("__y").cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return g.select(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(spw, 6).alias("syllables_per_word"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ).alias("flesch"),
    )


def bpe_merge_step(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
    min_pair_count: int = 2,
) -> DataFrame:
    """One training iteration of byte-pair encoding: the corpus-weighted
    count of every ADJACENT CHARACTER PAIR inside words, descending — the
    top row is exactly the merge a BPE tokenizer trainer (Sennrich et al.
    2016) would perform next. Running it on a candidate corpus before
    fitting a real vocabulary is the standard tokenizer-QA probe: a top
    table full of whitespace-adjacent punctuation or mojibake digraphs
    means the pre-tokenizer (not the model) needs fixing.

    Scale shape — the reason this is cheap at 100 TB: pair counting is
    weighted by WORD FREQUENCY, so the corpus collapses to vocabulary
    grain first (one explode + token-keyed count, map-side combined);
    the quadratic-ish pair explode then runs over |vocab| rows only —
    million-scale, not corpus-scale — and the final (left, right) count
    is over an alphabet² grain. Characters inside a word pair up via one
    Catalyst ``transform(sequence)``, no UDF.

    Output (left_sym, right_sym, pair_count), ordered pair_count DESC
    with (left, right) ASC tiebreak, top ``top_n`` rows with at least
    ``min_pair_count`` weighted occurrences. Extends the ``token_count_bpe``
    family (SURVEY §2 north-star text ops; reference has no text stage).
    """
    vocab = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("__w"))
        .filter(F.length("__w") >= 2)
        .groupBy("__w")
        .agg(F.count("*").alias("__wc"))
    )
    ch = F.split(F.col("__w"), "")
    pairs = vocab.select(
        F.col("__wc"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__w") - 1),
                lambda i: F.struct(
                    F.element_at(ch, i).alias("l"),
                    F.element_at(ch, i + 1).alias("r"),
                ),
            )
        ).alias("__p"),
    )
    return (
        pairs.groupBy(
            F.col("__p.l").alias("left_sym"), F.col("__p.r").alias("right_sym")
        )
        .agg(F.sum("__wc").cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
        .orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(top_n)
    )


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher-style quality rule flags (Rae et al. 2021,
    "Scaling Language Models" appendix A): word-count bounds, mean word
    length band, symbol-to-word ratio (# / …), alphabetic-word fraction,
    and minimum stopword hits. The published rules are line- and
    document-level; this is the document-level subset, parameterized with
    the paper's defaults.

    All five rules are per-row Catalyst expressions over ONE split of the
    text — a single narrow codegen pass with no shuffle and no UDF, the
    shape a 100 TB quality sweep needs (flags then drive a filter or a
    stratified report downstream). Documents with zero words are emitted
    with NULL mean_word_len and fail the word-count rule, rather than
    being silently dropped.

    Output: (id_col, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, n_stopword_hits, six BOOLEAN flags) — ``passes_all``
    is the AND of the five rules."""
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    per = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("__charsum"),
        (
            F.regexp_count(F.col(text_col), F.lit("#"))
            + F.regexp_count(F.col(text_col), F.lit("…|\\.\\.\\."))
        ).cast("long").alias("__symbols"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long").alias(
            "__alpha"
        ),
        _count_in(toks, STOPWORDS).cast("long").alias("n_stopword_hits"),
    )
    nw = F.col("n_words").cast("double")
    mean_len = F.when(
        F.col("n_words") > 0, F.round(F.col("__charsum") / nw, 6)
    )
    sym_ratio = F.when(
        F.col("n_words") > 0, F.round(F.col("__symbols") / nw, 6)
    )
    alpha_frac = F.when(
        F.col("n_words") > 0, F.round(F.col("__alpha") / nw, 6)
    )
    flagged = per.select(
        id_col,
        "n_words",
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        "n_stopword_hits",
        F.col("n_words").between(min_words, max_words).alias("ok_word_count"),
        F.coalesce(
            mean_len.between(min_mean_word_len, max_mean_word_len), F.lit(False)
        ).alias("ok_mean_word_len"),
        F.coalesce(sym_ratio <= max_symbol_ratio, F.lit(False)).alias(
            "ok_symbol_ratio"
        ),
        F.coalesce(alpha_frac >= min_alpha_word_frac, F.lit(False)).alias(
            "ok_alpha_words"
        ),
        (F.col("n_stopword_hits") >= min_stopword_hits).alias("ok_stopwords"),
    )
    return flagged.withColumn(
        "passes_all",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


def vocab_growth(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heaps'-law curve of the corpus: for documents processed in
    ``id_col`` order, the cumulative token count and cumulative distinct
    vocabulary size after each document — the saturation diagnostic run
    before sizing a tokenizer vocabulary or judging whether one more
    crawl snapshot still adds new language.

    Scale shape: "cumulative distinct" is NOT computed as a running set.
    Each token contributes to the vocabulary exactly once, at its
    first-occurrence document, so one token-keyed ``min(id)`` aggregate
    (map-side combined) reduces the corpus to vocab grain; counting
    first occurrences per document gives a per-doc ``n_new_types``, and
    the curve is BOTH running sums in one pass of the shared
    two-pass distributed prefix sum (``curation._running_sum`` — range
    partition + per-partition offsets, never a single global window
    task).

    Output per document: (id_col, n_tokens, cum_tokens, n_new_types,
    vocab_size), ordered by ``id_col``."""
    from .curation import _running_sum

    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    per_doc = docs.select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens")
    )
    firsts = (
        docs.select(
            F.col(id_col).alias("__d"),
            F.explode(tokens_col(F.col(text_col))).alias("__t"),
        )
        .filter(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.min("__d").alias("__first"))
        .groupBy(F.col("__first").alias(id_col))
        .agg(F.count("*").cast("long").alias("n_new_types"))
    )
    base = per_doc.join(firsts, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_new_types", F.lit(0).cast("long")).alias("n_new_types"),
    )
    order = [F.col(id_col).asc()]
    c = _running_sum(base, ["n_tokens", "n_new_types"], order)
    return c.select(
        id_col,
        "n_tokens",
        F.col("__cum_n_tokens").cast("long").alias("cum_tokens"),
        "n_new_types",
        F.col("__cum_n_new_types").cast("long").alias("vocab_size"),
    )  # no trailing sort: per-doc grain is unbounded; the cumulative
    # semantics live in _running_sum's order, not the output order


def tokenizer_fertility(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source tokenizer fertility: BPE-ish pieces per whitespace word
    (the ``\\w+|[^\\w\\s]`` pre-tokenizer of :func:`token_count_bpe` over
    the whitespace words of :func:`text_stats`). Fertility ≈ 1 on clean
    English prose and climbs with punctuation-dense / code / non-Latin
    text — the per-domain cost model for a token budget (a source at
    fertility 1.6 eats 60% more of the budget than its word count
    suggests).

    Two counts per row in one codegen pass, one source-keyed aggregation
    of exact integer sums; fertility divides once per source. Output
    (source, n_docs, n_words, n_pieces, fertility), source ASC."""
    toks = tokens_col(F.col(text_col))
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"\w+|[^\w\s]"), 0
    )
    per = docs.select(
        F.col(source_col).alias("source"),
        F.size(F.filter(toks, lambda t: t != "")).alias("__w"),
        F.size(pieces).alias("__p"),
    )
    g = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__w").cast("long").alias("n_words"),
        F.sum("__p").cast("long").alias("n_pieces"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_words",
        "n_pieces",
        F.round(
            F.col("n_pieces").cast("double") / F.col("n_words").cast("double"), 6
        ).alias("fertility"),
    )  # no trailing sort (per-source grain scales with the corpus)


def distinctive_terms(
    docs: DataFrame,
    k: int = 5,
    min_count: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source distinctive vocabulary: the ``k`` terms most
    over-represented in each source relative to the REST of the corpus,
    ranked by the (+1-smoothed) ODDS RATIO
    ``[(c_s+1)/(n_s−c_s+1)] / [(c_r+1)/(n_r−c_r+1)]`` — the
    corpus-comparison tool (Monroe et al.'s "Fightin' Words" family)
    behind "what does this source talk about that the others don't",
    run before weighting a domain in a pretraining mix.

    log-odds is the usual presentation, but log is monotone, so ranking
    uses the RATIO itself, ppm-scaled and computed as ONE integer
    division over DECIMAL(38,0) products (same libm-free discipline as
    ``collocations``: bit-identical on every engine, no last-ulp tie
    ambiguity; magnitudes stay under 10³⁸ for corpora past 10¹² tokens).

    Scale shape: one explode → (source, term) count with map-side
    combine; term totals and source totals are windows over that
    aggregated grain (one term-keyed exchange — a broadcast of the term
    totals would not hold at web-scale vocabularies — and one
    source-keyed exchange the top-k window reuses); the 1-row corpus
    total broadcasts. Output (source, term, n_source, n_rest, odds_ppm,
    rank), rank 1..k, ties term-ASC."""
    from ..plans.scale import materialize_once

    # the aggregated (source, term) grain feeds the corpus total AND the
    # scored frame; unpinned, the full corpus explode runs twice
    st = materialize_once(
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count("*").alias("__c"))
    )
    w_term = Window.partitionBy("term")
    w_src = Window.partitionBy("source")
    tot = st.agg(F.sum("__c").alias("__n"))
    scored = (
        st.withColumn("__ct", F.sum("__c").over(w_term))
        .withColumn("__ns", F.sum("__c").over(w_src))
        .crossJoin(F.broadcast(tot))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    c_s = F.col("__c")
    c_r = F.col("__ct") - c_s
    n_s = F.col("__ns")
    n_r = F.col("__n") - n_s
    num = dec(c_s + 1) * dec(n_r - c_r + 1) * F.lit(1_000_000).cast("decimal(38,0)")
    den = dec(n_s - c_s + 1) * dec(c_r + 1)
    ranked = (
        scored.filter(c_s >= min_count)
        .withColumn("__num", num.cast("decimal(38,0)"))
        .withColumn("__den", den.cast("decimal(38,0)"))
        .select(
            "source",
            "term",
            c_s.cast("long").alias("n_source"),
            c_r.cast("long").alias("n_rest"),
            F.expr("CAST(__num DIV __den AS BIGINT)").alias("odds_ppm"),
        )
    )
    w_k = Window.partitionBy("source").orderBy(
        F.desc("odds_ppm"), F.asc("term")
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w_k).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy(F.asc("source"), F.asc("rank"))
    )


def langid_confusion(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the corpus's
    declared language labels: per (declared, predicted) cell, the doc
    count and the within-declared-language recall share — the classifier
    QA table that decides whether lang-ID is trustworthy enough to drive
    per-language curation decisions (a strong diagonal says yes; a row
    bleeding into 'unknown' says the marker list misses that language's
    register).

    One scan-local scoring pass (``lang_id`` with the label riding the
    same scan — no id re-join), one (declared, predicted)-keyed count
    with map-side combine, one window over the tiny cell grain for the
    row totals. Output (lang_col, predicted_lang, n_docs, recall),
    declared/predicted ASC."""
    p = lang_id(docs, text_col=text_col, id_col=id_col, keep=(lang_col,))
    g = p.groupBy(lang_col, "predicted_lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy(lang_col)
    return g.select(
        lang_col,
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 6
        ).alias("recall"),
    ).orderBy(F.asc(lang_col), F.asc("predicted_lang"))


def skipgram_pmi(
    docs: DataFrame,
    window: int = 3,
    k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram co-occurrence mining — :func:`collocations` generalized
    from adjacent bigrams to UNORDERED token pairs within a ±``window``
    position distance (the word2vec-era context statistic; adjacent-only
    PMI misses "new ... york-style" constructions).

    Scoring is the same libm-free exact-integer estimator as
    collocations: ``score_ppm = (c_ab · n_tokens · 10⁶) DIV (c_a · c_b)``
    accumulated in DECIMAL(38,0) — hash-identical on any engine. Pairs
    are canonicalized (least, greatest) so each co-occurrence counts once
    regardless of direction.

    Scale shape: the pair stream is built as ``window`` zip_with'd
    shifted slices concatenated in-row (plain codegen — the r7 lesson:
    HOF `transform` lambdas run interpreted, zip_with's struct lambda
    does not) and exploded ONCE; the (a, b)-keyed count map-side combines
    to the vocab²-bounded grain. Unigram counts come from a second,
    pair-free explode — unlike collocations the pair stream here is
    ``window``× the corpus, so the slim unigram re-scan is the cheaper
    spelling. Output (token_a, token_b, n_pair, score_ppm), top-k via
    TakeOrdered."""
    toks = docs.select(tokens_col(F.col(text_col)).alias("__toks"))
    parts = []
    for d in range(1, window + 1):
        rhs = F.slice(
            F.col("__toks"), d + 1, F.greatest(F.size("__toks") - d, F.lit(0))
        )
        parts.append(
            # raw (a, b) here — least/greatest SKIP nulls, so canonicalizing
            # before the null filter would turn every zip_with-padded tail
            # pair into a spurious (a, a) self-pair
            F.zip_with(
                F.col("__toks"),
                rhs,
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        )
    pairs = (
        toks.select(F.explode(F.concat(*parts)).alias("__p"))
        .filter(
            F.col("__p.b").isNotNull()
            & (F.col("__p.a") != "")
            & (F.col("__p.b") != "")
        )
        .select(
            F.least("__p.a", "__p.b").alias("__a"),
            F.greatest("__p.a", "__p.b").alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    uni = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.count("*").alias("__c"))
    )
    total = uni.agg(F.sum("__c").cast("decimal(38,0)").alias("__n"))
    ca = uni.select(F.col("__t").alias("__a"), F.col("__c").alias("__ca"))
    cb = uni.select(F.col("__t").alias("__b"), F.col("__c").alias("__cb"))
    num = (
        F.col("n_pair").cast("decimal(38,0)")
        * F.col("__n")
        * F.lit(1_000_000).cast("decimal(38,0)")
    )
    den = F.col("__ca").cast("decimal(38,0)") * F.col("__cb").cast("decimal(38,0)")
    return (
        pairs.join(ca, "__a")
        .join(cb, "__b")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("__a").alias("token_a"),
            F.col("__b").alias("token_b"),
            "n_pair",
            num.cast("decimal(38,0)").alias("__num"),
            den.cast("decimal(38,0)").alias("__den"),
        )
        .select(
            "token_a",
            "token_b",
            "n_pair",
            F.expr("CAST(__num DIV __den AS BIGINT)").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), F.asc("token_a"), F.asc("token_b"))
        .limit(k)
    )


def token_coverage_topk(
    docs: DataFrame,
    ks: tuple[int, ...] = (10, 100, 1000),
    text_col: str = "text",
) -> DataFrame:
    """Head-coverage curve: what share of ALL token occurrences the top-k
    most frequent tokens cover, for each k — the number that sizes a
    tokenizer's vocabulary and predicts OOV rates (English head coverage:
    top-100 words ≈ half the corpus). Output one row per k:
    (k, covered_tokens, total_tokens, coverage), coverage a single
    exact-integer division rounded to 6.

    Scale shape: ONE token-keyed count (map-side combined, vocab grain,
    materialized once), ONE TakeOrderedAndProject of the top-``max(ks)``
    rows (count DESC, token ASC — a total order, so ties are
    engine-stable) whose single-partition rank window is bounded by
    ``max(ks)`` BY CONSTRUCTION, then every k's sum as a conditional
    aggregate over that one tiny frame (stack-unpivoted) — two jobs
    total regardless of how many k's, vs one TakeOrdered job per k in
    the naive spelling; no global sort, no vocab broadcast."""
    from ..plans.scale import materialize_once

    counts = materialize_once(
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.count("*").alias("__c"))
    )
    total = counts.agg(F.sum("__c").cast("long").alias("total_tokens"))
    top = counts.orderBy(F.desc("__c"), F.asc("__t")).limit(max(ks))
    w = Window.orderBy(F.desc("__c"), F.asc("__t"))  # ≤ max(ks) rows: bounded
    ranked = top.withColumn("__r", F.row_number().over(w))
    agg = ranked.agg(
        *[
            F.coalesce(F.sum(F.when(F.col("__r") <= k, F.col("__c"))), F.lit(0))
            .cast("long")
            .alias(f"__cov_{k}")
            for k in ks
        ]
    )
    stack = F.expr(
        "stack({n}, {args}) as (k, covered_tokens)".format(
            n=len(ks),
            args=", ".join(f"CAST({k} AS BIGINT), __cov_{k}" for k in ks),
        )
    )
    return agg.select(stack).crossJoin(F.broadcast(total)).select(
        "k",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.col("covered_tokens") / F.col("total_tokens").cast("double"), 6
        ).alias("coverage"),
    )
