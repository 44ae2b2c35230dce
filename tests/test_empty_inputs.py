"""Empty-input hardening: every major operator must return an EMPTY frame
with its normal schema (not raise) on zero-row input — the behavior a
production pipeline needs when a partition, day, or filter comes up empty.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture()
def empty_events(spark):
    return spark.createDataFrame(
        [],
        "visitorid long, event string, event_time timestamp, itemid long, "
        "event_id long, value double",
    )


@pytest.fixture()
def empty_embeddings(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def test_analytics_on_empty_events(spark, empty_events):
    from clickestream_project_bigdata_spark.operators import analytics
    from clickestream_project_bigdata_spark.operators.sessionize import (
        session_metrics,
        sessionize,
    )

    assert session_metrics(sessionize(empty_events)).count() == 0
    assert analytics.events_per_minute(empty_events).count() == 0
    assert analytics.bounce_rate(empty_events).count() == 0
    assert analytics.top_k_items_per_minute(empty_events).count() == 0
    # NB Spark returns ZERO rows for CUBE over empty input (no grand-total
    # row); ANSI engines may emit one for the () grouping set — documented
    # divergence, only observable on fully-empty input
    assert analytics.events_cube(empty_events).count() == 0
    assert analytics.value_histogram(empty_events).count() == 0
    assert analytics.rolling_active_users(empty_events).count() == 0
    assert analytics.latest_event_state(empty_events).count() == 0
    # global aggregates return one row of zero/null counts
    [p] = analytics.profile_events(empty_events).collect()
    assert p.n_rows == 0


def test_text_and_curation_on_empty_docs(spark, empty_docs):
    from clickestream_project_bigdata_spark.operators import curation, text

    assert text.text_stats(empty_docs).count() == 0
    assert text.lang_id(empty_docs).count() == 0
    assert text.tfidf_top_terms(empty_docs).count() == 0
    assert text.repetition_score(empty_docs).count() == 0
    assert text.chunk_documents(empty_docs).count() == 0
    assert text.similar_docs_topk(empty_docs, query_id=0).count() == 0
    assert curation.stratified_sample(empty_docs, 0.5).count() == 0
    assert curation.stratified_fixed_k(empty_docs, 5).count() == 0
    assert curation.split_corpus(empty_docs).count() == 0
    assert curation.temperature_sample(empty_docs).count() == 0
    assert curation.redact_pii(empty_docs).count() == 0
    assert curation.pack_sequences(empty_docs).count() == 0
    assert curation.pack_corpus_text(empty_docs).count() == 0
    assert curation.corpus_stats(empty_docs).count() == 0


def test_dedup_similarity_on_empty(spark, empty_docs, empty_embeddings):
    from clickestream_project_bigdata_spark.operators import dedup, similarity

    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.dedup_keep_first(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0
    assert similarity.normalize_embeddings(empty_embeddings).count() == 0
    assert similarity.quantize_embeddings(empty_embeddings).count() == 0
    assert similarity.label_centroids(empty_embeddings).count() == 0
    assert similarity.brute_force_topk(empty_embeddings, query_id=0).count() == 0
    assert similarity.knn_join(empty_embeddings).count() == 0


def test_null_text_documents_flow_through(spark):
    """NULL text must not crash any text-path operator: stats come back
    NULL (so quality filters drop the doc — comparisons with NULL are
    false), gram/chunk ops emit nothing for the doc, dedup keeps it as its
    own group."""
    from clickestream_project_bigdata_spark.operators import curation, dedup, text

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    stats = {r.doc_id: r.quality_score for r in text.text_stats(docs).collect()}
    assert stats[1] is not None and stats[2] is None
    assert text.chunk_documents(docs).filter("doc_id = 2").count() == 0
    assert text.repetition_score(docs).filter("doc_id = 2").count() == 1
    assert curation.redact_pii(docs).count() == 2
    # keep-first dedup: NULL text neither merges with nor displaces real docs
    assert dedup.dedup_keep_first(docs).count() == 2


def test_driver_contract_keys_aligned():
    """Every queries() entry has an oracle_sql() twin and vice versa — the
    correctness gate covers the WHOLE query surface (a query added without
    its oracle would silently skip the value-hash check)."""
    import __spark_entry__ as e

    q, o = set(e.queries()), set(e.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_round6_operators_on_empty_inputs(spark, empty_events, empty_docs, empty_embeddings):
    from clickestream_project_bigdata_spark.operators import analytics, dedup, similarity, text

    assert analytics.minute_anomalies(empty_events).count() == 0
    assert analytics.item_trend(empty_events).count() == 0
    assert analytics.concurrent_sessions(empty_events).count() == 0
    assert analytics.bot_flags(empty_events).count() == 0
    # timed_funnel aggregates to a single zero row even on empty input
    row = analytics.timed_funnel(empty_events).collect()[0]
    assert (row.users_step1, row.users_step2, row.users_step3) == (0, 0, 0)
    assert text.vocab_coverage(empty_docs).count() == 0
    assert dedup.incremental_dedup(empty_docs, empty_docs).count() == 0
    assert similarity.nearest_centroid_classify(empty_embeddings).count() == 0


def test_round6_latest_ops_on_empty_docs(spark, empty_docs):
    from clickestream_project_bigdata_spark.operators.curation import (
        select_token_budget,
        shuffle_shards,
    )
    from clickestream_project_bigdata_spark.operators.dedup import (
        mask_duplicate_spans,
    )
    from clickestream_project_bigdata_spark.operators.text import (
        collocations,
        rare_bigram_rate,
        text_stats,
        type_token_ratio,
    )

    assert mask_duplicate_spans(empty_docs).count() == 0
    assert collocations(empty_docs).count() == 0
    assert type_token_ratio(empty_docs).count() == 0
    assert rare_bigram_rate(empty_docs).count() == 0
    assert shuffle_shards(empty_docs).count() == 0
    assert select_token_budget(text_stats(empty_docs), 1000).count() == 0
    # schemas survive emptiness
    assert set(mask_duplicate_spans(empty_docs).columns) == {
        "doc_id", "n_tokens", "n_masked_tokens", "cleaned_digest"
    }
    assert set(shuffle_shards(empty_docs).columns) == {
        "doc_id", "shard", "pos_in_shard"
    }


def test_round6_latest_relational_on_empty(spark):
    from clickestream_project_bigdata_spark.operators.relational import (
        potential_part_promotion,
    )

    lineitem = spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [], "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    )
    supplier = spark.createDataFrame(
        [], "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
    )
    nation = spark.createDataFrame(
        [], "n_nationkey long, n_name string, n_regionkey long"
    )
    assert potential_part_promotion(lineitem, part, supplier, nation).count() == 0


def test_round6_final_operators_on_empty_inputs(
    spark, empty_events, empty_docs, empty_embeddings
):
    """The round-6-final nine: empty in → empty (or single all-NULL
    aggregate row where the operator is a global aggregate) — never an
    error."""
    from clickestream_project_bigdata_spark.operators import (
        analytics,
        similarity,
        text,
    )
    from clickestream_project_bigdata_spark.operators.graph import (
        transition_entropy,
    )

    assert analytics.audience_overlap(empty_events).count() == 0
    assert analytics.burstiness(empty_events).count() == 0
    assert analytics.novelty_rate(empty_events).count() == 0
    assert transition_entropy(empty_events).count() == 0
    assert similarity.norm_profile(empty_embeddings).count() == 0
    assert similarity.cluster_inertia(empty_embeddings).count() == 0
    assert text.source_vocab_overlap(empty_docs).count() == 0

    # global aggregates return their one row with NULL metrics
    z = analytics.zipf_slope(empty_events).collect()
    assert len(z) == 1 and z[0].slope is None
    g = analytics.gini_concentration(empty_events).collect()
    assert len(g) == 1 and g[0].gini is None


def test_round7_operators_on_empty_inputs(
    spark, empty_events, empty_docs, empty_embeddings
):
    from clickestream_project_bigdata_spark.operators import (
        analytics,
        curation,
        relational,
        similarity,
        text,
    )

    assert text.bpe_merge_step(empty_docs).count() == 0
    assert text.vocab_growth(empty_docs).count() == 0
    assert text.gopher_quality_flags(empty_docs).count() == 0
    assert text.tokenizer_fertility(empty_docs).count() == 0
    assert text.token_length_distribution(empty_docs).count() == 0
    assert text.char_entropy(empty_docs).count() == 0
    assert text.readability_scores(empty_docs).count() == 0
    assert curation.domain_balance_weights(empty_docs).count() == 0
    assert similarity.embedding_outliers(empty_embeddings).count() == 0
    assert similarity.embedding_dim_stats(empty_embeddings).count() == 0
    assert relational.scd2_history(empty_events).count() == 0
    assert analytics.first_touch_funnel(empty_events).count() == 0
    assert analytics.decay_attribution(empty_events).count() == 0
