"""Degenerate-input robustness: empty tables, whitespace-only documents,
single-row groups — operators must return empty/valid results, not throw."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdutils_spark.operators.calendar import calendar, calendar_long
from gdutils_spark.operators.dedup import (
    exact_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from gdutils_spark.operators.summaries import daily_stats, entity_summaries
from gdutils_spark.operators.text import lang_id, text_stats, token_counts

EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("entity", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)
DOCS = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


@pytest.fixture()
def empty_events(spark):
    return spark.createDataFrame([], EVENTS)


@pytest.fixture()
def weird_docs(spark):
    return spark.createDataFrame(
        [
            (1, ""),  # empty
            (2, "   "),  # whitespace only
            (3, "one"),  # below shingle size
            (4, "exactly three tokens"),  # == shingle size
            (5, "a b c d e f g h"),
        ],
        DOCS,
    )


def test_calendar_on_empty(empty_events):
    assert calendar(empty_events, "ts", "ymd", "count").collect() == []
    assert calendar_long(empty_events, "ts", "ym", "count").collect() == []


def test_summaries_on_empty(empty_events):
    assert entity_summaries(empty_events, "entity", "ts").collect() == []
    assert daily_stats(empty_events, "ts").collect() == []


def test_single_row_summary(spark):
    one = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "x", 1.0, 2.0)], EVENTS
    )
    row = entity_summaries(one, "entity", "ts").collect()[0]
    assert row["num_profiles"] == 1
    assert row["days"] == 0  # ceil(0/86400)
    assert row["deployment_lat"] == 1.0


def test_dedup_ops_on_weird_docs(weird_docs):
    # exact dedup sees all 5 docs (empty string is a valid fingerprint key)
    assert exact_duplicates(weird_docs).agg(F.sum("n_docs")).collect()[0][0] == 5
    # docs with < 3 tokens produce no shingles → no signatures, no pairs
    sigs = minhash_signatures(weird_docs)
    assert {r["doc"] for r in sigs.select("doc").collect()} == {4, 5}
    assert ngram_jaccard_pairs(weird_docs).count() == 0
    # simhash handles the empty-token docs (split('') -> [''])
    assert simhash(weird_docs).count() == 5


def test_text_ops_on_weird_docs(weird_docs):
    stats = {r["doc_id"]: r for r in text_stats(weird_docs).collect()}
    assert stats[1]["n_chars"] == 0
    assert stats[1]["punct_ratio"] is None  # 0 chars → NULL, not an error
    # split('') yields [''] in Spark AND DuckDB: token ratios stay defined
    assert stats[1]["n_tokens"] == 1 and stats[1]["stopword_ratio"] == 0.0
    counts = {r["doc_id"]: r for r in token_counts(weird_docs).collect()}
    assert counts[1]["n_ws_tokens"] == 0
    assert counts[2]["n_ws_tokens"] == 0
    assert counts[4]["n_ws_tokens"] == 3
    assert counts[4]["n_bpe_tokens"] == 3
    langs = {r["doc_id"]: r["lang_guess"] for r in lang_id(weird_docs).collect()}
    assert langs[1] == "und" and langs[3] == "und"


def test_geojson_on_empty(empty_events):
    from gdutils_spark.sinks.geojson import track_geojson

    assert track_geojson(empty_events, "entity", time_col="ts").collect() == []


def test_round5_ops_on_weird_docs(weird_docs, spark):
    """Empty/whitespace/short docs through every round-5 text/dedup
    operator: no crashes, and the degenerate-document conventions hold
    (split('') -> [''] gives a single empty segment; token ops drop
    empty tokens; sketches/splits assign every doc)."""
    from pyspark.sql import functions as F

    from gdutils_spark.operators.dedup import leakage_safe_split
    from gdutils_spark.operators.sketches import hll_report
    from gdutils_spark.operators.text import (
        compression_signals,
        remove_common_segments,
        token_rarity,
        unigram_logprob,
    )

    seg = {r.doc: r for r in remove_common_segments(weird_docs, width=2).collect()}
    assert set(seg) == {1, 2, 3, 4, 5}
    assert seg[1].n_segs == 1 and seg[1].cleaned_text == ""  # [''] segment
    assert seg[4].cleaned_text == "exactly three tokens"

    rar = {r.doc for r in token_rarity(weird_docs).collect()}
    assert rar == {3, 4, 5}  # empty-token docs drop out, don't crash
    lp = {r.doc for r in unigram_logprob(weird_docs).collect()}
    assert lp == rar

    comp = {r.doc: r for r in compression_signals(weird_docs).collect()}
    assert comp[1].zlib_ratio is None and comp[5].zlib_ratio > 0

    no_pairs = spark.createDataFrame([], "d1 long, d2 long")
    split = leakage_safe_split(weird_docs, no_pairs)
    assert split.count() == 5 and split.where(F.col("split").isNull()).count() == 0

    hll = hll_report(
        weird_docs.select(F.lit("g").alias("g"), F.col("text")), "text", "g"
    ).collect()[0]
    assert hll.n_exact == 5
