"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference extensions (BASELINE.json north star): language-ID
heuristic, quality scoring, token counting, document fingerprinting. All are
pure Catalyst expressions — array/lambda functions evaluate inside
whole-stage codegen, so these run JVM-side at full scan speed with no
Python in the hot path. At 100 TB each is an embarrassingly parallel map
over the documents scan: no shuffle at all.

Determinism note: every ratio/score derives from exact integer counts, so
Spark and any SQL oracle produce bit-identical doubles.

One deliberate exception to "pure Catalyst": :func:`compression_signals`
shells out to zlib (Arrow-batched ``mapInPandas``) because its whole
point is the DEFLATE model itself — no SQL engine replays it, so it is
pytest-verified (deterministic: zlib level 6 output is stable for a
given input) rather than oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed marker vocabularies for the lang-id heuristic; order is the
# tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}

STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def kgram(arr: Column, i: Column, k: int) -> Column:
    """The space-joined k-token window of ``arr`` starting at 0-based
    position ``i`` — the ONE shingle-text expression shared by
    :func:`substring_sites` and ``dedup.cosine_tf_pairs``, so the
    window arithmetic (and any future fix to it) can't drift between
    the shingle consumers. Caller contract: ``arr`` must be a
    materialized projection attribute (interpreted-HOF O(n²) guard,
    cf. :func:`repetition_signals`)."""
    return F.array_join(F.slice(arr, i + 1, k), " ")


def _stage(frame, stage_path):
    """The staging convention shared by every multi-consumer table in
    this module: land the frame in parquet once, hand every downstream
    consumer the staged scan (Spark plans no subtree reuse, so the
    unstaged alternative re-derives the corpus per consumer)."""
    frame.write.mode("overwrite").parquet(stage_path)
    return frame.sparkSession.read.parquet(stage_path)


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def _count_in(toks: Column, vocab: tuple[str, ...]) -> Column:
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(toks, lambda x: F.array_contains(vocab_arr, x)))


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document token/char/punctuation/stopword statistics + a quality
    score. One projection over the scan — no shuffle. ``keep_cols`` are
    carried through unchanged, so a quality GATE composes as a plain
    filter on this projection instead of a corpus-vs-corpus join back
    onto the source (the doc_corpus_pipeline composition relies on it:
    one consumer of the upstream stage, not two). Names colliding with
    the stats columns raise (rename before the call — a silent
    duplicate column would poison every downstream reference)."""
    _stat_names = {
        id_col, "n_chars", "n_tokens", "avg_token_len", "n_punct",
        "punct_ratio", "n_stopwords", "stopword_ratio", "quality_score",
    }
    bad = [c for c in keep_cols if c in _stat_names]
    if bad:
        raise ValueError(
            f"text_stats: keep_cols {bad} collide with stats output "
            "columns; rename them before the call"
        )
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    token_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    n_stop = _count_in(toks, STOPWORDS)
    # try_divide: empty documents (0 tokens / 0 chars) get NULL ratios
    # instead of an ANSI division-by-zero error
    avg_token_len = F.try_divide(token_chars.cast("double"), n_tokens)
    stop_ratio = F.try_divide(n_stop.cast("double"), n_tokens)
    punct_ratio = F.try_divide(n_punct.cast("double"), n_chars)
    # Quality heuristic: reward stopword presence and moderate token length,
    # penalize punctuation soup. All terms derive from exact ints.
    quality = (
        F.lit(0.5) * stop_ratio
        + F.lit(0.5)
        * F.when((avg_token_len >= 3) & (avg_token_len <= 10), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        - punct_ratio
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
        *[F.col(c) for c in keep_cols],
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language-ID heuristic. Deterministic: first language
    (in LANG_MARKERS order) with the max marker count wins; all-zero → 'und'.

    At scale: pure map — language scoring never shuffles.
    """
    toks = tokens(F.col(text_col))
    scores = {lang: _count_in(toks, vocab) for lang, vocab in LANG_MARKERS.items()}
    langs = list(scores)
    # Sequential CASE: lang L wins if its score is positive and >= every
    # later lang's score (earlier langs already failed their branch), so
    # ties resolve to the earlier language. Mirrors a plain SQL CASE.
    guess = None
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        guess = F.when(cond, F.lit(lang)) if guess is None else guess.when(
            cond, F.lit(lang)
        )
    guess = guess.otherwise(F.lit("und"))
    out = [F.col(id_col)]
    out += [scores[lang].alias(f"score_{lang}") for lang in langs]
    out.append(guess.alias("lang_guess"))
    return df.select(*out)


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace-normalized md5 fingerprint — the exact-dedup key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


# BPE-ish pre-tokenizer: letter runs are one token, each digit is its own
# token, every other non-space char is its own token. Simple enough that
# Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

ROLL_BASE = 31
ROLL_MOD = 2147483647  # 2^31-1: keeps acc*31 + 60-bit token hash inside int64


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts per document.

    ``regexp_count`` is a codegen'd scan-side expression — at 100 TB this
    is a pure map with the projection pushed to the parquet reader.
    """
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive polynomial rolling hash over whitespace tokens:
    ``h = (h * 31 + md5int60(token)) mod (2^31-1)``.

    Unlike the unordered md5 fingerprint, token *order* matters — two
    documents with the same bag of words but different order get
    different fingerprints. O(tokens) per doc, no shuffle; modulus keeps
    every intermediate exact in int64 so any engine reproduces it.
    """
    toks = tokens(F.col(text_col))
    hashes = F.transform(
        toks, lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
    )
    roll = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_BASE + x) % ROLL_MOD,
    )
    return df.select(F.col(id_col), roll.alias("rolling_fp"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunking — the standard pre-training /
    RAG splitter: fixed ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap``, a shorter final chunk allowed, empty
    docs emit no chunks.

    Pure Catalyst: tokenization, window starts (``sequence``) and window
    slices (``slice`` + ``array_join``) all run inside whole-stage
    codegen, and the explode is map-side — at 100 TB this is a
    scan-shaped stage with no shuffle, the same cost profile as the
    shingle explode in dedup.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # drop pure-overlap tails: a window must contribute at least one
    # token past the previous window's coverage (start + overlap < n),
    # else the final chunk would be a redundant sub-span of its
    # predecessor (found by the reconstruction property test)
    starts = F.when(
        F.length(F.trim(F.col(text_col))) > 0,
        F.filter(
            F.sequence(F.lit(0), n - 1, F.lit(step)),
            lambda s: (s == 0) | (s + overlap < n),
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    stage_path: str | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    The idf uses a ratio form, ``tf · (N+1)/(df+1)``, computed as exactly
    two IEEE-754 double ops over exact integer counts — bit-identical in
    any engine (a log-based idf would hash-diverge on the last ulp
    between libm implementations, and the ranking it induces per
    document is the same). Ties break on the term string.

    Plan shape: one explode + two hash aggregates (term-per-doc tf, then
    term df) + a shuffle join on term + a per-doc window. The df table is
    vocabulary-sized; at 100 TB the join key (term) is the natural
    partitioning and AQE broadcast-decides the df side when the
    vocabulary is small.

    The tf table has three consumers (the score join, the
    document-frequency aggregate, and — without staging — each
    re-derives the corpus explode: Spark plans no automatic subtree
    reuse across them, so the unstaged plan scans and explodes the
    corpus per consumer. ``stage_path`` writes tf to parquet once and
    reads it back for every consumer — at 100 TB the staged plan pays
    ONE corpus explode plus two scans of the (much smaller) tf table.
    Same convention as the dedup/similarity ``stage_path`` options;
    results are identical either way (test-pinned).
    """
    from pyspark.sql import Window

    ndocs = df.select(F.count_distinct(F.col(id_col)).alias("_n"))
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if stage_path is not None:
        tf = _stage(tf, stage_path)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf"),
            F.col("df"),
            (
                F.col("tf").cast("double")
                * (
                    (F.col("_n") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# PII patterns kept to syntax Java regex (Spark) and RE2 (DuckDB) evaluate
# identically: plain character classes + bounded quantifiers, no
# lookaround, no backrefs.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_PATTERN = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
SSN_PATTERN = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
# 16-digit card in 4-4-4-4 groups, dash or space separated
CARD_PATTERN = r"[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}"


def luhn_valid(card: Column) -> Column:
    """Luhn checksum over a 16-digit card candidate — pure Catalyst.

    Strips separators, then sums the 16 digits with every second digit
    from the right doubled (digits past 9 fold back by -9); valid iff the
    total is ≡ 0 (mod 10). Fixed 16-term unrolled arithmetic: stays in
    whole-stage codegen, trivially reproducible in any SQL engine.
    """
    from functools import reduce as _reduce

    digits = F.regexp_replace(card, r"[^0-9]", "")
    terms = []
    for i in range(1, 17):
        d = F.substring(digits, i, 1).cast("int")
        if i % 2 == 1:
            # odd left position in a 16-digit number = even position from
            # the right = the doubled lane
            terms.append(F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
        else:
            terms.append(d)
    total = _reduce(lambda a, b: a + b, terms)
    return (F.length(digits) == 16) & (total % 10 == 0)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + redaction: per-document counts of emails, phone
    numbers, IPv4 literals, SSNs and Luhn-valid card numbers, plus the
    text with each occurrence replaced by a typed tag — the standard
    pre-training redaction pass.

    Count semantics: every ``n_*`` count is a detection over the
    ORIGINAL text, while redaction is sequential
    (email → card → SSN → phone → IP), so a pattern nested inside an
    earlier match (a phone inside an email's local part) is counted but
    produces no tag of its own — counts can exceed tags emitted. Card
    redaction is shape-based (any 4-4-4-4 group is masked — for PII,
    over-redaction is the safe direction) while ``n_cards_luhn`` counts
    only candidates passing the Luhn checksum, so downstream filters can
    distinguish real card numbers from coincidental digit runs.

    Pure map work: ``regexp_count``/``regexp_replace`` and the unrolled
    Luhn arithmetic are codegen'd scan-side expressions, so at 100 TB
    this is scan-bandwidth-bound with the projection pushed to the
    parquet reader, and it composes with quality filtering and dedup
    into a single stage.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_PATTERN))
    n_phones = F.regexp_count(t, F.lit(PHONE_PATTERN))
    n_ips = F.regexp_count(t, F.lit(IPV4_PATTERN))
    n_ssns = F.regexp_count(t, F.lit(SSN_PATTERN))
    cards_all = F.regexp_extract_all(t, F.lit(CARD_PATTERN), 0)
    replaced = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
                    CARD_PATTERN,
                    "<CARD>",
                ),
                SSN_PATTERN,
                "<SSN>",
            ),
            PHONE_PATTERN,
            "<PHONE>",
        ),
        IPV4_PATTERN,
        "<IP>",
    )
    # clean-document short-circuit: the detection counts are needed for
    # the output anyway, so documents with zero matches (the common case
    # in a real corpus) skip all five replace passes — identical result,
    # ~half the regex work per clean row
    any_pii = (n_emails + n_phones + n_ips + n_ssns + F.size(cards_all)) > 0
    scrubbed = F.when(any_pii, replaced).otherwise(t)
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        n_ssns.alias("n_ssns"),
        F.size(F.filter(cards_all, luhn_valid)).alias("n_cards_luhn"),
        scrubbed.alias("scrubbed"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_n: int = 5,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", §A1.1), adapted to line-free text: the
    duplicate-line measures become duplicate word-``dup_n``-gram
    measures, and the top-2-gram fraction keeps its original form.

    Per document:

    * ``top_bigram_n`` / ``n_bigrams`` / ``top_bigram_frac`` — the most
      frequent word 2-gram's share of all 2-gram occurrences; NULL when
      the document has fewer than two tokens.
    * ``dup_ngram_frac`` — fraction of ``dup_n``-gram occurrences that
      are repeats (``1 − distinct/total``); NULL when the document has
      fewer than ``dup_n`` tokens.

    Plan shape (r15, guide §4.2 — VERDICT r14 item 7): the
    TOKENIZATION stays JVM-side (``lower`` / ``trim`` / ``\\s+``
    normalize / split — its unicode and null semantics were pinned by
    the r13 fixture hunt and must not be re-derived in Python), and the
    per-document gram counting runs in ONE Arrow-batched ``mapInPandas``
    over ``(id, tokens)`` — no explode, no aggregate, NO SHUFFLE at
    all. The former formulation built both gram arrays with interpreted
    higher-order functions (CodegenFallback) and paid two doc-keyed
    hash-aggregate exchanges; this one is a single map pass whose
    per-row work is C-speed ``Counter``/``set`` counting, strictly
    better at 100 TB (measured 0.4× at sf0.1, rows bit-identical —
    differential-tested against the HOF formulation in
    tests/test_pipeline_ops.py). Output rows map 1:1 to input rows
    (doc ids unique by contract — the same assumption the SQL replay's
    LEFT JOIN makes; the old groupBy formulation would have merged
    duplicate ids instead).
    """
    t = F.col(text_col)
    ws = F.split(F.lower(F.trim(F.regexp_replace(t, r"\s+", " "))), " ")
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_tokens int, top_bigram_n bigint, "
        "n_bigrams bigint, top_bigram_frac double, dup_ngram_frac double"
    )

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids, nt, top, nbi, tf, dupf = [], [], [], [], [], []
            for did, w in zip(pdf["_id"], pdf["_ws"]):
                ids.append(did)
                if w is None:
                    # NULL text: NULL n_tokens, 0 bigrams (the old
                    # sum(coalesce) semantics), NULL fractions
                    nt.append(None)
                    top.append(None)
                    nbi.append(0)
                    tf.append(None)
                    dupf.append(None)
                    continue
                w = list(w)
                n = len(w)
                nt.append(n)
                if n >= 2:
                    c = Counter(zip(w, w[1:]))
                    tb = max(c.values())
                    total = n - 1
                    top.append(tb)
                    nbi.append(total)
                    # same single IEEE division as the old
                    # try_divide(double(top), double(n_bigrams))
                    tf.append(tb / total)
                else:
                    top.append(None)
                    nbi.append(0)
                    tf.append(None)
                if n >= dup_n:
                    tot = n - dup_n + 1
                    dist = len(set(zip(*(w[i:] for i in range(dup_n)))))
                    dupf.append((tot - dist) / tot)
                else:
                    dupf.append(None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_tokens": pd.array(nt, dtype="Int32"),
                    "top_bigram_n": pd.array(top, dtype="Int64"),
                    "n_bigrams": pd.array(nbi, dtype="Int64"),
                    "top_bigram_frac": pd.array(tf, dtype="Float64"),
                    "dup_ngram_frac": pd.array(dupf, dtype="Float64"),
                }
            )

    # project to exactly (id, tokens) before the opaque map (guide §4.1:
    # Spark cannot prune columns through mapInPandas)
    base = df.select(F.col(id_col).alias("_id"), ws.alias("_ws"))
    return base.mapInPandas(op, schema)


def source_quality_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
    min_quality: float = 0.25,
) -> DataFrame:
    """Per-(source, lang) corpus health rollup — the triage report a
    crawl-curation pipeline runs before deciding which sources to keep:
    document and character volume, exact-duplicate rate (distinct
    whitespace-normalized md5 fingerprints vs docs), and the
    low-quality-document count under the :func:`text_stats` score.

    Every output derives from exact integer counts plus one final
    division, so any engine reproduces the doubles bit-for-bit (no
    averaging of per-row doubles, whose summation order would be
    partition-dependent). One hash aggregate over the scan: the
    fingerprint and quality score are scan-side projections, and
    ``count_distinct`` carries the dedup key through the same shuffle.
    """
    t = F.col(text_col)
    norm_fp = F.md5(F.lower(F.trim(F.regexp_replace(t, r"\s+", " "))))
    toks = tokens(t)
    n_tokens = F.size(toks)
    token_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    n_chars = F.length(t)
    avg_token_len = F.try_divide(token_chars.cast("double"), n_tokens)
    stop_ratio = F.try_divide(_count_in(toks, STOPWORDS).cast("double"), n_tokens)
    punct_ratio = F.try_divide(
        (n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))).cast("double"),
        n_chars,
    )
    quality = (
        F.lit(0.5) * stop_ratio
        + F.lit(0.5)
        * F.when((avg_token_len >= 3) & (avg_token_len <= 10), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        - punct_ratio
    )
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        n_chars.alias("_chars"),
        norm_fp.alias("_fp"),
        quality.alias("_q"),
    )
    return (
        base.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
            F.count_distinct(F.col("_fp")).alias("n_distinct"),
            F.count(F.when(F.col("_q") < min_quality, 1)).alias("n_low_quality"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_chars",
            F.try_divide(F.col("total_chars").cast("double"), F.col("n_docs")).alias(
                "avg_chars"
            ),
            (
                F.lit(1.0)
                - F.try_divide(
                    F.col("n_distinct").cast("double"), F.col("n_docs")
                )
            ).alias("dup_rate"),
            "n_low_quality",
        )
    )


def bm25_rank(
    df: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 100,
) -> DataFrame:
    """BM25 keyword retrieval over the corpus for a literal term set:
    score every document against the query and return the ``top_k``
    (ties → lowest id). The idf uses the RATIO form ``(N − df + 0.5) /
    (df + 0.5)`` — the log of the classic formula is monotone, so the
    per-term ranking is identical, while staying a fixed-order IEEE
    expression over exact integer counts (a libm ``log`` would
    hash-diverge between engines on the last ulp; same trade as
    :func:`tf_idf_top_terms`).

    Plan shape: one projection computes per-document length and per-term
    tf (the term list is a literal, so tf columns unroll into codegen —
    no explode, no vocabulary join); a 1-row aggregate collects N,
    total length, and per-term document frequencies and broadcasts back;
    the score is a pure map; the only shuffle is the final top-k sort,
    which AQE executes as a partial TakeOrdered. At 100 TB this is one
    scan + a k-row result.
    """
    if not terms:
        raise ValueError("bm25_rank needs at least one query term")
    toks = tokens(F.col(text_col))

    def _tf(term: str) -> Column:
        # factory scope pins `term`; a default-arg capture would give the
        # lambda two parameters and PySpark would bind the second to the
        # ELEMENT INDEX (the (x, i) higher-order form)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    proj = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = proj.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_tdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = proj.crossJoin(F.broadcast(stats))
    avgdl = F.col("_tdl").cast("double") / F.col("_n").cast("double")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * (F.col("dl").cast("double") / avgdl)
    )
    scores = []
    for i in range(len(terms)):
        tf_d = F.col(f"_tf{i}").cast("double")
        idf = (
            (F.col("_n") - F.col(f"_df{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"_df{i}").cast("double") + F.lit(0.5))
        scores.append(idf * (tf_d * F.lit(float(k1) + 1.0)) / (tf_d + norm))
    total = scores[0]
    for s in scores[1:]:
        total = total + s
    n_matched = sum(
        (F.col(f"_tf{i}") > 0).cast("int") for i in range(len(terms))
    )
    return (
        j.select(
            F.col(id_col),
            total.alias("score"),
            n_matched.alias("n_matched"),
        )
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of two
    rankings — the standard way to combine keyword (BM25) and vector
    retrieval without score calibration: ``rrf = Σ 1/(k + rank_i)``,
    documents absent from a list contribute 0 from it.

    Output: (``id_col``, rank_a, rank_b, rrf_score), ordered/limited to
    ``top_k`` when given (ties → lowest id). The score is a fixed-order
    two-term IEEE sum over integer ranks — deterministic across engines.

    Plan shape: inputs are top-k result lists, so the full-outer join and
    the final sort are k-row work; at 100 TB the cost lives in producing
    the rankings (one scan each), not fusing them.
    """
    ra = a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    rb = b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    j = ra.join(rb, id_col, "full_outer")

    def _contrib(c: str) -> Column:
        return F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(c)).cast("double"), F.lit(0.0)
        )

    out = j.select(
        id_col,
        "rank_a",
        "rank_b",
        (_contrib("rank_a") + _contrib("rank_b")).alias("rrf_score"),
    )
    if top_k is not None:
        out = out.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(top_k)
    return out


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language vocabulary profile for tokenizer training / corpus
    health checks: document count, total and distinct token counts, hapax
    legomena (tokens seen exactly once), and the type-token ratio.

    Plan shape: explode → (lang, token) hash aggregate (map-side
    combinable, the token stream never leaves its scan partition until
    partially reduced) → per-lang rollup; the per-lang doc counts come
    from a separate count on the un-exploded scan and join on the
    language key — at most |languages| rows on either side of that join.
    Integer outputs are exact; the single IEEE division happens last.
    """
    toks = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    freq = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("freq"))
    vocab = freq.groupBy("lang").agg(
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.sum("freq").alias("total_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("hapax_tokens"),
    )
    docs = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return docs.join(vocab, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("total_tokens", F.lit(0).cast("long")).alias("total_tokens"),
        F.coalesce("distinct_tokens", F.lit(0).cast("long")).alias("distinct_tokens"),
        F.coalesce("hapax_tokens", F.lit(0).cast("long")).alias("hapax_tokens"),
        F.when(
            F.coalesce("total_tokens", F.lit(0)) > 0,
            F.col("distinct_tokens").cast("double") / F.col("total_tokens"),
        ).alias("type_token_ratio"),
    )


def length_histogram(
    df: DataFrame,
    by: str = "source",
    length_col: str = "n_chars",
    bucket_width: int = 100,
) -> DataFrame:
    """Fixed-width length histogram per group — the corpus-profiling
    report behind truncation/packing decisions (what share of each
    source exceeds the context budget). Bucket ``b`` covers
    ``[b*width, (b+1)*width)``.

    Plan shape: one map-side-combinable hash aggregate over a 2-column
    projection of the scan; output is (groups × occupied buckets) rows.
    Integer outputs plus one final IEEE division.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    b = F.floor(F.col(length_col) / bucket_width).cast("long")
    counts = df.groupBy(F.col(by).alias(by), b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql.window import Window

    total = F.sum("n_docs").over(Window.partitionBy(by))
    return counts.select(
        by,
        "bucket",
        (F.col("bucket") * bucket_width).alias("bucket_lo"),
        "n_docs",
        (F.col("n_docs").cast("double") / total).alias("share"),
    )


def segment_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
) -> DataFrame:
    """Split each document into consecutive non-overlapping ``width``-word
    segments → ``(doc, seg_idx, segment)``. The segment is the unit of
    CCNet/RefinedWeb-style sub-document dedup: their corpora use lines /
    paragraphs; this corpus is a single-line word stream, so a fixed
    word window is the structural analogue (the last segment may be
    shorter).

    Plan shape: pure map-side — the token array is materialized as a
    projection attribute FIRST (a lambda over the raw split expression
    would re-evaluate the regex per element under interpreted HOF eval,
    the O(n²) cliff), then one linear ``transform``+``slice`` pass and a
    ``posexplode``. No shuffle.
    """
    if width <= 0:
        raise ValueError("width must be positive")
    words = df.select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_w"))
    nseg = F.ceil(F.size(F.col("_w")) / F.lit(width)).cast("int")
    segs = F.when(F.size(F.col("_w")) > 0, F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(F.col("_w"), i * width + 1, width), " "),
    )).otherwise(F.array().cast("array<string>"))
    return words.select("doc", F.posexplode(segs).alias("seg_idx", "segment"))


def common_segments(
    seg: DataFrame,
    min_docs: int = 3,
) -> DataFrame:
    """Boilerplate inventory: segments appearing in ≥ ``min_docs``
    DISTINCT documents → ``(segment, n_docs)``. One hash aggregate on
    the segment string; a within-document repeat collapses map-side in
    the distinct, so the shuffle carries (doc, segment) pairs at most
    once each."""
    return (
        seg.select("doc", "segment")
        .distinct()
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_common_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    min_docs: int = 3,
    stage_path: str | None = None,
) -> DataFrame:
    """Sub-document boilerplate removal (CCNet §3.1 / RefinedWeb's
    line-wise dedup, re-shaped to fixed word segments): drop every
    segment whose exact text occurs in ≥ ``min_docs`` distinct
    documents, and reassemble the surviving segments in order. Returns
    ``(doc, n_segs, n_kept, cleaned_text)`` — a document made entirely
    of boilerplate keeps an empty string.

    Plan shape at 100 TB: segmenting is map-side; the boilerplate
    inventory is one (doc, segment)-distinct hash aggregate; the drop is
    a left-anti join on the segment string (AQE broadcasts the inventory
    when it is small — boilerplate inventories are, by construction:
    only segments repeated across ``min_docs`` docs survive the HAVING);
    reassembly is one per-doc hash aggregate over struct-sorted
    ``collect_list`` (no window sort). Surviving segments shuffle once,
    keyed by doc. The segment table has THREE consumers (inventory,
    anti-join probe, per-doc totals) and Spark plans no subtree reuse
    across them — the unstaged plan re-scans and re-segments the corpus
    per consumer, so at 100 TB pass ``stage_path`` to land the segment
    table in parquet once (same convention as the dedup/similarity/tf-idf
    staging options; results identical, test-pinned).
    """
    seg = segment_table(df, text_col, id_col, width)
    if stage_path is not None:
        seg = _stage(seg, stage_path)
    boiler = common_segments(seg, min_docs).select("segment")
    kept = seg.join(boiler, "segment", "left_anti")
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "segment"))),
                lambda s: s["segment"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = seg.groupBy("doc").agg(F.count(F.lit(1)).alias("n_segs"))
    return totals.join(rebuilt, "doc", "left").select(
        "doc",
        "n_segs",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def substring_sites(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Every OVERLAPPING ``k``-token shingle of every document →
    ``(doc, pos, h)`` with ``h`` the md5-int64 of the space-joined
    shingle (the engine-replayable hash the whole dedup family uses).
    The site table under substring-level dedup
    (:func:`remove_repeated_substrings`): any repeated substring of
    ≥ ``k`` tokens has ALL its k-shingles repeated, so repeated-shingle
    sites locate repeated substrings without pairwise comparison.

    Plan shape: pure map-side — token array materialized as a projection
    attribute first (interpreted-HOF O(n²) cliff avoided, see
    :func:`repetition_signals`), one linear transform + posexplode;
    ~one site row per corpus token."""
    if k <= 0:
        raise ValueError("k must be positive")
    from gdutils_spark.operators.dedup import _md5_int64

    words = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_w")
    )
    n = F.size(F.col("_w"))
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                _md5_int64(kgram(F.col("_w"), i, k)).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
    return words.select("doc", F.explode(shingles).alias("s")).select(
        "doc", F.col("s.pos").alias("pos"), F.col("s.h").alias("h")
    )


def remove_repeated_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    stage_path: str | None = None,
) -> DataFrame:
    """Substring-level dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", ExactSubstr) — the third dedup
    tier between document-level (MinHash/SimHash, ``dedup.py``) and
    segment-level boilerplate (:func:`remove_common_segments`): remove
    every repeated span of ≥ ``k`` tokens, keeping its FIRST occurrence
    in global (doc, pos) order. Returns
    ``(doc, n_tokens, n_kept, cleaned_text)``.

    The reference paper builds a corpus suffix array — inherently
    sequential. The Spark-first equivalent shingles at token
    granularity: a token is dropped iff it is covered by a
    non-canonical occurrence of a duplicated k-shingle (canonical =
    min (doc, pos) site per shingle). Every occurrence of a duplicated
    run beyond the first is removed exactly; the known over-removal
    edge is a shingle of the first occurrence whose text ALSO appeared
    in some earlier context — greedy but deterministic, and ``k`` is
    the Lee et al. min-match length knob (they use 50 BPE tokens;
    boilerplate-heavy corpora should run
    :func:`remove_common_segments` first so hot segments don't skew
    the shingle shuffle).

    Plan shape at 100 TB: the site table is linear in corpus tokens and
    shuffles ONCE keyed by shingle hash (same shape as MinHash-LSH
    banding) for the row_number that marks non-canonical occurrences;
    covered positions are removal-bounded; the rebuild is one per-doc
    hash aggregate over struct-sorted ``collect_list`` (no window
    sort). The corpus is token-exploded twice (sites + rebuild), both
    map-side scans. ``stage_path`` lands the site table in parquet once
    (standard staging convention) — without it the two site consumers
    re-derive the corpus scan.
    """
    from pyspark.sql import Window

    sites = substring_sites(df, text_col, id_col, k)
    if stage_path is not None:
        sites = _stage(sites, stage_path)
    w = Window.partitionBy("h").orderBy("doc", "pos")
    removals = (
        sites.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc", "pos")
    )
    covered = removals.select(
        "doc",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()
    words = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_w")
    )
    toks = words.select("doc", F.posexplode("_w").alias("pos", "tok"))
    kept = toks.join(covered, ["doc", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = words.select("doc", F.size("_w").alias("n_tokens"))
    return totals.join(rebuilt, "doc", "left").select(
        "doc",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def _adjacent_pairs(arr: Column, n: Column, a_name: str, b_name: str) -> Column:
    """Array of adjacent-element pairs of ``arr`` as
    ``struct<a_name:string, b_name:string>`` (empty, correctly typed,
    when ``n < 2``) — the shared explode kernel under :func:`bigram_lm`,
    :func:`bigram_oov_rate` and the BPE pair counter, so the
    interpreted-HOF subtlety lives in ONE place: the caller must pass
    ``arr``/``n`` as already-materialized projection attributes (never
    inline expressions), or the per-index ``element_at`` lambda
    re-evaluates the producer per element — the O(tokens²) cliff
    (cf. :func:`repetition_signals`)."""
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(arr, i + 1).alias(a_name),
                F.element_at(arr, i + 2).alias(b_name),
            ),
        ),
    ).otherwise(
        F.array().cast(f"array<struct<{a_name}:string,{b_name}:string>>")
    )


def bigram_oov_rate(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram OUT-OF-VOCABULARY rate against a
    :func:`bigram_lm` table — the exact-integer slice of n-gram LM
    quality scoring: a document whose adjacent pairs rarely appear in
    the reference LM is off-distribution (noise, another language,
    mangled text). Returns ``(doc, n_bigrams, n_oov, oov_rate)`` —
    exact counts + one final IEEE division, fully oracle-replayable
    (the log-prob twin lives with ``unigram_logprob`` in property-test
    territory: libm ulps).

    ``lm`` must be the FULL pair table (``top_k=None``) for a true OOV
    judgment — a truncated table inflates the rate by construction.
    Plan shape: one map-side pair explode per document, one broadcast-
    or-shuffle join against the (vocabulary²-bounded) LM pair set, one
    doc-keyed count — documents shuffle only as (doc, pair) rows.
    """
    base = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_ws")
    ).select("doc", "_ws", F.size("_ws").alias("_n"))
    pairs_col = _adjacent_pairs(F.col("_ws"), F.col("_n"), "w1", "w2")
    exploded = base.select("doc", F.explode(pairs_col).alias("p")).select(
        "doc", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    known = lm.select("w1", "w2").distinct()
    flagged = exploded.join(
        known.withColumn("_known", F.lit(1)), ["w1", "w2"], "left"
    )
    return flagged.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("_known").isNull()).cast("long")).alias("n_oov"),
        (
            F.sum((F.col("_known").isNull()).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


def remove_repeated_substrings_between(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    corpus_sites_path: str | None = None,
    stage_path: str | None = None,
) -> DataFrame:
    """INCREMENTAL substring dedup — the nightly-ingest pattern for
    :func:`remove_repeated_substrings`: clean a new ``batch`` against an
    existing ``corpus`` (plus the batch itself) without ever shuffling
    the corpus. A batch token is dropped iff covered by a batch shingle
    site whose text already occurs in the CORPUS (any occurrence — the
    corpus copy is canonical) or earlier in the batch (the usual
    (doc, pos)-minimum rule). Returns the batch relation
    ``(doc, n_tokens, n_kept, cleaned_text)``.

    Plan shape at 100 TB: the batch's distinct shingle hashes (batch-
    sized) BROADCAST against the corpus site table, which is consumed
    map-side as a semi-join probe — the corpus never shuffles and is
    touched by exactly one scan (zero when ``corpus_sites_path`` points
    at a staged :func:`substring_sites` parquet, the artifact a nightly
    pipeline maintains). Batch-side work is the standalone operator's:
    one shingle-hash shuffle of BATCH sites only. The batch site table
    has THREE consumers (hash set, internal window, corpus probe) and
    Spark plans no subtree reuse — pass ``stage_path`` at scale to land
    it in parquet once instead of re-shingling the batch per consumer
    (standard staging convention; results identical, test-pinned).
    Same shape as ``dedup.minhash_lsh_pairs_between``.
    """
    from pyspark.sql import Window

    spark = batch.sparkSession
    if corpus_sites_path is not None:
        corpus_sites = spark.read.parquet(corpus_sites_path)
    else:
        corpus_sites = substring_sites(corpus, text_col, id_col, k)
    bsites = substring_sites(batch, text_col, id_col, k)
    if stage_path is not None:
        bsites = _stage(bsites, stage_path)
    # shingles present anywhere in the corpus: semi-join the corpus site
    # table by the (batch-sized, broadcast) batch hash set — corpus-side
    # map work only
    bhashes = bsites.select("h").distinct()
    in_corpus = (
        corpus_sites.join(F.broadcast(bhashes), "h", "left_semi")
        .select("h")
        .distinct()
    )
    # batch-internal repeats: every site after the (doc, pos) minimum
    w = Window.partitionBy("h").orderBy("doc", "pos")
    internal = (
        bsites.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc", "pos")
    )
    # sites whose shingle exists in the corpus: ALL batch occurrences go
    # (the corpus copy is the canonical survivor)
    vs_corpus = bsites.join(F.broadcast(in_corpus), "h", "left_semi").select(
        "doc", "pos"
    )
    removals = internal.unionByName(vs_corpus).distinct()
    covered = removals.select(
        "doc",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()
    words = batch.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_w")
    )
    toks = words.select("doc", F.posexplode("_w").alias("pos", "tok"))
    kept = toks.join(covered, ["doc", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = words.select("doc", F.size("_w").alias("n_tokens"))
    return totals.join(rebuilt, "doc", "left").select(
        "doc",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def token_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stage_path: str | None = None,
) -> DataFrame:
    """Per-document mean corpus-frequency of its tokens — the
    exact-arithmetic twin of unigram-LM scoring (:func:`unigram_logprob`)
    used for rarity-based quality triage: a low mean frequency flags
    documents full of tokens the corpus has barely seen (OCR noise,
    codes, another language); a high one flags boilerplate. All counts
    are exact integers; the single IEEE division happens last, so any
    SQL oracle is bit-identical (same design as :func:`tf_idf_top_terms`
    — a log score would hash-diverge on libm ulps).

    Plan shape: explode → (doc, token) hash aggregate → token-keyed
    global-frequency aggregate → join back on token (vocabulary-sized
    build side, AQE broadcast-decides) → per-doc rollup. Two shuffles
    over the token stream, both map-side combinable. The tf table has
    two consumers (frequency aggregate + join probe) and Spark plans no
    subtree reuse across them — pass ``stage_path`` at corpus scale to
    land tf in parquet once instead of re-exploding the corpus per
    consumer (tf-idf staging convention).
    """
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("cnt"))
    if stage_path is not None:
        tf = _stage(tf, stage_path)
    freq = tf.groupBy("token").agg(F.sum("cnt").alias("freq"))
    return (
        tf.join(freq, "token")
        .groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("cnt") * F.col("freq")).alias("freq_mass"),
        )
        .select(
            "doc",
            "n_tokens",
            "n_distinct",
            "freq_mass",
            (F.col("freq_mass").cast("double") / F.col("n_tokens")).alias(
                "mean_token_freq"
            ),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stage_path: str | None = None,
) -> DataFrame:
    """Per-document unigram language-model score: the mean negative
    natural-log probability of the document's tokens under the
    maximum-likelihood unigram model fit on the corpus itself (the
    KenLM-perplexity stand-in of CCNet's quality bucketing, with the
    corpus as its own training set — no OOV smoothing needed).
    ``exp(mean_neg_logprob)`` is the document's unigram perplexity.

    Same two-shuffle plan (and ``stage_path`` staging convention) as
    :func:`token_rarity`. This operator is the honest log-domain form;
    because ``ln`` differs across libm implementations in the last ulp,
    it is verified by property tests against a pure-Python model
    (tolerance-based), not by a hash-compare SQL oracle — use
    :func:`token_rarity` where exact cross-engine parity is required.
    """
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("cnt"))
    if stage_path is not None:
        tf = _stage(tf, stage_path)
    freq = tf.groupBy("token").agg(F.sum("cnt").alias("freq"))
    total = freq.select(F.sum("freq").alias("_total"))
    return (
        tf.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(
                -F.col("cnt")
                * F.log(F.col("freq").cast("double") / F.col("_total"))
            ).alias("neg_logprob_sum"),
        )
        .select(
            "doc",
            "n_tokens",
            (F.col("neg_logprob_sum") / F.col("n_tokens")).alias(
                "mean_neg_logprob"
            ),
        )
    )


def compression_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Compression-ratio quality probe (the Dolma / Gopher-adjacent
    signal): ``zlib_ratio = deflated_bytes / raw_bytes`` over the UTF-8
    text. Highly repetitive or templated documents compress far below
    natural prose (~0.3–0.6), random/encoded blobs sit near 1.0 — a
    cheap, language-agnostic repetition detector that complements the
    exact n-gram signals in :func:`repetition_signals` (which a
    paraphrasing generator can dodge but a compressor still catches).

    Implementation: Arrow-batched ``mapInPandas`` around ``zlib`` level 6
    (deterministic output for a given input, pinned by test). This is a
    deliberate Python hot path — the operator IS the DEFLATE model; at
    100 TB it is an embarrassingly parallel map with no shuffle, and the
    payload never leaves the executor. Empty documents report ratio NULL.
    """
    from collections.abc import Iterator

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf["_t"]]
            nraw = [len(b) for b in raw]
            ncomp = [len(zlib.compress(b, 6)) if b else None for b in raw]
            yield pd.DataFrame(
                {
                    "doc": pdf["_id"],
                    "raw_bytes": pd.array(nraw, dtype="Int64"),
                    "zlib_bytes": pd.array(ncomp, dtype="Int64"),
                    "zlib_ratio": pd.array(
                        [
                            c / n if c is not None and n else None
                            for c, n in zip(ncomp, nraw)
                        ],
                        dtype="Float64",
                    ),
                }
            )

    import pandas as pd

    # derive the id type from the input schema (string/int/long doc ids
    # all pass through unchanged) — same convention as audio_pcm_stats
    id_type = df.schema[id_col].dataType.simpleString()
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    return base.mapInPandas(
        op, f"doc {id_type}, raw_bytes long, zlib_bytes long, zlib_ratio double"
    )


def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Bigram language-model table: corpus-wide adjacent-pair counts
    with the conditional probability ``P(w2 | w1) = c(w1,w2) / c(w1,·)``
    — the counting kernel under n-gram LM quality scoring (the KenLM
    preprocessing step of CCNet-style pipelines) and the seed statistics
    for data-driven tokenizer merges. Denominator is the bigram-START
    total, so probabilities sum to exactly 1 per history.

    Exact integers + one final IEEE division per row — engine-replayable
    bit-for-bit. Plan shape: one map-side pair explode (the token array
    materialized as a projection attribute first — the interpreted-HOF
    O(tokens²) cliff, see :func:`repetition_signals`), a pair-keyed
    count, a history-keyed rollup of that count, and a vocabulary-sized
    join — all map-combinable, corpus rows shuffle only as (pair, n)
    aggregates. ``top_k``: keep the most frequent pairs
    (count desc, w1, w2 — fully tie-broken, so the cut is deterministic).
    """
    # the module's shared whitespace tokenizer (tokens() splits on \s+
    # after trim — identical token arrays to the oracle's
    # normalize-then-split-on-single-space formulation)
    base = df.select(tokens(F.col(text_col)).alias("_ws")).select(
        "_ws", F.size("_ws").alias("_n")
    )
    pairs_col = _adjacent_pairs(F.col("_ws"), F.col("_n"), "w1", "w2")
    exploded = base.select(F.explode(pairs_col).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    pc = exploded.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    wt = pc.groupBy("w1").agg(F.sum("pair_count").alias("w1_count"))
    out = pc.join(wt, "w1").select(
        "w1",
        "w2",
        "pair_count",
        "w1_count",
        (F.col("pair_count").cast("double") / F.col("w1_count")).alias(
            "cond_prob"
        ),
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("pair_count").desc(), "w1", "w2"
        ).limit(top_k)
    return out


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, ACL — "Neural Machine
# Translation of Rare Words with Subword Units"). Beyond-reference: the
# reference has no tokenizer learner; this is the data-driven step that
# turns the bigram-LM/token-count machinery above into a real subword
# tokenizer, trained distributed.
# ---------------------------------------------------------------------------

BPE_END_OF_WORD = "</w>"


def _bpe_word_freq(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus word-frequency table — the ONLY corpus-sized pass BPE
    makes. Classic BPE trains on the word-frequency dictionary, not the
    running text, so everything after this aggregate is vocabulary-sized
    (distinct words): at 100 TB of text the corpus shuffles once as
    ``(word, count)`` partials (map-side combine) and the training loop
    never touches it again."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _bpe_initial_state(wf: DataFrame) -> DataFrame:
    """Seed vocabulary state: each word as a space-separated symbol
    string of its characters plus the end-of-word marker (``"the"`` →
    ``"t h e </w>"``). Explicit per-index ``substr`` (not regex split)
    so a SQL oracle can rebuild the identical seed."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return wf.select(
        "word",
        "freq",
        F.concat(
            F.array_join(chars, " "), F.lit(" " + BPE_END_OF_WORD)
        ).alias("sym"),
    )


def _bpe_pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-symbol-pair counts weighted by word frequency — the
    get_stats() kernel of Sennrich's reference implementation, as one
    vocabulary-sized explode + hash aggregate. The symbol array is
    materialized as a projection attribute BEFORE the pair lambda
    indexes it (interpreted-HOF O(n²) guard, cf.
    :func:`repetition_signals`)."""
    base = state.select(
        "freq", F.split("sym", " ").alias("_s")
    ).select("freq", "_s", F.size("_s").alias("_n"))
    pairs = _adjacent_pairs(F.col("_s"), F.col("_n"), "a", "b")
    return (
        base.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _bpe_merge_expr(sym_arr: Column, a: str, b: str) -> Column:
    """Apply merge ``(a, b) → ab`` to one symbol array via a left fold
    (greedy left-to-right, exactly Sennrich's in-place scan): the
    accumulator is the merged space-separated string; a step merges iff
    the accumulator's LAST symbol is exactly ``a`` and the next symbol
    is ``b``. The fold re-examines the merged symbol as the new last, so
    ``a a a`` under ``(a,a)`` yields ``aa a`` — greedy, not maximal.
    Bit-identical to DuckDB ``list_reduce`` with the same CASE."""
    la = len(a)

    def step(acc: Column, x: Column) -> Column:
        last_is_a = (acc == F.lit(a)) | (
            (F.length(acc) >= F.lit(la + 1))
            & (
                acc.substr(F.length(acc) - F.lit(la), F.lit(la + 1))
                == F.lit(" " + a)
            )
        )
        return F.when(
            last_is_a & (x == F.lit(b)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(la)),
                F.lit(a + b),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    return F.aggregate(
        F.slice(sym_arr, 2, F.size(sym_arr) - 1),
        F.element_at(sym_arr, 1),
        step,
    )


def _bpe_fit(
    df: DataFrame,
    text_col: str,
    n_merges: int,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared training loop: returns (merge list, final vocabulary
    state). Each iteration is ONE vocabulary-sized aggregate to score
    pairs, ONE single-row argmax collect (the same bounded model-
    parameter collect as Lloyd centroids in ``similarity.py``), and ONE
    codegen fold projection to apply the winner — so a full train is
    ``n_merges`` vocabulary passes and never rescans the corpus. The
    argmax tie-break (count desc, then (a, b) lexicographic) makes the
    whole chain deterministic and SQL-replayable.

    Stops EARLY (returning the partial merge list and the state at
    exhaustion) if the vocabulary runs out of pairs before ``n_merges``
    merges — Sennrich's reference learner does the same, and the SQL
    oracle's per-round CTEs degrade identically (an exhausted round is
    a no-op carry-forward), so operator and oracle agree on the
    exhaustion contract instead of one raising where the other returns.
    Callers own unpersisting the returned (persisted) state.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    state = _bpe_initial_state(_bpe_word_freq(df, text_col))
    state = state.persist()
    merges: list[tuple[int, str, str, int]] = []
    prev = state
    # r14 (guide §1.2 "don't compute things you throw away"): one job
    # per round, not two. Round r's argmax collect evaluates every
    # partition of the CURRENT state (TakeOrdered over a full
    # aggregate), which materializes its cache as a side effect — so
    # the previous round's state is released one round LATE (after the
    # job that proved its successor is cached) instead of paying a
    # dedicated count() job per round to materialize eagerly. Peak
    # storage is two vocabulary-sized states, same as before (the old
    # count() also overlapped prev+nxt).
    to_release: DataFrame | None = None
    for rank in range(1, n_merges + 1):
        best = (
            _bpe_pair_counts(prev)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        # prev is now fully cached → its predecessor can be released
        if to_release is not None:
            to_release.unpersist()
            to_release = None
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
        merges.append((rank, a, b, cnt))
        nxt = prev.select(
            "word",
            "freq",
            _bpe_merge_expr(F.split("sym", " "), a, b).alias("sym"),
        ).persist()
        to_release = prev
        prev = nxt
    if to_release is not None:
        # the final state was never the subject of an argmax job: pin it
        # with one materializing pass so its predecessor's cache can be
        # released before handing the state to the caller
        prev.count()
        to_release.unpersist()
    return merges, prev


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn a BPE merge table from a corpus: ``(rank, left_sym,
    right_sym, pair_count)`` — rank is merge order (1-based), pair_count
    the frequency-weighted adjacency count that won that round. Returns
    FEWER than ``n_merges`` rows when the vocabulary exhausts its pairs
    first (every word fused to one symbol) — the standard BPE early
    stop, mirrored exactly by the SQL oracle.

    100 TB shape: one corpus scan (word counts, map-side combined), then
    ``n_merges`` vocabulary-sized rounds; the model itself is tiny
    (``n_merges`` rows) and returned as a local relation, exactly like a
    trained centroid table."""
    spark = df.sparkSession
    merges, state = _bpe_fit(df, text_col, n_merges)
    state.unpersist()
    return spark.createDataFrame(
        [(r, a, b, c) for r, a, b, c in merges],
        "rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_token_stats(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Corpus token table under the learned BPE: ``(token,
    n_occurrences)`` — every subword the trained tokenizer would emit,
    weighted by word frequency. Computed from the final vocabulary
    state, so it is vocabulary-sized work regardless of corpus size.
    The (vocabulary-sized) result is ``localCheckpoint``-materialized so
    the training state's cache can be released before returning —
    ``_bpe_fit`` hands back a persisted state that would otherwise stay
    pinned in executor storage for the session (checkpoint RDDs are
    ContextCleaner-collected; CacheManager entries are not)."""
    _, state = _bpe_fit(df, text_col, n_merges)
    out = (
        state.select(
            "freq", F.explode(F.split("sym", " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
        .localCheckpoint(eager=True)
    )
    state.unpersist()
    return out


def bpe_encode_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Per-document BPE token counts: ``(doc, n_words, n_bpe_tokens)``
    — the sequence-length accounting a training pipeline does before
    packing (cf. ``pack_batches``). Joins each document's words against
    the trained vocabulary's per-word symbol counts: the vocabulary is
    the SMALL side (broadcast at scale), the corpus never shuffles —
    one explode + broadcast join + per-doc re-aggregate. The
    vocabulary-sized per-word symbol counts are ``localCheckpoint``-
    materialized so the training state's cache is released up front
    rather than pinned for the session (cf. :func:`bpe_token_stats`)."""
    _, state = _bpe_fit(df, text_col, n_merges)
    word_len = state.select(
        "word", F.size(F.split("sym", " ")).alias("_n_sym")
    ).localCheckpoint(eager=True)
    state.unpersist()
    words = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    ).where(F.length("word") > 0)
    return (
        words.join(F.broadcast(word_len), "word")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n_sym").alias("n_bpe_tokens"),
        )
    )
