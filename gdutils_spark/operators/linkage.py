"""Record linkage: blocked fuzzy joins between two entity tables.

Beyond-reference extension in the reference's own spirit — the reference
reconciles records across feeds by EXACT id equality (dataset merges at
``/root/reference/gdutils/__init__.py:500-540``); real catalogs also need
the fuzzy form ("Is `R/V Blue Heron` the platform registered as
`BLUE HERON (R/V)`?"), and every training-data pipeline needs it for
entity resolution across sources before dedup/mixing decisions.

Spark-first shape (the standard blocking design, cf. the frequency-pruned
inverted index in ``operators/dedup.ngram_jaccard_pairs`` — here for TWO
tables): tokenize both sides, equi-join on token to generate candidate
pairs (never a cross join), optionally drop hot tokens from candidate
generation only, then verify candidates with the EXACT token-set Jaccard
over the full token sets. Everything is Catalyst expressions — no Python
in the hot path — and the tokenizer is a single documented regex so a SQL
oracle reproduces scores bit-for-bit (the only float op is one final
division of exact longs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lower-case alphanumeric runs: one deterministic tokenizer shared with
# the oracle (DuckDB: regexp_split_to_array(lower(s), '[^a-z0-9]+'))
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _token_table(df: DataFrame, id_col: str, text_col: str, side: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .where(F.col(f"{side}_id").isNotNull())
        .distinct()
    )


def fuzzy_blocked_join(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    a_text: str,
    b_id: str,
    b_text: str,
    threshold: float = 0.5,
    max_token_freq: int | None = 1000,
    stage_path: str | None = None,
) -> DataFrame:
    """Entity-resolution join: ``(a_id, b_id, n_common, na, nb, jaccard)``
    for every cross-table pair whose DISTINCT-token-set Jaccard meets
    ``threshold`` — ``jaccard = common / (na + nb - common)`` over the
    tokenizer's lower-cased alphanumeric runs.

    ``max_token_freq`` is the blocking skew guard (the
    ``max_shingle_freq`` convention): tokens appearing on more than
    that many rows of EITHER side are excluded from candidate
    generation only — a corpus-wide token like "inc" otherwise joins
    f_a x f_b candidate rows into one partition. Verification recounts
    common tokens over the FULL token sets, so every emitted score is
    exact; the only approximation is that a pair sharing NOTHING but
    hot tokens is never considered (boilerplate overlap — near-zero
    Jaccard anyway). Pass ``None`` to disable.

    Plan shape: two token explodes, ONE token-keyed equi-join for
    candidates, one pair-keyed count + two broadcast-sized size joins.

    The token tables feed THREE consumers (candidate generation, the
    hot-token census, and verification), so recomputing them would
    triple the explode cost. Default: a lazy ``localCheckpoint`` pin
    for the call — materialized once at first action, shared by all
    three consumers, reclaimed by the ContextCleaner when the returned
    plan is dropped, and (unlike ``cache()``) never registered in the
    CacheManager, so it cannot be substituted into other queries'
    plans or silently reused across repeated timed invocations. The
    pinned blocks still live in executor storage while the plan is
    alive; at corpus scale (or for repeated calls) pass ``stage_path``
    — the dedup operators' convention (cf.
    ``dedup.minhash_lsh_pairs(stage_path=)``): each token table is
    written to parquet ONCE under ``stage_path`` and all three
    consumers re-read the columnar file, so executor memory holds
    nothing corpus-sized.

    ONE LIVE PLAN PER stage_path: staging writes eagerly with
    ``mode("overwrite")`` while the returned DataFrame reads those
    files lazily — a second call reusing the same ``stage_path``
    clobbers files a still-unmaterialized earlier result depends on
    (``fuzzy_blocked_join`` and ``edit_blocked_join`` may share one
    path only because they stage under distinct ``tokens_*`` /
    ``grams_*`` subdirectories). Materialize (write/collect) or
    discard the previous result before reusing a path, or pass a
    per-call unique path."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"fuzzy_blocked_join: threshold={threshold} must be in (0, 1]")
    if max_token_freq is not None and max_token_freq < 1:
        # 0 would mark EVERY token hot -> zero candidates -> silently
        # empty result (the pack_sequences budget=0 hazard class)
        raise ValueError(
            f"fuzzy_blocked_join: max_token_freq={max_token_freq} must be >= 1 "
            "(or None to disable the hot-token guard)"
        )
    ta = _token_table(a, a_id, a_text, "a")
    tb = _token_table(b, b_id, b_text, "b")
    if stage_path is not None:
        spark = a.sparkSession
        pa_, pb_ = f"{stage_path}/tokens_a", f"{stage_path}/tokens_b"
        ta.write.mode("overwrite").parquet(pa_)
        tb.write.mode("overwrite").parquet(pb_)
        ta, tb = spark.read.parquet(pa_), spark.read.parquet(pb_)
    else:
        # lazy localCheckpoint, NOT cache(): a CacheManager entry is
        # substituted into ANY later query whose plan contains this
        # subtree — r14 found the full join's cached corpus token table
        # hijacking fuzzy_blocked_join_between's plan (blocking its
        # broadcast-semi pushdown, i.e. re-introducing the corpus-wide
        # shuffle the between tier exists to avoid) and making repeated
        # timed runs reuse the first run's materialization. The
        # checkpointed RDD serves the same three consumers within this
        # call, keeps origin stats (broadcast planning intact), and is
        # reclaimed by the ContextCleaner when the plan is dropped.
        ta = ta.localCheckpoint(eager=False)
        tb = tb.localCheckpoint(eager=False)
    sa = ta.groupBy("a_id").agg(F.count(F.lit(1)).alias("na"))
    sb = tb.groupBy("b_id").agg(F.count(F.lit(1)).alias("nb"))
    ca, cb = ta, tb
    if max_token_freq is not None:
        hot = (
            ta.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
            .unionByName(tb.groupBy("token").agg(F.count(F.lit(1)).alias("__f")))
            .groupBy("token")
            .agg(F.max("__f").alias("__f"))
            .where(F.col("__f") > F.lit(int(max_token_freq)))
            .select("token")
        )
        ca = ta.join(hot, "token", "left_anti")
        cb = tb.join(hot, "token", "left_anti")
    cands = ca.join(cb, "token").select("a_id", "b_id").distinct()
    # exact verification over the FULL token sets, candidate-bounded
    common = (
        cands.join(ta, "a_id")
        .join(tb, ["b_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", "n_common", "na", "nb", jac.alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(float(threshold)))
    )


def _qgram_table(
    df: DataFrame, id_col: str, text_col: str, side: str, q: int, short_len: int,
    k: int, expand_short: bool,
) -> DataFrame:
    """Positional blocking grams per id — ``({side}_id, {side}_len,
    gram, pos)`` for every q-gram of the lower-cased text (1-based
    positions; strings shorter than ``q`` have none). Strings shorter
    than ``short_len`` ADDITIONALLY emit length-bucket rows at pos 0
    (``expand_short`` sides emit buckets for every length in
    ``[len-k, len+k]`` so every short pair inside the length band
    meets in a bucket REGARDLESS of which side is shorter; the other
    side emits its own length only) — the guaranteed-recall path the
    q-gram count bound can't cover."""
    base = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.lower(F.col(text_col)).alias(f"{side}_text"),
    ).where(F.col(f"{side}_id").isNotNull() & F.col(f"{side}_text").isNotNull())
    ln = F.length(F.col(f"{side}_text"))
    # only (id, len, gram, pos) rides through the blocking join/shuffle —
    # never the text itself (texts join back onto the candidate set only)
    grams = base.where(ln >= q).select(
        f"{side}_id",
        ln.alias(f"{side}_len"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), ln - F.lit(q - 1)),
                lambda i: F.struct(
                    F.substring(F.col(f"{side}_text"), i, q).alias("gram"),
                    i.alias("pos"),
                ),
            )
        ).alias("g"),
    ).select(f"{side}_id", f"{side}_len", "g.gram", "g.pos")
    short = base.where(ln < F.lit(short_len))
    if expand_short:
        buckets = short.select(
            f"{side}_id",
            ln.alias(f"{side}_len"),
            F.explode(
                F.transform(
                    # BOTH directions: the partner may be shorter
                    F.sequence(F.greatest(ln - F.lit(k), F.lit(0)), ln + F.lit(k)),
                    lambda l: F.concat(F.lit("\x02len="), l.cast("string")),
                )
            ).alias("gram"),
            F.lit(0).alias("pos"),
        )
    else:
        buckets = short.select(
            f"{side}_id",
            ln.alias(f"{side}_len"),
            F.concat(F.lit("\x02len="), ln.cast("string")).alias("gram"),
            F.lit(0).alias("pos"),
        )
    return grams.unionByName(buckets)


def edit_blocked_join(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    a_text: str,
    b_id: str,
    b_text: str,
    max_dist: int = 2,
    q: int = 4,
    max_gram_freq: int | None = None,
    stage_path: str | None = None,
) -> DataFrame:
    """Edit-distance join: ``(a_id, b_id, dist)`` for every cross-table
    pair whose lower-cased texts are within Levenshtein distance
    ``max_dist`` — the typo-tolerant twin of :func:`fuzzy_blocked_join`
    (token-set Jaccard catches word reorderings; edit distance catches
    character-level corruption: OCR noise, transliteration drift,
    fat-fingered ids, near-dup text prefixes).

    Spark-first shape (positional q-gram blocking with the MergeCount
    filter, Gravano et al. 2001, "Approximate string joins in a
    database (almost) for free"): explode each side to its positional
    q-grams, ONE gram-keyed equi-join restricted to ``|pos_a - pos_b|
    <= max_dist`` (an edit shifts surviving grams by at most one
    position each), a length-band filter (``|len_a - len_b| <=
    max_dist``), then the COUNT filter — a true pair within distance k
    keeps at least ``max(len_a, len_b) - q + 1 - k*q`` gram occurrences
    intact, so pairs below that bound are pruned BEFORE verification
    (on natural text this is the step that matters: common grams like
    "the " block at the same position only, and the count bound cuts
    candidate pairs by ~10^4x on the documents fixture). Survivors are
    verified with the EXACT JVM ``levenshtein`` — every emitted dist is
    exact, and recall is exact too: pairs where ``max(len) >=
    q*(max_dist+1)`` are guaranteed >= 1 surviving positional gram, and
    SHORTER strings also meet in explicit length buckets (side a emits
    buckets for a window of lengths, side b for its own length — every
    short pair inside the band meets exactly once, pos-0 rows bypass
    the count bound).

    ``max_gram_freq`` (default None = guaranteed recall): when set,
    grams on more rows than the cap are excluded from candidate
    generation AND the count filter is disabled (dropped grams would
    break its bound) — the fuzzy_blocked_join caveat applies (a pair
    sharing only hot grams is missed). Length-bucket rows (pos 0, the
    short-string recall path) are EXEMPT from the census and the
    anti-join: many same-length short strings would otherwise make a
    bucket "hot" and silently lose guaranteed short-pair recall, and
    keeping them is safe because the count filter is off in guard mode
    (extra bucket candidates only feed the exact verify). On
    natural-language corpora prefer the default: the positional+count
    filters already handle common grams.

    Plan shape: two gram explodes, one (gram)-keyed equi-join with the
    position band as a residual, one pair-keyed count, one Catalyst
    ``levenshtein`` filter — all JVM-side, no Python, never a cross
    join. In the default (guard-off) mode each gram table has ONE
    consumer, so nothing is cached or staged; when ``max_gram_freq``
    is set, the hot-gram census is a SECOND consumer and the explode
    would recompute — pass ``stage_path`` (the fuzzy_blocked_join /
    dedup convention) to write each gram table to parquet once and
    re-read it for both consumers. ONE LIVE PLAN PER stage_path: see
    :func:`fuzzy_blocked_join` — eager overwrite + lazy read-back
    means reusing a path clobbers an unmaterialized earlier result
    (sharing a path with the fuzzy join is safe only because the
    subdirectories differ)."""
    if max_dist < 1:
        raise ValueError(f"edit_blocked_join: max_dist={max_dist} must be >= 1")
    if q < 2:
        raise ValueError(f"edit_blocked_join: q={q} must be >= 2")
    if max_gram_freq is not None and max_gram_freq < 1:
        raise ValueError(
            f"edit_blocked_join: max_gram_freq={max_gram_freq} must be >= 1 "
            "(or None for guaranteed-recall blocking)"
        )
    short_len = q * (max_dist + 1)
    ga = _qgram_table(a, a_id, a_text, "a", q, short_len, int(max_dist), expand_short=True)
    gb = _qgram_table(b, b_id, b_text, "b", q, short_len, int(max_dist), expand_short=False)
    if stage_path is not None:
        spark = a.sparkSession
        pa_, pb_ = f"{stage_path}/grams_a", f"{stage_path}/grams_b"
        ga.write.mode("overwrite").parquet(pa_)
        gb.write.mode("overwrite").parquet(pb_)
        ga, gb = spark.read.parquet(pa_), spark.read.parquet(pb_)
    use_count_filter = max_gram_freq is None
    if max_gram_freq is not None:
        # length-bucket rows (pos == 0, the guaranteed-recall path for
        # short strings) are EXEMPT from the hot census AND the
        # anti-join: many same-length short strings make a bucket row
        # count "hot", and dropping it would silently remove guaranteed
        # recall for short pairs — a sharper loss than the documented
        # hot-GRAM caveat. Safe to keep them: the count filter is
        # already disabled in guard mode, so extra bucket candidates
        # only feed the exact verify (and bucket keys are already
        # length-sharded). Exemption is positional, not by sentinel
        # prefix, so adversarial text containing \\x02 can't collide.
        real = F.col("pos") > 0
        hot = (
            ga.where(real).groupBy("gram").agg(F.count(F.lit(1)).alias("__f"))
            .unionByName(
                gb.where(real).groupBy("gram").agg(F.count(F.lit(1)).alias("__f"))
            )
            .groupBy("gram")
            .agg(F.max("__f").alias("__f"))
            .where(F.col("__f") > F.lit(int(max_gram_freq)))
            .select("gram")
        )

        def _exempt_anti(t: DataFrame) -> DataFrame:
            # NULL join keys never match in an equi-join, so masking the
            # key for pos==0 rows keeps them through the left_anti
            # without a second scan of the gram table (aliases because
            # hot shares lineage with the gram tables — a self-join)
            masked = t.withColumn(
                "__aj", F.when(F.col("pos") > 0, F.col("gram"))
            ).alias("__t")
            return masked.join(
                hot.alias("__h"),
                F.col("__t.__aj") == F.col("__h.gram"),
                "left_anti",
            ).drop("__aj")

        ga = _exempt_anti(ga)
        gb = _exempt_anti(gb)
    k = int(max_dist)
    # the POSITION BUCKET is part of the equi-key, not only a residual:
    # joining on gram alone makes every occurrence of a common gram meet
    # every other regardless of position (sum f_g^2 probe pairs — 88M on
    # the sf0.1 documents fixture, max key multiplicity 1039), with the
    # |dpos| <= k band discarding most matches AFTER they materialize.
    # Quantizing pos into width-(k+1) buckets and joining on (gram, bkt)
    # — the probe side emits the <= 2 buckets its [pos-k, pos+k] window
    # can span — cuts probe pairs ~4.3x (20.6M, max multiplicity 201)
    # and at corpus scale turns each hot gram key into many (gram, bkt)
    # keys. Each (pos_a, pos_b) occurrence pair still meets at most ONCE
    # (the two probe buckets are distinct), so the count filter's
    # per-pair tally is unchanged.
    w = k + 1
    ga_b = ga.withColumn("bkt", F.floor(F.col("pos") / F.lit(w)))
    # the probe window [pos-k, pos+k] spans UP TO THREE width-(k+1)
    # buckets (e.g. k=2, pos=4: [2, 6] covers buckets 0, 1, 2) — emit
    # the full floor range, not just the two endpoints: a two-endpoint
    # emission silently drops occurrence matches whose build-side
    # bucket is the MIDDLE one, and the count filter then undercounts
    # and kills true pairs (caught by the extended brute-force
    # differential; the sf0.1 fixture passed only on bound slack)
    gb_b = gb.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor((F.col("pos") - F.lit(k)) / F.lit(w)),
                F.floor((F.col("pos") + F.lit(k)) / F.lit(w)),
            )
        ),
    )
    joined = (
        ga_b.alias("ga")
        .join(gb_b.alias("gb"), ["gram", "bkt"])
        .where(
            (F.abs(F.col("ga.pos") - F.col("gb.pos")) <= F.lit(k))
            & (F.abs(F.col("a_len") - F.col("b_len")) <= F.lit(k))
        )
    )
    cands = joined.groupBy("a_id", "b_id", "a_len", "b_len").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max(F.col("ga.pos") + F.col("gb.pos")).alias("__maxpos"),
    )
    if use_count_filter:
        # pos 0 rows are length-bucket meetings (short strings): exempt
        # from the gram-count bound, which assumes q-gram coverage
        bound = F.greatest("a_len", "b_len") - F.lit(q - 1) - F.lit(k * q)
        cands = cands.where(
            (F.col("__maxpos") == 0) | (F.col("__cnt") >= bound)
        )
    # texts join back onto the CANDIDATE set only (the dedup-operator
    # verification convention): the blocking join and pair aggregate
    # shuffled nothing wider than (id, len, gram, pos)
    ta = a.select(
        F.col(a_id).alias("a_id"), F.lower(F.col(a_text)).alias("a_text")
    ).where(F.col("a_id").isNotNull() & F.col("a_text").isNotNull())
    tb = b.select(
        F.col(b_id).alias("b_id"), F.lower(F.col(b_text)).alias("b_text")
    ).where(F.col("b_id").isNotNull() & F.col("b_text").isNotNull())
    verif = cands.join(ta, "a_id").join(tb, "b_id")
    # PUSHDOWN BARRIER (measured, sf0.1 documents fixture): a bare
    # levenshtein(...) <= k predicate over join-key/text columns gets
    # pushed below the pair aggregate by Catalyst, and the exact verify
    # then runs on every pre-aggregate join row (15.3M) instead of the
    # count-filtered candidates (5.6k) — 872 s vs ~25 s. Wrapping the
    # distance in a condition on the AGGREGATE output (__cnt >= 0 is
    # always true) makes the expression depend on the aggregation, so
    # the filter stays above it. test_plans.py pins the shape.
    dist = F.when(F.col("__cnt") >= 0, F.levenshtein("a_text", "b_text"))
    return verif.select(
        "a_id",
        "b_id",
        dist.alias("dist"),
    ).where(F.col("dist") <= F.lit(k))


def corpus_token_table(
    corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The corpus-side artifact for :func:`fuzzy_blocked_join_between` —
    ``(b_id, token)`` distinct rows, the exact table the full join
    builds internally. A nightly pipeline writes this ONCE
    (``corpus_token_table(...).write.parquet(path)``) and every batch
    run probes the parquet via ``corpus_tokens_path=`` instead of
    re-exploding and re-deduplicating the whole catalog per ingest."""
    return _token_table(corpus, id_col, text_col, "b")


def fuzzy_blocked_join_between(
    batch: DataFrame,
    corpus: DataFrame | None,
    batch_id: str,
    batch_text: str,
    corpus_id: str | None = None,
    corpus_text: str | None = None,
    threshold: float = 0.5,
    max_token_freq: int | None = 1000,
    corpus_tokens_path: str | None = None,
    spark=None,
) -> DataFrame:
    """INCREMENTAL entity resolution — the nightly-ingest pattern for
    :func:`fuzzy_blocked_join` (the ``dedup.minhash_lsh_pairs_between``
    / ``text.remove_repeated_substrings_between`` convention): match a
    new ``batch`` of entities against a large resolved ``corpus``
    without ever shuffling the corpus. Returns ``(batch_id, corpus_id,
    n_common, n_batch, n_corpus, jaccard)`` — exactly the rows the full
    join would emit for the same two inputs (differential-tested), with
    scores exact (verification recounts over FULL token sets).

    Plan shape at 100 TB: the batch token table is ingest-sized and
    BROADCASTS everywhere; corpus-side work is two map-side passes over
    the (ideally staged) token table — a broadcast semi-join by batch
    token values for candidate generation and a broadcast semi-join by
    candidate ids for verification. The hot-token census runs over the
    batch-token-restricted corpus rows only (tokens absent from the
    batch can never generate candidates, and restriction is by token
    VALUE so surviving tokens keep their full corpus frequency — census
    verdicts for relevant tokens are identical to the full join's).
    The only shuffles are candidate-bounded aggregates. Pass
    ``corpus_tokens_path`` (a staged :func:`corpus_token_table`
    parquet) so the corpus is never re-exploded; ``corpus`` may then be
    ``None`` (the read uses the batch's session, or ``spark=`` if
    given). When BOTH are given the
    staged artifact wins and ``corpus`` is ignored — keep the artifact
    in sync with the catalog it was built from.

    Batch-internal duplicates are the self-join problem — run
    :func:`fuzzy_blocked_join` on the batch alone for those.

    PIN LIFETIME: the batch token table is ``localCheckpoint``-pinned
    (three consumers) and its blocks stay in executor storage while
    the returned plan is alive — ingest-sized per call; dropping the
    materialized result releases them via the ContextCleaner (no
    CacheManager entry, so nothing leaks into other queries' plans —
    same discipline as :func:`fuzzy_blocked_join`)."""
    if batch is None:
        raise ValueError(
            "fuzzy_blocked_join_between: batch is required (there is no "
            "staged-artifact alternative for the ingest side)"
        )
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"fuzzy_blocked_join_between: threshold={threshold} must be in (0, 1]"
        )
    if max_token_freq is not None and max_token_freq < 1:
        raise ValueError(
            f"fuzzy_blocked_join_between: max_token_freq={max_token_freq} "
            "must be >= 1 (or None to disable the hot-token guard)"
        )
    if corpus_tokens_path is not None:
        tb = (spark or batch.sparkSession).read.parquet(corpus_tokens_path)
    else:
        if corpus is None:
            raise ValueError(
                "fuzzy_blocked_join_between: pass corpus or corpus_tokens_path"
            )
        tb = _token_table(
            corpus, corpus_id or batch_id, corpus_text or batch_text, "b"
        )
    # batch-sized, pinned for its three consumers (token-value probe,
    # census, verification) — lazy localCheckpoint, not cache(): no
    # CacheManager entry to leak into other queries' plans or across
    # repeated timed runs (see fuzzy_blocked_join), reclaimed when the
    # returned plan is dropped
    ta = _token_table(batch, batch_id, batch_text, "a").localCheckpoint(
        eager=False
    )
    bt = ta.select("token").distinct()
    # map-side: staged corpus scan filtered by the broadcast batch
    # token set; all corpus rows of surviving token VALUES are kept,
    # so per-token corpus frequencies below are exact
    tb_rel = tb.join(F.broadcast(bt), "token", "left_semi")
    ca, cb = ta, tb_rel
    if max_token_freq is not None:
        hot = (
            ta.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
            .unionByName(
                tb_rel.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
            )
            .groupBy("token")
            .agg(F.max("__f").alias("__f"))
            .where(F.col("__f") > F.lit(int(max_token_freq)))
            .select("token")
        )
        ca = ta.join(hot, "token", "left_anti")
        cb = tb_rel.join(hot, "token", "left_anti")
    cands = (
        cb.join(F.broadcast(ca), "token").select("a_id", "b_id").distinct()
    )
    # exact verification over FULL token sets: corpus tokens
    # semi-filtered to candidate ids (map-side, broadcast), batch
    # tokens broadcast — the minhash_lsh_pairs_between shape
    cand_b = cands.select("b_id").distinct()
    cs = tb.join(F.broadcast(cand_b), "b_id", "left_semi")
    sa = ta.groupBy("a_id").agg(F.count(F.lit(1)).alias("n_batch"))
    sb = cs.groupBy("b_id").agg(F.count(F.lit(1)).alias("n_corpus"))
    common = (
        cands.join(cs, "b_id")
        .join(F.broadcast(ta), ["a_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_batch") + F.col("n_corpus") - F.col("n_common")
    ).cast("double")
    return (
        common.join(F.broadcast(sa), "a_id")
        .join(sb, "b_id")
        .select(
            F.col("a_id").alias("batch_id"),
            F.col("b_id").alias("corpus_id"),
            "n_common",
            "n_batch",
            "n_corpus",
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(float(threshold)))
    )


def corpus_gram_table(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    q: int = 4,
    max_dist: int = 2,
) -> DataFrame:
    """The corpus-side artifact for :func:`edit_blocked_join_between` —
    ``(b_id, b_len, gram, pos)`` positional q-grams plus own-length
    bucket rows, the exact table the full join builds for its b side.
    Stage it with the LARGEST ``max_dist`` you will query (``q`` must
    match exactly): a bigger staged ``max_dist`` only widens the
    short-string bucket threshold, which adds candidate pairs that the
    exact verify then filters identically — final output is invariant
    (differential-tested)."""
    if q < 2:
        raise ValueError(f"corpus_gram_table: q={q} must be >= 2")
    if max_dist < 1:
        raise ValueError(f"corpus_gram_table: max_dist={max_dist} must be >= 1")
    return _qgram_table(
        corpus, id_col, text_col, "b", q, q * (max_dist + 1), int(max_dist),
        expand_short=False,
    )


# sidecar filename inside a staged gram-table directory; the leading
# underscore keeps parquet readers (Spark, DuckDB) from scanning it
GRAM_META_NAME = "_gdutils_gram_meta.json"


def stage_corpus_grams(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    q: int = 4,
    max_dist: int = 2,
) -> None:
    """Write the :func:`corpus_gram_table` parquet PLUS a ``(q,
    max_dist)`` metadata sidecar (``_gdutils_gram_meta.json`` inside the
    directory, invisible to parquet readers like ``_SUCCESS``).

    The staged artifact is only valid for probes with the SAME ``q``
    and a query ``max_dist`` <= the staged one — grams of a different
    length never equi-join and longer-than-staged-threshold strings
    lack bucket rows, so a mismatch silently loses nearly all recall.
    :func:`edit_blocked_join_between` validates the sidecar and raises
    on mismatch (this repo's fail-loudly convention); stage through
    this function (or the ``stage-linkage`` CLI) so the sidecar exists."""
    corpus_gram_table(corpus, id_col, text_col, q=q, max_dist=max_dist)\
        .write.mode("overwrite").parquet(path)
    with open(os.path.join(path, GRAM_META_NAME), "w") as f:
        json.dump({"q": int(q), "max_dist": int(max_dist)}, f)


def _validate_staged_grams(
    gb: DataFrame, path: str, q: int, k: int
) -> None:
    """Fail loudly when a staged gram table can't serve this query
    (r13 ADVICE medium): sidecar check when present; otherwise a
    LIMIT-bounded gram-length probe (legacy artifacts staged before the
    sidecar existed). A silent mismatch returns a confidently wrong,
    mostly-empty result — the worst failure mode."""
    meta_path = os.path.join(path, GRAM_META_NAME)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("q") != q:
            raise ValueError(
                f"edit_blocked_join_between: staged gram table {path} was "
                f"built with q={meta.get('q')} but the query uses q={q} — "
                "grams of different lengths never match; restage with "
                f"stage_corpus_grams(..., q={q})"
            )
        if meta.get("max_dist", 0) < k:
            raise ValueError(
                f"edit_blocked_join_between: staged gram table {path} was "
                f"built with max_dist={meta.get('max_dist')} < query "
                f"max_dist={k} — strings of length in "
                f"[{q * (meta.get('max_dist', 0) + 1)}, {q * (k + 1)}) "
                "lack bucket rows and lose recall; restage with "
                f"stage_corpus_grams(..., max_dist>={k})"
            )
        return
    # legacy artifact without a sidecar: bounded probe of real (pos>0)
    # gram lengths — catches the q mismatch; max_dist can't be checked
    # without the sidecar, so restaging is the recommendation either way
    probe = (
        gb.where(F.col("pos") > 0)
        .select(F.length("gram").alias("__l"))
        .where(F.col("__l") != F.lit(q))
        .limit(1)
        .collect()
    )
    if probe:
        raise ValueError(
            f"edit_blocked_join_between: staged gram table {path} contains "
            f"grams of length {probe[0]['__l']} but the query uses q={q} — "
            "restage via stage_corpus_grams (which also records max_dist "
            "in a validated sidecar)"
        )


def edit_blocked_join_between(
    batch: DataFrame,
    corpus: DataFrame | None,
    batch_id: str,
    batch_text: str,
    corpus_id: str | None = None,
    corpus_text: str | None = None,
    max_dist: int = 2,
    q: int = 4,
    max_gram_freq: int | None = None,
    corpus_grams_path: str | None = None,
) -> DataFrame:
    """INCREMENTAL edit-distance join — the nightly-ingest pattern for
    :func:`edit_blocked_join`: ``(batch_id, corpus_id, dist)`` for
    every batch-vs-corpus pair within Levenshtein ``max_dist``, exactly
    the pairs the full join emits for the same inputs (differential-
    tested; the full join's recall guarantee makes any candidate
    SUPERSET verify to the identical final set, which is why a staged
    gram table built with a larger ``max_dist`` stays valid).

    Plan shape at 100 TB: batch grams (ingest-sized, cached) BROADCAST
    into the (gram, pos-bucket) candidate join; the corpus gram table —
    staged parquet via ``corpus_grams_path``, never re-exploded — is
    consumed map-side: a broadcast semi-join by batch gram values, then
    the bucket-range explode (bucket arithmetic is computed from
    ``pos`` at query time, so one staged artifact serves any
    ``max_dist`` up to its build value). Corpus TEXTS are scanned once,
    column-pruned and semi-filtered to candidate ids, for the exact
    verify. The only shuffles are the candidate pair aggregate and the
    verify joins — all candidate-bounded. ``corpus`` is still required
    for the text scan (pass the table, not the gram artifact) — and
    when ``corpus_grams_path`` is given it must have been built FROM
    that same table, or blocked candidates and verify texts diverge.

    ``max_gram_freq`` semantics match the full join (census restricted
    to batch-gram values — identical verdicts for every gram that can
    generate candidates; pos-0 length-bucket rows exempt).

    Staged-artifact validity is ENFORCED: when ``corpus_grams_path``
    carries the :func:`stage_corpus_grams` sidecar, a ``q`` mismatch or
    a query ``max_dist`` above the staged build RAISES (either silently
    loses nearly all recall otherwise); sidecar-less legacy artifacts
    get a bounded gram-length probe for the ``q`` check.

    PIN LIFETIME: the batch gram table is ``localCheckpoint``-pinned
    and its blocks stay in executor storage while the returned plan is
    alive — ingest-sized per call, reclaimed when the plan is dropped
    (no CacheManager entry; same note as
    :func:`fuzzy_blocked_join_between`)."""
    if max_dist < 1:
        raise ValueError(
            f"edit_blocked_join_between: max_dist={max_dist} must be >= 1"
        )
    if q < 2:
        raise ValueError(f"edit_blocked_join_between: q={q} must be >= 2")
    if max_gram_freq is not None and max_gram_freq < 1:
        raise ValueError(
            f"edit_blocked_join_between: max_gram_freq={max_gram_freq} must "
            "be >= 1 (or None for guaranteed-recall blocking)"
        )
    if corpus is None:
        raise ValueError(
            "edit_blocked_join_between: corpus is required (texts feed the "
            "exact verify even when grams are staged)"
        )
    k = int(max_dist)
    short_len = q * (k + 1)
    cid = corpus_id or batch_id
    ctext = corpus_text or batch_text
    if corpus_grams_path is not None:
        gb = corpus.sparkSession.read.parquet(corpus_grams_path)
        _validate_staged_grams(gb, corpus_grams_path, q, k)
    else:
        gb = _qgram_table(
            corpus, cid, ctext, "b", q, short_len, k, expand_short=False
        )
    ga = _qgram_table(
        batch, batch_id, batch_text, "a", q, short_len, k, expand_short=True
    ).localCheckpoint(eager=False)
    bg = ga.select("gram").distinct()
    gb_rel = gb.join(F.broadcast(bg), "gram", "left_semi")
    use_count_filter = max_gram_freq is None
    if max_gram_freq is not None:
        # same exemption as the full join: pos-0 length-bucket rows
        # (the short-string recall path) never enter the census or the
        # anti-join; restriction to batch gram values keeps full corpus
        # frequencies for every gram that can generate candidates
        real = F.col("pos") > 0
        hot = (
            ga.where(real).groupBy("gram").agg(F.count(F.lit(1)).alias("__f"))
            .unionByName(
                gb_rel.where(real)
                .groupBy("gram")
                .agg(F.count(F.lit(1)).alias("__f"))
            )
            .groupBy("gram")
            .agg(F.max("__f").alias("__f"))
            .where(F.col("__f") > F.lit(int(max_gram_freq)))
            .select("gram")
        )

        def _exempt_anti(t: DataFrame) -> DataFrame:
            masked = t.withColumn(
                "__aj", F.when(F.col("pos") > 0, F.col("gram"))
            ).alias("__t")
            return masked.join(
                hot.alias("__h"),
                F.col("__t.__aj") == F.col("__h.gram"),
                "left_anti",
            ).drop("__aj")

        ga = _exempt_anti(ga)
        gb_rel = _exempt_anti(gb_rel)
    w = k + 1
    # identical bucket roles to the full join (batch = build side with
    # one floor bucket, corpus = probe side exploding the full floor
    # range of its [pos-k, pos+k] window) so the candidate set — and
    # therefore the count-filter tally — matches the full join exactly
    ga_b = ga.withColumn("bkt", F.floor(F.col("pos") / F.lit(w)))
    gb_b = gb_rel.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor((F.col("pos") - F.lit(k)) / F.lit(w)),
                F.floor((F.col("pos") + F.lit(k)) / F.lit(w)),
            )
        ),
    )
    joined = (
        gb_b.alias("gb")
        .join(F.broadcast(ga_b.alias("ga")), ["gram", "bkt"])
        .where(
            (F.abs(F.col("ga.pos") - F.col("gb.pos")) <= F.lit(k))
            & (F.abs(F.col("a_len") - F.col("b_len")) <= F.lit(k))
        )
    )
    cands = joined.groupBy("a_id", "b_id", "a_len", "b_len").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max(F.col("ga.pos") + F.col("gb.pos")).alias("__maxpos"),
    )
    if use_count_filter:
        bound = F.greatest("a_len", "b_len") - F.lit(q - 1) - F.lit(k * q)
        cands = cands.where(
            (F.col("__maxpos") == 0) | (F.col("__cnt") >= bound)
        )
    ta = batch.select(
        F.col(batch_id).alias("a_id"),
        F.lower(F.col(batch_text)).alias("a_text"),
    ).where(F.col("a_id").isNotNull() & F.col("a_text").isNotNull())
    cand_b = cands.select("b_id").distinct()
    tb = (
        corpus.select(
            F.col(cid).alias("b_id"), F.lower(F.col(ctext)).alias("b_text")
        )
        .where(F.col("b_id").isNotNull() & F.col("b_text").isNotNull())
        .join(F.broadcast(cand_b), "b_id", "left_semi")
    )
    verif = cands.join(F.broadcast(ta), "a_id").join(tb, "b_id")
    # same pushdown barrier as the full join (test_plans.py pins it):
    # the exact verify must stay ABOVE the pair aggregate
    dist = F.when(F.col("__cnt") >= 0, F.levenshtein("a_text", "b_text"))
    return verif.select(
        F.col("a_id").alias("batch_id"),
        F.col("b_id").alias("corpus_id"),
        dist.alias("dist"),
    ).where(F.col("dist") <= F.lit(k))
