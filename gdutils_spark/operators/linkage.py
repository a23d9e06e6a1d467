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
    triple the explode cost. Default: memory-cache for the call —
    right for dimension-scale entity tables, but the caches outlive
    the call (the returned plan references them), so repeated
    invocations accumulate executor storage; at corpus scale (or for
    repeated calls) pass ``stage_path`` — the dedup operators'
    convention (cf. ``dedup.minhash_lsh_pairs(stage_path=)``): each
    token table is written to parquet ONCE under ``stage_path`` and
    all three consumers re-read the columnar file, so executor memory
    holds nothing corpus-sized and no cache lingers after the call."""
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
        ta, tb = ta.cache(), tb.cache()
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
