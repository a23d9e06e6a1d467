"""CLI entry points: parity for the reference's ``scripts/`` surface.

One ``argparse`` multiplexer instead of 12 script files; each subcommand
mirrors a reference driver:

| subcommand          | reference script                                    |
|---------------------|-----------------------------------------------------|
| search-datasets     | scripts/dac/search_datasets.py                      |
| get-dataset-profiles| scripts/dac/get_dataset_profiles.py                 |
| get-dataset-track   | scripts/dac/get_dataset_track.py, download_tracks.sh|
| datasets-to-kml     | scripts/dac/recent_datasets_to_kml.py               |
| catalog-datasets    | scripts/catalog_dac_datasets.py                     |
| gts-obs             | scripts/dac/get_dataset_gts_obs.py                  |
| calendars           | scripts/plot_ym_calendars.py, plot_ymd_calendars.py |
| report              | scripts/build_dac_ioos_datasets_report.py           |

Plus pipeline subcommands with no reference counterpart (beyond-reference
training-data ops over one table path): ``dedup`` (exact / minhash pairs /
simhash pairs / clusters), ``sample`` (stratified hash sampling),
``pack`` (token-budget batch manifest), ``sessions`` (gap sessionization).

Tables come from ``--catalog/--profiles/--obs`` paths (parquet or CSV)
instead of live ERDDAP endpoints; every subcommand builds ONE lazy plan
and only collects at the output boundary. The reference's "recent" poll
pattern (``search_datasets.py:21-42``: min_time = now - N hours) is the
``--hours`` window here.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdutils_spark.client import GdacClient
from gdutils_spark.plot.plotter import IMG_TYPES
from gdutils_spark.sinks import to_csv_string, to_html_table, to_json_records


def _get_spark() -> SparkSession:
    from gdutils_spark.session import get_spark

    return get_spark()


def _load(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".csv"):
        return spark.read.csv(path, header=True, inferSchema=True)
    return spark.read.parquet(path)


def _client(spark: SparkSession, args) -> GdacClient:
    return GdacClient(
        spark,
        catalog=_load(spark, args.catalog),
        profiles=_load(spark, args.profiles),
        timeseries=_load(spark, args.timeseries) if args.timeseries else None,
    )


def _search_params(args) -> dict:
    params: dict = {}
    if getattr(args, "hours", None):
        params["min_time"] = (
            dt.datetime.now(dt.timezone.utc) - dt.timedelta(hours=args.hours)
        ).strftime("%Y-%m-%dT%H:%M")
    if getattr(args, "start_time", None):
        params["min_time"] = args.start_time
    if getattr(args, "end_time", None):
        params["max_time"] = args.end_time
    for cli_key, param in (
        ("north", "max_lat"),
        ("south", "min_lat"),
        ("east", "max_lon"),
        ("west", "min_lon"),
    ):
        v = getattr(args, cli_key, None)
        if v is not None:
            params[param] = v
    if getattr(args, "search_string", None):
        params["search_for"] = args.search_string
    return params


def _emit(text: str, output: str | None) -> None:
    if output:
        with open(output, "w") as f:
            f.write(text)
    else:
        sys.stdout.write(text if text.endswith("\n") else text + "\n")


def _render(df: DataFrame, fmt: str) -> str:
    if fmt == "csv":
        return to_csv_string(df)
    if fmt == "json":
        return to_json_records(df)
    if fmt == "html":
        return to_html_table(df)
    raise ValueError(f"unknown format {fmt!r}")


# -- subcommand handlers ------------------------------------------------------


def cmd_search_datasets(args) -> int:
    spark = _get_spark()
    c = _client(spark, args)
    c.search_datasets(
        _search_params(args), include_delayed_mode=args.include_delayed
    )
    if args.response == "ids":
        for ds in c.dataset_ids:
            print(ds)
        return 0
    df = c.datasets if not args.exclude_summaries else c._datasets_info
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_get_dataset_profiles(args) -> int:
    spark = _get_spark()
    c = _client(spark, args)
    df = c.get_dataset_profiles(args.dataset_id)
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_get_dataset_track(args) -> int:
    spark = _get_spark()
    c = _client(spark, args)
    track = c.get_dataset_track_geojson(
        args.dataset_id, points=not args.no_points, ndigits=args.precision
    )
    _emit(json.dumps(track), args.output)
    return 0


def cmd_datasets_to_kml(args) -> int:
    from gdutils_spark.sinks.geojson import track_geojson
    from gdutils_spark.sinks.kml import tracks_to_kml

    spark = _get_spark()
    c = _client(spark, args)
    c.search_datasets(_search_params(args))
    rows = track_geojson(
        c._require_search(), "dataset_id", time_col="time", ndigits=args.precision
    ).collect()
    _emit(tracks_to_kml([(r["dataset_id"], r["geojson"]) for r in rows]), args.output)
    return 0


def cmd_catalog_datasets(args) -> int:
    spark = _get_spark()
    c = _client(spark, args)
    c.search_datasets({})
    # catalog records sorted most-recent deployment first
    # (/root/reference/scripts/catalog_dac_datasets.py:135)
    df = c.datasets.orderBy(F.col("end_date").desc(), "dataset_id")
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_gts_obs(args) -> int:
    from gdutils_spark.osmc import DuoProfilesClient

    spark = _get_spark()
    c = _client(spark, args)
    c.search_datasets({}, dataset_ids=args.dataset_id or None)
    osmc = DuoProfilesClient(spark, _load(spark, args.obs))
    obs = osmc.get_dataset_profiles(c.datasets_summaries)
    _emit(_render(obs, args.response), args.output)
    return 0


def cmd_calendars(args) -> int:
    spark = _get_spark()
    c = _client(spark, args)
    c.search_datasets(_search_params(args))
    target = {
        "profiles": {
            "ymd": c.ymd_profiles_calendar,
            "ym": c.ym_profiles_calendar,
            "md": c.md_profiles_calendar,
        },
        "days": {
            "ymd": c.ymd_glider_days_calendar,
            "ym": c.ym_glider_days_calendar,
            "md": c.md_glider_days_calendar,
        },
        "deployments": {
            "ymd": c.ymd_deployments_calendar,
            "ym": c.ym_deployments_calendar,
            "md": c.md_deployments_calendar,
        },
    }[args.target][args.variant]
    df = target() if callable(target) else target
    if args.plot:
        from gdutils_spark.plot import plot_calendar

        ax = plot_calendar(df)
        ax.figure.savefig(args.plot, dpi=150, bbox_inches="tight")
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_report(args) -> int:
    spark = _get_spark()
    c = _client(spark, args)
    c.search_datasets({})
    df = c.datasets
    if args.glider:
        # report rows for one glider (scripts/build_dac_ioos_datasets_report.py:52-55)
        df = df.where(F.col("glider") == args.glider)
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_dedup(args) -> int:
    from gdutils_spark.operators import dedup as dd

    spark = _get_spark()
    docs = _load(spark, args.input)
    if args.method == "exact":
        df = dd.exact_duplicates(docs, args.text_col, args.id_col)
    elif args.method == "minhash":
        df = dd.minhash_lsh_pairs(
            docs, args.text_col, args.id_col, threshold=args.threshold
        )
    elif args.method == "simhash":
        df = dd.simhash_near_pairs(
            docs, args.text_col, args.id_col, max_hamming=args.max_hamming
        )
    elif args.method == "cosine":
        df = dd.cosine_tf_pairs(
            docs, args.text_col, args.id_col, threshold=args.threshold,
            shingle_k=args.shingle_k, max_token_freq=args.max_token_freq,
        )
    else:  # clusters
        pairs = dd.minhash_lsh_pairs(
            docs, args.text_col, args.id_col, threshold=args.threshold
        )
        df = dd.connected_components(pairs)
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_sample(args) -> int:
    from gdutils_spark.operators.sampling import stratified_sample

    spark = _get_spark()
    df = _load(spark, args.input)
    rates = dict(
        (k, float(v)) for k, v in (r.split("=", 1) for r in args.rate or [])
    )
    kept = stratified_sample(
        df, args.strata_col, args.id_col, rates, default_rate=args.default_rate
    )
    _emit(_render(kept.drop(args.text_col), args.response), args.output)
    return 0


def cmd_pack(args) -> int:
    from gdutils_spark.operators.sampling import pack_stats
    from gdutils_spark.operators.text import token_count

    spark = _get_spark()
    df = _load(spark, args.input)
    toks = df.select(
        F.col(args.id_col), token_count(F.col(args.text_col)).alias("n_tokens")
    )
    manifest = pack_stats(
        toks, args.id_col, "n_tokens", budget=args.budget, shards=args.shards
    )
    _emit(_render(manifest, args.response), args.output)
    return 0


def cmd_split(args) -> int:
    from gdutils_spark.operators import dedup as dd

    spark = _get_spark()
    docs = _load(spark, args.input)
    pairs = dd.minhash_lsh_pairs(
        docs, args.text_col, args.id_col, threshold=args.threshold
    )
    df = dd.leakage_safe_split(
        docs, pairs, id_col=args.id_col, holdout_frac=args.holdout_frac
    )
    _emit(_render(df, args.response), args.output)
    return 0


def cmd_export_jsonl(args) -> int:
    from gdutils_spark.operators.sampling import shard_assign

    spark = _get_spark()
    df = _load(spark, args.input)
    sharded = shard_assign(df, id_col=args.id_col, n_shards=args.shards)
    sharded.write.partitionBy("shard").mode("overwrite").json(args.dest)
    # emit the per-shard balance summary through the shared -o/-f pipe
    # like every sibling subcommand (re-read the export so the summary
    # reflects what actually landed on disk). The writer's schema is
    # known — passing it skips a full inference scan AND keeps an empty
    # export from raising 'Unable to infer schema'.
    import pyspark.sql.types as T

    data_schema = T.StructType(
        [f for f in sharded.schema.fields if f.name != "shard"]
    )
    back = spark.read.schema(data_schema).json(args.dest)
    if "shard" not in back.columns:  # empty export: no partition dirs
        back = back.withColumn("shard", F.lit(None).cast("int"))
    summary = back.groupBy(F.col("shard").cast("int").alias("shard")).count()
    _emit(_render(summary.orderBy("shard"), args.response), args.output)
    return 0


def cmd_distinct_sketch(args) -> int:
    from pyspark.sql import functions as SF

    from gdutils_spark.operators.sketches import hll_report
    from gdutils_spark.operators.text import tokens

    spark = _get_spark()
    df = _load(spark, args.input)
    if args.value_col == "token":
        df = df.select(
            args.group_col, SF.explode(tokens(SF.col(args.text_col))).alias("token")
        ).where(SF.col("token") != "")
    out = hll_report(df, args.value_col, args.group_col)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_sessions(args) -> int:
    from gdutils_spark.operators.sessions import session_stats

    spark = _get_spark()
    df = _load(spark, args.input)
    stats = session_stats(
        df,
        args.entity_col,
        args.time_col,
        gap_minutes=args.gap_minutes,
        value_col=args.value_col,
    )
    _emit(_render(stats, args.response), args.output)
    return 0


def cmd_freq_sketch(args) -> int:
    from pyspark.sql import functions as SF

    from gdutils_spark.operators.sketches import cms_estimate, cms_registers
    from gdutils_spark.operators.text import tokens

    spark = _get_spark()
    df = _load(spark, args.input)
    if args.value_col == "token":
        df = df.select(
            SF.explode(tokens(SF.col(args.text_col))).alias("token")
        ).where(SF.col("token") != "")
    # match cms_registers' NULL-skipping: a NULL group in the exact
    # counts would rank into the probes, hash to nothing, and report
    # cms_est=0 < exact_freq — a fake undercount
    df = df.where(SF.col(args.value_col).isNotNull())
    reg = cms_registers(df, args.value_col)
    exact = df.groupBy(args.value_col).agg(SF.count(SF.lit(1)).alias("exact_freq"))
    probes = exact.orderBy(
        SF.col("exact_freq").desc(), args.value_col
    ).limit(args.top)
    # registers built two lines up with the same default geometry —
    # clean by construction, skip the eager geometry-probe action
    out = cms_estimate(reg, probes, args.value_col, validate=False)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_heavy_hitters(args) -> int:
    from pyspark.sql import functions as SF

    from gdutils_spark.operators.sketches import (
        cms_heavy_hitters,
        cms_registers,
    )
    from gdutils_spark.operators.text import tokens

    spark = _get_spark()
    df = _load(spark, args.input)
    if args.value_col == "token":
        df = df.select(
            SF.explode(tokens(SF.col(args.text_col))).alias("token")
        ).where(SF.col("token") != "")
    # the (possibly token-exploded) occurrences feed up to three
    # consumers (registers, exact counts, the phi total) — pin once
    # (no subtree reuse), like the library query this mirrors
    df = df.where(SF.col(args.value_col).isNotNull()).localCheckpoint(
        eager=False
    )
    reg = cms_registers(df, args.value_col)
    # candidate set: the exact grouped counts (at warehouse scale swap
    # in a pruned per-partition top-k union — the sketch can't
    # enumerate values, so candidates are always the caller's input)
    exact = df.groupBy(args.value_col).agg(
        SF.count(SF.lit(1)).alias("exact_freq")
    )
    threshold = args.threshold
    if threshold is None:
        total = df.count()
        threshold = max(1, int(total * args.phi))
    # registers built in-session with the same default geometry —
    # clean by construction, skip the eager geometry-probe action
    out = cms_heavy_hitters(
        reg, exact, args.value_col, threshold, validate=False
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_weighted_sample(args) -> int:
    from pyspark.sql import functions as SF

    from gdutils_spark.operators.sampling import priority_sample
    from gdutils_spark.operators.text import token_count

    spark = _get_spark()
    df = _load(spark, args.input)
    if args.weight_col == "tokens":
        df = df.select(
            SF.col(args.id_col),
            token_count(SF.col(args.text_col)).alias("_w"),
        )
        weight = "_w"
    else:
        weight = args.weight_col
    out = priority_sample(df, args.id_col, weight, args.k)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_pagerank(args) -> int:
    from pyspark.sql import functions as SF

    from gdutils_spark.operators.graph import pagerank

    spark = _get_spark()
    df = _load(spark, args.input)
    out = pagerank(
        df,
        src=args.src_col,
        dst=args.dst_col,
        damping=args.damping,
        n_iters=args.iters,
        ordered_fold=not args.plain_sum,
        weight=args.weight_col,
        validate=not args.no_validate,
        start_ranks=(
            _load(spark, args.start_ranks) if args.start_ranks else None
        ),
    )
    if args.top:
        out = out.orderBy(SF.col("pr").desc(), "node").limit(args.top)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_communities(args) -> int:
    from gdutils_spark.operators.graph import label_propagation

    spark = _get_spark()
    df = _load(spark, args.input)
    seed = _load(spark, args.seed_labels) if args.seed_labels else None
    out = label_propagation(
        df,
        src=args.src_col,
        dst=args.dst_col,
        n_iters=args.iters,
        start_labels=seed,
        validate=not args.no_validate,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_triangles_incremental(args) -> int:
    from gdutils_spark.operators.graph import triangle_count_incremental

    spark = _get_spark()
    base_edges = _load(spark, args.input)
    out = triangle_count_incremental(
        _load(spark, args.base_counts),
        base_edges,
        _load(spark, args.delta),
        src=args.src_col,
        dst=args.dst_col,
    )
    if args.top:
        out = out.orderBy(
            F.col("n_triangles").desc(), F.col("node")
        ).limit(args.top)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_ivfpq_build(args) -> int:
    from gdutils_spark.operators.similarity import ivfpq_index

    spark = _get_spark()
    df = _load(spark, args.input)
    codes = ivfpq_index(
        df,
        id_col=args.id_col,
        vec_col=args.vec_col,
        n_centroids=args.centroids,
        m=args.m,
        n_codes=args.codes,
        stage_path=args.stage,
        coarse_refine_iters=args.coarse_iters,
        pq_refine_iters=args.pq_iters,
        residual=args.residual,
    )
    # staging already wrote the index + sidecars; render a tiny summary
    out = codes.groupBy("centroid").count().orderBy("centroid")
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_ivfpq_append(args) -> int:
    from gdutils_spark.operators.similarity import ivfpq_append

    spark = _get_spark()
    delta = _load(spark, args.input)
    codes = ivfpq_append(
        spark,
        args.stage,
        delta,
        id_col=args.id_col,
        vec_col=args.vec_col,
        validate=not args.no_validate,
    )
    out = codes.groupBy("centroid").count().orderBy("centroid")
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_knn(args) -> int:
    from gdutils_spark.operators import similarity as sim

    if args.stage and args.method != "ivfpq":
        # silently brute-forcing when the operator asked for a staged
        # index would return different neighbors with no warning
        raise SystemExit(
            "knn: --stage is an ivfpq-build index — pass --method ivfpq "
            f"(got --method {args.method})"
        )
    spark = _get_spark()
    vectors = _load(spark, args.input)
    queries = _load(spark, args.queries)
    kw = dict(id_col=args.id_col, vec_col=args.vec_col, k=args.k)
    if args.method == "brute":
        out = sim.knn_bruteforce(vectors, queries, **kw)
    elif args.method == "ivf":
        out = sim.knn_ivf(
            vectors, queries, n_centroids=args.centroids,
            n_probe=args.probe, **kw
        )
    else:  # ivfpq — optionally against a staged index + frozen quantizer
        extra = {}
        if args.stage:
            codes, coarse, codebook = sim.load_ivfpq_index(
                spark, args.stage, m=args.m, n_codes=args.codes,
                residual=args.residual, with_quantizer=True,
            )
            extra = dict(index=codes, coarse=coarse, codebook=codebook)
        out = sim.knn_ivf_pq(
            vectors, queries, n_centroids=args.centroids,
            n_probe=args.probe, m=args.m, n_codes=args.codes,
            residual=args.residual, **kw, **extra,
        )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_bloom_screen(args) -> int:
    from pyspark.sql import functions as SF

    from gdutils_spark.operators.sketches import bloom_bits, bloom_might_contain

    spark = _get_spark()
    hist = _load(spark, args.history).select(args.value_col)
    batch = _load(spark, args.input)
    words = bloom_bits(hist, args.value_col)
    out = bloom_might_contain(
        words, batch.select(args.id_col, args.value_col), args.value_col
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_substring_dedup(args) -> int:
    from gdutils_spark.operators.text import remove_repeated_substrings

    spark = _get_spark()
    df = _load(spark, args.input)
    out = remove_repeated_substrings(
        df, args.text_col, args.id_col, k=args.min_tokens,
        stage_path=args.stage_path,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_quantiles(args) -> int:
    from gdutils_spark.operators.sketches import hist_quantiles, hist_registers

    spark = _get_spark()
    df = _load(spark, args.input)
    reg = hist_registers(df, args.value_col, args.lo, args.hi, args.bins)
    # registers built one line up with the same (lo, hi, bins) — clean
    # by construction, skip the eager geometry-probe action
    out = hist_quantiles(
        reg, args.q, args.lo, args.hi, args.bins, validate=False
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_bpe_train(args) -> int:
    from gdutils_spark.operators.text import bpe_encode_stats, bpe_train

    spark = _get_spark()
    df = _load(spark, args.input)
    if args.encode:
        out = bpe_encode_stats(
            df, id_col=args.id_col, text_col=args.text_col,
            n_merges=args.merges,
        )
    else:
        out = bpe_train(df, text_col=args.text_col, n_merges=args.merges)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_triangles(args) -> int:
    from gdutils_spark.operators.graph import triangle_count

    spark = _get_spark()
    df = _load(spark, args.input)
    out = triangle_count(df, src=args.src_col, dst=args.dst_col)
    if args.top:
        out = out.orderBy(
            F.col("n_triangles").desc(), F.col("node")
        ).limit(args.top)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_kcore(args) -> int:
    from gdutils_spark.operators.graph import k_core

    spark = _get_spark()
    df = _load(spark, args.input)
    out = k_core(
        df, k=args.k, src=args.src_col, dst=args.dst_col,
        n_iters=args.iters,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_set_overlap(args) -> int:
    from gdutils_spark.operators.sketches import kmv_overlap_report

    spark = _get_spark()
    a = _load(spark, args.input)
    b = _load(spark, args.other)
    out = kmv_overlap_report(a, b, args.value_col, k=args.k)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_outliers(args) -> int:
    from gdutils_spark.operators.summaries import mad_outlier_summary

    spark = _get_spark()
    df = _load(spark, args.input)
    out = mad_outlier_summary(
        df, args.value_col, args.group_col, threshold=args.threshold
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_fk_audit(args) -> int:
    from gdutils_spark.operators.summaries import fk_audit

    spark = _get_spark()
    child = _load(spark, args.input)
    parent = _load(spark, args.parent)
    name = args.name or f"{args.child_key}->{args.parent_key}"
    out = fk_audit([(name, child, args.child_key, parent, args.parent_key)])
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_resample(args) -> int:
    from gdutils_spark.operators.timeseries import resample_interpolate

    spark = _get_spark()
    df = _load(spark, args.input)
    out = resample_interpolate(
        df, args.entity_col, args.time_col, args.value_col, args.step_seconds
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_image_dups(args) -> int:
    from gdutils_spark.operators.multimodal import (
        dhash_near_dup_pairs,
        image_dhash,
    )

    spark = _get_spark()
    media = _load(spark, args.input)
    out = dhash_near_dup_pairs(
        image_dhash(media),
        max_hamming=args.max_hamming,
        stage_path=args.stage_path,
        max_band_freq=args.max_band_freq or None,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_cv_folds(args) -> int:
    from gdutils_spark.operators.timeseries import rolling_origin_folds

    spark = _get_spark()
    df = _load(spark, args.input)
    out = rolling_origin_folds(
        df, args.time_col, args.n_folds, args.horizon_seconds
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_fuzzy_match(args) -> int:
    from gdutils_spark.operators.linkage import fuzzy_blocked_join

    spark = _get_spark()
    a = _load(spark, args.input)
    b = _load(spark, args.other)
    out = fuzzy_blocked_join(
        a,
        b,
        args.id_col,
        args.text_col,
        args.other_id_col or args.id_col,
        args.other_text_col or args.text_col,
        threshold=args.threshold,
        max_token_freq=args.max_token_freq or None,
        stage_path=args.stage_path,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_edit_match(args) -> int:
    import shutil
    import tempfile

    from gdutils_spark.operators.linkage import edit_blocked_join

    spark = _get_spark()
    a = _load(spark, args.input)
    b = _load(spark, args.other)
    # with the hot-gram guard on, the census is a second consumer of
    # each gram table and an unstaged explode recomputes — exactly the
    # recompute the operator docstring tells callers to stage away, so
    # stage to a throwaway tempdir when the user didn't give a path
    # (safe: _emit materializes the result before cleanup)
    stage, tmp = args.stage_path, None
    if stage is None and args.max_gram_freq:
        tmp = tempfile.mkdtemp(prefix="gdutils_edit_stage_")
        stage = tmp
    try:
        out = edit_blocked_join(
            a,
            b,
            args.id_col,
            args.text_col,
            args.other_id_col or args.id_col,
            args.other_text_col or args.text_col,
            max_dist=args.max_dist,
            q=args.q,
            max_gram_freq=args.max_gram_freq or None,
            stage_path=stage,
        )
        _emit(_render(out, args.response), args.output)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


def cmd_fuzzy_match_between(args) -> int:
    from gdutils_spark.operators.linkage import fuzzy_blocked_join_between

    spark = _get_spark()
    batch = _load(spark, args.input)
    corpus = _load(spark, args.corpus) if args.corpus else None
    out = fuzzy_blocked_join_between(
        batch,
        corpus,
        args.id_col,
        args.text_col,
        args.corpus_id_col or args.id_col,
        args.corpus_text_col or args.text_col,
        threshold=args.threshold,
        max_token_freq=args.max_token_freq or None,
        corpus_tokens_path=args.corpus_tokens_path,
        spark=spark,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_edit_match_between(args) -> int:
    from gdutils_spark.operators.linkage import edit_blocked_join_between

    spark = _get_spark()
    batch = _load(spark, args.input)
    corpus = _load(spark, args.corpus)
    out = edit_blocked_join_between(
        batch,
        corpus,
        args.id_col,
        args.text_col,
        args.corpus_id_col or args.id_col,
        args.corpus_text_col or args.text_col,
        max_dist=args.max_dist,
        q=args.q,
        max_gram_freq=args.max_gram_freq or None,
        corpus_grams_path=args.corpus_grams_path,
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_stage_linkage(args) -> int:
    """Build the staged corpus artifact the *-between commands probe."""
    from gdutils_spark.operators.linkage import (
        corpus_token_table,
        stage_corpus_grams,
    )

    spark = _get_spark()
    corpus = _load(spark, args.input)
    if args.kind == "tokens":
        corpus_token_table(corpus, args.id_col, args.text_col)\
            .write.mode("overwrite").parquet(args.path)
    else:
        # writes the (q, max_dist) sidecar that edit-match-between
        # validates — a q/max_dist mismatch now raises instead of
        # silently returning an almost-empty match set
        stage_corpus_grams(
            corpus, args.id_col, args.text_col, args.path,
            q=args.q, max_dist=args.max_dist,
        )
    _emit(f"staged {args.kind} -> {args.path}", args.output)
    return 0


def cmd_stage_ingest(args) -> int:
    """Build the staged corpus artifacts the nightly admission probes
    (fingerprint set + bloom sketch + banded signatures) — run once per
    corpus version; see queries_ext.stage_ingest_corpus."""
    from gdutils_spark.queries_ext import stage_ingest_corpus

    spark = _get_spark()
    stage_ingest_corpus(spark, args.input, args.stage_dir)
    _emit(f"staged ingest corpus -> {args.stage_dir}", args.output)
    return 0


def cmd_ingest_append(args) -> int:
    """Fold an admitted batch into the staged corpus artifacts in place
    (append == rebuild, differential-tested) — the third leg of the
    nightly recipe: stage-ingest once, ingest-admit nightly,
    ingest-append the admitted docs."""
    from gdutils_spark.queries_ext import append_ingest_corpus

    spark = _get_spark()
    batch = _load(spark, args.input)
    append_ingest_corpus(
        spark, batch, args.stage_dir,
        id_col=args.id_col, text_col=args.text_col,
    )
    _emit(f"appended batch -> {args.stage_dir}", args.output)
    return 0


def cmd_ingest_admit(args) -> int:
    """Run the nightly batch-vs-corpus admission report; with
    --stage-dir the corpus side is probed from staged artifacts
    (zero corpus-wide shuffle), without it everything is recomputed
    fresh (same output, differential-tested)."""
    from gdutils_spark.queries_ext import doc_ingest_pipeline

    spark = _get_spark()
    out = doc_ingest_pipeline(
        spark, args.input, stage_dir=args.stage_dir or None
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_trend(args) -> int:
    from gdutils_spark.operators.summaries import group_trend

    spark = _get_spark()
    df = _load(spark, args.input)
    out = group_trend(df, args.group_col, args.x_col, args.y_col)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_snapshot_diff(args) -> int:
    from gdutils_spark.operators.cdc import snapshot_diff

    spark = _get_spark()
    old = _load(spark, args.input)
    new = _load(spark, args.new)
    out = snapshot_diff(old, new, args.key, args.compare or None)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_edge_jaccard(args) -> int:
    from gdutils_spark.operators.graph import edge_jaccard

    spark = _get_spark()
    edges = _load(spark, args.input)
    out = edge_jaccard(edges, src=args.src_col, dst=args.dst_col)
    if args.top:
        out = out.orderBy(F.col("jaccard").desc(), "u", "v").limit(args.top)
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_winsorize(args) -> int:
    from gdutils_spark.operators.summaries import winsorized_summary

    spark = _get_spark()
    df = _load(spark, args.input)
    out = winsorized_summary(
        df, args.group_col, args.value_col, args.lower, args.upper
    )
    _emit(_render(out, args.response), args.output)
    return 0


def cmd_cdc_apply(args) -> int:
    from gdutils_spark.operators.cdc import apply_cdc

    spark = _get_spark()
    snapshot = _load(spark, args.input)
    changes = _load(spark, args.changes)
    out = apply_cdc(
        snapshot, changes, args.key, op_col=args.op_col,
        seq_col=args.seq_col, validate=not args.no_validate,
    )
    if args.dest:
        out.write.mode("overwrite").parquet(args.dest)
        print(args.dest)
        return 0
    _emit(_render(out, args.response), args.output)
    return 0


def _img_ext(img_type: str) -> str:
    return img_type[-3:].lower()


def _plot_emit(plotter, url: str, args) -> int:
    """Print the server-render URL, or download the image when asked
    (the reference scripts' debug-vs-download split)."""
    if args.download:
        path = os.path.join(args.download, f"{args.image_name}.{_img_ext(args.img_type)}")
        out = plotter.download_image(url, path)
        if out is None:
            return 1
        print(out)
        return 0
    print(url)
    return 0


def cmd_plot_map(args) -> int:
    """scripts/dac/plot_dataset_map.py equivalent: track-map image request
    for a dataset (longitude × latitude, colored by time unless a fixed
    marker color is given)."""
    from gdutils_spark.plot.plotter import ErddapPlotter

    plotter = ErddapPlotter(args.server, response=args.img_type)
    plotter.set_y_range(ascending=False)
    plotter.set_colorbar(colorbar=args.colorbar)
    if args.zoom:
        plotter.set_zoom(args.zoom)
    if args.no_legend:
        plotter.set_legend_loc("Off")
        plotter.set_trim_pixels()
    if args.color:
        plotter.set_marker_color(args.color)
        url = plotter.build_image_request(args.dataset_id, "longitude", "latitude")
    else:
        url = plotter.build_image_request(
            args.dataset_id, "longitude", "latitude", "time"
        )
    args.image_name = f"{args.dataset_id}_track_map_{args.img_type}"
    return _plot_emit(plotter, url, args)


def cmd_plot_variable(args) -> int:
    """scripts/dac/plot_dataset_variable.py equivalent: time-series or
    profile image request, with the last-N-hours window expressed as a
    FUNCTIONAL constraint (time>=max(time)-Nhours) the server evaluates
    against the dataset's own extent — no max(time) round-trip."""
    from gdutils_spark.plot.plotter import ErddapPlotter

    plotter = ErddapPlotter(args.server, response=args.img_type)
    plotter.set_colorbar(colorbar=args.colorbar)
    plotter.set_y_range(min_val=0, ascending=False)
    if args.color:
        plotter.set_marker_color(args.color)
    if args.no_legend:
        plotter.set_legend_loc("Off")
        plotter.set_trim_pixels()
    if not args.plot_all:
        if not args.start_date and not args.end_date:
            plotter.add_constraint("time>=", f"max(time)-{args.hours:g}hours")
        else:
            if args.start_date:
                plotter.add_constraint("time>=", args.start_date)
            if args.end_date:
                plotter.add_constraint("time<=", args.end_date)
    if args.profiles:
        c = None if args.color else "time"
        url = plotter.build_image_request(args.dataset_id, args.variable, "depth", c)
        args.image_name = f"{args.dataset_id}_{args.variable}_profiles_{args.img_type}"
    else:
        url = plotter.build_image_request(args.dataset_id, "time", "depth", args.variable)
        args.image_name = f"{args.dataset_id}_{args.variable}_ts_{args.img_type}"
    return _plot_emit(plotter, url, args)


DEFAULT_EOVS = ("temperature", "salinity", "density", "conductivity")


def cmd_recent_imagery(args) -> int:
    """scripts/dac/download_recent_dac_imagery.sh equivalent: for every
    dataset updated in the last N hours (or the ids given), emit the full
    imagery manifest — track map + time-series and profile plots per
    ocean variable — as TSV (dataset, image name, URL), or download into
    per-dataset directories with --download. The recency filter runs
    server-side (Advanced Search min_time); the per-plot time window is
    the functional max(time)-Nhours constraint."""
    from gdutils_spark.plot.plotter import ErddapPlotter

    ids = list(args.dataset_ids)
    if not ids:
        from gdutils_spark.client import GdacClient

        start = dt.datetime.now(dt.timezone.utc) - dt.timedelta(hours=args.hours)
        c = GdacClient(_get_spark(), server=args.server)
        c.search_datasets(params={"min_time": start.strftime("%Y-%m-%dT%H:%M")})
        ids = [r["dataset_id"] for r in c.datasets.select("dataset_id").collect()]
        if not ids:
            print("no datasets updated in the window", file=sys.stderr)
            return 0

    plotter = ErddapPlotter(args.server, response=args.img_type)
    ext = _img_ext(args.img_type)
    manifest: list[tuple[str, str, str]] = []
    for ds in ids:
        plotter.reset_plot_params()
        plotter.set_colorbar(colorbar=args.colorbar)
        plotter.set_y_range(ascending=False)
        url = plotter.build_image_request(ds, "longitude", "latitude", "time")
        manifest.append((ds, f"{ds}_track_map_{args.img_type}.{ext}", url))
        plotter.add_constraint("time>=", f"max(time)-{args.hours:g}hours")
        plotter.set_y_range(min_val=0, ascending=False)
        for eov in args.variables:
            url = plotter.build_image_request(ds, "time", "depth", eov)
            manifest.append((ds, f"{ds}_{eov}_ts_{args.img_type}.{ext}", url))
            url = plotter.build_image_request(ds, eov, "depth", "time")
            manifest.append((ds, f"{ds}_{eov}_profiles_{args.img_type}.{ext}", url))
        plotter.remove_constraint("time>=")

    if args.download:
        failures = 0
        for ds, name, url in manifest:
            d = os.path.join(args.download, ds, "imagery")
            os.makedirs(d, exist_ok=True)
            out = plotter.download_image(url, os.path.join(d, name))
            if out:
                print(out)
            else:
                failures += 1
                print(f"FAILED {ds} {name}", file=sys.stderr)
        return 1 if failures else 0
    for ds, name, url in manifest:
        print(f"{ds}\t{name}\t{url}")
    return 0


# -- parser -------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gdutils-spark")
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, handler, **kw):
        sp = sub.add_parser(name, **kw)
        sp.set_defaults(handler=handler)
        sp.add_argument("--catalog", required=True, help="catalog table path")
        sp.add_argument("--profiles", required=True, help="profiles table path")
        sp.add_argument("--timeseries", help="sensor time-series table path")
        sp.add_argument("-o", "--output", help="write to file instead of stdout")
        sp.add_argument(
            "-f", "--response", default="csv", choices=["csv", "json", "html", "ids"]
        )
        return sp

    def add_search_args(sp):
        sp.add_argument("--hours", type=float, default=None)
        sp.add_argument("--start-time")
        sp.add_argument("--end-time")
        sp.add_argument("--north", type=float)
        sp.add_argument("--south", type=float)
        sp.add_argument("--east", type=float)
        sp.add_argument("--west", type=float)
        sp.add_argument("-s", "--search-string")

    sp = add("search-datasets", cmd_search_datasets)
    add_search_args(sp)
    sp.add_argument("--include-delayed", action="store_true")
    sp.add_argument("--exclude-summaries", action="store_true")

    sp = add("get-dataset-profiles", cmd_get_dataset_profiles)
    sp.add_argument("dataset_id")

    sp = add("get-dataset-track", cmd_get_dataset_track)
    sp.add_argument("dataset_id")
    sp.add_argument("--no-points", action="store_true")
    sp.add_argument("--precision", type=int, default=3)

    sp = add("datasets-to-kml", cmd_datasets_to_kml)
    add_search_args(sp)
    sp.add_argument("--precision", type=int, default=3)

    add("catalog-datasets", cmd_catalog_datasets)

    sp = add("gts-obs", cmd_gts_obs)
    sp.add_argument("--obs", required=True, help="GTS observations table path")
    sp.add_argument("-d", "--dataset-id", action="append")

    sp = add("calendars", cmd_calendars)
    add_search_args(sp)
    sp.add_argument("--target", default="profiles",
                    choices=["profiles", "days", "deployments"])
    sp.add_argument("--variant", default="ym", choices=["ymd", "ym", "md"])
    sp.add_argument("--plot", help="also render a heatmap PNG to this path")

    sp = add("report", cmd_report)
    sp.add_argument("--glider")

    # plot subcommands: URL builders against an ERDDAP server, no tables
    def add_plot(name, handler):
        sp = sub.add_parser(name)
        sp.set_defaults(handler=handler)
        sp.add_argument("dataset_id")
        sp.add_argument("--server", required=True, help="ERDDAP base URL")
        sp.add_argument(
            "-f",
            "--format",
            dest="img_type",
            default="largePng",
            choices=IMG_TYPES,
        )
        sp.add_argument("-c", "--color", help="fixed marker color (else time-coded)")
        sp.add_argument("--colorbar", default="Rainbow2")
        sp.add_argument("--no-legend", action="store_true")
        sp.add_argument("-d", "--download", help="download image into this directory")
        return sp

    sp = add_plot("plot-map", cmd_plot_map)
    sp.add_argument("-z", "--zoom", choices=["in", "in2", "in8", "out", "out2", "out8"])

    sp = add_plot("plot-variable", cmd_plot_variable)
    sp.add_argument("variable", help="dataset variable to plot")
    sp.add_argument("--profiles", action="store_true",
                    help="variable × depth profiles instead of time series")
    sp.add_argument("--hours", type=float, default=24.0)
    sp.add_argument("--start-date")
    sp.add_argument("--end-date")
    sp.add_argument("--plot-all", action="store_true")

    sp = sub.add_parser("recent-imagery")
    sp.set_defaults(handler=cmd_recent_imagery)
    sp.add_argument("dataset_ids", nargs="*",
                    help="explicit ids; else search datasets updated in --hours")
    sp.add_argument("--server", required=True, help="ERDDAP base URL")
    sp.add_argument("--hours", type=float, default=1.0)
    sp.add_argument("-f", "--format", dest="img_type", default="largePng",
                    choices=IMG_TYPES)
    sp.add_argument("--colorbar", default="Rainbow2")
    sp.add_argument("--variables", nargs="+", default=list(DEFAULT_EOVS))
    sp.add_argument("-d", "--download",
                    help="download into DIR/<dataset>/imagery/ instead of printing")

    # pipeline subcommands: operate on a single table path, no catalog
    def add_pipeline(name, handler, **kw):
        sp = sub.add_parser(name, **kw)
        sp.set_defaults(handler=handler)
        sp.add_argument("--input", required=True, help="input table path")
        sp.add_argument("-o", "--output", help="write to file instead of stdout")
        sp.add_argument("-f", "--response", default="csv", choices=["csv", "json"])
        return sp

    sp = add_pipeline("dedup", cmd_dedup)
    sp.add_argument("--method", default="exact",
                    choices=["exact", "minhash", "simhash", "cosine", "clusters"])
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--max-hamming", type=int, default=3)
    sp.add_argument("--shingle-k", type=int, default=None,
                    help="cosine unit = k-token shingles (mandatory on "
                    "small-vocabulary corpora — see SCALE.md)")
    sp.add_argument("--max-token-freq", type=int, default=None,
                    help="cosine hot-token cap: candidates only, "
                    "emitted scores stay exact")

    sp = add_pipeline("sample", cmd_sample)
    sp.add_argument("--strata-col", default="lang")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--rate", action="append", metavar="STRATUM=RATE")
    sp.add_argument("--default-rate", type=float, default=1.0)

    sp = add_pipeline("pack", cmd_pack)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--budget", type=int, default=2048)
    sp.add_argument("--shards", type=int, default=8)

    sp = add_pipeline("sessions", cmd_sessions)
    sp.add_argument("--entity-col", default="user_id")
    sp.add_argument("--time-col", default="ts")
    sp.add_argument("--value-col", default=None)
    sp.add_argument("--gap-minutes", type=int, default=30)

    sp = add_pipeline("split", cmd_split)
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--holdout-frac", type=float, default=0.1)

    sp = add_pipeline("export-jsonl", cmd_export_jsonl)
    sp.add_argument("--dest", required=True, help="output directory for shards")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--shards", type=int, default=16)

    sp = add_pipeline("distinct-sketch", cmd_distinct_sketch)
    sp.add_argument("--group-col", default="source")
    sp.add_argument("--value-col", default="token",
                    help="'token' explodes --text-col; else a column name")
    sp.add_argument("--text-col", default="text")

    sp = add_pipeline("freq-sketch", cmd_freq_sketch)
    sp.add_argument("--value-col", default="token",
                    help="'token' explodes --text-col; else a column name")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--top", type=int, default=20)

    sp = add_pipeline("heavy-hitters", cmd_heavy_hitters)
    sp.add_argument("--value-col", default="token",
                    help="'token' explodes --text-col; else a column name")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--threshold", type=int, default=None,
                    help="absolute frequency cut (else phi*N)")
    sp.add_argument("--phi", type=float, default=0.001,
                    help="relative cut when --threshold is not given")

    sp = add_pipeline("weighted-sample", cmd_weighted_sample)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--weight-col", default="tokens",
                    help="'tokens' counts --text-col tokens; else a column")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--k", type=int, default=64,
                    help="sample size (priority sampling, no RNG)")

    sp = add_pipeline("pagerank", cmd_pagerank)
    sp.add_argument("--src-col", default="src")
    sp.add_argument("--dst-col", default="dst")
    sp.add_argument("--weight-col", default=None,
                    help="integer edge-weight column (pre-aggregated)")
    sp.add_argument("--damping", type=float, default=0.85)
    sp.add_argument("--iters", type=int, default=3)
    sp.add_argument("--top", type=int, default=0,
                    help="keep only the top-N nodes by rank")
    sp.add_argument("--plain-sum", action="store_true",
                    help="map-combinable sums instead of the bit-exact "
                    "ordered fold (the hub-skew-safe production path)")
    sp.add_argument("--no-validate", action="store_true",
                    help="skip the eager weight probes (trusted, "
                    "pre-aggregated weights)")
    sp.add_argument("--start-ranks",
                    help="warm-start rank table (node, pr) — the "
                    "incremental nightly path; run 1-2 catch-up iters")

    sp = add_pipeline("communities", cmd_communities)
    sp.add_argument("--src-col", default="src")
    sp.add_argument("--dst-col", default="dst")
    sp.add_argument("--iters", type=int, default=3)
    sp.add_argument("--seed-labels",
                    help="warm-start label table (node, label) — the "
                    "incremental nightly path; run 1 catch-up round")
    sp.add_argument("--no-validate", action="store_true",
                    help="skip the duplicate-seed probe (labelings "
                    "unique by construction)")

    sp = add_pipeline("triangles-incremental", cmd_triangles_incremental)
    sp.add_argument("--base-counts", required=True,
                    help="prior triangles output (node, n_triangles)")
    sp.add_argument("--delta", required=True,
                    help="tonight's new edge batch")
    sp.add_argument("--src-col", default="src")
    sp.add_argument("--dst-col", default="dst")
    sp.add_argument("--top", type=int, default=0)

    sp = add_pipeline("ivfpq-build", cmd_ivfpq_build)
    sp.add_argument("--stage", required=True,
                    help="parquet path for the staged index (+ geometry "
                    "and quantizer sidecars)")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("--vec-col", default="embedding")
    sp.add_argument("--centroids", type=int, default=16)
    sp.add_argument("--m", type=int, default=4)
    sp.add_argument("--codes", type=int, default=8)
    sp.add_argument("--coarse-iters", type=int, default=0,
                    help="Lloyd rounds for the coarse quantizer")
    sp.add_argument("--pq-iters", type=int, default=0,
                    help="Lloyd rounds for the PQ codebooks")
    sp.add_argument("--residual", action="store_true",
                    help="encode x - centroid(x) (the Faiss default)")

    sp = add_pipeline("ivfpq-append", cmd_ivfpq_append)
    sp.add_argument("--stage", required=True,
                    help="staged index to append into (frozen quantizer "
                    "from its sidecar)")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("--vec-col", default="embedding")
    sp.add_argument("--no-validate", action="store_true",
                    help="skip the duplicate-id probe (disjoint-by-"
                    "construction feed)")

    sp = add_pipeline("knn", cmd_knn)
    sp.add_argument("--queries", required=True,
                    help="query-vector table (top-k-request-sized)")
    sp.add_argument("--method", default="brute",
                    choices=["brute", "ivf", "ivfpq"])
    sp.add_argument("--k", type=int, default=5)
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("--vec-col", default="embedding")
    sp.add_argument("--centroids", type=int, default=16)
    sp.add_argument("--probe", type=int, default=4)
    sp.add_argument("--m", type=int, default=4)
    sp.add_argument("--codes", type=int, default=8)
    sp.add_argument("--residual", action="store_true")
    sp.add_argument("--stage",
                    help="search a staged ivfpq-build index (with its "
                    "frozen quantizer) instead of encoding inline")

    sp = add_pipeline("bloom-screen", cmd_bloom_screen)
    sp.add_argument("--history", required=True,
                    help="table whose values seed the filter")
    sp.add_argument("--value-col", default="fp")
    sp.add_argument("--id-col", default="doc_id")

    sp = add_pipeline("substring-dedup", cmd_substring_dedup)
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--min-tokens", type=int, default=8,
                    help="minimum repeated-span length (Lee et al. knob)")
    sp.add_argument("--stage-path", help="stage the shingle-site table here")

    sp = add_pipeline("quantiles", cmd_quantiles)
    sp.add_argument("--value-col", default="value")
    sp.add_argument("--lo", type=float, required=True)
    sp.add_argument("--hi", type=float, required=True)
    sp.add_argument("--bins", type=int, default=512)
    sp.add_argument("--q", type=float, action="append", required=True,
                    help="quantile in [0,1] (repeatable)")

    sp = add_pipeline("bpe-train", cmd_bpe_train)
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--merges", type=int, default=8,
                    help="number of BPE merge rounds to learn")
    sp.add_argument("--encode", action="store_true",
                    help="emit per-document token counts instead of the merge table")

    sp = add_pipeline("triangles", cmd_triangles)
    sp.add_argument("--src-col", default="src")
    sp.add_argument("--dst-col", default="dst")
    sp.add_argument("--top", type=int, default=0,
                    help="keep only the top-N nodes by triangle count")

    sp = add_pipeline("kcore", cmd_kcore)
    sp.add_argument("--k", type=int, required=True,
                    help="minimum in-core degree")
    sp.add_argument("--src-col", default="src")
    sp.add_argument("--dst-col", default="dst")
    sp.add_argument("--iters", type=int, default=4,
                    help="bounded peeling rounds (extra rounds are no-ops)")

    sp = add_pipeline("set-overlap", cmd_set_overlap)
    sp.add_argument("--other", required=True,
                    help="second table for the overlap estimate")
    sp.add_argument("--value-col", default="doc_id")
    sp.add_argument("--k", type=int, default=256,
                    help="KMV sketch size (rel error ~1/sqrt(k-2))")

    sp = add_pipeline("outliers", cmd_outliers)
    sp.add_argument("--value-col", default="value")
    sp.add_argument("--group-col", default="event_type")
    sp.add_argument("--threshold", type=float, default=3.5,
                    help="modified z-score cut (Iglewicz-Hoaglin 3.5)")

    sp = add_pipeline("fk-audit", cmd_fk_audit)
    sp.add_argument("--parent", required=True, help="parent table path")
    sp.add_argument("--child-key", required=True)
    sp.add_argument("--parent-key", required=True)
    sp.add_argument("--name", help="fk_name label (default child_key->parent_key)")

    sp = add_pipeline("resample", cmd_resample)
    sp.add_argument("--entity-col", default="user_id")
    sp.add_argument("--time-col", default="ts")
    sp.add_argument("--value-col", default="value")
    sp.add_argument("--step-seconds", type=int, default=3600)

    sp = add_pipeline("image-dups", cmd_image_dups)
    sp.add_argument("--max-hamming", type=int, default=16)
    # default 1024 mirrors the operator's measured default (SCALE.md r11
    # dHash probe); 0 disables the guard (flat-image-clustered corpora)
    sp.add_argument("--max-band-freq", type=int, default=1024,
                    help="skew guard: drop band values shared by more "
                    "than this many images from candidate generation; "
                    "0 disables")
    sp.add_argument("--stage-path",
                    help="stage the hash table as parquet here (corpus scale) "
                    "instead of memory-caching it")

    sp = add_pipeline("cv-folds", cmd_cv_folds)
    sp.add_argument("--time-col", default="ts")
    sp.add_argument("--n-folds", type=int, default=5)
    sp.add_argument("--horizon-seconds", type=int, default=86400)

    sp = add_pipeline("fuzzy-match", cmd_fuzzy_match)
    sp.add_argument("--other", required=True, help="second table path")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--other-id-col", help="defaults to --id-col")
    sp.add_argument("--other-text-col", help="defaults to --text-col")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--max-token-freq", type=int, default=1000,
                    help="blocking skew guard: tokens on more rows than "
                    "this never generate candidates (scores stay exact); "
                    "0 disables")
    sp.add_argument("--stage-path",
                    help="stage the token tables as parquet here (corpus "
                    "scale) instead of memory-caching them")

    sp = add_pipeline("edit-match", cmd_edit_match)
    sp.add_argument("--other", required=True, help="second table path")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--other-id-col", help="defaults to --id-col")
    sp.add_argument("--other-text-col", help="defaults to --text-col")
    sp.add_argument("--max-dist", type=int, default=2,
                    help="max Levenshtein distance")
    sp.add_argument("--q", type=int, default=4, help="blocking gram size")
    sp.add_argument("--max-gram-freq", type=int, default=0,
                    help="optional hot-gram guard (disables the count "
                    "filter; 0 = guaranteed-recall default)")
    sp.add_argument("--stage-path",
                    help="stage the gram tables as parquet here; when "
                    "--max-gram-freq is set and this is omitted, a "
                    "throwaway tempdir is staged automatically (the "
                    "census double-consumes each gram table)")

    sp = add_pipeline("fuzzy-match-between", cmd_fuzzy_match_between)
    sp.add_argument("--corpus", help="corpus table path (omit when "
                    "--corpus-tokens-path is staged)")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--corpus-id-col", help="defaults to --id-col")
    sp.add_argument("--corpus-text-col", help="defaults to --text-col")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--max-token-freq", type=int, default=1000)
    sp.add_argument("--corpus-tokens-path",
                    help="staged corpus_token_table parquet (see "
                    "stage-linkage); the corpus is then never re-exploded")

    sp = add_pipeline("edit-match-between", cmd_edit_match_between)
    sp.add_argument("--corpus", required=True, help="corpus table path "
                    "(texts feed the exact verify even with staged grams)")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--corpus-id-col", help="defaults to --id-col")
    sp.add_argument("--corpus-text-col", help="defaults to --text-col")
    sp.add_argument("--max-dist", type=int, default=2)
    sp.add_argument("--q", type=int, default=4)
    sp.add_argument("--max-gram-freq", type=int, default=0)
    sp.add_argument("--corpus-grams-path",
                    help="staged corpus_gram_table parquet (see "
                    "stage-linkage); stage with the largest max-dist "
                    "you will query")

    sp = add_pipeline("stage-linkage", cmd_stage_linkage)
    sp.add_argument("--kind", required=True, choices=["tokens", "grams"])
    sp.add_argument("--path", required=True, help="output parquet path")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--q", type=int, default=4)
    sp.add_argument("--max-dist", type=int, default=2)

    sp = add_pipeline("stage-ingest", cmd_stage_ingest)
    sp.add_argument("--stage-dir", required=True,
                    help="artifact directory (corpus_fp + corpus_fp_bloom "
                    "+ lsh_banded); --input is the sf table dir holding "
                    "documents.parquet")

    sp = add_pipeline("ingest-admit", cmd_ingest_admit)
    sp.add_argument("--stage-dir",
                    help="staged artifacts from stage-ingest; omit to "
                    "recompute the corpus side fresh (same output)")

    sp = add_pipeline("ingest-append", cmd_ingest_append)
    sp.add_argument("--stage-dir", required=True,
                    help="staged artifacts to grow; --input is the "
                    "admitted-batch table (append each batch ONCE)")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")

    sp = add_pipeline("trend", cmd_trend)
    sp.add_argument("--group-col", default="event_type")
    sp.add_argument("--x-col", default="day_idx")
    sp.add_argument("--y-col", default="value")

    sp = add_pipeline("snapshot-diff", cmd_snapshot_diff)
    sp.add_argument("--new", required=True, help="new snapshot table path")
    sp.add_argument("--key", action="append", required=True,
                    help="key column (repeatable)")
    sp.add_argument("--compare", action="append",
                    help="compared column (repeatable; default: all "
                    "shared non-key columns)")

    sp = add_pipeline("edge-jaccard", cmd_edge_jaccard)
    sp.add_argument("--src-col", default="src")
    sp.add_argument("--dst-col", default="dst")
    sp.add_argument("--top", type=int, default=0,
                    help="keep only the strongest N edges (0 = all)")

    sp = add_pipeline("winsorize", cmd_winsorize)
    sp.add_argument("--group-col", default="event_type")
    sp.add_argument("--value-col", default="value")
    sp.add_argument("--lower", type=float, default=0.05)
    sp.add_argument("--upper", type=float, default=0.95)

    sp = add_pipeline("cdc-apply", cmd_cdc_apply)
    sp.add_argument("--changes", required=True,
                    help="change-batch table (snapshot schema + op col)")
    sp.add_argument("--key", action="append", required=True,
                    help="merge key column (repeatable)")
    sp.add_argument("--op-col", default="op")
    sp.add_argument("--seq-col", default=None)
    sp.add_argument("--no-validate", action="store_true",
                    help="skip the eager batch probes (trusted "
                    "exactly-once feed; caller owns op-domain and "
                    "key-uniqueness)")
    sp.add_argument("--dest", help="write merged table here instead of rendering")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.handler(args)


if __name__ == "__main__":
    raise SystemExit(main())
