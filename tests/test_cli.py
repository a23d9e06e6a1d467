"""CLI subcommands over parquet fixtures (the reference's scripts/ surface)."""

from __future__ import annotations

import json

import pytest

from gdutils_spark.cli import main
from tests.fixtures import catalog_df, profiles_df


@pytest.fixture(scope="module")
def table_paths(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_tables")
    cat, prof = str(d / "catalog"), str(d / "profiles")
    catalog_df(spark).write.parquet(cat)
    profiles_df(spark).write.parquet(prof)
    # obs table for gts-obs: platform_code matches the fixtures' wmo ids
    obs = profiles_df(spark).selectExpr(
        "time", "wmo_id AS platform_code",
        "'GLIDER' AS platform_type", "'US' AS country",
        "latitude", "longitude",
    )
    obs_p = str(d / "obs")
    obs.write.parquet(obs_p)
    return {"catalog": cat, "profiles": prof, "obs": obs_p}


def _base(table_paths):
    return ["--catalog", table_paths["catalog"], "--profiles", table_paths["profiles"]]


def test_search_datasets_ids(table_paths, capsys):
    assert main(["search-datasets", *_base(table_paths), "-f", "ids"]) == 0
    ids = capsys.readouterr().out.split()
    assert "unit_191-20231201T0000" in ids
    assert "blue-20240101T0600-delayed" not in ids  # delayed dropped by default


def test_search_datasets_csv_with_window(table_paths, capsys):
    assert main([
        "search-datasets", *_base(table_paths),
        "--start-time", "2024-01-01", "-f", "csv",
    ]) == 0
    out = capsys.readouterr().out
    assert "num_profiles" in out
    assert "unit_191-20240115T1200" in out


def test_get_dataset_track_geojson(table_paths, tmp_path):
    out = tmp_path / "track.json"
    assert main([
        "get-dataset-track", *_base(table_paths),
        "unit_191-20231201T0000", "-o", str(out),
    ]) == 0
    doc = json.loads(out.read_text())
    assert doc["type"] == "FeatureCollection"
    assert doc["features"][0]["geometry"]["type"] == "LineString"


def test_datasets_to_kml(table_paths, capsys):
    assert main(["datasets-to-kml", *_base(table_paths)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("<?xml") and "<kml" in out


def test_catalog_sorted_recent_first(table_paths, capsys):
    assert main(["catalog-datasets", *_base(table_paths), "-f", "json"]) == 0
    recs = json.loads(capsys.readouterr().out)
    ends = [r["end_date"] for r in recs]
    assert ends == sorted(ends, reverse=True)


def test_gts_obs_interval_join(table_paths, capsys):
    assert main([
        "gts-obs", *_base(table_paths), "--obs", table_paths["obs"], "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs and {"dataset_id", "platform_code"} <= set(recs[0])


def test_calendars_ym(table_paths, capsys):
    assert main([
        "calendars", *_base(table_paths), "--target", "profiles", "--variant", "ym",
    ]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0].startswith("year,c01")


def test_report_html(table_paths, capsys):
    assert main(["report", *_base(table_paths), "-f", "html"]) == 0
    assert "<table" in capsys.readouterr().out


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_docs") / "docs")
    rows = [
        (i, f"sample document number {i} with shared words", "en" if i % 2 else "fr")
        for i in range(20)
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(d)
    return d


def test_cli_dedup_exact(docs_path, capsys):
    assert main(["dedup", "--input", docs_path, "--method", "exact", "-f", "json"]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 20 and {"fp", "n_docs", "keep_id"} <= set(recs[0])


def test_cli_sample_rates(docs_path, capsys):
    assert main([
        "sample", "--input", docs_path,
        "--rate", "en=0.0", "--rate", "fr=1.0", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs and all(r["lang"] == "fr" for r in recs)


def test_cli_pack_manifest(docs_path, capsys):
    assert main([
        "pack", "--input", docs_path, "--budget", "12", "--shards", "2", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs and {"shard", "batch_idx", "n_docs", "sum_tokens"} <= set(recs[0])
    assert {r["shard"] for r in recs} <= {0, 1}


def test_cli_sessions(table_paths, capsys):
    assert main([
        "sessions", "--input", table_paths["profiles"],
        "--entity-col", "dataset_id", "--time-col", "time", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs and {"session_idx", "n_events", "duration_us"} <= set(recs[0])


def test_recent_imagery_manifest(capsys):
    from gdutils_spark.cli import main

    rc = main([
        "recent-imagery", "ds-a", "ds-b",
        "--server", "https://example.org/erddap",
        "--variables", "temperature", "salinity",
        "--hours", "6",
    ])
    assert rc == 0
    lines = [ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()]
    # per dataset: 1 track map + (ts + profiles) per variable
    assert len(lines) == 2 * (1 + 2 * 2)
    by_ds = {}
    for ds, name, url in lines:
        by_ds.setdefault(ds, []).append((name, url))
        assert url.startswith(f"https://example.org/erddap/tabledap/{ds}.largePng?")
    assert set(by_ds) == {"ds-a", "ds-b"}
    names = [n for n, _ in by_ds["ds-a"]]
    assert names[0] == "ds-a_track_map_largePng.png"
    # the track map carries no functional window; the variable plots do
    assert "max%28time%29-6hours" not in by_ds["ds-a"][0][1]
    assert all("max%28time%29-6hours" in u for _, u in by_ds["ds-a"][1:])


def test_cli_split(docs_path, capsys):
    assert main([
        "split", "--input", docs_path, "--holdout-frac", "0.3", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 20 and {"doc", "split_key", "split"} <= set(recs[0])
    assert {r["split"] for r in recs} <= {"train", "holdout"}


def test_cli_export_jsonl(docs_path, tmp_path, capsys):
    dest = str(tmp_path / "shards")
    assert main([
        "export-jsonl", "--input", docs_path, "--dest", dest, "--shards", "4",
        "-f", "json",
    ]) == 0
    import glob as g

    # the -o/-f pipe works like every sibling: per-shard balance summary
    recs = json.loads(capsys.readouterr().out)
    assert sum(r["count"] for r in recs) == 20
    dirs = sorted(g.glob(dest + "/shard=*"))
    assert dirs and all(d.rsplit("=", 1)[1].isdigit() for d in dirs)


def test_cli_distinct_sketch(docs_path, capsys):
    assert main([
        "distinct-sketch", "--input", docs_path, "--group-col", "lang", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert {r["grp"] for r in recs} == {"en", "fr"}
    for r in recs:
        assert r["n_exact"] > 0 and r["hll_estimate"] > 0


def test_cli_freq_sketch(docs_path, capsys):
    assert main([
        "freq-sketch", "--input", docs_path, "--top", "5", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 5
    for r in recs:
        assert r["cms_est"] >= r["exact_freq"] > 0  # CMS never undercounts


def test_cli_bloom_screen(docs_path, spark, tmp_path, capsys):
    hist = str(tmp_path / "hist")
    spark.createDataFrame(
        [("sample document number 0 with shared words",)], "fp string"
    ).write.parquet(hist)
    batch = str(tmp_path / "batch")
    spark.createDataFrame(
        [(0, "sample document number 0 with shared words"), (1, "novel text")],
        "doc_id long, fp string",
    ).write.parquet(batch)
    assert main([
        "bloom-screen", "--input", batch, "--history", hist, "-f", "json",
    ]) == 0
    recs = {r["doc_id"]: r["might_contain"] for r in json.loads(capsys.readouterr().out)}
    assert recs[0] is True and recs[1] is False


def test_cli_cdc_apply(spark, tmp_path, capsys):
    snap = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).write.parquet(snap)
    ch = str(tmp_path / "ch")
    spark.createDataFrame(
        [(2, "b2", "U"), (3, "c", "I")], "id long, v string, op string"
    ).write.parquet(ch)
    assert main([
        "cdc-apply", "--input", snap, "--changes", ch, "--key", "id", "-f", "json",
    ]) == 0
    recs = {r["id"]: r["v"] for r in json.loads(capsys.readouterr().out)}
    assert recs == {1: "a", 2: "b2", 3: "c"}


def test_cli_substring_dedup(docs_path, capsys):
    assert main([
        "substring-dedup", "--input", docs_path, "--min-tokens", "3",
        "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 20
    # every fixture doc shares the 3-token spans "sample document number"
    # and "with shared words"; all occurrences after the global first
    # are removed, so every doc except one loses tokens
    removed = [r for r in recs if r["n_kept"] < r["n_tokens"]]
    assert len(removed) >= 19, recs


def test_cli_quantiles(spark, tmp_path, capsys):
    d = str(tmp_path / "vals")
    spark.createDataFrame(
        [(float(i),) for i in range(100)], "value double"
    ).write.parquet(d)
    assert main([
        "quantiles", "--input", d, "--lo", "0", "--hi", "100",
        "--bins", "100", "--q", "0.5", "--q", "0.9", "-f", "json",
    ]) == 0
    recs = {r["q"]: r["est"] for r in json.loads(capsys.readouterr().out)}
    assert abs(recs[0.5] - 49.5) <= 1.0
    assert abs(recs[0.9] - 89.1) <= 1.0


def test_cli_bpe_train(docs_path, capsys):
    assert main([
        "bpe-train", "--input", docs_path, "--merges", "3", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert [r["rank"] for r in recs] == [1, 2, 3]
    for r in recs:
        assert r["left_sym"] and r["right_sym"] and r["pair_count"] > 0


def test_cli_bpe_encode(docs_path, capsys):
    assert main([
        "bpe-train", "--input", docs_path, "--merges", "2", "--encode",
        "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs
    for r in recs:
        # every word yields at least one subword plus </w> context:
        # token count is bounded below by word count
        assert r["n_bpe_tokens"] >= r["n_words"]


def test_cli_triangles(spark, tmp_path, capsys):
    path = str(tmp_path / "edges")
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    spark.createDataFrame(k4, "src long, dst long").write.parquet(path)
    assert main(["triangles", "--input", path, "--top", "2", "-f", "json"]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 2
    assert all(r["n_triangles"] == 3 and r["lcc"] == 1.0 for r in recs)


def test_cli_set_overlap(spark, tmp_path, capsys):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(0, 300).selectExpr("id AS doc_id").write.parquet(pa)
    spark.range(150, 450).selectExpr("id AS doc_id").write.parquet(pb)
    assert main([
        "set-overlap", "--input", pa, "--other", pb, "--k", "64", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 1 and recs[0]["n_inter_exact"] == 150
    assert 0.0 < recs[0]["jaccard_est"] < 1.0


def test_cli_outliers(spark, tmp_path, capsys):
    path = str(tmp_path / "vals")
    rows = [("a", float(v)) for v in range(1, 22)] + [("a", 1000.0)]
    spark.createDataFrame(rows, "event_type string, value double").write.parquet(path)
    assert main(["outliers", "--input", path, "-f", "json"]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 1 and recs[0]["n_outliers"] == 1


def test_cli_kcore(spark, tmp_path, capsys):
    path = str(tmp_path / "kedges")
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)]
    spark.createDataFrame(edges, "src long, dst long").write.parquet(path)
    assert main(["kcore", "--input", path, "--k", "3", "-f", "json"]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert {r["node"] for r in recs} == {0, 1, 2, 3}
    assert all(r["core_degree"] == 3 for r in recs)


def test_cli_dedup_cosine(docs_path, capsys):
    assert main([
        "dedup", "--input", docs_path, "--method", "cosine",
        "--threshold", "0.5", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    # the shared-words fixture docs overlap heavily on tf-cosine
    assert recs and {"d1", "d2", "dot", "cosine"} <= set(recs[0])
    assert all(r["cosine"] >= 0.5 and r["d1"] < r["d2"] for r in recs)


def test_cli_heavy_hitters(docs_path, capsys):
    assert main([
        "heavy-hitters", "--input", docs_path, "--phi", "0.01", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs, "phi=1% of a tiny fixture should keep common tokens"
    for r in recs:
        assert r["cms_est"] >= r["exact_freq"] > 0  # never undercounts


def test_cli_weighted_sample(spark, tmp_path, capsys):
    path = str(tmp_path / "wdocs")
    rows = [(i, "long text " * 50 if i % 5 == 0 else "short") for i in range(100)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    assert main([
        "weighted-sample", "--input", path, "--k", "20", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 20
    heavy = sum(1 for r in recs if r["weight"] > 1)
    assert heavy > 10  # long docs (20% of rows) dominate the sample


def test_cli_pagerank(spark, tmp_path, capsys):
    path = str(tmp_path / "predges")
    star = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    spark.createDataFrame(star, "src long, dst long").write.parquet(path)
    assert main([
        "pagerank", "--input", path, "--top", "1", "--plain-sum", "-f", "json",
    ]) == 0
    recs = json.loads(capsys.readouterr().out)
    assert len(recs) == 1 and recs[0]["node"] == 0  # the hub wins


def test_cli_cdc_apply_no_validate(spark, tmp_path, capsys):
    snap = str(tmp_path / "snap")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(snap)
    ch = str(tmp_path / "ch")
    spark.createDataFrame(
        [(2, "b2", "U"), (3, "c", "I")], "id long, v string, op string"
    ).write.parquet(ch)
    assert main([
        "cdc-apply", "--input", snap, "--changes", ch, "--key", "id",
        "--no-validate", "-f", "json",
    ]) == 0
    recs = {r["id"]: r["v"] for r in json.loads(capsys.readouterr().out)}
    assert recs == {1: "a", 2: "b2", 3: "c"}


@pytest.fixture(scope="module")
def graph_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_graph")
    edges = [(a, b) for a in range(6) for b in range(6) if a != b]
    edges += [(10, 11), (11, 10), (5, 10), (10, 5)]
    p = str(d / "edges")
    spark.createDataFrame(edges, "src long, dst long").write.parquet(p)
    return p


@pytest.fixture(scope="module")
def emb_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_emb")
    from gdutils_spark.sources.tables import load_table

    p = str(d / "emb")
    load_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        "vec_id < 120"
    ).write.parquet(p)
    return p


def test_cli_communities_seeded(graph_path, tmp_path, capsys, spark):
    # base run writes a label table; the seeded catch-up round consumes it
    assert main(["communities", "--input", graph_path, "--iters", "2",
                 "-f", "json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    seed = str(tmp_path / "labels")
    spark.createDataFrame(
        [(r["node"], r["label"]) for r in rows], "node long, label long"
    ).write.parquet(seed)
    assert main(["communities", "--input", graph_path, "--iters", "1",
                 "--seed-labels", seed, "--no-validate", "-f", "json"]) == 0
    seeded = {r["node"]: r["label"] for r in json.loads(capsys.readouterr().out)}
    assert main(["communities", "--input", graph_path, "--iters", "3",
                 "-f", "json"]) == 0
    scratch = {r["node"]: r["label"] for r in json.loads(capsys.readouterr().out)}
    assert seeded == scratch  # chain composition via the CLI


def test_cli_triangles_incremental(graph_path, tmp_path, capsys, spark):
    base = str(tmp_path / "base_edges")
    delta = str(tmp_path / "delta_edges")
    full = spark.read.parquet(graph_path)
    full.where("src + dst < 9").write.parquet(base)
    full.where("src + dst >= 9").write.parquet(delta)
    assert main(["triangles", "--input", base, "-f", "json"]) == 0
    counts = str(tmp_path / "base_counts")
    rows = json.loads(capsys.readouterr().out)
    spark.createDataFrame(
        [(r["node"], r["n_triangles"]) for r in rows],
        "node long, n_triangles long",
    ).write.parquet(counts)
    assert main(["triangles-incremental", "--input", base,
                 "--base-counts", counts, "--delta", delta,
                 "-f", "json"]) == 0
    got = {r["node"]: r["n_triangles"]
           for r in json.loads(capsys.readouterr().out)}
    assert main(["triangles", "--input", graph_path, "-f", "json"]) == 0
    want = {r["node"]: r["n_triangles"]
            for r in json.loads(capsys.readouterr().out)}
    assert got == want


def test_cli_ivfpq_build_append_knn(emb_path, tmp_path, capsys, spark):
    stage = str(tmp_path / "idx")
    base = str(tmp_path / "base_vecs")
    delta = str(tmp_path / "delta_vecs")
    queries = str(tmp_path / "queries")
    vecs = spark.read.parquet(emb_path)
    vecs.where("vec_id < 80").write.parquet(base)
    vecs.where("vec_id >= 80").write.parquet(delta)
    vecs.where("vec_id < 3").write.parquet(queries)
    assert main(["ivfpq-build", "--input", base, "--stage", stage,
                 "--centroids", "8", "-f", "json"]) == 0
    cells = json.loads(capsys.readouterr().out)
    assert sum(c["count"] for c in cells) == 80 * 4  # m rows per vector
    assert main(["ivfpq-append", "--input", delta, "--stage", stage,
                 "-f", "json"]) == 0
    cells = json.loads(capsys.readouterr().out)
    assert sum(c["count"] for c in cells) == 120 * 4
    # staged search == inline search over the grown corpus
    assert main(["knn", "--input", emb_path, "--queries", queries,
                 "--method", "ivfpq", "--centroids", "8",
                 "--stage", stage, "-f", "json"]) == 0
    staged = json.loads(capsys.readouterr().out)
    assert main(["knn", "--input", emb_path, "--queries", queries,
                 "--method", "ivfpq", "--centroids", "8",
                 "-f", "json"]) == 0
    inline = json.loads(capsys.readouterr().out)
    key = lambda r: (r["query_id"], r["neighbor_id"])
    assert sorted(staged, key=key) == sorted(inline, key=key)
    # brute-force arm smoke
    assert main(["knn", "--input", emb_path, "--queries", queries,
                 "--method", "brute", "--k", "3", "-f", "json"]) == 0
    assert len(json.loads(capsys.readouterr().out)) == 9


def test_cli_knn_stage_requires_ivfpq(emb_path, tmp_path, spark):
    """--stage with a non-ivfpq method must fail fast — silently
    brute-forcing would return different neighbors with no warning."""
    q = str(tmp_path / "q")
    spark.read.parquet(emb_path).where("vec_id < 2").write.parquet(q)
    with pytest.raises(SystemExit, match="ivfpq"):
        main(["knn", "--input", emb_path, "--queries", q,
              "--method", "brute", "--stage", str(tmp_path / "idx")])


def test_cli_get_dataset_profiles(table_paths, capsys):
    assert main([
        "get-dataset-profiles", *_base(table_paths),
        "unit_191-20231201T0000", "-f", "csv",
    ]) == 0
    out = capsys.readouterr().out
    assert "time" in out.splitlines()[0]
    assert out.count("\n") >= 2  # header + at least one profile row


def test_cli_plot_map_url(capsys):
    assert main([
        "plot-map", "unit_191-20231201T0000",
        "--server", "https://example.org/erddap",
    ]) == 0
    url = capsys.readouterr().out.strip()
    assert url.startswith("https://example.org/erddap")
    assert "unit_191-20231201T0000" in url
    assert ".largePng" in url
    assert "longitude,latitude,time" in url  # time-coded track map


def test_cli_plot_variable_url(capsys):
    assert main([
        "plot-variable", "unit_191-20231201T0000", "temperature",
        "--server", "https://example.org/erddap", "--hours", "6",
    ]) == 0
    url = capsys.readouterr().out.strip()
    assert url.startswith("https://example.org/erddap")
    # last-N-hours as a FUNCTIONAL constraint the server evaluates
    assert "max(time)-6hours" in url.replace("%28", "(").replace(
        "%29", ")"
    ).replace("%2D", "-")


def test_cli_fk_audit(tmp_path, capsys, spark):
    child = str(tmp_path / "child")
    parent = str(tmp_path / "parent")
    spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long").write.parquet(child)
    spark.createDataFrame([(10,)], "pk long").write.parquet(parent)
    assert main([
        "fk-audit", "--input", child, "--parent", parent,
        "--child-key", "fk", "--parent-key", "pk", "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["fk_name"] == "fk->pk"
    assert rows[0]["n_orphans"] == 1 and rows[0]["n_rows"] == 2


def test_cli_resample(tmp_path, capsys, spark):
    from datetime import datetime

    path = str(tmp_path / "series")
    spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
         ("a", datetime(2024, 1, 1, 1, 0, 0), 2.0)],
        "user_id string, ts timestamp, value double",
    ).write.parquet(path)
    assert main([
        "resample", "--input", path, "--step-seconds", "1800", "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    got = {r["ts"]: r["v_interp"] for r in rows}
    assert len(got) == 3 and any(v == 1.0 for v in got.values())


def test_cli_image_dups(tmp_path, capsys, spark):
    from gdutils_spark.operators.multimodal import encode_png

    path = str(tmp_path / "media")
    px = bytes(((x * 31 + y * 17) * 3) % 256 for y in range(8) for x in range(9))
    p = bytearray(encode_png(9, 8, 1, bytearray(px)))
    spark.createDataFrame(
        [(1, p, "png", "image"), (2, p, "png", "image")],
        "media_id long, payload binary, format string, kind string",
    ).write.parquet(path)
    assert main(["image-dups", "--input", path, "-f", "json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows == [{"media_id_a": 1, "media_id_b": 2, "hamming": 0}]


def test_cli_cv_folds(tmp_path, capsys, spark):
    from datetime import datetime

    path = str(tmp_path / "cvseries")
    spark.createDataFrame(
        [("a", datetime(2024, 1, 1, hh, 0, 0), 1.0) for hh in range(10)],
        "user_id string, ts timestamp, value double",
    ).write.parquet(path)
    assert main([
        "cv-folds", "--input", path, "--n-folds", "3",
        "--horizon-seconds", "7200", "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    got = {r["fold"]: (r["n_train"], r["n_test"]) for r in rows}
    assert got == {1: (4, 2), 2: (6, 2), 3: (8, 2)}


def test_cli_fuzzy_match(tmp_path, capsys, spark):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [(1, "R/V Blue Heron")], "doc_id long, text string"
    ).write.parquet(a)
    spark.createDataFrame(
        [(10, "BLUE HERON (R/V)")], "doc_id long, text string"
    ).write.parquet(b)
    assert main([
        "fuzzy-match", "--input", a, "--other", b,
        "--threshold", "0.5", "--max-token-freq", "0", "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["a_id"] == 1 and rows[0]["b_id"] == 10
    assert rows[0]["jaccard"] == 1.0


def test_cli_snapshot_diff(tmp_path, capsys, spark):
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(old)
    spark.createDataFrame([(1, "a"), (2, "B")], "k long, v string").write.parquet(new)
    assert main([
        "snapshot-diff", "--input", old, "--new", new, "--key", "k",
        "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows == [{"k": 2, "change": "changed", "changed_cols": "v"}]


def test_cli_edge_jaccard(tmp_path, capsys, spark):
    path = str(tmp_path / "edges")
    spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    ).write.parquet(path)
    assert main([
        "edge-jaccard", "--input", path, "--top", "1", "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1 and rows[0]["jaccard"] == 1.0


def test_cli_winsorize(tmp_path, capsys, spark):
    path = str(tmp_path / "vals")
    spark.createDataFrame(
        [("t", float(v)) for v in range(1, 21)], "event_type string, value double"
    ).write.parquet(path)
    assert main([
        "winsorize", "--input", path, "--lower", "0.1", "--upper", "0.9",
        "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    # p10 of 1..20 is 2.9 (quantile_cont): values 1,2 clamp up; p90 is
    # 18.1: values 19,20 clamp down
    assert rows[0]["n"] == 20
    assert rows[0]["n_below"] == 2 and rows[0]["n_above"] == 2


def test_cli_edit_match(tmp_path, capsys, spark):
    pa = str(tmp_path / "ea")
    pb = str(tmp_path / "eb")
    spark.createDataFrame(
        [(1, "glider mission alpha")], "doc_id long, text string"
    ).write.parquet(pa)
    spark.createDataFrame(
        [(10, "glider mission alphaX"), (11, "unrelated entirely")],
        "doc_id long, text string",
    ).write.parquet(pb)
    assert main([
        "edit-match", "--input", pa, "--other", pb, "--max-dist", "1",
        "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1 and rows[0]["b_id"] == 10 and rows[0]["dist"] == 1


def test_cli_edit_match_guard_autostages(tmp_path, capsys, spark, monkeypatch):
    """r12 ADVICE: --max-gram-freq enables the census (a second gram-
    table consumer); without --stage-path the CLI must auto-stage to a
    tempdir (and clean it up) rather than recompute both explodes."""
    import tempfile

    pa = str(tmp_path / "ga")
    pb = str(tmp_path / "gb")
    spark.createDataFrame(
        [(1, "glider mission alpha")], "doc_id long, text string"
    ).write.parquet(pa)
    spark.createDataFrame(
        [(10, "glider mission alphaX")], "doc_id long, text string"
    ).write.parquet(pb)
    staged_dirs = []
    real_mkdtemp = tempfile.mkdtemp

    def spy_mkdtemp(*a, **kw):
        d = real_mkdtemp(*a, **kw)
        staged_dirs.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", spy_mkdtemp)
    assert main([
        "edit-match", "--input", pa, "--other", pb, "--max-dist", "1",
        "--max-gram-freq", "50", "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1 and rows[0]["b_id"] == 10 and rows[0]["dist"] == 1
    auto = [d for d in staged_dirs if "gdutils_edit_stage_" in d]
    assert len(auto) == 1
    import os as _os
    assert not _os.path.exists(auto[0]), "tempdir must be cleaned up"


def test_cli_trend(tmp_path, capsys, spark):
    path = str(tmp_path / "trend")
    spark.createDataFrame(
        [("t", x, 3.0 * x + 2.0) for x in range(5)],
        "event_type string, day_idx int, value double",
    ).write.parquet(path)
    assert main(["trend", "--input", path, "-f", "json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["slope"] == 3.0 and rows[0]["intercept"] == 2.0


def test_cli_match_between_staged_roundtrip(tmp_path, capsys, spark):
    """stage-linkage builds the corpus artifact; fuzzy-match-between
    probes it with corpus omitted; edit-match-between probes staged
    grams (corpus still required for the verify texts)."""
    pb_ = str(tmp_path / "mb_batch")
    pc_ = str(tmp_path / "mb_corpus")
    spark.createDataFrame(
        [(1, "glider mission alpha")], "doc_id long, text string"
    ).write.parquet(pb_)
    spark.createDataFrame(
        [(10, "glider mission alphaX"), (11, "unrelated entirely")],
        "doc_id long, text string",
    ).write.parquet(pc_)
    toks = str(tmp_path / "staged_tokens")
    grams = str(tmp_path / "staged_grams")
    assert main(["stage-linkage", "--input", pc_, "--kind", "tokens",
                 "--path", toks]) == 0
    capsys.readouterr()
    assert main(["stage-linkage", "--input", pc_, "--kind", "grams",
                 "--path", grams, "--q", "4", "--max-dist", "2"]) == 0
    capsys.readouterr()
    assert main([
        "fuzzy-match-between", "--input", pb_, "--threshold", "0.5",
        "--max-token-freq", "0", "--corpus-tokens-path", toks, "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1 and rows[0]["corpus_id"] == 10
    assert main([
        "edit-match-between", "--input", pb_, "--corpus", pc_,
        "--max-dist", "1", "--corpus-grams-path", grams, "-f", "json",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1 and rows[0]["corpus_id"] == 10 and rows[0]["dist"] == 1


def test_cli_ingest_staged_roundtrip(tmp_path, capsys):
    """VERDICT r13 task 7 — the operational nightly recipe end-to-end:
    stage-ingest builds the corpus artifacts once, ingest-admit runs the
    admission against them, and the staged report equals the fresh
    (no --stage-dir) report row-for-row."""
    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "ingest_stage")
    assert main(["stage-ingest", "--input", sf, "--stage-dir", d]) == 0
    capsys.readouterr()
    assert main(["ingest-admit", "--input", sf, "--stage-dir", d,
                 "-f", "json"]) == 0
    staged = json.loads(capsys.readouterr().out)
    assert main(["ingest-admit", "--input", sf, "-f", "json"]) == 0
    fresh = json.loads(capsys.readouterr().out)
    key = lambda r: r["source"]
    assert sorted(staged, key=key) == sorted(fresh, key=key)
    assert len(staged) >= 1 and all("manifest_hash" in r for r in staged)


def test_cli_ingest_append(tmp_path, capsys, spark):
    """Third leg of the nightly recipe: ingest-append folds an admitted
    batch into the staged artifacts (fp partitions + bloom + banded
    rows all grow)."""
    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "stage")
    assert main(["stage-ingest", "--input", sf, "--stage-dir", d]) == 0
    capsys.readouterr()
    n_fp0 = spark.read.parquet(d + "/corpus_fp").count()
    n_bd0 = spark.read.parquet(d + "/lsh_banded").count()
    bp = str(tmp_path / "batch")
    spark.createDataFrame(
        [(990001, "a genuinely novel admitted document about spark"),
         (990002, "another admitted document with different words")],
        "doc_id long, text string",
    ).write.parquet(bp)
    assert main(["ingest-append", "--input", bp, "--stage-dir", d]) == 0
    assert spark.read.parquet(d + "/corpus_fp").count() == n_fp0 + 2
    assert spark.read.parquet(d + "/lsh_banded").count() > n_bd0
