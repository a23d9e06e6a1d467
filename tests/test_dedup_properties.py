"""Property-based checks for the dedup operator family.

Invariants that hold for ANY corpus — the class of guarantee the DuckDB
oracle (fixed corpus) cannot give:

1. LSH soundness: every minhash-LSH pair is a true near-dup pair with
   exactly the Jaccard the exact operator computes (candidates may miss,
   but can never be wrong — verification is exact).
2. Doc-id permutation invariance: relabeling documents permutes pair ids
   but never changes the (jaccard multiset) of exact results.
3. Exact-dup consistency: documents with identical normalized text land
   in the same fingerprint group with the minimum id as survivor.
4. Near-dup drop soundness: the dropped set is exactly the non-survivor
   members of the pair-graph components.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gdutils_spark.operators.dedup import (
    connected_components,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]


def _shingle_set(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

texts = st.lists(
    st.sampled_from(WORDS), min_size=3, max_size=12
).map(" ".join)
corpora = st.lists(texts, min_size=2, max_size=10)

slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, texts_):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_)], "doc_id long, text string"
    )


@slow
@given(corpora)
def test_containment_matches_set_model(spark, texts_):
    """ngram_containment_pairs == the pure-Python set model: for every
    pair with |A∩B|/|A| or /|B| ≥ t, exactly (common, c1, c2); and
    containment dominates Jaccard (c ≥ j always)."""
    from gdutils_spark.operators.dedup import ngram_containment_pairs

    t = 0.6
    df = _df(spark, texts_)
    got = {
        (r.d1, r.d2): (r.common, r.c1, r.c2)
        for r in ngram_containment_pairs(df, threshold=t).collect()
    }
    sets = {i: _shingle_set(x) for i, x in enumerate(texts_)}
    want = {}
    for i in sorted(sets):
        for j in sorted(sets):
            if i >= j or not sets[i] or not sets[j]:
                continue
            common = len(sets[i] & sets[j])
            if common == 0:
                continue
            c1, c2 = common / len(sets[i]), common / len(sets[j])
            if c1 >= t or c2 >= t:
                want[(i, j)] = (common, c1, c2)
    assert got == want
    jac = {
        (r.d1, r.d2): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    for pair, (_, c1, c2) in got.items():
        assert max(c1, c2) >= jac[pair] - 1e-12


@slow
@given(corpora)
def test_lsh_pairs_are_sound(spark, texts_):
    df = _df(spark, texts_)
    exact = {
        (r.d1, r.d2): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    lsh = {
        (r.d1, r.d2): r.jaccard
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    # soundness: LSH can miss pairs, never invent or mis-score them
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == pytest.approx(exact[pair], abs=1e-12)


@slow
@given(corpora)
def test_exact_jaccard_is_id_permutation_invariant(spark, texts_):
    df = _df(spark, texts_)
    # relabel: doc_id -> 1000 - doc_id (order-reversing, collision-free)
    relabeled = df.select(
        (1000 - F.col("doc_id")).alias("doc_id"), "text"
    )
    a = sorted(
        round(r.jaccard, 12)
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    )
    b = sorted(
        round(r.jaccard, 12)
        for r in ngram_jaccard_pairs(relabeled, threshold=0.0).collect()
    )
    assert a == b


@slow
@given(corpora)
def test_exact_duplicates_group_and_survivor(spark, texts_):
    # force guaranteed duplicates: append a copy of doc 0 with a new id
    texts_ = list(texts_) + [texts_[0]]
    df = _df(spark, texts_)
    groups = exact_duplicates(df).collect()
    by_fp = {r.fp: r for r in groups}
    # total docs preserved across groups
    assert sum(r.n_docs for r in groups) == len(texts_)
    # the duplicated text's group holds >= 2 docs and survivor id 0
    import hashlib

    norm = " ".join(texts_[0].split()).lower()
    fp = hashlib.md5(norm.encode()).hexdigest()
    assert by_fp[fp].n_docs >= 2
    assert by_fp[fp].keep_id == 0


def test_near_dup_drop_is_component_complement(spark):
    # identical shingle sets (jaccard 1.0) collide with probability 1 —
    # the probabilistic-recall regime is covered by the soundness test
    texts_ = [
        "alpha bravo charlie delta echo foxtrot",
        "alpha bravo charlie delta echo foxtrot",  # exact near-dup of 0
        "hotel golf foxtrot echo delta charlie",
        "hotel golf foxtrot echo delta charlie",   # exact near-dup of 2
        "alpha alpha alpha hotel hotel hotel",
    ]
    df = _df(spark, texts_)
    pairs = minhash_lsh_pairs(df, threshold=0.5)
    comps = connected_components(pairs).collect()
    non_survivors = {r.node for r in comps if r.node != r.comp}
    from gdutils_spark.queries_ext import doc_near_dup_drop  # noqa: F401

    kept = {
        r.doc_id
        for r in df.join(
            pairs.sparkSession.createDataFrame(
                [(n,) for n in non_survivors] or [(None,)], "doc_id long"
            ),
            "doc_id",
            "left_anti",
        ).collect()
    }
    assert kept == set(range(len(texts_))) - non_survivors
    assert non_survivors, "corpus must contain near-dups for this test"


edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda t: t[0] != t[1]),
    min_size=0,
    max_size=12,
)


@given(edge_lists, st.floats(0.0, 1.0))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_leakage_safe_split_never_splits_a_pair(spark, edges, frac):
    """The defining invariant: for EVERY near-dup pair, both endpoints
    get the same split — a holdout doc can never have a training-set
    near-copy."""
    from gdutils_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)], "d1 long, d2 long"
    ).where(F.col("d1") != F.col("d2"))
    out = {
        r.doc: (r.split_key, r.split)
        for r in leakage_safe_split(docs, pairs, holdout_frac=frac).collect()
    }
    assert set(out) == set(range(16))  # every doc assigned exactly once
    for a, b in edges:
        assert out[a] == out[b], (a, b, out[a], out[b])


def test_leakage_safe_split_fraction_and_determinism(spark):
    from gdutils_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    pairs = spark.createDataFrame([], "d1 long, d2 long")
    out = leakage_safe_split(docs, pairs, holdout_frac=0.1)
    frac = out.where(F.col("split") == "holdout").count() / 2000
    assert 0.05 < frac < 0.15  # md5 buckets ≈ uniform
    # determinism: a second run is identical
    again = leakage_safe_split(docs, pairs, holdout_frac=0.1)
    assert out.exceptAll(again).count() == 0


# ---------------------------------------------------------------------------
# Exact tf-cosine pairs: differential vs a pure-Python bag-of-words model.
# ---------------------------------------------------------------------------


def _cosine_model(texts_, threshold):
    import math
    from collections import Counter

    tfs = {
        i: Counter(w for w in t.lower().split() if w)
        for i, t in enumerate(texts_)
    }
    tfs = {i: c for i, c in tfs.items() if c}
    out = {}
    ids = sorted(tfs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d1, d2 = ids[x], ids[y]
            a, b = tfs[d1], tfs[d2]
            dot = sum(a[w] * b[w] for w in a.keys() & b.keys())
            if dot == 0:
                continue
            cos = dot / (
                math.sqrt(sum(v * v for v in a.values()))
                * math.sqrt(sum(v * v for v in b.values()))
            )
            if cos >= threshold:
                out[(d1, d2)] = (dot, cos)
    return out


def test_cosine_tf_pairs_matches_model(spark):
    from gdutils_spark.operators.dedup import cosine_tf_pairs

    texts_ = [
        "the cat sat on the mat",
        "the cat sat on the mat today",   # near-dup of 0
        "dogs dogs dogs bark loudly",
        "completely different words here",
        "the the the cat cat mat",        # repetition-heavy overlap w/ 0
        "",
    ]
    got = {
        (r.d1, r.d2): (r.dot, r.cosine)
        for r in cosine_tf_pairs(_df(spark, texts_), threshold=0.5).collect()
    }
    assert got == _cosine_model(texts_, 0.5)
    assert (0, 1) in got  # the engineered near-dup survives the cut


def test_cosine_tf_pairs_freq_cap_scores_stay_exact(spark):
    """max_token_freq prunes CANDIDATES only: every emitted pair's dot
    and cosine equal the uncapped values (verification re-reads the
    full tf vectors), and capped results are a subset."""
    from gdutils_spark.operators.dedup import cosine_tf_pairs

    texts_ = [
        "alpha beta gamma shared shared",
        "alpha beta gamma shared delta",
        "alpha epsilon zeta eta theta",
        "iota kappa lambda mu nu",
    ]
    df = _df(spark, texts_)
    full = {
        (r.d1, r.d2): (r.dot, r.cosine)
        for r in cosine_tf_pairs(df, threshold=0.2).collect()
    }
    capped = {
        (r.d1, r.d2): (r.dot, r.cosine)
        for r in cosine_tf_pairs(df, threshold=0.2, max_token_freq=2).collect()
    }
    assert set(capped) <= set(full)
    for pair, scores in capped.items():
        assert scores == full[pair]
    # 'alpha' (df=3) is hot under the cap, but pairs sharing cold tokens
    # keep their exact full-vector dot incl. the hot token's term
    assert (0, 1) in capped
    with pytest.raises(ValueError):
        cosine_tf_pairs(df, max_token_freq=0)


def test_cosine_tf_pairs_shingle_mode_matches_model(spark):
    """shingle_k counts k-shingles (repetition kept) — equivalent to the
    unigram model run on the shingle stream."""
    from gdutils_spark.operators.dedup import cosine_tf_pairs

    texts_ = [
        "a b c d e f",
        "a b c d e g",        # shares 3 of 4 3-shingles with doc 0
        "x y z a b c",
        "a b a b a b a b",    # repeated shingles exercise the counts
    ]

    def shingle_stream(t, k=3):
        ws = t.lower().split()
        return " ".join(
            "_".join(ws[i : i + k]) for i in range(len(ws) - k + 1)
        )

    # model: run the unigram model over the shingle stream (joined by a
    # NON-whitespace char — the fixture tokens contain no underscores —
    # so shingles stay single "words"; note \x1f and friends ARE
    # whitespace to str.split())
    want = _cosine_model([shingle_stream(t) for t in texts_], 0.3)
    got = {
        (r.d1, r.d2): (r.dot, r.cosine)
        for r in cosine_tf_pairs(
            _df(spark, texts_), threshold=0.3, shingle_k=3
        ).collect()
    }
    assert got == want
    assert (0, 1) in got
    import pytest as _pt

    with _pt.raises(ValueError, match="shingle_k"):
        cosine_tf_pairs(_df(spark, texts_), shingle_k=0)


def test_cosine_tf_pairs_shingle_k1_skips_blank_docs(spark):
    """shingle_k=1 must match unigram semantics on blank documents: a
    blank text tokenizes to [''] and the ''-shingle is skipped, so two
    empty docs never pair at cosine 1.0 (regression)."""
    from gdutils_spark.operators.dedup import cosine_tf_pairs

    texts_ = ["", "   ", "real words here", "real words here too"]
    got = {
        (r.d1, r.d2)
        for r in cosine_tf_pairs(
            _df(spark, texts_), threshold=0.1, shingle_k=1
        ).collect()
    }
    assert (0, 1) not in got
    assert (2, 3) in got


def test_connected_components_incremental_matches_full_rerun(spark):
    """The star-contraction claim: CC(delta ∪ star(CC(base))) ==
    CC(base ∪ delta) exactly — including deltas that MERGE two old
    components and deltas introducing brand-new nodes."""
    import random

    from gdutils_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(83)
    for trial in range(3):
        base = list({
            (rng.randrange(40), rng.randrange(40)) for _ in range(35)
        })
        delta = list({
            (rng.randrange(60), rng.randrange(60)) for _ in range(15)
        })
        base = [(a, b) for a, b in base if a != b] or [(0, 1)]
        delta = [(a, b) for a, b in delta if a != b] or [(0, 41)]
        bdf = spark.createDataFrame(base, "d1 long, d2 long")
        ddf = spark.createDataFrame(delta, "d1 long, d2 long")
        full = spark.createDataFrame(base + delta, "d1 long, d2 long")
        seed = connected_components(bdf)
        inc = {
            r.node: r.comp
            for r in connected_components_incremental(ddf, seed).collect()
        }
        want = {
            r.node: r.comp for r in connected_components(full).collect()
        }
        assert inc == want, (trial, inc, want)


def test_connected_components_incremental_merges_components(spark):
    """A single delta edge bridging two old components collapses them to
    the global minimum label."""
    from gdutils_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12)], "d1 long, d2 long"
    )
    seed = connected_components(base)
    bridge = spark.createDataFrame([(3, 10)], "d1 long, d2 long")
    got = {
        r.node: r.comp
        for r in connected_components_incremental(bridge, seed).collect()
    }
    assert got == {n: 1 for n in (1, 2, 3, 10, 11, 12)}


def test_shared_shingles_param_is_result_identical(spark):
    """r14 optimization contract: passing a caller-pinned ``_shingles``
    table (the within-query reuse used by doc_dedup_recall and
    doc_incremental_dup_clusters) must produce exactly the rows the
    operators compute when they shingle internally — for the LSH
    pipeline, the exact-Jaccard pipeline, and the between tier."""
    from gdutils_spark.operators.dedup import (
        _shingle_table,
        minhash_lsh_pairs_between,
    )

    rows = [
        (1, "alpha bravo charlie delta echo foxtrot"),
        (2, "alpha bravo charlie delta echo golf"),
        (3, "hotel golf foxtrot echo delta charlie"),
        (4, "alpha bravo charlie delta echo foxtrot"),
        (5, "totally different words here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_perms=16, k=3, bands=4, threshold=0.3)
    sh = _shingle_table(df, "text", "doc_id", 3).localCheckpoint(eager=False)

    def rowset(out):
        return {tuple(r) for r in out.collect()}

    assert rowset(minhash_lsh_pairs(df, **kw, _shingles=sh)) == rowset(
        minhash_lsh_pairs(df, **kw)
    )
    assert rowset(
        ngram_jaccard_pairs(df, k=3, threshold=0.3, _shingles=sh)
    ) == rowset(ngram_jaccard_pairs(df, k=3, threshold=0.3))

    new = df.where(F.col("doc_id") % 2 == 0)
    corpus = df.where(F.col("doc_id") % 2 != 0)
    new_sh = _shingle_table(new, "text", "doc_id", 3).localCheckpoint(eager=False)
    corp_sh = _shingle_table(corpus, "text", "doc_id", 3).localCheckpoint(
        eager=False
    )
    assert rowset(
        minhash_lsh_pairs_between(
            new, corpus, **kw, _new_shingles=new_sh, _corpus_shingles=corp_sh
        )
    ) == rowset(minhash_lsh_pairs_between(new, corpus, **kw))
