"""Property-based checks for chunking, tf·idf and quantization.

Invariants that hold for ANY input — the class of guarantee the DuckDB
oracle (fixed corpus) cannot give:

1. Chunk reconstruction: dropping each chunk's overlap prefix and
   concatenating reproduces the document's exact token stream — no token
   lost, duplicated (beyond the declared overlap) or reordered.
2. Chunk shape: every chunk except the last is exactly ``chunk_tokens``
   long and consecutive chunks share exactly ``overlap`` tokens.
3. tf·idf ranking sanity: per document the returned terms are a subset
   of its tokens, scores are positive, and rows are k-bounded.
4. Quantization order preservation: within a vector, codes are
   monotone in the values (quantization never inverts an order by more
   than a rounding tie).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gdutils_spark.operators.text import chunk_documents, tf_idf_top_terms
from gdutils_spark.operators.similarity import quantize_embeddings

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]

texts = st.lists(st.sampled_from(WORDS), min_size=0, max_size=40).map(" ".join)
corpora = st.lists(texts, min_size=1, max_size=6)

slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, texts_):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_)], "doc_id long, text string"
    )


@given(corpora, st.integers(2, 8), st.integers(0, 3))
@slow
def test_chunks_reconstruct_token_stream(spark, texts_, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    out = chunk_documents(_df(spark, texts_), chunk_tokens=chunk, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    for i, t in enumerate(texts_):
        toks = t.lower().split()
        chunks = sorted(by_doc.get(i, []))
        if not toks:
            assert chunks == []
            continue
        # chunk ids are dense from 0
        assert [c for c, _, _ in chunks] == list(range(len(chunks)))
        # every chunk except the last is full-size
        for _, n, _ in chunks[:-1]:
            assert n == chunk
        # reconstruction: first chunk whole, then drop each overlap prefix
        rebuilt = []
        for idx, (_, _, text) in enumerate(chunks):
            ts = text.split(" ") if text else []
            rebuilt.extend(ts if idx == 0 else ts[overlap:])
        assert rebuilt == toks
        # consecutive chunks share exactly `overlap` tokens
        for (_, _, a), (_, _, b) in zip(chunks, chunks[1:]):
            if overlap:
                assert a.split()[-overlap:] == b.split()[:overlap]


@given(corpora, st.integers(1, 4))
@slow
def test_tfidf_terms_are_document_tokens(spark, texts_, k):
    rows = tf_idf_top_terms(_df(spark, texts_), k=k).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts_):
        toks = set(t.lower().split()) - {""}
        got = by_doc.get(i, [])
        assert len(got) <= k
        if toks:
            assert len(got) == min(k, len(toks))
        for r in got:
            assert r.term in toks
            assert r.score > 0
            assert r.tf >= 1 and r.df >= 1


vectors = st.lists(
    st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=64),
        min_size=4,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@given(vectors)
@slow
def test_quantization_preserves_order(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        r = got[i]
        assert len(r.codes) == len(v)
        assert all(0 <= c <= 255 for c in r.codes)
        # order preservation: larger value → not-smaller code
        pairs = sorted(zip(v, r.codes))
        for (v1, c1), (v2, c2) in zip(pairs, pairs[1:]):
            assert c1 <= c2, (v1, c1, v2, c2)


# ---------------------------------------------------------------------------
# Segment-level boilerplate dedup + token rarity / unigram LM
# ---------------------------------------------------------------------------

import math
import re

from gdutils_spark.operators.text import (
    remove_common_segments,
    token_rarity,
    unigram_logprob,
)


def _model_tokens(t: str) -> list[str]:
    # mirror of operators.text.tokens(): split(lower(trim(text)), '\s+')
    return re.split(r"\s+", t.strip().lower())


def _model_segments(texts_, width, min_docs):
    per_doc = []
    for t in texts_:
        ws = _model_tokens(t)
        nseg = math.ceil(len(ws) / width)
        per_doc.append(
            [" ".join(ws[i * width : (i + 1) * width]) for i in range(nseg)]
        )
    doc_count: dict[str, int] = {}
    for segs in per_doc:
        for s in set(segs):
            doc_count[s] = doc_count.get(s, 0) + 1
    boiler = {s for s, n in doc_count.items() if n >= min_docs}
    out = {}
    for i, segs in enumerate(per_doc):
        kept = [s for s in segs if s not in boiler]
        out[i] = (len(segs), len(kept), " ".join(kept))
    return out


@given(corpora, st.integers(1, 6), st.integers(2, 3))
@slow
def test_segment_dedup_matches_model(spark, texts_, width, min_docs):
    got = {
        r.doc: (r.n_segs, r.n_kept, r.cleaned_text)
        for r in remove_common_segments(
            _df(spark, texts_), width=width, min_docs=min_docs
        ).collect()
    }
    assert got == _model_segments(texts_, width, min_docs)


def _model_rarity(texts_):
    from collections import Counter

    tf = {
        i: Counter(w for w in _model_tokens(t) if w != "")
        for i, t in enumerate(texts_)
    }
    freq = Counter()
    for c in tf.values():
        freq.update(c)
    out = {}
    for i, c in tf.items():
        if not c:
            continue  # docs with no nonempty tokens drop out (explode+filter)
        n = sum(c.values())
        mass = sum(cnt * freq[w] for w, cnt in c.items())
        out[i] = (n, len(c), mass, mass / n)
    return out, freq


@given(corpora)
@slow
def test_token_rarity_matches_model(spark, texts_):
    expect, _ = _model_rarity(texts_)
    got = {
        r.doc: (r.n_tokens, r.n_distinct, r.freq_mass, r.mean_token_freq)
        for r in token_rarity(_df(spark, texts_)).collect()
    }
    assert got == expect


@given(corpora)
@slow
def test_unigram_logprob_matches_model(spark, texts_):
    expect, freq = _model_rarity(texts_)
    total = sum(freq.values())
    got = {r.doc: r for r in unigram_logprob(_df(spark, texts_)).collect()}
    assert set(got) == set(expect)
    from collections import Counter

    for i in expect:
        c = Counter(w for w in _model_tokens(texts_[i]) if w != "")
        n = sum(c.values())
        want = sum(-cnt * math.log(freq[w] / total) for w, cnt in c.items()) / n
        r = got[i]
        assert r.n_tokens == n
        assert abs(r.mean_neg_logprob - want) <= 1e-9 * max(1.0, abs(want))
        assert r.mean_neg_logprob >= -1e-12  # -log p is non-negative


def test_compression_signals(spark):
    from gdutils_spark.operators.text import compression_signals

    import zlib

    rows = [
        (0, "spam " * 200),                      # templated → compresses hard
        (1, " ".join(f"w{i * 7919 % 104729}" for i in range(200))),  # high-entropy
        (2, ""),                                 # empty → NULL ratio
        (3, None),                               # null text behaves like empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: r for r in compression_signals(df).collect()}
    assert set(got) == {0, 1, 2, 3}
    # exact zlib agreement (determinism of the probe)
    for i in (0, 1):
        b = rows[i][1].encode()
        assert got[i].raw_bytes == len(b)
        assert got[i].zlib_bytes == len(zlib.compress(b, 6))
        assert got[i].zlib_ratio == len(zlib.compress(b, 6)) / len(b)
    # the repetition detector property: templated ≪ high-entropy
    assert got[0].zlib_ratio < 0.1 < got[1].zlib_ratio
    for i in (2, 3):
        assert got[i].raw_bytes == 0 and got[i].zlib_ratio is None


def test_compression_signals_generic_id_type(spark):
    """The output schema must inherit the input id type — string doc ids
    pass through (previously hardcoded to long → Arrow failure)."""
    from gdutils_spark.operators.text import compression_signals

    df = spark.createDataFrame(
        [("doc-a", "spam " * 50), ("doc-b", None)], "doc_id string, text string"
    )
    out = compression_signals(df)
    assert out.schema["doc"].dataType.simpleString() == "string"
    got = {r.doc: r for r in out.collect()}
    assert set(got) == {"doc-a", "doc-b"}
    assert got["doc-a"].zlib_ratio < 0.2 and got["doc-b"].zlib_ratio is None


def test_bigram_lm_probabilities_sum_to_one(spark):
    """Conditional probabilities per history must sum to exactly 1 (the
    denominator is the bigram-START total), and counts must match a
    Python model."""
    from collections import Counter

    from gdutils_spark.operators.text import bigram_lm

    texts = ["a b a b c", "b c b", "a  b", "solo", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bigram_lm(df).collect()
    model = Counter()
    for t in texts:
        ws = t.split()
        for x, y in zip(ws, ws[1:]):
            model[(x, y)] += 1
    got = {(r.w1, r.w2): r.pair_count for r in rows}
    assert got == dict(model)
    from collections import defaultdict

    per_w1 = defaultdict(float)
    for r in rows:
        assert r.cond_prob == r.pair_count / r.w1_count
        per_w1[r.w1] += r.cond_prob
    assert all(abs(s - 1.0) < 1e-12 for s in per_w1.values())
    # top_k cut is deterministic and ordered
    top = bigram_lm(df, top_k=2).collect()
    assert len(top) == 2
    assert top[0].pair_count >= top[1].pair_count


def _substring_dedup_model(texts_, k):
    """Pure-Python replay of remove_repeated_substrings: repeated
    k-shingle sites lose every occurrence after the global (doc, pos)
    minimum; a token is dropped iff covered by a removed site."""
    from collections import defaultdict

    toks = {d: t.split(" ") if t else [""] for d, t in enumerate(texts_)}
    by_sh = defaultdict(list)
    for d, ws in toks.items():
        for p in range(len(ws) - k + 1):
            by_sh[" ".join(ws[p : p + k])].append((d, p))
    covered = defaultdict(set)
    for sites in by_sh.values():
        for d, p in sorted(sites)[1:]:
            covered[d].update(range(p, p + k))
    out = {}
    for d, ws in toks.items():
        keep = [t for i, t in enumerate(ws) if i not in covered[d]]
        out[d] = (len(ws), len(keep), " ".join(keep))
    return out


@given(st.lists(st.lists(st.sampled_from(WORDS), min_size=1, max_size=30).map(" ".join), min_size=1, max_size=6), st.integers(min_value=2, max_value=6))
@slow
def test_remove_repeated_substrings_matches_model(spark, texts_, k):
    from gdutils_spark.operators.text import remove_repeated_substrings

    got = {
        r.doc: (r.n_tokens, r.n_kept, r.cleaned_text)
        for r in remove_repeated_substrings(_df(spark, texts_), k=k).collect()
    }
    assert got == _substring_dedup_model(texts_, k)


def test_remove_repeated_substrings_keeps_first_occurrence(spark):
    from gdutils_spark.operators.text import remove_repeated_substrings

    span = "one two three four"
    texts_ = [
        f"{span} tail0",          # doc 0: first occurrence — kept whole
        f"head1 {span} tail1",    # doc 1: span removed
        "unique words only here",  # doc 2: untouched
    ]
    got = {
        r.doc: r.cleaned_text
        for r in remove_repeated_substrings(_df(spark, texts_), k=4).collect()
    }
    assert got[0] == f"{span} tail0"
    assert got[1] == "head1 tail1"
    assert got[2] == "unique words only here"


def test_remove_repeated_substrings_staged_identical(spark, tmp_path):
    from gdutils_spark.operators.text import remove_repeated_substrings

    texts_ = ["a b c d a b c d x", "z a b c d w", "a b c d"]
    live = {
        tuple(r)
        for r in remove_repeated_substrings(_df(spark, texts_), k=4).collect()
    }
    staged = {
        tuple(r)
        for r in remove_repeated_substrings(
            _df(spark, texts_), k=4, stage_path=str(tmp_path / "sites")
        ).collect()
    }
    assert staged == live


def test_incremental_substring_dedup_semantics(spark, tmp_path):
    """Batch-vs-corpus substring dedup: a span present in the corpus
    loses ALL batch occurrences; a batch-only repeated span keeps its
    first; unique batch text is untouched. Staged corpus sites give
    identical results."""
    from gdutils_spark.operators.text import (
        remove_repeated_substrings_between,
        substring_sites,
    )

    span = "alpha beta gamma delta"
    corpus = _df(spark, [f"{span} corpus tail", "other corpus words here"])
    batch_texts = [
        f"{span} batch one",          # span in corpus → removed
        f"also {span} again",         # second batch occurrence → removed
        "fresh pair fresh pair x",    # batch-internal repeat (k=2)
        "totally unique text row",
    ]
    batch = spark.createDataFrame(
        [(10 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    got = {
        r.doc: r.cleaned_text
        for r in remove_repeated_substrings_between(
            corpus, batch, k=4
        ).collect()
    }
    assert got[10] == "batch one"
    assert got[11] == "also again"
    assert got[13] == "totally unique text row"
    # k=2 internal repeat check: "fresh pair" repeats within doc 12
    got2 = {
        r.doc: r.cleaned_text
        for r in remove_repeated_substrings_between(
            corpus, batch, k=2
        ).collect()
    }
    assert "fresh pair" in got2[12] or got2[12].count("fresh") == 1
    # staged corpus sites path
    path = str(tmp_path / "csites")
    substring_sites(corpus, k=4).write.parquet(path)
    staged = {
        r.doc: r.cleaned_text
        for r in remove_repeated_substrings_between(
            corpus, batch, k=4, corpus_sites_path=path
        ).collect()
    }
    assert staged == got
    # staged BATCH sites path (the three-consumer staging convention)
    staged_b = {
        r.doc: r.cleaned_text
        for r in remove_repeated_substrings_between(
            corpus, batch, k=4, stage_path=str(tmp_path / "bsites")
        ).collect()
    }
    assert staged_b == got


def test_bigram_oov_rate_semantics(spark):
    from gdutils_spark.operators.text import bigram_lm, bigram_oov_rate

    ref = _df(spark, ["alpha bravo charlie", "bravo charlie delta"])
    lm = bigram_lm(ref)
    probe = spark.createDataFrame(
        [
            (1, "alpha bravo charlie"),   # all pairs known → 0
            (2, "echo foxtrot golf"),     # no pairs known → 1
            (3, "alpha bravo zulu"),      # 1 of 2 known → 0.5
            (4, "single"),                # no bigrams → no row
        ],
        "doc_id long, text string",
    )
    got = {r.doc: r for r in bigram_oov_rate(probe, lm).collect()}
    assert got[1].oov_rate == 0.0 and got[1].n_bigrams == 2
    assert got[2].oov_rate == 1.0
    assert got[3].n_oov == 1 and got[3].oov_rate == 0.5
    assert 4 not in got


# ---------------------------------------------------------------------------
# BPE training: differential test against a pure-Python transcription of
# Sennrich et al.'s learn_bpe (pair counting over the word-frequency
# dict, tie-broken argmax, greedy left-to-right merge).
# ---------------------------------------------------------------------------


def _model_bpe(texts_, n_merges):
    from collections import Counter

    wf = Counter(w for t in texts_ for w in t.lower().split() if w)
    vocab = {w: (tuple(w) + ("</w>",), f) for w, f in wf.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            return merges, vocab, True
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        new = {}
        for w, (syms, f) in vocab.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new[w] = (tuple(out), f)
        vocab = new
    return merges, vocab, False


@given(st.lists(texts, min_size=1, max_size=5), st.integers(1, 3))
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_matches_sennrich_model(spark, texts_, n_merges):
    from gdutils_spark.operators.text import bpe_token_stats, bpe_train

    # exhaustion (pairs run out before n_merges) is NOT an error: both
    # the trainer and the model stop early with the partial merge list
    # and the state at exhaustion, so the same assertions apply.
    model_merges, model_vocab, _exhausted = _model_bpe(texts_, n_merges)
    got = [
        (r.rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(_df(spark, texts_), n_merges=n_merges)
        .orderBy("rank")
        .collect()
    ]
    assert got == model_merges
    # final-state token stream matches the model's vocabulary state
    from collections import Counter

    want = Counter()
    for syms, f in model_vocab.values():
        for s in syms:
            want[s] += f
    stats = {
        r.token: r.n_occurrences
        for r in bpe_token_stats(_df(spark, texts_), n_merges=n_merges).collect()
    }
    assert stats == dict(want)


def test_bpe_greedy_overlap_and_encode(spark):
    from gdutils_spark.operators.text import bpe_encode_stats, bpe_train

    # 'aaa' under merge (a,a) must become [aa, a] — greedy, not maximal
    df = spark.createDataFrame(
        [(0, "aaa aaa ab"), (1, "aaa")], "doc_id long, text string"
    )
    m = bpe_train(df, n_merges=1).collect()[0]
    assert (m.left_sym, m.right_sym) == ("a", "a")
    enc = {r.doc: r for r in bpe_encode_stats(df, n_merges=1).collect()}
    # 'aaa' → [aa, a, </w>] = 3 symbols; 'ab' → [a, b, </w>] = 3
    assert enc[0].n_words == 3 and enc[0].n_bpe_tokens == 3 + 3 + 3
    assert enc[1].n_words == 1 and enc[1].n_bpe_tokens == 3
