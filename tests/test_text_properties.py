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
