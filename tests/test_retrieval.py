"""BM25 retrieval + unigram-LM scoring semantics (operators/retrieval.py)."""

from __future__ import annotations

import math


def test_bm25_hand_computed(spark):
    """Tiny corpus scored by hand with the Okapi/Lucene +1-idf formula."""
    from biokg_spark.operators.retrieval import bm25_search

    docs = spark.createDataFrame(
        [(1, "cat sat mat"), (2, "cat cat dog"), (3, "dog runs")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "cat dog")], "query_id int, query_text string")
    got = {
        r.doc_id: (r.score, r.rank)
        for r in bm25_search(docs, q, topk=5).collect()
    }

    def part(tf, dl, avgdl, k1=1.2, b=0.75):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))  # df=2 for both terms
    avgdl = 8 / 3
    want = {
        1: round(idf * part(1, 3, avgdl), 4),
        2: round(idf * (part(2, 3, avgdl) + part(1, 3, avgdl)), 4),
        3: round(idf * part(1, 2, avgdl), 4),
    }
    assert {d: s for d, (s, _r) in got.items()} == want
    assert [d for d, (_s, r) in sorted(got.items(), key=lambda kv: kv[1][1])] == [2, 3, 1]


def test_bm25_no_shared_term_never_materialized(spark):
    from biokg_spark.operators.retrieval import bm25_search

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(1, "alpha"), (2, "zzz")], "query_id int, query_text string"
    )
    rows = bm25_search(docs, q).collect()
    assert {(r.query_id, r.doc_id) for r in rows} == {(1, 1)}  # q2: no hits


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from biokg_spark.operators.retrieval import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "common common common common"), (2, "common rare")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    # corpus: common x5, rare x1, total 6
    p_common, p_rare = 5 / 6, 1 / 6
    assert got[1].n_tokens == 4
    assert got[1].mean_neg_logprob == round(-math.log(p_common), 4)
    assert got[2].mean_neg_logprob == round(
        (-math.log(p_common) - math.log(p_rare)) / 2, 4
    )
    assert got[2].mean_neg_logprob > got[1].mean_neg_logprob


def test_hard_negatives_excludes_positive_and_reranks(spark):
    from biokg_spark.operators.retrieval import bm25_search, mine_hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana damson"),      # shares 2 terms with q1
            (3, "apple elderberry fig"),     # shares 1 term
            (4, "grape honeydew kiwi"),      # shares 0 terms — never a hit
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, "apple banana cherry", 1)],
        "query_id long, query_text string, pos_id long",
    )
    got = mine_hard_negatives(docs, pairs, n_negatives=2).collect()
    # BM25 top-3 is (1=positive, 2, 3); the positive drops, 2 and 3
    # re-rank to neg_rank 1 and 2
    assert [(r.neg_id, r.neg_rank) for r in sorted(got, key=lambda r: r.neg_rank)] \
        == [(2, 1), (3, 2)]
    assert all(r.pos_id == 1 and r.query_id == 1 for r in got)
    # neg_score is the BM25 score of that hit, verbatim
    hits = {
        r.doc_id: r.score
        for r in bm25_search(
            docs, pairs.select("query_id", "query_text"), topk=3
        ).collect()
    }
    for r in got:
        assert r.neg_score == hits[r.neg_id]


def test_hard_negatives_positive_outside_topk_and_empty_query(spark):
    from biokg_spark.operators.retrieval import mine_hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "x x x x x"),               # the positive: no query term
            (2, "apple banana cherry"),
            (3, "apple banana damson"),
            (4, "apple elderberry fig"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, "apple banana", 1), (2, "", 2)],
        "query_id long, query_text string, pos_id long",
    )
    got = mine_hard_negatives(docs, pairs, n_negatives=2).collect()
    # q1's positive never ranks (no shared term): top hits are all
    # negatives, still capped at n_negatives; q2 has no terms -> nothing
    assert {r.query_id for r in got} == {1}
    assert [r.neg_id for r in sorted(got, key=lambda r: r.neg_rank)] == [2, 3]


def test_rrf_fuse_hand_computed(spark):
    from biokg_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id int, doc_id long, rank int"
    )
    got = {
        r.doc_id: (r.rrf_score, r.n_lists, r.fused_rank)
        for r in rrf_fuse([a, b], k=60, topk=4).collect()
    }
    # doc 11: 1/62 + 1/61 = 0.0325 (4 dp) — in both lists, ranks first
    assert got[11] == (round(1 / 62 + 1 / 61, 4), 2, 1)
    assert got[10] == (round(1 / 61, 4), 1, 2)
    assert got[13] == (round(1 / 62, 4), 1, 3)
    assert got[12] == (round(1 / 63, 4), 1, 4)


def test_jaccard_search_exact(spark):
    from biokg_spark.operators.retrieval import jaccard_search

    docs = spark.createDataFrame(
        [(1, "red green blue"), (2, "red red red"), (3, "yellow pink")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(7, "red blue")], "query_id int, query_text string")
    got = {
        r.doc_id: (r.score, r.rank)
        for r in jaccard_search(docs, q, topk=3).collect()
    }
    # doc1: |{red,blue}|/|{red,green,blue} u {red,blue}| = 2/3
    # doc2: 1/2 (distinct terms: {red}); doc3: no overlap -> absent
    assert got == {1: (round(2 / 3, 4), 1), 2: (0.5, 2)}
