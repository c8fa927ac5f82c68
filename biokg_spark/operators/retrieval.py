"""Lexical retrieval and LM-style scoring over the document corpus.

A training-data pipeline retrieves as well as filters: BM25 is the
standard lexical ranker (eval-set leakage triage, nearest-document
inspection, weak-label mining), and a corpus-fit unigram log-probability
is the cheapest LM-quality signal (the KenLM-perplexity stand-in used by
CCNet-style corpus filters, with the n-gram order dropped to 1 so the
whole thing stays two aggregates).

Both are pure DataFrame compositions with exact DuckDB oracles: the
only float functions are ln/division (IEEE-identical across engines)
and scores are rounded at the edge for cross-engine comparison.

Scale shape: document-frequency and corpus-total statistics are
map-side-partial aggregates; the corpus scalars (N, avgdl, total token
count) are 1-row aggregates broadcast back via crossJoin (the in-plan
alternative to a driver collect — same pattern as kg_entity_tfidf,
allowlisted in the plan auditor); the query side of BM25 is dim-sized
and broadcast. No all-pairs stage: candidate (doc, term) pairs come
from the inverted term join, so a document that shares no term with a
query is never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biokg_spark.functions.text import tokens


def _term_freqs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) + per-doc length — one explode + one aggregate."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 5,
) -> DataFrame:
    """BM25 top-k documents per query: (query_id, doc_id, score, rank).

    Okapi BM25 with the +1 idf smoothing (Lucene form, always
    positive): idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); score(d,q) =
    Σ_t idf · tf·(k1+1)/(tf + k1·(1 − b + b·len_d/avgdl)). Query terms
    are deduplicated (standard bag-of-words query semantics).

    Plan: tf table (explode + partial agg) → df per term (partial agg)
    → corpus scalars N/avgdl (1-row crossJoin broadcast) → inverted
    equi-join with the broadcast query terms → per-(query, doc) score
    aggregate → top-k window. Scores rounded to 4 dp at the edge so the
    DuckDB twin hash-matches.
    """
    tf = _term_freqs(docs, text_col, id_col)
    doc_len = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    term_df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    q_terms = (
        queries.select(
            F.col(query_id), F.explode(tokens(query_text)).alias("term")
        )
        .where(F.col("term") != "")
        .dropDuplicates([query_id, "term"])
    )
    joined = (
        tf.join(F.broadcast(q_terms), "term")
        .join(term_df, "term")
        .join(doc_len, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = joined.groupBy(query_id, id_col).agg(
        F.round(F.sum(idf * tf_part), 4).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(query_id, id_col, "score", "rank")
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus-fit
    unigram LM — the cheap LM-quality signal (low = typical text, high
    = out-of-distribution / garbled). Returns (id, n_tokens,
    mean_neg_logprob) rounded to 4 dp.

    p(t) = corpus_count(t) / corpus_total; every scored token was seen
    (the model is fit on the same corpus), so no smoothing term is
    needed. Two partial aggregates + one broadcast-scalar crossJoin —
    the whole "train + score" loop is one linear plan.
    """
    tf = _term_freqs(docs, text_col, id_col)
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = corpus.agg(F.sum("ctf").alias("total"))
    return (
        tf.join(corpus, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * -F.log(F.col("ctf") / F.col("total")))
                / F.sum("tf"),
                4,
            ).alias("mean_neg_logprob"),
        )
    )


def mine_hard_negatives(
    docs: DataFrame,
    pairs: DataFrame,
    n_negatives: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
    pos_col: str = "pos_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training.

    The DPR/ANCE training-data recipe: for every (query, positive)
    pair, the hardest negatives are the top lexically-similar documents
    that are NOT the positive — random negatives are too easy and the
    bi-encoder never learns fine distinctions. Runs :func:`bm25_search`
    at top-(n_negatives + 1) (the positive can occupy at most one slot),
    drops the positive, re-ranks the survivors by their BM25 rank and
    keeps ``n_negatives``.

    Output: (query_id, pos_id, neg_id, neg_rank, neg_score) — one row
    per mined negative; queries whose BM25 hit list is empty (no shared
    vocabulary) emit nothing.

    Scale shape: inherits bm25_search's inverted-index join plan (the
    corpus never all-pairs against the query set; query terms broadcast
    since the training-pair set is dim-sized next to the corpus); the
    positive-exclusion join broadcasts the same pair dim, and the
    re-rank window shuffles only the top-k hit rows — (n_negatives+1) ×
    |queries|, corpus-size-independent.

    Reference: n/a — training-data-pipeline mandate (retrieval
    training-pair construction); cf. Karpukhin et al. 2020 (DPR) BM25
    hard negatives.
    """
    hits = bm25_search(
        docs,
        pairs.select(query_id, query_text),
        text_col=text_col,
        id_col=id_col,
        query_id=query_id,
        query_text=query_text,
        k1=k1,
        b=b,
        topk=n_negatives + 1,
    )
    neg = hits.join(F.broadcast(pairs.select(query_id, pos_col)), query_id).where(
        F.col(id_col) != F.col(pos_col)
    )
    w = Window.partitionBy(query_id).orderBy("rank")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n_negatives)
        .select(
            query_id,
            pos_col,
            F.col(id_col).alias("neg_id"),
            "neg_rank",
            F.col("score").alias("neg_score"),
        )
    )


def jaccard_search(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
    topk: int = 5,
    decimals: int = 4,
) -> DataFrame:
    """Token-set Jaccard top-k documents per query:
    (query_id, doc_id, score, rank).

    The set-overlap ranker — a second retrieval signal with a
    different bias than BM25 (no tf saturation, no idf), which is
    exactly what reciprocal-rank fusion wants as an input. Candidates
    come from the same inverted term join as BM25 (docs sharing no
    term never materialize); ranking is on the ROUNDED score with a
    doc_id tie-break so cross-engine comparison is exact.
    """
    d_terms = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    ).where(F.col("term") != "")
    d_size = d_terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nd"))
    q_terms = queries.select(
        F.col(query_id),
        F.explode(F.array_distinct(tokens(query_text))).alias("term"),
    ).where(F.col("term") != "")
    q_size = q_terms.groupBy(query_id).agg(F.count(F.lit(1)).alias("_nq"))
    ov = (
        d_terms.join(q_terms, "term")
        .groupBy(query_id, id_col)
        .agg(F.count(F.lit(1)).alias("_ov"))
    )
    scored = (
        ov.join(d_size, id_col)
        .join(q_size, query_id)
        .select(
            query_id,
            id_col,
            F.round(
                F.col("_ov") / (F.col("_nd") + F.col("_nq") - F.col("_ov")),
                decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= topk)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    query_id: str = "query_id",
    id_col: str = "doc_id",
    topk: int = 5,
    decimals: int = 4,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack,
    Clarke & Buettcher 2009): RRF(q, d) = Σ_r 1/(k + rank_r(q, d)).

    The standard hybrid-search combiner (lexical + semantic + anything
    else that emits a rank) — it needs only RANKS, so heterogeneous
    scorers fuse without calibration. Documents absent from a ranking
    contribute nothing; ``n_lists`` reports how many rankings carried
    the doc. Re-ranking happens on the ROUNDED fused score with a
    doc_id tie-break (engine-exact).

    Scale shape: each input ranking is already top-k-per-query (tiny —
    |queries| × k rows); the fusion is a union + ONE HashAggregate +
    one per-query window on that tiny frame. The expensive part of
    hybrid search stays inside the input rankers, which each keep
    their own inverted/ANN-bucketed plans.
    """
    contribs = [
        r.select(
            F.col(query_id),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("_c"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = u.groupBy(query_id, id_col).agg(
        F.round(F.sum("_c"), decimals).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fused_rank") <= topk)
    )
