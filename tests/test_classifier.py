"""In-engine logistic-regression quality classifier
(operators/classifier.py): value-exact numpy twin + separation."""

from __future__ import annotations

import hashlib
import re

import numpy as np

from biokg_spark.operators.classifier import (
    score_documents,
    train_quality_classifier,
)

DOCS_SCHEMA = "doc_id long, text string, source string"


def _shingle_set(text: str, width: int) -> set[str]:
    # twin of operators/dedup.py::shingles — split("\\s+") of
    # lower(trim); < width tokens => the whole token string
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) >= width:
        return {" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)}
    return {" ".join(toks)}


def _bucket(sh: str, buckets: int) -> int:
    return int(hashlib.md5(sh.encode()).hexdigest()[:7], 16) % buckets


def _numpy_fit_and_score(rows, label_fn, buckets, width, iters, lr):
    feats = {}
    for doc_id, text, _src in rows:
        bs = {_bucket(s, buckets) for s in _shingle_set(text, width)}
        x = {b: 1.0 / len(bs) for b in bs}
        x[-1] = 1.0  # bias row
        feats[doc_id] = x
    y = {doc_id: float(label_fn(src)) for doc_id, _t, src in rows}
    w = {b: 0.0 for b in range(-1, buckets)}
    n = len(rows)
    for _ in range(iters):
        resid = {}
        for d, x in feats.items():
            z = sum(w[b] * v for b, v in x.items())
            resid[d] = 1.0 / (1.0 + np.exp(-z)) - y[d]
        grad = {b: 0.0 for b in w}
        for d, x in feats.items():
            for b, v in x.items():
                grad[b] += resid[d] * v / n
        w = {b: w[b] - lr * grad[b] for b in w}
    scores = {}
    for d, x in feats.items():
        z = sum(w[b] * v for b, v in x.items())
        scores[d] = 1.0 / (1.0 + np.exp(-z))
    return w, scores


def _rows():
    good = ["alpha beta gamma", "alpha beta delta", "beta gamma epsilon"]
    bad = ["zzz yyy xxx", "yyy xxx www", "xxx www vvv", "www vvv uuu"]
    rows = []
    for i, t in enumerate(good):
        rows.append((i, t, "curated"))
    for i, t in enumerate(bad):
        rows.append((100 + i, t, "web"))
    return rows


def test_classifier_matches_numpy_twin_value_exact(spark):
    from pyspark.sql import functions as F

    rows = _rows()
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    label = F.col("source") == "curated"
    w = train_quality_classifier(docs, label, buckets=64, width=2, iters=5, lr=4.0)
    got_w = {r.bucket: r.w for r in w.collect()}
    got_s = {
        r.doc_id: r.score
        for r in score_documents(docs, w, buckets=64, width=2).collect()
    }
    want_w, want_s = _numpy_fit_and_score(
        rows, lambda s: s == "curated", buckets=64, width=2, iters=5, lr=4.0
    )
    # weight dim covers every bucket incl. untouched ones (w stays 0)
    assert set(got_w) == set(range(-1, 64))
    for b, v in want_w.items():
        assert abs(got_w[b] - v) < 1e-9, (b, got_w[b], v)
    assert set(got_s) == set(want_s)
    for d in want_s:
        assert abs(got_s[d] - want_s[d]) < 1e-9, d


def test_classifier_separates_disjoint_vocabularies(spark):
    from pyspark.sql import functions as F

    rows = _rows()
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    label = F.col("source") == "curated"
    w = train_quality_classifier(docs, label, buckets=256, width=2, iters=8, lr=4.0)
    s = {
        r.doc_id: r.score
        for r in score_documents(docs, w, buckets=256, width=2).collect()
    }
    pos = [s[d] for d, _t, src in rows if src == "curated"]
    neg = [s[d] for d, _t, src in rows if src != "curated"]
    assert min(pos) > max(neg), (min(pos), max(neg))
    assert min(pos) > 0.5 > max(neg)


def test_classifier_empty_text_is_represented(spark):
    from pyspark.sql import functions as F

    rows = [(1, "", "curated"), (2, "xxx yyy", "web"), (3, "xxx zzz", "web")]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    label = F.col("source") == "curated"
    w = train_quality_classifier(docs, label, buckets=32, width=2, iters=3, lr=4.0)
    s = score_documents(docs, w, buckets=32, width=2)
    assert s.count() == 3  # empty doc still scored (bias + "" shingle)
    want_w, want_s = _numpy_fit_and_score(
        rows, lambda src: src == "curated", buckets=32, width=2, iters=3, lr=4.0
    )
    got = {r.doc_id: r.score for r in s.collect()}
    for d in want_s:
        assert abs(got[d] - want_s[d]) < 1e-9, d
