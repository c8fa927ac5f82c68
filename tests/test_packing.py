"""Sequence-packing semantics (operators/packing.py)."""

from __future__ import annotations

from biokg_spark.operators.packing import pack_documents


def _run(spark, rows, n_shards=1, chunk_len=10):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return {
        r.doc_id: (r.shard, r.start_offset, r.chunk_id, r.end_chunk_id)
        for r in pack_documents(df, n_shards, chunk_len).collect()
    }


def test_offsets_and_straddle(spark):
    # one shard: docs of 4, 8, 3 tokens; chunks of 10
    got = _run(spark, [(1, 4), (2, 8), (3, 3)])
    assert got[1] == (0, 0, 0, 0)      # tokens 0-3
    assert got[2] == (0, 4, 0, 1)      # tokens 4-11: straddles blocks 0/1
    assert got[3] == (0, 12, 1, 1)     # tokens 12-14


def test_empty_doc_sits_at_offset(spark):
    got = _run(spark, [(1, 10), (2, 0), (3, 5)])
    assert got[2] == (0, 10, 1, 1)
    assert got[3] == (0, 10, 1, 1)


def test_sharding_is_deterministic_and_total(spark):
    rows = [(i, 7) for i in range(50)]
    a = _run(spark, rows, n_shards=4)
    b = _run(spark, rows, n_shards=4)
    assert a == b
    assert {v[0] for v in a.values()} <= set(range(4))
    # offsets within each shard are a contiguous prefix-sum: the max
    # offset + its doc's tokens equals the shard's total tokens
    for s in range(4):
        docs = [(k, v) for k, v in a.items() if v[0] == s]
        if not docs:
            continue
        total = 7 * len(docs)
        assert max(v[1] for _, v in docs) + 7 == total


def test_chunk_windows_overlap_and_tail(spark):
    from biokg_spark.operators.packing import chunk_windows

    docs = spark.createDataFrame(
        [("d1", " ".join(f"w{i}" for i in range(10))),  # 10 tokens
         ("d2", "only three tokens"),
         ("d3", "   ")],                                # blank: no rows
        "doc_id string, text string",
    )
    rows = chunk_windows(docs, width=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert "d3" not in by_doc
    d1 = sorted(by_doc["d1"], key=lambda r: r["chunk_ix"])
    # starts 1,4,7,10 -> windows of 4,4,4 and a 1-token tail
    assert [r["start_tok"] for r in d1] == [1, 4, 7, 10]
    assert [r["n_tokens"] for r in d1] == [4, 4, 4, 1]
    assert d1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert d1[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert d1[3]["chunk_text"] == "w9"
    # doc shorter than width: one short chunk
    d2 = by_doc["d2"]
    assert len(d2) == 1 and d2[0]["n_tokens"] == 3
