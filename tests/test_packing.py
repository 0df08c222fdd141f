"""Sequence packing: concat-then-chunk token layout, two-phase prefix
sum correctness across partitions."""

from pyspark.sql import functions as F

from feature_store_api_spark.operators.packing import pack_documents


def test_pack_documents_prefix_and_boundaries(spark):
    rows = [(i, 100 + (i % 7) * 50) for i in range(200)]  # 100..400 tokens
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_documents(df, "n", "doc_id", budget=1000, num_partitions=7)
    got = {r["doc_id"]: r for r in out.collect()}
    # exclusive prefix sum in doc_id order, across partition boundaries
    acc = 0
    for i in range(200):
        n = 100 + (i % 7) * 50
        r = got[i]
        assert r["start_token"] == acc, i
        assert r["pack_id"] == acc // 1000
        assert r["pack_offset"] == acc % 1000
        assert r["spans_boundary"] == (acc % 1000 + n > 1000)
        acc += n
    # deterministic across evaluations
    again = {r["doc_id"]: r["start_token"] for r in
             pack_documents(df, "n", "doc_id", budget=1000, num_partitions=7).collect()}
    assert again == {i: got[i]["start_token"] for i in range(200)}


def test_chunk_documents_no_overlap_reconstructs(spark):
    from feature_store_api_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xyz"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "text", "doc_id", chunk_size=4).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_index"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    # concatenation of non-overlapping chunks == original text
    assert "".join(by_doc[1]) == "abcdefghij"
    assert by_doc[1] == ["abcd", "efgh", "ij"]
    assert by_doc[2] == ["xyz"]
    # empty and null docs emit no chunks
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_overlap_and_sizes(spark):
    from feature_store_api_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    out = sorted(
        chunk_documents(docs, "text", "doc_id", chunk_size=4, overlap=2).collect(),
        key=lambda r: r["chunk_index"],
    )
    # stride 2: starts 0,2,4,6,8 → windows of 4 chars (last short)
    assert [r["chunk_text"] for r in out] == ["abcd", "cdef", "efgh", "ghij", "ij"]
    assert [r["chunk_chars"] for r in out] == [4, 4, 4, 4, 2]
    # every adjacent pair shares exactly `overlap` chars
    for a, b in zip(out, out[1:]):
        assert a["chunk_text"][2:] == b["chunk_text"][: len(a["chunk_text"]) - 2]


def test_chunk_documents_invalid_overlap_raises(spark):
    from feature_store_api_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, "text", "doc_id", chunk_size=4, overlap=4)


def test_chunk_documents_is_scan_side(spark):
    from feature_store_api_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = (
        chunk_documents(docs, "text", "doc_id", chunk_size=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan.replace("PythonRDD", "")  # local-relation scan aside
