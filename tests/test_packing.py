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
