"""Physical-plan shape checks (SURVEY.md §4): the packed query path must
partition-prune to the query terms' shard directories and push the term
filter into the parquet scan; BM25 scoring joins must broadcast the tiny
side.  These are the properties that keep a 10^12-doc query from touching
more than |q| shards."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_packed_scan_prunes_shard_partitions(catalog, packed_engine):
    eng = packed_engine
    from search_engine_spark.operators.merge import shard_col

    kdf = eng.spark.createDataFrame([("search",)], "term string")
    shard = kdf.select(shard_col(num_shards=eng.num_shards).alias("s")).collect()[0]["s"]
    df = eng.packed.filter(
        (F.col("shard") == shard) & (F.col("term") == "search")
    )
    plan = _explain(df)
    assert "PartitionFilters" in plan
    # the shard predicate must reach the partition filter, not a post-scan
    # Filter node; the term predicate must be pushed to parquet
    assert "shard" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "term" in pushed and "search" in pushed


def test_num_shards_from_catalog_property(catalog, packed_engine):
    assert catalog.get_prop("num_shards") == 8
    assert packed_engine.num_shards == 8


def test_df_map_join_is_broadcast(engine):
    """The per-term df map in the exhaustive path must broadcast, never
    shuffle the postings side."""
    df = engine._scored({"search", "@search"})
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_docs_scan_prunes_columns(spark, pages_path):
    """Column pruning: a projection of two docs columns must not read the
    heavy terms/links arrays from parquet (ReadSchema check)."""
    docs = spark.read.parquet(pages_path).select("url", "lang")
    plan = _explain(docs)
    rs = plan.split("ReadSchema")[1].splitlines()[0]
    assert "url" in rs and "lang" in rs
    assert "html" not in rs and "text" not in rs


def test_pack_phase_never_reads_positions(catalog):
    """The BM25 pack path must column-prune the heavy positions array out
    of its parquet scan (SURVEY §7.2: positions only serve phrases)."""
    from search_engine_spark.operators import merge

    df = merge.pack_partials(catalog.read("postings"), avgdl=100.0,
                             num_shards=8, bucket_width=100)
    plan = _explain(df)
    rs = plan.split("ReadSchema")[1].splitlines()[0]
    assert "positions" not in rs
    assert "tf" in rs and "dl" in rs


def test_topk_docmeta_join_is_broadcast(packed_engine):
    plan = _explain(packed_engine.search("search engine", k=10))
    assert "BroadcastHashJoin" in plan


def test_phrase_fallback_prunes_shard_partitions(engine):
    """The phrase/NOT fallback reads the LOGICAL postings — which are now
    hive-partitioned by term shard — so a phrase query must prune to the
    query terms' shard dirs instead of full-scanning the table."""
    assert engine.num_shards, "postings should be shard-partitioned"
    df = engine._scored({"search", "@search", "engin", "@engin"})
    plan = _explain(df)
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters")[1].splitlines()[0]
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "term" in pushed


def test_packed_query_matches_after_shard_pruning(engine, packed_engine):
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in packed_engine.search("search engine", k=10).collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search("search engine", k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
