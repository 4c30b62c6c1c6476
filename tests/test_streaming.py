"""Structured-streaming ingest: checkpointed availableNow micro-batches,
incremental partial postings, exactly-once on restart (SURVEY-extras;
replaces the reference's TCP/queue plumbing, Parser.cpp:255-332)."""

import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark.sources.catalog import IndexCatalog
from search_engine_spark.sources.pages import write_pages_parquet
from search_engine_spark.streaming import ingest


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "pages_in"
    src.mkdir()
    wh = tmp_path / "wh"
    ckpt = tmp_path / "ckpt"
    yield src, wh, ckpt
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_incremental_index_drains_and_resumes(spark, stream_dirs):
    src, wh, ckpt = stream_dirs
    write_pages_parquet(src / "batch0.parquet", 40)

    ingest.incremental_index(spark, str(src), str(wh), str(ckpt))
    cat = IndexCatalog(spark, wh)
    n0 = cat.read("postings_stream").count()
    docs0 = cat.read("docmeta_stream").count()
    assert n0 > 0 and docs0 > 0

    # second drain with NO new files: checkpoint must prevent reprocessing
    ingest.incremental_index(spark, str(src), str(wh), str(ckpt))
    assert cat.read("postings_stream").count() == n0

    # new file appears (disjoint corpus via a different seed) → only the
    # increment is processed
    write_pages_parquet(src / "batch1.parquet", 60, seed=43)
    ingest.incremental_index(spark, str(src), str(wh), str(ckpt))
    docs1 = cat.read("docmeta_stream").count()
    assert docs1 > docs0
    # stable ids: stream doc_id = xxhash64(url), 1:1 with urls
    meta = cat.read("docmeta_stream")
    assert (
        meta.select("doc_id").distinct().count()
        == meta.select("url").distinct().count()
    )


def test_stream_postings_match_batch_semantics(spark, stream_dirs):
    """The streaming path must produce the same (term, tf) postings as the
    batch build over the same pages (ids differ: hash vs dense rank)."""
    src, wh, ckpt = stream_dirs
    write_pages_parquet(src / "b.parquet", 40)
    ingest.incremental_index(spark, str(src), str(wh), str(ckpt))
    cat = IndexCatalog(spark, wh)

    from search_engine_spark.operators import build as B, docids, extract

    pages = spark.read.parquet(str(src / "b.parquet"))
    docs = docids.assign_doc_ids(
        extract.dedup_first_wins(extract.drop_overlong_titles(
            extract.extract_docs(pages)))
    )
    batch = (
        B.build_postings(docs).groupBy("term")
        .agg(F.sum("tf").alias("cf_b"), F.count("*").alias("df_b"))
    )
    stream = (
        cat.read("postings_stream").groupBy("term")
        .agg(F.sum("tf").alias("cf_s"), F.count("*").alias("df_s"))
    )
    diff = batch.join(stream, "term", "full_outer").filter(
        F.col("cf_b").isNull() | F.col("cf_s").isNull()
        | (F.col("cf_b") != F.col("cf_s")) | (F.col("df_b") != F.col("df_s"))
    )
    assert diff.count() == 0


def test_ingest_metrics_window(spark, stream_dirs):
    src, wh, ckpt = stream_dirs
    write_pages_parquet(src / "b.parquet", 50)
    docs = ingest.stream_docs(spark, str(src))
    # complete mode: append would hold windows open until the watermark
    # passes their end, which a drained availableNow run never reaches
    q = (
        ingest.ingest_metrics(docs)
        .writeStream.format("memory")
        .queryName("ingest_metrics_t")
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from ingest_metrics_t").collect()
    assert sum(r["n_docs"] for r in rows) == 50
    assert all(r["bytes_text"] > 0 for r in rows)
