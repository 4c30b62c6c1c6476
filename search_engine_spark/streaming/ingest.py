"""Structured-streaming ingest: incremental pages → docs → partial postings.

The reference's "streaming" is TCP frames into bounded queues
(Parser.cpp:255-332, 203-246); the Spark-native equivalent is a file/table
stream with checkpointed exactly-once micro-batches:

* ``stream_docs``          — readStream over a pages directory → the same
                             extraction UDF as the batch path (operator
                             reuse: one extract_docs for both modes).
* ``incremental_index``    — foreachBatch sink appending per-batch logical
                             postings + docmeta partials to the warehouse;
                             the batch merge job (jobs/merge_index.py) then
                             consolidates partials into the packed index —
                             i.e. the streaming path PRODUCES the inputs of
                             the multi-pass shuffle-merge (SURVEY.md A6).
                             Trigger availableNow => drain-and-stop, which
                             with the checkpoint dir gives resumable,
                             exactly-once incremental builds.
* ``ingest_metrics``       — event-time windowed ingest counts with a
                             watermark (late pages beyond 1 hour dropped),
                             the streaming metrics sidecar.

doc_id note: batch builds assign dense url-rank ids (operators/docids.py);
streaming appends cannot renumber, so incremental partials use a stable
64-bit id xxhash64(url) and the consolidating merge keeps first-wins on
conflict.  A full rebuild (batch pipeline) restores dense ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import schemas
from search_engine_spark.operators import extract
from search_engine_spark.sources.catalog import IndexCatalog


def stream_docs(spark: SparkSession, pages_dir: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(schemas.PAGES)
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.parquet(pages_dir)
    return extract.extract_docs(pages)


def incremental_index(spark: SparkSession, pages_dir: str, warehouse: str,
                      checkpoint: str, max_files_per_trigger: int | None = None):
    """Drain all currently-available page files into per-batch partial
    tables; returns the finished StreamingQuery (awaitTermination'd)."""
    cat = IndexCatalog(spark, warehouse)
    docs = stream_docs(spark, pages_dir, max_files_per_trigger)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = extract.drop_overlong_titles(batch_df)
        batch = extract.dedup_first_wins(batch)
        batch = batch.withColumn("doc_id", F.xxhash64("url"))
        from search_engine_spark.operators import build as B

        cat.write("docmeta_stream", B.build_docmeta(batch), mode="append")
        cat.write("postings_stream", B.build_postings(batch), mode="append")
        cat.log_phase(
            f"stream_batch_{batch_id}", cat.read("postings_stream"),
            {"batch_id": batch_id},
        )

    q = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def ingest_metrics(docs: DataFrame, window: str = "1 hour",
                   watermark: str = "1 hour") -> DataFrame:
    """Event-time ingest rates over fetch timestamps, late data dropped
    past the watermark (works on both stream and batch frames)."""
    return (
        docs.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).getField("start").alias("win"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("bytes_text"),
        )
    )
