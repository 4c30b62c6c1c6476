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
per-fetch 64-bit id xxhash64(url, warc_ts).  ``consolidate_stream`` then
dedups first-wins across ALL batches, re-keys to dense url-rank ids
(identical to what the batch pipeline would assign for the same corpus),
and runs the standard pack+merge — so a streamed-then-consolidated
warehouse answers queries identically to a batch-built one.
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
        # per-FETCH stable id (url+ts): cross-batch refetches of a url stay
        # distinct so the consolidation pass can pick the first-wins keeper
        batch = batch.withColumn("doc_id", F.xxhash64("url", "warc_ts"))
        from search_engine_spark.operators import build as B

        meta = B.build_docmeta(batch).join(
            batch.select("doc_id", "warc_ts"), "doc_id"
        )
        cat.write("docmeta_stream", meta, mode="append")
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


def consolidate_stream(cat: IndexCatalog, num_shards: int = 32,
                       salt_buckets: int = 16,
                       merge_factor: int | None = None) -> None:
    """Turn the appended stream partials into the standard queryable
    warehouse: first-wins dedup across all micro-batches, dense url-rank
    re-key (bit-identical to the batch pipeline's ids for the same
    corpus), then the regular checkpointed pack+merge."""
    from pyspark.sql import Window

    meta = cat.read("docmeta_stream")
    # keeper fetch per url: earliest (warc_ts, doc_id) — first-wins
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").asc(), F.col("doc_id").asc()
    )
    keepers = (
        meta.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "warc_ts")
    )
    # dense ids by url rank — same axis the batch pipeline uses
    from search_engine_spark.operators.docids import dense_ids_by_key

    mapping = dense_ids_by_key(keepers.select("url", "doc_id"), key="url")
    remap = keepers.withColumnRenamed("doc_id", "_old").join(
        mapping.withColumnRenamed("doc_id", "_old"), ["url", "_old"]
    )
    cat.write("docmeta", remap.drop("_old").withColumnRenamed("new_id", "doc_id")
              .select("doc_id", "url", "title", "word_count", "title_len",
                      "url_len", "english", "tld", "dl"))
    post = cat.read("postings_stream").withColumnRenamed("doc_id", "_old").join(
        mapping.withColumnRenamed("doc_id", "_old").select("_old", "new_id"),
        "_old",  # inner join: loser fetches' postings drop out here
    )
    cat.write("postings", post.drop("_old").withColumnRenamed("new_id", "doc_id")
              .select("term", "doc_id", "dl", "tf", "positions", "flags"))
    for t in ("index_stats", "postings_partial", "doclens", "postings_packed"):
        cat.drop(t)
    from search_engine_spark.operators.merge import pack_and_merge

    pack_and_merge(cat, num_shards=num_shards, salt_buckets=salt_buckets,
                   merge_factor=merge_factor)


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
