"""Checkpointed, resumable index-build pipeline (SURVEY.md §3.1 Spark
lifecycle).

Phases, each writing one catalog table and a lineage record:

  p1_docs_raw  pages → extract UDF → docs_raw        (narrow map, no shuffle;
               per-doc posting entries pre-aggregated inside the UDF)
  p2a_sorted   first-wins dedup in one range shuffle (url shuffle — the
               build's only corpus-wide shuffle)
  p2b_docs     dense doc-id stamp from parquet
               footer offsets                        (narrow)
  p3_docmeta   docmeta                               (narrow)
  p4_postings  inline() per-doc postings             (narrow explode)
  p5_stats     index_stats                           (tiny agg)
  p6_packed    salted pack + shuffle-merge into
               term-sharded physical postings        (see merge.py)

Resume: a phase whose output table exists (complete _SUCCESS) is skipped,
so a killed build continues from the last durable phase — the reference has
no equivalent (its chunks are never merged; csolver re-reads everything,
SURVEY.md §2.4 A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.operators import build as B
from search_engine_spark.operators import docids, extract
from search_engine_spark.sources.catalog import IndexCatalog


def run_build(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    num_shards: int = 32,
    salt_buckets: int = 16,
    merge_factor: int | None = None,
    force: bool = False,
    pack: bool = True,
) -> IndexCatalog:
    import time

    cat = IndexCatalog(spark, warehouse)

    if force:
        for t in ("docs_raw", "docs_sorted", "docs", "docmeta", "postings",
                  "index_stats", "postings_partial", "doclens",
                  "postings_packed"):
            cat.drop(t)

    def timed(phase: str, fn) -> None:
        t0 = time.perf_counter()
        table = fn()
        cat.log_phase(
            phase, cat.read(table),
            {"seconds": round(time.perf_counter() - t0, 2)},
        )

    if not cat.exists("docs_raw"):
        # extraction is a pure narrow map; materializing it FIRST means the
        # id-assignment range shuffle (whose partitioner samples its input)
        # scans cheap parquet instead of re-running the extraction UDF
        def p1() -> str:
            raw = extract.extract_docs(pages)
            raw = extract.drop_overlong_titles(raw)
            cat.write("docs_raw", raw)
            return "docs_raw"

        timed("p1_docs_raw", p1)

    if not cat.exists("docs_sorted"):
        # pass A: the build's ONE corpus-wide shuffle (range by url) with
        # in-partition sort + first-wins dedup; bookkeeping columns carry
        # everything id assignment needs
        def p2a() -> str:
            cat.write("docs_sorted", docids.sorted_dedup(cat.read("docs_raw")))
            return "docs_sorted"

        timed("p2a_docs_sorted", p2a)

    if not cat.exists("docs"):
        # pass B: narrow id stamp; offsets from parquet footers (no job)
        def p2b() -> str:
            offsets = docids.partition_offsets_from_footers(
                cat.path("docs_sorted"), spark=spark
            )
            cat.write(
                "docs", docids.stamp_doc_ids(cat.read("docs_sorted"), offsets)
            )
            return "docs"

        timed("p2b_docs", p2b)

    docs = cat.read("docs")

    if not cat.exists("docmeta"):
        def p3() -> str:
            cat.write("docmeta", B.build_docmeta(docs))
            return "docmeta"

        timed("p3_docmeta", p3)

    if not cat.exists("postings"):
        # Hive-partitioned by term shard so every term-filtered read of the
        # logical postings (the phrase/NOT fallback path, positions lookups)
        # prunes to the query terms' shard directories instead of scanning
        # the whole table — the same pruning the packed layout gets.
        #
        # Write strategy is adaptive: the postings are the build's fattest
        # rows (positions + per-occurrence flags), so a full shard shuffle
        # is only paid when it is actually needed — when input tasks ≫
        # shards, where a direct dynamic-partition write would explode
        # into tasks×shards files.  Below that regime, sortWithinPartitions
        # groups each task's rows by shard so the dynamic write opens each
        # shard file once per task (≤ tasks×shards files, bounded small),
        # and the big rows never cross the wire.
        def p4() -> str:
            from search_engine_spark.operators.merge import shard_col

            posts = B.build_postings(docs).withColumn(
                "shard", shard_col(num_shards=num_shards)
            )
            # sorting by term WITHIN the shard (after the shard grouping
            # key) makes every parquet file term-clustered, so row-group
            # min/max stats prune a term-filtered fallback read to a few
            # row groups even inside the right shard dir — the poor-man's
            # secondary index (verified by tests/test_plans.py row-group
            # stats check)
            n_input = docs.rdd.getNumPartitions()
            if n_input > 4 * num_shards:
                posts = posts.repartition(num_shards, "shard") \
                             .sortWithinPartitions("shard", "term")
            else:
                posts = posts.sortWithinPartitions("shard", "term")
            cat.write("postings", posts, partition_by=["shard"])
            cat.set_prop("postings_num_shards", num_shards)
            return "postings"

        timed("p4_postings", p4)

    if not cat.exists("index_stats"):
        def p5() -> str:
            cat.write(
                "index_stats",
                B.build_index_stats(cat.read("docmeta"), cat.read("postings")),
            )
            return "index_stats"

        timed("p5_stats", p5)

    if pack and not cat.exists("postings_packed"):
        def p6() -> str:
            from search_engine_spark.operators import merge

            merge.pack_and_merge(
                cat, num_shards=num_shards, salt_buckets=salt_buckets,
                merge_factor=merge_factor,
            )
            return "postings_packed"

        timed("p6_packed", p6)

    cat.write_metrics_tables()
    return cat
