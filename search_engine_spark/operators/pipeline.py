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
    bucket_width: int | None = None,
) -> IndexCatalog:
    import time

    cat = IndexCatalog(spark, warehouse)

    if force:
        for t in ("docs_raw", "docs_sorted", "docs", "docmeta", "postings",
                  "index_stats", "postings_partial", "doclens",
                  "postings_packed"):
            cat.drop(t)
        # properties describe the dropped tables (layout params, append
        # idempotence flags) — stale ones must not outlive a force rebuild
        cat.clear_props()

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
                merge_factor=merge_factor, bucket_width=bucket_width,
            )
            return "postings_packed"

        timed("p6_packed", p6)

    cat.write_metrics_tables()
    return cat


def run_append(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    label: str = "delta1",
    compaction: str = "full",
) -> IndexCatalog:
    """Incrementally index a NEW pages batch into an EXISTING packed
    warehouse — the crawl-refresh shape at 100 TB: extract + id-stamp only
    the delta, append its logical postings and pack partials, then run ONE
    merge pass over all partials (old + new).  Nothing from the base build
    is re-extracted, re-shuffled, or re-packed; the merge pass is the
    LSM-style compaction (stream concatenation, positions never decoded).

    Layout (bucket_width / merge_factor / num_shards) is inherited from the
    base build's persisted catalog properties, so new partials land on the
    same doc-bucket grid.  Doc ids continue densely from the base build's
    max (url-rank WITHIN the delta); urls already indexed are dropped
    (first batch wins — the batch twin of the streaming consolidator's
    first-wins rule).  Corpus stats (n_docs/avgdl) and doclens are
    recomputed over the union, and the merge recomputes every block-max
    header against the NEW avgdl — which is why an append converges
    bit-identically to a from-scratch build of the union corpus (asserted
    by tests/test_packed_index.py) whenever the delta's urls sort after the
    base corpus's (otherwise ids permute and results are rank-identical by
    url rather than byte-identical).

    The expensive delta phases (extract, dedup shuffle, id stamp) are
    checkpointed per ``label``; the apply step (appends + merge) is guarded
    by a catalog property so a completed append is never re-applied.

    ``compaction``:
    * ``"full"`` (default) — ONE merge pass over every partial; every
      block-max header is recomputed exactly for the new avgdl, and the
      result is bit-identical to a from-scratch union build.
    * ``"tiered"`` — the LSM lever for when the merge pass dominates:
      doc ids grow densely, so every packed bucket strictly BELOW the
      delta's first doc bucket is untouched — those rows are COPIED
      (narrow scan, no shuffle, payloads never decoded) with two column
      patches: ``df`` += the delta's per-term df (a delta-vocab-sized
      broadcast), and ``block_maxw`` *= max(1, avgdl_new/avgdl_packed),
      which is a provable upper-bound correction (w is monotone in
      avgdl with ratio at most avgdl_new/avgdl_old), so WAND pruning
      stays LOSSLESS — bounds are merely a little looser until the next
      full compaction resets them.  Only the straddling-and-above
      buckets are re-merged from partials (with exact headers).  Query
      results are exactly equal to full compaction (same scores, same
      ids); only the stored bounds differ, so the bit-identity claim
      applies to full mode alone.
    """
    import time

    from pyspark.sql import functions as F

    from search_engine_spark.operators.merge import (
        build_doclens, merge_partials, pack_partials, shard_col,
    )

    cat = IndexCatalog(spark, warehouse)
    for t in ("docmeta", "postings", "postings_partial", "postings_packed"):
        if not cat.exists(t):
            raise ValueError(f"run_append needs an existing warehouse ({t} missing)")
    applied_key = f"append_{label}_applied"
    if cat.get_prop(applied_key):
        return cat

    num_shards = int(cat.get_prop("p6a_num_shards"))
    bucket_width = int(cat.get_prop("p6a_bucket_width"))
    merge_factor = int(cat.get_prop("p6a_merge_factor"))

    def timed(phase: str, fn) -> None:
        t0 = time.perf_counter()
        table = fn()
        cat.log_phase(
            phase, cat.read(table),
            {"seconds": round(time.perf_counter() - t0, 2), "append": label},
        )

    raw_t, sorted_t, docs_t = (f"{t}_{label}" for t in
                               ("docs_raw", "docs_sorted", "docs"))

    if not cat.exists(raw_t):
        def p1() -> str:
            raw = extract.extract_docs(pages)
            raw = extract.drop_overlong_titles(raw)
            # urls the base build (or an earlier append) already indexed
            # lose first-wins against the existing corpus
            raw = raw.join(
                cat.read("docmeta").select("url"), "url", "left_anti"
            )
            cat.write(raw_t, raw)
            return raw_t

        timed(f"a1_{raw_t}", p1)

    if not cat.exists(sorted_t):
        def p2a() -> str:
            cat.write(sorted_t, docids.sorted_dedup(cat.read(raw_t)))
            return sorted_t

        timed(f"a2a_{sorted_t}", p2a)

    if not cat.exists(docs_t):
        def p2b() -> str:
            # dense url-rank ids WITHIN the delta, offset to continue the
            # base build's id space (1-row max job over docmeta)
            base = cat.read("docmeta").agg(
                F.max("doc_id").alias("m")).collect()[0]["m"] + 1
            offsets = docids.partition_offsets_from_footers(
                cat.path(sorted_t), spark=spark
            )
            stamped = docids.stamp_doc_ids(cat.read(sorted_t), offsets)
            cat.write(docs_t, stamped.withColumn(
                "doc_id", F.col("doc_id") + F.lit(int(base))))
            return docs_t

        timed(f"a2b_{docs_t}", p2b)

    delta = cat.read(docs_t)

    # ---- apply: append delta tables, refresh stats, one merge pass -------
    cat.write("docmeta", B.build_docmeta(delta), mode="append")
    posts = B.build_postings(delta).withColumn(
        "shard", shard_col(num_shards=num_shards)
    ).sortWithinPartitions("shard", "term")
    cat.write("postings", posts, partition_by=["shard"], mode="append")

    cat.drop("index_stats")
    cat.write(
        "index_stats",
        B.build_index_stats(cat.read("docmeta"), cat.read("postings")),
    )
    stats = cat.read("index_stats").collect()[0]
    avgdl = float(stats["avgdl"])

    mwidth = bucket_width * merge_factor
    cat.drop("doclens")
    cat.write("doclens", build_doclens(cat.read("docmeta"), mwidth))

    # new partials only over the delta's postings (doc ids > base max)
    delta_posts = B.build_postings(delta)
    cat.write(
        "postings_partial",
        pack_partials(delta_posts, num_shards, bucket_width)
        .repartition(num_shards, "shard"),
        partition_by=["shard"], mode="append",
    )
    timed_t0 = time.perf_counter()
    old_avgdl = cat.get_prop("packed_avgdl")
    if compaction == "tiered" and old_avgdl is None:
        # pre-fingerprint warehouse: no safe header correction — fall back
        compaction = "full"
    if compaction == "tiered":
        # doc ids continue densely from the base max, so the delta can
        # only touch packed buckets >= m0; everything below is copied
        # verbatim (narrow, payloads never decoded) with df patched by
        # the delta's per-term df and the WAND bounds scaled to stay
        # valid upper bounds under the new avgdl
        first_delta_id = int(delta.agg(F.min("doc_id")).collect()[0][0])
        b0 = first_delta_id // bucket_width
        m0 = b0 // merge_factor
        ratio = max(1.0, avgdl / float(old_avgdl))
        df_delta = delta_posts.groupBy("term").agg(
            F.count("*").alias("_dfd")
        )
        copied = (
            cat.read("postings_packed")
            .filter(F.col("bucket") < m0)
            .join(F.broadcast(df_delta), "term", "left")
            .withColumn(
                "df",
                (F.col("df") + F.coalesce(F.col("_dfd"), F.lit(0)))
                .cast("long"),
            )
            .withColumn(
                "block_maxw",
                F.transform("block_maxw", lambda x: x * F.lit(ratio)),
            )
        )
        tail = merge_partials(
            cat.read("postings_partial"), merge_factor, avgdl,
            bucket_min=m0 * merge_factor,
        )
        cols = ["term", "shard", "bucket", "df", "n_docs", "doc_ids",
                "tfs", "pos", "block_last", "block_maxw", "first_docid",
                "last_docid"]
        merged = copied.select(*cols).unionByName(tail.select(*cols))
        # the new generation DERIVES from the current packed table —
        # write aside, then snapshot-swap (never overwrite a table
        # while reading it)
        cat.write(
            "postings_packed_next",
            merged.repartition(num_shards, "shard"),
            partition_by=["shard"],
        )
        cat.swap("postings_packed_next", "postings_packed")
    else:
        merged = merge_partials(
            cat.read("postings_partial"), merge_factor, avgdl
        )
        cat.drop("postings_packed")
        cat.write(
            "postings_packed",
            merged.repartition(num_shards, "shard"),
            partition_by=["shard"],
        )
    cat.set_prop("packed_avgdl", repr(avgdl))
    cat.log_phase(
        f"a6_merge_{label}", cat.read("postings_packed"),
        {"seconds": round(time.perf_counter() - timed_t0, 2), "append": label},
    )
    cat.set_prop(applied_key, 1)
    cat.write_metrics_tables()
    return cat
