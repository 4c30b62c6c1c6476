"""Deterministic dense 64-bit doc_id assignment, distributed.

The reference's docIDs are arrival-order uint32 per chunk (Indexer.hpp:418).
We need a *deterministic* global id (rank-identity across runs and cluster
sizes), assigned without any driver-side collect of data rows:

1. range-partition by ``url`` (dedup already guarantees url uniqueness),
2. sort within partitions,
3. count rows per partition (a tiny aggregate — one row per partition),
4. broadcast the per-partition offsets and assign ``offset + row_index``
   inside a single ``mapInPandas`` pass.

This is the standard distributed dense-ID pattern: two narrow passes, one
range shuffle, no 2^32 cap, no global single-partition window.  doc_id is
therefore the rank of ``url`` in lexicographic order — stable for a fixed
corpus at any parallelism.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dedup_assign_doc_ids(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """First-wins url dedup + dense id assignment fused into ONE range
    shuffle (vs a window shuffle + a range shuffle when run separately).

    Range-partitioning by url puts all copies of a url in one partition;
    sorting within partitions by (url, warc_ts, text) makes the first row
    of each url-run the dedup keeper (the reference's first-wins rule,
    HashBlob.h:105-116).  The counts pass counts distinct urls, the assign
    pass emits only keepers with doc_id = partition offset + keeper rank.

    IMPORTANT: feed this a *materialized* table (parquet/cached), not the
    raw extraction pipeline — repartitionByRange runs a sampling job over
    its input first, which would execute the extraction UDF twice.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = (
        docs.repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url", "warc_ts", "text")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid")
        .agg(F.countDistinct("url").alias("cnt"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + docs.schema.fields
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        prev_url = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            # keepers: first row of each url-run (runs never span batches
            # out of order — batches arrive in partition sort order)
            is_first = pdf["url"].ne(pdf["url"].shift())
            if prev_url is not None:
                is_first.iloc[0] = pdf["url"].iloc[0] != prev_url
            prev_url = pdf["url"].iloc[-1]
            keep = pdf[is_first].copy()
            base = offsets[pid] + seen
            seen += len(keep)
            keep.insert(0, "doc_id", range(base, base + len(keep)))
            yield keep.drop(columns=["_pid"])

    return parted.mapInPandas(assign, schema=out_schema)


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = docs.repartitionByRange(num_partitions, "url").sortWithinPartitions("url")
    parted = parted.withColumn("_pid", F.spark_partition_id())
    # Cache: the counts pass and the assignment pass must see identical
    # partitioning. repartitionByRange samples its bounds deterministically
    # from the same input, but caching avoids recomputing extraction.
    parted = parted.persist()

    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + docs.schema.fields
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets[pid] + seen
            seen += len(pdf)
            pdf = pdf.copy()
            pdf.insert(0, "doc_id", range(base, base + len(pdf)))
            yield pdf.drop(columns=["_pid"])

    return parted.mapInPandas(assign, schema=out_schema)
