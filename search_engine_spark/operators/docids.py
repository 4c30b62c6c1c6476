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
