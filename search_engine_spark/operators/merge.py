"""Salted pack + multi-pass shuffle-merge into the physical postings layout
(SURVEY.md §2.4 A2/A3/A6, §7.1 M3).

Physical layout ``postings_packed`` (hive-partitioned by ``shard`` =
pmod(xxhash64(term), num_shards) — a query touches only its terms' shard
directories, the Spark analogue of the reference's dictionary lookup):

  term        string   — stem ('@'-prefixed for title postings)
  shard       int      — partition column (term-sharding axis)
  bucket      int      — doc-space bucket (doc_id // bucket_width // merge_factor)
  df          long     — GLOBAL document frequency of the term
  n_docs      long     — postings in this row
  doc_ids     binary   — varbyte(delta(sorted doc ids)), first gap absolute
  tfs         binary   — varbyte(tf − 1), aligned with doc_ids
  block_last  array<long>   — per 128-doc block: last doc id
  block_maxw  array<double> — per block: max idf-free BM25 weight
  first_docid, last_docid   — row-level bounds (data-skipping stats)

Why doc-space bucketing (the explicit skew handling the north rule asks
for): grouping by bare ``term`` puts a head term's entire posting list in
one task and one row.  Salting the build key to (term, doc_bucket) bounds
every group by bucket_width regardless of term frequency — the classic
two-level/salted aggregation — and because the salt is a doc-*range* (not
a hash), partial lists concatenate in sorted order in the merge pass by
rewriting a single varbyte group (codec.rebase_first_gap), never decoding
payloads.  The bucket axis is also what distributes query-time WAND: each
bucket is an independent top-k task (the reference got the same effect
from its per-chunk ISR trees, csolver.cpp:135-149 — doc-sharded there,
doc-bucketed-within-term-shard here).

Pass structure (each pass a checkpointed catalog table):
  p6a ``postings_partial``: join dl → per-posting idf-free weight (JVM
      expressions) → groupBy(term, doc_bucket) collect_list/sort_array (two-
      phase hash agg) → vectorized pandas-UDF encoders → partial rows.
  p6b ``postings_packed``: global df agg + shuffle-merge of each term's
      partials into merge_factor-coarser buckets via stream concatenation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from search_engine_spark.operators import codec
from search_engine_spark.plans import bm25

PACKED_SCHEMA = (
    "term string, shard int, bucket int, df long, n_docs long, "
    "doc_ids binary, tfs binary, block_last array<long>, "
    "block_maxw array<double>, first_docid long, last_docid long"
)


def shard_col(term_col="term", num_shards: int = 32):
    return F.pmod(F.xxhash64(F.col(term_col)), F.lit(num_shards)).cast("int")


# --- vectorized encoders (Arrow batch in, binary out) ----------------------

@pandas_udf("binary")
def _enc_docids(doc_ids: pd.Series) -> pd.Series:
    return doc_ids.map(lambda a: codec.encode_docids(np.asarray(a, dtype=np.int64)))


@pandas_udf("binary")
def _enc_tfs(tfs: pd.Series) -> pd.Series:
    return tfs.map(lambda a: codec.encode_tfs(np.asarray(a, dtype=np.int64)))


@pandas_udf("array<long>")
def _blk_last(doc_ids: pd.Series) -> pd.Series:
    return doc_ids.map(
        lambda a: codec.block_headers(
            np.asarray(a, dtype=np.int64), np.zeros(len(a))
        )[0]
    )


@pandas_udf("array<double>")
def _blk_maxw(doc_ids: pd.Series, weights: pd.Series) -> pd.Series:
    out = []
    for d, w in zip(doc_ids, weights):
        out.append(
            codec.block_headers(
                np.asarray(d, dtype=np.int64), np.asarray(w, dtype=np.float64)
            )[1]
        )
    return pd.Series(out)


def pack_partials(
    postings: DataFrame,
    docmeta: DataFrame,
    avgdl: float,
    num_shards: int,
    bucket_width: int,
) -> DataFrame:
    """p6a: logical postings → per-(term, doc_bucket) encoded partial rows."""
    w = bm25.weight_col(F.col("tf"), F.col("dl"), avgdl)
    plist = (
        postings.select("term", "doc_id", "tf")
        .join(docmeta.select("doc_id", "dl"), "doc_id")
        .withColumn("weight", w)
        .withColumn("bucket", (F.col("doc_id") / F.lit(bucket_width)).cast("int"))
        .groupBy("term", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "weight"))
            ).alias("plist"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "term",
            shard_col(num_shards=num_shards).alias("shard"),
            "bucket",
            "n_docs",
            F.col("plist.doc_id").alias("_ids"),
            F.col("plist.tf").alias("_tfs"),
            F.col("plist.weight").alias("_ws"),
        )
    )
    return plist.select(
        "term",
        "shard",
        "bucket",
        F.col("n_docs").alias("df_local"),
        "n_docs",
        _enc_docids("_ids").alias("doc_ids"),
        _enc_tfs("_tfs").alias("tfs"),
        _blk_last("_ids").alias("block_last"),
        _blk_maxw("_ids", "_ws").alias("block_maxw"),
        F.element_at("_ids", 1).alias("first_docid"),
        F.element_at("_ids", -1).alias("last_docid"),
    )


def merge_partials(partials: DataFrame, merge_factor: int) -> DataFrame:
    """p6b: shuffle-merge each term's doc-ordered partial streams into
    merge_factor-coarser buckets; attach global df.

    The concatenation never decodes payloads: the appended stream's first
    varbyte gap is rebased against the previous stream's last doc id.
    Block headers concatenate as-is (block boundaries are intra-partial,
    which only makes WAND bounds *finer*, never wrong).
    """
    df_global = partials.groupBy("term").agg(F.sum("df_local").alias("df"))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        out_rows = []
        for (term, shard, mbucket, df), g in pdf.groupby(
            ["term", "shard", "mbucket", "df"], sort=True
        ):
            ids_buf = bytearray()
            tfs_buf = bytearray()
            blast: list[np.ndarray] = []
            bmaxw: list[np.ndarray] = []
            prev_last = None
            for r in g.itertuples(index=False):
                chunk = bytes(r.doc_ids)
                if prev_last is not None:
                    chunk = codec.rebase_first_gap(chunk, prev_last)
                ids_buf += chunk
                tfs_buf += bytes(r.tfs)
                blast.append(np.asarray(r.block_last, dtype=np.int64))
                bmaxw.append(np.asarray(r.block_maxw, dtype=np.float64))
                prev_last = int(r.last_docid)
            out_rows.append(
                {
                    "term": term,
                    "shard": int(shard),
                    "bucket": int(mbucket),
                    "df": int(df),
                    "n_docs": int(g["n_docs"].sum()),
                    "doc_ids": bytes(ids_buf),
                    "tfs": bytes(tfs_buf),
                    "block_last": np.concatenate(blast) if blast else np.array([], dtype=np.int64),
                    "block_maxw": np.concatenate(bmaxw) if bmaxw else np.array([]),
                    "first_docid": int(g["first_docid"].iloc[0]),
                    "last_docid": int(prev_last),
                }
            )
        return pd.DataFrame(out_rows)

    with_key = partials.join(df_global, "term").withColumn(
        "mbucket", (F.col("bucket") / F.lit(merge_factor)).cast("int")
    )
    return with_key.groupBy("term", "mbucket").applyInPandas(
        merge_group, schema=PACKED_SCHEMA
    )


def build_doclens(docmeta: DataFrame, bucket_width: int) -> DataFrame:
    """Bucket-aligned dense doc-length rows: the query kernel's forward
    index (Lucene-norms analogue).  doc ids are dense (docids.py assigns a
    dense rank), so ``dls[doc_id - start]`` is a direct lookup."""
    return (
        docmeta.select("doc_id", "dl")
        .withColumn("bucket", (F.col("doc_id") / F.lit(bucket_width)).cast("int"))
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "dl"))).alias("p"))
        .select(
            "bucket",
            F.element_at(F.col("p.doc_id"), 1).alias("start"),
            F.col("p.dl").alias("dls"),
        )
    )


def pack_and_merge(cat, num_shards: int = 32, salt_buckets: int = 16,
                   merge_factor: int | None = None) -> None:
    """Run both passes with checkpoint/resume through the catalog."""
    stats = cat.read("index_stats").collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    bucket_width = max(1, math.ceil(n_docs / salt_buckets))
    if merge_factor is None:
        merge_factor = max(1, salt_buckets // 4)

    if not cat.exists("postings_partial"):
        partials = pack_partials(
            cat.read("postings"), cat.read("docmeta"), avgdl, num_shards, bucket_width
        )
        cat.write("postings_partial", partials, partition_by=["shard"])
        cat.log_phase(
            "p6a_partials",
            cat.read("postings_partial"),
            {"bucket_width": bucket_width, "salt_buckets": salt_buckets},
        )

    mwidth = bucket_width * merge_factor
    if not cat.exists("doclens"):
        cat.write("doclens", build_doclens(cat.read("docmeta"), mwidth))
        cat.log_phase("p6b_doclens", cat.read("doclens"), {"bucket_width": mwidth})

    merged = merge_partials(cat.read("postings_partial"), merge_factor)
    cat.write("postings_packed", merged, partition_by=["shard"])
