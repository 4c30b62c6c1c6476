"""Parity of the pure-Python xxh64 with Spark's F.xxhash64 (the shard hash
must agree or queries would prune the wrong partitions)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.hashing import term_shard, xxh64

WORDS = [
    "", "a", "ab", "abc", "abcd", "abcde", "search", "engine", "@search",
    "w12345", "x" * 7, "x" * 8, "x" * 9, "x" * 15, "x" * 16, "x" * 31,
    "x" * 32, "x" * 33, "x" * 64, "x" * 100, "ünïcode-тест", "日本語",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    got = {
        r["term"]: r["h"]
        for r in df.select("term", F.xxhash64("term").alias("h")).collect()
    }
    for w in WORDS:
        assert xxh64(w.encode("utf-8")) == got[w], w


def test_term_shard_matches_shard_col(spark):
    from search_engine_spark.operators.merge import shard_col

    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    got = {
        r["term"]: r["s"]
        for r in df.select("term", shard_col(num_shards=8).alias("s")).collect()
    }
    for w in WORDS:
        assert term_shard(w, 8) == got[w], w


@pytest.mark.parametrize("seed", [0, 42, 123456789])
def test_xxh64_seed_variation(seed):
    vals = {xxh64(b"same-bytes", seed=s) for s in (0, 42, 123456789)}
    assert len(vals) == 3  # different seeds → different hashes
    assert xxh64(b"same-bytes", seed=seed) == xxh64(b"same-bytes", seed=seed)
