"""Crash-safety of the pages-cache writer: a synthesis that dies
mid-write must never leave a (truncated) file at the cache path, because
cached_pages trusts existence — the bug that poisoned a scaling run with
a footer-less parquet."""

import pyarrow.parquet as pq
import pytest

from search_engine_spark.sources import pages


def test_write_is_atomic_on_failure(tmp_path, monkeypatch):
    out = tmp_path / "pages.parquet"
    orig = pq.ParquetWriter.write_table
    calls = {"n": 0}

    def dying(self, table):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated kill mid-synthesis")
        return orig(self, table)

    monkeypatch.setattr(pq.ParquetWriter, "write_table", dying)
    with pytest.raises(RuntimeError):
        pages.write_pages_parquet(out, 1200, processes=1)
    # the cache path must NOT exist (cached_pages would trust it); only
    # the write-aside tmp may remain
    assert not out.exists()


def test_write_lands_complete_and_rereads(tmp_path):
    out = tmp_path / "pages.parquet"
    p = pages.write_pages_parquet(out, 50, processes=1)
    assert p == out and out.exists()
    assert not out.with_suffix(out.suffix + ".tmp").exists()
    t = pq.read_table(out)
    assert t.num_rows == 50
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
