"""Crash-safety unit tests for IndexCatalog.swap — the snapshot-commit
analogue every append/compaction rides on.  The ordering contract
(rename the live table ASIDE, rename the new generation IN, only then
delete the old copy) must keep a complete recoverable copy on disk in
EVERY intermediate state; these tests construct each crash state
directly and fault-inject the commit rename.  Pure filesystem — no
SparkSession needed (swap/exists/path never touch spark)."""

import pytest

from search_engine_spark.sources.catalog import IndexCatalog


def _cat(tmp_path):
    return IndexCatalog(spark=None, warehouse=tmp_path / "wh")


def _mk_table(cat, name, payload):
    d = cat.path(name)
    d.mkdir(parents=True)
    (d / "part-00000.parquet").write_text(payload)
    (d / "_SUCCESS").write_text("")


def _payload(cat, name):
    return (cat.path(name) / "part-00000.parquet").read_text()


def test_swap_replaces_live_and_cleans_up(tmp_path):
    cat = _cat(tmp_path)
    _mk_table(cat, "t", "old")
    _mk_table(cat, "t_next", "new")
    cat.swap("t_next", "t")
    assert _payload(cat, "t") == "new"
    assert cat.exists("t")
    assert not cat.path("t_next").exists()
    assert not cat.path("t__old").exists()


def test_swap_refuses_incomplete_source(tmp_path):
    """A tmp table without _SUCCESS is a partial write — swapping it in
    would commit torn data; the live table must stay untouched."""
    cat = _cat(tmp_path)
    _mk_table(cat, "t", "old")
    d = cat.path("t_next")
    d.mkdir(parents=True)
    (d / "part-00000.parquet").write_text("torn")
    with pytest.raises(ValueError):
        cat.swap("t_next", "t")
    assert _payload(cat, "t") == "old"
    assert cat.exists("t")


def test_swap_retry_after_crash_between_renames(tmp_path):
    """Crash state after step 1 (live renamed aside, new not yet renamed
    in): the live table is MISSING but both <t>__old and the complete
    tmp exist.  A retried swap must complete the commit."""
    cat = _cat(tmp_path)
    _mk_table(cat, "t__old", "old")       # the renamed-aside live table
    _mk_table(cat, "t_next", "new")       # the fully-written new gen
    assert not cat.path("t").exists()     # the crash window
    cat.swap("t_next", "t")
    assert _payload(cat, "t") == "new"
    assert not cat.path("t__old").exists()


def test_swap_reclaims_stale_old_from_prior_crash(tmp_path):
    """Crash state after step 2 (new gen already live, old copy not yet
    deleted): a LATER swap against the same table must not trip over the
    stale <t>__old directory."""
    cat = _cat(tmp_path)
    _mk_table(cat, "t", "gen2")
    _mk_table(cat, "t__old", "gen1")      # leftover from a prior crash
    _mk_table(cat, "t_next", "gen3")
    cat.swap("t_next", "t")
    assert _payload(cat, "t") == "gen3"
    assert not cat.path("t__old").exists()


def test_swap_crash_at_commit_rename_keeps_both_copies(tmp_path, monkeypatch):
    """Fault-inject the COMMIT rename (step 2): after the failure, the
    old table must survive intact at <t>__old and the new generation at
    <t>_next — no intermediate state loses data — and a retried swap
    must then succeed."""
    from pathlib import Path

    cat = _cat(tmp_path)
    _mk_table(cat, "t", "old")
    _mk_table(cat, "t_next", "new")

    real_rename = Path.rename
    calls = {"n": 0}

    def flaky_rename(self, target):
        calls["n"] += 1
        if calls["n"] == 2:  # 1st = live aside, 2nd = commit
            raise OSError("simulated crash at commit rename")
        return real_rename(self, target)

    monkeypatch.setattr(Path, "rename", flaky_rename)
    with pytest.raises(OSError):
        cat.swap("t_next", "t")
    monkeypatch.setattr(Path, "rename", real_rename)

    # every byte still on disk: old copy aside, new copy in tmp
    assert _payload(cat, "t__old") == "old"
    assert _payload(cat, "t_next") == "new"
    # retry completes the interrupted commit
    cat.swap("t_next", "t")
    assert _payload(cat, "t") == "new"
    assert not cat.path("t__old").exists()
