"""Copy-on-write Parquet MERGE (sources/merge.py)."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from aurora_mito_etl_spark.sources.merge import merge_upsert


def _seed(spark, path: str):
    # 4 files, keys range-clustered so updates touch a known file
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 7) for i in range(400)], "k long, val string, grp int"
    )
    df.repartitionByRange(4, "k").write.parquet(path)


def _snapshot(path: str) -> dict[str, float]:
    return {
        f.name: f.stat().st_mtime_ns
        for f in Path(path).glob("*.parquet")
    }


def test_upsert_rewrites_only_affected_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    before = _snapshot(path)
    updates = spark.createDataFrame(
        [(5, "NEW5", 99), (7, "NEW7", 99), (1000, "INS", 1)],
        "k long, val string, grp int",
    )
    stats = merge_upsert(spark, path, updates, "k")
    assert stats["files_total"] == 4
    assert stats["files_rewritten"] == 1  # keys 5,7 live in one range file
    assert stats["rows_updated"] == 2
    assert stats["rows_inserted"] == 1

    after = _snapshot(path)
    untouched = set(before) & set(after)
    assert len(untouched) == 3  # three original files survive
    assert all(before[f] == after[f] for f in untouched)  # byte-level untouched

    got = {r["k"]: (r["val"], r["grp"]) for r in spark.read.parquet(path).collect()}
    assert len(got) == 401
    assert got[5] == ("NEW5", 99) and got[7] == ("NEW7", 99)
    assert got[1000] == ("INS", 1)
    assert got[6] == ("v6", 6)  # neighbors unchanged


def test_delete_and_upsert_together(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame([(3, "NEW3", 0)], "k long, val string, grp int")
    deletes = spark.createDataFrame([(10,), (11,), (9999,)], "k long")
    stats = merge_upsert(spark, path, updates, "k", deletes=deletes)
    assert stats["rows_deleted"] == 2  # 9999 never existed
    got = {r["k"] for r in spark.read.parquet(path).collect()}
    assert 10 not in got and 11 not in got and 3 in got
    assert len(got) == 398  # 400 seeded - 2 real deletes; key 3 replaced in place


def test_duplicate_update_keys_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    dup = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 0)], "k long, val string, grp int"
    )
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(spark, path, dup, "k")


def test_insert_only_touches_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    before = _snapshot(path)
    ins = spark.createDataFrame([(5000, "x", 1)], "k long, val string, grp int")
    stats = merge_upsert(spark, path, ins, "k")
    assert stats["files_rewritten"] == 0
    assert stats["rows_inserted"] == 1
    after = _snapshot(path)
    assert all(after[f] == before[f] for f in before)  # originals untouched
    assert spark.read.parquet(path).count() == 401


def test_compaction_binpacks_small_files(spark, tmp_path):
    from aurora_mito_etl_spark.sources.merge import compact_small_files

    path = str(tmp_path / "t")
    # 8 tiny files + nothing large
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(800)], "k long, val string"
    ).repartition(8).write.parquet(path)
    n_before = len(list(Path(path).glob("*.parquet")))
    assert n_before == 8
    stats = compact_small_files(
        spark, path, small_threshold_bytes=10 * 1024 * 1024,
        target_file_bytes=50 * 1024 * 1024,
    )
    assert stats == {"files_total": 8, "files_compacted": 8, "files_written": 1}
    assert len(list(Path(path).glob("*.parquet"))) == 1
    got = {r["k"] for r in spark.read.parquet(path).collect()}
    assert got == set(range(800))


def test_compaction_leaves_large_files_alone(spark, tmp_path):
    from aurora_mito_etl_spark.sources.merge import compact_small_files

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "x" * 100) for i in range(100)], "k long, val string"
    ).repartition(3).write.parquet(path)
    before = {f.name: f.stat().st_mtime_ns for f in Path(path).glob("*.parquet")}
    # threshold below every file size -> nothing is "small"
    stats = compact_small_files(spark, path, small_threshold_bytes=1)
    assert stats["files_compacted"] == 0 and stats["files_written"] == 0
    after = {f.name: f.stat().st_mtime_ns for f in Path(path).glob("*.parquet")}
    assert before == after


def test_compaction_single_small_file_noop(spark, tmp_path):
    from aurora_mito_etl_spark.sources.merge import compact_small_files

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, val string").coalesce(1).write.parquet(path)
    stats = compact_small_files(spark, path)
    assert stats["files_written"] == 0  # one small file: rewriting gains nothing


# ---------------------------------------------------------------------------
# Snapshots
# ---------------------------------------------------------------------------

def test_snapshot_merge_keeps_old_version_readable(spark, tmp_path):
    from aurora_mito_etl_spark.sources import merge as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    assert m.snapshot_init(path) == 1

    updates = spark.createDataFrame(
        [(5, "NEW5", 99), (1000, "INS", 1)], "k long, val string, grp int"
    )
    v2, stats = m.merge_upsert_snapshot(spark, path, updates, "k")
    assert v2 == 2 and stats["rows_updated"] == 1 and stats["rows_inserted"] == 1

    # old version: pristine; new version: merged
    v1_rows = {r["k"]: r["val"] for r in m.read_snapshot(spark, path, 1).collect()}
    v2_rows = {r["k"]: r["val"] for r in m.read_snapshot(spark, path).collect()}
    assert v1_rows[5] == "v5" and 1000 not in v1_rows and len(v1_rows) == 400
    assert v2_rows[5] == "NEW5" and v2_rows[1000] == "INS" and len(v2_rows) == 401


def test_snapshot_delete_and_vacuum(spark, tmp_path):
    from pathlib import Path as P

    from aurora_mito_etl_spark.sources import merge as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    m.snapshot_init(path)
    deletes = spark.createDataFrame([(10,), (11,)], "k long")
    upd = spark.createDataFrame([(3, "N3", 0)], "k long, val string, grp int")
    m.merge_upsert_snapshot(spark, path, upd, "k", deletes=deletes)

    n_files_before = len(list(P(path).glob("*.parquet")))
    out = m.vacuum(path, keep_last=1)
    assert out["versions_kept"] == 1 and out["manifests_removed"] == 1
    assert out["files_removed"] >= 1  # the replaced v1 file went away
    assert len(list(P(path).glob("*.parquet"))) == n_files_before - out["files_removed"]

    got = {r["k"] for r in m.read_snapshot(spark, path).collect()}
    assert 10 not in got and 11 not in got and len(got) == 398
    import pytest

    with pytest.raises(Exception):
        m.read_snapshot(spark, path, 1)  # vacuumed away


def test_snapshot_init_twice_refused(spark, tmp_path):
    import pytest

    from aurora_mito_etl_spark.sources import merge as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    m.snapshot_init(path)
    with pytest.raises(ValueError, match="already"):
        m.snapshot_init(path)


def test_plain_merge_refused_on_snapshot_table(spark, tmp_path):
    from aurora_mito_etl_spark.sources.merge import (
        compact_small_files,
        snapshot_init,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    snapshot_init(path)
    updates = spark.createDataFrame([(5, "NEW5", 99)], "k long, val string, grp int")
    with pytest.raises(ValueError, match="snapshot-controlled"):
        merge_upsert(spark, path, updates, "k")
    with pytest.raises(ValueError, match="snapshot-controlled"):
        compact_small_files(spark, path)


def test_vacuum_keep_last_zero_refused(spark, tmp_path):
    from aurora_mito_etl_spark.sources.merge import snapshot_init, vacuum

    path = str(tmp_path / "t")
    _seed(spark, path)
    snapshot_init(path)
    with pytest.raises(ValueError, match="keep_last"):
        vacuum(path, keep_last=0)
    # table still readable afterwards
    from aurora_mito_etl_spark.sources.merge import read_snapshot

    assert read_snapshot(spark, path).count() == 400


def test_merge_handles_percent_encoded_paths(spark, tmp_path):
    # input_file_name() returns a URI: a directory with a space is
    # percent-encoded, and the post-write unlink must decode it or the
    # old file versions survive (duplicate rows for updated keys)
    path = str(tmp_path / "with space" / "t")
    _seed(spark, path)
    updates = spark.createDataFrame(
        [(5, "NEW5", 99)], "k long, val string, grp int"
    )
    stats = merge_upsert(spark, path, updates, "k")
    assert stats["files_rewritten"] == 1
    got = spark.read.parquet(path)
    assert got.count() == 400  # no duplicate row for key 5
    assert got.where("k = 5").collect()[0]["val"] == "NEW5"
