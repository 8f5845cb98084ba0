"""Versioned parquet tables: snapshot publish, time travel, rollback,
merge-with-history, and crash invisibility.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.sources.versioned import (
    latest_version,
    read_version,
    rollback,
    upsert_version,
    versions,
    write_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_snapshot_publish_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "t")
    assert latest_version(table) is None
    v1 = write_version(_df(spark, [(1, "a"), (2, "b")]), table)
    v2 = write_version(_df(spark, [(1, "a2")]), table)
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2
    # Latest read sees only v2; v1 stays queryable (time travel).
    assert {tuple(r) for r in read_version(spark, table).collect()} == {
        (1, "a2")
    }
    assert {tuple(r) for r in read_version(spark, table, 1).collect()} == {
        (1, "a"),
        (2, "b"),
    }
    ops = [m["op"] for m in versions(table)]
    assert ops == ["overwrite", "overwrite"]
    with pytest.raises(ValueError):
        read_version(spark, table, 99)


def test_rollback_preserves_history(spark, tmp_path):
    table = str(tmp_path / "t")
    write_version(_df(spark, [(1, "good")]), table)
    write_version(_df(spark, [(1, "bad")]), table)
    v3 = rollback(spark, table, 1)
    assert v3 == 3
    assert {tuple(r) for r in read_version(spark, table).collect()} == {
        (1, "good")
    }
    # The bad version is still auditable.
    assert {tuple(r) for r in read_version(spark, table, 2).collect()} == {
        (1, "bad")
    }
    assert versions(table)[-1]["op"] == "rollback_to_1"


def test_upsert_version_merges_with_history(spark, tmp_path):
    table = str(tmp_path / "t")
    upsert_version(_df(spark, [(1, "a"), (2, "b")]), table, ["k"])
    upsert_version(
        _df(spark, [(2, "B"), (3, "c")]),
        table,
        ["k"],
        order_within_source=[F.col("v").asc()],
    )
    assert {tuple(r) for r in read_version(spark, table).collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }
    # Pre-merge state remains readable.
    assert {tuple(r) for r in read_version(spark, table, 1).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_unpublished_snapshot_is_invisible(spark, tmp_path):
    """Data staged without a manifest (a crashed writer) must never be
    served — readers resolve manifests, not directory listings."""
    table = str(tmp_path / "t")
    write_version(_df(spark, [(1, "a")]), table)
    # Simulate a crash: stage v=2 data, no manifest.
    _df(spark, [(9, "partial")]).write.parquet(
        os.path.join(table, "data", "v=2")
    )
    assert latest_version(table) == 1
    assert {tuple(r) for r in read_version(spark, table).collect()} == {
        (1, "a")
    }
    # The next commit allocates PAST the orphan — it never blocks and
    # its rows never surface.
    v = write_version(_df(spark, [(2, "b")]), table)
    assert v == 3
    assert {tuple(r) for r in read_version(spark, table).collect()} == {
        (2, "b")
    }
    assert 9 not in {
        r["k"]
        for m in versions(table)
        for r in read_version(spark, table, m["version"]).collect()
    }


def test_compact_version_binpacks_small_files(spark, tmp_path):
    import glob

    from legendary_data_pipeline_spark.sources.versioned import (
        compact_version,
    )

    table = str(tmp_path / "t")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    write_version(part.repartition(32), table)  # small-file accretion
    v1_files = glob.glob(os.path.join(table, "data", "v=1", "*.parquet"))
    assert len(v1_files) == 32

    v2 = compact_version(spark, table)
    assert v2 == 2
    v2_files = glob.glob(os.path.join(table, "data", "v=2", "*.parquet"))
    assert len(v2_files) == 1  # tiny table → one file
    # Content identical; pre-compact history intact.
    key = lambda df: {tuple(r) for r in df.collect()}
    assert key(read_version(spark, table)) == key(part)
    assert key(read_version(spark, table, 1)) == key(part)
    assert versions(table)[-1]["op"] == "compact"


def test_vacuum_removes_orphans_and_expired_history(spark, tmp_path):
    from legendary_data_pipeline_spark.sources.versioned import vacuum

    table = str(tmp_path / "t")
    for i in range(4):
        write_version(_df(spark, [(i, "x")]), table)
    # Orphaned staging dir from a crashed writer.
    _df(spark, [(99, "orphan")]).write.parquet(
        os.path.join(table, "data", "v=9")
    )
    planned = vacuum(table, keep_versions=2, dry_run=True)
    assert [os.path.basename(p) for p in planned] == ["v=1", "v=2", "v=9"]
    assert latest_version(table) == 4  # dry run touched nothing

    deleted = vacuum(table, keep_versions=2)
    assert deleted == planned
    assert [m["version"] for m in versions(table)] == [3, 4]
    assert {tuple(r) for r in read_version(spark, table).collect()} == {
        (3, "x")
    }
    # Time travel past the horizon fails loudly.
    with pytest.raises(ValueError):
        read_version(spark, table, 1)


def test_version_diff_change_data_feed(spark, tmp_path):
    from legendary_data_pipeline_spark.sources.versioned import version_diff

    table = str(tmp_path / "t")
    upsert_version(
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]), table, ["k"]
    )
    upsert_version(_df(spark, [(2, "B"), (4, "d")]), table, ["k"])
    # v2 = {1:a, 2:B, 3:c, 4:d}; simulate a delete by overwriting v3.
    write_version(_df(spark, [(1, "a"), (2, "B"), (4, "d")]), table)

    d12 = {
        r["k"]: (r["v"], r["change_type"])
        for r in version_diff(spark, table, 1, 2, ["k"]).collect()
    }
    assert d12 == {2: ("B", "update"), 4: ("d", "insert")}
    d23 = {
        r["k"]: (r["v"], r["change_type"])
        for r in version_diff(spark, table, 2, 3, ["k"]).collect()
    }
    assert d23 == {3: ("c", "delete")}
    # Identical snapshots → empty feed.
    assert version_diff(spark, table, 3, 3, ["k"]).count() == 0


def test_upsert_version_schema_evolution(spark, tmp_path):
    table = str(tmp_path / "t")
    upsert_version(_df(spark, [(1, "a"), (2, "b")]), table, ["k"])
    evolved = spark.createDataFrame(
        [(2, "B", 9), (3, "c", 7)], "k int, v string, score int"
    )
    # Without the flag, a schema fork fails loudly.
    with pytest.raises(Exception):
        upsert_version(evolved, table, ["k"])
    upsert_version(evolved, table, ["k"], merge_schema=True)
    got = {
        r["k"]: (r["v"], r["score"])
        for r in read_version(spark, table).collect()
    }
    assert got == {1: ("a", None), 2: ("B", 9), 3: ("c", 7)}
    # A later batch WITHOUT the new column keeps it (null for its rows).
    upsert_version(
        _df(spark, [(5, "e")]), table, ["k"], merge_schema=True
    )
    got = {
        r["k"]: (r["v"], r["score"])
        for r in read_version(spark, table).collect()
    }
    assert got[5] == ("e", None) and got[2] == ("B", 9)


# ---------------------------------------------------------------------------
# atomic multi-table publish (group commit)
# ---------------------------------------------------------------------------


def test_publish_group_all_or_nothing(spark, tmp_path):
    import os

    from legendary_data_pipeline_spark.sources.versioned import (
        latest_version,
        publish_group,
        read_version,
        write_version,
    )

    ta, tb = str(tmp_path / "prices"), str(tmp_path / "collection")
    write_version(spark.range(5).selectExpr("id", "id * 2 AS v"), ta)
    write_version(spark.range(3).selectExpr("id", "id + 1 AS c"), tb)

    marker = str(tmp_path / "_groups" / "run-001.json")
    out = publish_group(
        {
            ta: spark.range(10).selectExpr("id", "id * 3 AS v"),
            tb: spark.range(7).selectExpr("id", "id + 9 AS c"),
        },
        marker,
    )
    assert out == {ta: 2, tb: 2}
    assert os.path.exists(marker)
    assert latest_version(ta) == 2 and latest_version(tb) == 2
    assert read_version(spark, ta).count() == 10
    assert read_version(spark, tb).count() == 7
    # History intact.
    assert read_version(spark, ta, 1).count() == 5


def test_publish_group_crash_before_marker_invisible(spark, tmp_path):
    """Simulate a crash between manifest writes and the marker rename:
    both tables must still read at their OLD versions, and the next
    commit must not collide with the dead group's staged versions."""
    import json
    import os

    from legendary_data_pipeline_spark.sources.versioned import (
        _manifest_dir,
        latest_version,
        publish_group,
        read_version,
        vacuum,
        write_version,
    )

    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    write_version(spark.range(5).selectExpr("id"), ta)
    write_version(spark.range(3).selectExpr("id"), tb)

    # Run the real publish, then delete the marker to model the crash
    # (everything before the rename is identical; the marker IS the
    # only difference between committed and crashed).
    marker = str(tmp_path / "_groups" / "run-002.json")
    publish_group(
        {
            ta: spark.range(100).selectExpr("id"),
            tb: spark.range(200).selectExpr("id"),
        },
        marker,
    )
    os.remove(marker)

    assert latest_version(ta) == 1 and latest_version(tb) == 1
    assert read_version(spark, ta).count() == 5
    # Pending manifests exist on disk but are invisible.
    assert any(
        json.load(open(os.path.join(_manifest_dir(ta), f))).get(
            "group_commit"
        )
        for f in os.listdir(_manifest_dir(ta))
        if f.endswith(".json")
    )

    # Next single-table commit allocates PAST the dead group's slot.
    n = write_version(spark.range(9).selectExpr("id"), ta)
    assert n == 3
    assert read_version(spark, ta).count() == 9

    # Vacuum clears the dead group's data and manifest.
    doomed = vacuum(ta, keep_versions=2)
    assert any("v=2" in p for p in doomed)
    assert latest_version(ta) == 3


def test_publish_group_marker_is_one_shot(spark, tmp_path):
    import pytest

    from legendary_data_pipeline_spark.sources.versioned import (
        publish_group,
    )

    marker = str(tmp_path / "_groups" / "run-003.json")
    publish_group(
        {str(tmp_path / "t1"): spark.range(2).selectExpr("id")}, marker
    )
    with pytest.raises(FileExistsError):
        publish_group(
            {str(tmp_path / "t1"): spark.range(2).selectExpr("id")},
            marker,
        )
