"""snapshot_diff (operators/diff.py) unit semantics: op classification,
changed-column lists, and null handling (value→null, null→value, and
null==null must compare as unchanged)."""

from pyspark.sql import Row

from bbt_etl_dw_spark.operators.diff import snapshot_diff


def _rows(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_snapshot_diff_ops_and_nulls(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),   # unchanged
            Row(k=2, a="y", b=2.0),   # update: a changes
            Row(k=3, a=None, b=3.0),  # update: a null -> value
            Row(k=4, a="z", b=None),  # unchanged (null == null)
            Row(k=5, a="w", b=5.0),   # delete
            Row(k=7, a="v", b=7.0),   # update: b value -> null
        ],
        schema="k long, a string, b double",
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),
            Row(k=2, a="y2", b=2.0),
            Row(k=3, a="now", b=3.0),
            Row(k=4, a="z", b=None),
            Row(k=6, a="new", b=6.0),  # insert
            Row(k=7, a="v", b=None),
        ],
        schema="k long, a string, b double",
    )
    got = _rows(snapshot_diff(old, new, keys=["k"]))

    assert set(got) == {2, 3, 5, 6, 7}  # unchanged keys 1 and 4 dropped
    assert got[2]["op"] == "update" and got[2]["changed_cols"] == ["a"]
    assert got[3]["op"] == "update" and got[3]["changed_cols"] == ["a"]
    assert got[5]["op"] == "delete" and got[5]["changed_cols"] == []
    assert got[5]["new_a"] is None and got[5]["old_a"] == "w"
    assert got[6]["op"] == "insert" and got[6]["new_a"] == "new"
    assert got[6]["old_a"] is None and got[6]["changed_cols"] == []
    assert got[7]["op"] == "update" and got[7]["changed_cols"] == ["b"]


def test_snapshot_diff_multi_key_and_subset_cols(spark):
    old = spark.createDataFrame(
        [Row(k1=1, k2="a", v=1.0, ignored="p"), Row(k1=1, k2="b", v=2.0, ignored="q")],
        schema="k1 long, k2 string, v double, ignored string",
    )
    new = spark.createDataFrame(
        [Row(k1=1, k2="a", v=9.0, ignored="p"), Row(k1=1, k2="b", v=2.0, ignored="Z")],
        schema="k1 long, k2 string, v double, ignored string",
    )
    out = snapshot_diff(old, new, keys=["k1", "k2"], compare_cols=["v"]).collect()
    # only (1,'a') changed on v; the 'ignored' column is not compared
    assert len(out) == 1
    r = out[0]
    assert (r["k1"], r["k2"], r["op"], r["changed_cols"]) == (1, "a", "update", ["v"])
    assert r["old_v"] == 1.0 and r["new_v"] == 9.0


def _part_files(path):
    import glob
    import os

    out = {}
    for d in glob.glob(os.path.join(path, "*=*")):
        out[os.path.basename(d)] = sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )
    return out


def test_apply_changes_partition_scoped_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    target = str(tmp_path / "dim")
    old = spark.createDataFrame(
        [
            (1, "a", 10.0, "p1"),
            (2, "b", 20.0, "p1"),
            (3, "c", 30.0, "p2"),
            (4, "d", 40.0, "p3"),  # untouched partition
            (5, "e", 50.0, "p4"),  # partition that empties out
        ],
        "k long, name string, v double, part string",
    )
    old.write.partitionBy("part").parquet(target)
    before = _part_files(target)

    new = spark.createDataFrame(
        [
            (1, "a", 11.0, "p1"),   # update in place
            (2, "b", 20.0, "p1"),   # unchanged
            (3, "c", 30.0, "p1"),   # moved p2 -> p1
            (4, "d", 40.0, "p3"),   # unchanged
            (6, "f", 60.0, "p2"),   # insert into p2
        ],
        "k long, name string, v double, part string",
    )  # k=5 deleted -> p4 empties
    changes = snapshot_diff(old, new, keys=["k"])
    apply_changes(spark, target, changes, keys=["k"], part_col="part")

    got = {
        tuple(r)
        for r in spark.read.parquet(target)
        .select("k", "name", "v", F.col("part").cast("string"))
        .collect()
    }
    want = {tuple(r) for r in new.collect()}
    assert got == want

    after = _part_files(target)
    # untouched partition p3: exact same files, untouched mtimes
    assert after["part=p3"] == before["part=p3"]
    # emptied partition p4 is gone entirely
    assert "part=p4" not in after


def test_apply_changes_escaped_partition_value_cleanup(spark, tmp_path):
    """Partition values Spark escapes in directory names (space, colon)
    must still be deletable when they empty out — the cleanup builds the
    dir name with Spark's own partition-path escaping, not raw f-strings."""
    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    target = str(tmp_path / "dim")
    old = spark.createDataFrame(
        [(1, "x", "a b:c"), (2, "y", "plain")],
        "k long, name string, part string",
    )
    old.write.partitionBy("part").parquet(target)
    import glob
    import os

    assert any("a b" in os.path.basename(d) for d in glob.glob(f"{target}/part=*"))

    new = spark.createDataFrame([(2, "y", "plain")], "k long, name string, part string")
    apply_changes(
        spark, target, snapshot_diff(old, new, keys=["k"]), keys=["k"], part_col="part"
    )
    # the escaped-name partition emptied out and its directory is gone
    assert not any("a b" in os.path.basename(d) for d in glob.glob(f"{target}/part=*"))
    got = [tuple(r) for r in spark.read.parquet(target).selectExpr("k", "name", "CAST(part AS STRING)").collect()]
    assert got == [(2, "y", "plain")]


def test_apply_changes_numeric_looking_string_partition(spark, tmp_path):
    """String partition value '01' must survive a rewrite intact: the
    target is read with an explicit schema from the change set, so
    directory-name type inference can never turn it into int 1 and
    fragment the partition."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    target = str(tmp_path / "dim")
    old = spark.createDataFrame(
        [(1, "x", "01"), (2, "y", "01")], "k long, name string, part string"
    )
    old.write.partitionBy("part").parquet(target)
    new = spark.createDataFrame(
        [(1, "x2", "01"), (2, "y", "01")], "k long, name string, part string"
    )
    apply_changes(
        spark, target, snapshot_diff(old, new, keys=["k"]), keys=["k"], part_col="part"
    )
    import glob
    import os

    parts = sorted(os.path.basename(d) for d in glob.glob(f"{target}/part=*"))
    assert parts == ["part=01"]  # no part=1 sibling
    got = sorted(
        tuple(r)
        for r in spark.read.schema("k long, name string, part string")
        .parquet(target)
        .collect()
    )
    assert got == [(1, "x2", "01"), (2, "y", "01")]


def test_apply_changes_empty_feed_is_noop(spark, tmp_path):
    """An empty change set (e.g. an idle CDC micro-batch) must leave the
    target byte-identical — the early return fires before any write."""
    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    target = str(tmp_path / "dim")
    snap = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "k long, name string, part string"
    )
    snap.write.partitionBy("part").parquet(target)
    before = _part_files(target)
    apply_changes(
        spark, target, snapshot_diff(snap, snap, keys=["k"]), keys=["k"], part_col="part"
    )
    assert _part_files(target) == before


def test_compact_partitions_after_cdc_churn(spark, tmp_path):
    """Repeated apply_changes fragments the churned partition; compacting
    only that partition collapses it to few files, preserves the data
    exactly, and leaves cold partitions' files byte-untouched."""
    import glob
    import os

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff
    from bbt_etl_dw_spark.sources.compact import compact_partitions

    target = str(tmp_path / "dim")

    def snap(version):
        # p_hot churns every version; p_cold never changes
        return spark.createDataFrame(
            [(k, f"v{version}" if k % 2 else "stable", "p_hot") for k in range(20)]
            + [(100 + k, "cold", "p_cold") for k in range(5)],
            "k long, name string, part string",
        )

    prev = snap(0)
    prev.write.partitionBy("part").parquet(target)
    for v in range(1, 4):
        cur = snap(v)
        apply_changes(
            spark, target, snapshot_diff(prev, cur, keys=["k"]), keys=["k"], part_col="part"
        )
        prev = cur

    def files(part):
        return sorted(
            (os.path.basename(f), os.path.getmtime(f))
            for f in glob.glob(f"{target}/part={part}/*.parquet")
        )

    cold_before = files("p_cold")
    hot_files_before = len(files("p_hot"))
    assert hot_files_before >= 2  # churn fragmented the hot partition

    before_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(target)
        .select("k", "name", F.col("part").cast("string"))
        .collect()
    )
    compact_partitions(spark, target, "part", ["p_hot"])
    after_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(target)
        .select("k", "name", F.col("part").cast("string"))
        .collect()
    )
    assert after_rows == before_rows           # lossless
    assert len(files("p_hot")) < hot_files_before  # actually compacted
    assert files("p_cold") == cold_before      # cold partition untouched


def test_compact_partitions_string_partition_and_file_split(spark, tmp_path):
    """compact_partitions must not re-infer numeric-looking string
    partitions (no duplicated part=1 beside part=01), and must split a
    large partition into multiple files per the size target instead of
    collapsing it into one giant single-task file."""
    import glob
    import os

    from bbt_etl_dw_spark.sources.compact import compact_partitions

    target = str(tmp_path / "t")
    pad = "x" * 100
    big = spark.range(20000).selectExpr(
        "id AS k", f"repeat('{pad}', 1) AS payload", "'01' AS part"
    )
    small = spark.range(5).selectExpr("id + 100000 AS k", "'s' AS payload", "'02' AS part")
    big.unionByName(small).write.partitionBy("part").parquet(target)

    compact_partitions(spark, target, "part", ["01"], target_file_mb=1)

    parts = sorted(os.path.basename(d) for d in glob.glob(f"{target}/part=*"))
    assert parts == ["part=01", "part=02"]  # no part=1 duplicate
    n_files = len(glob.glob(f"{target}/part=01/*.parquet"))
    assert n_files >= 2, n_files  # size target produced multiple files
    got = spark.read.schema("k long, payload string, part string").parquet(target)
    assert got.count() == 20005
    assert got.filter("part = '01'").count() == 20000


def test_apply_changes_float_partition_value_cleanup(spark, tmp_path):
    """Float partition values whose Python str() differs from Catalyst's
    rendering (1e-07 vs 1.0E-7) must still clean up when emptied — the
    cleanup renders values through a Spark cast-to-string, not str()."""
    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    target = str(tmp_path / "dim")
    old = spark.createDataFrame(
        [(1, "x", 1e-07), (2, "y", 0.5)],
        "k long, name string, part double",
    )
    old.write.partitionBy("part").parquet(target)
    import glob
    import os

    dirs = {os.path.basename(d) for d in glob.glob(f"{target}/part=*")}
    assert "part=1.0E-7" in dirs, dirs  # Catalyst rendering, not str(1e-07)

    new = spark.createDataFrame([(2, "y", 0.5)], "k long, name string, part double")
    apply_changes(
        spark, target, snapshot_diff(old, new, keys=["k"]), keys=["k"], part_col="part"
    )
    dirs = {os.path.basename(d) for d in glob.glob(f"{target}/part=*")}
    assert "part=1.0E-7" not in dirs, dirs
    got = [tuple(r) for r in spark.read.parquet(target).selectExpr("k", "name", "part").collect()]
    assert got == [(2, "y", 0.5)]


def test_apply_changes_null_partition_values(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__) are first-class
    (review finding): an upsert landing there must not wipe its
    survivors, deletes there must actually apply, a change set touching
    ONLY the NULL partition must not be dropped, and the directory is
    cleaned up when it empties."""
    import os

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    target = str(tmp_path / "dim")
    old = spark.createDataFrame(
        [
            (1, "a", 10.0, None),  # null partition, survivor
            (2, "b", 20.0, None),  # null partition, will update
            (3, "c", 30.0, "p1"),
        ],
        "k long, name string, v double, part string",
    )
    old.write.partitionBy("part").parquet(target)

    # change set touching ONLY the null partition
    new = spark.createDataFrame(
        [
            (1, "a", 10.0, None),   # unchanged survivor
            (2, "b", 21.0, None),   # update in place
            (3, "c", 30.0, "p1"),   # untouched
            (4, "d", 40.0, None),   # insert into null partition
        ],
        "k long, name string, v double, part string",
    )
    apply_changes(
        spark, target, snapshot_diff(old, new, keys=["k"]),
        keys=["k"], part_col="part",
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(target)
        .select("k", "name", "v", F.col("part").cast("string"))
        .collect()
    }
    assert got == {tuple(r) for r in new.collect()}

    # now delete every null-partition row: directory must disappear
    final = new.filter(F.col("part").isNotNull())
    apply_changes(
        spark, target, snapshot_diff(new, final, keys=["k"]),
        keys=["k"], part_col="part",
    )
    assert {tuple(r) for r in spark.read.parquet(target).select("k").collect()} == {(3,)}
    assert not os.path.exists(
        os.path.join(target, "part=__HIVE_DEFAULT_PARTITION__")
    )
