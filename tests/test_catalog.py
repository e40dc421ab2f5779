"""Catalog-seam dispatch (catalog.py): table refs vs parquet paths.

The Iceberg jars are absent in this sandbox, so these tests pin down
everything that can be pinned without them: ref parsing, the
configured-catalog guard (the table branch must die with a pointed
message, not a mid-job NoSuchCatalogException), snapshot-id semantics
for path inputs, and full behavioral equivalence of the path branch —
the lineage round-trip (write buckets, append lineage, read back,
resume) driven entirely through the seam.
"""

from __future__ import annotations

import pytest

from extraction import catalog as C
from extraction.schema import DOCS_SCHEMA


def test_ref_parsing():
    assert C.is_table_ref("table:ice.db.docs")
    assert not C.is_table_ref("/tmp/docs_parquet")
    assert not C.is_table_ref("tables/docs")  # prefix must match exactly
    assert C.table_name("table:ice.db.docs") == "ice.db.docs"
    with pytest.raises(ValueError):
        C.table_name("table:")
    with pytest.raises(ValueError):
        C.table_name("table: padded.db.t")


def test_catalog_of_components():
    # 3-part names carry an explicit catalog; shorter ones resolve in the
    # session catalog and need no spark.sql.catalog.* conf
    assert C._catalog_of("ice.db.docs") == "ice"
    assert C._catalog_of("db.docs") is None
    assert C._catalog_of("docs") is None


def test_unconfigured_catalog_fails_fast(spark):
    # the guard fires BEFORE any Spark action, names the missing conf key
    with pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.require_catalog(spark, "table:noice.db.docs")
    with pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.read_docs(spark, "table:noice.db.docs")
    with pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.current_snapshot_id(spark, "table:noice.db.docs")


def test_configured_catalog_passes_guard(spark):
    # with the conf present the guard admits the ref (the read itself
    # would then need the jar — not exercisable here, and not dispatch)
    spark.conf.set("spark.sql.catalog.fakecat", "org.example.FakeCatalog")
    try:
        assert C.require_catalog(spark, "table:fakecat.db.docs") == "fakecat.db.docs"
    finally:
        spark.conf.unset("spark.sql.catalog.fakecat")


def test_snapshot_id_is_zero_for_paths(spark, tmp_path):
    assert C.current_snapshot_id(spark, str(tmp_path / "anything")) == 0


def test_path_branch_lineage_round_trip(spark, tmp_path):
    """The full commit protocol through the seam on the path branch:
    write a bucket group, append lineage, crash, resume — identical to
    the pre-seam behavior the soak/resume suites pin."""
    from extraction.corpus import corpus_df
    from extraction.lineage import committed_buckets, run_with_lineage

    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    docs = corpus_df(spark, 300, slices=8)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_lineage(
            spark, docs, out, lin, "r1",
            num_buckets=8, buckets_per_commit=2, fail_after_commits=2,
        )
    done_mid = committed_buckets(spark, lin, "r1")
    assert 0 < len(done_mid) < 8

    run_with_lineage(
        spark, docs, out, lin, "r1", num_buckets=8, buckets_per_commit=2,
    )
    got = C.read_back(spark, out)
    assert got.count() == 300
    assert got.select("doc_id").distinct().count() == 300
    assert len(committed_buckets(spark, lin, "r1")) == 8

    # input read through the seam parses the same schema-pinned parquet
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    assert C.read_docs(spark, src, DOCS_SCHEMA).count() == 300


def test_merge_upsert_unconfigured_catalog_fails_fast(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.merge_upsert(spark, "table:noice.db.docs", df, "doc_id")


def test_merge_upsert_path_branch_semantics(spark, tmp_path):
    """Replace-by-key, insert-new-key, leave-the-rest: the full MERGE
    contract on the parquet fallback."""
    path = str(tmp_path / "corpus")
    base = spark.createDataFrame(
        [(1, "one v1"), (2, "two v1"), (3, "three v1")],
        "doc_id long, text string",
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "two v2"), (9, "nine NEW")], "doc_id long, text string"
    )
    C.merge_upsert(spark, path, updates, "doc_id")
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: "one v1", 2: "two v2", 3: "three v1", 9: "nine NEW"}
    # idempotent: re-applying the same updates changes nothing
    C.merge_upsert(spark, path, updates, "doc_id")
    again = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}
    assert again == got


def test_compact_files_path_branch(spark, tmp_path):
    """Fragmented parquet (32 files for ~rows that fit in one) compacts
    to the ContentSummary-derived target; the row SET survives exactly;
    an already-compact dir is a no-op; the table branch fails fast on an
    unconfigured catalog (the CALL would need the Iceberg jar)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    ref = str(tmp_path / "frag")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).cast("long").alias("v")
    )
    df.repartition(32).write.parquet(ref)
    before = spark.read.parquet(ref)
    n_files = len(before.inputFiles())
    assert n_files >= 32
    expect = sorted((r["k"], r["v"]) for r in before.collect())

    stats = C.compact_files(spark, ref, target_file_bytes=64 * 1024 * 1024)
    assert stats["skipped"] is False
    assert stats["files_before"] == n_files
    assert stats["files_after"] < n_files
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(ref).collect())
    assert got == expect
    # no temp/backup dirs left behind
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != "frag"]
    assert leftovers == []

    again = C.compact_files(spark, ref, target_file_bytes=64 * 1024 * 1024)
    assert again["skipped"] is True
    assert again["files_after"] == stats["files_after"]

    with _pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.compact_files(spark, "table:noice.db.docs")
