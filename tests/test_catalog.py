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


def test_read_increment_unconfigured_catalog_fails_fast(spark):
    with pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.read_increment(spark, "table:noice.db.docs", 100)


def test_read_increment_path_branch_needs_prev_path(spark, tmp_path):
    # snapshot ids are meaningless on a parquet path; demand the prior
    # version's path instead of silently reading nothing
    with pytest.raises(ValueError, match="previous corpus version"):
        C.read_increment(spark, str(tmp_path / "cur"), 12345)


def test_read_increment_new_and_changed_only(spark, tmp_path):
    """The path-branch increment is exactly {new keys} ∪ {changed
    content}; unchanged rows never re-surface, and deleted-from-current
    rows are not resurrected."""
    cur_p, prev_p = str(tmp_path / "cur"), str(tmp_path / "prev")
    prev = spark.createDataFrame(
        [(1, "one v1"), (2, "two v1"), (3, "three v1"), (4, "gone")],
        "doc_id long, text string",
    )
    cur = spark.createDataFrame(
        [(1, "one v1"), (2, "two v2"), (3, "three v1"), (9, "nine NEW")],
        "doc_id long, text string",
    )
    prev.write.parquet(prev_p)
    cur.write.parquet(cur_p)
    inc = C.read_increment(spark, cur_p, prev_p)
    got = {r["doc_id"]: r["text"] for r in inc.collect()}
    assert got == {2: "two v2", 9: "nine NEW"}
    assert inc.columns == cur.columns  # fingerprint column never leaks


def test_increment_plus_unchanged_equals_full_extraction(spark, tmp_path):
    """Incremental extraction composes: kernel(increment) ∪ yesterday's
    output for unchanged docs == kernel(full corpus), span for span."""
    from pyspark.sql import functions as F

    from extraction.corpus import corpus_df
    from extraction.pipeline import run_extraction

    full = corpus_df(spark, 120, heavy_spans=100, slices=4)
    num = F.substring("doc_id", 5, 9).cast("long")
    stale = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("stale v1 marker").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(999999).cast("int").alias("offset"),
        )
    )
    prev = full.filter(num % 5 != 0).withColumn(
        "spans",
        F.when(num % 20 == 3, F.concat(F.col("spans"), stale)).otherwise(
            F.col("spans")
        ),
    )
    cur_p, prev_p = str(tmp_path / "cur"), str(tmp_path / "prev")
    full.write.parquet(cur_p)
    prev.write.parquet(prev_p)
    inc = C.read_increment(spark, cur_p, prev_p, schema=DOCS_SCHEMA)
    inc_ids = {r["doc_id"] for r in inc.select("doc_id").collect()}
    expect_ids = {f"doc-{i:09d}" for i in range(120) if i % 5 == 0 or i % 20 == 3}
    assert inc_ids == expect_ids

    def spans_of(df):
        return {
            (r["doc_id"], r["pos"], r["kind"], r["text"], r["media_ref"], r["order"])
            for r in df.select(
                "doc_id", F.posexplode_outer("spans").alias("pos", "span")
            )
            .select("doc_id", "pos", "span.kind", "span.text", "span.media_ref", "span.order")
            .collect()
        }

    full_out = spans_of(run_extraction(spark.read.schema(DOCS_SCHEMA).parquet(cur_p), num_partitions=4))
    inc_out = spans_of(run_extraction(inc, num_partitions=4))
    unchanged_out = {t for t in full_out if t[0] not in expect_ids}
    assert inc_out | unchanged_out == full_out
    assert inc_out & unchanged_out == set()


def test_read_at_snapshot_dispatch(spark, tmp_path):
    # table branch fails fast without the catalog conf
    with pytest.raises(ValueError, match="spark.sql.catalog.noice"):
        C.read_at_snapshot(spark, "table:noice.db.docs", 123)
    # path branch rejects an int snapshot id with a pointed message
    with pytest.raises(ValueError, match="prior version's path"):
        C.read_at_snapshot(spark, str(tmp_path / "cur"), 123)
    # path branch reads the materialized prior version
    prev = spark.createDataFrame([(1, "v1")], "doc_id long, text string")
    prev_p = str(tmp_path / "prev")
    prev.write.parquet(prev_p)
    got = C.read_at_snapshot(spark, str(tmp_path / "cur"), prev_p).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [(1, "v1")]
