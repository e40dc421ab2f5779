"""Write-time bucketing: co-located joins must not shuffle.

Two tables written by `write_bucketed` on their join keys with the same
bucket count must (a) join to exactly the same rows as the plain
unbucketed join, and (b) plan that join with ZERO Exchange operators in
the join subtree — the whole point of paying the bucket shuffle once at
write time. Broadcast is disabled inside the plan assertion so the
small test tables can't dodge the sort-merge path that the 100-TB
big-big join shape uses.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from extraction.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    tmp = tempfile.mkdtemp(prefix="bkt_")
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3 % 17).alias("n_spans")
    )
    meta = spark.range(0, 300, 2).select(
        F.col("id").alias("meta_id"), (F.col("id") * 7 % 13).alias("grade")
    )
    write_bucketed(docs, "bkt_docs", "doc_id", 8, os.path.join(tmp, "d"))
    write_bucketed(meta, "bkt_meta", "meta_id", 8, os.path.join(tmp, "m"))
    yield docs, meta
    spark.sql("DROP TABLE IF EXISTS bkt_docs")
    spark.sql("DROP TABLE IF EXISTS bkt_meta")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    docs, meta = bucketed_pair
    got = (
        colocated_join(spark, "bkt_docs", "bkt_meta", "doc_id", "meta_id")
        .select("doc_id", "n_spans", "grade")
        .collect()
    )
    want = (
        docs.join(meta, F.col("doc_id") == F.col("meta_id"))
        .select("doc_id", "n_spans", "grade")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 150


def test_bucketed_join_plans_zero_exchange(spark, bucketed_pair):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "bkt_docs", "bkt_meta", "doc_id", "meta_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # the join subtree (SortMergeJoin and everything feeding it) must
        # contain no Exchange: both scans already carry the bucketed
        # HashPartitioning the join requires
        join_subtree = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_subtree, plan
        # sanity: results still correct with broadcast off
        assert joined.count() == 150
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
