"""dedup_keeper_policy contract: the quality-argmax keeper must be able
to DIFFER from the min-id keeper (a broken policy that silently falls
back to min id would pass the driver oracle whenever quality happens to
be monotone with id — this corpus makes the high-quality member the
HIGHER id)."""

import __spark_entry__ as entry


def test_keeper_is_quality_argmax_not_min_id(spark, tmp_path):
    # docs 10 and 30 are near-dups (one word differs); 30 is clearly
    # higher quality (longer, punctuated, stopword-rich) so it must be
    # kept even though 10 is the component min
    low = "maple trees drop leaves in autumn months kids gather them"
    # near-dup with Jaccard ~0.57 (8 shared shingles of 14) and clearly
    # higher quality: +27 chars, +4 stopword hits, punctuation
    high_nd = low + ", for the kids of the town."
    rows = [
        (10, low, "en"),
        (30, high_nd, "en"),
        (50, "copper wiring hums in the old workshop near the river mill "
             "where a clock maker works under a warm and steady lamp.", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["component"]: r for r in
           entry.q_dedup_keeper_policy(spark, str(tmp_path)).collect()}
    assert 10 in out, "the near-dup pair must form a component labeled 10"
    r = out[10]
    assert r["n_members"] == 2
    assert r["keeper_id"] == 30, "quality argmax must beat the min-id rule"

    # sanity: with identical quality, ties go to the LOWEST id
    rows_tie = [(10, low, "en"), (30, low + " x", "en")]
    # identical-enough texts may tie on quality; just assert determinism
    df2 = spark.createDataFrame(rows_tie, "doc_id long, text string, lang string")
    df2.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    a = sorted(map(tuple, entry.q_dedup_keeper_policy(spark, str(tmp_path)).collect()))
    b = sorted(map(tuple, entry.q_dedup_keeper_policy(spark, str(tmp_path)).collect()))
    assert a == b
