"""q_corpus_recipe stage-attribution contract on a handcrafted corpus
where EVERY stage fires (the sf0.01 testdata has zero exact dups, so
driver-oracle equality alone would never exercise the fingerprint
window — same hazard class as the pagerank vertex-transitivity issue).
Precedence order under test: held_out > exact > neardup > contaminated
> low_quality > kept.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away, "
    "with a calm and steady pace that is pleasant to read for hours."
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _recipe(spark, tmp_path):
    out = entry.q_corpus_recipe(spark, str(tmp_path)).collect()
    return {r["lang"]: r.asDict() for r in out}


def test_every_stage_fires_and_partitions_the_corpus(spark, tmp_path):
    # each text uses an entirely different word sequence so none of
    # them shares 3-shingles with another (a shared template phrase
    # would make them near-dups of each other)
    distinct = [
        "maple trees drop bright leaves in the cold autumn months and "
        "children gather them for school projects about nature.",
        "gravel roads wind through quiet valleys where old farms keep "
        "sheep and a river turns a wooden mill wheel slowly.",
        "copper wiring carries current to the small workshop where a "
        "clock maker repairs antique watches under a warm lamp.",
    ]
    rows = [
        # doc 7 -> held_out (doc_id % 20 == 7); its shingles define bench
        (7, GOOD, "en"),
        # exact dup pair: 1 keeps (min id), 21 drops as exact.
        # text shares NO 3-shingle with GOOD -> never contaminated
        (1, distinct[0], "en"),
        (21, distinct[0], "en"),
        # near-dup pair (one word changed): 2 keeps (component min),
        # 22 drops as neardup
        (2, distinct[1], "en"),
        (22, distinct[1].replace("gravel", "pebble"), "en"),
        # contaminated: shares GOOD's shingles but isn't the eval doc
        (3, GOOD + " extra tail words here.", "en"),
        # low quality: shouty, no stopwords, short
        (4, "BUY NOW!!! CLICK!!!", "en"),
        # clean keeper
        (5, distinct[2], "en"),
    ]
    _write(spark, tmp_path, rows)
    got = _recipe(spark, tmp_path)["en"]
    assert got["n_in"] == len(rows)
    assert got["n_held_out"] == 1
    assert got["n_exact"] == 1
    assert got["n_neardup"] == 1
    assert got["n_contaminated"] == 1
    assert got["n_low_quality"] == 1
    assert got["n_kept"] == 3  # docs 1, 2, 5
    # the stage columns partition n_in exactly
    assert got["n_in"] == sum(
        got[k]
        for k in (
            "n_held_out", "n_exact", "n_neardup", "n_contaminated",
            "n_low_quality", "n_kept",
        )
    )
    assert got["tokens_kept"] > 0


def test_precedence_exact_beats_neardup_and_quality(spark, tmp_path):
    # doc 24 is an exact dup of 4 AND low quality; it must count as
    # exact (first dropping stage), never double-counted
    bad = "SHOUTY SPAM SPAM SPAM!!!"
    rows = [
        (4, bad, "en"),
        (24, bad, "en"),
        (5, GOOD, "en"),
    ]
    _write(spark, tmp_path, rows)
    got = _recipe(spark, tmp_path)["en"]
    assert got["n_exact"] == 1        # doc 24
    assert got["n_low_quality"] == 1  # doc 4 (the fp keeper, still bad)
    assert got["n_in"] == 3
    assert got["n_kept"] == 1


def test_partition_invariance(spark, tmp_path):
    rows = [
        (i, f"document number {i} with its own very distinctive words "
            f"number{i} token{i} filler{i} and enough length to pass.", "en")
        for i in range(40)
    ]
    _write(spark, tmp_path, rows)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, entry.q_corpus_recipe(spark, str(tmp_path)).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, entry.q_corpus_recipe(spark, str(tmp_path)).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
