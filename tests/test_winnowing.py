"""Winnowing fingerprints: the shared-run guarantee, pinned.

Schleimer/Wilkerson/Aiken: with k-word shingles and window w, any two
documents sharing a contiguous run of >= w + k - 1 words select at
least one common hash. The suite builds documents that share EXACTLY
the threshold run (must match) and sub-threshold runs (no guarantee —
only checked for the absence of false pairing when nothing is shared),
plus the resolution floor (docs shorter than the threshold fingerprint
to nothing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from extraction.dedup import winnow_overlap_pairs
from extraction.textops import winnow_sketch

K, W = 3, 4
THRESHOLD = W + K - 1  # 6 words


def _sketches(spark, docs):
    rows = (
        spark.createDataFrame(docs, "doc_id string, text string")
        .select("doc_id", winnow_sketch(F.col("text"), K, W).alias("s"))
        .collect()
    )
    return {r["doc_id"]: set(r["s"]) for r in rows}


def test_threshold_run_guarantees_shared_hash(spark):
    shared = "alpha bravo charlie delta echo foxtrot"  # exactly 6 words
    assert len(shared.split()) == THRESHOLD
    docs = [
        ("a", f"one two three {shared} four five six"),
        ("b", f"nine eight {shared} seven ten eleven twelve"),
    ]
    sk = _sketches(spark, docs)
    assert sk["a"] & sk["b"], (
        "docs sharing a run of w+k-1 words MUST share a selected hash"
    )


def test_disjoint_docs_share_nothing(spark):
    docs = [
        ("a", "alpha bravo charlie delta echo foxtrot golf hotel india"),
        ("b", "one two three four five six seven eight nine ten"),
    ]
    sk = _sketches(spark, docs)
    assert not (sk["a"] & sk["b"]), "disjoint word streams must not collide"


def test_below_resolution_is_empty(spark):
    sk = _sketches(spark, [("tiny", "only five little words here")])
    assert sk["tiny"] == set(), (
        "docs shorter than w+k-1 words are below the guarantee's "
        "resolution and must fingerprint to nothing"
    )


def test_overlap_pairs_finds_the_planted_passage(spark):
    passage = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        ("p1", f"intro words here {passage} and a long unrelated tail one"),
        ("p2", f"different opening {passage} with another distinct ending"),
        ("q1", "completely unrelated content about maritime navigation"),
        ("q2", "more unrelated text concerning alpine geology formations"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(
            df, "text", "doc_id", k=K, w=W, min_shared=1, max_df=10
        ).collect()
    }
    assert ("p1", "p2") in pairs, "planted shared passage must surface"
    assert all({a, b} == {"p1", "p2"} for a, b in pairs), (
        f"no false pairs among unrelated docs: {pairs}"
    )
