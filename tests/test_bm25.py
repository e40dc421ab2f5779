"""text_bm25_topk contract: BM25 retrieval must be discriminative, not
just oracle-matching — a scorer that returned a constant would still
hash-match a broken mirror of itself. A constructed corpus (the
test_keeper_policy pattern) pins the three behaviors that make BM25
BM25, each chosen so a specific regression surfaces:

1. tf SATURATION: a doc matching 6 probe terms once beats a doc
   matching 2 probe terms ten times each (k1=1.2 caps the repeat
   payoff; a raw-tf scorer would invert this);
2. LENGTH normalization: the same term set in a padded doc scores
   strictly below the short doc (b=0.75; dropping the dl/avgdl term
   would tie them);
3. candidate pruning: a doc sharing NO probe term never appears (the
   broadcast semi-join is load-bearing, not an optimization).

The probe doc itself (it IS the query) must rank 1: it contains every
probe term including two that exist nowhere else (df=1 -> max idf).
"""

import __spark_entry__ as entry

W = ["zebra", "quartz", "flute", "amber", "gorge", "plinth", "vexil", "quorn"]
FILLER = "the data row batch merge join sort table"


def test_bm25_semantics_on_constructed_corpus(spark, tmp_path):
    rows = [
        # probe doc (doc_id < 5): the 8 distinctive words, once each
        (0, " ".join(W), "en"),
        # coverage doc: 6 probe terms once, short
        (10, " ".join(W[:6]), "en"),
        # tf-repetition doc: 2 probe terms, 10x each
        (20, " ".join([W[0]] * 10 + [W[1]] * 10), "en"),
        # padded doc: doc 10's term set + 48 filler words
        (30, " ".join(W[:6]) + " " + " ".join([FILLER] * 6), "en"),
        # no shared term: must never appear as a candidate
        (40, " ".join([FILLER] * 3), "en"),
        (50, FILLER, "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = entry.q_text_bm25_topk(spark, str(tmp_path)).collect()
    assert {r["qid"] for r in out} == {0}
    ranked = sorted(out, key=lambda r: r["rnk"])
    assert [r["rnk"] for r in ranked] == list(range(1, len(ranked) + 1))
    score = {r["doc_id"]: r["score_s"] for r in ranked}

    assert ranked[0]["doc_id"] == 0, "the probe doc must retrieve itself #1"
    assert score[10] > score[20], "coverage must beat saturated repetition"
    assert score[10] > score[30], "length normalization must penalize padding"
    assert 40 not in score and 50 not in score, (
        "docs sharing no probe term must be pruned before scoring"
    )
    scores = [r["score_s"] for r in ranked]
    assert scores == sorted(scores, reverse=True) and scores[0] > scores[-1]


def test_bm25_testdata_shape(spark):
    # the driver-contract shape at sf0.001: 5 probes x top-10, dense
    # ranks, non-increasing scores within each qid
    rows = entry.q_text_bm25_topk(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 50
    for qid in range(5):
        rs = sorted(
            (r for r in rows if r["qid"] == qid), key=lambda r: r["rnk"]
        )
        assert [r["rnk"] for r in rs] == list(range(1, 11))
        scores = [r["score_s"] for r in rs]
        assert scores == sorted(scores, reverse=True)
