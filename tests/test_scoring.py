"""scoring.py contract: the Spark bigram-LM scores and hashed-linear
classifier scores must equal a trivial pure-Python reference on a
handcrafted corpus that exercises every tier — seen bigram, unigram
backoff, fully-OOV (score 0), the quality gate excluding docs from the
train slice, and sub-2-token docs dropping out entirely."""

import hashlib
import re
from collections import Counter

import __spark_entry__ as entry

SW_EN = {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"}


def _quality(text: str) -> int:
    ws = [w for w in text.split() if w]
    sw = sum(1 for w in [w.lower() for w in ws] if w in SW_EN)
    punct = len(re.findall(r"[.,;:!?]", text))
    upper = len(re.findall(r"[A-Z]", text))
    return int(
        min(len(text) / 5, 40.0)
        + min(sw * 4, 30)
        + min(punct * 3, 15)
        - min(upper, 15)
        + 15.0
    )


def _bigrams(text: str) -> list[tuple[str, str]]:
    ws = [w for w in text.split() if w]
    return list(zip(ws, ws[1:]))


ROWS = [
    # long, stopwordy, punctuated -> quality >= 50 -> trains the LM
    (0, "the cat sat on the mat, and the cat sat again. it is that good, for sure.", "en"),
    (1, "the dog sat on the mat, and the dog ran off. it is that fine, for now.", "en"),
    # short + shouty tail -> quality < 50 -> scored but never trains;
    # the lowercase head shares bigrams with the train slice (tokens
    # are case-sensitive), the tail is OOV
    (2, "the cat sat zzz qqq AAAA BBBB", "en"),
    # fully-OOV words -> every bigram hits the zero tier
    (3, "xx yy zz ww", "de"),
    # sub-2-token docs: no bigram evidence, dropped by both engines
    (4, "", "de"),
    (5, "solo", "de"),
]


def test_lm_score_matches_python_reference(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in entry.q_text_lm_score(spark, str(tmp_path)).collect()
    }

    train = [t for _, t, _ in ROWS if _quality(t) >= 50]
    assert train == [ROWS[0][1], ROWS[1][1]]  # the gate actually gates
    c1 = Counter(w for t in train for w in t.split() if w)
    c2 = Counter(bg for t in train for bg in _bigrams(t))
    T = sum(c1.values())

    for doc_id, text, _ in ROWS:
        bgs = _bigrams(text)
        if not bgs:
            assert doc_id not in got
            continue
        sum_p = oov = 0
        for w1, w2 in bgs:
            if (w1, w2) in c2:
                sum_p += (1_000_000 * c2[(w1, w2)]) // c1[w1]
            else:
                oov += 1
                if w2 in c1:
                    sum_p += (2 * 1_000_000 * c1[w2]) // (5 * T)
        r = got[doc_id]
        assert (r["n_bigrams"], r["oov_bigrams"], r["sum_p"]) == (
            len(bgs), oov, sum_p
        )
        assert r["lm_score"] == sum_p // len(bgs)

    # train docs score near SCALE (their bigrams are mostly unique in
    # the model: p2 ~ c2/c1 of repeated contexts), OOV doc scores 0
    assert got[3]["lm_score"] == 0 and got[3]["oov_bigrams"] == 3
    assert got[0]["lm_score"] > got[2]["lm_score"] > got[3]["lm_score"]


def test_classifier_matches_python_reference(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in entry.q_text_classifier_score(spark, str(tmp_path)).collect()
    }

    def weight(b: int) -> int:
        return (b * 1103515245 + 12345) % 2001 - 1000

    for doc_id, text, _ in ROWS:
        ws = [w for w in text.split() if w]
        if not ws:
            assert doc_id not in got
            continue
        score = sum(
            weight(int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 256)
            for w in ws
        )
        r = got[doc_id]
        assert (r["n_tokens"], r["score"], r["label"]) == (
            len(ws), score, 1 if score >= 0 else 0
        )


def test_classifier_dims_threads_to_model(spark, tmp_path):
    """dims > CLS_DIMS must widen the model table too — a mod-512
    bucket with a 256-row model would silently drop ~half the tokens
    through the inner join (regression pin for the dims parameter)."""
    from extraction.scoring import hashed_linear_scores

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat and more words here", "en")],
        "doc_id long, text string, lang string",
    )
    out = hashed_linear_scores(df, "text", "doc_id", "lang", dims=512).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 10
