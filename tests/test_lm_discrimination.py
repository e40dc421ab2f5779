"""LM-score discrimination on the corpus that carries the signal
(BENCH/LM.md round 5): pure DuckDB over corpus.gen_text_corpus — no
Spark session, runs in seconds.

The design property under test: the salad tier is a CONTROL — same
Zipf vocabulary, same stopword/punct cadence, same length range as
fluent, so quality_score cannot separate the two; only the bigram
chain differs. The LM score must separate them anyway (that is what a
fluency score IS), and the degenerate tier must carry the OOV mass.
"""

import duckdb
import pyarrow as pa
import pytest

from extraction.corpus import gen_text_corpus
from extraction.oracles_sql import ORACLES, _QUALITY_EXPR


@pytest.fixture(scope="module")
def stats():
    rows = gen_text_corpus(2000)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "tier": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("synth_docs", t)
    con.execute("CREATE VIEW documents AS SELECT * FROM synth_docs")
    out = con.sql(
        f"""
WITH lm AS ({ORACLES['text_lm_score']}),
t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, tier,
             {_QUALITY_EXPR} AS quality FROM documents),
j AS (SELECT lm.*, t.tier, t.quality FROM lm JOIN t USING (doc_id))
SELECT tier,
       CAST(quantile_disc(lm_score, 0.50) AS BIGINT) AS p50,
       CAST(quantile_disc(quality, 0.50) AS BIGINT) AS q50,
       SUM(oov_bigrams) * 1.0 / SUM(n_bigrams) AS oov
FROM j GROUP BY tier
"""
    ).fetchall()
    con.close()
    return {r[0]: {"p50": r[1], "q50": r[2], "oov": r[3]} for r in out}


def test_salad_is_a_true_quality_control(stats):
    # identical quality features by construction: the quality-gated
    # train slice cannot separate fluent from salad
    assert stats["fluent"]["q50"] == stats["salad"]["q50"]
    assert stats["degenerate"]["q50"] < 50  # held-out slice exists


def test_lm_separates_fluency_not_quality(stats):
    # >= 2x median separation on identical quality features
    assert stats["fluent"]["p50"] >= 2 * stats["salad"]["p50"], stats
    assert stats["fluent"]["oov"] == 0.0


def test_degenerate_tier_carries_the_oov_mass(stats):
    assert stats["degenerate"]["oov"] > 0.05
    assert stats["salad"]["oov"] < 0.01
