"""LM-score discrimination on the corpus that carries the signal
(BENCH/LM.md round 5): pure DuckDB over corpus.gen_text_corpus — no
Spark session, runs in seconds.

The design property under test: the salad tier is a CONTROL — same
Zipf vocabulary, same stopword/punct cadence, same length range as
fluent, so quality_score cannot separate the two; only the bigram
chain differs. The LM score must separate them anyway (that is what a
fluency score IS), and the degenerate tier must carry the OOV mass.
View registration and the per-tier SQL are the SAME helpers the
published measurement uses (corpus.text_corpus_arrow /
oracles_sql.lm_tier_stats_sql), so measurement and test cannot
silently diverge.
"""

import duckdb
import pytest

from extraction.corpus import text_corpus_arrow
from extraction.oracles_sql import lm_tier_stats_sql


@pytest.fixture(scope="module")
def stats():
    con = duckdb.connect()
    con.register("synth_docs", text_corpus_arrow(2000))
    con.execute("CREATE VIEW documents AS SELECT * FROM synth_docs")
    out = con.sql(lm_tier_stats_sql()).fetchall()
    con.close()
    # columns: tier, n_docs, p25, p50, p75, oov_rate, q_p50
    return {r[0]: {"p50": r[3], "q50": r[6], "oov": r[5]} for r in out}


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
