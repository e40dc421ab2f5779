#!/usr/bin/env python
"""Measure what the bigram-LM quality score actually separates.

Pure DuckDB (no Spark session): runs the text_lm_score oracle SQL —
the bit-exact mirror of scoring.lm_score_table — on a testdata sf dir
and reports, per train-slice membership (quality >= 50 trains the LM):

- lm_score distribution (min / p25 / median / p75 / max)
- OOV-bigram rate
- Spearman rank correlation between lm_score and quality_score

The number this tool exists for: the LM must rank held-out (low
quality) docs BELOW train-slice docs without having seen their labels —
the CCNet premise that reference-LM probability is a transferable
quality signal. Feeds BENCH/LM.md.

Usage: python tools/lm_eval.py [/root/testdata/sf0.1]
       python tools/lm_eval.py --synthetic [N]

--synthetic runs the same oracle SQL on the DISCRIMINATIVE deterministic
corpus (corpus.gen_text_corpus: per-lang Zipf+bigram-chain fluent docs,
a word-salad control with identical quality features, and a degenerate
short-repetition tier) and reports lm_score per TIER — the measurement
round 4's negative result asked for: a corpus that COULD show
separation. Feeds BENCH/LM.md.
"""

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

from extraction.oracles_sql import ORACLES, _QUALITY_EXPR  # noqa: E402


def _synthetic_view(con, n: int) -> None:
    from extraction.corpus import text_corpus_arrow

    con.register("synth_docs", text_corpus_arrow(n))
    con.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM synth_docs")


def _per_tier(con) -> None:
    from extraction.oracles_sql import lm_tier_stats_sql

    rows = con.sql(lm_tier_stats_sql()).fetchall()
    print("tier         n_docs  lm_score p25/p50/p75      oov_rate  quality_p50")
    for tier, n, p25, p50, p75, oov, q in rows:
        print(f"{tier:12} {n:6}  {p25}/{p50}/{p75}  {round(oov, 4)}  {q}")
    sep = {r[0]: r[3] for r in rows}
    if "fluent" in sep and "salad" in sep and sep["salad"]:
        print(
            f"fluent/salad median lm_score ratio = "
            f"{sep['fluent'] / max(1, sep['salad']):.2f} "
            "(same quality features — only bigram fluency differs)"
        )


def main() -> int:
    con = duckdb.connect()
    if len(sys.argv) > 1 and sys.argv[1] == "--synthetic":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
        _synthetic_view(con, n)
        print(f"synthetic discriminative corpus: {n} docs")
        _per_tier(con)
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    path = os.path.join(sf_dir, "documents.parquet").replace("'", "''")
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{path}')"
    )
    rows = con.sql(
        f"""
WITH lm AS ({ORACLES['text_lm_score']}),
q AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_QUALITY_EXPR} AS quality
  FROM documents
), j AS (
  SELECT lm.doc_id, lm.lang, lm.n_bigrams, lm.oov_bigrams, lm.lm_score,
         q.quality, q.quality >= 50 AS in_train
  FROM lm JOIN q USING (doc_id)
)
SELECT in_train,
       COUNT(*) AS n_docs,
       MIN(lm_score) AS min_s,
       CAST(quantile_disc(lm_score, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(lm_score, 0.50) AS BIGINT) AS p50,
       CAST(quantile_disc(lm_score, 0.75) AS BIGINT) AS p75,
       MAX(lm_score) AS max_s,
       ROUND(SUM(oov_bigrams) * 1.0 / SUM(n_bigrams), 4) AS oov_rate
FROM j GROUP BY in_train ORDER BY in_train
"""
    ).fetchall()
    corr = con.sql(
        f"""
WITH lm AS ({ORACLES['text_lm_score']}),
q AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_QUALITY_EXPR} AS quality
  FROM documents
), j AS (
  SELECT lm.lm_score, q.quality FROM lm JOIN q USING (doc_id)
), r AS (
  SELECT rank() OVER (ORDER BY lm_score) AS rs,
         rank() OVER (ORDER BY quality) AS rq
  FROM j
)
SELECT ROUND(corr(rs, rq), 4) FROM r
"""
    ).fetchone()[0]
    print(f"sf_dir: {sf_dir}")
    print("in_train  n_docs  min/p25/p50/p75/max lm_score        oov_rate")
    for t, n, mn, p25, p50, p75, mx, oov in rows:
        print(
            f"{str(bool(t)):8}  {n:6}  "
            f"{mn}/{p25}/{p50}/{p75}/{mx}  {oov}"
        )
    print(f"spearman(lm_score, quality_score) = {corr}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
