"""Model-based document scoring for training-data curation.

Two operators the CCNet / fastText stage of an LLM data pipeline runs
corpus-wide, both expressed as pure DataFrame compositions (no Python
UDFs) with every score an exact integer so an independent ANSI-SQL
engine reproduces identical values:

- ``lm_score_table``: CCNet-style bigram-LM quality scoring (Wenzek et
  al. 2020 train a KenLM on clean text and rank crawl docs by
  perplexity). Here the "clean reference" is the corpus slice with
  ``quality_score >= REF_QUALITY``; the LM is a stupid-backoff bigram
  model (Brants et al. 2007) trained distributively with two hash
  aggregations, and every document is scored by its mean scaled bigram
  probability. Probabilities are scaled integers: seen bigram ->
  ``(SCALE·c2(w1 w2)) div c1(w1)``, unseen -> backoff
  ``(ALPHA_NUM·SCALE·c1(w2)) div (ALPHA_DEN·T)`` (alpha = 0.4), else 0.
  Integer division is exact and associative-safe (no float summation
  order hazard between engines).

- ``hashed_linear_scores``: fastText-style linear classifier inference
  (Joulin et al. 2016) with the hashing trick: token -> md5-prefix
  bucket in [0, dims); the model is a dims-row (bucket, weight) table
  broadcast-joined to the exploded token stream; doc score = sum of
  matched weights, label = sign. The weight table here is a
  deterministic synthetic stand-in (documented LCG of the bucket id —
  the seam where a trained model's weights would load, the same
  model-artifact seat as the IVF centroid table,
  /root/reference/src/DocumentAnalyzer.py:45-46); the Spark-side
  inference plan — broadcast model join, map-side combinable per-doc
  agg — is the real, scale-shaped artifact.

Scale notes (100 TB):
- LM training is two groupBy-count shuffles, both map-side combinable
  down to |vocab| and |observed bigrams| rows; the context join
  (bigram -> its prefix unigram count) is model-sized, not corpus-sized.
- LM scoring pre-aggregates per (doc, ngram) BEFORE joining the model,
  so the join carries distinct-bigrams-per-doc rows, not every token
  position. The bigram join key's hottest values (the corpus's top
  bigrams) are the skew to watch: AQE skew-join splits them; at the
  test scale the model side is broadcastable and AQE chooses that.
- SCALE·count must stay below 2^63: with SCALE = 10^6 the model can
  hold counts up to ~9·10^12; at trillion-token scale drop SCALE to
  10^4 or train per-shard.
- Classifier inference is one broadcast join (model is dims rows —
  tiny by construction) plus one map-side-combined per-doc agg; the
  corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import quality_score, word_bigrams, words

SCALE = 1_000_000
ALPHA_NUM, ALPHA_DEN = 2, 5  # stupid-backoff alpha = 0.4, exact rational
REF_QUALITY = 50  # docs scoring >= this train the reference LM

CLS_DIMS = 256  # hashed-feature buckets of the synthetic classifier
# LCG constants for the synthetic weight table (Numerical Recipes);
# weight(b) = ((b·1103515245 + 12345) mod 2001) − 1000 in [−1000, 1000]
_LCG_A, _LCG_C, _W_MOD, _W_OFF = 1103515245, 12345, 2001, 1000


def lm_score_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    ref_quality: int = REF_QUALITY,
    scale: int = SCALE,
) -> DataFrame:
    """Per-document bigram-LM quality scores against a corpus-trained
    stupid-backoff model.

    Returns (id, lang, n_bigrams, oov_bigrams, sum_p, lm_score), one
    row per document with >= 1 bigram (docs under 2 tokens carry no LM
    evidence and are dropped by both engines identically). All columns
    are exact integers; ``lm_score = sum_p div n_bigrams`` is the mean
    scaled probability in [0, scale].
    """
    train = df.filter(quality_score(F.col(text_col)) >= F.lit(ref_quality))

    # unigram model: c1 per word + total token count T (scalar, joined
    # broadcast like t3's scalar-agg — no global sort, no collect)
    uni = (
        train.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("long").alias("t_tokens"))

    # bigram model joined to its prefix-unigram context count: p2 is
    # the scaled conditional probability (SCALE·c2) div c1(w1) — the
    # join is model-sized (|observed bigrams| rows), never corpus-sized
    bi = (
        train.select(F.explode(word_bigrams(F.col(text_col))).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("c2"))
        .withColumn("w1", F.element_at(F.split(F.col("ngram"), " "), 1))
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .select("ngram", F.expr(f"({scale} * c2) div c1").alias("p2"))
    )
    # backoff table: b1(w) = (ALPHA·SCALE·c1(w)) div T, exact rational
    backoff = uni.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("w2"),
        F.expr(
            f"({ALPHA_NUM} * {scale} * c1) div ({ALPHA_DEN} * t_tokens)"
        ).alias("b1"),
    )

    # scoring: per-(doc, ngram) multiplicity FIRST (bounds the model
    # join to distinct bigrams per doc), then left-join both tiers
    doc_bg = (
        df.select(
            F.col(id_col), F.col(lang_col),
            F.explode(word_bigrams(F.col(text_col))).alias("ngram"),
        )
        .groupBy(id_col, lang_col, "ngram")
        .agg(F.count("*").cast("long").alias("m"))
        .withColumn("w2", F.element_at(F.split(F.col("ngram"), " "), 2))
    )
    p = F.coalesce(F.col("p2"), F.col("b1"), F.lit(0).cast("long"))
    return (
        doc_bg.join(bi, "ngram", "left")
        .join(backoff, "w2", "left")
        .groupBy(id_col, lang_col)
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("p2").isNull(), F.col("m")).otherwise(0))
            .cast("long")
            .alias("oov_bigrams"),
            F.sum(F.col("m") * p).cast("long").alias("sum_p"),
        )
        .withColumn("lm_score", F.expr("sum_p div n_bigrams"))
    )


def classifier_weights(spark, dims: int = CLS_DIMS) -> DataFrame:
    """The synthetic (bucket, weight) model table — dims rows.

    Deterministic LCG of the bucket id, reproducible in any SQL engine
    with 64-bit integer arithmetic (no hash builtin needed). This is
    the model-artifact seat: a trained fastText/logistic model loads
    its quantized weights into exactly this shape.
    """
    return spark.range(dims).select(
        F.col("id").alias("bucket"),
        F.expr(
            f"(id * {_LCG_A} + {_LCG_C}) % {_W_MOD} - {_W_OFF}"
        ).cast("long").alias("weight"),
    )


def hashed_linear_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    dims: int = CLS_DIMS,
) -> DataFrame:
    """Per-document hashed-linear-classifier scores.

    Token -> portable 32-bit md5-prefix hash mod dims (substring(md5,
    1, 8) — reproducible cross-engine) -> broadcast join to the
    weight table -> per-doc sum. Returns (id, lang, n_tokens, score,
    label) with label = 1 when score >= 0 else 0. Tokens are counted
    with multiplicity (bag-of-words, as fastText does); per-(doc,
    bucket) counts are pre-aggregated so the broadcast join touches at
    most dims rows per doc.
    """
    spark = df.sparkSession
    tok = (
        df.select(
            F.col(id_col), F.col(lang_col),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        .select(
            id_col, lang_col,
            (F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
             % F.lit(dims)).alias("bucket"),
        )
        .groupBy(id_col, lang_col, "bucket")
        .agg(F.count("*").cast("long").alias("m"))
    )
    return (
        tok.join(F.broadcast(classifier_weights(spark, dims)), "bucket")
        .groupBy(id_col, lang_col)
        .agg(
            F.sum("m").cast("long").alias("n_tokens"),
            F.sum(F.col("m") * F.col("weight")).cast("long").alias("score"),
        )
        .withColumn(
            "label",
            F.when(F.col("score") >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
    )
