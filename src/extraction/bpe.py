"""BPE vocabulary learning (Sennrich et al. 2016) as a fixed-iteration
DataFrame loop — the tokenizer-training seat the rest of the pipeline
presupposes (text_oov_rate scores against *some* learned vocabulary;
t8_pack_sequences packs counts *some* tokenizer produced).

Algorithm: start from the per-WORD-TYPE frequency table (the classic
BPE trick — training runs over distinct words weighted by corpus
frequency, never over the corpus itself), tokenize each word into
characters plus an end-of-word symbol, then k times: count adjacent
symbol pairs weighted by word frequency, pick the most frequent pair
(ties: lexicographically smallest), and merge every non-overlapping
left-to-right occurrence inside every word. The output is the merge
SEQUENCE (rank, left, right, pair_count) — the model artifact a
tokenizer ships — which is deterministic, so an independent ANSI
engine reproduces it bit-for-bit (same iterate-to-fixpoint idiom as
the reference's /root/reference/src/merge_vertical_paragraphs.py:22-98,
re-expressed as data-parallel rounds).

Tokenization state lives in ONE string column: symbols joined by the
unit separator (chr 31), bracketed by it on both ends, with chr 30 as
the end-of-word symbol. Merging pair (a, b) is a FOLD over the token
list (F.aggregate / DuckDB list_reduce), not a string replace: plain
replace() skips consecutive pair occurrences because adjacent matches
share their boundary separator ('abab' stays a|b after one pass, and
equal-pair runs like 'aaaa' merge at the wrong offsets), which is NOT
BPE's greedy rule. The fold carries the merged prefix as a string,
appends a one-char mark (chr 17) to a just-merged token so it can
never serve as the LEFT side of another merge in the same round
(classic greedy non-overlap), and strips the marks at the end. The
bracketing separators make token-boundary confusion impossible (the
ends_with probe always matches whole symbols). Precondition: corpus
text must not contain chr 17/30/31 (control chars; guaranteed for any
sane text corpus and asserted nowhere hot).

Scale shape (100 TB): the corpus is touched exactly once (word
histogram — one map-side-combined shuffle); every iteration runs over
the VOCAB-sized word-type table (pair count = one small shuffle,
best pair = a 1-row TakeOrdered — the same k-row driver model per
iteration as emb_kmeans' Lloyd loop), and the merge apply is a narrow
projection. localCheckpoint per iteration keeps lineage linear instead
of replaying i replaces at iteration i.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: joins symbols inside the tok string
EOW = "\x1e"  # end-of-word symbol (its own token, per classic BPE)
MARK = "\x11"  # transient just-merged flag inside one fold pass


def word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) word-type table — the only corpus-sized pass."""
    from extraction.textops import words

    return (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def initial_tok(word) -> "F.Column":
    """SEP-bracketed character tokenization plus the EOW symbol:
    'ab' -> SEP a SEP b SEP EOW SEP."""
    return F.concat(
        F.lit(SEP),
        F.regexp_replace(word, "(.)", "$1" + SEP),
        F.lit(EOW + SEP),
    )


def pair_counts(wf: DataFrame) -> DataFrame:
    """(t1, t2, cnt): adjacent-symbol pair frequencies over the word-
    type table, weighted by word freq. Splitting the SEP-bracketed tok
    yields ['', s1..sn, '']; pairs are (arr[i], arr[i+1]) for the inner
    span — built with two aligned slices, no posexplode double-scan."""
    arr = F.split(F.col("tok"), SEP)
    m = F.size(arr)
    pairs = F.arrays_zip(
        F.slice(arr, 2, m - 3).alias("t1"), F.slice(arr, 3, m - 3).alias("t2")
    )
    return (
        wf.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def merge_pair(tok_col, t1: str, t2: str):
    """Greedy left-to-right merge of the pair (t1, t2) inside the
    SEP-bracketed tok string — an aggregate fold over the token list.
    The accumulator is the rebuilt string; a just-merged token gets a
    trailing MARK so the greedy rule can't chain it as the LEFT side of
    a second merge in the same round (e.g. 'aaaa' with pair (a,a) must
    become aa|aa, and 'aaa' aa|a); marks strip at the end. t1/t2 arrive
    as plain Python strings (the per-round model artifact), so their
    lengths are compile-time literals."""
    toks = F.filter(F.split(tok_col, SEP), lambda x: x != "")
    folded = F.aggregate(
        toks,
        F.lit(SEP),
        lambda acc, x: F.when(
            F.endswith(acc, F.lit(SEP + t1 + SEP)) & (x == F.lit(t2)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(len(t1) + 1)),
                F.lit(t1 + t2 + MARK + SEP),
            ),
        ).otherwise(F.concat(acc, x, F.lit(SEP))),
    )
    return F.replace(folded, F.lit(MARK), F.lit(""))


def learn_bpe(docs: DataFrame, text_col: str, merges: int = 8) -> DataFrame:
    """Run ``merges`` BPE iterations; returns the merge sequence
    (merge_rank, left_sym, right_sym, pair_count) — model-sized, k
    rows. Stops early if no pair remains (degenerate corpus).

    Cost model (measured, BENCH/BPE.md): wall ≈ a + b·k with b ≈
    0.15 s/merge of fixed driver-round latency — a 32k-merge production
    vocab is ~1.4h of rounds regardless of corpus size, so at scale
    train on a bounded PPS sample (q_text_bpe_vocab_sampled) and apply
    corpus-wide via apply_bpe_token_counts."""
    spark = docs.sparkSession
    wf = word_freq(docs, text_col).select(
        "word", "freq", initial_tok(F.col("word")).alias("tok")
    ).localCheckpoint(eager=True)

    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, merges + 1):
        best = (
            pair_counts(wf)
            .orderBy(F.desc("cnt"), F.asc("t1"), F.asc("t2"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        t1, t2, cnt = best[0]["t1"], best[0]["t2"], best[0]["cnt"]
        out.append((rank, t1, t2, cnt))
        wf = wf.withColumn(
            "tok", merge_pair(F.col("tok"), t1, t2)
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out,
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )


def apply_bpe_token_counts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus with a LEARNED merge sequence and return the
    per-doc BPE token count — the companion of learn_bpe (a pipeline
    trains the vocab once, then every downstream packer/oov/length
    budget consumes counts under THAT tokenizer, not the whitespace
    proxy).

    The merge list is the model artifact (k pairs, driver-side
    literals). Work is word-TYPE factored, the same trick as training:
    the corpus is touched once (per-(doc, word) multiplicities — one
    map-side-combined shuffle); the k-fold merge chain runs over the
    DISTINCT-word table only; token counts join back on the word key
    (AQE sizes the join — the vocab side is model-ish but unbounded, so
    no forced broadcast). Token count = symbol count of the final
    tokenization INCLUDING the end-of-word symbol (merged or standalone
    — the sequence length a model consuming explicit EOW tokens sees).

    Returns (id_col, n_tokens_bpe), one row per doc that has >= 1 word.
    """
    from extraction.textops import words

    dw = (
        docs.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").cast("long").alias("m"))
    )
    tok = initial_tok(F.col("word"))
    for t1, t2 in merges:
        tok = merge_pair(tok, t1, t2)
    wtok = (
        dw.select("word")
        .distinct()
        .select(
            "word",
            F.size(F.filter(F.split(tok, SEP), lambda x: x != ""))
            .cast("long")
            .alias("nt"),
        )
    )
    return (
        dw.join(wtok, "word")
        .groupBy(id_col)
        .agg(F.sum(F.col("m") * F.col("nt")).cast("long").alias("n_tokens_bpe"))
    )
