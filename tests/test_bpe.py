"""bpe.learn_bpe contract: the DataFrame BPE loop must reproduce a
pure-Python reference implementation of classic word-frequency BPE
(Sennrich et al. 2016) — same char+EOW start, pair counts weighted by
word-type frequency, (count desc, pair asc) tie-break, and greedy
non-overlapping left-to-right merge."""

from collections import Counter

from extraction.bpe import EOW, learn_bpe


def _python_bpe(texts, merges):
    wf = Counter(w for t in texts for w in t.split() if w)
    toks = {w: tuple(list(w) + [EOW]) for w in wf}
    out = []
    for rank in range(1, merges + 1):
        pc = Counter()
        for w, syms in toks.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        # max count; ties -> lexicographically smallest (t1, t2)
        (t1, t2), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, t1, t2, cnt))
        merged = {}
        for w, syms in toks.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == t1 and syms[i + 1] == t2:
                    res.append(t1 + t2)
                    i += 2  # greedy non-overlapping left-to-right
                else:
                    res.append(syms[i])
                    i += 1
            merged[w] = tuple(res)
        toks = merged
    return out


def _spark_bpe(spark, texts, merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in learn_bpe(df, "text", merges=merges)
        .orderBy("merge_rank")
        .collect()
    ]


def test_bpe_matches_python_reference(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest new",
        "low new",
    ]
    assert _spark_bpe(spark, texts, 6) == _python_bpe(texts, 6)


def test_bpe_overlapping_run_is_greedy(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right tokenizes to aa|aa,
    # so round 2 sees pairs {(aa,aa):3, (aa,EOW):3} and the tie-break
    # picks (aa, EOW) (0x1e sorts before 'aa'). A string-replace merge
    # (the shared-separator bug this fold replaced) would tokenize to
    # aa|a|a and pick (a, EOW) instead — this pins the greedy rule.
    texts = ["aaaa aaaa aaaa b"]
    got = _spark_bpe(spark, texts, 2)
    want = _python_bpe(texts, 2)
    assert got == want
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", EOW, 3)


def test_bpe_exhausts_pairs_early(spark):
    # single 1-char word: only pair is (c, EOW); after merging it no
    # pairs remain, so the sequence stops at 1 despite merges=5
    got = _spark_bpe(spark, ["c c c"], 5)
    assert got == [(1, "c", EOW, 3)]


def _python_apply_counts(texts, merges):
    # tokenize each word with the merge sequence (greedy per merge, in
    # rank order), count symbols incl. EOW, weighted by occurrences
    def tokenize(word):
        syms = list(word) + [EOW]
        for _, t1, t2, _ in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == t1 and syms[i + 1] == t2:
                    res.append(t1 + t2)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    out = {}
    for doc_id, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        if ws:
            out[doc_id] = sum(tokenize(w) for w in ws)
    return out


def test_bpe_apply_matches_python_reference(spark):
    from extraction.bpe import apply_bpe_token_counts, learn_bpe

    texts = [
        "low low low lower lowest",
        "new newer newest new",
        "low new aaaa",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_rows = learn_bpe(df, "text", merges=6).orderBy("merge_rank").collect()
    merges = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count) for r in merges_rows]
    got = {
        r.doc_id: r.n_tokens_bpe
        for r in apply_bpe_token_counts(
            df, "text", "doc_id", [(t1, t2) for _, t1, t2, _ in merges]
        ).collect()
    }
    assert got == _python_apply_counts(texts, merges)
    # the empty doc has no words and no row; merged docs shrink below
    # their char+EOW count
    assert 3 not in got
    raw = sum(len(w) + 1 for w in texts[0].split())
    assert got[0] < raw


def test_fertility_penalizes_underrepresented_language(spark, tmp_path):
    # vocab trained on a corpus dominated by repeated English-ish words
    # must tokenize the dominant language more efficiently (lower
    # fertility) than the underrepresented one whose words never merge
    import __spark_entry__ as entry

    rows = (
        [(i, "lower lowest lower lowest lower", "en") for i in range(20)]
        + [(100 + i, "zvqx wkjp zvqx bhfd", "xx") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["lang"]: r["fertility_milli"]
        for r in entry.q_text_bpe_fertility(spark, str(tmp_path)).collect()
    }
    assert out["en"] < out["xx"], out
