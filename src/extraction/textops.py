"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting — all pure built-in ``pyspark.sql.functions``
expressions (JVM-side, whole-stage codegen; UDFs are the slow path).
Every function returns a Column and composes with any DataFrame.

Integer/rational arithmetic throughout so results are bit-stable and
reproducible against an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword tables (broadcast as literals inside the plan)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "es", "un", "una", "por", "con"),
}

# BPE-ish token pattern: letter runs | digit runs | single non-space symbol
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words(col: Column) -> Column:
    """Whitespace tokenization, empty strings removed."""
    return F.filter(F.split(col, "\\s+"), lambda w: w != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col)).cast("long")


def token_count_bpe(col: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0))).cast("long")


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of whitespace tokens that are stopwords of ``lang``."""
    sw = STOPWORDS[lang]
    return F.size(
        F.filter(words(F.lower(col)), lambda w: w.isin(*sw))
    ).cast("long")


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits.

    Deterministic tie-break by language order (en > de > fr > es);
    'und' (undetermined) when no stopword hits at all.
    """
    hits = [stopword_hits(col, lang) for lang in STOPWORDS]
    best = F.greatest(*hits)
    expr = F.lit("und")
    # build reverse so earlier languages win ties via later when() override
    for lang, h in reversed(list(zip(STOPWORDS, hits))):
        expr = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality-scoring features (all exact integers)."""
    return {
        "n_chars": F.length(col).cast("long"),
        "n_tokens": token_count_ws(col),
        "n_bpe_tokens": token_count_bpe(col),
        "n_stopwords": stopword_hits(col, "en"),
        "n_upper": F.length(col) - F.length(F.regexp_replace(col, "[A-Z]", "")),
        "n_punct": F.length(col) - F.length(F.regexp_replace(col, "[.,;:!?]", "")),
    }


def quality_score(col: Column) -> Column:
    """Integer quality score in [0,100]: rewards length, stopword density
    and punctuation presence; penalizes shouty text. Exact arithmetic."""
    f = quality_features(col)
    len_pts = F.least(f["n_chars"] / F.lit(5), F.lit(40.0))
    stop_pts = F.least(f["n_stopwords"] * F.lit(4), F.lit(30).cast("long")).cast("double")
    punct_pts = F.least(f["n_punct"] * F.lit(3), F.lit(15).cast("long")).cast("double")
    upper_pen = F.least(f["n_upper"], F.lit(15).cast("long")).cast("double")
    return F.floor(len_pts + stop_pts + punct_pts - upper_pen + F.lit(15.0)).cast("long")


def normalize_text(col: Column) -> Column:
    """Dedup normalization: lowercase, strip punctuation, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9\\s]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def fingerprint(col: Column) -> Column:
    """128-bit document fingerprint (hex) over normalized text."""
    return F.md5(normalize_text(col))


def fingerprint64(col: Column) -> Column:
    """Portable 60-bit integer fingerprint: first 15 hex digits of md5.

    Uses md5 (not xxhash64) so an independent ANSI-SQL engine reproduces
    identical values: conv(substr(md5(x),1,15),16,10).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def canonical_url(col: Column) -> Column:
    """URL canonicalization for URL-level dedup (the C4/CCNet crawl-dedup
    key): two raw URLs that differ only in scheme (http/https), host
    case, a leading ``www.``, tracking parameters (``utm_*``), a URL
    fragment, or a trailing slash canonicalize to the same string.
    Reference analog: the filename-keyed artifact identity that joins
    a document's stages (/root/reference/src/HelperMethods.py:142-157)
    — here the identity key is the normalized URL instead.

    Rules, in order (each a single JVM-side regexp pass — narrow, no
    Python, patterns restricted to the Java-regex ∩ RE2 dialect so the
    DuckDB oracle is bit-exact; NO lookarounds, RE2 lacks them):
      1. strip the fragment (``#...``);
      2. strip ``utm_*`` tracking params (value runs to ``&``/end);
      3. if a surviving param lost its leading ``?`` to rule 2 (it now
         follows the path with a bare ``&``), promote that ``&`` to
         ``?`` — anchored, so it fires at most once and never touches
         a legitimate ``&`` after a real ``?``;
      4. drop the scheme (http ≡ https) and a leading ``www.``;
      5. lowercase the HOST only (paths are case-sensitive);
      6. drop trailing ``/`` runs before end-of-string or ``?``.
    """
    u = F.regexp_replace(col, "#.*$", "")
    u = F.regexp_replace(u, "[?&]utm_[a-z]+=[^&#]*", "")
    u = F.regexp_replace(u, "^([^?]*)&", "$1?")
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    host = F.lower(F.regexp_extract(u, "^[^/?#]*", 0))
    u = F.concat(host, F.regexp_replace(u, "^[^/?#]*", ""))
    return F.regexp_replace(u, "/+(\\?|$)", "$1")


def word_shingles_seq(col: Column, k: int = 3) -> Column:
    """POSITIONAL k-word shingles of the normalized text, in document
    order with duplicates kept (array<string>) — the form winnowing and
    any other position-sensitive fingerprint needs. Texts with fewer
    than k words yield an empty array.

    Built by k−1 nested ``zip_with`` of the word array against its own
    shifted slices, then trimmed to n−k+1. This evaluates the word-array
    subexpression exactly k+1 times per ROW. (The naive form —
    ``element_at(ws, i+j)`` inside a ``transform`` lambda — re-evaluates
    the whole normalize+split pipeline per ELEMENT: interpreted
    higher-order functions do no subexpression caching; measured ~100×
    slower on ~60-word docs.)
    """
    ws = words(normalize_text(col))
    if k == 1:
        return ws

    # the normalize+split subtree is LET-BOUND via a single-element
    # transform (lambda variable = bound reference) so every evaluation
    # path — codegen'd aggregate, interpreted Generate, checkpoint row
    # conversion — splits the text exactly once per row instead of k+1
    # times (interpreted paths do no subexpression elimination; see
    # winnow_sketch for the measured version of this trap)
    def chain(w_: Column) -> Column:
        acc = w_
        for j in range(1, k):
            # zip_with pads the shorter (sliced) array with nulls;
            # concat_ws drops nulls, leaving partial shingles at the
            # tail — sliced off below, so only full k-word shingles
            # survive
            acc = F.zip_with(
                acc,
                F.slice(w_, j + 1, F.size(w_)),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.slice(
            acc, 1, F.greatest(F.size(w_) - F.lit(k - 1), F.lit(0))
        )

    return F.element_at(F.transform(F.array(ws), chain), 1)


def word_bigrams(col: Column) -> Column:
    """Positional word bigrams as 'w1 w2' strings (array<string>), in
    document order with duplicates kept — the LM / top-ngrams form.

    zip_with of the word array against its own tail; ws-split tokens
    contain no whitespace, so the single-space join is reversible. The
    split subtree is LET-BOUND via the single-element transform (the
    word_shingles_seq discipline) so interpreted evaluation paths —
    Generate/explode above all — split the text once per row, not once
    per slice reference.
    """
    ws = words(col)

    def bigrams_of(w_: Column) -> Column:
        n1 = F.greatest(F.size(w_) - 1, F.lit(0))
        return F.zip_with(
            F.slice(w_, 1, n1),
            F.slice(w_, 2, n1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

    return F.element_at(F.transform(F.array(ws), bigrams_of), 1)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>) —
    the set form every Jaccard-family operator consumes. See
    word_shingles_seq for the positional variant and the evaluation-cost
    note."""
    return F.array_distinct(word_shingles_seq(col, k))


def winnow_sketch(col: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing fingerprint sketch (Schleimer/Wilkerson/Aiken, the MOSS
    rolling-hash scheme) — sorted distinct selected hashes (array<long>).

    Positional k-word shingles are hashed (portable md5-prefix 32-bit,
    the same convention as the MinHash tier) and every window of ``w``
    consecutive hashes contributes its MINIMUM to the sketch. The
    scheme's guarantee: two documents sharing a contiguous run of at
    least w + k - 1 words select at least one common hash — so the
    sketch detects PARTIAL overlap (plagiarized passages, boilerplate
    blocks, quoted chunks), which whole-document fingerprints and
    set-Jaccard signatures both dilute away. Sketch density is ~2/(w+1)
    of the shingle count, the paper's expected rate.

    Docs with fewer than w full shingles (< w + k - 1 words) yield an
    empty sketch — below the guarantee's resolution, not representable.

    Scale shape: everything here is in-array inside one narrow
    projection; nothing shuffles until the caller keys on the selected
    hashes.
    """
    hs = F.transform(
        word_shingles_seq(col, k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )

    # sliding-window min as w-1 nested zip_with+least. Two evaluation
    # traps, both measured on the sf0.1 sketch query:
    # (1) the obvious form — transform(sequence(1, nwin),
    #     i -> array_min(slice(hs, i, w))) — embeds hs INSIDE the
    #     lambda; interpreted higher-order functions re-evaluate it per
    #     ELEMENT: every window position re-hashes every shingle,
    #     O(n^2) md5 per doc (70 s vs ~1 s).
    # (2) referencing hs once per zip_with LEVEL still duplicates the
    #     hash+shingle subtree ~2w times in the expression tree; codegen
    #     subexpression elimination dedupes that in aggregate projections
    #     but the INTERPRETED paths (Generate, checkpoint row conversion)
    #     expand every copy (18 s materialization vs 0.07 s aggregate).
    # The fix for both: LET-BIND hs via a single-element transform — the
    # lambda variable h is a bound reference, so the hash chain is
    # evaluated exactly once per row on every evaluation path.
    # zip_with pads the shorter side with nulls; least() skips nulls, so
    # tail entries are partial-window minima — sliced off, exactly the
    # full-window count n - w + 1 survives.
    def mins_of(h: Column) -> Column:
        acc = h
        for j in range(1, w):
            acc = F.zip_with(
                acc, F.slice(h, j + 1, F.size(h)), lambda a, b: F.least(a, b)
            )
        sel = F.slice(acc, 1, F.greatest(F.size(h) - F.lit(w - 1), F.lit(0)))
        return F.array_sort(F.array_distinct(sel))

    return F.element_at(F.transform(F.array(hs), mins_of), 1)


def simhash(col: Column, bits: int = 32, shingle_k: int | None = None) -> Column:
    """SimHash over whitespace words of normalized text — or, with
    ``shingle_k`` set, over distinct k-word shingles.

    Bit j of the result is 1 iff sum over distinct tokens of
    (±1 by token-hash bit j) is positive. The token hash is a portable
    md5-derived integer exactly as wide as ``bits`` (ceil(bits/4) hex
    digits), so every simhash bit draws on a real hash bit and the whole
    computation is reproducible in ANSI SQL. ``bits`` <= 60: 15 hex
    digits is the widest md5 prefix that always fits a signed int64 on
    both engines (the same constraint as fingerprint64; production would
    swap in full-width xxhash64). Built-ins only: explode-free aggregate
    over the token array.

    Token choice is a PRECISION lever at corpus scale: short docs over a
    shared vocabulary give heavily CORRELATED per-bit votes under
    unigrams (similar word sets → similar majorities), collapsing the
    effective key cardinality of any banded blocking built on top —
    measured 2.2% of ALL pairs at hamming <= 3/60 on the 5000-doc bench
    corpus (Θ(n²) in disguise). Hashing k-shingles instead draws votes
    from near-disjoint sets for unrelated docs (the same reason the
    MinHash tier shingles), restoring ~independent bits while true
    near-dups still vote together. ``shingle_k`` should match the
    verify stage's shingle width so the funnel reasons about one
    similarity space end to end.
    """
    if bits > 60:
        raise ValueError(f"bits={bits} > 60: md5-prefix word hash must fit int64")
    hex_digits = (bits + 3) // 4
    if shingle_k is not None:
        ws = word_shingles(col, shingle_k)  # already distinct
    else:
        ws = F.array_distinct(words(normalize_text(col)))
    hashes = F.transform(
        ws,
        lambda w: F.conv(F.substring(F.md5(w), 1, hex_digits), 16, 10).cast("long"),
    )

    # single fold carrying all ``bits`` vote counters at once: the word
    # hashing runs ONCE per row (a per-bit aggregate would rebuild the
    # md5 hash array per bit — no CSE across higher-order functions)
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(bits)])

    def fold(acc, h):
        votes = F.array(
            *[
                F.when(
                    F.shiftright(h, j).bitwiseAND(F.lit(1).cast("long")) == 1, F.lit(1)
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for j in range(bits)
            ]
        )
        return F.zip_with(acc, votes, lambda x, y: x + y)

    powers = F.array(*[F.lit(2 ** j).cast("long") for j in range(bits)])
    return F.aggregate(
        F.zip_with(
            F.aggregate(hashes, zeros, fold),
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# --- PII detection & redaction -------------------------------------------
#
# Training corpora must be scrubbed before use; at 100 TB the only viable
# shape is a narrow JVM-side projection (regexp_count/regexp_replace in
# whole-stage codegen — no Python, no shuffle, no second pass). Patterns
# deliberately use only syntax with identical semantics in Java regex
# (Spark) and RE2 (the DuckDB oracle): no anchors (RE2 re-anchoring
# gotcha), no backrefs, no lookaround.

PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document match counts for each PII class."""
    return {
        "n_emails": F.regexp_count(col, F.lit(PII_EMAIL_RE)),
        "n_ips": F.regexp_count(col, F.lit(PII_IPV4_RE)),
        "n_phones": F.regexp_count(col, F.lit(PII_PHONE_RE)),
    }


def redact_pii(col: Column) -> Column:
    """Replace PII spans with typed placeholder tokens.

    Email first: an email's local part can contain a phone-shaped digit
    run, and redaction order is part of the operator contract (the
    oracle applies the same chain in the same order).
    """
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return out


def distinctive_terms(
    df, text_col: str = "text", id_col: str = "doc_id", k: int = 3
):
    """Per-document top-k distinctive terms — an integer-exact TF-IDF.

    Ranks each document's terms by (tf DESC, df ASC, term ASC): highest
    in-document frequency first, corpus-rare terms breaking ties — the
    same ordering ln(N/df) weighting induces for fixed tf, with no
    floating-point log whose last bit differs across engines. The
    triple is a total order per document (terms are distinct within
    one), so top-k is deterministic and the DuckDB oracle hash-matches
    bit-exactly. Use: contamination screening and per-doc keyword
    profiling over a training corpus.

    Scale shape (the reason this isn't explode(words)): the per-word
    relational form re-keys the corpus by word — at 100 TB that is the
    whole corpus shuffled once per statistic. Here tf is computed
    INSIDE each document's word array (size(filter(ws, == term)))
    during the narrow generate stage, and only the per-doc DISTINCT
    term rows (id, term, tf) ever reach an exchange — the word-array
    payload is projected away before any shuffle. Three exchanges
    total: df agg on term, the df equi-join back, and the per-doc
    top-k window on id — each over the distinct-terms table, which is
    |docs| x avg-distinct-terms, not corpus mass.

    Returns (id_col, rk, term, tf, df) with rk in [1, k].
    """
    from pyspark.sql import Window

    ws = F.array_sort(words(normalize_text(F.col(text_col))))
    per_term = (
        df.select(F.col(id_col), ws.alias("ws"))
        .select(
            id_col,
            "ws",
            F.explode(F.array_distinct("ws")).alias("term"),
        )
        .select(
            id_col,
            "term",
            F.size(F.filter(F.col("ws"), lambda x: x == F.col("term")))
            .cast("long")
            .alias("tf"),
        )
    )
    dfreq = per_term.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    )
    return (
        per_term.join(dfreq, "term")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(id_col, "rk", "term", "tf", "df")
    )


def hll_register(col: Column, m: int = 64) -> tuple[Column, Column]:
    """(bucket, rho) for a HyperLogLog register update over a 60-bit
    md5-derived hash of ``col`` — the mergeable cardinality sketch a
    100 TB pipeline substitutes for exact count-distinct (the
    corpus_datacard's n_distinct at petabyte scale is a sketch merge,
    not a two-phase distinct shuffle; this op is that sketch's exact,
    oracle-checkable core).

    - bucket = h mod m (low bits pick the register, m a power of two)
    - rho = position of the lowest set bit of w = h div m, counted from
      1; the "geometric observable" whose per-bucket MAX estimates
      log2(n/m). w == 0 pins to the max position + 1 = (60 - shift) + 1
      (55 at the default m=64 — the value the SQL oracle mirrors).

    Everything is integer: the lowest-set-bit position is derived as
    bit_count(lowest_set_bit - 1) + 1 (bit_count of 2^p - 1 is p) —
    no float log2, no string round-trip. groupBy(lang,
    bucket).max(rho) is algebraic: it map-side combines, merges across
    partitions/days/shards by elementwise MAX, and never rescans — the
    whole point of the sketch (tests/test_hll_merge.py pins the merge
    law; the estimate itself is a float postprocess on m integers and
    stays OUT of the hash-gated output).
    """
    if m & (m - 1) or m <= 0:
        raise ValueError(f"m must be a power of two, got {m}")
    shift = m.bit_length() - 1
    h = fingerprint64(col)
    bucket = (h % F.lit(m)).cast("long")
    # h div m via shiftright: h is up to 2^60, and float division would
    # lose the LOW bits (53-bit mantissa) — exactly the bits rho reads
    w = F.shiftright(h, shift).cast("long")
    # lowest set bit of w: w & -w == w & (~w + 1); Spark lacks unary
    # bitwise minus on columns, so use (w - (w & (w-1))) — strips all
    # but the lowest set bit with +,-,& only (portable to ANSI SQL)
    low = w - w.bitwiseAND(w - F.lit(1))
    # w has 60 - shift bits; the all-zero suffix pins one past the
    # largest genuine rho (a constant 55 would collide at m < 64)
    max_rho = (60 - shift) + 1
    rho = F.when(w == 0, F.lit(max_rho).cast("long")).otherwise(
        (F.bit_count(low - F.lit(1)) + F.lit(1)).cast("long")
    )
    return bucket, rho


def zorder_interleave(a: Column, b: Column, bits: int = 7) -> Column:
    """Z-order (Morton) key over two small-domain non-negative ints:
    bit i of ``a`` lands at z-bit 2i, bit i of ``b`` at 2i+1. The
    multi-column clustering key a lakehouse write layout sorts/ranges
    on so that BOTH ``WHERE a BETWEEN ..`` and ``WHERE b BETWEEN ..``
    predicates prune files — a total order on one column clusters one
    dimension and scatters the other, while an aligned z-range of
    2^(2k) cells is exactly a 2^k x 2^k rectangle in (a, b) space.

    Pure shift/and/add arithmetic on both engines (no float, no UDF);
    callers clamp inputs to [0, 2^bits). ~2*bits terms in the plan —
    fine for the <=16-bit keys data-skipping layouts use.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z.cast("long")


def sig_bucket_lo(col: Column, sig_bits: int = 4) -> Column:
    """Round a non-negative int64 down to ``sig_bits`` significant
    bits — the bucket key of the HDR-histogram quantile sketch
    (quantile_sketch_hist below). lo(v) = (v >> s) << s with
    s = max(0, bitlen(v) - sig_bits), so lo <= v < lo + 2^s and the
    relative bucket width is bounded: (v - lo)/v < 2^-(sig_bits-1).

    bitlen via the classic smear (s |= s>>1 … s>>32, then bit_count) —
    pure shift/or/bit_count integer ops that both Spark and DuckDB
    evaluate identically; no float log2 (whose boundary rounding could
    disagree across engines at exact powers of two). Total distinct
    buckets over the full int64 domain: <= 64·2^(sig_bits-1) + 2^sig_bits
    (~520 at sig_bits=4) — the sketch state is MODEL-sized by
    construction, which is the whole point.
    """
    v = col.cast("long")
    s = v
    for sh in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftright(s, sh))
    bitlen = F.bit_count(s)  # = floor(log2(v)) + 1 for v >= 1; 0 at v=0
    shift = F.greatest(F.lit(0), (bitlen - F.lit(sig_bits)).cast("int"))
    # F.shiftright/shiftleft only take literal ints; the SQL functions
    # accept a column shift amount
    return F.call_function(
        "shiftleft", F.call_function("shiftright", v, shift), shift
    ).cast("long")


def quantile_sketch_hist(
    df, val_col: str, group_col: str, sig_bits: int = 4
):
    """Mergeable quantile-sketch state: per-(group, bucket-lo) counts
    over sig_bucket_lo. This is the production substitute for
    text_length_quantiles' exact per-group sort at corpus scale: the
    state is an algebraic agg (map-side combines; shards/days merge by
    per-key count ADDITION — the merge law tests/test_quantile_sketch.py
    pins, mirroring test_hll_merge.py), its size is bounded at ~520
    buckets per group regardless of corpus size, and no corpus-sized
    sort or per-group single-task window ever runs.
    """
    return (
        df.select(
            F.col(group_col).alias("grp"),
            sig_bucket_lo(F.col(val_col), sig_bits).alias("lo"),
        )
        .groupBy("grp", "lo")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_sketch_estimate(hist, pcts: list[int]):
    """Quantile estimates from the sketch state: for each pct, the lo
    of the bucket containing rank floor(pct·(n−1)/100)+1 (same type-1
    rank rule as the exact form). The exact quantile value lies inside
    that bucket, so est <= exact < est·(1 + 2^-(sig_bits-1)) — the
    pinned error bound. Window runs over the ~520-bucket state, not the
    corpus. Returns (grp, pct, est).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    counts = hist.groupBy("grp").agg(F.sum("cnt").alias("n"))
    # exploded array literal, not createDataFrame: the latter plants an
    # applySchemaToPythonRDD scan in the plan (a Python node the plan
    # audit would flag), this stays wholly JVM-side
    pdf = hist.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(p)).cast("long") for p in pcts])).alias(
            "pct"
        )
    )
    targets = counts.crossJoin(F.broadcast(pdf)).select(
        "grp",
        "pct",
        (F.floor(F.col("pct") * (F.col("n") - 1) / 100) + 1)
        .cast("long")
        .alias("target"),
    )
    return (
        cum.join(
            targets.withColumnRenamed("grp", "tgrp"),
            (F.col("grp") == F.col("tgrp"))
            & (F.col("cum_before") < F.col("target"))
            & (F.col("target") <= F.col("cum")),
        )
        .select("grp", "pct", F.col("lo").alias("est"))
    )


def cms_cells(col: Column, d: int = 4, w: int = 64) -> Column:
    """Count-Min Sketch cell coordinates for one item: an array of d
    structs (row, bucket) with bucket = 60-bit md5 fingerprint of the
    row-salted item, mod w. The frequency member of the classic
    mergeable-sketch triad (HLL = distinct, HDR histogram = quantiles,
    CMS = frequency): the d x w counter matrix is an algebraic agg —
    map-side combines to <= d·w rows per task, shards/days merge by
    elementwise ADDITION, and the point estimate min_i cell[i][h_i(x)]
    over-counts only (est >= true always, est <= true + eps·N w.h.p.
    with eps = e/w). Deterministic md5 row salts, so both engines and
    any partitioning produce the identical matrix.
    """
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row"),
                (fingerprint64(F.concat(F.lit(f"cms{i}:"), col)) % F.lit(w))
                .cast("long")
                .alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cms_sketch(df, item_col: str, d: int = 4, w: int = 64):
    """(row, bucket, cnt) CMS counter matrix over an item column —
    <= d·w rows total regardless of corpus size; the only shuffle is a
    d·w-key agg that collapses map-side. Merge law and the one-sided
    overcount guarantee are pinned by tests/test_cms_sketch.py."""
    return (
        df.select(F.explode(cms_cells(F.col(item_col), d, w)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
