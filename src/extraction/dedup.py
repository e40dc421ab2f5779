"""Deduplication operators for web-scale training-data pipelines.

All variants are pure DataFrame compositions (shuffle-aware, no UDFs):

- exact:        hash-groupBy on a normalized fingerprint. One shuffle on
                the fingerprint; partial aggregation is map-side.
- minhash_lsh:  shingle → portable md5-derived minhash signature → band →
                bucket self-join. The self-join key is (band_id, band_sig)
                so candidate generation shuffles only the tiny signature
                table, never the corpus text. At 100 TB this is THE
                near-dup strategy: O(n·perms) + bucket-local pairs.
- ngram_jaccard: exact Jaccard via shingle explode + equi-join on shingle
                (for verification of LSH candidates or small corpora).
- simhash:      64/32-bit simhash + banded grouping for hamming-near pairs.
- embedding:    cosine near-dup over a vector column (built-in
                aggregate/zip_with arithmetic — JVM-side).

Portability: every hash is md5-derived (fingerprint64) so an independent
ANSI-SQL engine reproduces bit-identical signatures (oracle checking).
In production xxhash64 is a drop-in ~3× faster swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import (
    fingerprint,
    normalize_text,
    simhash,
    word_shingles,
    word_shingles_seq,
    words,
)

# MinHash parameters: h_i(x) = (A_i * (x mod P) + B_i) mod P (universal
# hashing). 31-bit Mersenne prime keeps every intermediate < 2^62 — plain
# int64 arithmetic, bit-identical in any ANSI-SQL engine (no decimal path).
MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime
MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 bands × 4 rows: catches jaccard ≳ 0.5 pairs w.h.p.


def _perm_coeffs(perms: int = MINHASH_PERMS) -> list[tuple[int, int]]:
    """Deterministic (A, B) pairs derived from a fixed seed via splitmix."""
    from .corpus import _splitmix64

    out = []
    for i in range(perms):
        a = _splitmix64(0xA5EED + 2 * i) % (MINHASH_PRIME - 1) + 1
        b = _splitmix64(0xB5EED + 2 * i + 1) % MINHASH_PRIME
        out.append((a, b))
    return out


def shingle_hash(shingle: Column) -> Column:
    """Portable 32-bit shingle hash: first 8 hex digits of md5."""
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")


def minhash_signature(text: Column, k: int = 3, perms: int = MINHASH_PERMS) -> Column:
    """Array of ``perms`` minhash values over k-word shingles.

    NULL-free: empty shingle sets get MINHASH_PRIME sentinels. With A,B,
    (h mod P) all < 2^31, every product stays < 2^62 — exact int64.

    Single-pass: one ``aggregate`` fold carries all ``perms`` running
    minima at once, so shingling + md5 run ONCE per row. (The naive
    per-permutation ``array_min(transform(hashes, ...))`` form rebuilds
    the shingle/md5 array per permutation — Spark does no CSE across
    higher-order functions; measured 16× slower.)
    """
    hashes = F.transform(word_shingles(text, k), shingle_hash)
    coeffs = _perm_coeffs(perms)
    sentinel = F.array(*[F.lit(MINHASH_PRIME).cast("long") for _ in coeffs])

    def fold(acc, h):
        hp = h % F.lit(MINHASH_PRIME)
        permed = F.array(
            *[(F.lit(a) * hp + F.lit(b)) % F.lit(MINHASH_PRIME) for a, b in coeffs]
        )
        return F.zip_with(acc, permed, lambda x, y: F.least(x, y))

    return F.aggregate(hashes, sentinel, fold)


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact (normalized) duplicates: one row per group with >1 doc.

    Returns (fp, dup_count, keep_id) — keep_id = min id, the survivor.
    """
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("dup_count"), F.min("id").alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def _lsh_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """(id, band, bsig) banded-signature table — the join key of every
    MinHash-LSH tier (self-join for in-corpus dedup, two-table join for
    incremental ingest). Carries the two load-bearing disciplines
    documented on minhash_lsh_candidates: the degenerate-doc guard
    BEFORE the signature projection, and signature materialization
    (localCheckpoint) so join planning can't re-run the text pass."""
    rows = perms // bands
    sig = df.filter(
        F.size(words(normalize_text(F.col(text_col)))) >= F.lit(k)
    ).select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), k, perms).alias("sig"),
    ).localCheckpoint(eager=False)
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice("sig", b * rows + 1, rows).cast("array<long>").alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", F.col("bs.bsig").cast("string").alias("bsig"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    Plan shape: signature projection (narrow) → explode bands (×bands) →
    shuffle on (band, signature-slice) → in-bucket pairs. The corpus text
    never shuffles.

    Degenerate docs (< k words → empty shingle set) are EXCLUDED before
    banding: they all share the identical sentinel signature
    [MINHASH_PRIME × perms], so at 100 TB the millions of empty/short
    docs would land in one bucket per band and the in-bucket self-join is
    quadratic in bucket size — a legitimate equi-key no AQE skew-split
    fixes. Excluding them is exact: an empty shingle set has Jaccard 0
    (or 0/0) against everything, so it can never be a near-duplicate.

    The guard filters on the word count BEFORE the signature projection.
    (Filtering on sig[1] != PRIME after it reads nicer, but Catalyst
    pushes the filter below the projection by substituting the alias —
    the whole minhash fold then runs TWICE per row; measured +60% on the
    signature stage. The word-count predicate costs one normalize+split.)

    The signature table is MATERIALIZED (localCheckpoint) before banding:
    the in-bucket self-join references it on both sides, and with a
    small/broadcastable side Spark plans a broadcast join — no shuffle
    exchange exists to reuse, so each side would re-run the whole
    normalize→shingle→fold subtree over the corpus text (measured ~2x
    the tier wall). The signature table is perms longs per doc — the
    thing a 100 TB funnel writes to a table between stages anyway;
    localCheckpoint is the single-session analog (batch-only operator;
    non-replicated blocks trade lineage-recovery for never recomputing
    the text pass — exactly the table-materialization trade).
    """
    banded = _lsh_banded(df, text_col, id_col, k, perms, bands)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bsig") == F.col("r.bsig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    shingle_k: int | None = None,
) -> DataFrame:
    """Hamming-near pairs (id_a < id_b) via banded SimHash blocking —
    the cheap near-dup tier of a training-data pipeline (hash-space
    analog of the reference's pairwise-similarity family,
    /root/reference/src/Postprocessing.py:15-17).

    Plan shape mirrors minhash_lsh_candidates: narrow simhash projection
    → explode ``bands`` (band, chunk) rows → equi self-join on
    (band, chunk) → exact Hamming verification via
    ``bit_count(sh_a XOR sh_b)``. Only the (id, hash) table shuffles,
    never the corpus text.

    Pigeonhole exactness: hashes with hamming ≤ ``bands − 1`` MUST agree
    on at least one of the ``bands`` contiguous chunks, so for
    ``max_hamming < bands`` blocking loses no pair — recall 1.0 by
    construction, not probabilistic.

    Band-key cardinality bounds the corpus this tier can block: each
    band has 2^(bits/bands) distinct keys, so UNRELATED docs collide in
    a band at ~2^-chunk_bits and candidate generation carries an
    intrinsic Θ(n²/2^chunk_bits) term. The 60/4 default (15-bit chunks,
    32768 keys/band) is the widest portable-md5-int64 configuration —
    fine to ~10^7 docs; beyond that raise ``bits`` via a wider hash
    (production: full xxhash64 → 16-bit chunks, or a 128-bit simhash in
    two columns) or rely on the MinHash tier, whose band key is a
    4-minhash tuple with effectively unbounded cardinality. The old
    32/4 configuration (8-bit chunks, 256 keys/band — quadratic from
    ~10^4 docs) is exactly the hazard this docstring exists to flag.

    Same sentinel guard as MinHash-LSH: docs with zero tokens after
    normalization (simhash 0) are excluded — at corpus scale they would
    all collide in every band and the in-bucket join is quadratic.

    ``shingle_k``: hash k-word shingles instead of unigrams (see
    textops.simhash) — the unigram form's per-bit votes CORRELATE on
    short same-vocabulary docs, silently collapsing band-key cardinality
    back into the quadratic regime the chunk-width bound above guards
    against. Pass the verify stage's shingle width (the tiered funnel
    does) for a blocking tier that is both selective and semantically
    aligned with its verifier.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(pigeonhole recall guarantee); got bands={bands}"
        )
    if bits % bands != 0:
        raise ValueError(
            f"bits={bits} must divide evenly into bands={bands} chunks "
            "(unequal chunks break the pigeonhole recall guarantee)"
        )
    chunk_bits = bits // bands
    mask = (1 << chunk_bits) - 1
    # token-count guard BEFORE the projection (same pushdown-duplication
    # trap as in minhash_lsh_candidates — see that docstring). The
    # shingle set is nonempty iff the doc has >= k words (n words yield
    # n-k+1 shingles), so the guard needs only the CHEAP word count —
    # evaluating word_shingles here would pay its k+1 split
    # re-evaluations a second time per join side (measured 6.6 s ->
    # 3.3 s on the sf0.1 tier)
    min_words = shingle_k if shingle_k is not None else 1
    nonempty = F.size(words(normalize_text(F.col(text_col)))) >= min_words
    # materialized before banding for the same reason as the minhash
    # tier: the band self-join references both sides, and a broadcast
    # plan re-runs the text→simhash subtree per side (see
    # minhash_lsh_candidates' docstring; (id, sh) is 16 bytes/doc —
    # the table a production funnel persists between stages)
    base = df.filter(nonempty).select(
        F.col(id_col).alias("id"),
        simhash(F.col(text_col), bits, shingle_k=shingle_k).alias("sh"),
    ).localCheckpoint(eager=False)
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "sh", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via shingle equi-join.

    jaccard = |∩| / (|A|+|B|−|∩|); the threshold test is done in exact
    integer arithmetic (inter*den ≥ (sa+sb−inter)*num).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    )
    sizes = sh.select("id", F.size("shingles").alias("nsh"))
    ex = sh.select("id", F.explode("shingles").alias("shingle"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("nsh", "nsh_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("nsh", "nsh_b"), "id_b")
        .filter(
            F.col("inter") * threshold_den
            >= (F.col("nsh_a") + F.col("nsh_b") - F.col("inter")) * threshold_num
        )
        .select("id_a", "id_b", "inter", "nsh_a", "nsh_b")
    )


def decontaminate_hits(
    df: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per-training-doc count of distinct
    k-word shingles that appear ANYWHERE in an eval/benchmark set — the
    filter a pretraining pipeline runs so the model is not graded on
    memorized eval data (the GPT-3 appendix-C / PaLM n-gram-overlap
    scheme; production uses 8–13-word n-grams, k=3 at test scale).

    Returns (doc_id, n_hits) for contaminated docs only (n_hits ≥ 1);
    the caller drops or audits them.

    Scale shape: a benchmark suite is MBs against a 100 TB corpus, so
    its distinct shingle set BROADCASTS and the corpus side stays
    narrow — normalize → shingle → explode → broadcast LEFT SEMI join.
    Only the (doc_id, shingle-hit) rows — a permille-scale stream —
    reach the per-doc count's exchange, with map-side partial agg; the
    corpus text itself never shuffles. When the benchmark outgrows a
    comfortable broadcast, the production variant swaps the exact set
    for a Bloom filter of benchmark shingles (bloom_filter_agg /
    might_contain): same plan shape, constant executor memory, a
    tunable false-positive rate instead of an OOM.
    """
    bsh = (
        bench.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), k).alias("shingles"),
        )
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    tsh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).select("doc_id", F.explode("shingles").alias("shingle"))
    # word_shingles is distinct-within-doc, so count(*) after the semi
    # join == number of distinct contaminated shingles per doc
    return (
        tsh.join(F.broadcast(bsh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def bloom_decontaminate_stats(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    kh: int = 3,
    bits_per_item: int = 16,
    witness: bool = True,
) -> DataFrame:
    """The production form decontaminate_hits' docstring promises: probe
    a BLOOM FILTER of benchmark shingles instead of the exact distinct
    set. At 100 TB the eval suite's shingle set can outgrow a
    comfortable broadcast (tens of GB of strings); the bloom bitset is
    m = 16 bits/item regardless of shingle length — constant executor
    memory with a tunable false-positive rate, and the filter itself is
    MERGEABLE (bitwise OR) across eval-suite shards, like the HLL
    registers.

    Fully deterministic and oracle-mirrorable: kh=3 bit positions per
    shingle come from disjoint 40-bit md5 slices mod m_bits; m_bits is
    the next power of two >= bits_per_item * n_distinct_shingles
    (derived from one driver-side count, like the k-means fit_mod — so
    the FP rate stays ~0.5% at every sf instead of saturating as the
    eval set grows). The filter is packed 63 bits/limb into a
    word_idx -> int64 map (63, not 64 — see the limb comment below), built by ONE groupBy(word_idx).bit_or(mask)
    over kh*n tiny rows, packed to a single map row, and broadcast via
    crossJoin (the ivf_join_topk model-artifact idiom). The corpus-side
    probe is narrow: shingle -> 3 slices -> 3 map lookups -> bit tests;
    corpus text never shuffles; only (doc_id, hits) rows reach the agg.

    With ``witness=True`` (the oracle/test form) the exact semi-join is
    computed ALONGSIDE from the SAME materialized shingle table — the
    corpus text is tokenized exactly once and localCheckpointed (the
    _lsh_banded signature-table discipline), so the witness costs one
    extra pass over the cached exploded shingles, never a second text
    pass. Production (``witness=False``) skips the exact join entirely
    — that is the whole point of the bloom — and returns per-doc
    (doc_id, bloom_hits) flags instead of the stats row.

    Returns (witness=True) ONE stats row that carries its own
    verification against the exact semi-join:
      n_probed_docs (train docs with >= 1 shingle), docs_bloom_flagged, docs_exact_flagged,
      fp_docs (bloom-only — the measured false-positive cost),
      fn_docs (exact-only — MUST be 0: a bloom filter has no false
      negatives, so a nonzero value is a correctness bug, and the
      value-hash gate pins it),
      bloom_shingle_hits, exact_shingle_hits.
    """
    # materialized: consumed up to three times (count, filter build,
    # exact witness join) — without the checkpoint each consumer re-runs
    # the bench text pass (the _lsh_banded discipline; eager so the
    # count below rides the same materialization)
    bsh = (
        bench.select(word_shingles(F.col(text_col), k).alias("shingles"))
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = bsh.count()
    m_bits = 1 << max(6, (bits_per_item * max(n, 1) - 1).bit_length())

    def positions(scol):
        # kh disjoint 40-bit md5 slices mod m_bits — cheap, portable,
        # independent enough for a bloom (md5 bits are uniform). 40 bits
        # address filters to 2^40 bits (128 GiB) — past any practical
        # broadcast (a few GB, ~2^35 bits), so the slice width is never
        # the binding constraint; beyond broadcast size the filter
        # partitions and this op no longer applies as-is
        return [
            F.conv(F.substring(F.md5(scol), 1 + 10 * j, 10), 16, 10).cast("long")
            % F.lit(m_bits)
            for j in range(kh)
        ]

    # 63-bit limbs (pos div 63 / pos mod 63), NOT 64: a shift of 63
    # would set the int64 sign bit, which ANSI engines reject as left-
    # shift overflow — 62 is the highest portable shift, and one spare
    # bit per word costs ~1.6% space
    ent = bsh.select(
        F.explode(F.array(*positions(F.col("shingle")))).alias("pos")
    )
    words = (
        ent.select(
            F.expr("pos div 63").alias("wi"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias(
                "mask"
            ),
        )
        .groupBy("wi")
        .agg(F.bit_or("mask").alias("w"))
    )
    packed = words.agg(
        F.map_from_entries(F.collect_list(F.struct("wi", "w"))).alias("__bloom")
    )

    tsh = train.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).select("doc_id", F.explode("shingles").alias("shingle"))
    if witness:
        # both the bloom probe and the exact witness consume the
        # exploded corpus shingles: materialize ONCE so the corpus text
        # is tokenized once, not twice (the r2 tiered-funnel lesson)
        tsh = tsh.localCheckpoint(eager=False)
    pr = tsh.crossJoin(F.broadcast(packed))
    for j, p in enumerate(positions(F.col("shingle"))):
        pr = pr.withColumn(f"p{j}", p)
    hit = F.lit(True)
    for j in range(kh):
        word = F.coalesce(
            F.element_at(F.col("__bloom"), F.expr(f"p{j} div 63")),
            F.lit(0).cast("long"),
        )
        bit = F.expr(f"shiftleft(cast(1 as bigint), cast(p{j} % 63 as int))")
        hit = hit & (word.bitwiseAND(bit) != 0)
    per_doc_bloom = (
        pr.select("doc_id", hit.cast("long").alias("h"))
        .groupBy("doc_id")
        .agg(F.sum("h").alias("bloom_hits"))
    )
    if not witness:
        return per_doc_bloom
    # exact witness from the SAME cached shingle tables (not a fresh
    # decontaminate_hits call, which would re-tokenize both sides)
    per_doc_exact = (
        tsh.join(F.broadcast(bsh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("exact_hits"))
    )
    both = per_doc_bloom.join(per_doc_exact, "doc_id", "full_outer")
    return both.agg(
        F.count("*").cast("long").alias("n_probed_docs"),
        F.sum((F.coalesce(F.col("bloom_hits"), F.lit(0)) > 0).cast("long"))
        .cast("long")
        .alias("docs_bloom_flagged"),
        F.sum((F.coalesce(F.col("exact_hits"), F.lit(0)) > 0).cast("long"))
        .cast("long")
        .alias("docs_exact_flagged"),
        F.sum(
            (
                (F.coalesce(F.col("bloom_hits"), F.lit(0)) > 0)
                & (F.coalesce(F.col("exact_hits"), F.lit(0)) == 0)
            ).cast("long")
        )
        .cast("long")
        .alias("fp_docs"),
        F.sum(
            (
                (F.coalesce(F.col("exact_hits"), F.lit(0)) > 0)
                & (F.coalesce(F.col("bloom_hits"), F.lit(0)) == 0)
            ).cast("long")
        )
        .cast("long")
        .alias("fn_docs"),
        F.sum(F.coalesce(F.col("bloom_hits"), F.lit(0)))
        .cast("long")
        .alias("bloom_shingle_hits"),
        F.sum(F.coalesce(F.col("exact_hits"), F.lit(0)))
        .cast("long")
        .alias("exact_shingle_hits"),
    )


def verify_candidates(
    df: DataFrame,
    cands: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact-Jaccard scoring of candidate pairs — the shared verify stage
    of EVERY near-dup funnel (single-tier LSH or the tiered
    simhash ∪ minhash union). Returns (id_a, id_b, <any extra cands
    columns>, inter, nsh_a, nsh_b); the caller applies its threshold.
    Extra candidate columns (tier-provenance flags, blocking keys) ride
    through the verify join untouched, so funnel accounting needs no
    second pass over the tiers.

    Shingles are computed ONLY for docs that appear in some candidate
    pair: the distinct candidate-id set broadcasts as a semi-join filter
    against the corpus, so the (expensive) normalize+shingle expression
    runs over the tiny candidate population instead of the full corpus —
    at 100 TB that is the difference between re-tokenizing everything
    twice and touching a few permille.

    Only the NARROW tables are force-broadcast (the id set and the
    (id_a, id_b) pair table). The shingle-carrying join sides are left
    to AQE: if near-dup density is high, a forced broadcast of a
    shingle-bearing side fails hard (driver memory / 8 GB broadcast cap)
    instead of degrading to a shuffle join — AQE picks broadcast when the
    pruned side is actually small and falls back gracefully when not.
    """
    # explode(array(..)) instead of union-of-projections: a union would
    # embed TWO copies of the candidate subtree in the plan (three with
    # the verify join below); with explode the tree references cands
    # exactly twice and AQE's exchange-reuse dedupes the band-join
    # shuffles at runtime (asserted by tools/explain_plans.py).
    # the semi-join key is renamed to a name that cannot collide with a
    # user id_col (id_col == "id" would make F.col(id_col) == F.col("id")
    # ambiguous at analysis time)
    need = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias("__need_id"))
        .distinct()
    )
    sh = df.join(
        F.broadcast(need), F.col(id_col) == F.col("__need_id"), "left_semi"
    ).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    extra = [c for c in cands.columns if c not in ("id_a", "id_b")]
    return (
        F.broadcast(cands)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            *extra,
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("inter"),
            F.size("sh_a").cast("long").alias("nsh_a"),
            F.size("sh_b").cast("long").alias("nsh_b"),
        )
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Near-dup pairs, the 100 TB shape: LSH candidates → exact Jaccard
    verification of candidates ONLY (all-pairs verification is O(n²)).
    Candidate generation shuffles only signatures; verification routes
    through the shared semi-join-pruned ``verify_candidates``."""
    cands = minhash_lsh_candidates(df, text_col, id_col, k, perms, bands)
    scored = verify_candidates(df, cands, text_col, id_col, k)
    return scored.filter(
        F.col("inter") * threshold_den
        >= (F.col("nsh_a") + F.col("nsh_b") - F.col("inter")) * threshold_num
    )


def incremental_neardup_matches(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Incremental-ingest dedup: incoming docs that near-dup ANY doc in
    the existing corpus — the production crawl-ingest shape. Self-dedup
    reruns over the whole corpus; ingest must answer "is this NEW batch
    redundant against what we already hold" without re-pairing the
    existing corpus with itself.

    Returns (id, first_match, n_matches) per matched incoming doc:
    the lowest matching existing id and how many existing docs clear
    the Jaccard threshold. Ids of the two sides must be disjoint.

    Scale shape: both sides band through the shared ``_lsh_banded``
    signature table, and the candidate join is NEW × EXISTING (never
    EXISTING × EXISTING — the n²-shaped work the incremental form
    exists to avoid; a daily batch is permille of the corpus, so the
    band shuffle is dominated by the existing side's signatures, which
    a production pipeline keeps materialized between ingests — the
    localCheckpoint in _lsh_banded is the single-session analog).
    Verification reuses the semi-join-pruned ``verify_candidates`` over
    the two-sided union, so shingles are recomputed only for docs that
    appear in some candidate pair."""
    nb = _lsh_banded(incoming, text_col, id_col, k, perms, bands)
    eb = _lsh_banded(existing, text_col, id_col, k, perms, bands)
    cands = (
        nb.alias("n")
        .join(
            eb.alias("e"),
            (F.col("n.band") == F.col("e.band"))
            & (F.col("n.bsig") == F.col("e.bsig")),
        )
        .select(F.col("n.id").alias("id_a"), F.col("e.id").alias("id_b"))
        .distinct()
    )
    both = existing.select(F.col(id_col), F.col(text_col)).unionByName(
        incoming.select(F.col(id_col), F.col(text_col))
    )
    scored = verify_candidates(both, cands, text_col, id_col, k)
    return (
        scored.filter(
            F.col("inter") * threshold_den
            >= (F.col("nsh_a") + F.col("nsh_b") - F.col("inter")) * threshold_num
        )
        .groupBy(F.col("id_a").alias("id"))
        .agg(
            F.min("id_b").alias("first_match"),
            F.count("*").alias("n_matches"),
        )
    )


def neardup_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over a near-dup pair table — the step that
    turns pairwise matches into the dedup DECISION: every doc in a
    component keeps/drops against the component's canonical survivor
    (min id, which IS the component label).

    Input: (id_a, id_b) long columns. Output: (id, component) for every
    id that appears in some pair; component = min id reachable through
    the pair graph.

    Algorithm: iterative min-label propagation — each round every vertex
    takes the min of its own label and its neighbors' labels; converges
    in O(graph diameter) rounds (transitive near-dup chains are short in
    practice; web-dedup components are star-ish around a canonical page).
    Each round is ONE shuffle of the edge table joined to the current
    labels — the classic Spark CC shape (large-star/small-star degenerates
    to this for min-propagation). The driver-side loop control reads one
    scalar per round (the label-sum, strictly decreasing until fixpoint)
    — iteration control, not a data path.

    Scale notes: the input is the VERIFIED pair table — permille of the
    corpus after the LSH funnel — so even at 10^12 docs the edge table is
    orders smaller than the corpus. Labels are persisted and
    lineage-truncated per round (localCheckpoint) so round k does not
    recompute rounds 1..k-1; production on a cluster would use a
    checkpoint dir (localCheckpoint loses partitions on executor death —
    acceptable here: local mode, and the loop restarts cheaply).
    ``max_iter`` bounds pathological chains; hitting it raises rather
    than silently emitting unconverged components.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .persist()
    )
    # decimal(38,0) sum: at 10^12-doc scale a long sum of 64-bit labels
    # overflows (and ANSI mode turns that into a job failure)
    def label_sum(df):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        msgs = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage: round k must not replay 1..k-1
        )
        new_sum = label_sum(new_labels)
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # min-propagation: sum strictly decreases until fixpoint
            edges.unpersist()
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"neardup_components did not converge in {max_iter} rounds "
        "(pathological chain — raise max_iter)"
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, built-ins only.

    Elements are widened to double BEFORE multiplying and accumulation is
    a sequential left fold — bit-reproducible by any engine that does
    per-element double arithmetic in index order.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def cosine_sim_safe(a: Column, b: Column, sentinel: float = -2.0) -> Column:
    """Cosine similarity with zero-norm vectors pinned to ``sentinel``.

    Under Spark's default ANSI mode a zero-norm vector makes the plain
    cosine THROW (DIVIDE_BY_ZERO), and with ANSI off it makes NaN —
    which a `>`-based argmax fold never selects while SQL's ORDER BY
    cos DESC sorts NaN FIRST (both engines give NaN the top of the
    total order): a silent Spark/oracle divergence. Guarding on the
    squared norms BEFORE dividing is deterministic integer-free
    arithmetic that both engines reproduce exactly; the sentinel ranks
    a zero vector below every real cosine (∈ [-1, 1])."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na2 = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    nb2 = F.aggregate(
        b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.when((na2 == 0.0) | (nb2 == 0.0), F.lit(float(sentinel))).otherwise(
        dot / (F.sqrt(na2) * F.sqrt(nb2))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    With ``block_col`` the self-join is restricted to equal blocks
    (e.g. an LSH sign-bucket from similarity.py) — the scale path.
    Without it this is the exact O(n²) verifier for small n.
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    t = df.select(*cols)
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        t.alias("a")
        .join(t.alias("b"), cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def winnow_sketch_table(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """(id, sketch) with the sketch MATERIALIZED (localCheckpoint) before
    anything explodes or joins it.

    Why: Generate (explode) over an interpreted higher-order-function
    array re-evaluates the whole generator chain per OUTPUT element —
    measured 20 s vs 0.2 s for the sf0.1 sketch explode — the same
    re-evaluation trap as the minhash signature table above, one
    operator further downstream. Materializing is the single-session
    analog of writing the sketch table between pipeline stages, which a
    100 TB funnel does anyway (the sketch is ~2/(w+1) longs per shingle
    — far smaller than the text it fingerprints)."""
    from .textops import winnow_sketch

    return df.select(
        F.col(id_col).alias("id"),
        winnow_sketch(F.col(text_col), k, w).alias("sketch"),
    ).localCheckpoint(eager=False)


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """PARTIAL-overlap candidate pairs via winnowing fingerprints.

    The gap this closes in the near-dup funnel: MinHash/SimHash score
    WHOLE-document similarity, so a long document that merely CONTAINS
    a plagiarized passage or a big quoted block scores low Jaccard and
    sails through. Winnowing selects hashes such that any shared run of
    >= w + k - 1 words yields a shared selection
    (textops.winnow_sketch), so keying on selected hashes surfaces
    passage-level overlap regardless of the surrounding document mass.

    Returns (id_a, id_b, shared) where shared = number of common sketch
    hashes, shared >= min_shared (id_a < id_b).

    Scale safeguards, same discipline as the LSH tiers:

    - Hashes appearing in > ``max_df`` docs are dropped BEFORE the
      self-join (boilerplate n-grams — headers, licenses — are minima
      of many windows in many docs; an unguarded hot hash is the
      sentinel-bucket quadratic wearing a new hat). The guard is part
      of the operator, not left to the caller.
    - Hashes appearing in exactly one doc are pruned too (they cannot
      form a pair) — at corpus scale that is MOST of the table, so the
      self-join input shrinks by the unique-mass fraction for free.
    - Only (id, hash) rows shuffle; text and sketch arrays never leave
      the narrow stage.
    """
    ex = winnow_sketch_table(df, text_col, id_col, k, w).select(
        "id", F.explode("sketch").alias("wh")
    )
    # keep hashes with 2..max_df holders: singletons cannot pair,
    # hot hashes are boilerplate (and the quadratic hazard)
    eligible = (
        ex.groupBy("wh")
        .agg(F.count("*").alias("ndocs"))
        .filter((F.col("ndocs") >= 2) & (F.col("ndocs") <= max_df))
        .select("wh")
    )
    pruned = ex.join(eligible, "wh")
    a = pruned.select(F.col("wh"), F.col("id").alias("id_a"))
    b = pruned.select(F.col("wh"), F.col("id").alias("id_b"))
    return (
        a.join(b, "wh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# passage-level exact dedup (the CCNet paragraph-dedup shape)
# ---------------------------------------------------------------------------

PASSAGE_WORDS = 6  # test-scale window; production uses ~50-200 words


def passage_table(col: Column, passage_words: int = PASSAGE_WORDS) -> Column:
    """Non-overlapping ``passage_words``-word passages of the normalized
    text, in document order (array<string>; the last passage may be
    short). The passage is this engine's paragraph surrogate — the
    synthetic corpus has no newlines, and a fixed word window is the
    deterministic stand-in for CCNet's paragraph split.

    Let-binds the words array (single-element transform) so the
    normalize+split subtree evaluates once per row on every path —
    the interpreted-HOF no-CSE rule (see word_shingles_seq).
    """
    p = passage_words

    def chain(w_: Column) -> Column:
        # exact ceil(n / p): double division of small exact ints —
        # quotient granularity 1/p dwarfs rounding error
        npass = F.floor((F.size(w_) + F.lit(p - 1)) / F.lit(p)).cast("int")
        return F.when(
            F.size(w_) > 0,
            F.transform(
                F.sequence(F.lit(0), npass - 1),
                lambda i: F.concat_ws(" ", F.slice(w_, i * p + 1, p)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(words(normalize_text(col))), chain), 1)


def passage_dedup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    passage_words: int = PASSAGE_WORDS,
) -> DataFrame:
    """Corpus-wide passage-level EXACT dedup, first occurrence wins
    (CCNet's paragraph dedup: arXiv:1911.00359 §3 drops every repeated
    paragraph by hash; here a passage survives only at its globally
    first (doc_id, pos) site — boilerplate headers/footers vanish from
    all later documents).

    Returns one row per doc: (id, n_passages, n_kept, kept_fp) where
    kept_fp is md5 of the surviving passages re-joined in document
    order — a value-bearing witness that reassembly preserved order.

    Scale shape (the part CCNet does with a cluster-wide hash table):
    - ONE shuffle elects survivors: groupBy(passage_fp) with
      min(struct(id, pos, passage)) — map-side partial aggregation
      collapses every partition's duplicate instances before the wire,
      so a boilerplate passage repeated 10^9 times ships O(partitions)
      rows, not 10^9 (no join against a keeper table, hence no skewed
      join key; the min-struct carries the payload out of the agg).
    - ONE shuffle reassembles: groupBy(id) + array_sort(collect_list)
      — the s5 distributed-order-restoration idiom.
    - The passages array is built once and MATERIALIZED before the
      explode (interpreted Generate paths re-evaluate HOF-built arrays;
      the localCheckpoint is the same discipline as the minhash
      signature table).
    """
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        passage_table(F.col(text_col), passage_words).alias("ps"),
    ).localCheckpoint(eager=False)

    ex = base.select("id", F.posexplode("ps").alias("pos", "passage")).select(
        "id", "pos", "passage", F.md5("passage").alias("fp")
    )
    survivors = ex.groupBy("fp").agg(
        F.min(F.struct(F.col("id"), F.col("pos"), F.col("passage"))).alias("k")
    )
    perdoc = (
        survivors.select(
            F.col("k.id").alias("id"),
            F.col("k.pos").alias("pos"),
            F.col("k.passage").alias("passage"),
        )
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "passage"))),
                        lambda s: s["passage"],
                    ),
                )
            ).alias("kept_fp"),
        )
    )
    return (
        base.select("id", F.size("ps").cast("long").alias("n_passages"))
        .join(perdoc, "id", "left")
        .select(
            "id",
            "n_passages",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce(F.col("kept_fp"), F.md5(F.lit(""))).alias("kept_fp"),
        )
    )


def boilerplate_ngram_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-source boilerplate k-gram screen: a k-word gram that occurs
    in >= ``min_df`` DISTINCT documents of the SAME source is
    boilerplate (site templates, navigation chrome, repeated footers —
    the corpus-level statistical twin of the north_star's DOM-heuristic
    boilerplate strip; the in-document analog is the classifier's
    class-0 background seat, reference constants at
    /root/reference/src/DocumentAnalyzer.py:52-59). Returns one row per
    doc: (id, n_tokens, n_boiler_grams, n_boiler_tokens) where
    n_boiler_tokens counts the DISTINCT token positions covered by any
    boilerplate-gram occurrence — the exact number of tokens a strip
    pass would remove, overlaps not double-counted.

    Unlike passage_dedup_stats (exact passage, first-occurrence-wins,
    global) and substring_run_pairs (pairwise diagonal runs), this is
    a frequency screen: df is counted within (source, gram), so a
    phrase two UNRELATED sites share stays content, while min_df
    scales per source if desired by the caller.

    Scale shape at 100 TB:
    - grams: one narrow pass (positional shingles built in-array,
      materialized before the explode — the house Generate rule);
    - df: ONE shuffle on (source, gram) with map-side partial
      aggregation (count-distinct over the exploded occurrences);
    - the boilerplate gram set is the df-filtered tail — data-sized,
      NOT forced broadcast (ADVICE r2: a template-heavy corpus makes
      it large; AQE picks the join strategy from its measured size);
    - coverage: only boilerplate HITS explode into k token positions
      (misses never leave the join), then one groupBy(id). A gram
      repeated 10^9 times across a source is k·occurrences rows —
      linear, no pair expansion anywhere.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(source_col).alias("source"),
        F.size(words(normalize_text(F.col(text_col)))).cast("long").alias("n_tokens"),
        word_shingles_seq(F.col(text_col), k).alias("gs"),
    ).localCheckpoint(eager=False)

    occ = base.select("id", "source", F.posexplode("gs").alias("pos", "g"))
    boiler = (
        occ.groupBy("source", "g")
        .agg(F.countDistinct("id").alias("df_docs"))
        .filter(F.col("df_docs") >= min_df)
        .select("source", "g")
    )
    hits = occ.join(boiler, ["source", "g"]).select("id", "pos")
    cov = (
        hits.select(
            "id",
            "pos",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tp"),
        )
        .groupBy("id")
        .agg(
            F.countDistinct("pos").cast("long").alias("n_boiler_grams"),
            F.countDistinct("tp").cast("long").alias("n_boiler_tokens"),
        )
    )
    return base.select("id", "n_tokens").join(cov, "id", "left").select(
        "id",
        "n_tokens",
        F.coalesce(F.col("n_boiler_grams"), F.lit(0).cast("long")).alias(
            "n_boiler_grams"
        ),
        F.coalesce(F.col("n_boiler_tokens"), F.lit(0).cast("long")).alias(
            "n_boiler_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring runs (the Lee et al. 2022 substring-dedup shape)
# ---------------------------------------------------------------------------


def substring_run_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    min_tokens: int = 8,
    max_df: int = 50,
) -> DataFrame:
    """Exact duplicated token spans across documents — the substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better": drop/flag any >=N-token span that repeats
    verbatim), re-expressed as positional-shingle diagonals instead of
    a suffix array.

    Two docs sharing m CONSECUTIVE matching k-shingles share a verbatim
    run of m + k - 1 tokens. So: positional k-shingle hashes
    (textops.word_shingles_seq), equi-join across docs, then within
    each (id_a, id_b, diag = pos_a - pos_b) diagonal the classic
    gap-group (pos_a - row_number() is constant on a consecutive run —
    the same cumsum idiom as the G1 sessionizer) measures run lengths
    exactly. Emits (id_a, id_b, max_run_tokens, matched_shingles) for
    pairs whose longest shared run reaches ``min_tokens``.

    Scale safeguards (the winnow_overlap_pairs discipline):
    - shingle-hash occurrences outside [2, max_df] are pruned before
      the self-join: singletons cannot pair; hot hashes are boilerplate
      and the quadratic hazard. Pruning a hot hash can SPLIT a run that
      passes through it, so reported max_run_tokens is a lower bound in
      boilerplate-heavy corpora — the conservative direction for a
      dedup trigger.
    - only (h, id, pos) rows shuffle; text never leaves the narrow
      stage; the positional-shingle table is materialized before the
      explode (interpreted-HOF re-evaluation trap, see
      winnow_sketch_table).
    - a suffix array finds runs in O(n) per shard but needs the shard
      in one address space; the diagonal form is pure equi-join +
      window — every stage partitions on (id_a, id_b) or h.
    """
    from .textops import word_shingles_seq

    tbl = df.select(
        F.col(id_col).cast("long").alias("id"),
        word_shingles_seq(F.col(text_col), k).alias("shs"),
    ).localCheckpoint(eager=False)
    ex = tbl.select(
        "id", F.posexplode("shs").alias("pos", "s")
    ).select(
        "id",
        "pos",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    eligible = (
        ex.groupBy("h")
        .agg(F.count("*").alias("occ"))
        .filter((F.col("occ") >= 2) & (F.col("occ") <= max_df))
        .select("h")
    )
    pr = ex.join(eligible, "h")
    a = pr.select("h", F.col("id").alias("id_a"), F.col("pos").alias("pos_a"))
    b = pr.select("h", F.col("id").alias("id_b"), F.col("pos").alias("pos_b"))
    m = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "pos_a",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = m.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
    rl = runs.groupBy("id_a", "id_b", "diag", "grp").agg(F.count("*").alias("rl"))
    return (
        rl.groupBy("id_a", "id_b")
        .agg(
            (F.max("rl") + F.lit(k - 1)).cast("long").alias("max_run_tokens"),
            F.sum("rl").cast("long").alias("matched_shingles"),
        )
        .filter(F.col("max_run_tokens") >= min_tokens)
    )
