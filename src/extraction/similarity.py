"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k via crossJoin + window. The
  baseline/verifier. At scale the small query side MUST broadcast —
  F.broadcast() is applied so the corpus never shuffles.
- sign_lsh_bucket / bucketed_topk: random-hyperplane LSH scale path.
  Hyperplanes are deterministic ±1 sign patterns derived from splitmix
  bits, so bucket assignment is reproducible in ANSI SQL. Probing cost
  drops from O(n·q) to O(q · n / 2^planes) per bucket; recall traded via
  number of planes.
- multiprobe_topk: 1-bit-flip multi-probe — recovers the recall lost at
  hyperplane boundaries for (planes+1)× probe cost. The measured
  recall/cost trade lives in BENCH/ANN.md (tools/ann_recall.py); the
  recall computation itself is oracle-checked (ann_recall_at_1).

Everything is built-in expressions (zip_with/aggregate) — JVM-side,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim, cosine_sim_safe


def sign_lsh_bucket(vec: Column, planes: int = 4, dims: int = 64) -> Column:
    """LSH bucket id in [0, 2^planes): bit p = sign of <v, h_p>.

    Hyperplane h_p has deterministic ±1 components: component d is
    +1 iff bit (d mod 64) of the plane's own splitmix64-derived pattern
    (seed 0xC0FFEE + p) is 1 — cheap, data-independent, and expressible
    in plain SQL. At dims <= 64 every component reads a distinct pattern
    bit; beyond 64 dims the pattern repeats (swap in a second seed word
    per extra 64 dims before using wider vectors).
    """
    from .corpus import _splitmix64

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        pattern = _splitmix64(0xC0FFEE + p)  # deterministic per plane
        signs = [1 if (pattern >> (d % 64)) & 1 else -1 for d in range(dims)]
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: (x * s).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket



def _topk_tail(scored, order_col: str, k: int):
    """Shared ranked-top-k tail of every ANN variant: per-query window
    (score DESC, neighbor_id ASC — the single tie rule all variants and
    all SQL oracles share), rank filter, canonical projection. One
    definition so the tie-break/self-exclusion contract cannot drift
    between variants."""
    w = Window.partitionBy("qid").orderBy(F.desc(order_col), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
        )
    )

def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 1,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank). Excludes self.

    The query side is broadcast — the corpus side never shuffles; ranking
    is a per-query window (partial top-k would use AQE at larger k).
    """
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("nid")).select(
        "qid", "nid", cosine_sim(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    return _topk_tail(scored, "cos_sim", k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    k: int = 1,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-flat ANN: every vector is assigned to its nearest centroid
    (its "inverted list"); a query probes its ``nprobe`` nearest lists —
    the partition-pruned alternative to sign-LSH bucketing, with nprobe
    as the recall lever (the IVF analog of LSH multi-probe: recall lost
    at Voronoi boundaries is recovered for nprobe× probe cost).

    ``centroids`` arrive as plain Python lists: the trained-offline model
    artifact a production pipeline ships to every executor. Here they are
    compiled into the plan as literals via a single-pass transform +
    aggregate argmax fold (each centroid cosine evaluated exactly once),
    which holds to hundreds of centroids; at real IVF scale (8-64k) the
    literal array itself outgrows the plan, and assignment becomes a
    broadcast-join argmax against a centroids table (same output
    contract). Assignment here is a narrow expression — NO shuffle,
    lowest index wins ties; the only shuffle is the equi-join on the
    list id, exactly like ``bucketed_topk``. Recall is governed by
    the centroid count and probe width, measured with tools/ann_recall.py
    discipline rather than assumed.
    """

    def assign(vec):
        # single-pass argmax fold: transform evaluates each centroid
        # cosine exactly ONCE, then one aggregate tracks (best, idx).
        # The previous greatest + chained-when form compiled 2k separate
        # cosine expressions (no CSE across higher-order functions) —
        # measured 51.6 s vs 6 s going 8 -> 32 centroids at sf0.1.
        # Strict > keeps the earlier index on ties (lowest index wins,
        # matching the oracle's ORDER BY cos DESC, cid ASC).
        # cosine_sim_safe pins a zero-norm vector to the -2.0 sentinel
        # on BOTH engines — the plain cosine THROWS under Spark's
        # default ANSI mode and silently diverges from SQL's ORDER BY
        # with ANSI off (see cosine_sim_safe docstring).
        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        coss = F.transform(cents, lambda c: cosine_sim_safe(vec, c))
        acc = F.aggregate(
            coss,
            F.struct(
                F.lit(-3.0).cast("double").alias("best"),
                F.lit(0).cast("long").alias("idx"),
                F.lit(0).cast("long").alias("i"),
            ),
            lambda a, cs: F.struct(
                F.when(cs > a["best"], cs).otherwise(a["best"]).alias("best"),
                F.when(cs > a["best"], a["i"]).otherwise(a["idx"]).alias("idx"),
                (a["i"] + F.lit(1)).alias("i"),
            ),
        )
        return acc["idx"]

    def probe_lists(vec):
        # top-nprobe list ids: one transform scores every centroid once;
        # array_sort on (negated cos, idx) structs orders cos desc with
        # lowest index winning ties — the same tie rule as the argmax
        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        scoredc = F.transform(
            cents,
            lambda c, i: F.struct(
                (-cosine_sim_safe(vec, c)).alias("negcos"),
                i.cast("long").alias("idx"),
            ),
        )
        return F.transform(
            F.slice(F.array_sort(scoredc), 1, nprobe), lambda t: t["idx"]
        )

    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        assign(F.col(vec_col)).alias("cl"),
    )
    # corpus vectors live in exactly ONE list; only queries fan out, so
    # each (query, neighbor) pair appears at most once — no dedup needed
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_lists(F.col(vec_col))).alias("ql")
        if nprobe > 1
        else assign(F.col(vec_col)).alias("ql"),
    )
    scored = c.join(
        F.broadcast(q), (F.col("ql") == F.col("cl")) & (F.col("qid") != F.col("nid"))
    ).select("qid", "nid", cosine_sim_safe(F.col("qv"), F.col("cv")).alias("cos_sim"))
    return _topk_tail(scored, "cos_sim", k)


def ivf_join_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    k: int = 1,
    nprobe: int = 1,
    sq8_shift: int | None = None,
) -> DataFrame:
    """IVF-flat ANN, production centroid form: the centroid table is a
    DataFrame, not plan literals — the broadcast-join argmax
    ``ivf_topk``'s docstring promises.

    ``ivf_topk`` compiles every centroid into the expression tree as 64
    ``F.lit``s (twice: assign + probe), which holds to hundreds of
    centroids and then degrades superlinearly (measured 2.8 s -> 15.7 s
    going 8 -> 32 at sf0.1, BENCH/ANN.md) — at real IVF scale (8-64k
    lists) the plan itself outgrows compilation. Here the centroids are
    DATA: one tiny aggregate packs them into a single array<struct(cid,
    cv)> row (sorted by cid), a broadcast cross-join ships that one row
    to every task, and the same single-pass argmax fold runs over the
    runtime array column. Plan size is O(1) in the centroid count; per-
    row work is unchanged; the corpus still never shuffles; the only
    wide op remains the list-id equi-join. This is exactly a broadcast-
    join argmax — the join side just arrives pre-packed so the argmax
    stays a narrow fold instead of a groupBy(corpus-id) shuffle, which
    would move every corpus vector (reference analog for the
    model-artifact seat: /root/reference/src/DocumentAnalyzer.py:45-46).

    ``centroids`` must have columns (cid: long, cv: array<numeric>).
    Ties: lowest cid wins (array sorted by cid + strict > in the fold),
    identical to ``ivf_topk`` and the SQL oracle's ORDER BY cos DESC,
    cid ASC. Zero-norm vectors pin to the -2.0 sentinel on both engines
    via cosine_sim_safe (everywhere: assignment, probe ranking, and the
    in-list scoring, so a zero vector ranks last instead of throwing).
    """
    packed = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("cid").cast("long").alias("cid"), F.col("cv"))
                )
            ).alias("__cents")
        )
    )

    def _scored_cents(vec):
        # per-centroid cosine evaluated exactly ONCE inside a transform;
        # downstream fold/sort only reads struct fields (no CSE across
        # higher-order functions — a cosine referenced in the fold's
        # when-branches would be re-evaluated per reference)
        return F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                cosine_sim_safe(vec, c["cv"]).alias("cos"),
                c["cid"].alias("cid"),
            ),
        )

    def best_cid(vec):
        acc = F.aggregate(
            _scored_cents(vec),
            F.struct(
                F.lit(-3.0).cast("double").alias("best"),
                F.lit(-1).cast("long").alias("cid"),
            ),
            lambda a, s: F.struct(
                F.when(s["cos"] > a["best"], s["cos"]).otherwise(a["best"]).alias("best"),
                F.when(s["cos"] > a["best"], s["cid"]).otherwise(a["cid"]).alias("cid"),
            ),
        )
        return acc["cid"]

    def probe_cids(vec):
        neg = F.transform(
            _scored_cents(vec),
            lambda s: F.struct((-s["cos"]).alias("negcos"), s["cid"].alias("cid")),
        )
        return F.transform(F.slice(F.array_sort(neg), 1, nprobe), lambda t: t["cid"])

    # with sq8_shift set, the in-list scan runs over int8 CODES instead
    # of floats — the full production stack (IVF coarse quantizer in
    # float, compressed fine scan): the corpus-side payload shrinks 4x
    # and ranking is the associative integer dot (sq8_topk's contract).
    # Assignment stays float cosine either way, so both variants block
    # identically and a hit diff isolates pure in-list quantization
    # error (q_ann_ivf_sq8_top1's witness).
    quant = sq8_shift is not None
    payload = (
        sq8_codes(F.col(vec_col), sq8_shift) if quant else F.col(vec_col)
    )
    c = corpus.crossJoin(packed).select(
        F.col(id_col).alias("nid"),
        payload.alias("cv"),
        best_cid(F.col(vec_col)).alias("cl"),
    )
    q = queries.crossJoin(packed).select(
        F.col(id_col).alias("qid"),
        payload.alias("qv"),
        F.explode(probe_cids(F.col(vec_col))).alias("ql")
        if nprobe > 1
        else best_cid(F.col(vec_col)).alias("ql"),
    )
    score = (
        sq8_dot(F.col("qv"), F.col("cv")).alias("dot")
        if quant
        else cosine_sim_safe(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    scored = c.join(
        F.broadcast(q), (F.col("ql") == F.col("cl")) & (F.col("qid") != F.col("nid"))
    ).select("qid", "nid", score)
    return _topk_tail(scored, "dot" if quant else "cos_sim", k)


def multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 1,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """ANN top-k probing the query's bucket PLUS every 1-bit-flip
    neighbor bucket (``planes + 1`` probes per query).

    Sign-LSH loses recall exactly when a true neighbor sits on the other
    side of ONE hyperplane; flipping each bucket bit probes those
    adjacent cells and recovers most of that loss for (planes+1)× the
    in-bucket probe cost — still O(n·q·(planes+1)/2^planes) vs the
    brute-force O(n·q). Scaling ``planes`` with corpus size keeps
    buckets bounded; multi-probe keeps recall as planes grows.

    Each corpus vector lives in exactly one bucket and the probe set is
    distinct, so no (query, neighbor) pair is scored twice — no dedup
    shuffle needed. The exploded query side broadcasts; the corpus never
    shuffles.
    """
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), planes, dims).alias("cb"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), planes, dims).alias("qb"),
    )
    qp = q.select(
        "qid",
        "qv",
        F.explode(
            F.array(
                F.col("qb"),
                *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
            )
        ).alias("probe"),
    )
    scored = c.join(
        F.broadcast(qp), (F.col("probe") == F.col("cb")) & (F.col("qid") != F.col("nid"))
    ).select("qid", "nid", cosine_sim(F.col("qv"), F.col("cv")).alias("cos_sim"))
    return _topk_tail(scored, "cos_sim", k)


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 1,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """ANN top-k probing only the query's LSH bucket (scale path)."""
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), planes, dims).alias("cb"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), planes, dims).alias("qb"),
    )
    scored = c.join(
        F.broadcast(q), (F.col("qb") == F.col("cb")) & (F.col("qid") != F.col("nid"))
    ).select("qid", "nid", cosine_sim(F.col("qv"), F.col("cv")).alias("cos_sim"))
    return _topk_tail(scored, "cos_sim", k)


def sq8_codes(vec: Column, shift: int = 7) -> Column:
    """Scalar-quantize a float vector to int8 codes — the compressed
    storage form a 100 TB ANN index actually scans (4x smaller than
    float32, 8x smaller than float64; the corpus-side vector table is
    the dominant footprint at scale, and integer dot products SIMD-
    vectorize where float ones don't always).

    code_d = clamp(floor(x_d * 2^shift), -128, 127). The scale is a
    POWER OF TWO on purpose: multiplying an IEEE float by 2^k is exact
    (exponent arithmetic, no mantissa rounding), so quantization is
    bit-reproducible across engines — no float-division rounding seam
    between Spark and the SQL oracle. shift=7 covers embeddings with
    components in (-1, 1) at full int8 resolution; a production
    calibration picks the largest shift with max|x|*2^shift <= 127
    from one global abs-max scalar aggregate (a tiny model artifact,
    like the IVF centroid table) and stays exact because the result is
    still a power of two.
    """
    s = float(1 << shift)
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-128).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x.cast("double") * F.lit(s)).cast("long"),
            ),
        ),
    )


def sq8_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two code vectors. Pure int64 arithmetic —
    associative, so map-side combining and any evaluation order give
    the same bits (no IEEE fold-order discipline needed, unlike
    cosine_sim)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 1,
    shift: int = 7,
) -> DataFrame:
    """Brute-force top-k over SYMMETRIC int8-quantized vectors: both
    sides quantized once (a narrow projection), candidates ranked by the
    integer code dot product. Same join geometry as brute_force_topk —
    query side broadcast, corpus never shuffles — but the scanned
    payload is 64 int8-range codes per row instead of 64 doubles, which
    is the difference between an in-memory and a spilling scan at 100 TB.
    Composes with the LSH/IVF blockers (quantize the in-bucket scan);
    kept separate here so the quantization error is measured in
    isolation (q_ann_sq8_top1 carries the exact-hit witness per query).

    Ranking by integer dot == ranking by dequantized dot (codes scale
    by the same 2^-shift both sides), so the ONLY divergence from
    brute force is true quantization error. Ties: lowest neighbor_id.
    """
    c = corpus.select(
        F.col(id_col).alias("nid"),
        sq8_codes(F.col(vec_col), shift).alias("cc"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        sq8_codes(F.col(vec_col), shift).alias("qc"),
    )
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("nid")).select(
        "qid", "nid", sq8_dot(F.col("qc"), F.col("cc")).alias("dot")
    )
    return _topk_tail(scored, "dot", k)
