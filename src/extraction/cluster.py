"""Corpus clustering: integer-exact quantized Lloyd k-means over the
embedding column.

The training-data use case: partition a web-scale corpus into topical
clusters (for mixture balancing, per-cluster dedup, or curriculum
ordering) without an external ML library. Reference analog: the
model-artifact seat (/root/reference/src/DocumentAnalyzer.py:45-46) —
a small learned model drives a per-row assignment; here the "model" is
the centroid table, re-fit by the job itself.

Why QUANTIZED: Lloyd's update is a float mean, and float summation is
order-dependent — a distributed sum would diverge from any serial
oracle bit-for-bit. Every value is therefore snapped to an integer grid
(floor(x * 2^14); exact: a float32 scaled by a power of two is exact in
double) and all distances/sums stay in int64, so assignment, update,
and WCSS are associative integer arithmetic — identical on Spark,
DuckDB, and pure Python regardless of partitioning or visit order.
Centroid means round to the grid via exact floor division (the
euclidean-mod formula, identical semantics in Spark/DuckDB/Python).

Scale shape per iteration:
- assignment: centroids broadcast as ONE packed array<struct> row
  (same O(1)-plan trick as similarity.ivf_join_topk); per-point argmin
  is a narrow fold — the corpus never shuffles for assignment;
- update: groupBy(cluster) with 64 per-dimension integer SUM columns —
  map-side partial aggregation collapses each partition to ≤k rows, so
  the shuffle moves O(k · dims · partitions), not O(points);
- driver state: k centroid rows collect per iteration (model-sized,
  like MLlib's own KMeans driver loop and the IVF centroid load).

Bounds (documents the int64 headroom): |x| ≤ 2 → |q| ≤ 2^15; per-dim
squared diff ≤ 2^32; 64 dims ≤ 2^38 per pair; WCSS over 10^9 points
≤ 2^68 would overflow — WCSS is summed per CLUSTER (count ≤ n), so at
true 100 TB scale sum dist as DECIMAL(38,0) or per-cluster double; at
any per-cluster count ≤ 2^24 it is exact int64. Grid 2^14 keeps the
update sums (≤ 2^15 · n_cluster) exact far past 10^12 points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 16384  # 2^14 quantization grid

# rows-per-numpy-chunk × k is bounded at ~2^22 distance cells so the
# Arrow assigner's working set stays ~32 MB regardless of k (at k=50k
# that is 84-row chunks; at k=16 the whole Arrow batch goes in one shot)
_ARROW_CELL_BUDGET = 1 << 22


def _arrow_assigner(cents: dict[int, list[int]], top2: bool = False):
    """Build the mapInArrow assignment kernel: each Arrow batch of
    (id, qv) is scored against the captured centroid matrix with one
    int64 matmul — dist(q,c) = |q|² + |c|² − 2·q·c, algebraically the
    same Σ(a−b)² the packed-fold form computes, in the same int64, so
    the two paths are bit-identical (argmin takes the FIRST minimum and
    the centroid matrix is sorted by cid ⇒ distance ties keep the
    lowest cid, exactly the fold's strict-< rule; top-2 masks the
    winner to +inf and argmins again ⇒ ROW_NUMBER() OVER (ORDER BY
    dist, cid) = 2, the DuckDB mirror's rule).

    This is the SCALE form of assignment. The packed-fold expression is
    plan-size-safe (one array literal-free broadcast row) but evaluates
    through Spark's interpreted higher-order functions — O(k·dims)
    interpreted ops per point, unusable at SemDeDup's k≈50k lists. The
    Arrow kernel does the same arithmetic as one BLAS-shaped batch
    matmul per ~2^22-cell chunk; the centroid model ships inside the
    task closure (model-sized, like MLlib KMeans), the corpus still
    never shuffles to be assigned, and the north-rule API contract
    ("vectorized pandas/Arrow UDFs, no per-row Python") is the same one
    the extraction kernel itself rides (pipeline.extract mapInArrow).
    Measured crossover vs the fold form: BENCH/KMEANS.md.
    """
    import numpy as np

    cids = np.array(sorted(cents), dtype=np.int64)
    cmat = np.array([cents[int(c)] for c in cids], dtype=np.int64)
    c2 = np.einsum("kd,kd->k", cmat, cmat)
    far = np.iinfo(np.int64).max

    def fn(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            idx_id = b.schema.get_field_index("id")
            idx_qv = b.schema.get_field_index("qv")
            qv_arr = b.column(idx_qv)
            q = np.asarray(qv_arr.flatten(), dtype=np.int64).reshape(n, -1)
            q2 = np.einsum("nd,nd->n", q, q)
            cl1 = np.empty(n, dtype=np.int64)
            d1 = np.empty(n, dtype=np.int64)
            if top2:
                cl2 = np.empty(n, dtype=np.int64)
            chunk = max(1, _ARROW_CELL_BUDGET // max(1, len(cids)))
            for s in range(0, n, chunk):
                e = min(n, s + chunk)
                # int64 throughout: |q|,|c| ≤ grid·|x|; 64-dim dot ≤ 2^43
                # at |x| ≤ 100 — far inside int64 (module docstring bounds)
                d = q2[s:e, None] + c2[None, :] - 2 * (q[s:e] @ cmat.T)
                i1 = d.argmin(axis=1)
                rows = np.arange(e - s)
                cl1[s:e] = cids[i1]
                d1[s:e] = d[rows, i1]
                if top2:
                    if len(cids) < 2:
                        cl2[s:e] = -1
                    else:
                        d[rows, i1] = far
                        cl2[s:e] = cids[d.argmin(axis=1)]
            cols = [b.column(idx_id), qv_arr]
            if top2:
                cols += [pa.array(cl1), pa.array(cl2), pa.array(q2)]
                names = ["id", "qv", "c1", "c2", "n2"]
            else:
                cols += [pa.array(cl1), pa.array(d1)]
                names = ["id", "qv", "cl", "dist"]
            yield pa.RecordBatch.from_arrays(cols, names)

    return fn


def quantize_vec(vec: Column, grid: int = GRID) -> Column:
    """array<float> -> array<long> on the integer grid (exact: see module
    docstring)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(grid))).cast("long")
    )


def _floor_div(s: int, c: int) -> int:
    """Exact floor division for possibly-negative sums (Python // is
    already floor division; spelled out to mirror the SQL oracle's
    (s - ((s % c) + c) % c) / c euclidean form)."""
    return s // c


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    fit_mod: int = 1,
    assign: str = "fold",
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Fit quantized Lloyd k-means and return the FINAL per-point
    assignment: (DataFrame(id, qv, cl, dist), final centroid dict).

    ``assign``: "fold" scores each point against the broadcast-packed
    centroid array with an expression argmin (JVM-side, zero Python —
    the plan-audit / oracle-point form; interpreted-HOF cost O(k·dims)
    per point caps it at hundreds of centroids); "arrow" runs the same
    int64 arithmetic as a vectorized numpy matmul inside mapInArrow
    (the scale form for k ∝ corpus-size — see _arrow_assigner). The
    two are bit-identical; tests pin it.

    Init: the k lowest-id points of the FIT SAMPLE (deterministic, no
    RNG; cluster labels are those seed ids). Each iteration:
    broadcast-packed argmin assignment (ties -> lowest cid), then
    integer-mean centroid update; clusters that receive no points keep
    their previous centroid. The returned DataFrame assigns the FULL
    corpus and is a lazy plan — callers that consume it more than once
    should localCheckpoint it first (dedup signature-table discipline).

    ``fit_mod``: the Lloyd ITERATIONS run on the deterministic sample
    ``id % fit_mod == 0`` (fit_mod=1 ⇒ fit on everything). This is the
    SemDeDup/production shape — fit the centroid model on a sample,
    pay exactly ONE full-corpus assignment pass per consumer — and it
    is what keeps a k ∝ corpus-size operating point linear: fitting on
    all points costs O(iters · n · k) which is O(n²/target_block) once
    k scales with n, while a ~fixed-size sample makes the fit O(k ·
    sample) and the full pass O(n · k) exactly once. Sampling changes
    WHICH centroids are learned (mirrored bit-exactly by the oracle's
    identical sample filter), not the exactness of anything downstream.
    """
    spark = df.sparkSession
    # quantize once; localCheckpoint so iteration i doesn't replay the
    # scan+quantize of iterations 1..i-1 (same lineage-truncation
    # discipline as dedup._lsh_banded)
    pts = df.select(
        F.col(id_col).cast("long").alias("id"),
        quantize_vec(F.col(vec_col)).alias("qv"),
    ).localCheckpoint(eager=False)
    fitp = pts.filter(F.col("id") % fit_mod == 0) if fit_mod > 1 else pts

    seeds = fitp.orderBy("id").limit(k).collect()
    cents: dict[int, list[int]] = {int(r["id"]): list(r["qv"]) for r in seeds}
    if len(cents) < k:
        raise ValueError(f"need at least k={k} distinct-id points in the fit sample")

    def packed_cents() -> DataFrame:
        cdf = spark.createDataFrame(
            sorted(cents.items()), schema="cid long, mv array<long>"
        )
        return F.broadcast(
            cdf.agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("cid"), F.col("mv")))
                ).alias("__cents")
            )
        )

    def assigned(src: DataFrame = pts) -> DataFrame:
        if assign == "arrow":
            # snapshot the mutable centroid dict at closure-build time
            # (the Lloyd loop rebinds entries between iterations; the
            # numpy matrix is materialized eagerly inside _arrow_assigner)
            return src.mapInArrow(
                _arrow_assigner(dict(cents)),
                schema="id long, qv array<long>, cl long, dist long",
            )
        # argmin fold over the packed (sorted-by-cid) centroid array:
        # strict < keeps the lowest cid on distance ties. Distance is
        # computed ONCE per centroid inside the transform (no CSE
        # across higher-order functions — the house rule).
        scored = F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(F.col("qv"), c["mv"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
        best = F.aggregate(
            scored,
            F.struct(
                F.lit(1 << 62).cast("long").alias("dist"),
                F.lit(-1).cast("long").alias("cid"),
            ),
            lambda a, s: F.struct(
                F.when(s["dist"] < a["dist"], s["dist"]).otherwise(a["dist"]).alias("dist"),
                F.when(s["dist"] < a["dist"], s["cid"]).otherwise(a["cid"]).alias("cid"),
            ),
        )
        # let-bind the fold in its own projection, then read the two
        # fields from the bound column: referencing best[...] twice in
        # one select would plant the whole fold tree twice (CollapseProject
        # keeps the two-step form because the fold is not cheap)
        return (
            src.crossJoin(packed_cents())
            .select("id", "qv", best.alias("__b"))
            .select(
                "id",
                "qv",
                F.col("__b.cid").alias("cl"),
                F.col("__b.dist").alias("dist"),
            )
        )

    for _ in range(iters):
        sums = (
            assigned(fitp)
            .groupBy("cl")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("qv", d + 1)).alias(f"s{d}")
                    for d in range(dims)
                ],
            )
        ).collect()
        for r in sums:
            n = int(r["n"])
            cents[int(r["cl"])] = [_floor_div(int(r[f"s{d}"]), n) for d in range(dims)]

    return assigned(), cents


def kmeans_quantized(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
) -> DataFrame:
    """Quantized Lloyd k-means; returns per-cluster final stats.

    One final assignment pass emits (cluster, n_points, wcss,
    centroid_digest) where wcss = Σ squared grid distance to the
    assigned centroid and centroid_digest = Σ mv[d]·(d+1) — a compact
    value-bearing witness of the final centroid table.
    """
    spark = df.sparkSession
    asg, cents = kmeans_assign(df, vec_col, id_col, k=k, iters=iters, dims=dims)

    digests = spark.createDataFrame(
        [(cid, sum(m * (d + 1) for d, m in enumerate(mv))) for cid, mv in sorted(cents.items())],
        schema="cl long, centroid_digest long",
    )
    final = asg.groupBy("cl").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("dist").cast("long").alias("wcss"),
    )
    return final.join(F.broadcast(digests), "cl").select(
        F.col("cl").cast("long").alias("cluster"),
        "n_points",
        "wcss",
        "centroid_digest",
    )


def semantic_near_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    threshold_num: int = 2,
    threshold_den: int = 5,
    fit_mod: int = 1,
    assign: str = "fold",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means clusters
    as the blocking key, exact cosine >= num/den within each cluster.

    The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): cluster
    the embedding space, then compare points ONLY within their cluster
    — the cluster id plays exactly the role the sign-LSH bucket plays
    in dedup.embedding_near_dups, but the blocks are learned from the
    data instead of fixed random hyperplanes, so semantically-close
    pairs co-locate even when no hyperplane pattern would bucket them
    together. Recall is bounded by the clustering (a near-dup pair
    split across a centroid boundary is never compared) — the same
    measured-not-assumed caveat as BENCH/DEDUP_RECALL.md's blocking
    curve.

    Integer-exact threshold test (no float cosine, no sqrt): for
    t = num/den > 0,   cos(a,b) >= t
      <=>  dot > 0  AND  dot² · den² >= num² · |a|² · |b|²
    over the 2^14-grid quantized vectors. dot² <= 2^72 overflows
    int64, so the comparison runs in decimal(38,0) (DuckDB mirror:
    HUGEINT) — exact at any num/den <= 10^3. Zero-norm vectors fail
    dot > 0 and never pair (same guard rule as similarity.cosine).

    Scale shape: assignment is the broadcast-packed argmin (corpus
    never shuffles to be assigned); the pair stage shuffles (cl, qv,
    n2) once and self-joins within clusters — at corpus scale k is
    the knob that bounds cluster size (SemDeDup used 50k clusters on
    LAION; k ~ n/target_block makes the within-block work linear).
    The assignment table is localCheckpoint-ed so the self-join does
    not replay the Lloyd iterations twice (house discipline, see
    dedup._lsh_banded).
    """
    asg, _ = kmeans_assign(
        df, vec_col, id_col, k=k, iters=iters, dims=dims, fit_mod=fit_mod,
        assign=assign,
    )
    feat = asg.select(
        "id",
        "cl",
        "qv",
        F.aggregate(
            F.col("qv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("n2"),
    ).localCheckpoint(eager=False)

    a = feat.select(
        F.col("cl"),
        F.col("id").alias("id_a"),
        F.col("qv").alias("qv_a"),
        F.col("n2").alias("n2_a"),
    )
    b = feat.select(
        F.col("cl"),
        F.col("id").alias("id_b"),
        F.col("qv").alias("qv_b"),
        F.col("n2").alias("n2_b"),
    )
    dec = "decimal(38,0)"
    pairs = (
        a.join(b, on="cl")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cl",
            "id_a",
            "id_b",
            "n2_a",
            "n2_b",
            F.aggregate(
                F.zip_with(F.col("qv_a"), F.col("qv_b"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dot"),
        )
    )
    dotd = F.col("dot").cast(dec)
    lhs = dotd * dotd * F.lit(threshold_den * threshold_den).cast(dec)
    rhs = (
        F.lit(threshold_num * threshold_num).cast(dec)
        * F.col("n2_a").cast(dec)
        * F.col("n2_b").cast(dec)
    )
    return pairs.filter((F.col("dot") > 0) & (lhs >= rhs)).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("cl").cast("long").alias("cluster"),
    )


def semantic_near_pairs_multi(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    threshold_num: int = 2,
    threshold_den: int = 5,
    fit_mod: int = 1,
    assign: str = "fold",
) -> DataFrame:
    """SemDeDup with TOP-2 cluster assignment — the nprobe=2 recall
    recovery for the single-assignment form's cluster-boundary blind
    spot (a near-dup pair split across a centroid boundary is never
    compared by semantic_near_pairs).

    Measured on the sf0.01 embeddings at cos >= 0.4, k=4: exact
    all-pairs ground truth has 59 pairs; single assignment blocks
    50.8% of them together, top-2 assignment 96.6% — the same
    knob-vs-recall trade as similarity.multiprobe_topk (1-bit-flip
    probes) and ivf nprobe=2, measured not assumed.

    Cost: each point joins 2 blocks, so within-block pair work rises
    ~(2 nassign choose 2)/(1) = up to 4x over single assignment at the
    same k — the caller doubles k to hold block sizes. Pairs sharing
    BOTH blocks pass the threshold test in each; the final groupBy
    dedupes and reports n_shared_blocks (1 or 2) as the witness.

    Tie semantics match the DuckDB mirror's ROW_NUMBER() ORDER BY
    (dist, cid): the packed centroid array is sorted by cid and the
    fold uses strict <, so equal distances keep the lowest cid in both
    slots.
    """
    _, cents = kmeans_assign(
        df, vec_col, id_col, k=k, iters=iters, dims=dims, fit_mod=fit_mod,
        assign=assign,
    )
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).cast("long").alias("id"),
        quantize_vec(F.col(vec_col)).alias("qv"),
    )
    if assign == "arrow":
        # top-2 + |q|² in one vectorized pass (see _arrow_assigner);
        # same materialize-before-explode discipline as the fold path
        feat = pts.mapInArrow(
            _arrow_assigner(dict(cents), top2=True),
            schema="id long, qv array<long>, c1 long, c2 long, n2 long",
        ).localCheckpoint(eager=False)
        return _pair_within_blocks(feat, threshold_num, threshold_den)
    cdf = spark.createDataFrame(
        sorted(cents.items()), schema="cid long, mv array<long>"
    )
    packed = F.broadcast(
        cdf.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cid"), F.col("mv")))
            ).alias("__cents")
        )
    )
    scored = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(F.col("qv"), c["mv"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    far = F.lit(1 << 62).cast("long")
    top2 = F.aggregate(
        scored,
        F.struct(
            far.alias("d1"),
            F.lit(-1).cast("long").alias("c1"),
            far.alias("d2"),
            F.lit(-1).cast("long").alias("c2"),
        ),
        lambda a, s: F.struct(
            F.when(s["dist"] < a["d1"], s["dist"]).otherwise(a["d1"]).alias("d1"),
            F.when(s["dist"] < a["d1"], s["cid"]).otherwise(a["c1"]).alias("c1"),
            F.when(s["dist"] < a["d1"], a["d1"])
            .when(s["dist"] < a["d2"], s["dist"])
            .otherwise(a["d2"])
            .alias("d2"),
            F.when(s["dist"] < a["d1"], a["c1"])
            .when(s["dist"] < a["d2"], s["cid"])
            .otherwise(a["c2"])
            .alias("c2"),
        ),
    )
    # let-bind the fold (one projection), derive n2, MATERIALIZE before
    # the explode — never explode an interpreted-HOF expression directly
    # (house rule; see winnow_sketch_table)
    feat = (
        pts.crossJoin(packed)
        .select("id", "qv", top2.alias("__t"))
        .select(
            "id",
            "qv",
            F.col("__t.c1").alias("c1"),
            F.col("__t.c2").alias("c2"),
            F.aggregate(
                F.col("qv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).alias("n2"),
        )
        .localCheckpoint(eager=False)
    )
    return _pair_within_blocks(feat, threshold_num, threshold_den)


def _pair_within_blocks(
    feat: DataFrame, threshold_num: int, threshold_den: int
) -> DataFrame:
    """Shared top-2 pair stage: explode the two block memberships,
    equi-join within blocks, integer-exact cosine test in
    decimal(38,0), dedupe pairs seen in both shared blocks.
    ``feat`` must carry (id, qv, c1, c2, n2) and already be
    materialization-safe to consume twice (localCheckpoint-ed)."""
    threshold_num, threshold_den = int(threshold_num), int(threshold_den)
    # candidates first, vectors later: the block self-join runs on the
    # SKINNY (cl, id) membership table (16 bytes/row instead of a
    # 64-long vector per row), and the per-pair dedupe happens BEFORE
    # scoring — a pair sharing both blocks is scored once, not twice.
    # The threshold test is a pure function of the pair, so filtering
    # after the count is identical to the old filter-then-count form
    # (n_shared_blocks counted every co-membership either way).
    mem = feat.select("id", F.explode(F.array("c1", "c2")).alias("cl"))
    cand = (
        mem.select("cl", F.col("id").alias("id_a"))
        .join(mem.select("cl", F.col("id").alias("id_b")), on="cl")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared_blocks"))
    )
    va = feat.select(
        F.col("id").alias("id_a"), F.col("qv").alias("qv_a"), F.col("n2").alias("n2_a")
    )
    vb = feat.select(
        F.col("id").alias("id_b"), F.col("qv").alias("qv_b"), F.col("n2").alias("n2_b")
    )
    dec = "decimal(38,0)"
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_blocks",
            "n2_a",
            "n2_b",
            F.aggregate(
                F.zip_with(F.col("qv_a"), F.col("qv_b"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dot"),
        )
    )
    dotd = F.col("dot").cast(dec)
    lhs = dotd * dotd * F.lit(threshold_den * threshold_den).cast(dec)
    rhs = (
        F.lit(threshold_num * threshold_num).cast(dec)
        * F.col("n2_a").cast(dec)
        * F.col("n2_b").cast(dec)
    )
    return pairs.filter((F.col("dot") > 0) & (lhs >= rhs)).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        "n_shared_blocks",
    )
