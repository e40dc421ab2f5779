"""Crawl-graph authority scoring (PageRank) for crawl prioritization.

A web-scale crawl pipeline ranks domains by link authority to decide
what to fetch next and how to weight sources (the seat OpenWebText's
karma threshold and Common Crawl's harmonic-centrality ranking fill).
This module runs PageRank over a domain-level link graph with every
number an exact scaled integer, so an independent ANSI-SQL engine
reproduces identical ranks — no float fixpoint drift between engines.

Graph derivation (synth-input idiom, like canonical_url's raw-URL
variants): each document emits two outlinks whose TARGET DOCUMENT is a
deterministic function of its doc_id — t1 = (id·31+7) mod n, t2 =
(id·17+3) mod n — plus a THIRD outlink t3 = (id·13+5) mod n from every
doc with id ≡ 0 (mod 7). The third link deliberately breaks the
vertex-transitivity of the affine pair (under a round-robin doc→source
map the two-link graph is regular and every rank converges to exactly
SCALE, so an oracle match would never exercise the recursion — a broken
damping factor would still "pass"); with it, in-link mass differs
across domains at every test scale. The edge is (source of doc) →
(source of target doc), self-loops dropped, parallel edges aggregated
to a weight. A real pipeline lands here from an href-extraction pass;
the derivation is the deterministic stand-in with the same shape: a
corpus-sized equi-join (target doc id → its domain) feeding a
domain-sized weighted edge list.

PageRank (damping d = 85/100, SCALE = 10^6, ITERS fixed):
  rank_0(v)   = SCALE
  contrib(e)  = (rank(src)·m(e)) div out_w(src)      -- per weighted edge
  rank'(v)    = (15·SCALE) div 100 + (85·Σ contrib) div 100
Dangling-node mass (a node whose only links were self-loops) is dropped,
not redistributed — documented classic simplification; nodes with no
in-links settle at the (15·SCALE) div 100 base. When ranks feed
sampling weights use ``pagerank_conserving``, which restores dangling
AND floor-division losses exactly (Σ ranks == n·SCALE every iteration).

Scale shape (100 TB): the ONLY corpus-sized work is the outlink
derivation and the one equi-join mapping target ids to domains
(skew-free key: doc_id). Everything after — edges, out-weights, ranks —
is domain-cardinality (millions of rows at web scale, not trillions),
so each of the ITERS iterations is a broadcast-joinable agg; the loop
builds one fixed logical plan, no driver-side data movement. At
billion-node graphs the rank join flips to a shuffled equi-join and the
iteration count stays the knob (checkpoint every ~10 iterations to cut
lineage depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85, exact rational
PR_ITERS = 3
# outlink derivation multipliers (arbitrary coprime-ish constants)
LINK_A1, LINK_B1 = 31, 7
LINK_A2, LINK_B2 = 17, 3
# symmetry-breaking third outlink, emitted only by docs with
# id % LINK3_MOD == 0 (see module docstring: without it the derived
# graph is regular and every rank is exactly SCALE at every scale, so
# oracle equality never exercises the rank recursion)
LINK_A3, LINK_B3 = 13, 5
LINK3_MOD = 7


def crawl_edges(docs: DataFrame, id_col: str, src_col: str) -> DataFrame:
    """Weighted domain-level edge list (src, dst, m) from per-doc
    deterministic outlinks. Corpus-sized work: one union of two narrow
    projections + one equi-join on the target doc id."""
    tot = docs.agg(F.count("*").alias("n_docs"))
    base = docs.select(F.col(src_col).alias("src"), F.col(id_col)).crossJoin(
        F.broadcast(tot)
    )
    targets = (
        base.select(
            "src",
            F.expr(f"({id_col} * {LINK_A1} + {LINK_B1}) % n_docs").alias("t"),
        )
        .unionAll(
            base.select(
                "src",
                F.expr(f"({id_col} * {LINK_A2} + {LINK_B2}) % n_docs").alias("t"),
            )
        )
        .unionAll(
            base.filter(F.expr(f"{id_col} % {LINK3_MOD} = 0")).select(
                "src",
                F.expr(f"({id_col} * {LINK_A3} + {LINK_B3}) % n_docs").alias("t"),
            )
        )
    )
    resolved = targets.join(
        docs.select(F.col(id_col).alias("t"), F.col(src_col).alias("dst")), "t"
    )
    return (
        resolved.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("m"))
    )


def pagerank(
    docs: DataFrame,
    id_col: str,
    src_col: str,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Integer-exact PageRank over the derived crawl graph.

    Returns (source, out_w, rank) — one row per domain, rank after
    ``iters`` iterations in scaled-integer units (base = 0.15·scale).
    """
    # the edge AGGREGATE is domain-sized but its lineage is corpus-sized
    # (outlink derivation + the target-resolution join); the rank loop
    # references it once per iteration plus outw — localCheckpoint
    # truncates the lineage so the corpus is scanned once, not 4x
    # (same discipline as the minhash signature table, CLAUDE.md)
    edges = crawl_edges(docs, id_col, src_col).localCheckpoint(eager=False)
    outw = edges.groupBy("src").agg(F.sum("m").cast("long").alias("out_w"))
    nodes = docs.select(F.col(src_col).alias("node")).distinct()
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // PR_DAMP_DEN

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("(rank * m) div out_w")).cast("long").alias("s"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, 0)) div {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return (
        ranks.join(outw.withColumnRenamed("src", "node"), "node", "left")
        .select(
            F.col("node").alias("source"),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_w"),
            # pr_rank, not "rank": RANK is a window keyword in ANSI
            # engines and the oracle must alias the same name
            F.col("rank").alias("pr_rank"),
        )
    )


def pagerank_conserving(
    docs: DataFrame,
    id_col: str,
    src_col: str,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Mass-conserving integer PageRank: Σ pr_rank == n_nodes·scale
    EXACTLY after every iteration — the variant to use when ranks feed
    a sampling-weight column (t7_mixture_sample), where silently
    dropped mass would bias the mixture.

    Plain ``pagerank`` loses mass two ways each iteration: dangling
    nodes (only self-loop outlinks) keep their rank out of circulation,
    and every floor division (per-edge contribution, 85% damping)
    truncates. This variant restores both exactly, with integer
    arithmetic only, so an ANSI engine reproduces it bit-for-bit:

    1. un-delivered mass L = n·scale − Σ contribs (ONE scalar — it
       covers dangling AND per-edge floor loss without tracking either
       individually) is redistributed as L div n to every node plus +1
       to the first L mod n nodes in node order;
    2. damping by 85/100 uses largest-remainder (Hamilton)
       apportionment: d_v = (85·x_v) div 100 with remainder r_v, and
       the deficit R = Σr_v/100 (exact — scale is divisible by 100, so
       Σ(85·x_v) ≡ 0 mod 100) goes +1 to the R nodes with the largest
       remainders (ties: node order).
    Induction gives Σ rank' = n·(15·scale/100) + 85·n·scale/100 + 0 =
    n·scale at every step.

    Scale shape: identical to ``pagerank`` (corpus touched once for
    edge derivation; per-iteration work is domain-cardinality) plus,
    per iteration, two scalar reductions and two GLOBAL row_number
    windows over the node table. Those windows are single-partition
    sorts of domain-sized data — fine to ~10^7 domains; past that, swap
    the apportionment ranks for the two-phase distributed rank
    (packing.pack_sequences' bucket-prefix discipline). The loss and
    deficit scalars COLLECT to the driver (model-sized, like the BPE
    argmax and k-means centroid rows) and re-enter as literals; the
    first-cut broadcast-crossJoin form kept them in one lazy plan,
    whose 3-iteration nesting cost 5.6 s vs 1.75 s at sf0.1 — the
    per-iteration localCheckpoints keep each round's plan flat.

    Requires scale % 100 == 0.
    """
    assert scale % 100 == 0, "Hamilton damping needs scale divisible by 100"
    from pyspark.sql import Window

    edges = crawl_edges(docs, id_col, src_col).localCheckpoint(eager=True)
    outw = edges.groupBy("src").agg(
        F.sum("m").cast("long").alias("out_w")
    ).localCheckpoint(eager=True)
    nodes = docs.select(F.col(src_col).alias("node")).distinct().localCheckpoint(
        eager=True
    )
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // PR_DAMP_DEN
    n_nodes = nodes.count()  # model-sized scalar (domain cardinality)
    total = n_nodes * scale

    w_node = Window.orderBy("node")
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("(rank * m) div out_w")).cast("long").alias("s"))
        )
        sv = nodes.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
        ).localCheckpoint(eager=True)
        # un-delivered mass: one driver scalar off the checkpointed state
        loss = sv.agg(
            (F.lit(total) - F.sum("s")).cast("long").alias("loss")
        ).collect()[0]["loss"]
        xv = sv.select(
            "node",
            (
                F.col("s")
                + F.lit(loss // n_nodes)
                + F.when(
                    F.row_number().over(w_node) <= F.lit(loss % n_nodes), 1
                ).otherwise(0)
            ).cast("long").alias("x"),
        )
        dv = xv.select(
            "node",
            F.expr(f"({PR_DAMP_NUM} * x) div {PR_DAMP_DEN}").alias("d"),
            F.expr(f"({PR_DAMP_NUM} * x) % {PR_DAMP_DEN}").alias("rem"),
        ).localCheckpoint(eager=True)
        r_def = dv.agg(
            F.expr(f"sum(rem) div {PR_DAMP_DEN}").cast("long").alias("r_def")
        ).collect()[0]["r_def"]
        w_rem = Window.orderBy(F.desc("rem"), F.asc("node"))
        ranks = dv.select(
            "node",
            (
                F.lit(base).cast("long")
                + F.col("d")
                + F.when(F.row_number().over(w_rem) <= F.lit(r_def), 1)
                .otherwise(0)
            ).cast("long").alias("rank"),
        )
    return (
        ranks.join(outw.withColumnRenamed("src", "node"), "node", "left")
        .select(
            F.col("node").alias("source"),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_w"),
            F.col("rank").alias("pr_rank"),
        )
    )
