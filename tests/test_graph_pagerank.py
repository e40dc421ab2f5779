"""graph.pagerank contract: the Spark integer PageRank must equal a
trivial pure-Python reference on a handcrafted corpus — same outlink
derivation, self-loop drop, weighted contributions, floor divisions,
and dangling/no-inlink behavior."""

from collections import defaultdict

import __spark_entry__ as entry


def _python_pagerank(rows, iters=3, scale=1_000_000):
    n = len(rows)
    src_of = {i: s for i, _, s in rows}
    edges = defaultdict(int)
    for i, _, s in rows:
        for a, b in ((31, 7), (17, 3)):
            dst = src_of[(i * a + b) % n]
            if dst != s:
                edges[(s, dst)] += 1
    outw = defaultdict(int)
    for (s, _), m in edges.items():
        outw[s] += m
    nodes = sorted({s for _, _, s in rows})
    rank = {v: scale for v in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for (s, d), m in edges.items():
            contrib[d] += (rank[s] * m) // outw[s]
        rank = {v: 150000 + (85 * contrib[v]) // 100 for v in nodes}
    return {v: (outw[v], rank[v]) for v in nodes}


def test_pagerank_matches_python_reference(spark, tmp_path):
    # 3 domains over 7 docs; uneven doc counts make weighted edges and
    # at least one hub/leaf asymmetry
    rows = [
        (0, "t", "a.com"), (1, "t", "a.com"), (2, "t", "a.com"),
        (3, "t", "a.com"), (4, "t", "b.com"), (5, "t", "b.com"),
        (6, "t", "c.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: (r["out_w"], r["pr_rank"])
        for r in entry.q_graph_pagerank(spark, str(tmp_path)).collect()
    }
    want = _python_pagerank(rows)
    assert got == want

    # rank mass sanity: every node >= teleport base, and the total in
    # (0, n_nodes*scale] (dangling/floor loss only ever shrinks mass)
    assert all(r >= 150000 for _, r in got.values())
    assert sum(r for _, r in got.values()) <= len(got) * 1_000_000
