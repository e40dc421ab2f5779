"""dedup.substring_run_pairs: exact duplicated-substring runs.

With max_df high enough that nothing is pruned, max_run_tokens must
equal the token-level longest-common-substring length for every pair
whose LCS reaches min_tokens — pinned against an O(n²) DP mirror.
(The >=2 occurrence prune can never remove a MATCHING position pair:
a shingle shared by two docs has at least two occurrences by
definition, so only the max_df cap approximates.)
"""

import random
import re

import pytest

from extraction.dedup import substring_run_pairs


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return [w for w in re.split(r"\s+", t) if w]


def _lcs_tokens(a: list[str], b: list[str]) -> int:
    """Token-level longest common substring via DP."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _mirror_pairs(rows, k, min_tokens):
    toks = {i: _norm_tokens(t) for i, t in rows}
    want = {}
    ids = sorted(toks)
    for xi in range(len(ids)):
        for yi in range(xi + 1, len(ids)):
            a, b = ids[xi], ids[yi]
            lcs = _lcs_tokens(toks[a], toks[b])
            if lcs >= min_tokens:
                want[(a, b)] = lcs
    return want


def test_planted_runs_exact_lengths(spark):
    run9 = "alpha beta gamma delta epsilon zeta eta theta iota"
    run12 = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (0, f"opening words here {run9} and a tail of misc text"),
        (1, f"{run9} leads this document with other unique content"),
        (2, f"padding front material {run12} trailing remainder words"),
        (3, f"start {run12} finish"),
        (4, "entirely unrelated maritime navigation content thanks"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["max_run_tokens"]
        for r in substring_run_pairs(
            df, "text", "doc_id", k=4, min_tokens=8, max_df=1000
        ).collect()
    }
    assert got == {(0, 1): 9, (2, 3): 12}


@pytest.mark.parametrize("seed", [5, 31])
def test_matches_dp_mirror(spark, seed):
    """Random corpus with planted shared spans: Spark's max_run_tokens
    must equal the DP token-LCS for every reported pair, and the pair
    SET must match (nothing pruned at max_df=10^6)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    base = [rng.choice(vocab) for _ in range(200)]
    rows = []
    for i in range(24):
        n = rng.randrange(12, 60)
        if i % 3 == 0:  # splice a shared span from the base stream
            start = rng.randrange(0, 150)
            ln = rng.randrange(6, 20)
            words = (
                [rng.choice(vocab) for _ in range(n // 2)]
                + base[start : start + ln]
                + [rng.choice(vocab) for _ in range(n // 2)]
            )
        else:
            words = [rng.choice(vocab) for _ in range(n)]
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    got = {
        (r["id_a"], r["id_b"]): r["max_run_tokens"]
        for r in substring_run_pairs(
            df, "text", "doc_id", k=4, min_tokens=8, max_df=10**6
        ).collect()
    }
    want = _mirror_pairs(rows, k=4, min_tokens=8)
    assert got == want
    assert len(want) > 0  # the planted spans must actually surface
