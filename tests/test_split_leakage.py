"""t12_split_leakage contract: with exact-duplicate groups (identical
texts -> identical minhash signatures -> every band matches -> candidate
generation is DETERMINISTIC, Jaccard = 1 passes any threshold), the
leakage cells must equal a pure-Python count over the md5 doc-level
split."""

import hashlib
from itertools import combinations

import __spark_entry__ as entry


def _split(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 3


def test_leakage_cells_match_python(spark, tmp_path):
    texts = {
        "a": "the quick brown fox jumps over the lazy dog again and again",
        "b": "pack my box with five dozen liquor jugs for the long trip",
        "c": "sphinx of black quartz judge my vow said the old night owl",
    }
    rows = []
    for g, (key, text) in enumerate(texts.items()):
        for j in range(3):  # three exact copies per group
            rows.append((g * 10 + j, text, "en", f"src{key}", len(text)))
    rows.append((99, "completely unique text with no duplicate partner here", "en", "srcu", 52))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in entry.q_t12_split_leakage(spark, str(tmp_path)).collect()
    }

    want: dict[tuple[int, int], int] = {}
    for g in range(3):
        ids = [g * 10 + j for j in range(3)]
        for a, b in combinations(ids, 2):
            sa, sb = _split(a), _split(b)
            cell = (min(sa, sb), max(sa, sb))
            want[cell] = want.get(cell, 0) + 1
    assert got == want
    assert sum(want.values()) == 9  # 3 groups x C(3,2); unique doc contributes none
