"""canonical_url contract: each rule fires exactly where it should —
scheme/host-case/www/utm/fragment/trailing-slash variants of the same
resource canonicalize identically, while genuinely different resources
(a different path, a surviving meaningful param) stay distinct. The
'&'→'?' promotion (rule 3) must fire only when a stripped leading
utm param stranded a survivor, never on a legitimate '&' after '?'."""

from pyspark.sql import functions as F

from extraction.textops import canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select("u", canonical_url(F.col("u")).alias("c")).collect()
    return {r["u"]: r["c"] for r in rows}


def test_equivalent_variants_merge(spark):
    variants = [
        "http://example.com/a/b",
        "https://example.com/a/b",
        "https://www.example.com/a/b",
        "https://EXAMPLE.com/a/b",
        "http://Example.COM/a/b/",
        "https://example.com/a/b#frag",
        "https://example.com/a/b?utm_source=x&utm_campaign=y",
        "https://example.com/a/b/?utm_medium=z#sec2",
    ]
    got = _canon(spark, variants)
    assert set(got.values()) == {"example.com/a/b"}


def test_distinct_resources_stay_distinct(spark):
    got = _canon(
        spark,
        [
            "https://example.com/a/b",
            "https://example.com/a/B",  # path case matters
            "https://example.com/a",
            "https://example.com/a/b?page=2",
            "https://other.com/a/b",
        ],
    )
    assert len(set(got.values())) == 5


def test_stranded_param_promotion(spark):
    got = _canon(
        spark,
        [
            # utm first, survivor stranded -> '&page=2' promoted to '?page=2'
            "https://example.com/p?utm_source=x&page=2",
            # survivor first, utm stripped cleanly
            "https://example.com/p?page=2&utm_source=x",
            # plain form
            "https://example.com/p?page=2",
        ],
    )
    assert set(got.values()) == {"example.com/p?page=2"}
    # legitimate '&' after a real '?' is untouched
    got2 = _canon(spark, ["https://example.com/p?page=2&sort=asc"])
    assert list(got2.values()) == ["example.com/p?page=2&sort=asc"]


def test_trailing_slash_before_query(spark):
    got = _canon(
        spark,
        [
            "https://example.com/p/?page=2",
            "https://example.com/p?page=2",
            "https://example.com/",
            "https://example.com",
        ],
    )
    assert got["https://example.com/p/?page=2"] == "example.com/p?page=2"
    assert got["https://example.com/"] == "example.com"
    assert got["https://example.com"] == "example.com"
