"""URL canonicalization (functions/urls.py).

Semantics under test: the six documented rules (fragment, scheme/host
case, default ports, tracking params, duplicate/trailing slashes), their
interaction in one expression, idempotence, and the dedup use: trivially
variant URLs of the same resource fold to one identity key.
"""

from pyspark.sql import functions as F

from genome_deduplication_spark.functions.urls import canonicalize_url

CASES = [
    ("http://Example.COM/Path/Page#frag", "http://example.com/Path/Page"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),  # real port kept
    ("http://e.com/p?utm_source=x&id=3", "http://e.com/p?id=3"),
    ("http://e.com/p?id=3&utm_source=x", "http://e.com/p?id=3"),
    ("http://e.com/p?utm_source=x", "http://e.com/p"),
    ("http://e.com/p?gclid=abc&fbclid=d&id=1", "http://e.com/p?id=1"),
    ("http://e.com//a///b/", "http://e.com/a/b"),
    ("http://e.com/", "http://e.com/"),  # root slash kept
    ("http://e.com/a/", "http://e.com/a"),
    ("HTTP://E.com:80//x//y/?utm_medium=m&q=1#top", "http://e.com/x/y?q=1"),
    ("http://e.com/CaseSensitive/Path", "http://e.com/CaseSensitive/Path"),
    # slashes in the QUERY are values, not structure — never rewritten
    (
        "https://h.com/login?next=//partner.example/x",
        "https://h.com/login?next=//partner.example/x",
    ),
    ("http://e.com//a//b?next=//x//y/", "http://e.com/a/b?next=//x//y/"),
    ("http://e.com/a/?next=/p/", "http://e.com/a?next=/p/"),
]


def test_query_slash_variants_stay_distinct(spark):
    # the bug this guards: collapsing '//' inside query values folded two
    # different redirect targets into one canonical identity
    df = spark.createDataFrame(
        [
            ("https://h.com/login?next=//partner.example/x",),
            ("https://h.com/login?next=/partner.example/x",),
        ],
        "url string",
    )
    keys = df.select(canonicalize_url(F.col("url")).alias("k"))
    assert keys.distinct().count() == 2


def test_canonicalize_rules_and_idempotence(spark):
    df = spark.createDataFrame(CASES, "u string, want string")
    got = df.select(
        "u",
        "want",
        canonicalize_url(F.col("u")).alias("c1"),
    ).select("u", "want", "c1", canonicalize_url(F.col("c1")).alias("c2"))
    for r in got.collect():
        assert r["c1"] == r["want"], (r["u"], r["c1"])
        assert r["c2"] == r["c1"], f"not idempotent: {r['c1']} -> {r['c2']}"


def test_variant_urls_fold_to_one_key(spark):
    variants = [
        "http://News.Example.com:80/story/42?utm_source=tw#para3",
        "http://news.example.com/story/42/",
        "http://news.example.com//story//42",
        "http://news.example.com/story/42?utm_medium=mail&utm_campaign=x",
    ]
    other = "http://news.example.com/story/43"
    df = spark.createDataFrame(
        [(u,) for u in variants + [other]], "url string"
    )
    keys = df.select(canonicalize_url(F.col("url")).alias("k"))
    assert keys.distinct().count() == 2
    top = keys.groupBy("k").count().orderBy(F.desc("count")).first()
    assert top["count"] == 4 and top["k"] == "http://news.example.com/story/42"


def test_canonicalize_is_shuffle_free(spark):
    df = spark.createDataFrame([("http://a.b/c",)], "url string")
    plan = (
        df.select(canonicalize_url(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
