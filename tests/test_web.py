"""Unit tests for URL/host curation operators on controlled inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from hash_db_spark.operators import web as W


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r.c for r in df.select(W.canonicalize_url("url").alias("c")).collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Site1.COM:80/a/1/?utm_campaign=x&page=2#frag",
            "https://site2.org:443/a/2",
            "https://site3.io/a/3?utm_source=a&utm_medium=b",
            "https://site4.com/a/4?page=1&fbclid=zzz",
            "https://site5.com/",          # root slash survives
            "http://site6.com:8080/x",     # non-default port survives
            "https://site7.com/A/Case",    # path case is significant
        ],
    )
    assert got == [
        "http://www.site1.com/a/1?page=2",
        "https://site2.org/a/2",
        "https://site3.io/a/3",
        "https://site4.com/a/4?page=1",
        "https://site5.com/",
        "http://site6.com:8080/x",
        "https://site7.com/A/Case",
    ]


def test_registrable_domain_longest_match(spark):
    hosts = spark.createDataFrame(
        [
            ("www.example.co.uk",),   # multi-label suffix wins over .uk
            ("cdn.example.com",),
            ("example.com",),
            ("co.uk",),               # bare suffix -> no registrable domain
            ("localhost",),           # no dot -> NULL
            ("thing.unknowntld",),    # unmatched suffix -> NULL
        ],
        ["host"],
    )
    got = {r.host: r.domain for r in W.registrable_domain(hosts).collect()}
    assert got == {
        "www.example.co.uk": "example.co.uk",
        "cdn.example.com": "example.com",
        "example.com": "example.com",
        "co.uk": None,
        "localhost": None,
        "thing.unknowntld": None,
    }


def test_url_dedup_collapses_tracking_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?utm_source=t"),
            (2, "https://a.com/x/"),
            (3, "HTTPS://a.com/x"),
            (4, "https://a.com/y"),
        ],
        ["doc_id", "url"],
    )
    got = {
        r.curl: (r.keep_id, r.n_dups) for r in W.url_dedup(df).collect()
    }
    assert got == {
        "https://a.com/x": (1, 3),
        "https://a.com/y": (4, 1),
    }


def test_host_caps_fold_subdomains(spark):
    """Two subdomains of one registrable domain share ONE cap budget."""
    from hash_db_spark.operators.sampling import per_group_cap

    rows = [(i, f"{'www' if i % 2 else 'cdn'}.ex.co.uk") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "host"])
    dim = W.registrable_domain(docs.select("host"))
    withdom = docs.join(F.broadcast(dim), "host")
    kept = per_group_cap(withdom, "doc_id", "domain", 3).collect()
    assert len(kept) == 3
    assert all(r.domain == "ex.co.uk" for r in kept)
