"""HTML -> text extraction: handcrafted spec pins, a Python re model
for property parity, and the sitemap/anchor parses."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# SPARK_GRAFT_HYP_EXAMPLES overrides the per-test example budget for an
# extended fuzz pass (0/unset keeps the defaults) — same knob as
# tests/test_properties.py.
import os

_HYP_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "0"))

from hash_db_spark.operators import html as H


def _extract(spark, pages: list[str]) -> list[str]:
    df = spark.createDataFrame([(p,) for p in pages], "page string")
    return [
        r.t for r in df.select(H.html_main_text("page").alias("t")).collect()
    ]


# --- Python model of the module spec (same rules, same order) ---------------


def model_main_text(h: str) -> str:
    h = re.sub(r"(?s)<head\b.*?</head>", "", h)
    h = re.sub(r"(?s)<script\b[^>]*>.*?</script>", "", h)
    h = re.sub(r"(?s)<style\b[^>]*>.*?</style>", "", h)
    h = re.sub(r"(?s)<!--.*?-->", "", h)
    h = re.sub(r"</(?:p|div|h[1-6]|li|ul|ol|table|tr|td|blockquote)>|<br ?/?>",
               "\n", h)
    h = re.sub(r"<[^>]+>", " ", h)
    for pat, rep in H._ENTITIES:
        h = h.replace(pat, rep)
    h = re.sub(r"[ \t]+", " ", h)
    h = re.sub(r" ?\n ?", "\n", h)
    h = re.sub(r"\n+", "\n", h)
    return re.sub(r"^\s+|\s+$", "", h)


def model_title(h: str) -> str:
    t = m.group(1) if (m := re.search(r"(?s)<title>(.*?)</title>", h)) else ""
    for pat, rep in H._ENTITIES:
        t = t.replace(pat, rep)
    return re.sub(r"\s+", " ", t).strip()


def test_main_text_handcrafted(spark):
    page = (
        "<html><head><title>skip me</title><style>b { x }</style></head>"
        "<body><h1>Top</h1><p>one two</p><div>three</div>"
        "<script>if (a > b) { alert('<p>'); }</script>"
        "<p>tail &lt;x&gt; &amp; more</p></body></html>"
    )
    assert _extract(spark, [page]) == ["Top\none two\nthree\ntail <x> & more"]


def test_blank_blocks_and_breaks(spark):
    page = "<body><p>a</p><div>   </div><p></p>b<br>c<br/>d<br />e</body>"
    assert _extract(spark, [page]) == ["a\nb\nc\nd\ne"]


def test_entity_decode_order(spark):
    # &amp; decodes LAST: '&amp;lt;' is the literal text '&lt;', not '<'
    assert _extract(spark, ["<p>&amp;lt; &nbsp;&#39;&quot;</p>"]) == [
        "&lt; '\""
    ]


def test_inline_tags_become_word_boundaries(spark):
    assert _extract(spark, ["<p>one<b>two</b>three</p>"]) == ["one two three"]


def test_title_extraction(spark):
    df = spark.createDataFrame(
        [("<head><title>  a &amp;\tb </title></head>",), ("<p>no</p>",)],
        "page string",
    )
    out = [r.t for r in df.select(H.html_title("page").alias("t")).collect()]
    assert out == ["a & b", ""]


TEXTS = st.text(
    alphabet="abc &<>\"'", min_size=0, max_size=90
).map(lambda s: s.strip())


@settings(max_examples=_HYP_EXAMPLES or 30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10_000), TEXTS),
                min_size=1, max_size=8))
def test_generator_extraction_matches_model(spark, cases):
    """Spark extraction == the Python re model on generated pages whose
    embedded text includes raw &<>'\" noise (the generator does not
    escape; the extractor's tag/entity rules apply to whatever
    results — both engines must agree on that, whatever it is)."""
    df = spark.createDataFrame(cases, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        H.synth_page("doc_id", "text").alias("page"),
    ).withColumn("t", H.html_main_text("page")).withColumn(
        "ttl", H.html_title("page")
    ).collect()
    for r in rows:
        assert r.t == model_main_text(r.page), r.page
        assert r.ttl == model_title(r.page), r.page


def test_anchor_pairs_extraction(spark):
    pages = spark.createDataFrame(
        [
            (1, '<a href="u1">one</a> x <a href="u2" class=c>two words</a>'),
            (2, "<a href='single'>skip</a><a href=\"u1\">again</a>"),
            (3, "no links"),
        ],
        "doc_id long, page string",
    )
    got = {
        (r.src_doc, r.href, r.anchor)
        for r in H.anchor_pairs(pages).collect()
    }
    assert got == {(1, "u1", "one"), (1, "u2", "two words"),
                   (2, "u1", "again")}


def test_sitemap_paths_parse(spark):
    maps = spark.createDataFrame(
        [(7, '<?xml version="1.0"?><urlset>'
              "<url><loc>https://site7.org/a/0</loc></url>"
              "<url><loc>https://site7.org/a/11</loc></url></urlset>")],
        "site long, sitemap string",
    )
    got = sorted(
        (r.site, r.path) for r in H.sitemap_paths(maps).collect()
    )
    assert got == [(7, "/a/0"), (7, "/a/11")]


def test_corpus_prep_gate_bites(spark, sf_dir):
    from hash_db_spark.queries.html_queries import (
        MIN_TOKENS,
        q_html_corpus_prep,
    )

    out = q_html_corpus_prep(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) < 500  # the token gate drops some docs
    assert all(r.n_tokens >= MIN_TOKENS for r in rows)
    assert all(r.n_inlinks >= 0 for r in rows)


def test_extraction_is_pure_codegen(spark, sf_dir):
    """No Python between page bytes and text: the extraction entry's
    plan has no MapInPandas/BatchEvalPython nodes."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.html_queries import q_html_text_extract

    plan = formatted_plan(q_html_text_extract(spark, sf_dir))
    assert "MapInPandas" not in plan
    assert "EvalPython" not in plan


def test_frontier_schedule_politeness(spark, sf_dir):
    """Scheduled frontier URLs were never crawled, never disallowed,
    and per-host slots are dense from 0 with fetch_at = slot * delay."""
    from collections import defaultdict

    from hash_db_spark.queries.html_queries import (
        q_crawl_frontier_schedule,
        q_sitemap_discover,
    )

    rows = q_crawl_frontier_schedule(spark, sf_dir).collect()
    assert rows
    per_host = defaultdict(list)
    for r in rows:
        per_host[r.host].append(r)
    for host, hs in per_host.items():
        site = int(host.split("site")[1].split(".")[0])
        assert site % 19 != 0, host  # block-all sites never scheduled
        delay = 1 + site % 5
        hs.sort(key=lambda r: r.slot)
        assert [r.slot for r in hs] == list(range(len(hs))), host
        blocked_prefix = str((site * 5 + 1) % 13)
        for r in hs:
            assert r.fetch_at == r.slot * delay, host
            # robots prefix semantics: '/a/1' blocks '/a/12' too
            assert not str(r.id).startswith(blocked_prefix), host

    # scheduled ids are even (sitemaps list even paths only) and the
    # schedule is bounded by the discovered frontier
    assert all(r.id % 2 == 0 for r in rows)
    n_new = sum(
        r.n_new for r in q_sitemap_discover(spark, sf_dir).collect()
    )
    assert 0 < len(rows) <= n_new


class TestAnchorQueryPairs:
    """Link-graph contrastive pairs
    (queries/html_queries.py:q_anchor_query_pairs)."""

    def test_pairs_shape_and_negatives_differ(self, spark, sf_dir):
        from hash_db_spark.queries.html_queries import q_anchor_query_pairs

        rows = q_anchor_query_pairs(spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows[:50]:
            assert r.anchor == f"ref {r.pos_id}"
            assert r.neg_id != r.pos_id
            assert r.pos_prefix and r.neg_prefix

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.html_queries import (
            _anchor_query_pairs_oracle,
            q_anchor_query_pairs,
        )

        got = sorted(tuple(r) for r in q_anchor_query_pairs(spark, sf_dir).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_anchor_query_pairs_oracle()).fetchall()
        )
        con.close()
        assert got == want and len(got) > 0
