"""Driver-checkable queries: HTML -> text extraction and the crawl
discovery/popularity signals built on it (operators/html.py). The
fixtures carry no HTML, so every entry derives the deterministic
synthetic page from the document's REAL text on BOTH engines and
checks the extraction operators' behavior on it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import html as H
from hash_db_spark.operators import web as W
from hash_db_spark.queries import Query

# Minimum extracted-text tokens for a page to enter the corpus
# (html_corpus_prep). Chosen to actually bite on the fixtures.
MIN_TOKENS = 40


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", H.synth_page("doc_id", "text").alias("page")
    )


_SQL_PAGE = H.sql_synth_page("doc_id", "text")


def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-text + title extraction over the page corpus: the stage
    that turns crawl HTML into the text column every downstream
    operator (quality, dedup, packing) consumes. One scan, all
    codegen — no UDF between page bytes and text."""
    return _pages(spark, sf_dir).select(
        "doc_id",
        H.html_title("page").alias("title"),
        H.html_main_text("page").alias("main_text"),
    )


HTML_TEXT_EXTRACT_ORACLE = f"""
SELECT doc_id,
       {H.sql_html_title(f'({_SQL_PAGE})')} AS title,
       {H.sql_html_main_text(f'({_SQL_PAGE})')} AS main_text
FROM documents
"""


def q_html_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation: for each linked-to URL, how many pages
    link to it, from how many distinct source docs, and the
    lexicographically first anchor text (deterministic representative
    description — the classic web-corpus popularity/label signal).
    Extraction is exploded map-side; ONE shuffle (the href groupBy)."""
    pairs = H.anchor_pairs(_pages(spark, sf_dir))
    return pairs.groupBy("href").agg(
        F.count("*").alias("n_refs"),
        F.countDistinct("src_doc").alias("n_docs"),
        F.min("anchor").alias("top_anchor"),
    )


HTML_ANCHOR_TEXTS_ORACLE = f"""
WITH {H.sql_anchor_pairs_cte(f'({_SQL_PAGE})')}
SELECT href,
       count(*) AS n_refs,
       count(DISTINCT src_doc) AS n_docs,
       min(anchor) AS top_anchor
FROM anchors
GROUP BY href
"""


def q_sitemap_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier discovery: parse each site's sitemap <loc> entries and
    anti-join against the paths the corpus already crawled — the URLs
    politeness-budgeted fetching should spend on next. The sitemap
    dimension is per-SITE (tiny next to the corpus), so the parse and
    the listed-path explode are dimension-sized; the crawled-path set
    is one distinct over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    crawled = docs.select(
        (F.col("doc_id") % 23).alias("site"),
        F.concat(F.lit("/a/"), (F.col("doc_id") % 13).cast("string")).alias(
            "path"
        ),
    ).distinct()
    sitemaps = crawled.select("site").distinct().withColumn(
        "sitemap", H.synth_sitemap("site")
    )
    listed = H.sitemap_paths(sitemaps)
    new = listed.join(crawled, ["site", "path"], "left_anti")
    return (
        listed.groupBy("site").agg(F.count("*").alias("n_listed"))
        .join(
            new.groupBy("site").agg(F.count("*").alias("n_new")),
            "site",
            "left",
        )
        .select(
            "site",
            "n_listed",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )


SITEMAP_DISCOVER_ORACLE = f"""
WITH crawled AS (
  SELECT DISTINCT doc_id % 23 AS site, '/a/' || (doc_id % 13) AS path
  FROM documents
),
maps AS (
  -- materialized before the unnest: the generator's correlated
  -- string_agg subquery inside a lateral unnest argument exceeds
  -- DuckDB's non-lateral-join expression depth
  SELECT site, {H.sql_synth_sitemap('site')} AS sm
  FROM (SELECT DISTINCT site FROM crawled)
),
listed AS (
  SELECT site, path
  FROM maps,
       unnest(regexp_extract_all(sm,
         '<loc>[a-z]+://[^/<]+(/[^<]*)</loc>', 1)) AS u(path)
)
SELECT l.site,
       count(*) AS n_listed,
       CAST(sum(CASE WHEN c.path IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new
FROM listed l
LEFT JOIN crawled c ON c.site = l.site AND c.path = l.path
GROUP BY l.site
"""


def q_crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop, closed: sitemap-discovered frontier (listed
    minus crawled) -> robots Disallow filter -> polite per-host fetch
    slots (Crawl-delay parsed from each host's robots). The only
    corpus-scale work is the crawled-set distinct; sites/rules/delays
    are one row per host — tiny here, but O(distinct hosts) (~1e8) on
    the real web, so the rules join is unhinted and AQE chooses
    broadcast only while it fits."""
    docs = load_table(spark, sf_dir, "documents")
    crawled = docs.select(
        (F.col("doc_id") % 23).alias("site"),
        F.concat(F.lit("/a/"), (F.col("doc_id") % 13).cast("string")).alias(
            "path"
        ),
    ).distinct()
    sitemaps = crawled.select("site").distinct().withColumn(
        "sitemap", H.synth_sitemap("site")
    )
    new = H.sitemap_paths(sitemaps).join(
        crawled, ["site", "path"], "left_anti"
    )
    tld = F.element_at(
        F.array(F.lit(".com"), F.lit(".org"), F.lit(".io"), F.lit(".co.uk")),
        (F.col("site") % 4 + 1).cast("int"),
    )
    urls = new.select(
        F.regexp_extract("path", r"/a/([0-9]+)", 1).cast("int").alias("id"),
        F.concat(
            F.lit("https://site"), F.col("site").cast("string"), tld,
            F.col("path"),
        ).alias("curl"),
        "path",
    )
    hosts = urls.select(W.url_host("curl").alias("host")).distinct()
    rules = hosts.select(
        "host",
        W.robots_disallow_prefixes(W.synth_robots("host")).alias("rules"),
    )
    withrules = urls.withColumn("host", W.url_host("curl")).join(
        rules, "host"
    )
    allowed = withrules.filter(
        ~F.exists(F.col("rules"), lambda p: F.col("path").startswith(p))
    ).select("id", "curl")
    return W.fetch_schedule(allowed, url_col="curl", id_col="id")


CRAWL_FRONTIER_SCHEDULE_ORACLE = f"""
WITH crawled AS (
  SELECT DISTINCT doc_id % 23 AS site, '/a/' || (doc_id % 13) AS path
  FROM documents
),
maps AS (
  SELECT site, {H.sql_synth_sitemap('site')} AS sm
  FROM (SELECT DISTINCT site FROM crawled)
),
listed AS (
  SELECT site, path
  FROM maps,
       unnest(regexp_extract_all(sm,
         '<loc>[a-z]+://[^/<]+(/[^<]*)</loc>', 1)) AS u(path)
),
new AS (
  SELECT l.site, l.path
  FROM listed l
  LEFT JOIN crawled c ON c.site = l.site AND c.path = l.path
  WHERE c.path IS NULL
),
allowed AS (
  SELECT site, path,
         CAST(regexp_extract(path, '/a/([0-9]+)', 1) AS INT) AS id,
         'site' || site || (['.com', '.org', '.io', '.co.uk'][site % 4 + 1])
           AS host
  FROM new
  WHERE NOT (starts_with(path, '/a/' || ((site * 5 + 1) % 13))
             OR site % 19 = 0)
),
s AS (
  SELECT id, host,
         row_number() OVER (PARTITION BY host ORDER BY id) - 1 AS slot,
         1 + (site % 5) AS delay
  FROM allowed
)
SELECT id, host, CAST(slot AS INT) AS slot,
       CAST(slot * delay AS BIGINT) AS fetch_at
FROM s
"""


def q_html_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page -> corpus document as ONE plan: extract main text, gate on
    extracted token count, and attach the inlink-popularity signal
    (how many pages link to this document's targets... to THIS doc).
    Inlinks ride the closed-form link-target explosion grouped once;
    the gate is a map-side filter on the extracted column. Two
    shuffles total (inlink groupBy + join)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Stage the synthesized page as a NAMED column (the _pages idiom):
    # inlining synth_page into both extractors evaluates the whole
    # page-construction expression twice per row — Catalyst does not CSE
    # across projection items (the ewma/lang-id lesson).
    extracted = docs.select(
        "doc_id", H.synth_page("doc_id", "text").alias("page")
    ).select(
        "doc_id",
        H.html_title("page").alias("title"),
        H.html_main_text("page").alias("main_text"),
    ).select(
        "doc_id",
        "title",
        F.size(F.split("main_text", r"\s+")).alias("n_tokens"),
    ).filter(F.col("n_tokens") >= MIN_TOKENS)
    inlinks = (
        docs.select(F.explode(W.link_targets("doc_id")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n_inlinks"))
    )
    return (
        extracted.join(inlinks, extracted.doc_id == inlinks.t, "left")
        .select(
            "doc_id",
            "title",
            "n_tokens",
            F.coalesce("n_inlinks", F.lit(0)).alias("n_inlinks"),
        )
    )


def _html_corpus_prep_oracle() -> str:
    """Token count twin: Spark's size(split(s, '\\s+')) counts the
    fields of a whitespace split — for the canonicalized extract
    (single spaces/newlines, no leading/trailing whitespace, never
    empty on these fixtures) that is exactly (number of whitespace
    runs) + 1."""
    main = H.sql_html_main_text(f"({_SQL_PAGE})")
    links = W.sql_link_targets_cte()
    return f"""
WITH {links},
extracted AS (
  SELECT doc_id,
         {H.sql_html_title(f'({_SQL_PAGE})')} AS title,
         length(regexp_replace({main}, '\\s', '', 'g')) AS n_nonws,
         length({main}) AS n_all
  FROM documents
),
gated AS (
  SELECT doc_id, title,
         (n_all - n_nonws) + 1 AS n_tokens
  FROM extracted
  WHERE (n_all - n_nonws) + 1 >= {MIN_TOKENS}
),
inlinks AS (
  SELECT t, count(*) AS n_inlinks FROM links GROUP BY t
)
SELECT g.doc_id, g.title, g.n_tokens,
       CAST(coalesce(i.n_inlinks, 0) AS BIGINT) AS n_inlinks
FROM gated g
LEFT JOIN inlinks i ON i.t = g.doc_id
"""


QUERIES: dict[str, Query] = {
    "html_text_extract": Query(q_html_text_extract, HTML_TEXT_EXTRACT_ORACLE),
    "html_anchor_texts": Query(q_html_anchor_texts, HTML_ANCHOR_TEXTS_ORACLE),
    "sitemap_discover": Query(q_sitemap_discover, SITEMAP_DISCOVER_ORACLE),
    "crawl_frontier_schedule": Query(
        q_crawl_frontier_schedule, CRAWL_FRONTIER_SCHEDULE_ORACLE
    ),
    "html_corpus_prep": Query(q_html_corpus_prep, _html_corpus_prep_oracle()),
}


PREFIX_CHARS = 80  # positive/negative passage prefix length


def q_anchor_query_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph supervision for retrieval training (the anchor-text
    pretraining task of Chang et al., ICLR 2020 — public): every anchor
    becomes a (query, positive passage) pair — the anchor TEXT is the
    query, the linked-to document's leading passage is the positive —
    plus one content-addressed random negative (hash of src#anchor,
    bumped off the positive on collision). The zero-annotation
    contrastive set a web corpus gives away for free.

    Scale shape: anchor extraction is exploded map-side (one codegen
    regexp pass); the positive and negative lookups are two equijoins
    of the pair stream against the documents table on its key — plain
    co-partitioned shuffle joins, nothing corpus-sized is broadcast or
    collected. The modulo negative assumes the fixture's dense doc_id
    space; a sparse id space drops identical rows on both engines (the
    joins are inner on both sides)."""
    from hash_db_spark.operators.curation import sample_u

    pairs = H.anchor_pairs(_pages(spark, sf_dir))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, PREFIX_CHARS).alias("prefix")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    x = pairs.select(
        "src_doc",
        "anchor",
        F.regexp_extract("anchor", r"ref ([0-9]+)", 1)
        .cast("long")
        .alias("pos_id"),
    ).crossJoin(F.broadcast(n))
    neg0 = sample_u(
        F.concat(F.col("src_doc").cast("string"), F.lit("#"), F.col("anchor"))
    ) % F.col("n_docs")
    x = x.withColumn(
        "neg_id",
        F.when(neg0 == F.col("pos_id"), (neg0 + 1) % F.col("n_docs"))
        .otherwise(neg0),
    )
    return (
        x.join(
            docs.withColumnRenamed("doc_id", "pos_id").withColumnRenamed(
                "prefix", "pos_prefix"
            ),
            "pos_id",
        )
        .join(
            docs.withColumnRenamed("doc_id", "neg_id").withColumnRenamed(
                "prefix", "neg_prefix"
            ),
            "neg_id",
        )
        .select(
            "src_doc", "anchor", "pos_id", "neg_id",
            "pos_prefix", "neg_prefix",
        )
    )


def _anchor_query_pairs_oracle() -> str:
    from hash_db_spark.operators.curation import sql_sample_u

    u = sql_sample_u("src_doc::VARCHAR || '#' || anchor")
    return f"""
WITH {H.sql_anchor_pairs_cte(f'({_SQL_PAGE})')},
n AS (SELECT count(*) AS n_docs FROM documents),
x AS (
  SELECT src_doc, anchor,
         CAST(regexp_extract(anchor, 'ref ([0-9]+)', 1) AS BIGINT)
           AS pos_id,
         {u} % (SELECT n_docs FROM n) AS neg0
  FROM anchors
),
z AS (
  SELECT src_doc, anchor, pos_id,
         CASE WHEN neg0 = pos_id
              THEN (neg0 + 1) % (SELECT n_docs FROM n)
              ELSE neg0 END AS neg_id
  FROM x
)
SELECT z.src_doc, z.anchor, z.pos_id, z.neg_id,
       substring(p.text, 1, {PREFIX_CHARS}) AS pos_prefix,
       substring(ng.text, 1, {PREFIX_CHARS}) AS neg_prefix
FROM z
JOIN documents p ON p.doc_id = z.pos_id
JOIN documents ng ON ng.doc_id = z.neg_id
"""


# r12 QUEUE CANDIDATE (session 9):
#   "anchor_query_pairs": Query(
#       q_anchor_query_pairs, _anchor_query_pairs_oracle()),
