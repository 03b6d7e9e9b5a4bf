"""Driver-checkable queries: URL / host-level crawl curation
(operators/web.py). The fixtures carry no URLs, so every entry derives
the deterministic synthetic URL from doc_id on BOTH engines and checks
the curation operators' behavior on it (the synth-payload discipline of
the multimodal entries)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import web as W
from hash_db_spark.queries import Query

from hash_db_spark.localframe import local_frame


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize-then-collapse: one survivor per canonical URL with
    the duplicate count — the cheapest dedup stage of crawl prep,
    running long before any content hash."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_url("doc_id").alias("url")
    )
    return W.url_dedup(docs)


URL_DEDUP_ORACLE = f"""
SELECT {W.sql_canonicalize_url(W.sql_synth_url('doc_id'))} AS curl,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents
GROUP BY curl
"""


def q_url_host_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (host, registrable domain) dimension over the corpus's
    distinct hosts — longest public-suffix match against the broadcast
    suffix table (multi-label suffixes like co.uk included)."""
    docs = _docs(spark, sf_dir)
    hosts = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("host")
    )
    return W.registrable_domain(hosts)


URL_HOST_DOMAINS_ORACLE = W.sql_registrable_domain(
    f"SELECT {W.sql_url_host(W.sql_canonicalize_url(W.sql_synth_url('doc_id')))}"
    " AS host FROM documents"
)


def q_host_doc_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain document cap (5): subdomains fold into one
    budget, selection is content-addressed (md5 of doc_id) so the kept
    set is reproducible and append-stable. Composition: host extraction
    -> registrable-domain dimension join -> per_group_cap window. The
    host->domain dimension is keyed by the corpus's DISTINCT HOSTS —
    tiny on these fixtures but ~1e8 rows on the real web — so the join
    carries NO broadcast hint: AQE broadcasts it while it fits and
    falls back to a shuffle join at web scale. (Only the ~10k-row PSL
    inside registrable_domain is force-broadcast — that one is
    genuinely scale-invariant.)"""
    from hash_db_spark.operators.sampling import per_group_cap

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("host"),
    )
    dim = W.registrable_domain(docs.select("host"))
    withdom = docs.join(dim, "host")
    return per_group_cap(withdom, "doc_id", "domain", 5).select(
        "doc_id", "host", "domain"
    )


def _host_doc_caps_oracle() -> str:
    from hash_db_spark.operators.sampling import sql_per_group_cap

    host = W.sql_url_host(W.sql_canonicalize_url(W.sql_synth_url("doc_id")))
    dim = W.sql_registrable_domain(
        f"SELECT {host} AS host FROM documents"
    )
    return sql_per_group_cap(
        f"""(
  SELECT d.doc_id, d.host, dim.domain
  FROM (SELECT doc_id, {host} AS host FROM documents) d
  JOIN ({dim}) dim ON dim.host = d.host
)""",
        "doc_id",
        "domain",
        5,
        select="doc_id, host, domain",
    )


def q_crawl_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole crawl-curation front end as ONE Catalyst plan (the web
    analog of train_prep): WARC bytes -> length-framed response
    extraction -> status/mime gate -> canonical URL dedup (keep-first)
    -> registrable-domain dimension -> per-domain document cap. One
    Arrow decode pass, two shuffles (url group, domain window). The
    host->domain dimension is O(distinct hosts) (~1e8 on the real
    web), so its join is unhinted — AQE broadcasts while it fits,
    shuffle-joins at scale."""
    from hash_db_spark.operators.sampling import per_group_cap
    from hash_db_spark.sources import warc

    docs = load_table(spark, sf_dir, "documents")
    recs = warc.warc_records(warc.synth_warc_media(docs, "doc_id"))
    ok = recs.filter(
        (F.col("status") == 200) & (F.col("mime") == "text/html")
    )
    dedup = W.url_dedup(ok, url_col="url", id_col="media_id")
    # hosted feeds BOTH the domain dimension and the cap join, and
    # Spark re-executes an un-materialized subplan once per consumer
    # (mapInPandas output carries no reusable exchange) — without the
    # checkpoint the Arrow WARC decode runs twice. The checkpointed
    # frame is the post-dedup URL set: tiny next to the crawl.
    hosted = (
        dedup.withColumn("host", W.url_host("curl"))
        .localCheckpoint(eager=True)
    )
    dim = W.registrable_domain(hosted.select("host"))
    withdom = hosted.join(dim, "host")
    return per_group_cap(withdom, "keep_id", "domain", 5).select(
        F.col("keep_id").alias("doc_id"), "curl", "domain", "n_dups"
    )


def _crawl_prep_oracle() -> str:
    from hash_db_spark.operators.sampling import sql_per_group_cap

    curl = W.sql_canonicalize_url(W.sql_synth_url("doc_id"))
    base = (
        f"(SELECT doc_id, {curl} AS curl FROM documents "
        "WHERE doc_id % 17 != 0 AND doc_id % 13 != 0)"
    )
    dedup = (
        f"(SELECT curl, min(doc_id) AS keep_id, count(*) AS n_dups "
        f"FROM {base} GROUP BY curl)"
    )
    host = W.sql_url_host("curl")
    hosted = f"(SELECT d.*, {host} AS host FROM {dedup} d)"
    dim = W.sql_registrable_domain(f"SELECT host FROM {hosted} h")
    joined = (
        f"(SELECT h.*, dim.domain FROM {hosted} h "
        f"JOIN ({dim}) dim ON dim.host = h.host)"
    )
    return sql_per_group_cap(
        joined, "keep_id", "domain", 5,
        select="keep_id AS doc_id, curl, domain, n_dups",
    )


def q_crawl_prep_polite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crawl_prep with the politeness stage a compliant pipeline must
    run: WARC extraction -> status/mime gate -> URL dedup -> robots
    Disallow filter (rules REALLY parsed, one row per host) ->
    registrable-domain cap. Still ONE plan: the robots stage adds one
    join + a codegen exists(). Both the rules frame and the
    host->domain dimension are O(distinct hosts) (~1e8 on the real
    web), so neither join is hinted — AQE broadcasts them while they
    fit and shuffle-joins at scale."""
    from hash_db_spark.operators.sampling import per_group_cap
    from hash_db_spark.sources import warc

    docs = load_table(spark, sf_dir, "documents")
    recs = warc.warc_records(warc.synth_warc_media(docs, "doc_id"))
    ok = recs.filter(
        (F.col("status") == 200) & (F.col("mime") == "text/html")
    )
    dedup = W.url_dedup(ok, url_col="url", id_col="media_id")
    # Four consumers of hosted (robots rules, robots join, domain dim,
    # cap join) — checkpoint once or the Arrow WARC decode runs 4x
    # (same re-execution trap as crawl_prep; see comment there).
    hosted = (
        dedup.withColumn("host", W.url_host("curl"))
        .withColumn(
            "path", F.regexp_replace(F.col("curl"), r"^[a-z]+://[^/]+", "")
        )
        .localCheckpoint(eager=True)
    )
    rules = (
        hosted.select("host")
        .distinct()
        .select(
            "host",
            W.robots_disallow_prefixes(W.synth_robots("host")).alias("rules"),
        )
    )
    allowed = (
        hosted.join(rules, "host")
        .filter(
            ~F.exists(F.col("rules"), lambda p: F.col("path").startswith(p))
        )
        .drop("rules", "path")
    )
    dim = W.registrable_domain(allowed.select("host"))
    withdom = allowed.join(dim, "host")
    return per_group_cap(withdom, "keep_id", "domain", 5).select(
        F.col("keep_id").alias("doc_id"), "curl", "domain", "n_dups"
    )


def _crawl_prep_polite_oracle() -> str:
    from hash_db_spark.operators.sampling import sql_per_group_cap

    curl = W.sql_canonicalize_url(W.sql_synth_url("doc_id"))
    base = (
        f"(SELECT doc_id, {curl} AS curl FROM documents "
        "WHERE doc_id % 17 != 0 AND doc_id % 13 != 0)"
    )
    dedup = (
        f"(SELECT curl, min(doc_id) AS keep_id, count(*) AS n_dups "
        f"FROM {base} GROUP BY curl)"
    )
    host = W.sql_url_host("curl")
    hosted = (
        f"(SELECT d.*, {host} AS host, "
        f"regexp_replace(curl, '^[a-z]+://[^/]+', '') AS path FROM {dedup} d)"
    )
    sn = "CAST(regexp_extract(host, 'site([0-9]+)', 1) AS INT)"
    allowed = (
        f"(SELECT keep_id, curl, n_dups, host FROM {hosted} h "
        f"WHERE NOT (starts_with(path, '/a/' || (({sn} * 5 + 1) % 13)) "
        f"OR {sn} % 19 = 0))"
    )
    dim = W.sql_registrable_domain(f"SELECT host FROM {allowed} a")
    joined = (
        f"(SELECT a.*, dim.domain FROM {allowed} a "
        f"JOIN ({dim}) dim ON dim.host = a.host)"
    )
    return sql_per_group_cap(
        joined, "keep_id", "domain", 5,
        select="keep_id AS doc_id, curl, domain, n_dups",
    )


def _host_of_id(id_expr: str) -> str:
    return W.sql_url_host(W.sql_canonicalize_url(W.sql_synth_url(id_expr)))


def q_link_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from crawled pages: synthesize the HTML
    (closed form), REALLY extract double-quoted href attributes with
    one codegen regexp pass (decoy attributes excluded), canonicalize,
    and aggregate to (src_host, dst_host, n_links). The whole chain is
    scan -> project -> explode -> one groupBy shuffle — no UDF, no
    driver hop; the oracle derives the same edges from the link
    formula without ever touching HTML, so the entry cross-checks the
    encode/extract loop itself."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_html("doc_id").alias("html")
    )
    links = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("src_host"),
        F.explode(W.html_hrefs("html")).alias("href"),
    )
    return (
        links.select(
            "src_host",
            W.url_host(W.canonicalize_url("href")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def _link_host_graph_oracle() -> str:
    return f"""
WITH {W.sql_link_targets_cte()},
e AS (
  SELECT {_host_of_id('doc_id')} AS src_host,
         {_host_of_id('t')} AS dst_host
  FROM links
)
SELECT src_host, dst_host, count(*) AS n_links
FROM e GROUP BY src_host, dst_host
"""


def q_pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the host link graph — the crawl-side authority
    signal that feeds per-domain sampling weights. Composes the
    href-extracted edge list (distinct host pairs) into the shared
    fixed-iteration pagerank operator (operators/graph.py): one
    equijoin + one aggregation per iteration, lineage checkpointed."""
    from hash_db_spark.operators.graph import pagerank

    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_html("doc_id").alias("html")
    )
    links = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("src"),
        F.explode(W.html_hrefs("html")).alias("href"),
    )
    edges = links.select(
        "src", W.url_host(W.canonicalize_url("href")).alias("dst")
    ).distinct()
    # nodes = union of edge endpoints: pass None so the operator
    # derives them from ONE materialized edge relation (r12 — the
    # two-collect form re-ran the href extraction per relation)
    return pagerank(None, edges, iterations=3)


def _pagerank_hosts_oracle() -> str:
    from hash_db_spark.operators.graph import sql_pagerank

    return f"""
WITH {W.sql_link_targets_cte()},
gedges AS (
  SELECT DISTINCT {_host_of_id('doc_id')} AS src,
         {_host_of_id('t')} AS dst
  FROM links
),
gnodes AS (
  SELECT DISTINCT src AS id FROM gedges
  UNION
  SELECT DISTINCT dst AS id FROM gedges
),
{sql_pagerank(iterations=3)}
"""


def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-politeness dimension: REAL parse of each distinct
    host's (synthetic, closed-form) robots.txt into one row per
    Disallow rule — line split + prefix filter, all codegen. The
    oracle derives the rules from the site-number formula without ever
    building the robots text, so the entry cross-checks the parser."""
    docs = _docs(spark, sf_dir)
    hosts = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("host")
    )
    return W.robots_rules(hosts)


_SN = "CAST(regexp_extract(host, 'site([0-9]+)', 1) AS INT)"

ROBOTS_RULES_ORACLE = f"""
WITH hosts AS (
  SELECT DISTINCT {_host_of_id('doc_id')} AS host FROM documents
),
s AS (SELECT host, {_SN} AS sn FROM hosts)
SELECT host, '/a/' || ((sn * 5 + 1) % 13) AS rule FROM s
UNION ALL
SELECT host, '/' AS rule FROM s WHERE sn % 19 = 0
"""


def q_robots_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness audit: blocked vs allowed URL counts under
    the hosts' robots Disallow prefixes (prefix semantics — '/a/1'
    blocks '/a/12'). Rules ride a broadcast join; the prefix test is
    an `exists` over the per-host rule array."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        W.canonicalize_url(W.synth_url("doc_id")).alias("curl"),
    )
    return W.robots_url_filter(docs)


ROBOTS_FILTER_ORACLE = f"""
WITH u AS (
  SELECT doc_id,
         {W.sql_canonicalize_url(W.sql_synth_url('doc_id'))} AS curl
  FROM documents
),
p AS (
  SELECT doc_id, {W.sql_url_host('curl')} AS host,
         regexp_replace(curl, '^[a-z]+://[^/]+', '') AS path
  FROM u
),
s AS (SELECT *, {_SN} AS sn FROM p),
b AS (
  SELECT host,
         (starts_with(path, '/a/' || ((sn * 5 + 1) % 13)) OR sn % 19 = 0)
           AS blk
  FROM s
)
SELECT host,
       CAST(sum(CASE WHEN blk THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(sum(CASE WHEN blk THEN 0 ELSE 1 END) AS BIGINT) AS n_allowed
FROM b GROUP BY host
"""


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host polite fetch slots: Crawl-delay REALLY parsed from the
    robots text, URLs sequenced by id within each host (one window per
    host — mirroring the fetcher's per-host connection queue)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        W.canonicalize_url(W.synth_url("doc_id")).alias("curl"),
    )
    return W.fetch_schedule(docs)


FETCH_SCHEDULE_ORACLE = f"""
WITH u AS (
  SELECT doc_id AS id,
         {W.sql_url_host(W.sql_canonicalize_url(W.sql_synth_url('doc_id')))}
           AS host
  FROM documents
),
s AS (
  SELECT id, host,
         row_number() OVER (PARTITION BY host ORDER BY id) - 1 AS slot,
         1 + ({_SN} % 5) AS delay
  FROM u
)
SELECT id, host, CAST(slot AS INT) AS slot,
       CAST(slot * delay AS BIGINT) AS fetch_at
FROM s
"""


# Authority-weighted quota: floor(rank * QUOTA_SCALE), min 1. The scale
# turns the ~1/n_hosts average rank into a usable per-host budget.
QUOTA_SCALE = 500


def q_rank_weighted_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank-weighted per-host document caps — the authority signal
    actually feeding curation: high-rank hosts keep more documents,
    low-rank hosts keep at least one, selection stays content-addressed
    (md5 of doc_id) so the kept set is append-stable. Composition:
    link-graph PageRank -> quota dimension (one row per host) ->
    variable-cap window per host. Hosts absent from the link graph
    default to quota 1 (left join + coalesce). The quota frame is
    O(distinct hosts) (~1e8 on the real web), so its join is unhinted
    — AQE broadcasts while it fits, shuffle-joins at scale."""
    from pyspark.sql import Window

    ranks = q_pagerank_hosts(spark, sf_dir)
    quota = ranks.select(
        F.col("id").alias("host"),
        F.greatest(
            F.lit(1), F.floor(F.col("rank") * QUOTA_SCALE).cast("int")
        ).alias("quota"),
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("host"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("host").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.join(quota, "host", "left")
        .select(
            "doc_id",
            "host",
            F.coalesce("quota", F.lit(1)).alias("quota"),
            F.row_number().over(w).alias("__rk"),
        )
        .filter(F.col("__rk") <= F.col("quota"))
        .select("doc_id", "host", "quota")
    )


def _rank_weighted_caps_oracle() -> str:
    pr = _pagerank_hosts_oracle()
    return f"""
WITH pr AS ({pr}),
quota AS (
  SELECT id AS host,
         GREATEST(1, CAST(FLOOR(rank * {QUOTA_SCALE}) AS INT)) AS quota
  FROM pr
),
d AS (
  SELECT doc_id, {_host_of_id('doc_id')} AS host FROM documents
),
r AS (
  SELECT d.doc_id, d.host, COALESCE(q.quota, 1) AS quota,
         row_number() OVER (
           PARTITION BY d.host
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rk
  FROM d LEFT JOIN quota q ON q.host = d.host
)
SELECT doc_id, host, quota FROM r WHERE rk <= quota
"""


def q_robots_sitemap_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap advertisement parse: the Sitemap: lines of each distinct
    host's robots.txt (the crawler's discovery entry point); hosts
    advertising none are absent — the discovery join has real misses."""
    docs = _docs(spark, sf_dir)
    hosts = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("host")
    )
    return W.robots_sitemap_refs(hosts)


ROBOTS_SITEMAP_REFS_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT
    {W.sql_url_host(W.sql_canonicalize_url(W.sql_synth_url('doc_id')))}
      AS host
  FROM documents
)
SELECT host, 'https://' || host || '/sitemap.xml' AS sitemap_url
FROM h
WHERE {_SN} % 2 = 0
"""


def q_hits_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the host link graph — the companion
    signal to pagerank_hosts: pagerank scores endorsement flow, HITS
    separates "points at good pages" (hub) from "is pointed at" (auth),
    which crawl scheduling uses differently (hubs seed frontier
    expansion; authorities earn document-budget boosts). Same edge
    derivation as pagerank_hosts, same fixed-iteration dataflow shape;
    values are exact int64 path counts (see operators/graph.py:hits),
    so the entry needs no rounding grid at all."""
    from hash_db_spark.operators.graph import hits

    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_html("doc_id").alias("html")
    )
    links = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("src"),
        F.explode(W.html_hrefs("html")).alias("href"),
    )
    edges = links.select(
        "src", W.url_host(W.canonicalize_url("href")).alias("dst")
    ).distinct()
    # nodes derived from the one materialized edge relation (r12)
    return hits(None, edges, iterations=2)


def _hits_hosts_oracle() -> str:
    from hash_db_spark.operators.graph import sql_hits

    return f"""
WITH {W.sql_link_targets_cte()},
gedges AS (
  SELECT DISTINCT {_host_of_id('doc_id')} AS src,
         {_host_of_id('t')} AS dst
  FROM links
),
gnodes AS (
  SELECT DISTINCT src AS id FROM gedges
  UNION
  SELECT DISTINCT dst AS id FROM gedges
),
{sql_hits(iterations=2)}
"""


def q_host_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense host neighborhoods by deterministic label propagation —
    the crawl-side site-cluster signal (link farms and mirror networks
    form dense communities long before they merge into one weak
    component). Same edge derivation as pagerank/hits; integer-exact
    (operators/graph.py:lpa_communities)."""
    from hash_db_spark.operators.graph import lpa_communities

    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_html("doc_id").alias("html")
    )
    links = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("src"),
        F.explode(W.html_hrefs("html")).alias("href"),
    )
    edges = links.select(
        "src", W.url_host(W.canonicalize_url("href")).alias("dst")
    ).distinct()
    # nodes derived from the one materialized edge relation (r12)
    return lpa_communities(None, edges, iterations=3)


def _host_communities_oracle() -> str:
    from hash_db_spark.operators.graph import sql_lpa_communities

    return f"""
WITH {W.sql_link_targets_cte()},
gedges AS (
  SELECT DISTINCT {_host_of_id('doc_id')} AS src,
         {_host_of_id('t')} AS dst
  FROM links
),
gnodes AS (
  SELECT DISTINCT src AS id FROM gedges
  UNION
  SELECT DISTINCT dst AS id FROM gedges
),
{sql_lpa_communities(iterations=3)}
"""




PPR_SEED_DOC_IDS = (0, 5)  # seed hosts = these docs' (canonical) hosts


def q_ppr_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the host link graph (Haveliwala, WWW
    2002): teleport concentrated on two trusted seed hosts — authority
    RELATIVE TO a trust set, the TrustRank-style signal plain PageRank
    can't give a crawl frontier. Same per-iteration join+agg shape as
    pagerank_hosts."""
    from hash_db_spark.operators.graph import personalized_pagerank

    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_html("doc_id").alias("html")
    )
    links = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("src"),
        F.explode(W.html_hrefs("html")).alias("href"),
    )
    edges = links.select(
        "src", W.url_host(W.canonicalize_url("href")).alias("dst")
    ).distinct()
    # nodes derived from the one materialized edge relation (r12)
    seeds = local_frame(
        spark, [(i,) for i in PPR_SEED_DOC_IDS], "doc_id long"
    ).select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("id")
    )
    return personalized_pagerank(None, edges, seeds, iterations=3)


def _ppr_hosts_oracle() -> str:
    from hash_db_spark.operators.graph import sql_personalized_pagerank

    seed_vals = ", ".join(f"({i})" for i in PPR_SEED_DOC_IDS)
    return f"""
WITH {W.sql_link_targets_cte()},
gedges AS (
  SELECT DISTINCT {_host_of_id('doc_id')} AS src,
         {_host_of_id('t')} AS dst
  FROM links
),
gnodes AS (
  SELECT DISTINCT src AS id FROM gedges
  UNION
  SELECT DISTINCT dst AS id FROM gedges
),
gseeds AS (
  SELECT {_host_of_id('x')} AS id FROM (VALUES {seed_vals}) v(x)
),
{sql_personalized_pagerank(iterations=3)}
"""


def _host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct host-level edge list from the synthesized crawl —
    the shared derivation pagerank/hits/LPA/k-core all start from."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", W.synth_html("doc_id").alias("html")
    )
    links = docs.select(
        W.url_host(W.canonicalize_url(W.synth_url("doc_id"))).alias("src"),
        F.explode(W.html_hrefs("html")).alias("href"),
    )
    return links.select(
        "src", W.url_host(W.canonicalize_url("href")).alias("dst")
    ).distinct()


_HOST_GEDGES_CTE = """gedges AS (
  SELECT DISTINCT {src} AS src, {dst} AS dst FROM links
)"""


def _host_gedges_cte() -> str:
    return _HOST_GEDGES_CTE.format(
        src=_host_of_id("doc_id"), dst=_host_of_id("t")
    )


def q_host_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the host link graph: peel pendant hosts until every
    survivor keeps >= 2 distinct neighbors — the densely interlinked
    site families (link farms, mirror rings, hub communities) that
    deserve crawl-frontier priority and dup-scrutiny, separated from
    the pendant tail PageRank ranks noisily
    (operators/graph.py:kcore; fixed-round peel, integer-exact)."""
    from hash_db_spark.operators.graph import kcore

    return kcore(_host_edges(spark, sf_dir), k=2, iterations=4)


def _host_kcore_oracle() -> str:
    from hash_db_spark.operators.graph import sql_kcore

    return f"""
WITH {W.sql_link_targets_cte()},
{_host_gedges_cte()},
{sql_kcore(k=2, iterations=4)}
"""


# r12 QUEUE CANDIDATE (session 9):
#   "host_kcore": Query(q_host_kcore, _host_kcore_oracle()),


def q_host_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per host: 2*T(v)/(deg*(deg-1)) —
    high-degree low-coefficient hosts are navigational hubs, high-
    coefficient knots are tightly interlinked site families; the
    density census that decides which k-core survivors are farms
    vs hubs (operators/graph.py:clustering_coefficient, compact-
    forward wedge enumeration)."""
    from hash_db_spark.operators.graph import clustering_coefficient

    return clustering_coefficient(_host_edges(spark, sf_dir))


def _host_clustering_oracle() -> str:
    from hash_db_spark.operators.graph import sql_clustering_coefficient

    return f"""
WITH {W.sql_link_targets_cte()},
{_host_gedges_cte()},
{sql_clustering_coefficient()}
"""


# r12 QUEUE CANDIDATE (session 9):
#   "host_clustering_coef": Query(
#       q_host_clustering_coef, _host_clustering_oracle()),


def q_host_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the host graph: non-adjacent
    host pairs sharing many LOW-degree neighbors (mirror/farm
    candidates) — hub wedge-centers excluded by AA's own weighting
    (operators/graph.py:adamic_adar_pairs)."""
    from hash_db_spark.operators.graph import adamic_adar_pairs

    return adamic_adar_pairs(_host_edges(spark, sf_dir))


def _host_adamic_adar_oracle() -> str:
    from hash_db_spark.operators.graph import sql_adamic_adar_pairs

    return f"""
WITH {W.sql_link_targets_cte()},
{_host_gedges_cte()},
{sql_adamic_adar_pairs()}
"""


# r12 QUEUE CANDIDATE (session 9):
#   "host_adamic_adar": Query(
#       q_host_adamic_adar, _host_adamic_adar_oracle()),


def q_host_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE host table a crawl planner serves: one row per host joining
    every graph-curation signal this engine computes — PageRank
    authority, undirected degree, 2-core membership, local clustering
    coefficient, LPA community — so downstream policy (fetch budget,
    spam review, dup scrutiny) reads ONE dimension instead of five
    operator outputs. Each signal is the already-verified operator;
    this entry proves they COMPOSE on a shared edge derivation.

    Scale shape: the edge list derives once (eager localCheckpoint —
    five consumers would otherwise re-run the href extraction five
    times); each signal keeps its own audited plan; the final assembly
    is four left joins on the host key — host tables are dimension-
    sized next to the corpora that produce them."""
    from hash_db_spark.operators.graph import (
        clustering_coefficient,
        kcore,
        lpa_communities,
        pagerank,
    )

    edges = _host_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    pr = pagerank(nodes, edges, iterations=3)
    deg = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    core = kcore(edges, k=2, iterations=4).select(
        "id", F.lit(True).alias("in_core2")
    )
    coef = clustering_coefficient(edges).select("id", "coef")
    comm = lpa_communities(nodes, edges, iterations=3)
    return (
        pr.join(deg, "id", "left")
        .join(core, "id", "left")
        .join(coef, "id", "left")
        .join(comm, "id", "left")
        .select(
            F.col("id").alias("host"),
            "rank",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("in_core2", F.lit(False)).alias("in_core2"),
            "coef",
            "community",
        )
    )


def _host_graph_profile_oracle() -> str:
    """Assembled from the component wrapper oracles as parenthesized
    WITH-subqueries — no CTE-name collisions between the components'
    internal chains (kcore's e1..e4 vs LPA's e2 would clash inline)."""
    deg_sql = f"""
WITH {W.sql_link_targets_cte()},
gedges AS (
  SELECT DISTINCT {_host_of_id('doc_id')} AS src,
         {_host_of_id('t')} AS dst
  FROM links
),
ce AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM gedges WHERE src <> dst
)
SELECT id, count(*) AS deg FROM (
  SELECT a AS id FROM ce UNION ALL SELECT b FROM ce
) GROUP BY id
"""
    return f"""
SELECT pr.id AS host, pr.rank,
       COALESCE(d.deg, 0) AS deg,
       kc.id IS NOT NULL AS in_core2,
       cf.coef,
       cm.community
FROM ({_pagerank_hosts_oracle()}) pr
LEFT JOIN ({deg_sql}) d ON d.id = pr.id
LEFT JOIN ({_host_kcore_oracle()}) kc ON kc.id = pr.id
LEFT JOIN ({_host_clustering_oracle()}) cf ON cf.id = pr.id
LEFT JOIN ({_host_communities_oracle()}) cm ON cm.id = pr.id
"""


# r13 QUEUE CANDIDATE (session 9; the r12 queue is closed):
#   "host_graph_profile": Query(
#       q_host_graph_profile, _host_graph_profile_oracle()),


def q_url_path_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-space census: canonical URLs grouped by (host, digit-
    collapsed path template) with concrete-path fan-out — a template
    whose distinct-path count keeps growing is a parameterized space
    (pagination, calendars, session ids) that a frontier must cap
    rather than exhaust. One codegen projection + one map-combined
    groupBy; no joins (operators/web.py:path_template)."""
    docs = _docs(spark, sf_dir)
    u = W.canonicalize_url(W.synth_url("doc_id"))
    rows = docs.select(
        W.url_host(u).alias("host"),
        W.url_path(u).alias("path"),
    )
    return (
        rows.select(
            "host", "path", W.path_template("path").alias("template")
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("path").alias("n_paths"),
            F.min("path").alias("sample_path"),
        )
    )


def _url_path_templates_oracle() -> str:
    u = W.sql_canonicalize_url(W.sql_synth_url("doc_id"))
    return f"""
WITH rows AS (
  SELECT {W.sql_url_host(u)} AS host, {W.sql_url_path(u)} AS path
  FROM documents
)
SELECT host, {W.sql_path_template('path')} AS template,
       count(*) AS n_urls,
       count(DISTINCT path) AS n_paths,
       min(path) AS sample_path
FROM rows
GROUP BY host, template
"""


# r13 QUEUE CANDIDATE (session 9):
#   "url_path_templates": Query(
#       q_url_path_templates, _url_path_templates_oracle()),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "robots_sitemap_refs": Query(
        q_robots_sitemap_refs, ROBOTS_SITEMAP_REFS_ORACLE
    ),
    "url_dedup": Query(q_url_dedup, URL_DEDUP_ORACLE),
    "url_host_domains": Query(q_url_host_domains, URL_HOST_DOMAINS_ORACLE),
    "host_doc_caps": Query(q_host_doc_caps, _host_doc_caps_oracle()),
    "crawl_prep": Query(q_crawl_prep, _crawl_prep_oracle()),
    "link_host_graph": Query(q_link_host_graph, _link_host_graph_oracle()),
    "pagerank_hosts": Query(q_pagerank_hosts, _pagerank_hosts_oracle()),
    "robots_rules": Query(q_robots_rules, ROBOTS_RULES_ORACLE),
    "robots_url_filter": Query(q_robots_url_filter, ROBOTS_FILTER_ORACLE),
    "fetch_schedule": Query(q_fetch_schedule, FETCH_SCHEDULE_ORACLE),
    "rank_weighted_caps": Query(
        q_rank_weighted_caps, _rank_weighted_caps_oracle()
    ),
    "crawl_prep_polite": Query(
        q_crawl_prep_polite, _crawl_prep_polite_oracle()
    ),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle) —
    # VERDICT r09 #4: the 100 TB host-graph curation pair.
    "hits_hosts": Query(q_hits_hosts, _hits_hosts_oracle()),
    "host_communities": Query(
        q_host_communities, _host_communities_oracle()
    ),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "ppr_hosts": Query(q_ppr_hosts, _ppr_hosts_oracle()),
}
