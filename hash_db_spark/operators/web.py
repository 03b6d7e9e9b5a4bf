"""URL / host-level corpus curation (SURVEY north-star: web-crawl prep).

No reference counterpart. The standard FIRST stage of crawl corpus prep,
before any text dedup: canonicalize URLs, collapse exact URL duplicates,
extract registrable domains against a public-suffix table, cap documents
per host. Everything is expression-level (regexp + string ops inside
whole-stage codegen) except the suffix match, which is a broadcast join
against the (tiny) suffix dimension — the 100 TB shape for a PSL lookup.

The fixtures carry no URLs, so entries derive a deterministic synthetic
URL from doc_id (same discipline as the synthetic PPM/WAV/Y4M payloads:
Spark and the DuckDB oracle both generate it from the same closed form,
then each runs its own canonicalizer — parity checks the OPERATOR, not
the generator). The synthetic shape deliberately exercises every rule:
uppercase schemes, default ports, utm tracking params, fragments,
trailing slashes, multi-label public suffixes (co.uk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from hash_db_spark.localframe import local_frame

# Public-suffix snippet (offline stand-in for the full Mozilla PSL —
# the operator is data-driven, so swapping in the real list is a data
# change, not a code change). Longest-match-wins, like the PSL.
PUBLIC_SUFFIXES = (
    "com", "org", "net", "io", "dev",
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au",
)

# Tracking query parameters stripped by canonicalization.
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*"


def synth_url(doc_id: Column | str) -> Column:
    """Deterministic synthetic URL for a document id (closed form shared
    with sql_synth_url)."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    scheme = F.when(d % 7 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    sub = F.element_at(
        F.array(F.lit(""), F.lit("www."), F.lit("cdn."), F.lit("blog.")),
        (d % 4 + 1).cast("int"),
    )
    site = d % 23
    tld = F.element_at(
        F.array(F.lit(".com"), F.lit(".org"), F.lit(".io"), F.lit(".co.uk")),
        (site % 4 + 1).cast("int"),
    )
    port = F.when(
        (d % 11 == 0) & (d % 7 == 0), F.lit(":80")
    ).when(d % 11 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(F.lit("/a/"), (d % 13).cast("string"))
    slash = F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit(""))
    query = F.when(d % 6 == 0, F.lit("?utm_campaign=promo")).when(
        d % 6 == 3, F.lit("?page=2")
    ).otherwise(F.lit(""))
    frag = F.when(d % 9 == 0, F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), sub, F.lit("site"), site.cast("string"),
        tld, port, path, slash, query, frag,
    )


def sql_synth_url(id_expr: str) -> str:
    d = f"({id_expr})"
    return (
        f"(CASE WHEN {d} % 7 = 0 THEN 'HTTP' ELSE 'https' END) || '://' || "
        f"(['', 'www.', 'cdn.', 'blog.'][{d} % 4 + 1]) || "
        f"'site' || ({d} % 23) || "
        f"(['.com', '.org', '.io', '.co.uk'][({d} % 23) % 4 + 1]) || "
        f"(CASE WHEN {d} % 11 = 0 AND {d} % 7 = 0 THEN ':80' "
        f"      WHEN {d} % 11 = 0 THEN ':443' ELSE '' END) || "
        f"'/a/' || ({d} % 13) || "
        f"(CASE WHEN {d} % 5 = 0 THEN '/' ELSE '' END) || "
        f"(CASE WHEN {d} % 6 = 0 THEN '?utm_campaign=promo' "
        f"      WHEN {d} % 6 = 3 THEN '?page=2' ELSE '' END) || "
        f"(CASE WHEN {d} % 9 = 0 THEN '#sec' ELSE '' END)"
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL: lowercase scheme+host, fragment stripped, default
    ports stripped, tracking params stripped (empty query dropped),
    trailing path slash stripped. Pure regexp/string expressions —
    whole-stage codegen, no UDF."""
    u = F.col(url) if isinstance(url, str) else url
    # 1. lowercase scheme://host[:port] (path/query case is significant)
    head = F.lower(F.regexp_extract(u, r"^([^/]+//[^/?#]*)", 1))
    tail = F.regexp_replace(u, r"^[^/]+//[^/?#]*", "")
    u = F.concat(head, tail)
    # 2. strip fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. strip default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?]|$)", r"$1")
    # 4. strip tracking params, then tidy separators / empty query
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 5. strip one trailing path slash (never the root's)
    u = F.regexp_replace(u, r"(://[^/?#]+/[^?#]*?)/(\?|$)", r"$1$2")
    return u


def sql_canonicalize_url(expr: str) -> str:
    """DuckDB twin of canonicalize_url, rule for rule (DuckDB needs the
    'g' flag for global replacement and lacks lookahead — the port rule
    uses a capture of the boundary instead)."""
    u = (
        f"lower(regexp_extract({expr}, '^([^/]+//[^/?#]*)', 1)) || "
        f"regexp_replace({expr}, '^[^/]+//[^/?#]*', '')"
    )
    u = f"regexp_replace({u}, '#.*$', '')"
    u = f"regexp_replace({u}, '^(http://[^/:?#]+):80([/?]|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https://[^/:?#]+):443([/?]|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '{TRACKING_PARAM_RE}', '', 'g')"
    u = f"regexp_replace({u}, '\\?&+', '?', 'g')"
    u = f"regexp_replace({u}, '&+', '&', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '')"
    u = f"regexp_replace({u}, '(://[^/?#]+/[^?#]*?)/(\\?|$)', '\\1\\2')"
    return u


def url_host(url: Column | str) -> Column:
    """Host of a canonical URL (ports/userinfo already normalized away)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(u, r"^[a-z]+://([^/:?#]+)", 1)


def sql_url_host(expr: str) -> str:
    return f"regexp_extract({expr}, '^[a-z]+://([^/:?#]+)', 1)"


def psl_path() -> str:
    """Repo-local parquet bake of the real Mozilla Public Suffix List
    (public data, MPL-2.0; built by scripts/build_psl_fixture.py from
    the Debian-shipped snapshot of publicsuffix.org's list): one row
    per rule — (key, n_labels, kind, rule, section) — plus an ASCII
    punycode alias row per IDN rule. ~10k rows: genuinely
    scale-invariant, always the broadcast side."""
    from pathlib import Path

    return str(Path(__file__).resolve().parents[2] / "data" / "psl.parquet")


def parse_suffix_rule(rule: str) -> tuple[str, int, int]:
    """(key, n_labels, kind) for one PSL rule. key is the join key the
    matcher generates from host labels: the literal suffix, the
    verbatim '*.'+tail for wildcard rules, or the exception's own
    labels with the '!' marker stripped. kind: 0 normal, 1 exception.
    Same closed form as scripts/build_psl_fixture.py bakes."""
    if rule.startswith("!"):
        base = rule[1:]
        return base, base.count(".") + 1, 1
    return rule, rule.count(".") + 1, 0


def _max_rule_depth(suffixes: tuple[str, ...] | None) -> int:
    """Max label count across the rule set (bounds candidate
    generation). The baked PSL's depth is read once per process from
    the parquet footer-side stats (a ~10k-row driver-side scan)."""
    if suffixes is not None:
        return max(parse_suffix_rule(s)[1] for s in suffixes)
    global _PSL_DEPTH
    if _PSL_DEPTH is None:
        import pyarrow.parquet as pq

        _PSL_DEPTH = int(
            pq.read_table(psl_path(), columns=["n_labels"])["n_labels"]
            .combine_chunks()
            .to_pandas()
            .max()
        )
    return _PSL_DEPTH


_PSL_DEPTH: int | None = None


def suffix_table(spark, suffixes: tuple[str, ...] | None = None) -> DataFrame:
    """The public-suffix dimension: (key, n_labels, kind). Default is
    the REAL baked PSL (psl_path()); pass a rule tuple (literal,
    '*.wildcard' and '!exception' markers all honored) for tests or a
    custom list. Tiny either way — always the broadcast side."""
    if suffixes is None:
        return spark.read.parquet(psl_path()).select(
            "key", "n_labels", "kind"
        )
    rows = [parse_suffix_rule(s) for s in suffixes]
    return local_frame(
        spark, rows, "key string, n_labels int, kind int"
    )


def registrable_domain(
    hosts: DataFrame,
    host_col: str = "host",
    suffixes: tuple[str, ...] | None = None,
) -> DataFrame:
    """The (host, domain) DIMENSION over the input's distinct hosts,
    by the full public-suffix algorithm (publicsuffix.org/list/):

    - candidate keys are the host's last 1..max-depth labels, in BOTH
      the exact form and the '*.'+tail wildcard form — generated
      map-side and equijoined against the broadcast rule table;
    - the prevailing rule is the matching exception rule if any, else
      the longest match (wildcards count at their label width), else
      the implicit '*' rule (any unknown TLD is a public suffix);
    - the public suffix spans n_labels labels (exception: one fewer),
      and the registrable domain is one more label than that — NULL
      when the host IS a public suffix.

    Default rule set is the REAL baked PSL (~10k rows — the broadcast
    join is scale-invariant); callers join the resulting dimension
    back on host, and THAT join is O(distinct hosts), which is why the
    query layer leaves it unhinted. Citing the reference's data-driven
    dimension discipline (no counterpart: the reference has no web
    layer)."""
    max_depth = _max_rule_depth(suffixes)
    hosts = hosts.select(host_col).distinct()
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    m = F.least(n, F.lit(max_depth))
    exact = F.transform(
        F.sequence(F.lit(1), m),
        lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
    )
    # sequence(2, 1) would count DOWN — guard the wildcard arm for
    # single-label hosts instead of relying on an empty range.
    wild = F.when(
        m >= 2,
        F.transform(
            F.sequence(F.lit(2), m),
            lambda k: F.concat(
                F.lit("*."),
                F.array_join(F.slice(labels, n - k + 2, k - 1), "."),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spark = hosts.sparkSession
    exploded = hosts.withColumn("__key", F.explode(F.concat(exact, wild)))
    sfx = suffix_table(spark, suffixes)
    joined = exploded.join(
        F.broadcast(sfx), exploded["__key"] == sfx["key"], "left"
    )
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(
        F.col("kind").desc_nulls_last(),
        F.col("n_labels").desc_nulls_last(),
        F.col("__key").asc(),
    )
    k_ps = (
        F.when(F.col("kind") == 1, F.col("n_labels") - 1)
        .when(F.col("n_labels").isNotNull(), F.col("n_labels"))
        .otherwise(F.lit(1))  # the implicit '*' rule
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn("__k_ps", k_ps)
        .select(
            host_col,
            F.when(
                n > F.col("__k_ps"),
                F.array_join(
                    F.slice(labels, n - F.col("__k_ps"), F.col("__k_ps") + 1),
                    ".",
                ),
            ).alias("domain"),
        )
    )


def sql_registrable_domain(
    hosts_sql: str,
    host_col: str = "host",
    suffixes: tuple[str, ...] | None = None,
) -> str:
    """Oracle twin: ``hosts_sql`` yields rows with ``host_col``; returns
    the distinct (host, domain) dimension by the same full PSL
    algorithm (exception > longest literal/wildcard > implicit '*').
    Default rule set reads the SAME baked parquet the Spark side
    broadcasts."""
    max_depth = _max_rule_depth(suffixes)
    if suffixes is None:
        sfx = (
            "SELECT key, n_labels, kind FROM "
            f"read_parquet('{psl_path()}')"
        )
    else:
        values = ", ".join(
            "('{0}', {1}, {2})".format(*parse_suffix_rule(s))
            for s in suffixes
        )
        sfx = (
            f"SELECT * FROM (VALUES {values}) AS v(key, n_labels, kind)"
        )
    return f"""
WITH hosts_in AS (SELECT DISTINCT {host_col} FROM ({hosts_sql})),
sfx AS ({sfx}),
hl AS (
  SELECT {host_col}, string_split({host_col}, '.') AS labels FROM hosts_in
),
cand AS (
  SELECT {host_col}, labels,
         CASE WHEN wild
              THEN '*.' || array_to_string(labels[len(labels) - k + 2 :], '.')
              ELSE array_to_string(labels[len(labels) - k + 1 :], '.') END
           AS cand_key
  FROM hl,
       LATERAL (SELECT unnest(generate_series(1,
                  least(len(labels), {max_depth}))) AS k) ks,
       LATERAL (SELECT unnest([false, true]) AS wild) ws
  WHERE NOT wild OR k >= 2
),
matched AS (
  SELECT c.{host_col}, c.labels, s.n_labels, s.kind,
         row_number() OVER (
           PARTITION BY c.{host_col}
           ORDER BY s.kind DESC NULLS LAST, s.n_labels DESC NULLS LAST,
                    c.cand_key ASC) AS rn
  FROM cand c LEFT JOIN sfx s ON s.key = c.cand_key
),
winner AS (
  SELECT {host_col}, labels,
         CASE WHEN kind = 1 THEN n_labels - 1
              WHEN n_labels IS NOT NULL THEN n_labels
              ELSE 1 END AS k_ps
  FROM matched WHERE rn = 1
)
SELECT {host_col},
       CASE WHEN len(labels) > k_ps
            THEN array_to_string(labels[len(labels) - k_ps :], '.') END
         AS domain
FROM winner
"""


def url_dedup(
    docs_urls: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact URL dedup after canonicalization: one survivor per
    canonical URL (min id — keep-first), with the duplicate count.
    Straight groupBy on the canonical string; at 100 TB this is the
    cheapest dedup stage and runs before any content hashing."""
    return (
        docs_urls.withColumn("curl", canonicalize_url(url_col))
        .groupBy("curl")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --- synthetic HTML + link extraction (crawl link graph) --------------------

# Link fan-out: doc d links to targets (d*31 + j*37) % LINK_TARGET_MOD
# for j in 1..(1 + d % 3). Pure closed form shared with the DuckDB
# oracle, like synth_url; self-links possible and kept (PageRank
# handles them; dropping them would be a policy, not a parse, choice).
LINK_TARGET_MOD = 997


def link_targets(doc_id: Column | str) -> Column:
    """array<long> of synthetic out-link target ids for a document."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    return F.transform(
        F.sequence(F.lit(1), (1 + d % 3).cast("int")),
        lambda j: (d * 31 + j * 37) % LINK_TARGET_MOD,
    )


def sql_link_targets_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    """CTE body ``links(doc_id, t)``: one row per (doc, out-link target)."""
    return (
        f"links AS (SELECT {id_col} AS doc_id, "
        f"({id_col} * 31 + j * 37) % {LINK_TARGET_MOD} AS t "
        f"FROM {table}, unnest(generate_series(1, 1 + {id_col} % 3)) AS u(j))"
    )


def synth_html(doc_id: Column | str) -> Column:
    """Deterministic synthetic HTML page for a document: real anchor
    tags around the closed-form target URLs, plus two decoys a correct
    extractor must NOT match — a ``data-href="..."`` attribute and a
    single-quoted ``href='...'`` (the extraction spec is double-quoted
    ``href`` attributes). Pure string expressions — codegen, no UDF."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    anchors = F.array_join(
        F.transform(
            link_targets(d),
            lambda t: F.concat(
                F.lit('<a href="'), synth_url(t), F.lit('">l</a>')
            ),
        ),
        "",
    )
    return F.concat(
        F.lit('<html><body data-href="https://decoy.example/x">'),
        anchors,
        F.lit("<p>page "),
        d.cast("string"),
        F.lit(" <a href='https://singlequote.example/y'>s</a></p></body></html>"),
    )


def html_hrefs(html: Column | str) -> Column:
    """All double-quoted href attribute values, in document order.
    ``[ >]href="..."`` — the preceding space/tag-open boundary rejects
    ``data-href``; single-quoted hrefs are out of spec. One
    regexp_extract_all — whole-stage codegen, no UDF, so extraction
    runs at scan speed on 100 TB of page text."""
    h = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(h, F.lit(' href="([^"]*)"'), 1)


# --- robots.txt politeness ---------------------------------------------------

# Synthetic per-host robots.txt, closed form on the host's site number
# (hosts of one site share rules across subdomains — realistic enough
# for the filter semantics): every site disallows one /a/<k> prefix,
# sites with s % 19 == 0 disallow everything, and a Crawl-delay line
# exercises the parser's must-skip path.


def host_site_num(host: Column | str) -> Column:
    h = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(h, r"site(\d+)", 1).cast("int")


def sql_host_site_num(expr: str) -> str:
    return f"CAST(regexp_extract({expr}, 'site(\\d+)', 1) AS INT)"


def synth_robots(host: Column | str) -> Column:
    """robots.txt body for a host. Pure string expressions. Hosts with
    an even site number advertise their sitemap (a Sitemap: line the
    Disallow/Crawl-delay parsers must skip; robots_sitemap_refs parses
    it) — odd sites don't, so the discovery join has real misses."""
    s = host_site_num(host)
    h = F.col(host) if isinstance(host, str) else host
    block_all = F.when(s % 19 == 0, F.lit("Disallow: /\n")).otherwise(F.lit(""))
    sitemap = F.when(
        s % 2 == 0,
        F.concat(
            F.lit("Sitemap: https://"), h, F.lit("/sitemap.xml\n")
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /a/"),
        ((s * 5 + 1) % 13).cast("string"),
        F.lit("\n"),
        block_all,
        sitemap,
        F.lit("Crawl-delay: "),
        (1 + s % 5).cast("string"),
        F.lit("\n"),
    )


def robots_sitemap_refs(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, sitemap_url): REAL parse of the Sitemap: lines of each
    distinct host's robots.txt — the discovery entry point a crawler
    follows before guessing /sitemap.xml. Hosts advertising none are
    absent. Same codegen line-split discipline as the Disallow and
    Crawl-delay parsers; dimension-sized (distinct hosts)."""
    r = synth_robots(host_col)
    lines = F.filter(
        F.split(r, "\n"), lambda ln: ln.startswith(F.lit("Sitemap: "))
    )
    return (
        hosts.select(host_col).distinct()
        .select(
            F.col(host_col).alias("host"),
            F.explode(
                F.transform(lines, lambda ln: F.substring(ln, 10, 1 << 30))
            ).alias("sitemap_url"),
        )
    )


def robots_disallow_prefixes(robots: Column | str) -> Column:
    """REAL parse: the Disallow rule paths of a robots.txt body, in
    file order. Line split + prefix filter + substring — codegen, no
    UDF (non-Disallow lines like Crawl-delay must be skipped)."""
    r = F.col(robots) if isinstance(robots, str) else robots
    return F.transform(
        F.filter(
            F.split(r, "\n"), lambda ln: ln.startswith(F.lit("Disallow: "))
        ),
        lambda ln: F.substring(ln, 11, 2147483647),
    )


def robots_rules(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, rule): one row per Disallow rule per distinct host — the
    politeness dimension a fetch scheduler joins against. At corpus
    scale this is |hosts| x O(1) rows: broadcastable for moderate
    crawls; partition-join on host beyond the broadcast threshold."""
    return hosts.select(host_col).distinct().select(
        F.col(host_col).alias("host"),
        F.explode(
            robots_disallow_prefixes(synth_robots(host_col))
        ).alias("rule"),
    )


def robots_url_filter(
    docs_urls: DataFrame, url_col: str = "curl", id_col: str = "doc_id"
) -> DataFrame:
    """Per-host crawl politeness audit: how many of the corpus's
    canonical URLs a robots Disallow prefix blocks vs allows.

    Robots semantics: a URL is blocked when its path+query starts with
    ANY of its host's Disallow prefixes (prefix match — '/a/1' blocks
    '/a/12' too; our synth set has no Allow overrides). The rules
    frame is one row per distinct host — O(1e8) on the real web — so
    its join is unhinted (AQE broadcasts while it fits, shuffle-joins
    at scale); the prefix test is an `exists` over the per-host rule
    array — all codegen."""
    u = docs_urls.select(
        F.col(id_col).alias("id"),
        url_host(url_col).alias("host"),
        F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]+", "").alias("path"),
    )
    rules = (
        u.select("host")
        .distinct()
        .select(
            "host",
            robots_disallow_prefixes(synth_robots("host")).alias("rules"),
        )
    )
    joined = u.join(rules, "host")
    blocked = F.exists(
        F.col("rules"), lambda p: F.col("path").startswith(p)
    )
    return (
        joined.select("host", blocked.alias("b"))
        .groupBy("host")
        .agg(
            F.sum(F.when(F.col("b"), 1).otherwise(0)).alias("n_blocked"),
            F.sum(F.when(F.col("b"), 0).otherwise(1)).alias("n_allowed"),
        )
    )


def robots_crawl_delay(robots: Column | str) -> Column:
    """REAL parse of the Crawl-delay value (seconds, int) from a
    robots.txt body; NULL when absent. Same codegen line-split
    discipline as robots_disallow_prefixes."""
    r = F.col(robots) if isinstance(robots, str) else robots
    lines = F.filter(
        F.split(r, "\n"), lambda ln: ln.startswith(F.lit("Crawl-delay: "))
    )
    return F.substring(F.element_at(lines, 1), 14, 2147483647).cast("int")


def fetch_schedule(
    docs_urls: DataFrame, url_col: str = "curl", id_col: str = "doc_id"
) -> DataFrame:
    """Polite fetch schedule: per host, URLs are sequenced
    deterministically (by id) and assigned fetch offsets slot*delay
    seconds apart, delay parsed from the host's robots.txt.

    Scale shape: hosts are the parallel unit — ONE window partitioned
    by host (a real crawl's per-host queues are exactly this
    partitioning; a host with millions of URLs serializes through one
    task here AND through one connection in the fetcher, so the plan
    skew mirrors the physical constraint). The per-host delay frame
    is O(distinct hosts), so its join is unhinted — AQE broadcasts it
    while it fits. Returns (id, host, slot, fetch_at)."""
    from pyspark.sql import Window

    u = docs_urls.select(
        F.col(id_col).alias("id"),
        url_host(url_col).alias("host"),
    )
    delays = (
        u.select("host")
        .distinct()
        .select(
            "host", robots_crawl_delay(synth_robots("host")).alias("delay")
        )
    )
    w = Window.partitionBy("host").orderBy("id")
    return (
        u.join(delays, "host")
        .select(
            "id",
            "host",
            (F.row_number().over(w) - 1).alias("slot"),
            "delay",
        )
        .select(
            "id",
            "host",
            "slot",
            (F.col("slot").cast("long") * F.col("delay")).alias("fetch_at"),
        )
    )


def url_path(url: Column | str) -> Column:
    """Path component of a canonical URL ('' when absent)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(u, r"^[a-z]+://[^/?#]+([^?#]*)", 1)


def sql_url_path(expr: str) -> str:
    return f"regexp_extract({expr}, '^[a-z]+://[^/?#]+([^?#]*)', 1)"


def path_template(path: Column | str) -> Column:
    """Digit runs collapsed to '{d}': '/a/17/x' -> '/a/{d}/x' — the
    URL-template key crawl planners group by to spot parameterized
    (calendar/pagination/session-id) spaces that would otherwise be
    crawled forever."""
    p = F.col(path) if isinstance(path, str) else path
    return F.regexp_replace(p, "[0-9]+", "{d}")


def sql_path_template(expr: str) -> str:
    return f"regexp_replace({expr}, '[0-9]+', '{{d}}', 'g')"
