"""HTML -> text extraction (SURVEY north-star: web-crawl prep).

No reference counterpart. The stage BETWEEN the crawl front end
(operators/web.py: WARC parse, URL dedup, robots, caps) and the text
pipeline (quality, dedup, packing): turn raw page HTML into the
main-text column every downstream operator consumes. The whole
extractor is a chain of regexp/string expressions — whole-stage
codegen, no UDF — so extraction runs at scan speed on 100 TB of page
bytes, and every rule has a DuckDB twin so the driver oracle checks
the OPERATOR rule for rule.

Extraction spec (applied in order; order is load-bearing):
  1. drop <head>...</head> (title/meta/style live there, not in text)
  2. drop <script>...</script>, <style>...</style> blocks (body ones)
  3. drop <!-- comments -->
  4. block-closing tags and <br> become newlines
  5. every remaining tag becomes a space (word-boundary safety)
  6. decode the common entities, &amp; LAST (standard decode order,
     so '&amp;lt;' yields the literal '&lt;')
  7. whitespace canon: runs of spaces/tabs -> one space, spaces
     trimmed around newlines, newline runs collapsed, ends trimmed

The fixtures carry no HTML, so entries derive a deterministic
synthetic page from each document's REAL text plus closed-form noise
(head/script/style/comments/entities/anchors) on BOTH engines, then
each runs its own extractor — parity checks the extractor, not the
generator (the synth-payload discipline of the multimodal and URL
entries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from hash_db_spark.operators.web import (
    link_targets,
    sql_synth_url,
    synth_url,
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- synthetic page ----------------------------------------------------------


def synth_page(doc_id: Column | str, text: Column | str) -> Column:
    """Deterministic page for a document: its real text split across a
    <p> and a <div> (empty when the text is short — the extractor must
    drop the resulting blank line), wrapped in head/title/style, a BODY
    script whose content contains '>' (tag-stripping it without the
    script pass would corrupt the text), a comment, entity furniture
    (&nbsp; &lt; &gt; &amp;), and real anchors around the closed-form
    link targets. Pure string expressions — codegen, no UDF."""
    d = _c(doc_id)
    t = _c(text)
    anchors = F.array_join(
        F.transform(
            link_targets(d),
            lambda k: F.concat(
                F.lit('<a href="'),
                synth_url(k),
                F.lit('">ref '),
                k.cast("string"),
                F.lit("</a>"),
            ),
        ),
        "",
    )
    return F.concat(
        F.lit("<!DOCTYPE html><html><head><title>doc "),
        d.cast("string"),
        F.lit(" &amp; co</title><style>p { margin: 0; }</style></head>"),
        F.lit("<body><!-- gen "),
        d.cast("string"),
        F.lit(" --><h1>Doc&nbsp;"),
        d.cast("string"),
        F.lit("</h1>"),
        anchors,
        F.lit("<p>"),
        F.substring(t, 1, 40),
        F.lit("</p><div>"),
        F.substring(t, 41, 1 << 30),
        F.lit('</div><script>if (n > 0) { track("p&q"); }</script>'),
        F.lit("<p>tail &lt;"),
        (d % 7).cast("string"),
        F.lit("&gt;</p></body></html>"),
    )


def sql_synth_page(id_expr: str, text_expr: str) -> str:
    """DuckDB twin of synth_page (same closed form, shared link-target
    arithmetic via an inline list comprehension)."""
    d = f"({id_expr})"
    anchor = (
        f"(SELECT coalesce(string_agg('<a href=\"' || "
        f"{sql_synth_url(f'({d} * 31 + j * 37) % 997')} || "
        f"'\">ref ' || (({d} * 31 + j * 37) % 997) || '</a>', '' "
        f"ORDER BY j), '') "
        f"FROM unnest(generate_series(1, 1 + {d} % 3)) AS u(j))"
    )
    return (
        f"'<!DOCTYPE html><html><head><title>doc ' || {d} || "
        f"' &amp; co</title><style>p {{ margin: 0; }}</style></head>' || "
        f"'<body><!-- gen ' || {d} || ' --><h1>Doc&nbsp;' || {d} || "
        f"'</h1>' || {anchor} || "
        f"'<p>' || substring({text_expr}, 1, 40) || "
        f"'</p><div>' || substring({text_expr}, 41) || "
        f"'</div><script>if (n > 0) {{ track(\"p&q\"); }}</script>' || "
        f"'<p>tail &lt;' || ({d} % 7) || '&gt;</p></body></html>'"
    )


# --- extraction --------------------------------------------------------------

# Block-level closing tags (and <br>) that terminate a text line.
_BLOCK_RE = r"</(?:p|div|h[1-6]|li|ul|ol|table|tr|td|blockquote)>|<br ?/?>"

# Entity decode table, in decode order (&amp; LAST).
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_entities(col: Column) -> Column:
    for pat, rep in _ENTITIES:
        col = F.replace(col, F.lit(pat), F.lit(rep))
    return col


def sql_decode_entities(expr: str) -> str:
    for pat, rep in _ENTITIES:
        rep_sql = "chr(39)" if rep == "'" else f"'{rep}'"
        expr = f"replace({expr}, '{pat}', {rep_sql})"
    return expr


def html_main_text(html: Column | str) -> Column:
    """Main text of a page per the module spec. Every step is a
    regexp/string expression inside whole-stage codegen."""
    h = _c(html)
    h = F.regexp_replace(h, r"(?s)<head\b.*?</head>", "")
    h = F.regexp_replace(h, r"(?s)<script\b[^>]*>.*?</script>", "")
    h = F.regexp_replace(h, r"(?s)<style\b[^>]*>.*?</style>", "")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", "")
    h = F.regexp_replace(h, _BLOCK_RE, "\n")
    h = F.regexp_replace(h, r"<[^>]+>", " ")
    h = decode_entities(h)
    h = F.regexp_replace(h, r"[ \t]+", " ")
    h = F.regexp_replace(h, r" ?\n ?", "\n")
    h = F.regexp_replace(h, r"\n+", "\n")
    return F.regexp_replace(h, r"^\s+|\s+$", "")


def sql_html_main_text(expr: str) -> str:
    """DuckDB twin, rule for rule (RE2 + 'g' flag; newline replacement
    via chr(10) — RE2 rewrite strings have no escape for it)."""
    h = f"regexp_replace({expr}, '(?s)<head\\b.*?</head>', '', 'g')"
    h = f"regexp_replace({h}, '(?s)<script\\b[^>]*>.*?</script>', '', 'g')"
    h = f"regexp_replace({h}, '(?s)<style\\b[^>]*>.*?</style>', '', 'g')"
    h = f"regexp_replace({h}, '(?s)<!--.*?-->', '', 'g')"
    h = f"regexp_replace({h}, '{_BLOCK_RE}', chr(10), 'g')"
    h = f"regexp_replace({h}, '<[^>]+>', ' ', 'g')"
    h = sql_decode_entities(h)
    h = f"regexp_replace({h}, '[ \\t]+', ' ', 'g')"
    h = f"regexp_replace({h}, ' ?' || chr(10) || ' ?', chr(10), 'g')"
    h = f"regexp_replace({h}, chr(10) || '+', chr(10), 'g')"
    return f"regexp_replace({h}, '^\\s+|\\s+$', '', 'g')"


def html_title(html: Column | str) -> Column:
    """<title> content, entity-decoded and whitespace-trimmed."""
    t = F.regexp_extract(_c(html), r"(?s)<title>(.*?)</title>", 1)
    t = decode_entities(t)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def sql_html_title(expr: str) -> str:
    t = f"regexp_extract({expr}, '(?s)<title>(.*?)</title>', 1)"
    t = sql_decode_entities(t)
    t = f"regexp_replace({t}, '\\s+', ' ', 'g')"
    return f"trim({t})"


# --- anchor text -------------------------------------------------------------

_ANCHOR_RE = r'<a href="([^"]+)"[^>]*>([^<]*)</a>'


def anchor_pairs(
    pages: DataFrame, html_col: str = "page", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (source doc, href, anchor text): both capture groups
    of the anchor regexp extracted in one scan pass (two
    regexp_extract_all calls zip into structs — still codegen), then
    exploded. The downstream aggregate is the standard web-corpus
    popularity/description signal: what OTHER pages call this URL."""
    h = F.col(html_col)
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 1).alias("href"),
        F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 2).alias("anchor"),
    )
    return pages.select(
        F.col(id_col).alias("src_doc"), F.explode(pairs).alias("a")
    ).select("src_doc", F.col("a.href").alias("href"),
             F.col("a.anchor").alias("anchor"))


def sql_anchor_pairs_cte(page_expr: str, table: str = "documents") -> str:
    """CTE body ``anchors(src_doc, href, anchor)`` — DuckDB twin
    (list_zip + unnest of the two group extractions)."""
    return f"""anchors AS (
  SELECT doc_id AS src_doc,
         z[1] AS href,
         z[2] AS anchor
  FROM (
    SELECT doc_id,
           list_zip(regexp_extract_all({page_expr}, '{_ANCHOR_RE}', 1),
                    regexp_extract_all({page_expr}, '{_ANCHOR_RE}', 2)) AS zs
    FROM {table}
  ), unnest(zs) AS u(z)
)"""


# --- sitemaps ----------------------------------------------------------------


def synth_sitemap(site: Column | str) -> Column:
    """Deterministic sitemap XML for a site: bare-host <loc> entries
    for the EVEN paths /a/0, /a/2 .. /a/(2*(2 + site % 11)) — path
    numbers run up to 24 while the corpus only ever crawls
    /a/(doc_id % 13), so the listed set deliberately straddles the
    crawled set: even paths <= 12 are usually known, paths > 12 are
    real frontier. Closed form shared with sql_synth_sitemap."""
    s = _c(site)
    tld = F.element_at(
        F.array(F.lit(".com"), F.lit(".org"), F.lit(".io"), F.lit(".co.uk")),
        (s % 4 + 1).cast("int"),
    )
    locs = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (2 + s % 11).cast("int")),
            lambda k: F.concat(
                F.lit("<url><loc>https://site"),
                s.cast("string"),
                tld,
                F.lit("/a/"),
                (k * 2).cast("string"),
                F.lit("</loc></url>"),
            ),
        ),
        "",
    )
    return F.concat(
        F.lit('<?xml version="1.0"?><urlset>'), locs, F.lit("</urlset>")
    )


def sql_synth_sitemap(site_expr: str) -> str:
    s = f"({site_expr})"
    tld = f"(['.com', '.org', '.io', '.co.uk'][{s} % 4 + 1])"
    return (
        f"'<?xml version=\"1.0\"?><urlset>' || "
        f"(SELECT coalesce(string_agg('<url><loc>https://site' || {s} || "
        f"{tld} || '/a/' || (k * 2) || '</loc></url>', '' ORDER BY k), '') "
        f"FROM unnest(generate_series(0, 2 + {s} % 11)) AS g(k)) || "
        f"'</urlset>'"
    )


def sitemap_paths(sitemaps: DataFrame, xml_col: str = "sitemap") -> DataFrame:
    """REAL parse: the path of every <loc> entry, exploded — one
    regexp_extract_all, codegen. Input is the per-site sitemap
    dimension (tiny next to the corpus)."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<loc>[a-z]+://[^/<]+(/[^<]*)</loc>"), 1
    )
    return sitemaps.withColumn("path", F.explode(locs)).drop(xml_col)
