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
            ("localhost",),           # single label = its own (implicit-*)
            ("thing.unknowntld",),    # implicit '*' rule: unknown TLD is
                                      # a public suffix, label+TLD registers
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
        "thing.unknowntld": "thing.unknowntld",
    }


def test_registrable_domain_real_psl_semantics(spark):
    """The baked REAL Public Suffix List (data/psl.parquet), exercising
    every rule class against genuine entries: whole-host-is-a-suffix
    on uk/co.uk (the parent-TLD case a stand-in list masks), wildcard
    *.ck, exception !www.ck / !city.kawasaki.jp, a 5-label private
    rule, and an IDN rule in both unicode and punycode forms."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(W.psl_path())
    assert tbl.num_rows > 9000  # the real list, not a stand-in
    kinds = set(tbl["kind"].to_pylist())
    assert kinds == {0, 1}  # normals AND exceptions present

    hosts = spark.createDataFrame(
        [
            ("uk",), ("co.uk",), ("www.example.co.uk",),
            ("foo.ck",), ("b.foo.ck",),            # *.ck wildcard
            ("www.ck",), ("x.www.ck",),            # !www.ck exception
            ("foo.city.kawasaki.jp",),             # !city.kawasaki.jp
            ("bar.kawasaki.jp",),                  # *.kawasaki.jp
            ("my.bucket.s3.dualstack.ap-northeast-1.amazonaws.com",),
            ("shop.公司.cn",),             # IDN, unicode form
            ("shop.xn--55qx5d.cn",),               # IDN, punycode alias
        ],
        ["host"],
    )
    got = {r.host: r.domain for r in W.registrable_domain(hosts).collect()}
    assert got == {
        "uk": None,
        "co.uk": None,
        "www.example.co.uk": "example.co.uk",
        "foo.ck": None,
        "b.foo.ck": "b.foo.ck",
        "www.ck": "www.ck",
        "x.www.ck": "www.ck",
        "foo.city.kawasaki.jp": "city.kawasaki.jp",
        "bar.kawasaki.jp": None,
        "my.bucket.s3.dualstack.ap-northeast-1.amazonaws.com":
            "bucket.s3.dualstack.ap-northeast-1.amazonaws.com",
        "shop.公司.cn": "shop.公司.cn",
        "shop.xn--55qx5d.cn": "shop.xn--55qx5d.cn",
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


def test_registrable_domain_real_psl_scale(spark):
    """Real-PSL readiness (VERDICT r07 #6): a 1k-entry synthetic suffix
    table — multi-label up to depth 4, punycode-ish xn-- entries,
    overlapping prefixes so longest-match is genuinely exercised —
    through the SAME broadcast join, checked host-by-host against a
    pure-Python longest-match referee."""
    import random

    rng = random.Random(20260814)
    # Base TLD pool: ascii + punycode-ish (the PSL carries IDN suffixes
    # as punycode, e.g. xn--p1ai for .рф).
    tlds = [f"t{i}" for i in range(40)] + [f"xn--{i}a{i}b" for i in range(10)]
    suffixes = set(tlds)
    # Layer multi-label suffixes over random parents (PSL style:
    # co.uk under uk, s3.dualstack.region.amazonaws.com 4 deep).
    mids = ["co", "org", "ac", "gov", "s3", "cdn", "xn--o1ac"]
    while len(suffixes) < 1000:
        parent = rng.choice(sorted(suffixes))
        if parent.count(".") >= 3:  # depth cap 4
            continue
        suffixes.add(f"{rng.choice(mids)}{rng.randrange(30)}.{parent}")
    suffixes = tuple(sorted(suffixes))
    assert len(suffixes) == 1000
    assert max(s.count(".") + 1 for s in suffixes) == 4

    sfx_set = set(suffixes)

    def referee(host: str) -> str | None:
        # The real PSL algorithm: longest matching suffix wins,
        # INCLUDING the whole host — a host that IS a public suffix
        # has no registrable domain. No match falls through to the
        # implicit '*' rule: the last label alone is the suffix.
        labels = host.split(".")
        for k in range(len(labels), 0, -1):  # longest suffix first
            cand = ".".join(labels[-k:])
            if cand in sfx_set:
                return ".".join(labels[-k - 1:]) if k < len(labels) else None
        return ".".join(labels[-2:]) if len(labels) > 1 else None

    # Hosts: registrable-at-every-depth, bare suffixes, unmatched, and
    # hosts where a SHORTER suffix also matches (longest must win).
    host_rows = []
    picks = rng.sample(suffixes, 200)
    for i, s in enumerate(picks):
        host_rows.append(f"site{i}.{s}")          # label + suffix
        host_rows.append(f"www.deep{i}.{s}")      # extra subdomain
        host_rows.append(s)                       # bare suffix -> NULL
    host_rows += ["localhost", "nomatch.zzz", "a.b.zzz"]
    hosts = spark.createDataFrame([(h,) for h in host_rows], ["host"])

    got = {
        r.host: r.domain
        for r in W.registrable_domain(hosts, suffixes=suffixes).collect()
    }
    want = {h: referee(h) for h in set(host_rows)}
    assert got == want
    # sanity on the fixture itself: bare suffixes resolve to None, and
    # at least one deep (3+ label) suffix actually matched
    assert all(want[s] is None for s in picks)
    assert any(
        s.count(".") >= 2 and want[f"site{i}.{s}"] == f"site{i}.{s}"
        for i, s in enumerate(picks)
    )


def test_html_hrefs_extracts_only_double_quoted_href(spark):
    html = (
        '<body data-href="https://decoy.example/x">'
        '<a href="https://a.example/1">1</a>'
        "<a href='https://singlequote.example/y'>s</a>"
        '<div href="https://b.example/2"/>'
        '<a href="">empty</a></body>'
    )
    df = spark.createDataFrame([(html,)], ["html"])
    got = df.select(W.html_hrefs("html").alias("h")).collect()[0].h
    # data-href and single-quoted href are out of spec; empty href is a
    # real (if useless) attribute value and is extracted.
    assert got == ["https://a.example/1", "https://b.example/2", ""]


def test_synth_html_roundtrips_link_targets(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    out = df.select(
        "doc_id",
        W.link_targets("doc_id").alias("t"),
        W.html_hrefs(W.synth_html("doc_id")).alias("h"),
    ).collect()
    for r in out:
        assert 1 + r.doc_id % 3 == len(r.t) == len(r.h)
        for t, href in zip(r.t, r.h):
            assert f"site{t % 23}" in href


def test_link_extraction_plan_is_pure_codegen(spark):
    from hash_db_spark.plans.inspect import formatted_plan

    df = spark.createDataFrame([(1,)], ["doc_id"])
    plan = formatted_plan(
        df.select(F.explode(W.html_hrefs(W.synth_html("doc_id"))).alias("h"))
    )
    for slow in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert slow not in plan


def test_robots_parse_skips_non_disallow_lines(spark):
    df = spark.createDataFrame([("www.site19.com",)], ["host"])
    out = df.select(
        W.robots_disallow_prefixes(W.synth_robots("host")).alias("p")
    ).collect()[0].p
    # site 19: 19 % 19 == 0 -> block-all rule present; (19*5+1)%13 = 5;
    # the Crawl-delay and User-agent lines must not leak into rules.
    assert out == ["/a/5", "/"]


def test_robots_filter_prefix_semantics(spark):
    # site1 disallows /a/6 ((1*5+1)%13); '/a/6x' is prefix-blocked,
    # '/a/7' is not; site0 (0%19==0) blocks everything.
    rows = [
        (1, "https://site1.org/a/6"),
        (2, "https://site1.org/a/6x"),
        (3, "https://site1.org/a/7"),
        (4, "https://site0.com/a/3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, curl string")
    got = {
        r.host: (r.n_blocked, r.n_allowed)
        for r in W.robots_url_filter(df).collect()
    }
    assert got == {"site1.org": (2, 1), "site0.com": (1, 0)}


def test_robots_filter_plan_no_forced_broadcast_and_no_python(spark):
    """The per-host rules frame is corpus-derived (O(distinct hosts)),
    so the operator must NOT force-broadcast it — the plan may pick a
    broadcast at this size via AQE, but no hint pins it (VERDICT r08
    #3). The rule parse itself must stay codegen (no Python evals)."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = spark.createDataFrame(
        [(1, "https://site1.org/a/6")], "doc_id long, curl string"
    )
    plan = formatted_plan(W.robots_url_filter(df))
    assert "Join" in plan  # the rules join is still there
    # no ResolvedHint/UnresolvedHint survives to the analyzed plan when
    # the code carries no broadcast() call; codegen stays Python-free
    for slow in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert slow not in plan
    import inspect

    src = inspect.getsource(W.robots_url_filter) + inspect.getsource(
        W.fetch_schedule
    )
    assert "F.broadcast" not in src


def test_fetch_schedule_slots_and_delay(spark):
    # site2: delay = 1 + 2%5 = 3s; three URLs on one host sequence at
    # 0/3/6; a second host schedules independently from slot 0.
    rows = [
        (5, "https://site2.io/a/1"),
        (3, "https://site2.io/a/2"),
        (9, "https://site2.io/a/3"),
        (4, "https://www.site7.org/a/4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, curl string")
    got = {
        r.id: (r.host, r.slot, r.fetch_at)
        for r in W.fetch_schedule(df).collect()
    }
    assert got == {
        3: ("site2.io", 0, 0),
        5: ("site2.io", 1, 3),
        9: ("site2.io", 2, 6),
        4: ("www.site7.org", 0, 0),
    }


def test_robots_crawl_delay_parse(spark):
    df = spark.createDataFrame([("cdn.site13.io",)], ["host"])
    got = df.select(
        W.robots_crawl_delay(W.synth_robots("host")).alias("d")
    ).collect()[0].d
    assert got == 1 + 13 % 5


def test_rank_weighted_caps_respects_quota(spark, sf_dir):
    from hash_db_spark.queries.web_queries import q_rank_weighted_caps

    rows = q_rank_weighted_caps(spark, sf_dir).collect()
    assert rows, "caps output empty"
    per_host: dict[str, int] = {}
    quotas: dict[str, int] = {}
    for r in rows:
        assert r.quota >= 1
        per_host[r.host] = per_host.get(r.host, 0) + 1
        quotas[r.host] = r.quota
    for h, n in per_host.items():
        assert n <= quotas[h], h


def test_crawl_prep_decodes_warc_exactly_once(spark, sf_dir):
    """The WARC Arrow decode must not re-execute per consumer: after
    the eager checkpoint of the post-dedup URL frame, the final plan
    reads the checkpoint (zero MapInPandas nodes) and the decode ran
    exactly once, at checkpoint build. Rows prove the decode happened."""
    import re

    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import (
        q_crawl_prep,
        q_crawl_prep_polite,
    )

    for fn in (q_crawl_prep, q_crawl_prep_polite):
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert not re.findall(r"\(\d+\) MapInPandas", plan), fn.__name__
        assert df.count() > 0, fn.__name__


def test_registrable_domain_referee_over_real_psl(spark):
    """Property-style check of the full PSL algorithm against an
    INDEPENDENT referee implementing the publicsuffix.org spec
    (exception rule > longest literal/wildcard match > implicit '*')
    over hosts composed from the REAL rule set: random rule keys with
    wildcard slots filled and 0-2 extra subdomain labels prepended,
    plus the bare rule itself (whole-host-is-a-suffix). Deterministic
    seed, one Spark job."""
    import random

    import pyarrow.parquet as pq

    tbl = pq.read_table(W.psl_path())
    rules = {}  # key -> (n_labels, kind)
    for key, n, kind in zip(
        tbl["key"].to_pylist(),
        tbl["n_labels"].to_pylist(),
        tbl["kind"].to_pylist(),
    ):
        rules[key] = (n, kind)

    def referee(host: str) -> str | None:
        labels = host.split(".")
        n = len(labels)
        best = None  # (kind, rule_label_count)
        for k in range(1, n + 1):
            cands = [".".join(labels[-k:])]
            if k >= 2:
                cands.append("*." + ".".join(labels[-(k - 1):]))
            for c in cands:
                if c in rules:
                    rl, kind = rules[c]
                    if best is None or (kind, rl) > best:
                        best = (kind, rl)
        if best is None:
            k_ps = 1  # implicit '*'
        elif best[0] == 1:
            k_ps = best[1] - 1  # exception: minus leftmost label
        else:
            k_ps = best[1]
        if n <= k_ps:
            return None
        return ".".join(labels[-(k_ps + 1):])

    rng = random.Random(20260815)
    keys = sorted(rules)
    hosts = set()
    while len(hosts) < 300:
        key = rng.choice(keys)
        base = key.replace("*", f"w{rng.randrange(50)}")
        shape = rng.randrange(4)
        if shape == 0:
            hosts.add(base)  # the rule itself
        elif shape == 1:
            hosts.add(f"site{rng.randrange(99)}.{base}")
        elif shape == 2:
            hosts.add(f"a{rng.randrange(9)}.b{rng.randrange(9)}.{base}")
        else:
            hosts.add(f"x.unknown{rng.randrange(99)}")  # implicit '*'

    df = spark.createDataFrame([(h,) for h in sorted(hosts)], ["host"])
    got = {r.host: r.domain for r in W.registrable_domain(df).collect()}
    want = {h: referee(h) for h in hosts}
    bad = {h: (got[h], want[h]) for h in hosts if got[h] != want[h]}
    assert not bad, dict(list(bad.items())[:5])
    # the sample must actually exercise every rule class
    assert any(rules[k][1] == 1 for k in keys)  # exceptions exist
    assert any(v is None for v in want.values())  # bare-suffix hosts
    assert any(v is not None for v in want.values())


# --- HITS hubs & authorities -------------------------------------------------


def test_hits_hand_computed(spark):
    """Integer HITS on a 4-node graph, every value hand-derived:
    edges 1->3, 1->4, 2->3; after 2 iterations hub(1)=8, hub(2)=5,
    auth(3)=5, auth(4)=3, all other scores 0."""
    from hash_db_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 3)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["id"])
    got = {r.id: (r.hub, r.auth) for r in hits(nodes, edges).collect()}
    assert got == {1: (8, 0), 2: (5, 0), 3: (0, 5), 4: (0, 3)}


def test_hits_hosts_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued hits_hosts entry:
    identical (id, hub, auth) sets on both engines — exact int64, no
    rounding grid involved."""
    import duckdb

    from hash_db_spark.queries.web_queries import (
        _hits_hosts_oracle,
        q_hits_hosts,
    )

    got = sorted(
        (r.id, int(r.hub), int(r.auth))
        for r in q_hits_hosts(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (r[0], int(r[1]), int(r[2]))
        for r in con.execute(_hits_hosts_oracle()).fetchall()
    )
    con.close()
    assert len(got) > 0
    assert got == want
    # HITS found real structure: someone is a hub, someone an authority
    assert max(h for _, h, _ in got) > 0
    assert max(a for _, _, a in got) > 0


def test_hits_edgeless_nodes_score_zero(spark):
    """Nodes with no edges: auth = hub = 0 (not NULL, not 1) after any
    iteration — the left-join coalesce contract."""
    from hash_db_spark.operators.graph import hits

    nodes = spark.createDataFrame([(1,), (2,)], ["id"])
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in hits(nodes, edges).collect()}
    assert got == {1: (0, 0), 2: (0, 0)}


def test_lpa_two_triangles_bridge(spark):
    """Hand-derived: two triangles joined by one bridge edge resolve to
    exactly two communities — the density signal connected components
    cannot give (components would merge them into one)."""
    from hash_db_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["src", "dst"],
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    got = {r.id: r.community for r in lpa_communities(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_host_communities_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r11-candidate host_communities."""
    import duckdb

    from hash_db_spark.queries.web_queries import (
        _host_communities_oracle,
        q_host_communities,
    )

    got = sorted(
        (r.id, r.community) for r in q_host_communities(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (r[0], r[1]) for r in con.execute(_host_communities_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0
    # LPA found non-trivial structure: fewer communities than nodes
    assert len({c for _, c in got}) < len(got)


class TestHostGraphProfile:
    """The five-signal host dimension
    (queries/web_queries.py:q_host_graph_profile)."""

    def test_oracle_parity_and_signal_consistency(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.web_queries import (
            _host_graph_profile_oracle,
            q_host_graph_profile,
        )

        rows = q_host_graph_profile(spark, sf_dir).collect()
        assert len(rows) > 0
        got = sorted(tuple(r) for r in rows)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_host_graph_profile_oracle()).fetchall()
        )
        con.close()
        assert got == want
        # cross-signal laws: every 2-core member has degree >= 2;
        # every host with a coefficient has degree >= 2; every host
        # belongs to a community; ranks are positive and sum to ~1
        by = {r.host: r for r in rows}
        for r in rows:
            if r.in_core2:
                assert r.deg >= 2
            if r.coef is not None:
                assert r.deg >= 2
            assert r.community is not None
            assert r.rank > 0
        assert abs(sum(r.rank for r in rows) - 1.0) < 0.05


class TestUrlPathTemplates:
    """Digit-collapsed path templating
    (operators/web.py:path_template)."""

    def test_template_collapses_digit_runs(self, spark):
        import pyspark.sql.functions as F

        from hash_db_spark.operators.web import path_template

        df = spark.createDataFrame(
            [("/a/17/x",), ("/a/9/x",), ("/p2024/d05/",), ("/plain",)],
            ["p"],
        )
        got = [r.t for r in df.select(path_template("p").alias("t")).collect()]
        assert got == ["/a/{d}/x", "/a/{d}/x", "/p{d}/d{d}/", "/plain"]

    def test_oracle_parity_and_fanout(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.web_queries import (
            _url_path_templates_oracle,
            q_url_path_templates,
        )

        rows = q_url_path_templates(spark, sf_dir).collect()
        assert len(rows) > 0
        got = sorted(tuple(r) for r in rows)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_url_path_templates_oracle()).fetchall()
        )
        con.close()
        assert got == want
        # the synthetic corpus is parameterized by construction: at
        # least one template fans out to multiple concrete paths
        assert any(r.n_paths > 1 for r in rows)
        for r in rows:
            assert r.n_paths <= r.n_urls
