"""Cypher parser + compiler tests.

Parser tests mirror the reference's expectations
(/root/reference/cypher_test.py); compiler tests run the example.py social
graph (19 MERGEs, /root/reference/example.py:241-261) and its 4-triple
MATCH (example.py:273), asserting the semantically-derivable answer."""

from __future__ import annotations

import pytest

from hash_db_spark.cypher import CypherCompiler, CypherParser

MATCH_Q = (
    "match (actor)-[:ACTED_IN]->(wallstreet:Movie {title: 'Wall Street'}) "
    "return actor"
)

EXPECTED_GRAPH = [
    {"kind": "match", "variable": "actor"},
    {"kind": "relationship", "name": "ACTED_IN"},
    {
        "kind": "match",
        "variable": "wallstreet",
        "label": "Movie",
        "attributes": {"title": "Wall Street"},
    },
]


def test_parse_match_reference_shape():
    p = CypherParser().parse(MATCH_Q)
    assert p.statement == MATCH_Q
    assert p.graph == EXPECTED_GRAPH
    assert p.return_clause == ["actor"]


def test_parse_match_case_insensitive():
    p = CypherParser().parse(MATCH_Q.upper().replace("ACTED_IN", "ACTED_IN"))
    assert p.kind == "match"


def test_parse_quoted_attr_keys():
    # example.py writes {'name': 'Samuel'} with quoted keys.
    p = CypherParser().parse(
        "merge (person:Person {'name': 'Samuel'})-[:FRIEND]->"
        "(t:Person {'name': 'Tasya'})"
    )
    assert p.kind == "merge"
    assert p.chains[0][0].attributes == {"name": "Samuel"}
    assert p.chains[0][1].name == "FRIEND"
    assert p.chains[0][1].direction == "right"


def test_parse_left_arrow_and_multi_pattern():
    p = CypherParser().parse(
        "match (a:X)<-[:R]-(b:Y), (b)-[:S]->(c:Z) return a, c"
    )
    assert p.chains[0][1].direction == "left"
    assert len(p.chains) == 2
    assert p.return_clause == ["a", "c"]


def test_parse_errors():
    with pytest.raises(ValueError):
        CypherParser().parse("select * from t")
    with pytest.raises(ValueError):
        CypherParser().parse("match (a:X")


# --- compiler on the example.py social graph -------------------------------

MERGES = [
    ("Samuel", "FRIEND", "Tasya"),
    ("Tasya", "FRIEND", "Samuel"),
    ("Samuel", "FRIEND", "Simon"),
    ("Simon", "FRIEND", "Samuel"),
    ("Samuel", "FRIEND", "John"),
    ("Simon", "FRIEND", "Sally"),
    ("Sally", "FRIEND", "Simon"),
    ("Tasya", "FRIEND", "Margaret"),
    ("Margaret", "FRIEND", "Tasya"),
]
LIKES_POSTED = [
    ("Person", "Samuel", "LIKES", "Post", "Ideas"),
    ("Person", "Tasya", "POSTED", "Post", "Ideas"),
    ("Person", "Tasya", "POSTED", "Post", "Lamentations"),
    ("Person", "Tasya", "POSTED", "Post", "Love"),
    ("Person", "Tasya", "POSTED", "Post", "Thoughts"),
    ("Person", "Samuel", "LIKES", "Post", "Thoughts"),
    ("Person", "Tasya", "LIKES", "Food", "Pocky"),
    ("Post", "Ideas", "REFERS", "Person", "Margaret"),
    ("Post", "Thoughts", "REFERS", "Person", "John"),
    ("Post", "Samuel", "LIKES", "Post", "Love"),
]


@pytest.fixture(scope="module")
def social(spark):
    nodes = spark.createDataFrame([], "id string, label string, name string")
    edges = spark.createDataFrame([], "src string, dst string, rel string")
    comp = CypherCompiler(nodes, edges)
    for a, rel, b in MERGES:
        nodes, edges = CypherCompiler(nodes, edges).run(
            f"merge (p:Person {{'name': '{a}'}})-[:{rel}]->"
            f"(q:Person {{'name': '{b}'}})"
        )
    for la, a, rel, lb, b in LIKES_POSTED:
        nodes, edges = CypherCompiler(nodes, edges).run(
            f"merge (p:{la} {{'name': '{a}'}})-[:{rel}]->"
            f"(q:{lb} {{'name': '{b}'}})"
        )
    return CypherCompiler(nodes.cache(), edges.cache())


def test_merge_idempotent(social):
    n0 = social.nodes.count()
    e0 = social.edges.count()
    nodes2, edges2 = social.run(
        "merge (p:Person {'name': 'Samuel'})-[:FRIEND]->(q:Person {'name': 'Tasya'})"
    )
    assert nodes2.count() == n0
    assert edges2.count() == e0


def test_single_node_scan(social):
    got = {r.p for r in social.run("match (p:Post) return p").collect()}
    # Note: label-qualified identity keeps Post 'Samuel' distinct from
    # Person 'Samuel' (the reference merges them — attribute-only lookup,
    # client.py:876-891 — which we deliberately do not replicate).
    assert got == {
        "post:Ideas", "post:Lamentations", "post:Love", "post:Thoughts",
        "post:Samuel",
    }


def test_one_hop(social):
    got = {
        (r.p, r.q)
        for r in social.run(
            "match (p:Person {'name': 'Samuel'})-[:FRIEND]->(q:Person) return p, q"
        ).collect()
    }
    assert got == {
        ("person:Samuel", "person:Tasya"),
        ("person:Samuel", "person:Simon"),
        ("person:Samuel", "person:John"),
    }


def test_example_four_triple_match(social):
    # example.py:273 — friends where start likes a post the friend posted,
    # and that post refers to a person.
    got = {
        (r.start, r.end, r.post, r.person)
        for r in social.run(
            "match (start:Person)-[:FRIEND]->(end:Person), "
            "(start)-[:LIKES]->(post:Post), "
            "(end)-[:POSTED]->(post:Post), "
            "(post:Post)-[:REFERS]->(person:Person) "
            "return start, end, post, person"
        ).collect()
    }
    assert got == {
        ("person:Samuel", "person:Tasya", "post:Ideas", "person:Margaret"),
        ("person:Samuel", "person:Tasya", "post:Thoughts", "person:John"),
    }


def test_document_path_compiler(spark):
    from hash_db_spark.operators import documents as D

    docs = spark.createDataFrame(
        [
            (1, "Sam Squire", 32,
             [{"name": "God"}, {"name": "databases"}, {"name": "computers"}]),
            (2, "Other", 20, [{"name": "sports"}]),
        ],
        "doc_id long, name string, age long, "
        "hobbies array<struct<name: string>>",
    )
    # example.py:324-335 — where people.~hobbies[]~name = 'God'
    got = D.filter_path(docs, "hobbies[]~name", "God", "doc_id", "name",
                        leaf_alias="hobby").collect()
    assert len(got) == 1 and got[0].doc_id == 1 and got[0].hobby == "God"
    # example.py:341-344 — select people.~hobbies[]~name
    hobbies = {
        r.hobby
        for r in D.select_path(docs, "hobbies[]~name", "hobby").collect()
    }
    assert hobbies == {"God", "databases", "computers", "sports"}


# --- generic node attributes (reference client.py:772-778, 876-891) --------


@pytest.fixture(scope="module")
def attr_graph(spark):
    from hash_db_spark.cypher import CypherCompiler

    nodes = spark.createDataFrame(
        [], "id string, label string, name string, attrs map<string,string>"
    )
    edges = spark.createDataFrame([], "src string, dst string, rel string")
    nodes, edges = CypherCompiler(nodes, edges).merge_many([
        "merge (p:Person {name: 'Sally', age: '30', city: 'Leeds'})"
        "-[:KNOWS]->(q:Person {name: 'Bob', age: '40'})",
        "merge (p:Person {name: 'Ann', age: '30'})-[:KNOWS]->"
        "(q:Person {name: 'Sally'})",
    ])
    return CypherCompiler(nodes, edges)


def test_match_by_attribute_only(attr_graph):
    got = {r.p for r in attr_graph.run(
        "match (p:Person {age: '30'}) return p").collect()}
    assert got == {"person:Sally", "person:Ann"}


def test_match_attribute_conjunction(attr_graph):
    got = {r.p for r in attr_graph.run(
        "match (p:Person {age: '30', city: 'Leeds'}) return p").collect()}
    assert got == {"person:Sally"}


def test_missing_attribute_matches_nothing(attr_graph):
    assert attr_graph.run(
        "match (p:Person {height: 'tall'}) return p").count() == 0


def test_return_full_node_objects(attr_graph):
    from hash_db_spark.cypher import CypherParser

    p = CypherParser().parse("match (p:Person {age: '40'}) return p")
    rows = attr_graph.match(p, with_names=True, with_attrs=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p, r.p_name, r.p_attrs) == ("person:Bob", "Bob", "age=40")


def test_merge_attrs_first_occurrence_wins(attr_graph):
    # Sally appears twice (with attrs, then bare) — one node, attrs kept.
    from hash_db_spark.cypher import CypherParser

    p = CypherParser().parse("match (p:Person {city: 'Leeds'}) return p")
    rows = attr_graph.match(p, with_attrs=True).collect()
    assert len(rows) == 1
    assert rows[0].p_attrs == "age=30;city=Leeds"


def test_merge_single_statement_dedupes(spark):
    # Same node mentioned in two chains of ONE statement -> one row, and
    # a repeated edge -> one row (regression for delta-dedupe).
    from hash_db_spark.cypher import CypherCompiler

    nodes = spark.createDataFrame(
        [], "id string, label string, name string, attrs map<string,string>"
    )
    edges = spark.createDataFrame([], "src string, dst string, rel string")
    nodes, edges = CypherCompiler(nodes, edges).run(
        "merge (a:Person {name: 'X'})-[:KNOWS]->(b:Person {name: 'Y'}), "
        "(a2:Person {name: 'X'})-[:KNOWS]->(b2:Person {name: 'Y'})"
    )
    assert nodes.count() == 2
    assert edges.count() == 1


def test_merge_many_equals_sequential(spark):
    from hash_db_spark.cypher import CypherCompiler

    stmts = [
        f"merge (p:Person {{'name': '{a}'}})-[:{rel}]->"
        f"(q:Person {{'name': '{b}'}})"
        for a, rel, b in MERGES
    ]
    empty_n = spark.createDataFrame(
        [], "id string, label string, name string, attrs map<string,string>"
    )
    empty_e = spark.createDataFrame([], "src string, dst string, rel string")

    n_seq, e_seq = empty_n, empty_e
    for s in stmts:
        n_seq, e_seq = CypherCompiler(n_seq, e_seq).run(s)
    n_bat, e_bat = CypherCompiler(empty_n, empty_e).merge_many(stmts)

    def canon_nodes(df):
        return {
            (r.id, r.label, r.name, tuple(sorted((r.attrs or {}).items())))
            for r in df.collect()
        }

    assert canon_nodes(n_seq) == canon_nodes(n_bat)
    assert {tuple(r) for r in e_seq.collect()} == {
        tuple(r) for r in e_bat.collect()
    }


def test_shred_infer_merges_heterogeneous_schemas(spark):
    from hash_db_spark.operators import documents as D

    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x"}',),
            ('{"a": 2, "c": [1, 2]}',),
            ('{"a": 3, "b": "y", "d": {"e": 4.5}}',),
        ],
        "doc string",
    )
    out = D.shred_infer(df, "doc")
    fields = dict(
        (f.name, f.dataType.simpleString())
        for f in out.schema["doc"].dataType.fields
    )
    # Union of keys across documents, types widened per-field.
    assert fields == {
        "a": "bigint", "b": "string", "c": "array<bigint>",
        "d": "struct<e:double>",
    }
    rows = {r.doc.a: r.doc for r in out.collect()}
    assert rows[1].b == "x" and rows[1].c is None
    assert rows[2].c == [1, 2] and rows[2].b is None
    assert rows[3].d.e == 4.5


def test_parse_var_length_edge():
    from hash_db_spark.cypher.parser import CypherParser, Edge

    p = CypherParser().parse(
        "match (a:Person)-[:FRIEND*1..3]->(b:Person) return a, b"
    )
    edge = p.chains[0][1]
    assert isinstance(edge, Edge)
    assert (edge.name, edge.min_hops, edge.max_hops) == ("FRIEND", 1, 3)
    assert edge.direction == "right"
    # left arrow + plain edges unchanged
    p2 = CypherParser().parse("match (a)<-[:KNOWS*2..2]-(b) return a")
    e2 = p2.chains[0][1]
    assert (e2.direction, e2.min_hops, e2.max_hops) == ("left", 2, 2)
    p3 = CypherParser().parse("match (a)-[:KNOWS]->(b) return a")
    e3 = p3.chains[0][1]
    assert (e3.min_hops, e3.max_hops) == (1, 1)


def test_parse_var_length_bad_range():
    from hash_db_spark.cypher.parser import CypherParser

    with pytest.raises(ValueError, match="hop range"):
        CypherParser().parse("match (a)-[:KNOWS*3..1]->(b) return a")
    with pytest.raises(ValueError, match="hop range"):
        CypherParser().parse("match (a)-[:KNOWS*0..2]->(b) return a")


def test_var_length_match_social(spark):
    """*1..2 over the social FRIEND graph: direct friends plus
    friends-of-friends (incl. the cycle back to Samuel)."""
    from hash_db_spark.queries.graph_queries import q_cypher_var_length

    got = {(r.a, r.b) for r in q_cypher_var_length(spark, "").collect()}
    expect_b = {
        "person:Tasya", "person:Simon", "person:John",   # 1 hop
        "person:Samuel", "person:Margaret", "person:Sally",  # 2 hops
    }
    assert got == {("person:Samuel", b) for b in expect_b}


def test_where_clause_equals_inline_attrs(attr_graph):
    """WHERE var.attr = 'v' must bind exactly like an inline {attr: 'v'}
    map (it folds into candidate generation)."""
    inline = {
        tuple(r)
        for r in attr_graph.run(
            "match (p:Person {age: '30'})-[:KNOWS]->(q:Person) return p, q"
        ).collect()
    }
    where = {
        tuple(r)
        for r in attr_graph.run(
            "match (p:Person)-[:KNOWS]->(q:Person) "
            "where p.age = '30' return p, q"
        ).collect()
    }
    assert inline == where and inline


def test_where_multiple_predicates(attr_graph):
    got = attr_graph.run(
        "match (p:Person)-[:KNOWS]->(q:Person) "
        "where p.age = '30' and p.city = 'Leeds' return p"
    ).collect()
    assert [r.p for r in got] == ["person:Sally"]


def test_where_unbound_variable_raises(attr_graph):
    import pytest

    with pytest.raises(ValueError, match="unbound"):
        attr_graph.run(
            "match (p:Person)-[:KNOWS]->(q:Person) where z.age = '30' return p"
        )


def test_return_count(attr_graph):
    got = attr_graph.run(
        "match (p:Person)-[:KNOWS]->(q:Person) return count(p)"
    ).collect()
    # Sally and Ann each know someone -> 2 distinct p matches
    assert [r.cnt for r in got] == [2]


def test_return_count_distinct_semantics(spark):
    """count(v) counts DISTINCT matches of v, not pattern rows."""
    from hash_db_spark.cypher import CypherCompiler

    nodes = spark.createDataFrame(
        [("person:a", "person", "a", {}), ("person:b", "person", "b", {}),
         ("person:c", "person", "c", {})],
        "id string, label string, name string, attrs map<string,string>",
    )
    edges = spark.createDataFrame(
        [("person:a", "person:b", "KNOWS"), ("person:a", "person:c", "KNOWS")],
        "src string, dst string, rel string",
    )
    got = CypherCompiler(nodes, edges).run(
        "match (p)-[:KNOWS]->(q) return count(p)"
    ).collect()
    assert [r.cnt for r in got] == [1]  # one distinct p (two rows)


def test_contradictory_constraints_match_nothing(attr_graph):
    """Conjunction semantics: the same attribute constrained to two
    different values (inline vs WHERE, or twice in WHERE) yields an
    EMPTY result — not last-writer-wins."""
    assert attr_graph.run(
        "match (p:Person {age: '30'})-[:KNOWS]->(q:Person) "
        "where p.age = '40' return p"
    ).count() == 0
    assert attr_graph.run(
        "match (p:Person)-[:KNOWS]->(q:Person) "
        "where p.age = '30' and p.age = '40' return p"
    ).count() == 0
    # sanity: the non-contradictory version still matches
    assert attr_graph.run(
        "match (p:Person {age: '30'})-[:KNOWS]->(q:Person) "
        "where p.age = '30' return p"
    ).count() > 0


def test_optional_match_left_join(social):
    rows = social.run(
        "match (p:Person) optional match (p)-[:POSTED]->(q:Post) return p, q"
    ).collect()
    persons = {
        r.id for r in social.nodes.filter("label = 'Person'").collect()
    }
    posted = {
        (r.src, r.dst)
        for r in social.edges.filter("rel = 'POSTED'").collect()
    }
    # every person appears; unmatched persons carry NULL q
    assert {r.p for r in rows} == persons
    for r in rows:
        if r.q is None:
            assert all(src != r.p for src, _ in posted), r.p
        else:
            assert (r.p, r.q) in posted


def test_optional_match_rejects_constrained_shared_var(social):
    with pytest.raises(ValueError, match="must be bare"):
        social.run(
            "match (p:Person) optional match (p:Post)-[:POSTED]->(q) return p"
        )


def test_optional_match_requires_shared_var(social):
    with pytest.raises(ValueError, match="share at least one"):
        social.run(
            "match (p:Person) optional match (a)-[:POSTED]->(b) return p"
        )


def test_optional_match_count_skips_nulls(social):
    """count(v) of an OPTIONAL MATCH variable must not count the NULL of
    unmatched rows (Cypher count(expr) skips NULLs)."""
    n_posters = social.run(
        "match (p:Person)-[:POSTED]->(q:Post) return count(q)"
    ).collect()[0]["cnt"]
    n_opt = social.run(
        "match (p:Person) optional match (p)-[:POSTED]->(q:Post) "
        "return count(q)"
    ).collect()[0]["cnt"]
    assert n_opt == n_posters  # NULL q rows contribute nothing


def test_multi_chain_lone_node_cross_product(social):
    """Comma-separated disconnected patterns produce the cross product
    (Cypher semantics); previously lone-node chains were silently
    dropped or raised 'unbound'."""
    rows = social.run(
        "match (a:Post), (b:Person {'name': 'Samuel'}) return a, b"
    ).collect()
    posts = {r["a"] for r in rows}
    assert all(r["b"] == "person:Samuel" for r in rows)
    assert len(posts) >= 1 and len(rows) == len(posts)


def test_merge_label_case_conflict_raises(spark):
    """Node identity is case-insensitive on the label; a merge whose id
    collides with an existing node of a different label must fail
    loudly, not silently skip creation."""
    nodes = spark.createDataFrame([], "id string, label string, name string")
    edges = spark.createDataFrame([], "src string, dst string, rel string")
    nodes, edges = CypherCompiler(nodes, edges).run(
        "merge (a:Person {'name': 'X'})-[:KNOWS]->(b:Person {'name': 'Y'})"
    )
    with pytest.raises(ValueError, match="label conflict"):
        CypherCompiler(nodes, edges).run(
            "merge (a:PERSON {'name': 'X'})-[:KNOWS]->"
            "(b:Person {'name': 'Z'})"
        )


def test_anonymous_vars_do_not_leak_in_default_projection(social):
    """MATCH without RETURN projects named variables only — the __anonN
    synthetics behind anonymous pattern nodes stay internal."""
    df = social.run("match (a:Person)-[:FRIEND]->()")
    assert list(df.columns) == ["a"]
