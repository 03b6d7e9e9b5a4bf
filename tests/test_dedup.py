"""Unit tests for dedup operators on small controlled corpora."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from hash_db_spark.operators import dedup as D

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different words appear in this one"),
    (5, "pack my box with five dozen liquor jugs today"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_exact_dup_groups(docs):
    groups = D.exact_dup_groups(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0].cnt == 2
    assert groups[0].keep_id == 1


def test_exact_dedup_keep_first(docs):
    kept = sorted(r.keep_id for r in D.exact_dedup_keep_first(docs, "text", "doc_id").collect())
    assert kept == [1, 2, 4, 5]  # doc 3 deduped into doc 1


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only two")], ["id", "t"])
    assert df.select(D.shingles("t", 3).alias("s")).collect()[0].s == []


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.4).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # 1-3 exact (jac 1.0), 1-2 and 2-3 near (6/8 shingles shared).
    assert got == {(1, 2), (1, 3), (2, 3)}
    jac = {(r.id_a, r.id_b): r.jac for r in pairs}
    assert jac[(1, 3)] == 1.0
    assert 0.5 < jac[(1, 2)] < 1.0


def test_minhash_lsh_finds_planted_pairs(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.4).collect()
    }
    # LSH must find the exact dup; the 0.75-jaccard pair is found w.h.p.
    # with 8 bands of 2 (p ≈ 1-(1-0.75²)⁸ ≈ 0.9997) — deterministic here
    # since the hash family is fixed.
    assert (1, 3) in pairs
    assert pairs <= {(1, 2), (1, 3), (2, 3)}


def test_simhash_identical_docs_equal_hash(docs):
    sims = {r.id: r.simhash for r in D.simhash(docs, "text", "doc_id").collect()}
    assert sims[1] == sims[3]
    assert sims[1] != sims[4]
    assert all(0 <= v < 2**D.SIMHASH_BITS for v in sims.values())


def test_simhash_near_pairs_exact_dup_zero_distance(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    }
    assert pairs[(1, 3)] == 0


def test_embedding_near_dup(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),    # cos ≈ 0.994 with 1
            (3, [0.0, 1.0, 0.0]),    # orthogonal to 1
            (4, [-1.0, 0.0, 0.0]),   # opposite of 1
        ],
        ["vec_id", "embedding"],
    )
    pairs = {
        (r.id_a, r.id_b): r.cos
        for r in D.embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == pytest.approx(0.9939, abs=1e-3)


def test_embedding_guard_rejects_oversized(spark, monkeypatch):
    monkeypatch.setattr(D, "MAX_BROADCAST_VECTORS", 2)
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="broadcastable baseline"):
        D.embedding_near_dup_pairs(emb)


def test_embedding_guard_adds_no_extra_job(spark):
    # The size guard and the matrix collect must share ONE action: the
    # ids-only probe + full collect variant doubled the scan (BENCH r05
    # regression on dedup_embedding and graph_degree_hist). A single
    # limit().collect() can itself launch several incremental jobs
    # (CollectLimit scale-up), so the invariant is job-count parity with
    # one bare limit+collect, not literally one job.
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(8)], ["vec_id", "embedding"]
    ).cache()
    emb.count()  # materialize outside the measured groups
    sc = spark.sparkContext
    sc.setJobGroup("emb-baseline-jobs", "bare limit collect")
    try:
        emb.select("vec_id", "embedding").limit(
            D.MAX_BROADCAST_VECTORS + 1
        ).collect()
    finally:
        sc.setJobGroup("", "")
    sc.setJobGroup("emb-guard-jobs", "guard+collect job count")
    try:
        D.embedding_near_dup_pairs(emb, threshold=0.99)
    finally:
        sc.setJobGroup("", "")
    tracker = sc.statusTracker()
    baseline = len(tracker.getJobIdsForGroup("emb-baseline-jobs"))
    guarded = len(tracker.getJobIdsForGroup("emb-guard-jobs"))
    assert baseline >= 1
    assert guarded == baseline


def test_ngram_hot_shingle_cap(spark):
    from hash_db_spark.operators import dedup as D

    # One trigram ('alpha beta gamma') appears in EVERY doc — at corpus
    # scale this is the quadratic skew bomb (k docs -> k^2 candidate
    # rows). With the doc-frequency cap the filler docs never meet (their
    # only shared shingle is hot, and their true jaccard is ~0 anyway),
    # while the genuine dup pair is still found through its non-hot
    # shingles and scores its TRUE jaccard from the full shingle arrays.
    common = "alpha beta gamma"
    rows = [
        (i, f"{common} unique{i} token{i} word{i} extra{i}")
        for i in range(30)
    ]
    rows.append((100, f"{common} delta epsilon zeta eta"))
    rows.append((101, f"{common} delta epsilon zeta eta"))
    df = spark.createDataFrame(rows, "doc_id long, body string")

    out = D.ngram_jaccard_pairs(
        df, "body", "doc_id", threshold=0.5, max_doc_freq=5
    )
    got = {(r.id_a, r.id_b, r.jac) for r in out.collect()}
    assert got == {(100, 101, 1.0)}

    # Uncapped produces the identical result here (the cap only prunes
    # candidates that verification would reject) — result-identical, just
    # without the k^2 hot-shingle join blowup.
    uncapped = D.ngram_jaccard_pairs(
        df, "body", "doc_id", threshold=0.5, max_doc_freq=10**9
    )
    assert {(r.id_a, r.id_b, r.jac) for r in uncapped.collect()} == got


def test_connected_components_shapes(spark):
    from hash_db_spark.operators import dedup as D

    # chain 1-2-3-4, star 10-(11,12,13), pair 20-21, plus A~B, B~C
    # without A~C (the non-transitive case clustering exists for).
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),
            (10, 11), (10, 12), (10, 13),
            (20, 21),
        ],
        "id_a long, id_b long",
    )
    expect = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
    }
    # driver union-find fast path (default) AND the distributed
    # min-label-propagation loop (forced with driver_threshold=0).
    got_driver = {
        (r.id, r.cluster) for r in D.connected_components(pairs).collect()
    }
    got_dist = {
        (r.id, r.cluster)
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    assert got_driver == expect
    assert got_dist == expect


def test_dedup_empty_inputs(spark):
    """Operators must tolerate empty corpora (ingest start-of-time)."""
    from hash_db_spark.operators import dedup as D

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.ngram_jaccard_pairs(empty_docs, "text", "doc_id").count() == 0
    assert D.minhash_lsh_pairs(empty_docs, "text", "doc_id").count() == 0

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(empty_pairs).count() == 0
    assert D.connected_components(empty_pairs, driver_threshold=0).count() == 0


def test_minhash_hot_band_cap_keeps_identical_pairs(spark):
    """Adversarial boilerplate: 12 identical docs make every band bucket
    size-12. With max_band_bucket=2 the band join sees NONE of them, yet
    all 66 identical pairs come back through the signature-equality
    rescue — bounded candidates, no lost duplicates (VERDICT r3 #4)."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(12)]
    rows += [(100, "completely different text about spark shuffles and joins here")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): r.jac
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.5, max_band_bucket=2
        ).collect()
    }
    expect = {(a, b) for a in range(12) for b in range(a + 1, 12)}
    assert set(pairs) == expect
    assert all(j == 1.0 for j in pairs.values())


def test_minhash_cap_default_matches_uncapped(docs):
    """On a non-degenerate corpus the default cap never triggers: capped
    and uncapped runs return identical pairs."""
    capped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.4).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.4, max_band_bucket=None
        ).collect()
    }
    assert capped == uncapped


def test_strip_hot_spans_removes_repeated_span(spark):
    """The 4-token span repeated across docs 1 and 2 is scrubbed from
    both; unique text survives; a fully-boilerplate doc becomes ''."""
    rows = [
        (1, "alpha beta gamma delta unique one two"),
        (2, "start alpha beta gamma delta finish"),
        (3, "totally different text with no overlap at all"),
        (4, "alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.id: r.text_clean
        for r in D.strip_hot_spans(docs, "text", "doc_id", n=4).collect()
    }
    assert got[1] == "unique one two"
    assert got[2] == "start finish"
    assert got[3] == "totally different text with no overlap at all"
    assert got[4] == ""


def test_strip_hot_spans_overlapping_coverage(spark):
    """Overlapping hot spans union their covered positions (doc 1 has
    the repeated 3-gram at two overlapping starts)."""
    rows = [
        (1, "x a b c a b c y"),
        (2, "a b c"),
        (3, "c b a"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.id: r.text_clean
        for r in D.strip_hot_spans(docs, "text", "doc_id", n=3).collect()
    }
    assert got[1] == "x y"
    assert got[2] == ""
    assert got[3] == "c b a"


def test_minhash_cap_near_identical_cluster_stays_connected(spark):
    """The recall cliff the cap could cause: a cluster of near-identical
    but NOT byte-identical docs (templated boilerplate, one varying
    token) overflows every band bucket at cap=2. The neighbor-chain
    rescue must keep the cluster CONNECTED so downstream clustering
    still collapses it — even though capped mode no longer enumerates
    the full k^2 pair list."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight"
    )
    rows = [(i, f"{base} variant{i}") for i in range(12)]
    rows.append((100, "entirely unrelated words about query planners here"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5, max_band_bucket=2
    )
    comp = D.connected_components(pairs)
    clusters = {r.id: r.cluster for r in comp.collect()}
    assert set(clusters) == set(range(12))  # all 12, never the outlier
    assert len(set(clusters.values())) == 1  # ONE connected cluster


def test_strip_hot_spans_null_text(spark):
    """NULL text tokenizes to no tokens (not the literal 'None') and
    comes back as '' — matching the SQL oracle's NULL handling."""
    rows = [(1, None), (2, "alpha beta gamma delta"), (3, "alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: r.text_clean
        for r in D.strip_hot_spans(docs, "text", "doc_id", n=4).collect()
    }
    assert got == {1: "", 2: "", 3: ""}


def test_simhash_cap_identical_cluster(spark):
    """12 identical docs overflow every byte bucket at cap=2; all 66
    hamming-0 pairs come back via the identical-simhash rescue."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(12)]
    rows.append((100, "completely different text about spark shuffles here"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_pairs(
            docs, "text", "doc_id", max_hamming=3, max_band_bucket=2
        ).collect()
    }
    expect = {(a, b) for a in range(12) for b in range(a + 1, 12)}
    assert set(pairs) == expect
    assert all(h == 0 for h in pairs.values())


def test_simhash_cap_default_matches_uncapped(docs):
    capped = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(
            docs, "text", "doc_id", max_hamming=3, max_band_bucket=None
        ).collect()
    }
    assert capped == uncapped


def test_incremental_probe_hot_bucket_representative(spark):
    """A hot corpus bucket (boilerplate cluster) contributes exactly one
    representative candidate per probing new doc instead of bucket-size
    fan-out; the new boilerplate doc is still flagged (against the min-id
    representative), the unique doc matches nothing."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(10, 22)]
        + [(99, "some perfectly ordinary unrelated corpus document here")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, boiler), (2, "fresh unseen words nothing like the others at all")],
        ["doc_id", "text"],
    )
    got = D.minhash_pairs_against(
        new, corpus, "text", "doc_id", threshold=0.5
    )
    # monkeypatch-free: route through the index probe with a tiny cap
    base, bands = D.minhash_index(
        new.select("doc_id", "text").unionByName(corpus),
        "text",
        "doc_id",
        keep=(),
    )
    new_ids = {1, 2}
    nb = base.filter(F.col("id").isin(new_ids))
    nbands = bands.filter(F.col("id").isin(new_ids))
    cb = base.filter(~F.col("id").isin(new_ids))
    cbands = bands.filter(~F.col("id").isin(new_ids))
    capped = {
        (r.new_id, r.old_id): r.jac
        for r in D.minhash_pairs_against_index(
            nb, nbands, cb, cbands, threshold=0.5, max_band_bucket=2
        ).collect()
    }
    # the exact-content rescue matches ALL identical corpus docs (the
    # rep-only form previously surfaced just the min id, and could miss
    # entirely when the rep happened to be dissimilar)
    assert capped == {(1, i): 1.0 for i in range(10, 22)}
    # uncapped default on this small corpus still finds the new dup
    assert any(r.new_id == 1 for r in got.collect())


def test_components_distributed_long_path(spark):
    """A 60-node path (what the neighbor-chain rescue emits for a hot
    cluster) through the DISTRIBUTED label path (driver_threshold=0):
    pointer doubling must converge within the default 20 rounds — plain
    min-propagation would need 59."""
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(59)], ["id_a", "id_b", "jac"]
    )
    comp = D.connected_components(pairs, driver_threshold=0)
    got = {r.id: r.cluster for r in comp.collect()}
    assert got == {i: 0 for i in range(60)}


def test_components_nonconvergence_raises(spark):
    """max_iter=1 on a graph needing more rounds fails loudly instead of
    returning plausible-but-wrong labels."""
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(29)], ["id_a", "id_b", "jac"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, driver_threshold=0, max_iter=1)


def test_star_components_match_min_label(spark):
    """large-star/small-star must agree with the min-label/union-find
    implementation — including on a long PATH, the shape whose diameter
    makes min-label slow and this algorithm the documented scale path."""
    import random

    rng = random.Random(7)
    rand_pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    path_pairs = [(i, i + 1) for i in range(40)]
    two_comp = [(1, 2), (2, 3), (10, 11), (12, 11)]
    # self-pair-only node 99 must survive as a singleton in BOTH impls
    selfy = [(1, 2), (99, 99)]
    for pairs in (rand_pairs, path_pairs, two_comp, selfy):
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        want = {
            (r.id, r.cluster)
            for r in D.connected_components(df, driver_threshold=0).collect()
        }
        got = {
            (r.id, r.cluster)
            for r in D.connected_components_star(df).collect()
        }
        assert got == want


def test_minhash_memo_evicts_dead_entries(spark, docs):
    """A memo entry whose source raises on sameSemantics (stopped
    session) is evicted on sight, not left occupying a FIFO slot."""
    from hash_db_spark.operators import dedup as D

    class _Dead:
        def __getattr__(self, name):
            raise RuntimeError("session stopped")

    params = ("text", "doc_id", 32, 2, (), False)
    D._INDEX_MEMO.insert(0, (_Dead(), params, None, []))
    try:
        base, bands = D.minhash_index(docs, "text", "doc_id", num_hashes=32)
        assert base is not None
        assert all(
            not isinstance(src, _Dead) for src, *_ in D._INDEX_MEMO
        )
    finally:
        D._INDEX_MEMO[:] = [
            e for e in D._INDEX_MEMO if not isinstance(e[0], _Dead)
        ]


def test_capped_index_probe_exact_dup_rescue(spark):
    """Capped mode guarantee: an exact-content duplicate always matches
    even when its every shared bucket is hot — the shingle-fingerprint
    rescue finds ALL identical corpus docs, not just each hot bucket's
    min-id representative."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(10, text), (11, text), (12, text)], ["doc_id", "text"]
    )
    new = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    tag = "__is_new"
    tagged = new.withColumn(tag, F.lit(True)).unionByName(
        corpus.withColumn(tag, F.lit(False))
    )
    base, bands = D.minhash_index(tagged, "text", "doc_id", keep=(tag,))
    got = D.minhash_pairs_against_index(
        base.filter(F.col(tag)).drop(tag),
        bands.filter(F.col(tag)).drop(tag),
        base.filter(~F.col(tag)).drop(tag),
        bands.filter(~F.col(tag)).drop(tag),
        threshold=0.5,
        max_band_bucket=1,  # every bucket (3 identical members) is hot
    )
    olds = sorted(r.old_id for r in got.collect())
    assert olds == [10, 11, 12]


def test_hamming_pairs_against_probe_cap_and_rescue(spark):
    """Batch-vs-corpus hamming probe: near matches found via bands,
    boilerplate corpus buckets excluded but exact-equal boilerplate
    rescued, batch never pairs with itself."""
    from hash_db_spark.operators import dedup as D

    BOILER = (1 << 30) | 3
    batch = spark.createDataFrame(
        [
            (1000, 0b1111),            # near-dup of corpus 1/2
            (1001, BOILER),            # exact copy of hot boilerplate
            (1002, (1 << 59) | 1),     # matches nothing
        ],
        ["id", "dhash"],
    )
    corpus_rows = [(1, 0b1111), (2, 0b1111 | (1 << 5))]
    # 70 corpus members share BOILER -> every band bucket it occupies
    # exceeds cap 64 -> band join skips it; exact rescue still fires.
    corpus_rows += [(100 + i, BOILER) for i in range(70)]
    corpus = spark.createDataFrame(corpus_rows, ["id", "dhash"])
    got = {
        (r.batch_id, r.corpus_id): r.hamming
        for r in D.hamming_pairs_against(
            batch, corpus, "dhash", max_hamming=3, max_band_bucket=64
        ).collect()
    }
    expect = {(1000, 1): 0, (1000, 2): 1}
    expect.update({(1001, 100 + i): 0 for i in range(70)})
    assert got == expect

    # near-miss of boilerplate (hamming 1) is consciously dropped: its
    # cold bands don't match, and rescue is exact-only
    near_boiler = spark.createDataFrame(
        [(2000, BOILER ^ (1 << 2))], ["id", "dhash"]
    )
    got2 = D.hamming_pairs_against(
        near_boiler, corpus, "dhash", max_hamming=3, max_band_bucket=64
    ).collect()
    assert [
        (r.batch_id, r.corpus_id) for r in got2
        if r.corpus_id >= 100
    ] == []


# --- quality-aware keep (round-9 session 2) --------------------------------


class TestKeepBest:
    @staticmethod
    def _fixture(spark):
        """Two dup clusters with known quality ordering + one singleton.

        Quality (quality_score_fast) rises with lexical diversity, so
        the repetitive member of each cluster scores lower.
        """
        from pyspark.sql import Row

        rich = "the quick brown fox jumps over a lazy dog near the river"
        poor = "the the the the the fox fox fox fox dog dog dog dog dog"
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text=rich + " alpha"),
                Row(doc_id=2, text=poor),
                Row(doc_id=3, text=rich + " beta"),
                Row(doc_id=9, text="a singleton document all alone here"),
            ]
        )
        pairs = spark.createDataFrame(
            [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3)]
        )
        return docs, pairs

    def test_keeps_highest_quality_not_min_id(self, spark):
        from hash_db_spark.functions import text as T
        from hash_db_spark.operators import dedup as D

        docs, pairs = self._fixture(spark)
        got = D.keep_best_per_cluster(
            docs, pairs, "doc_id", T.quality_score_fast("text")
        ).collect()
        assert len(got) == 1  # one transitive cluster {1,2,3}
        r = got[0]
        # min-id policy would keep 1; quality ties 1 vs 3 break to min
        # id 1 — but the REPETITIVE doc 2 must never win
        assert r.keep_id != 2
        assert r.n_members == 3

    def test_apply_keep_best_preserves_singletons(self, spark):
        from hash_db_spark.functions import text as T
        from hash_db_spark.operators import dedup as D

        docs, pairs = self._fixture(spark)
        kept = {
            r.doc_id
            for r in D.apply_dedup_keep_best(
                docs, pairs, "doc_id", T.quality_score_fast("text")
            ).collect()
        }
        assert 9 in kept  # unpaired doc survives
        assert len(kept) == 2  # singleton + one cluster representative
        assert 2 not in kept

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.catalog import load_table
        from hash_db_spark.functions import text as T
        from hash_db_spark.operators import dedup as D

        docs = load_table(spark, sf_dir, "documents")
        pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
        got = sorted(
            (int(r.keep_id), int(r.cluster), int(r.n_members), float(r.q))
            for r in D.keep_best_per_cluster(
                docs, pairs, "doc_id", T.quality_score_fast("text")
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            (int(a), int(b), int(c), float(d))
            for a, b, c, d in con.execute(
                D.sql_keep_best_per_cluster(
                    "documents",
                    "doc_id",
                    D.sql_minhash_lsh_pairs(
                        "documents", "text", "doc_id", threshold=0.5
                    ),
                    T.sql_quality_score_fast("text"),
                )
            ).fetchall()
        )
        con.close()
        assert got == want and len(got) > 0


# --- LSH parameter planner ---------------------------------------------------


def test_lsh_s_curve_known_values(spark):
    """Textbook cell checks: b=8,r=2 at s=0.5 -> 1-(1-0.25)^8 = 0.899887...;
    threshold (1/8)^(1/2) = 0.353553. And monotonicity in s per config."""
    from hash_db_spark.operators.dedup import lsh_s_curve

    rows = lsh_s_curve(spark).collect()
    cell = {
        (r.num_hashes, r.rows_per_band, r.s): (r.collide_p, r.threshold_s)
        for r in rows
    }
    p, t = cell[(16, 2, 0.5)]
    assert abs(p - 0.899887) < 1e-6
    assert abs(t - 0.353553) < 1e-6
    # wider bands push the threshold right: r=4 config is more selective
    assert cell[(16, 4, 0.5)][1] > t
    # S-curve is monotone nondecreasing in s for every config
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault((r.num_hashes, r.rows_per_band), []).append(
            (r.s, r.collide_p)
        )
    for pts in by_cfg.values():
        ps = [p for _, p in sorted(pts)]
        assert ps == sorted(ps)


def test_lsh_param_plan_oracle_parity(spark):
    """Exhaustive cell-by-cell compare vs DuckDB (data-independent, so
    this one test IS the full driver compare for the queued entry)."""
    import duckdb

    from hash_db_spark.operators.dedup import lsh_s_curve, sql_lsh_s_curve

    got = sorted(tuple(r) for r in lsh_s_curve(spark).collect())
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(sql_lsh_s_curve()).fetchall()
    )
    assert len(got) == 190
    assert got == want


class TestLeakageSafeSplit:
    def test_parity_and_no_cluster_straddles(self, spark, sf_dir):
        """Cluster-keyed splitting: exact parity vs DuckDB, and the
        leakage law — no dup cluster (hence no near-dup pair) spans the
        train/val boundary."""
        import duckdb

        from hash_db_spark.queries.dedup_queries import (
            _train_split_oracle,
            q_train_split_leakage_safe,
        )

        got = (
            q_train_split_leakage_safe(spark, sf_dir)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = (
            con.execute(_train_split_oracle())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con.close()
        assert len(got) == len(want) > 0
        assert (got.cluster.values == want.cluster.values).all()
        assert (got.split.values == want.split.values).all()
        assert (got.groupby("cluster").split.nunique() == 1).all()
        # both splits are populated and at least one multi-doc cluster
        # exercised the law
        assert set(got.split) == {"train", "val"}
        assert (got.groupby("cluster").size() > 1).any()

    def test_pairs_never_straddle(self, spark, sf_dir):
        from hash_db_spark.catalog import load_table
        from hash_db_spark.operators import dedup as D
        from hash_db_spark.queries.dedup_queries import (
            JACCARD_T,
            q_train_split_leakage_safe,
        )

        split = q_train_split_leakage_safe(spark, sf_dir).select(
            "doc_id", "split"
        )
        pairs = D.minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents"),
            "text",
            "doc_id",
            threshold=JACCARD_T,
        )
        a = split.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
            "split", "split_a"
        )
        b = split.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
            "split", "split_b"
        )
        straddle = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .filter("split_a != split_b")
            .count()
        )
        assert straddle == 0


class TestContainmentPairs:
    """Asymmetric containment |A∩B|/min(|A|,|B|)
    (operators/dedup.py:ngram_containment_pairs)."""

    def test_quote_inclusion_high_containment_low_jaccard(self, spark):
        """Doc 2 contains doc 1 verbatim inside much more text:
        containment = 1.0 (every small-doc shingle is shared) while
        Jaccard stays low — the pair symmetric dedup misses."""
        small = "alpha beta gamma delta epsilon"
        big = (
            "one two three four five six seven eight nine ten "
            + small
            + " eleven twelve thirteen fourteen fifteen sixteen"
        )
        docs = spark.createDataFrame(
            [(1, small), (2, big)], ["doc_id", "text"]
        )
        from hash_db_spark.operators.dedup import ngram_containment_pairs

        rows = ngram_containment_pairs(docs, "text", "doc_id", n=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.id_a, r.id_b, r.contained_id) == (1, 2, 1)
        assert r.containment == 1.0
        assert r.jac < 0.5

    def test_threshold_excludes_partial_overlap(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c x y z w q")],
            ["doc_id", "text"],
        )
        from hash_db_spark.operators.dedup import ngram_containment_pairs

        # shared shingles: only 'a b c' -> containment 1/4 < 0.8
        assert (
            ngram_containment_pairs(docs, "text", "doc_id", n=3).count() == 0
        )

    def test_hot_cap_correction_keeps_true_containment(self, spark):
        """Universal boilerplate shingles are hot (dropped from
        candidate generation) but corrected back exactly: scores match
        an uncapped run. The quoted span itself stays under the cap,
        so the candidate channel is the quote's own shingles — the
        tail case this operator owns."""
        from hash_db_spark.operators.dedup import ngram_containment_pairs

        boiler = "terms of service apply here always"  # in ALL 8 docs
        quoted = "red green blue cyan magenta"  # in 3 hosts + doc 99
        rows = [
            (i, f"{boiler} {quoted} filler{i} pad{i} more{i}")
            for i in range(3)
        ]
        rows += [
            (i, f"{boiler} unique{i} words{i} only{i} here{i} now{i}")
            for i in range(3, 7)
        ]
        rows += [(99, f"{boiler} {quoted}")]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        # boiler shingles: df == 8 > 5 (hot); quoted shingles: df == 4
        capped = {
            (r.id_a, r.id_b): (r.containment, r.jac)
            for r in ngram_containment_pairs(
                docs, "text", "doc_id", n=3, max_doc_freq=5
            ).collect()
        }
        uncapped = {
            (r.id_a, r.id_b): (r.containment, r.jac)
            for r in ngram_containment_pairs(
                docs, "text", "doc_id", n=3, max_doc_freq=10**6
            ).collect()
        }
        assert capped == uncapped and len(capped) > 0
        # doc 99 (boiler+quote only) is contained in all three hosts
        assert all((i, 99) in capped for i in range(3))
        for i in range(3):
            assert capped[(i, 99)][0] == 1.0

    def test_all_hot_popular_quote_is_span_strip_territory(self, spark):
        """A doc quoted wholesale by MORE than max_doc_freq pages has
        only hot shingles: no pair emitted here (by design — that head
        is repeated_ngram_spans/strip_spans'), while the span detector
        sees the quote."""
        from hash_db_spark.operators.dedup import (
            ngram_containment_pairs,
            repeated_ngram_spans,
        )

        quoted = "red green blue cyan magenta"
        docs = spark.createDataFrame(
            [(i, f"{quoted} filler{i} pad{i} more{i}") for i in range(5)]
            + [(99, quoted)],
            ["doc_id", "text"],
        )
        assert (
            ngram_containment_pairs(
                docs, "text", "doc_id", n=3, max_doc_freq=2
            ).count()
            == 0
        )
        spans = repeated_ngram_spans(docs, "text", "doc_id", n=3).collect()
        assert any(s.n_docs == 6 for s in spans)

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.dedup_queries import (
            _dedup_containment_oracle,
            q_dedup_containment,
        )

        got = sorted(
            tuple(r) for r in q_dedup_containment(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_dedup_containment_oracle()).fetchall()
        )
        con.close()
        assert got == want and len(got) > 0
        for _, _, cont, jac, _ in got:
            assert cont >= 0.8 and jac <= cont  # jac never exceeds cont

    def test_no_cartesian_in_plan(self, spark, sf_dir):
        from hash_db_spark.queries.dedup_queries import q_dedup_containment

        plan = q_dedup_containment(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestDedupMethodEval:
    """Pair-retrieval P/R/F1 vs exact Jaccard truth
    (operators/dedup.py:dedup_method_eval)."""

    def test_identical_docs_perfect_scores(self, spark):
        from hash_db_spark.operators.dedup import dedup_method_eval

        text = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(1, text), (2, text), (3, "totally different words here now"),
             (4, "yet another unrelated document text body")],
            ["doc_id", "text"],
        )
        got = {r.method: r for r in dedup_method_eval(
            docs, "text", "doc_id").collect()}
        assert set(got) == {"minhash_lsh", "simhash_h3"}
        for r in got.values():
            assert (r.n_true, r.n_hit) == (1, 1)
            assert r.recall_micro == 1_000_000
            assert r.precision_micro == 1_000_000
        assert got["minhash_lsh"].f1_micro == 1_000_000

    def test_counts_are_consistent(self, spark, sf_dir):
        from hash_db_spark.catalog import load_table
        from hash_db_spark.operators.dedup import dedup_method_eval

        rows = dedup_method_eval(
            load_table(spark, sf_dir, "documents"), "text", "doc_id"
        ).collect()
        assert [r.method for r in rows] == ["minhash_lsh", "simhash_h3"]
        for r in rows:
            assert r.n_hit <= min(r.n_pred, r.n_true)
            if r.n_pred and r.n_true:
                assert 0 < r.f1_micro <= 1_000_000

    def test_no_shingle_corpus_zero_rows_survive(self, spark):
        """Docs too short to shingle: no truth, no predictions — both
        method rows still present with zero counts and NULL ratios."""
        from hash_db_spark.operators.dedup import dedup_method_eval

        docs = spark.createDataFrame(
            [(1, "one two"), (2, "three four")], ["doc_id", "text"]
        )
        rows = dedup_method_eval(docs, "text", "doc_id").collect()
        assert len(rows) == 2
        for r in rows:
            assert (r.n_pred, r.n_true, r.n_hit) == (0, 0, 0)
            assert r.precision_micro is None and r.recall_micro is None

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.dedup_queries import (
            _dedup_method_eval_oracle,
            q_dedup_method_eval,
        )

        got = [tuple(r) for r in q_dedup_method_eval(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(_dedup_method_eval_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) == 2


class TestEditVerify:
    """Order-sensitive Levenshtein verification of candidate pairs
    (operators/dedup.py:edit_verify_pairs)."""

    def test_shuffled_twin_fails_edit_check(self, spark):
        """Sentence-shuffled twins share all shingles locally but have
        low edit similarity — the case the second opinion exists for."""
        a = "alpha beta gamma delta epsilon zeta eta theta"
        b = "theta eta zeta epsilon delta gamma beta alpha"
        docs = spark.createDataFrame([(1, a), (2, b), (3, a + " iota")], ["doc_id", "text"])
        pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
        got = {
            (r.id_a, r.id_b): r.edit_sim
            for r in D.edit_verify_pairs(
                docs, pairs, "text", "doc_id", threshold=0.5
            ).collect()
        }
        assert (1, 3) in got and got[(1, 3)] > 0.88
        assert (1, 2) not in got  # reversal destroys edit lineage

    def test_empty_edge_cases(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, ""), (3, "some text")], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
        got = {
            (r.id_a, r.id_b): r.edit_sim
            for r in D.edit_verify_pairs(
                docs, pairs, "text", "doc_id", threshold=0.0
            ).collect()
        }
        assert got[(1, 2)] == 1.0  # empty vs empty
        assert got[(1, 3)] == 0.0  # empty vs nonempty

    def test_prefix_cap_bounds_the_dp(self, spark):
        """Divergence past the prefix boundary is invisible — the cap is
        the cost bound, applied identically on both engines."""
        base = "x" * 400
        docs = spark.createDataFrame(
            [(1, base + "AAAA"), (2, base + "BBBB")], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        got = D.edit_verify_pairs(
            docs, pairs, "text", "doc_id", threshold=0.9, prefix=400
        ).collect()
        assert len(got) == 1 and got[0].edit_sim == 1.0

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.dedup_queries import (
            _dedup_edit_verify_oracle,
            q_dedup_edit_verify,
        )

        got = sorted(tuple(r) for r in q_dedup_edit_verify(spark, sf_dir).collect())
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_dedup_edit_verify_oracle()).fetchall()
        )
        con.close()
        assert got == want
