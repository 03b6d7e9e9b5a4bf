"""Unit tests: similarity search on small structured data where nearest
neighbors are unambiguous (fixture embeddings are random noise — recall
there is a property of the data, not the operator)."""

from __future__ import annotations

import math

import pytest

from hash_db_spark.operators import similarity as S


def _vec(angle: float, dim: int = 64) -> list[float]:
    v = [0.0] * dim
    v[0] = math.cos(angle)
    v[1] = math.sin(angle)
    return v


@pytest.fixture(scope="module")
def emb(spark):
    # Two tight clusters around angle 0 and angle pi/2.
    rows = [
        (0, _vec(0.00)),
        (1, _vec(0.02)),
        (2, _vec(0.04)),
        (3, _vec(1.55)),
        (4, _vec(1.57)),
        (5, _vec(1.59)),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def test_brute_force_exact_neighbors(emb):
    got = S.topk_bruteforce(emb, [0], k=2).collect()
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == [1, 2]
    assert all(r.qid == 0 for r in got)
    assert got[0].cos > 0.999


def test_brute_force_excludes_self(emb):
    got = S.topk_bruteforce(emb, [0], k=10).collect()
    assert 0 not in {r.vec_id for r in got}
    assert len(got) == 5


def test_lsh_finds_cluster_neighbors(emb):
    got = S.topk_lsh(emb, [0], k=2).collect()
    ids = {r.vec_id for r in got}
    # Same-cluster vectors share all sign bits with the query; the LSH
    # buckets must surface them.
    assert {1, 2} <= ids or len(ids) == 2 and ids <= {1, 2}


def test_ivf_probe_finds_cluster(emb):
    # stride=3 → centroids {0, 3}: exactly one per cluster.
    got = S.topk_ivf(emb, [1], k=2, stride=3, nprobe=1).collect()
    assert {r.vec_id for r in got} == {0, 2}


def test_hyperplanes_deterministic():
    a = S.hyperplanes(4, 8)
    b = S.hyperplanes(4, 8)
    assert a == b
    assert all(x in (1.0, -1.0) for row in a for x in row)


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    """int8 quantization on 64-dim vectors perturbs cosines by ~1e-2 at
    most; top-5 neighbor sets should overlap the exact sets almost
    completely (>= 4 of 5 per query on the fixture)."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(4))
    exact = S.topk_bruteforce(emb, qids, k=5)
    quant = S.topk_quantized(emb, qids, k=5)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.qid, set()).add(r.vec_id)
    qt = {}
    for r in quant.collect():
        qt.setdefault(r.qid, set()).add(r.vec_id)
    assert set(ex) == set(qt)
    for q in ex:
        assert len(ex[q] & qt[q]) >= 4, (q, ex[q], qt[q])


def test_ivf_centroid_guard_raises_past_cap(emb, monkeypatch):
    """The centroid collect is bounded: past MAX_IVF_CENTROIDS it raises
    instead of pulling corpus/stride rows to the driver (VERDICT r3 #2)."""
    monkeypatch.setattr(S, "MAX_IVF_CENTROIDS", 1)
    with pytest.raises(ValueError, match="centroid set exceeds"):
        S.topk_ivf(emb, [1], k=2, stride=1, nprobe=1)


def test_ivf_supplied_centroids_match_default(emb):
    """A precomputed centroids frame (the offline-k-means path at scale)
    reproduces the default strided-subset run exactly."""
    cents = emb.filter("vec_id % 3 = 0")  # same rows stride=3 selects
    default = {
        (r.qid, r.vec_id, r.rank)
        for r in S.topk_ivf(emb, [1], k=2, stride=3, nprobe=1).collect()
    }
    supplied = {
        (r.qid, r.vec_id, r.rank)
        for r in S.topk_ivf(emb, [1], k=2, nprobe=1, centroids=cents).collect()
    }
    assert default == supplied and len(default) == 2


def test_lsh_near_dup_hot_bucket_cap_keeps_identical(spark):
    """Duplicate-heavy corpus (the normal dedup input): 12 identical
    vectors fill every band bucket past cap=2, yet all 66 pairs return
    via the full-signature rescue — bounded candidates, no lost dups."""
    base = [0.3, -0.7, 0.2] + [0.05] * 61
    rows = [(i, base) for i in range(12)]
    rows.append((100, [-x for x in base]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {
        (r.id_a, r.id_b): r.cos
        for r in S.lsh_near_dup_pairs(
            emb, threshold=0.9, max_band_bucket=2
        ).collect()
    }
    expect = {(a, b) for a in range(12) for b in range(a + 1, 12)}
    assert set(pairs) == expect
    assert all(c == 1.0 for c in pairs.values())


def test_lsh_cap_near_identical_cluster_stays_connected(spark):
    """Near-identical (jittered, non-equal) vectors overflowing the cap
    must stay connected through the hot-bucket neighbor chain (or the
    signature rescue when the jitter doesn't flip any hyperplane sign)."""
    from hash_db_spark.operators import dedup as D

    base = [0.3, -0.7, 0.2] + [0.05] * 61
    rows = [
        (i, [x + (i * 1e-4 if d == i % 64 else 0.0) for d, x in enumerate(base)])
        for i in range(12)
    ]
    rows.append((100, [-x for x in base]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = S.lsh_near_dup_pairs(emb, threshold=0.99, max_band_bucket=2)
    comp = D.connected_components(pairs)
    clusters = {r.id: r.cluster for r in comp.collect()}
    assert set(clusters) == set(range(12))
    assert len(set(clusters.values())) == 1


def test_semdedup_drop_keeps_min_id_per_duplicate_set(spark):
    """Two tight duplicate groups + isolated vectors: semdedup drops
    everything but the smallest id of each group and keeps singletons."""
    import random

    rng = random.Random(7)
    g1 = [0.9, -0.3, 0.5] + [0.01] * 61
    g2 = [-0.8, 0.1, -0.6] + [0.02] * 61
    rows = []
    for i in range(3):  # ids 0,1,2 ~ duplicates of g1
        rows.append((i, [x + 1e-5 * i for x in g1]))
    for i in range(3, 6):  # ids 3,4,5 ~ duplicates of g2
        rows.append((i, [x + 1e-5 * (i - 3) for x in g2]))
    for i in range(6, 10):  # singletons: random far-apart vectors
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.semdedup_drop(emb, k=4, threshold=0.999)
    dropped = {r.vec_id: r.kept_by for r in out.collect()}
    assert dropped == {1: 0, 2: 0, 4: 3, 5: 3}


def test_negative_samples_long_ids_and_small_corpus_guard(spark):
    """neg_id must be long (a >2^31-row corpus would wrap an int join
    key) and a degenerate corpus (n < 2) is rejected: the self-collision
    remap (neg0 + 1) % n would map straight back to the query."""
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.negative_samples(emb.limit(2), emb, k=2)
    assert dict(out.dtypes)["neg_id"] == "bigint"
    got = out.collect()
    assert len(got) == 4
    assert all(r.qid != r.neg_id for r in got)
    one = spark.createDataFrame([rows[0]], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match=">= 2 rows"):
        S.negative_samples(one, one, k=1)


def test_cosine_zero_vector_yields_null_not_crash(spark):
    """Under Spark 4's default ANSI mode an unguarded denominator turns
    one zero-magnitude embedding into a job-aborting DIVIDE_BY_ZERO;
    the NULLIF-style guard makes cosine NULL instead (undefined), which
    fails every threshold filter and sorts last."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 1.0]),
            (3, [1.0, 1.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = S.topk_bruteforce(emb, [0], k=3).collect()
    assert [r.vec_id for r in got] == [3, 2, 1]
    assert got[-1].cos is None  # the zero vector ranks last with NULL


def test_lsh_rejects_mismatched_embedding_dim(spark):
    """Signatures against truncated hyperplanes would silently diverge
    from the SQL oracles' full-dim plane literals — reject instead."""
    emb = spark.createDataFrame(
        [(0, [1.0] * 32), (1, [0.5] * 32)], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="hyperplane dim"):
        S.lsh_signature_base(emb).collect()


def test_topk_quantized_zero_vector_yields_null(spark):
    """Zero-magnitude vectors have undefined cosine: the Arrow path must
    emit NULL (matching cosine() and the SQL oracle's x/0 -> NULL), not
    a 0.0 that outranks genuine NULLs or passes a >= 0 threshold."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.0, 0.0]),   # degenerate corpus vector
        ],
        ["vec_id", "embedding"],
    )
    rows = S.topk_quantized(emb, [1], k=5).collect()
    by_id = {r.vec_id: r for r in rows}
    assert by_id[3].qcos is None
    # NULL sorts last under desc ordering: the degenerate row ranks
    # below the genuine neighbor.
    assert by_id[2].rank < by_id[3].rank


# --- truncated-dimension recall audit ----------------------------------------


def test_sim_recall_truncated_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued sim_recall_truncated
    entry, plus sanity: wider prefixes never recall less in aggregate,
    and hits never exceed n_exact."""
    import duckdb

    from hash_db_spark.queries.similarity_queries import (
        _sim_recall_truncated_oracle,
        q_sim_recall_truncated,
    )

    got = sorted(
        tuple(r) for r in q_sim_recall_truncated(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_sim_recall_truncated_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) == 8
    for _, n_exact, d16, d32 in got:
        assert 0 <= d16 <= n_exact and 0 <= d32 <= n_exact
    assert sum(r[3] for r in got) >= sum(r[2] for r in got)


def test_hard_negatives_are_the_next_ranks(spark, sf_dir):
    """Hard negatives = exact brute ranks n_pos+1..n_pos+k, disjoint
    from the positives, densely re-ranked; full oracle parity."""
    import duckdb

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import similarity as S
    from hash_db_spark.queries.similarity_queries import QUERY_IDS

    emb = load_table(spark, sf_dir, "embeddings")
    neg = S.hard_negatives(emb, QUERY_IDS, n_pos=2, k=3)
    got = sorted(tuple(r) for r in neg.collect())
    pos = {
        (r.qid, r.vec_id)
        for r in S.topk_bruteforce(emb, QUERY_IDS, k=2).collect()
    }
    assert len(got) == len(QUERY_IDS) * 3
    for qid, neg_id, _, neg_rank in got:
        assert (qid, neg_id) not in pos
        assert 1 <= neg_rank <= 3
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(S.sql_hard_negatives(QUERY_IDS)).fetchall()
    )
    con.close()
    assert got == want


def test_contrastive_pairs_composition(spark, sf_dir):
    """Oracle parity for the r11-candidate train_contrastive_pairs,
    plus the training-table laws: exactly 1 pos + 2 hard + 2 random
    per anchor; the positive scores >= every hard negative; hard
    negatives score >= the mean random negative per anchor."""
    import duckdb

    from hash_db_spark.queries.similarity_queries import (
        QUERY_IDS,
        _contrastive_pairs_oracle,
        q_train_contrastive_pairs,
    )

    got = sorted(
        tuple(r) for r in q_train_contrastive_pairs(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_contrastive_pairs_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) == len(QUERY_IDS) * 5
    by_anchor = {}
    for qid, role, _, cos, _ in got:
        by_anchor.setdefault(qid, {}).setdefault(role, []).append(cos)
    for qid, roles in by_anchor.items():
        assert len(roles["pos"]) == 1
        assert len(roles["hard_neg"]) == 2
        assert len(roles["rand_neg"]) == 2
        assert roles["pos"][0] >= max(roles["hard_neg"])
        assert min(roles["hard_neg"]) >= min(roles["rand_neg"]) - 1e-9 or \
            sum(roles["hard_neg"]) / 2 >= sum(roles["rand_neg"]) / 2
