"""Model-based curation: classifier features/scoring, weighted
Bernoulli sampling (exactness + expected size), embedding stats."""

from __future__ import annotations

import hashlib

import numpy as np
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

# SPARK_GRAFT_HYP_EXAMPLES overrides the per-test example budget for an
# extended fuzz pass (0/unset keeps the defaults) — same knob as
# tests/test_properties.py.
import os

_HYP_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "0"))

from hash_db_spark.operators import curation as C


def test_gram_features_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([("a bb ccc",), ("solo",)], "text string")
    out = [r.g for r in df.select(C.gram_features("text").alias("g")).collect()]
    assert out[0] == ["a", "bb", "ccc", "a bb", "bb ccc"]
    assert out[1] == ["solo"]  # no trailing (word, NULL) pseudo-bigram


def test_classifier_score_model(spark):
    """z_milli equals the Python recomputation over the SAME baked
    weight parquet (data/quality_weights.parquet) and the same md5
    buckets — the scoring path is integer-exact end to end."""
    import pyarrow.parquet as pq

    rows = [(1, "x yy x"), (2, "zz"), (3, "the cat sat on the mat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_feats, r.z_milli, r.keep)
        for r in C.classifier_scores(df, C.weight_dim(spark)).collect()
    }

    wt = pq.read_table(C.weights_path())
    w_milli = dict(
        zip(wt["bucket"].to_pylist(), wt["w_milli"].to_pylist())
    )
    # full dim (inner join keeps n_feats semantics: unseen buckets
    # carry 0, not absence) + the intercept row at reserved bucket -1
    assert len(w_milli) == C.N_FEATURE_BUCKETS + 1
    assert -1 in w_milli

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % C.N_FEATURE_BUCKETS

    for doc_id, text in rows:
        words = text.split()
        grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
        z = w_milli[-1] + sum(w_milli[bucket(g)] for g in grams)
        assert got[doc_id] == (len(grams), z, z > 0), doc_id


def test_classifier_weights_are_trained_not_noise(spark, sf_dir):
    """The baked weights must actually predict the Gopher heuristic they
    distill (scripts/train_quality_weights.py): agreement on the
    sf0.001 corpus well above the base rate proves a trained model
    shipped, not a placeholder."""
    import re

    from hash_db_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    scored = {
        r.doc_id: r.keep
        for r in C.classifier_scores(docs, C.weight_dim(spark)).collect()
    }

    def gopher(text: str) -> bool:
        words = [w for w in re.split(r"\s+", text.strip()) if w]
        n = len(words)
        if n == 0:
            return False
        mean_wlen = round(len(re.sub(r"\s", "", text)) / n, 4)
        alpha = len(re.findall(r"\b[a-zA-Z]+\b", text))
        stop = len(re.findall(r"\b(?:the|a|of|and|to)\b", text))
        return (
            50 <= n <= 100_000
            and 3.0 <= mean_wlen <= 10.0
            and round(alpha / n, 4) >= 0.8
            and stop >= 2
        )

    labels = {
        r.doc_id: gopher(r.text)
        for r in docs.select("doc_id", "text").collect()
    }
    agree = sum(scored[d] == labels[d] for d in labels) / len(labels)
    pos = sum(labels.values()) / len(labels)
    base = max(pos, 1 - pos)
    assert agree >= 0.75, (agree, base)
    assert agree > base, (agree, base)  # beats always-majority


@settings(max_examples=_HYP_EXAMPLES or 10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 5000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 20),
)
def test_weighted_sample_matches_closed_form(spark, rows, target):
    """The kept set is EXACTLY the closed-form predicate: integer u and
    integer floor-div threshold — no float path anywhere."""
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = {
        r.doc_id for r in C.weighted_sample(df, "doc_id", "w", target).collect()
    }
    W = sum(w for _, w in rows)
    expect = set()
    for k, w in rows:
        u = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % C.SAMPLE_M
        if u < (target * w * C.SAMPLE_M) // W:
            expect.add(k)
    assert kept == expect


def test_weighted_sample_expected_size_and_bias(spark, sf_dir):
    from hash_db_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = docs.count()
    kept = C.weighted_sample(docs, "doc_id", "n_chars", 100).collect()
    # expected size 100; md5 uniformity gives a few-sigma band
    assert 60 <= len(kept) <= 140
    # inclusion is weight-biased: kept docs are longer on average
    avg_all = docs.agg(F.avg("n_chars")).first()[0]
    avg_kept = sum(r.n_chars for r in kept) / len(kept)
    assert avg_kept > avg_all


def test_weighted_sample_append_stable(spark):
    """A row's fate never changes when other rows arrive, as long as the
    total weight is held (content-addressed u, per-row threshold)."""
    base = [(i, 100) for i in range(50)]
    df1 = spark.createDataFrame(base, "doc_id long, w long")
    # same total weight, rows re-distributed
    df2 = spark.createDataFrame(
        [(i, 100) for i in range(25)] + [(100 + i, 100) for i in range(25)],
        "doc_id long, w long",
    )
    k1 = {r.doc_id for r in C.weighted_sample(df1, "doc_id", "w", 10).collect()}
    k2 = {r.doc_id for r in C.weighted_sample(df2, "doc_id", "w", 10).collect()}
    common = set(range(25))
    assert k1 & common == k2 & common


def test_embedding_dim_stats_match_numpy(spark, sf_dir):
    from hash_db_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mat = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    got = {r.dim: (r.mu, r.sigma) for r in C.embedding_dim_stats(emb).collect()}
    assert len(got) == mat.shape[1]
    for d in range(mat.shape[1]):
        assert abs(got[d][0] - round(float(mat[:, d].mean()), 4)) <= 1e-4
        assert abs(got[d][1] - round(float(mat[:, d].std()), 4)) <= 1e-4


def test_classifier_plan_one_shuffle_broadcast_model(spark, sf_dir):
    """Features explode map-side, the model joins broadcast, ONE
    exchange (the per-doc sum)."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.plans.inspect import formatted_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(C.classifier_scores(docs, C.weight_dim(spark)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one shuffle: the doc_id aggregation (AQE may add none beyond it)
    n_ex = plan.count("(+) Exchange") or plan.count(") Exchange")
    assert n_ex <= 2


def test_lang_segments_partition_docs(spark, sf_dir):
    """Per doc: segments are consecutive (1..k), non-overlapping, cover
    every chunk index exactly once, and adjacent segments differ in
    language (maximal runs)."""
    from collections import defaultdict

    from hash_db_spark.queries.curation_queries import q_doc_lang_segments

    rows = q_doc_lang_segments(spark, sf_dir).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert by_doc
    for doc, segs in by_doc.items():
        segs.sort(key=lambda r: r.seg)
        assert [r.seg for r in segs] == list(range(1, len(segs) + 1)), doc
        prev_end, prev_lang = -1, None
        for r in segs:
            assert r.start_idx == prev_end + 1, doc
            assert r.end_idx - r.start_idx + 1 == r.n_chunks, doc
            assert r.lang != prev_lang, doc  # maximal runs
            prev_end, prev_lang = r.end_idx, r.lang


def test_decontaminate_mask_removes_all_bench_grams(spark, sf_dir):
    """The defining property: after masking, a document shares ZERO
    trigrams with the benchmark set (in-place replacement cannot create
    new adjacencies), n_masked equals the <mask> token count, and
    unmasked docs are absent."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.queries.curation_queries import q_decontaminate_mask

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }

    def grams(text):
        toks = [t for t in text.replace(",", "").split(" ") if t]
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }, toks

    bench = set()
    for d, t in docs.items():
        if d < 10:
            bench |= grams(t)[0]

    rows = q_decontaminate_mask(spark, sf_dir).collect()
    assert rows
    for r in rows:
        g, toks = grams(r.text_masked)
        assert not (g & bench), r.doc_id
        assert toks.count("<mask>") == r.n_masked, r.doc_id
        # same length, only mask positions changed
        orig = grams(docs[r.doc_id])[1]
        assert len(orig) == len(toks), r.doc_id
        assert all(a == b or b == "<mask>" for a, b in zip(orig, toks)), (
            r.doc_id
        )


def test_trigram_interp_matches_python_model(spark):
    """Spark interp logprob == a direct Python recomputation of the
    Jelinek-Mercer formula on a tiny handcrafted corpus."""
    import math
    from collections import Counter

    train = [(0, "a b c a b d"), (2, "a b c c")]
    score = [(1, "a b c a b"), (3, "x y z q")]
    df = spark.createDataFrame(train + score, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.interp_logprob)
        for r in C.trigram_interp_logprob(
            df.filter("doc_id % 2 = 0"),
            df.filter("doc_id % 2 = 1"),
            "text",
            "doc_id",
        ).collect()
    }

    tri, c2p, cb, c1, cu = Counter(), Counter(), Counter(), Counter(), Counter()
    n_tok = 0
    for _, t in train:
        ws = t.split()
        n_tok += len(ws)
        cu.update(ws)
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
            c1[a] += 1
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tri[(a, b, c)] += 1
            c2p[(a, b)] += 1
    v = len(cu)

    for doc_id, t in score:
        ws = t.split()
        logs = []
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            p = (
                C.LM_L3 * (tri[(a, b, c)] / c2p[(a, b)] if c2p[(a, b)] else 0)
                + C.LM_L2 * (cb[(b, c)] / c1[b] if c1[b] else 0)
                + C.LM_L1 * ((cu[c] + 1) / (n_tok + v))
            )
            logs.append(math.log10(p))
        expect = round(sum(logs) / len(logs), 6)
        assert got[doc_id][0] == len(ws) - 2, doc_id
        assert abs(got[doc_id][1] - expect) <= 1e-6, doc_id
    # in-domain text scores higher than out-of-vocabulary text
    assert got[1][1] > got[3][1]


def test_session4_entries_plan_shapes(spark, sf_dir):
    """Every curation/html entry is pure codegen (zero Python-exec
    nodes), and the weighted sampler has NO sort anywhere — its whole
    point vs A-ES top-k is one scan + a 1-row scalar broadcast."""
    import re

    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries import all_queries

    reg = all_queries()
    for entry in (
        "html_text_extract",
        "quality_classifier",
        "weighted_doc_sample",
        "embedding_dim_stats",
        "doc_lang_segments",
        "decontaminate_mask",
        "lm_trigram_interp",
        "crawl_frontier_schedule",
    ):
        plan = formatted_plan(reg[entry].fn(spark, sf_dir))
        assert not re.findall(
            r"\(\d+\) (?:MapInPandas|ArrowEvalPython|BatchEvalPython)", plan
        ), entry
    sampler = formatted_plan(reg["weighted_doc_sample"].fn(spark, sf_dir))
    assert not re.findall(r"\(\d+\) Sort\b", sampler)


def test_quality_score_fast_equals_hof_variant(spark, sf_dir):
    """quality_score_fast == quality_score on every fixture doc (the
    comma-free word/space equivalence), so the codegen swap in
    corpus_health_report changes nothing semantically."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.functions.text import quality_score, quality_score_fast

    docs = load_table(spark, sf_dir, "documents")
    diff = docs.select(
        quality_score("text").alias("a"),
        quality_score_fast("text").alias("b"),
    ).filter("a <> b")
    assert diff.count() == 0


def test_jl_projection_matches_numpy(spark, sf_dir):
    """Spark JL projection == numpy recomputation with the same
    closed-form Rademacher matrix (within the shared 4dp rounding)."""
    from hash_db_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    d = mat.shape[1]
    proj = np.array(
        [
            [((dim * 31 + odim * 17) % 2) * 2 - 1 for odim in range(C.JL_OUT_DIMS)]
            for dim in range(d)
        ],
        dtype=np.float64,
    )
    expect = mat @ proj / np.sqrt(C.JL_OUT_DIMS)
    got = {
        (r.vec_id, r.odim): r.val
        for r in C.embedding_project_jl(emb).collect()
    }
    assert len(got) == len(ids) * C.JL_OUT_DIMS
    for i, vid in enumerate(ids):
        for o in range(C.JL_OUT_DIMS):
            assert abs(got[(vid, o)] - round(float(expect[i, o]), 4)) <= 1e-3, (
                vid,
                o,
            )


@settings(max_examples=_HYP_EXAMPLES or 15, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=6).map(" ".join),
    st.lists(st.sampled_from("pqrstuvw"), min_size=4, max_size=12),
    st.lists(st.sampled_from("klmnoxyz"), min_size=4, max_size=12),
)
def test_winnow_shared_substring_guarantee(spark, shared, pre, suf):
    """The winnowing guarantee: two docs sharing a substring of
    >= k + w - 1 tokens (k=3, w=4 -> 6) share at least one
    fingerprint, wherever the substring sits."""
    d1 = " ".join(pre) + " " + shared
    d2 = shared + " " + " ".join(suf)
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    fps = C.winnow_fps(df, "text", "doc_id", k=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.id, set()).add(r.fph)
    assert by_doc.get(1) and by_doc.get(2)
    assert by_doc[1] & by_doc[2], (d1, d2)


def test_boundary_overlap_hot_key_cap_drops_boilerplate(spark):
    """The house hot-key cap on the boundary-hash equijoin (VERDICT r08
    #4): a shared 4-token page footer/header across >BOUNDARY_MAX_DF
    chunk ends would make its join key quadratic — those hashes are
    anti-joined out of both sides, while genuine split-document and
    adjacent-chunk boundaries survive."""
    from hash_db_spark.queries.curation_queries import (
        BOUNDARY_MAX_DF,
        boundary_overlap_pairs,
    )

    boiler = "lorem ipsum dolor sit"
    mid = lambda i: " ".join(f"mid{i}x{j}" for j in range(8))  # noqa: E731
    rows = [
        # 25 docs (> BOUNDARY_MAX_DF=20) that START and END with the
        # same 4 boilerplate tokens: every head_h == tail_h == H, so H
        # carries 50 chunk ends — quadratic without the cap.
        (i, f"{boiler} {mid(i)} {boiler}")
        for i in range(25)
    ]
    # A genuine split pair: doc 100's last 4 tokens open doc 101.
    t = [f"qa{j}" for j in range(16)]
    rows.append((100, " ".join(t)))
    rows.append((101, " ".join(t[12:] + [f"qb{j}" for j in range(12)])))
    # One long doc whose overlap-chunks are adjacency ground truth.
    rows.append((200, " ".join(f"qc{j}" for j in range(28))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.id_a, r.idx_a, r.id_b, r.idx_b, r.is_adjacent)
        for r in boundary_overlap_pairs(docs).collect()
    }
    assert BOUNDARY_MAX_DF < 25
    # boilerplate hash capped out: no pair touches docs 0..24
    assert not any(p[0] < 100 or p[2] < 100 for p in got), got
    # the genuine split survives
    assert (100, 0, 101, 0, False) in got
    # doc 200's adjacent chunks survive
    assert any(p[0] == 200 and p[2] == 200 and p[4] for p in got)


# --- data-constrained epoch planning ------------------------------------------


def test_epoch_repeat_plan_laws_and_parity(spark, sf_dir):
    """Oracle parity plus the plan laws: repeat <= cap; a source at the
    cap carries the deficit, a source under the cap fills its desired
    budget exactly; achieved totals never exceed desired."""
    import duckdb

    from hash_db_spark.queries.curation_queries import (
        EPOCH_MAX_REPEATS,
        _epoch_repeat_plan_oracle,
        q_epoch_repeat_plan,
    )

    got = sorted(tuple(r) for r in q_epoch_repeat_plan(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_epoch_repeat_plan_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) >= 3
    capped = uncapped = 0
    for _, n, desired, rep, achieved, deficit in got:
        assert 0 < rep <= EPOCH_MAX_REPEATS
        assert achieved <= desired + 0.01
        if rep == EPOCH_MAX_REPEATS:
            capped += 1
            assert deficit > 0
        else:
            uncapped += 1
            assert abs(deficit) < 0.01
    # the fixture's skewed language mix exercises BOTH branches
    assert capped >= 1 and uncapped >= 1


def test_kneser_ney_parity_and_smoothing_laws(spark, sf_dir):
    """Interpolated KN bigram scoring: exact-double parity vs DuckDB,
    plus finiteness (log10 of p in (0, 1] — smoothing never zeroes a
    seen bigram)."""
    import duckdb

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import corpus_stats as CS

    docs = load_table(spark, sf_dir, "documents")
    got = (
        CS.doc_kneser_ney_logprob(docs, "text", "doc_id")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(
            CS.sql_doc_kneser_ney_logprob("documents", "text", "doc_id")
        )
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(want) > 0
    assert (got["n_bigrams"].values == want["n_bigrams"].values).all()
    assert (got["kn_logprob"].values == want["kn_logprob"].values).all()
    # log10 of p in (0,1]: scores are finite and non-positive
    assert got["kn_logprob"].notna().all()
    assert (got["kn_logprob"] <= 0).all()


def test_kneser_ney_normalizes_per_context():
    """The defining smoothing law: for every context v, p(.|v) sums to
    1 over the continuation vocabulary — the discount taken from seen
    bigrams is exactly the mass the continuation term redistributes.
    Checked in pure Python against the same formula the operators
    implement."""
    from collections import Counter

    from hash_db_spark.operators.corpus_stats import KN_DISCOUNT as D

    corpus = "a b a b a c b c c a d a b".split()
    bigs = list(zip(corpus, corpus[1:]))
    bf = Counter(bigs)
    pf = Counter(v for v, _ in bigs)
    n1p = Counter(v for v, _ in set(bigs))
    cont = Counter(w for _, w in set(bigs))
    ttypes = len(set(bigs))
    vocab_cont = set(w for _, w in bigs)
    for v in pf:
        total = sum(
            max(bf.get((v, w), 0) - D, 0.0) / pf[v]
            + (D * n1p[v] / pf[v]) * (cont[w] / ttypes)
            for w in vocab_cont
        )
        assert abs(total - 1.0) < 1e-12, (v, total)


class TestCalibrationReport:
    def test_bucket_bounds_and_total_tiling(self, spark, sf_dir):
        """Each bucket's p-mass sits inside the bucket's probability
        band; bucket counts tile the corpus; the TOTAL row is the exact
        integer sum of the per-bucket rows."""
        from hash_db_spark.queries.curation_queries import (
            q_quality_calibration,
        )

        rows = q_quality_calibration(spark, sf_dir).collect()
        per = [r for r in rows if r.bucket >= 0]
        tot = [r for r in rows if r.bucket == -1][0]
        assert sum(r.n for r in per) == tot.n
        assert sum(r.gap_mass_micro for r in per) == tot.gap_mass_micro
        for r in per:
            assert r.bucket * 100_000 * r.n <= r.p_sum_micro
            assert r.p_sum_micro <= (r.bucket + 1) * 100_000 * r.n
            assert 0 <= r.n_pos <= r.n

    def test_distilled_model_is_monotone_calibrated(self, spark, sf_dir):
        """The observed positive rate must rise from the bottom bucket
        to the top one — the weakest useful calibration claim, immune
        to per-bucket noise."""
        from hash_db_spark.queries.curation_queries import (
            q_quality_calibration,
        )

        per = sorted(
            (
                (r.bucket, r.n_pos / r.n)
                for r in q_quality_calibration(spark, sf_dir).collect()
                if r.bucket >= 0 and r.n > 0
            )
        )
        assert per[0][1] < per[-1][1]

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.curation_queries import (
            _quality_calibration_oracle,
            q_quality_calibration,
        )

        got = sorted(
            tuple(r) for r in q_quality_calibration(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_quality_calibration_oracle()).fetchall()
        )
        con.close()
        assert got == want


class TestSoftDedup:
    def test_group_mass_is_flat(self, spark):
        """A text duplicated k times gets weight W/k per copy — every
        duplicate GROUP carries the same total sampling mass as a
        unique doc (the whole soft-dedup point)."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from hash_db_spark.queries.curation_queries import SOFT_DEDUP_W

        rows = [(i, "copied text") for i in range(4)] + [(10, "unique one")]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        w = Window.partitionBy(F.md5("text"))
        got = {
            r.doc_id: r.w
            for r in docs.select(
                "doc_id",
                (F.lit(SOFT_DEDUP_W) / F.count(F.lit(1)).over(w))
                .cast("long")
                .alias("w"),
            ).collect()
        }
        assert all(got[i] == SOFT_DEDUP_W // 4 for i in range(4))
        assert got[10] == SOFT_DEDUP_W
        assert 4 * got[0] == got[10]

    def test_oracle_parity_and_size(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.curation_queries import (
            SOFT_DEDUP_TARGET,
            _soft_dedup_oracle,
            q_soft_dedup_sample,
        )

        got = sorted(
            tuple(r) for r in q_soft_dedup_sample(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.execute(_soft_dedup_oracle()).fetchall()
        )
        con.close()
        assert got == want
        # Bernoulli: expected size == target; allow wide slack
        assert 0.5 * SOFT_DEDUP_TARGET < len(got) < 1.6 * SOFT_DEDUP_TARGET


class TestDpNoisyCounts:
    def test_seed_is_mandatory_and_keyword_only(self):
        """ADVICE r10: no public default seed — the DP guarantee needs
        secret per-release seed material, so the caller must supply it
        explicitly (keyword-only, no default) on both engine twins."""
        import inspect

        from hash_db_spark.operators.curation import (
            dp_noisy_counts,
            sql_dp_noisy_counts,
        )

        for fn in (dp_noisy_counts, sql_dp_noisy_counts):
            p = inspect.signature(fn).parameters["seed"]
            assert p.default is inspect.Parameter.empty, fn
            assert p.kind is inspect.Parameter.KEYWORD_ONLY, fn

    """Laplace count release with content-addressed noise
    (operators/curation.py:dp_noisy_counts)."""

    def test_noise_is_bounded_and_replayable(self, spark):
        """At eps=1, |noise| <= ln(SAMPLE_M) ~ 13.9 (the uniform's
        resolution bounds the tail); the same seed replays the exact
        same release; a rotated seed changes it."""
        from hash_db_spark.operators.curation import dp_noisy_counts

        rows = [(f"g{i % 5}",) for i in range(1000)]
        df = spark.createDataFrame(rows, ["g"])
        a = {
            r.g: r.noisy_count
            for r in dp_noisy_counts(df, "g", seed="dp-r1").collect()
        }
        b = {
            r.g: r.noisy_count
            for r in dp_noisy_counts(df, "g", seed="dp-r1").collect()
        }
        assert a == b  # replay law
        for g, v in a.items():
            assert abs(v - 200) <= 14.0, (g, v)
        c = {
            r.g: r.noisy_count
            for r in dp_noisy_counts(df, "g", seed="dp-r2").collect()
        }
        assert c != a  # fresh budget -> fresh noise

    def test_noise_distribution_is_laplace_ish(self, spark):
        """Across many groups the realized noise should be centered
        (median near 0) with both signs present — a sanity check on
        the inverse-CDF, not a statistical test."""
        from hash_db_spark.operators.curation import dp_noisy_counts

        rows = [(f"grp{i}",) for i in range(400)]
        df = spark.createDataFrame(rows, ["g"])
        noises = sorted(
            r.noisy_count - 1
            for r in dp_noisy_counts(df, "g", seed="dp-r1").collect()
        )
        assert noises[0] < 0 < noises[-1]
        med = noises[len(noises) // 2]
        assert abs(med) < 0.5

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.curation_queries import (
            _dp_noisy_counts_oracle,
            q_dp_noisy_counts,
        )

        got = sorted(tuple(r) for r in q_dp_noisy_counts(spark, sf_dir).collect())
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_dp_noisy_counts_oracle()).fetchall()
        )
        con.close()
        assert got == want


class TestScoreQuantileBlend:
    """Percent-rank normalization fusion
    (queries/curation_queries.py:q_score_quantile_blend)."""

    def test_blend_bounds_and_monotone(self, spark, sf_dir):
        from hash_db_spark.queries.curation_queries import (
            q_score_quantile_blend,
        )

        rows = q_score_quantile_blend(spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            assert 0.0 <= r.q_prank <= 1.0
            assert 0.0 <= r.lm_prank <= 1.0
            # blend is rounded from the UNROUNDED pranks, so recomputing
            # from the displayed 6dp values can differ in the last digit
            assert abs(r.blend - (r.q_prank + r.lm_prank) / 2) < 1e-5
        # the ranks actually spread (not all collapsed)
        assert len({r.blend for r in rows}) > 10

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.curation_queries import (
            _score_quantile_blend_oracle,
            q_score_quantile_blend,
        )

        got = sorted(
            tuple(r) for r in q_score_quantile_blend(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_score_quantile_blend_oracle()).fetchall()
        )
        con.close()
        assert got == want
