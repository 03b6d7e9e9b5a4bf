"""One-off scale validation of the bucketed/banded scale paths.

Synthesizes a REPLICAS-fold corpus from the sf0.1 fixtures (documents get a
per-replica token suffix so near-dup structure scales instead of exploding
into cross-replica duplicates; embeddings get a deterministic per-replica
jitter) and times the three operators whose 100 TB designs the audit wants
validated empirically:

    dedup_minhash_lsh   banded MinHash candidate join (+ hot-band cap)
    dedup_embedding_lsh hyperplane-banded near-dup (no corpus broadcast)
    sim_topk_ivf        IVF cells, bounded centroid collect

plus (round 5) the newest composed/iterative operators: semdedup_drop,
train_prep, rank_global_scalable — driven through their registry query
fns against the replicated fixture dir, so the stress exercises exactly
the driver-checked plans.

Near-linear wall-time growth vs the sf0.1 baseline is the pass criterion
(results recorded in COVERAGE.md). Writes only under /tmp.

Usage: python scripts/scale_stress.py [--replicas 10] [--ops a,b,c]
       python scripts/scale_stress.py --replicas 100 --ops dedup_minhash_lsh
           # single-op 100x probe: validates the hot-band cap's asymptote
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/scale_stress"


def build(spark, replicas: int) -> None:
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs = docs.count()
    n_emb = emb.count()
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    big_docs = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            # replica marker token: keeps each replica's internal near-dup
            # structure while making cross-replica texts differ
            F.concat(
                F.col("text"), F.lit(" replica"), F.col("rep").cast("string")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    big_docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    big_emb = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            # deterministic per-(vector, replica) jitter on one component
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + F.when(
                    i == F.col("rep") % 64,
                    (F.col("rep") % 7).cast("double") * 0.001,
                ).otherwise(0.0),
            ).alias("embedding"),
        )
    )
    big_emb.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n_cust = cust.count()
    big_cust = cust.crossJoin(reps).select(
        (F.col("c_custkey") + F.col("rep") * n_cust).alias("c_custkey"),
        # jitter keeps acctbal ties (the rank tie-break path) realistic
        # instead of every replica colliding on identical values
        (F.col("c_acctbal") + (F.col("rep") % 13).cast("double") * 0.01)
        .alias("c_acctbal"),
        # bloom_prejoin's dimension payload column
        "c_mktsegment",
    )
    big_cust.write.mode("overwrite").parquet(f"{OUT}/customer.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_ev = ev.count()
    # user_id shifts per replica: per-user interval structure (the
    # merge/coverage work unit) replicates instead of fusing every
    # replica's events into the same users' timelines.
    big_ev = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * n_ev).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * n_users).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    big_ev.write.mode("overwrite").parquet(f"{OUT}/events.parquet")
    # lineitem/orders for the fact-side probes (skew census, bucketed
    # join): orderkey shifts per replica so per-order multiplicity — the
    # skew structure — replicates instead of multiplying one order's
    # line count by the replica factor.
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    big_li = li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("rep") * n_ok).alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    big_li.write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    big_ord = orders.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("rep") * n_ok).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    big_ord.write.mode("overwrite").parquet(f"{OUT}/orders.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-separated subset of op names (as printed) to run",
    )
    args = ap.parse_args()
    wanted = set(args.ops.split(",")) if args.ops else None

    from hash_db_spark.session import get_spark

    spark = get_spark(app_name="scale-stress")
    build(spark, args.replicas)

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import dedup as D
    from hash_db_spark.operators import similarity as S

    from hash_db_spark.queries import all_queries

    reg = all_queries()

    def timed(name, make):
        if wanted is not None and name.split("/")[0] not in wanted:
            return None
        # warm plan, then one timed full materialization (bench protocol)
        df = make()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt:7.2f}s", flush=True)
        return dt

    for scale, sf_dir in (("1x", SF_DIR), (f"{args.replicas}x", OUT)):
        print(f"--- scale {scale} ---", flush=True)
        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")
        timed(
            f"dedup_minhash_lsh/{scale}",
            lambda: D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5),
        )
        timed(
            f"dedup_ngram_jaccard/{scale}",
            lambda: D.ngram_jaccard_pairs(docs, "text", "doc_id"),
        )
        timed(
            f"dedup_simhash_pairs/{scale}",
            lambda: D.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3),
        )
        timed(
            f"dedup_components/{scale}",
            lambda: D.connected_components(
                S.lsh_near_dup_pairs(emb, threshold=0.9)
            ),
        )
        timed(
            f"dedup_strip_spans/{scale}",
            lambda: D.strip_hot_spans(docs, "text", "doc_id", n=8),
        )
        timed(
            f"dedup_embedding_lsh/{scale}",
            lambda: S.lsh_near_dup_pairs(emb, threshold=0.9),
        )
        timed(
            f"sim_topk_ivf/{scale}",
            lambda: S.topk_ivf(emb, [1, 2, 3, 4, 5], k=5),
        )
        # round-9 session 2: r10-queued operators (not yet registered,
        # so driven directly)
        timed(
            f"dedup_tfidf_cosine/{scale}",
            lambda: __import__(
                "hash_db_spark.operators.ranking", fromlist=["x"]
            ).tfidf_cosine_pairs(docs, "text", "doc_id"),
        )
        timed(
            f"sim_topk_pq/{scale}",
            lambda: __import__(
                "hash_db_spark.operators.pq", fromlist=["x"]
            ).topk_pq(emb, [1, 2, 3, 4, 5], k=5),
        )
        timed(
            f"sim_topk_ivf_pq/{scale}",
            lambda: __import__(
                "hash_db_spark.operators.pq", fromlist=["x"]
            ).topk_ivf_pq(emb, [1, 2, 3, 4, 5], k=5),
        )
        timed(
            f"retrieve_chunks/{scale}",
            lambda: __import__(
                "hash_db_spark.operators.retrieval", fromlist=["x"]
            ).retrieve_chunks(
                docs, "text", "doc_id", ["spark", "query", "join"], k=10
            ),
        )
        timed(
            f"dedup_keep_best/{scale}",
            lambda: D.keep_best_per_cluster(
                docs,
                D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5),
                "doc_id",
                __import__(
                    "hash_db_spark.functions.text", fromlist=["x"]
                ).quality_score_fast("text"),
            ),
        )
        timed(
            f"doc_topic_segments/{scale}",
            lambda: __import__(
                "hash_db_spark.operators.retrieval", fromlist=["x"]
            ).text_tiling_segments(docs, "text", "doc_id"),
        )
        timed(
            f"kmv_shared_users/{scale}",
            lambda: (
                lambda SK: SK.kmv_pair_intersections(
                    SK.kmv_sketch(
                        load_table(spark, sf_dir, "events"),
                        "user_id",
                        "event_type",
                    )
                )
            )(
                __import__(
                    "hash_db_spark.functions.sketches", fromlist=["x"]
                )
            ),
        )
        # round-5 additions: the registry fns themselves, so the stress
        # times the exact driver-checked plans
        for entry in (
            "semdedup_drop",
            "train_prep",
            "rank_global_scalable",
            "dedup_embedding_incremental",
            # round-6: the r05 additions VERDICT #8 asked for...
            "sim_recall_report",
            "interval_coverage",
            "vocab_zipf_fit",
            # ...and this round's new operators
            "dedup_image_phash",
            "dedup_video_frames",
            "bpe_train_merges",
            "url_dedup",
            "host_doc_caps",
            # round-8 additions
            "url_host_domains",
            "dedup_image_in_video",
            "dedup_audio_pairs",
            "dedup_image_incremental",
            "bpe_encode_corpus",
            "dedup_audio_incremental",
            "media_dup_clusters",
            "warc_extract",
            "crawl_prep",
            # round-8 session 3: line-level cleanup family
            "line_dedup_docs",
            "line_boilerplate_strip",
            "line_containment",
            "line_clean_prep",
            "link_host_graph",
            "pagerank_hosts",
            "robots_rules",
            "robots_url_filter",
            "fetch_schedule",
            "rank_weighted_caps",
            "crawl_prep_polite",
            "stream_line_dedup",
            "warc_extract_gz",
            # round-8 session 4: HTML -> text extraction family
            "html_text_extract",
            "html_anchor_texts",
            "sitemap_discover",
            "html_corpus_prep",
            # round-8 session 4: model-based curation
            "quality_classifier",
            "weighted_doc_sample",
            "embedding_dim_stats",
            "classifier_sample_prep",
            "stream_quality_gate",
            "doc_lang_segments",
            "decontaminate_mask",
            "crawl_frontier_schedule",
            "lm_trigram_interp",
            "corpus_health_report",
            "dedup_budget_select",
            "robots_sitemap_refs",
            "embedding_project_jl",
            "embedding_whiten_norms",
            "mixture_temperature",
            "gopher_quality_gate",
            "source_dup_matrix",
            "winnow_fingerprints",
            "winnow_dup_pairs",
            "doc_boundary_overlap",
            "mixture_temp_select",
            "winnow_components",
            "dup_cluster_histogram",
            # round-10: map-side bloom runtime filter (VERDICT r09 #2)
            "bloom_prejoin",
        ):
            timed(
                f"{entry}/{scale}",
                lambda e=entry: reg[e].fn(spark, sf_dir),
            )
        # round-12 (VERDICT r11 #8): the r11-registered heavies, timed
        # BUILD-INCLUSIVE — their builders run eager work (bm25's
        # per-doc frame checkpoint, ewma's window input, KN's count
        # tables), and the round-12 bench convention times exactly that.
        for entry in (
            "lm_kneser_ney",
            "retrieve_hybrid_rrf",
            "ewma_alerts",
        ):
            if wanted is None or entry in wanted:
                t0 = time.perf_counter()
                reg[entry].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                print(f"{entry + '/' + scale:28s} {dt:7.2f}s (build+exec)",
                      flush=True)
        # round-9 session 3: r10-queued operators (driven through their
        # query fns — identical plans to the future registry entries)
        from hash_db_spark.queries.similarity_queries import (
            q_sim_recall_truncated,
        )
        from hash_db_spark.queries.sources_queries import q_compaction_plan
        from hash_db_spark.queries.text_queries import (
            q_retrieve_mmr_topk,
            q_text_encoding_gate,
        )
        from hash_db_spark.queries.web_queries import q_hits_hosts

        from hash_db_spark.queries.relational_queries import (
            q_erasure_audit,
            q_fk_integrity_audit,
        )
        from hash_db_spark.queries.temporal_queries import q_event_transitions
        from hash_db_spark.queries.text_queries import q_fts_serve_mixed

        for name, fn in (
            ("hits_hosts", q_hits_hosts),
            ("compaction_plan", q_compaction_plan),
            ("retrieve_mmr_topk", q_retrieve_mmr_topk),
            ("text_encoding_gate", q_text_encoding_gate),
            ("sim_recall_truncated", q_sim_recall_truncated),
            ("event_transitions", q_event_transitions),
            ("fts_serve_mixed", q_fts_serve_mixed),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-10 r11 candidates (documents/events replicate, so these
        # run at full stress shape)
        from hash_db_spark.queries.dedup_queries import (
            q_train_split_leakage_safe,
        )
        from hash_db_spark.queries.multimodal_queries import (
            q_dedup_image_png,
            q_multimodal_adpcm_decode,
            q_multimodal_jpeg_decode,
            q_multimodal_png_decode,
        )
        from hash_db_spark.queries.pipeline_queries import (
            q_cdc_dedup_report,
            q_lm_kneser_ney,
            q_train_loss_mask,
        )

        for name, fn in (
            ("cdc_dedup_report", q_cdc_dedup_report),
            ("lm_kneser_ney", q_lm_kneser_ney),
            ("train_split_leakage_safe", q_train_split_leakage_safe),
            ("train_loss_mask", q_train_loss_mask),
            ("multimodal_png_decode", q_multimodal_png_decode),
            ("multimodal_jpeg_decode", q_multimodal_jpeg_decode),
            ("multimodal_adpcm_decode", q_multimodal_adpcm_decode),
            ("dedup_image_png", q_dedup_image_png),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # fk/erasure audits touch customer/orders/lineitem — the stress
        # dir replicates customer only, so drive them at 1x shape but
        # still record the rows (their cost is anti-/semi-join scans).
        for name, fn in (
            ("fk_integrity_audit", q_fk_integrity_audit),
            ("erasure_audit", q_erasure_audit),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, SF_DIR))
        # round-9 session 3, late: r11 queue candidates
        from hash_db_spark.queries.text_queries import (
            q_mlm_examples,
            q_text_normalize,
        )
        from hash_db_spark.queries.web_queries import q_host_communities

        for name, fn in (
            ("mlm_examples", q_mlm_examples),
            ("text_normalize", q_text_normalize),
            ("host_communities", q_host_communities),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-10 session 7: r11 queue candidates
        from hash_db_spark.queries.curation_queries import (
            q_dsir_resample,
            q_dsir_weights,
        )

        from hash_db_spark.queries.similarity_queries import (
            q_coreset_kcenter,
        )

        from hash_db_spark.queries.multimodal_queries import (
            q_video_scene_cuts,
        )
        from hash_db_spark.queries.pipeline_queries import q_scrub_luhn
        from hash_db_spark.queries.text_queries import q_retrieve_hybrid_rrf

        for name, fn in (
            ("dsir_weights", q_dsir_weights),
            ("dsir_resample", q_dsir_resample),
            ("coreset_kcenter", q_coreset_kcenter),
            ("scrub_luhn", q_scrub_luhn),
            ("video_scene_cuts", q_video_scene_cuts),
            ("retrieve_hybrid_rrf", q_retrieve_hybrid_rrf),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        from hash_db_spark.queries.curation_queries import (
            q_stream_dsir_gate,
        )
        from hash_db_spark.queries.similarity_queries import (
            q_embedding_int8_quant,
        )
        from hash_db_spark.queries.temporal_queries import q_ewma_alerts

        from hash_db_spark.queries.multimodal_queries import (
            q_multimodal_vad_segments,
        )
        from hash_db_spark.queries.pipeline_queries import (
            q_corpus_drift_psi,
        )

        from hash_db_spark.queries.web_queries import q_ppr_hosts

        for name, fn in (
            ("stream_dsir_gate", q_stream_dsir_gate),
            ("ewma_alerts", q_ewma_alerts),
            ("embedding_int8_quant", q_embedding_int8_quant),
            ("corpus_drift_psi", q_corpus_drift_psi),
            ("multimodal_vad_segments", q_multimodal_vad_segments),
            ("ppr_hosts", q_ppr_hosts),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-10 session 8: r12 queue candidates
        from hash_db_spark.queries.curation_queries import (
            q_sampling_ess_report,
        )
        from hash_db_spark.queries.dedup_queries import q_dedup_containment
        from hash_db_spark.queries.pipeline_queries import (
            q_context_fit_report,
            q_vocab_heaps_fit,
        )
        from hash_db_spark.queries.similarity_queries import (
            q_bitext_margin_mine,
            q_embedding_outliers,
        )

        for name, fn in (
            ("bitext_margin_mine", q_bitext_margin_mine),
            ("context_fit_report", q_context_fit_report),
            ("sampling_ess_report", q_sampling_ess_report),
            ("dedup_containment", q_dedup_containment),
            ("embedding_outliers", q_embedding_outliers),
            ("vocab_heaps_fit", q_vocab_heaps_fit),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-10 session 9: r12 queue candidates
        from hash_db_spark.queries.curation_queries import q_dp_noisy_counts
        from hash_db_spark.queries.dedup_queries import q_dedup_edit_verify
        from hash_db_spark.queries.pipeline_queries import (
            q_ppl_tertile_buckets,
            q_scrub_secrets,
        )
        from hash_db_spark.queries.relational_queries import (
            q_l_diversity_audit,
        )
        from hash_db_spark.queries.similarity_queries import (
            q_cluster_balanced_sample,
        )
        from hash_db_spark.queries.skew_queries import q_skew_key_report
        from hash_db_spark.queries.sources_queries import (
            q_bucketed_join_serve,
        )
        from hash_db_spark.queries.text_queries import (
            q_retrieve_prf_rocchio,
            q_t5_span_examples,
        )
        from hash_db_spark.queries.web_queries import (
            q_host_clustering_coef,
            q_host_kcore,
        )

        for name, fn in (
            ("host_kcore", q_host_kcore),
            ("host_clustering_coef", q_host_clustering_coef),
            ("dedup_edit_verify", q_dedup_edit_verify),
            ("skew_key_report", q_skew_key_report),
            ("scrub_secrets", q_scrub_secrets),
            ("l_diversity_audit", q_l_diversity_audit),
            ("ppl_tertile_buckets", q_ppl_tertile_buckets),
            ("retrieve_prf_rocchio", q_retrieve_prf_rocchio),
            ("t5_span_examples", q_t5_span_examples),
            ("dp_noisy_counts", q_dp_noisy_counts),
            ("cluster_balanced_sample", q_cluster_balanced_sample),
            ("bucketed_join_serve", q_bucketed_join_serve),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-10 session 9, late additions
        from hash_db_spark.queries.curation_queries import (
            q_score_quantile_blend,
        )
        from hash_db_spark.queries.html_queries import q_anchor_query_pairs
        from hash_db_spark.queries.pipeline_queries import (
            q_curation_funnel_report,
            q_stream_secret_scrub,
        )
        from hash_db_spark.queries.temporal_queries import (
            q_user_type_entropy,
        )
        from hash_db_spark.queries.web_queries import q_host_adamic_adar

        for name, fn in (
            ("host_adamic_adar", q_host_adamic_adar),
            ("anchor_query_pairs", q_anchor_query_pairs),
            ("curation_funnel_report", q_curation_funnel_report),
            ("user_type_entropy", q_user_type_entropy),
            ("stream_secret_scrub", q_stream_secret_scrub),
            ("score_quantile_blend", q_score_quantile_blend),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-10 session 9: r13 queue candidates
        from hash_db_spark.queries.sampling_queries import q_kfold_balance
        from hash_db_spark.queries.temporal_queries import q_rfm_segments
        from hash_db_spark.queries.web_queries import q_host_graph_profile

        from hash_db_spark.queries.similarity_queries import (
            q_bitext_length_filter,
        )
        from hash_db_spark.queries.web_queries import q_url_path_templates

        for name, fn in (
            ("host_graph_profile", q_host_graph_profile),
            ("kfold_balance", q_kfold_balance),
            ("rfm_segments", q_rfm_segments),
            ("url_path_templates", q_url_path_templates),
            ("bitext_length_filter", q_bitext_length_filter),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
        # round-11 session: the last 7 queued candidates without probes
        from hash_db_spark.queries.curation_queries import (
            q_quality_calibration,
            q_soft_dedup_sample,
        )
        from hash_db_spark.queries.dedup_queries import q_dedup_method_eval
        from hash_db_spark.queries.pipeline_queries import q_vocab_oov_report
        from hash_db_spark.queries.temporal_queries import q_session_type_pmi
        from hash_db_spark.queries.text_queries import (
            q_eval_ngram_coverage,
            q_term_burstiness,
        )

        for name, fn in (
            ("quality_calibration", q_quality_calibration),
            ("soft_dedup_sample", q_soft_dedup_sample),
            ("dedup_method_eval", q_dedup_method_eval),
            ("vocab_oov_report", q_vocab_oov_report),
            ("term_burstiness", q_term_burstiness),
            ("eval_ngram_coverage", q_eval_ngram_coverage),
            ("session_type_pmi", q_session_type_pmi),
        ):
            timed(f"{name}/{scale}", lambda f=fn: f(spark, sf_dir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
