"""Token-window chunking — split documents into fixed-size training
examples with overlap.

No reference counterpart (the reference returns whole stored values);
this is the step between a cleaned corpus and a training run: each
document becomes ceil(len/stride) examples of at most ``size`` tokens,
consecutive chunks sharing ``overlap`` tokens of context.

Plan shape: tokenize + per-row explode — entirely map-side (no shuffle,
no UDF, whole-stage codegen except the array lambdas), so it scales
linearly and composes with any downstream repartition-by-size. Output
cardinality is rows x ceil(tokens/stride), known up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from hash_db_spark.operators.dedup import clean_tokens, sql_clean_tokens


def token_chunks(
    df: DataFrame,
    col: str,
    id_col: str,
    size: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text): ``size``-token windows every
    ``size - overlap`` tokens; the final chunk may be shorter (it is never
    empty — starts never exceed the token count). Documents with no
    tokens produce no chunks."""
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    base = df.select(
        F.col(id_col).alias("id"), clean_tokens(col).alias("toks")
    ).filter(F.size("toks") > 0)
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("toks"), F.lit(stride)),
        lambda s: F.slice("toks", s, size),
    )
    return (
        base.select("id", F.posexplode(chunks).alias("chunk_idx", "ctoks"))
        .select(
            "id",
            "chunk_idx",
            F.size("ctoks").alias("n_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
    )


def sql_token_chunks(
    table: str,
    col: str,
    id_col: str,
    size: int = 16,
    overlap: int = 4,
) -> str:
    stride = size - overlap
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, {sql_clean_tokens(col)} AS t FROM {table}
),
starts AS (
  SELECT id, t,
         unnest(generate_series(1, CAST(len(t) AS BIGINT), {stride})) AS s
  FROM toks WHERE len(t) > 0
)
SELECT id,
       CAST((s - 1) / {stride} AS INT) AS chunk_idx,
       CAST(len(list_slice(t, s, s + {size} - 1)) AS INT) AS n_tokens,
       list_aggregate(list_slice(t, s, s + {size} - 1), 'string_agg', ' ')
         AS chunk_text
FROM starts
"""


def _warn_if_unsharded(shard_col: str | None) -> None:
    """shard_col=None funnels the packing window into ONE task (a single
    'all' partition) — fine for tests, a stall at corpus scale. Loud,
    not silent: same discipline as every other documented boundary
    (broadcast caps, centroid caps). A single-VALUED shard column has
    the same funnel and can't be detected without a job — the docstrings
    call that out instead. RuntimeWarning, not ResourceWarning: the
    default warning filters print the former and swallow the latter,
    and a warning nobody sees isn't loud."""
    if shard_col is None:
        import warnings

        warnings.warn(
            "pack_* called without shard_col: the packing window runs as "
            "ONE task; partition by lang/source at corpus scale",
            RuntimeWarning,
            stacklevel=3,
        )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """Pack token chunks into training sequences of ~``budget`` tokens by
    cumulative offset: a chunk joins the sequence its starting offset
    falls in (seq_id = floor(offset/budget)), so sequences average the
    budget; the chunk straddling a boundary belongs to the sequence it
    starts in (pad/truncate downstream — standard pre-tokenized packing).

    Deterministic: packing order is (id, chunk_idx) within a shard.
    Scale shape: ONE window per shard — partition by ``shard_col``
    (lang/source); a None shard means one global sequence stream, which
    serializes the window into a single task and is only for tests.
    Returns (shard, seq_id, n_chunks, seq_tokens)."""
    w = (
        Window.partitionBy("shard")
        .orderBy("id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    _warn_if_unsharded(shard_col)
    shard = F.col(shard_col) if shard_col else F.lit("all")
    offs = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")
    # Integer DIV, not floor(double division): a global token offset
    # past 2^53 (real at 100 TB) silently loses ulps as a double and
    # can flip a sequence boundary (same discipline as rank.ntile_global).
    seq = F.expr(f"off DIV {budget}").alias("seq_id")
    return (
        chunks.select(shard.alias("shard"), "id", "chunk_idx", "n_tokens")
        .select("shard", "id", "chunk_idx", "n_tokens", offs)
        .select("shard", seq, "n_tokens")
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
    )


def pack_manifest(
    chunks: DataFrame,
    budget: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """The loader-facing form of pack_chunks: one row per PLACED chunk —
    (shard, seq_id, id, chunk_idx, start_tok, n_tokens) where start_tok
    is the chunk's token offset WITHIN its packed sequence. A training
    data loader consumes exactly this manifest to assemble sequences
    (and cut attention masks at chunk boundaries) without re-deriving
    the packing. Same single per-shard window as pack_chunks; identical
    placement (seq_id = floor(global_offset / budget), start_tok =
    global_offset % budget)."""
    w = (
        Window.partitionBy("shard")
        .orderBy("id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    _warn_if_unsharded(shard_col)
    shard = F.col(shard_col) if shard_col else F.lit("all")
    offs = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")
    return (
        chunks.select(shard.alias("shard"), "id", "chunk_idx", "n_tokens")
        .select("shard", "id", "chunk_idx", "n_tokens", offs)
        .select(
            "shard",
            # integer DIV: see pack_chunks
            F.expr(f"off DIV {budget}").cast("long").alias("seq_id"),
            "id",
            "chunk_idx",
            (F.col("off") % budget).cast("int").alias("start_tok"),
            "n_tokens",
        )
    )


def sql_pack_manifest(
    chunks_sql: str, budget: int = 64, shard_col: str | None = None
) -> str:
    shard = shard_col if shard_col else "'all'"
    part = f"PARTITION BY {shard_col}" if shard_col else ""
    return f"""
WITH chunks AS ({chunks_sql}),
offs AS (
  SELECT {shard} AS shard, id, chunk_idx, n_tokens,
         sum(n_tokens) OVER ({part} ORDER BY id, chunk_idx
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS off
  FROM chunks
)
SELECT shard, CAST(off // {budget} AS BIGINT) AS seq_id,
       id, chunk_idx, CAST(off % {budget} AS INT) AS start_tok, n_tokens
FROM offs
"""


def sql_pack_chunks(
    chunks_sql: str, budget: int = 64, shard_col: str | None = None
) -> str:
    shard = shard_col if shard_col else "'all'"
    part = f"PARTITION BY {shard_col}" if shard_col else ""
    return f"""
WITH chunks AS ({chunks_sql}),
offs AS (
  SELECT {shard} AS shard, n_tokens,
         sum(n_tokens) OVER ({part} ORDER BY id, chunk_idx
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS off
  FROM chunks
)
SELECT shard, CAST(off // {budget} AS BIGINT) AS seq_id,
       count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
FROM offs GROUP BY shard, CAST(off // {budget} AS BIGINT)
"""


# --- masked-LM training examples ---------------------------------------------

MLM_MOD = 7  # mask positions where md5(doc#pos) % MOD == 0 (~14%)
MLM_TOKEN = "[MASK]"


def mlm_examples(
    df: DataFrame,
    col: str,
    id_col: str,
    mod: int = MLM_MOD,
) -> DataFrame:
    """(id, input_text, targets, n_masked): BERT-style masked-LM
    example construction (Devlin et al. 2018 — public), with the mask
    CONTENT-ADDRESSED: position i of document d masks iff
    md5(d#i) % mod == 0, so examples are reproducible from the dataset
    alone — across runs, engines, partitionings, and epochs (vary
    ``mod``'s seed position upstream to resample). targets is the
    recoverable supervision: 'pos:token' pairs, space-joined in
    position order.

    Scale shape: one pure-HOF projection pipeline — transform over the
    token index sequence, no explode, no shuffle, no Python; the whole
    builder is whole-stage codegen and at 100 TB costs exactly one
    corpus scan. The mask array is MATERIALIZED once per doc in a
    staging projection: Catalyst does not CSE subexpressions across
    HOF lambdas, so the inline form computed each position's md5 three
    times (input/targets/count) — measured 4.0s -> ~1.6s alone-warm at
    sf0.1 from this alone."""
    from hash_db_spark.operators.dedup import clean_tokens

    toks = clean_tokens(col)
    did = F.col(id_col).cast("string")

    def masked(i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(did, F.lit("#"), i.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % mod
            == 0
        )

    staged = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.transform(
            F.sequence(F.lit(1), F.size(toks)), masked
        ).alias("mask"),
    ).filter(F.size(toks) > 0)
    idx = F.sequence(F.lit(1), F.size("toks"))
    inp = F.array_join(
        F.zip_with(
            F.col("toks"),
            F.col("mask"),
            lambda t, m: F.when(m, F.lit(MLM_TOKEN)).otherwise(t),
        ),
        " ",
    )
    tgt = F.array_join(
        F.filter(
            F.transform(
                idx,
                lambda i: F.when(
                    F.element_at("mask", i),
                    F.concat(
                        i.cast("string"),
                        F.lit(":"),
                        F.element_at("toks", i),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    n_masked = F.size(F.filter("mask", lambda m: m)).cast("long")
    return staged.select(
        "id",
        inp.alias("input_text"),
        tgt.alias("targets"),
        n_masked.alias("n_masked"),
    )


def sql_mlm_examples(
    table: str, col: str, id_col: str, mod: int = MLM_MOD
) -> str:
    """DuckDB twin — same md5 position addressing over the same
    clean-token list."""
    toks = (
        f"list_filter(string_split(replace({col}, ',', ''), ' '),"
        f" x -> x <> '')"
    )
    m = (
        f"('0x' || substr(md5({id_col}::VARCHAR || '#' || i::VARCHAR),"
        f" 1, 8))::BIGINT % {mod} = 0"
    )
    return f"""
SELECT {id_col} AS id,
  array_to_string(list_transform(range(1, len(t) + 1),
    i -> CASE WHEN {m} THEN '{MLM_TOKEN}' ELSE t[i] END), ' ')
    AS input_text,
  COALESCE(array_to_string(list_filter(list_transform(
    range(1, len(t) + 1),
    i -> CASE WHEN {m} THEN i::VARCHAR || ':' || t[i] ELSE NULL END),
    x -> x IS NOT NULL), ' '), '') AS targets,
  len(list_filter(range(1, len(t) + 1), i -> {m}))::BIGINT AS n_masked
FROM (SELECT {id_col}, {toks} AS t FROM {table})
WHERE len(t) > 0
"""


# --- content-defined chunking (CDC) -----------------------------------------

CDC_G = 8  # boundary when md5(token) % G == 0 -> expected chunk ~G tokens
CDC_MIN_SHARED = 2  # chunk counts as deduplicable when seen in >= 2 docs


def cdc_chunks(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, chunk_idx, chunk_hash, n_toks): content-defined chunks — a
    chunk boundary falls AFTER any token whose content hash is
    0 mod CDC_G (the gear/Rabin-CDC idea at token granularity: FastCDC,
    Xia et al., USENIX ATC 2016 — public). Because boundaries depend on
    CONTENT, not positions, an edit near a doc's start re-synchronizes
    within ~G tokens and the remaining chunks hash identically — the
    property fixed-size chunking lacks and storage-level dedup of a
    100 TB snapshot store needs (only changed chunks re-ship).

    Plan: one per-doc window pass (running sum of boundary flags =
    chunk index), one (id, chunk) aggregation ordered by position.
    Exact-integer md5 arithmetic end to end — cross-engine stable."""
    from pyspark.sql import Window

    from hash_db_spark.operators.dedup import clean_tokens, md5_hash64

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(clean_tokens(col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    # chunk index = boundaries strictly BEFORE this token
    flagged = toks.withColumn(
        "bdry", (md5_hash64(F.col("tok")) % CDC_G == 0).cast("int")
    ).withColumn(
        "chunk_idx",
        F.coalesce(
            F.sum("bdry").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int"),
    )
    return (
        flagged.groupBy("id", "chunk_idx")
        .agg(
            F.md5(
                F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "tok")))
                            .getField("tok"))
            ).alias("chunk_hash"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )


def cdc_dedup_report(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, n_chunks, n_toks, shared_chunks, shared_toks): per document,
    how much of it is made of chunks that also occur elsewhere in the
    corpus (chunk hash seen in >= CDC_MIN_SHARED distinct docs) — the
    storage-dedup yield estimate. One extra chunk-hash-keyed
    aggregation + join over cdc_chunks.

    The chunk table is materialized once (eager localCheckpoint —
    optimization r11): it feeds BOTH the chunk-hash frequency
    aggregation and the join-back, and without the checkpoint the whole
    tokenize -> window -> chunk-assembly chain executed twice (measured
    build+exec 2.2s -> 1.6s at sf0.1). At 100 TB the chunk store is the
    operator's natural persisted artifact anyway (storage dedup ships
    only new chunk hashes), same precedent as simhash(materialize=True)
    and the trigram-LM count checkpoint."""
    ch = cdc_chunks(df, col, id_col).localCheckpoint(eager=True)
    freq = ch.groupBy("chunk_hash").agg(
        F.countDistinct("id").alias("n_docs_with")
    )
    return (
        ch.join(freq, "chunk_hash")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_toks").cast("long").alias("n_toks"),
            F.sum(
                (F.col("n_docs_with") >= CDC_MIN_SHARED).cast("int")
            ).cast("long").alias("shared_chunks"),
            F.sum(
                F.when(
                    F.col("n_docs_with") >= CDC_MIN_SHARED, F.col("n_toks")
                ).otherwise(F.lit(0))
            ).cast("long").alias("shared_toks"),
        )
    )


def sql_cdc_dedup_report(table: str, col: str, id_col: str) -> str:
    from hash_db_spark.operators.dedup import sql_clean_tokens, sql_md5_hash64

    return f"""
WITH lst AS (
  SELECT {id_col} AS id, {sql_clean_tokens(col)} AS l FROM {table}
),
toks AS (
  SELECT id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lst
),
flagged AS (
  SELECT id, pos, tok,
         CASE WHEN {sql_md5_hash64('tok')} % {CDC_G} = 0 THEN 1 ELSE 0 END
           AS bdry
  FROM toks
),
idxed AS (
  SELECT id, pos, tok,
         CAST(coalesce(sum(bdry) OVER (
           PARTITION BY id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS INT) AS chunk_idx
  FROM flagged
),
chunks AS (
  SELECT id, chunk_idx,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
         count(*) AS n_toks
  FROM idxed GROUP BY id, chunk_idx
),
freq AS (
  SELECT chunk_hash, count(DISTINCT id) AS n_docs_with
  FROM chunks GROUP BY chunk_hash
)
SELECT id,
       count(*) AS n_chunks,
       CAST(sum(n_toks) AS BIGINT) AS n_toks,
       CAST(sum(CASE WHEN n_docs_with >= {CDC_MIN_SHARED} THEN 1 ELSE 0 END)
            AS BIGINT) AS shared_chunks,
       CAST(sum(CASE WHEN n_docs_with >= {CDC_MIN_SHARED} THEN n_toks
                ELSE 0 END) AS BIGINT) AS shared_toks
FROM chunks JOIN freq USING (chunk_hash)
GROUP BY id
"""


# --- training loss masks -----------------------------------------------------

MASK_TOKEN_RE = "<(EMAIL|IP|PHONE|NUM)>"


def loss_mask_report(
    df: DataFrame,
    col: str,
    id_col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "number"),
    size: int = 16,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, n_masked): per training chunk, how many
    tokens carry a PII redaction marker and must be EXCLUDED from the
    loss (trained-on PII is a leak even when redacted text looks clean —
    the mask is the artifact the data loader consumes alongside the
    chunk). Composition of the proven pieces: scrub.redact ->
    token_chunks -> a pure higher-order-function count per chunk. Fully
    map-side on top of token_chunks' one explode — no extra shuffle."""
    from hash_db_spark.functions import scrub

    clean = df.select(
        F.col(id_col).alias("__mid"), scrub.redact(col, kinds).alias("__clean")
    )
    ch = token_chunks(clean, "__clean", "__mid", size=size, overlap=overlap)
    toks = F.split(F.col("chunk_text"), " ")
    return ch.select(
        "id",
        "chunk_idx",
        "n_tokens",
        F.size(
            F.filter(toks, lambda t: t.rlike(MASK_TOKEN_RE))
        ).alias("n_masked"),
    )


def sql_loss_mask_report(
    table: str,
    col: str,
    id_col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "number"),
    size: int = 16,
    overlap: int = 0,
) -> str:
    from hash_db_spark.functions import scrub

    clean = (
        f"(SELECT {id_col} AS __mid, "
        f"{scrub.sql_redact(col, kinds)} AS __clean FROM {table})"
    )
    inner = sql_token_chunks(clean, "__clean", "__mid", size=size, overlap=overlap)
    return f"""
SELECT id, chunk_idx, n_tokens,
       CAST(len(list_filter(string_split(chunk_text, ' '),
            x -> regexp_matches(x, '{MASK_TOKEN_RE}'))) AS INT) AS n_masked
FROM ({inner})
"""


CONTEXT_LENS = (16, 32, 64, 128)


def context_fit_report(
    df: DataFrame,
    col: str,
    lens: tuple[int, ...] = CONTEXT_LENS,
) -> DataFrame:
    """(context_len, n_docs, docs_truncated, tokens_total, tokens_lost,
    lost_pct_micro, pad_pct_micro, packed_seqs, packed_pad_pct_micro):
    the context-length planning table a training run reads before
    choosing sequence length — for each candidate L, how many tokens
    truncation throws away, how much of a naive one-doc-per-row batch
    is padding, and what the padding floor is after ideal sequence
    packing (ceil(kept/L) sequences — the bound pack_chunks approaches).

    Scale shape: one map-side tokenize + per-row explode of the
    len(lens) literal lengths, then ONE reduction keyed by L (4 groups,
    map-side partial agg) — no joins, no second corpus pass. All
    aggregates are exact integer sums; the three pct ratios are one
    float expression each per L-row, micro-quantized (the
    curation.micro_col discipline)."""
    from hash_db_spark.operators.curation import micro_col

    n = (
        df.select(F.size(clean_tokens(col)).alias("n"))
        .filter(F.col("n") > 0)
        .select(
            "n",
            F.explode(
                F.array(*[F.lit(int(s)) for s in lens])
            ).alias("context_len"),
        )
    )
    agg = n.groupBy("context_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n") > F.col("context_len")).cast("long")).alias(
            "docs_truncated"
        ),
        F.sum("n").alias("tokens_total"),
        F.sum(
            F.greatest(F.col("n") - F.col("context_len"), F.lit(0))
        ).alias("tokens_lost"),
        F.sum(F.least(F.col("n"), F.col("context_len"))).alias("kept"),
    )
    L = F.col("context_len").cast("double")
    kept = F.col("kept").cast("double")
    packed = F.floor((kept + L - 1.0) / L).cast("long")
    lost_pct = F.col("tokens_lost").cast("double") / F.col(
        "tokens_total"
    ).cast("double")
    pad_pct = (F.col("n_docs").cast("double") * L - kept) / (
        F.col("n_docs").cast("double") * L
    )
    packed_pad_pct = (
        F.col("packed_seqs").cast("double") * L - kept
    ) / (F.col("packed_seqs").cast("double") * L)
    return (
        agg.withColumn("packed_seqs", packed)
        .select(
            "context_len",
            "n_docs",
            "docs_truncated",
            "tokens_total",
            "tokens_lost",
            micro_col(lost_pct).alias("lost_pct_micro"),
            micro_col(pad_pct).alias("pad_pct_micro"),
            "packed_seqs",
            micro_col(packed_pad_pct).alias("packed_pad_pct_micro"),
        )
        .orderBy("context_len")
    )


def sql_context_fit_report(
    table: str,
    col: str,
    lens: tuple[int, ...] = CONTEXT_LENS,
) -> str:
    from hash_db_spark.operators.curation import sql_micro

    lit = ", ".join(str(int(s)) for s in lens)
    lost_pct = "(CAST(tokens_lost AS DOUBLE) / CAST(tokens_total AS DOUBLE))"
    pad_pct = (
        "((CAST(n_docs AS DOUBLE) * CAST(context_len AS DOUBLE)"
        " - CAST(kept AS DOUBLE))"
        " / (CAST(n_docs AS DOUBLE) * CAST(context_len AS DOUBLE)))"
    )
    packed_pad_pct = (
        "((CAST(packed_seqs AS DOUBLE) * CAST(context_len AS DOUBLE)"
        " - CAST(kept AS DOUBLE))"
        " / (CAST(packed_seqs AS DOUBLE) * CAST(context_len AS DOUBLE)))"
    )
    return f"""
WITH n_tok AS (
  SELECT CAST(len({sql_clean_tokens(col)}) AS BIGINT) AS n FROM {table}
),
fanned AS (
  SELECT n, unnest([{lit}]) AS context_len FROM n_tok WHERE n > 0
),
agg AS (
  SELECT context_len,
         count(*) AS n_docs,
         sum(CASE WHEN n > context_len THEN 1 ELSE 0 END) AS docs_truncated,
         sum(n) AS tokens_total,
         sum(greatest(n - context_len, 0)) AS tokens_lost,
         sum(least(n, context_len)) AS kept
  FROM fanned GROUP BY context_len
),
packed AS (
  SELECT *,
         CAST(floor((CAST(kept AS DOUBLE) + CAST(context_len AS DOUBLE)
              - 1.0) / CAST(context_len AS DOUBLE)) AS BIGINT)
           AS packed_seqs
  FROM agg
)
SELECT CAST(context_len AS INT) AS context_len, n_docs,
       CAST(docs_truncated AS BIGINT) AS docs_truncated,
       CAST(tokens_total AS BIGINT) AS tokens_total,
       CAST(tokens_lost AS BIGINT) AS tokens_lost,
       {sql_micro(lost_pct)} AS lost_pct_micro,
       {sql_micro(pad_pct)} AS pad_pct_micro,
       packed_seqs,
       {sql_micro(packed_pad_pct)} AS packed_pad_pct_micro
FROM packed
ORDER BY context_len
"""


# --- T5 span corruption ---------------------------------------------------------

T5_BLOCK = 8  # one candidate span per 8-token block
T5_SPAN = 3  # corrupted span length (T5's mean span)
T5_MOD = 3  # ~1/3 of blocks corrupt => ~12.5% of tokens


def t5_span_examples(
    df: DataFrame,
    col: str,
    id_col: str,
    block: int = T5_BLOCK,
    span: int = T5_SPAN,
    mod: int = T5_MOD,
) -> DataFrame:
    """(id, input_text, targets, n_spans): T5-style span corruption
    (Raffel et al., JMLR 2020 — public): contiguous token spans are
    replaced by numbered sentinels '<extra_id_K>' in the input; the
    target is the sentinel-delimited sequence of dropped spans — the
    denoising objective's example builder.

    T5 samples span starts sequentially (each start suppresses the
    next few); sequential sampling doesn't replay across engines, so
    spans here are BLOCK-ADDRESSED: the token stream is cut into
    fixed ``block``-token blocks, and block b of document d corrupts
    its first ``span`` tokens iff md5(d#sb) % mod == 0 and the span
    fits. Spans can't overlap by construction, the mask is
    reproducible from the dataset alone (same property as
    mlm_examples), and the corruption rate is span/(block*mod).

    Scale shape: one pure-HOF projection pipeline — block flags,
    sentinel numbering (a prefix count over the flag list), input and
    target assembly are all transform/filter/slice/flatten over the
    token array; no explode, no shuffle, no Python. One corpus scan at
    any size. The flag array is MATERIALIZED once per doc in a staging
    projection (the mlm_examples lesson: Catalyst does not CSE across
    HOF lambdas, and the inline ``sel`` was re-expanded — md5s and all
    — at every reference, including the per-block prefix counts;
    measured 8.1s -> ~1.1s alone-warm at sf0.1)."""
    from hash_db_spark.operators.dedup import clean_tokens

    toks0 = clean_tokens(col)
    did = F.col(id_col).cast("string")
    n0 = F.size(toks0)
    nb0 = F.ceil(n0 / F.lit(block)).cast("int")

    def selected(b):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(did, F.lit("#s"), b.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % mod
            == 0
        ) & (b * block + span <= n0)

    staged = df.select(
        F.col(id_col).alias("id"),
        toks0.alias("toks"),
        F.transform(F.sequence(F.lit(0), nb0 - 1), selected).alias("sel"),
    ).filter(F.size(toks0) > 0)
    toks = F.col("toks")
    sel = F.col("sel")
    n = F.size(toks)
    nb = F.size(sel)
    bidx = F.sequence(F.lit(0), nb - 1)

    def k_of(b):
        return F.size(F.filter(F.slice(sel, 1, b), lambda x: x))

    def sentinel(b):
        return F.concat(
            F.lit("<extra_id_"), k_of(b).cast("string"), F.lit(">")
        )

    def blk_len(b):
        return F.least(F.lit(block), n - b * block)

    pieces = F.transform(
        bidx,
        lambda b: F.when(
            F.element_at(sel, b + 1),
            F.concat(
                F.array(sentinel(b)),
                F.slice(toks, b * block + span + 1, blk_len(b) - span),
            ),
        ).otherwise(F.slice(toks, b * block + 1, blk_len(b))),
    )
    inp = F.array_join(F.flatten(pieces), " ")
    tgt = F.array_join(
        F.filter(
            F.transform(
                bidx,
                lambda b: F.when(
                    F.element_at(sel, b + 1),
                    F.concat(
                        sentinel(b),
                        F.lit(" "),
                        F.array_join(
                            F.slice(toks, b * block + 1, span), " "
                        ),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    n_spans = F.size(F.filter(sel, lambda x: x)).cast("long")
    return staged.select(
        "id",
        inp.alias("input_text"),
        tgt.alias("targets"),
        n_spans.alias("n_spans"),
    )


def sql_t5_span_examples(
    table: str,
    col: str,
    id_col: str,
    block: int = T5_BLOCK,
    span: int = T5_SPAN,
    mod: int = T5_MOD,
) -> str:
    """DuckDB twin — same block addressing; list_slice is END-INDEXED
    there (vs Spark's length-based slice), hence the (b+1)*block
    bounds."""
    toks = (
        f"list_filter(string_split(replace({col}, ',', ''), ' '),"
        f" x -> x <> '')"
    )
    seltest = (
        f"(('0x' || substr(md5(id::VARCHAR || '#s' || b::VARCHAR),"
        f" 1, 8))::BIGINT % {mod} = 0 AND b * {block} + {span} <= len(t))"
    )
    k_of = "len(list_filter(list_slice(sel, 1, b), x -> x))"
    sentinel = f"'<extra_id_' || ({k_of})::VARCHAR || '>'"
    return f"""
SELECT id,
  array_to_string(flatten(list_transform(bidx, b ->
    CASE WHEN sel[b + 1] THEN
      list_prepend({sentinel},
        list_slice(t, b * {block} + {span} + 1,
                   least((b + 1) * {block}, len(t))))
    ELSE list_slice(t, b * {block} + 1,
                    least((b + 1) * {block}, len(t)))
    END)), ' ') AS input_text,
  COALESCE(array_to_string(list_filter(list_transform(bidx, b ->
    CASE WHEN sel[b + 1] THEN
      {sentinel} || ' ' ||
      array_to_string(list_slice(t, b * {block} + 1,
                                 b * {block} + {span}), ' ')
    ELSE NULL END), x -> x IS NOT NULL), ' '), '') AS targets,
  len(list_filter(sel, x -> x))::BIGINT AS n_spans
FROM (
  SELECT id, t, bidx,
         list_transform(bidx, b -> {seltest}) AS sel
  FROM (
    SELECT {id_col} AS id, t,
           range(0, CAST(ceil(len(t) / {block}.0) AS INT)) AS bidx
    FROM (SELECT {id_col}, {toks} AS t FROM {table})
  )
)
WHERE len(t) > 0
"""
