"""HashDb — single-object facade with the reference server's API surface.

A reference user talks to ONE coordinator over HTTP
(/root/reference/server.py routes); this class gives that user the same
verbs on top of the Spark engines, so switching is a mechanical
endpoint→method rename:

    reference endpoint                        HashDb method
    ----------------------------------------  ------------------------------
    POST /set  (server.py:80)                 set(pk, sk, value)
    GET  /get/<key>  (client.py:59)           get(pk, sk)
    GET  /clear/<key>  (client.py:204)        clear(pk, sk)
    /query_begins  (server.py:113)            query_begins(pk, prefix, desc)
    /query_pk_sk_begins  (server.py:128)      query_pk_sk_begins(...)
    /query_between  (server.py:143)           query_between(pk, lo, hi, desc)
    /both_between  (server.py:156)            both_between(...)
    query_before/greater_than (hash-db.py:71) query_before_than / _greater_
    POST /sql  (server.py:1135)               sql(text)
    POST /cypher  (server.py:1159)            cypher(statement)
    POST /save/<coll>/<id>  (server.py:289)   save(collection, doc_id, obj)
    GET  /documents/<coll>/<id>               document(collection, doc_id)

State model: the KV table, the SQL catalog, and the graph frames are
in-memory DataFrames owned by this object and replaced functionally on
every mutation (kv_set/merge return new frames). On a deployment these
become Delta tables and the mutations MERGE/append — the method surface
does not change. Documents are stored as raw JSON per collection and
registered with the SQL engine as a schema-inferred nested view, so the
reference's `select people.~hobbies[]~name from people` path queries run
unchanged (server.py:320-328 co-inserts shredded leaves for the same
reason).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.cypher import CypherCompiler
from hash_db_spark.operators import kv as K
from hash_db_spark.operators.documents import shred_infer
from hash_db_spark.sql import SqlEngine

from hash_db_spark.localframe import local_frame

_KV_SCHEMA = "pk string, sk string, value string"
_NODES_SCHEMA = "id string, label string, name string, attrs map<string,string>"
_EDGES_SCHEMA = "src string, dst string, rel string"


# Per-mutation facade calls (set/clear/merge) each add an anti-join +
# union layer on the previous plan; past this many layers the lineage is
# cut with a lazy localCheckpoint so a long interactive session stays
# O(_CHECKPOINT_EVERY) plan depth instead of O(total mutations). Bulk
# ingest should still go through kv_set with a batch frame — this guard
# is for the reference-demo interactive shape, not the ingest path.
_CHECKPOINT_EVERY = 24


class HashDb:
    def __init__(
        self, spark: SparkSession, tables: dict[str, DataFrame] | None = None
    ):
        self.spark = spark
        self.kv = spark.createDataFrame([], _KV_SCHEMA)
        self.engine = SqlEngine(spark, tables or {})
        self.nodes = spark.createDataFrame([], _NODES_SCHEMA)
        self.edges = spark.createDataFrame([], _EDGES_SCHEMA)
        self._docs: dict[str, dict[str, str]] = {}  # collection -> id -> json
        self._kv_mutations = 0
        self._graph_mutations = 0

    def _trim_kv_lineage(self) -> None:
        self._kv_mutations += 1
        if self._kv_mutations % _CHECKPOINT_EVERY == 0:
            # eager: a lazy checkpoint never materializes without an
            # action, so under a pure mutation burst the stacked markers
            # would still carry the full lineage (measured: 500 set()
            # calls grew 42s -> 89s -> 182s per-100 with eager=False).
            # One tiny Spark job per _CHECKPOINT_EVERY mutations keeps
            # both plan depth and analysis time flat.
            self.kv = self._capped_checkpoint(self.kv)

    def _capped_checkpoint(self, df: DataFrame) -> DataFrame:
        # localCheckpoint preserves the physical partitioning, and each
        # union-style mutation appends its own partition(s) — measured
        # +1 partition PER MUTATION surviving every checkpoint, so a
        # long session's checkpoint jobs grow linearly in task count
        # even though plan depth stays flat. coalesce is narrow (no
        # shuffle) and a no-op when already at or under the cap, so a
        # genuinely large table on a cluster keeps defaultParallelism-
        # wide layout while an interactive session stays flat.
        return df.coalesce(
            self.spark.sparkContext.defaultParallelism
        ).localCheckpoint()

    # -- KV (K1-K9) ---------------------------------------------------------

    def set(self, pk: str, sk: str, value: str) -> None:
        row = local_frame(self.spark, [(pk, sk, str(value))], _KV_SCHEMA)
        self.kv = K.kv_set(self.kv, row)
        self._trim_kv_lineage()

    def get(self, pk: str, sk: str) -> str | None:
        rows = K.kv_get(self.kv, pk, sk).collect()
        return rows[0].value if rows else None

    def clear(self, pk: str, sk: str) -> None:
        self.kv = K.kv_clear(self.kv, pk, sk)
        self._trim_kv_lineage()

    def _rows(self, df: DataFrame) -> list[tuple[str, str, str]]:
        return [(r.pk, r.sk, r.value) for r in df.collect()]

    def query_begins(self, pk, sk_prefix, desc=False):
        return self._rows(K.query_begins(self.kv, pk, sk_prefix, desc))

    def query_pk_sk_begins(self, pk_prefix, sk_prefix="", desc=False):
        return self._rows(
            K.query_pk_sk_begins(self.kv, pk_prefix, sk_prefix, desc)
        )

    def query_between(self, pk, sk_lo, sk_hi, desc=False):
        return self._rows(K.query_between(self.kv, pk, sk_lo, sk_hi, desc))

    def both_between(self, pk_lo, pk_hi, sk_lo, sk_hi, desc=False):
        return self._rows(
            K.both_between(self.kv, pk_lo, pk_hi, sk_lo, sk_hi, desc)
        )

    def query_before_than(self, pk, sk_prefix, bound, desc=False):
        return self._rows(
            K.query_before_than(self.kv, pk, sk_prefix, bound, desc)
        )

    def query_greater_than(self, pk, sk_prefix, bound, desc=False):
        return self._rows(
            K.query_greater_than(self.kv, pk, sk_prefix, bound, desc)
        )

    # -- SQL ----------------------------------------------------------------

    def sql(self, text: str):
        """Reference dialect (select/insert/update/create join, FTS `~`,
        document paths, order by/limit/distinct). Returns a list of row
        dicts for selects — the reference's JSON response shape
        (server.py:1067-1074) — or None for mutations."""
        out = self.engine.sql(text)
        if out is None:
            return None
        return [r.asDict(recursive=True) for r in out.collect()]

    def sql_df(self, text: str) -> DataFrame | None:
        """The same statement as a lazy DataFrame (engine-native path)."""
        return self.engine.sql(text)

    def sql_script(self, script: str) -> list[dict] | None:
        """Run a multi-statement session — the shape the reference's
        example.py drives one HTTP POST per statement
        (/root/reference/example.py:86-146: a run of inserts, then
        selects, then an update) — in one call. Statements split on
        `;`, honoring single-quoted strings (a literal `';'` never
        splits); each runs in order and the LAST select's rows are
        returned, wherever it appears (None if the script contains no
        select at all)."""
        stmts, buf, in_str = [], [], False
        for ch in script:
            if ch == "'":
                in_str = not in_str
            if ch == ";" and not in_str:
                stmts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        stmts.append("".join(buf))
        result = None
        for stmt in (s.strip() for s in stmts):
            if not stmt:
                continue
            out = self.sql(stmt)
            if out is not None:
                result = out
        return result

    # -- Cypher -------------------------------------------------------------

    def cypher(self, statement: str):
        """MERGE mutates the graph and returns None; MATCH returns the
        RETURN projection as a list of row dicts (server.py:1159-1170 /
        client.py:1198-1219 emit {var: node} rows)."""
        result = CypherCompiler(self.nodes, self.edges).run(statement)
        if isinstance(result, tuple):
            self.nodes, self.edges = result
            self._graph_mutations += 1
            if self._graph_mutations % _CHECKPOINT_EVERY == 0:
                self.nodes = self._capped_checkpoint(self.nodes)
                self.edges = self._capped_checkpoint(self.edges)
            return None
        return [r.asDict(recursive=True) for r in result.collect()]

    # -- documents ----------------------------------------------------------

    def save(self, collection: str, doc_id: str, obj) -> None:
        """Store a JSON document AND register the collection as a nested
        SQL view so `~path[]~leaf` dialect queries work (the reference
        shreds + co-inserts for the same effect, server.py:289-331)."""
        self._docs.setdefault(collection, {})[str(doc_id)] = json.dumps(obj)
        raw = local_frame(
            self.spark,
            [(i, j) for i, j in self._docs[collection].items()],
            "doc_id string, json string",
        )
        # shred_infer types the JSON column; lifting its fields to top
        # level gives the flat-table-with-nested-columns shape the
        # dialect's `t.~path[]~leaf` compiler navigates.
        nested = shred_infer(raw, "json")
        self.engine.tables[collection] = nested.select("doc_id", "json.*")

    def document(self, collection: str, doc_id: str):
        raw = self._docs.get(collection, {}).get(str(doc_id))
        return None if raw is None else json.loads(raw)

    def documents(self, collection: str) -> DataFrame:
        """The collection as a nested DataFrame (native storage — no
        shred/rehydrate round trip needed)."""
        return self.engine.tables[collection]

    # -- pipeline reach-through --------------------------------------------

    def table(self, name: str) -> DataFrame:
        return self.engine.tables[name]

    def register(self, name: str, df: DataFrame) -> None:
        self.engine.tables[name] = df

    def explain(self, text: str) -> str:
        """Formatted physical plan of a dialect SELECT — the engine's
        answer to the reference's /dump diagnostics (server.py `dump`
        route; K10 'subsumed' in SURVEY §2.1): instead of dumping trie
        state, show what the engine will actually execute."""
        from hash_db_spark.plans.inspect import formatted_plan

        # Reject BEFORE dispatch: engine.sql executes mutations eagerly,
        # so checking its None return would run the INSERT/UPDATE first —
        # a diagnostics call must never modify state.
        if not text.strip().lower().startswith("select"):
            raise ValueError("explain() takes a SELECT, not a mutation")
        df = self.engine.sql(text)
        return formatted_plan(df)
