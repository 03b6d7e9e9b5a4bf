"""DynamoDB-style KV operators (SURVEY.md §2.1, K1-K9).

The reference implements these with a CharTrie + unbalanced-BST walk on a
coordinator, then one network GET per matching key
(/root/reference/server.py:113-168, /root/reference/hash-db.py:51-83,
/root/reference/datastructures.py:25-31). Here each operator is a single
declarative DataFrame expression over a ``kv(pk, sk, value)`` table:

- pk-equality predicates push down to the Parquet scan (partition-prunable
  when kv is written partitioned/bucketed by pk);
- ``startswith`` compiles to Catalyst ``StartsWith`` which pushes to Parquet
  as a string range filter;
- sorts are distributed (range-partitioned sort-merge), not a coordinator
  bottleneck like the reference's final ``sorted(...)``
  (/root/reference/server.py:126).

Semantics note (SURVEY §2.1 caveats): the reference's equality-by-prefix and
lexicographic ranges are bugs-as-features of its trie encoding; we keep true
string semantics — exact pk equality, closed [lo, hi] ranges — which match
the documented intent in /root/reference/README.md and hash-db.py's demo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _ordered(df: DataFrame, desc: bool) -> DataFrame:
    """K8: every KV query emits rows ordered by (pk, sk) asc or desc
    (reference sorts the gathered result on the coordinator,
    /root/reference/server.py:126; /root/reference/hash-db.py:55)."""
    cols = [F.col("pk"), F.col("sk")]
    return df.orderBy(*[c.desc() if desc else c.asc() for c in cols])


def kv_set(kv: DataFrame, rows: DataFrame) -> DataFrame:
    """K1: point upsert. Last-writer-wins per (pk, sk): new rows replace
    existing ones (reference overwrites the dict entry,
    /root/reference/client.py:183). Anti-join + union keeps it shuffle-light;
    on a real deployment this is a Delta MERGE.

    A batch is a SET of rows (DataFrames carry no insertion order), so an
    intra-batch key collision has no "last" writer — it resolves
    deterministically to max(value), and the unique-(pk, sk) invariant
    holds regardless of batch contents (without the collapse, both
    duplicate rows would survive the anti-join and every later get/query
    would emit the key twice)."""
    rows = rows.groupBy("pk", "sk").agg(F.max("value").alias("value"))
    keep = kv.join(rows.select("pk", "sk"), on=["pk", "sk"], how="left_anti")
    return keep.unionByName(rows)


def kv_get(kv: DataFrame, pk: str, sk: str) -> DataFrame:
    """K2: point read (/root/reference/client.py:59-64)."""
    return kv.filter((F.col("pk") == pk) & (F.col("sk") == sk))


def kv_clear(kv: DataFrame, pk: str, sk: str) -> DataFrame:
    """K9: point delete (/root/reference/client.py:204-212). Null-safe:
    with a plain ``==`` a NULL-keyed row makes the conjunction NULL,
    NOT(NULL) is NULL, and the filter would silently delete that
    unrelated row along with the targeted key."""
    return kv.filter(
        ~(F.col("pk").eqNullSafe(F.lit(pk)) & F.col("sk").eqNullSafe(F.lit(sk)))
    )


def query_begins(kv: DataFrame, pk: str, sk_prefix: str, desc: bool = False) -> DataFrame:
    """K3: pk exact, sk begins-with, globally sorted
    (/root/reference/server.py:113-126, client.py:223-242)."""
    return _ordered(
        kv.filter((F.col("pk") == pk) & F.col("sk").startswith(sk_prefix)), desc
    )


def query_pk_sk_begins(
    kv: DataFrame, pk_prefix: str, sk_prefix: str, desc: bool = False
) -> DataFrame:
    """K4: both keys begins-with (/root/reference/server.py:128-140,
    hash-db.py:58-63 — nested trie iteration there, two pushed filters here)."""
    return _ordered(
        kv.filter(
            F.col("pk").startswith(pk_prefix) & F.col("sk").startswith(sk_prefix)
        ),
        desc,
    )


def query_between(
    kv: DataFrame, pk: str, sk_lo: str, sk_hi: str, desc: bool = False
) -> DataFrame:
    """K5: pk exact, sk in closed [lo, hi] (BST range walk in the reference,
    /root/reference/server.py:143-154, datastructures.py:25-31)."""
    return _ordered(
        kv.filter((F.col("pk") == pk) & F.col("sk").between(sk_lo, sk_hi)), desc
    )


def both_between(
    kv: DataFrame,
    pk_lo: str,
    pk_hi: str,
    sk_lo: str,
    sk_hi: str,
    desc: bool = False,
) -> DataFrame:
    """K6: closed range over pks x closed range over sks (PartitionTree walk,
    /root/reference/server.py:156-168, datastructures.py:77-83)."""
    return _ordered(
        kv.filter(
            F.col("pk").between(pk_lo, pk_hi) & F.col("sk").between(sk_lo, sk_hi)
        ),
        desc,
    )


def query_before_than(
    kv: DataFrame, pk: str, sk_prefix: str, bound: str, desc: bool = False
) -> DataFrame:
    """K7a: within sk prefix, strictly before ``bound``
    (/root/reference/hash-db.py:71-76)."""
    return _ordered(
        kv.filter(
            (F.col("pk") == pk)
            & F.col("sk").startswith(sk_prefix)
            & (F.col("sk") < bound)
        ),
        desc,
    )


def query_greater_than(
    kv: DataFrame, pk: str, sk_prefix: str, bound: str, desc: bool = False
) -> DataFrame:
    """K7b: within sk prefix, strictly after ``bound``
    (/root/reference/hash-db.py:78-83)."""
    return _ordered(
        kv.filter(
            (F.col("pk") == pk)
            & F.col("sk").startswith(sk_prefix)
            & (F.col("sk") > bound)
        ),
        desc,
    )
