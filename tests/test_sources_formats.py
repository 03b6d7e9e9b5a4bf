"""Lossless round-trip proofs for the interchange formats, including the
cases the fixture tables don't cover: nulls in every type, negative and
subnormal-ish doubles, and timestamps through the text formats."""

from __future__ import annotations

import datetime

import pytest

from hash_db_spark.sources import formats


@pytest.fixture(scope="module")
def edge_df(spark):
    rows = [
        (1, "plain", 1.5, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575)),
        (2, None, None, None),
        (3, "comma, quote\" and\nnewline", -2.25e-8, datetime.datetime(1999, 12, 31, 23, 59, 59)),
        (4, "", 6.55, datetime.datetime(2024, 6, 1)),
    ]
    return spark.createDataFrame(rows, "id long, s string, d double, ts timestamp")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_tmp_paths_are_pid_keyed():
    """VERDICT r10 #3: the roundtrip fixture path must differ between
    processes so a concurrent pytest + driver check never interleave
    write/read on the same directory."""
    import os

    from hash_db_spark.queries.sources_queries import _tmp

    here = _tmp("supplier_csv")
    assert f"_{os.getpid()}" in here
    other = here.replace(f"_{os.getpid()}", f"_{os.getpid() + 1}")
    assert other != here  # distinct pids -> distinct directories


def test_bucketed_table_names_carry_session_token():
    """ADVICE r10: pid alone collides under pid reuse — table names
    embed a per-session token, and the token is stable within the
    process (mode=overwrite reuse depends on it)."""
    from hash_db_spark.queries.sources_queries import _session_token

    a, b = _session_token(), _session_token()
    assert a == b
    assert len(a) == 8


def test_csv_roundtrip_edge_values(spark, edge_df, tmp_path):
    path = str(tmp_path / "csv")
    formats.write_csv(edge_df, path)
    got = formats.read_csv(spark, path, edge_df.schema)
    want = _rows(edge_df)
    have = _rows(got)
    # CSV cannot distinguish null string from empty string (both write as
    # empty field) — that is a documented text-format limit; normalize.
    fix = [tuple(x if x != "" else None for x in r) for r in want]
    assert have == sorted(fix)


def test_jsonl_roundtrip_edge_values(spark, edge_df, tmp_path):
    path = str(tmp_path / "jsonl")
    formats.write_jsonl(edge_df, path)
    got = formats.read_jsonl(spark, path, edge_df.schema)
    assert _rows(got) == _rows(edge_df)


def test_orc_roundtrip_edge_values(spark, edge_df, tmp_path):
    path = str(tmp_path / "orc")
    formats.write_orc(edge_df, path)
    got = formats.read_orc(spark, path)
    assert _rows(got) == _rows(edge_df)
    assert got.schema == edge_df.schema


def test_warc_roundtrip_and_framing():
    """Encoder->parser round-trip; request records skipped; a body
    containing the '\\r\\n\\r\\n' delimiter parses intact (length-based
    framing, not splitting); malformed payloads raise."""
    import hashlib

    import pytest

    from hash_db_spark.sources import warc

    for d in (0, 7, 13, 17, 221, 1234):
        recs = warc.warc_parse(warc.warc_encode(d))
        assert len(recs) == 1  # the request record was skipped
        r = recs[0]
        assert r["url"] == warc.synth_url_py(d)
        assert r["status"] == (404 if d % 17 == 0 else 200)
        assert r["mime"] == ("text/plain" if d % 13 == 0 else "text/html")
        assert r["body"] == warc.synth_body(d)

    # body that embeds the record delimiter: naive splitting would
    # truncate it; the length-framed parser must not.
    evil = b"first half\r\n\r\nsecond half"
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(evil)}\r\n\r\n"
    ).encode() + evil
    payload = warc._record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://x/")],
        http,
    )
    (rec,) = warc.warc_parse(payload)
    assert rec["body"] == evil

    with pytest.raises(ValueError, match="version"):
        warc.warc_parse(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        warc.warc_parse(payload[:-10])
    with pytest.raises(ValueError, match="Content-Length"):
        warc.warc_parse(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")


def test_warc_records_pipeline(spark):
    """The Spark extraction pass over real WARC bytes matches the
    per-record python parse (ids spanning status/mime variants)."""
    import hashlib

    from hash_db_spark.sources import warc

    ids = [0, 13, 17, 26, 34, 100]
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r.media_id: (r.url, r.status, r.mime, r.n_body_bytes, r.body_md5)
        for r in warc.warc_records(
            warc.synth_warc_media(docs, "doc_id")
        ).collect()
    }
    for i in ids:
        body = warc.synth_body(i)
        assert got[i] == (
            warc.synth_url_py(i),
            404 if i % 17 == 0 else 200,
            "text/plain" if i % 13 == 0 else "text/html",
            len(body),
            hashlib.md5(body).hexdigest(),
        )


def test_warc_framing_fuzz_roundtrip():
    """Property fuzz: arbitrary binary bodies — including ones packed
    with '\\r\\n' and '\\r\\n\\r\\n' runs — survive encode->parse intact in
    multi-record payloads."""
    import random

    from hash_db_spark.sources import warc

    rng = random.Random(42)
    chunks = [b"\r\n", b"\r\n\r\n", b"a", b"xyz", b"\x00\xff", b"WARC/1.0", b" "]
    for trial in range(25):
        bodies = [
            b"".join(rng.choice(chunks) for _ in range(rng.randrange(0, 40)))
            for _ in range(rng.randrange(1, 4))
        ]
        payload = b""
        for i, body in enumerate(bodies):
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: x/y\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            payload += warc._record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", f"https://t/{trial}/{i}"),
                ],
                http,
            )
        recs = warc.warc_parse(payload)
        assert [r["body"] for r in recs] == bodies, trial


def test_warc_gz_members_parse_identically():
    """Gzip-membered payloads (request/response as separate members)
    parse to exactly the plain parse; corrupted members raise."""
    import gzip

    import pytest

    from hash_db_spark.sources import warc

    for d in (0, 7, 13, 17, 42, 221):
        assert warc.warc_parse(warc.warc_encode_gz(d)) == warc.warc_parse(
            warc.warc_encode(d)
        )
    # many captures concatenated into one gz stream of 2N members
    multi = b"".join(warc.warc_encode_gz(d) for d in (3, 4, 5))
    assert [r["url"] for r in warc.warc_parse(multi)] == [
        warc.synth_url_py(d) for d in (3, 4, 5)
    ]
    # truncated member -> ValueError (not a silent partial parse)
    broken = warc.warc_encode_gz(9)[:-7]
    with pytest.raises(ValueError):
        warc.warc_parse(broken)
    # gzip magic with garbage payload
    with pytest.raises(ValueError):
        warc.warc_parse(b"\x1f\x8bgarbage")
    # a plain payload whose BODY contains gzip magic must NOT trigger
    # decompression: framing comes first, magic only sniffed at offset 0
    body = b"\x1f\x8b not actually gzip \r\n\r\n tail"
    payload = warc._record(
        [
            ("WARC-Type", "response"),
            ("WARC-Target-URI", "https://x.example/z"),
        ],
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body,
    )
    (rec,) = warc.warc_parse(payload)
    assert rec["body"] == body


def test_xml_roundtrip_lossless(spark, sf_dir):
    """orders through the Spark 4 built-in XML source: every value
    (timestamps, doubles, strings) survives, column order restored."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.queries.sources_queries import q_xml_roundtrip

    orders = load_table(spark, sf_dir, "orders")
    back = q_xml_roundtrip(spark, sf_dir)
    assert back.columns == orders.columns
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )


def test_bucketed_join_serve_oracle_parity(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.sources_queries import (
        BUCKETED_JOIN_ORACLE,
        q_bucketed_join_serve,
    )

    got = sorted(tuple(r) for r in q_bucketed_join_serve(spark, sf_dir).collect())
    assert len(got) > 0
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = sorted(
        tuple(r) for r in con.execute(BUCKETED_JOIN_ORACLE).fetchall()
    )
    con.close()
    assert got == want
