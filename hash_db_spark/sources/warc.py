"""WARC (Web ARChive) ingest: the landing format of real crawls.

The reference ingests via HTTP POST of string values
(/root/reference/client.py); a crawl-scale pipeline lands WARC files
and must extract (url, status, mime, body) BEFORE any of the
curation stages (operators/web.py url ops, text dedup) can run. This
module follows the multimodal codec discipline (operators/multimodal.py
PPM/WAV/Y4M): a REAL encoder + REAL parser over deterministic synthetic
payloads, verified against a closed-form SQL oracle that never touches
a byte.

Parsing is length-framed, never delimiter-split: each WARC record
declares Content-Length for its block, and each HTTP response declares
Content-Length for its body — bodies may legally contain "\\r\\n\\r\\n",
so a naive split corrupts records (the parser test plants exactly that
body). Records of WARC-Type other than `response` (request, metadata,
warcinfo) are skipped, as a real extractor must.

At 100 TB: WARC files are gzip-membered in production; the Spark shape
stays identical (binary payloads in, one Arrow-batched parse pass,
records out) with the decompression added inside the same batch loop.
Payload bytes cross the JVM<->Python boundary exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

WARC_RECORDS_SCHEMA = (
    "media_id long, url string, status int, mime string, "
    "n_body_bytes int, body_md5 string"
)


def synth_url_py(d: int) -> str:
    """Python twin of operators.web.synth_url's closed form (the
    encoder runs driver/executor-side in plain Python)."""
    scheme = "HTTP" if d % 7 == 0 else "https"
    sub = ["", "www.", "cdn.", "blog."][d % 4]
    site = d % 23
    tld = [".com", ".org", ".io", ".co.uk"][site % 4]
    port = ":80" if (d % 11 == 0 and d % 7 == 0) else (":443" if d % 11 == 0 else "")
    slash = "/" if d % 5 == 0 else ""
    query = "?utm_campaign=promo" if d % 6 == 0 else ("?page=2" if d % 6 == 3 else "")
    frag = "#sec" if d % 9 == 0 else ""
    return f"{scheme}://{sub}site{site}{tld}{port}/a/{d % 13}{slash}{query}{frag}"


def synth_body(d: int) -> bytes:
    """Deterministic crawl body: repeat('crawl-<id>-', 20 + id % 30).
    Oracle closed form: md5(repeat('crawl-' || id || '-', 20 + id % 30))
    and length (6 + digits(id) + 1) * (20 + id % 30)."""
    return (f"crawl-{d}-" * (20 + d % 30)).encode()


def _record(headers: list[tuple[str, str]], content: bytes) -> bytes:
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    head += f"Content-Length: {len(content)}\r\n\r\n"
    return head.encode() + content + b"\r\n\r\n"


def warc_encode(doc_id: int) -> bytes:
    """One synthetic crawl capture: a `request` record (which the
    extractor must SKIP) followed by the `response` record. Status 404
    when id % 17 == 0, mime text/plain when id % 13 == 0, else
    200/text/html."""
    url = synth_url_py(doc_id)
    req_http = (
        f"GET /a/{doc_id % 13} HTTP/1.1\r\nHost: site{doc_id % 23}\r\n\r\n"
    ).encode()
    request = _record(
        [
            ("WARC-Type", "request"),
            ("WARC-Record-ID", f"<urn:uuid:req-{doc_id}>"),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http;msgtype=request"),
        ],
        req_http,
    )
    status = 404 if doc_id % 17 == 0 else 200
    reason = "Not Found" if status == 404 else "OK"
    mime = "text/plain" if doc_id % 13 == 0 else "text/html"
    body = synth_body(doc_id)
    resp_http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    response = _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:resp-{doc_id}>"),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        resp_http,
    )
    return request + response


def warc_parse(payload: bytes) -> list[dict]:
    """Length-framed WARC/1.0 parse: returns one dict per RESPONSE
    record — {url, status, mime, body}. Raises ValueError on malformed
    framing (bad magic, missing Content-Length, short content, missing
    record terminator).

    Gzip-membered input (production WARCs: each record its own gzip
    member, members concatenated) is auto-detected by magic and
    decompressed first — Python's gzip.decompress consumes ALL
    concatenated members, after which the plain length-framed parse
    applies unchanged."""
    import hashlib  # noqa: F401  (callers hash bodies)

    if payload[:2] == b"\x1f\x8b":
        import gzip

        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError) as e:  # BadGzipFile / truncated member
            raise ValueError(f"bad gzip member in WARC payload: {e}") from e

    out: list[dict] = []
    i, n = 0, len(payload)
    while i < n:
        end = payload.find(b"\r\n\r\n", i)
        if end < 0:
            raise ValueError("WARC header block not terminated")
        head = payload[i:end].decode("utf-8", "strict")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        if "content-length" not in hdrs:
            raise ValueError("WARC record missing Content-Length")
        clen = int(hdrs["content-length"])
        cstart = end + 4
        content = payload[cstart : cstart + clen]
        if len(content) != clen:
            raise ValueError("WARC record content truncated")
        if payload[cstart + clen : cstart + clen + 4] != b"\r\n\r\n":
            raise ValueError("WARC record terminator missing")
        i = cstart + clen + 4
        if hdrs.get("warc-type") != "response":
            continue
        hend = content.find(b"\r\n\r\n")
        if hend < 0:
            raise ValueError("HTTP header block not terminated")
        hlines = content[:hend].decode("utf-8", "strict").split("\r\n")
        status = int(hlines[0].split(" ")[1])
        hh = {}
        for ln in hlines[1:]:
            k, _, v = ln.partition(":")
            hh[k.strip().lower()] = v.strip()
        blen = int(hh.get("content-length", len(content) - hend - 4))
        body = content[hend + 4 : hend + 4 + blen]
        if len(body) != blen:
            raise ValueError("HTTP body truncated")
        out.append(
            {
                "url": hdrs.get("warc-target-uri", ""),
                "status": status,
                "mime": hh.get("content-type", ""),
                "body": body,
            }
        )
    return out


def warc_encode_gz(doc_id: int) -> bytes:
    """Gzip-membered twin of warc_encode: the request and response
    records each compressed as their OWN gzip member (the production
    WARC convention — members are individually seekable), members
    concatenated. mtime pinned to 0 so the bytes are deterministic."""
    import gzip

    url = synth_url_py(doc_id)
    plain = warc_encode(doc_id)
    # Split at the response record boundary: re-encode the two records
    # separately so each becomes one member.
    marker = b"WARC/1.0\r\nWARC-Type: response\r\n"
    cut = plain.find(marker)
    assert cut > 0, url
    return gzip.compress(plain[:cut], mtime=0) + gzip.compress(
        plain[cut:], mtime=0
    )


def synth_warc_media(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, kind, payload) with REAL WARC bytes per document."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "application/warc",
                    "payload": [warc_encode(int(i)) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, kind string, payload binary"
    )


def warc_records(media: DataFrame) -> DataFrame:
    """REAL parse of WARC payloads in one Arrow pass: response records
    only, body reduced to (length, md5) so record rows stay skinny —
    downstream text stages would instead decode body to a text column
    here, inside the same batch."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "url", "status", "mime", "n_body_bytes", "body_md5"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for rec in warc_parse(bytes(payload)):
                    out["media_id"].append(mid)
                    out["url"].append(rec["url"])
                    out["status"].append(rec["status"])
                    out["mime"].append(rec["mime"])
                    out["n_body_bytes"].append(len(rec["body"]))
                    out["body_md5"].append(hashlib.md5(rec["body"]).hexdigest())
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, WARC_RECORDS_SCHEMA
    )


def sql_warc_records(table: str, id_col: str) -> str:
    """Closed-form oracle: regenerates url/status/mime/body stats from
    the generative formulas without parsing a byte."""
    from hash_db_spark.operators.web import sql_synth_url

    d = id_col
    return f"""
SELECT {d} AS media_id,
       {sql_synth_url(d)} AS url,
       CAST(CASE WHEN {d} % 17 = 0 THEN 404 ELSE 200 END AS INT) AS status,
       CASE WHEN {d} % 13 = 0 THEN 'text/plain' ELSE 'text/html' END AS mime,
       CAST((7 + length(CAST({d} AS VARCHAR))) * (20 + {d} % 30) AS INT)
         AS n_body_bytes,
       md5(repeat('crawl-' || {d} || '-', 20 + {d} % 30)) AS body_md5
FROM {table}
"""


def synth_warc_media_gz(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, kind, payload) with gzip-membered WARC bytes — the
    production landing format; warc_records parses it via the same
    Arrow pass (magic-sniffed decompression inside the batch loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "application/warc+gzip",
                    "payload": [warc_encode_gz(int(i)) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, kind string, payload binary"
    )
