"""WARC (Web ARChive, ISO 28500) reader/writer — the container format
web-crawl corpora actually ship in (Common Crawl is WARC end to end).

``build_warc`` packs documents into spec-shaped WARC files (one per
group): a leading ``warcinfo`` record, then one ``response`` record per
document whose block is a full HTTP/1.1 response carrying the HTML
body.  Files alternate between plain WARC and the standard ``.warc.gz``
layout where EVERY record is its own gzip member (the property that
makes WARC splittable by member scan — readers can seek to any member
boundary without decompressing the prefix).

``read_warc_records`` is the inverse: sniff gzip members, walk the
Content-Length-framed records, parse the HTTP block, and emit one row
per response record.  Composed with ``html_extract`` this is the
crawl → text pipeline (WARC framing → HTTP parse → boilerplate-dropping
extraction), and on ``wrap_html`` pages the whole chain is LOSSLESS —
the catalog entry's oracle is the original text column verbatim.

Reference note: overseer delegates all payload handling to user
handlers (doc/guide/BasicGraphsHandlers.md — handlers are arbitrary
fns); ingest-format capability is part of the pipeline surface this
engine provides natively.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_CRLF = b"\r\n"


def _warc_record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode() + _CRLF
    head += f"Content-Length: {len(block)}".encode() + _CRLF + _CRLF
    return head + block + _CRLF + _CRLF


def _gzip_member(data: bytes) -> bytes:
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip framing
    return co.compress(data) + co.flush()


def build_warc(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """One WARC file per ``group_col`` value: warcinfo + a response
    record per row, HTTP/1.1 block with Content-Type/Content-Length
    headers, deterministic WARC-Record-ID carrying the doc id.  Groups
    hashing even get the member-per-record .warc.gz layout, odd groups
    plain WARC — both read paths see traffic.  Returns
    (group, n_records, payload binary)."""

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        group = str(pdf[group_col].iloc[0])
        gz = sum(group.encode()) % 2 == 0
        records = [
            _warc_record(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Record-ID", f"<urn:overseer:warcinfo:{group}>"),
                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                    ("Content-Type", "application/warc-fields"),
                ],
                f"software: overseer-spark\r\nisPartOf: {group}\r\n".encode(),
            )
        ]
        for i, page in zip(pdf[id_col], pdf[html_col]):
            body = (page or "").encode("utf-8")
            http = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html; charset=utf-8" + _CRLF
                + f"Content-Length: {len(body)}".encode() + _CRLF + _CRLF
                + body
            )
            records.append(
                _warc_record(
                    [
                        ("WARC-Type", "response"),
                        ("WARC-Record-ID", f"<urn:overseer:doc:{int(i)}>"),
                        ("WARC-Date", "2026-01-01T00:00:00Z"),
                        (
                            "WARC-Target-URI",
                            f"https://www.example{int(i) % 20}.com/p/{int(i) % 10}",
                        ),
                        ("Content-Type", "application/http; msgtype=response"),
                    ],
                    http,
                )
            )
        payload = (
            b"".join(_gzip_member(r) for r in records)
            if gz
            else b"".join(records)
        )
        return pd.DataFrame(
            {
                "group": [group],
                "n_records": [len(records)],
                "payload": [payload],
            }
        )

    return (
        df.select(group_col, id_col, html_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema="group string, n_records int, payload binary")
    )


def _split_members(payload: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream member by member (the
    .warc.gz layout); plain payloads return as a single chunk."""
    import zlib

    if payload[:2] != b"\x1f\x8b":
        return [payload]
    out, rest = [], payload
    while rest:
        do = zlib.decompressobj(31)
        out.append(do.decompress(rest))
        if not do.eof:
            raise ValueError("truncated gzip member in WARC payload")
        rest = do.unused_data
    return out


def parse_warc(payload: bytes) -> list[dict]:
    """Walk one WARC payload (plain or member-gzipped) and return the
    records as dicts: warc headers + (for responses) parsed HTTP status,
    content type, and body text."""
    records: list[dict] = []
    for chunk in _split_members(payload):
        pos = 0
        while pos < len(chunk):
            if chunk[pos : pos + 5] != b"WARC/":
                raise ValueError("WARC version line expected")
            hdr_end = chunk.index(b"\r\n\r\n", pos)
            head_lines = chunk[pos:hdr_end].split(_CRLF)
            headers = {}
            for line in head_lines[1:]:
                k, _, v = line.decode("utf-8").partition(":")
                headers[k.strip().lower()] = v.strip()
            clen = int(headers["content-length"])
            block = chunk[hdr_end + 4 : hdr_end + 4 + clen]
            if chunk[hdr_end + 4 + clen : hdr_end + 8 + clen] != _CRLF * 2:
                raise ValueError("WARC record missing boundary CRLFs")
            pos = hdr_end + 8 + clen
            rec = {
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "target_uri": headers.get("warc-target-uri"),
            }
            if rec["warc_type"] == "response":
                http_end = block.index(b"\r\n\r\n")
                lines = block[:http_end].split(_CRLF)
                rec["http_status"] = int(lines[0].split()[1])
                hh = {}
                for line in lines[1:]:
                    k, _, v = line.decode().partition(":")
                    hh[k.strip().lower()] = v.strip()
                rec["content_type"] = hh.get("content-type", "")
                body = block[http_end + 4 :]
                want = int(hh.get("content-length", len(body)))
                if len(body) != want:
                    raise ValueError("HTTP Content-Length mismatch in WARC")
                rec["body"] = body.decode("utf-8")
            records.append(rec)
    return records


def read_warc_records(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Explode WARC payloads into one row per *response* record:
    (doc_id parsed from the record id, target_uri, http_status,
    content_type, html body).  Arrow-batched 1→N expansion; payload
    bytes never shuffle past this stage."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import re

        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [], "target_uri": [], "http_status": [],
                "content_type": [], "html": [],
            }
            for payload in pdf[payload_col]:
                for rec in parse_warc(bytes(payload)):
                    if rec["warc_type"] != "response":
                        continue
                    m = re.search(r"urn:overseer:doc:(\d+)", rec["record_id"])
                    out["doc_id"].append(int(m.group(1)) if m else -1)
                    out["target_uri"].append(rec["target_uri"])
                    out["http_status"].append(rec["http_status"])
                    out["content_type"].append(rec["content_type"])
                    out["html"].append(rec["body"])
            yield pd.DataFrame(out)

    return df.select(payload_col).mapInPandas(
        batches,
        schema=(
            "doc_id long, target_uri string, http_status int, "
            "content_type string, html string"
        ),
    )
