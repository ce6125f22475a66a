"""WARC source: web-archive files → the interleaved-docs table.

Real main-content extraction corpora arrive as WARC (Common-Crawl layout):
this reader turns WARC response records into rows of the engine's input
schema — ``(doc_id, spans=[one text span with the HTML], url)`` — so the
extraction pipeline runs unchanged downstream.

Ray shape: ``read_binary_files(include_paths=True)`` (one task per WARC
file; WARC files are the natural shard unit) → a stateless ``map_batches``
that splits records and filters to ``WARC-Type: response`` with an HTML
payload. Uncompressed WARC only in this offline sandbox; at scale wrap the
record split with gzip member decoding in the same UDF.

``write_warc`` is the test/fixture helper (minimal WARC/1.0 writer).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_RECORD_SEP = b"WARC/1.0\r\n"


def write_warc(path: str, records: list[dict]) -> None:
    """Minimal WARC/1.0 writer: each record = {uri, body(str), type?}."""
    with open(path, "wb") as f:
        for rec in records:
            body = rec["body"].encode("utf-8")
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    b"\r\n") + body
            headers = (
                f"WARC-Type: {rec.get('type', 'response')}\r\n"
                f"WARC-Target-URI: {rec['uri']}\r\n"
                f"WARC-Record-ID: <urn:uuid:{hashlib.md5(rec['uri'].encode()).hexdigest()}>\r\n"
                f"Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n"
            ).encode()
            f.write(_RECORD_SEP + headers + b"\r\n" + http + b"\r\n\r\n")


def _parse_warc_bytes(data: bytes, source_path: str) -> list[dict]:
    """Split one WARC file into response-record rows."""
    rows = []
    for chunk in data.split(_RECORD_SEP):
        if not chunk.strip():
            continue
        head, sep, rest = chunk.partition(b"\r\n\r\n")
        if not sep:
            continue
        headers = {}
        for line in head.split(b"\r\n"):
            k, s, v = line.partition(b":")
            if s:
                headers[k.strip().lower()] = v.strip()
        if headers.get(b"warc-type", b"") != b"response":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        # strip the HTTP envelope to reach the HTML payload
        _http_head, sep2, payload = rest.partition(b"\r\n\r\n")
        if not sep2:
            payload = rest
        html = payload.rstrip(b"\r\n").decode("utf-8", "replace")
        if not html:
            continue
        doc_id = hashlib.md5(
            (source_path + "|" + uri).encode()).hexdigest()[:16]
        rows.append({
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": html, "media_ref": "",
                       "offset": 0}],
            "url": uri,
            "family": "warc",
        })
    return rows


def read_warc(paths):
    """Dataset of interleaved-doc rows from WARC file(s)."""
    import ray.data as rd

    from ..schema import DOCS_SCHEMA

    files = rd.read_binary_files(paths, include_paths=True)

    def parse_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            if data[:2] == b"\x1f\x8b":  # .warc.gz: concatenated members
                data = _gunzip_members(data)
            rows.extend(_parse_warc_bytes(data, path))
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    return files.map_batches(parse_batch, batch_format="pyarrow")


def _gunzip_members(data: bytes) -> bytes:
    """Decode a concatenated-gzip-member stream (the standard .warc.gz
    layout: one member per record, so range readers can split files
    without decoding) into the raw WARC byte stream."""
    import zlib

    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return b"".join(out)
