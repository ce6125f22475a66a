"""Arrow schemas for the interleaved-document tables (BASELINE.json
``input_hint`` / FIXTURES.md)."""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

SPANS_TYPE = pa.list_(SPAN_STRUCT)

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", SPANS_TYPE),
    ("url", pa.string()),       # auxiliary: drives platform classification
    ("family", pa.string()),    # auxiliary: generator family tag
])

EXTRACTED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", SPANS_TYPE),
    ("title", pa.string()),
    ("platform", pa.string()),
    ("strategy_used", pa.string()),
    ("author", pa.string()),
    ("publish_time", pa.string()),
    ("read_count", pa.int64()),
    ("reply_count", pa.int64()),
    ("view_count", pa.int64()),
    ("text_len", pa.int64()),
    ("span_count", pa.int32()),
    ("error", pa.string()),
])
