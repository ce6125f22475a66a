"""Convert any table of raw HTML documents into the interleaved-docs schema.

Covers the common ingestion shapes besides WARC: JSONL / CSV / Parquet with
``(doc_id, url, html)``-style columns — ``rd.read_json(...)`` etc. feed
straight into ``html_docs_to_spans`` and the extraction pipeline runs
unchanged downstream.
"""

from __future__ import annotations

import pyarrow as pa


def html_docs_to_spans(ds, *, id_column: str = "doc_id",
                       html_column: str = "html", url_column: str = "url"):
    """Dataset[(id, html, url?)] → Dataset[DOCS_SCHEMA] (one text span)."""
    from ..schema import DOCS_SCHEMA

    def convert(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        htmls = batch.column(html_column).to_pylist()
        urls = (batch.column(url_column).to_pylist()
                if url_column in batch.column_names else [""] * len(ids))
        rows = [{
            "doc_id": str(i),
            "spans": [{"kind": "text", "text": h or "", "media_ref": "",
                       "offset": 0}],
            "url": u or "",
            "family": "html",
        } for i, h, u in zip(ids, htmls, urls)]
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    return ds.map_batches(convert, batch_format="pyarrow")
