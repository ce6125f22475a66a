"""Single-document convenience API — the reference's request-level surface.

``extract_html`` mirrors what `GET /api/extract?url=…&format=…` returns
(/root/reference/app/api/extract/route.ts:168-285) minus the live fetch:
callers hand in the HTML (the corpus IS the source at scale), and get the
same JSON shape back: ``{title, content, textContent, url, metadata:{author,
publishTime, readCount, replyCount, viewCount, platform}}`` with ``content``
rendered per ``output_format`` ∈ html | text | markdown (route.ts:244-268).

This is the drop-in path for reference users; the distributed path is
``pipelines.extract_pipeline`` over the interleaved-span table.
"""

from __future__ import annotations

from .extractors.registry import build_strategies, extract_document
from .functions.format import spans_to_text, spans_to_markdown

_STRATEGIES_CACHE = None


def _strategies():
    global _STRATEGIES_CACHE
    if _STRATEGIES_CACHE is None:
        _STRATEGIES_CACHE = build_strategies()
    return _STRATEGIES_CACHE


def extract_html(html: str, url: str = "", output_format: str = "markdown",
                 strategy: str | None = None) -> dict:
    """Extract main content from one HTML document.

    Returns the reference's response shape; raises ValueError on inputs the
    reference rejects (body < 100 chars, route.ts:215-217).
    """
    if not html or len(html) < 100:
        raise ValueError("Retrieved HTML content is too short or empty")
    spans = [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    row = extract_document("api", spans, url, _strategies(),
                           strategy_override=strategy)
    if row["error"]:
        raise RuntimeError(row["error"])

    if output_format == "text":
        content = spans_to_text(row["spans"])
    elif output_format == "markdown":
        content = spans_to_markdown(row["spans"])
    else:
        content = row["content"]

    return {
        "title": row["title"],
        "content": content,
        "textContent": row["text_content"],
        "html": html,  # original input echo (ExtractResult.html, route.ts)
        "url": url,
        "metadata": {
            "author": row["author"],
            "publishTime": row["publish_time"],
            "readCount": row["read_count"],
            "replyCount": row["reply_count"],
            "viewCount": row["view_count"],
            "platform": row["platform"],
        },
    }


def extract_spans(spans: list[dict], url: str = "",
                  strategy: str | None = None) -> dict:
    """Extract one interleaved-span document (the scale-path row shape)."""
    return extract_document("api", spans, url, _strategies(),
                            strategy_override=strategy)
