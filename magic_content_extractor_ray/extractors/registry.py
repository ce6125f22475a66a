"""Strategy registry, page-type classification, and the per-document
extraction entry point.

- ``detect_page_type`` replicates the reference's classifier
  (/root/reference/app/api/extract/route.ts:130-166): weixin by URL, forum by
  8 CSS feature selectors or URL keywords, else article; our engine adds a
  'pdf' platform (north-rule addition) detected by URL suffix or layout
  markers.
- ``ExtractorFactory``'s instance cache (app/lib/ExtractorFactory.ts:9-41)
  maps to one strategy instance per type built once per actor ``__init__``;
  ``register_strategy`` is the user-extension surface (the reference's closed
  factory switch, opened up).
- ``extract_document`` is the per-row function the Ray actor pool runs:
  spans-in → (cleaned spans, title, platform, metadata, metrics)-out.
  Classification runs on the parsed DOM inside the same invocation so each
  document is parsed exactly once (the reference's classify + dispatch +
  extract sequence, fused to avoid a second parse; the ``platform`` column
  is still emitted for audit).
"""

from __future__ import annotations

import re

from ..htmlib.dom import parse, Node
from ..functions import heuristics as H
from ..functions.spans import spans_to_html, dom_to_spans
from .article import ArticleStrategy
from .forum import ForumStrategy
from .weixin import WeixinStrategy
from .readability import ReadabilityPlusStrategy
from .pdf import PdfStrategy, MARKER_RE

_FORUM_FEATURE_SELECTORS = (
    ".post", ".thread", ".topic", ".forum", ".reply", ".comment-list",
    "#thread", "#forum",
)
_FORUM_URL_RE = re.compile(r"forum|bbs|thread|topic")

_FORUM_INDEX = None


def _forum_index():
    global _FORUM_INDEX
    if _FORUM_INDEX is None:
        from ..htmlib.multimatch import SelectorIndex

        _FORUM_INDEX = SelectorIndex(_FORUM_FEATURE_SELECTORS)
    return _FORUM_INDEX

_STRATEGIES: dict[str, type] = {}


def register_strategy(name: str, cls: type) -> None:
    """User-extension hook (SiteExtractor surface, app/types/extractor.ts:36-41)."""
    _STRATEGIES[name] = cls


register_strategy("article", ArticleStrategy)
register_strategy("forum", ForumStrategy)
register_strategy("weixin", WeixinStrategy)
register_strategy("readability", ReadabilityPlusStrategy)
register_strategy("pdf", PdfStrategy)


def build_strategies() -> dict[str, object]:
    """One instance per registered type (done once per actor)."""
    return {name: cls() for name, cls in _STRATEGIES.items()}


def detect_page_type(url: str, root: Node | None, spans: list[dict]) -> str:
    if url.endswith(".pdf") or any(
            s["kind"] == "text" and MARKER_RE.match(s["text"] or "")
            for s in spans[:3]):
        return "pdf"
    if "mp.weixin.qq.com" in url:
        return "weixin"
    if root is not None and _forum_index().any_match(root):
        return "forum"
    if _FORUM_URL_RE.search(url):
        return "forum"
    return "article"


def extract_document(doc_id: str, spans: list[dict], url: str,
                     strategies: dict[str, object],
                     strategy_override: str | None = None,
                     formats: tuple[str, ...] = ()) -> dict:
    """Extract one interleaved-span document. Exception-safe: errors surface
    as an ``error`` column, never poisoning the batch (SURVEY.md §4.2).

    ``formats`` ('text'/'markdown') are rendered HERE, from the span nodes
    of the just-parsed tree — the formatter stage used to re-parse every
    span's HTML downstream, which halved formats-on throughput."""
    try:
        html = spans_to_html(spans)
        if strategy_override is not None and \
                strategy_override not in strategies:
            # a typo'd override must surface in the error column, not fall
            # back to a silently different extraction path
            raise KeyError(
                f"unknown strategy_override {strategy_override!r}; "
                f"registered: {sorted(strategies)}")
        if strategy_override:
            platform = strategy_override
        else:
            platform = detect_page_type(url, None, spans)

        span_nodes = None
        if platform == "pdf":
            out_spans, result = strategies["pdf"].extract_spans(
                sorted(spans, key=lambda s: s["offset"]), url)
        elif strategy_override:
            result = strategies[platform].extract(html, url)
            out_spans, span_nodes = dom_to_spans(result.main_node,
                                                 return_nodes=True)
        else:
            # parse once: the forum feature probe (route.ts:139-154) and the
            # chosen strategy share the same pre-normalized DOM
            root = parse(H.normalize_entities(html))
            if platform == "article":
                platform = detect_page_type(url, root, spans)
            result = strategies[platform].extract_from_root(root, url)
            out_spans, span_nodes = dom_to_spans(result.main_node,
                                                 return_nodes=True)

        extra = {}
        if formats:
            from ..functions.format import spans_to_text, spans_to_markdown

            if "text" in formats:
                extra["text_out"] = spans_to_text(out_spans, span_nodes)
            if "markdown" in formats:
                extra["markdown"] = spans_to_markdown(out_spans, span_nodes)

        return {
            **extra,
            "doc_id": doc_id,
            "spans": out_spans,
            "title": result.title,
            "platform": platform,
            "strategy_used": result.strategy_used,
            "author": result.author,
            "publish_time": result.publish_time,
            "read_count": result.read_count,
            "reply_count": result.reply_count,
            "view_count": result.view_count,
            "content": result.content,
            "text_content": result.text_content,
            "text_len": len(result.text_content),
            "span_count": len(out_spans),
            "error": "",
        }
    except Exception as e:  # noqa: BLE001 - per-row error isolation
        row = {
            "doc_id": doc_id, "spans": [], "title": "", "platform": "error",
            "strategy_used": "", "author": "", "publish_time": "",
            "read_count": 0, "reply_count": 0, "view_count": 0,
            "content": "", "text_content": "", "text_len": 0,
            "span_count": 0, "error": f"{type(e).__name__}: {e}",
        }
        for f in formats:
            row[{"text": "text_out", "markdown": "markdown"}.get(f, f)] = ""
        return row
