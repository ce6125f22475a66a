"""Title extraction cascade.

Replicates /root/reference/app/lib/extractors/TitleExtractor.ts:10-136:
meta tags → best h1-h3 by Dice similarity to <title> → <title> → class-based
selectors, then ``clean_title`` normalization.
"""

from __future__ import annotations

import re
import unicodedata

from ..htmlib.dom import Node
from .heuristics import dice_similarity

_META_SELECTORS = (
    'meta[property="og:title"]',
    'meta[name="twitter:title"]',
    'meta[name="title"]',
    'meta[property="article:title"]',
    'meta[name="application-name"]',
    'meta[property="og:site_name"]',
)

_OTHER_SELECTORS = (
    ".article-title", ".post-title", ".entry-title", ".title", "#title",
    ".article-header h1", ".post-header h1", ".entry-header h1",
    '[itemprop="headline"]', '[itemprop="name"]',
)

_SEP_RE = re.compile(r"\s*[|\-–_]\s*.+$")
_BRACKET_RE = re.compile(r"\s*[(\[{].*?[)\]}]\s*")
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def clean_title(title: str) -> str:
    """TitleExtractor.ts:122-136 — separator truncation, bracket strip, tag
    strip, unicode-class filter (\\p{L}\\p{N}\\p{P}\\p{Z} keep-set)."""
    t = _WS_RE.sub(" ", title)
    t = _SEP_RE.sub("", t)
    t = _BRACKET_RE.sub(" ", t)
    t = _TAG_RE.sub("", t)
    t = "".join(c for c in t if unicodedata.category(c)[0] in "LNPZ")
    return t.strip()


_TITLE_INDEX = None


def _title_index():
    global _TITLE_INDEX
    if _TITLE_INDEX is None:
        from ..htmlib.multimatch import SelectorIndex

        _TITLE_INDEX = SelectorIndex(
            (*_META_SELECTORS, "title", "h1", "h2", "h3", *_OTHER_SELECTORS))
    return _TITLE_INDEX


def extract_title(root: Node) -> str:
    # one walk resolves the whole cascade's candidates
    found = _title_index().find_all(root)

    # 1. meta cascade
    for sel in _META_SELECTORS:
        ms = found[sel]
        if ms:
            content = (ms[0].get("content") or "").strip()
            if content:
                return clean_title(content)

    titles = found["title"]
    page_title = titles[0].text().strip() if titles else ""

    # 2. best h1-h3 by similarity to <title>; candidate order is document
    # order (cheerio 'h1, h2, h3' returns document order, not tag order)
    h_nodes = sorted(
        (found["h1"] + found["h2"] + found["h3"]),
        key=_doc_order_key(root))
    headings = [h.text().strip() for h in h_nodes]
    headings = [h for h in headings if h]
    if headings:
        if page_title:
            # stable sort by descending similarity (ties keep document order,
            # matching V8's stable Array.sort)
            best = max(headings, key=lambda h: dice_similarity(h, page_title))
            # max() returns the first maximal element == sorted()[0]
            return clean_title(best)
        h1s = found["h1"]
        if h1s and h1s[0].text().strip():
            return clean_title(h1s[0].text().strip())
        return clean_title(headings[0])

    # 3. <title>
    if page_title:
        return clean_title(page_title)

    # 4. class-based selectors
    for sel in _OTHER_SELECTORS:
        ns = found[sel]
        if ns:
            t = ns[0].text().strip()
            if t:
                return clean_title(t)
    return ""


def _doc_order_key(root: Node):
    """Key function: document-order position (path of child indices)."""
    def key(n: Node):
        path = []
        cur = n
        while cur is not None and cur is not root:
            p = cur.parent
            if p is None:
                break
            path.append(p.children.index(cur))
            cur = p
        return tuple(reversed(path))
    return key
