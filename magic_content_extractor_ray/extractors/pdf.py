"""PDF / layout-parse strategy.

The north rule adds PDF & layout parsing on top of the reference's HTML-only
scope (BASELINE.json ``north_rule``; the reference has no PDF path). Offline
constraints: no PDF decode library is available in this container, so the
*decode* step (PDF binary → layout blocks) is a clearly-marked stub
(``stages/multimodal.py``), while this strategy implements the *layout
parse* over the span structure itself — which is the part that exercises the
distributed pipeline:

- input spans carry layout markers ``⟦p=<page>;y=<y>;x=<x>;c=<col>⟧`` as a
  text prefix (the deterministic corpus generator stands in for a decoder),
- repeated page headers / footers (same text on ≥2 distinct pages in the
  top / bottom page bands) are dropped — the PDF analog of boilerplate
  stripping,
- blocks are re-threaded into reading order (page, column, y, x), which is
  deliberately different from raw stream order in the fixtures,
- media spans (figures) are threaded at their layout position,
- the first text block in reading order is the document title.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .base import ExtractResult

MARKER_RE = re.compile(r"^⟦p=(\d+);y=(\d+);x=(\d+);c=(\d+)⟧")

# page bands (pt) treated as running header/footer zones on a 792pt page
_HEADER_Y = 72
_FOOTER_Y = 720


@dataclass
class _Block:
    page: int
    y: int
    x: int
    col: int
    kind: str
    text: str
    media_ref: str
    order: int  # raw stream order (tie-break)


def _parse_block(kind: str, text: str, media_ref: str, order: int) -> _Block:
    m = MARKER_RE.match(text)
    if m:
        page, y, x, col = (int(g) for g in m.groups())
        body = text[m.end():]
    else:
        page, y, x, col, body = 0, order, 0, 0, text
    return _Block(page, y, x, col, kind, body, media_ref, order)


class PdfStrategy:
    """Layout parse over span structure; no DOM involved."""

    platform = "pdf"

    def extract_spans(self, spans: list[dict], url: str) -> tuple[list[dict], ExtractResult]:
        blocks = [
            _parse_block(s["kind"], s["text"] or "", s["media_ref"] or "", i)
            for i, s in enumerate(sorted(spans, key=lambda s: s["offset"]))
        ]

        # header/footer removal: identical text in header/footer bands on >=2 pages
        band_texts: dict[str, set[int]] = {}
        for b in blocks:
            if b.kind == "text" and (b.y <= _HEADER_Y or b.y >= _FOOTER_Y):
                band_texts.setdefault(b.text.strip(), set()).add(b.page)
        repeated = {t for t, pages in band_texts.items() if len(pages) >= 2 and t}
        blocks = [
            b for b in blocks
            if not (b.kind == "text"
                    and (b.y <= _HEADER_Y or b.y >= _FOOTER_Y)
                    and b.text.strip() in repeated)
        ]

        # reading order: page, column, y, x, raw order
        blocks.sort(key=lambda b: (b.page, b.col, b.y, b.x, b.order))

        out_spans = [
            {"kind": b.kind, "text": b.text, "media_ref": b.media_ref,
             "offset": i}
            for i, b in enumerate(blocks)
        ]
        title = next((b.text for b in blocks if b.kind == "text" and b.text.strip()), "")
        result = ExtractResult(
            title=title.strip(),
            content="",
            text_content="\n".join(b.text for b in blocks if b.kind == "text"),
            url=url,
            platform="pdf",
            strategy_used="layout",
        )
        return out_spans, result
