"""ReadabilityPlus strategy — the reference's alternate readability pipeline
(/root/reference/app/utils/readability_plus.ts:32-113), exposed as a
selectable strategy: clean → candidate scan over article/main/section/div
(valid = text ≥ min, visible content, valid links, score ≥ min) → argmax
``score_element`` → normalize. Not wired to any route in the reference; here
it is a first-class strategy (``strategy='readability'``)."""

from __future__ import annotations

from ..htmlib.dom import Node, body_of
from ..functions import heuristics as H
from .base import BaseStrategy, ExtractorOptions


class ReadabilityPlusStrategy(BaseStrategy):
    platform = "article"

    def __init__(self):
        super().__init__(ExtractorOptions(min_text_length=25, min_score=20))

    def pre_process(self, root: Node, url: str) -> None:
        for sel in ("script", "style", 'link[rel="stylesheet"]'):
            for n in root.find(sel):
                n.remove()
        for n in list(root.iter()):
            if n.type == "comment":
                n.remove()

    def extract_main_content(self, root: Node, dropped: set[int]):
        candidates = [
            n for n in root.find("article, main, section, div")
            if self._is_valid_candidate(n)
        ]
        if not candidates:
            return body_of(root), "body"
        best = max(candidates, key=H.score_element)  # first maximal wins
        return best, "readability"

    def _is_valid_candidate(self, node: Node) -> bool:
        """readability_plus.ts:70-87"""
        if node.text_len() < self.options.min_text_length:
            return False
        if not H.has_visible_content(node):
            return False
        if not H.has_valid_links(node):
            return False
        return H.score_element(node) >= self.options.min_score

    def post_process(self, main: Node) -> None:
        """ReadabilityPlus runs only normalizeContent = normalizeText +
        normalizeMedia (readability_plus.ts:110-113) — not the base
        post-process chain."""
        self.normalize_content(main)
        self.normalize_media(main)

    def normalize_media(self, main: Node) -> None:
        """normalizeMedia (app/utils/extractor.ts:135-173): lazy-img fix,
        external links get target=_blank rel=noopener, first-row td→th."""
        for img in main.find("img"):
            if not img.get("src") and img.get("data-src"):
                img.set("src", img.get("data-src"))
        for link in main.find("a"):
            href = link.get("href") or ""
            if href.startswith("http"):
                link.set("target", "_blank")
                link.set("rel", "noopener noreferrer")
        for table in main.find("table"):
            first_row = table.find_first("tr")
            if first_row is not None:
                for cell in first_row.children:
                    if cell.type == "tag" and cell.tag == "td":
                        cell.tag = "th"
