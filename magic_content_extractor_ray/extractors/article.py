"""Article extraction strategy.

Re-expresses /root/reference/app/lib/extractors/ArticleExtractor.ts as a
``BaseStrategy`` subclass: tightened thresholds, custom selectors,
pre-process cleanup, author/publish-time cascades, score boosts, and the
article-specific post-process (code <br>, image containers, heading-level
flattening, empty-p removal, <br>-run collapse).
"""

from __future__ import annotations

from ..htmlib.dom import Node, TAG
from ..functions import heuristics as H
from .base import BaseStrategy, ExtractorOptions, ExtractResult


_AUTHOR_SELECTORS = (
    'meta[name="author"]', 'meta[property="article:author"]',
    ".author-name", ".author", ".byline", ".writer", '[rel="author"]',
)

_TIME_SELECTORS = (
    'meta[property="article:published_time"]', 'meta[name="publishdate"]',
    "time[pubdate]", ".publish-time", ".post-time", ".entry-date",
    ".post-date", "[datetime]",
)


_PRE_REMOVE = (
    "script", "style", 'link[rel="stylesheet"]',
    "header", "footer", "nav", "aside",
    ".comment-list", ".related-posts", ".share-buttons",
    ".advertisement", ".ad", ".banner",
    ".author-info", ".article-meta",
)


class ArticleStrategy(BaseStrategy):
    platform = "article"

    def __init__(self):
        super().__init__(ExtractorOptions(min_text_length=150, min_score=25))
        from ..htmlib.multimatch import SelectorIndex

        self._pre_index = SelectorIndex(_PRE_REMOVE)
        self._meta_index = SelectorIndex(_AUTHOR_SELECTORS + _TIME_SELECTORS)

    def pre_normalize(self, html: str) -> str:
        return H.normalize_entities(html)

    def custom_selectors(self):
        """ArticleExtractor.ts:16-42"""
        return (
            "article", ".article", ".post-content", ".entry-content",
            ".article-content", ".article-body", ".post-body", ".content-main",
            ".blog-post", ".blog-entry", ".blog-content",
            "#article-content", "#post-content", "#content-main",
            '[itemprop="articleBody"]', '[property="og:description"]',
            ".rich_media_content", ".rich-content",
        )

    def pre_process(self, root: Node, url: str) -> None:
        """ArticleExtractor.ts:47-96 + handleSpecialSites (:191-217).
        One walk resolves removals + comments + the img/video/a rewrites."""
        matches, tag_map, comment_nodes = self._pre_index.find_all_with_tags(
            root, tags=("img", "video", "a"), comments=True)
        for sel in _PRE_REMOVE:
            for n in matches[sel]:
                n.remove()
        for n in comment_nodes:
            n.remove()

        for img in tag_map["img"]:
            if img.get("data-src"):
                img.set("src", img.get("data-src"))
            if img.get("data-original"):
                img.set("src", img.get("data-original"))
            # NOTE: the reference's (dead-code) preProcess would add an
            # alt-text figcaption here (ArticleExtractor.ts:72-76) on top of
            # the base figure/figcaption (BaseExtractor.ts:592-596) — one
            # caption per image is emitted, by the base pass only.

        for video in tag_map["video"]:
            if video.get("data-src"):
                video.set("src", video.get("data-src"))

        for link in tag_map["a"]:
            href = link.get("href") or ""
            if "javascript:" in href or "ads" in href or href == "#":
                link.del_attr("href")

        self._handle_special_sites(root, url)

    def _handle_special_sites(self, root: Node, url: str) -> None:
        site_rules = {
            "blog.csdn.net": ("#content_views .pre-numbering", ".article-copyright"),
            "jianshu.com": (".collapse-tips", ".support-author"),
            "zhihu.com": (".ContentItem-actions", ".Reward"),
            "mp.weixin.qq.com": ("#js_pc_qr_code", ".qr_code_pc_outer"),
        }
        for site, sels in site_rules.items():
            if site in url:
                for sel in sels:
                    for n in root.find(sel):
                        n.remove()

    def node_score(self, node: Node, stats: dict | None = None) -> float:
        """ArticleExtractor.ts:222-267"""
        if stats is None:
            stats = H.node_stats(node)
        score = H.calculate_node_score(node, stats)
        if node.tag == "article" or node.has_class("article"):
            score += 15
        tlen = len(stats["text"].strip())
        if tlen > 100:
            score += min(tlen // 100, 10)
        if stats["n_img"] > 0:
            score += min(stats["n_img"] * 2, 10)
        if stats["n_heading"] > 0:
            score += stats["n_heading"] * 4
        if stats["n_p"] > 0:
            score += min(stats["n_p"], 5)
        if node.find_first(".ad, .advertisement, .banner") is not None:
            score -= 10
        if node.find_first(".comment, .comments, #comments") is not None:
            score -= 8
        return score

    def post_process_extra(self, main: Node) -> None:
        """ArticleExtractor.ts:272-333"""
        from ..htmlib.dom import parse_fragment

        for block in main.find("pre, code"):
            inner = block.inner_html()
            if inner and "\n" in inner:
                block.children = []
                for frag in parse_fragment(inner.replace("\n", "<br>")):
                    block.append(frag)
            block.add_class("article-code")

        for quote in main.find("blockquote"):
            quote.add_class("article-quote")

        for img in main.find("img"):
            container = Node(TAG, "div", {"class": "article-image-container"})
            img.replace_with(container)
            container.append(img)
            # caption comes from the base figure/figcaption pass; the
            # reference's second alt-caption (ArticleExtractor.ts:298-303)
            # would duplicate it verbatim in every output span sequence

        # heading-level flattening (:306-319)
        last_level = 1
        for heading in main.find("h1, h2, h3, h4, h5, h6"):
            level = int(heading.tag[1])
            if level - last_level > 1:
                new_level = min(last_level + 1, 6)
                heading.tag = f"h{new_level}"
                last_level = new_level
            else:
                last_level = level

        for p in main.find("p"):
            if not p.text().strip() and p.find_first("img, video, iframe") is None:
                p.remove()

        self.collapse_br_runs(main)

    def enrich(self, result: ExtractResult, root: Node) -> None:
        found = self._meta_index.find_first_each(root)
        result.author = self.cascade_value(found, _AUTHOR_SELECTORS)
        result.publish_time = self.cascade_value(
            found, _TIME_SELECTORS, attr="datetime")
