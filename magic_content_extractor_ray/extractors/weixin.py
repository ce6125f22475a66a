"""Weixin (WeChat official-account article) extraction strategy.

Re-expresses /root/reference/app/lib/extractors/WeixinExtractor.ts: account
profile / QR / toolbar / reward stripping, ``data-src`` image fixing with
``data-backh`` captions, Tencent-video iframe rebuild from ``data-vidtype``,
invisible-text removal, author/time/read-count cascades, and the
``#js_content`` score boost. The reference's inline-style normalization
(``.css(...)``, WeixinExtractor.ts:113-177) is a no-op in the final output —
``style`` is not in KEEP_ATTRIBUTES and is stripped by cleanAttributes — so
it is intentionally not replicated.
"""

from __future__ import annotations

from ..htmlib.dom import Node, TAG
from ..functions import heuristics as H
from .base import BaseStrategy, ExtractorOptions, ExtractResult

_NOISE = (
    "#meta_content", "#js_tags", ".original_area_primary",
    ".wx_profile_card_inner", "section.wx_profile_msg_inner",
    "#js_pc_qr_code", ".qr_code_pc_outer", ".rich_media_tool",
    ".rich_media_area_extra",
    ".advertisement_area", ".reward_area", ".reward_qrcode_area",
    '[style*="display: none"]', '[style*="visibility: hidden"]',
)

_INVISIBLE = (
    '[style*="color: rgba(255, 255, 255, 0)"]',
)

_AUTHOR_SELECTORS = (
    "#js_name", ".rich_media_meta_nickname", ".profile_nickname",
    'meta[property="og:article:author"]',
)
_TIME_SELECTORS = (
    "#publish_time", "#post-date", ".rich_media_meta_date", ".publish_time",
    'meta[property="og:article:published_time"]',
)
_READ_COUNT_SELECTORS = ("#js_read_count", ".read_count", ".weui-page__read-count")


_PRE_REMOVE = ("script", "style", 'link[rel="stylesheet"]') + _NOISE + _INVISIBLE


class WeixinStrategy(BaseStrategy):
    platform = "weixin"

    def __init__(self):
        super().__init__(ExtractorOptions(min_text_length=100, min_score=20))
        from ..htmlib.multimatch import SelectorIndex

        self._pre_index = SelectorIndex(
            _PRE_REMOVE + ('[style*="color: rgb(255, 255, 255)"]',
                           ".video_iframe"))
        self._meta_index = SelectorIndex(
            _AUTHOR_SELECTORS + _TIME_SELECTORS + _READ_COUNT_SELECTORS)

    def can_handle(self, url: str) -> bool:
        return "mp.weixin.qq.com" in url

    def pre_normalize(self, html: str) -> str:
        return H.normalize_entities(html)

    def custom_selectors(self):
        """WeixinExtractor.ts:24-33"""
        return (
            "#js_content", ".rich_media_content", ".rich_media_area_primary",
            ".rich_media_area_primary_inner", "#content_html",
            ".article-content",
        )

    def pre_process(self, root: Node, url: str) -> None:
        """WeixinExtractor.ts:38-178"""
        matches, tag_map, comment_nodes = self._pre_index.find_all_with_tags(
            root, tags=("img",), comments=True)
        for sel in _PRE_REMOVE:
            for n in matches[sel]:
                n.remove()
        for n in comment_nodes:
            n.remove()
        # rgba-0 / opacity-0 invisible text (:157-158)
        for n in matches['[style*="color: rgb(255, 255, 255)"]']:
            style = n.get("style") or ""
            if "opacity: 0" in style:
                n.remove()

        for img in tag_map["img"]:
            data_src = img.get("data-src")
            if data_src:
                img.set("src", data_src)
                img.del_attr("data-src")
            img.del_attr("data-lazy-src")
            img.del_attr("data-fail")
            # data-backh is weixin-only caption info; alt captions are
            # emitted once by the base figure/figcaption pass
            desc = img.get("data-backh")
            if desc and not img.get("alt") and img.parent is not None:
                d = Node(TAG, "div", {"class": "weixin-img-desc"})
                d.append(Node("text", data=desc))
                img.parent.insert(img.index_in_parent() + 1, d)

        # Tencent video rebuild (:135-150)
        for video in matches[".video_iframe"]:
            vid = video.get("data-vidtype") or ""
            if vid:
                box = Node(TAG, "div", {"class": "weixin-video-container"})
                iframe = Node(TAG, "iframe", {
                    "src": f"https://v.qq.com/txp/iframe/player.html?vid={vid}",
                    "frameborder": "0", "allowfullscreen": "",
                })
                box.append(iframe)
                video.replace_with(box)

    def node_score(self, node: Node, stats: dict | None = None) -> float:
        """WeixinExtractor.ts:281-315"""
        if stats is None:
            stats = H.node_stats(node)
        score = H.calculate_node_score(node, stats)
        if node.get("id") == "js_content" or node.has_class("rich_media_content"):
            score += 20
        tlen = len(stats["text"].strip())
        if tlen > 100:
            score += min(tlen // 100, 10)
        if stats["n_img"] > 0:
            score += min(stats["n_img"] * 2, 10)
        videos = stats["n_iframe"] + len(node.find(".video_iframe"))
        if videos > 0:
            score += videos * 5
        if node.find_first(".advertisement_area, .reward_area") is not None:
            score -= 15
        return score

    def post_process_extra(self, main: Node) -> None:
        """WeixinExtractor.ts:320-356"""
        from ..htmlib.dom import parse_fragment

        for block in main.find("pre, code"):
            inner = block.inner_html()
            if inner and "\n" in inner:
                block.children = []
                for frag in parse_fragment(inner.replace("\n", "<br>")):
                    block.append(frag)
            block.add_class("weixin-code")

        for quote in main.find("blockquote"):
            quote.add_class("weixin-quote")

        for img in main.find("img"):
            container = Node(TAG, "div", {"class": "weixin-img-container"})
            img.replace_with(container)
            container.append(img)

        for iframe in main.find("iframe"):
            container = Node(TAG, "div", {"class": "weixin-video-container"})
            iframe.replace_with(container)
            container.append(iframe)

        self.collapse_br_runs(main)

    def enrich(self, result: ExtractResult, root: Node) -> None:
        found = self._meta_index.find_first_each(root)
        result.author = self.cascade_value(found, _AUTHOR_SELECTORS)
        result.publish_time = self.cascade_value(found, _TIME_SELECTORS)
        result.read_count = self._extract_read_count(found)

    def _extract_read_count(self, found: dict) -> int:
        """WeixinExtractor.ts:232-251"""
        for sel in _READ_COUNT_SELECTORS:
            n = found.get(sel)
            if n is not None:
                c = H.parse_count(n.text().strip())
                if c is not None:
                    return c
        return 0
