"""Forum extraction strategy.

Re-expresses /root/reference/app/lib/extractors/ForumExtractor.ts: lower
thresholds + comments kept, emoji-image stripping, per-document sequential
unique ids (the reference's per-instance counter, ForumExtractor.ts:7,
monotonic across requests — ours restarts at 0 per document for
reproducibility, see SURVEY.md §2.4), reply/view-count extraction, and the
main-post-first thread reorganization (:245-273).
"""

from __future__ import annotations

from ..htmlib.dom import Node, TAG
from ..functions import heuristics as H
from .base import BaseStrategy, ExtractorOptions, ExtractResult

UNIQUE_ID_ATTR = "data-unique-id"

_TIME_SELECTORS = (
    'meta[property="article:published_time"]', ".post-time", ".thread-time",
    ".publish-time", ".create-time", "time[pubdate]", "[datetime]",
)
_REPLY_COUNT_SELECTORS = (
    ".reply-count", ".comment-count", ".response-count", ".post-replies")
_VIEW_COUNT_SELECTORS = (".view-count", ".views", ".hits", ".read-count")


_PRE_REMOVE = (
    "script", "style", "link", "iframe", "form",
    ".ad", ".advertisement", ".banner",
    ".user-signature", ".signature",
    ".user-info", ".author-info",
    ".post-actions", ".thread-actions",
    ".share-buttons", ".social-share",
)


class ForumStrategy(BaseStrategy):
    platform = "forum"

    def __init__(self):
        super().__init__(ExtractorOptions(
            min_text_length=50, min_score=15, include_comments=True))
        from ..htmlib.multimatch import SelectorIndex

        self._pre_index = SelectorIndex(_PRE_REMOVE)
        self._meta_index = SelectorIndex(
            _TIME_SELECTORS + _REPLY_COUNT_SELECTORS + _VIEW_COUNT_SELECTORS)

    def pre_normalize(self, html: str) -> str:
        return H.normalize_entities(html)

    def custom_selectors(self):
        """ForumExtractor.ts:20-44"""
        return (
            ".thread-content", ".post-content", ".topic-content",
            ".forum-post", ".forum-content", ".message-content",
            ".bbcode-content", ".first-post", ".main-post", ".original-post",
            ".thread-first", ".reply-content", ".comment-content",
            ".response-content", "#thread-content", "#post-content",
            '[itemprop="articleBody"]',
        )

    def pre_process(self, root: Node, url: str) -> None:
        """ForumExtractor.ts:49-96 (comments kept)."""
        matches, tag_map, _ = self._pre_index.find_all_with_tags(
            root, tags=("img",))
        for sel in _PRE_REMOVE:
            for n in matches[sel]:
                n.remove()

        for img in tag_map["img"]:
            if img.get("data-src"):
                img.set("src", img.get("data-src"))
            if img.get("data-original"):
                img.set("src", img.get("data-original"))
            src = img.get("src") or ""
            if (img.has_class("emoji") or img.has_class("smilie")
                    or "emoji" in src or "smilie" in src):
                img.remove()

        # per-document deterministic unique ids
        counter = 0
        for elem in root.find(".post, .thread, .reply, .comment"):
            if not elem.get(UNIQUE_ID_ATTR):
                counter += 1
                elem.set(UNIQUE_ID_ATTR, str(counter))

    def node_score(self, node: Node, stats: dict | None = None) -> float:
        """ForumExtractor.ts:278-310"""
        if stats is None:
            stats = H.node_stats(node)
        score = H.calculate_node_score(node, stats)
        if node.has_class("first-post") or node.has_class("main-post"):
            score += 15
        if node.has_class("reply-content") or node.has_class("comment-content"):
            score += 8
        if node.find_first(".quote, blockquote, .cited") is not None:
            score -= 5
        if node.find_first(".user-info, .author-info") is not None:
            score -= 3
        tlen = len(stats["text"].strip())
        if tlen > 100:
            score += min(tlen // 200, 8)
        return score

    def post_process_extra(self, main: Node) -> None:
        """ForumExtractor.ts:315-350 + main-post-first reorganization."""
        from ..htmlib.dom import parse_fragment

        for quote in main.find(".quote, blockquote, .cited"):
            quote.add_class("forum-quote")

        for block in main.find("pre, code"):
            inner = block.inner_html()
            if inner and "\n" in inner:
                block.children = []
                for frag in parse_fragment(inner.replace("\n", "<br>")):
                    block.append(frag)
            block.add_class("forum-code")

        for img in main.find("img"):
            container = Node(TAG, "div", {"class": "forum-image-container"})
            img.replace_with(container)
            container.append(img)
            # alt caption already emitted by the base figure/figcaption pass

        self.collapse_br_runs(main)
        self._reorganize(main)

    def _reorganize(self, main: Node) -> None:
        """Main-post-first thread rebuild (ForumExtractor.ts:221-273):
        <div class=forum-thread> main post + <div class=forum-replies> rest.
        Span offsets are regenerated after this reorder (dom_to_spans)."""
        main_post_id = self._find_main_post_id(main)
        if not main_post_id:
            return
        tagged = [n for n in main.find(f"[{UNIQUE_ID_ATTR}]")]
        main_post = next(
            (n for n in tagged if n.get(UNIQUE_ID_ATTR) == main_post_id), None)
        if main_post is None:
            return
        replies = [n for n in tagged
                   if n.get(UNIQUE_ID_ATTR) != main_post_id
                   and not any(a is main_post for a in n.ancestors())]

        thread = Node(TAG, "div", {"class": "forum-thread"})
        main_post.remove()
        thread.append(main_post)
        if replies:
            replies_box = Node(TAG, "div", {"class": "forum-replies"})
            for r in replies:
                r.remove()
                replies_box.append(r)
            thread.append(replies_box)
        main.children = []
        main.append(thread)

    def _find_main_post_id(self, main: Node) -> str:
        n = main.find_first(".first-post, .main-post, .original-post")
        if n is not None:
            return n.get(UNIQUE_ID_ATTR) or ""
        n = main.find_first('[id*="post-1"], [id*="post_1"]')
        if n is not None:
            return n.get(UNIQUE_ID_ATTR) or ""
        n = main.find_first(".post, .thread")
        if n is not None:
            return n.get(UNIQUE_ID_ATTR) or ""
        return ""

    def enrich(self, result: ExtractResult, root: Node) -> None:
        found = self._meta_index.find_first_each(root)
        result.publish_time = self.cascade_value(
            found, _TIME_SELECTORS, attr="datetime")
        result.reply_count = self._extract_reply_count(root, found)
        result.view_count = self._extract_view_count(found)

    def _extract_reply_count(self, root: Node, found: dict) -> int:
        """ForumExtractor.ts:131-153"""
        for sel in _REPLY_COUNT_SELECTORS:
            n = found.get(sel)
            if n is not None:
                c = H.parse_count(n.text().strip())
                if c is not None:
                    return c
        return len(root.find(".reply-content, .comment-content, .response-content"))

    def _extract_view_count(self, found: dict) -> int:
        """ForumExtractor.ts:158-178"""
        for sel in _VIEW_COUNT_SELECTORS:
            n = found.get(sel)
            if n is not None:
                c = H.parse_count(n.text().strip())
                if c is not None:
                    return c
        return 0
