"""Base main-content extraction strategy.

Re-expresses the reference's ``BaseExtractor`` driver
(/root/reference/app/lib/BaseExtractor.ts:84-114) as an ordered sequence of
DOM passes over the mini-DOM. Per-document state (dropped-node set, unique-id
counters) is reset per document — the reference leaks these across requests
(BaseExtractor.ts:60,71; ForumExtractor.ts:7); our per-doc reset is the
pinned semantics (see SURVEY.md §2.4).

Documented deviations from the reference, all pinned by golden fixtures:

- the cascade's xpath stage (``XPATH_SELECTORS``) implements the *intended*
  XPath semantics; the reference's ``//``→``''`` rewrite
  (BaseExtractor.ts:621) makes every expression a css-select parse error,
  so its stage 1 never fires.
- ``clean_empty_nodes`` treats media elements (img/video/iframe/embed) and
  <br>/<hr> as content and skips the <head> subtree; the reference's version
  (BaseExtractor.ts:166-177) removes every <img> and <meta> because
  ``$elem.find('img…')`` only sees descendants, which would break media-span
  threading and the meta-title cascade outright.
- ``normalize_content`` merges adjacent text nodes properly; the reference's
  merge (BaseExtractor.ts:192-203) removes an unrelated ``:contains`` match.
- math lifting runs display-math before inline-math so ``$$…$$`` is not
  mangled by the inline pass (reference order: BaseExtractor.ts:454-461).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..htmlib.dom import (
    Node, parse, parse_fragment, body_of, TAG, TEXT, MEDIA_TAGS,
)
from ..functions import heuristics as H
from ..functions.title import extract_title

# Main-content selectors (app/types/extractor.ts:44-78)
CONTENT_SELECTORS = (
    "article", ".post", ".entry", ".post-text", ".post-body", ".post-content",
    ".article-text", ".article-body", ".article-content",
    '[itemprop="articleBody"]', ".entry-content", ".page-content",
    ".text-content", ".blog-post", ".blog-entry", ".blog-content",
    ".news-content", ".news-text", ".news-article", "main", "#main-content",
    ".main-content", ".content-body", ".content-text", '[role="main"]',
    '[itemprop="text"]', '[itemprop="description"]',
    '[property="og:description"]',
)

# Noise selectors (app/types/extractor.ts:81-145)
NOISE_SELECTORS = (
    ".comment", ".comments", "#comments", ".comment-list", ".comment-content",
    ".header", ".footer", ".sidebar", ".widget",
    ".navigation", ".nav", ".navbar", ".menu", ".breadcrumb",
    ".advertisement", ".ad", ".ads", ".adsense", '[id*="ad-"]',
    '[class*="ad-"]',
    ".social", ".share", ".sharing", ".social-share",
    ".related", ".recommended", ".popular", ".trending",
    ".author-info", ".author-bio", ".author-meta",
    ".meta", ".metadata", ".post-meta", ".article-meta",
    ".tags", ".categories", ".taxonomy",
    ".subscribe", ".newsletter", ".notification",
    ".copyright", ".license",
    ".modal", ".overlay", ".popup",
    '[style*="display: none"]', '[style*="visibility: hidden"]', "[hidden]",
    ".hidden",
)

# Intended semantics of the reference's CONTENT_XPATHS (BaseExtractor.ts:609-616)
XPATH_SELECTORS = (
    "article[class*='content'], article[class*='article']",
    "div[class*='content'], div[class*='article']",
    "main[class*='content'], main[class*='main']",
    "section[class*='content'], section[class*='article']",
    "div#content, div#article, div#main-content",
    "div[class*='post'], div[class*='entry']",
)

_EXCLUDE_MAIN_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "style", "script", "meta", "link"})

_BR_RUN_RE = re.compile(r"(\s*<br\s*/?>\s*){3,}")
_LANG_RE = re.compile(r"language-(\w+)")

_INLINE_MATH_RE = re.compile(r"\$([^$]+)\$")
_DISPLAY_MATH_RE = re.compile(r"\$\$([^$]+)\$\$")
_EQUATION_RE = re.compile(r"\\begin\{equation\}([\s\S]*?)\\end\{equation\}")
_ALIGN_RE = re.compile(r"\\begin\{align\}([\s\S]*?)\\end\{align\}")


@dataclass
class ExtractorOptions:
    """BaseExtractor.ts:62-72 defaults + the user-override config surface
    (ExtractorConfig shape, app/types/extractor.ts:197-270): score-weight
    tables are overridable per strategy instance."""
    min_text_length: int = 25
    retry_length: int = 250
    include_comments: bool = False
    min_score: float = 20.0
    weights: "object | None" = None  # functions.heuristics.ScoreWeights


@dataclass
class ExtractResult:
    title: str = ""
    content: str = ""           # cleaned main-content HTML
    text_content: str = ""      # plain text of the main content
    url: str = ""
    platform: str = "article"
    strategy_used: str = ""     # xpath | custom | content | heuristic | body
    author: str = ""
    publish_time: str = ""
    read_count: int = 0
    reply_count: int = 0
    view_count: int = 0
    main_node: Node | None = field(default=None, repr=False)
    doc_root: Node | None = field(default=None, repr=False)


class BaseStrategy:
    """One extraction strategy; stateless across documents (all per-doc state
    lives in locals), safe to share inside one actor process.

    ``__init__`` pre-compiles the selector tables into one-walk
    ``SelectorIndex`` structures (htmlib.multimatch) — the actor-pool warm
    state: per-document work is pure matching."""

    platform = "article"

    def __init__(self, options: ExtractorOptions | None = None):
        from ..htmlib.multimatch import SelectorIndex

        self.options = options or ExtractorOptions()
        self._noise_index = SelectorIndex(NOISE_SELECTORS)
        self._cascade_selectors = (
            [("xpath", s) for s in XPATH_SELECTORS]
            + [("custom", s) for s in self.custom_selectors()]
            + [("content", s) for s in CONTENT_SELECTORS])
        self._cascade_index = SelectorIndex(
            [s for _, s in self._cascade_selectors])
        self._post_index = SelectorIndex((
            "table", "pre, code", "img",
            "span.math-inline, .MathJax_Preview",
            "div.math-display, .MathJax_Display",
            "blockquote", ".footnote, .reference", ".sidenote, .marginnote",
        ))

    # ---- subclass hooks -------------------------------------------------
    def custom_selectors(self) -> tuple[str, ...]:
        return ()

    def pre_process(self, root: Node, url: str) -> None:
        pass

    def post_process_extra(self, main: Node) -> None:
        pass

    def node_score(self, node: Node, stats: dict | None = None) -> float:
        return H.calculate_node_score(node, stats, self.options.weights)

    def enrich(self, result: ExtractResult, root: Node) -> None:
        pass

    def pre_normalize(self, html: str) -> str:
        return html

    # ---- driver ---------------------------------------------------------
    def extract(self, html: str, url: str) -> ExtractResult:
        return self.extract_from_root(parse(self.pre_normalize(html)), url)

    def extract_from_root(self, root: Node, url: str) -> ExtractResult:
        """Entry point when the caller already parsed the (pre-normalized)
        document — the dispatch stage classifies on the same DOM, so each
        document is parsed exactly once."""
        # base-href resolution (ArticleExtractor.ts:167-169)
        base = root.find_first("base[href]")
        base_href = base.get("href") if base is not None else None
        eff_url = base_href if (base_href and base_href.startswith("http")) else url

        dropped: set[int] = set()

        self.pre_process(root, url)
        self.clean_document(root, dropped)
        title = extract_title(root)
        main, strategy_used = self.extract_main_content(root, dropped)

        result = ExtractResult(
            title=title,
            url=eff_url,
            platform=self.platform,
            strategy_used=strategy_used,
            main_node=main,
            doc_root=root,
        )
        # metadata cascades read the intact document BEFORE the main subtree
        # is rewritten — the reference reads ``this.$`` after extraction, but
        # its reorganize works on a detached fragment (ForumExtractor.ts:199),
        # so the live doc it queries still holds the count/meta elements.
        self.enrich(result, root)

        self.post_process(main)
        self.post_process_extra(main)
        result.content = main.inner_html()
        result.text_content = main.text().strip()
        return result

    # ---- cleaning passes (BaseExtractor.ts:119-204) ---------------------
    def clean_document(self, root: Node, dropped: set[int]) -> None:
        self.remove_noise_nodes(root, dropped)
        self.clean_empty_nodes(root)
        self.normalize_content(root)

    def remove_noise_nodes(self, root: Node, dropped: set[int]) -> None:
        # single walk resolves all 38 noise selectors; processing order stays
        # selector-by-selector with in-flight removals (reference semantics)
        matches = self._noise_index.find_all(root)
        for sel in NOISE_SELECTORS:
            for node in matches[sel]:
                stats = H.node_stats(node)
                if not self.should_keep_node(node, stats):
                    self.remove_node(node, dropped, stats)
        for node in root.find('[style*="display: none"], [style*="visibility: hidden"]'):
            node.remove()
        for node in root.find("div:empty, p:empty, span:empty"):
            node.remove()

    def should_keep_node(self, node: Node, stats: dict | None = None) -> bool:
        """BaseExtractor.ts:146-164"""
        if stats is None:
            stats = H.node_stats(node)
        if stats["n_img"] or stats["n_video"] or stats["n_iframe"]:
            return True
        text = stats["text"].strip()
        if len(text) > self.options.min_text_length:
            link_text = stats["links_text"].strip()
            return (len(link_text) / len(text)) < 0.5
        return False

    def remove_node(self, node: Node, dropped: set[int],
                    stats: dict | None = None) -> None:
        """Link-density / length-gated removal (BaseExtractor.ts:362-386)."""
        if id(node) in dropped:
            return
        if stats is None:
            stats = H.node_stats(node)
        tlen = len(stats["text"].strip())
        link_len = len(stats["first_link_text"].strip())
        link_density = (link_len / tlen) if tlen else 0.0
        if link_density > 0.5 or tlen < self.options.min_text_length:
            node.remove()
            dropped.add(id(node))

    _EMPTY_KEEP = frozenset(
        {"html", "body", "head", "#root", "title", "meta", "link", "base",
         "br", "hr"}) | MEDIA_TAGS

    def clean_empty_nodes(self, root: Node) -> None:
        """Remove elements with no text and no media in one post-order pass
        (content flags computed bottom-up; the reference recomputes
        ``.text()`` per element, O(n²))."""
        keep = self._EMPTY_KEEP

        def walk(node: Node, in_head: bool) -> tuple[bool, bool]:
            has_text = False
            has_media = False
            kept_children = []
            for c in node.children:
                if c.type == TEXT:
                    if not has_text and c.data.strip():
                        has_text = True
                    kept_children.append(c)
                    continue
                if c.type != TAG:
                    kept_children.append(c)
                    continue
                child_head = in_head or c.tag == "head"
                c_text, c_media = walk(c, child_head)
                if c.tag in ("img", "video", "iframe"):
                    c_media = True
                if c_text:
                    has_text = True
                if c_media:
                    has_media = True
                if (c.tag in keep or child_head or c_text or c_media):
                    kept_children.append(c)
                else:
                    c.parent = None
            if len(kept_children) != len(node.children):
                node.children = kept_children
            return has_text, has_media

        walk(root, False)

    def normalize_content(self, root: Node) -> None:
        """Whitespace collapse + adjacent-text-node merge
        (BaseExtractor.ts:179-204, corrected merge).

        Deviation (same bug family as the module docstring): the reference
        ``.trim()``s every text node, which deletes the spaces between
        inline elements and jams words together ("an inline<b>bold</b>word"
        → "an inlineboldword" in every text output). We collapse whitespace
        runs but keep single boundary spaces; goldens pin this."""
        for node in root.iter():
            if node.type == TEXT:
                node.data = H.collapse_ws(node.data)
        for node in list(root.iter_elements()):
            merged: list[Node] = []
            for child in node.children:
                if (merged and child.type == TEXT and merged[-1].type == TEXT):
                    merged[-1].data = H.collapse_ws(
                        merged[-1].data + child.data)
                else:
                    merged.append(child)
            if len(merged) != len(node.children):
                node.children = merged

    # ---- main-content cascade (BaseExtractor.ts:210-242) ----------------
    def extract_main_content(self, root: Node, dropped: set[int]) -> tuple[Node, str]:
        """5-stage cascade. A single walk resolves the first match of every
        cascade selector (xpath-intent → custom → CONTENT_SELECTORS);
        per-stage validity gating is unchanged."""
        firsts = self._cascade_index.find_first_each(root)
        seen_stats: dict[int, dict] = {}
        for stage, sel in self._cascade_selectors:
            el = firsts.get(sel)
            if el is None:
                continue
            stats = seen_stats.get(id(el))
            if stats is None:
                stats = H.node_stats(el)
                seen_stats[id(el)] = stats
            if self.is_valid_content(el, stats):
                return el, stage
        best = self.find_best_node(root, dropped)
        if best is not None:
            return best, "heuristic"
        return body_of(root), "body"

    def is_valid_content(self, node: Node, stats: dict | None = None) -> bool:
        """BaseExtractor.ts:326-360"""
        if node.type != TAG or not node.tag:
            return False
        if node.tag in _EXCLUDE_MAIN_TAGS:
            return False
        if stats is None:
            stats = H.node_stats(node)
        if self.node_score(node, stats) < self.options.min_score:
            return False
        tlen = len(stats["text"].strip())
        if tlen < self.options.min_text_length:
            return False
        if (len(stats["first_link_text"].strip()) / tlen) > 0.5:
            return False
        return True

    def find_best_node(self, root: Node, dropped: set[int]) -> Node | None:
        """Argmax of calculate_content_score over candidate containers
        (BaseExtractor.ts:639-664)."""
        best: Node | None = None
        best_stats: dict | None = None
        best_score = -1.0
        for node in root.find("div, article, section, main"):
            if id(node) in dropped:
                continue
            stats = H.node_stats(node)
            score = H.calculate_content_score(
                node, self.node_score(node, stats), stats)
            if score > best_score:
                best_score = score
                best = node
                best_stats = stats
        if best is not None and self.is_valid_content(best, best_stats):
            return best
        return None

    # ---- post-processing (BaseExtractor.ts:388-409) ---------------------
    def post_process(self, main: Node) -> None:
        self.clean_attributes(main)
        # ``*:empty`` removal (BaseExtractor.ts:396); void/media elements are
        # excluded — css-select's :empty matches <img>/<br> too, which would
        # strip every image from the output (same reference bug family as
        # clean_empty_nodes, see module docstring).
        for node in main.find("*:empty"):
            if node.tag not in MEDIA_TAGS and node.tag not in ("br", "hr"):
                node.remove()
        self.normalize_content(main)
        # one walk resolves the special/math/quote selector groups; the
        # restructuring passes never create nodes a later group matches
        # (verified against the reference pass order)
        m = self._post_index.find_all(main)
        self.process_special_tags(main, m)
        self.process_math(main, m)
        self.process_quotes_and_notes(main, m)

    def clean_attributes(self, node: Node) -> None:
        for el in [node, *[n for n in node.descendants() if n.type == TAG]]:
            if el.attrs:
                el.attrs = {k: v for k, v in el.attrs.items()
                            if k.lower() in H.KEEP_ATTRIBUTES}

    def process_special_tags(self, main: Node, m: dict) -> None:
        """Tables, code blocks, lazy images (BaseExtractor.ts:547-600)."""
        for table in m["table"]:
            first_row = table.find_first("tr")
            if first_row is not None:
                for cell in list(first_row.children):
                    if cell.type == TAG and cell.tag == "td":
                        cell.tag = "th"
            wrapper = Node(TAG, "div", {"class": "table-responsive"})
            table.replace_with(wrapper)
            wrapper.append(table)
            table.add_class("content-table")

        for code in m["pre, code"]:
            inner = code.inner_html()
            if inner:
                lang_cls = code.get("class") or ""
                lang_m = _LANG_RE.search(lang_cls)
                if lang_m:
                    code.set("data-language", lang_m.group(1))
                new = inner.replace("\n", "<br>").replace(" ", "&nbsp;")
                if new != inner:
                    code.children = []
                    for frag in parse_fragment(new):
                        code.append(frag)
            code.add_class("content-code")

        for img in m["img"]:
            data_src = img.get("data-src") or img.get("data-original")
            if data_src:
                img.set("src", data_src)
            alt = img.get("alt")
            if alt:
                fig = Node(TAG, "figure", {"class": "content-figure"})
                img.replace_with(fig)
                fig.append(img)
                cap = Node(TAG, "figcaption", {"class": "figure-caption"})
                for frag in parse_fragment(alt):
                    cap.append(frag)
                fig.append(cap)
            img.add_class("img-fluid content-image")

    def process_math(self, main: Node, m: dict) -> None:
        """Math tagging + LaTeX lifting out of text nodes
        (BaseExtractor.ts:414-501; display-first regex order)."""
        for node in m["span.math-inline, .MathJax_Preview"]:
            tex = node.text().strip()
            if tex:
                node.set("data-tex", tex)
                node.add_class("math-inline")
        for node in m["div.math-display, .MathJax_Display"]:
            tex = node.text().strip()
            if tex:
                node.set("data-tex", tex)
                node.add_class("math-display")

        for tnode in [n for n in main.descendants() if n.type == TEXT]:
            text = tnode.data
            if "$" not in text and "\\begin{" not in text:
                continue
            changed = False

            def _disp(m):
                nonlocal changed
                changed = True
                f = m.group(1)
                return (f'<div class="math-display" data-tex="{f}">$${f}$$</div>')

            def _inline(m):
                nonlocal changed
                changed = True
                f = m.group(1)
                return (f'<span class="math-inline" data-tex="{f}">${f}$</span>')

            def _eq(m):
                nonlocal changed
                changed = True
                f = m.group(1)
                return (f'<div class="math-display" data-tex="{f}">'
                        f"\\begin{{equation}}{f}\\end{{equation}}</div>")

            def _align(m):
                nonlocal changed
                changed = True
                f = m.group(1)
                return (f'<div class="math-display" data-tex="{f}">'
                        f"\\begin{{align}}{f}\\end{{align}}</div>")

            text = _DISPLAY_MATH_RE.sub(_disp, text)
            text = _INLINE_MATH_RE.sub(_inline, text)
            text = _EQUATION_RE.sub(_eq, text)
            text = _ALIGN_RE.sub(_align, text)
            if changed:
                frags = parse_fragment(text)
                if frags:
                    tnode.replace_with(frags)

    def process_quotes_and_notes(self, main: Node, m: dict) -> None:
        """BaseExtractor.ts:506-542"""
        for quote in m["blockquote"]:
            quote.add_class("content-quote")
            cite = quote.find_first("cite")
            if cite is not None:
                cite.add_class("quote-source")
        for note in m[".footnote, .reference"]:
            note.add_class("content-footnote")
            for link in note.find("a"):
                href = link.get("href")
                if href and href.startswith("#"):
                    link.add_class("footnote-link")
        for note in m[".sidenote, .marginnote"]:
            note.add_class("content-sidenote")

    # ---- shared subclass helpers ---------------------------------------
    def collapse_br_runs(self, main: Node) -> None:
        """``(\\s*<br\\s*/?>\\s*){3,}`` → ``<br><br>``
        (ArticleExtractor.ts:332 et al.). Serializing + re-parsing the whole
        subtree is only paid when a <br> run can actually exist."""
        if sum(1 for n in main.descendants()
               if n.type == TAG and n.tag == "br") < 3:
            return
        inner = main.inner_html()
        new = _BR_RUN_RE.sub("<br><br>", inner)
        if new != inner:
            main.children = []
            for frag in parse_fragment(new):
                main.append(frag)

    def first_by_selectors(self, root: Node, selectors, attr: str | None = None) -> str:
        """Selector cascade → first non-empty value; meta selectors read
        ``content``, ``[datetime]`` carriers read the attr, else text."""
        for sel in selectors:
            n = root.find_first(sel)
            if n is None:
                continue
            if sel.startswith("meta"):
                return n.get("content") or ""
            if attr and n.get(attr):
                return n.get(attr) or ""
            return n.text().strip()
        return ""

    @staticmethod
    def cascade_value(found: dict, selectors, attr: str | None = None) -> str:
        """first_by_selectors over a precomputed find_first_each() result."""
        for sel in selectors:
            n = found.get(sel)
            if n is None:
                continue
            if sel.startswith("meta"):
                return n.get("content") or ""
            if attr and n.get(attr):
                return n.get(attr) or ""
            return n.text().strip()
        return ""
