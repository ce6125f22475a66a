"""Base main-content extraction strategy.

Re-expresses the reference's ``BaseExtractor`` driver
(/root/reference/app/lib/BaseExtractor.ts:84-114) as an ordered sequence of
DOM passes over the mini-DOM. Per-document state (dropped-node set, unique-id
counters) is reset per document — the reference leaks these across requests
(BaseExtractor.ts:60,71; ForumExtractor.ts:7); our per-doc reset is the
pinned semantics (see SURVEY.md §2.4).

Documented deviations from the reference, all pinned by golden fixtures:

- ``extract_by_xpath`` implements the *intended* XPath semantics; the
  reference's ``//``→``''`` rewrite (BaseExtractor.ts:621) makes every
  expression a css-select parse error, so its stage 1 never fires.
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
    Node, parse, parse_fragment, body_of, TAG, TEXT, COMMENT, MEDIA_TAGS,
    BLOCK_TAGS,
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
    """BaseExtractor.ts:62-72 defaults."""
    min_text_length: int = 25
    retry_length: int = 250
    include_comments: bool = False
    min_score: float = 20.0


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
    lives in locals), safe to share inside one actor process."""

    platform = "article"

    def __init__(self, options: ExtractorOptions | None = None):
        self.options = options or ExtractorOptions()

    # ---- subclass hooks -------------------------------------------------
    def custom_selectors(self) -> tuple[str, ...]:
        return ()

    def pre_process(self, root: Node, url: str) -> None:
        pass

    def post_process_extra(self, main: Node) -> None:
        pass

    def node_score(self, node: Node) -> float:
        return H.calculate_node_score(node)

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
        for sel in NOISE_SELECTORS:
            for node in root.find(sel):
                if not self.should_keep_node(node):
                    self.remove_node(node, dropped)
        for node in root.find('[style*="display: none"], [style*="visibility: hidden"]'):
            node.remove()
        for node in root.find("div:empty, p:empty, span:empty"):
            node.remove()

    def should_keep_node(self, node: Node) -> bool:
        """BaseExtractor.ts:146-164"""
        if node.find_first("img, video, iframe") is not None:
            return True
        text = node.text().strip()
        if len(text) > self.options.min_text_length:
            link_text = "".join(a.text() for a in node.find("a")).strip()
            return (len(link_text) / len(text)) < 0.5
        return False

    def remove_node(self, node: Node, dropped: set[int]) -> None:
        """Link-density / length-gated removal (BaseExtractor.ts:362-386)."""
        if id(node) in dropped:
            return
        tlen = node.text_len()
        link_len = H.first_link_text_len(node)
        link_density = (link_len / tlen) if tlen else 0.0
        if link_density > 0.5 or tlen < self.options.min_text_length:
            node.remove()
            dropped.add(id(node))

    def clean_empty_nodes(self, root: Node) -> None:
        for node in list(root.iter_elements()):
            if node.tag in ("html", "body", "head", "#root", "title", "meta",
                            "link", "base", "br", "hr") or node.tag in MEDIA_TAGS:
                continue
            if any(a.tag == "head" for a in node.ancestors()):
                continue
            if not node.text().strip() and node.find_first("img, video, iframe") is None:
                node.remove()

    def normalize_content(self, root: Node) -> None:
        """Whitespace collapse + adjacent-text-node merge
        (BaseExtractor.ts:179-204, corrected merge)."""
        for node in root.iter():
            if node.type == TEXT:
                node.data = H.collapse_ws(node.data).strip()
        for node in list(root.iter_elements()):
            merged: list[Node] = []
            for child in node.children:
                if (merged and child.type == TEXT and merged[-1].type == TEXT):
                    merged[-1].data = f"{merged[-1].data} {child.data}".strip()
                else:
                    merged.append(child)
            if len(merged) != len(node.children):
                node.children = merged

    # ---- main-content cascade (BaseExtractor.ts:210-242) ----------------
    def extract_main_content(self, root: Node, dropped: set[int]) -> tuple[Node, str]:
        n = self.extract_by_xpath(root)
        if n is not None:
            return n, "xpath"
        for sel in self.custom_selectors():
            el = root.find_first(sel)
            if el is not None and self.is_valid_content(el):
                return el, "custom"
        for sel in CONTENT_SELECTORS:
            el = root.find_first(sel)
            if el is not None and self.is_valid_content(el):
                return el, "content"
        best = self.find_best_node(root, dropped)
        if best is not None:
            return best, "heuristic"
        return body_of(root), "body"

    def extract_by_xpath(self, root: Node) -> Node | None:
        for sel in XPATH_SELECTORS:
            el = root.find_first(sel)
            if el is not None and self.is_valid_content(el):
                return el
        return None

    def is_valid_content(self, node: Node) -> bool:
        """BaseExtractor.ts:326-360"""
        if node.type != TAG or not node.tag:
            return False
        if node.tag in _EXCLUDE_MAIN_TAGS:
            return False
        if self.node_score(node) < self.options.min_score:
            return False
        tlen = node.text_len()
        if tlen < self.options.min_text_length:
            return False
        if (H.first_link_text_len(node) / tlen) > 0.5:
            return False
        return True

    def find_best_node(self, root: Node, dropped: set[int]) -> Node | None:
        """Argmax of calculate_content_score over candidate containers
        (BaseExtractor.ts:639-664)."""
        best: Node | None = None
        best_score = -1.0
        for node in root.find("div, article, section, main"):
            if id(node) in dropped:
                continue
            score = H.calculate_content_score(node, self.node_score(node))
            if score > best_score:
                best_score = score
                best = node
        if best is not None and self.is_valid_content(best):
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
        self.process_special_tags(main)
        self.process_math(main)
        self.process_quotes_and_notes(main)

    def clean_attributes(self, node: Node) -> None:
        for el in [node, *[n for n in node.descendants() if n.type == TAG]]:
            if el.attrs:
                el.attrs = {k: v for k, v in el.attrs.items()
                            if k.lower() in H.KEEP_ATTRIBUTES}

    def process_special_tags(self, main: Node) -> None:
        """Tables, code blocks, lazy images (BaseExtractor.ts:547-600)."""
        for table in main.find("table"):
            first_row = table.find_first("tr")
            if first_row is not None:
                for cell in list(first_row.children):
                    if cell.type == TAG and cell.tag == "td":
                        cell.tag = "th"
            wrapper = Node(TAG, "div", {"class": "table-responsive"})
            table.replace_with(wrapper)
            wrapper.append(table)
            table.add_class("content-table")

        for code in main.find("pre, code"):
            inner = code.inner_html()
            if inner:
                lang_cls = code.get("class") or ""
                m = _LANG_RE.search(lang_cls)
                if m:
                    code.set("data-language", m.group(1))
                new = inner.replace("\n", "<br>").replace(" ", "&nbsp;")
                if new != inner:
                    code.children = []
                    for frag in parse_fragment(new):
                        code.append(frag)
            code.add_class("content-code")

        for img in main.find("img"):
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

    def process_math(self, main: Node) -> None:
        """Math tagging + LaTeX lifting out of text nodes
        (BaseExtractor.ts:414-501; display-first regex order)."""
        for node in main.find("span.math-inline, .MathJax_Preview"):
            tex = node.text().strip()
            if tex:
                node.set("data-tex", tex)
                node.add_class("math-inline")
        for node in main.find("div.math-display, .MathJax_Display"):
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

    def process_quotes_and_notes(self, main: Node) -> None:
        """BaseExtractor.ts:506-542"""
        for quote in main.find("blockquote"):
            quote.add_class("content-quote")
            cite = quote.find_first("cite")
            if cite is not None:
                cite.add_class("quote-source")
        for note in main.find(".footnote, .reference"):
            note.add_class("content-footnote")
            for link in note.find("a"):
                href = link.get("href")
                if href and href.startswith("#"):
                    link.add_class("footnote-link")
        for note in main.find(".sidenote, .marginnote"):
            note.add_class("content-sidenote")

    # ---- shared subclass helpers ---------------------------------------
    def collapse_br_runs(self, main: Node) -> None:
        """``(\\s*<br\\s*/?>\\s*){3,}`` → ``<br><br>``
        (ArticleExtractor.ts:332 et al.)."""
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
