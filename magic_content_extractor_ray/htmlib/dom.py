"""Minimal HTML DOM built on stdlib ``html.parser``.

The sandbox has no lxml/bs4/selectolax, so the extraction engine parses HTML
with a small pure-Python DOM that supports exactly what the reference
extractor needs (reference parses with ``cheerio.load(html,
{normalizeWhitespace, decodeEntities})``, /root/reference/app/lib/BaseExtractor.ts:85-88):

- element / text / comment nodes with parent/children links,
- document-order traversal,
- the CSS selector subset used by the reference (see ``selectors.py``),
- serialization back to HTML.

Per-document DOM instances live only inside a ``map_batches`` UDF invocation
and never cross Ray stage boundaries — only Arrow columns do.
"""

from __future__ import annotations

from html.parser import HTMLParser
from html import escape

TAG = "tag"
TEXT = "text"
COMMENT = "comment"

# Elements that never have children (serialized without a closing tag).
VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# Elements closed implicitly when a new block opens (we generate well-formed
# corpus HTML, but be tolerant of stray <p> nesting).
_P_CLOSERS = frozenset(
    {"p", "div", "section", "article", "aside", "header", "footer", "nav",
     "main", "ul", "ol", "table", "blockquote", "pre", "h1", "h2", "h3",
     "h4", "h5", "h6", "figure"}
)

BLOCK_TAGS = frozenset(
    {"address", "article", "aside", "blockquote", "div", "dl", "dd", "dt",
     "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
     "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol", "p", "pre",
     "section", "table", "tbody", "thead", "tfoot", "tr", "td", "th", "ul"}
)

MEDIA_TAGS = frozenset({"img", "video", "iframe", "embed"})


class Node:
    """One DOM node (element, text, or comment)."""

    __slots__ = ("type", "tag", "attrs", "children", "parent", "data")

    def __init__(self, type_: str, tag: str | None = None,
                 attrs: dict[str, str] | None = None, data: str = ""):
        self.type = type_
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.data = data  # text/comment payload

    # ---- tree ops -------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def insert(self, idx: int, child: "Node") -> None:
        child.parent = self
        self.children.insert(idx, child)

    def remove(self) -> None:
        """Detach this node from its parent (no-op if already detached)."""
        p = self.parent
        if p is not None:
            try:
                p.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def replace_with(self, nodes: "list[Node] | Node") -> None:
        p = self.parent
        if p is None:
            return
        if isinstance(nodes, Node):
            nodes = [nodes]
        i = p.children.index(self)
        for n in nodes:
            n.parent = p
        p.children[i:i + 1] = nodes
        self.parent = None

    def index_in_parent(self) -> int:
        return self.parent.children.index(self) if self.parent else -1

    # ---- traversal ------------------------------------------------------
    def iter(self):
        """Document-order traversal of this subtree (self included)."""
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            if n.children:
                stack.extend(reversed(n.children))

    def iter_elements(self):
        for n in self.iter():
            if n.type == TAG:
                yield n

    def descendants(self):
        """Document-order traversal, self excluded."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            yield n
            if n.children:
                stack.extend(reversed(n.children))

    def ancestors(self):
        p = self.parent
        while p is not None:
            yield p
            p = p.parent

    def depth(self) -> int:
        """Number of ancestor elements (cheerio ``$node.parents().length``)."""
        return sum(1 for _ in self.ancestors())

    # ---- content --------------------------------------------------------
    def text(self) -> str:
        """Concatenated descendant text (cheerio ``.text()`` semantics:
        raw text node data joined with no added separators)."""
        parts: list[str] = []
        stack = [self]
        while stack:
            n = stack.pop()
            if n.type == TEXT:
                parts.append(n.data)
            elif n.children:
                stack.extend(reversed(n.children))
        return "".join(parts)

    def text_len(self) -> int:
        """len(text().strip()) — reference ``calculateTextLength``
        (/root/reference/app/utils/extractor.ts:38-41)."""
        return len(self.text().strip())

    # ---- attributes -----------------------------------------------------
    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    def set(self, name: str, value: str) -> None:
        self.attrs[name] = value

    def del_attr(self, name: str) -> None:
        self.attrs.pop(name, None)

    def classes(self) -> list[str]:
        c = self.attrs.get("class")
        return c.split() if c else []

    def has_class(self, name: str) -> bool:
        return name in self.classes()

    def add_class(self, name: str) -> None:
        cl = self.classes()
        if name not in cl:
            cl.append(name)
            self.attrs["class"] = " ".join(cl)

    # ---- selectors (implemented in selectors.py, bound lazily) ----------
    def find(self, selector: str) -> "list[Node]":
        from .selectors import find as _find
        return _find(self, selector)

    def find_first(self, selector: str) -> "Node | None":
        from .selectors import find_first as _find_first
        return _find_first(self, selector)

    def matches(self, selector: str) -> bool:
        from .selectors import matches as _matches
        return _matches(self, selector)

    # ---- serialization --------------------------------------------------
    def inner_html(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    def outer_html(self) -> str:
        return _serialize(self)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.type == TEXT:
            return f"#text({self.data[:30]!r})"
        if self.type == COMMENT:
            return "#comment"
        return f"<{self.tag} {self.attrs}>"


def _serialize(n: Node) -> str:
    if n.type == TEXT:
        return escape(n.data, quote=False)
    if n.type == COMMENT:
        return f"<!--{n.data}-->"
    attrs = "".join(
        f' {k}' if v == "" and k in ("hidden", "pubdate", "allowfullscreen")
        else f' {k}="{escape(str(v))}"'
        for k, v in n.attrs.items()
    )
    if n.tag in VOID_TAGS:
        return f"<{n.tag}{attrs}>"
    return f"<{n.tag}{attrs}>{n.inner_html()}</{n.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(TAG, "#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # implicit </p> before block-level openers
        if tag in _P_CLOSERS:
            top = self.stack[-1]
            if top.tag == "p":
                self.stack.pop()
        node = Node(TAG, tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(TAG, tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)

    def handle_endtag(self, tag):
        # close the nearest matching open tag; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node(TEXT, data=data))

    def handle_comment(self, data):
        self.stack[-1].append(Node(COMMENT, data=data))


def parse_stdlib(html: str) -> Node:
    """Reference builder on stdlib html.parser (the slow path; kept as
    the equivalence oracle for the fast tokenizer and as the
    ``MCE_SLOW_PARSE=1`` fallback)."""
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


def _pick_parse():
    import os

    if os.environ.get("MCE_SLOW_PARSE"):
        return parse_stdlib
    from .fastparse import build_tree

    def fast(html: str) -> Node:
        return build_tree(html, Node, TAG, TEXT, COMMENT, VOID_TAGS,
                          _P_CLOSERS)

    return fast


_parse_impl = None


def parse(html: str) -> Node:
    """Parse an HTML string into a DOM rooted at a synthetic ``#root``.

    If the input has no ``<html>``/``<body>`` structure the fragment's nodes
    hang directly off the root; ``body_of`` finds the effective body.
    Uses the fast tokenizer (htmlib/fastparse.py) unless
    ``MCE_SLOW_PARSE=1``; both produce equivalent trees (pinned by
    tests/test_fastparse.py).
    """
    global _parse_impl
    if _parse_impl is None:
        _parse_impl = _pick_parse()
    return _parse_impl(html)


def body_of(root: Node) -> Node:
    """Return the <body> element if present, else the root itself."""
    for n in root.iter_elements():
        if n.tag == "body":
            return n
    return root


def parse_fragment(html: str) -> list[Node]:
    """Parse an HTML fragment and return its top-level nodes (detached)."""
    root = parse(html)
    nodes = list(root.children)
    for n in nodes:
        n.parent = None
    return nodes
