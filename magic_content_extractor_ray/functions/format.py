"""Output formatters: extracted spans → plain text / markdown.

Re-express the reference's trailing format switch
(/root/reference/app/api/extract/route.ts:244-268):

- ``spans_to_text`` ≈ ``extractText`` (route.ts:12-72). Deviation: the
  reference's final ``.replace(/\\s+/g, ' ')`` collapses the newlines it just
  inserted, flattening every document to one line; we keep line structure
  (collapse spaces/tabs, squeeze 3+ newlines) — goldens pin this.
- ``spans_to_markdown`` ≈ ``convertToMarkdown`` (route.ts:77-125): atx
  headings, fenced code, ``~~del~~``, kept table tags, image
  ``![alt](src "title")`` rule.

Both are pure per-row functions; the pipeline runs them in a stateless
``map_batches`` stage.
"""

from __future__ import annotations

import re

from ..htmlib.dom import Node, parse_fragment, TEXT, TAG

_SPACE_RUN = re.compile(r" {2,}")  # keep tabs: table cells separate with \t
_NL_RUN = re.compile(r"\n{3,}")


def _node_text(n: Node, out: list[str]) -> None:
    if n.type == TEXT:
        out.append(n.data)
        return
    if n.type != TAG:
        return
    tag = n.tag
    if tag in ("script", "style", "link", "meta"):
        return
    if tag == "br":
        out.append("\n")
        return
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        out.append("\n\n")
        for c in n.children:
            _node_text(c, out)
        out.append("\n\n")
        return
    if tag == "li":
        out.append("• ")
        for c in n.children:
            _node_text(c, out)
        out.append("\n")
        return
    if tag in ("ul", "ol", "table"):
        out.append("\n\n")
        for c in n.children:
            _node_text(c, out)
        out.append("\n")
        return
    if tag == "tr":
        for c in n.children:
            _node_text(c, out)
        out.append("\n")
        return
    if tag in ("td", "th"):
        for c in n.children:
            _node_text(c, out)
        out.append("\t")
        return
    for c in n.children:
        _node_text(c, out)
    if tag in ("p", "div", "blockquote", "figure", "figcaption", "pre"):
        out.append("\n\n")


def spans_to_text(spans: list[dict], nodes: list | None = None) -> str:
    """``nodes`` (from ``dom_to_spans(..., return_nodes=True)``, aligned
    with the pre-sort span order) lets text spans walk the already-parsed
    subtree instead of re-parsing their HTML — the formats-on fast path."""
    out: list[str] = []
    order = sorted(range(len(spans)), key=lambda i: spans[i]["offset"])
    for i in order:
        s = spans[i]
        if s["kind"] == "text":
            t = s["text"] or ""
            if "<" not in t:  # plain-text span (e.g. pdf layout block)
                out.append(t + "\n\n")
                continue
            node = nodes[i] if nodes is not None else None
            for n in ([node] if node is not None else parse_fragment(t)):
                _node_text(n, out)
        else:
            if s["text"]:
                out.append(s["text"] + "\n")
    text = "".join(out)
    text = _SPACE_RUN.sub(" ", text)
    text = "\n".join(line.strip() for line in text.split("\n"))
    return _NL_RUN.sub("\n\n", text).strip()


# ---------------------------------------------------------------------------
# markdown
# ---------------------------------------------------------------------------

_KEEP_TABLE_TAGS = {"table", "thead", "tbody", "tr", "th", "td"}


def _md(n: Node) -> str:
    if n.type == TEXT:
        return n.data
    if n.type != TAG:
        return ""
    tag = n.tag
    inner = "".join(_md(c) for c in n.children)
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        return f"\n\n{'#' * int(tag[1])} {inner.strip()}\n\n"
    if tag == "p":
        return f"\n\n{inner.strip()}\n\n"
    if tag == "br":
        return "\n"
    if tag == "hr":
        return "\n\n---\n\n"
    if tag in ("strong", "b"):
        return f"**{inner}**"
    if tag in ("em", "i"):
        return f"*{inner}*"
    if tag in ("del", "s", "strike"):
        return f"~~{inner}~~"
    if tag == "a":
        href = n.get("href") or ""
        return f"[{inner}]({href})" if href else inner
    if tag == "img":
        alt = n.get("alt") or ""
        src = n.get("src") or ""
        title = n.get("title")
        return (f'![{alt}]({src} "{title}")' if title else f"![{alt}]({src})")
    if tag == "pre":
        lang = n.get("data-language") or ""
        code = n.text().replace("\xa0", " ")
        return f"\n\n```{lang}\n{code}\n```\n\n"
    if tag == "code":
        if n.parent is not None and n.parent.tag == "pre":
            return inner
        return f"`{n.text()}`"
    if tag == "cite":
        return f" — {inner}"
    if tag == "blockquote":
        quoted = "\n".join(
            f"> {line}" for line in inner.strip().split("\n"))
        return f"\n\n{quoted}\n\n"
    if tag in ("ul", "ol"):
        items = []
        idx = 1
        for c in n.children:
            if c.type == TAG and c.tag == "li":
                body = "".join(_md(g) for g in c.children).strip()
                items.append(
                    f"{idx}. {body}" if tag == "ol" else f"- {body}")
                idx += 1
        return "\n\n" + "\n".join(items) + "\n\n"
    if tag in _KEEP_TABLE_TAGS:
        return n.outer_html() if tag == "table" else inner
    if tag in ("math", "semantics", "annotation"):
        return n.outer_html()
    return inner


def spans_to_markdown(spans: list[dict], nodes: list | None = None) -> str:
    parts: list[str] = []
    order = sorted(range(len(spans)), key=lambda i: spans[i]["offset"])
    for i in order:
        s = spans[i]
        if s["kind"] == "text":
            t = s["text"] or ""
            if "<" not in t:  # plain-text span (e.g. pdf layout block)
                parts.append(f"\n\n{t}\n\n")
                continue
            node = nodes[i] if nodes is not None else None
            parts.append("".join(
                _md(n) for n in
                ([node] if node is not None else parse_fragment(t))))
        elif s["kind"] == "image":
            parts.append(f"\n\n![{s['text']}]({s['media_ref']})\n\n")
        else:
            parts.append(f"\n\n[{s['kind']}: {s['text'] or s['media_ref']}]"
                         f"({s['media_ref']})\n\n")
    text = "".join(parts)
    text = _NL_RUN.sub("\n\n", text)
    return text.strip()
