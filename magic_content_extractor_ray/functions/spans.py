"""Span ↔ document conversions.

The corpus is an interleaved-span table (BASELINE.json ``input_hint``):
``(doc_id, spans: list<struct<kind,text,media_ref,offset>>)``. Text spans
carry HTML fragments; media spans carry a ``media_ref`` URI plus alt/caption
text (reference analog: img src / data-src handling,
/root/reference/app/lib/BaseExtractor.ts:584-599).

``spans_to_html`` reassembles the document for DOM parsing;
``dom_to_spans`` flattens an extracted main-content subtree back into the
ordered span sequence that the per-row invariant is checked on
(span-sequence equality on (kind, text, media_ref, offset)).

Output-span contract (deterministic, pinned by golden fixtures):
- each media element (img/video/iframe/embed) → one media span, kind ∈
  {image, video, iframe, embed}, media_ref = resolved src, text = alt;
  the walk does not descend into media elements;
- each leaf block element (block tag whose subtree contains no block or
  media element) → one text span carrying its outer HTML; composite blocks
  (table/ul/ol/blockquote/figure/pre) stay ATOMIC — one span with their
  full outer HTML — unless they contain media, which must be threaded;
- bare text / inline runs directly under a container → one text span each;
- offsets are regenerated densely 0..n-1 in document order (never inherited
  from block/batch order).
"""

from __future__ import annotations

from ..htmlib.dom import Node, TAG, TEXT, BLOCK_TAGS, MEDIA_TAGS

_KIND_BY_TAG = {"img": "image", "video": "video", "iframe": "iframe",
                "embed": "embed"}
_TAG_BY_KIND = {"image": "img", "video": "video", "iframe": "iframe",
                "embed": "embed"}


def render_media_span(kind: str, text: str, media_ref: str) -> str:
    tag = _TAG_BY_KIND.get(kind, "img")
    alt = (text or "").replace('"', "&quot;")
    if tag == "img":
        return f'<img src="{media_ref}" alt="{alt}">'
    if tag == "embed":
        return f'<embed src="{media_ref}">'
    return f'<{tag} src="{media_ref}"></{tag}>'


def spans_to_html(spans: list[dict]) -> str:
    """Reassemble the raw document: concatenate spans in offset order; media
    spans render as their media elements."""
    parts = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        if s["kind"] == "text":
            parts.append(s["text"] or "")
        else:
            parts.append(render_media_span(s["kind"], s["text"], s["media_ref"]))
    return "".join(parts)


def _strip_unique_ids(node: Node) -> None:
    for el in [node, *[n for n in node.descendants() if n.type == TAG]]:
        el.attrs.pop("data-unique-id", None)


def dom_to_spans(main: Node, return_nodes: bool = False):
    """Flatten the extracted main-content subtree into the output span
    sequence (media threading + dense offset regeneration).

    ``return_nodes=True`` additionally returns the source Node per span
    (None for bare text runs / media spans) so downstream formatters can
    walk the already-parsed tree instead of re-parsing each span's HTML
    (functions/format.py)."""
    _strip_unique_ids(main)
    out: list[dict] = []
    nodes: list[Node | None] = []

    def emit(kind: str, text: str, media_ref: str, node=None) -> None:
        out.append({"kind": kind, "text": text, "media_ref": media_ref,
                    "offset": len(out)})
        nodes.append(node)

    ATOMIC_BLOCKS = frozenset(
        {"table", "ul", "ol", "blockquote", "figure", "pre"})

    def has_block_or_media(node: Node) -> bool:
        for d in node.descendants():
            if d.type == TAG and (d.tag in BLOCK_TAGS or d.tag in MEDIA_TAGS):
                return True
        return False

    def has_media(node: Node) -> bool:
        for d in node.descendants():
            if d.type == TAG and d.tag in MEDIA_TAGS:
                return True
        return False

    def walk(node: Node) -> None:
        for child in node.children:
            if child.type == TEXT:
                t = child.data.strip()
                if t:
                    emit("text", t, "")
            elif child.type == TAG:
                if child.tag in MEDIA_TAGS:
                    emit(_KIND_BY_TAG[child.tag],
                         child.get("alt") or "",
                         child.get("src") or child.get("data-src") or "")
                elif child.tag in BLOCK_TAGS:
                    if child.tag in ATOMIC_BLOCKS and not has_media(child):
                        emit("text", child.outer_html(), "", child)
                    elif has_block_or_media(child):
                        walk(child)
                    else:
                        emit("text", child.outer_html(), "", child)
                else:  # inline element
                    if has_block_or_media(child):
                        walk(child)
                    else:
                        t = child.outer_html()
                        if child.text().strip() or t:
                            emit("text", t, "", child)
    walk(main)
    if return_nodes:
        return out, nodes
    return out
