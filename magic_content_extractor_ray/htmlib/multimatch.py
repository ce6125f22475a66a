"""Multi-selector matching: evaluate MANY selectors in ONE tree walk.

The extract cascade probes ~90 selectors per document (38 noise selectors,
~50 content-cascade selectors, metadata cascades). Evaluating each with its
own full-tree ``find`` walk is O(selectors × nodes) and dominated the
profile (61% of extraction time). ``SelectorIndex`` hashes single-compound
selectors by their most selective condition (class → dict, id → dict,
tag → dict) and keeps only the handful of attribute/descendant selectors on
a linear fallback path, so one document walk resolves every selector.

Match results preserve document order per selector, and processing order is
left to the caller, so reference semantics (selector-by-selector passes
with in-flight removals) are unchanged — the index only pre-computes the
candidate lists.
"""

from __future__ import annotations

from .dom import Node, TAG
from .selectors import compile_selector, _matches_seq


class SelectorIndex:
    """Compile a set of selector strings for one-walk evaluation."""

    def __init__(self, selectors):
        self.selectors = tuple(selectors)
        # hash buckets: exact class / exact id / bare tag / attr name
        self.by_class: dict[str, list] = {}
        self.by_id: dict[str, list] = {}
        self.by_tag: dict[str, list] = {}
        self.by_attr: dict[str, list] = {}  # attr-condition selectors
        self.linear: list = []  # descendant chains, pseudos, universals

        for sel in self.selectors:
            for seq in compile_selector(sel):
                last = seq[-1]
                conds = getattr(last, "conds", None)
                if len(seq) == 1 and conds is not None:
                    kinds = [c[0] for c in conds]
                    if "class" in kinds:
                        cls = next(c[1] for c in conds if c[0] == "class")
                        self.by_class.setdefault(cls, []).append((sel, seq))
                        continue
                    if "id" in kinds:
                        idv = next(c[1] for c in conds if c[0] == "id")
                        self.by_id.setdefault(idv, []).append((sel, seq))
                        continue
                    if last.tag is not None and not kinds:
                        self.by_tag.setdefault(last.tag, []).append((sel, seq))
                        continue
                    attr_kinds = [c for c in conds
                                  if c[0] in ("attr", "attr_eq",
                                              "attr_contains")]
                    if attr_kinds and len(attr_kinds) == len(conds):
                        self.by_attr.setdefault(
                            attr_kinds[0][1], []).append((sel, seq))
                        continue
                self.linear.append((sel, seq))

    def _node_candidates(self, n: Node):
        """(sel, seq) pairs that MIGHT match node n (hash prefilter).
        Returns a LIST — generator frames showed up in the extract
        profile at ~140k calls/batch. The common case (no hit on any
        bucket, no linear selectors) returns a shared empty list."""
        hits = self.by_tag.get(n.tag)
        out = list(hits) if hits else []
        attrs = n.attrs
        if attrs:
            if self.by_id:
                idv = attrs.get("id")
                if idv is not None:
                    hits = self.by_id.get(idv)
                    if hits:
                        out.extend(hits)
            if self.by_class:
                cls = attrs.get("class")
                if cls:
                    for c in cls.split():
                        hits = self.by_class.get(c)
                        if hits:
                            out.extend(hits)
            if self.by_attr:
                for a in attrs:
                    hits = self.by_attr.get(a)
                    if hits:
                        out.extend(hits)
        if self.linear:
            out.extend(self.linear)
        return out

    def find_all(self, root: Node) -> dict[str, list[Node]]:
        """One walk → {selector: [matching nodes in document order]}."""
        out: dict[str, list[Node]] = {sel: [] for sel in self.selectors}
        by_tag_get = self.by_tag.get
        by_id, by_class, by_attr = self.by_id, self.by_class, self.by_attr
        linear = self.linear
        stack = root.children[::-1]
        while stack:
            n = stack.pop()
            c = n.children
            if c:
                stack.extend(c[::-1])
            if n.type != TAG:
                continue
            # inlined _node_candidates (hot: once per element)
            cands = by_tag_get(n.tag)
            attrs = n.attrs
            if not attrs and not linear:
                if not cands:
                    continue
                extra = None
            else:
                extra = []
                if attrs:
                    if by_id:
                        idv = attrs.get("id")
                        if idv is not None:
                            hits = by_id.get(idv)
                            if hits:
                                extra.extend(hits)
                    if by_class:
                        cls = attrs.get("class")
                        if cls:
                            for cname in cls.split():
                                hits = by_class.get(cname)
                                if hits:
                                    extra.extend(hits)
                    if by_attr:
                        for a in attrs:
                            hits = by_attr.get(a)
                            if hits:
                                extra.extend(hits)
                if linear:
                    extra.extend(linear)
            for sel, seq in (cands or ()):
                if _matches_seq(n, seq):
                    lst = out[sel]
                    if not lst or lst[-1] is not n:
                        lst.append(n)
            if extra:
                for sel, seq in extra:
                    if _matches_seq(n, seq):
                        lst = out[sel]
                        if not lst or lst[-1] is not n:
                            lst.append(n)
        return out

    def find_all_with_tags(self, root: Node, tags=(), comments=False):
        """One walk → (selector matches, {tag: nodes}, comment nodes).
        Lets a pre-process pass resolve its removal selectors AND collect
        the img/video/a/comment nodes it rewrites in a single traversal."""
        out: dict[str, list[Node]] = {sel: [] for sel in self.selectors}
        tag_map: dict[str, list[Node]] = {t: [] for t in tags}
        comment_nodes: list[Node] = []
        stack = list(reversed(root.children))
        while stack:
            n = stack.pop()
            if n.children:
                stack.extend(reversed(n.children))
            if n.type != TAG:
                if comments and n.type == "comment":
                    comment_nodes.append(n)
                continue
            t = tag_map.get(n.tag)
            if t is not None:
                t.append(n)
            for sel, seq in self._node_candidates(n):
                if _matches_seq(n, seq):
                    lst = out[sel]
                    if not lst or lst[-1] is not n:
                        lst.append(n)
        return out, tag_map, comment_nodes

    def any_match(self, root: Node) -> bool:
        """True if ANY selector matches ANY node (early-exit walk)."""
        stack = list(reversed(root.children))
        while stack:
            n = stack.pop()
            if n.children:
                stack.extend(reversed(n.children))
            if n.type != TAG:
                continue
            for _sel, seq in self._node_candidates(n):
                if _matches_seq(n, seq):
                    return True
        return False

    def find_first_each(self, root: Node) -> dict[str, Node]:
        """One walk → {selector: first matching node} (absent if none)."""
        out: dict[str, Node] = {}
        remaining = len(self.selectors)
        stack = list(reversed(root.children))
        while stack and remaining:
            n = stack.pop()
            if n.children:
                stack.extend(reversed(n.children))
            if n.type != TAG:
                continue
            for sel, seq in self._node_candidates(n):
                if sel not in out and _matches_seq(n, seq):
                    out[sel] = n
                    remaining -= 1
        return out


def subtree_stats(node: Node) -> dict:
    """One walk over a candidate subtree → everything the scorers need:
    tag counts, text, first-link text, all-links text. Replaces 5-6
    separate ``find``/``text`` walks per scored node
    (calculate_node_score / calculate_content_score inputs)."""
    n_img = n_p = n_heading = n_table = n_list = n_code = n_iframe = 0
    n_video = 0
    text_parts: list[str] = []
    first_link_parts: list[str] | None = None
    link_parts: list[str] = []
    in_first_link = 0
    link_depth = 0

    stack: list = [(node, False)]
    # iterative DFS with enter/exit markers to track link scope
    while stack:
        n, leaving = stack.pop()
        if leaving:
            if n.tag == "a":
                link_depth -= 1
                if first_link_parts is not None and in_first_link:
                    in_first_link -= 1
            continue
        if n.type == "text":
            text_parts.append(n.data)
            if link_depth > 0:
                link_parts.append(n.data)
                if in_first_link:
                    first_link_parts.append(n.data)
            continue
        if n.type != TAG:
            continue
        if n is not node:
            t = n.tag
            if t == "img":
                n_img += 1
            elif t == "p":
                n_p += 1
            elif t in ("h1", "h2", "h3", "h4", "h5", "h6"):
                n_heading += 1
            elif t == "table":
                n_table += 1
            elif t in ("ul", "ol"):
                n_list += 1
            elif t in ("pre", "code"):
                n_code += 1
            elif t == "iframe":
                n_iframe += 1
            elif t == "video":
                n_video += 1
            if t == "a":
                stack.append((n, True))
                link_depth += 1
                if first_link_parts is None:
                    first_link_parts = []
                    in_first_link += 1
                elif in_first_link:
                    in_first_link += 1
        if n.children:
            for c in reversed(n.children):
                stack.append((c, False))
    return {
        "text": "".join(text_parts),
        "first_link_text": "".join(first_link_parts or ()),
        "links_text": "".join(link_parts),
        "n_img": n_img, "n_p": n_p, "n_heading": n_heading,
        "n_table": n_table, "n_list": n_list, "n_code": n_code,
        "n_iframe": n_iframe, "n_video": n_video,
    }
