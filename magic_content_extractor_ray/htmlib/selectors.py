"""CSS selector subset used by the reference extractor.

Supported grammar (audit of every selector string in
/root/reference/app/types/extractor.ts:44-194, app/lib/*, app/api/extract/route.ts):

- tag names, ``*`` universal
- ``.class``, ``#id``
- ``[attr]``, ``[attr="value"]``, ``[attr*="value"]``
- ``:empty`` pseudo-class
- compounds (``div.math-display``, ``time[pubdate]``)
- comma-separated selector lists
- descendant combinator (``.article-header h1``)

Selectors are compiled once (module-level LRU of parsed forms); extractor
actors precompile their selector tables in ``__init__`` so per-batch work is
pure matching.
"""

from __future__ import annotations

from functools import lru_cache

from .dom import Node, TAG


class _Simple:
    """One compound selector: tag + list of condition predicates."""

    __slots__ = ("tag", "conds")

    def __init__(self, tag: str | None, conds: list[tuple]):
        self.tag = tag
        self.conds = conds

    def match(self, n: Node) -> bool:
        if n.type != TAG:
            return False
        if self.tag is not None and n.tag != self.tag:
            return False
        for kind, a, b in self.conds:
            if kind == "class":
                cl = n.attrs.get("class")
                if not cl or a not in cl.split():
                    return False
            elif kind == "id":
                if n.attrs.get("id") != a:
                    return False
            elif kind == "attr":
                if a not in n.attrs:
                    return False
            elif kind == "attr_eq":
                if n.attrs.get(a) != b:
                    return False
            elif kind == "attr_contains":
                v = n.attrs.get(a)
                if v is None or b not in v:
                    return False
            elif kind == "empty":
                if n.children:
                    return False
        return True


def _parse_simple(tok: str) -> _Simple:
    tag: str | None = None
    conds: list[tuple] = []
    i, L = 0, len(tok)
    # leading tag or universal
    j = i
    while j < L and (tok[j].isalnum() or tok[j] in "-_"):
        j += 1
    if j > i:
        tag = tok[i:j].lower()
        i = j
    elif i < L and tok[i] == "*":
        i += 1
    while i < L:
        c = tok[i]
        if c == ".":
            j = i + 1
            while j < L and tok[j] not in ".#[:":
                j += 1
            conds.append(("class", tok[i + 1:j], None))
            i = j
        elif c == "#":
            j = i + 1
            while j < L and tok[j] not in ".#[:":
                j += 1
            conds.append(("id", tok[i + 1:j], None))
            i = j
        elif c == "[":
            j = tok.index("]", i)
            body = tok[i + 1:j]
            if "*=" in body:
                a, b = body.split("*=", 1)
                conds.append(("attr_contains", a.strip(), b.strip().strip('"\'')))
            elif "=" in body:
                a, b = body.split("=", 1)
                conds.append(("attr_eq", a.strip(), b.strip().strip('"\'')))
            else:
                conds.append(("attr", body.strip(), None))
            i = j + 1
        elif c == ":":
            j = i + 1
            while j < L and tok[j] not in ".#[:":
                j += 1
            pseudo = tok[i + 1:j]
            if pseudo == "empty":
                conds.append(("empty", None, None))
            # unknown pseudo-classes never match (mirrors css-select strictness
            # being irrelevant here: the reference uses only :empty on live paths)
            else:
                conds.append(("never", None, None))
            i = j
        else:  # unparseable char: treat selector as never-matching
            conds.append(("never", None, None))
            break
    if any(k == "never" for k, _, _ in conds):
        class _Never:
            tag = None

            def match(self, n):
                return False
        return _Never()  # type: ignore[return-value]
    return _Simple(tag, conds)


def _split_outside_brackets(s: str, sep_ws: bool) -> list[str]:
    """Split on commas (or whitespace when ``sep_ws``) that sit outside
    ``[...]`` attribute blocks, so values like ``[style*="display: none"]``
    stay intact."""
    out, buf, depth = [], [], 0
    for c in s:
        if c == "[":
            depth += 1
        elif c == "]":
            depth = max(0, depth - 1)
        if depth == 0 and ((c.isspace() and sep_ws) or (c == "," and not sep_ws)):
            if buf:
                out.append("".join(buf))
                buf = []
            continue
        buf.append(c)
    if buf:
        out.append("".join(buf))
    return out


@lru_cache(maxsize=4096)
def compile_selector(selector: str) -> tuple[tuple, ...]:
    """Compile to a tuple of alternatives; each alternative is a tuple of
    compound selectors joined by the descendant combinator."""
    alts = []
    for part in _split_outside_brackets(selector, sep_ws=False):
        part = part.strip()
        if not part:
            continue
        seq = tuple(_parse_simple(tok) for tok in _split_outside_brackets(part, sep_ws=True))
        if seq:
            alts.append(seq)
    return tuple(alts)


def _matches_seq(n: Node, seq: tuple) -> bool:
    if not seq[-1].match(n):
        return False
    # match remaining compounds against ancestors, right to left
    idx = len(seq) - 2
    anc = n.parent
    while idx >= 0:
        while anc is not None and not seq[idx].match(anc):
            anc = anc.parent
        if anc is None:
            return False
        anc = anc.parent
        idx -= 1
    return True


def matches(n: Node, selector: str) -> bool:
    for seq in compile_selector(selector):
        if _matches_seq(n, seq):
            return True
    return False


def find(scope: Node, selector: str) -> list[Node]:
    """All descendant elements of ``scope`` matching ``selector``, in
    document order (scope itself excluded, like cheerio ``.find``).

    Hot path: traversal is inlined (no ``descendants()`` generator
    frames) and the two dominant selector shapes — bare tag and single
    class — skip the ``match`` call entirely (text/comment nodes have
    ``tag is None`` so the tag compare doubles as the element check)."""
    alts = compile_selector(selector)
    out = []
    append = out.append
    stack = scope.children[::-1]
    if len(alts) == 1:
        seq = alts[0]
        if len(seq) == 1:
            s = seq[0]
            conds = getattr(s, "conds", None)
            if conds is not None and not conds and s.tag is not None:
                t = s.tag  # bare-tag selector
                while stack:
                    n = stack.pop()
                    if n.tag == t:
                        append(n)
                    c = n.children
                    if c:
                        stack.extend(c[::-1])
                return out
            if conds is not None and s.tag is None and len(conds) == 1 \
                    and conds[0][0] == "class":
                cls = conds[0][1]  # single-class selector
                while stack:
                    n = stack.pop()
                    if n.tag is not None:
                        cv = n.attrs.get("class")
                        if cv and cls in cv.split():
                            append(n)
                    c = n.children
                    if c:
                        stack.extend(c[::-1])
                return out
            m = s.match
            while stack:
                n = stack.pop()
                if n.type == TAG and m(n):
                    append(n)
                c = n.children
                if c:
                    stack.extend(c[::-1])
            return out
        while stack:
            n = stack.pop()
            if n.type == TAG and _matches_seq(n, seq):
                append(n)
            c = n.children
            if c:
                stack.extend(c[::-1])
        return out
    while stack:
        n = stack.pop()
        if n.type == TAG:
            # explicit loop, not any(genexpr): one generator frame per
            # node dominated the multi-alternative profile
            for seq in alts:
                if _matches_seq(n, seq):
                    append(n)
                    break
        c = n.children
        if c:
            stack.extend(c[::-1])
    return out


def find_first(scope: Node, selector: str) -> Node | None:
    alts = compile_selector(selector)
    stack = scope.children[::-1]
    if len(alts) == 1:
        seq = alts[0]
        while stack:
            n = stack.pop()
            if n.type == TAG and _matches_seq(n, seq):
                return n
            c = n.children
            if c:
                stack.extend(c[::-1])
        return None
    while stack:
        n = stack.pop()
        if n.type == TAG:
            for seq in alts:
                if _matches_seq(n, seq):
                    return n
        c = n.children
        if c:
            stack.extend(c[::-1])
    return None
