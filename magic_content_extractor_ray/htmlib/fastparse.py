"""Fast HTML tokenizer → Node tree (drop-in for dom._TreeBuilder).

``html.parser`` spends most of its time in per-token Python bookkeeping
(line/column tracking via ``rawdata.count('\\n')`` on every token, the
``interesting`` re-scan loop, charref chunk splitting, callback
indirection through handle_*). This scanner tokenizes with ONE compiled
alternation via anchored ``search`` and builds ``dom.Node`` objects
directly — measurably faster on article-sized documents — while
reproducing the html.parser (CPython 3.11) behaviors the extractor
semantics and the frozen golden fixtures depend on:

- tag/attribute names lowercased; attribute values entity-decoded;
  valueless attributes → ``""``; duplicate attributes keep the LAST
  occurrence (dict-comprehension semantics of dom._TreeBuilder);
- character references in text decoded (``convert_charrefs=True``),
  EXCEPT inside <script>/<style>, whose contents are rawtext up to a
  tolerant ``</[ ]*script``-style close;
- an explicit-``/>`` start tag does not push onto the stack, and a ``/``
  consumed into a bare attribute value (``<a href=x/>``) is NOT
  self-closing — exactly html.parser's attrfind-then-check order;
- comments (``--\\s*>`` close), dropped doctype/marked-section
  declarations, bogus comments (``<!foo>`` → comment node "foo"),
  dropped processing instructions;
- ``<`` not opening a recognized construct is literal text, and an
  unterminated construct at EOF is flushed as text;
- the same implicit-``</p>`` and nearest-match end-tag recovery as
  ``dom._TreeBuilder``.

Known divergences, all on pathological markup, none reachable from the
golden/corpus/realistic inputs (pinned by tests/test_fastparse.py):
tags with unbalanced quotes become text instead of a tolerant tag;
``</ name attr>`` variants may classify endtag-vs-comment differently.

Set ``MCE_SLOW_PARSE=1`` to fall back to the stdlib builder.
"""

from __future__ import annotations

import re
from html import unescape

# tolerant tag-name charset, mirroring html.parser's tagfind_tolerant
_NAME = r"[a-zA-Z][^\t\n\r\f />\x00]*"

# One alternation per construct. Possessive quantifiers (3.11+) keep the
# attr-region scan linear; quotes are excluded from the bare class so the
# region is unambiguous (unbalanced quotes simply fail the tag match).
_TOKEN_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)--\s*>"                 # comment
    r"|!(?P<decl>[^>]*)>"                        # decl / bogus comment
    r"|\?(?P<pi>[^>]*)>"                         # processing instruction
    rf"|/\s*(?P<end>{_NAME})[^>]*>"              # end tag (tolerant)
    rf"|(?P<start>{_NAME})"                      # start tag…
    r"(?P<rest>(?:\"[^\"]*+\"|'[^']*+'|[^>\"'])*+)>"
    r")",
    re.DOTALL)

# html.parser's attrfind_tolerant, verbatim (incl. the trailing
# whitespace/slash eater) — matched ANCHORED against the original string
# so the lookbehind sees the true preceding character.
_ATTR_RE = re.compile(
    r"((?<=[\'\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?(?:\s|/(?!>))*")

# the whitespace/slash run tagfind_tolerant eats after the tag name
_TAG_TRAIL = re.compile(r"(?:\s|/(?!>))*")

_RAWTEXT = ("script", "style")
# html.parser 3.11 exits CDATA mode only on a STRICT close
# (`</\s*script\s*>`); any other `</script…` stays rawtext, and with no
# strict close the rest of the document is swallowed unflushed.
_RAW_END = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
            for t in _RAWTEXT}


def _decode(text: str) -> str:
    # fast path: article text rarely carries entities after the
    # pre-normalization pass
    if "&" not in text:
        return text
    return unescape(text)


def build_tree(html: str, node_cls, tag_const: str, text_const: str,
               comment_const: str, void_tags, p_closers):
    """Tokenize ``html`` into a Node tree rooted at ``#root``.
    Parameterized on the Node class/constants to stay import-cycle-free
    with dom.py."""
    root = node_cls(tag_const, "#root")
    stack = [root]
    pos = 0
    n = len(html)
    search = _TOKEN_RE.search

    while pos < n:
        m = search(html, pos)
        if m is None:
            break
        start = m.start()
        if start > pos:
            txt = _decode(html[pos:start])
            if txt:
                stack[-1].append(node_cls(text_const, data=txt))
        pos = m.end()

        tag = m.group("start")
        if tag is not None:
            tag = tag.lower()
            # anchored attr scan over the original string (html.parser's
            # parse_starttag loop)
            k = _TAG_TRAIL.match(html, m.end("start")).end()
            end_limit = m.end("rest")
            attrs: dict = {}
            while k < end_limit:
                am = _ATTR_RE.match(html, k)
                if am is None or am.end() == k:
                    break
                name = am.group(1).lower()
                val = am.group(3)
                if val is None:
                    attrs[name] = ""
                else:
                    if val[:1] in "\"'" and val[:1] == val[-1:] and \
                            len(val) > 1:
                        val = val[1:-1]
                    attrs[name] = _decode(val)
                k = am.end()
            remainder = html[k:end_limit].strip()
            if remainder not in ("", "/"):
                # junk the attr scanner could not consume: html.parser
                # emits the whole tag as literal data
                stack[-1].append(node_cls(
                    text_const, data=html[m.start():m.end()]))
                continue
            selfclose = remainder == "/"

            if tag in p_closers and stack[-1].tag == "p":
                stack.pop()
            node = node_cls(tag_const, tag, attrs)
            stack[-1].append(node)
            if selfclose:
                continue
            if tag in void_tags:
                continue
            if tag in _RAWTEXT:
                em = _RAW_END[tag].search(html, pos)
                if em is None:
                    # no strict close: html.parser discards the rest of
                    # the document (never flushed, even at close())
                    return root
                data = html[pos:em.start()]
                pos = em.end()
                if data:
                    node.append(node_cls(text_const, data=data))
                continue
            stack.append(node)
            continue

        end = m.group("end")
        if end is not None:
            end = end.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == end:
                    del stack[i:]
                    break
            continue

        comment = m.group("comment")
        if comment is not None:
            stack[-1].append(node_cls(comment_const, data=comment))
            continue

        decl = m.group("decl")
        if decl is not None:
            low = decl[:7].lower()
            if low.startswith("doctype") or decl[:1] == "[":
                continue  # handle_decl / unknown_decl are no-ops
            # parse_bogus_comment: <!foo> → comment "foo"
            stack[-1].append(node_cls(comment_const, data=decl))
        # processing instructions: handle_pi is a no-op

    if pos < n:
        # trailing text, including an unterminated construct at EOF
        txt = _decode(html[pos:])
        if txt:
            stack[-1].append(node_cls(text_const, data=txt))
    return root
