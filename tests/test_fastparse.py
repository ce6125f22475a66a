"""Equivalence gate for the fast HTML tokenizer (htmlib/fastparse.py):
its tree must match the stdlib html.parser builder on every corpus
document and on a battery of tricky constructs. Trees are compared with
adjacent text nodes merged (html.parser splits data at '&'/'<' scan
boundaries; the split points are semantically invisible — `.text()`
concatenates — and differ by design)."""

import pyarrow.parquet as pq

from magic_content_extractor_ray.corpus import generate_doc
from magic_content_extractor_ray.functions import heuristics as H
from magic_content_extractor_ray.functions.spans import spans_to_html
from magic_content_extractor_ray.htmlib.dom import (
    parse_stdlib, Node, TAG, TEXT, COMMENT, VOID_TAGS, _P_CLOSERS)
from magic_content_extractor_ray.htmlib.fastparse import build_tree


def fast_parse(html):
    return build_tree(html, Node, TAG, TEXT, COMMENT, VOID_TAGS,
                      _P_CLOSERS)


def canon(n):
    if n.type == TEXT:
        return ("T", n.data)
    if n.type == COMMENT:
        return ("C", n.data)
    kids = []
    for c in n.children:
        k = canon(c)
        if k[0] == "T" and kids and kids[-1][0] == "T":
            kids[-1] = ("T", kids[-1][1] + k[1])
        else:
            kids.append(k)
    return ("E", n.tag, tuple(sorted(n.attrs.items())), tuple(kids))


def assert_same(html):
    assert canon(parse_stdlib(html)) == canon(fast_parse(html)), html[:200]


def test_corpus_equivalence():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        doc = generate_doc(d, x)
        html = H.normalize_entities(
            spans_to_html([dict(s) for s in doc["spans"]]))
        assert_same(html)


def test_construct_battery():
    cases = [
        # entities in text and attributes
        "<p title=\"a &amp; b\">x &lt; y &gt; z &#65; &hellip;</p>",
        "<p>bare & ampersand &notanentity; tail</p>",
        # rawtext elements: no tag/entity processing inside
        "<script>if (a < b && c > d) { x = '&amp;<p>'; }</script><p>t</p>",
        "<style>p > a { content: '</div>x'; }</style><p>s</p>",
        # non-strict close stays rawtext → rest of document swallowed
        # (html.parser 3.11 exits CDATA only on `</\s*script\s*>`)
        "<script>x</script foo><p>swallowed</p>",
        "<SCRIPT>Y</SCRIPT><p>case</p>",
        "<script>unterminated...",
        "<style>a</ style ><p>ws in close</p>",
        # self-closing vs bare-slash-in-value
        "<div a=b />text<br/><hr/>",
        "<a href=http://x.example/>slash-in-bare-value</a>",
        "<div/>not-self-closed-children</div>",
        # comments & declarations
        "<!-- c1 --><!DOCTYPE html><p>x</p><!-- multi\nline -->",
        "<p>a</p><!-- unbalanced",
        "<?php echo 1 ?><p>pi dropped</p>",
        # stray/unknown end tags, implicit p-close, nesting recovery
        "<p>one<p>two<div>three</div></span>four",
        "<ul><li>a<li>b</ul>",
        "<b><i>cross</b>over</i>end",
        # attribute shapes
        "<div CLASS=UPPER data-x = 'q' hidden empty=\"\" k=v>m</div>",
        "<img src='s.png' alt=caption title>",
        # malformed-but-tolerated
        "<p>text with < loose and <3 hearts</p>",
        "plain, no markup at all",
        "",
        "<div" ">",
        "<div attr='x' >ws before close</div>",
        # unicode + mixed
        "<p>中文 &amp; ümlaut — café</p>",
    ]
    for html in cases:
        assert_same(html)


def test_realistic_page_equivalence():
    html = """<!DOCTYPE html><html><head><title>T &amp; U</title>
    <meta property="og:title" content="OG &quot;T&quot;"/>
    <base href="https://site.example/a/b/">
    <script type="application/json">{"a": "<div>"}</script>
    </head><body>
    <nav class="nav-bar"><ul><li><a href="/x">X</a></ul></nav>
    <article><h1>Head</h1>
    <p>First &ldquo;para&rdquo; with <a href="rel/link">rel</a>.</p>
    <figure><img src="i.jpg" alt="cap"><figcaption>Cap</figcaption></figure>
    <div class="ad-banner">ad</div>
    <pre>  pre   spaces  </pre>
    <table><tr><td>1</td><td>2</td></tr></table>
    </article>
    <footer>© 2026</footer>
    <!-- tracking --><script>track()</script>
    </body></html>"""
    assert_same(html)


def test_fast_is_default():
    import os

    assert not os.environ.get("MCE_SLOW_PARSE"), \
        "test env must exercise the fast path"
    from magic_content_extractor_ray.htmlib import dom

    # parse() resolves to the fast tokenizer when the env var is unset
    dom._parse_impl = None
    root = dom.parse("<p>x</p>")
    assert root.children[0].tag == "p"
    assert dom._parse_impl.__name__ == "fast"


def test_property_random_html_equivalence():
    """Property test: on randomly composed HTML (tags, attrs, entities,
    comments, rawtext, malformed fragments), the fast tokenizer's tree
    equals the stdlib builder's."""
    from hypothesis import given, settings, strategies as st

    tag = st.sampled_from(["div", "p", "span", "a", "ul", "li", "img",
                           "br", "script", "style", "h1", "table"])
    attr = st.sampled_from(["", " class='x y'", ' id="k"',
                            " href=plain", ' data-a="1 &amp; 2"',
                            " hidden", " title='q&quot;z'"])
    text = st.sampled_from(["plain", "a &amp; b", "x &lt; y", "&#65;bc",
                            "loose & amp", "with < bracket", "中文",
                            "tail  space ", "&unknown; ref"])

    @st.composite
    def fragment(draw, depth=0):
        kind = draw(st.integers(0, 6 if depth < 3 else 2))
        if kind <= 1:
            return draw(text)
        if kind == 2:
            return f"<!-- {draw(text)} -->"
        if kind == 3:
            t = draw(tag)
            return f"<{t}{draw(attr)}>"          # unclosed / void
        if kind == 4:
            return f"</{draw(tag)}>"             # stray close
        t = draw(tag)
        if t in ("script", "style"):
            return f"<{t}>{draw(text)}</{t}>"
        inner = "".join(draw(st.lists(fragment(depth=depth + 1),
                                      max_size=3)))
        return f"<{t}{draw(attr)}>{inner}</{t}>"

    @given(st.lists(fragment(), max_size=8).map("".join))
    @settings(max_examples=150, deadline=None)
    def check(html):
        assert canon(parse_stdlib(html)) == canon(fast_parse(html)), html

    check()
