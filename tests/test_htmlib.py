"""Unit tests for the mini-DOM and the CSS selector subset."""

from magic_content_extractor_ray.htmlib import (
    parse, parse_fragment, body_of, find, find_first, matches, TEXT,
)

DOC = """
<html><head><title>T</title><meta property="og:title" content="OG"></head>
<body>
  <nav class="nav">menu</nav>
  <div id="main-content" class="content article">
    <h1>Heading</h1>
    <p class="intro lead">Hello <a href="#x">link</a> world</p>
    <img src="a.png" alt="pic">
    <div class="ad-banner">buy</div>
    <span></span>
    <time pubdate datetime="2024-01-01">Jan</time>
  </div>
  <div class="footer">foot</div>
</body></html>
"""


def test_parse_and_text():
    root = parse(DOC)
    body = body_of(root)
    assert body.tag == "body"
    h1 = find_first(root, "h1")
    assert h1.text() == "Heading"
    p = find_first(root, "p")
    assert p.text() == "Hello link world"
    assert p.text_len() == len("Hello link world")


def test_selectors():
    root = parse(DOC)
    assert find_first(root, "#main-content") is not None
    assert len(find(root, ".content")) == 1
    assert len(find(root, "div")) == 3
    assert find_first(root, 'meta[property="og:title"]').get("content") == "OG"
    assert find_first(root, "time[pubdate]") is not None
    assert find_first(root, '[datetime]').get("datetime") == "2024-01-01"
    assert len(find(root, '[class*="ad-"]')) == 1
    assert find_first(root, "span:empty") is not None
    assert find_first(root, "p:empty") is None
    # compound + descendant + comma list
    assert find_first(root, "div.content h1") is not None
    assert find_first(root, ".nope, .intro") is not None
    assert len(find(root, "h1, h2, h3")) == 1
    p = find_first(root, "p")
    assert matches(p, ".intro")
    assert matches(p, "p.lead")
    assert not matches(p, "div")


def test_mutation_and_serialize():
    root = parse("<div><p>a</p><p class='x'>b</p></div>")
    p = find_first(root, "p.x")
    p.remove()
    div = find_first(root, "div")
    assert div.inner_html() == "<p>a</p>"
    p2 = find_first(root, "p")
    p2.set("class", "y")
    assert '<p class="y">a</p>' == p2.outer_html()


def test_fragment_and_entities():
    nodes = parse_fragment("<b>x &amp; y</b>tail")
    assert nodes[0].text() == "x & y"
    assert nodes[1].type == TEXT and nodes[1].data == "tail"
    # serialization re-escapes
    assert nodes[0].outer_html() == "<b>x &amp; y</b>"


def test_void_and_comments():
    root = parse("<div><!-- c --><img src='z.png'><br>text</div>")
    div = find_first(root, "div")
    kinds = [n.type for n in div.children]
    assert kinds == ["comment", "tag", "tag", "text"]
    assert "<img" in div.inner_html() and "</img>" not in div.inner_html()
