"""Per-strategy extraction unit tests: title cascade, noise stripping, math
lifting, forum reorder + counts, weixin media handling, pdf layout parse,
golden span sequences for hand-checkable docs."""

from magic_content_extractor_ray.extractors.registry import (
    build_strategies, extract_document, detect_page_type)
from magic_content_extractor_ray.functions.title import extract_title, clean_title
from magic_content_extractor_ray.htmlib import parse


def _doc(html, url="https://example.com/a", doc_id="t1"):
    spans = [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    return extract_document(doc_id, spans, url, build_strategies())


LONG = ("This paragraph has a comfortable amount of informative text in it "
        "so that thresholds for article extraction are met without issues. ")


def test_title_meta_cascade():
    root = parse('<html><head><title>Page - Site</title>'
                 '<meta property="og:title" content="Real Title"></head>'
                 "<body></body></html>")
    assert extract_title(root) == "Real Title"


def test_title_heading_similarity():
    root = parse("<html><head><title>Big News Today - SomeSite</title></head>"
                 "<body><h2>unrelated words entirely</h2>"
                 "<h1>Big News Today</h1></body></html>")
    assert extract_title(root) == "Big News Today"


def test_clean_title_rules():
    assert clean_title("Hello World | Site") == "Hello World"
    assert clean_title("A (note) B") == "A B"
    assert clean_title("T <b>x</b>") == "T x"


def test_noise_stripped_and_content_selected():
    html = (f'<html><head><title>T1</title></head><body>'
            f'<nav class="nav"><a href="/1">l1</a><a href="/2">l2</a></nav>'
            f'<div class="sidebar">short sidebar text</div>'
            f'<article class="entry-content"><h1>T1</h1><p>{LONG * 3}</p></article>'
            f'<div class="footer">foot</div></body></html>')
    row = _doc(html)
    assert row["error"] == ""
    assert row["platform"] == "article"
    joined = " ".join(s["text"] for s in row["spans"])
    assert "sidebar" not in joined
    assert "l1" not in joined
    assert "comfortable amount" in joined


def test_offsets_dense():
    html = (f'<html><head><title>T</title></head><body>'
            f'<article class="post-content"><p>{LONG * 3}</p>'
            f'<img src="http://m/1.png" alt="cap"><p>{LONG * 2}</p>'
            f"</article></body></html>")
    row = _doc(html)
    offs = [s["offset"] for s in row["spans"]]
    assert offs == list(range(len(offs)))
    kinds = [s["kind"] for s in row["spans"]]
    assert "image" in kinds


def test_math_lifting():
    html = (f'<html><head><title>M</title></head><body>'
            f'<article class="post-content"><p>{LONG * 3}</p>'
            f"<p>Euler says $e^x$ and display $$a+b$$ here. {LONG}</p>"
            f"</article></body></html>")
    row = _doc(html)
    joined = " ".join(s["text"] for s in row["spans"])
    assert 'class="math-inline" data-tex="e^x"' in joined
    assert 'class="math-display" data-tex="a+b"' in joined


def test_forum_reorder_and_counts():
    html = ('<html><head><title>Q - forum</title></head><body>'
            '<div class="thread-content">'
            f'<div class="reply post" id="post-5"><p>First reply body. {LONG * 3}</p></div>'
            f'<div class="post first-post" id="post-1"><p>Main question body. {LONG * 3}</p></div>'
            f'<div class="reply post" id="post-6"><p>Second reply body. {LONG * 3}</p></div>'
            f'<div class="reply post" id="post-7"><p>Third reply body. {LONG * 3}</p></div>'
            f'<div class="reply post" id="post-8"><p>Fourth reply body. {LONG * 3}</p></div>'
            '<span class="reply-count">17 replies</span>'
            '<span class="view-count">999 views</span>'
            "</div></body></html>")
    row = _doc(html, url="https://bbs.example/t/9", doc_id="f1")
    assert row["platform"] == "forum"
    assert row["reply_count"] == 17
    assert row["view_count"] == 999
    texts = [s["text"] for s in row["spans"] if s["kind"] == "text"]
    main_idx = next(i for i, t in enumerate(texts) if "Main question" in t)
    first_reply_idx = next(i for i, t in enumerate(texts) if "First reply" in t)
    assert main_idx < first_reply_idx  # main-post-first reorder


def test_forum_emoji_dropped():
    html = ('<html><head><title>Q - forum</title></head><body>'
            '<div class="thread-content">'
            f'<div class="post first-post"><p>{LONG * 2}</p>'
            '<img class="emoji" src="https://f/emoji/s.png">'
            '<img src="https://f/real.png" alt="photo"></div>'
            "</div></body></html>")
    row = _doc(html, url="https://bbs.example/t/1")
    refs = [s["media_ref"] for s in row["spans"] if s["kind"] == "image"]
    assert "https://f/real.png" in refs
    assert all("emoji" not in r for r in refs)


def test_weixin_strategy():
    html = ('<html><head><title>WX</title></head><body>'
            '<div id="js_name">Acct</div><em id="publish_time">2024-01-02</em>'
            f'<div id="js_content"><p>{LONG * 3}</p>'
            '<img data-src="http://mm/1.jpg" data-backh="capn">'
            '<div class="reward_area">reward</div></div></body></html>')
    row = _doc(html, url="https://mp.weixin.qq.com/s/x")
    assert row["platform"] == "weixin"
    assert row["author"] == "Acct"
    assert row["publish_time"] == "2024-01-02"
    refs = [s["media_ref"] for s in row["spans"] if s["kind"] == "image"]
    assert refs == ["http://mm/1.jpg"]
    joined = " ".join(s["text"] for s in row["spans"])
    assert "reward" not in joined
    assert "capn" in joined


def test_pdf_layout():
    spans = [
        {"kind": "text", "text": "⟦p=2;y=100;x=40;c=0⟧second page", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "⟦p=1;y=30;x=40;c=0⟧Head", "media_ref": "", "offset": 1},
        {"kind": "text", "text": "⟦p=1;y=100;x=40;c=0⟧Title Block", "media_ref": "", "offset": 2},
        {"kind": "text", "text": "⟦p=2;y=30;x=40;c=0⟧Head", "media_ref": "", "offset": 3},
        {"kind": "image", "text": "⟦p=1;y=200;x=40;c=0⟧fig", "media_ref": "pdf://d/f1", "offset": 4},
    ]
    row = extract_document("p1", spans, "https://x.example/d.pdf",
                           build_strategies())
    assert row["platform"] == "pdf"
    assert row["title"] == "Title Block"
    texts = [s["text"] for s in row["spans"]]
    assert texts == ["Title Block", "fig", "second page"]  # headers dropped
    assert [s["offset"] for s in row["spans"]] == [0, 1, 2]


def test_detect_page_type():
    assert detect_page_type("https://mp.weixin.qq.com/s/1", None, []) == "weixin"
    assert detect_page_type("https://x.com/bbs/1", None, []) == "forum"
    root = parse('<html><body><div class="comment-list">c</div></body></html>')
    assert detect_page_type("https://x.com/a", root, []) == "forum"
    assert detect_page_type("https://x.com/a", parse("<p>x</p>"), []) == "article"


def test_error_isolation():
    # a doc that explodes the parser should yield an error row, not raise
    row = extract_document("bad", [{"kind": "text", "text": None,
                                    "media_ref": "", "offset": 0}],
                           "https://x.com/a", build_strategies())
    assert row["doc_id"] == "bad"
    # never raises; either a clean empty extraction or an error marker
    assert "error" in row


def test_pdf_two_column_reading_order():
    spans = [
        {"kind": "text", "text": "⟦p=1;y=100;x=40;c=0⟧left top", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "⟦p=1;y=150;x=320;c=1⟧right top", "media_ref": "", "offset": 1},
        {"kind": "text", "text": "⟦p=1;y=200;x=40;c=0⟧left bottom", "media_ref": "", "offset": 2},
        {"kind": "text", "text": "⟦p=1;y=400;x=320;c=1⟧right bottom", "media_ref": "", "offset": 3},
    ]
    row = extract_document("p2", spans, "https://x.example/two.pdf",
                           build_strategies())
    texts = [s["text"] for s in row["spans"]]
    # full left column before right column (reading order, not stream order)
    assert texts == ["left top", "left bottom", "right top", "right bottom"]


def test_media_inside_figure_threaded():
    html = (f'<html><head><title>T</title></head><body>'
            f'<article class="post-content"><p>{LONG * 3}</p>'
            f'<figure><img src="http://m/f.png" alt="figalt">'
            f"<figcaption>the caption</figcaption></figure>"
            f"</article></body></html>")
    row = _doc(html)
    kinds = [s["kind"] for s in row["spans"]]
    assert "image" in kinds
    media = next(s for s in row["spans"] if s["kind"] == "image")
    assert media["media_ref"] == "http://m/f.png"
    cap = [s for s in row["spans"] if "caption" in s["text"]]
    assert cap, "figcaption must survive as a text span"
