"""Unit tests for scorer formulas (M11, M15, M16, M26, M27) with
hand-computed expected values."""

from magic_content_extractor_ray.htmlib import parse, find_first
from magic_content_extractor_ray.functions import heuristics as H


def test_dice_similarity():
    assert H.dice_similarity("a b c", "a b c") == 1.0
    assert H.dice_similarity("", "x") == 0.0
    # words1={hello,world}, words2={hello,there}: common=1 → 2/4
    assert H.dice_similarity("hello world", "hello there") == 0.5
    # duplicates in str1 count (reference filter/includes semantics)
    assert H.dice_similarity("a a b", "a c") == 2 * 2 / 5


def test_calculate_node_score_formula():
    # <div class="content"> with 250 chars of text, no links/imgs, 1 <p>
    text = "x" * 250
    root = parse(f'<div class="content"><p>{text}</p></div>')
    div = find_first(root, "div")
    # tag div=4, class content=+8, floor(250/100)=2, p=1 → 15
    assert div.text_len() == 250
    assert H.calculate_node_score(div) == 4 + 8 + 2 + 1


def test_node_score_link_density_penalty():
    # text 100 chars all inside one link: density=1 → -floor(10)=-10
    t = "y" * 100
    root = parse(f'<div><a href="/x">{t}</a></div>')
    div = find_first(root, "div")
    # div=4 + floor(100/100)=1 - 10 = -5
    assert H.calculate_node_score(div) == 4 + 1 - 10


def test_score_element_alt():
    root = parse('<article class="post-body"><p>' + "z" * 120 + "</p></article>")
    art = find_first(root, "article")
    # tag article=30; class 'post-body' matches /article|post|content|text/
    # (+25) and /main|body/ (+25); floor(120/100)=1; p*5=5 → 86
    assert H.score_element(art) == 30 + 25 + 25 + 1 + 5


def test_parse_count():
    assert H.parse_count("1,234 views") == 1234
    assert H.parse_count("no digits") is None


def test_content_score_depth_and_keywords():
    root = parse('<div id="a"><div class="content"><p>'
                 + ("word " * 30) + ".</p></div></div>")
    inner = find_first(root, ".content")
    outer = find_first(root, "#a")
    si = H.calculate_content_score(inner)
    so = H.calculate_content_score(outer)
    assert si > 0 and so > 0
