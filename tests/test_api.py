"""Single-document API parity tests (reference response shape)."""

import pytest

from magic_content_extractor_ray.api import extract_html

LONG = ("This is a well formed paragraph with plenty of informative text "
        "content to satisfy the extraction thresholds comfortably. ")

HTML = (f'<html><head><title>API Doc | Site</title>'
        f'<meta property="og:title" content="API Doc">'
        f'<meta name="author" content="Jo"></head><body>'
        f'<nav class="nav"><a href="/x">x</a></nav>'
        f'<article class="entry-content"><h1>API Doc</h1>'
        f"<p>{LONG * 3}</p><p><b>bold</b> rest. {LONG}</p>"
        f"</article></body></html>")


def test_markdown_response_shape():
    out = extract_html(HTML, url="https://e.com/a")
    assert set(out) == {"title", "content", "textContent", "html", "url", "metadata"}
    assert out["title"] == "API Doc"
    assert out["metadata"]["platform"] == "article"
    assert out["metadata"]["author"] == "Jo"
    assert "# API Doc" in out["content"]
    assert "**bold**" in out["content"]
    assert "well formed paragraph" in out["textContent"]


def test_text_and_html_formats():
    txt = extract_html(HTML, url="https://e.com/a", output_format="text")
    assert "<p>" not in txt["content"]
    html = extract_html(HTML, url="https://e.com/a", output_format="html")
    assert "<p>" in html["content"]


def test_short_input_rejected():
    with pytest.raises(ValueError):
        extract_html("<p>tiny</p>")


def test_strategy_override():
    out = extract_html(HTML, url="https://e.com/a", strategy="readability")
    assert out["content"]


def test_unknown_strategy_override_surfaces_error():
    """A typo'd override must land in the error column, not silently fall
    back to a different extraction path."""
    from magic_content_extractor_ray.extractors.registry import (
        build_strategies, extract_document)

    row = extract_document(
        "d1", [{"kind": "text", "text": "<p>hello world</p>",
                "media_ref": "", "offset": 0}],
        "https://e.com/a", build_strategies(), "readabilty")  # sic
    assert "readabilty" in row["error"]
    assert row["platform"] == "error"
