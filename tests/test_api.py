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


def test_driver_registry_contract():
    """The driver contract after the round-5 split: 310 unique query
    keys, every key has an oracle_sql twin and a callable, the
    extraction + dedup core holds the first registry slots (the
    external gate checks dict order), and the thin __ray_entry__
    re-export exposes the same surface as the package registry."""
    import importlib.util
    import os
    import sys

    from magic_content_extractor_ray.queries import oracle_sql, queries

    qs = queries()
    osql = oracle_sql()
    assert len(qs) == 310
    assert set(qs) == set(osql)
    assert all(callable(v) for v in qs.values())
    head = list(qs)[:20]
    assert head[0] == "extract_pipeline"
    assert {"dedup_exact", "dedup_minhash", "cross_dedup",
            "semantic_dedup"} <= set(head)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry___contract", os.path.join(root, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert list(m.queries()) == list(qs)
    assert m.oracle_sql().keys() == osql.keys()
    # the q_* re-exports tests/tools rely on
    assert m.q_extract_pipeline is qs["extract_pipeline"]
