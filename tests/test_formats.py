"""Formatter tests: spans → plain text / markdown (M23/M24)."""

from magic_content_extractor_ray.functions.format import (
    spans_to_text, spans_to_markdown)


def _t(text, off):
    return {"kind": "text", "text": text, "media_ref": "", "offset": off}


def test_text_format():
    spans = [
        _t("<h2>Head</h2>", 0),
        _t("<p>Para one.</p>", 1),
        _t("<ul><li>a</li><li>b</li></ul>", 2),
        {"kind": "image", "text": "cap", "media_ref": "http://m/x.png",
         "offset": 3},
        _t("<table><tr><th>h1</th><th>h2</th></tr>"
           "<tr><td>c1</td><td>c2</td></tr></table>", 4),
    ]
    out = spans_to_text(spans)
    assert "Head" in out and "Para one." in out
    assert "• a" in out and "• b" in out
    assert "cap" in out
    assert "h1\th2" in out
    assert "\n\n\n" not in out


def test_markdown_format():
    spans = [
        _t("<h2>Head</h2>", 0),
        _t('<p>Text with <a href="http://x">link</a> and <b>bold</b> '
           "and <del>gone</del>.</p>", 1),
        _t('<pre data-language="python">code here</pre>', 2),
        _t("<blockquote>quoted</blockquote>", 3),
        {"kind": "image", "text": "cap", "media_ref": "http://m/x.png",
         "offset": 4},
        _t("<ol><li>one</li><li>two</li></ol>", 5),
        _t("<table><tr><td>kept</td></tr></table>", 6),
    ]
    md = spans_to_markdown(spans)
    assert "## Head" in md
    assert "[link](http://x)" in md
    assert "**bold**" in md
    assert "~~gone~~" in md
    assert "```python\ncode here\n```" in md
    assert "> quoted" in md
    assert "![cap](http://m/x.png)" in md
    assert "1. one" in md and "2. two" in md
    assert "<table>" in md  # tables kept as HTML (turndown.keep)


def test_out_of_order_offsets_sorted():
    spans = [_t("<p>second</p>", 1), _t("<p>first</p>", 0)]
    assert spans_to_text(spans).index("first") < \
        spans_to_text(spans).index("second")


def test_node_path_formatting_matches_reparse():
    """The actor formats from the already-parsed span nodes; output must be
    byte-identical to the standalone re-parse formatters (which goldens
    pin), across every corpus family."""
    import pyarrow.parquet as pq
    from magic_content_extractor_ray.corpus import generate_doc
    from magic_content_extractor_ray.extractors.registry import (
        build_strategies, extract_document)

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    strategies = build_strategies()
    checked = 0
    for d, x in zip(t["doc_id"].to_pylist()[:120],
                    t["text"].to_pylist()[:120]):
        doc = generate_doc(d, x)
        row = extract_document(doc["doc_id"], doc["spans"], doc["url"],
                               strategies, None, ("text", "markdown"))
        if row["error"]:
            continue
        assert row["text_out"] == spans_to_text(row["spans"])
        assert row["markdown"] == spans_to_markdown(row["spans"])
        checked += 1
    assert checked >= 100
