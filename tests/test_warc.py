"""WARC source: write → read → extract end-to-end."""


def test_warc_roundtrip_and_extract(ray_session, tmp_path):
    from magic_content_extractor_ray.sources.warc import write_warc, read_warc
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    LONG = ("A full paragraph of content that easily exceeds the article "
            "extraction thresholds when repeated a couple of times over. ")
    records = [
        {"uri": "https://site.example/a",
         "body": (f"<html><head><title>Page A</title></head><body>"
                  f'<article class="post-content"><h1>Page A</h1>'
                  f"<p>{LONG * 3}</p></article></body></html>")},
        {"uri": "https://site.example/b",
         "body": (f"<html><head><title>Page B</title></head><body>"
                  f'<div class="entry-content"><p>{LONG * 4}</p>'
                  f'<img src="https://img.example/x.png" alt="pic">'
                  f"</div></body></html>")},
        # a request record must be skipped
        {"uri": "https://site.example/a", "type": "request",
         "body": "GET / HTTP/1.1"},
    ]
    warc_path = str(tmp_path / "shard-00000.warc")
    write_warc(warc_path, records)

    docs = read_warc(warc_path)
    assert docs.count() == 2

    id_by_url = {r["url"]: r["doc_id"] for r in docs.take_all()}
    out = {r["doc_id"]: r for r in
           run_extract_pipeline(docs, batch_size=8).take_all()}
    a = out[id_by_url["https://site.example/a"]]
    assert a["title"] == "Page A"
    assert a["error"] == ""
    b = out[id_by_url["https://site.example/b"]]
    assert any(s["kind"] == "image" and
               s["media_ref"] == "https://img.example/x.png"
               for s in b["spans"])


def test_jsonl_html_source(ray_session, tmp_path):
    import json
    import ray.data as rd
    from magic_content_extractor_ray.sources.html_table import (
        html_docs_to_spans)
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    LONG = ("Sufficiently long paragraph content for extraction thresholds "
            "to be met without any trouble at all in this document. ")
    path = tmp_path / "docs.jsonl"
    with open(path, "w") as f:
        for i in range(5):
            f.write(json.dumps({
                "doc_id": f"j{i}", "url": f"https://j.example/{i}",
                "html": (f"<html><head><title>J{i}</title></head><body>"
                         f'<article class="post-content"><p>{LONG * 3}</p>'
                         f"</article></body></html>")}) + "\n")
    ds = html_docs_to_spans(rd.read_json(str(path)))
    out = run_extract_pipeline(ds, batch_size=4).take_all()
    assert len(out) == 5
    assert {r["title"] for r in out} == {f"J{i}" for i in range(5)}
    assert all(r["error"] == "" for r in out)


def test_warc_gz_members(ray_session, tmp_path):
    """.warc.gz with one gzip member per record (the standard layout)
    parses identically to the plain file."""
    import gzip

    from magic_content_extractor_ray.sources.warc import (
        write_warc, read_warc, _RECORD_SEP)

    LONG = "Body paragraph long enough to matter for parsing checks. "
    records = [
        {"uri": f"https://gz.example/{i}",
         "body": f"<html><body><p>{LONG * 2}{i}</p></body></html>"}
        for i in range(3)]
    plain = str(tmp_path / "x.warc")
    write_warc(plain, records)
    raw = open(plain, "rb").read()
    # re-wrap each record as its own gzip member
    chunks = [c for c in raw.split(_RECORD_SEP) if c.strip()]
    gz_path = str(tmp_path / "x.warc.gz")
    with open(gz_path, "wb") as f:
        for c in chunks:
            f.write(gzip.compress(_RECORD_SEP + c))

    a = read_warc(plain).to_pandas().sort_values("url").reset_index(
        drop=True)
    b = read_warc(gz_path).to_pandas().sort_values("url").reset_index(
        drop=True)
    assert len(b) == 3
    assert a["url"].tolist() == b["url"].tolist()
    assert [s[0]["text"] for s in a["spans"]] == \
        [s[0]["text"] for s in b["spans"]]
