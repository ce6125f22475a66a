"""A malformed document must produce an error row, never poison its batch
or kill the pipeline (per-row error isolation, SURVEY.md §4.2)."""


def test_bad_rows_isolated(ray_session):
    import ray.data as rd
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    LONG = ("Enough text to extract successfully from this document body "
            "when thresholds are applied to the article strategy. ") * 4
    good = [{
        "doc_id": f"good-{i}",
        "spans": [{"kind": "text",
                   "text": f"<html><head><title>T{i}</title></head><body>"
                           f'<article class="post-content"><p>{LONG}</p>'
                           f"</article></body></html>",
                   "media_ref": "", "offset": 0}],
        "url": f"https://blog.example/{i}", "family": "article",
    } for i in range(10)]
    bad = [
        {"doc_id": "bad-null-text",
         "spans": [{"kind": "text", "text": None, "media_ref": "",
                    "offset": 0}],
         "url": "https://x.example/a", "family": "article"},
        {"doc_id": "bad-empty-spans", "spans": [],
         "url": "https://x.example/b", "family": "article"},
    ]
    import pyarrow as pa
    from magic_content_extractor_ray.schema import DOCS_SCHEMA

    ds = rd.from_arrow(pa.Table.from_pylist(good + bad, schema=DOCS_SCHEMA))
    out = {r["doc_id"]: r for r in
           run_extract_pipeline(ds, batch_size=4).take_all()}
    assert len(out) == 12
    for i in range(10):
        assert out[f"good-{i}"]["error"] == ""
        assert out[f"good-{i}"]["span_count"] > 0
    # bad rows are flagged or yield clean empty extractions — never raise
    assert "bad-null-text" in out and "bad-empty-spans" in out
