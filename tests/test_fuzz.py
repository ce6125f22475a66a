"""Robustness fuzz: extraction must never raise on malformed/truncated
HTML — worst case is an error row or a degraded extraction."""

import random

import pyarrow.parquet as pq
import pytest

from magic_content_extractor_ray.corpus import generate_doc
from magic_content_extractor_ray.extractors.registry import (
    build_strategies, extract_document)


@pytest.fixture(scope="module")
def strategies():
    return build_strategies()


def test_truncated_documents(strategies):
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    rng = random.Random(99)
    n_err = 0
    for d, x in list(zip(t["doc_id"].to_pylist(),
                         t["text"].to_pylist()))[:80]:
        doc = generate_doc(d, x)
        spans = [dict(s) for s in doc["spans"]]
        # chop a random span's text mid-tag / mid-entity
        si = rng.randrange(len(spans))
        txt = spans[si]["text"] or ""
        if txt:
            spans[si]["text"] = txt[:rng.randrange(len(txt))]
        row = extract_document(doc["doc_id"], spans, doc["url"], strategies)
        assert isinstance(row, dict)
        n_err += bool(row["error"])
    # truncation may degrade results but must rarely hard-error
    assert n_err <= 4


def test_garbage_inputs(strategies):
    cases = [
        "",
        "<" * 500,
        "&&&&;;;" * 100,
        "<div" + " class='x'" * 200,
        "plain text with no markup at all " * 30,
        "<p>" * 300,
        "\x00\x01\x02" * 50,
        "<html><body><p>ok</p>",
    ]
    for i, html in enumerate(cases):
        row = extract_document(
            f"g{i}", [{"kind": "text", "text": html, "media_ref": "",
                       "offset": 0}],
            "https://x.example/g", strategies)
        assert isinstance(row, dict)
        assert [s["offset"] for s in row["spans"]] == \
            list(range(len(row["spans"])))
