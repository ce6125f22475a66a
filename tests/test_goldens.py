"""Frozen golden fixtures: 14 documents covering every (family, cascade
stage) pair, with full expected span sequences + metadata pinned in
``tests/goldens.json``.

Unlike the oracle==pipeline e2e test (which co-moves with code changes),
these goldens freeze the extraction CONTRACT: an unintended semantic change
fails here. To intentionally re-pin after a deliberate semantics change,
regenerate the file (see git history for the generation snippet) and call
the change out in the commit message.
"""

import json
import os

import pytest

from magic_content_extractor_ray.extractors.registry import (
    build_strategies, extract_document)

_GOLDENS = json.load(open(
    os.path.join(os.path.dirname(__file__), "goldens.json")))


@pytest.fixture(scope="module")
def strategies():
    return build_strategies()


@pytest.mark.parametrize(
    "case", _GOLDENS,
    ids=[f"{g['family']}-{g['expected']['strategy_used']}" for g in _GOLDENS])
def test_golden(case, strategies):
    row = extract_document(case["doc_id"], case["input_spans"], case["url"],
                           strategies)
    assert row["error"] == ""
    exp = case["expected"]
    got_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                 for s in row["spans"]]
    exp_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                 for s in exp["spans"]]
    assert got_spans == exp_spans
    for k in ("title", "platform", "strategy_used", "author", "publish_time",
              "read_count", "reply_count", "view_count", "text_len",
              "span_count"):
        assert row[k] == exp[k], k
