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


def test_goldens_fixture_in_sync():
    """The driver-facing parquet fixtures (tests/fixtures/goldens_*.parquet,
    read by the extract_goldens oracle) must stay bit-identical to
    goldens.json — regenerate with tools/make_fixtures.py after any
    deliberate re-pin."""
    import pyarrow.parquet as pq

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    inp = pq.read_table(os.path.join(fixdir, "goldens_input.parquet"))
    assert inp.num_rows == len(_GOLDENS)
    got_in = {r["doc_id"]: r["spans"] for r in inp.to_pylist()}
    for g in _GOLDENS:
        assert got_in[g["doc_id"]] == g["input_spans"]

    exp = pq.read_table(os.path.join(fixdir, "goldens_expected.parquet"))
    got = {}
    for r in exp.to_pylist():
        got.setdefault(r["doc_id"], []).append(
            (r["kind"], r["span_text"], r["media_ref"], r["offset"]))
    for g in _GOLDENS:
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in g["expected"]["spans"]]
        assert sorted(got[g["doc_id"]], key=lambda x: x[3]) == want, \
            g["doc_id"]


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
