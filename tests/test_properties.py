"""Property tests: DOM round-trip, similarity functions, rebatcher skew
isolation, clean-title invariants."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from magic_content_extractor_ray.htmlib import parse, parse_fragment
from magic_content_extractor_ray.functions import heuristics as H
from magic_content_extractor_ray.functions.title import clean_title


simple_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "Zs"),
                           max_codepoint=0x2FFF),
    min_size=0, max_size=60)


@given(simple_text)
@settings(max_examples=60, deadline=None)
def test_dom_roundtrip_text(t):
    """serialize(parse(x)).text == normalized x for plain text content."""
    frag = f"<p>{t}</p>"
    nodes = parse_fragment(frag)
    assert nodes[0].text() == t
    # re-parse of serialization yields the same text
    again = parse_fragment(nodes[0].outer_html())
    assert again[0].text() == t


@given(simple_text, simple_text)
@settings(max_examples=40, deadline=None)
def test_similarity_bounds(a, b):
    s = H.dice_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert H.dice_similarity(a, a) == 1.0 if a else True


def test_lcs_and_edit_distance():
    assert H.longest_common_subsequence("ABCBDAB", "BDCABA") in ("BCBA", "BDAB", "BCAB")
    assert H.edit_distance("kitten", "sitting") == 3
    assert H.edit_distance("", "abc") == 3
    assert H.longest_common_subsequence("abc", "abc") == "abc"


@given(simple_text)
@settings(max_examples=40, deadline=None)
def test_clean_title_idempotent(t):
    once = clean_title(t)
    assert clean_title(once) == once


def test_rebatcher_isolates_giant_docs():
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        make_size_rebatcher)

    rows = []
    for i in range(10):
        rows.append({"doc_id": f"small-{i}",
                     "spans": [{"kind": "text", "text": "x" * 100,
                                "media_ref": "", "offset": 0}]})
    rows.insert(5, {"doc_id": "giant",
                    "spans": [{"kind": "text", "text": "y" * 500_000,
                               "media_ref": "", "offset": 0}]})
    batch = pa.Table.from_pylist(rows)
    rebatch = make_size_rebatcher(max_bytes=10_000, max_rows=64)
    out = list(rebatch(batch))
    # every input row survives, in order
    ids = [i for t in out for i in t.column("doc_id").to_pylist()]
    assert ids == [r["doc_id"] for r in rows]
    # the giant doc sits in a block of its own
    for t in out:
        got = t.column("doc_id").to_pylist()
        if "giant" in got:
            assert got == ["giant"]


def test_rebatcher_respects_row_cap():
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        make_size_rebatcher)

    rows = [{"doc_id": str(i),
             "spans": [{"kind": "text", "text": "z", "media_ref": "",
                        "offset": 0}]} for i in range(300)]
    batch = pa.Table.from_pylist(rows)
    out = list(make_size_rebatcher(max_bytes=10 ** 9, max_rows=64)(batch))
    assert all(len(t) <= 64 for t in out)
    assert sum(len(t) for t in out) == 300


def test_connected_components_random_graphs(ray_session):
    """Property: on random graphs, connected_components (driver fast path
    AND distributed rounds) equals a reference transitive closure."""
    import numpy as np
    import ray.data as rd
    from magic_content_extractor_ray.stages.graph import connected_components

    rng = np.random.RandomState(17)
    for trial in range(3):
        n_nodes = int(rng.randint(5, 40))
        n_edges = int(rng.randint(1, 60))
        edges = [(int(rng.randint(n_nodes)), int(rng.randint(n_nodes)))
                 for _ in range(n_edges)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue

        # reference: naive label propagation to fixpoint
        ref = {x: x for e in edges for x in e}
        changed = True
        while changed:
            changed = False
            for a, b in edges:
                m = min(ref[a], ref[b])
                if ref[a] != m or ref[b] != m:
                    ref[a] = ref[b] = m
                    changed = True
        # propagate chains fully
        for _ in range(n_nodes):
            for x in list(ref):
                if ref[ref[x]] < ref[x]:
                    ref[x] = ref[ref[x]]

        pairs = rd.from_items(
            [{"left_id": a, "right_id": b} for a, b in edges])
        thresholds = (10**6, 0) if trial == 0 else (10**6,)
        for thresh in thresholds:  # distributed path once (it's slow)
            out = connected_components(
                rd.from_items(
                    [{"left_id": a, "right_id": b} for a, b in edges]),
                driver_threshold=thresh).to_pandas()
            got = out.set_index("doc_id")["cluster_id"].to_dict()
            assert got == ref, f"trial={trial} thresh={thresh}"
