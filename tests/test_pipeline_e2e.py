"""End-to-end: distributed pipeline == single-process oracle, span-sequence
equality per doc_id (the north-rule per-row invariant), plus determinism and
resume-equivalence."""

import os

import pytest

from magic_content_extractor_ray.corpus import generate_doc
from magic_content_extractor_ray.extractors.registry import (
    build_strategies, extract_document)

SF_DIR = "/root/testdata/sf0.001"
N_DOCS = 150


@pytest.fixture(scope="module")
def oracle_rows():
    """Single-process oracle over the first N docs of the derived corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    strategies = build_strategies()
    rows = {}
    for d, x in zip(t["doc_id"].to_pylist()[:N_DOCS],
                    t["text"].to_pylist()[:N_DOCS]):
        doc = generate_doc(d, x)
        rows[doc["doc_id"]] = extract_document(
            doc["doc_id"], doc["spans"], doc["url"], strategies)
    return rows


def _span_key(row):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]]


def test_pipeline_matches_oracle(ray_session, oracle_rows):
    import ray.data as rd
    from magic_content_extractor_ray.corpus import attach_spans_batch
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"],
    ).limit(N_DOCS).map_batches(attach_spans_batch, batch_format="pyarrow")
    out = run_extract_pipeline(docs, batch_size=32)
    got = {r["doc_id"]: r for r in out.take_all()}

    assert set(got) == set(oracle_rows)
    for doc_id, oracle in oracle_rows.items():
        g = got[doc_id]
        assert g["error"] == "" and oracle["error"] == ""
        assert _span_key(g) == _span_key(oracle), f"span mismatch for {doc_id}"
        assert g["title"] == oracle["title"]
        assert g["platform"] == oracle["platform"]
        assert g["reply_count"] == oracle["reply_count"]
    # offsets dense 0..n-1
    for g in got.values():
        assert [s["offset"] for s in g["spans"]] == list(range(len(g["spans"])))


def test_determinism_across_runs(ray_session, oracle_rows):
    """Same input → byte-identical spans on a re-run with different
    batch size (order-insensitive)."""
    import ray.data as rd
    from magic_content_extractor_ray.corpus import attach_spans_batch
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"],
    ).limit(N_DOCS).map_batches(attach_spans_batch, batch_format="pyarrow")
    out = run_extract_pipeline(docs, batch_size=7,
                               size_bucket=False)
    got = {r["doc_id"]: _span_key(r) for r in out.take_all()}
    assert got == {k: _span_key(v) for k, v in oracle_rows.items()}


def test_checkpoint_resume(ray_session, tmp_path, oracle_rows):
    """Kill after k partitions → resume completes only the rest; final
    output set identical to a fresh full run. Input is fragment-partitioned
    (row-group assignment — each byte read once per run), and the
    rename-before-manifest crash window is exercised."""
    import pyarrow.parquet as pq
    from magic_content_extractor_ray.state.checkpoint import (
        run_checkpointed, load_manifest, make_fragment_docs_factory,
        parquet_fragment_plan)

    # slice the oracle subset into its own parquet with several row groups
    # so the fragment plan has real fragments to assign
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, N_DOCS)
    pq.write_table(t, str(in_dir / "documents.parquet"), row_group_size=20)

    plan = parquet_fragment_plan(str(in_dir / "documents.parquet"), 4)
    covered = sum(f["end"] - f["start"] for part in plan for f in part)
    assert covered == N_DOCS  # every row assigned exactly once

    factory = make_fragment_docs_factory(str(in_dir))
    out_dir = str(tmp_path / "ckpt")
    kwargs = dict(num_partitions=4,
                  pipeline_kwargs=dict(batch_size=32))

    recs = run_checkpointed(factory, out_dir, **kwargs)
    assert len(recs) == 4
    manifest = load_manifest(out_dir)
    assert set(manifest) == {0, 1, 2, 3}

    # simulated crash: drop partition 3's manifest line and output dir
    import shutil

    lines = open(os.path.join(out_dir, "manifest.jsonl")).read().splitlines()
    kept = [l for l in lines if '"partition_id": 3' not in l]
    with open(os.path.join(out_dir, "manifest.jsonl"), "w") as f:
        f.write("\n".join(kept) + "\n")
    shutil.rmtree(os.path.join(out_dir, "part=3"))

    recs2 = run_checkpointed(factory, out_dir, **kwargs)
    assert [r["partition_id"] for r in recs2] == [3]  # only the missing one

    # crash WINDOW: partition 2 renamed but died before its manifest
    # append — final dir exists, manifest row missing; resume must redo it
    # without wedging on a rename-onto-non-empty-dir error
    lines = open(os.path.join(out_dir, "manifest.jsonl")).read().splitlines()
    kept = [l for l in lines if '"partition_id": 2' not in l]
    with open(os.path.join(out_dir, "manifest.jsonl"), "w") as f:
        f.write("\n".join(kept) + "\n")
    assert os.path.isdir(os.path.join(out_dir, "part=2"))  # orphan remains

    recs3 = run_checkpointed(factory, out_dir, **kwargs)
    assert [r["partition_id"] for r in recs3] == [2]

    # full output equals the oracle set exactly
    got = {}
    for p in range(4):
        t = pq.read_table(os.path.join(out_dir, f"part={p}"),
                          columns=["doc_id", "spans"])
        for r in t.to_pylist():
            got[r["doc_id"]] = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]]
    assert got == {k: _span_key(v) for k, v in oracle_rows.items()}


def test_training_pipeline_composition(ray_session):
    """The composed preprocessing job: quality gate, exact-dedup semi-join,
    near-dup pruning and packing chain correctly — planted exact and near
    duplicates are pruned, every surviving doc is packed exactly once."""
    import ray.data as rd
    from magic_content_extractor_ray.pipelines.training_pipeline import (
        run_training_pipeline)

    import random

    vocab = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu "
             "merge filter window vector stream batch table row").split()
    base = []
    for i in range(30):  # genuinely distinct word sequences per doc
        rng = random.Random(i)
        base.append(" ".join(rng.choice(vocab) for _ in range(120)))
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows.append({"doc_id": 100, "text": base[0]})           # exact dup
    words1 = base[1].split()
    words1[5] = "speciaal"                                   # near dup
    rows.append({"doc_id": 101, "text": " ".join(words1)})
    rows.append({"doc_id": 102, "text": "too short"})        # gated out
    ds = rd.from_items(rows)

    packs, funnel = run_training_pipeline(
        ds, budget=512, min_tokens=10, minhash_threshold=0.5)
    assert funnel["gated"] == 32            # short doc dropped
    assert funnel["exact_kept"] == 31       # exact dup of doc 0 dropped
    assert funnel["after_neardup"] == 30    # near dup of doc 1 dropped

    df = packs.to_pandas()
    packed = sorted(int(d) for row in df["doc_ids"] for d in row)
    assert packed == list(range(30))

    # epoch shuffle: same salt → identical packing on re-run; shuffled
    # packing still covers every surviving doc exactly once
    packs_s1, _ = run_training_pipeline(
        ds, budget=512, min_tokens=10, minhash_threshold=0.5,
        shuffle_salt="epoch-0:", collect_funnel=False)
    packs_s2, _ = run_training_pipeline(
        ds, budget=512, min_tokens=10, minhash_threshold=0.5,
        shuffle_salt="epoch-0:", collect_funnel=False)
    d1 = packs_s1.to_pandas()
    d2 = packs_s2.to_pandas()
    order1 = [int(d) for row in d1["doc_ids"] for d in row]
    order2 = [int(d) for row in d2["doc_ids"] for d in row]
    assert order1 == order2                       # deterministic
    assert sorted(order1) == list(range(30))      # complete coverage
    assert order1 != sorted(order1)               # actually shuffled


def test_incremental_ingest(ray_session, tmp_path):
    """New files landing between runs are processed exactly once;
    completed files are skipped on re-run."""
    import pyarrow.parquet as pq
    from magic_content_extractor_ray.corpus import attach_spans_batch
    from magic_content_extractor_ray.state.checkpoint import run_incremental

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    in_dir = tmp_path / "landing"
    in_dir.mkdir()
    pq.write_table(t.slice(0, 30), str(in_dir / "batch_a.parquet"))
    pq.write_table(t.slice(30, 30), str(in_dir / "batch_b.parquet"))

    out_dir = str(tmp_path / "out")

    def tf(ds):
        return ds.map_batches(attach_spans_batch, batch_format="pyarrow")

    recs = run_incremental(str(in_dir), out_dir, transform=tf,
                           pipeline_kwargs=dict(batch_size=16))
    assert sorted(r["num_docs"] for r in recs) == [30, 30]

    # a third file lands; only it is processed on the next run
    pq.write_table(t.slice(60, 20), str(in_dir / "batch_c.parquet"))
    recs2 = run_incremental(str(in_dir), out_dir, transform=tf,
                            pipeline_kwargs=dict(batch_size=16))
    assert [os.path.basename(r["input_path"]) for r in recs2] == \
        ["batch_c.parquet"]
    assert recs2[0]["num_docs"] == 20

    # idempotent: nothing left to do
    assert run_incremental(str(in_dir), out_dir, transform=tf) == []

    total = 0
    for d in os.listdir(out_dir):
        if d.startswith("file="):
            total += pq.read_table(os.path.join(out_dir, d),
                                   columns=["doc_id"]).num_rows
    assert total == 80
