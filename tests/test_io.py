"""IO layer: parquet fallback round-trip (lance absent offline)."""

from magic_content_extractor_ray.sources.io import (
    read_docs, write_docs, lance_available)


def test_roundtrip_parquet(ray_session, tmp_path):
    import ray.data as rd

    assert not lance_available()  # offline sandbox: parquet fallback path
    ds = rd.from_items([{"doc_id": f"d{i}", "n": i} for i in range(20)])
    out = str(tmp_path / "docs_out")
    write_docs(ds, out)
    back = read_docs(out, columns=["doc_id"])
    assert back.count() == 20
    assert back.schema().names == ["doc_id"]


def test_archive_sources(ray_session, tmp_path):
    """tar (offset-seek path) and zip archives of HTML files read into
    (doc_id, text) Datasets and flow into the extract pipeline."""
    import tarfile
    import zipfile
    from magic_content_extractor_ray.sources.archive import (
        read_archive_docs, list_archive_members)
    from magic_content_extractor_ray.sources.html_table import (
        html_docs_to_spans)
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    htmls = {
        f"site/page{i}.html":
            (f"<html><head><title>Page {i}</title></head><body>"
             f"<article><p>Real content number {i} with enough words to "
             f"pass the extractor thresholds and then some more text "
             f"about data pipelines.</p></article>"
             f"<footer>noise footer</footer></body></html>").encode()
        for i in range(8)
    }
    tar_path = str(tmp_path / "docs.tar")
    with tarfile.open(tar_path, "w") as tf:
        import io as _io

        for name, data in htmls.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, _io.BytesIO(data))
    zip_path = str(tmp_path / "docs.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for name, data in htmls.items():
            zf.writestr(name, data)

    members = list_archive_members(tar_path)
    assert len(members) == 8 and all(m["offset"] > 0 for m in members)

    for path in (tar_path, zip_path):
        ds = read_archive_docs(path, batch_size=3)
        rows = {r["doc_id"]: r["text"] for r in ds.take_all()}
        assert set(rows) == set(htmls)
        assert "Real content number 3" in rows["site/page3.html"]
        # flows into the extract pipeline end-to-end
        out = run_extract_pipeline(
            html_docs_to_spans(ds, html_column="text"),
            batch_size=4).take_all()
        assert len(out) == 8
        got = {r["doc_id"]: r for r in out}
        assert all(r["error"] == "" for r in out)
        text3 = " ".join(s["text"] for s in got["site/page3.html"]["spans"])
        assert "Real content number 3" in text3
        assert "noise footer" not in text3


def test_partitioned_write_and_pruned_read(ray_session, tmp_path):
    """Hive-partitioned sink: per-key directories on disk, single-
    partition reads touch only their directory."""
    import os

    import ray.data as rd
    from magic_content_extractor_ray.sources.io import (
        write_partitioned, read_partition)

    rows = [{"lang": l, "doc_id": i, "n": i * 10}
            for i, l in enumerate(["en", "de", "en", "fr", "de", "en"])]
    out = str(tmp_path / "part_out")
    write_partitioned(rd.from_items(rows), out, partition_cols=["lang"])
    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == \
        ["lang=de", "lang=en", "lang=fr"]
    de = read_partition(out, column="lang", value="de").to_pandas()
    assert sorted(de["doc_id"].tolist()) == [1, 4]


def test_lance_dispatch_contract(ray_session, tmp_path, monkeypatch):
    """The advertised Lance path can't execute offline (no wheel), so pin
    the CONTRACT instead: with a fake ``lance`` module importable,
    ``read_docs``/``write_docs`` on a ``.lance`` URI must dispatch to
    ``ray.data.read_lance`` / ``Dataset.write_lance`` with the URI,
    column pruning, and dataset passed through unchanged."""
    import sys
    import types

    import ray.data as rd
    from magic_content_extractor_ray.sources import io as io_mod

    # make `lance` importable: lance_available() flips to True
    # (find_spec consults sys.modules[...].__spec__, which must be real)
    import importlib.machinery

    fake_lance = types.ModuleType("lance")
    fake_lance.__spec__ = importlib.machinery.ModuleSpec("lance", loader=None)
    monkeypatch.setitem(sys.modules, "lance", fake_lance)
    assert io_mod.lance_available()

    calls = {}
    sentinel = rd.from_items([{"doc_id": "d0", "spans": []}])

    def fake_read_lance(uri, columns=None, **kwargs):
        calls["read"] = {"uri": uri, "columns": columns}
        return sentinel

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    out = io_mod.read_docs("/data/docs.lance", columns=["doc_id", "spans"])
    assert out is sentinel
    assert calls["read"] == {"uri": "/data/docs.lance",
                             "columns": ["doc_id", "spans"]}

    monkeypatch.setattr(
        type(sentinel), "write_lance",
        lambda self, uri, **kw: calls.setdefault(
            "write", {"uri": uri, "ds": self}),
        raising=False)
    io_mod.write_docs(sentinel, "/data/out.lance")
    assert calls["write"]["uri"] == "/data/out.lance"
    assert calls["write"]["ds"] is sentinel

    # non-.lance URIs keep the parquet fallback even with lance importable
    pq_dir = str(tmp_path / "pq_out")
    io_mod.write_docs(sentinel, pq_dir)
    assert io_mod.read_docs(pq_dir).count() == 1


def test_read_urls_injected_fetcher(ray_session):
    """URL source (reference route.ts:184-217 analog): injected fetcher
    runs in the actor pool, failures degrade per row, and fetched pages
    flow through the full extract pipeline."""
    from magic_content_extractor_ray.sources.http import read_urls
    from magic_content_extractor_ray.sources.html_table import (
        html_docs_to_spans)
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    def fake_fetch(url):
        if "bad" in url:
            raise ConnectionError("refused")
        i = url.rstrip("/").rsplit("-", 1)[-1]
        return (f"<html><head><title>Fetched {i}</title></head><body>"
                f"<article><p>Fetched content number {i} long enough to "
                f"clear extractor thresholds with words about streaming "
                f"data pipelines and arrow batches.</p></article>"
                f"<footer>footer noise</footer></body></html>")

    urls = [f"https://site.example/page-{i}" for i in range(6)] + [
        "https://site.example/bad-1"]
    fetched = read_urls(urls, fetcher=fake_fetch, concurrency=2)
    rows = {r["doc_id"]: r for r in fetched.take_all()}
    assert len(rows) == 7
    assert rows["https://site.example/bad-1"]["error"].startswith(
        "ConnectionError")
    assert rows["https://site.example/page-3"]["error"] == ""
    assert "Fetched content number 3" in rows[
        "https://site.example/page-3"]["text"]

    ok = fetched.filter(lambda r: r["error"] == "")
    out = run_extract_pipeline(
        html_docs_to_spans(ok, html_column="text")).take_all()
    assert len(out) == 6
    by_id = {r["doc_id"]: r for r in out}
    page0 = by_id["https://site.example/page-0"]
    assert page0["title"] == "Fetched 0"
    texts = [s["text"] for s in page0["spans"]]
    assert any("Fetched content number 0" in t for t in texts)
    assert not any("footer noise" in t for t in texts)


def test_jsonl_csv_roundtrip(ray_session, tmp_path):
    """read_docs/write_docs dispatch on .jsonl and .csv with projection
    pushed right after the row-oriented read."""
    import ray.data as rd
    from magic_content_extractor_ray.sources.io import read_docs, write_docs

    rows = [{"doc_id": i, "text": f"doc {i}", "extra": i * 2}
            for i in range(100)]
    ds = rd.from_items(rows)
    for ext in ("jsonl", "csv"):
        uri = str(tmp_path / f"corpus.{ext}")
        write_docs(ds, uri)
        back = read_docs(uri, columns=["doc_id", "text"]).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
        assert list(back.columns) == ["doc_id", "text"]
        assert len(back) == 100
        assert back.loc[7, "text"] == "doc 7"


def test_orc_roundtrip(ray_session, tmp_path):
    """ORC write → read roundtrip through the custom datasink/source,
    including column pruning at the stripe read and the read_docs /
    write_docs suffix dispatch."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from magic_content_extractor_ray.sources.io import (
        read_docs, read_orc, write_docs)

    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(200)], pa.string()),
        "n_chars": pa.array([i % 7 for i in range(200)], pa.int64())})
    orc_dir = str(tmp_path / "docs.orc")
    write_docs(rd.from_arrow(t).repartition(4), orc_dir)

    back = read_docs(orc_dir).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(200))
    assert back["text"].tolist() == [f"doc {i}" for i in range(200)]

    pruned = read_orc(orc_dir, columns=["doc_id"])
    assert pruned.schema().names == ["doc_id"]
    assert pruned.count() == 200


def test_roundtrip_interleaved_docs_property(ray_session, tmp_path):
    """Property round-trip over the INTERLEAVED document shape the north
    rule names (text + media spans): randomized unicode text, binary
    media payloads, nested list<struct> span sequences and nulls must
    survive write_docs -> read_docs bit-for-bit on the parquet fallback
    (and, by the dispatch contract test above, identically through the
    Lance path once a wheel exists)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    span_st = st.fixed_dictionaries({
        "kind": st.sampled_from(["text", "image", "audio", "video"]),
        "span_text": st.text(max_size=40),
        "media_ref": st.one_of(st.none(), st.text(
            alphabet="abc/0123456789.", min_size=1, max_size=20)),
    })
    doc_st = st.fixed_dictionaries({
        "text": st.text(max_size=200),
        "media": st.one_of(st.none(), st.binary(max_size=64)),
        "spans": st.lists(span_st, max_size=5),
    })
    case_idx = [0]

    @settings(max_examples=20, deadline=None)
    @given(st.lists(doc_st, min_size=1, max_size=8))
    def check(docs):
        for i, d in enumerate(docs):
            d["doc_id"] = i
        t = pa.Table.from_pylist(docs)
        case_idx[0] += 1
        out = str(tmp_path / f"prop_{case_idx[0]}")
        write_docs(rd.from_arrow(t), out)
        back = read_docs(out)
        got = pa.Table.from_pandas(
            back.to_pandas().sort_values("doc_id").reset_index(drop=True),
            preserve_index=False)
        want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
        gdf = got.to_pandas()
        assert list(gdf["doc_id"]) == list(want["doc_id"])
        assert list(gdf["text"]) == list(want["text"])
        assert [bytes(x) if x is not None else None
                for x in gdf["media"]] == list(want["media"])
        # span sequences: order and every field preserved
        for a, b in zip(gdf["spans"], want["spans"]):
            aa = [dict(s) for s in (list(a) if a is not None else [])]
            bb = list(b) if b is not None else []
            assert aa == bb

    check()
