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
