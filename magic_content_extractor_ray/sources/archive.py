"""Archive sources: tar / zip of raw HTML files → docs Dataset.

Local crawl dumps commonly arrive as tar or zip archives of HTML files.
Distributed shape: the driver reads the member index ONCE (tar: one
sequential header scan capturing each member's data offset; zip: the
central directory), builds a work list of (name, offset, size) items, and
the read runs as an actor-pool ``map_batches`` where each actor holds an
open file handle and seeks straight to its assigned members — no worker
ever re-scans the archive. Output rows: (doc_id = member name, text).

Feed the result into ``html_table.attach_spans_from_html`` /
``pipelines.extract_pipeline`` like any other raw-HTML source.
"""

from __future__ import annotations

import tarfile
import zipfile

import pyarrow as pa


def list_archive_members(path: str) -> list[dict]:
    """Driver-side index pass: one dict per regular-file member.

    tar: records ``offset`` (data start) + ``size`` so workers can
    ``seek`` directly; zip: offset is -1 (zipfile's central directory
    already gives random access by name)."""
    out: list[dict] = []
    if path.endswith((".tar", ".tar.gz", ".tgz")):
        # note: offset-based worker reads require an UNCOMPRESSED tar;
        # compressed tars fall back to name-based access (still seekable
        # per member via tarfile, but decompression is sequential)
        compressed = not path.endswith(".tar")
        with tarfile.open(path) as tf:
            for m in tf:
                if m.isreg():
                    out.append({"name": m.name,
                                "offset": -1 if compressed else
                                int(m.offset_data),
                                "size": int(m.size)})
    elif path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            for info in zf.infolist():
                if not info.is_dir():
                    out.append({"name": info.filename, "offset": -1,
                                "size": int(info.file_size)})
    else:
        raise ValueError(f"unsupported archive: {path}")
    return out


class _ArchiveReader:
    """Actor-pool member reader: the archive handle opens once per actor
    (``__init__``), each batch seeks to its members."""

    def __init__(self, path: str, encoding: str = "utf-8"):
        self.path = path
        self.encoding = encoding
        self.is_zip = path.endswith(".zip")
        self.zf = zipfile.ZipFile(path) if self.is_zip else None
        self.raw = None if self.is_zip else open(path, "rb")
        self.tf = None  # lazy fallback for compressed tars

    def _read_member(self, name: str, offset: int, size: int) -> bytes:
        if self.is_zip:
            return self.zf.read(name)
        if offset >= 0:  # uncompressed tar: direct range read
            self.raw.seek(offset)
            return self.raw.read(size)
        if self.tf is None:
            self.tf = tarfile.open(self.path)
        return self.tf.extractfile(name).read()

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column("name").to_pylist()
        offsets = batch.column("offset").to_pylist()
        sizes = batch.column("size").to_pylist()
        texts = [
            self._read_member(n, o, s).decode(self.encoding, "replace")
            for n, o, s in zip(names, offsets, sizes)]
        return pa.table({
            "doc_id": pa.array(names, pa.string()),
            "text": pa.array(texts, pa.string()),
        })


def read_archive_docs(path: str, *, batch_size: int = 64,
                      encoding: str = "utf-8"):
    """(doc_id, text) Dataset over an archive's members."""
    import ray.data as rd

    from ..util import actor_pool

    members = list_archive_members(path)
    if not members:
        return rd.from_items([])
    items = rd.from_items(
        members, override_num_blocks=max(1, min(len(members), 64)))
    return items.map_batches(
        _ArchiveReader, batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool(),
        fn_constructor_kwargs={"path": path, "encoding": encoding})
