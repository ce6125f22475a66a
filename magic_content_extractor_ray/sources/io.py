"""Dataset IO: Lance when available, Parquet fallback.

The north rule targets Lance tables of interleaved documents; this sandbox
has no ``lance`` wheel (offline), so ``read_docs``/``write_docs`` probe for
Lance support and fall back to Parquet with the identical schema. The table
layout (one directory per partition, ``part-*`` files) is the resumable
layout the checkpoint state machine relies on (state/checkpoint.py).
"""

from __future__ import annotations

import importlib.util


def lance_available() -> bool:
    return importlib.util.find_spec("lance") is not None


def clean_parquet_schema(path: str, columns: list[str] | None = None):
    """The file footer schema with key-value metadata stripped (and pruned
    to ``columns``). pandas-written parquet carries a ``pandas`` metadata
    dict that makes ``pa.Schema`` unhashable on pyarrow 16.1, which defeats
    Ray Data's block-schema deduplication and spams
    'Failed to hash the schemas' on every task — pass this as
    ``read_parquet(schema=...)`` so blocks are born metadata-free."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        inner = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        path = os.path.join(path, inner[0])
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def read_parquet_clean(path: str, *, columns: list[str] | None = None,
                       **kwargs):
    """``ray.data.read_parquet`` with a metadata-free schema (see
    ``clean_parquet_schema``). Drop-in replacement for every parquet read."""
    import ray.data as rd

    return rd.read_parquet(
        path, columns=columns,
        schema=clean_parquet_schema(path, columns), **kwargs)


def read_docs(uri: str, *, columns: list[str] | None = None):
    """Format-dispatched corpus read: parquet (default), Lance when the
    wheel is present, JSONL (`.jsonl`/`.json`), CSV. Parquet/Lance prune
    columns at the scan; the row-oriented formats can't, so projection
    happens right after the read (still before the first exchange)."""
    import ray.data as rd

    if lance_available() and uri.endswith(".lance"):
        return rd.read_lance(uri, columns=columns)
    if uri.endswith((".jsonl", ".json")):
        ds = rd.read_json(uri)
        return ds.select_columns(columns) if columns else ds
    if uri.endswith(".csv"):
        ds = rd.read_csv(uri)
        return ds.select_columns(columns) if columns else ds
    if uri.endswith(".orc"):
        return read_orc(uri, columns=columns)
    return read_parquet_clean(uri, columns=columns)


def write_docs(ds, uri: str, **kwargs) -> None:
    if lance_available() and uri.endswith(".lance"):
        ds.write_lance(uri, **kwargs)
        return
    if uri.endswith((".jsonl", ".json")):
        ds.write_json(uri, **kwargs)
        return
    if uri.endswith(".csv"):
        ds.write_csv(uri, **kwargs)
        return
    if uri.endswith(".orc"):
        write_orc(ds, uri, **kwargs)
        return
    ds.write_parquet(uri, **kwargs)


def write_partitioned(ds, path: str, *, partition_cols: list[str],
                      **kwargs) -> None:
    """Hive-partitioned parquet sink (``path/col=value/…``): one
    directory per key value, so downstream reads prune whole partitions
    at the listing level and a failed run can re-do only missing keys.
    Thin wrapper over ``write_parquet(partition_cols=…)`` kept here so
    the partitioned-output layout has one named entry point."""
    ds.write_parquet(path, partition_cols=partition_cols, **kwargs)


def read_partition(path: str, *, column: str, value,
                   columns: list[str] | None = None):
    """Read ONE Hive partition directory (written by
    ``write_partitioned``) — storage-level pruning: only that
    partition's files are listed or opened. Routed through
    ``read_parquet_clean`` so pandas-metadata-bearing partitions don't
    reintroduce the unhashable-schema block-dedup failure."""
    return read_parquet_clean(f"{path}/{column}={value}", columns=columns)


class OrcDatasource:
    """ORC read support (Ray 2.49 has no ``read_orc``): a
    FileBasedDatasource whose per-file reader streams one Arrow table
    per ORC STRIPE — stripes are ORC's row-group analog, so a large
    file parallelizes at block granularity downstream and column
    pruning happens inside the stripe read (never materializing unread
    columns)."""

    def __new__(cls, paths, columns=None, **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _Orc(FileBasedDatasource):
            _FILE_EXTENSIONS = ["orc"]

            def __init__(self, p, cols, **kw):
                super().__init__(p, **kw)
                self._cols = cols

            def _open_input_source(self, filesystem, path, **open_args):
                # ORC footers/stripe indexes need RANDOM ACCESS; the
                # base class default opens a forward-only stream
                return filesystem.open_input_file(path)

            def _read_stream(self, f, path):
                import pyarrow as pa
                from pyarrow import orc

                of = orc.ORCFile(f)
                for i in range(of.nstripes):
                    batch = of.read_stripe(i, columns=self._cols)
                    yield pa.Table.from_batches([batch])

        return _Orc(paths, columns, **kwargs)


def read_orc(uri: str, *, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_datasource(OrcDatasource(uri, columns))


def write_orc(ds, path: str, **kwargs) -> None:
    """ORC sink via the BlockBasedFileDatasink API — one ORC file per
    block, written inside the tasks (distributed, never driver-side)."""
    from ray.data.datasource import BlockBasedFileDatasink

    class _OrcSink(BlockBasedFileDatasink):
        def __init__(self, p, **kw):
            super().__init__(p, file_format="orc", **kw)

        def write_block_to_file(self, block, file):
            from pyarrow import orc

            orc.write_table(block.to_arrow(), file)

    ds.write_datasink(_OrcSink(path, **kwargs))
