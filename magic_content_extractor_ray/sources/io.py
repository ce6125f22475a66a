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


def read_docs(uri: str, *, columns: list[str] | None = None):
    import ray.data as rd

    if lance_available() and uri.endswith(".lance"):
        return rd.read_lance(uri, columns=columns)
    return rd.read_parquet(uri, columns=columns)


def write_docs(ds, uri: str, **kwargs) -> None:
    if lance_available() and uri.endswith(".lance"):
        ds.write_lance(uri, **kwargs)
        return
    ds.write_parquet(uri, **kwargs)
