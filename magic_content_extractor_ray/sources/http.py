"""URL fetch source — the reference's live-HTTP entry point as a stage.

The reference fetches one URL per API request with browser-mimicking
headers and rejects non-OK or too-short bodies
(/root/reference/app/api/extract/route.ts:184-217). Here the same
semantics become a Ray Data source stage: a url-list Dataset flows
through an actor-pool ``map_batches`` whose fetcher is INJECTABLE —
this sandbox has no network, so tests inject a deterministic fake, and a
real deployment either uses the default stdlib ``urllib`` fetcher or
injects its own (retry/proxy/rate-limit policy lives in the fetcher).

Failure semantics match the extract actor's: a failing URL produces a
row with ``error`` set and empty text — one bad URL never poisons a
batch (route.ts returns HTTP 500 per request; the batch engine must
degrade per row instead).
"""

from __future__ import annotations

import pyarrow as pa

# route.ts:186-199 — browser-mimicking request headers
DEFAULT_HEADERS = {
    "User-Agent": ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                   "AppleWebKit/537.36 (KHTML, like Gecko) "
                   "Chrome/122.0.0.0 Safari/537.36"),
    "Accept": ("text/html,application/xhtml+xml,application/xml;"
               "q=0.9,*/*;q=0.8"),
    "Accept-Language": "en-US,en;q=0.9",
}

# route.ts:215-217 — bodies shorter than this are rejected
MIN_BODY_CHARS = 100


def default_fetcher(url: str, *, timeout: float = 20.0) -> str:
    """stdlib urllib GET with the reference's header set; raises on
    non-2xx (urllib does) and on short bodies (route.ts:215-217)."""
    from urllib.request import Request, urlopen

    req = Request(url, headers=DEFAULT_HEADERS)
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 - by design
        charset = resp.headers.get_content_charset() or "utf-8"
        html = resp.read().decode(charset, "replace")
    if len(html) < MIN_BODY_CHARS:
        raise ValueError(
            f"body too short ({len(html)} chars < {MIN_BODY_CHARS})")
    return html


class _FetchActor:
    """Stateful stage: the fetcher (connection pools, auth, rate
    limiter) is constructed once per actor."""

    def __init__(self, fetcher=None, timeout: float = 20.0):
        self.timeout = timeout
        if fetcher is None:
            self.fetch = lambda u: default_fetcher(u, timeout=timeout)
        else:
            self.fetch = fetcher

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts, errors = [], []
        for u in urls:
            try:
                texts.append(self.fetch(u))
                errors.append("")
            except Exception as ex:  # noqa: BLE001 - per-row degradation
                texts.append("")
                errors.append(f"{type(ex).__name__}: {ex}")
        return pa.table({
            "doc_id": pa.array(urls, pa.string()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        })


def read_urls(urls, *, fetcher=None, timeout: float = 20.0,
              batch_size: int = 16, concurrency=None):
    """URL list (or a Dataset with a ``url`` column) → Dataset of
    ``(doc_id, url, text, error)`` rows, fetched by an actor pool.

    ``fetcher``: ``callable(url) -> html`` injected into every actor;
    defaults to the stdlib fetcher with the reference's header set.
    Chain ``sources/html_table.html_docs_to_spans`` + the extract
    pipeline to run fetched pages through the full engine.
    """
    import ray.data as rd

    from ..util import actor_pool

    if not isinstance(urls, rd.Dataset):
        urls = rd.from_items([{"url": u} for u in urls])
    return urls.map_batches(
        _FetchActor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or actor_pool(),
        fn_constructor_kwargs=dict(fetcher=fetcher, timeout=timeout))
