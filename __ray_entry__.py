"""Driver contract for the Ray-Data-native magic-content-extractor engine.

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (same column names on
both sides). Ray is initialised by the driver — nothing here calls
``ray.init``/``ray.shutdown``.

The query bodies live in ``magic_content_extractor_ray/queries/<family>.py``
(round-5 verdict item 3: the former 20.9k-line monolith is now a thin
re-export); this file stays import-compatible for the driver, tests and
tools — every ``q_*`` callable and the shared helpers are re-exported.
"""
from __future__ import annotations

import os as _os
import sys as _sys

# the driver imports this file by path (spec_from_file_location); make the
# package resolvable regardless of the caller's sys.path
_here = _os.path.dirname(_os.path.abspath(__file__))
if _here not in _sys.path:
    _sys.path.insert(0, _here)

from magic_content_extractor_ray import queries as _registry  # noqa: E402
from magic_content_extractor_ray.queries import (  # noqa: E402,F401
    entry, oracle_sql, queries)
from magic_content_extractor_ray.queries._common import (  # noqa: E402,F401
    _ANN_K, _ANN_NQ, _ASCII_WORD_RE, _EVENT_TYPES, _ascii_words,
    _batch_topk, _bincount_i64, _pool, _read_pq, _tag_set_overlap,
    _ws_split_lists)
from magic_content_extractor_ray.queries.dedup import _CDC_BJ  # noqa: E402,F401
from magic_content_extractor_ray.queries.graph import (  # noqa: E402,F401
    MAX_USER_ITEMS, _cap_user_items, _covis_pair_counts)

for _n in dir(_registry):
    if _n.startswith("q_"):
        globals()[_n] = getattr(_registry, _n)
del _n
