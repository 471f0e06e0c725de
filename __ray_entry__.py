"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; no
function here (nor the library code they use) calls ``ray.init`` /
``ray.shutdown``.

- ``entry()``: flagship corpus validation on /root/testdata/sf0.001 —
  derives the interleaved (doc_id, spans) corpus from the testdata
  documents table, scores media with the butteraugli actor pool, runs
  structural + perceptual + uniqueness checks, returns the violation
  rows.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data additions).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query (column names and rounding match the Ray side exactly).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from butteraugli_ray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from butteraugli_ray.pipelines.queries import q_validate_corpus
    return q_validate_corpus("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from butteraugli_ray.pipelines.queries import dynamic_oracles
    out = dict(ORACLE_SQL)
    out.update(dynamic_oracles())
    return out
