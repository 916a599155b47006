"""Auto-chart heuristic (reference ``lambdas/chat_api/tools.py:94-128``).

Pure-Python, engine-agnostic: given query results (list of dicts) and
the originating SQL/question text, produce a chart spec or None.

Rules replicated from the reference:
- need ≥ 2 rows and ≥ 1 numeric column;
- x axis = first string-ish column (else the first column);
- y axes = up to 3 numeric columns;
- ``line`` if x looks like a date/timestamp, ``pie`` if the question
  mentions share/percent/proportion (single y), else ``bar``;
- data capped at 50 points.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

MAX_POINTS = 50

_DATEISH_RE = re.compile(r"^\d{4}-\d{2}(-\d{2})?([T ].*)?$")
_SHARE_RE = re.compile(r"\b(share|percent|percentage|proportion|breakdown)\b", re.I)


def _is_numeric(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _is_dateish(v: Any) -> bool:
    if isinstance(v, (_dt.date, _dt.datetime)):
        return True
    return isinstance(v, str) and bool(_DATEISH_RE.match(v))


def suggest_chart(
    rows: list[dict[str, Any]], question: str = ""
) -> dict[str, Any] | None:
    if len(rows) < 2:
        return None
    sample = rows[0]
    numeric_cols = [k for k, v in sample.items() if _is_numeric(v)]
    if not numeric_cols:
        return None
    string_cols = [
        k for k, v in sample.items()
        if isinstance(v, str) or _is_dateish(v)
    ]
    x = string_cols[0] if string_cols else list(sample)[0]
    ys = [c for c in numeric_cols if c != x][:3]
    if not ys:
        return None

    if _SHARE_RE.search(question) and len(ys) >= 1:
        chart_type = "pie"
        ys = ys[:1]
    elif _is_dateish(sample.get(x)):
        chart_type = "line"
    else:
        chart_type = "bar"

    data = [
        {x: _coerce(r.get(x)), **{y: r.get(y) for y in ys}}
        for r in rows[:MAX_POINTS]
    ]
    return {"type": chart_type, "x": x, "y": ys, "data": data}


def _coerce(v: Any) -> Any:
    if isinstance(v, (_dt.date, _dt.datetime)):
        return v.isoformat()
    return v
