"""DuckDB-dialect → Spark SQL transpile shims.

The reference promises its users "the full DuckDB SELECT dialect"
(the transform-agent prompt at
``lambdas/transformation_agent/.../analyzer.py:35-77`` and chat
prompt ``lambdas/chat_api/prompt.py:24`` pin the surface actually
relied on). Almost all of it maps 1:1 to Spark SQL; this module
covers the names/clauses that differ. It is a deliberately
lightweight string-level pass (mirroring the reference's own regex
rewrites) — Catalyst parses the result, so a shim that misfires
surfaces as a parse error, never silent corruption.

Shimmed surface:

===================  =======================================
DuckDB               Spark
===================  =======================================
``epoch_ms(x)``      ``timestamp_millis(x)``
``to_timestamp(x)``  ``timestamp_seconds(x)`` (epoch-seconds,
                     DuckDB semantics; Spark's string-parsing
                     ``to_timestamp`` is reachable as
                     ``try_to_timestamp``/``cast``)
``epoch(ts)``        ``unix_timestamp(ts)``
``list_contains``    ``array_contains``
``array_length``     ``size``
``string_split``     ``split``
``str_split``        ``split``
``list_value``       ``array``
``regexp_matches``   ``rlike``
``* EXCLUDE (...)``  ``* EXCEPT (...)``
``QUALIFY pred``     subquery + ``WHERE`` on a helper column
===================  =======================================

``len`` and ``||`` and ``DATE(x)`` already exist in Spark ≥3.4 and
need no shim. ``* REPLACE`` is not shimmed (no stored reference query
uses it); document as unsupported.
"""

from __future__ import annotations

import re

_FUNCTION_RENAMES: dict[str, str] = {
    "epoch_ms": "timestamp_millis",
    "to_timestamp": "timestamp_seconds",
    "epoch": "unix_timestamp",
    "list_contains": "array_contains",
    "array_length": "size",
    "string_split": "split",
    "str_split": "split",
    "list_value": "array",
    "regexp_matches": "rlike",
}

_RENAME_RE = re.compile(
    r"\b(" + "|".join(_FUNCTION_RENAMES) + r")\s*\(", re.IGNORECASE
)
_EXCLUDE_RE = re.compile(r"(\*\s*)EXCLUDE(\s*\()", re.IGNORECASE)

_QUALIFY_HELPER = "__qualify__"


def _rename_functions(sql: str) -> str:
    return _RENAME_RE.sub(
        lambda m: _FUNCTION_RENAMES[m.group(1).lower()] + "(", sql
    )


def _split_protected(sql: str, keyword_re: re.Pattern[str]) -> list[int]:
    """Offsets of keyword matches at paren-depth 0, outside string
    literals. Used to find top-level QUALIFY / ORDER BY / LIMIT."""
    hits: list[int] = []
    depth = 0
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = keyword_re.match(sql, i)
            if m:
                hits.append(i)
                i = m.end()
                continue
        i += 1
    return hits


_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_TAIL_RE = re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE)


def _rewrite_qualify(sql: str) -> str:
    """Rewrite a top-level ``QUALIFY <pred>`` into a subquery.

    ``SELECT <list> FROM ... QUALIFY <pred> [ORDER BY/LIMIT tail]``
    becomes::

        SELECT * EXCEPT (__qualify__) FROM (
            SELECT <list>, (<pred>) AS __qualify__ FROM ...
        ) WHERE __qualify__ [tail]

    Works because Spark evaluates window functions in the projection
    and ``* EXCEPT`` drops the helper column. Only the *last*
    top-level QUALIFY is handled per pass; nested/CTE qualifies are
    handled by recursing on parenthesized blocks.
    """
    hits = _split_protected(sql, _QUALIFY_RE)
    if not hits:
        # Recurse into parenthesized subqueries / CTE bodies.
        out: list[str] = []
        i = 0
        n = len(sql)
        while i < n:
            ch = sql[i]
            if ch == "(":
                depth = 1
                j = i + 1
                while j < n and depth:
                    if sql[j] == "'":
                        k = j + 1
                        while k < n and sql[k] != "'":
                            k += 1
                        j = k
                    elif sql[j] == "(":
                        depth += 1
                    elif sql[j] == ")":
                        depth -= 1
                    j += 1
                inner = sql[i + 1 : j - 1]
                if _QUALIFY_RE.search(inner):
                    inner = _rewrite_qualify(inner)
                out.append("(" + inner + ")")
                i = j
            else:
                out.append(ch)
                i += 1
        return "".join(out)

    pos = hits[-1]
    head = sql[:pos]
    rest = sql[pos:]
    rest = _QUALIFY_RE.sub("", rest, count=1)
    tail_hits = _split_protected(rest, _TAIL_RE)
    if tail_hits:
        pred = rest[: tail_hits[0]]
        tail = rest[tail_hits[0] :]
    else:
        pred, tail = rest, ""

    # Inject the helper column after the SELECT list of the SELECT
    # that owns this QUALIFY: the last top-level FROM before it.
    from_hits = _split_protected(head, re.compile(r"\bFROM\b", re.IGNORECASE))
    if not from_hits:
        return sql  # malformed; let Spark raise
    from_pos = from_hits[-1]
    select_list_end = from_pos
    inner = (
        head[:select_list_end]
        + f", ({pred.strip()}) AS {_QUALIFY_HELPER} "
        + head[select_list_end:]
    )
    return (
        f"SELECT * EXCEPT ({_QUALIFY_HELPER}) FROM ({inner}) "
        f"WHERE {_QUALIFY_HELPER} {tail}"
    )


def transpile(sql: str) -> str:
    """Full dialect pass: function renames, EXCLUDE→EXCEPT, QUALIFY."""
    sql = _rename_functions(sql)
    sql = _EXCLUDE_RE.sub(r"\1EXCEPT\2", sql)
    if _QUALIFY_RE.search(sql):
        sql = _rewrite_qualify(sql)
    return sql
