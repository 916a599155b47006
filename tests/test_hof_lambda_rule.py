"""Source-scan gate for the r12 LSH band bug's root cause.

PySpark's higher-order functions (``F.transform``, ``F.aggregate``,
``F.zip_with``, ``F.filter``, ``F.exists``, ``F.forall``, ...) pick
which SQL lambda form to build from the PYTHON PARAMETER COUNT of the
callable they are handed.  The r6-r11 MinHash banding used the
``lambda t, _j=j:`` default-arg idiom to freeze a loop variable; the
defaulted second parameter silently selected the two-argument
``(element, position)`` ``transform`` form and the position column
OVERRODE the captured ``j`` — band hashes keyed on gram *position*
instead of the hash-family index, so candidate recall did not follow
the documented ``1-(1-s^r)^b`` MinHash curve (docs/scale.md, r12).

The rule (docs/scale.md): NEVER give a Python HOF lambda extra
defaulted parameters — freeze loop variables through a closure
factory instead.  This test enforces the rule mechanically over the
whole package so the idiom cannot recur: it walks every ``.py`` file
and flags any ``lambda`` carrying default values that appears
anywhere inside the arguments of a higher-order-function call.
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# pyspark.sql.functions HOFs whose SQL lambda arity is inferred from
# the Python callable's parameter count (pyspark/sql/functions/builtin.py,
# _create_lambda: "len(parameters)" selects the UnresolvedNamedLambdaVariable
# count).  array_sort's optional comparator included for completeness.
HOF_NAMES = frozenset(
    {
        "transform",
        "aggregate",
        "reduce",
        "zip_with",
        "filter",
        "exists",
        "forall",
        "map_filter",
        "map_zip_with",
        "transform_keys",
        "transform_values",
        "array_sort",
    }
)

# Scan the package, the driver entry, and the tools — everywhere
# Column expressions are built.
SCAN_ROOTS = [
    REPO / "serverless_data_lake_spark",
    REPO / "tools",
    REPO / "__spark_entry__.py",
    REPO / "bench.py",
]


def _hof_call_name(node: ast.Call) -> str | None:
    """Return the HOF name if ``node`` is a call to one, else None.

    Matches ``F.transform(...)``, ``functions.transform(...)``, bare
    ``transform(...)`` — any attribute or name whose terminal
    identifier is an HOF name.  Over-matching (e.g. a local helper
    coincidentally called ``filter``) is acceptable: the rule —
    no defaulted-lambda arguments — is harmless to enforce on
    non-Spark callables too, and the package has no such collisions.
    ``str.filter``-style builtins take no lambda-with-defaults either.
    """
    f = node.func
    if isinstance(f, ast.Attribute) and f.attr in HOF_NAMES:
        return f.attr
    if isinstance(f, ast.Name) and f.id in HOF_NAMES:
        return f.id
    return None


def find_defaulted_hof_lambdas(
    source: str, filename: str = "<str>"
) -> list[tuple[str, int, str]]:
    """All (file, line, hof_name) where a lambda with default values
    appears anywhere inside the arguments of an HOF call — including
    nested (the r6 bug built the defaulted lambda inside an outer
    lambda handed to ``transform``)."""
    hits: list[tuple[str, int, str]] = []
    tree = ast.parse(source, filename=filename)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        name = _hof_call_name(node)
        if name is None:
            continue
        for arg in list(node.args) + [kw.value for kw in node.keywords]:
            for sub in ast.walk(arg):
                if isinstance(sub, ast.Lambda) and (
                    sub.args.defaults or sub.args.kw_defaults
                ):
                    hits.append((filename, sub.lineno, name))
    return hits


def _iter_py_files():
    for root in SCAN_ROOTS:
        if root.is_file():
            yield root
        else:
            yield from sorted(root.rglob("*.py"))


def test_checker_is_red_on_the_r6_idiom():
    """The exact shape that shipped the band bug must be flagged."""
    r6 = (
        "for j in range(rows):\n"
        "    col = F.transform(sigs, lambda t, _j=j: t[_j])\n"
    )
    hits = find_defaulted_hof_lambdas(r6)
    assert hits and hits[0][2] == "transform"

    # ... including when the defaulted lambda is NESTED inside the
    # outer lambda handed to the HOF (the actual r6 call site shape).
    nested = (
        "expr = F.transform(\n"
        "    bands,\n"
        "    lambda b: F.aggregate(\n"
        "        grams, init, lambda acc, g, _b=b: step(acc, g, _b)\n"
        "    ),\n"
        ")\n"
    )
    hits = find_defaulted_hof_lambdas(nested)
    assert "aggregate" in {h[2] for h in hits}


def test_checker_is_green_on_the_closure_factory_fix():
    fixed = (
        "def _band_fn(j):\n"
        "    def fn(t):\n"
        "        return t[j]\n"
        "    return fn\n"
        "col = F.transform(sigs, _band_fn(j))\n"
        "ok = F.transform(sigs, lambda t: t + 1)\n"
    )
    assert find_defaulted_hof_lambdas(fixed) == []


def test_no_defaulted_hof_lambda_anywhere_in_the_repo():
    hits: list[tuple[str, int, str]] = []
    for path in _iter_py_files():
        rel = str(path.relative_to(REPO))
        if rel.startswith("tests/"):
            continue
        hits.extend(
            find_defaulted_hof_lambdas(path.read_text(), rel)
        )
    assert hits == [], (
        "defaulted lambda inside a PySpark HOF call — the parameter "
        "count selects the SQL lambda form, so the default silently "
        f"changes semantics (docs/scale.md, r12 band bug): {hits}"
    )
