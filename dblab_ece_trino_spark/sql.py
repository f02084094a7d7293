"""SQL entry point: 3-part-name rewrite then Catalyst passthrough.

Reference parity: Trino accepts ``catalog.schema.table`` everywhere a table
name may appear, including fully-qualified column references like
``psql.tpcds.store_sales.ss_sold_date_sk`` (reference queries/q005.sql:4).
Spark SQL only resolves 3-part names against registered DSv2 catalog
plugins, so the engine rewrites registered names (longest-first, outside of
string literals) to their mangled temp-view identifiers before handing the
text to ``spark.sql``.  Column-qualified references are covered for free:
``cat.sch.tab.col`` shares the ``cat.sch.tab`` prefix that gets rewritten.

The rewrite is purely lexical on *registered* names — unregistered 3-part
names fall through to Spark's own resolution (and its error messages).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from dblab_ece_trino_spark.catalog import CatalogRegistry

# Split on spans the rewriter must never touch: single-quoted string
# literals (with '' escapes), double-quoted and backquoted identifiers,
# line comments (-- ... end of line) and block comments (/* ... */).  A
# registered 3-part name appearing inside any of these is opaque text,
# not a table reference.
_LITERAL = re.compile(
    r"("
    r"'(?:[^']|'')*'"  # 'string literal'
    r"|\"(?:[^\"]|\"\")*\""  # "quoted identifier"
    r"|`(?:[^`]|``)*`"  # `quoted identifier`
    r"|--[^\n]*"  # -- line comment
    r"|/\*.*?\*/"  # /* block comment */
    r")",
    re.DOTALL,
)


def rewrite_three_part_names(text: str, catalogs: "CatalogRegistry") -> str:
    specs = catalogs.all_tables()
    if not specs:
        return text
    # Longest names first so e.g. a.b.c_long is not clobbered by a.b.c.
    specs = sorted(specs, key=lambda s: -len(s.full_name))
    patterns = [
        (
            re.compile(
                r"(?<![A-Za-z0-9_.])"
                + re.escape(s.full_name).replace(r"\.", r"\s*\.\s*")
                + r"(?![A-Za-z0-9_])",
                re.IGNORECASE,
            ),
            s.view_name,
        )
        for s in specs
    ]

    out: list[str] = []
    for i, chunk in enumerate(_LITERAL.split(text)):
        if i % 2 == 1:  # inside a string literal
            out.append(chunk)
            continue
        for pat, view in patterns:
            chunk = pat.sub(view, chunk)
        out.append(chunk)
    return "".join(out)
