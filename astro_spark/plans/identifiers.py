"""Identifier-safe ``{{param}}`` substitution for SQL text.

Reference: user SQL in ``transform``/``run_raw_sql`` uses Jinja-ish
``{{table}}`` placeholders; Table params are rendered as safe identifiers
and scalar params become bind parameters
(``sql/operators/base_decorator.py:240-272``; Snowflake's
``IDENTIFIER(:t)`` trick at ``databases/snowflake.py:789-829``).

Spark rebuild: Table params → validated identifiers interpolated into the
text (validated against a strict allowlist, see ``table.validate_identifier``);
scalar params → SQL literals rendered with proper escaping (Spark's
``spark.sql(..., args=...)`` named markers would also work, but literal
rendering keeps the rendered SQL text inspectable/loggable, matching the
reference's golden-SQL tests).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

from ..exceptions import IllegalIdentifierError
from ..table import Table, validate_identifier

_PLACEHOLDER_RE = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


def render_literal(value: Any) -> str:
    """Render a Python scalar as a safe SQL literal."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, (_dt.datetime,)):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, str):
        escaped = value.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(value, (list, tuple)):
        return "(" + ", ".join(render_literal(v) for v in value) + ")"
    raise IllegalIdentifierError(f"cannot render SQL literal for {type(value)}")


def render_sql(sql: str, params: dict[str, Any]) -> str:
    """Substitute ``{{name}}`` placeholders.

    Table values → their (validated) qualified names; everything else →
    escaped literals.  Unknown placeholders raise.
    """

    def _sub(match: re.Match) -> str:
        key = match.group(1)
        if key not in params:
            raise IllegalIdentifierError(f"unbound SQL template parameter {{{{{key}}}}}")
        value = params[key]
        if isinstance(value, Table):
            if value.temp:
                return validate_identifier(value.name)
            return ".".join(
                validate_identifier(p) for p in value.qualified_name.split(".")
            )
        if isinstance(value, str) and params.get(f"__ident_{key}__"):
            return validate_identifier(value)
        return render_literal(value)

    return _PLACEHOLDER_RE.sub(_sub, sql)
