"""Privacy primitives for training-data pipelines: stable
pseudonymization and pattern redaction.

Both are map-only projections (built-in functions, codegen-friendly) —
the shapes a 100 TB pre-training corpus pass needs: replace stable
joinable identifiers with salted digests, and scrub PII-looking spans
from text before anything downstream sees them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: conservative e-mail-ish span (RE2-safe: no lookaround, disjoint parts)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def pseudonymize(col: Column | str, salt: str) -> Column:
    """Salted SHA-256 digest (hex) of the value — stable within a salt
    (joins/grouping still work) and unlinkable across salts.

    Identical on the oracle side: DuckDB ``sha256(salt || '|' || x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(salt), F.lit("|"), c.cast("string")), 256)


def redact(
    col: Column | str,
    pattern: str = EMAIL_PATTERN,
    replacement: str = "[REDACTED]",
) -> Column:
    """Replace every match of ``pattern`` with ``replacement``.

    Default pattern scrubs e-mail-ish spans; pass phone/SSN/custom
    patterns as needed.  Global replacement in both engines (Spark
    ``regexp_replace`` replaces all; DuckDB needs the ``'g'`` flag).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, replacement)
