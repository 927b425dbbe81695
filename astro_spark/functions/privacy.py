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


#: PII span patterns, ordered — ``redact_all`` applies them in dict
#: order, so e-mails are scrubbed before the looser URL pattern could
#: swallow their domain part.  All are RE2-safe AND Java-regex-safe
#: (no lookaround, no backrefs; alternation-free), so Spark and the
#: DuckDB oracle match the exact same spans.
PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_PATTERN,
    "url": r"https?://[A-Za-z0-9./_-]+",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}",
}


def pii_stats(col: Column | str) -> dict[str, Column]:
    """Per-row PII span counts: one ``n_<kind>`` column per pattern in
    ``PII_PATTERNS`` (built-in ``regexp_count`` — JVM-side, map-only).

    This is the audit half of the privacy pass: count before you
    scrub, so the pipeline can report what it removed per source.
    """
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{kind}": F.regexp_count(c, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_all(
    col: Column | str,
    patterns: dict[str, str] | None = None,
) -> Column:
    """Chain-redact every pattern (dict order): each kind is replaced
    by its ``[KIND]`` marker.  One map-only projection — the chained
    regexp_replace calls fuse into a single codegen stage."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in (patterns or PII_PATTERNS).items():
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c
