"""PII scrubbing for training-data pipelines.

Email/phone detection and redaction as pure JVM ``regexp_replace`` /
``regexp_count`` column expressions — whole-stage codegen, no Python in
the hot path, and exact ANSI-SQL oracles (the patterns are written in the
regex subset DuckDB's RE2 and Spark's java.util.regex agree on: character
classes, bounded repetition, no backrefs/lookaround).

At 100 TB this is a scan-local projection (no shuffle); the patterns ride
inside the same whole-stage-codegen stage as the quality features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Conservative, engine-portable patterns (no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"


def scrub_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Add ``text_scrubbed`` (emails/phones replaced by redaction tokens)
    plus ``n_emails`` / ``n_phones`` detection counts."""
    c = F.col(col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(c, F.lit(PHONE_RE)),
            "text_scrubbed": F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN),
                PHONE_RE,
                PHONE_TOKEN,
            ),
        }
    )
