"""Text scrubbing/redaction for training-data pipelines: URLs, emails,
phone-ish numbers, long digit runs — pure `regexp_replace` chains
(whole-stage codegen; zero Python).

The pattern set is deliberately conservative (high precision): training
corpora lose more value to over-redaction than to a missed phone
number. Each pattern is applied in order; placeholders are stable
tokens so downstream dedup still works on scrubbed text.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement) — order matters: URLs before bare domains,
# emails before phone-ish digit runs.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # phone requires ≥1 separator between digits so bare digit runs
    # (account numbers) fall through to the long_digits rule instead
    ("phone", r"\+?\d[\d().-]*[\s().-]+[\d\s().-]{5,}\d", "<PHONE>"),
    ("long_digits", r"\b\d{9,}\b", "<NUM>"),
]


def scrub_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in SCRUB_RULES:
        c = F.regexp_replace(c, pattern, repl)
    return c


def with_scrubbed_text(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Adds the scrubbed text plus a per-rule hit flag column (which
    rules ACTUALLY fired — the audit signal a curation run reports).

    Each flag is evaluated against the progressively-scrubbed
    intermediate, in the same chain order scrub_text applies: a flag
    matched against the ORIGINAL text would report rules whose match
    was already swallowed by an earlier rule (an email inside a URL),
    contradicting the placeholder counts an auditor reconciles."""
    out = df.withColumn(out_col, scrub_text(text_col))
    stage = F.col(text_col)
    for name, pattern, repl in SCRUB_RULES:
        out = out.withColumn(f"hit_{name}", stage.rlike(pattern))
        stage = F.regexp_replace(stage, pattern, repl)
    return out
