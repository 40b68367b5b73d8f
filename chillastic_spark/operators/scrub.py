"""Text scrubbing/redaction for training-data pipelines: URLs, emails,
phone-ish numbers, long digit runs — pure `regexp_replace` chains
(whole-stage codegen; zero Python).

The pattern set is deliberately conservative (high precision): training
corpora lose more value to over-redaction than to a missed phone
number. Each pattern is applied in order; placeholders are stable
tokens so downstream dedup still works on scrubbed text.

Cross-engine contract: these patterns are interpolated VERBATIM into
the DuckDB oracle (queries/analytics8._pii_sql), so they must avoid
every Java-vs-RE2 divergence — no ``\\s`` (Java includes \\x0B, RE2
does not: spell the whitespace class explicitly, the repo-wide rule
from functions.WS_CHARS) and no lookarounds (RE2 has none).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r" \t\n\x0b\f\r"  # explicit Java==RE2 whitespace class

# (name, regex, replacement) — order matters: URLs before bare domains,
# emails before phone-ish digit runs.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("url", rf"https?://[^{_WS}]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # phone: the classic grouped shapes only — optional +CC, optional
    # (area), 3-3-4 groups with single space/dash separators. The old
    # looser pattern accepted '.'/'-' runs alone as separators and
    # redacted decimals ('pi is 3.14159265'), IPs, and date pairs —
    # exactly the over-redaction the module contract forbids. No dots:
    # dotted phones sacrifice recall for decimal/IP/version precision.
    (
        "phone",
        r"(\+\d{1,2}[- ]?)?(\(\d{3}\)|\b\d{3})[- ]?\d{3}[- ]?\d{4}\b",
        "<PHONE>",
    ),
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
    contradicting the placeholder counts an auditor reconciles. The
    final intermediate IS the scrubbed text (one chain, one place to
    edit — a separately-built out_col could silently diverge from what
    the flags describe)."""
    stage = F.col(text_col)
    flags = []
    for name, pattern, repl in SCRUB_RULES:
        flags.append((f"hit_{name}", stage.rlike(pattern)))
        stage = F.regexp_replace(stage, pattern, repl)
    out = df.withColumn(out_col, stage)
    for name, flag in flags:
        out = out.withColumn(name, flag)
    return out
