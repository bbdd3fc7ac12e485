"""PII redaction over text columns — the scrub pass every public-crawl
training corpus runs before tokenization (emails / IP addresses / phone
numbers replaced by typed placeholder tokens, per-doc match counts kept
for audit).

Engine shape: pure map-side streaming — one ``map_batches`` pass,
vectorized pandas ``.str.count`` / ``.str.replace`` with module-level
pre-compiled patterns, no exchange, no per-row Python.  At 100 TB the
sink is ``write_parquet`` of the redacted column; the oracle query
collects only because the harness hashes the result.

Pattern-dialect contract: every pattern below is restricted to the
syntax subset Python ``re`` and RE2 (DuckDB ``regexp_replace``) evaluate
identically — character classes, bounded repetition, ``\\b`` word
boundaries; NO lookaround, NO backreferences (RE2 has neither).  The
oracle (queries.SQL_PII_SCRUB) applies the same patterns with DuckDB's
``'g'`` flag, so a dialect divergence breaks the value-hash match.

Redaction ORDER is part of the contract: emails are counted+replaced
first, then IPv4, then phones, each against the PREVIOUS stage's output
(an IPv4-looking email domain must not be double-counted).  The SQL twin
chains its CTEs in the same order.

Reference scope note: the reference engine (PyNomaly,
reference/PyNomaly/loop.py) has no text operators; this belongs to the
LLM-data-pipeline family layered on top of the reference's surface.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# Dialect-portable patterns (see module docstring).  Kept deliberately
# simple — the goal is the *engine machinery* (ordered multi-pattern
# scrub, counts, streaming), not a production-grade PII taxonomy.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def scrub_batch(texts: pd.Series) -> tuple[pd.Series, dict[str, pd.Series]]:
    """(redacted texts, {kind: per-row match counts}) for one batch.
    Counts are taken BEFORE each pattern's own replacement, AFTER all
    earlier patterns' replacements (the ordered contract above)."""
    s = texts.fillna("")
    counts: dict[str, pd.Series] = {}
    for name, rx, repl in _COMPILED:
        counts[name] = s.str.count(rx).astype("int64")
        s = s.str.replace(rx, repl, regex=True)
    return s, counts


def pii_scrub(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc (id, redacted text, n_email, n_ipv4, n_phone).  One
    streaming pass; schema-stable across empty batches."""

    def scrub(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pandas()
        red, counts = scrub_batch(texts)
        return pa.table(
            {
                id_col: t[id_col],
                "text_red": pa.array(red, type=pa.string()),
                "n_email": pa.array(counts["email"].to_numpy()),
                "n_ipv4": pa.array(counts["ipv4"].to_numpy()),
                "n_phone": pa.array(counts["phone"].to_numpy()),
            }
        )

    return docs_ds.map_batches(scrub, batch_format="pyarrow")
