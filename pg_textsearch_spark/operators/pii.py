"""PII detection + redaction for training-data pipelines.

The standard pre-training hygiene pass (C4, The Pile, RefinedWeb all
strip or mask these classes): emails, IPv4 addresses, SSN-shaped ids
and phone-shaped digit runs are detected with regexes that parse
identically under Java regex (Spark) and RE2 (DuckDB) — no lookarounds,
no backreferences — and replaced by class tokens in a FIXED order
(email > ssn > ipv4 > phone, so the narrower classes are consumed
before the digit-run fallback can eat them).

100 TB shape: a pure map — counts and redaction are per-row JVM
``regexp_extract_all`` / ``regexp_replace`` expressions inside
whole-stage codegen; zero shuffles except the presentation orderBy.
The redacted text is emitted as sha256 so the oracle compares the FULL
redaction output without shipping megabytes through the compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: applied top to bottom
PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII counts + sha256 of the redacted text:
    (doc_id, n_email, n_ssn, n_ipv4, n_phone, clean_sha256)."""
    t = F.col(text_col)
    counts = [F.size(F.regexp_extract_all(t, F.lit(pat), 0))
              .cast("long").alias(f"n_{name}")
              for name, pat, _ in PII_PATTERNS]
    clean = t
    for _, pat, tok in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, tok)
    return (docs.select(F.col(id_col).alias("doc_id"), *counts,
                        F.sha2(clean, 256).alias("clean_sha256"))
            .orderBy("doc_id"))


def pii_scrub_oracle_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    counts = ",\n       ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    clean = text_col
    for _, pat, tok in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{tok}', 'g')"
    return f"""
SELECT {id_col} AS doc_id,
       {counts},
       sha256({clean}) AS clean_sha256
FROM {table}
ORDER BY doc_id
"""
