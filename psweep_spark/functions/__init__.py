"""Engine function registry — every reusable Catalyst expression the
engine defines, in one importable namespace (all JVM-side, codegen-able;
no Python UDF in any hot path).

These are the building blocks behind the operators: the canonical pset
hash, retry-idempotent UUIDv5 stamping, vector math for similarity ops,
and the text-statistics expressions.
"""

from __future__ import annotations

from ..hashing import hash_expr, hash_sql
from ..operators.dedup import simhash, word_shingles
from ..operators.similarity import cosine_expr
from ..operators.text import doc_fingerprint, lang_id, quality_score, token_count
from ..runner import uuid5_expr

__all__ = [
    "hash_expr",
    "hash_sql",
    "uuid5_expr",
    "cosine_expr",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "word_shingles",
    "simhash",
]
