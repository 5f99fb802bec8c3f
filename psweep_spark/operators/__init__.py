"""LLM-data-pipeline operators (beyond the reference surface; BASELINE
north star): dedup, similarity search, text analysis, multimodal
plumbing.  All hot paths are pure Catalyst expressions — Python UDFs
appear only where genuinely unavoidable (media decode stubs).
"""

from .dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_dedup,
    minhash_signatures,
    simhash,
    word_shingles,
)
from .similarity import brute_force_topk, lsh_topk, random_hyperplanes
from .text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    text_stats,
    token_count,
)
