from .dedup import exact_dedup, shingle_docs, minhash_lsh_pairs, simhash
from .similarity import cosine_topk, lsh_ann_topk
from .text import text_quality, token_count, doc_fingerprint, langid
from .multimodal import binary_meta

__all__ = [
    "exact_dedup", "shingle_docs", "minhash_lsh_pairs", "simhash",
    "cosine_topk", "lsh_ann_topk",
    "text_quality", "token_count", "doc_fingerprint", "langid",
    "binary_meta",
]
