from .freq import (count_min_build, count_min_estimate, count_min_merge,
                   heavy_hitters, hll_estimate, hll_merge, hll_sketch)
from .dedup import (
    bloom_filter_build, bloom_filter_probe,
    connected_components, dedup_clusters, dedup_ladder, dedup_spans,
    dedup_substrings,
    exact_dedup, incremental_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, shingle_docs, simhash,
    simhash_hamming_pairs,
    hamming_pairs,
)
from .similarity import (
    cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
    decontaminate_semantic,
    embedding_near_dup_pairs,
    embedding_outliers,
    ivf_ann_topk,
    lsh_ann_topk,
    semantic_dedup,
)
from .text import text_quality, token_count, doc_fingerprint, langid, quality_filter_gopher, repetition_filter_gopher, chunk_documents, c4_line_filter, badwords_filter, pii_scrub, sample_stratified, bpe_pair_counts, tfidf_keywords, corpus_stats, normalize_text
from .bpe import bpe_learn, bpe_learn_py, bpe_encode, bpe_encode_word, bpe_token_ids, bpe_vocab
from .curation import curation_pipeline
from .boilerplate import boilerplate_blocks
from .classifier import feature_bucket, hashed_features, quality_classifier
from .corpus import (
    corpus_build, decontaminate, mixture_sample, pack_sequences, shuffle_corpus, split_corpus, dataset_build,
    temperature_budgets,
)
from .urls import url_filter, url_normalize_exprs
from .lm import (
    bigram_lm,
    importance_resample,
    importance_weights,
    kn_perplexity,
    perplexity_score,
    unigram_lm,
)
from .html import extract_html_text, html_text_expr, warc_to_wet
from .graph import harmonic_centrality, hits, hyperball, pagerank
from .links import anchor_stats, crawl_frontier, extract_links, host_edges, parse_sitemap, resolve_href
from .robots import parse_robots_rules, robots_filter, robots_sitemaps, robots_crawl_delay
from .multimodal import binary_meta, extract_features, frame_sample, resize_image, image_ahash, image_near_dup

__all__ = [
    "exact_dedup", "dedup_substrings", "dedup_ladder", "dedup_spans", "shingle_docs", "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash", "simhash_hamming_pairs", "hamming_pairs", "image_ahash", "image_near_dup",
    "bloom_filter_build", "bloom_filter_probe",
    "count_min_build", "count_min_estimate", "count_min_merge", "heavy_hitters",
    "hll_sketch", "hll_merge", "hll_estimate",
    "connected_components", "dedup_clusters",
    "cosine_topk", "quantize_embeddings", "quantized_cosine_topk", "lsh_ann_topk", "ivf_ann_topk", "embedding_near_dup_pairs", "embedding_outliers",
    "decontaminate_semantic",
    "semantic_dedup", "bpe_pair_counts", "pagerank", "tfidf_keywords",
    "bpe_learn", "bpe_learn_py", "bpe_encode", "bpe_encode_word", "bpe_token_ids", "bpe_vocab",
    "parse_robots_rules", "robots_filter", "robots_sitemaps", "robots_crawl_delay", "incremental_dedup", "corpus_stats", "normalize_text",
    "text_quality", "quality_filter_gopher", "repetition_filter_gopher", "token_count", "doc_fingerprint", "langid",
    "binary_meta", "extract_features", "frame_sample", "resize_image",
    "chunk_documents", "c4_line_filter", "badwords_filter", "curation_pipeline", "pii_scrub", "sample_stratified",
    "corpus_build", "decontaminate", "mixture_sample", "pack_sequences", "shuffle_corpus", "split_corpus", "dataset_build",
    "temperature_budgets",
    "url_filter", "url_normalize_exprs",
    "perplexity_score", "unigram_lm", "extract_html_text", "html_text_expr", "warc_to_wet",
    "extract_links", "host_edges", "resolve_href",
    "anchor_stats", "crawl_frontier", "parse_sitemap", "hyperball", "harmonic_centrality", "hits",
    "importance_weights", "importance_resample", "bigram_lm", "kn_perplexity",
    "quality_classifier", "hashed_features", "feature_bucket",
    "boilerplate_blocks",
]
