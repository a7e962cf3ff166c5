"""Large-scale training-data pipeline operations over the synthetic
``documents`` and ``embeddings`` tables: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + LSH-bucketed
cosine), text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.

Everything stays JVM-side (pyspark.sql.functions — whole-stage codegen)
except where vectorized numpy over Arrow batches is genuinely needed
(SimHash bit-packing, embedding math beyond dot products).
"""

from .text import (bigram_lm_scores, doc_fingerprint,  # noqa: F401
                   language_id, quality_score, token_count)
from .dedup import (dedup_corpus, duplicate_clusters,  # noqa: F401
                    duplicate_clusters_star, exact_duplicates,
                    jaccard_duplicate_pairs, minhash_duplicate_pairs,
                    simhash_signatures)
from .similarity import (brute_force_topk,  # noqa: F401
                         lsh_bucketed_topk, semantic_dedup_pairs)
from .cleaning import benchmark_contamination, mask_pii  # noqa: F401
from .sampling import (pack_sequences,  # noqa: F401
                       sample_by_token_budget)
