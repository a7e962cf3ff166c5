"""Large-scale training-data pipeline operations over the synthetic
``documents`` and ``embeddings`` tables: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + LSH-bucketed
cosine), text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.

Everything stays JVM-side (pyspark.sql.functions — whole-stage codegen)
except where vectorized numpy over Arrow batches is genuinely needed
(SimHash bit-packing, embedding math beyond dot products).
"""

from .text import (doc_fingerprint, language_id, quality_score,  # noqa: F401
                   token_count)
from .dedup import (exact_duplicates, jaccard_duplicate_pairs,  # noqa: F401
                    minhash_duplicate_pairs, simhash_signatures)
from .similarity import (brute_force_topk,  # noqa: F401
                         lsh_bucketed_topk)
