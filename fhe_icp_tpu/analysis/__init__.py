"""Analysis & benchmarking utilities (reference parity: SURVEY.md §2 #9-11).

* quantization — n_bits sweep: accuracy vs circuit width vs FHE latency
  (reference quantization_strategy.py)
* alternatives — FHE-friendly similarity metrics benchmarked against true
  cosine (reference similarity_alternatives.py)
* reduction — PCA/SVD/random-projection sweep with similarity-preservation
  metrics (reference dimension_reduction.py:125-250)
* linear_math — proof-by-experiment that linear models on concatenated
  embeddings cannot learn cosine, while element-wise products can
  (reference analyze_similarity_math.py)
"""

from . import alternatives, linear_math, quantization, reduction  # noqa: F401
