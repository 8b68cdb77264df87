"""Large-scale training-data operations over Ray Data.

Beyond the reference's own operators (SURVEY §2), these are the operations a
100 TB web-text training-data pipeline needs: deduplication (exact, MinHash-
LSH, SimHash, n-gram Jaccard, embedding cosine), approximate similarity
search, text analysis (language-ID, quality scoring, token counting,
fingerprinting), multimodal column plumbing, partial-aggregation
relational helpers, and corpus curation (stratified sampling, IDF table,
benchmark decontamination, grouped quantiles, global rank — sampling.py).
"""
