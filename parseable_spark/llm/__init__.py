"""Large-scale training-data pipeline operators.

Beyond the reference's observability surface: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
search (brute-force + LSH-bucketed ANN), text analysis (language ID,
quality scoring, token counting, fingerprinting), and multimodal column
plumbing. All hot paths are Catalyst column expressions (JVM-side);
Python appears only in the stubbed multimodal decoders.
"""
