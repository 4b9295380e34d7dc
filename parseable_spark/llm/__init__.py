"""Large-scale training-data pipeline operators.

Beyond the reference's observability surface: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup, cross-doc
paragraph/boilerplate removal, repeated-span ExactSubstr-style strip,
SemDeDup-style semantic dedup over a distributed k-means clustering,
a sharded Bloom membership gate against rolling history), similarity
search (brute-force + LSH-bucketed + IVF ANN with deterministic or
trained codebooks), text analysis (language ID, quality scoring,
token counting, fingerprinting, repetition filters, TF-IDF, chunking,
PII, LM quality), a distributed logistic-regression quality
classifier, a stupid-backoff n-gram LM with CCNet-style perplexity
filtering, DSIR importance resampling, deterministic
sampling/splitting/packing plus temperature-mixture domain sampling
and seeded epoch sharding, IVF-PQ product quantization (single-query
and batched ADC search), an incremental LSH dedup index (batch and
streaming), BPE tokenizer training AND full-corpus encoding to
token-id sequences, perceptual fingerprints for image/audio/video
dedup (pHash, spectral hash, keyframe-hash pairing), and multimodal
column plumbing with real pure-Python codecs (BMP, baseline JPEG,
PCM WAV, MJPEG-in-AVI video, MPEG-1 I-frames). All hot paths are
Catalyst column expressions (JVM-side); Python appears only in the
Arrow-batched multimodal decode kernels, the per-shard bitmap
kernels, and bounded driver-side model state (k-means/PQ centroids,
BPE merges, classifier coefficients).
"""
