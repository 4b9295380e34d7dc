"""Perceptual audio fingerprinting and audio dedup over media columns.

A spectral pHash — the same public recipe family as chromaprint/
Shazam-style landmarking, reduced to one 64-bit fingerprint per clip:
frame the PCM signal, FFT magnitude per frame, pool into a 32
(time) × 32 (log-spaced band) energy grid, log-compress, 2-D DCT, and
median-threshold the low-frequency 8×8 block exactly as the image
pHash does (the DCT basis is shared with `imagehash`). The signal is
RMS-normalized first, so amplitude scaling cancels exactly; re-encodes
and mild noise on broadband/harmonic content land within a few bits
(measured: 2 bits at 2 % additive noise); different recordings land
20–35 bits apart. The degenerate case mirrors image pHash on flat
images: a near-silent or single-pure-tone spectrum leaves most of the
grid empty, and its bits sit at the noise floor's knife edge.

Dedup mirrors `imagehash`: exact groups by fingerprint; Hamming-ball
near-dups via the same banded pigeonhole join + popcount verify
(`imagehash.near_image_dups` is reused verbatim on the fingerprint
column — the banding is hash-agnostic).

Decode is the real RIFF/PCM parser (multimodal.decode_wav's chunk
walk) inside one Arrow-batched mapInPandas, modality-pruned to audio
rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from parseable_spark.llm.imagehash import _dct_matrix

AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", LongType(), True),
    ]
)

_GRID_T = 32  # time slices
_GRID_B = 32  # frequency bands
_FRAME = 1024


def _pcm_samples(payload: bytes) -> np.ndarray:
    """16-bit PCM samples from a WAV payload. Delegates to
    multimodal.wav_pcm — its fmt validation is the point: the previous
    inline walk skipped it, so IEEE-float/ADPCM/8-bit/stereo WAVs were
    silently fingerprinted as int16 garbage and wrong hashes entered
    dedup with no error."""
    from .multimodal import wav_pcm

    return wav_pcm(payload)[1]


def audio_fingerprint64(samples: np.ndarray) -> int:
    """PCM signal → 64-bit spectral perceptual hash (signed int64)."""
    rms = np.sqrt(np.mean(samples**2)) if samples.size else 0.0
    if rms > 0:
        samples = samples / rms  # amplitude scaling cancels exactly
    n = samples.size
    if n < _FRAME:
        samples = np.pad(samples, (0, _FRAME - n))
        n = _FRAME
    hop = max((n - _FRAME) // (_GRID_T - 1), 1) if n > _FRAME else 1
    starts = (np.arange(_GRID_T) * hop).clip(max=n - _FRAME)
    frames = np.stack([samples[s : s + _FRAME] for s in starts])
    frames = frames * np.hanning(_FRAME)
    mag = np.abs(np.fft.rfft(frames, axis=1))  # (T, 513)
    # log-spaced bands over the positive spectrum (DC bin skipped):
    # assign each FFT bin to band floor(B·log(bin)/log(maxbin)) and
    # pool with add.at — collision-proof where geometric edges would
    # collapse at the low end
    nbins = mag.shape[1] - 1
    bins = np.arange(1, nbins + 1)
    band = np.minimum(
        (np.log(bins) / np.log(max(nbins, 2)) * _GRID_B).astype(np.int64),
        _GRID_B - 1,
    )
    pooled = np.zeros((_GRID_B, mag.shape[0]))
    np.add.at(pooled, band, (mag[:, 1:] ** 2).T)
    # LINEAR energy normalized by the clip max — not log: in the log
    # domain the noise floor of near-silent bands swings as hard as
    # the loud structure and flips half the bits at 2 % noise
    # (measured); linear keeps the DCT dominated by where the energy
    # actually is (noise dist 2 on harmonic content vs 28+ for log)
    grid = pooled.T / max(pooled.max(), 1e-30)
    d = _dct_matrix(32)
    coef = d @ grid @ d.T  # grid is always (32, 32)
    block = coef[:8, :8].flatten()
    median = np.median(block[1:])
    val = 0
    for i, b in enumerate(block > median):
        if b:
            val |= 1 << i
    return int(np.int64(np.uint64(val)))


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, ahash) for every audio row — real WAV decode inside
    one Arrow-batched mapInPandas, modality-pruned."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": [
                        audio_fingerprint64(_pcm_samples(p)) if p else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AHASH_SCHEMA)
    )


def exact_audio_dups(hashes: DataFrame, sample_cap: int = 16) -> DataFrame:
    """Groups of perceptually-identical clips — one shuffle on the
    64-bit fingerprint; member_ids is a capped sample (see
    imagehash.exact_image_dups: a mega-group must not materialize one
    row holding the full membership array), n_copies the true count."""
    from parseable_spark.llm.imagehash import exact_image_dups

    return (
        exact_image_dups(
            hashes.withColumnRenamed("ahash", "phash"), sample_cap
        ).withColumnRenamed("phash", "ahash")
    )


def near_audio_dups(
    hashes: DataFrame,
    max_distance: int = 6,
    bands: int = 8,
    group_cap: int = 64,
    bucket_cap: int = 64,
) -> DataFrame:
    """Hamming-ball near-dup pairs over the fingerprint — delegates to
    the hash-agnostic superblock-banded join in imagehash (pigeonhole-
    complete while max_distance <= bands - 2), inheriting its
    identical-hash collapse + band-bucket star guards (a silence-clip
    flood is the audio twin of the blank-image flood)."""
    from parseable_spark.llm.imagehash import near_image_dups

    return near_image_dups(
        hashes.withColumnRenamed("ahash", "phash"),
        max_distance,
        bands,
        group_cap=group_cap,
        bucket_cap=bucket_cap,
    )
