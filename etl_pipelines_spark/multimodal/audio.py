"""Audio FEATURE EXTRACTION on decoded PCM — real DSP, numpy as the
whole signal chain (the step after decode_wav_audio in an audio
training pipeline: spectral features for filtering / dedup /
curriculum, a mel-free cousin of the fbank front-end; SURVEY.md §2
media tier — the reference carries media as warehouse columns, a
training pipeline needs features computed from the bytes).

audio_band_energy: per clip, rFFT over the PCM samples → energy
split into `n_bands` equal frequency bands (fraction of total
spectral energy per band, DC excluded) + total RMS. Scale shape:
narrow Arrow map over the payload column — one numpy rfft per clip
inside the batch, nothing shuffles, no Python rows.

Float FFT output is engine-specific by nature, so this operator is
pytest-verified against closed-form signals (pure tones land their
energy in the right band; Parseval ties spectral to time-domain
energy) rather than oracle-hashed — the k-means/trainer precedent
for numeric operators whose exactness class is 'deterministic given
one engine', not 'bit-identical across engines'.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _pcm_samples(buf: bytes):
    """8/16-bit mono PCM WAV -> float64 samples centered on 0."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        clen = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", buf[pos + 8 : pos + 24])
        elif cid == b"data":
            data = buf[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _f, channels, rate, _br, _ba, bits = fmt
    if channels != 1:
        raise NotImplementedError("mono only")
    if bits == 8:
        x = np.frombuffer(data, np.uint8).astype(np.float64) - 128.0
    elif bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return x, rate


def audio_band_energy(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """(media_id, payload WAV) -> media_id, sample_rate, n_samples,
    rms, band_energy array<double> (fractions summing to 1 over the
    non-DC spectrum)."""
    out_schema = (
        "media_id long, sample_rate int, n_samples long, rms double, "
        "band_energy array<double>"
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "rms",
                "band_energy")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, rate = _pcm_samples(bytes(payload))
                spec = np.abs(np.fft.rfft(x)) ** 2
                ac = spec[1:]  # drop DC
                total = ac.sum()
                edges = np.linspace(0, len(ac), n_bands + 1).astype(int)
                bands = [
                    float(ac[a:b].sum() / total) if total > 0 else 0.0
                    for a, b in zip(edges[:-1], edges[1:])
                ]
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(x))
                rows["rms"].append(
                    float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                )
                rows["band_energy"].append(bands)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        _extract, schema=out_schema
    )
