"""Round-5 session-21: WAV/PCM16 codec."""

from __future__ import annotations

import numpy as np
import pytest


def test_wav_roundtrip_and_header_fields():
    from dug_ray.sources.wav_source import (_wav_bytes, decode_wav,
                                            SAMPLE_RATE)
    samples = np.array([0, 1, -1, 32767, -32768], dtype="int16")
    payload = _wav_bytes(samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * len(samples)
    rate, out = decode_wav(payload)
    assert rate == SAMPLE_RATE
    assert np.array_equal(out, samples)


def test_decode_wav_rejects_corrupt_payloads():
    from dug_ray.sources.wav_source import _wav_bytes, decode_wav
    good = _wav_bytes(np.array([3, 4], dtype="int16"))
    with pytest.raises(ValueError):
        decode_wav(b"JUNK" + good[4:])            # bad magic
    with pytest.raises(ValueError):
        decode_wav(good[:-1])                     # truncated data
    bad_fmt = bytearray(good)
    bad_fmt[20] = 9                               # audio_fmt != PCM
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_fmt))


def test_render_user_wavs_orders_samples_by_time():
    import pandas as pd
    import ray.data

    from dug_ray.sources.wav_source import decode_wav, render_user_wavs
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [2, 1, 3],
        "user_id": [7, 7, 7],
        "ts": [t0 + pd.Timedelta(minutes=5), t0,
               t0 + pd.Timedelta(minutes=9)],
        "value": [1.23, 4.56, -0.01]})
    out = (render_user_wavs(ray.data.from_pandas(df).repartition(3))
           .to_pandas())
    assert len(out) == 1
    _, s = decode_wav(out.iloc[0]["wav"])
    # ts order first; floor of the float products (4.56*100 is
    # 455.999... in IEEE, so floor gives 455 — same on both engines)
    assert list(s) == [455, 123, -1]
