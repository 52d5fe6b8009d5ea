

def test_wav_decode_formats_chunks_and_errors():
    """RIFF/PCM parser edge cases: stdlib-wave cross-check, stereo
    integer downmix, 8-bit unsigned shift, odd-size chunk padding,
    unknown chunks skipped, and honest ValueError on non-PCM input."""
    import io
    import struct
    import wave as wavemod

    import numpy as np
    import pytest

    from ningaloo_turtle_etl_spark.operators.multimodal import (
        _wav_decode,
        synth_pcm16_wav,
    )

    s = np.array([0, 1000, -2000, 32767, -32768, 5], dtype=np.int16)
    sr, nc, v = _wav_decode(synth_pcm16_wav(s, 8000))
    assert (sr, nc) == (8000, 1) and v.tolist() == s.tolist()

    # stdlib wave writer round-trips identically
    buf = io.BytesIO()
    w = wavemod.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(44100)
    w.writeframes(s.tobytes()); w.close()
    sr2, _, v2 = _wav_decode(buf.getvalue())
    assert sr2 == 44100 and v2.tolist() == s.tolist()

    # stereo downmix: integer mean with floor-toward-zero
    st = np.array([100, 200, -100, -201, 7, -8], dtype=np.int16)  # 3 frames
    buf = io.BytesIO()
    w = wavemod.open(buf, "wb")
    w.setnchannels(2); w.setsampwidth(2); w.setframerate(8000)
    w.writeframes(st.tobytes()); w.close()
    _, nc2, vm = _wav_decode(buf.getvalue())
    assert nc2 == 2 and vm.tolist() == [150, -150, 0]  # -301//2 -> -150 C-style

    # 8-bit unsigned PCM shifts to signed int16 range
    b8 = np.array([128, 255, 0, 129], dtype=np.uint8)
    buf = io.BytesIO()
    w = wavemod.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
    w.writeframes(b8.tobytes()); w.close()
    _, _, v8 = _wav_decode(buf.getvalue())
    assert v8.tolist() == [0, 127 * 256, -128 * 256, 256]

    # unknown chunk before fmt, with odd size (pad byte), is skipped
    base = synth_pcm16_wav(s, 8000)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = base[:12] + extra + base[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8
    ) + patched[8:]
    _, _, v3 = _wav_decode(patched)
    assert v3.tolist() == s.tolist()

    # honest failures
    with pytest.raises(ValueError):
        _wav_decode(b"not a wav")
    float_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(float_fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(float_fmt)) + float_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        _wav_decode(bad)


def test_extract_wav_features_integer_exact(spark):
    """Feature extraction over real WAV blobs: hand-computed RMS/ZC/band
    energies on a tiny known waveform, and the zero-length edge."""
    import math

    import numpy as np

    from ningaloo_turtle_etl_spark.operators.multimodal import (
        extract_wav_features,
        synth_pcm16_wav,
    )

    s = np.array([100, -100, 200, -200, 300, -300, 400, -400], dtype=np.int16)
    empty = np.array([], dtype=np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(synth_pcm16_wav(s, 8000))),
            (2, bytearray(synth_pcm16_wav(empty, 8000))),
        ],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r for r in extract_wav_features(df, 4).collect()
    }
    sumsq = int((s.astype(np.int64) ** 2).sum())
    assert got[1]["n_samples"] == 8
    assert got[1]["rms"] == math.sqrt(sumsq / 8) / 32768.0
    assert got[1]["zero_crossings"] == 7
    assert got[1]["e0"] == (100**2 + 100**2) / 32768.0 / 32768.0
    assert got[1]["e3"] == (400**2 + 400**2) / 32768.0 / 32768.0
    assert got[1]["duration_sec"] == 8 / 8000
    assert got[2]["n_samples"] == 0 and got[2]["rms"] == 0.0
