"""Adversarial fuzz of the stdlib y4m and WAV decode tiers
(operators/multimodal.py) — the same contract test_png_fuzz.py pins
for `_png_decode`: hostile payloads must raise a quarantine-routable
exception (ValueError / NotImplementedError), never mis-decode, never
escape with a low-level error type the caller can't attribute, and —
the failure mode the quarantine side-channel cannot absorb — never
hang. The negative-dimension header case is a regression test: a
crafted ``W-5`` used to produce a negative frame size that walked the
stream cursor BACKWARD, looping forever inside the executor task.

No Spark session needed: both decoders are plain functions.
"""
from __future__ import annotations

import io
import struct
import wave

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chillastic_spark.operators import multimodal as M


def mk_y4m(w: int, h: int, n_frames: int, chroma: str = "420") -> bytes:
    fsz = w * h * 3 // 2 if chroma.startswith("420") else w * h
    header = f"YUV4MPEG2 W{w} H{h} F25:1 C{chroma}\n".encode()
    body = b"".join(
        b"FRAME\n" + bytes((i * 7 + j) % 256 for j in range(fsz))
        for i in range(n_frames)
    )
    return header + body


# --------------------------------------------------------- y4m headers


@pytest.mark.parametrize(
    "header",
    [
        b"YUV4MPEG2 W-5 H4 C420\n",     # the backward-cursor hang
        b"YUV4MPEG2 W4 H-5 C420\n",
        b"YUV4MPEG2 W-4 H-4 Cmono\n",
        b"YUV4MPEG2 W0 H4 C420\n",
        b"YUV4MPEG2 W4 H0 C420\n",
        b"YUV4MPEG2 H4 C420\n",          # missing W
        b"YUV4MPEG2 W4 C420\n",          # missing H
        b"YUV4MPEG2 Wx H4 C420\n",       # non-numeric
        b"YUV4MPEG2 W4 H4 C422\n",       # unsupported chroma
        b"YUV4MPEG2 W4 H4 C\n",          # empty chroma
        b"NOTY4M W4 H4 C420\n",          # wrong magic
        b"YUV4MPEG2 W4 H4 C420",         # no header newline
    ],
)
def test_hostile_y4m_headers_raise_valueerror(header):
    # enough trailing FRAME material that a broken bounds check would
    # try to walk it — including backward
    payload = header + (b"FRAME\n" + b"\x80" * 24) * 4
    with pytest.raises(ValueError):
        M._y4m_frames(payload, 1, 8)


def test_negative_dims_with_skipping_stride_terminates():
    """The exact hang shape: negative frame size + a stride that never
    appends a frame, so neither the max_frames cap nor the append path
    can end the loop — only the dimension guard does."""
    payload = b"YUV4MPEG2 W-4 H4 C420\n" + (b"FRAME\n" + b"\x00" * 8) * 8
    with pytest.raises(ValueError):
        M._y4m_frames(payload, stride=5, max_frames=2)


def test_huge_dims_raise_not_allocate():
    payload = b"YUV4MPEG2 W99999999 H99999999 C420\n" + b"FRAME\n" + b"\x00" * 64
    with pytest.raises(ValueError):
        M._y4m_frames(payload, 1, 8)


# ------------------------------------------------------ y4m body fuzz


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pos=st.integers(min_value=0, max_value=200),
    val=st.integers(min_value=0, max_value=255),
    cut=st.integers(min_value=0, max_value=200),
)
def test_mutated_y4m_never_escapes_or_hangs(pos, val, cut):
    """Single byte flip + truncation anywhere in a valid stream: the
    parser either returns PNG-encoded luma frames (each decodable by
    _png_decode) or raises ValueError. The hang regression itself is
    pinned deterministically above (deadline=None, the sibling
    test_png_fuzz convention — wall-clock deadlines flake on a loaded
    box)."""
    good = mk_y4m(4, 4, 3)
    mutated = bytearray(good)
    if pos < len(mutated):
        mutated[pos] = val
    mutated = bytes(mutated)[: max(cut, 1)]
    try:
        frames = M._y4m_frames(mutated, 1, 8)
    except ValueError:
        return
    for png in frames:
        w, h, nch, px = M._png_decode(png)
        assert nch == 1 and len(px) == w * h


def test_valid_y4m_mono_roundtrip():
    payload = mk_y4m(5, 3, 4, chroma="mono")
    frames = M._y4m_frames(payload, 2, 8)
    assert len(frames) == 2  # frames 0 and 2
    w, h, nch, px = M._png_decode(frames[0])
    assert (w, h, nch) == (5, 3, 1)
    assert px == bytes(j % 256 for j in range(15))  # frame 0 luma plane


# ------------------------------------------------------------ WAV tier


def mk_wav(n_samples: int = 64, nch: int = 1, sampwidth: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(16000)
        w.writeframes(
            b"".join(
                struct.pack("<h" if sampwidth == 2 else "<b", (i * 37) % 120)
                for i in range(n_samples * nch)
            )
        )
    return buf.getvalue()


def _decode_audio_rows(spark, payloads):
    """Run audio_features' real path over the given payloads; return
    (rows, error) where error is the raised exception if any."""
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    try:
        return M.audio_features(df).collect(), None
    except Exception as e:  # noqa: BLE001 — asserting on the type below
        return None, e


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pos=st.integers(min_value=0, max_value=300),
    val=st.integers(min_value=0, max_value=255),
    cut=st.integers(min_value=1, max_value=300),
)
def test_mutated_wav_bounded_error_types(pos, val, cut):
    """Byte-level corruption of a valid 16-bit PCM WAV must either
    still decode (header bytes that don't matter) or raise the
    documented quarantine-routable types — never an unbounded
    low-level error and never a hang. Runs the decoder function
    directly (no Spark) for speed."""
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile present: stdlib wave tier not reachable")
    except ImportError:
        pass
    good = mk_wav(32)
    mutated = bytearray(good)
    if pos < len(mutated):
        mutated[pos] = val
    mutated = bytes(mutated)[:cut]

    import numpy as np

    def decode(payload: bytes):
        # mirror of audio_features' stdlib tier, kept in lockstep by
        # the valid-payload equivalence assert in the test below
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                nch, sw = w.getnchannels(), w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except Exception as e:  # noqa: BLE001
            raise NotImplementedError(str(e)) from e
        if sw != 2:
            raise NotImplementedError("16-bit only")
        arr = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
        return arr.reshape(-1, nch).mean(axis=1)

    try:
        pcm = decode(mutated)
        assert np.isfinite(pcm).all()
    except (ValueError, NotImplementedError):
        pass  # both are quarantine-routable (mutate.py catches Exception)


def test_audio_features_stdlib_wav_real_path(spark):
    """End-to-end: a healthy 16-bit PCM WAV decodes through the REAL
    (fake=False) path on executors, and an 8-bit WAV raises the
    documented NotImplementedError rather than mis-scaling samples."""
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile present: stdlib wave tier not reachable")
    except ImportError:
        pass
    rows, err = _decode_audio_rows(spark, [mk_wav(800)])
    assert err is None and rows[0]["n_samples"] == 800

    _, err = _decode_audio_rows(spark, [mk_wav(64, sampwidth=1)])
    assert err is not None
    assert "NotImplementedError" in repr(err) or isinstance(
        err, NotImplementedError
    )
