"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schema, batching, partition shape) is real and
tested. Decoders probe for the media libraries AT RUNTIME inside the
executor closure: with PIL present the image ops (``decode_media``,
``resize_images``, ``phash_images``) decode real payloads; when PIL is
absent, ``decode_media`` and ``phash_images`` fall back to a
pure-stdlib PNG decoder (``_png_decode``: zlib inflate + scanline
unfilter) so the REAL decode branch still executes on PNG payloads in
codec-less containers; audio
decodes via soundfile when importable, falling back to the stdlib
``wave`` reader for 16-bit PCM WAV payloads (so the real path runs
even in codec-less containers); video probes for an ffmpeg binary on
the executor PATH (``sample_frames(fake=False)`` → real PNG frames)
and falls back to the stdlib YUV4MPEG2 parser (``_y4m_frames``) for
uncompressed streams, so every modality's real branch executes
without any optional codec library.
Absent codecs raise
NotImplementedError unless ``fake=True``, which produces the
deterministic hash-derived output pinned by the ``multimodal_meta``
oracle query — the fake keeps schema/batch shape identical to the real
path.

At scale: binaries stay in parquet/object storage, metadata extraction
runs as Arrow-batched mapInPandas (one Python roundtrip per batch), and
heavy decode fans out with repartition on a content-hash so skewed
media sizes spread evenly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def _out_schema(df: DataFrame, id_col: str, base: T.StructType) -> T.StructType:
    """The output schema with doc_id carrying the CALLER's id type —
    hardcoding LongType crashes string-id callers at the Arrow cast
    (the similarity._id_type lesson; the output column is still named
    doc_id regardless of id_col)."""
    return T.StructType(
        [T.StructField("doc_id", df.schema[id_col].dataType)] + list(base.fields)[1:]
    )


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter for the testdata: treat utf-8 bytes of a text column as
    the opaque media payload."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


# ------------------------------------------------ stdlib PNG decoder
#
# The middle tier of the image probe ladder (PIL -> stdlib PNG ->
# NotImplementedError): a dependency-free decoder for non-interlaced
# 8-bit PNG (gray / gray+alpha / RGB / RGBA), so the REAL decode branch
# executes even in containers without pillow. Pure spec math (zlib
# inflate + per-scanline unfilter, RFC 2083); correctness is pinned by
# tests that round-trip against an independent encoder. This is the
# codec-absent fallback, not the perf path — PIL, when importable,
# always wins the probe.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# decoded-size ceiling (filter bytes included): a crafted header
# claiming giant dims turns zlib inflate into a memory bomb, and —
# because the per-scanline unfilter is a pure-Python byte loop — even a
# memory-safe claim converts to a CPU stall (minutes per doc at
# 8k x 8k). 16 MB raw covers every plausible in-pipeline
# thumbnail/frame (2048x2048 RGBA, 4096x4096 gray) while bounding the
# unfilter loop to seconds; anything larger quarantines.
_PNG_MAX_RAW = 1 << 24  # 16 MB


def _png_decode(payload: bytes):
    """payload -> (width, height, channels, unfiltered pixel bytes,
    row-major, channel-interleaved). Raises ValueError on anything
    that is not a supported PNG — INCLUDING truncated headers, corrupt
    CRCs on critical chunks, zlib damage, and decompression bombs
    (struct.error / zlib.error never escape: callers route ValueError
    to the quarantine side-channel and anything else kills the slice)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, idat = 8, b""
    w = h = nch = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln or pos + 12 + ln > len(payload):
            raise ValueError(f"truncated PNG chunk {typ!r}")
        if typ in (b"IHDR", b"IDAT", b"IEND"):
            # CRC-verify the critical chunks (ancillary ones are
            # skipped unread, so their CRCs can't mis-decode anything)
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + ln : pos + 12 + ln]
            )
            if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
                raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError("truncated PNG IHDR")
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if inter != 0:
                raise ValueError("interlaced PNG unsupported")
            try:
                nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
            except KeyError:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension PNG")
            if h * (w * nch + 1) > _PNG_MAX_RAW:
                raise ValueError(f"implausibly large PNG ({w}x{h}x{nch})")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    stride = w * nch
    want = h * (stride + 1)
    # bounded inflate: decompress at most want+1 bytes so a zlib bomb
    # surfaces as a length mismatch instead of an allocation blowup
    try:
        d = zlib.decompressobj()
        raw = d.decompress(idat, want + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != want or d.decompress(b"", 1):
        raise ValueError("PNG data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        out += line
        prev = line
    return w, h, nch, bytes(out)


def _png_encode(pixels: bytes, w: int, h: int, nch: int = 1) -> bytes:
    """Minimal PNG encoder (filter 0, 8-bit gray/gray+alpha/RGB/RGBA)
    — the output side of the stdlib tier: lets the video-frame and
    resize paths emit spec-valid PNG bytes without PIL."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    stride = w * nch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _y4m_frames(payload: bytes, stride: int, max_frames: int) -> "list[bytes]":
    """Stdlib video tier: parse an uncompressed YUV4MPEG2 (y4m) stream
    and return every ``stride``-th frame's luminance plane as PNG
    bytes (same per-frame PNG contract as the ffmpeg path). Supports
    C420-family and Cmono chroma; anything else raises ValueError."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = b"420"
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:]
    # strictly positive, not merely present: a crafted negative W/H
    # (e.g. b"W-5") yields a NEGATIVE frame size, which walks ``pos``
    # BACKWARD each iteration — an infinite loop inside an executor
    # task, the one failure mode the quarantine side-channel cannot
    # absorb (it catches exceptions, not hangs)
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("y4m header missing or non-positive W/H")
    # exact 8-bit chroma tags only: C420p10/p12/p16 (high-bit-depth)
    # would match a prefix test and mis-size every frame — reject them
    if chroma in (b"420", b"420jpeg", b"420paldv", b"420mpeg2"):
        fsz = w * h * 3 // 2
    elif chroma == b"mono":
        fsz = w * h
    else:
        raise ValueError(f"unsupported y4m chroma {chroma!r} (8-bit 420/mono only)")
    frames: list[bytes] = []
    pos, idx = nl + 1, 0
    while payload[pos : pos + 5] == b"FRAME" and len(frames) < max_frames:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + fsz > len(payload):
            raise ValueError("truncated y4m frame")
        if idx % max(stride, 1) == 0:
            y_plane = payload[fnl + 1 : fnl + 1 + w * h]
            frames.append(_png_encode(y_plane, w, h, 1))
        pos = fnl + 1 + fsz
        idx += 1
    if len(frames) < max_frames and pos != len(payload):
        # loud desync, matching the ffmpeg tier's corrupt-payload error:
        # trailing bytes that are not a FRAME header mean the stream is
        # corrupt — a silent partial frame list would look like success
        raise ValueError(f"desynchronized y4m stream at byte {pos}")
    return frames


def _png_luma_plane(payload: bytes, n: int):
    """Decode a PNG and return an (n, n) float64 luminance plane:
    ITU-R 601 grayscale + nearest-neighbor resample — the stdlib twin
    of PIL's convert('L').resize((n, n))."""
    import numpy as _np

    w, h, nch, px = _png_decode(payload)
    arr = _np.frombuffer(px, dtype=_np.uint8).reshape(h, w, nch).astype(_np.float64)
    if nch >= 3:
        luma = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    else:  # gray / gray+alpha: channel 0 is the luminance
        luma = arr[:, :, 0]
    yi = _np.minimum((_np.arange(n) * h) // n, h - 1)
    xi = _np.minimum((_np.arange(n) * w) // n, w - 1)
    return luma[yi][:, xi]


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", fake: bool = False) -> DataFrame:
    """Extract (n_bytes, width, height, format) from a binary payload
    column via Arrow-batched mapInPandas.

    ``fake=False`` decodes with PIL when importable on the executors,
    falls back to the pure-stdlib PNG decoder (``_png_decode``) for
    PNG payloads when PIL is absent, and raises NotImplementedError
    for anything the ladder can't decode; ``fake=True`` derives
    deterministic metadata from the payload hash (matches
    functions.hash60 on the utf-8 string, i.e. the multimodal_meta
    oracle).
    """

    def run(batches):
        # self-contained up to the stdlib-PNG tier: executors without
        # PIL *and* without the package on their path get a clean
        # NotImplementedError (see operators.mutate.apply_data_mutators)
        import hashlib as _hashlib
        import io as _io

        import pandas as _pd

        image_mod = png_decode = None
        if not fake:
            try:
                from PIL import Image as image_mod  # noqa: N813
            except ImportError:
                try:
                    from chillastic_spark.operators.multimodal import (
                        _png_decode as png_decode,
                    )
                except ImportError as e:
                    raise NotImplementedError(
                        "real media decode needs PIL (pillow), or the "
                        "engine package on the executor path for the "
                        "stdlib PNG tier; pass fake=True"
                    ) from e

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = rec[payload_col] or b""
                if not fake:
                    try:
                        if image_mod is not None:
                            with image_mod.open(_io.BytesIO(bytes(payload))) as img:
                                wd, ht = img.width, img.height
                                fmt = (img.format or "unknown").lower()
                        else:
                            wd, ht, _nch, _px = png_decode(bytes(payload))
                            fmt = "png"
                        rows.append(
                            {
                                "doc_id": rec[id_col],
                                "n_bytes": len(payload),
                                "width": wd,
                                "height": ht,
                                "format": fmt,
                            }
                        )
                    except Exception as e:  # noqa: BLE001 — codec boundary
                        raise NotImplementedError(
                            f"undecodable image payload for doc "
                            f"{rec[id_col]} ({len(payload)} bytes): {e}; "
                            "pass fake=True"
                        ) from e
                    continue
                h = int(_hashlib.md5(bytes(payload)).hexdigest()[:15], 16)
                rows.append(
                    {
                        "doc_id": rec[id_col],
                        "n_bytes": len(payload),
                        "width": h % 1280,
                        "height": h % 720,
                        "format": "fake",
                    }
                )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "format"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, _out_schema(df, id_col, MEDIA_META_SCHEMA)
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def _ffmpeg_path() -> "str | None":
    """Runtime probe for an ffmpeg binary on the executor PATH — the
    video twin of the PIL / soundfile import probes."""
    import shutil

    return shutil.which("ffmpeg")


def _ffmpeg_extract_frames(
    ffmpeg: str, payload: bytes, stride: int, max_frames: int
) -> "list[bytes]":
    """Real frame extraction: decode the container, keep every
    ``stride``-th frame, cap at ``max_frames``; each frame returns as
    PNG bytes. One subprocess per video — per-payload cost, batched by
    Arrow like every other decode here."""
    import glob as _glob
    import os as _os
    import subprocess as _sp
    import tempfile as _tf

    with _tf.TemporaryDirectory() as td:
        src = _os.path.join(td, "in.bin")
        with open(src, "wb") as f:
            f.write(payload)
        pat = _os.path.join(td, "f_%05d.png")
        try:
            _sp.run(
                [
                    ffmpeg, "-v", "error", "-i", src,
                    "-vf", f"select=not(mod(n\\,{max(stride, 1)}))",
                    # -vsync (not -fps_mode): accepted by ffmpeg 4.x AND
                    # 5+; -fps_mode only exists >= 5.1 and would crash
                    # every decode on older executors the probe accepts
                    "-vsync", "vfr", "-frames:v", str(max_frames), pat,
                ],
                check=True, capture_output=True,
            )
        except _sp.CalledProcessError as e:  # noqa: BLE001 — codec boundary
            # surface ffmpeg's stderr: CalledProcessError alone says
            # only "exit status 1", which makes one corrupt payload in
            # a corpus an undiagnosable job-killer after task retries
            err = (e.stderr or b"").decode("utf-8", "replace").strip()
            raise NotImplementedError(
                f"undecodable video payload ({len(payload)} bytes): "
                f"{err or 'ffmpeg gave no error output'}; pass fake=True"
            ) from e
        return [
            open(p, "rb").read()
            for p in sorted(_glob.glob(_os.path.join(td, "f_*.png")))
        ]


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    rebalance: bool = True,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling: one payload row fans out to ≤
    ``max_frames`` frame rows (the 1→N mapInPandas shape frame
    extraction needs).

    ``fake=True`` (default — the deterministic oracle-checkable mode,
    and the historical behavior) slices the payload into
    ``every_n_bytes`` chunks. ``fake=False`` extracts REAL frames via
    an ffmpeg runtime probe (the video twin of the PIL / soundfile
    probes): every ``every_n_bytes``-th FRAME (the parameter doubles
    as the frame stride in real mode) is decoded to PNG bytes; with no
    ffmpeg binary, uncompressed YUV4MPEG2 payloads decode through the
    stdlib ``_y4m_frames`` tier (luminance plane per frame, same PNG
    contract), and anything else raises NotImplementedError on the
    executor — schema, partitioning, and batch shape are identical in
    all modes.

    ``rebalance=True`` repartitions on a content hash first so a few
    huge videos don't pin one executor — the skew story for media
    decode at 100 TB.
    """
    src = df.select(id_col, payload_col)
    if rebalance:
        src = src.repartition(F.crc32(F.col(payload_col).cast("binary")))

    def run(batches):
        import pandas as _pd

        ffmpeg = y4m = None
        if not fake:
            ffmpeg = _ffmpeg_path()
            if ffmpeg is None:
                try:
                    from chillastic_spark.operators.multimodal import (
                        _y4m_frames as y4m,
                    )
                except ImportError as e:
                    raise NotImplementedError(
                        "real video decode needs ffmpeg on PATH, or the "
                        "engine package on the executor path for the "
                        "stdlib y4m tier; pass fake=True"
                    ) from e
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec[payload_col] or b"")
                if fake:
                    n = min(max_frames, max(len(payload) // every_n_bytes, 0))
                    frames = [
                        payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                        for i in range(n)
                    ]
                elif ffmpeg is not None:
                    frames = _ffmpeg_extract_frames(
                        ffmpeg, payload, every_n_bytes, max_frames
                    )
                else:
                    try:
                        frames = y4m(payload, every_n_bytes, max_frames)
                    except ValueError as e:  # codec boundary
                        raise NotImplementedError(
                            f"undecodable video payload "
                            f"({len(payload)} bytes) for the stdlib y4m "
                            f"tier: {e}; install ffmpeg or pass fake=True"
                        ) from e
                for i, frame in enumerate(frames):
                    rows.append(
                        {
                            "doc_id": rec[id_col],
                            "frame_idx": i,
                            "frame": frame,
                            "frame_bytes": len(frame),
                        }
                    )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame", "frame_bytes"]
            )

    return src.mapInPandas(run, _out_schema(df, id_col, FRAME_SCHEMA))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 256,
    height: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Image resize plumbing (1→1 mapInPandas, payload in / payload
    out). ``fake=False`` resizes with PIL when importable (PNG bytes
    out, deterministic), falls back to the stdlib PNG tier (decode +
    nearest-neighbor resample + re-encode) when PIL is absent, and
    raises NotImplementedError for anything the ladder can't decode;
    ``fake=True`` truncates/pads the payload to width·height/64 bytes
    deterministically — the batch shape, schema, and size contract of
    the real decoder."""
    target = max(width * height // 64, 1)

    def run(batches):
        import io as _io

        import pandas as _pd

        image_mod = png_mod = None
        if not fake:
            try:
                from PIL import Image as image_mod  # noqa: N813
            except ImportError:
                try:
                    from chillastic_spark.operators import multimodal as png_mod
                except ImportError as e:
                    raise NotImplementedError(
                        "real image resize needs PIL (pillow), or the "
                        "engine package on the executor path for the "
                        "stdlib PNG tier; pass fake=True"
                    ) from e

        def _stdlib_resize(payload: bytes) -> bytes:
            import numpy as _np

            w0, h0, nch, px = png_mod._png_decode(payload)
            arr = _np.frombuffer(px, dtype=_np.uint8).reshape(h0, w0, nch)
            yi = _np.minimum((_np.arange(height) * h0) // height, h0 - 1)
            xi = _np.minimum((_np.arange(width) * w0) // width, w0 - 1)
            out = arr[yi][:, xi]
            return png_mod._png_encode(out.tobytes(), width, height, nch)

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec[payload_col] or b"")
                if not fake:
                    try:
                        if image_mod is not None:
                            with image_mod.open(_io.BytesIO(payload)) as img:
                                resized = img.resize((width, height))
                                buf = _io.BytesIO()
                                resized.save(buf, format="PNG")
                            out = buf.getvalue()
                        else:
                            out = _stdlib_resize(payload)
                    except Exception as e:  # noqa: BLE001 — codec boundary
                        raise NotImplementedError(
                            f"unresizable image payload for doc "
                            f"{rec[id_col]} ({len(payload)} bytes): {e}; "
                            "pass fake=True"
                        ) from e
                else:
                    # empty payload: repeat a zero byte so the output
                    # honors the fixed width*height/64-byte contract
                    base = payload or b"\x00"
                    out = (base * (target // len(base) + 1))[:target]
                rows.append(
                    {
                        "doc_id": rec[id_col],
                        "payload": out,
                        "width": width,
                        "height": height,
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "payload", "width", "height"])

    return df.select(id_col, payload_col).mapInPandas(
        run, _out_schema(df, id_col, RESIZED_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mean_rms", T.DoubleType()),
        T.StructField("max_rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def audio_features(
    df: DataFrame,
    frame_len: int = 400,
    hop: int = 160,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Framewise audio features (RMS energy per 25 ms frame @16 kHz
    defaults, global zero-crossing rate) over a binary audio column —
    the speech-quality/VAD gate of an audio curation pipeline.

    ``fake=False`` decodes with soundfile when importable, else falls
    back to the stdlib ``wave`` reader for 16-bit PCM WAV payloads (so
    the real path runs even in codec-less containers); undecodable
    payloads raise NotImplementedError. ``fake=True`` deterministically
    expands the payload bytes to an int16 PCM array so the Spark-side
    plumbing (Arrow batch shape, numpy vectorised framing, per-doc 1→1
    schema) is exercised either way. Framing is vectorised with
    stride_tricks — no per-sample Python loop.
    """

    def run(batches):
        import io as _io

        import numpy as _np
        import pandas as _pd

        def decode_pcm(payload: bytes):
            """payload → mono float64 PCM in [-1, 1): soundfile when
            present, stdlib wave (16-bit PCM) otherwise."""
            try:
                import soundfile as _sf
            except ImportError:
                _sf = None
            if _sf is not None:
                try:
                    data, _sr = _sf.read(
                        _io.BytesIO(payload), dtype="float64", always_2d=True
                    )
                    return data.mean(axis=1)
                except Exception as e:  # noqa: BLE001 — codec boundary
                    raise NotImplementedError(
                        f"undecodable audio payload: {e}; pass fake=True"
                    ) from e
            import wave as _wave

            try:
                with _wave.open(_io.BytesIO(payload), "rb") as w:
                    nch, sw = w.getnchannels(), w.getsampwidth()
                    raw = w.readframes(w.getnframes())
            except Exception as e:  # noqa: BLE001 — codec boundary
                raise NotImplementedError(
                    "real audio decode needs soundfile, or 16-bit PCM WAV "
                    "payloads for the stdlib fallback; pass fake=True"
                ) from e
            if sw != 2:
                raise NotImplementedError(
                    "stdlib WAV fallback reads 16-bit PCM only"
                )
            arr = _np.frombuffer(raw, dtype=_np.int16).astype(_np.float64) / 32768.0
            return arr.reshape(-1, nch).mean(axis=1)

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec[payload_col] or b"")
                if not fake:
                    pcm = decode_pcm(payload)
                else:
                    pcm = _np.frombuffer(
                        (payload * ((8000 // max(len(payload), 1)) + 1))[:8000],
                        dtype=_np.int16,
                    ).astype(_np.float64) / 32768.0
                n = pcm.shape[0]
                if n >= frame_len:
                    n_frames = 1 + (n - frame_len) // hop
                    # zero-copy strided framing: fancy-indexing pcm[idx]
                    # MATERIALIZED the full overlapping frame matrix
                    # (~2.5x the sample count in float64, plus the same
                    # again for the index matrix — ~1.7 GB transient for
                    # a 30-min WAV). The strided view over the squared
                    # signal reduces per window without copying; the
                    # per-element math is identical, so values are
                    # bit-for-bit the old ones.
                    pcm2 = pcm * pcm
                    w = _np.lib.stride_tricks.sliding_window_view(
                        pcm2, frame_len
                    )[:: hop][:n_frames]
                    rms = _np.sqrt(w.mean(axis=1))
                else:
                    n_frames, rms = 0, _np.array([0.0])
                zc = float((_np.signbit(pcm[1:]) != _np.signbit(pcm[:-1])).mean()) if n > 1 else 0.0
                rows.append(
                    {
                        "doc_id": rec[id_col],
                        "n_samples": n,
                        "n_frames": n_frames,
                        "mean_rms": float(rms.mean()),
                        "max_rms": float(rms.max()),
                        "zcr": zc,
                    }
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_frames", "mean_rms", "max_rms", "zcr",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, _out_schema(df, id_col, AUDIO_FEATURES_SCHEMA)
    )


# ----------------------------------------------------- perceptual hash

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def phash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """64-bit DCT perceptual hash (pHash) per image payload — the
    image-modality twin of the text simhash: visually-similar images
    land at small Hamming distance.

    ``fake=False`` decodes with PIL when importable (grayscale 32×32,
    the standard pHash pipeline) and raises otherwise; ``fake=True``
    tiles the raw payload bytes into the 32×32 luminance plane, which
    is LOCALITY-PRESERVING (payloads sharing most bytes produce nearby
    hashes), so the end-to-end near-dup behavior is exercised either
    way. The DCT + sign-vs-median math is the production path in both
    modes.

    Runs as Arrow-batched mapInPandas with the whole batch pushed
    through one numpy einsum — no per-row Python in the hot loop.
    """

    def run(batches):
        # self-contained closure: executors don't have the repo on path
        import io as _io

        import numpy as _np
        import pandas as _pd

        N = 32
        k = _np.arange(N)
        dct = _np.cos(_np.pi * (k[None, :] + 0.5) * k[:, None] / N)

        image_mod = luma_plane = None
        if not fake:
            try:
                from PIL import Image as image_mod  # noqa: N813
            except ImportError:
                try:
                    from chillastic_spark.operators.multimodal import (
                        _png_luma_plane as luma_plane,
                    )
                except ImportError as e:
                    raise NotImplementedError(
                        "real image decode needs PIL (pillow), or the "
                        "engine package on the executor path for the "
                        "stdlib PNG tier; pass fake=True"
                    ) from e

        for pdf in batches:
            ids, imgs = [], []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec[payload_col] or b"")
                if not fake:
                    try:
                        if image_mod is not None:
                            with image_mod.open(_io.BytesIO(payload)) as img:
                                plane = _np.asarray(
                                    img.convert("L").resize((N, N)),
                                    dtype=_np.float64,
                                )
                        else:
                            plane = luma_plane(payload, N)
                    except Exception as e:  # noqa: BLE001 — codec boundary
                        raise NotImplementedError(
                            f"unhashable image payload for doc "
                            f"{rec[id_col]} ({len(payload)} bytes): {e}; "
                            "pass fake=True"
                        ) from e
                    imgs.append(plane)
                    ids.append(rec[id_col])
                    continue
                # empty payload: b'' * k is still b'' — hash a zeroed
                # plane instead of crashing frombuffer().reshape(32,32)
                base = payload or b"\x00"
                buf = (base * (1024 // len(base) + 1))[:1024]
                imgs.append(
                    _np.frombuffer(buf, dtype=_np.uint8)
                    .astype(_np.float64)
                    .reshape(N, N)
                )
                ids.append(rec[id_col])
            if not ids:
                yield _pd.DataFrame({"doc_id": [], "phash": []})
                continue
            stack = _np.stack(imgs)                       # (B, 32, 32)
            freq = _np.einsum("ij,bjk,lk->bil", dct, stack, dct)
            low = freq[:, :8, :8].copy()
            low[:, 0, 0] = 0.0                            # drop DC term
            med = _np.median(low.reshape(len(ids), 64), axis=1)
            bits = low.reshape(len(ids), 64) > med[:, None]
            weights = 1 << _np.arange(63, -1, -1, dtype=_np.uint64)
            h = (bits.astype(_np.uint64) * weights).sum(axis=1)
            yield _pd.DataFrame(
                {"doc_id": ids, "phash": h.astype(_np.int64)}  # wrap to signed
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, _out_schema(df, id_col, PHASH_SCHEMA)
    )


def phash_pairs(
    ph: DataFrame, max_hamming: int = 6, chunks: int = 8
) -> DataFrame:
    """Image near-dup pairs with Hamming(phash) ≤ max_hamming.

    The shared ``dedup.hamming_band_pairs`` pipeline (one definition
    with the text simhash): 64 bits → ``chunks`` 8-bit chunks, equi-join
    candidates, JVM-side bit_count(xor) verification. max_hamming
    beyond chunks−1 raises (pigeonhole recall guarantee).
    """
    from chillastic_spark.operators.dedup import hamming_band_pairs

    return hamming_band_pairs(ph, "phash", 64, chunks, max_hamming)
