"""Adversarial fuzz of the stdlib PNG decoder (r6 verdict #6).

``_png_decode`` is load-bearing for the real-decode evidence tier
(operators/multimodal.py probe ladder), so it must never mis-decode,
hang, or let a non-ValueError escape on crafted bytes: truncated IDAT,
ancillary chunks, wrong CRC, 16-bit depth, interlace flag, mismatched
scanline lengths, zlib damage, and decompression bombs all either
round-trip exactly or raise ValueError — the quarantine-routable error
class.
"""
import json
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chillastic_spark.operators.multimodal import (
    _PNG_MAX_RAW,
    _PNG_SIG,
    _png_decode,
    _png_encode,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _valid_png(w, h, nch, pixel_byte=7):
    px = bytes((pixel_byte + i) % 256 for i in range(w * h * nch))
    return px, _png_encode(px, w, h, nch)


# --------------------------------------------------------- round trips


@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    nch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_random_pixels(w, h, nch, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * nch, max_size=w * h * nch
            )
        )
    )
    assert _png_decode(_png_encode(px, w, h, nch)) == (w, h, nch, px)


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    cut=st.integers(0, 200),
    flip_at=st.integers(0, 200),
    flip_to=st.integers(0, 255),
)
@settings(max_examples=120, deadline=None)
def test_truncations_and_bitflips_never_escape_valueerror(
    w, h, cut, flip_at, flip_to
):
    """Any truncation and any single-byte corruption of a valid PNG
    either still decodes to the ORIGINAL pixels (the flip landed on a
    byte the decoder never reads — impossible now that critical CRCs
    are verified, but kept as the contract) or raises ValueError."""
    px, png = _valid_png(w, h, 1)
    for mutant in (
        png[: min(cut, len(png) - 1)],
        png[: flip_at % len(png)]
        + bytes([flip_to])
        + png[flip_at % len(png) + 1 :],
    ):
        try:
            got = _png_decode(mutant)
        except ValueError:
            continue
        assert got == (w, h, 1, px)  # untouched semantics only


def test_ancillary_chunks_are_skipped_not_fatal():
    """tEXt/pHYs/unknown ancillary chunks (even with WRONG CRCs — they
    are skipped unread) must not change the decode."""
    px, png = _valid_png(5, 4, 3)
    ihdr_end = 8 + 12 + 13
    bad_crc_text = (
        struct.pack(">I", 9) + b"tEXt" + b"key\x00value" + b"\xde\xad\xbe\xef"
    )
    mutant = (
        png[:ihdr_end]
        + _chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
        + bad_crc_text
        + png[ihdr_end:]
    )
    assert _png_decode(mutant) == (5, 4, 3, px)


# ------------------------------------------------------ targeted edges


def _patched_ihdr(png: bytes, **fields) -> bytes:
    w, h, depth, ctype, comp, filt, inter = struct.unpack(
        ">IIBBBBB", png[16:29]
    )
    vals = dict(
        w=w, h=h, depth=depth, ctype=ctype, comp=comp, filt=filt, inter=inter
    )
    vals.update(fields)
    data = struct.pack(
        ">IIBBBBB", vals["w"], vals["h"], vals["depth"], vals["ctype"],
        vals["comp"], vals["filt"], vals["inter"],
    )
    return png[:8] + _chunk(b"IHDR", data) + png[8 + 25 :]


@pytest.mark.parametrize(
    "fields,msg",
    [
        ({"depth": 16}, "bit depth"),
        ({"depth": 1}, "bit depth"),
        ({"inter": 1}, "interlaced"),
        ({"ctype": 3}, "color type"),  # palette
        ({"w": 0}, "zero-dimension"),
        ({"h": 0}, "zero-dimension"),
        ({"h": 9}, "length mismatch"),  # scanline count lies
        ({"w": 6}, "length mismatch"),  # scanline width lies
        ({"w": 1 << 24, "h": 1 << 24}, "implausibly large"),
    ],
)
def test_hostile_headers_raise_valueerror(fields, msg):
    _, png = _valid_png(5, 4, 1)
    with pytest.raises(ValueError, match=msg):
        _png_decode(_patched_ihdr(png, **fields))


def test_truncated_ihdr_raises_valueerror_not_struct_error():
    png = _PNG_SIG + _chunk(b"IHDR", b"\x00\x00\x00\x05")  # 4 of 13 bytes
    with pytest.raises(ValueError, match="IHDR"):
        _png_decode(png)


def test_corrupt_idat_zlib_raises_valueerror_not_zlib_error():
    _, png = _valid_png(4, 4, 1)
    # rebuild IDAT with garbage bytes and a CORRECT crc so the zlib
    # layer (not the crc check) is what trips
    mutant = (
        png[: 8 + 25]
        + _chunk(b"IDAT", b"\x01\x02\x03\x04not-zlib")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT|length"):
        _png_decode(mutant)


def test_critical_chunk_crc_mismatch_raises():
    _, png = _valid_png(4, 3, 1)
    # flip one byte of the IHDR CRC specifically
    crc_at = 8 + 8 + 13
    mutant = (
        png[:crc_at]
        + bytes([png[crc_at] ^ 0xFF])
        + png[crc_at + 1 :]
    )
    with pytest.raises(ValueError, match="CRC"):
        _png_decode(mutant)


def test_decompression_bomb_is_bounded():
    """An IDAT inflating far past the header's claim must fail as a
    length mismatch WITHOUT materializing the bomb (bounded inflate),
    and a header claiming bomb-scale dims is rejected before inflate."""
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # 64 MB of zeros, ~64 KB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # claims 2x2 gray
    png = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        _png_decode(png)
    # headline-dims bomb: rejected by the raw-size ceiling up front
    big = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 6, 0, 0, 0)
    png2 = _PNG_SIG + _chunk(b"IHDR", big) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
    assert (1 << 16) * ((1 << 16) * 4 + 1) > _PNG_MAX_RAW
    with pytest.raises(ValueError, match="implausibly large"):
        _png_decode(png2)


def _idat_of(png: bytes) -> bytes:
    pos, idat = 8, b""
    while pos + 8 <= len(png):
        ln, typ = struct.unpack(">I4s", png[pos : pos + 8])
        if typ == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return idat


def test_filter_type_byte_out_of_range():
    px = bytes(range(12))
    png = _png_encode(px, 4, 3, 1)
    raw = bytearray(zlib.decompress(_idat_of(png)))
    raw[0] = 9  # invalid filter type on row 0
    mutant = (
        png[: 8 + 25] + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter"):
        _png_decode(mutant)


# --------------------------------------------------- quarantine e2e


def test_corrupt_png_payload_routes_to_quarantine(spark):
    """The pipeline contract the hardening exists for: a mutator that
    decodes its payload hits a corrupt PNG, raises ValueError, and the
    doc lands in the quarantine side-channel while the batch's healthy
    docs keep flowing — the slice never dies."""
    from chillastic_spark.operators.mutate import (
        QUARANTINE_INDEX,
        apply_data_mutators,
    )
    from chillastic_spark.sources import ENVELOPE_SCHEMA

    px, good = _valid_png(6, 6, 1)
    corrupt = good[: len(good) // 2]  # truncated mid-IDAT

    import base64

    rows = [
        ("imgs", "t", "ok", json.dumps(
            {"png_b64": base64.b64encode(good).decode()}), 10),
        ("imgs", "t", "bad", json.dumps(
            {"png_b64": base64.b64encode(corrupt).decode()}), 10),
    ]
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA)

    class DecodeMut:
        arguments = None

        @staticmethod
        def predicate(d, a):
            return True

        @staticmethod
        def mutate(d, a):
            import base64 as _b64

            from chillastic_spark.operators.multimodal import _png_decode

            w, h, nch, _ = _png_decode(_b64.b64decode(d["_source"]["png_b64"]))
            d["_source"] = {"width": w, "height": h, "channels": nch}
            return d

    out = apply_data_mutators(df, [DecodeMut()], quarantine=True).collect()
    by_index = {}
    for r in out:
        by_index.setdefault(r["_index"], []).append(r)
    assert len(by_index["imgs"]) == 1
    assert json.loads(by_index["imgs"][0]["_source"]) == {
        "width": 6, "height": 6, "channels": 1,
    }
    q = by_index[QUARANTINE_INDEX]
    assert len(q) == 1 and q[0]["_id"] == "imgs/bad"
    assert "ValueError" in json.loads(q[0]["_source"])["error"]
