"""Real pure-stdlib/numpy media codecs (functions/codecs.py) and the
multimodal operators' real decode paths.

Strategy: (1) hand-constructed golden payloads — bytes written out
field by field in the test, independent of our encoders — pin the
decoders to the specs; (2) encode->decode round-trips cross-check the
pair (for WAV the encoder is the stdlib ``wave`` module, a genuinely
independent implementation); (3) hypothesis property tests sweep
random images through every PNG filter; (4) Spark-side tests certify
the ``real=True`` operator paths end-to-end, including corrupt-payload
null behavior and the JVM-side sample windowing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from garmin_data_pipeline_spark.functions import codecs as C

# ---------------------------------------------------------------------------
# Goldens: hand-built payloads, expected pixels/samples computed by hand
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return (
        struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)
    )


def test_png_golden_sub_filter_by_hand():
    # 2x1 RGB image, pixels (10,20,30), (250,1,2); filter 1 (Sub):
    # first pixel raw, second pixel minus left mod 256.
    filtered = bytes([1, 10, 20, 30, 240, 237, 228])
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )
    arr = C.decode_png(payload)
    assert arr.shape == (1, 2, 3)
    assert arr.tolist() == [[[10, 20, 30], [250, 1, 2]]]


def test_png_golden_paeth_by_hand():
    # 1x2 grayscale (two rows, one pixel each): row0 value 100 with
    # filter 0; row1 filter 4 (Paeth). For the first pixel of a row,
    # left=0, upleft=0, up=100 -> p=100, pb=0 wins -> predictor=100.
    # Stored byte 25 reconstructs to 125.
    filtered = bytes([0, 100, 4, 25])
    ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )
    arr = C.decode_png(payload)
    assert arr.shape == (2, 1)
    assert arr.tolist() == [[100], [125]]


def test_png_crc_mismatch_raises():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    good = _chunk(b"IHDR", ihdr)
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + bad
        + _chunk(b"IDAT", zlib.compress(bytes([0, 7])))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="CRC"):
        C.decode_png(payload)


def test_png_16bit_and_interlace_rejected():
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, 0, 0, 0, interlace)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes([0, 7, 7])))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            C.decode_png(payload)


def test_wav_golden_header_by_hand():
    # Minimal RIFF: PCM16 mono 8 kHz, 3 samples 1000, -2, 7, written
    # field by field (independent of both wave and encode_wav).
    data = struct.pack("<3h", 1000, -2, 7)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    meta, samples = C.decode_wav(payload)
    assert meta == {
        "sample_rate": 8000,
        "n_channels": 1,
        "sample_width": 2,
        "n_frames": 3,
    }
    assert samples[:, 0].tolist() == [1000, -2, 7]
    rng = C.wav_data_range(payload)
    assert rng["n_frames"] == 3 and rng["block_align"] == 2
    assert payload[rng["data_offset"] : rng["data_offset"] + 6] == data


def test_wav_odd_chunk_padding_and_extra_chunk():
    # A LIST chunk with odd size before fmt/data exercises the
    # word-alignment rule of the RIFF walk.
    data = struct.pack("<2h", 5, -5)
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 8000, 2, 16)
    body = (
        b"WAVE"
        + b"LIST"
        + struct.pack("<I", 3)
        + b"abc\x00"  # 3 bytes + pad
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    meta, samples = C.decode_wav(payload)
    assert meta["n_frames"] == 2
    assert samples[:, 0].tolist() == [5, -5]


def test_bmp_golden_topdown_by_hand():
    # 1x2 top-down (negative height) 24bpp BMP: row is pixel BGR
    # (30,20,10) then (2,1,250), padded to 8 bytes.
    row = bytes([30, 20, 10, 2, 1, 250, 0, 0])
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, len(row), 0, 0, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(row), 0, 0, 54)
    arr = C.decode_bmp(hdr + info + row)
    assert arr.tolist() == [[[10, 20, 30], [250, 1, 2]]]


def test_netpbm_comment_grammar_and_errors():
    payload = b"P5 # wide\n#another comment\n 3\t2 # dims\n255\n" + bytes(
        range(6)
    )
    arr, fmt = C.decode_netpbm(payload)
    assert fmt == "pgm" and arr.shape == (2, 3) and arr[1, 2] == 5
    with pytest.raises(ValueError, match="truncated netpbm raster"):
        C.decode_netpbm(b"P6\n2 2\n255\n" + bytes(5))
    with pytest.raises(ValueError, match="maxval"):
        C.decode_netpbm(b"P5\n1 1\n65535\n\x00\x00")


# ---------------------------------------------------------------------------
# Round-trips (encoder and decoder are independent for WAV; for the
# image formats the goldens above pin the decoder, so a round-trip
# failure localizes to the encoder)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "cycle"])
def test_png_roundtrip_all_filters(channels, ft):
    rng = np.random.default_rng(channels * 10 + (5 if ft == "cycle" else ft))
    shape = (11, 7) if channels == 1 else (11, 7, channels)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = C.decode_png(C.encode_png(arr, ft))
    assert out.shape == arr.shape and (out == arr).all()


def test_netpbm_bmp_wav_roundtrips():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    a, f = C.decode_netpbm(C.encode_netpbm(gray))
    assert f == "pgm" and (a == gray).all()
    a, f = C.decode_netpbm(C.encode_netpbm(rgb))
    assert f == "ppm" and (a == rgb).all()
    assert (C.decode_bmp(C.encode_bmp(rgb)) == rgb).all()
    s = rng.integers(-(2**15), 2**15, size=(50, 2)).astype(np.int16)
    meta, out = C.decode_wav(C.encode_wav(s, 44100, 2))
    assert meta["n_frames"] == 50 and (out == s).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(h, w, channels, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = C.decode_png(C.encode_png(arr, "cycle"))
    assert (out == arr).all()


def test_avi_roundtrip_and_meta():
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(4, 5, 7, 3), dtype=np.uint8)
    payload = C.encode_avi(frames, fps=25)
    assert C.sniff_format(payload) == "avi"
    meta, out = C.decode_avi(payload)
    assert meta == {"width": 7, "height": 5, "n_frames": 4, "fps": 25}
    assert (out == frames).all()


def test_avi_compressed_stream_raises():
    # Swap a frame chunk id from '00db' (uncompressed DIB) to '00dc'
    # (compressed): the decoder must refuse, not guess.
    payload = C.encode_avi(np.zeros((1, 2, 2, 3), dtype=np.uint8))
    broken = payload.replace(b"00db", b"00dc", 1)
    with pytest.raises(ValueError, match="ffmpeg"):
        C.decode_avi(broken)


def test_avi_golden_frame_layout():
    # One 2x2 frame; bottom-up BGR with 4-byte row padding means the
    # FIRST stored row is the BOTTOM image row. Verify against the
    # raw movi bytes by hand.
    frame = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]],
        dtype=np.uint8,
    )
    payload = C.encode_avi(frame[None])
    i = payload.find(b"00db")
    raw = payload[i + 8 : i + 8 + 16]
    # bottom row first, BGR order, row padded 6 -> 8 bytes
    assert raw == bytes([9, 8, 7, 12, 11, 10, 0, 0, 3, 2, 1, 6, 5, 4, 0, 0])
    meta, out = C.decode_avi(payload)
    assert (out[0] == frame).all()


def test_gif_golden_lzw_bitpacking_by_hand():
    # 2x1 image, 4-color palette, pixels [1, 2]. LZW (min code 2):
    # codes clear(4), 1, 2, end(5), all 3 bits wide, packed LSB-first:
    # 4 | 1<<3 | 2<<6 | 5<<9 = 2700 = bytes 8C 0A. Assembled by hand —
    # independent of our encoder.
    pal = bytes(
        [10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42]
    )
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 1)
        + bytes([0x81, 0, 0])  # global palette, 4 entries
        + pal
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, 2, 1)
        + b"\x00"
        + bytes([2])  # LZW min code size
        + bytes([2])  # sub-block length
        + b"\x8c\x0a"
        + b"\x00"  # block terminator
        + b"\x3b"
    )
    meta, frames = C.decode_gif(payload)
    assert meta == {"width": 2, "height": 1, "n_frames": 1}
    assert frames[0].tolist() == [[[20, 21, 22], [30, 31, 32]]]


def test_gif_interlace_four_pass():
    rng = np.random.default_rng(23)
    h, w = 8, 3
    idx = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
    # spec pass order for h=8: rows 0; 4; 2,6; 1,3,5,7
    stored = idx[[0, 4, 2, 6, 1, 3, 5, 7]]
    lzw = C._lzw_encode(stored.tobytes(), 2)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    payload = (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x81, 0, 0])
        + pal.tobytes()
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40])  # interlaced
        + bytes([2, len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    _meta, frames = C.decode_gif(payload)
    assert (frames[0] == pal[idx]).all()


def test_gif_roundtrip_palettes_and_resets():
    rng = np.random.default_rng(29)
    for p in (2, 16, 256):
        pal = rng.integers(0, 256, size=(p, 3), dtype=np.uint8)
        idx = rng.integers(0, p, size=(3, 9, 11), dtype=np.uint8)
        meta, frames = C.decode_gif(C.encode_gif(idx, pal))
        assert meta["n_frames"] == 3 and (frames == pal[idx]).all()
    # constant frame long enough to force a 4096 dictionary reset
    idx = np.zeros((1, 200, 300), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    pal[0] = (7, 8, 9)
    _m, frames = C.decode_gif(C.encode_gif(idx, pal))
    assert (frames == pal[idx]).all()


def test_gif_rect_composite_and_local_palette():
    # frame 1: full 2x1 canvas from the global palette; frame 2: a
    # 1x1 rect at (left=1) with a LOCAL palette — composition must
    # keep pixel 0's ORIGINAL color (RGB canvas, not index canvas).
    g_pal = np.array([[1, 1, 1], [2, 2, 2]], dtype=np.uint8)
    l_pal = np.array([[9, 9, 9], [8, 8, 8]], dtype=np.uint8)
    f1 = C._lzw_encode(bytes([0, 1]), 2)
    f2 = C._lzw_encode(bytes([0]), 2)
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 1)
        + bytes([0x80, 0, 0])  # global palette, 2 entries
        + g_pal.tobytes()
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([2, len(f1)]) + f1 + b"\x00"
        + b"\x2c" + struct.pack("<HHHH", 1, 0, 1, 1)
        + bytes([0x80])  # local palette, 2 entries
        + l_pal.tobytes()
        + bytes([2, len(f2)]) + f2 + b"\x00"
        + b"\x3b"
    )
    _m, frames = C.decode_gif(payload)
    assert frames[0].tolist() == [[[1, 1, 1], [2, 2, 2]]]
    assert frames[1].tolist() == [[[1, 1, 1], [9, 9, 9]]]


def test_gif_unsupported_disposal_raises():
    pal = np.zeros((2, 3), dtype=np.uint8)
    payload = bytearray(C.encode_gif(np.zeros((1, 1, 1), np.uint8), pal))
    i = bytes(payload).find(b"\x21\xf9")
    payload[i + 3] |= 2 << 2  # disposal mode 2 (restore background)
    with pytest.raises(ValueError, match="disposal"):
        C.decode_gif(bytes(payload))


def test_gif_encode_image_dispatch_exact():
    # encode_image('gif') palettizes exactly (<=256 unique colors)
    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    rgb = pal[rng.integers(0, 16, size=(6, 5), dtype=np.uint8)]
    out, fmt = C.decode_image(C.encode_image(rgb, "gif"))
    assert fmt == "gif" and (out == rgb).all()


def test_sniff_and_dispatch():
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    gif = C.encode_gif(
        np.arange(8, dtype=np.uint8).reshape(1, 2, 4), pal
    )
    for enc, fmt in (
        (C.encode_png(rgb), "png"),
        (C.encode_netpbm(rgb), "ppm"),
        (C.encode_bmp(rgb), "bmp"),
        (gif, "gif"),
    ):
        assert C.sniff_format(enc) == fmt
        assert C.image_meta(enc) == (4, 2, len(enc), fmt)
    assert C.sniff_format(b"\x00junk") is None
    assert (
        C.sniff_format(C.encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    )
    with pytest.raises(ValueError, match="undecodable"):
        C.decode_image(b"\xff\xd8\xff JPEG not supported")


def test_resize_nearest_grid_mapping():
    # 2x2 -> 4x4 nearest neighbor: each source pixel becomes a 2x2
    # block (standard center-sample grid).
    src = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    out = C.resize_nearest(src, 4, 4)
    assert out.tolist() == [
        [1, 1, 2, 2],
        [1, 1, 2, 2],
        [3, 3, 4, 4],
        [3, 3, 4, 4],
    ]
    # downscale picks center samples
    big = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = C.resize_nearest(big, 2, 2)
    assert out.tolist() == [[5, 7], [13, 15]]


# ---------------------------------------------------------------------------
# Corruption contract: EVERY decoder failure is a ValueError (the
# operator kernels' NULL-row guard catches exactly that), no matter
# how the payload is malformed — truncation naturally raises
# struct.error/IndexError/zlib.error/ZeroDivisionError inside, and a
# leak of any of those would kill the Spark task.
# ---------------------------------------------------------------------------


def _nasty_payloads():
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    png = C.encode_png(rgb)
    # a PNG whose IDAT body is not valid zlib but whose CRC is fixed up
    i = png.find(b"IDAT")
    bad_idat = bytearray(png)
    bad_idat[i + 4 : i + 8] = b"\x00\x01\x02\x03"
    (length,) = struct.unpack_from(">I", png, i - 4)
    body = bytes(bad_idat[i : i + 4 + length])
    crc = zlib.crc32(body) & 0xFFFFFFFF
    struct.pack_into(">I", bad_idat, i + 4 + length, crc)
    # a WAV declaring block_align = 0
    wav = bytearray(C.encode_wav(np.zeros(4, dtype=np.int16)))
    j = wav.find(b"fmt ")
    struct.pack_into("<H", wav, j + 8 + 12, 0)
    return [
        b"GIF89a",                      # 6-byte header only
        C.encode_gif(
            np.zeros((1, 4, 4), np.uint8), np.zeros((2, 3), np.uint8)
        )[:-10],                        # GIF truncated mid-stream
        png[: i + 6],                   # PNG truncated mid-chunk
        bytes(bad_idat),                # PNG with garbage deflate
        b"RIFF\x10\x00\x00\x00WAVEfmt \x02\x00\x00\x00\x01\x00",
        bytes(wav),                     # zeroed block_align
        C.encode_avi(np.zeros((1, 2, 2, 3), np.uint8))[:40],
        b"P6\n4 4\n255",                # netpbm header cut short
    ]


def test_all_corruption_surfaces_as_valueerror():
    for payload in _nasty_payloads():
        fmt = C.sniff_format(payload)
        for dec in (C.decode_image, C.decode_video, C.decode_wav,
                    C.wav_data_range):
            try:
                dec(payload)
            except ValueError:
                pass  # the contract
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"{dec.__name__} leaked {type(e).__name__} "
                    f"on {fmt!r} payload: {e}"
                ) from e


def test_corrupt_payloads_yield_null_rows_not_task_failure(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_audio_features,
        decode_image_metadata,
        decode_video_frames,
        resize_images,
    )

    rows = [
        (i, bytearray(p)) for i, p in enumerate(_nasty_payloads())
    ]
    df = spark.createDataFrame(rows, "asset_id int, payload binary")
    metas = decode_image_metadata(df, "payload", real=True).collect()
    assert all(r["width"] is None for r in metas)
    assert {r["format"] for r in metas} == {"unknown"}
    resized = resize_images(df, 4, 4, real=True).collect()
    assert all(r["width"] is None for r in resized)
    vids = decode_video_frames(df, "payload").collect()
    assert all(r["n_frames"] is None for r in vids)
    auds = decode_audio_features(df, "payload").collect()
    # payload 5 (zeroed block_align) is DECODABLE by decode_wav —
    # sample stride comes from bits, not block_align; only
    # wav_data_range (JVM windowing) needs block_align and rejects it
    assert all(
        r["n_frames"] is None for r in auds if r["asset_id"] != 5
    )
    (zeroed,) = [r for r in auds if r["asset_id"] == 5]
    assert zeroed["n_frames"] == 4 and zeroed["amp_sum"] == 0


def test_gif_transparency_keeps_prior_canvas():
    # frame 1 paints the 2x1 canvas; frame 2's graphic control sets
    # the transparency flag with index 1, and its pixels are
    # [transparent, 0] — so pixel 0 must KEEP frame 1's color.
    pal = np.array([[5, 5, 5], [200, 200, 200]], dtype=np.uint8)
    f1 = C._lzw_encode(bytes([1, 1]), 2)
    f2 = C._lzw_encode(bytes([1, 0]), 2)
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 1)
        + bytes([0x80, 0, 0])
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([2, len(f1)]) + f1 + b"\x00"
        # graphic control: flags bit0 = transparency, index 1
        + b"\x21\xf9\x04\x01\x00\x00\x01\x00"
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([2, len(f2)]) + f2 + b"\x00"
        + b"\x3b"
    )
    _m, frames = C.decode_gif(payload)
    assert frames[0].tolist() == [[[200] * 3, [200] * 3]]
    # pixel 0 transparent -> keeps 200; pixel 1 painted with pal[0]
    assert frames[1].tolist() == [[[200] * 3, [5] * 3]]


def test_wav_data_range_clamps_truncated_declaration():
    full = C.encode_wav(np.arange(100, dtype=np.int16))
    truncated = full[:-120]  # drop 60 of the declared 100 frames
    rng = C.wav_data_range(truncated)
    assert rng["n_frames"] == 40  # from bytes PRESENT, not declared
    meta, _ = C.decode_wav(truncated)
    assert meta["n_frames"] == 40  # both parsers agree


def test_avi_audio_stream_does_not_shadow_video_strf():
    frames = np.arange(24, dtype=np.uint8).reshape(1, 2, 4, 3)
    payload = bytearray(C.encode_avi(frames))
    # splice an 'auds' strl (strh + a WAVEFORMATEX-ish strf) AFTER
    # the video strl, inside hdrl — the common mixed-AV layout
    astrh = b"auds" + bytes(52)
    astrf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    strl = (
        b"LIST"
        + struct.pack("<I", 4 + 8 + len(astrh) + 8 + len(astrf))
        + b"strl"
        + b"strh" + struct.pack("<I", len(astrh)) + astrh
        + b"strf" + struct.pack("<I", len(astrf)) + astrf
    )
    i = bytes(payload).find(b"LIST", 12)  # hdrl LIST header
    (hdrl_size,) = struct.unpack_from("<I", payload, i + 4)
    end = i + 8 + hdrl_size  # splice at the end of hdrl's body
    payload[end:end] = strl
    struct.pack_into("<I", payload, i + 4, hdrl_size + len(strl))
    struct.pack_into("<I", payload, 4, len(payload) - 8)
    meta, out = C.decode_avi(bytes(payload))
    assert meta["width"] == 4 and meta["height"] == 2
    assert (out == frames).all()


def test_resize_images_real_animated_gif_keeps_all_frames(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        resize_images,
    )

    rng = np.random.default_rng(41)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(5, 4, 4), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(C.encode_gif(idx, pal)))],
        "asset_id int, payload binary",
    )
    row = resize_images(df, 8, 8, real=True).collect()[0]
    meta, frames = C.decode_gif(bytes(row["payload"]))
    assert meta["n_frames"] == 5  # the animation survived the resize
    expect = np.stack(
        [C.resize_nearest(pal[f], 8, 8) for f in idx]
    )
    assert (frames == expect).all()


def test_decode_video_frames_validates_every_n(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_video_frames,
    )

    df = spark.createDataFrame([(1, bytearray(b""))], "i int, payload binary")
    with pytest.raises(ValueError, match="every_n"):
        decode_video_frames(df, "payload", every_n=0)


def test_window_audio_frames_tail_stops_at_data_chunk(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        window_audio_frames,
    )

    samples = np.arange(10, dtype=np.int16)
    wav = bytearray(C.encode_wav(samples))
    # append a LIST INFO chunk AFTER data (many encoders do)
    info = b"INFOISFT" + struct.pack("<I", 4) + b"test"
    wav += b"LIST" + struct.pack("<I", len(info)) + info
    struct.pack_into("<I", wav, 4, len(wav) - 8)
    df = spark.createDataFrame(
        [(1, bytearray(bytes(wav)))], "clip_id int, payload binary"
    )
    rows = sorted(
        window_audio_frames(df, window_frames=8, hop_frames=4).collect(),
        key=lambda r: r["window_idx"],
    )
    tail = rows[-1]
    start = tail["window_idx"] * 4
    # the tail window holds ONLY real PCM — no LIST bytes spliced on
    assert bytes(tail["window"]) == samples[start:].tobytes()
    assert tail["window_len_frames"] == 10 - start


# ---------------------------------------------------------------------------
# Spark-side: the real=True operator paths
# ---------------------------------------------------------------------------


def _asset_df(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i, fmt in enumerate(["png", "ppm", "pgm", "bmp", "gif"]):
        w, h = 3 + i, 2 + i
        if fmt == "gif":
            pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
            idx = rng.integers(0, 8, size=(1, h, w), dtype=np.uint8)
            payload = C.encode_gif(idx, pal)
        else:
            shape = (h, w) if fmt == "pgm" else (h, w, 3)
            arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
            payload = (
                C.encode_png(arr, "cycle")
                if fmt == "png"
                else C.encode_netpbm(arr)
                if fmt in ("ppm", "pgm")
                else C.encode_bmp(arr)
            )
        rows.append((i, fmt, w, h, bytearray(payload)))
    rows.append((99, "corrupt", None, None, bytearray(b"not an image")))
    return spark.createDataFrame(
        rows, "asset_id int, fmt string, exp_w int, exp_h int, payload binary"
    )


def test_decode_image_metadata_real(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_image_metadata,
    )

    out = decode_image_metadata(_asset_df(spark), "payload", real=True)
    got = {
        r["asset_id"]: (r["width"], r["height"], r["format"])
        for r in out.collect()
    }
    assert got[0] == (3, 2, "png")
    assert got[1] == (4, 3, "ppm")
    assert got[2] == (5, 4, "pgm")
    assert got[3] == (6, 5, "bmp")
    assert got[4] == (7, 6, "gif")
    assert got[99] == (None, None, "unknown")


def test_resize_images_real_roundtrip(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        resize_images,
    )

    out = resize_images(_asset_df(spark), 8, 6, real=True)
    rows = {r["asset_id"]: r for r in out.collect()}
    for i in range(5):
        r = rows[i]
        assert (r["width"], r["height"]) == (8, 6)
        arr, fmt = C.decode_image(bytes(r["payload"]))
        assert fmt == r["fmt"] and arr.shape[:2] == (6, 8)
    # corrupt payload passes through untouched with NULL dims
    assert rows[99]["width"] is None
    assert bytes(rows[99]["payload"]) == b"not an image"


def test_decode_audio_features_real(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_audio_features,
    )

    rng = np.random.default_rng(5)
    clips = {
        i: rng.integers(-1024, 1024, size=20 + i).astype(np.int16)
        for i in range(3)
    }
    rows = [
        (i, bytearray(C.encode_wav(s, 8000, 1))) for i, s in clips.items()
    ] + [(9, bytearray(b"RIFFxxxxJUNK"))]
    df = spark.createDataFrame(rows, "clip_id int, payload binary")
    got = {
        r["clip_id"]: r
        for r in decode_audio_features(df, "payload").collect()
    }
    for i, s in clips.items():
        s64 = s.astype(np.int64)
        assert got[i]["n_frames"] == len(s)
        assert got[i]["sample_rate"] == 8000
        assert got[i]["amp_sum"] == int(s64.sum())
        assert got[i]["amp_sq_sum"] == int((s64 * s64).sum())
    assert got[9]["n_frames"] is None


def test_decode_video_frames_real(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_video_frames,
    )

    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, size=(5, 4, 6, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    gidx = rng.integers(0, 16, size=(3, 4, 6), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(C.encode_avi(frames))),
            (2, bytearray(C.encode_gif(gidx, pal))),
            (9, bytearray(b"RIFFxxxxAVI junk")),
        ],
        "clip_id int, payload binary",
    )
    rows = decode_video_frames(df, "payload", every_n=2).collect()
    good = sorted(
        (r for r in rows if r["clip_id"] == 1),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in good] == [0, 2, 4]
    for r in good:
        expect = int(frames[r["frame_idx"]].astype("int64").sum())
        assert (r["width"], r["height"], r["n_frames"]) == (6, 4, 5)
        assert r["px_sum"] == expect
    gif_rows = sorted(
        (r for r in rows if r["clip_id"] == 2),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in gif_rows] == [0, 2]
    for r in gif_rows:
        expect = int(pal[gidx[r["frame_idx"]]].astype("int64").sum())
        assert (r["width"], r["height"], r["n_frames"]) == (6, 4, 3)
        assert r["px_sum"] == expect
    bad = [r for r in rows if r["clip_id"] == 9]
    assert len(bad) == 1 and bad[0]["n_frames"] is None


def test_sniff_media_type_col_jvm_side(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        sniff_media_type_col,
    )

    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    rows = [
        (1, bytearray(C.encode_png(rgb)), "image/png"),
        (2, bytearray(C.encode_netpbm(rgb)), "image/x-portable-pixmap"),
        (3, bytearray(C.encode_netpbm(rgb[:, :, 0])),
         "image/x-portable-graymap"),
        (4, bytearray(C.encode_bmp(rgb)), "image/bmp"),
        (5, bytearray(C.encode_wav(np.zeros(4, dtype=np.int16))),
         "audio/wav"),
        (6, bytearray(C.encode_avi(rgb[None])), "video/x-msvideo"),
        (7, bytearray(b"plain text"), "application/octet-stream"),
        (10, bytearray(
            C.encode_gif(
                np.zeros((1, 2, 2), np.uint8),
                np.zeros((2, 3), np.uint8),
            )
        ), "image/gif"),
        # a RIFF that is neither WAVE nor AVI
        (8, bytearray(b"RIFF\x04\x00\x00\x00JUNK"),
         "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id int, payload binary, expect string"
    )
    out = df.withColumn("media_type", sniff_media_type_col("payload"))
    for r in out.collect():
        assert r["media_type"] == r["expect"], r["asset_id"]
    # the router is pure column expressions — zero Python in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    # and it agrees with the Python sniffer on every format
    for _, payload, expect in rows:
        fmt = C.sniff_format(bytes(payload))
        expect_py = C.MEDIA_TYPES.get(fmt, "application/octet-stream")
        assert expect_py == expect


def test_m7_analytic_pin(spark, sf_dir):
    from garmin_data_pipeline_spark.plans import QUERIES

    out = QUERIES["m7_video_frame_stats"].fn(spark, sf_dir)
    rows = [
        r
        for r in out.collect()
        if r["doc_id"] in (0, 1, 2, 3, 7)
    ]
    assert rows
    for r in rows:
        did = r["doc_id"]
        d, w, h, nf = did % 50, 8 + did % 4, 6 + did % 3, 3 + did % 4
        f = r["frame_idx"]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert f % 2 == 0 and f < nf
        # direct numpy recomputation, independent of the closed form:
        # even doc_ids are AVI (per-channel +c term), odd are GIF
        # (one palette index per pixel, replicated to 3 channels)
        ys = np.arange(h)[:, None]
        xs = np.arange(w)[None, :]
        if did % 2 == 0:
            cs = np.arange(3)[None, None, :]
            expect = int(((d + f + ys + xs)[..., None] + cs).sum())
        else:
            expect = 3 * int((d + f + ys + xs).sum())
        assert r["px_sum"] == expect


def test_m5_m6_analytic_pins(spark, sf_dir):
    """The registered real-codec queries, pinned against a direct
    numpy recomputation of their analytic formulas (independent of
    both the Spark plan and the DuckDB oracle)."""
    import duckdb

    from garmin_data_pipeline_spark.plans import QUERIES

    docs = duckdb.connect().execute(
        f"SELECT doc_id, COALESCE(text,'') FROM "
        f"'{sf_dir}/documents.parquet' ORDER BY doc_id LIMIT 5"
    ).fetchall()

    m5 = {
        r["doc_id"]: r
        for r in QUERIES["m5_image_stats"].fn(spark, sf_dir).collect()
    }
    m6 = {
        r["doc_id"]: r
        for r in QUERIES["m6_audio_features"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in docs:
        w, h = 8 + doc_id % 8, 8 + doc_id % 5
        px = text[: w * h * 3].ljust(w * h * 3, "x")
        assert (m5[doc_id]["width"], m5[doc_id]["height"]) == (w, h)
        assert m5[doc_id]["format"] == "ppm"
        assert m5[doc_id]["px_sum"] == sum(ord(c) for c in px)

        n = 64 + doc_id % 64
        i = np.arange(n, dtype=np.int64)
        s = (doc_id * 7 + i * 13) % 2048 - 1024
        assert m6[doc_id]["n_frames"] == n
        assert m6[doc_id]["amp_sum"] == int(s.sum())
        assert m6[doc_id]["amp_sq_sum"] == int((s * s).sum())


def test_window_audio_frames_real_jvm_slicing(spark):
    from garmin_data_pipeline_spark.operators.multimodal import (
        window_audio_frames,
    )

    rng = np.random.default_rng(6)
    samples = rng.integers(-(2**15), 2**15, size=(23, 2)).astype(np.int16)
    payload = C.encode_wav(samples, 16000, 2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "clip_id int, payload binary"
    )
    out = window_audio_frames(df, window_frames=8, hop_frames=4)
    rows = sorted(out.collect(), key=lambda r: r["window_idx"])
    # starts at 0,4,8,12,16 (start < n_frames - overlap = 19)
    assert [r["window_idx"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        start = r["window_idx"] * 4
        end = min(start + 8, 23)
        assert r["window_len_frames"] == end - start
        expect = samples[start:end].tobytes()
        assert bytes(r["window"]) == expect
    # the exploded slicing plan stays JVM-side: exactly ONE Arrow
    # batch stage (the header parse), no further Python past it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


# ---------------------------------------------------------------------------
# Decompression-bomb / implausible-header guards (ADVICE r11): a
# crafted payload must become a ValueError (-> NULL row) BEFORE any
# header-driven allocation, never an executor OOM.
# ---------------------------------------------------------------------------


def test_gif_implausible_dims_rejected_before_allocation():
    # u16 dims 65535x65535 would imply a 12.9 GB RGB canvas
    bomb = b"GIF89a" + struct.pack("<HH", 65535, 65535) + b"\x00\x00\x00"
    with pytest.raises(ValueError, match="implausible pixel count"):
        C.decode_gif(bomb)


def test_gif_frame_rect_cap():
    # plausible screen, implausible frame rect (inconsistent header)
    p = bytearray(b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x00\x00\x00")
    p += b"\x2c" + struct.pack("<HHHH", 0, 0, 65535, 65535) + b"\x00"
    with pytest.raises(ValueError, match="implausible pixel count"):
        C.decode_gif(bytes(p))


def test_avi_implausible_dims_rejected_before_allocation():
    clip = C.encode_avi(np.zeros((2, 2, 2, 3), dtype=np.uint8))
    strf = clip.index(b"strf") + 8  # chunk id + size -> BITMAPINFOHEADER
    bomb = bytearray(clip)
    # width i32 at +4, height i32 at +8 of the BITMAPINFOHEADER
    struct.pack_into("<ii", bomb, strf + 4, 1 << 20, 1 << 20)
    with pytest.raises(ValueError, match="implausible pixel count"):
        C.decode_avi(bytes(bomb))


def test_png_implausible_ihdr_rejected():
    ihdr = _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 2, 0, 0, 0)
    )
    bomb = C._PNG_SIG + ihdr + _chunk(b"IDAT", b"") + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="implausible pixel count"):
        C.decode_png(bomb)


def test_png_idat_inflate_is_bounded():
    # IHDR says 2x2 gray (need = 2*(2+1) = 6 bytes of raw stream) but
    # the IDAT inflates to 32 MB: the bounded inflate must stop at
    # `need` and decode the declared image rather than materialize it
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    raw = bytes([0, 7, 9]) + b"\x00" * (32 * 1024 * 1024)
    png = (
        C._PNG_SIG
        + ihdr
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = C.decode_png(png)
    assert out.shape == (2, 2)
    assert out[0, 0] == 7 and out[0, 1] == 9


def test_png_zero_dimension_rejected_before_inflate():
    """r12 review: need == 0 would make the bounded inflate UNBOUNDED
    (zlib treats max_length=0 as unlimited) — zero-dim PNGs must be
    rejected before the inflate."""
    bomb = zlib.compress(b"\x00" * (8 * 1024 * 1024))
    for w, h in ((4, 0), (0, 4)):
        ihdr = _chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        )
        png = (
            C._PNG_SIG + ihdr + _chunk(b"IDAT", bomb)
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="zero dimension"):
            C.decode_png(png)
