"""Multimodal binary-column plumbing: real codecs only — unknown
modalities raise (strict) or land in the quarantine split (quarantined);
no fake decode kernel exists anywhere (r06 verdict #2)."""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.operators.multimodal import (
    attach_fake_payload,
    attach_png_payload,
    decode_png,
    encode_png,
    extract_features,
    multimodal_features,
)
from mapreduce_rs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(50)


def test_payload_schema(docs):
    df = attach_fake_payload(docs)
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<")


def test_quarantine_routes_codecless_modality_to_error_rows(docs):
    # Codec-less modalities are DECODE ERRORS in the quarantine variant
    # too (r06 verdict #2): every unknown-modality row must land in the
    # quarantine split with decode_error set and NULL stats — never a
    # fabricated feature row with err=None.
    from mapreduce_rs_spark.operators.multimodal import extract_features_quarantined

    feats = extract_features_quarantined(attach_fake_payload(docs))
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r["decode_error"] is not None for r in rows)
    assert all("no codec for modality" in r["decode_error"] for r in rows)
    assert all(
        r["width"] is None and r["height"] is None
        and r["n_channels"] is None and r["mean_intensity"] is None
        for r in rows
    )
    # The clean split is EMPTY: nothing fake leaks into the good stream.
    assert feats.where("decode_error IS NULL").count() == 0
    assert feats.where("decode_error IS NOT NULL").count() == 50


def test_strict_extract_raises_on_codecless_modality(docs):
    # The STRICT variant has no fake-kernel fallback: an unknown
    # modality fails the task with a pointer to the quarantine variant.
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="no codec for modality"):
        extract_features(attach_fake_payload(docs.limit(2))).collect()


def test_resize_stage_shapes(docs):
    # The resize kernel is REAL (decode via content_type + NN
    # resample), so it runs over actual PNG payloads now.
    from mapreduce_rs_spark.operators.multimodal import (
        attach_png_payload,
        resize_images,
    )

    # r13: 16 docs, not the fixture's 50 — the shape contract is
    # per-row, and the pure-Python PNG encode+decode costs ~0.6 s/doc
    # (this test alone was 33 s of the default tier at 50).
    out = resize_images(
        attach_png_payload(docs.limit(16)), out_w=8, out_h=6
    ).collect()
    assert len(out) == 16
    assert all(len(r["payload"]) == 8 * 6 * 1 for r in out)  # grayscale
    assert all(r["width"] == 8 and r["height"] == 6 for r in out)


def test_resize_rejects_codecless_modality(docs):
    # Strict rule (the extract_features contract): a modality without a
    # pixel decoder fails the task, never resamples garbage bytes.
    from pyspark.errors import PythonException

    from mapreduce_rs_spark.operators.multimodal import resize_images

    with pytest.raises(PythonException, match="no pixel codec"):
        resize_images(attach_fake_payload(docs.limit(2))).collect()


def test_nn_resize_matches_numpy():
    # Pixel-exact cross-check of the kernel against an independent
    # numpy formulation, both directions (down/up) and multi-channel.
    import numpy as np

    from mapreduce_rs_spark.operators.multimodal import _nn_resize

    rng = np.random.RandomState(7)
    for w, h, ch, ow, oh in [(16, 12, 1, 12, 8), (3, 2, 1, 8, 6), (5, 7, 3, 4, 9)]:
        pixels = rng.randint(0, 256, size=h * w * ch, dtype=np.uint8)
        got = _nn_resize(bytes(pixels), w, h, ch, ow, oh)
        arr = pixels.reshape(h, w, ch)
        ys = (np.arange(oh) * h) // oh
        xs = (np.arange(ow) * w) // ow
        want = arr[np.ix_(ys, xs)].tobytes()
        assert got == want, (w, h, ch, ow, oh)


def test_resize_roundtrip_bmp():
    # The BMP pixel decoder un-flips bottom-up rows; resizing to the
    # SAME dims must reproduce the original top-down pixel buffer.
    from mapreduce_rs_spark.operators.multimodal import (
        _nn_resize,
        decode_bmp_pixels,
        encode_bmp,
    )

    import numpy as np

    rng = np.random.RandomState(11)
    w, h = 5, 4
    pixels = bytes(rng.randint(0, 256, size=w * h * 3, dtype=np.uint8))
    got_w, got_h, ch, decoded = decode_bmp_pixels(encode_bmp(w, h, pixels))
    assert (got_w, got_h, ch) == (w, h, 3)
    assert decoded == pixels
    assert _nn_resize(decoded, w, h, 3, w, h) == pixels


def test_frame_sampling_expands_1_to_n(docs):
    from mapreduce_rs_spark.operators.multimodal import (
        attach_gif_payload,
        decode_gif,
        sample_video_frames,
    )

    clips = attach_gif_payload(docs)
    frames = sample_video_frames(clips, n_samples=4).collect()
    assert len(frames) == 50 * 4
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # exactly n_samples rows per clip, sample_idx dense 0..3, timestamps
    # non-decreasing along the sample axis, frame bytes real pixels
    for fs in by_doc.values():
        fs.sort(key=lambda f: f["sample_idx"])
        assert [f["sample_idx"] for f in fs] == [0, 1, 2, 3]
        assert all(a["t_ms"] <= b["t_ms"] for a, b in zip(fs, fs[1:]))
        assert all(a["frame_idx"] <= b["frame_idx"] for a, b in zip(fs, fs[1:]))
        assert all(len(f["frame"]) == f["n_pixels"] for f in fs)
        assert all(sum(f["frame"]) == f["sum_intensity"] for f in fs)
    # the sampler's selection replays pure-Python playback semantics
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in clips.collect()}
    for doc_id, fs in by_doc.items():
        w, h, decoded = decode_gif(payloads[doc_id])
        starts, acc = [], 0
        for _, d in decoded:
            starts.append(acc)
            acc += d
        for f in fs:
            t_cs = f["sample_idx"] * acc // 4
            expect = max(i for i, s in enumerate(starts) if s <= t_cs)
            assert f["frame_idx"] == expect and f["t_ms"] == t_cs * 10
            assert bytes(f["frame"]) == decoded[expect][0]


def test_feature_summary(docs):
    rows = {r["modality"]: r for r in multimodal_features(docs).collect()}
    # Even doc_ids land on the real PNG codec, odd ones on the real BMP
    # codec — no stub branch anywhere in the plan (r04 verdict).
    assert set(rows) == {"image/bmp", "image/png"}
    assert rows["image/bmp"]["n_docs"] + rows["image/png"]["n_docs"] == 50
    assert all(r["total_pixels"] > 0 and r["sum_intensity"] > 0 for r in rows.values())


# ---------------------------------------------------------------------------
# Real PNG codec (pure Python, zlib+struct)
# ---------------------------------------------------------------------------


def test_png_roundtrip_exact_mean():
    # 2x2 grayscale with known pixels → exact decoded stats.
    pixels = bytes([0, 100, 200, 255])
    payload = encode_png(2, 2, pixels, 1)
    w, h, c, mean = decode_png(payload)
    assert (w, h, c) == (2, 2, 1)
    assert mean == sum(pixels) / 4


def test_png_roundtrip_rgb():
    pixels = bytes(range(3 * 4 * 3))  # 3x4 RGB gradient
    payload = encode_png(3, 4, pixels, 3)
    w, h, c, mean = decode_png(payload)
    assert (w, h, c) == (3, 4, 3)
    assert mean == sum(pixels) / len(pixels)


def test_png_all_filters_decode():
    """The decoder must handle filtered scanlines, not just filter 0:
    re-filter a known image with each filter type and check the decode
    recovers identical stats."""
    import struct as st
    import zlib

    width, height = 5, 3
    pixels = bytes([(x * 37 + y * 91) % 256 for y in range(height) for x in range(width)])
    expected_mean = sum(pixels) / len(pixels)

    def refilter(filt: int) -> bytes:
        rows = []
        prev = bytes(width)
        for y in range(height):
            line = pixels[y * width : (y + 1) * width]
            enc = bytearray([filt])
            for i in range(width):
                left = line[i - 1] if i >= 1 else 0
                up = prev[i]
                up_left = prev[i - 1] if i >= 1 else 0
                if filt == 0:
                    enc.append(line[i])
                elif filt == 1:
                    enc.append((line[i] - left) & 0xFF)
                elif filt == 2:
                    enc.append((line[i] - up) & 0xFF)
                elif filt == 3:
                    enc.append((line[i] - (left + up) // 2) & 0xFF)
                else:  # paeth
                    p = left + up - up_left
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - up_left)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else up_left)
                    enc.append((line[i] - pred) & 0xFF)
            rows.append(bytes(enc))
            prev = line

        def chunk(tag: bytes, data: bytes) -> bytes:
            return st.pack(">I", len(data)) + tag + data + st.pack(
                ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
            )

        ihdr = st.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )

    for filt in range(5):
        w, h, c, mean = decode_png(refilter(filt))
        assert (w, h, c, mean) == (width, height, 1, expected_mean), f"filter {filt}"


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_payload_survives_empty_text(spark):
    # Empty documents must produce a valid (zero-padded) 1x1 PNG, not
    # crash the encode stage.
    df = spark.createDataFrame([(1, "", "en"), (2, "some text", "en")], ["doc_id", "text", "lang"])
    feats = {r["doc_id"]: r for r in extract_features(attach_png_payload(df)).collect()}
    assert feats[1]["width"] == 1 and feats[1]["height"] == 1
    assert feats[1]["mean_intensity"] == 0.0  # zero-padded pixel
    assert feats[2]["mean_intensity"] > 0


def test_extract_features_decodes_real_pngs(docs):
    feats = {
        r["doc_id"]: r
        for r in extract_features(attach_png_payload(docs)).collect()
    }
    metas = {r["doc_id"]: r["meta"] for r in attach_png_payload(docs).collect()}
    assert len(feats) == 50
    for doc_id, r in feats.items():
        # Decoded dimensions must equal the synthesized image's true
        # dims (decode validates metadata).
        assert r["width"] == metas[doc_id]["width"]
        assert r["height"] == metas[doc_id]["height"]
        assert r["n_channels"] == 1
        assert r["modality"] == "image/png"
        assert 0 <= r["mean_intensity"] <= 255


# ---------------------------------------------------------------------------
# Driver-visible goldens (round-2 VERDICT ask, r06 restatement): since
# r06 multimodal_features is ORACLED (exact-integer aggregate, see
# plans/registry.py) — these literals additionally pin the values at
# both driver scales so a testdata regeneration is caught loudly.
# total_bytes (zlib-dependent, not SQL-expressible) left the output in
# the r06 restatement; every remaining column is exact-integer except
# the one final avg division, asserted EXACTLY from the integers.
# ---------------------------------------------------------------------------

# (sf_dir, modality) -> (n_docs, total_pixels, sum_intensity, max_width).
_FEATURE_GOLDEN = {
    ("/root/testdata/sf0.001", "image/bmp"): (250, 7662, 2176171, 12),
    ("/root/testdata/sf0.001", "image/png"): (250, 13660, 1296842, 16),
    ("/root/testdata/sf0.01", "image/bmp"): (250, 7167, 2032669, 12),
    ("/root/testdata/sf0.01", "image/png"): (250, 14171, 1343243, 16),
}


@pytest.mark.parametrize("golden_sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_multimodal_features_golden(spark, golden_sf):
    rows = {
        r["modality"]: r
        for r in multimodal_features(load_table(spark, golden_sf, "documents")).collect()
    }
    assert set(rows) == {"image/bmp", "image/png"}
    for modality, (n_docs, total_pixels, sum_intensity, max_width) in (
        (m, v) for (sf, m), v in _FEATURE_GOLDEN.items() if sf == golden_sf
    ):
        r = rows[modality]
        assert r["n_docs"] == n_docs, modality
        assert r["total_pixels"] == total_pixels, modality
        assert r["sum_intensity"] == sum_intensity, modality
        assert r["max_width"] == max_width, modality
        # the byte-weighted mean is the ONE double division over the
        # two pinned integers — bit-exact, no tolerance needed
        channels = 3 if modality == "image/bmp" else 1
        assert r["avg_intensity"] == sum_intensity / (total_pixels * channels), modality


# ---------------------------------------------------------------------------
# Codec property tests (pure Python, no Spark): random content through
# the encode->decode round-trip. The crafted-image tests above exercise
# each scanline filter; randomized inputs cover the geometry/content
# space between them.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
def test_png_roundtrip_random(w, h, ch, data):
    from mapreduce_rs_spark.operators.multimodal import decode_png, encode_png

    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch))
    )
    dw, dh, dc, mean = decode_png(encode_png(w, h, pixels, ch))
    assert (dw, dh, dc) == (w, h, ch)
    assert mean == sum(pixels) / len(pixels)


def test_png_rejects_interlaced():
    """An Adam7-interlaced IHDR must be rejected AT THE HEADER (the
    round-2 ADVICE hazard: it previously surfaced as a misleading
    truncated-IDAT error, or decoded garbage for rare geometries)."""
    import struct

    import pytest as _pytest

    from mapreduce_rs_spark.operators.multimodal import decode_png, encode_png

    png = bytearray(encode_png(2, 2, bytes(4), 1))
    ihdr_off = 8 + 8  # magic + len/tag
    assert png[ihdr_off + 12] == 0  # interlace byte
    png[ihdr_off + 12] = 1  # claim Adam7
    # fix the IHDR CRC so only the interlace flag is at fault
    import zlib as _zlib

    crc = _zlib.crc32(bytes(png[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    png[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(">I", crc)
    with _pytest.raises(ValueError, match="interlace=1"):
        decode_png(bytes(png))


# ---------------------------------------------------------------------------
# BMP: the second real codec (24-bit BI_RGB).
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_exact_mean():
    from mapreduce_rs_spark.operators.multimodal import decode_bmp, encode_bmp

    # w=3 -> stride 12 with 3 pad bytes per row: padding must be
    # excluded from the mean.
    pixels = bytes(range(3 * 2 * 3))
    dw, dh, dc, mean = decode_bmp(encode_bmp(3, 2, pixels))
    assert (dw, dh, dc) == (3, 2, 3)
    assert mean == sum(pixels) / len(pixels)


def test_bmp_layout_is_bottom_up_bgr():
    """The stored byte layout must be the spec's (bottom-up rows, BGR):
    decode the raw pixel array by hand and compare against the input."""
    import struct

    from mapreduce_rs_spark.operators.multimodal import encode_bmp

    # 1x2 image: top pixel RGB=(1,2,3), bottom pixel RGB=(4,5,6).
    payload = encode_bmp(1, 2, bytes([1, 2, 3, 4, 5, 6]))
    (off,) = struct.unpack("<I", payload[10:14])
    stride = 4  # 1*3 padded to 4
    first_stored = payload[off : off + 3]           # bottom row first
    second_stored = payload[off + stride : off + stride + 3]
    assert first_stored == bytes([6, 5, 4])         # BGR of bottom pixel
    assert second_stored == bytes([3, 2, 1])        # BGR of top pixel


def test_bmp_rejects_garbage_and_unsupported():
    import struct

    import pytest as _pytest

    from mapreduce_rs_spark.operators.multimodal import decode_bmp, encode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all")
    with _pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated headers
    good = bytearray(encode_bmp(2, 2, bytes(12)))
    bad_depth = bytearray(good)
    struct.pack_into("<H", bad_depth, 28, 8)  # biBitCount = 8 (palette)
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad_depth))
    bad_comp = bytearray(good)
    struct.pack_into("<I", bad_comp, 30, 1)  # BI_RLE8
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad_comp))
    with _pytest.raises(ValueError):
        decode_bmp(bytes(good[:-1]))  # truncated pixel array


@settings(max_examples=200, deadline=None)
@given(w=st.integers(1, 16), h=st.integers(1, 16), data=st.data())
def test_bmp_roundtrip_random(w, h, data):
    from mapreduce_rs_spark.operators.multimodal import decode_bmp, encode_bmp

    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
    )
    dw, dh, dc, mean = decode_bmp(encode_bmp(w, h, pixels))
    assert (dw, dh, dc) == (w, h, 3)
    assert mean == sum(pixels) / len(pixels)


def test_extract_features_decodes_real_bmps(docs):
    from mapreduce_rs_spark.operators.multimodal import attach_bmp_payload

    feats = extract_features(attach_bmp_payload(docs)).collect()
    assert len(feats) == 50
    for r in feats:
        # Decoded dims come from the PIXELS; synthesis rule ties them
        # to the text length, and channels is always 3 for 24-bit BMP.
        assert r["n_channels"] == 3
        assert 1 <= r["width"] <= 12 and 1 <= r["height"] <= 8
        assert 0 <= r["mean_intensity"] <= 255


# ---------------------------------------------------------------------------
# WAV: the third real codec (16-bit PCM RIFF/WAVE) — audio modality.
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact_sum():
    import struct

    from mapreduce_rs_spark.operators.multimodal import decode_wav, encode_wav

    vals = [-32768, -1, 0, 1, 32767, -256]  # 6 samples, stereo -> 3 frames
    n_frames, ch, rate, sum_abs = decode_wav(
        encode_wav(44100, 2, struct.pack("<6h", *vals))
    )
    assert (n_frames, ch, rate) == (3, 2, 44100)
    assert sum_abs == sum(abs(v) for v in vals)


def test_wav_layout_is_little_endian_interleaved():
    """The stored data chunk must be the spec's layout (int16 LE,
    channel-interleaved): slice the payload by hand and compare."""
    import struct

    from mapreduce_rs_spark.operators.multimodal import encode_wav

    frames = struct.pack("<4h", 0x0102, 0x0304, -2, 259)
    payload = encode_wav(8000, 2, frames)
    # header: RIFF(12) + 'fmt '+len(8) + fmt(16) + 'data'+len(8) = 44
    assert payload[36:40] == b"data"
    assert payload[44:] == frames
    assert payload[44:46] == b"\x02\x01"  # little-endian byte order
    # fmt chunk fields land where the spec says
    assert struct.unpack("<H", payload[22:24])[0] == 2       # channels
    assert struct.unpack("<I", payload[24:28])[0] == 8000    # rate
    assert struct.unpack("<I", payload[28:32])[0] == 32000   # byte rate
    assert struct.unpack("<H", payload[32:34])[0] == 4       # block align


def test_wav_chunk_walk_skips_odd_sized_chunks():
    """RIFF chunks are word-aligned: an odd-size LIST chunk before data
    carries a pad byte the walker must skip to stay aligned."""
    import struct

    from mapreduce_rs_spark.operators.multimodal import decode_wav, encode_wav

    base = encode_wav(8000, 1, struct.pack("<2h", 7, -7))
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = (
        base[:4]
        + struct.pack("<I", len(base) - 8 + len(extra))
        + base[8:36]
        + extra
        + base[36:]
    )
    assert decode_wav(patched) == (2, 1, 8000, 14)


def test_wav_rejects_garbage_and_unsupported():
    import struct

    import pytest as _pytest

    from mapreduce_rs_spark.operators.multimodal import decode_wav, encode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"not audio")
    with _pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"AVI ")  # not WAVE
    good = bytearray(encode_wav(8000, 1, struct.pack("<2h", 1, 2)))
    bad_fmt = bytearray(good)
    struct.pack_into("<H", bad_fmt, 20, 3)  # IEEE float format
    with _pytest.raises(ValueError):
        decode_wav(bytes(bad_fmt))
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, 34, 8)  # 8-bit samples
    with _pytest.raises(ValueError):
        decode_wav(bytes(bad_bits))
    bad_align = bytearray(good)
    struct.pack_into("<H", bad_align, 32, 6)  # block align != ch*2
    with _pytest.raises(ValueError):
        decode_wav(bytes(bad_align))
    with _pytest.raises(ValueError):
        decode_wav(bytes(good[:30]))  # truncated mid-chunk


@settings(max_examples=200, deadline=None)
@given(
    ch=st.integers(1, 4),
    n_frames=st.integers(1, 32),
    rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_wav_roundtrip_random(ch, n_frames, rate, data):
    import struct

    from mapreduce_rs_spark.operators.multimodal import decode_wav, encode_wav

    vals = data.draw(
        st.lists(
            st.integers(-32768, 32767),
            min_size=n_frames * ch,
            max_size=n_frames * ch,
        )
    )
    payload = encode_wav(rate, ch, struct.pack(f"<{len(vals)}h", *vals))
    assert decode_wav(payload) == (n_frames, ch, rate, sum(abs(v) for v in vals))


def test_extract_audio_features_decodes_real_wavs(docs):
    from mapreduce_rs_spark.operators.multimodal import (
        attach_wav_payload,
        extract_audio_features,
    )

    feats = extract_audio_features(attach_wav_payload(docs)).collect()
    assert len(feats) == 50
    for r in feats:
        # Decoded stats come from the parsed fmt chunk + samples; the
        # synthesis rules bound every field.
        assert r["n_channels"] in (1, 2)
        assert 1 <= r["n_frames"] <= 48
        assert r["sample_rate"] in (8000, 16000, 24000)
        assert r["n_samples"] == r["n_frames"] * r["n_channels"]
        # ASCII text -> every sample is (b-128)*256 in [-32768, -256],
        # except zero-padded empty docs.
        assert 0 <= r["mean_amplitude"] <= 32768
        assert r["duration_ms"] == r["n_frames"] * 1000 // r["sample_rate"]


# ---------------------------------------------------------------------------
# GIF: the fourth real codec (LZW + animated container) — video modality.
# ---------------------------------------------------------------------------


def test_lzw_hand_packed_spec_vector():
    """External pin of the LZW bit layout (not just self-consistency):
    the single-pixel stream 'A' must pack to codes [CLEAR=256, 65,
    EOI=257] at 9 bits, LSB-first -> bytes 00 83 04 04, both ways."""
    from mapreduce_rs_spark.operators.multimodal import lzw_decode, lzw_encode

    hand = bytes([0x00, 0x83, 0x04, 0x04])
    assert lzw_encode(b"A") == hand
    assert lzw_decode(hand) == b"A"


def test_lzw_roundtrip_width_growth_and_clears():
    """Long low-entropy and structured streams force code-width growth
    to 12 bits and full-table CLEAR resets; all must round-trip."""
    import random

    from mapreduce_rs_spark.operators.multimodal import lzw_decode, lzw_encode

    rng = random.Random(99)
    cases = [
        b"",
        b"\x00",
        bytes(rng.randrange(256) for _ in range(60_000)),
        b"a" * 70_000,
        b"abab" * 20_000,
        bytes(range(256)) * 300,
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048))
def test_lzw_roundtrip_random(data):
    from mapreduce_rs_spark.operators.multimodal import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    nf=st.integers(1, 4),
    data=st.data(),
)
def test_gif_roundtrip_random(w, h, nf, data):
    from mapreduce_rs_spark.operators.multimodal import decode_gif, encode_gif

    frames = [
        bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
        )
        for _ in range(nf)
    ]
    delays = data.draw(st.lists(st.integers(0, 99), min_size=nf, max_size=nf))
    dw, dh, out = decode_gif(encode_gif(w, h, frames, delays))
    assert (dw, dh) == (w, h)
    assert [p for p, _ in out] == frames
    assert [d for _, d in out] == delays


def test_gif_rejects_garbage_and_unsupported():
    import pytest as _pytest

    from mapreduce_rs_spark.operators.multimodal import decode_gif, encode_gif

    with _pytest.raises(ValueError):
        decode_gif(b"not a gif")
    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a")  # truncated: no screen descriptor
    good = bytearray(encode_gif(2, 2, [bytes(4)], [5]))
    with _pytest.raises(ValueError):
        decode_gif(bytes(good[:-1]))  # trailer gone
    interlaced = bytearray(good)
    # image descriptor starts after 13-byte header + 768-byte GCT + 8-byte
    # GCE; its packed byte is at offset +9 of the descriptor
    id_off = 13 + 768 + 8
    assert interlaced[id_off] == 0x2C
    interlaced[id_off + 9] = 0x40  # interlace flag
    with _pytest.raises(ValueError):
        decode_gif(bytes(interlaced))


def test_extract_gif_frames_expands_1_to_n(docs):
    from mapreduce_rs_spark.operators.multimodal import (
        attach_gif_payload,
        extract_gif_frames,
    )

    rows = extract_gif_frames(attach_gif_payload(docs)).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 50
    for doc_rows in by_doc.values():
        idxs = sorted(r["frame_idx"] for r in doc_rows)
        assert idxs == list(range(len(doc_rows)))  # dense frame indices
        assert 1 <= len(doc_rows) <= 4
        for r in doc_rows:
            assert r["n_pixels"] == r["width"] * r["height"]
            assert 0 <= r["mean_intensity"] <= 255
            assert r["delay_ms"] % 10 == 0 and 0 <= r["delay_ms"] <= 990


def test_video_sampler_skips_undecodable_clips(docs):
    """A corrupt or zero-frame clip must not kill the job: the sampler
    skips it (quarantine-sink semantics) and keeps decoding the rest."""
    from pyspark.sql import functions as F

    from mapreduce_rs_spark.operators.multimodal import (
        attach_gif_payload,
        sample_video_frames,
    )

    clips = attach_gif_payload(docs)
    # Corrupt a third of the clips mid-container (valid magic, truncated
    # LZW stream), empty another third; the rest stay valid.
    mixed = clips.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("payload"))
        .when(F.col("doc_id") % 3 == 1, F.expr("substring(payload, 1, 40)"))
        .otherwise(F.lit(b"")).alias("payload"),
    )
    rows = sample_video_frames(mixed, n_samples=4).collect()
    survivors = {r["doc_id"] for r in rows}
    expected = {r["doc_id"] for r in docs.select("doc_id").collect() if r["doc_id"] % 3 == 0}
    assert survivors == expected
    assert len(rows) == 4 * len(expected)


def test_quarantine_splits_corrupt_rows_without_killing_job(docs):
    """One corrupt payload must not fail the task: the quarantined
    decode emits per-row errors; good rows match extract_features
    exactly, bad rows carry the codec's message."""
    from pyspark.sql import functions as F

    from mapreduce_rs_spark.operators.multimodal import (
        attach_png_payload,
        extract_features_quarantined,
    )

    good = attach_png_payload(docs)
    # Corrupt half the payloads: truncate to 12 bytes (valid magic,
    # truncated chunks) — the PNG decoder must raise per row.
    mixed = good.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("payload")
        ).otherwise(F.expr("substring(payload, 1, 12)")).alias("payload"),
        "meta",
    )
    feats = extract_features_quarantined(mixed)
    rows = feats.collect()
    assert len(rows) == 50
    ok = [r for r in rows if r["decode_error"] is None]
    bad = [r for r in rows if r["decode_error"] is not None]
    assert all(r["doc_id"] % 2 == 0 for r in ok)
    assert all(r["doc_id"] % 2 == 1 for r in bad)
    assert all(r["width"] is None and r["mean_intensity"] is None for r in bad)
    assert all("PNG" in r["decode_error"] or "truncated" in r["decode_error"] for r in bad)
    # Clean stream is byte-equal to the throwing decoder on good rows.
    clean = feats.where("decode_error IS NULL").drop("decode_error")
    reference = extract_features(good.where(F.col("doc_id") % 2 == 0))
    assert sorted(map(tuple, clean.collect())) == sorted(map(tuple, reference.collect()))


# ---------------------------------------------------------------------------
# JPEG: the fifth real codec (baseline DCT grayscale, lossy in general,
# exact for constant-per-block images — the oracle-checkable path).
# ---------------------------------------------------------------------------


def test_jpeg_constant_blocks_roundtrip_exact():
    """Constant 8x8 blocks -> DC-only spectrum -> all-ones quant: the
    decode must be BIT-exact (this is what jpeg_decode_stats' oracle
    verifies externally)."""
    from mapreduce_rs_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    bw, bh = 4, 3
    w, h = bw * 8, bh * 8
    vals = [7, 255, 0, 128, 64, 200, 1, 99, 250, 33, 180, 17]
    px = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            px[y * w + x] = vals[(y // 8) * bw + (x // 8)]
    dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, bytes(px)))
    assert (dw, dh) == (w, h)
    assert out == bytes(px)


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 3), h=st.integers(1, 3), data=st.data())
def test_jpeg_constant_blocks_roundtrip_random(w, h, data):
    from mapreduce_rs_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    vals = data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    W, H = w * 8, h * 8
    px = bytes(vals[(y // 8) * w + (x // 8)] for y in range(H) for x in range(W))
    dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(W, H, px))
    assert (dw, dh, out) == (W, H, px)


@settings(max_examples=40, deadline=None)
@given(w=st.integers(2, 24), h=st.integers(2, 20), data=st.data())
def test_jpeg_arbitrary_pixels_within_one(w, h, data):
    """General images exercise the AC run-length path (nonzero ACs, ZRL,
    EOB) and the edge-block crop; with all-ones quantization the only
    loss is coefficient rounding. The SOUND per-pixel bound is 8, not
    the +-1 this test originally asserted: each of the 64 coefficients
    rounds by up to 0.5, the IDCT mixes them with total absolute basis
    weight up to (a_0 + 7·a_1)² = (sqrt(1/8) + 7·sqrt(2/8))² ~ 14.85
    per pixel → |error| <= 0.5·14.85/2... conservatively 0.5·14.85 = 7.43,
    plus 0.5 for the final pixel rounding → <= 8. Random images sit at
    0-1 (pixel error std ~ 0.29 by orthonormality), but hypothesis
    found a real 2 (the 2x2 [0,0,2,0] case below), so the tight bound
    was empirical, not a contract."""
    from mapreduce_rs_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)))
    dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (dw, dh) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 8


def test_jpeg_rounding_regression_2x2():
    """The hypothesis-found counterexample to the old +-1 claim, pinned:
    a 2x2 edge-cropped block whose coefficient roundings compound to a
    per-pixel error of exactly 2. The decode must stay deterministic
    (same bytes in, same bytes out) and within the sound bound."""
    from mapreduce_rs_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = bytes([0, 0, 2, 0])
    dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(2, 2, px))
    assert (dw, dh) == (2, 2)
    assert out == bytes([2, 0, 2, 0])  # deterministic, error exactly 2


def test_jpeg_rejects_garbage_and_truncation():
    """Every prefix truncation must raise ValueError — a codec that
    silently decodes a truncated stream poisons the quarantine split."""
    from mapreduce_rs_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    good = encode_jpeg_gray(16, 8, bytes(range(128)))
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg")
    for i in range(2, len(good) - 1, 3):
        with pytest.raises(ValueError):
            decode_jpeg_gray(good[:i])


def test_jpeg_rejects_progressive_and_multicomponent():
    from mapreduce_rs_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    good = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be rejected
    i = bytes(good).find(b"\xff\xc0")
    prog = good[:]
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(prog))
    # declare 3 components in SOF0: must be rejected (grayscale only)
    multi = good[:]
    multi[i + 9] = 3
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(multi))


def test_extract_features_decodes_real_jpegs(docs):
    """The Spark dispatch path: image/jpeg payloads hit the real decoder
    and the decoded mean equals the tiled-block prediction."""
    from mapreduce_rs_spark.operators.multimodal import attach_jpeg_payload

    feats = extract_features(attach_jpeg_payload(docs)).collect()
    rows = {r.doc_id: r for r in feats}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert len(rows) == len(texts)
    for doc_id, text in texts.items():
        data = text.encode("utf-8")
        bw, bh = len(data) % 4 + 1, len(data) % 3 + 1
        n_blocks = bw * bh
        if data:
            tiled = (data * (n_blocks // len(data) + 1))[:n_blocks]
        else:
            tiled = b"\x00" * n_blocks
        r = rows[doc_id]
        assert (r.width, r.height, r.n_channels) == (bw * 8, bh * 8, 1)
        assert r.mean_intensity == sum(tiled) / n_blocks


def test_payload_synthesis_rejects_non_ascii_loudly(spark):
    """The byte-vs-codepoint oracle contract (r09 verdict #3): every
    attach_* synthesis derives pixels/samples from utf-8 BYTES while
    the DuckDB oracles replay them with per-character ascii()/length()
    — identical only for pure-ASCII text. The 'café text' repro (10878
    vs 11013 divergence when unguarded) must fail LOUDLY at the
    synthesis site, not silently hash-mismatch downstream."""
    from mapreduce_rs_spark.operators.multimodal import _oracle_ascii_bytes

    assert _oracle_ascii_bytes("plain ascii 123") == b"plain ascii 123"
    with pytest.raises(ValueError, match="pure-ASCII"):
        _oracle_ascii_bytes("café text")

    df = spark.createDataFrame([(1, "café text")], "doc_id long, text string")
    with pytest.raises(Exception) as exc:
        attach_png_payload(df).collect()
    assert "pure-ASCII" in str(exc.value)
