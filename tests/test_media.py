"""Multimodal pipeline: pure-stdlib codecs (PNG/WAV/FRMS), media
filtering, decode features, frame sampling."""

import hashlib
import struct
import zlib

import pyspark.sql.functions as F
import pytest

from frontier import synth
from frontier.kernel import imagecodec
from frontier.spark import media, parse


@pytest.fixture(scope="module")
def resources(spark, sf_dir):
    # decode=True: the real codec reads PNG/FRMS bytes, so parts must
    # have their base64 transfer-encoding decoded first
    pages = synth.pages_from_documents(spark, sf_dir)
    res = parse.parse_pages(pages, decode=True).cache()
    res.count()
    return res


# ---------------------------------------------------------------------------
# codec kernel
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters():
    w, h = 5, 7
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * 3))
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 2]):
        blob = imagecodec.png_encode(w, h, pixels, filters=filters)
        gw, gh, ct, got = imagecodec.png_decode(blob)
        assert (gw, gh, ct) == (w, h, 2)
        assert got == pixels, filters


def test_png_decode_handbuilt_byte_identical():
    """Decode a PNG assembled chunk-by-chunk here (not by our own
    encoder): a 2x2 gray image, filter Sub on row 0, Up on row 1."""
    # pixels: rows [10, 20], [30, 45]
    raw = bytes([1, 10, 10,          # Sub: 10, 10+10=20
                 2, 20, 25])         # Up:  10+20=30, 20+25=45
    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
    blob = (imagecodec.PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    w, h, ct, pixels = imagecodec.png_decode(blob)
    assert (w, h, ct) == (2, 2, 0)
    assert pixels == bytes([10, 20, 30, 45])


def test_png_rgba_and_errors():
    pix = bytes(range(4 * 2 * 4))
    blob = imagecodec.png_encode(2, 4, pix, color_type=6, filters=[4])
    assert imagecodec.png_decode(blob)[3] == pix
    with pytest.raises(ValueError):
        imagecodec.png_decode(b"not a png at all")
    with pytest.raises(ValueError):
        imagecodec.png_decode(imagecodec.PNG_SIG + b"\x00\x00")


def test_wav_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 1234, -4321, 100]
    blob = imagecodec.wav_encode(samples, sample_rate=44100, channels=2)
    ch, rate, got = imagecodec.wav_decode(blob)
    assert (ch, rate, got) == (2, 44100, samples)
    with pytest.raises(ValueError):
        imagecodec.wav_decode(b"RIFFxxxxJUNK")


def test_frms_roundtrip():
    frames = [b"frame-one", b"", b"x" * 300]
    blob = imagecodec.frames_encode(frames)
    assert imagecodec.frames_decode(blob) == frames
    with pytest.raises(ValueError):
        imagecodec.frames_decode(b"FRMS\x02\x00\x00\x00\x09short")


def test_decode_media_dispatch():
    png = imagecodec.png_encode(4, 4, bytes(48), filters=[3])
    w, h, n, feat = media.decode_media(png)
    assert (w, h, n) == (4, 4, 1)
    assert feat == [-1.0] * 8  # all-zero pixels → (0-128)/128
    vid = imagecodec.frames_encode([png, png, png])
    assert media.decode_media(vid)[:3] == (4, 4, 3)
    wav = imagecodec.wav_encode([256] * 16)
    w, h, n, feat = media.decode_media(wav)
    assert (w, h, n) == (16, 1, 1)
    assert feat == [256 / 32768.0] * 8
    # junk degrades, never raises (§2.8)
    assert media.decode_media(b"\x00junk") == (None, None, None, [])
    assert media.decode_media(None) == (None, None, None, [])
    # truncated PNG (valid signature, bad body) degrades too
    assert media.decode_media(png[:20]) == (None, None, None, [])


def test_synth_blob_feature_rule():
    """The oracle's restatement: decoded phase means over the tiled
    md5 pixels reduce to (h[k]+h[k+8])/2."""
    blob, ctype = synth._media_blob(42, "png")
    assert ctype == "image/png"
    h = hashlib.md5(b"blob:42").digest()
    w, ht, n, feat = media.decode_media(blob)
    assert (w, ht, n) == (4 + 4 * (h[0] % 4), 4, 1)
    for k in range(8):
        want = ((h[k] + h[k + 8]) / 2 - 128) / 128
        assert abs(feat[k] - want) < 1e-9, k
    vid, vtype = synth._media_blob(42, "video")
    assert vtype == "video/x-frms"
    assert media.decode_media(vid)[2] == 1 + h[2] % 4


def test_jpeg_sniff_roundtrip_and_markers():
    b = imagecodec.jpeg_encode(640, 480, b"hi", progressive=True)
    assert imagecodec.jpeg_sniff(b) == (640, 480, True, b"hi")
    b2 = imagecodec.jpeg_encode(12, 7)
    assert imagecodec.jpeg_sniff(b2) == (12, 7, False, b"")
    # fill bytes before a marker are legal
    padded = b2[:2] + b"\xff" + b2[2:]
    assert imagecodec.jpeg_sniff(padded)[:2] == (12, 7)
    import pytest
    for bad in [b"", b"\xff\xd8", b"\xff\xd8\xff\xd9",
                b"\x89PNG", b"\xff\xd8\x00\x00"]:
        with pytest.raises(ValueError):
            imagecodec.jpeg_sniff(bad)


def test_decode_media_jpeg_dispatch():
    com = bytes(range(16))
    b = imagecodec.jpeg_encode(33, 9, com)
    w, h, n, feat = media.decode_media(b)
    assert (w, h, n) == (33, 9, 1)
    for k in range(8):
        want = ((com[k] + com[k + 8]) / 2 - 128) / 128
        assert abs(feat[k] - want) < 1e-9, k
    # no COM → sniffable dims, empty feature
    assert media.decode_media(imagecodec.jpeg_encode(5, 5)) \
        == (5, 5, 1, [])
    # truncated after SOI degrades to nulls via decode_media
    assert media.decode_media(b[:3]) == (None, None, None, [])


def test_synth_jpeg_blob_rule():
    blob, ctype = synth._media_blob(42, "jpeg")
    assert ctype == "image/jpeg"
    h = hashlib.md5(b"blob:42").digest()
    w, ht, n, feat = media.decode_media(blob)
    assert (w, ht, n) == (4 + 4 * (h[0] % 4), 2 + h[3] % 4, 1)
    for k in range(8):
        want = ((h[k] + h[k + 8]) / 2 - 128) / 128
        assert abs(feat[k] - want) < 1e-9, k


# ---------------------------------------------------------------------------
# Spark pipeline
# ---------------------------------------------------------------------------


def test_media_resources_filter(resources):
    m = media.media_resources(resources)
    kinds = {r.media_kind for r in m.select("media_kind")
             .distinct().collect()}
    # synth: image/png subresources + a video/x-frms third part
    assert kinds == {"image", "video"}
    assert m.where(F.col("n_bytes") <= 0).count() == 0


def test_extract_features_deterministic_shape(resources):
    m = media.media_resources(resources)
    feats = media.extract_features(m).cache()
    assert feats.count() == m.count()
    row = feats.first()
    assert len(row.feature) == 8
    # PNG/video frames are height 4; JPEG header skeletons 2..5 (r4)
    assert row.width in (4, 8, 12, 16) and row.height in (2, 3, 4, 5)
    # no decode failures on the synthetic corpus — real PNGs decode
    assert feats.where(F.col("width").isNull()).count() == 0
    # deterministic: same blob → same feature
    again = media.extract_features(m)
    joined = feats.alias("a").join(
        again.alias("b"), ["url", "part_index"])
    diff = joined.where(F.col("a.width") != F.col("b.width")).count()
    assert diff == 0


def test_frame_sample_explodes_video_only(resources, spark):
    # synth corpus carries video parts (doc_id%4==3) → sampled rows,
    # and ONLY from video parts
    m = media.media_resources(resources)
    feats = media.extract_features(m)
    sampled = media.frame_sample(feats, every=2)
    assert sampled.columns == ["url", "part_index", "frame_idx"]
    assert sampled.count() > 0
    n_videos = m.where(F.col("media_kind") == "video").count()
    per_part = sampled.groupBy("url", "part_index").count()
    assert per_part.count() == n_videos
    # synthetic video row exercises the explode shape
    vid = spark.createDataFrame(
        [("u", 1, "video", 100, 80, 4, [0.0] * 8)],
        "url string, part_index int, media_kind string, width int, "
        "height int, n_frames int, feature array<float>")
    got = media.frame_sample(vid, every=2).collect()
    assert [r.frame_idx for r in got] == [0, 2]


def test_audio_features_pipeline(spark, sf_dir):
    parts = synth.audio_parts_from_documents(spark, sf_dir)
    feats = media.extract_features(parts)
    row = feats.where(F.col("url") == "audio://doc3").first()
    samples = [((3 * 31 + j * 17) % 256 - 128) * 256 for j in range(16)]
    assert (row.width, row.height, row.n_frames) == (16, 1, 1)
    for k in range(8):
        assert abs(row.feature[k]
                   - (samples[k] + samples[k + 8]) / 2 / 32768.0) < 1e-9


def test_jpeg_sniff_fuzz_never_raises_uncaught():
    """Property: jpeg_sniff either returns sane dimensions or raises
    ValueError — never crashes, loops, or returns junk types — on
    arbitrary marker soup after a valid SOI."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def run(tail):
        blob = b"\xff\xd8" + tail
        try:
            w, h, prog, com = imagecodec.jpeg_sniff(blob)
        except ValueError:
            return
        assert 0 < w <= 0xFFFF and 0 < h <= 0xFFFF
        assert isinstance(prog, bool) and isinstance(com, bytes)

    run()


def test_jpeg_encode_sniff_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.integers(1, 0xFFFF), st.integers(1, 0xFFFF),
           st.binary(max_size=64), st.booleans())
    def run(w, h, com, prog):
        blob = imagecodec.jpeg_encode(w, h, com, progressive=prog)
        assert imagecodec.jpeg_sniff(blob) == (w, h, prog, com)

    run()


# ---------------------------------------------------------------------------
# GIF (round-5)
# ---------------------------------------------------------------------------


def test_gif_sniff_roundtrip_and_blocks():
    b = imagecodec.gif_encode(640, 480, b"hi")
    assert imagecodec.gif_sniff(b) == (640, 480, b"hi")
    # GIF87a, no comment allowed
    b2 = imagecodec.gif_encode(12, 7, version=b"87a")
    assert imagecodec.gif_sniff(b2) == (12, 7, b"")
    # multi-sub-block comment (>255 bytes) reassembles
    com = bytes(range(256)) * 3
    assert imagecodec.gif_sniff(imagecodec.gif_encode(1, 2, com)) \
        == (1, 2, com)
    # global color table is skipped, not misread as blocks
    hdr = b"GIF89a" + (300).to_bytes(2, "little") \
        + (200).to_bytes(2, "little") + bytes([0x80 | 2, 0, 0]) \
        + b"\x00" * (3 * 8) + b"\x3b"
    assert imagecodec.gif_sniff(hdr) == (300, 200, b"")
    import pytest
    for bad in (b"GIF90a" + b"\x00" * 10,
                b"GIF89a\x00\x00\x00\x00",          # truncated LSD
                imagecodec.gif_encode(3, 3, b"x")[:-3],  # cut sub-block
                b"GIF89a" + b"\x00\x01\x00\x01\x00\x00\x00" + b"\x77"):
        with pytest.raises(ValueError):
            imagecodec.gif_sniff(bad)
    with pytest.raises(ValueError):
        imagecodec.gif_encode(0, 5)
    with pytest.raises(ValueError):
        imagecodec.gif_encode(5, 5, b"c", version=b"87a")


def test_decode_media_gif_dispatch():
    com = bytes(range(16))
    w, h, n, feat = media.decode_media(imagecodec.gif_encode(33, 9, com))
    assert (w, h, n) == (33, 9, 1)
    want = [((com[k] + com[k + 8]) / 2 - 128) / 128 for k in range(8)]
    assert all(abs(a - b) < 1e-9 for a, b in zip(feat, want))
    assert media.decode_media(imagecodec.gif_encode(5, 5)) \
        == (5, 5, 1, [])
    assert media.decode_media(b"GIF89a\x01") == (None, None, None, [])


def test_synth_gif_blob_rule():
    # h[4]%3==1 → the jpeg slot emits a GIF with the SAME
    # width/height/feature rules (oracle formulas unchanged)
    h = hashlib.md5(b"blob:0").digest()
    assert h[4] % 3 == 1  # target 0 is a GIF under the rule
    blob, ctype = synth._media_blob(0, "jpeg")
    assert ctype == "image/gif" and blob[:6] == b"GIF89a"
    w, ht, n, feat = media.decode_media(blob)
    assert (w, ht, n) == (4 + 4 * (h[0] % 4), 2 + h[3] % 4, 1)
    for k in range(8):
        want = ((h[k] + h[k + 8]) / 2 - 128) / 128
        assert abs(feat[k] - want) < 1e-9, k


def test_gif_sniff_fuzz_never_raises_uncaught():
    """Property: gif_sniff either returns sane values or raises
    ValueError — never IndexError/struct.error on crawled junk."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def run(tail):
        blob = b"GIF89a" + tail
        try:
            w, h, com = imagecodec.gif_sniff(blob)
        except ValueError:
            return
        assert 1 <= w <= 0xFFFF and 1 <= h <= 0xFFFF
        assert isinstance(com, bytes)

    run()


def test_webp_sniff_all_three_layouts():
    # VP8X (what webp_encode emits)
    b = imagecodec.webp_encode(640, 480, b"meta")
    assert imagecodec.webp_sniff(b) == (640, 480, b"meta")
    assert imagecodec.webp_sniff(imagecodec.webp_encode(1, 1)) \
        == (1, 1, b"")
    # odd-length XMP payloads get RIFF even-padding that must NOT
    # leak into the returned bytes
    assert imagecodec.webp_sniff(
        imagecodec.webp_encode(9, 9, b"abc"))[2] == b"abc"
    # 24-bit canvas boundary
    assert imagecodec.webp_sniff(
        imagecodec.webp_encode(1 << 24, 3))[:2] == (1 << 24, 3)
    # hand-built VP8L (lossless): 14-bit packed dims after 0x2F
    bits = (299) | (144 << 14)  # width-1=299, height-1=144
    vp8l = bytes([0x2F]) + struct.pack("<I", bits)
    blob = b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8l)) + b"WEBP" \
        + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    assert imagecodec.webp_sniff(blob) == (300, 145, b"")
    # hand-built lossy "VP8 ": dims after the 0x9D012A sync code
    d = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    blob = b"RIFF" + struct.pack("<I", 4 + 8 + len(d)) + b"WEBP" \
        + b"VP8 " + struct.pack("<I", len(d)) + d
    assert imagecodec.webp_sniff(blob) == (320, 240, b"")
    for bad in (b"RIFF\x00\x00\x00\x00WAVE",  # wrong fourcc
                imagecodec.webp_encode(3, 3)[:-4],  # truncated chunk
                b"RIFF\x08\x00\x00\x00WEBP"):  # no dimension chunk
        with pytest.raises(ValueError):
            imagecodec.webp_sniff(bad)
    with pytest.raises(ValueError):
        imagecodec.webp_encode(0, 5)


def test_decode_media_webp_dispatch():
    com = bytes(range(16))
    w, h, n, feat = media.decode_media(imagecodec.webp_encode(33, 9, com))
    assert (w, h, n) == (33, 9, 1)
    want = [((com[k] + com[k + 8]) / 2 - 128) / 128 for k in range(8)]
    assert all(abs(a - b) < 1e-9 for a, b in zip(feat, want))
    assert media.decode_media(imagecodec.webp_encode(5, 5)) \
        == (5, 5, 1, [])
    # RIFF dispatch still routes WAVE to the audio decoder
    wav = imagecodec.wav_encode([0] * 8, channels=2)
    assert media.decode_media(wav)[1] == 2
    assert media.decode_media(b"RIFF\x04\x00\x00\x00WEBP") \
        == (None, None, None, [])


def test_synth_webp_blob_rule():
    # h[4]%3==2 → the jpeg slot emits a WebP with the SAME
    # width/height/feature rules (oracle formulas unchanged)
    h = hashlib.md5(b"blob:15").digest()
    assert h[4] % 3 == 2  # target 15 is a WebP under the rule
    blob, ctype = synth._media_blob(15, "jpeg")
    assert ctype == "image/webp" and blob[8:12] == b"WEBP"
    w, ht, n, feat = media.decode_media(blob)
    assert (w, ht, n) == (4 + 4 * (h[0] % 4), 2 + h[3] % 4, 1)
    for k in range(8):
        want = ((h[k] + h[k + 8]) / 2 - 128) / 128
        assert abs(feat[k] - want) < 1e-9, k


def test_webp_sniff_fuzz_never_raises_uncaught():
    """Property: webp_sniff either returns sane values or raises
    ValueError — never IndexError/struct.error on crawled junk."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def run(tail):
        blob = b"RIFF" + tail
        try:
            w, h, xmp = imagecodec.webp_sniff(blob)
        except ValueError:
            return
        assert 1 <= w <= 1 << 24 and 1 <= h <= 1 << 24
        assert isinstance(xmp, bytes)

    run()
