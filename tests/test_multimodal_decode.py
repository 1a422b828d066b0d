"""Real (pure-numpy) image decode path: PPM/BMP codecs round-trip,
resize geometry, pixel-derived features, and near-duplicate detection
over decoded media — end-to-end on actual pixels, no external libs."""

import numpy as np
import pyarrow as pa

import ray.data
from ice_ray.stages.multimodal import (
    ImageFeatureExtractor,
    ImageResizer,
    decode_image,
    encode_bmp,
    encode_ppm,
    image_features,
    resize_nearest,
)


def _gradient(w=32, h=24, phase=0):
    x = np.arange(w)[None, :] + phase
    y = np.arange(h)[:, None]
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (x * 8) % 256
    img[:, :, 1] = (y * 10) % 256
    img[:, :, 2] = ((x + y) * 4) % 256
    return img


def test_codec_roundtrip_ppm_bmp():
    img = _gradient()
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert decode_image(b"\x89PNG compressed") is None  # bad signature


def test_codec_roundtrip_png():
    from ice_ray.stages.multimodal import encode_png

    img = _gradient(33, 17)  # odd width exercises stride handling
    assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_all_filter_types():
    """Hand-built PNG rasters with Sub/Up/Average/Paeth filters decode
    to the same pixels as the filter-0 encoding (spec filters 1–4)."""
    import struct
    import zlib

    from ice_ray.stages.multimodal import _PNG_SIG

    img = _gradient(13, 9)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int32)

    def filt_row(y, ftype):
        cur, prev = flat[y], (flat[y - 1] if y else np.zeros(w * 3, np.int32))
        if ftype == 0:
            out = cur.copy()
        elif ftype == 1:
            out = cur.copy()
            out[3:] = (cur[3:] - cur[:-3]) % 256
        elif ftype == 2:
            out = (cur - prev) % 256
        elif ftype == 3:
            a = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            out = (cur - ((a + prev) >> 1)) % 256
        else:  # Paeth
            a = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            c = np.concatenate([np.zeros(3, np.int32), prev[:-3]]) if y \
                else np.zeros(w * 3, np.int32)
            p = a + prev - c
            pa_, pb, pcd = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pcd), a,
                            np.where(pb <= pcd, prev, c))
            out = (cur - pred) % 256
        return bytes([ftype]) + out.astype(np.uint8).tobytes()

    raster = b"".join(filt_row(y, (y % 5)) for y in range(h))

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    payload = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raster))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_image(payload), img)


def test_malformed_payloads_return_none():
    """decode_image's contract: undecodable → None, never an exception
    (a bad row must not kill the whole stage)."""
    import struct

    bad = [
        b"P6",                                   # truncated PPM header
        b"P6 # comment only",                    # comment, missing fields
        b"P6 3 x 255 ",                          # non-numeric field
        b"P6 -3 4 255 " + b"\0" * 64,            # negative width
        b"P6 2 2 255 \0\0\0",                    # short raster
        b"\x89PNG\r\n\x1a\n" + b"\0" * 4,        # truncated PNG
        b"\x89PNG\r\n\x1a\nbadchunks!!",         # garbage chunks
    ]
    # BMP with negative width
    neg = bytearray(encode_bmp(_gradient(4, 4)))
    struct.pack_into("<i", neg, 18, -4)
    bad.append(bytes(neg))
    # BMP with data offset past the payload
    off = bytearray(encode_bmp(_gradient(4, 4)))
    struct.pack_into("<I", off, 10, 10_000)
    bad.append(bytes(off))
    for payload in bad:
        assert decode_image(payload) is None, payload[:20]


def test_codec_roundtrip_gif():
    """GIF is paletted → lossless round trip, including 12-bit LZW table
    growth (256-color random image) and width growth mid-stream."""
    from ice_ray.stages.multimodal import encode_gif

    img = (_gradient(37, 23) // 32) * 32          # <=256 distinct colors
    assert np.array_equal(decode_image(encode_gif(img)), img)

    rng = np.random.RandomState(11)
    big = rng.randint(0, 256, size=(90, 130)).astype(np.uint8)
    big = np.stack([big, big // 2, 255 - big], axis=2)   # 256 colors
    assert np.array_equal(decode_image(encode_gif(big)), big)


def test_gif_interlaced_and_malformed():
    """Interlaced flag: rows stored in pass order decode back to the
    original raster; malformed streams return None."""
    from ice_ray.stages.multimodal import _deinterlace, encode_gif

    img = (_gradient(16, 16) // 64) * 64
    h = img.shape[0]
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    payload = bytearray(encode_gif(img[order]))   # rows in interlace order
    # image-descriptor packed byte: header(13) + GCT + 0x2C + 8
    gct_bytes = 3 * (2 << (payload[10] & 7))
    payload[13 + gct_bytes + 9] |= 0x40           # set interlace flag
    out = decode_image(bytes(payload))
    assert np.array_equal(out, img)
    # _deinterlace inverts the pass ordering directly too
    assert np.array_equal(_deinterlace(img[order]), img)

    assert decode_image(b"GIF89a") is None
    assert decode_image(b"GIF89a" + b"\x00" * 20) is None
    assert decode_image(bytes(payload)[:40]) is None      # truncated


def test_codec_roundtrip_jpeg():
    """Baseline JPEG: encoder (forward DCT + Huffman) and decoder
    (Huffman + IDCT) are independent directions of the spec — bounded
    reconstruction error on smooth images proves both."""
    from ice_ray.stages.jpeg import decode_jpeg, encode_jpeg

    x = np.arange(70)[None, :]
    y = np.arange(50)[:, None]
    img = np.zeros((50, 70, 3), np.uint8)
    img[:, :, 0] = np.clip(x * 3, 0, 255)
    img[:, :, 1] = np.clip(y * 4, 0, 255)
    img[:, :, 2] = np.clip((x + y) * 2, 0, 255)

    for ss, tol in [((1, 1), 5), ((2, 2), 12)]:
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=ss))
        assert out is not None and out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= tol, ss
    # dispatches through decode_image on the FFD8 magic
    assert decode_image(encode_jpeg(img)) is not None


def test_jpeg_restart_markers_and_edge_sizes():
    from ice_ray.stages.jpeg import decode_jpeg, encode_jpeg

    # smooth (non-wrapping) gradient at non-multiple-of-8/16 dims: 4:2:0
    # chroma averaging across _gradient's %256 sawtooth edges loses the
    # chroma step by construction, so use clipped ramps here
    x = np.arange(61)[None, :]
    y = np.arange(43)[:, None]
    img = np.zeros((43, 61, 3), np.uint8)
    img[:, :, 0] = np.clip(x * 4, 0, 255)
    img[:, :, 1] = np.clip(255 - y * 5, 0, 255)
    img[:, :, 2] = np.clip(x + y, 0, 255)
    for ss in [(1, 1), (2, 2)]:
        for ri in [1, 3]:
            out = decode_jpeg(encode_jpeg(img, quality=92, subsampling=ss,
                                          restart_interval=ri))
            assert out is not None and out.shape == img.shape, (ss, ri)
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 20
    for shape in [(1, 1, 3), (9, 7, 3), (8, 8, 3)]:
        im = np.full(shape, 77, np.uint8)
        out = decode_jpeg(encode_jpeg(im, quality=95))
        assert out is not None and out.shape == shape
        assert np.abs(out.astype(int) - 77).max() <= 3   # flat field ≈ exact


def test_jpeg_malformed_and_unsupported_return_none():
    from ice_ray.stages.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(24, 16)
    good = encode_jpeg(img)
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0tr") is None
    assert decode_jpeg(good[:len(good) // 2]) is None     # truncated scan
    bad = bytearray(good)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2                                     # progressive SOF2
    assert decode_jpeg(bytes(bad)) is None


def test_resize_and_features_from_pixels():
    img = _gradient(64, 48)
    small = resize_nearest(img, 16, 12)
    assert small.shape == (12, 16, 3)
    f1 = image_features(img)
    f2 = image_features(decode_image(encode_bmp(img)))  # same pixels via BMP
    assert np.array_equal(f1, f2)
    # features respond to content: brightening one quadrant moves the
    # embedding a little (cosine-near, not identical)
    img3 = img.copy()
    img3[:12, :16] = np.minimum(img3[:12, :16].astype(int) + 60, 255)
    f3 = image_features(img3)
    cos = float(f1 @ f3 / (np.linalg.norm(f1) * np.linalg.norm(f3)))
    assert 0.5 < cos < 0.999
    assert not np.array_equal(f1, f3)


def test_media_pipeline_decodes_real_formats(ray_session):
    img_a = _gradient(40, 30)
    img_b = _gradient(40, 30, phase=1)   # near-dup of a
    img_c = 255 - _gradient(40, 30)      # very different
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_ppm(img_a),
         "mime": "image/x-portable-pixmap", "width": 40, "height": 30,
         "duration_ms": -1},
        {"media_id": 2, "kind": "image", "payload": encode_bmp(img_b),
         "mime": "image/bmp", "width": 40, "height": 30, "duration_ms": -1},
        {"media_id": 3, "kind": "image", "payload": encode_ppm(img_c),
         "mime": "image/x-portable-pixmap", "width": 40, "height": 30,
         "duration_ms": -1},
        {"media_id": 4, "kind": "image", "payload": b"\x89PNG fake",
         "mime": "image/png", "width": 8, "height": 8, "duration_ms": -1},
    ]
    ds = ray.data.from_items(rows)
    feats = (ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                            batch_size=2, concurrency=(1, 2))
             .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert feats["decoded"].tolist() == [True, True, True, False]
    e = {m: np.asarray(v, dtype=np.float64)
         for m, v in zip(feats["media_id"], feats["embedding"])}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(e[1], e[2]) > 0.8       # near-dup images are cosine-near
    assert cos(e[1], e[3]) < -0.5      # inverted image is anti-correlated

    # resize stage re-encodes decodable payloads at the target geometry
    resized = (ds.map_batches(ImageResizer, batch_format="pyarrow",
                              fn_constructor_kwargs={"width": 16, "height": 12},
                              concurrency=(1, 2))
               .to_pandas().sort_values("media_id").reset_index(drop=True))
    out = decode_image(resized["payload"][0])
    assert out.shape == (12, 16, 3)
    assert np.array_equal(out, resize_nearest(img_a, 16, 12))


def test_media_cross_format_dups(ray_session):
    """End-to-end multimodal dedup: the same pixels re-encoded as
    PPM/PNG/GIF/JPEG are found as near-duplicates (LSH + exact verify),
    matching an INDEPENDENT brute-force full-matrix gold, with no
    cross-family false positives."""
    import pandas as pd

    import __ray_entry__ as em
    from ice_ray.oracle import gold_media_cross_format_dups

    res = em.queries()["media_cross_format_dups"]("unused")
    df = res.to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    gold = gold_media_cross_format_dups()
    pd.testing.assert_frame_equal(df, gold)
    # structure: every pair is within one base-image family; lossless
    # re-encodings (PPM/PNG/GIF) are exact (cosine == 1), JPEG is near
    assert (df["id1"] // 10 == df["id2"] // 10).all()
    # lossless re-encodings (PPM/PNG/GIF) are exact; both JPEG variants
    # (baseline %10==2, progressive %10==4) are lossy
    lossless = df[~df["id1"].mod(10).isin([2, 4])
                  & ~df["id2"].mod(10).isin([2, 4])]
    assert (lossless["cosine"] == 1.0).all()
    jpeg = df[df["id1"].mod(10).isin([2, 4])
              | df["id2"].mod(10).isin([2, 4])]
    # a baseline-vs-progressive pair of the SAME pixels decodes
    # bit-identically (same quantized coefficients → same IDCT), so its
    # cosine is exactly 1; every JPEG-vs-lossless pair is strictly < 1
    b_vs_p = jpeg[jpeg["id1"].mod(10).isin([2, 4])
                  & jpeg["id2"].mod(10).isin([2, 4])]
    assert len(b_vs_p) > 0 and (b_vs_p["cosine"] == 1.0).all()
    vs_lossless = jpeg.drop(b_vs_p.index)
    assert len(vs_lossless) > 0 and (vs_lossless["cosine"] < 1.0).all()
    assert (jpeg["cosine"] >= 0.995).all()
    # progressive siblings exist and cluster with their family
    assert (df["id1"].mod(10).eq(4) | df["id2"].mod(10).eq(4)).any()


# ---------------------------------------------------------------- audio

def test_wav_roundtrip_and_mono_mix():
    from ice_ray.stages.multimodal import decode_audio, encode_wav

    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 200.0 * t)
    samples, rate = decode_audio(encode_wav(x, 8000))
    assert rate == 8000 and len(samples) == 800
    assert np.max(np.abs(samples - x.astype(np.float32))) < 1e-3  # 16-bit q

    # stereo averages to mono; float32 WAV decodes exactly
    import struct
    st = np.stack([x, -x], axis=1).astype("<f4")
    body = st.reshape(-1).tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 8000,
                                   8000 * 8, 8, 32)
           + b"data" + struct.pack("<I", len(body)) + body)
    mono, rate2 = decode_audio(wav)
    assert rate2 == 8000
    assert np.max(np.abs(mono)) < 1e-6  # L + R cancel exactly


def test_wav_malformed_returns_none():
    from ice_ray.stages.multimodal import decode_audio, encode_wav

    assert decode_audio(b"") is None
    assert decode_audio(b"RIFF1234WAVE") is None           # no chunks
    assert decode_audio(b"ID3\x03mp3-stub" * 10) is None   # not RIFF
    good = encode_wav(np.zeros(100), 8000)
    assert decode_audio(good[:40]) is None                 # truncated
    # fmt claiming a compressed codec → None
    bad = bytearray(good)
    bad[20] = 85  # wFormatTag = MP3
    assert decode_audio(bytes(bad)) is None


def test_audio_features_tone_band():
    """A pure tone's energy lands in band int(freq/(rate/2)·dim)."""
    from ice_ray.stages.multimodal import audio_features, decode_audio, encode_wav

    rate, freq, dim = 16000, 440.0, 64
    t = np.arange(1600) / rate
    samples, _ = decode_audio(encode_wav(0.8 * np.sin(2 * np.pi * freq * t), rate))
    f = audio_features(samples, rate, dim)
    assert len(f) == dim and f.dtype == np.float32
    assert int(np.argmax(f)) == int(freq / (rate / 2) * dim)


def test_audio_pipeline_and_independent_gold(ray_session):
    """AudioFeatureExtractor over the fixture == the INDEPENDENT gold
    (stdlib wave parser + explicit DFT), including the fake-path stub."""
    import hashlib

    from ice_ray.oracle import audio_fixture_rows, gold_audio_features
    from ice_ray.stages.multimodal import AudioFeatureExtractor

    ds = ray.data.from_items(audio_fixture_rows())
    out = (ds.map_batches(AudioFeatureExtractor, batch_format="pyarrow",
                          batch_size=2, concurrency=(1, 2))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    gold = gold_audio_features().sort_values("media_id").reset_index(drop=True)
    assert list(out["media_id"]) == list(gold["media_id"])
    assert list(out["decoded"]) == [True, True, False]
    assert list(out["decoded"]) == list(gold["decoded"])
    assert list(out["duration_ms"].astype("int64")) == list(gold["duration_ms"])
    for emb, fp in zip(out["embedding"], gold["feat_fp"]):
        fr = np.round(np.asarray(emb, np.float32).astype(np.float64),
                      4).astype(np.float32)
        assert hashlib.md5(fr.tobytes()).hexdigest() == fp


def test_audio_strict_mode_raises(ray_session):
    import pytest

    from ice_ray.stages.multimodal import AudioFeatureExtractor

    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": pa.array(["audio"], pa.string()),
                      "payload": pa.array([b"ID3\x03stub"], pa.binary())})
    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor(mode="strict")(batch)


def test_progressive_jpeg_roundtrip_equals_baseline():
    """Progressive (SOF2) streams decode to EXACTLY the baseline
    round-trip's pixels — both paths reconstruct the same quantized
    coefficients, so the IDCT output must be bit-identical.  Covers DC
    successive approximation + refinement, per-component AC spectral
    bands, AC refinement with EOB runs and buffered correction bits,
    4:4:4 / 4:2:0 / asymmetric subsampling, odd sizes."""
    import numpy as np

    from ice_ray.stages.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rs = np.random.RandomState(3)
    for shape, sub in [((24, 40), (1, 1)), ((33, 17), (1, 1)),
                       ((37, 51), (2, 2)), ((16, 24), (2, 1)),
                       ((9, 9), (1, 2)), ((8, 8), (1, 1))]:
        img = np.zeros(shape + (3,), np.uint8)
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
        img[:, :, 0] = (yy * 5 + xx * 3) % 256
        img[:, :, 1] = rs.randint(0, 255, shape).astype(np.uint8)
        img[:, :, 2] = ((xx * 7) % 256).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=80, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=80,
                                                   subsampling=sub))
        assert prog is not None, (shape, sub)
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_jpeg_malformed():
    import numpy as np

    from ice_ray.stages.jpeg import decode_jpeg, encode_jpeg_progressive

    img = np.full((16, 16, 3), 77, np.uint8)
    good = encode_jpeg_progressive(img)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(good[:len(good) // 2]) is None     # truncated
    assert decode_jpeg(good[:-2]) is None                 # missing EOI
    bad = bytearray(good)
    i = bad.find(b"\xff\xc2")
    bad[i + 1] = 0xC9                                     # arithmetic SOF
    assert decode_jpeg(bytes(bad)) is None


def test_progressive_jpeg_ff_fill_padding():
    """Spec-legal 0xFF fill bytes before an inter-scan marker (T.81
    B.1.1.2 padding) must decode identically, not parse the pad as a
    segment length (r4 ADVICE)."""
    import numpy as np

    from ice_ray.stages.jpeg import decode_jpeg, encode_jpeg_progressive

    yy, xx = np.mgrid[0:24, 0:16]
    img = np.stack([(yy * 9) % 256, (xx * 13) % 256,
                    (yy + xx) % 256], axis=2).astype(np.uint8)
    good = encode_jpeg_progressive(img)
    base = decode_jpeg(good)
    assert base is not None
    # pad before EOI (0xFF fill can't occur inside entropy data — the
    # coder stuffs 0x00 after literal 0xFF bytes)
    eoi = good.rfind(b"\xff\xd9")
    assert np.array_equal(decode_jpeg(good[:eoi] + b"\xff" * 3 + good[eoi:]),
                          base)
    # pad before a later-scan SOS marker
    first = good.find(b"\xff\xda")
    second = good.find(b"\xff\xda", first + 2)
    assert second > 0, "progressive stream should have multiple scans"
    padded = good[:second] + b"\xff" * 2 + good[second:]
    assert np.array_equal(decode_jpeg(padded), base)


def test_baseline_jpeg_header_ff_fill_padding():
    """Same B.1.1.2 fill padding in the HEADER marker loop (between SOI
    and SOS) — the shared _decode_jpeg loop must skip fill bytes instead
    of parsing them as a segment length (r5 review parity with the
    progressive inter-scan fix)."""
    import numpy as np

    from ice_ray.stages.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:16]
    img = np.stack([(yy * 9) % 256, (xx * 13) % 256,
                    (yy + xx) % 256], axis=2).astype(np.uint8)
    good = encode_jpeg(img)
    base = decode_jpeg(good)
    assert base is not None
    # pad immediately after SOI, before the first header segment
    assert np.array_equal(decode_jpeg(good[:2] + b"\xff" * 3 + good[2:]),
                          base)
    # pad before DQT mid-header
    dqt = good.find(b"\xff\xdb")
    assert dqt > 0
    assert np.array_equal(decode_jpeg(good[:dqt] + b"\xff" * 2 + good[dqt:]),
                          base)


# ---------------------------------------------------------------- video

def test_mjpeg_avi_roundtrip_and_frame_sampling(ray_session):
    """REAL video path with no ffmpeg: MJPEG frames in an AVI RIFF
    container.  FrameSampler extracts decodable per-frame JPEGs with
    container timing; each sampled frame decodes to the matching source
    frame within JPEG tolerance."""
    import numpy as np

    import ray.data
    from ice_ray.stages.jpeg import decode_jpeg
    from ice_ray.stages.multimodal import (
        FrameSampler,
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    def frame(i):
        x = np.arange(48)[None, :]
        y = np.arange(32)[:, None]
        img = np.zeros((32, 48, 3), np.uint8)
        img[:, :, 0] = np.clip(x * 4 + i * 20, 0, 255)
        img[:, :, 1] = np.clip(255 - y * 5, 0, 255)
        img[:, :, 2] = np.clip(x + y + i * 10, 0, 255)
        return img

    src = [frame(i) for i in range(10)]
    avi = encode_avi_mjpeg(src, fps=5)           # 2000 ms of video
    meta = parse_avi_mjpeg(avi)
    assert meta is not None and len(meta["frames"]) == 10
    assert meta["usec_per_frame"] == 200_000
    assert (meta["width"], meta["height"]) == (48, 32)

    rows = [{"media_id": 9, "kind": "video", "payload": avi,
             "mime": "video/x-msvideo", "width": 48, "height": 32,
             "duration_ms": 2000}]
    out = (ray.data.from_items(rows)
           .map_batches(FrameSampler, batch_format="pyarrow",
                        concurrency=2,
                        fn_constructor_kwargs={"every_ms": 600,
                                               "strict": True})
           .to_pandas().sort_values("frame_idx"))
    # 2000ms at 600ms steps → samples at 0, 600, 1200, 1800
    assert out["ts_ms"].tolist() == [0, 600, 1200, 1800]
    for ts, fr in zip(out["ts_ms"], out["frame"]):
        img = decode_jpeg(fr)
        assert img is not None
        want = src[int(ts / 200)]
        assert np.abs(img.astype(int) - want.astype(int)).max() <= 14, ts

    # malformed container → None from the parser, stub path in sampler
    assert parse_avi_mjpeg(avi[:40]) is None
    assert parse_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE") is None
    # non-MJPEG video still hits the strict boundary
    import pytest as _pt
    bad = [{"media_id": 1, "kind": "video", "payload": b"\x00\x00ftyp f",
            "mime": "video/mp4", "width": 1, "height": 1,
            "duration_ms": 1000}]
    with _pt.raises(Exception):
        (ray.data.from_items(bad)
         .map_batches(FrameSampler, batch_format="pyarrow",
                      concurrency=2,
                      fn_constructor_kwargs={"strict": True})
         .to_pandas())


def test_g711_wav_decode():
    """G.711 µ-law/A-law WAV (format tags 7/6): table expansion decodes
    a companded sine back to the original within companding tolerance,
    and a µ-law silence byte (0xFF) decodes to exactly 0."""
    import struct

    import numpy as np

    from ice_ray.stages.multimodal import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_audio,
    )

    # spot values: µ-law 0xFF = +0, 0x7F = -0; A-law 0xD5 = +8/32768
    assert _ULAW_TABLE[0xFF] == 0.0 and _ULAW_TABLE[0x7F] == 0.0
    assert abs(_ALAW_TABLE[0xD5] - 8.0 / 32768.0) < 1e-7

    def mu_compress(x):
        """Reference µ-law compressor (G.711 formula) for the fixture."""
        y = np.clip((x * 32768.0).astype(np.int64), -32635, 32635)
        sign = np.where(y < 0, 0x80, 0)
        mag = np.abs(y) + 0x84
        exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
        mant = (mag >> (exp + 3)) & 0x0F
        return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)

    rate, n = 8000, 800
    t = np.arange(n) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    comp = mu_compress(sig)

    def wav(fmt_tag, data):
        fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate, 1, 8)
        return (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    out = decode_audio(wav(7, comp.tobytes()))
    assert out is not None
    mono, r = out
    assert r == rate and len(mono) == n
    # companding error bound: µ-law SNR ≈ 38 dB on a half-scale sine
    assert np.abs(mono - sig).max() < 0.02
    # A-law path decodes and yields the right length too
    out2 = decode_audio(wav(6, comp.tobytes()))
    assert out2 is not None and len(out2[0]) == n
