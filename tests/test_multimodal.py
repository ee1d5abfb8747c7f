"""X6 multimodal columns: schema plumbing, deterministic stub featurizer,
payload column pruning on the metadata path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload, extract_features, frame_sample,
    media_metadata_stats, multimodal_join,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "ab", "s1"), (2, "abcd", "s1"), (3, "xyz", "s2")],
        "doc_id long, text string, source string")
    return attach_binary_payload(docs, "doc_id", "text", "source")


def test_payload_is_binary_with_metadata(spark):
    media = _media(spark)
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter("media_id = 2").first()
    assert bytes(row.payload) == b"abcd"
    assert row.meta.n_bytes == 4 and row.meta.source == "s1"


def test_extract_features_deterministic_stub(spark):
    out = extract_features(_media(spark))
    row = out.filter("media_id = 1").first()
    # "ab" = bytes 97,98 -> buckets 1,2 -> [0, .5, .5, 0...]
    assert row.n_bytes == 2
    assert row.features == [0.0, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0]


def test_extract_features_real_decode_raises_on_non_wav(spark):
    # _media() payloads are application/octet-stream — the real-decode
    # path only handles audio/wav (stdlib wave); anything else still
    # raises where PIL/ffmpeg would be called.
    with pytest.raises(Exception, match="NotImplementedError|decode|wav"):
        extract_features(_media(spark), decode_stub=False).collect()


def test_wav_synthesize_decode_round_trip(spark):
    """The real decode path: genuine RIFF/WAVE bytes are synthesized,
    parsed back with stdlib wave, and the frame-level features must
    match an independent numpy recomputation of the generator's closed
    form — a mis-parsed header, wrong endianness, or dropped frame
    fails."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.multimodal import (
        synthesize_wav_payload,
    )

    ids = spark.createDataFrame([(3,), (107,)], "doc_id long")
    wav = synthesize_wav_payload(ids, "doc_id")
    # payloads are real RIFF containers
    first = wav.filter("media_id = 3").first()
    assert bytes(first.payload[:4]) == b"RIFF"
    assert first.meta.mime == "audio/wav"
    out = {r.media_id: r for r in
           extract_features(wav, decode_stub=False).collect()}
    for mid in (3, 107):
        n = 50 + mid % 100
        i = np.arange(n, dtype=np.int64)
        s = ((mid * 31 + i * 17) % 2048) - 1024
        r = out[mid]
        assert r.n_channels == 1
        assert r.sample_rate == 8000
        assert r.n_frames == n
        assert r.sample_sum == int(s.sum())
        assert r.rms == round(float(np.sqrt((s * s).sum() / n)), 6)


def test_frame_sample_explosion(spark):
    docs = spark.createDataFrame([(1, "x" * 200, "s")],
                                 "doc_id long, text string, source string")
    media = attach_binary_payload(docs, "doc_id", "text", "source")
    frames = frame_sample(media, every_n_bytes=64).collect()
    assert len(frames) == 3            # 200 // 64
    assert [f.byte_offset for f in frames] == [0, 64, 128]


def test_metadata_stats_prune_payload(spark, tmp_path):
    """Metadata aggregate over a materialized media table must NOT read
    payload bytes — column pruning visible in the parquet ReadSchema."""
    path = str(tmp_path / "media")
    _media(spark).write.parquet(path)
    stats = media_metadata_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[-1]
    got = {(r.source): (r.n_items, r.total_bytes) for r in stats.collect()}
    assert got == {"s1": (2, 6), "s2": (1, 3)}


def test_multimodal_join_aligns_ids(spark):
    docs = spark.createDataFrame([(1, "t", "en", "s", 1)],
                                 "doc_id long, text string, lang string, "
                                 "source string, n_chars long")
    emb = spark.createDataFrame([(1, [0.1, 0.2], 0)],
                                "vec_id long, embedding array<float>, label int")
    out = multimodal_join(docs, emb)
    assert out.count() == 1
    assert set(out.columns) >= {"doc_id", "text", "embedding", "label"}


# real BMP image decode (r11) ---------------------------------------------


def test_bmp_synthesize_and_decode_round_trip(spark):
    """The generated BMP is a genuine container and the decoder's
    statistics equal the generator's closed form — header parse,
    bottom-up row order, 4-byte padding and BGR undo all verified
    (an order bug fails corner_rgb/wsum even when pixel_sum matches)."""
    from serverless_data_pipeline_spark.operators.multimodal import (
        extract_image_features, synthesize_bmp_payload,
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 40)],
                                "doc_id long")
    media = synthesize_bmp_payload(ids, "doc_id")
    got = {r.media_id: r for r in extract_image_features(media).collect()}
    assert len(got) == 39
    for i in range(1, 40):
        w, h = 4 + i % 5, 3 + i % 4
        psum = corner = wsum = 0
        for y in range(h):
            for x in range(w):
                r = (i * 7 + x * 3 + y * 5) % 256
                g = (i * 11 + x * 5 + y * 7) % 256
                b = (i * 13 + x * 7 + y * 11) % 256
                psum += r + g + b
                wsum += (x + 10 * y) * (r + g + b)
                if x == 0 and y == 0:
                    corner = r * 65536 + g * 256 + b
        row = got[i]
        assert (row.width, row.height) == (w, h)
        assert row.pixel_sum == psum
        assert row.corner_rgb == corner
        assert row.wsum == wsum
        # genuine container: 54-byte headers + padded bottom-up rows
        assert row.n_bytes == 54 + ((w * 3 + 3) // 4 * 4) * h


def test_bmp_decode_rejects_non_bmp_and_malformed(spark):
    """The honest boundary: entropy-coded mimes raise where PIL would
    be called; corrupt BMP bytes raise a clear ValueError."""
    import pytest
    from serverless_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload, extract_image_features,
    )
    docs = spark.createDataFrame([(1, "not an image", "s")],
                                 "doc_id long, text string, src string")
    png = attach_binary_payload(docs, "doc_id", "text", "src",
                                mime="image/png")
    with pytest.raises(Exception, match="PIL"):
        extract_image_features(png).collect()
    fake = attach_binary_payload(docs, "doc_id", "text", "src",
                                 mime="image/bmp")
    with pytest.raises(Exception, match="BMP"):
        extract_image_features(fake).collect()


def test_y4m_synthesize_and_decode_round_trip(spark):
    """r12 (closing the video half of the decode stub): the Y4M
    payload is a genuine YUV4MPEG2 container, and the demux recovers
    dims / frame count / plane stats matching an independent Python
    replay of the generator's closed form — plane order and frame
    order included."""
    from serverless_data_pipeline_spark.operators.multimodal import (
        extract_video_features, synthesize_y4m_payload,
    )
    docs = spark.createDataFrame([(i,) for i in range(7)],
                                 "doc_id long")
    media = synthesize_y4m_payload(docs, "doc_id")
    got = {r.media_id: r for r in
           extract_video_features(media).collect()}
    for i in range(7):
        w, h, nf = 4 + i % 3, 2 + i % 3, 2 + i % 3
        psum = wsum = 0
        corner = None
        for t in range(nf):
            for y in range(h):
                for x in range(w):
                    yv = (i * 7 + x * 3 + y * 5 + t * 11) % 256
                    uv = (i * 11 + x * 5 + y * 7 + t * 13) % 256
                    vv = (i * 13 + x * 7 + y * 11 + t * 17) % 256
                    psum += yv + uv + vv
                    wsum += (x + 10 * y + 100 * t) * (yv + uv + vv)
                    if x == 0 and y == 0 and t == 0:
                        corner = yv * 65536 + uv * 256 + vv
        row = got[i]
        assert (row.width, row.height, row.n_frames) == (w, h, nf)
        assert row.plane_sum == psum
        assert row.corner_yuv == corner
        assert row.wsum == wsum
        # genuine container: ASCII stream header + per-frame
        # 'FRAME\n' markers + three raw planes per frame
        header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n"
        assert row.n_bytes == len(header) + nf * (6 + 3 * w * h)


def test_y4m_real_frame_sample(spark):
    """frame_sample(decode_stub=False) demuxes REAL frame boundaries:
    one row per actual frame, offsets pointing at each FRAME marker,
    per-frame luma sums matching the closed form."""
    from serverless_data_pipeline_spark.operators.multimodal import (
        frame_sample, synthesize_y4m_payload,
    )
    docs = spark.createDataFrame([(5,)], "doc_id long")
    media = synthesize_y4m_payload(docs, "doc_id")
    rows = sorted(frame_sample(media, decode_stub=False).collect(),
                  key=lambda r: r.frame_idx)
    i = 5
    w, h, nf = 4 + i % 3, 2 + i % 3, 2 + i % 3
    assert [r.frame_idx for r in rows] == list(range(nf))
    hdr = len(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n")
    for t, r in enumerate(rows):
        assert r.byte_offset == hdr + t * (6 + 3 * w * h)
        assert r.y_sum == sum(
            (i * 7 + x * 3 + y * 5 + t * 11) % 256
            for y in range(h) for x in range(w))


def test_y4m_decode_rejects_non_y4m_alpha_odd_dims_and_malformed(spark):
    """The honest boundary (r13 shape): compressed video mimes raise
    where ffmpeg would be called, UNDECODABLE layouts (C444alpha's 4th
    plane, Cmono) raise, odd dimensions under subsampled chroma raise
    a clear ValueError, and corrupt Y4M bytes raise a clear
    ValueError. C420/C422 themselves now DECODE (see the subsampled
    round-trip test)."""
    import pytest
    from serverless_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload, extract_video_features, frame_sample,
    )
    docs = spark.createDataFrame([(1, "not a video", "s")],
                                 "doc_id long, text string, src string")
    mp4 = attach_binary_payload(docs, "doc_id", "text", "src",
                                mime="video/mp4")
    with pytest.raises(Exception, match="ffmpeg"):
        extract_video_features(mp4).collect()
    with pytest.raises(Exception, match="ffmpeg"):
        frame_sample(mp4, decode_stub=False).collect()

    def _y4m(text):
        d = spark.createDataFrame([(1, text, "s")],
                                  "doc_id long, text string, src string")
        return attach_binary_payload(d, "doc_id", "text", "src",
                                     mime="video/y4m")

    with pytest.raises(Exception, match="C444/C422/C420"):
        extract_video_features(
            _y4m("YUV4MPEG2 W4 H2 F25:1 C444alpha\n")).collect()
    with pytest.raises(Exception, match="C444/C422/C420"):
        extract_video_features(
            _y4m("YUV4MPEG2 W4 H2 F25:1 Cmono\n")).collect()
    # high-bit-depth C420 tags (2-byte samples) must route to the
    # honest ffmpeg boundary, not prefix-match the 8-bit C420 family
    # and then misreport a valid file as corrupt (r13 review fix)
    for hb in ("C420p10", "C420p12", "C420p16"):
        with pytest.raises(Exception, match="C444/C422/C420"):
            extract_video_features(
                _y4m(f"YUV4MPEG2 W4 H2 F25:1 {hb}\n")).collect()
    with pytest.raises(Exception, match="even"):
        extract_video_features(
            _y4m("YUV4MPEG2 W5 H2 F25:1 C420\n")).collect()
    with pytest.raises(Exception, match="even"):
        extract_video_features(
            _y4m("YUV4MPEG2 W5 H2 F25:1 C422\n")).collect()
    with pytest.raises(Exception, match="YUV4MPEG2"):
        extract_video_features(
            _y4m("not a video")).collect()
    # truncated frame under SUBSAMPLED plane sizes: a C420 frame is
    # w*h + 2*(w/2)*(h/2) bytes — one byte short must raise, and a
    # C444-sized frame under a C420 header is 'extra' bytes that fail
    # the next FRAME-marker check rather than silently decoding
    good = "YUV4MPEG2 W4 H2 F25:1 C420\nFRAME\n" + "x" * 12
    with pytest.raises(Exception, match="truncated|FRAME"):
        extract_video_features(_y4m(good[:-1])).collect()
    with pytest.raises(Exception, match="FRAME"):
        extract_video_features(_y4m(good + "yy")).collect()


def test_y4m_subsampled_synthesize_and_decode_round_trip(spark):
    """r12 verdict #2: C420 (Y4M's own header-omitted default) and
    C422 decode for real — half/quarter-size chroma planes recovered
    at their own grid, stats matching an independent replay of the
    generator's closed form. Also pins the spec default: a header with
    NO C tag demuxes as C420."""
    from serverless_data_pipeline_spark.operators.multimodal import (
        extract_video_features, frame_sample, synthesize_y4m_payload,
    )
    docs = spark.createDataFrame([(i,) for i in range(7)],
                                 "doc_id long")
    for cs in ("420", "422"):
        media = synthesize_y4m_payload(docs, "doc_id", cspace=cs)
        got = {r.media_id: r for r in
               extract_video_features(media).collect()}
        for i in range(7):
            nf = 2 + i % 3
            if cs == "420":
                w, h = 4 + 2 * (i % 3), 2 + 2 * (i % 3)
                cw, ch = w // 2, h // 2
            else:
                w, h = 4 + 2 * (i % 3), 2 + i % 3
                cw, ch = w // 2, h
            psum = wsum = 0
            for t in range(nf):
                for y in range(h):
                    for x in range(w):
                        yv = (i * 7 + x * 3 + y * 5 + t * 11) % 256
                        psum += yv
                        wsum += (x + 10 * y + 100 * t) * yv
                for y in range(ch):
                    for x in range(cw):
                        uv = (i * 11 + x * 5 + y * 7 + t * 13) % 256
                        vv = (i * 13 + x * 7 + y * 11 + t * 17) % 256
                        psum += uv + vv
                        wsum += (x + 10 * y + 100 * t) * (uv + vv)
            corner = ((i * 7) % 256) * 65536 \
                + ((i * 11) % 256) * 256 + (i * 13) % 256
            row = got[i]
            assert (row.width, row.height, row.n_frames) == (w, h, nf)
            assert row.plane_sum == psum
            assert row.corner_yuv == corner
            assert row.wsum == wsum
            hdr = len(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cs}\n")
            fsz = 6 + w * h + 2 * cw * ch
            assert row.n_bytes == hdr + nf * fsz
        # real frame boundaries under subsampled frame sizes
        rows = sorted(
            frame_sample(media, decode_stub=False)
            .filter("media_id = 5").collect(),
            key=lambda r: r.frame_idx)
        i = 5
        nf = 2 + i % 3
        if cs == "420":
            w, h, cw, ch = 4 + 2 * (i % 3), 2 + 2 * (i % 3), None, None
            cw, ch = w // 2, h // 2
        else:
            w, h = 4 + 2 * (i % 3), 2 + i % 3
            cw, ch = w // 2, h
        hdr = len(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cs}\n")
        fsz = 6 + w * h + 2 * cw * ch
        assert [r.frame_idx for r in rows] == list(range(nf))
        for t, r in enumerate(rows):
            assert r.byte_offset == hdr + t * fsz
            assert r.y_sum == sum(
                (i * 7 + x * 3 + y * 5 + t * 11) % 256
                for y in range(h) for x in range(w))
    # the spec default: no C tag in the header means C420
    import numpy as np
    from serverless_data_pipeline_spark.operators.multimodal import (
        _parse_y4m,
    )
    payload = (b"YUV4MPEG2 W4 H2 F25:1\nFRAME\n"
               + bytes(range(8)) + bytes(range(10, 12))
               + bytes(range(20, 22)))
    w, h, fy, fu, fv = _parse_y4m(payload)
    assert (w, h) == (4, 2)
    assert fy.shape == (1, 2, 4) and fu.shape == (1, 1, 2)
    assert fy[0].tolist() == [[0, 1, 2, 3], [4, 5, 6, 7]]
    assert fu[0].tolist() == [[10, 11]] and fv[0].tolist() == [[20, 21]]
    assert isinstance(fy, np.ndarray)
