"""Real (codec-free) image decoding: PPM/PGM/BMP byte-level decode
against hand-assembled payloads, generator round-trip, and the Spark
image_pixel_stats path vs the closed-form pixel rule."""

import numpy as np
import pytest

from dxa_pagerank_spark.functions.multimodal import (
    _rule_pixels,
    decode_image,
    encode_ppm,
    image_pixel_stats,
    make_synthetic_images,
)


def test_ppm_round_trip_and_comments():
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    # header comments and multi-whitespace are part of the grammar
    wire = b"P6 # a comment\n# another\n 3\t2 # w h\n255\n" + arr.tobytes()
    assert (decode_image(wire) == arr).all()


def test_pgm_decodes_grayscale():
    arr = np.array([[0, 128], [255, 7]], dtype=np.uint8)
    wire = b"P5\n2 2\n255\n" + arr.tobytes()
    assert (decode_image(wire) == arr).all()


def _bmp_24(arr, bottom_up=True):
    h, w = arr.shape[0], arr.shape[1]
    stride = (w * 3 + 3) & ~3
    rows = arr[::-1] if bottom_up else arr
    body = b"".join(
        rows[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3) for y in range(h)
    )
    header_h = h if bottom_up else -h
    return (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + header_h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
        + body
    )


def test_bmp_decodes_both_row_orders_and_padding():
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_image(_bmp_24(arr, bottom_up=True)) == arr).all()
    assert (decode_image(_bmp_24(arr, bottom_up=False)) == arr).all()


def test_unsupported_formats_still_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit


def test_spark_pixel_stats_match_closed_form(spark):
    ids = spark.createDataFrame([(i,) for i in range(9)], "media_id LONG")
    media = make_synthetic_images(ids, width=8, height=6)
    got = {r["media_id"]: r for r in image_pixel_stats(media).collect()}
    assert len(got) == 9
    for mid in range(9):
        px = _rule_pixels(mid, 8, 6).astype(np.float64)
        r = got[mid]
        assert (r["width"], r["height"]) == (8, 6)
        for ci, col in enumerate(("mean_r", "mean_g", "mean_b")):
            assert r[col] == pytest.approx(px[:, :, ci].mean(), abs=1e-6)
