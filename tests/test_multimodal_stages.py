"""Resize / frame-sample multimodal stages: schema, batch shape, determinism
(codec calls stubbed — no PIL/ffmpeg in this container)."""

import pytest


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", b"imagebytes-1", (800, 600, None, "jpeg")),
        ("img2", "image", b"imagebytes-2", (100, 50, None, "png")),
        ("vid1", "video", b"videobytes-1", (1920, 1080, 3500, "h264")),
        ("vid2", "video", b"videobytes-2", (1280, 720, 0, "h264")),
        ("bad", "image", None, (0, 0, None, "jpeg")),
    ]
    return spark.createDataFrame(
        rows,
        "media_ref string, media_type string, payload binary, "
        "meta struct<width int, height int, duration_ms int, codec string>",
    )


def test_resize_bounds_dimensions(spark, media):
    from ocr_toolkit_spark.operators.multimodal import resize_images

    out = {r.media_ref: r for r in resize_images(media, max_side=512).collect()}
    assert (out["img1"].width, out["img1"].height) == (512, 384)
    assert out["img1"].resized
    assert (out["img2"].width, out["img2"].height) == (100, 50)  # under bound
    assert not out["img2"].resized
    assert out["bad"].width == 0 and not out["bad"].resized


def test_frame_sampling_fanout(spark, media):
    from ocr_toolkit_spark.operators.multimodal import sample_frames

    rows = sample_frames(media.filter("media_type = 'video'"),
                         every_ms=1000, max_frames=16).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert len(by_ref["vid1"]) == 3  # 3500ms / 1000ms
    assert [f.ts_ms for f in sorted(by_ref["vid1"], key=lambda x: x.frame_idx)] == [
        0, 1000, 2000]
    assert "vid2" not in by_ref  # zero duration → no frames
    # deterministic content-addressed frames
    again = sample_frames(media.filter("media_ref = 'vid1'")).collect()
    assert sorted(f.frame for f in again) == sorted(
        f.frame for f in by_ref["vid1"])


def test_iceberg_seam_unavailable_is_clear(spark):
    from ocr_toolkit_spark.sources import iceberg

    assert not iceberg.catalog_available(spark)
    with pytest.raises(RuntimeError, match="Parquet emulation"):
        iceberg.read_documents(spark)
