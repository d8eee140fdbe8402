import pytest

from vectorsearchutil_spark.operators.multimodal import (
    decode_image_meta,
    decode_image_pixels,
    synthesize_binary,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x"), (3, "a" * 600)], ["doc_id", "text"]
    )
    return synthesize_binary(docs)


def test_binary_roundtrip(media):
    meta = {r["doc_id"]: r for r in decode_image_meta(media).collect()}
    assert meta[1]["payload_len"] == 11
    assert meta[1]["width"] == (11 * 7 + 13) % 512 + 1
    assert meta[1]["height"] == (11 * 11 + 17) % 512 + 1
    assert meta[3]["payload_len"] == 600


def test_binary_column_type(media):
    assert dict(media.dtypes)["content"] == "binary"


def test_corrupt_header_flagged(spark):
    df = spark.createDataFrame([(9, bytearray(b"NOTMAGIC-extra"))],
                               ["doc_id", "content"])
    row = decode_image_meta(df).first()
    assert row["width"] == -1 and row["height"] == -1


def test_real_decode_is_stubbed(media):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; stub not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_pixels(media)


def test_video_frame_sampling(spark):
    import hashlib

    from vectorsearchutil_spark.operators.multimodal import (
        frame_sample,
        synthesize_video,
    )

    docs = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    # n_frames = 10 % 30 + 2 = 12; every 3rd → frames 0,3,6,9
    frames = frame_sample(synthesize_video(docs), every_k=3).collect()
    assert [r["frame_idx"] for r in frames] == [0, 3, 6, 9]
    expected0 = hashlib.md5(b"abcdefghij:0").hexdigest()
    assert frames[0]["frame_hash"] == expected0


def test_video_corrupt_skipped(spark):
    from vectorsearchutil_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([(1, bytearray(b"JUNK"))], ["doc_id", "video"])
    assert frame_sample(df).count() == 0
