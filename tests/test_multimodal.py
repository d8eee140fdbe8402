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
