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


def test_audio_roundtrip_and_resample(spark):
    import hashlib

    import numpy as np

    from vectorsearchutil_spark.operators.multimodal import (
        decode_audio_meta,
        resample_audio,
        synthesize_audio,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 50)], ["doc_id", "text"]
    )
    audio = synthesize_audio(df)
    meta = {r["doc_id"]: r for r in decode_audio_meta(audio).collect()}
    assert meta[1]["sample_rate"] == 8000 + (11 % 3) * 4000
    assert meta[1]["n_samples"] == 11 % 1000 + 16
    assert meta[1]["duration_ms"] == meta[1]["n_samples"] * 1000 // meta[1]["sample_rate"]

    res = {r["doc_id"]: r for r in resample_audio(audio, every_k=4).collect()}
    # python reference on the same payload
    blob = bytes(audio.filter("doc_id = 1").first()["audio"])
    samples = np.frombuffer(blob[8:], dtype=">u2")[::4]
    assert res[1]["n_samples_out"] == len(samples)
    assert res[1]["resampled_hash"] == hashlib.md5(
        samples.astype(">u2").tobytes()
    ).hexdigest()


def test_image_ahash_identity_and_locality(spark):
    from vectorsearchutil_spark.operators.multimodal import (
        image_ahash,
        synthesize_binary,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base),                       # identical payload
        (3, base[:-1] + "G"),            # one char changed
        (4, "completely different content with other words entirely"),
        (5, ""),
    ]
    df = synthesize_binary(
        spark.createDataFrame(rows, ["doc_id", "text"])
    )
    got = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] == got[2]
    assert got[5] == "0000000000000000"
    assert all(len(h) == 16 for h in got.values())

    def hamming(a, b):
        x = int(a, 16) ^ int(b, 16)
        return bin(x).count("1")

    # one changed character flips at most a couple of sampled bits
    assert hamming(got[1], got[3]) <= 4
    # unrelated content is far
    assert hamming(got[1], got[4]) > 8


def test_ahash_neardup_pairs_exact_radius(spark):
    from vectorsearchutil_spark.operators.multimodal import (
        ahash_neardup_pairs,
    )

    rows = [
        (1, "0000000000000000"),
        (2, "0000000000000001"),   # hamming 1 from id 1
        (3, "00000000000000ff"),   # hamming 8 from id 1 -> excluded
        (4, "000000000000007f"),   # hamming 7 from id 1 -> included
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ahash"])
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ahash_neardup_pairs(df, max_hamming=7, n_bands=8).collect()
    )
    assert (1, 2, 1) in got and (1, 4, 7) in got
    assert all(h <= 7 for _, _, h in got)
    assert not any({a, b} == {1, 3} for a, b, _ in got)


def test_ahash_neardup_pairs_matches_brute_force(spark):
    import itertools
    import random

    from vectorsearchutil_spark.operators.multimodal import (
        ahash_neardup_pairs,
    )

    rng = random.Random(9)
    base = rng.getrandbits(64)
    hashes = {0: base}
    for i in range(1, 60):
        # cluster around a few anchors so near pairs exist
        anchor = hashes[rng.randrange(0, i)]
        flips = rng.randint(0, 6)
        v = anchor
        for _ in range(flips):
            v ^= 1 << rng.randrange(64)
        hashes[i] = v
    rows = [(i, format(v, "016x")) for i, v in hashes.items()]
    df = spark.createDataFrame(rows, ["doc_id", "ahash"])
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ahash_neardup_pairs(df, max_hamming=7, n_bands=8).collect()
    )
    exp = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 7
    )
    assert got == exp


def test_ahash_neardup_band_cap_drops_stop_bands(spark):
    from vectorsearchutil_spark.operators.multimodal import (
        ahash_neardup_pairs,
    )

    # 10 identical all-zero hashes (a stop-band pileup) + one close pair
    rows = [(i, "0000000000000000") for i in range(10)] + [
        (100, "ffff00000000000f"),
        (101, "ffff00000000000e"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ahash"])
    capped = ahash_neardup_pairs(
        df, max_hamming=3, n_bands=4, max_band_freq=5
    ).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in capped)
    # the zero-cluster bands exceed the cap -> its 45 pairs vanish;
    # the distinct pair still surfaces through its rare bands
    assert got == [(100, 101)]
    # without a cap the zero cluster dominates
    full = ahash_neardup_pairs(df, max_hamming=3, n_bands=4).count()
    assert full == 45 + 1
