"""Multimodal (binary) column plumbing.

Pattern (north-star "multimodal columns" scope; generalizes the
reference's path-string image handling, ``vsu/image/_classes.py:40,74``
and A20's path rewriting, ``vsu/sample/main.py:14``):

* media lives in an opaque ``binary`` column + typed metadata columns;
* bulk ingest via the ``binaryFile`` source (sources/readers.py);
* decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` stages so payload bytes never cross
  the Python boundary row-at-a-time.

The real decoders (PIL/cv2/av) are not installed in this container,
so ``decode_image_meta`` parses a deterministic fake header
(``synthesize_binary`` writes it) and the real-decoder entry point
raises ``NotImplementedError`` unless PIL is importable — the
Spark-side plumbing (schema, batching, UDF signature) is real and
tested either way.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"IMG1"

#: decode output: one metadata row per media row.
META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload_len", IntegerType()),
    ]
)


def synthesize_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake 'image': MAGIC + u16be width + u16be height
    + utf8 payload, assembled JVM-side via hex/unhex. Width/height
    derive from payload length so tests and oracles can recompute
    them from the source column."""
    n = F.length(F.col(text_col))
    width = ((n * 7 + 13) % 512 + 1).cast("int")
    height = ((n * 11 + 17) % 512 + 1).cast("int")
    content = F.unhex(
        F.concat(
            F.lit(MAGIC.hex().upper()),
            F.lpad(F.hex(width), 4, "0"),
            F.lpad(F.hex(height), 4, "0"),
            F.hex(F.encode(F.col(text_col), "UTF-8")),
        )
    )
    return df.withColumn("content", content)


def decode_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Parse media headers into typed metadata — the decode stage.

    mapInPandas: whole Arrow batches of binary payloads per call; at
    100 TB the decode parallelism is the scan parallelism."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "payload_len": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf[content_col]):
                b = bytes(blob)
                if b[:4] != MAGIC or len(b) < 8:
                    w = h = -1
                    plen = len(b)
                else:
                    w, h = struct.unpack(">HH", b[4:8])
                    plen = len(b) - 8
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["payload_len"].append(plen)
            yield pd.DataFrame(out)

    # a NULL payload is "no media": not decodable, not an error —
    # drop it JVM-side so the Arrow batch never sees None blobs
    return df.select("doc_id", content_col).filter(
        F.col(content_col).isNotNull()
    ).mapInPandas(decode, META_SCHEMA)


def decode_image_pixels(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Real image decode (PIL) — stubbed: the container has no image
    libs. The entry point exists so the pipeline shape is complete."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed in "
            "this environment; use decode_image_meta for header-level "
            "metadata or install pillow"
        ) from e
    raise NotImplementedError("real decode path not implemented yet")


VIDEO_MAGIC = b"VID1"

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def synthesize_video(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake 'video': VIDEO_MAGIC + u16be frame count +
    n 16-byte frames (frame i = md5 digest of 'text:i'), assembled
    JVM-side. Frame count derives from text length so oracles can
    recompute every sampled frame."""
    n = F.length(F.col(text_col))
    n_frames = (n % 30 + 2).cast("int")
    frames_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: F.upper(
                F.md5(F.concat(F.col(text_col), F.lit(":"), i.cast("string")))
            ),
        ),
        "",
    )
    content = F.unhex(
        F.concat(
            F.lit(VIDEO_MAGIC.hex().upper()),
            F.lpad(F.hex(n_frames), 4, "0"),
            frames_hex,
        )
    )
    return df.withColumn("video", content)


def frame_sample(
    df: DataFrame, content_col: str = "video", every_k: int = 3
) -> DataFrame:
    """Sample every k-th frame from binary video payloads — the
    frame-sampling stage of a multimodal pipeline as Arrow-batched
    mapInPandas (one output row per sampled frame). Real codecs are
    not installed; frames here are fixed-width synthetic blocks, but
    the batching/explode shape is exactly the production plumbing."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf[content_col]):
                b = bytes(blob)
                if b[:4] != VIDEO_MAGIC or len(b) < 6:
                    continue
                (n_frames,) = struct.unpack(">H", b[4:6])
                for i in range(0, n_frames, every_k):
                    frame = b[6 + 16 * i : 6 + 16 * (i + 1)]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_hash"].append(frame.hex())
            yield pd.DataFrame(out)

    # a NULL payload is "no media": not decodable, not an error —
    # drop it JVM-side so the Arrow batch never sees None blobs
    return df.select("doc_id", content_col).filter(
        F.col(content_col).isNotNull()
    ).mapInPandas(sample, FRAME_SCHEMA)


AUDIO_MAGIC = b"AUD1"

AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples_out", IntegerType()),
        StructField("resampled_hash", StringType()),
    ]
)


def synthesize_audio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake 'audio': AUDIO_MAGIC + u16be sample_rate/100
    + u16be n_samples + n 16-bit samples (the md5 of the text,
    repeated). Rate/count derive from text length so oracles and
    tests recompute them from the source column; assembly is JVM-side
    hex/unhex like the image/video twins."""
    n = F.length(F.col(text_col))
    rate = (F.lit(8000) + (n % 3) * 4000).cast("int")
    n_samples = (n % 1000 + 16).cast("int")
    reps = F.ceil(n_samples * 4 / 32).cast("int") + 1
    samples_hex = F.substring(
        F.repeat(F.upper(F.md5(F.col(text_col))), reps), 1, n_samples * 4
    )
    content = F.unhex(
        F.concat(
            F.lit(AUDIO_MAGIC.hex().upper()),
            F.lpad(F.hex((rate / 100).cast("int")), 4, "0"),
            F.lpad(F.hex(n_samples), 4, "0"),
            samples_hex,
        )
    )
    return df.withColumn("audio", content)


def decode_audio_meta(df: DataFrame, content_col: str = "audio") -> DataFrame:
    """Parse audio headers to typed metadata (rate, samples,
    duration) — Arrow-batched mapInPandas, same plumbing as the image
    decode: payload bytes cross once per batch, never per row."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[content_col]):
                b = bytes(blob)
                if b[:4] != AUDIO_MAGIC or len(b) < 8:
                    rate = ns = dur = -1
                else:
                    r100, ns = struct.unpack(">HH", b[4:8])
                    rate = r100 * 100
                    dur = ns * 1000 // rate
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(ns)
                out["duration_ms"].append(dur)
            yield pd.DataFrame(out)

    # a NULL payload is "no media": not decodable, not an error —
    # drop it JVM-side so the Arrow batch never sees None blobs
    return df.select("doc_id", content_col).filter(
        F.col(content_col).isNotNull()
    ).mapInPandas(
        decode, AUDIO_META_SCHEMA
    )


def resample_audio(
    df: DataFrame, content_col: str = "audio", every_k: int = 4
) -> DataFrame:
    """Decimating resample: keep every k-th 16-bit sample — the
    feature-extraction stage shape for audio (a real resampler would
    low-pass first; scipy/librosa are not in this container, so the
    kept-sample selection is the deterministic stand-in). numpy
    frombuffer per Arrow batch; output is (doc, out count, md5 of the
    resampled payload) to keep result rows narrow."""
    import hashlib

    import numpy as np

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_samples_out": [], "resampled_hash": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf[content_col]):
                b = bytes(blob)
                if b[:4] != AUDIO_MAGIC or len(b) < 8:
                    continue
                samples = np.frombuffer(b[8:], dtype=">u2")
                kept = samples[::every_k]
                out["doc_id"].append(doc_id)
                out["n_samples_out"].append(len(kept))
                out["resampled_hash"].append(
                    hashlib.md5(kept.astype(">u2").tobytes()).hexdigest()
                )
            yield pd.DataFrame(out)

    # a NULL payload is "no media": not decodable, not an error —
    # drop it JVM-side so the Arrow batch never sees None blobs
    return df.select("doc_id", content_col).filter(
        F.col(content_col).isNotNull()
    ).mapInPandas(
        resample, AUDIO_RESAMPLE_SCHEMA
    )


def image_ahash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """64-bit average-hash (aHash) perceptual fingerprint per image —
    the cheap visual-dedup signal (identical and near-identical
    payloads collide; a real pHash would DCT real pixels, which needs
    PIL — see decode_image_pixels — but the hashing pipeline shape is
    the same).

    The "pixel grid" is 64 evenly-spaced samples of the payload
    behind the 8-byte header; a sample's bit is 1 iff 64·sample >
    Σ samples — an INTEGER comparison, so the threshold is exact on
    any engine (no float mean). Bits pack into four 16-bit words
    rendered as a 16-hex-char string (a packed u64 would overflow
    signed BIGINT).

    Scale shape: pure JVM expressions over the binary column (substr
    + decode + ascii inside one projection) — hashing runs at scan
    speed with no Python worker at all, unlike the decode stages
    where per-payload parsing genuinely needs Arrow batches."""
    payload = F.expr(
        f"decode(substring({content_col}, 9, "
        f"length({content_col}) - 8), 'UTF-8')"
    )
    p = "_ah_payload"
    out = df.withColumn(p, payload)
    samples = (
        f"transform(sequence(0, 63), i -> ascii(substring({p}, "
        f"cast((i * length({p})) div 64 as int) + 1, 1)))"
    )
    # Spark SQL expressions have no local bindings — materialize the
    # sample array and its sum as columns instead of repeating the
    # subexpression 64 times.
    out = out.withColumn("_ah_s", F.expr(samples))
    out = out.withColumn(
        "_ah_tot", F.expr("aggregate(_ah_s, 0, (a, x) -> a + x)")
    )
    chunk = (
        "lpad(hex(aggregate(transform(sequence({lo}, {hi}), "
        "i -> IF(64 * element_at(_ah_s, i + 1) > _ah_tot, "
        "shiftleft(1, i - {lo}), 0)), 0, (a, x) -> a + x)), 4, '0')"
    )
    hash_expr = "concat(" + ", ".join(
        chunk.format(lo=j * 16, hi=j * 16 + 15) for j in range(4)
    ) + ")"
    return out.withColumn(
        "ahash",
        F.when(F.length(F.col(p)) == 0, F.lit("0000000000000000")).otherwise(
            F.expr(hash_expr)
        ),
    ).drop(p, "_ah_s", "_ah_tot")


def ahash_neardup_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "ahash",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Visually-near-duplicate pairs: aHash fingerprints within
    ``max_hamming`` bits, via banded blocking — the multimodal twin
    of the SimHash text path.

    Pigeonhole completeness: the 64-bit hash splits into ``n_bands``
    equal bands; hamming ≤ max_hamming < n_bands forces at least one
    band to match exactly, so joining on (band_idx, band_value)
    generates every qualifying pair (asserted). Candidates dedupe on
    narrow (id, id) rows, then verify with the exact per-chunk xor
    popcount. No all-pairs comparison anywhere; cost is Σ bucket²
    over band-value buckets, the banded-LSH contract — more bands
    widen the search radius but shrink band width (64/n_bands bits),
    growing buckets: radius 3 wants 4×16-bit bands, radius 7 the
    8×8-bit layout.

    ``max_band_freq`` (optional) drops band values shared by more
    than that many rows from candidate GENERATION — the max_df
    stop-shingle cap of the n-gram dedup path. It bounds the worst
    bucket at the cost of completeness for pairs reachable ONLY
    through a stop band (near-uniform fingerprints); verified pairs
    that do surface remain exact.

    Measured at the 125k-image probe (radius 3, 4 bands; r5): band
    frequencies are long-tailed — p50=2, p99=73, max=2026, with the
    top buckets all DEGENERATE values (0x0000, 0xAAAA, 0x5555: flat
    or periodic images), and Σ bucket² = 41M candidate rows, 6.2 s
    end-to-end. Capping at 2000 (~p99.97) saved 10% for a 0.3% pair
    loss; 500 saved 29% but lost 29% of pairs (the degenerate-image
    near-dups are REAL near-dups here). Default therefore stays
    ``None`` — at this shape the uncapped cost is inherent banded-LSH
    Σ bucket², not waste — but on corpora with heavy flat-image
    boilerplate set ``max_band_freq`` ≈ the p99.9 band frequency
    (≈ 50× the mean bucket) to bound the quadratic term; the
    degenerate buckets are exactly where Σ bucket² turns O(N²) at
    cluster scale."""
    assert n_bands in (2, 4, 8, 16) and max_hamming < n_bands
    w = 16 // n_bands  # hex chars per band
    # materialize the narrow (id, hash) signature table: the hash is
    # usually a LARGE expression (image_ahash is ~70 HOF nodes), and
    # this operator consumes it from five projections — without a
    # cache boundary Catalyst inlines the full expression into every
    # band/verify reference and planning+eval time explodes (measured
    # 132 s -> 1.9 s at sf0.01; same discipline as dedup.py's cached
    # shingle tables)
    # ... and decode the hex ONCE here: the four 16-bit verify chunks
    # become long columns of the cached table, so the per-candidate
    # popcount downstream is pure long xor+bit_count — conv(substring)
    # per CANDIDATE row was the hot loop (3.3M candidates x 16 string
    # decodes cost ~6 s at sf0.1; longs are nanoseconds)
    hashed = hashed.select(
        id_col,
        hash_col,
        *[
            F.conv(F.substring(F.col(hash_col), j * 4 + 1, 4), 16, 10)
            .cast("long")
            .alias(f"_q{j}")
            for j in range(4)
        ],
    ).cache()
    chunks = hashed.select(
        F.col(id_col).alias("_id"),
        *[F.col(f"_q{j}") for j in range(4)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.conv(
                            F.substring(F.col(hash_col), j * w + 1, w), 16, 10
                        ).cast("long").alias("v"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("_c"),
    ).select(
        "_id",
        *[f"_q{j}" for j in range(4)],
        F.col("_c.j").alias("_j"),
        F.col("_c.v").alias("_v"),
    )
    if max_band_freq is not None:
        keep = (
            chunks.groupBy("_j", "_v")
            .count()
            .filter(F.col("count") <= max_band_freq)
            .select("_j", "_v")
        )
        chunks = chunks.join(F.broadcast(keep), ["_j", "_v"])
    # verify BEFORE distinct: both sides of the band join carry the
    # pre-decoded 16-bit verify chunks, so the exact popcount runs
    # inside the join's codegen stage over the raw candidate stream
    # (long xor+bit_count only) and only TRUE pairs reach the dedup
    # shuffle. The previous shape
    # (distinct on candidates, then two joins back to the signature
    # table) shuffled the entire sum-of-bucket^2 candidate set —
    # 3.3M rows for 5k images at radius 7's 8-bit bands (only 256
    # bucket values), 4.2 s of the query's 3.2 s wall; filtering
    # first cuts the distinct input to the answer size (~120 rows)
    # and deletes both re-join stages. Results are bit-identical:
    # the popcount per pair does not depend on which band matched.
    dist = sum(
        F.bit_count(
            F.col(f"_q{j}").bitwiseXOR(F.col(f"_r{j}"))
        )
        for j in range(4)
    )
    return (
        chunks.alias("a")
        .join(
            chunks.select(
                F.col("_id").alias("_id2"),
                *[F.col(f"_q{j}").alias(f"_r{j}") for j in range(4)],
                "_j",
                F.col("_v").alias("_v2"),
            ).alias("b"),
            (F.col("a._j") == F.col("b._j")) & (F.col("a._v") == F.col("_v2")),
        )
        .filter(F.col("_id") < F.col("_id2"))
        .withColumn("_d", dist.cast("int"))
        .filter(F.col("_d") <= max_hamming)
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id2").alias("id_b"),
            F.col("_d").alias("hamming"),
        )
        .distinct()
    )


def storage_budget(
    df: DataFrame,
    content_col: str = "content",
    group_col: str = "source",
) -> DataFrame:
    """Per-source storage budget of a binary media column: object
    count, total/max bytes, and the EXACT p95 object size — the
    capacity-planning pass before shipping a multimodal corpus
    (which sources blow the blob store, where the long tail is).

    Byte sizes are integers, so p95 is exact via the value-domain
    histogram (:func:`analytics._int_value_quantiles` — windows over
    distinct sizes per source, never raw rows); count/sum/max are
    one map-side-combined aggregate.
    """
    from vectorsearchutil_spark.operators.analytics import (
        _int_value_quantiles,
    )

    sized = df.select(
        F.col(group_col).alias("source"),
        F.length(F.col(content_col)).cast("long").alias("_bytes"),
    )
    base = sized.groupBy("source").agg(
        F.sum("_bytes").alias("total_bytes"),
        F.max("_bytes").alias("max_bytes"),
    )
    p95 = _int_value_quantiles(
        sized, "source", "_bytes", [0.95], ["p95_bytes"]
    )
    return (
        base.join(p95, "source")
        .select(
            "source",
            F.col("n").alias("n_objects"),
            "total_bytes",
            F.col("p95_bytes").cast("long").alias("p95_bytes"),
            "max_bytes",
        )
    )
