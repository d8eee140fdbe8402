"""Optional real-encoder smoke tests (VERDICT r2 #7 / reference
A11-A14). The heavy model deps (torch/transformers/open_clip/PIL) are
NOT installed in this environment, so these skip cleanly here; where
the deps exist they exercise the actual encoder wrappers end-to-end
through the same pandas_udf path the hash64 stub uses.

Registration behavior WITHOUT the deps is asserted unconditionally:
the registry must hold only the stub and never raise at import.
"""

from __future__ import annotations

import pytest

from vectorsearchutil_spark import embedders as E


def _has(*mods: str) -> bool:
    import importlib.util

    return all(importlib.util.find_spec(m) is not None for m in mods)


def test_registry_degrades_cleanly_without_heavy_deps():
    names = E.embedder_names()
    assert "hash64" in names
    if not _has("torch", "transformers"):
        assert "e5-small" not in names
        assert "efficientnet-b0" not in names
    if not _has("torch", "open_clip", "PIL"):
        assert "clip-vit-b32" not in names


def test_sub_udf_falls_back_to_main(spark):
    # single-modality embedders use the main encoder for labels
    df = spark.createDataFrame([("hello",)], ["t"])
    import pyspark.sql.functions as F

    a = df.select(E.embed_udf("hash64")(F.col("t")).alias("v")).first()[0]
    b = df.select(E.embed_sub_udf("hash64")(F.col("t")).alias("v")).first()[0]
    assert a == b


@pytest.mark.skipif(
    not _has("torch", "transformers"), reason="transformers/torch absent"
)
def test_e5_smoke(spark):  # pragma: no cover - optional heavy path
    """A11: 384-dim mean-pooled embeddings through the UDF path."""
    import pyspark.sql.functions as F

    assert E.embedding_dim("e5-small") == 384
    df = spark.createDataFrame([("pigeon ecology",), ("dog training",)], ["t"])
    out = df.select(E.embed_udf("e5-small")(F.col("t")).alias("v")).collect()
    assert all(len(r["v"]) == 384 for r in out)
    assert out[0]["v"] != out[1]["v"]


@pytest.mark.skipif(
    not _has("torch", "open_clip", "PIL"), reason="open_clip absent"
)
def test_clip_smoke(spark, tmp_path):  # pragma: no cover - optional
    """A12/A13: image tower embeds paths, text tower embeds labels,
    both unit-norm, 512-dim."""
    import math

    import pyspark.sql.functions as F
    from PIL import Image

    p = str(tmp_path / "img.png")
    Image.new("RGB", (32, 32), (200, 30, 30)).save(p)
    assert E.embedding_dim("clip-vit-b32") == 512
    img_v = (
        spark.createDataFrame([(p,)], ["t"])
        .select(E.embed_udf("clip-vit-b32")(F.col("t")).alias("v"))
        .first()[0]
    )
    lab_v = (
        spark.createDataFrame([("a red square",)], ["t"])
        .select(E.embed_sub_udf("clip-vit-b32")(F.col("t")).alias("v"))
        .first()[0]
    )
    for v in (img_v, lab_v):
        assert len(v) == 512
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3


@pytest.mark.skipif(
    not _has("torch", "transformers", "PIL"), reason="transformers absent"
)
def test_efficientnet_smoke(spark, tmp_path):  # pragma: no cover
    """A14: 1280-dim spatial-mean features; zero-shot disabled (A10)."""
    import pyspark.sql.functions as F
    from PIL import Image

    p = str(tmp_path / "img.png")
    Image.new("L", (32, 32), 128).save(p)  # grayscale -> RGB convert path
    assert E.embedding_dim("efficientnet-b0") == 1280
    assert not E.supports_zeroshot("efficientnet-b0")
    v = (
        spark.createDataFrame([(p,)], ["t"])
        .select(E.embed_udf("efficientnet-b0")(F.col("t")).alias("v"))
        .first()[0]
    )
    assert len(v) == 1280
