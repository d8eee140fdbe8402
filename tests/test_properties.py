"""Property-based checks (hypothesis): the JVM-side vector math must
agree with numpy on arbitrary finite inputs, and store dedup must
agree with the reference's pandas semantics
(pd.concat().drop_duplicates(subset='target'), VectorSearchBase.py:124).

Spark job dispatch is slow, so each property batches all generated
cases into ONE DataFrame per example run.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from vectorsearchutil_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_distance,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
vec_pair = st.integers(min_value=2, max_value=16).flatmap(
    lambda d: st.tuples(
        st.lists(finite, min_size=d, max_size=d),
        st.lists(finite, min_size=d, max_size=d),
    )
)


@settings(max_examples=5, deadline=None)
@given(st.lists(vec_pair, min_size=1, max_size=20))
def test_vector_math_matches_numpy(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["id", "a", "b"]
    )
    rows = df.select(
        "id",
        dot("a", "b").alias("dot"),
        l2_distance("a", "b").alias("l2"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()
    for r in rows:
        a = np.array(pairs[r["id"]][0])
        b = np.array(pairs[r["id"]][1])
        assert r["dot"] == pytest.approx(float(a @ b), rel=1e-9, abs=1e-6)
        assert r["l2"] == pytest.approx(
            float(np.linalg.norm(a - b)), rel=1e-9, abs=1e-6
        )
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-12 and nb > 1e-12:
            assert r["cos"] == pytest.approx(
                float(a @ b / (na * nb)), rel=1e-6, abs=1e-6
            )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdef"), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_first_wins_dedup_matches_pandas(spark, rows):
    import pandas as pd

    from vectorsearchutil_spark.store import VectorStore

    pdf = pd.DataFrame(rows, columns=["target", "val"])
    expected = (
        pdf.drop_duplicates(subset="target")  # keep-first, reference :124
        .set_index("target")["val"]
        .to_dict()
    )
    vs = VectorStore(spark)
    vs.set_data(
        spark.createDataFrame(
            [(t, str(v)) for t, v in rows], ["target", "option1"]
        )
    )
    got = {r["target"]: int(r["option1"]) for r in vs.data.collect()}
    assert got == expected
