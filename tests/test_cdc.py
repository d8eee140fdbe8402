from vectorsearchutil_spark.operators.cdc import cdc_apply


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, bal double",
    )


def test_cdc_apply_all_verdicts(spark):
    changes = spark.createDataFrame(
        [
            (2, 1, "upsert", "b2", 21.0),
            (3, 1, "delete", None, None),
            (4, 1, "upsert", "d", 40.0),    # brand-new id
            (2, 2, "upsert", "b3", 22.0),   # supersedes seq 1
        ],
        "id int, seq int, op string, name string, bal double",
    )
    got = sorted(tuple(r) for r in cdc_apply(_snap(spark), changes, "id").collect())
    assert got == [(1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0)]


def test_cdc_delete_supersedes_earlier_upsert(spark):
    changes = spark.createDataFrame(
        [(1, 1, "upsert", "a2", 11.0), (1, 2, "delete", None, None)],
        "id int, seq int, op string, name string, bal double",
    )
    got = sorted(r["id"] for r in cdc_apply(_snap(spark), changes, "id").collect())
    assert got == [2, 3]


def test_cdc_empty_changes_is_identity(spark):
    changes = spark.createDataFrame(
        [], "id int, seq int, op string, name string, bal double"
    )
    got = sorted(tuple(r) for r in cdc_apply(_snap(spark), changes, "id").collect())
    assert got == sorted(tuple(r) for r in _snap(spark).collect())


def test_cdc_partition_invariant(spark):
    changes = spark.createDataFrame(
        [(i % 5, i, "upsert" if i % 3 else "delete", f"n{i}", float(i))
         for i in range(40)],
        "id int, seq int, op string, name string, bal double",
    )
    a = sorted(tuple(r) for r in cdc_apply(_snap(spark), changes, "id").collect())
    b = sorted(
        tuple(r)
        for r in cdc_apply(
            _snap(spark).repartition(8), changes.repartition(16), "id"
        ).collect()
    )
    assert a == b


def test_cdc_batchwise_composability(spark):
    """Applying a changelog in two sequential batches equals applying
    the concatenated changelog once — the property that makes daily
    incremental merges equivalent to a full-history replay."""
    import random

    rng = random.Random(5)
    rows = [
        (rng.randint(0, 6), seq, rng.choice(["upsert", "upsert", "delete"]),
         f"n{seq}", float(seq))
        for seq in range(1, 60)
    ]
    schema = "id int, seq int, op string, name string, bal double"
    half = len(rows) // 2
    b1 = spark.createDataFrame(rows[:half], schema)
    b2 = spark.createDataFrame(rows[half:], schema)
    both = spark.createDataFrame(rows, schema)

    snap = _snap(spark)
    stepwise = cdc_apply(cdc_apply(snap, b1, "id"), b2, "id")
    oneshot = cdc_apply(snap, both, "id")
    assert sorted(map(tuple, stepwise.collect())) == sorted(
        map(tuple, oneshot.collect())
    )
