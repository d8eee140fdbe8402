"""Profile one or more headline queries at sf0.1: wall-clock each,
optionally repeated, printing per-run times (first run = cold plan,
later runs = warm). Usage: python tools/profile_query.py name [name...]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from vectorsearchutil_spark import queries as Q
    from vectorsearchutil_spark.session import get_spark

    names = sys.argv[1:] or ["kmeans_clusters"]
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()  # warm

    for name in names:
        fn = Q.QUERIES[name]
        times = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: cold={times[0]} warm={times[1]}")


if __name__ == "__main__":
    main()
