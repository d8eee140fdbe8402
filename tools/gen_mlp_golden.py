"""Regenerate the committed MLP golden contract
(vectorsearchutil_spark/mlp_golden.json).

The MLP fits are seeded and deterministic (verified across separate
processes), but not SQL-expressible, so the driver's oracle check
cannot hash-match them. Instead the QUERIES THEMSELVES assert against
this golden file (held-out metric + md5 of the sorted prediction
rows) whenever they run at a scale factor recorded here — a failed
contract raises, which the driver records as a red row. That turns
the driver's rows-only check into a real correctness gate.

Usage: python tools/gen_mlp_golden.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "vectorsearchutil_spark", "mlp_golden.json")
DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> None:
    from vectorsearchutil_spark import queries as Q
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("mlp-golden")
    spark.sparkContext.setLogLevel("ERROR")
    golden: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            golden = json.load(fh)
    for sf_dir in sys.argv[1:] or DEFAULT_SFS:
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        golden.setdefault(sf_key, {})
        os.environ["VSU_SKIP_MLP_GOLDEN"] = "1"
        for name in ("mlp_classifier_predictions", "mlp_regressor_predictions"):
            # the query must NOT self-assert while we regenerate the
            # values it asserts against
            df = Q.QUERIES[name](spark, sf_dir)
            rows = sorted(tuple(r) for r in df.collect())
            digest = hashlib.md5(
                "\n".join(map(str, rows)).encode()
            ).hexdigest()
            golden[sf_key][name] = {"rows": len(rows), "md5": digest}
            print(sf_key, name, len(rows), digest)
    with open(OUT, "w") as fh:
        json.dump(golden, fh, indent=2, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
