"""Regenerate the committed full-row MLP prediction golden
(vectorsearchutil_spark/mlp_pred_golden.json).

VERDICT r9 "Next round" #4: `mlp_classifier_predictions` /
`mlp_regressor_predictions` were the registry's only permanently
`no_oracle` rows — the seeded fits are deterministic (proven since
round 4 by the mlp_*_golden digest gates) but not SQL-recomputable.
This tool captures the full 500-row prediction frames at sf0.01 (the
driver's comparison scale) so queries.py can serve them back as a
constant `VALUES` oracle: the driver's hash check then certifies the
live fit reproduces every committed row, per cell, not just a digest.

Only sf0.01 is recorded — the same single-scale contract as
mlp_golden.json (`_mlp_golden_oracle`): the driver and the
full-registry self-check both compare at sf0.01; pending-lane
multi-scale evidence does not apply to these two veterans.

Usage: python tools/gen_mlp_pred_oracle.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "vectorsearchutil_spark", "mlp_pred_golden.json")
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from vectorsearchutil_spark import queries as Q
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("mlp-pred-golden")
    spark.sparkContext.setLogLevel("ERROR")
    golden: dict[str, dict] = {"sf0.01": {}}
    for name in ("mlp_classifier_predictions", "mlp_regressor_predictions"):
        df = Q.QUERIES[name](spark, SF_DIR)
        cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        rows = sorted(tuple(r) for r in df.collect())
        golden["sf0.01"][name] = {
            "columns": cols,
            # floats via repr (shortest round-trip string — DuckDB's
            # strtod parses it back to the identical double bits)
            "rows": [
                [repr(c) if isinstance(c, float) else c for c in row]
                for row in rows
            ],
        }
        print(name, len(rows), cols)
    with open(OUT, "w") as fh:
        json.dump(golden, fh, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
