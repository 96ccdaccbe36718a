"""Execute the REFERENCE matchers (/root/reference, under the documented
pure-Python shims in tests/refshims/) on the driver's drifted-customer
fixture and dump their match tables as JSON.

This powers the driver-facing DuckDB oracle for the three iterative matcher
queries (``matcher_distribution_based``, ``matcher_cupid``,
``matcher_similarity_flooding`` in ``__spark_entry__.py``): the reference's
own executed output becomes a ``VALUES`` literal, so the driver's
rows+schema+hash check now covers the full iterative pipelines too — the
oracle is the reference itself, not the engine (no circularity).

The fixture mirrors ``__spark_entry__._drifted_customer`` exactly: the sf
customer table joined against itself with three columns renamed
(c_name→customer_name, c_acctbal→account_balance, c_mktsegment→segment).
Cupid and SimilarityFlooding are schema-only (sf-independent);
DistributionBased is instance-based, so the JSON is tied to the sf dir it
was generated from (committed: sf0.01, the driver's comparison scale).

Run standalone:

    python tests/golden/gen_matcher_oracle.py [out.json] [sf_dir]

``tests/test_matcher_oracles.py`` re-runs this in a subprocess and asserts
the committed golden is reproducible (live oracle, not a stale snapshot),
and ``__spark_entry__.oracle_sql`` regenerates it live with the committed
file as fallback.
"""

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent.parent
REFERENCE = Path("/root/reference")
SHIMS = REPO / "tests" / "refshims"

DEFAULT_SF_DIR = "/root/testdata/sf0.01"

# mirrors __spark_entry__._drifted_customer
DRIFT_RENAMES = {
    "c_name": "customer_name",
    "c_acctbal": "account_balance",
    "c_mktsegment": "segment",
}


def main(out_path: str, sf_dir: str) -> None:
    # order matters: reference package first (the repo root also has a
    # `valentine` compat shim that must NOT win), then the dependency shims,
    # then the repo root (the shims import valentine_spark.functions).
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(SHIMS))
    sys.path.insert(0, str(REFERENCE))
    for mod in [m for m in sys.modules if m == "valentine" or m.startswith("valentine.")]:
        del sys.modules[mod]

    import pandas as pd

    from valentine import valentine_match
    from valentine.algorithms import Cupid, DistributionBased, SimilarityFlooding

    import valentine as _v
    assert str(REFERENCE) in _v.__file__, f"wrong valentine imported: {_v.__file__}"

    cust = pd.read_parquet(Path(sf_dir) / "customer.parquet")
    drifted = cust.rename(columns=DRIFT_RENAMES)

    results = {"sf_dir": sf_dir}

    def run(name, matcher):
        res = valentine_match(cust, drifted, matcher, "customer", "drifted")
        # [s_col, t_col, sim] — the driver query's output shape
        results[name] = sorted(
            [[k[0][1], k[1][1], float(v)] for k, v in res.items()]
        )

    run("matcher_distribution_based", DistributionBased())
    run("matcher_cupid", Cupid())
    run("matcher_similarity_flooding", SimilarityFlooding())

    Path(out_path).write_text(json.dumps(results, indent=1, sort_keys=True))
    print(f"wrote {out_path}: " + ", ".join(
        f"{k}={len(v)}" for k, v in sorted(results.items()) if k != "sf_dir"))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else str(HERE / "matcher_oracle.json")
    sf = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SF_DIR
    main(out, sf)
