"""Execute the REFERENCE implementation (/root/reference, delftdata/valentine)
in-process under the pure-Python dependency shims in tests/refshims/ and dump
its matcher outputs on its own fixture pair (tests/data/authors{1,2}.csv) as
JSON.  This is the value-parity oracle demanded by BASELINE.md row 3
("reproduce reference matcher outputs on its pytest suite"): the reference's
OWN code runs, with only its unavailable C/binary-data deps (jellyfish, nltk
data, anytree, pulp+CBC, POT, chardet) replaced by documented pure-Python
equivalents — see each shim's docstring for the exact substitution contract.

Run standalone (writes reference_golden.json next to this file):

    python tests/golden/gen_reference_golden.py [out.json]

The parity test (tests/test_reference_value_parity.py) runs this in a
subprocess and compares per-pair similarities against the committed golden
file AND against the engine's own matcher outputs.
"""

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent.parent
REFERENCE = Path("/root/reference")
SHIMS = REPO / "tests" / "refshims"


def main(out_path: str) -> None:
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
    from valentine.algorithms import (
        Cupid,
        DistributionBased,
        JaccardDistanceMatcher,
        SimilarityFlooding,
    )
    from valentine.algorithms.jaccard_distance import StringDistanceFunction

    import valentine as _v
    assert str(REFERENCE) in _v.__file__, f"wrong valentine imported: {_v.__file__}"

    df1 = pd.read_csv(REFERENCE / "tests" / "data" / "authors1.csv")
    df2 = pd.read_csv(REFERENCE / "tests" / "data" / "authors2.csv")

    results = {}

    def run(name, matcher):
        res = valentine_match(df1, df2, matcher, "authors1", "authors2")
        results[name] = sorted(
            [[k[0][0], k[0][1], k[1][0], k[1][1], float(v)] for k, v in res.items()]
        )

    for dist in ["Exact", "Levenshtein", "DamerauLevenshtein", "Hamming",
                 "Jaro", "JaroWinkler"]:
        run(f"jaccard_{dist.lower()}",
            JaccardDistanceMatcher(distance_fun=getattr(StringDistanceFunction, dist)))
    # lower threshold variant exercised by the reference's own parametrized test
    run("jaccard_levenshtein_t05", JaccardDistanceMatcher(threshold_dist=0.5))
    run("distribution_based", DistributionBased())
    run("similarity_flooding", SimilarityFlooding())
    run("cupid", Cupid())

    Path(out_path).write_text(json.dumps(results, indent=1, sort_keys=True))
    print(f"wrote {out_path}: " + ", ".join(f"{k}={len(v)}" for k, v in sorted(results.items())))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else str(HERE / "reference_golden.json"))
