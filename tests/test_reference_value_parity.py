"""VALUE parity against the reference implementation, executed for real.

The reference at /root/reference runs in a subprocess with pure-Python shims
for its unavailable dependencies (tests/refshims/: jellyfish, anytree, pulp,
ot, nltk, chardet — each shim documents its exact substitution contract and
shares primitives with the engine where an independent verification of the
primitive exists).  Its matcher outputs on its own fixture pair are pinned in
tests/golden/reference_golden.json; this module asserts

  1. the committed golden file is REPRODUCIBLE (subprocess re-run, exact) —
     so the oracle is live, not a stale snapshot; and
  2. the engine's matchers produce per-pair-IDENTICAL similarities (fp
     tolerance) on the same fixtures — BASELINE.md row 3's "reproduce
     reference matcher outputs on its pytest suite", measured not asserted.
"""

import json
import math
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
REF_DATA = "/root/reference/tests/data"
GOLDEN = REPO / "tests" / "golden" / "reference_golden.json"
TOL = 1e-9

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference checkout not present"
)


def _load_golden():
    raw = json.loads(GOLDEN.read_text())
    return {
        name: {((r[0], r[1]), (r[2], r[3])): r[4] for r in rows}
        for name, rows in raw.items()
    }


@pytest.fixture(scope="module")
def golden():
    return _load_golden()


@pytest.fixture(scope="module")
def ref_frames(spark):
    df1 = pd.read_csv(os.path.join(REF_DATA, "authors1.csv"))
    df2 = pd.read_csv(os.path.join(REF_DATA, "authors2.csv"))
    return spark.createDataFrame(df1), spark.createDataFrame(df2)


def _engine_matches(spark_frames, matcher) -> dict:
    import valentine_spark as V

    res = V.valentine_match(spark_frames[0], spark_frames[1], matcher,
                            "authors1", "authors2")
    return dict(res)


def _assert_same(engine: dict, reference: dict, label: str):
    only_engine = set(engine) - set(reference)
    only_ref = set(reference) - set(engine)
    assert not only_engine and not only_ref, (
        f"{label}: pair sets differ — engine-only={sorted(only_engine)} "
        f"reference-only={sorted(only_ref)}"
    )
    for k, v_ref in reference.items():
        assert math.isclose(engine[k], v_ref, rel_tol=TOL, abs_tol=TOL), (
            f"{label}: similarity drift at {k}: engine={engine[k]!r} "
            f"reference={v_ref!r}"
        )


def test_golden_file_reproducible():
    """Re-run the reference under the shims; byte-identical JSON proves the
    pinned oracle is deterministic and current."""
    with tempfile.TemporaryDirectory() as tmp:
        out = Path(tmp) / "regen.json"
        subprocess.run(
            [sys.executable, str(REPO / "tests" / "golden" / "gen_reference_golden.py"), str(out)],
            check=True, capture_output=True, timeout=600,
        )
        assert json.loads(out.read_text()) == json.loads(GOLDEN.read_text())


def test_reference_own_pytest_suite_passes():
    """BASELINE.md row 3 verbatim: the reference's OWN pytest suite runs
    green (under the dependency shims), `python -m pytest -x -q`.  Only
    test_coma is deselected — the Coma jar is absent from the reference
    checkout itself (.MISSING_LARGE_BLOBS), so it cannot pass upstream
    either."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO / "tests" / "refshims"), "/root/reference", str(REPO)]
    )
    env["PYTHONDONTWRITEBYTECODE"] = "1"  # /root/reference is read-only
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q",
         "-p", "no:cacheprovider",
         "--deselect", "tests/test_algorithms.py::test_coma"],
        cwd="/root/reference", env=env, capture_output=True, text=True, timeout=570,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]


@pytest.mark.parametrize("dist", ["Exact", "Levenshtein", "DamerauLevenshtein",
                                  "Hamming", "Jaro", "JaroWinkler"])
def test_jaccard_value_parity(golden, ref_frames, dist):
    import valentine_spark as V

    matcher = V.JaccardDistanceMatcher(distance_fun=getattr(V.StringDistanceFunction, dist))
    _assert_same(_engine_matches(ref_frames, matcher),
                 golden[f"jaccard_{dist.lower()}"], f"jaccard_{dist}")


def test_jaccard_threshold_05_value_parity(golden, ref_frames):
    import valentine_spark as V

    matcher = V.JaccardDistanceMatcher(threshold_dist=0.5)
    _assert_same(_engine_matches(ref_frames, matcher),
                 golden["jaccard_levenshtein_t05"], "jaccard_levenshtein_t05")


def test_distribution_based_value_parity(golden, ref_frames):
    import valentine_spark as V

    _assert_same(_engine_matches(ref_frames, V.DistributionBased()),
                 golden["distribution_based"], "distribution_based")


def test_similarity_flooding_value_parity(golden, ref_frames):
    import valentine_spark as V

    _assert_same(_engine_matches(ref_frames, V.SimilarityFlooding()),
                 golden["similarity_flooding"], "similarity_flooding")


def test_cupid_value_parity(golden, ref_frames):
    import valentine_spark as V

    _assert_same(_engine_matches(ref_frames, V.Cupid()),
                 golden["cupid"], "cupid")
