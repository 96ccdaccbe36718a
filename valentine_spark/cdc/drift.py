"""Schema-drift resolution: the Valentine matchers embedded in the ingest
path (the north_star's schema-evolution subsystem).

When an incoming batch carries payload columns the target table does not know
(renames like content->source_text, or genuinely new columns), a cascade of
Valentine matchers maps them onto the target's unmatched columns, each stage
over a bounded sample (matcher cost is O(sample), independent of batch size):

  1. **instance overlap** — JaccardDistanceMatcher(Exact): catches renames of
     key-like / categorical columns whose values recur across batches;
  2. **name similarity** — Cupid's linguistic leaf match: catches
     lang->language style renames even with disjoint values;
  3. **distribution shape** — DistributionBased phase-1 quantile-EMD
     (``get_pairwise_similarities``): catches renamed free-text/metric
     columns whose value sets are disjoint but identically distributed,
     gated by lattice-type equality.

Each stage runs one_to_one assignment; accepted mappings rename the batch
columns and are recorded (with the stage that decided them) in the commit
lineage.  Remaining unknown columns trigger additive schema evolution.
A custom ``matcher`` argument replaces the cascade entirely.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..results import MatcherResults
from ..types import lattice_types
from .generator import KEY_COLS

META_COLS = ["lsn", "op_ts", "op"]


def _assign(raw: dict, extra: List[str], missing: List[str], threshold: float) -> Dict[str, str]:
    results = MatcherResults(raw).one_to_one()
    out = {}
    for (src, tgt), sim in results.items():
        if sim >= threshold and src[1] in extra and tgt[1] in missing:
            out[src[1]] = tgt[1]
    return out


def match_drifted_columns(
    batch_payload: DataFrame,
    target_payload: DataFrame,
    extra: List[str],
    missing: List[str],
    jaccard_threshold: float = 0.5,
    name_threshold: float = 0.55,
    emd_threshold: float = 0.85,
    floor: float = 0.0,
) -> Tuple[Dict[str, str], Dict[str, str]]:
    """Returns ({batch_col: target_col}, {batch_col: deciding_stage}).

    ``floor`` raises every stage's acceptance threshold to at least that
    similarity — the conduit for ``resolve_drift(threshold=...)`` /
    ``apply_batch(drift_threshold=...)``, which would otherwise have no
    effect on the default cascade (each stage keeps its own calibrated
    default when the floor is lower)."""
    from ..matchers import Cupid, DistributionBased, JaccardDistanceMatcher, StringDistanceFunction

    jaccard_threshold = max(jaccard_threshold, floor)
    name_threshold = max(name_threshold, floor)
    emd_threshold = max(emd_threshold, floor)

    mapping: Dict[str, str] = {}
    stages: Dict[str, str] = {}

    def remaining():
        ex = [c for c in extra if c not in mapping]
        mi = [c for c in missing if c not in mapping.values()]
        return ex, mi

    # stage 1: exact instance overlap
    ex, mi = remaining()
    if ex and mi:
        raw = JaccardDistanceMatcher(
            distance_fun=StringDistanceFunction.Exact
        ).get_matches(batch_payload.select(*ex), target_payload.select(*mi), "batch", "target")
        for src, tgt in _assign(raw, ex, mi, jaccard_threshold).items():
            mapping[src], stages[src] = tgt, "jaccard_exact"

    # stage 2: linguistic name similarity (schema-only, driver-side)
    ex, mi = remaining()
    if ex and mi:
        raw = Cupid(th_accept=0.0).get_matches(
            batch_payload.select(*ex), target_payload.select(*mi), "batch", "target"
        )
        for src, tgt in _assign(raw, ex, mi, name_threshold).items():
            mapping[src], stages[src] = tgt, "cupid_name"

    # stage 3: distribution shape (quantile-EMD), same lattice type only
    ex, mi = remaining()
    if ex and mi:
        b_types = lattice_types(batch_payload.select(*ex))
        t_types = lattice_types(target_payload.select(*mi))
        raw = DistributionBased().get_pairwise_similarities(
            batch_payload.select(*ex), target_payload.select(*mi), "batch", "target"
        )
        typed = {
            k: v for k, v in raw.items() if b_types.get(k[0][1]) == t_types.get(k[1][1])
        }
        for src, tgt in _assign(typed, ex, mi, emd_threshold).items():
            mapping[src], stages[src] = tgt, "distribution_emd"

    return mapping, stages


def _widen_drifted_types(events: DataFrame, lake) -> Dict[str, T.DataType]:
    """Type drift: when a batch column (renamed or same-named) arrives WIDER
    than the target in a lossless promotion (upstream ALTER COLUMN TYPE,
    e.g. stars int -> bigint), widen the lake schema — downcasting the
    batch would overflow at ingest.  Metadata-only; reads cast old files
    up by type-log era (``LakeTable.widen_column``).  Returns the lake's
    post-widen name->type map."""
    from .lake import _is_widening

    lake_types = {f.name: f.dataType for f in lake.schema.fields}
    for c in events.columns:
        if c not in lake_types:
            continue
        b_type = events.schema[c].dataType
        if b_type != lake_types[c] and _is_widening(lake_types[c], b_type):
            lake.widen_column(c, b_type, note="auto-widened from drifted batch type")
            lake_types[c] = b_type
    return lake_types


def resolve_drift(
    events: DataFrame,
    lake,
    matcher=None,
    threshold: float = 0.5,
    sample_rows: int = 500,
) -> Tuple[DataFrame, Dict[str, str], Dict[str, str]]:
    """Returns (events with drifted columns renamed, {batch_col: target_col},
    {batch_col: deciding_stage}).  Evolves the lake schema additively for
    unmapped extra columns."""
    target_payload_cols = [f.name for f in lake.schema.fields if f.name not in KEY_COLS]
    known = set(META_COLS) | set(KEY_COLS) | set(target_payload_cols)
    extra = [c for c in events.columns if c not in known]
    if not extra:
        _widen_drifted_types(events, lake)
        return events, {}, {}

    missing = [c for c in target_payload_cols if c not in events.columns]
    mapping: Dict[str, str] = {}
    stages: Dict[str, str] = {}

    if missing:
        batch_sample = events.where(F.col("op") != "delete").select(*extra).limit(sample_rows)
        target_sample = lake.read().select(*missing).limit(sample_rows)
        if matcher is not None:
            raw = matcher.get_matches(batch_sample, target_sample, "batch", "target")
            mapping = _assign(raw, extra, missing, threshold)
            stages = {c: type(matcher).__name__ for c in mapping}
        else:
            mapping, stages = match_drifted_columns(
                batch_sample, target_sample, extra, missing, floor=threshold
            )

    renamed = events
    for src_col, tgt_col in mapping.items():
        renamed = renamed.withColumnRenamed(src_col, tgt_col)
    lake_types = _widen_drifted_types(renamed, lake)
    # an accepted rename maps the batch column onto the TARGET's type
    # contract: the merge path writes payload columns uncast, so a
    # wrong-typed drifted column (lang_code:int -> language:string) would
    # land int physical data in a string-schema'd file and break every
    # later scan.  Cast renamed columns to the target type — ANSI mode
    # makes an incompatible value a loud error at ingest, not a corrupt
    # file discovered at read.
    for tgt_col in mapping.values():
        if renamed.schema[tgt_col].dataType != lake_types[tgt_col]:
            renamed = renamed.withColumn(
                tgt_col, F.col(tgt_col).cast(lake_types[tgt_col])
            )

    unmapped = [c for c in extra if c not in mapping]
    if unmapped:
        # evolve with the batch's ACTUAL Spark types — re-parsing dtype
        # strings through a lookup table silently mapped anything exotic
        # (decimal, smallint, arrays) to string, writing files whose
        # physical type contradicted the evolved schema
        lake.evolve_schema(
            [T.StructField(c, renamed.schema[c].dataType) for c in unmapped],
            note=f"auto-evolved from drifted batch columns: {unmapped}",
        )
    return renamed, mapping, stages
