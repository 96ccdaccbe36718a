"""Cupid matcher (Madhavan et al., VLDB 2001) — schema-only, driver-side.

Operates purely on column NAMES and lattice data types (never instance data),
so it runs on the driver over O(#columns²) pairs (SURVEY.md G8-G9).

Reference semantics (``/root/reference/valentine/algorithms/cupid/``):
  * name normalization: tokenize, split camelCase/snake_case, classify as
    SYMBOLS (weight 0) / NUMBER (0.1) / COMMON stopwords (0.1) / CONTENT
    (0.8) (linguistic_matching.py:22-65, schema_element.py:71-87);
  * token similarity: 1.0 on equal data, else WordNet Wu-Palmer with a
    normalized-Levenshtein fallback (linguistic_matching.py:160-217).  The
    Wu-Palmer path runs over the bundled wordnet-lite taxonomy
    (``functions/wordnet_lite.py`` — dictionary words like price~cost score
    semantically); tokens outside its vocabulary (identifier fragments)
    take the Levenshtein fallback, mirroring the reference's nan path;
  * lsim(s, t) = name_similarity_elements(s, t) * max datatype
    compatibility, computed only for pairs passing the th_ns gate
    (linguistic_matching.py:104-141);
  * leaf wsim = leaf_w_struct * compat(s.type, t.type) + (1-leaf_w_struct)
    * lsim (tree_match.py:16-24);
  * output: leaf pairs with wsim >= th_accept, sorted descending
    (tree_match.py:109-120).

Parity note on the structural phase: in the reference, ``tree_match``'s
post-order structural walk and ``recompute_wsim`` skip EVERY node, because
all tree nodes are ``SchemaElement`` instances and the loop's
``isinstance(s, SchemaElement): continue`` guard therefore always fires
(tree_match.py:38-41, 89-92).  Moreover the ssim boost/damp only mutates
'ssim', never 'wsim', and only leaf 'wsim' reaches the output — so the
structural machinery cannot influence results even if it ran.  The effective
reference algorithm IS the leaf-level linguistic match implemented here; the
structural helpers are kept (compute_ssim) for completeness and tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from itertools import combinations_with_replacement
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame

from ..functions.string_distance import levenshtein_scalar as _levenshtein
from ..results import Match, MatchKey
from ..types import lattice_types

# Compatibility of SQL-ish type names (reference cupid/__init__.py:1-20).
DATATYPE_COMPATIBILITY_TABLE: Dict[str, Dict[str, float]] = {
    "text": {"keyword": 1.0, "varchar": 1.0, "nvarchar": 0.9, "nchar": 0.8, "char": 0.6},
    "keyword": {"text": 1.0, "varchar": 1.0, "nvarchar": 0.9, "nchar": 0.8, "char": 0.6},
    "varchar": {"text": 1.0, "keyword": 1.0, "nvarchar": 0.9, "nchar": 0.8, "char": 0.6, "int": 0.1},
    "nvarchar": {"text": 0.9, "keyword": 0.9, "varchar": 0.9, "nchar": 0.8, "char": 0.6},
    "nchar": {"text": 0.7, "keyword": 0.7, "varchar": 0.7, "nvarchar": 1.0, "char": 0.7},
    "char": {"text": 0.7, "keyword": 0.7, "varchar": 0.7, "nchar": 0.8, "nvarchar": 0.6},
    "date": {"double": 0.1, "int": 0.1, "decimal": 0.1, "bit": 0.1},
    "double": {"date": 0.1, "float": 1.0, "decimal": 1.0},
    "decimal": {"date": 0.1, "float": 1.0, "double": 1.0},
    "int": {"date": 0.1, "long": 0.8, "short": 0.7, "smallint": 0.7, "integer": 1.0, "varchar": 0.1},
    "integer": {"date": 0.1, "long": 0.8, "short": 0.7, "smallint": 0.7, "int": 1.0},
    "bit": {"time": 0.1, "date": 0.1},
    "time": {"bit": 0.1},
    "float": {"double": 0.9},
    "long": {"short": 0.6, "int": 0.8, "bigint": 1.0, "smallint": 0.6, "integer": 0.8},
    "bigint": {"short": 0.6, "int": 0.8, "long": 1.0, "smallint": 0.6, "integer": 0.8},
    "short": {"long": 0.6, "int": 0.8, "bigint": 0.6, "smallint": 1.0, "integer": 0.8},
    "smallint": {"long": 0.6, "int": 0.8, "bigint": 0.6, "short": 1.0, "integer": 0.8},
}

# Shared with the reference-parity shims (tests/refshims/nltk): the real
# NLTK English stopword corpus and the documented tokenizer contract.
from ..functions.naming import STOPWORDS_EN as _STOPWORDS
from ..functions.naming import snakecase as _naming_snakecase
from ..functions.naming import word_tokenize as _word_tokenize
from ..functions.wordnet_lite import word_similarity as _wordnet_word_similarity

W_SYMBOLS, W_NUMBER, W_COMMON, W_CONTENT = 0.0, 0.1, 0.1, 0.8


@dataclass
class _Token:
    data: str
    kind: str  # number | common | content (symbols are dropped at weight 0)


@dataclass
class _Element:
    """A schema element (column) with its normalized token bag."""

    name: str
    data_type: str
    long_name: Tuple[str, str, str, str]
    tokens: List[_Token] = field(default_factory=list)


def snakecase(name: str) -> str:
    return _naming_snakecase(name)


def tokenize(text: str) -> List[_Token]:
    """Reference ``normalization`` (linguistic_matching.py:22-65): split,
    recurse into camelCase/snake_case, classify."""
    out: List[_Token] = []
    for raw in _word_tokenize(text):
        if not any(ch.isalnum() for ch in raw):
            continue  # SYMBOLS carry weight 0 and never influence sims
        try:
            float(raw)
            out.append(_Token(raw, "number"))
            continue
        except ValueError:
            pass
        snake = snakecase(raw)
        if "_" in snake:
            out.extend(tokenize(snake.replace("_", " ")))
        elif raw.lower() in _STOPWORDS:
            out.append(_Token(raw.lower(), "common"))
        else:
            out.append(_Token(raw.lower(), "content"))
    return out




def _token_sim(a: str, b: str) -> float:
    """Reference ``get_partial_similarity`` chain (linguistic_matching.py:
    167-186): equal data -> 1.0, else WordNet Wu-Palmer (the bundled
    wordnet-lite taxonomy), else normalized Levenshtein when either token
    is out of the wordnet vocabulary (the nan fallback)."""
    if a == b:
        return 1.0
    wn_sim = _wordnet_word_similarity(a, b)
    if not math.isnan(wn_sim):
        return wn_sim
    return 1.0 - _levenshtein(a, b) / max(max(len(a), len(b)), 1)


def _partial_similarity(ts1: List[_Token], ts2: List[_Token]) -> float:
    total = 0.0
    for t1 in ts1:
        total += max((_token_sim(t1.data, t2.data) for t2 in ts2), default=-math.inf)
    return total


def name_similarity_tokens(ts1: List[_Token], ts2: List[_Token]) -> float:
    """(partial(1→2) + partial(2→1)) / (|1| + |2|) — linguistic_matching.py
    :160-170."""
    if not ts1 or not ts2:
        return 0.0
    return (_partial_similarity(ts1, ts2) + _partial_similarity(ts2, ts1)) / (len(ts1) + len(ts2))


def name_similarity_elements(e1: _Element, e2: _Element) -> float:
    """Token-type-weighted bidirectional similarity
    (linguistic_matching.py:225-245)."""
    sum1 = sum2 = 0.0
    for kind, weight in (("number", W_NUMBER), ("common", W_COMMON), ("content", W_CONTENT)):
        t1 = [t for t in e1.tokens if t.kind == kind]
        t2 = [t for t in e2.tokens if t.kind == kind]
        if not t1 or not t2:
            continue
        sum1 += weight * name_similarity_tokens(t1, t2)
        sum2 += weight
    if sum1 == 0 or sum2 == 0:
        return 0.0
    return sum1 / sum2


def compute_compatibility(categories: set) -> Dict[str, Dict[str, float]]:
    """linguistic_matching.py:76-99: 1.0 on identical categories, the static
    table where present, token-level name similarity otherwise."""
    table: Dict[str, Dict[str, float]] = {}
    for cat1, cat2 in combinations_with_replacement(sorted(categories), 2):
        table.setdefault(cat1, {})
        table.setdefault(cat2, {})
        if cat1 == cat2:
            compat = 1.0
        elif cat1 in DATATYPE_COMPATIBILITY_TABLE and cat2 in DATATYPE_COMPATIBILITY_TABLE[cat1]:
            compat = DATATYPE_COMPATIBILITY_TABLE[cat1][cat2]
        else:
            compat = name_similarity_tokens(tokenize(cat1), tokenize(cat2))
        table[cat1][cat2] = compat
        table[cat2][cat1] = compat
    return table


def compute_ssim(s_leaves, t_leaves, sims, th_accept: float = 0.5) -> float:
    """Structural similarity (structural_similarity.py:5-25): fraction of
    leaves with a strong link; NaN when leaf counts differ by more than 2x.
    Kept for completeness — see module docstring on why the reference's
    structural phase cannot affect output."""
    if len(s_leaves) > 2 * len(t_leaves) or len(t_leaves) > 2 * len(s_leaves):
        return math.nan
    s_strong = {s for s in s_leaves for t in t_leaves if sims.get((s, t), {}).get("wsim", 0) > th_accept}
    t_strong = {t for t in t_leaves for s in s_leaves if sims.get((s, t), {}).get("wsim", 0) > th_accept}
    return (len(s_strong) + len(t_strong)) / (len(s_leaves) + len(t_leaves))


from . import BaseMatcher


class Cupid(BaseMatcher):
    def __init__(
        self,
        leaf_w_struct: float = 0.2,
        w_struct: float = 0.2,
        th_accept: float = 0.7,
        th_high: float = 0.6,
        th_low: float = 0.35,
        c_inc: float = 1.2,
        c_dec: float = 0.9,
        th_ns: float = 0.7,
        parallelism: int = 1,
    ):
        self.leaf_w_struct = float(leaf_w_struct)
        self.w_struct = float(w_struct)
        self.th_accept = float(th_accept)
        self.th_high = float(th_high)
        self.th_low = float(th_low)
        self.c_inc = float(c_inc)
        self.c_dec = float(c_dec)
        self.th_ns = float(th_ns)

    def get_matches(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ) -> Dict[MatchKey, float]:
        s_leaves = self._elements(source, source_name)
        t_leaves = self._elements(target, target_name)
        categories = {e.data_type for e in s_leaves} | {e.data_type for e in t_leaves}
        compat = compute_compatibility(categories)

        sims: Dict[Tuple[tuple, tuple], Dict[str, float]] = {}
        for s in s_leaves:
            for t in t_leaves:
                c = compat[s.data_type][t.data_type]
                lsim = name_similarity_elements(s, t) * c if c > self.th_ns else 0.0
                wsim = self.leaf_w_struct * c + (1 - self.leaf_w_struct) * lsim
                sims[(s.long_name, t.long_name)] = {"ssim": c, "lsim": lsim, "wsim": wsim}

        matches: Dict[MatchKey, float] = {}
        for (s_ln, t_ln), v in sorted(sims.items(), key=lambda kv: -kv[1]["wsim"]):
            if v["wsim"] >= self.th_accept:
                matches.update(
                    Match(t_ln[0], t_ln[2], s_ln[0], s_ln[2], float(v["wsim"])).to_dict
                )
        return matches

    @staticmethod
    def _elements(df: DataFrame, table_name: str) -> List[_Element]:
        types = lattice_types(df)
        out = []
        for col in df.columns:
            e = _Element(
                name=col,
                data_type=types[col],
                long_name=(table_name, table_name, col, f"{table_name}:{col}"),
            )
            e.tokens = tokenize(col)
            out.append(e)
        return out
