"""Real-WordNet golden for wordnet_lite (VERDICT r2 #5).

Round 2 proved Cupid value-parity *under the nltk shim* — both the engine
and the executed reference score through wordnet_lite, so they agree by
construction.  This golden anchors wordnet_lite to WordNet ITSELF: every
expected value below is a published / structurally-certain WordNet 3.0
fact (no nltk needed), and the test asserts wordnet_lite lands within a
documented tolerance, bounding how far a user running the real reference
with real WordNet can diverge on the covered vocabulary.

Anchor provenance (public knowledge):

* ``wup(dog.n.01, cat.n.01) = 0.8571428571428571`` — the canonical value
  from NLTK's WordNet howto doctest; derives from the WordNet 3.0 chain
  entity > physical_entity > object > whole > living_thing > organism >
  animal > chordate > vertebrate > mammal > placental > carnivore >
  {canine > dog | feline > cat} with root depth 1:
  2*12/(14+14) = 6/7.  wordnet_lite mirrors that chain at the same
  depths, so the match is EXACT.
* Shared-synset pairs: WordNet 3.0 groups {customer, client},
  {writer, author}, {price, cost, monetary value}, {seller, vendor,
  vender, marketer}, {nation, country, state, land} each into one noun
  synset, so the reference's max-over-sense-cross-product Wu-Palmer
  (linguistic_matching.py:208-210) returns exactly 1.0 for them.

Max observed divergence across the anchors: price~cost at |1.0 - 14/15|
= 0.0667 and seller~vendor at |1.0 - 18/19| = 0.0526 (wordnet_lite keeps
them as sibling/parent-child nodes rather than merged synsets).  The
documented bound asserted here is 0.07; identity-critical pairs
(customer~client, writer~author, nation~country) are exact.
"""

import math

import pytest

from valentine_spark.functions import wordnet_lite as W


def wup_word(a: str, b: str) -> float:
    """Max Wu-Palmer over the sense cross-product — the reference's
    compute_similarity_wordnet contract."""
    return W.word_similarity(a, b)


def test_dog_cat_matches_nltk_doctest_exactly():
    # NLTK howto: wn.synset('dog.n.01').wup_similarity(wn.synset('cat.n.01'))
    assert wup_word("dog", "cat") == pytest.approx(6.0 / 7.0, abs=1e-12)
    assert wup_word("dog", "cat") == pytest.approx(0.8571428571428571, abs=1e-12)


@pytest.mark.parametrize("a,b", [("customer", "client"), ("writer", "author"), ("nation", "country")])
def test_shared_synset_pairs_exact(a, b):
    # one WordNet 3.0 synset => real max-wup is exactly 1.0; wordnet_lite
    # models these as shared synsets / lemma aliases, so exact too
    assert wup_word(a, b) == 1.0


@pytest.mark.parametrize(
    "a,b,real_wordnet",
    [
        ("price", "cost", 1.0),  # {monetary value, price, cost}
        ("seller", "vendor", 1.0),  # {seller, vendor, vender, marketer}
    ],
)
def test_near_synset_pairs_within_documented_bound(a, b, real_wordnet):
    # wordnet_lite keeps these as distinct adjacent nodes; divergence from
    # real WordNet is bounded at 0.07 (documented in wordnet_lite.py)
    assert abs(wup_word(a, b) - real_wordnet) <= 0.07


def test_identity_and_oov_contract():
    assert wup_word("customer", "customer") == 1.0
    # OOV must be nan so Cupid's Levenshtein fallback engages, mirroring
    # the reference's LookupError/nan path
    assert math.isnan(wup_word("customer", "zzqx_not_a_word"))


def test_unrelated_pairs_score_low():
    # dog (physical_entity subtree) vs price (abstraction subtree): only
    # the root is shared in both real WordNet and wordnet_lite
    assert wup_word("dog", "price") < 0.35
