"""Pure-Python shim for the ``nltk`` API surface the reference uses
(``cupid/linguistic_matching.py``): ``word_tokenize``, ``download`` (no-op),
``corpus.stopwords`` and ``corpus.wordnet``.

The tokenizer and stopword corpus are the engine's own shared primitives
(``valentine_spark.functions.naming``) — the SAME functions the engine's
Cupid uses — so reference-under-shim vs engine parity is exact on the
primitive, and the primitive's contract (incl. its one documented
divergence from Punkt on dotted abbreviations) lives in one place."""

from valentine_spark.functions.naming import word_tokenize  # noqa: F401

from . import corpus  # noqa: F401  (enables `from nltk.corpus import ...`)


def download(*args, **kwargs):  # pragma: no cover - never triggered
    return None
