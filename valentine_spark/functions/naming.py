"""Schema-name normalization primitives shared by the Cupid matcher and the
reference-parity dependency shims (``tests/refshims/``).

The reference normalizes column names with nltk (``linguistic_matching.py:
22-65``): ``nltk.word_tokenize`` + the nltk English stopword corpus.  Neither
nltk nor its data files are available in this environment, so:

  * ``STOPWORDS_EN`` is the standard NLTK English stopword list (the fixed
    179-word corpus shipped as ``corpora/stopwords/english`` — public,
    well-known content, reproduced verbatim);
  * ``word_tokenize`` is a regex tokenizer (``\\w+`` runs or single
    punctuation marks).  It matches Punkt/Treebank behaviour on
    identifier-like schema names (the only inputs Cupid ever tokenizes);
    the known divergence is dotted abbreviations ("Art." tokenizes to
    ``['Art', '.']`` here vs Treebank's ``['Art.']``).

Both the engine's Cupid and the shimmed reference use THESE functions, so
value parity between them is exact by construction on the shared primitive,
and the primitive itself is documented above.
"""

from __future__ import annotations

import re
from typing import List

# The NLTK English stopword corpus (nltk_data/corpora/stopwords/english).
STOPWORDS_EN = frozenset(
    """i me my myself we our ours ourselves you you're you've you'll you'd
    your yours yourself yourselves he him his himself she she's her hers
    herself it it's its itself they them their theirs themselves what which
    who whom this that that'll these those am is are was were be been being
    have has had having do does did doing a an the and but if or because as
    until while of at by for with about against between into through during
    before after above below to from up down in out on off over under again
    further then once here there when where why how all any both each few
    more most other some such no nor not only own same so than too very s t
    can will just don don't should should've now d ll m o re ve y ain aren
    aren't couldn couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't
    haven haven't isn isn't ma mightn mightn't mustn mustn't needn needn't
    shan shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn
    wouldn't""".split()
)

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")
_CAMEL_1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_2 = re.compile(r"([a-z0-9])([A-Z])")


def word_tokenize(text: str) -> List[str]:
    """Tokenize like nltk.word_tokenize does on schema-name-like input:
    alphanumeric runs and individual punctuation marks."""
    return _TOKEN_RE.findall(text)


def snakecase(name: str) -> str:
    """camelCase/PascalCase -> snake_case (reference linguistic_matching.py
    :17-19, the classic two-regex conversion)."""
    return _CAMEL_2.sub(r"\1_\2", _CAMEL_1.sub(r"\1_\2", name)).lower()
