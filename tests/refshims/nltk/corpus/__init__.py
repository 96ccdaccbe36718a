"""nltk.corpus shim: the real NLTK English stopword list (from
``valentine_spark.functions.naming``) and a wordnet object backed by the
engine's bundled wordnet-lite (``valentine_spark.functions.wordnet_lite``)
when present — empty otherwise, which routes the reference's similarity to
its Levenshtein fallback path (``linguistic_matching.py:204-205``)."""

from valentine_spark.functions.naming import STOPWORDS_EN


class _Stopwords:
    def words(self, lang: str = "english"):
        if lang != "english":
            raise LookupError(f"refshim stopwords: only english bundled, not {lang}")
        return sorted(STOPWORDS_EN)


stopwords = _Stopwords()


class _WordNet:
    def __init__(self):
        try:
            from valentine_spark.functions import wordnet_lite as _wl
            self._wl = _wl
        except ImportError:  # wordnet-lite not built yet
            self._wl = None

    def all_lemma_names(self):
        return self._wl.all_lemma_names() if self._wl else []

    def synsets(self, word):
        return self._wl.synsets(word) if self._wl else []

    def wup_similarity(self, s1, s2):
        if self._wl is None:  # pragma: no cover - unreachable when empty
            raise LookupError("refshim wordnet: no data")
        return self._wl.wup_similarity(s1, s2)


wordnet = _WordNet()
