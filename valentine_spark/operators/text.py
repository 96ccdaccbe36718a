"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All whole-stage-codegen column expressions (no
UDFs), with counting formulated as replace-length arithmetic so a SQL oracle
reproduces results bit-for-bit (no regex-dialect drift between engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker stopwords per language for the n-gram/stopword-ratio language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "los", "las", "es", "una"],
}


def _count_occurrences(col, needle: str):
    """# occurrences of needle = (len(s) - len(replace(s, needle, ''))) / len(needle)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def _padded_lower(text_col: str):
    return F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))


# GPT-2-style pre-tokenizer shape, restricted to the regex subset shared by
# Java regex (Spark) and RE2 (DuckDB) — no lookahead, and whitespace spelled
# as an EXPLICIT class because Java's \s includes vertical tab while RE2's
# does not (a \x0B in a document would otherwise count differently in the
# two engines).  A token is an optional leading space + a letter run, digit
# run, or symbol run, or a lone whitespace character.  This is the unit BPE
# merges start from, so its count is the right budget proxy for "how many
# subword tokens will this cost" without shipping a merges table.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\f\r]+|[ \t\n\f\r]"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a real BPE-ish pre-tokenizer count
    (``regexp_count`` of the GPT-2-shaped pattern — JVM codegen, and
    RE2-compatible so the DuckDB oracle runs the same regex)."""
    ws_tokens = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
    spaces = _count_occurrences(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        ws_tokens.alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round((F.length(text_col) - spaces) / F.greatest(ws_tokens, F.lit(1)), 6).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band, stopword presence,
    punctuation balance — the usual pretraining quality gates."""
    e = _quality_exprs(text_col)
    return df.select(F.col(id_col), *[e[k].alias(k) for k in e])


def _quality_exprs(text_col: str) -> dict:
    """The quality columns as a name→Column dict, so composite operators
    (``curation_funnel``) evaluate them in the SAME single projection as
    the other gate families instead of self-joining per stat."""
    text = F.col(text_col)
    padded = _padded_lower(text_col)
    n_chars = F.length(text)
    stop_hits = sum(
        (_count_occurrences(padded, f" {w} ") for w in LANG_MARKERS["en"]),
        F.lit(0).cast("double"),
    )
    n_tokens = F.size(F.filter(F.split(text, " "), lambda x: x != ""))
    punct = sum(
        (_count_occurrences(text, p) for p in [".", ",", "!", "?", ";"]),
        F.lit(0).cast("double"),
    )
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(n_tokens, F.lit(1)) * 5.0, F.lit(1.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    punct_score = F.when(punct_ratio <= 0.1, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (punct_ratio - 0.1) * 5.0))
    return {
        "n_chars": n_chars,
        "stopword_hits": F.round(stop_hits, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality": F.round((0.4 * length_score + 0.4 * stop_score + 0.2 * punct_score), 6),
    }


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: per language, count marker-word hits;
    predict the argmax (deterministic tie-break: en > de > fr > es order)."""
    e = _langid_exprs(text_col)
    return df.select(F.col(id_col), *[e[k].alias(k) for k in e])


def _langid_exprs(text_col: str) -> dict:
    padded = _padded_lower(text_col)
    scores = {
        lang: sum((_count_occurrences(padded, f" {w} ") for w in words), F.lit(0).cast("double"))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    # NULL text propagates NULL scores (consistent with the SQL oracle); the
    # prediction must be explicit about it — without this branch the when-
    # chain falls through to NULL while the oracle's ELSE arm emits 'es'
    pred = F.when(F.col(text_col).isNull() | (best <= 0), F.lit("unknown"))
    for lang in ("en", "de", "fr", "es"):
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = {f"score_{lang}": F.round(scores[lang], 6) for lang in ("en", "de", "fr", "es")}
    out["pred_lang"] = pred
    return out


def doc_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 16
) -> DataFrame:
    """Rolling-hash document fingerprint: the minimum md5 over all character
    n-grams (winnowing with window = whole doc) — stable under content moves,
    cheap to compare across corpora.

    Plan shape: the min is folded INSIDE the row with ``array_min over
    transform(sequence(...))`` — a pure whole-stage-codegen map with ZERO
    shuffles, instead of the naive explode + groupBy re-aggregating what
    each row already knows."""
    return df.select(
        F.col(id_col),
        F.expr(
            f"array_min(transform(sequence(1, greatest(length({text_col}) - {n} + 1, 1)), "
            f"i -> md5(substring({text_col}, i, {n}))))"
        ).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 2048,
    overlap_chars: int = 256,
) -> DataFrame:
    """Fixed-window chunking with overlap — the pre-tokenization splitter a
    pretraining pipeline runs before packing sequences: chunk ``i`` covers
    characters ``[i*stride, i*stride + chunk_chars)`` with ``stride =
    chunk_chars - overlap_chars``; the final window carries the remainder
    (possibly shorter, never empty), adjacent windows share
    ``overlap_chars`` so no span is ever split without context.  Empty and
    NULL documents emit zero chunks.

    Plan shape: one in-row ``sequence`` + ``transform`` + ``posexplode`` —
    a pure whole-stage-codegen map with ZERO shuffles and no UDFs; output
    rows ~= corpus_chars / stride regardless of document count, so the
    operator is a map job at any corpus size.  Deterministic window
    arithmetic only (no word-boundary snapping) so an ANSI-SQL oracle
    replays it bit-for-bit."""
    stride = chunk_chars - overlap_chars
    if stride <= 0:
        raise ValueError(
            f"overlap_chars ({overlap_chars}) must be smaller than "
            f"chunk_chars ({chunk_chars})"
        )
    t = text_col
    return (
        df.where(F.length(F.col(t)) > 0)
        .select(
            F.col(id_col),
            F.expr(
                f"posexplode(transform("
                f"sequence(0, (greatest(length({t}) - {chunk_chars}, 0) + {stride} - 1) div {stride}), "
                f"i -> substring({t}, i * {stride} + 1, {chunk_chars})))"
            ).alias("chunk_id", "chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing (concat-then-split): lay every document's
    tokens end-to-end in ``id_col`` order and cut the stream into fixed
    ``seq_len`` windows — the step that turns a curated corpus into the
    dense training batches an LLM run consumes (no padding waste; documents
    span pack boundaries).  Emits one row per (pack, document-slice):

      pack_id      which training sequence the slice lands in
      <id_col>     the source document
      doc_offset   first token of the slice, 0-based within the DOCUMENT
      pack_offset  where the slice starts, 0-based within the PACK
      n_tokens     slice length (> 0; a doc spanning k packs emits k rows)

    Token budget = whitespace token count of ``text_col`` (the same formula
    as :func:`token_counts`), or a precomputed ``token_count_col``.
    Zero-token documents emit nothing.

    Plan shape: ONE distributed prefix sum (two-phase rank machinery —
    ``utils/ranking.distributed_prefix_sum``, no single-partition window)
    over a #docs-row projection, then pure in-row arithmetic + a
    ``sequence``-explode for boundary-spanning docs.  The only shuffle is
    the prefix sum's bucket exchange; output size ~= #docs + corpus_tokens
    / seq_len.  At 100 TB this is a map job over the doc-count projection —
    the token STREAM itself is never materialized, only offsets into it.
    Deterministic by construction (``id_col`` must be unique — it totals
    the order), so an ANSI-SQL window-function oracle replays it
    bit-for-bit."""
    from ..utils.ranking import distributed_prefix_sum

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if token_count_col is None:
        n = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
    else:
        n = F.col(token_count_col)
    docs = df.select(F.col(id_col), n.cast("long").alias("_n")).where(F.col("_n") > 0)
    docs = distributed_prefix_sum(docs, [id_col], "_n", out_col="_start", exclusive=True)

    L = F.lit(int(seq_len)).cast("long")
    start, ntok = F.col("_start"), F.col("_n")
    end = start + ntok
    packed = docs.select(
        F.col(id_col),
        ntok,
        start,
        # packs touched: start div L .. (end-1) div L; end > start always
        # (zero-token docs were dropped), so the range is non-empty.
        # Integer `div`, not floor(x / L): double division would lose
        # exactness past 2^53 total tokens, and a 100 TB corpus is ~10^13.
        F.explode(
            F.sequence(
                F.expr(f"_start div {int(seq_len)}").cast("long"),
                F.expr(f"(_start + _n - 1) div {int(seq_len)}").cast("long"),
            )
        ).alias("pack_id"),
    )
    p = F.col("pack_id")
    return packed.select(
        p,
        F.col(id_col),
        F.greatest(p * L - start, F.lit(0)).cast("long").alias("doc_offset"),
        F.greatest(start - p * L, F.lit(0)).cast("long").alias("pack_offset"),
        (F.least((p + 1) * L, end) - F.greatest(p * L, start)).cast("long").alias("n_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021 §A1.1 "repetition
    removal"): duplicate-word fraction, most-frequent-word share,
    most-frequent-bigram share, and the longest consecutive same-word run.
    High values on any of them mark machine-generated / boilerplate text a
    pretraining corpus should drop.

    Plan shape: every statistic is folded INSIDE the row with higher-order
    array expressions (``array_sort`` + ``aggregate`` run-length fold) — a
    pure whole-stage-codegen map with ZERO shuffles and no UDFs, so the
    operator costs one scan regardless of corpus size.  The naive form
    (explode words → groupBy(doc, word) → max count) shuffles the full
    token stream twice; at 100 TB that is the difference between a map job
    and the biggest shuffle in the pipeline."""
    e = _repetition_exprs(text_col)
    return df.select(F.col(id_col), *[e[k].alias(k) for k in e])


def _repetition_exprs(text_col: str) -> dict:
    words = f"filter(split({text_col}, ' '), x -> x != '')"
    # longest run of identical adjacent elements; on the SORTED array this
    # is the max frequency of any element (run-length encoding of a sorted
    # multiset groups equal values together)
    run_fold = (
        "aggregate({arr}, named_struct('prev', '', 'run', 0L, 'best', 0L), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(x = acc.prev, acc.run + 1L, 1L), "
        "  'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1L, 1L))), "
        "acc -> acc.best)"
    )
    bigrams = (
        f"transform(sequence(1, size({words}) - 1), "
        f"i -> concat(element_at({words}, i), ' ', element_at({words}, i + 1)))"
    )
    n = F.expr(f"size({words})")
    return {
        "n_words": n.cast("long"),
        "dup_word_frac": F.round(
            1.0 - F.expr(f"size(array_distinct({words}))") / F.greatest(n, F.lit(1)), 6
        ),
        "top_word_frac": F.round(
            F.expr(run_fold.format(arr=f"array_sort({words})")) / F.greatest(n, F.lit(1)),
            6,
        ),
        "top_bigram_frac": F.when(n < 2, F.lit(0.0)).otherwise(
            F.round(F.expr(run_fold.format(arr=f"array_sort({bigrams})")) / (n - 1), 6)
        ),
        "max_word_run": F.expr(run_fold.format(arr=words)).cast("long"),
    }


def curation_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 150,
    lang: str = "en",
    min_quality: float = 0.5,
    max_dup_word_frac: float = 0.6,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """The end-to-end pretraining-corpus gate pipeline as ONE query:
    sequential survivor counts through length → language-ID → quality →
    repetition gates, then an exact-dedup distinct count (normalized text,
    ``dedup.normalize_text_expr``) over the full survivors — the C4/Gopher
    curation funnel every corpus report tabulates.

    Plan shape: all four gate families evaluate in a SINGLE zero-shuffle
    projection (the per-family expression dicts above — no self-joins of
    per-operator outputs), followed by one partial-aggregated global
    aggregate; the dedup stage is a count_distinct over an md5, i.e. the
    standard two-phase distinct aggregate.  One scan + one small shuffle
    total at any corpus size.

    Output: (stage_order, stage, n_docs) — 6 rows."""
    from .dedup import normalize_text_expr

    q = _quality_exprs(text_col)
    l = _langid_exprs(text_col)
    r = _repetition_exprs(text_col)
    g_len = q["n_chars"] >= F.lit(min_chars)
    g_lang = g_len & (l["pred_lang"] == F.lit(lang))
    g_qual = g_lang & (q["quality"] >= F.lit(min_quality))
    g_rep = (
        g_qual
        & (r["dup_word_frac"] <= F.lit(max_dup_word_frac))
        & (r["top_bigram_frac"] <= F.lit(max_top_bigram_frac))
    )
    flags = df.select(
        g_len.alias("f_len"),
        g_lang.alias("f_lang"),
        g_qual.alias("f_qual"),
        g_rep.alias("f_rep"),
        F.when(g_rep, F.md5(normalize_text_expr(F.col(text_col)))).alias("norm_hash"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("f_len").cast("long")).alias("pass_min_length"),
        F.sum(F.col("f_lang").cast("long")).alias("pass_language"),
        F.sum(F.col("f_qual").cast("long")).alias("pass_quality"),
        F.sum(F.col("f_rep").cast("long")).alias("pass_repetition"),
        F.count_distinct(F.col("norm_hash")).alias("kept_after_exact_dedup"),
    )
    stages = [
        "total", "pass_min_length", "pass_language",
        "pass_quality", "pass_repetition", "kept_after_exact_dedup",
    ]
    stack = ", ".join(f"{i + 1}, '{s}', {s}" for i, s in enumerate(stages))
    return agg.select(
        F.expr(f"stack({len(stages)}, {stack}) AS (stage_order, stage, n_docs)")
    ).select(
        F.col("stage_order").cast("int"),
        "stage",
        F.col("n_docs").cast("long"),
    )


# PII redaction chain.  ORDER IS SEMANTICS: each category counts and
# redacts against the text state left by the previous one (an SSN must not
# be double-counted by the looser phone pattern, so SSN runs first and its
# replacement token contains no digits).  Patterns live in the regex subset
# shared by Java regex (Spark codegen) and RE2 (DuckDB), so a SQL oracle
# reproduces the chain bit-for-bit — same discipline as BPE_TOKEN_RE above.
PII_CATEGORIES = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssns", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ipv4s", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phones", r"[+(]?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
]


def pii_redact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII scrubbing for pretraining corpora: redact emails, SSN-shaped
    ids, IPv4 addresses and phone-shaped number runs to typed placeholder
    tokens, and report the per-category hit counts (the audit trail a
    redaction pass must emit).

    Scale shape: a zero-shuffle projection — the whole chain is nested
    ``regexp_replace``/``regexp_count`` JVM expressions inside one
    whole-stage-codegen stage; cost is one corpus scan at any size.
    Heuristic by design (a phone-shaped match may be a timestamp); the
    value of the chain is that it is DETERMINISTIC and cheap enough to run
    inline with ingest, with counts to triage documents for heavier
    review."""
    redacted = F.col(text_col)
    counts = []
    for name, pat, token in PII_CATEGORIES:
        counts.append(F.regexp_count(redacted, F.lit(pat)).alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(
        F.col(id_col),
        *counts,
        redacted.alias("redacted_text"),
    )


def word_shingles(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle) pairs: every n-word window of the whitespace-normalized
    lowercased text.  Documents shorter than n words produce no rows."""
    # filter '' tokens: split of a trimmed EMPTY string yields [''] (size
    # 1), so at n=1 every blank document would emit the shingle '' and
    # decontaminate() would cross-match all blank docs as contaminated
    words = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[ \t\n\f\r]+", " ")), " "
        ),
        lambda x: x != "",
    )
    nw = F.size(words)
    shingles = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(shingles).alias("shingle"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ANY n-word
    shingle with an evaluation/benchmark set — the training-data hygiene
    pass every LLM corpus needs before evals mean anything (the GPT-3
    appendix / Llama 13-gram overlap check; n=8 is the conservative end).

    Returns one row per CONTAMINATED corpus document:
    ``(doc_id, n_hit_shingles, n_benchmark_docs)`` — how many distinct
    shingles of it appear in the benchmark, and how many distinct benchmark
    documents it collides with.

    Scale shape: the benchmark side is eval-set-sized (10^3-10^5 docs), so
    its distinct shingle set BROADCASTS; the corpus side is one explode +
    one broadcast hash join + one partial-aggregated groupBy — the 100-TB
    corpus is scanned once and never shuffled at shingle grain (only the
    surviving hits, which are benchmark-bounded, reach the aggregation
    exchange)."""
    from pyspark.sql.functions import broadcast

    corpus_sh = word_shingles(corpus, n, id_col, text_col)
    bench_sh = word_shingles(benchmark, n, bench_id_col, bench_text_col).select(
        F.col(bench_id_col).alias("_bench_id"), "shingle"
    ).distinct()
    hits = corpus_sh.join(broadcast(bench_sh), "shingle")
    return hits.groupBy(id_col).agg(
        F.count_distinct("shingle").alias("n_hit_shingles"),
        F.count_distinct("_bench_id").alias("n_benchmark_docs"),
    )
