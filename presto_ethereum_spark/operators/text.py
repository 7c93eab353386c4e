"""Text-analysis operators for training-data pipelines.

Everything here is built from JVM-side column expressions (no Python in the
hot path): tokenization, token counting (whitespace + BPE-ish regex),
quality scoring, n-gram shingling, language identification (stopword-profile
heuristic), and content fingerprinting.  All functions are deterministic and
deliberately expressible 1:1 in ANSI-ish SQL so correctness can be
oracle-checked (see plans/battery.py).

Scale: every operator is a narrow per-row projection — zero shuffles; at
100 TB these run at parquet-scan speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count_ws",
    "token_count_regex",
    "word_shingles",
    "punct_ratio",
    "digit_ratio",
    "avg_token_len",
    "stopword_ratio",
    "quality_score",
    "quality_survival_curve",
    "lang_scores",
    "lang_id",
    "alpha_terms",
    "document_frequency",
    "bigram_fluency",
    "bpe_train",
    "bpe_apply",
    "distribution_drift",
    "quality_classifier_score",
    "quality_classifier_weights",
    "importance_weights",
    "top_terms",
    "tfidf_topk",
    "chunk_documents",
    "bm25_topk",
    "rrf_fuse",
    "collocations_pmi",
    "token_entropy",
    "zipf_slope",
    "ks_drift",
    "token_burstiness",
    "mask_pii",
    "k_anonymity",
    "PII_PATTERNS",
    "normalize_text",
    "fingerprint",
    "LANG_PROFILES",
    "TOKEN_REGEX",
    "EN_STOPWORDS",
]

# A BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# marks.  ASCII classes only so the Java and RE2 regex dialects agree.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with for "
    "on as at by from not but".split()
)

# Tiny stopword profiles per language for the n-gram/stopword language-ID
# heuristic.  Deterministic, data-independent; ties resolve in declaration
# order (en first).
LANG_PROFILES: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    "de": "der die das und ist nicht mit von zu im den ein eine auf für".split(),
    "fr": "le la les et de des un une est dans pour que qui sur pas".split(),
    "es": "el la los las y de un una es en para que no con por".split(),
    "zh": "de le shi bu zai you wo ta men zhe na ge hao".split(),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens; keeps empty strings (both engines' split do)."""
    return F.split(text, " ", -1)


def token_count_ws(text: Column) -> Column:
    return F.size(tokens(text))


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles: tokens joined with a single space; documents
    shorter than n tokens yield an empty array."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    stripped = F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def digit_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^0-9]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def avg_token_len(text: Column) -> Column:
    """Mean token length = (chars - spaces) / tokens."""
    nospace = F.length(F.regexp_replace(text, r" ", ""))
    return nospace / F.greatest(token_count_ws(text), F.lit(1))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite heuristic in [0, 1]: rewards mid-length documents with low
    punctuation/digit noise, plausible word lengths, and some stopword mass
    (the classic cheap pre-filters in front of LLM training pipelines).

    Returned UNROUNDED: the formula is pure rational arithmetic (integer
    counts, ratios, fixed weights — no transcendentals), evaluated in the
    same left-to-right IEEE order the oracle mirrors, so the double is
    bit-identical across engines as-is.  A ``round(raw, 6)`` here would
    *introduce* the only possible divergence (the shortest-repr-vs-binary
    tie class; see ROUNDING_AUDIT.md) — component denominators like
    n_chars = 640 can make the exact value tie at the 7th decimal."""
    length_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    word_len = avg_token_len(text)
    word_len_score = F.when((word_len >= 3) & (word_len <= 10), F.lit(1.0)).otherwise(
        F.lit(0.3)
    )
    noise_penalty = punct_ratio(text) + digit_ratio(text)
    sw_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    raw = (
        0.35 * length_score
        + 0.25 * word_len_score
        + 0.2 * sw_score
        + 0.2 * (1 - F.least(noise_penalty * 3, F.lit(1.0)))
    )
    return raw


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-overlap score per language profile (count of token hits)."""
    toks = tokens(F.lower(text))
    out = {}
    for lang, words in LANG_PROFILES.items():
        prof = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(prof, t)))
    return out


def lang_id(text: Column) -> Column:
    """argmax over profiles; ties resolve in declaration order; zero overlap
    everywhere -> 'und' (undetermined)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(scores)):  # reversed so first lang wins ties
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def normalize_text(text: Column) -> Column:
    """Canonical form for exact-dup detection: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (bit-identical across
    engines; the exact-dedup key at any scale)."""
    return F.md5(normalize_text(text).cast("binary"))


def _seq_1_to(n: Column) -> Column:
    # sequence(1, n) is DESCENDING for n < 1 — guard to empty instead
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def gram_hashes(norm_text: Column, k: int = 8) -> Column:
    """60-bit rolling hashes of every char ``k``-gram of an
    already-normalized text column (empty array when shorter than ``k``).

    Pass a *materialized attribute* (staged ``withColumn``), not a nested
    expression: the per-element lambda inlines whatever expression it is
    given, so a non-attribute normalization would re-run per gram."""
    from presto_ethereum_spark.operators.dedup import hash60

    grams = F.transform(
        _seq_1_to(F.length(norm_text) - F.lit(k - 1)),
        lambda i: F.substring(norm_text, i, F.lit(k)),
    )
    return F.transform(grams, lambda g: hash60(g))


def window_minima(hashes: Column, w: int = 4) -> Column:
    """Distinct minima of every ``w``-wide window over a hash array.

    IMPORTANT: pass a *materialized column attribute* (a staged
    ``withColumn`` result), not the ``gram_hashes(...)`` expression itself —
    a nested expression is re-evaluated per window position by the lambda,
    turning O(n*w) into O(n^2) hashing.  ``winnow_fingerprints`` stages
    correctly; this split exists so the hash array is computed once."""
    mins = F.transform(
        _seq_1_to(F.size(hashes) - F.lit(w - 1)),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprints(
    df, text_col: str = "text", k: int = 8, w: int = 4, out_col: str = "fps"
):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS rolling-hash scheme): hash every char ``k``-gram of the normalized
    text, keep the minimum of each ``w``-wide window, distinct the result.

    Guarantees: any shared substring of length >= k+w-1 between two
    documents yields at least one shared fingerprint, so containment/overlap
    detection needs only a join on (fp) — one shuffle of small integers at
    any corpus size.  Pure JVM expressions, no Python in the path; the hash
    array is staged in its own projection so the window pass reads it as an
    attribute (O(n*w) per doc, not O(n^2) — see ``window_minima``).
    Documents with fewer than k+w-1 normalized chars produce an empty array.

    Takes and returns a DataFrame (adds ``out_col``).  Each stage is its own
    projection over an attribute of the previous one; Catalyst keeps the
    stages separate (multi-referenced expensive expressions are not
    collapsed), so the total cost is O(chars * w) hashes per document.
    When exploding the result, use ``explode_outer`` + drop-null rather than
    ``explode``: plain explode infers a ``size(fps) > 0`` filter that is
    pushed below these projections with the whole pipeline inlined —
    re-evaluating it quadratically."""
    staged = (
        df.withColumn("_winnow_norm", normalize_text(F.col(text_col)))
        .withColumn("_winnow_hashes", gram_hashes(F.col("_winnow_norm"), k))
    )
    return staged.withColumn(
        out_col, window_minima(F.col("_winnow_hashes"), w)
    ).drop("_winnow_norm", "_winnow_hashes")


def alpha_terms(text: Column) -> Column:
    """Distinct lowercase alphabetic terms of a document (runs of ``[a-z]``
    after lowering).  The split-on-``[^a-z]+`` contract is chosen because it
    is portable verbatim to the SQL oracle (``string_split_regex``)."""
    return F.array_distinct(F.split(F.lower(text), "[^a-z]+"))


def document_frequency(df, text_col: str = "text", id_col: str = "doc_id"):
    """(term, df_docs): number of documents containing each term.

    Plan at scale: per-row distinct-term array (narrow, codegen) ->
    explode -> ONE hash shuffle on the term with map-side partial counts.
    Term frequency skew ("the") is absorbed by the partial aggregation:
    each task emits at most one row per distinct term."""
    return (
        df.select(F.explode(alpha_terms(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("df_docs"))
    )


def top_terms(df, k: int = 25, text_col: str = "text", id_col: str = "doc_id"):
    """Top-k corpus terms by document frequency with smoothed IDF
    ``ln((N+1)/(df+1))`` — the vocabulary/IDF build step of a TF-IDF
    featurizer.  Ties broken by term so the result is total-ordered.

    The global top-k is a row_number window over (df_docs DESC, term):
    Spark plans the rank filter as TakeOrderedAndProject (partial top-k in
    each map task, then a k-row merge — verified on .explain), so the
    vocabulary itself (potentially billions of terms at 100 TB) is never
    globally sorted."""
    n_docs = df.agg(F.count("*").alias("n_docs"))
    w = Window.orderBy(F.desc("df_docs"), "term")
    # rank FIRST, join the scalar count after: with the 1-row cross join
    # below the window, Catalyst cannot push the rank filter into a
    # TakeOrderedAndProject and would globally sort the whole vocabulary
    # (verified on .explain); ranked-then-joined, the cross join touches
    # only k rows and the partial top-k runs map-side.
    return (
        document_frequency(df, text_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df_docs",
            F.round(
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_docs") + F.lit(1.0))), 6
            ).alias("idf"),
            "rank",
        )
    )


def tfidf_topk(df, k: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document top-k TF-IDF terms — the per-doc keyword extractor
    next to :func:`rake_keywords` (degree/frequency scoring) and
    :func:`top_terms` (corpus-global vocabulary): ``tfidf = tf x
    ln((N+1)/(df+1))``, the smoothed IDF ``top_terms`` already defines,
    ranked per document with ties broken by term.

    Plan at scale: tokenize map-side (same ``[^a-z]+`` split contract as
    :func:`alpha_terms`, portable verbatim to the oracle), ONE shuffle to
    (doc, term) counts, PERSISTED — the tf table feeds both the
    document-frequency aggregate and the scoring join, and without the
    persist Catalyst re-tokenizes the corpus per consumer; the scalar N
    rides a 1-row broadcast; the final per-doc top-k is a
    WindowGroupLimit on (doc_id), never a global sort.  Returns
    ``(doc_id, term, tf, df_docs, tfidf, rank)``."""
    from pyspark import StorageLevel

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
    ).where(F.col("term") != "")
    # persist the (doc, term) counts: they feed BOTH the df table and the
    # scoring join, and (measured) Catalyst re-tokenized the corpus for
    # each consumer instead of reusing the exchange — at 100 TB the tf
    # table is the featurizer's materialized intermediate anyway
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dfx = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfx, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * F.log(
                (F.col("n_docs") + F.lit(1.0)) / (F.col("df_docs") + F.lit(1.0))
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df_docs").cast("long").alias("df_docs"),
            F.round("score", 6).alias("tfidf"),
            "rank",
        )
    )


def chunk_documents(
    df,
    chunk_size: int = 500,
    overlap: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Overlapping character chunks: (doc_id, chunk_id, chunk) — the
    retrieval/context-window chunker (stride = chunk_size - overlap; chunk i
    covers [i*stride, i*stride + chunk_size)).  Empty documents produce no
    chunks; every non-empty document produces ceil-coverage so no suffix is
    dropped.

    Pure map-side: a per-row index sequence + substring transform, then one
    posexplode — zero shuffle, scan-speed at any corpus size.  Chunk
    boundaries depend only on (chunk_size, overlap, text), never on
    partitioning, so chunk ids are stable across engines and re-runs."""
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    txt = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.floor((F.length(txt) - 1) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        starts, lambda i: txt.substr(i * F.lit(stride) + 1, F.lit(chunk_size))
    )
    return (
        df.where(F.length(txt) > 0)
        .select(F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_id", "chunk"))
    )


# ASCII-only patterns so the Java (Spark) and RE2 (DuckDB) dialects agree.
PII_PATTERNS: dict[str, str] = {
    # declaration order IS masking order: email first (its digit runs must
    # not read as phones), then ipv4 (dotted digits would match the looser
    # phone pattern), phone last
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\. ]{7,}[0-9]",
}


def mask_pii(
    df,
    text_col: str = "text",
    out_col: str = "masked",
    patterns: dict[str, str] | None = None,
):
    """Mask PII-looking spans (emails, phone numbers, IPv4s) with
    ``[KIND]`` placeholders and count the replacements per kind — the
    scrubbing pass before a corpus ships to training.

    Adds ``out_col`` plus one ``n_<kind>`` count column per pattern.  Pure
    JVM regexp expressions applied in declaration order (email first, so a
    phone-like digit run inside an address is already masked) — zero
    shuffle, scan-speed; patterns are ASCII-only so an external engine can
    replay the masking byte-for-byte."""
    pats = patterns or PII_PATTERNS
    cur = F.col(text_col)
    counts = []
    for kind, pat in pats.items():
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    return df.select("*", cur.alias(out_col), *counts)


def repetition_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality signals, one row per document:
    duplicate-token fraction, most-frequent-token fraction, and the same
    two signals over word bigrams (Rae et al. 2021's "repetitious text"
    filters, the cheap pre-filter in front of LLM training corpora).

    Scale: every signal is computed *within* the row's own token array via
    codegen'd higher-order functions (``array_distinct`` + a count fold per
    distinct token) — a narrow map over the scan, ZERO shuffles, so the
    operator is embarrassingly parallel at 100 TB.  The alternative
    (explode tokens -> two groupBy passes) would shuffle the entire token
    stream twice.  Per-row cost is O(tokens x distinct) — bounded for real
    documents and far cheaper than one corpus-wide shuffle.

    The token and bigram arrays are STAGED as their own projections
    (``withColumn``) so each downstream HOF reads an attribute; inlined,
    the count-fold lambda would rebuild the whole bigram array once per
    distinct gram (the nested-HOF re-evaluation trap — SCALE.md)."""
    staged = (
        df.withColumn("_rep_toks", tokens(F.col(text_col)))
        .withColumn("_rep_grams", word_shingles(F.col(text_col), 2))
        .where(F.size(F.col("_rep_toks")) >= 2)
    )
    toks, grams = F.col("_rep_toks"), F.col("_rep_grams")

    def top_count(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda u: F.size(F.filter(arr, lambda t: t == u)),
            )
        )

    total_t = F.size(toks)
    total_b = F.size(grams)
    return staged.select(
        F.col(id_col),
        total_t.cast("long").alias("total_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct(toks)) / total_t).alias(
            "dup_token_frac"
        ),
        (top_count(toks) / total_t).alias("top_token_frac"),
        (F.lit(1.0) - F.size(F.array_distinct(grams)) / total_b).alias(
            "dup_bigram_frac"
        ),
        (top_count(grams) / total_b).alias("top_bigram_frac"),
    )


def bm25_topk(
    df,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25 relevance of every document to a fixed bag-of-words query, top-k
    by score — the lexical retrieval scorer behind quality-targeted corpus
    selection ("keep documents that look like the seed set").

    Okapi BM25 with the Lucene +1 idf:
    ``score = sum_t ln(1 + (N - df_t + .5)/(df_t + .5))
              * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*dl/avgdl))``.

    Determinism: avgdl is an exact integer-sum divided once (never a
    float avg, whose accumulation order varies); all float constants are
    pre-evaluated in Python so an oracle can inject the identical doubles;
    term weights sum left-to-right.

    Scale: per-doc (dl, tf_t) is a narrow codegen projection over the scan
    (|terms| array-filter passes, no explode, no shuffle); corpus stats
    (N, sum_dl, df_t) are ONE 1-row partial-aggregated reduce, broadcast
    back; the rank<=k filter over the global score order runs as
    WindowGroupLimit (map-side top-k, k*tasks-row merge)."""
    toks = tokens(F.col(text_col))

    # closure factory: a 2-arg lambda would be read by F.filter as
    # (element, index), silently shadowing the term
    def tf_of(term: str) -> Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    proj = [F.col(id_col), F.size(toks).cast("long").alias("dl")]
    for i, term in enumerate(terms):
        proj.append(tf_of(term).cast("long").alias(f"tf{i}"))
    d = df.select(*proj)
    aggs = [F.count("*").alias("n"), F.sum("dl").alias("sum_dl")]
    for i in range(len(terms)):
        aggs.append(
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
        )
    stats = d.agg(*aggs)
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    score = None
    for i in range(len(terms)):
        tf, dfd = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0)
            + ((F.col("n") - dfd).cast("double") + F.lit(0.5))
            / (dfd.cast("double") + F.lit(0.5))
        )
        wt = idf * (
            (tf.cast("double") * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm)
        )
        score = wt if score is None else score + wt
    w = Window.orderBy(F.desc("_s"), F.col(id_col))
    return (
        d.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), score.alias("_s"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(id_col), F.round("_s", 6).alias("score"), F.col("rank")
        )
    )


def rrf_fuse(
    rankings: list,
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
):
    """Reciprocal-rank fusion of N candidate rankings:
    ``rrf(d) = sum_i 1/(rrf_k + rank_i(d))``, summed over the rankings that
    contain d — the standard score-free way to combine retrieval systems
    (BM25 + dense ANN, or several query formulations) for corpus selection.

    Deterministic: each term is the exact integer ``10^12 DIV (rrf_k +
    rank)`` (pico-units) and the fused score is their BIGINT sum; the
    reported ``rrf`` double is that integer divided by 1e12 — identical
    nearest double on every engine, with no ``round(double)`` anywhere
    (the portable-rounding rule the jaccard family follows via
    ``round6_ratio``).  The floor-per-term value differs from the true
    1/(rrf_k+rank) sum by < 2e-12 while adjacent distinct true scores
    differ by >= 1/(rrf_k+max_rank)^2 ~ 4e-5, so the fused ORDER is the
    textbook RRF order exactly; final ties break by id.

    Scale: each input is already a top-k list (k*|queries| rows, tiny), so
    the full outer joins and the fused top-k are driver-trivial; the heavy
    lifting lives in the upstream rankers."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    sides = [
        r.select(
            F.col(id_col).alias(f"_id{i}"), F.col(rank_col).alias(f"_r{i}")
        )
        for i, r in enumerate(rankings)
    ]
    joined = sides[0]
    idc = F.col("_id0")
    for i in range(1, len(sides)):
        joined = joined.join(sides[i], idc == F.col(f"_id{i}"), "full")
        idc = F.coalesce(idc, F.col(f"_id{i}"))
    e12 = F.lit(1_000_000_000_000).cast("long")
    score = None
    for i in range(len(sides)):
        den = (F.lit(rrf_k) + F.col(f"_r{i}")).cast("long")
        # exact 10^12 DIV den: numerator is an exact multiple of den, so
        # the double divide is error-free (both operands << 2^53)
        term = F.coalesce(((e12 - e12 % den) / den).cast("long"), F.lit(0))
        score = term if score is None else score + term
    w = Window.orderBy(F.desc("_s"), F.col(id_col))
    return (
        joined.select(idc.alias(id_col), score.alias("_s"))
        .withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .select(
            F.col(id_col),
            (F.col("_s") / F.lit(1.0e12)).alias("rrf"),
            F.col(rank_col),
        )
    )


def decontaminate(
    df,
    n: int = 3,
    bench_mod: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Benchmark decontamination: flag training documents sharing word
    n-gram shingles with a held-out benchmark split (here: a deterministic
    ``doc_id % bench_mod == 0`` slice standing in for MMLU/HumanEval/...),
    returning (doc_id, n_hit_grams) for every contaminated document — the
    n-gram-overlap decontamination step every LLM data pipeline runs before
    training (GPT-3 appendix C uses 13-grams; n is a parameter here).

    Scale: shingling is a narrow map; the benchmark side is deduped to
    distinct grams BEFORE the join, so the join never multiplies rows.  In
    production the benchmark set is tiny (thousands of prompts), so Spark's
    AQE broadcasts the deduped gram set and the whole operator is one
    shuffle-free broadcast-hash-join over the corpus scan; here the bench
    slice is corpus-derived (5%), and the equi-join on the gram hash
    partitions both sides — still one shuffle of shingles, never a
    cross-product."""
    is_bench = (F.col(id_col) % bench_mod) == 0
    grams = df.withColumn("_decon_grams", word_shingles(F.col(text_col), n)).select(
        F.col(id_col), F.explode(F.col("_decon_grams")).alias("gram")
    )
    bench = grams.where(is_bench).select("gram").distinct()
    return (
        grams.where(~is_bench)
        .join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("n_hit_grams"))
    )


def importance_weights(
    df,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
):
    """Data-selection importance scores in the spirit of DSIR (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS'23): score each document by how much its token distribution
    looks like a TARGET slice of the corpus relative to the corpus overall.

    ``target`` is a boolean Column marking the target rows (e.g.
    ``F.col("source") == "src0"``).  Each token position contributes the
    smoothed frequency ratio

        w(t) = floor( (c_target(t) + 1) * scale / (c_corpus(t) + 1) )

    and a document's score is the sum over its positions.  DSIR proper uses
    log-ratios of hashed n-gram probabilities; the integer ratio keeps the
    SAME ranking signal (monotone per token) while staying exactly
    reproducible across engines — floor-divided BIGINTs have one right
    answer, log-sums do not.

    Returns ``(doc_id, n_tokens, importance_score, avg_ratio_e6)`` where
    ``avg_ratio_e6`` = round-half-up(score / n_tokens) as BIGINT — the
    mean per-token ratio in micro-units, computed in integer space
    (``(2*score + n) DIV (2*n)``) for the same reason as
    ``bigram_fluency``: ``round(score/n/scale, 6)`` on doubles diverges
    between engines when the quotient lands on a decimal tie.

    Plan: two shuffles — token-stats aggregation (map-side partial
    combine over the exploded stream), then the positions-to-stats join
    re-aggregated by doc.  The stats side is vocabulary-sized; Catalyst
    broadcasts it when small, and hot stopword tokens in the join are
    AQE-skew-split at scale.  No Python anywhere.
    """
    positions = df.select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    stats = positions.groupBy("tok").agg(
        F.count("*").alias("c_all"),
        F.count_if(F.col("is_target")).alias("c_tgt"),
    )
    w = F.expr(f"((c_tgt + 1) * CAST({int(scale)} AS BIGINT)) DIV (c_all + 1)")
    return (
        positions.join(stats, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(w).alias("importance_score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "importance_score",
            F.expr(
                "(2 * importance_score + n_tokens) DIV (2 * n_tokens)"
            ).alias("avg_ratio_e6"),
        )
    )


def rake_keywords(
    df,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
):
    """RAKE keyword extraction (Rose et al. 2010), corpus-level:
    candidate phrases are maximal runs of non-stopword tokens; each
    word's score is deg/freq (deg = summed length of every phrase the
    word occurs in — its co-occurrence degree; freq = occurrence count);
    a phrase scores the sum of its words' scores, and the corpus top-k
    phrases are reported.  The keyword/phrase-mining member of the text
    family next to top_terms (unigram df) and collocations_pmi (bigram
    association).

    Exactness: word scores quantize to half-up micro-units
    ``(2*deg*1e6 + freq) div (2*freq)`` — deg multiplied in
    DECIMAL(38,0) since a web-scale corpus puts 2e6*deg past int64 —
    and phrase scores are integer sums of those, so ranking ties break
    on integers + phrase text: one right answer in any engine.

    Plan: phrase segmentation is one per-doc window (cumulative stopword
    count = phrase id — a linear scan, no self-join); word stats are one
    map-side-combined aggregation over (word); phrase scoring explodes
    the DISTINCT phrase strings only; top-k is a rank-<=-k global window
    (WindowGroupLimit — the same bounded pattern as collocations_pmi).

    Returns ``(phrase, n_words, score_e6, rank)``."""
    sw = list(stopwords or EN_STOPWORDS)
    swarr = F.array(*[F.lit(w) for w in sw])
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    ).where(F.col("word") != "")
    m = toks.withColumn(
        "is_stop", F.array_contains(swarr, F.col("word")).cast("int")
    )
    w_doc = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ph = m.withColumn("pid", F.sum("is_stop").over(w_doc)).where(
        F.col("is_stop") == 0
    )
    # phrase length as a second window over the SAME doc-hash partitioning
    # (hash(doc) already clusters (doc, pid) — no new exchange, only a
    # sort), replacing the r7 groupBy+self-join which re-evaluated the
    # whole explode+window subtree for the length table (r13: one fewer
    # exchange and one fewer subtree execution; identical counts).
    # Null-id caveat (ADVICE r13): "identical counts" assumes non-null doc
    # ids — the old inner join on ['doc','pid'] dropped null-doc rows
    # (null keys never equi-match) while partitionBy groups nulls together
    # and keeps them.  Out of contract here: every caller feeds doc_id
    # from the generated corpus (NOT NULL by construction), and the first
    # window (w_doc) already grouped nulls the same way, so the two
    # windows agree with each other in either regime.
    nw = ph.withColumn(
        "len", F.count("*").over(Window.partitionBy("doc", "pid"))
    )
    wscore = (
        nw.groupBy("word")
        .agg(F.count("*").alias("freq"), F.sum("len").alias("deg"))
        .select(
            "word",
            F.expr(
                "(2 * CAST(deg AS DECIMAL(38,0)) * 1000000 + freq) "
                "div (2 * freq)"
            ).alias("ws"),
        )
    )
    pstr = ph.groupBy("doc", "pid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase")
    )
    cand = pstr.select("phrase").distinct()
    pw = cand.select(
        "phrase", F.explode(F.split("phrase", " ", -1)).alias("word")
    )
    score = (
        pw.join(wscore, "word")
        .groupBy("phrase")
        .agg(F.count("*").alias("n_words"), F.sum("ws").alias("score_e6"))
    )
    w_rank = Window.orderBy(F.desc("score_e6"), "phrase")
    return (
        score.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_k)
        .select(
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("score_e6").cast("long").alias("score_e6"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lexical_diversity(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document lexical-diversity profile: type-token ratio and hapax
    rate — the vocabulary-richness member of the quality family next to
    repetition (which catches the opposite failure: low diversity from
    copy-looping) and char_diversity.  Low TTR flags template/boilerplate
    pages; an anomalously HIGH hapax rate flags gibberish and
    OCR-shredded text — both standard pretraining-corpus screens.

    Exactness: counts are exact integers from one (doc, word) aggregation;
    ``ttr_e6 = half-up(n_types / n_tokens)`` and
    ``hapax_e6 = half-up(n_hapax / n_types)`` use the repo's
    ``(2a*1e6 + b) div (2b)`` integer discipline — small-int ratios are
    precisely the tie class ROUNDING_AUDIT.md bans from round(double).

    Plan: explode -> one map-side-combined (doc, word) count -> one (doc)
    rollup.  Tokens shuffle as md5-bounded words only once; no window, no
    join.  Empty documents report zero counts with NULL ratios.

    Returns ``(doc_id, n_tokens, n_types, n_hapax, ttr_e6, hapax_e6)``."""
    base = df.select(F.col(id_col).alias("doc"))
    wf = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("doc", "word")
        .agg(F.count("*").alias("freq"))
    )
    stats = wf.groupBy("doc").agg(
        F.sum("freq").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.count_if(F.col("freq") == 1).alias("n_hapax"),
    )
    return (
        base.join(stats, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).cast("long").alias("n_types"),
            F.coalesce("n_hapax", F.lit(0)).cast("long").alias("n_hapax"),
            F.expr("(2 * n_types * 1000000 + n_tokens) div (2 * n_tokens)")
            .cast("long")
            .alias("ttr_e6"),
            F.expr("(2 * n_hapax * 1000000 + n_types) div (2 * n_types)")
            .cast("long")
            .alias("hapax_e6"),
        )
    )


def bigram_fluency(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
):
    """Corpus-bigram-LM fluency score per document — the quality-filter
    stage CCNet-style pipelines implement with a KenLM n-gram model
    (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
    from Web Crawl Data", LREC'20), self-trained here on the corpus
    itself: documents whose bigram transitions are common corpus-wide
    score high, word-salad scores low.

    Each bigram position (w1, w2) contributes the add-one-smoothed
    conditional frequency ratio

        c(w1,w2 | corpus):  floor( (c12 + 1) * scale / (c1 + V) )

    (c1 = corpus occurrences of w1 as a bigram head, V = corpus vocabulary
    size) and a document's score is the sum over its positions.  A true LM
    sums LOG-probabilities; the integer ratio keeps the same per-position
    monotone signal while staying exactly reproducible across engines —
    floor-divided BIGINTs have one right answer under any partitioning,
    ln() last-bits do not (the same determinism trade as
    ``importance_weights``).

    Returns ``(doc_id, n_bigrams, fluency_score, avg_prob_e6)``;
    ``avg_prob_e6`` = round-half-up(score / n_bigrams) as BIGINT — the
    mean per-position probability in micro-units (divide by ``scale`` to
    read it as a probability).  Computed entirely in integer space,
    ``(2*score + n) DIV (2*n)``, because the earlier
    ``round(score/n/1e6, 6)`` double formulation diverged between engines
    whenever the quotient landed on a decimal tie (score=442127, n=14 →
    31580.5: Spark's ``round`` half-ups the shortest decimal repr, DuckDB
    rounds the true binary value).  Integer half-up has one right answer
    in every engine — the same determinism trade as ``fluency_score``
    itself.  Documents with fewer than two tokens keep ``n_bigrams = 0``
    and NULL scores — absence of evidence is not a fluency verdict.

    Plan at scale: bigram build is a narrow codegen transform (no
    shuffle); THREE hash shuffles total — bigram-count aggregation
    (map-side combined, so hot pairs collapse per task), the
    positions-to-counts join on (w1, w2), and the per-doc re-aggregation.
    The c1 head-count table derives from the (much smaller) bigram-count
    table, not the raw stream; V is one broadcast scalar.  Hot head words
    in the join are AQE-skew-split.  SCAN count, stated plainly: the
    corpus tokenizes on three branches (count build, probe positions,
    vocabulary) plus a column-pruned id-only scan for the restore join —
    ``df.persist()`` upstream collapses them to one materialization when
    the scan dominates (the branches share no exchange, so Catalyst
    cannot dedupe them itself).
    """
    d = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    big = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (t, i) -> struct(t AS w1, toks[i + 1] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = d.select(F.explode("toks").alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    contrib = F.expr(f"((c12 + 1) * CAST({int(scale)} AS BIGINT)) DIV (c1 + v)")
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(contrib).alias("fluency_score"),
        )
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "fluency_score",
            F.expr(
                "(2 * fluency_score + n_bigrams) DIV (2 * n_bigrams)"
            ).alias("avg_prob_e6"),
        )
    )


def bpe_train(
    df,
    n_merges: int = 10,
    text_col: str = "text",
):
    """Iterative BPE merge-rule training (Sennrich et al., "Neural Machine
    Translation of Rare Words with Subword Units", ACL'16) — the actual
    trainer, not just one round of pair counts (``doc_bpe_merges`` is that
    first round): N rounds of count-adjacent-pairs → take the most
    frequent → merge it everywhere, producing the ordered merge list a
    tokenizer applies at inference.

    Returns ``(merge_rank, left, right, pair_count)``, one row per learned
    merge in order.

    Spark shape: train on the WORD-DISTINCT table (word, corpus_count) —
    the classic trick that makes BPE tractable: pair counts weight by word
    frequency, so the loop touches vocabulary-sized data (millions of
    rows) regardless of corpus size (trillions of tokens).  Per round: one
    pair-count shuffle (map-side combined), a 1-row argmax to the driver
    (TakeOrdered; ties break (count desc, left, right) so the rule
    sequence is deterministic), and a map-side left-to-right merge fold
    (``aggregate`` HOF — the standard non-overlapping BPE scan, 'a a a'
    merges once).  The symbol table is ``localCheckpoint``-ed per round so
    expression nesting and lineage stay flat.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    syms = words.select(
        "wc", F.split("w", "").alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = syms.select(
            "wc",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, greatest(size(syms) - 1, 0)),"
                    " (s, i) -> struct(s AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word is a single symbol already
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        lcol, rcol, mcol = F.lit(left), F.lit(right), F.lit(left + right)

        def merge_fold(acc, s):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lcol)
                & (s == rcol)
            )
            return F.when(
                hit,
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(mcol)),
            ).otherwise(F.concat(acc, F.array(s)))

        syms = syms.select(
            "wc",
            F.aggregate(
                "syms", F.array().cast("array<string>"), merge_fold
            ).alias("syms"),
        ).localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


def bpe_apply(
    df,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Apply an ordered BPE merge-rule list (the output of
    :func:`bpe_train`) — the inference side of the tokenizer: segment
    every document into subword tokens and report per-doc counts.

    ``merges``: the ``bpe_train`` result DataFrame, or a list of
    ``(left, right)`` pairs in merge order.  Returns
    ``(doc_id, n_words, n_subwords)``.

    Scale shape: merges apply on the WORD-DISTINCT table (tokenization is
    a pure function of the word), so the per-word merge loop — an Arrow
    ``mapInArrow`` pass carrying the rule list in the task closure — runs
    over vocabulary-sized data regardless of corpus size; real tokenizers
    have ~32k rules, which makes a rules-length chain of JVM folds
    unreasonable while a Python loop over distinct words stays tiny.  The
    corpus-side work is one explode + join on the word (the vocabulary
    side broadcasts when small) + per-doc aggregation.
    """
    import pyarrow as pa

    if not isinstance(merges, list):
        merges = [(r["left"], r["right"]) for r in merges.orderBy("merge_rank").collect()]
    ranks = {pair: i for i, pair in enumerate(merges)}

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )

    def tokenize(batches):
        def word_toks(w):
            sy = list(w)
            # canonical BPE apply: repeatedly merge the LOWEST-rank pair
            # present (order matters: rule 0 before rule 1, everywhere)
            while len(sy) > 1:
                best, best_i = None, -1
                for i, pair in enumerate(zip(sy, sy[1:])):
                    rk = ranks.get(pair)
                    if rk is not None and (best is None or rk < best):
                        best, best_i = rk, i
                if best is None:
                    break
                sy[best_i : best_i + 2] = [sy[best_i] + sy[best_i + 1]]
            return sy

        for rb in batches:
            ws = rb.column(0).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(ws), pa.array([word_toks(w) for w in ws])],
                names=["w", "toks"],
            )

    vocab = words.mapInArrow(tokenize, schema="w string, toks array<string>")
    doc_words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).where(F.col("w") != "")
    return (
        doc_words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("toks")).alias("n_subwords"),
        )
    )


def k_anonymity(df, quasi_cols: list[str], k: int = 5):
    """k-anonymity audit over quasi-identifier columns (Sweeney, "k-anonymity:
    a model for protecting privacy", IJUFKS'02): every row joined with the
    size of its quasi-identifier equivalence class and a flag for whether
    that class meets the ``k`` threshold — the release-gate check a
    privacy-aware corpus pipeline runs next to PII masking (`mask_pii`
    removes direct identifiers; this measures re-identification risk from
    the INDIRECT ones).

    Returns one row per equivalence class: ``(*quasi_cols, class_size,
    k_anonymous)``.  Suppress/generalize classes with ``k_anonymous =
    false`` before release.

    One map-side-combined aggregation on the quasi columns — the output is
    class-count-sized, never row-sized, at any corpus scale."""
    if not quasi_cols:
        raise ValueError("k_anonymity needs at least one quasi-identifier column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("class_size"))
        .withColumn("k_anonymous", F.col("class_size") >= k)
    )


def distribution_drift(
    df,
    slice_col: str,
    base: str,
    text_col: str = "text",
    scale: int = 1_000_000,
):
    """Token-distribution DRIFT of every slice against a base slice, as
    total-variation distance — the distribution-shift monitor a corpus
    pipeline runs when a new crawl/source lands (TV = max probability a
    single event distinguishes the distributions; 0 = identical, 1 =
    disjoint).

    TV(p, q) = 1/2 * sum_t |p_t - q_t| computes EXACTLY from integer
    counts: with per-slice token counts c_t and totals N,
    ``sum_t |c_t * N_base - b_t * N_slice|`` is an exact integer
    numerator over the exact ``2 * N_slice * N_base`` denominator — no
    floating-point sum ordering anywhere until the final scaled division
    (``tv_e6`` = floor of 1e6 * TV).  (A KL/JS divergence needs logs,
    whose last bits differ across engines; TV carries the same drift
    signal exactly — the determinism trade of ``importance_weights``.)

    Returns one row per non-base slice: ``(slice, n_tokens, tv_e6)``.

    Shuffles: one (slice, token) count aggregation (map-side combined),
    a token-level full outer join of each slice against the base counts,
    one final per-slice sum.  Token counts are vocabulary-sized, never
    corpus-sized.  Counts ride DECIMAL(38,0) products so web-scale totals
    (N ~ 1e12) cannot overflow the cross-products.
    """
    toks = df.select(
        F.col(slice_col).alias("sl"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy("sl", "tok").agg(F.count("*").alias("c"))
    totals = counts.groupBy("sl").agg(F.sum("c").alias("n"))
    basec = counts.where(F.col("sl") == base).select(
        F.col("tok").alias("btok"), F.col("c").alias("bc")
    )
    base_n = totals.where(F.col("sl") == base).select(
        F.col("n").alias("bn")
    )
    other = counts.where(F.col("sl") != base)
    joined = (
        other.join(basec, other["tok"] == basec["btok"], "full")
        .join(
            totals.withColumnRenamed("sl", "tsl"),
            F.coalesce(F.col("sl"), F.lit("__none__")) == F.col("tsl"),
            "left",
        )
        .crossJoin(F.broadcast(base_n))
    )
    # a token absent from one side contributes its full mass on the other;
    # tokens absent from the base still need the SLICE identity, which a
    # full-outer row lacks when sl is null (base-only token): those rows
    # must fan out to EVERY non-base slice — handled by computing base-only
    # mass separately below.
    dec = "decimal(38,0)"
    term = F.abs(
        F.coalesce(F.col("c"), F.lit(0)).cast(dec) * F.col("bn").cast(dec)
        - F.coalesce(F.col("bc"), F.lit(0)).cast(dec) * F.coalesce(
            F.col("n"), F.lit(0)
        ).cast(dec)
    )
    present = (
        joined.where(F.col("sl").isNotNull())
        .groupBy("sl", "n")
        .agg(F.sum(term).alias("num_present"))
    )
    # base tokens this slice lacks entirely: sum of bc over tokens not in
    # the slice = bn - (sum of bc over shared tokens)
    shared_bc = (
        other.join(basec, other["tok"] == basec["btok"])
        .groupBy("sl")
        .agg(F.sum("bc").alias("shared_bc"))
    )
    out = (
        present.join(shared_bc, "sl", "left")
        .crossJoin(F.broadcast(base_n))
        .select(
            F.col("sl").alias("slice"),
            F.col("n").alias("n_tokens"),
            # the FINAL division is integral DIV: engines agree exactly on
            # integer division, while decimal division rounds to a result
            # scale first (observed one-ulp drift vs DuckDB //).  The whole
            # numerator — including the multiply-by-scale — stays
            # DECIMAL(38,0) so nothing silently wraps at ~2e6 tokens/slice
            # the way a BIGINT intermediate would under non-ANSI
            # arithmetic; Spark's DIV accepts decimal operands and returns
            # BIGINT (quotient <= scale, always representable)
            F.expr(
                f"(CAST(num_present + (CAST(bn AS {dec})"
                f" - CAST(coalesce(shared_bc, 0) AS {dec}))"
                f" * CAST(n AS {dec}) AS {dec}) * CAST({int(scale)} AS {dec}))"
                f" DIV (CAST(2 AS {dec}) * CAST(n AS {dec}) * CAST(bn AS {dec}))"
            ).alias("tv_e6"),
        )
    )
    return out


QUALITY_HASH_DIM = 64


def quality_classifier_weights(dim: int = QUALITY_HASH_DIM) -> list[int]:
    """Deterministic integer weight vector for the hashing-trick linear
    scorer, in milli-units in [-500, 499]: ``w[i] = (i * 2654435761 + 40503)
    % 1000 - 500`` (Knuth multiplicative mixing).  Pseudo-random but
    data-independent and engine-reproducible — a SQL oracle regenerates the
    identical table, so the classifier is exactly differentially testable.
    In production the list would come from a trained model's coefficient
    dump; the operator below is indifferent to where the ints come from."""
    return [((i * 2654435761 + 40503) % 1000) - 500 for i in range(dim)]


def quality_classifier_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = QUALITY_HASH_DIM,
    weights: list[int] | None = None,
):
    """fastText-style document quality classifier: a linear model over
    hashed bag-of-words features — the standard web-corpus quality gate
    (e.g. the CCNet/LLaMA "looks like Wikipedia" filter), re-expressed as a
    pure JVM column pipeline.

    Feature index = first 32 md5 bits of the token, mod ``dim`` (the
    hashing trick); score_e3 = SUM of integer milli-weights over tokens.
    Integer accumulation makes the score associative-exact, so the result
    is independent of partitioning and identical across engines — a float
    dot product would drift under reordering.

    Returns (doc_id, n_tokens, score_e3, is_quality) with
    ``is_quality = score_e3 > 0``.

    Scale: zero shuffle, zero UDF, zero join — the weight vector rides the
    plan as a 64-element array literal (O(1) ``element_at`` per token) and
    everything is one map-side projection inside WholeStageCodegen.  At
    100 TB this runs at scan speed; a real model swap (say 2^18 buckets)
    only grows the literal array."""
    w = weights if weights is not None else quality_classifier_weights(dim)
    if len(w) != dim:
        raise ValueError(f"weights must have length dim={dim}, got {len(w)}")
    warr = F.array(*[F.lit(int(x)).cast("bigint") for x in w])
    toks = tokens(F.col(text_col))
    feat = F.transform(
        toks,
        lambda t: F.element_at(
            warr,
            (
                F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
                % F.lit(dim)
            ).cast("int")
            + F.lit(1),
        ),
    )
    score = F.aggregate(feat, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    # Two-stage projection so the fold is evaluated ONCE per row:
    # is_quality references the score_e3 attribute, and CollapseProject
    # keeps the stages separate because the fold is non-cheap (a same-level
    # formulation duplicates the whole aggregate into both columns).
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        score.alias("score_e3"),
    )
    return scored.withColumn("is_quality", F.col("score_e3") > 0)


def collocations_pmi(
    df,
    min_count: int = 5,
    k: int = 100,
    text_col: str = "text",
):
    """Corpus collocation mining via Pointwise Mutual Information:
    ``pmi(w1, w2) = ln(c12 * N / (c1 * c2))`` over adjacent word pairs —
    the classic phrase-extraction signal (Church & Hanks 1990) used to
    seed tokenizer merge candidates and multi-word vocabulary entries.
    Returns the top-``k`` pairs with ``c12 >= min_count`` ranked by PMI
    (ties break on the pair itself).

    All counts are corpus-exact BIGINTs; only the final PMI is a double
    (ln -> irrational, so ``round(,6)`` is the audited-safe display per
    ROUNDING_AUDIT.md — and REQUIRED, absorbing last-ulp libm
    differences).  N is the bigram-position total, and unigram counts
    c1/c2 count bigram-start/any-position occurrences from the same
    exploded stream, so the probabilities share one event space.

    Plan: one narrow bigram build (no shuffle), one pair-count
    aggregation (map-side combined — hot pairs collapse per task), one
    unigram aggregation from the same stream, two broadcast-sized joins
    of the count tables (pair table joins unigram table on each side),
    TakeOrderedAndProject top-k.  The corpus text is scanned once."""
    toks = df.select(tokens(F.col(text_col)).alias("ts")).where(F.size("ts") >= 2)
    big = toks.select(
        F.explode(
            F.expr(
                "transform(slice(ts, 1, size(ts) - 1),"
                " (t, i) -> struct(t AS w1, ts[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pairs = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # unigram counts and N derive from the PAIR-COUNT table, not the raw
    # bigram stream: sum(c12) grouped by each side equals the per-word
    # position count exactly, and the pairs table is vocabulary²-bounded —
    # so the corpus text is scanned ONCE however large it is
    uni = (
        pairs.select(F.col("w1").alias("w"), "c12")
        .unionAll(pairs.select(F.col("w2").alias("w"), "c12"))
        .groupBy("w")
        .agg(F.sum("c12").alias("c"))
    )
    ntab = pairs.agg(F.sum("c12").alias("nb"))  # 1-row scalar, broadcast back
    scored = (
        pairs.where(F.col("c12") >= min_count)
        .join(uni.withColumnsRenamed({"w": "w1", "c": "c1"}), "w1")
        .join(uni.withColumnsRenamed({"w": "w2", "c": "c2"}), "w2")
        .crossJoin(F.broadcast(ntab))
        .withColumn(
            "pmi_raw",
            F.log(
                F.col("c12").cast("double")
                * (F.col("nb") * 2).cast("double")
                / (F.col("c1").cast("double") * F.col("c2").cast("double"))
            ),
        )
    )
    w = Window.orderBy(F.desc("pmi_raw"), "w1", "w2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("c2").cast("long").alias("c2"),
            F.round("pmi_raw", 6).alias("pmi"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document token-diversity via Rényi-2 (collision) entropy:
    ``H2 = ln(n² / Σc²)`` over the whitespace-token counts ``c`` — 0 for a
    single repeated token, ``ln(n)`` when all tokens are distinct.  The
    repetition/diversity quality signal in corpus-filter form (low H2 =
    keyboard-mash / template junk), chosen over Shannon entropy
    deliberately: the collision statistic ``Σc²`` is an exact integer, so
    the ONLY double is one final ``ln`` of an exact rational — the same
    audited-safe transcendental-display class as ``collocations_pmi``
    (ROUNDING_AUDIT.md), where a Shannon ``Σ c·ln c`` would be an
    order-dependent double sum no rounding can make portable.

    Returns ``(id, n_tokens, n_distinct, collision_sumsq, renyi2)`` with
    ``renyi2`` rounded at 6.

    Scale: ZERO shuffle — sort each doc's token array and fold run
    lengths in ONE JVM higher-order ``aggregate`` (state: previous token,
    run length, Σc², distinct count); a pure projection over the corpus
    scan, embarrassingly parallel at any size.  The groupBy(doc, token)
    formulation the oracle uses would shuffle the full token stream."""
    toks = F.array_sort(F.split(F.col(text_col), " "))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("ss"),
        F.lit(0).cast("long").alias("nd"),
    )

    def step(acc, x):
        new_run = acc["prev"].isNull() | (x != acc["prev"])
        return F.when(
            new_run,
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (acc["ss"] + acc["run"] * acc["run"]).alias("ss"),
                (acc["nd"] + 1).alias("nd"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["ss"].alias("ss"),
                acc["nd"].alias("nd"),
            )
        )

    folded = F.aggregate(
        toks,
        init,
        step,
        lambda acc: F.struct(
            (acc["ss"] + acc["run"] * acc["run"]).alias("ss"),
            acc["nd"].alias("nd"),
        ),
    )
    out = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        folded["nd"].alias("n_distinct"),
        folded["ss"].alias("collision_sumsq"),
    )
    return out.withColumn(
        "renyi2",
        F.round(
            F.log(
                F.col("n_tokens").cast("double")
                * F.col("n_tokens").cast("double")
                / F.col("collision_sumsq").cast("double")
            ),
            6,
        ),
    )


def zipf_slope(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    top_k: int = 256,
    min_count: int = 1,
) -> DataFrame:
    """Zipf rank-frequency fit per corpus slice: OLS slope/intercept of
    ``ln(count)`` against ``ln(rank)`` over the ``top_k`` most frequent
    tokens — the corpus-health diagnostic (natural text sits near slope
    -1; template spam and shuffled junk flatten or steepen it, Zipf 1949
    / Piantadosi 2014).  Returns one row per group:
    ``(group, n_types, top_count, slope, intercept)``.

    Determinism: ranks come from ``row_number`` ordered by
    ``(count DESC, token ASC)`` — a total order, so both engines assign
    identical (rank, count) pairs and the fitted line is a function of
    exact integers.  ``slope``/``intercept`` pass through ``ln`` ->
    irrational, the audited-safe ``round(,6)`` display class
    (ROUNDING_AUDIT.md); the sums are top_k-bounded (<= 256 terms) so
    cross-engine last-ulp drift stays ~1e-13, far from digit 7.

    Plan: ONE token-stream shuffle — groupBy(group, token) with map-side
    partial combine collapses the corpus to a vocabulary-sized count
    table; the rank window's ``row_number <= top_k`` filter triggers
    Spark's WindowGroupLimit pushdown, so each shuffle partition keeps
    only its local top-k candidates before the per-group sort; the final
    per-group OLS aggregates <= top_k rows.  ``min_count`` prunes the
    hapax tail BEFORE the window exchange when a 100 TB vocabulary's
    singleton mass (typos, hashes) would dominate the count table."""
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("g", "tok").agg(F.count("*").alias("c"))
    if min_count > 1:
        counts = counts.where(F.col("c") >= min_count)
    w = Window.partitionBy("g").orderBy(F.desc("c"), "tok")
    ranked = (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= top_k)
        .select(
            "g",
            "c",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    agg = ranked.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.max("c").cast("long").alias("top_count"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    denom = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    # a group with a single ranked token has x = ln(1) = 0 for its only
    # point -> denominator 0 -> 0/0 NaN; gate on D > 0 like ols_trend and
    # report NULL (a one-point "fit" has no slope)
    slope = F.when(
        denom > 0, (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    )
    return (
        agg.withColumn("slope_raw", slope)
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_types"),
            "top_count",
            F.round("slope_raw", 6).alias("slope"),
            F.round((F.col("sy") - F.col("slope_raw") * F.col("sx")) / nd, 6).alias(
                "intercept"
            ),
        )
    )


def ks_drift(
    df: DataFrame,
    slice_col: str = "source",
    value_col: str = "n_chars",
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between EVERY pair of
    corpus slices over an integer-valued column — the
    distribution-shift monitor for ordered quantities (doc length,
    token count, quality score) that total-variation drift
    (:func:`distribution_drift`) cannot rank, because TV ignores the
    ordering of the value axis.

    D = sup_v |F_a(v) - F_b(v)| computes EXACTLY from integer counts:
    the ECDFs step only at observed values, so with per-slice
    cumulative counts ``cum`` and totals ``n``,
    ``ks_num = max_v |cum_a(v) * n_b - cum_b(v) * n_a|`` is an exact
    integer over the exact ``n_a * n_b`` denominator.  No double exists
    anywhere; the report is ``ks_e6 = (ks_num * 1e6) DIV (n_a * n_b)``
    with DECIMAL(38,0) products, the ``tv_e6`` discipline — web-scale
    slice counts (1e12 docs) cannot overflow and both engines floor the
    same rational.

    Returns ``(slice_a, slice_b, n_a, n_b, ks_num, ks_e6)`` for
    slice_a < slice_b.

    Shuffles: ONE corpus aggregation groupBy(slice, value) — the table
    after it is (slices x distinct values)-bounded; the slice-pair grid
    is broadcast (S² tiny); the per-pair cumulative window partitions by
    (slice_a, slice_b), so pairs scan in parallel and each partition
    holds one pair's distinct-value rows (domain-bounded — for an
    unbounded value domain, bucket values or rank them with
    dedup.global_sorted_index first)."""
    c = df.groupBy(
        F.col(slice_col).alias("sl"), F.col(value_col).alias("v")
    ).agg(F.count("*").alias("cnt"))
    slices = c.select("sl").distinct()
    pr = (
        slices.withColumnRenamed("sl", "sa")
        .join(slices.withColumnRenamed("sl", "sb"))
        .where(F.col("sa") < F.col("sb"))
    )
    ma = F.broadcast(pr).join(c, F.col("sl") == F.col("sa")).select(
        "sa", "sb", "v", F.col("cnt").alias("ca"), F.lit(0).alias("cb")
    )
    mb = F.broadcast(pr).join(c, F.col("sl") == F.col("sb")).select(
        "sa", "sb", "v", F.lit(0).alias("ca"), F.col("cnt").alias("cb")
    )
    g = (
        ma.unionByName(mb)
        .groupBy("sa", "sb", "v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    wp = Window.partitionBy("sa", "sb")
    w = wp.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = "decimal(38,0)"
    stepped = g.select(
        "sa",
        "sb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wp).alias("na"),
        F.sum("cb").over(wp).alias("nb"),
    )
    num = F.abs(
        F.col("cum_a").cast(dec) * F.col("nb").cast(dec)
        - F.col("cum_b").cast(dec) * F.col("na").cast(dec)
    )
    return (
        stepped.groupBy(
            F.col("sa").alias("slice_a"), F.col("sb").alias("slice_b")
        )
        .agg(
            F.any_value("na").cast("long").alias("n_a"),
            F.any_value("nb").cast("long").alias("n_b"),
            F.max(num).alias("ks_dec"),
        )
        .select(
            "slice_a",
            "slice_b",
            "n_a",
            "n_b",
            F.col("ks_dec").cast("long").alias("ks_num"),
            F.expr(
                f"(CAST(ks_dec AS {dec}) * CAST({int(scale)} AS {dec}))"
                f" DIV (CAST(n_a AS {dec}) * CAST(n_b AS {dec}))"
            ).alias("ks_e6"),
        )
    )


def token_burstiness(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Burstiness (variance-to-mean ratio / Fano factor) of the ``k``
    highest-mass corpus tokens: content words are BURSTY (a doc that
    mentions them once mentions them again; VMR >> 1) while function
    words arrive near-Poisson (VMR ~ 1) — the Church & Gale (1995)
    signal behind stopword discovery, keyword weighting, and
    boilerplate detection, where raw frequency alone cannot separate
    the two.

    With per-document counts c over ALL n docs (absent = 0),
    VMR = var/mean = (n·Σc² − (Σc)²) / ((n−1)·Σc) — an exact rational
    of three integer power sums, reported as the floored ``vmr_e6``
    via DECIMAL(38,0) integral DIV.  Zero-count docs contribute
    nothing to Σc/Σc², so the sums aggregate over PRESENT rows only
    while n rides in as a broadcast scalar: the absent mass is handled
    algebraically, never materialized.

    Returns ``(tok, df, total_c, vmr_e6)`` for the top-``k`` tokens by
    total count (ties to token order).

    Scale: one map-side-combined (token) aggregation of the exploded
    stream (vocabulary-sized output), a global top-k
    (TakeOrderedAndProject — never a full sort), one 1-row broadcast
    for n."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    per_doc = toks.groupBy("id", "tok").agg(F.count("*").alias("c"))
    per_tok = per_doc.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    top = per_tok.orderBy(F.desc("s1"), "tok").limit(k)
    n_docs = df.agg(F.count("*").alias("n"))
    dec = "decimal(38,0)"
    return (
        top.crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            F.col("df").cast("long").alias("df"),
            F.col("s1").cast("long").alias("total_c"),
            F.expr(
                f"CAST(((CAST(n AS {dec}) * CAST(s2 AS {dec})"
                f" - CAST(s1 AS {dec}) * CAST(s1 AS {dec}))"
                f" * CAST({int(scale)} AS {dec}))"
                f" DIV (CAST(n - 1 AS {dec}) * CAST(s1 AS {dec}))"
                f" AS BIGINT)"
            ).alias("vmr_e6"),
        )
    )


def quality_survival_curve(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus survival curve for the quality cutoff: per quality decile,
    document count AND token mass, with the cumulative "what survives a
    cutoff of t" tail — the tuning curve for the pipeline's most
    consequential knob (every LLM corpus build picks a quality threshold;
    this reads the doc/token cost of each candidate cutoff from ONE pass
    instead of re-running the filter per threshold).  Token mass is the
    column that matters: quality and length correlate, so the token curve
    falls faster than the doc curve — sizing a training run on doc counts
    overestimates the surviving corpus.

    Bucket = least(floor(quality*10), 10): the quality double is
    bit-identical across engines (pure rational arithmetic, see
    quality_score), so the derived integer bucket is too.  Zero buckets
    report via the 11-row spine (design shared with
    dedup.jaccard_threshold_curve).

    Scale: one map-side scoring pass (zero-shuffle expressions), one
    <= 11-group aggregate; the spine join and running tail operate on 11
    rows."""
    scored = df.select(
        # NULL text (failed extraction) is the LOW-quality case; without
        # the guard, least() skips the NULL and files it under bucket 10
        # — the top decile (DuckDB's least agrees, so the oracle gate
        # alone could not catch it)
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(
            F.least(
                F.floor(quality_score(F.col(text_col)) * 10).cast("int"),
                F.lit(10),
            )
        )
        .alias("bucket"),
        # guard the token column like the bucket: under non-ANSI Spark
        # (legacy.sizeOfNull) size(regexp_extract_all(NULL)) is -1, not
        # NULL, and a coalesce would pass the -1 through into token mass
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.coalesce(token_count_regex(F.col(text_col)), F.lit(0)))
        .alias("n_tok"),
    )
    hist = scored.groupBy("bucket").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    spine = df.sparkSession.range(0, 11).select(
        F.col("id").cast("int").alias("bucket")
    )
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    joined = spine.join(F.broadcast(hist), "bucket", "left").select(
        "bucket",
        (F.col("bucket").cast("double") / F.lit(10.0)).alias("q_lo"),
        F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
    )
    return joined.select(
        "bucket",
        "q_lo",
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(w).cast("bigint").alias("docs_at_or_above"),
        F.sum("n_tokens").over(w).cast("bigint").alias("tokens_at_or_above"),
    )
