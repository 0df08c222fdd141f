"""Text-analysis operators for large-scale training-data pipelines.

Driver-mandated extension (not in the reference surface): language ID,
quality scoring, token counting, document fingerprinting — all pure
``pyspark.sql.functions`` expressions (JVM-side, whole-stage codegen),
no Python UDFs, so they run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio
# heuristic; enough to separate the testdata languages deterministically
_LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es": ("el", "la", "los", "que", "y", "es", "en", "un", "por", "con"),
}


def _word_array(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}']+"), lambda w: F.length(w) > 0
    )


def language_id(col: Column) -> Column:
    """Heuristic language ID: argmax over per-language stopword hits.

    Returns a language code or 'und'. Pure Column expression — evaluated
    inline during the scan.
    """
    words = _word_array(col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(
            F.filter(words, lambda w: w.isin(*[F.lit(m) for m in markers]))
        )
        scores.append(F.struct(hits.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_word_array(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored token estimate: word pieces of ≤4 chars — counts
    ceil(len(word)/4) per word plus punctuation runs. Deterministic and
    cheap; a stand-in for a real tokenizer at pipeline-sizing time."""
    words = _word_array(col)
    word_pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    punct = F.size(
        F.filter(
            F.split(col, r"\s+"), lambda t: t.rlike(r"^\p{Punct}+$")
        )
    )
    return word_pieces + punct


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length band,
    alpha ratio, punctuation ratio, stopword ratio, mean word length.
    All sub-signals are Column expressions over one pass."""
    n_chars = F.length(col)
    words = _word_array(col)
    n_words = F.size(words)
    alpha = F.length(F.regexp_replace(col, r"[^\p{L}]", ""))
    punct = F.length(F.regexp_replace(col, r"[^\p{Punct}]", ""))
    all_stop = [m for ms in _LANG_MARKERS.values() for m in ms]
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*[F.lit(m) for m in all_stop])))

    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_penalty = F.when(n_chars > 0, 1.0 - F.least(punct * 5.0 / n_chars, F.lit(1.0))).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, F.least(stop_hits * 3.0 / n_words, F.lit(1.0))).otherwise(F.lit(0.0))
    mean_wl = F.when(n_words > 0, F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words).otherwise(F.lit(0.0))
    wl_score = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))

    return F.round(
        0.25 * len_score + 0.25 * alpha_ratio + 0.2 * punct_penalty
        + 0.15 * stop_ratio + 0.15 * wl_score,
        6,
    )


def repetition_metrics(df, text_col: str, id_col: str):
    """Gopher/MassiveText-style repetition filters per document:
    duplicate-line ratio, duplicate-word ratio, and the fraction of
    tokens taken by the single most frequent word — the standard
    signals for dropping boilerplate / spam / degenerate pages from a
    training corpus.

    Line and word dup ratios are pure Column expressions (array ops,
    whole-stage codegen). The top-word fraction needs per-word counts,
    so it runs as explode → groupBy(id, word) → groupBy(id) — partial
    aggregation collapses repeated words map-side, and the final join
    is on the id key. Tokenization uses the engine-portable
    ``[a-z0-9']`` word class so the whole row is oracle-checkable.
    """
    from pyspark.sql import functions as F

    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    words = F.filter(
        F.split(F.lower(text), r"[^a-z0-9']+"), lambda w: F.length(w) > 0
    )
    n_lines = F.size(lines)
    n_words = F.size(words)
    base = df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        F.round(
            F.when(
                n_lines > 0,
                1.0 - F.size(F.array_distinct(lines)) / n_lines,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_ratio"),
        n_words.alias("n_words"),
        F.round(
            F.when(
                n_words > 0,
                1.0 - F.size(F.array_distinct(words)) / n_words,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_word_ratio"),
    )
    counts = (
        df.select(F.col(id_col), F.explode(words).alias("__w"))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.round((F.max("__c") / F.sum("__c")), 6).alias("top_word_frac")
        )
    )
    return base.join(counts, on=id_col, how="left").select(
        id_col,
        "n_lines",
        "dup_line_ratio",
        "n_words",
        "dup_word_ratio",
        F.coalesce(F.col("top_word_frac"), F.lit(0.0)).alias("top_word_frac"),
    )


def _md5_64(col: Column) -> Column:
    """60-bit hash from the md5 hex prefix — exactly reproducible in
    other engines (DuckDB: ``CAST('0x' || substr(md5(x),1,15) AS
    BIGINT)``); the oracle-checkable alternative to xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint(col: Column, window: int = 8, hash_fn: str = "xxhash64") -> Column:
    """Rolling-hash document fingerprint (winnowing-style): min over a
    sliding window of word-shingle hashes → 64-bit stable id. Content
    changes anywhere shift the fingerprint; whitespace-normalized.
    ``hash_fn='md5_64'`` swaps in the engine-portable hash."""
    h = _md5_64 if hash_fn == "md5_64" else F.xxhash64
    words = _word_array(col)
    shingle_hashes = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.size(words) - window, F.lit(0)),
        ),
        lambda i: h(F.array_join(F.slice(words, i + 1, window), " ")),
    )
    return F.coalesce(F.array_min(shingle_hashes), h(col))


def analyze_documents(
    df: DataFrame, text_col: str = "text", id_col: Optional[str] = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-pass text profile of a documents table."""
    c = F.col(text_col)
    out = df.select(
        *([F.col(id_col)] if id_col else []),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        language_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c, hash_fn=hash_fn).alias("fingerprint"),
    )
    return out


# ---------------------------------------------------------------------------
# corpus cleaning: paragraph-level dedup + PII redaction (C4-style)
# ---------------------------------------------------------------------------

def remove_repeated_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_occurrences: int = 2,
    delimiter: str = "\n",
) -> DataFrame:
    """C4-style boilerplate removal: drop every paragraph whose EXACT
    text occurs ``min_occurrences``+ times across the corpus (nav bars,
    cookie banners, license footers), then reassemble each document in
    original paragraph order. Returns ``(id_col, <text_col>_clean,
    n_kept, n_removed)``.

    Scale shape: one split+posexplode (no shuffle), one
    ``groupBy(paragraph)`` count with map-side partial aggregation
    (the exchange carries one row per DISTINCT paragraph per task),
    a left-anti join against the (small) repeated-paragraph set — a
    broadcast at any realistic boilerplate cardinality — and one
    ``groupBy(doc)`` reassembly; paragraph order is restored via
    ``array_sort`` over (index, paragraph) structs, not a window.
    Documents whose every paragraph was boilerplate come back with an
    empty string (the survivor decision is the caller's).
    """
    # \Q...\E quoting: the delimiter is a LITERAL (reassembly joins with
    # the same literal), so regex metacharacters must not fire in split
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E")
        ).alias("__idx", "__para"),
    )
    repeated = (
        paras.groupBy("__para")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_occurrences)
        .select("__para")
    )
    kept = paras.join(repeated, on="__para", how="left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__idx"), F.col("__para")))
                ),
                lambda s: s["__para"],
            ),
            delimiter,
        ).alias(f"{text_col}_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("__total"))
    return (
        totals.join(reassembled, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(f"{text_col}_clean"), F.lit("")).alias(
                f"{text_col}_clean"
            ),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("__total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 5,
    min_stopword_ratio: float = 0.0,
    max_symbol_ratio: float = 0.30,
    stopwords: Optional[Sequence[str]] = None,
    delimiter: str = "\n",
) -> DataFrame:
    """jusText-style INTRA-document boilerplate removal: classify each
    paragraph by its own shape — word count, stopword density, symbol
    (non-letter) density — and keep only content-like paragraphs
    (jusText's context-free classifier; corpus.tools/wiki/Justext).
    Complements :func:`remove_repeated_paragraphs` (C4's CORPUS-level
    exact-repeat rule): nav bars, "© 2024 …" footers and link lists
    fall to this even when they appear once. Returns
    ``(id_col, <text_col>_clean, n_kept, n_removed)``.

    Scale shape: entirely MAP-SIDE — the paragraph array is split,
    classified and re-joined with higher-order functions inside one
    projection (whole-stage codegen, zero shuffles, zero UDFs), so it
    composes with any downstream op at scan speed; there is no
    corpus-wide state, unlike the repeated-paragraph variant."""
    sw = [w.lower() for w in (stopwords or _LANG_MARKERS["en"])]

    def words_of(p: Column) -> Column:
        return F.filter(
            F.split(F.lower(p), r"[^\p{L}\p{N}']+"),
            lambda w: F.length(w) > 0,
        )

    def keep(p: Column) -> Column:
        ws = words_of(p)
        wc = F.size(ws)
        sw_n = F.size(F.filter(ws, lambda w: w.isin(*sw)))
        # share of non-letter, non-whitespace characters (| © • digits
        # in menus/footers push this up; prose stays low)
        symbols = F.length(
            F.regexp_replace(p, r"[\p{L}\s]", "")
        )
        sym_ratio = symbols / F.greatest(F.length(p), F.lit(1))
        return (
            (wc >= F.lit(int(min_words)))
            & (sym_ratio <= F.lit(float(max_symbol_ratio)))
            & (
                (sw_n / F.greatest(wc, F.lit(1)))
                >= F.lit(float(min_stopword_ratio))
            )
        )

    paras = F.split(F.col(text_col), "\\Q" + delimiter + "\\E")
    kept = F.filter(paras, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept, delimiter).alias(f"{text_col}_clean"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(paras) - F.size(kept)).cast("long").alias("n_removed"),
    )


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB/production scanners): no alternation, greedy
# character classes only, so leftmost-first and leftmost-longest agree.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\s.-]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str,
    id_col: Optional[str] = None,
    patterns: Sequence = PII_PATTERNS,
    with_counts: bool = True,
) -> DataFrame:
    """Regex-redact PII spans (emails, IPs, phone numbers by default)
    in a fixed order, optionally counting matches per category — pure
    Column expressions, zero Python, scan-side at any scale. Order
    matters: emails first (their local part looks phone-like), then
    IPs, then phones."""
    c = F.col(text_col)
    cols = [F.col(id_col)] if id_col else []
    if with_counts:
        probe = c
        for name, pat, _token in patterns:
            cols.append(
                F.size(F.regexp_extract_all(probe, F.lit(pat), F.lit(0)))
                .cast("long")
                .alias(f"n_{name}"),
            )
            # later counts run on text with earlier categories already
            # replaced, mirroring the redaction order exactly
            probe = F.regexp_replace(probe, pat, "")
    red = c
    for _name, pat, token in patterns:
        red = F.regexp_replace(red, pat, token)
    cols.append(red.alias(f"{text_col}_redacted"))
    others = [
        F.col(x) for x in df.columns if x not in (id_col, text_col)
    ]
    return df.select(*cols, *others)


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    eval_text_col: Optional[str] = None,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, count the
    word ``n``-grams it shares with ANY document of an evaluation set
    (the standard n-gram-overlap contamination test run before
    training). Returns ``(id_col, contaminated_ngrams, total_ngrams,
    contamination, is_contaminated)``.

    Scale shape: both sides shingle scan-side (whitespace-normalized
    word n-grams via sequence/slice — no Python); the eval side's
    DISTINCT gram set is orders of magnitude smaller than the corpus
    (benchmarks are small by definition) and is broadcast, so the
    membership test is a broadcast hash join against the corpus's
    exploded grams followed by one groupBy(doc) count — the corpus is
    scanned once and never shuffled on raw text.
    """
    eval_text_col = eval_text_col or text_col
    # null-text rows carry no n-grams: drop them up front (otherwise
    # size(null)=-1 arithmetic would fabricate a 1-gram total)
    corpus = corpus.where(F.col(text_col).isNotNull())
    eval_df = eval_df.where(F.col(eval_text_col).isNotNull())

    def grams(df: DataFrame, col: str, keep_id: bool):
        words = F.split(
            F.regexp_replace(F.lower(F.col(col)), r"\s+", " "), " "
        )
        g = F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(words) - n, F.lit(0)) 
            ),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
        cols = [F.col(id_col)] if keep_id else []
        return df.select(*cols, F.explode(g).alias("__gram"))

    eval_grams = grams(eval_df, eval_text_col, keep_id=False).distinct()
    corpus_grams = grams(corpus, text_col, keep_id=True)
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), on="__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    words = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "
    )
    # the gram generator always yields greatest(size-n, 0)+1 grams (a
    # short doc contributes one truncated gram), so totals mirror that
    totals = corpus.select(
        F.col(id_col),
        (F.greatest(F.size(words) - n, F.lit(0)) + 1)
        .cast("long")
        .alias("total_ngrams"),
    )
    return (
        totals.join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("contaminated_ngrams"), F.lit(0))
            .cast("long")
            .alias("contaminated_ngrams"),
            F.col("total_ngrams").cast("long"),
            F.round(
                F.coalesce(F.col("contaminated_ngrams"), F.lit(0))
                / F.col("total_ngrams"),
                6,
            ).alias("contamination"),
            (F.coalesce(F.col("contaminated_ngrams"), F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF — the classic keyword/
    topic summary over a corpus. Returns ``(id_col, term, tf, doc_freq,
    score, rank)`` with ``score = tf · ln(N / doc_freq)`` rounded to 6
    dp and deterministic tie-breaks (score desc, term asc).

    Scale shape: one explode of whitespace words; term frequencies =
    one ``groupBy(doc, term)`` with map-side combine; document
    frequencies = one ``groupBy(term)`` over the distinct (doc, term)
    pairs already in hand (no second scan of text); the per-doc top-k
    is a window over (doc) — each doc's term list is small, so no
    skew concern."""
    from pyspark.sql import Window

    words = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "
    )
    pairs = df.select(
        F.col(id_col), F.explode(words).alias("term")
    ).where(F.length("term") > 0)
    tf = pairs.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = df.where(F.col(text_col).isNotNull()).count()
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    scored = tf.join(docfreq, on="term").withColumn(
        "score",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "score", "rank")
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_ellipsis_line_ratio: float = 0.3,
    max_bullet_line_ratio: float = 0.9,
    min_alpha_word_ratio: float = 0.8,
) -> DataFrame:
    """Gopher/MassiveText-style document quality gates: the standard
    rule set used to drop degenerate pages before training (word-count
    band, mean word length band, symbol-to-word ratio, bullet/ellipsis
    line fractions, alphabetic-word ratio). Returns the metrics, one
    boolean per rule, and ``passes_gopher`` = conjunction — pure Column
    expressions over whitespace tokens, zero Python, scan-side at any
    scale. Thresholds are the published defaults; all overridable."""
    c = F.col(text_col)
    words = F.filter(
        F.split(F.regexp_replace(c, r"\s+", " "), " "),
        lambda w: F.length(w) > 0,
    )
    n_words = F.size(words)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
        / n_words,
    ).otherwise(F.lit(0.0))
    n_hash = F.size(F.split(c, "#")) - 1
    n_ellipsis = F.size(F.split(c, r"\.\.\.")) - 1
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).otherwise(F.lit(0.0))
    lines = F.filter(F.split(c, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))
    )
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    bullet_ratio = F.when(n_lines > 0, bullet_lines / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, ellipsis_lines / n_lines).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))

    flags = {
        "pass_word_count": (n_words >= min_words) & (n_words <= max_words),
        "pass_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "pass_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "pass_ellipsis_lines": ellipsis_ratio <= max_ellipsis_line_ratio,
        "pass_bullet_lines": bullet_ratio <= max_bullet_line_ratio,
        "pass_alpha_words": alpha_ratio >= min_alpha_word_ratio,
    }
    all_pass = None
    for expr in flags.values():
        all_pass = expr if all_pass is None else (all_pass & expr)
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        *[expr.alias(name) for name, expr in flags.items()],
        all_pass.alias("passes_gopher"),
    )
