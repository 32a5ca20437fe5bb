"""Text-analysis operators for training-data pipelines.

Beyond-reference operators (SURVEY.md §7 M7 / BASELINE.json north
star): token counting, quality scoring, language ID, document
fingerprinting. All pure Spark built-ins (whole-stage codegen, no
Python) so they scale to 100 TB document corpora: every operator is
a narrow per-row projection — no shuffle at all until an aggregate
is requested.

Each operator has an exact ANSI-SQL twin used for DuckDB oracle
verification (``*_oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_duckdb

# Tiny stopword inventories for the n-gram/stopword language-ID
# heuristic. Deliberately small and hard-coded: language ID here is a
# relative-frequency heuristic, not a model.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "los"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
}

_WS = r"\\s+"


def tokens(c: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array."""
    t = F.split(F.trim(c), r"\s+")
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def token_count_sql_duckdb(expr: str) -> str:
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({expr}), '\\s+')) END"
    )


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish subword count: words + punctuation as separate tokens,
    long words counted as ceil(len/4) subwords (a common rule of
    thumb for byte-pair vocabularies)."""
    words = tokens(c)
    subwords = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    return (subwords + punct).cast("long")


def bpe_ish_token_count_sql_duckdb(expr: str) -> str:
    return (
        f"(CASE WHEN trim({expr}) = '' THEN 0 ELSE "
        f"list_sum(list_transform(string_split_regex(trim({expr}), '\\s+'), "
        f"w -> cast(ceil(length(w) / 4.0) as bigint))) END "
        f"+ (length({expr}) - length(regexp_replace({expr}, '[\\.,;:!\\?]', '', 'g'))))::BIGINT"
    )


def punct_ratio(c: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    p = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(p / F.length(c))


def punct_ratio_sql_duckdb(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0.0 ELSE "
        f"(length({expr}) - length(regexp_replace({expr}, '[^\\w\\s]', '', 'g')))"
        f"::DOUBLE / length({expr}) END"
    )


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    """Stopword tokens / total tokens."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(c))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits / F.size(toks)
    )


def stopword_ratio_sql_duckdb(expr: str, lang: str = "en") -> str:
    words = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    toks = f"string_split_regex(trim(lower({expr})), '\\s+')"
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0.0 ELSE "
        f"len(list_filter({toks}, t -> list_contains([{words}], t)))::DOUBLE"
        f" / len({toks}) END"
    )


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct +
    reasonable mean word length. Deterministic, SQL-expressible."""
    n = F.length(c)
    tc = token_count(c)
    mean_word = F.when(tc == 0, F.lit(0.0)).otherwise(n / tc)
    len_ok = F.when((n >= 100) & (n <= 10000), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(c) < 0.1, 1.0).otherwise(0.5)
    word_ok = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.5)
    return (len_ok * punct_ok * word_ok).cast("double")


def quality_score_sql_duckdb(expr: str) -> str:
    tc = token_count_sql_duckdb(expr)
    return (
        f"(CASE WHEN length({expr}) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.5 END"
        f" * CASE WHEN {punct_ratio_sql_duckdb(expr)} < 0.1 THEN 1.0 ELSE 0.5 END"
        f" * CASE WHEN ({tc}) > 0 AND length({expr})::DOUBLE / ({tc}) BETWEEN 3 AND 12"
        f" THEN 1.0 ELSE 0.5 END)::DOUBLE"
    )


def lang_id(c: Column) -> Column:
    """Heuristic language ID: argmax of stopword hit counts, 'und'
    when no stopwords match. Ties break by language order."""
    toks = tokens(F.lower(c))
    pairs = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        pairs.append((lang, hits))
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, hits in reversed(pairs):  # earlier langs win ties
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return best_lang


def lang_id_sql_duckdb(expr: str) -> str:
    toks = f"string_split_regex(trim(lower({expr})), '\\s+')"
    hit_exprs = {
        lang: (
            f"len(list_filter({toks}, t -> list_contains("
            f"[{','.join(repr(w) for w in words)}], t)))"
        )
        for lang, words in STOPWORDS.items()
    }
    # same tie-break: iterate langs in reversed order, > replaces
    sql_lang, sql_hits = "'und'", "0"
    for lang, hits in reversed(list(hit_exprs.items())):
        sql_lang = f"CASE WHEN {hits} > {sql_hits} THEN '{lang}' ELSE {sql_lang} END"
        sql_hits = f"CASE WHEN {hits} > {sql_hits} THEN {hits} ELSE {sql_hits} END"
    return sql_lang


def fingerprint(c: Column) -> Column:
    """Document fingerprint: 60-bit hash of the normalized text
    (lowercase, whitespace collapsed) — stable under reflow."""
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return hash60(norm)


def fingerprint_sql_duckdb(expr: str) -> str:
    norm = f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"
    return hash60_duckdb(norm)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full stats vector."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars_computed"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subwords"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def unigram_lm_score(df, text_col: str = "text", id_col: str = "doc_id"):
    """Unigram language-model quality score — the CCNet-style
    perplexity filter reduced to a self-trained unigram LM: each
    document's mean negative log-likelihood under add-one-smoothed
    corpus unigram frequencies. Low scores = high-probability
    (common, fluent) text; high scores = rare/garbled token soup —
    the standard signal for perplexity-bucketing a crawl.

    Output: (doc_id, n_tokens, lm_score rounded to 4).

    Scale: the term-count table is vocab-sized (millions of rows at
    100 TB, still broadcastable or at worst a shuffle keyed by term
    with map-side combine); the corpus explode joins it
    broadcast-side so document text shuffles only as (doc_id, term)
    pairs. Train-on-sample + broadcast is the documented variant
    when even the vocab is too hot.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    exploded = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .filter(F.length("term") > 0)
    )
    counts = exploded.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    )
    return (
        exploded.join(F.broadcast(counts), "term")
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(
                    -F.log((F.col("cnt") + 1.0) / (F.col("n") + F.col("v")))
                ),
                4,
            ).alias("lm_score"),
        )
    )


def unigram_lm_score_sql_duckdb(table: str = "documents") -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM {table}
),
tok2 AS (SELECT * FROM tok WHERE length(term) > 0),
counts AS (SELECT term, count(*) AS cnt FROM tok2 GROUP BY term),
tot AS (SELECT sum(cnt) AS n, count(*) AS v FROM counts)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-ln((cnt + 1.0) / (n + v))), 4) AS lm_score
FROM tok2 JOIN counts USING (term), tot
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style repetition filters)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals — the Gopher repetition filter
    family (Rae et al. 2021, appendix A1.1): documents dominated by
    repeated lines or one repeated n-gram are boilerplate/spam and
    get dropped before training.

    Returns (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_frac):

    - dup_line_frac: 1 - distinct/total over non-blank lines — the
      fraction of line OCCURRENCES that are re-occurrences;
    - dup_line_char_frac: characters inside lines that occur more
      than once / all line characters;
    - top_bigram_frac: occurrences of the most frequent word bigram
      / total bigrams.

    Scale shape: ONE narrow projection, zero shuffles — every stat is
    higher-order array math over the row's own lines/words inside
    whole-stage codegen. The line/bigram arrays are LET-BOUND (split
    once per row; a captured split expression inside the counting
    lambdas would re-tokenize the text per element). The within-row
    counting is O(L^2) in the row's OWN line/bigram count (count via
    filter per element), which is the right trade at corpus scale: no
    explode, no per-doc groupBy, nothing leaves the row; for
    pathological single-document lengths, chunk first
    (curation.chunk_documents). The DuckDB twin computes identical
    list expressions, so every fraction is oracle-exact."""
    from ..functions.exprs import let

    c = F.col(text_col)
    lines = F.filter(
        F.split(c, "\n"), lambda line: F.trim(line) != ""
    )

    def line_stats(ls: Column) -> Column:
        n_lines = F.size(ls)
        dup_chars = F.aggregate(
            ls,
            F.lit(0).cast("long"),
            lambda acc, line: acc
            + F.when(
                F.size(F.filter(ls, lambda y: y == line)) > 1,
                F.length(line).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        total_chars = F.aggregate(
            ls,
            F.lit(0).cast("long"),
            lambda acc, line: acc + F.length(line).cast("long"),
        )
        return F.struct(
            n_lines.alias("n_lines"),
            (n_lines - F.size(F.array_distinct(ls))).alias("dup_occ"),
            dup_chars.alias("dup_chars"),
            total_chars.alias("total_chars"),
        )

    words = F.filter(
        F.split(F.lower(c), "[^a-z]+"), lambda w: w != ""
    )

    def bigram_stats(ws: Column) -> Column:
        nw = F.size(ws)
        bigrams = F.zip_with(
            F.slice(ws, 1, F.greatest(nw - 1, F.lit(0))),
            F.slice(ws, 2, F.greatest(nw - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

        def top(bg: Column) -> Column:
            return F.struct(
                F.coalesce(
                    F.array_max(
                        F.transform(
                            bg,
                            lambda b: F.size(
                                F.filter(bg, lambda y: y == b)
                            ),
                        )
                    ),
                    F.lit(0),
                ).alias("top_bigram"),
                F.size(bg).alias("nb"),
            )

        return let(bigrams, top)

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(0.0), 4
        )

    # two-step select: the stat structs are computed once into real
    # columns, then the fractions read struct FIELDS (attribute
    # accesses) — a single select would re-evaluate each struct per
    # reference. Deliberately NOT spread_small_input'd: this operator
    # promises zero exchanges (nothing leaves the row), and the
    # let-bound counting is cheap enough to keep that promise.
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        let(lines, line_stats).alias("_l"),
        let(words, bigram_stats).alias("_b"),
    )
    return staged.select(
        "doc_id",
        F.col("_l.n_lines").alias("n_lines"),
        frac(F.col("_l.dup_occ"), F.col("_l.n_lines")).alias(
            "dup_line_frac"
        ),
        frac(F.col("_l.dup_chars"), F.col("_l.total_chars")).alias(
            "dup_line_char_frac"
        ),
        frac(F.col("_b.top_bigram"), F.col("_b.nb")).alias(
            "top_bigram_frac"
        ),
    )


def repetition_stats_sql_duckdb(table: str = "documents") -> str:
    """ANSI twin: identical list expressions per row."""
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)),
                     l -> trim(l) != '') AS lines,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     w -> w != '') AS words
  FROM {table}
), bi AS (
  SELECT doc_id, lines,
         list_transform(range(1, len(words)),
                        i -> words[i] || ' ' || words[i + 1]) AS bigrams
  FROM base
), stats AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         len(lines) - len(list_distinct(lines)) AS dup_occ,
         coalesce(list_sum(list_transform(lines,
           l -> CASE WHEN len(list_filter(lines, y -> y = l)) > 1
                     THEN length(l) ELSE 0 END)), 0) AS dup_chars,
         coalesce(list_sum(list_transform(lines,
           l -> length(l))), 0) AS total_chars,
         coalesce(list_max(list_transform(bigrams,
           b -> len(list_filter(bigrams, y -> y = b)))), 0)
             AS top_bigram,
         len(bigrams) AS nb
  FROM bi
)
SELECT doc_id,
       cast(n_lines AS INTEGER) AS n_lines,
       round(CASE WHEN n_lines > 0
             THEN dup_occ::DOUBLE / n_lines ELSE 0.0 END, 4)
           AS dup_line_frac,
       round(CASE WHEN total_chars > 0
             THEN dup_chars::DOUBLE / total_chars ELSE 0.0 END, 4)
           AS dup_line_char_frac,
       round(CASE WHEN nb > 0
             THEN top_bigram::DOUBLE / nb ELSE 0.0 END, 4)
           AS top_bigram_frac
FROM stats
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k documents for a literal term query — the
    ranking primitive behind retrieval-based quality scoring and
    decontamination triage on a training corpus. Output:
    (doc_id, score) rounded to 6, ranked (score desc, doc_id asc).

    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    idf = ln((N - df + 0.5)/(df + 0.5) + 1)  -- the non-negative form.

    Scale shape: doc lengths are one narrow agg; the tf table only
    carries (doc, term) pairs for QUERY terms (the IN predicate prunes
    the exploded stream before any shuffle, so a 3-term query shuffles
    ~3 rows per matching doc no matter how wide the corpus); df/N are
    a query-sized broadcast. Rounding BEFORE ranking keeps the top-k
    cut engine-exact: equal-to-6-decimals scores tie-break by doc_id
    on both engines instead of by last-ulp libm noise.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("term")
    ).filter(F.length("term") > 0)
    dl = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    qt = [t.lower() for t in query_terms]
    tf = (
        exploded.filter(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    idf = F.log(
        (F.col("n_docs") - F.col("dfreq") + 0.5)
        / (F.col("dfreq") + 0.5)
        + 1.0
    )
    # dl is CORPUS-sized (one row per doc) — it must never broadcast;
    # the query-pruned (tf x dfreq) side is the provably-small one,
    # so it carries the hint and dl streams through the join
    contrib = (
        dl.join(F.broadcast(tf.join(F.broadcast(dfreq), "term")), "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("c"), 6).alias("score")
    )
    # orderBy().limit() compiles to TakeOrderedAndProject — a
    # distributed per-partition top-k + k-row merge, NOT the global
    # single-partition window a partitionBy-less row_number needs
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(k)


def bm25_scores_sql_duckdb(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_scores — identical math, identical rounding,
    identical (score desc, doc_id) cut."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM {table}
),
tok2 AS (SELECT * FROM tok WHERE length(term) > 0),
dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok2
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
         * (tf * ({k1!r} + 1.0))
         / (tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl.dl / avgdl)) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
)
SELECT doc_id, score FROM (
  SELECT doc_id, round(sum(c), 6) AS score,
         row_number() OVER (ORDER BY round(sum(c), 6) DESC, doc_id)
             AS _rk
  FROM contrib GROUP BY doc_id
) WHERE _rk <= {k}
"""


# ---------------------------------------------------------------------------
# Bigram language-model score (the KenLM-shaped upgrade of the
# unigram CCNet-style filter)
# ---------------------------------------------------------------------------


def bigram_lm_score(df, text_col: str = "text", id_col: str = "doc_id"):
    """Bigram language-model quality score: each document's mean
    negative log-likelihood of its token bigrams under add-one-
    smoothed corpus bigram frequencies,

        -mean ln( (c(w1 w2) + 1) / (c(w1) + V) )

    with V the corpus unigram vocabulary size — the order-2 step from
    ``unigram_lm_score`` toward the KenLM perplexity filters public
    pipelines use (CCNet; word order now matters: "the of" scores
    badly even though both unigrams are common). Documents with
    fewer than two tokens have no bigrams and are omitted.

    Output: (doc_id, n_bigrams, lm2_score rounded to 4).

    Engine-exactness: each bigram's log term is rounded to 9 decimals
    and summed as DECIMAL (associative), then divided once — a raw
    float mean over hundreds of terms would be partition-order-
    dependent.

    Scale: the bigram count table is the big intermediate (quadratic
    vocab in theory, corpus-bounded in practice); it stays a hash
    aggregate keyed by the pair with map-side combine, joined back
    broadcast (or shuffle-keyed when the pair table outgrows
    broadcast). Text never shuffles — only (doc_id, w1, w2) triples.

    r11 opt (guide §2.4 "don't compute things twice" + §2.3): the
    previous plan evaluated the tokenizer FOUR times — the bigram
    stream fed both the count table and the scoring probe, and the
    unigram aggregate fed both the w1 join and the vocab count, each
    reference re-expanding the whole scan->tokenize subtree. The
    token arrays are now materialized once (lazy localCheckpoint;
    tokens only, never raw text) and the unigram table once, and the
    per-bigram NLL is computed on the DISTINCT-bigram table before
    the probe join, so the per-occurrence side does one broadcast
    join instead of three. Output is bit-identical (NLL depends only
    on (w1, w2); n occurrences of an exact DECIMAL sum to exactly
    n * v). Measured sf0.1 interleaved A/B: 0.97 -> 0.70 s, plan
    scans 4 -> 1.

    Fault-tolerance trade-off (deliberate, same as the simhash pair
    join): the lazy localCheckpoints below store non-replicated
    executor-local blocks, so an executor loss mid-query fails the
    job instead of recomputing the truncated lineage. Acceptable for
    these bounded token/unigram intermediates (a retry is cheaper
    than a four-scan plan); a 100 TB deployment with routine executor
    churn should use persist(MEMORY_AND_DISK) + a reliable
    checkpoint instead if job restarts are costly.
    """
    from pyspark.sql import functions as F

    from .partitioning import spread_small_input as _spread

    df = _spread(df)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) > 0,
    )
    toks_df = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_t")
    ).localCheckpoint(eager=False)

    # tokenized ONCE above; zip the array with its own shift —
    # element_at(toks, i) inside a per-index lambda would re-run the
    # tokenizer per element, O(L^2) per document
    t = F.col("_t")
    n = F.size(t)
    pairs_arr = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = toks_df.select(
        "doc_id", F.explode(pairs_arr).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = (
        toks_df.select(F.explode(t).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=False)
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    cbig = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    nll = (
        F.round(
            -F.log(
                (F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))
            ),
            9,
        )
        .cast("decimal(20,9)")
        .alias("nll")
    )
    pair_nll = (
        cbig.join(F.broadcast(uni.withColumnRenamed("term", "w1")), "w1")
        .join(F.broadcast(vocab))
        .select("w1", "w2", nll)
    )
    scored = (
        big.join(F.broadcast(pair_nll), ["w1", "w2"])
        .select("doc_id", "nll")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll").alias("_s"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round(
            F.col("_s").cast("double") / F.col("n_bigrams"), 4
        ).alias("lm2_score"),
    )


def bigram_lm_score_sql_duckdb(table: str = "documents") -> str:
    """DuckDB twin of bigram_lm_score — identical tokenization,
    smoothing, 9-decimal rounding and DECIMAL aggregation."""
    toks = (
        "list_filter(string_split_regex(lower(text), '[^a-z]+'), "
        "x -> length(x) > 0)"
    )
    return f"""
WITH t AS (SELECT doc_id, {toks} AS tk FROM {table}),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
                i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS p
  FROM t
),
big2 AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM big),
uni AS (
  SELECT unnest(tk) AS term FROM t
),
c1 AS (SELECT term AS w1, count(*) AS c1 FROM uni GROUP BY 1),
vocab AS (SELECT count(*) AS v FROM c1),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big2 GROUP BY 1, 2),
nlls AS (
  SELECT doc_id,
         cast(round(-ln((c12 + 1.0) / (c1 + v)), 9) AS DECIMAL(20,9))
             AS nll
  FROM big2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1), vocab
)
SELECT doc_id, count(*) AS n_bigrams,
       round(cast(sum(nll) AS DOUBLE) / count(*), 4) AS lm2_score
FROM nlls GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Character-entropy quality signal
# ---------------------------------------------------------------------------

_ENTROPY_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(df, text_col: str = "text", id_col: str = "doc_id"):
    """Shannon entropy of the per-document character distribution
    (over [a-z0-9 ] of the lowercased text) — a classic cheap garbage
    detector: binary-ish blobs and keyboard-mash score far from the
    ~2.9-4.2 bits of natural language, repeated-char spam scores near
    zero.

    Output: (doc_id, n_chars, entropy) with entropy in bits, rounded
    to 4.

    Plan shape: per-character counts come from the length-difference
    trick — count(c) = len(s) - len(replace(s, c, '')) — unrolled
    over the 37-character alphabet as literal JVM expressions: ZERO
    explodes, ZERO shuffles, one codegen projection per row at any
    corpus scale. Each probability term is rounded to 9 decimals and
    summed as DECIMAL so the oracle twin is bit-exact."""
    from pyspark.sql import functions as F

    low = F.lower(F.col(text_col))
    counts = [
        (
            F.length(low)
            - F.length(F.replace(low, F.lit(c), F.lit("")))
        )
        .cast("long")
        .alias(f"_c{i}")
        for i, c in enumerate(_ENTROPY_CHARS)
    ]
    base = df.select(F.col(id_col).alias("doc_id"), *counts)
    total = sum(F.col(f"_c{i}") for i in range(len(_ENTROPY_CHARS)))
    base = base.withColumn("_n", total)
    # -(p * log2 p) per character as an exact INTEGER number of
    # 1e-9 units. Chained DECIMAL addition would overflow Spark's
    # 38-digit precision cap over 37 terms and silently shrink the
    # scale (observed: scale 9 -> 6, flipping the final rounding);
    # longs sum exactly on any engine. Terms are bounded by
    # log2(e)/e ~ 0.531, so the scaled sum fits a long with room.
    terms = [
        F.when(
            F.col(f"_c{i}") > 0,
            F.round(
                (F.col(f"_c{i}") / F.col("_n"))
                * -F.log2(F.col(f"_c{i}") / F.col("_n"))
                * 1e9,
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(len(_ENTROPY_CHARS))
    ]
    ent = terms[0]
    for t in terms[1:]:
        ent = ent + t
    # HALF_UP to 4 decimals in integer arithmetic (the sum is
    # nonnegative), then ONE exact long->double cast: rounding a
    # double diverges between engines on exact .xxxx5 boundaries
    # (Spark rounds the shortest decimal rendering, DuckDB the
    # exact binary value)
    rounded = ((ent + F.lit(50000)) / F.lit(100000)).cast("long")
    return base.select(
        "doc_id",
        F.col("_n").alias("n_chars"),
        F.when(
            F.col("_n") > 0,
            rounded.cast("double") / F.lit(10000.0),
        )
        .otherwise(F.lit(0.0))
        .alias("entropy"),
    )


def char_entropy_sql_duckdb(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of char_entropy — identical counts, term rounding
    and DECIMAL summation."""
    cols = []
    for i, c in enumerate(_ENTROPY_CHARS):
        lit = c.replace("'", "''")
        cols.append(
            f"(length(low) - length(replace(low, '{lit}', '')))"
            f"::BIGINT AS _c{i}"
        )
    n = len(_ENTROPY_CHARS)
    total = " + ".join(f"_c{i}" for i in range(n))
    terms = " + ".join(
        f"CASE WHEN _c{i} > 0 THEN cast(round((_c{i} / _n) * "
        f"-log2(_c{i} / _n) * 1e9, 0) AS BIGINT) "
        f"ELSE 0 END"
        for i in range(n)
    )
    return f"""
WITH low AS (
  SELECT {id_col} AS doc_id, lower({text_col}) AS low FROM {table}
),
cnt AS (SELECT doc_id, {', '.join(cols)} FROM low),
tot AS (SELECT *, ({total}) AS _n FROM cnt),
summed AS (
  SELECT doc_id, _n, ({terms}) AS _s FROM tot
)
SELECT doc_id, _n AS n_chars,
       CASE WHEN _n > 0
            THEN cast((_s + 50000) // 100000 AS DOUBLE) / 10000.0
            ELSE 0.0 END AS entropy
FROM summed
"""


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram
    of the normalized text, slide a window of ``w`` consecutive gram
    hashes, and select each window's minimum hash (rightmost on tie).

    Guarantee: any substring match of length >= ``w + k - 1`` between
    two documents yields at least one shared fingerprint, while only a
    ~``2/(w+1)`` fraction of gram hashes is retained — the standard
    local fingerprinting scheme for plagiarism/near-dup detection.

    Returns ``(doc_id, pos, fph)`` — one row per selected fingerprint.

    The rightmost-tie argmin is ONE window aggregate: per window
    starting at ``pos``, ``min(struct(h, -pos))`` orders
    lexicographically — smallest hash first, then largest position —
    so no self-join is needed to recover the selected position.

    100 TB scale: text is projected away before any exchange — only
    ``(doc_id, pos, h)`` triples shuffle (same design as
    duplicate_span_grams), and the window is partitioned per document,
    so gram volume parallelizes across the corpus. All built-ins
    (whole-stage codegen); no Python.
    """
    from .partitioning import spread_small_input as _spread

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    d = _spread(df).select(F.col(id_col).alias("doc_id"), norm.alias("_n"))
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"case when length(_n) >= {int(k)} then "
                f"transform(sequence(1, length(_n) - {int(k)} + 1), "
                f"i -> substring(_n, i, {int(k)})) "
                f"else array() end"
            )
        ).alias("pos", "g"),
    ).select("doc_id", "pos", hash60(F.col("g")).alias("h"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, int(w) - 1)
    )
    # Dedupe WITHOUT a second exchange: the selected position is
    # non-decreasing as the window slides (a later window picks either
    # the same rightmost-min or something to its right), so duplicate
    # selections are always CONSECUTIVE in window order — `m != lag(m)`
    # over the same partition/order spec is an exact distinct, computed
    # in the same single window pass (one shuffle total, vs two with
    # .distinct()). Rows dropped by the full-window cnt filter are only
    # the per-doc suffix, so pre-filter lag == post-filter lag for
    # every surviving row.
    sel = grams.select(
        "doc_id",
        F.col("pos").alias("_p"),
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np")))
        .over(win)
        .alias("m"),
        F.count(F.lit(1)).over(win).alias("cnt"),
    ).withColumn(
        "prev",
        F.lag("m").over(Window.partitionBy("doc_id").orderBy("_p")),
    )
    return sel.filter(
        (F.col("cnt") == int(w))
        & (F.col("prev").isNull() | (F.col("m") != F.col("prev")))
    ).select(
        "doc_id",
        (-F.col("m.np")).alias("pos"),
        F.col("m.h").alias("fph"),
    )


def winnow_fingerprints_oracle_sql(
    table: str = "documents", k: int = 8, w: int = 8
) -> str:
    h = hash60_duckdb(f"substr(_n, i, {int(k)})")
    frame = (
        f"PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN CURRENT ROW AND {int(w) - 1} FOLLOWING"
    )
    return f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS _n
  FROM {table}
), g AS (
  SELECT doc_id, i - 1 AS pos, {h} AS h
  FROM n, LATERAL unnest(
    generate_series(1, greatest(length(_n) - {int(k)} + 1, 0))) AS t(i)
), w AS (
  SELECT doc_id,
         min(struct_pack(h := h, np := -pos)) OVER ({frame}) AS m,
         count(*) OVER ({frame}) AS cnt
  FROM g
)
SELECT DISTINCT doc_id, -(m.np) AS pos, m.h AS fph FROM w WHERE cnt = {int(w)}
"""


def winnow_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 8,
    min_shared: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints:
    documents sharing >= ``min_shared`` distinct fingerprint hashes.

    Scale design mirrors minhash_lsh_pairs: the join key is the
    fingerprint hash, and hashes appearing in more than ``max_bucket``
    documents (ubiquitous boilerplate grams) are dropped BEFORE the
    pair join, so no bucket ever goes quadratic on a mega-cluster.
    Only ``(doc_id, fph)`` pairs shuffle.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    sets = fps.select("doc_id", "fph").distinct()
    small = (
        sets.groupBy("fph")
        .agg(F.count(F.lit(1)).alias("_nb"))
        .filter(F.col("_nb") <= int(max_bucket))
        .select("fph")
    )
    pruned = sets.join(small, "fph")
    pairs = (
        pruned.alias("l")
        .join(
            pruned.alias("r"),
            (F.col("l.fph") == F.col("r.fph"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("left_id"),
            F.col("r.doc_id").alias("right_id"),
        )
        .agg(F.countDistinct(F.col("l.fph")).alias("shared_fp"))
        .filter(F.col("shared_fp") >= int(min_shared))
    )
    return pairs


def winnow_candidate_pairs_oracle_sql(
    table: str = "documents",
    k: int = 8,
    w: int = 8,
    min_shared: int = 3,
    max_bucket: int = 64,
) -> str:
    fps = winnow_fingerprints_oracle_sql(table, k=k, w=w)
    return f"""
WITH fps AS ({fps}),
sets AS (SELECT DISTINCT doc_id, fph FROM fps),
small AS (
  SELECT fph FROM sets GROUP BY fph HAVING count(*) <= {int(max_bucket)}
),
pruned AS (SELECT s.* FROM sets s JOIN small USING (fph))
SELECT l.doc_id AS left_id, r.doc_id AS right_id,
       count(DISTINCT l.fph) AS shared_fp
FROM pruned l JOIN pruned r
  ON l.fph = r.fph AND l.doc_id < r.doc_id
GROUP BY 1, 2
HAVING count(DISTINCT l.fph) >= {int(min_shared)}
"""


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer training)
# ---------------------------------------------------------------------------


def bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus — the
    tokenizer-training step of an LLM data pipeline (Sennrich et al.
    2016, *Neural Machine Translation of Rare Words with Subword
    Units*). Classic BPE trains on the WORD-FREQUENCY table, not the
    raw text: the corpus collapses to (word, count) once, and every
    merge round then touches only the vocabulary.

    Representation: each word's symbol sequence is one string with a
    two-space delimiter and space sentinels (``"hello"`` starts as
    ``" h  e  l  l  o "``), so applying merge (l, r) is a single
    engine-native ``replace(s, " l  r ", " lr ")`` — left-to-right
    non-overlapping in both Spark (Java String semantics) and DuckDB,
    which IS the standard greedy BPE merge order, and the double-space
    delimiter makes a merged token's tail unable to re-match within
    the same round (" aa " ends in one space, the pattern needs two).

    Per round: explode adjacent symbol pairs weighted by word count,
    pick the (count desc, left, right) argmax — a deterministic total
    order, exact integer counts — collect that ONE row, and fold the
    merge back in as a literal projection. Output:
    (merge_rank, lhs, rhs, pair_count), one row per learned merge.

    Scale shape: the corpus is scanned exactly once (the word-count
    hash aggregate, map-side combined, then localCheckpoint'd); each
    of the k rounds shuffles only (l, r, count) pairs from the
    VOCABULARY table — corpus-size-independent — and collects one row.
    Driver memory is O(k). Rounds are inherently sequential (each
    argmax depends on the previous merge), same as any BPE trainer.
    """
    spark = df.sparkSession
    from .partitioning import spread_small_input as _spread

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) > 0,
    )
    words = (
        _spread(df)  # r11: one-file corpora tokenized on all cores
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    # r11 opt (guide §1.2 — the distributed algorithm first): after
    # the one corpus-scale scan (the word-count aggregate above), the
    # whole training state is the VOCABULARY — (word, count) rows,
    # corpus-size-independent and usually tiny. Under the same
    # metadata-budget pattern the CC driver finish uses, run the k
    # sequential argmax rounds driver-side in plain Python instead of
    # 2 Spark jobs per round (the 8-round bench cell spent ~2 s on 17
    # vocabulary-sized jobs of ~15k rows each). Semantics are
    # replicated exactly: greedy left-to-right non-overlapping merge,
    # (count desc, lhs, rhs) argmax — words are [a-z]+ by
    # construction, so Python/Java string comparisons agree. A vocab
    # past the budget falls back to the distributed per-round loop
    # below, unchanged.
    _BPE_DRIVER_VOCAB_BUDGET = 200_000
    head = words.limit(_BPE_DRIVER_VOCAB_BUDGET + 1).collect()
    if len(head) <= _BPE_DRIVER_VOCAB_BUDGET:
        from pyspark.sql import types as T

        seqs = [
            (list(r["w"]), int(r["wcount"])) for r in head
        ]
        merges = []
        for rank in range(1, int(n_merges) + 1):
            counts: dict = {}
            for syms, wc in seqs:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + wc
            if not counts:
                break
            (bl, br), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((rank, bl, br, int(cnt)))
            merged = bl + br
            for syms, _wc in seqs:
                i = 0
                while i < len(syms) - 1:
                    if syms[i] == bl and syms[i + 1] == br:
                        syms[i : i + 2] = [merged]
                    i += 1
        schema = T.StructType(
            [
                T.StructField("merge_rank", T.IntegerType(), False),
                T.StructField("lhs", T.StringType(), False),
                T.StructField("rhs", T.StringType(), False),
                T.StructField("pair_count", T.LongType(), False),
            ]
        )
        return spark.createDataFrame(merges, schema)
    vocab = words.select(
        F.concat(
            F.lit(" "),
            F.rtrim(F.regexp_replace(F.col("w"), "(.)", "$1  ")),
            F.lit(" "),
        ).alias("s"),
        "wcount",
    ).localCheckpoint()
    merges = []
    for rank in range(1, int(n_merges) + 1):
        syms = F.split(F.trim(F.col("s")), "  ")
        n = F.size(syms)
        pairs = (
            vocab.filter(n >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, n - 1).alias("l"),
                        F.slice(syms, 2, n - 1).alias("r"),
                    )
                ).alias("p"),
                "wcount",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wcount").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = pairs[0]
        merges.append((rank, best["l"], best["r"], int(best["cnt"])))
        # re-localCheckpoint every round: without it each round's
        # collect() re-executes the whole chain of prior replace
        # projections from the single checkpoint, so total work grows
        # O(n_merges^2) in the merge count — checkpointing keeps each
        # round O(vocab).
        vocab = vocab.select(
            F.replace(
                F.col("s"),
                F.lit(f" {best['l']}  {best['r']} "),
                F.lit(f" {best['l']}{best['r']} "),
            ).alias("s"),
            "wcount",
        ).localCheckpoint()
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("merge_rank", T.IntegerType(), False),
            T.StructField("lhs", T.StringType(), False),
            T.StructField("rhs", T.StringType(), False),
            T.StructField("pair_count", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(merges, schema)


def bpe_merges_sql_duckdb(
    table: str = "documents",
    n_merges: int = 8,
    text_col: str = "text",
) -> str:
    """Unrolled DuckDB twin of bpe_merges: identical tokenization,
    identical sentinel encoding, identical replace semantics
    (left-to-right non-overlapping), identical argmax total order."""
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '[^a-z]+'), "
        "x -> length(x) > 0)"
    )
    # Every per-round CTE is MATERIALIZED and the 1-row argmax is
    # cross-joined (never a scalar subquery): inlined, each round
    # would reference the previous one several times and the plan
    # tree would grow exponentially in n_merges.
    sql = f"""WITH words AS MATERIALIZED (
  SELECT w, count(*) AS wcount FROM (
    SELECT unnest({toks}) AS w FROM {table}
  ) GROUP BY 1
),
v0 AS MATERIALIZED (
  SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS s,
         wcount
  FROM words
)"""
    prev = "v0"
    for t in range(1, int(n_merges) + 1):
        sql += f""",
p{t} AS (
  SELECT p.l AS l, p.r AS r, cast(sum(wcount) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(tk)),
                  i -> struct_pack(l := tk[i], r := tk[i+1]))) AS p,
           wcount
    FROM (SELECT string_split(trim(s), '  ') AS tk, wcount FROM {prev})
    WHERE len(tk) >= 2
  ) GROUP BY 1, 2
),
b{t} AS MATERIALIZED (
  SELECT l, r, cnt FROM p{t} ORDER BY cnt DESC, l, r LIMIT 1
),
v{t} AS MATERIALIZED (
  SELECT CASE WHEN b.l IS NULL THEN s
              ELSE replace(s, ' ' || b.l || '  ' || b.r || ' ',
                           ' ' || b.l || b.r || ' ') END AS s,
         wcount
  FROM {prev} LEFT JOIN b{t} b ON TRUE
)"""
        prev = f"v{t}"
    parts = [
        f"SELECT {t} AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count"
        f" FROM b{t}"
        for t in range(1, int(n_merges) + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Unicode NFC normalization (Arrow-batched pandas UDF lane)
# ---------------------------------------------------------------------------


def normalize_nfc(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC normalization of a text column — the canonical-
    composition cleanup every multi-source corpus needs before
    dedup/hashing (the same visible string can arrive as composed
    U+00E9 or decomposed U+0065+U+0301 and would otherwise hash as
    two different documents).

    Spark has no built-in Unicode normalizer, so this is the repo's
    one TEXT-lane pandas UDF: an Arrow-batched scalar kernel over
    stdlib ``unicodedata.normalize("NFC", ...)`` (same rationale as
    the crc64 kernel — a real per-value algorithm no builtin
    expresses; Arrow batching keeps the Python exchange columnar).
    The DuckDB oracle is ``nfc_normalize()`` (utf8proc) — both
    implement Unicode canonical composition, so outputs match
    byte-for-byte.

    Output: (doc_id, text_nfc, changed).

    Scale shape: a narrow per-row projection, zero shuffles; Arrow
    batch size bounds executor Python memory regardless of corpus
    size.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _kernel(s):
        import unicodedata

        return s.map(
            lambda x: None
            if x is None
            else unicodedata.normalize("NFC", x)
        )

    # real type objects, set post-hoc: the module-wide
    # `from __future__ import annotations` would stringify inline
    # hints, and pyspark resolves hint strings against module
    # globals, where the locally-imported pandas is not visible
    _kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = pandas_udf(_kernel, "string")

    return df.select(
        F.col(id_col).alias("doc_id"),
        _nfc(F.col(text_col)).alias("text_nfc"),
        F.col(text_col).alias("_orig"),
    ).select(
        "doc_id",
        "text_nfc",
        (F.col("text_nfc") != F.col("_orig")).alias("changed"),
    )


def normalize_nfc_sql_duckdb(
    table: str = "documents", text_expr: str = "text"
) -> str:
    """DuckDB twin of normalize_nfc (utf8proc NFC)."""
    return f"""
SELECT doc_id, nfc_normalize({text_expr}) AS text_nfc,
       nfc_normalize({text_expr}) <> {text_expr} AS changed
FROM {table}
"""


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned BPE merges (from ``bpe_merges``) to the corpus
    and report per-document subword counts — the encode half of the
    tokenizer: merge rank order IS application order (Sennrich 2016).

    Each merge is one engine-native ``replace`` over the same
    double-space sentinel encoding the trainer used, so the chain is
    k narrow codegen projections — zero shuffles, no UDF, and the
    same greedy left-to-right semantics in Spark and DuckDB. The
    merge list is a tiny driver-side literal (k pairs), exactly like
    a broadcast vocabulary.

    Output: (doc_id, n_chars_sym, n_subwords) where n_chars_sym is
    the pre-merge symbol count (letters of the [a-z]+ words) and
    n_subwords the post-merge token count — n_chars_sym/n_subwords
    is the compression ratio tokenizer training optimizes.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) > 0,
    )
    # sentinel-encode every word, then join the per-word strings with
    # ONE extra space: intra-word symbol gaps are exactly two spaces,
    # word boundaries become three, so no trainer pattern (which
    # contains a two-space gap flanked by single spaces) can ever
    # match across a word boundary.
    s = F.concat_ws(
        " ",
        F.transform(
            toks,
            lambda x: F.concat(
                F.lit(" "),
                F.rtrim(F.regexp_replace(x, "(.)", "$1  ")),
                F.lit(" "),
            ),
        ),
    )
    base = df.select(F.col(id_col).alias("doc_id"), s.alias("_s"))
    col = F.col("_s")
    for l, r in merges:
        col = F.replace(
            col, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
        )
    staged = base.select("doc_id", F.col("_s"), col.alias("_m"))

    def n_syms(c: Column) -> Column:
        return F.size(
            F.filter(F.split(c, " +"), lambda x: F.length(x) > 0)
        )

    return staged.select(
        "doc_id",
        n_syms(F.col("_s")).alias("n_chars_sym"),
        n_syms(F.col("_m")).alias("n_subwords"),
    )


def bpe_encode_sql_duckdb(
    table: str = "documents",
    n_merges: int = 8,
    text_col: str = "text",
) -> str:
    """DuckDB twin of bpe_merges + bpe_encode composed: re-learns the
    merges with the trainer CTEs, then applies them to the documents
    through the same per-round MATERIALIZED replace chain. Each
    round LEFT-JOINs its 1-row argmax (coalescing to the unmerged
    string when the round is empty), so on a degenerate corpus that
    yields fewer than ``n_merges`` merges the twin degrades exactly
    like the Spark side — it just applies fewer merges."""
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '[^a-z]+'), "
        "x -> length(x) > 0)"
    )
    enc = (
        f"array_to_string(list_transform({toks}, "
        "x -> ' ' || rtrim(regexp_replace(x, '(.)', '\\1  ', 'g')) || ' '"
        "), ' ')"
    )

    def n_syms(expr: str) -> str:
        return (
            f"len(list_filter(string_split_regex({expr}, ' +'), "
            f"x -> length(x) > 0))"
        )

    if int(n_merges) == 0:
        # identity encode: no merges, n_subwords == n_chars_sym —
        # mirrors the Spark side's empty replace chain
        return f"""
SELECT doc_id, {n_syms(enc)} AS n_chars_sym,
       {n_syms(enc)} AS n_subwords
FROM {table}
"""
    trainer = bpe_merges_sql_duckdb(table, n_merges, text_col)
    prefix = trainer[: trainer.rindex("\nSELECT 1 AS merge_rank")]
    sql = prefix + f""",
d0 AS MATERIALIZED (
  SELECT doc_id, {enc} AS s0, {enc} AS s FROM {table}
)"""
    prev = "d0"
    for t in range(1, int(n_merges) + 1):
        sql += f""",
d{t} AS MATERIALIZED (
  SELECT doc_id, s0,
         CASE WHEN b.l IS NULL THEN s
              ELSE replace(s, ' ' || b.l || '  ' || b.r || ' ',
                           ' ' || b.l || b.r || ' ') END AS s
  FROM {prev} LEFT JOIN b{t} b ON TRUE
)"""
        prev = f"d{t}"
    return sql + f"""
SELECT doc_id, {n_syms('s0')} AS n_chars_sym, {n_syms('s')} AS n_subwords
FROM {prev}
"""


# ---------------------------------------------------------------------------
# Zipf's-law fit (corpus health diagnostic)
# ---------------------------------------------------------------------------


def zipf_alpha(
    df: DataFrame,
    top_k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Least-squares Zipf exponent over the top-``top_k`` corpus
    terms: natural text follows freq(rank) ~ rank^-alpha with alpha
    near 1; a far-off alpha flags template spam (too flat) or
    degenerate boilerplate (too steep) — a one-row corpus health
    metric curation dashboards track.

    Fit: regress y = ln(freq) on x = ln(rank) over the top-k terms
    (rank by freq desc, term — deterministic), alpha = -slope.

    Engine-exactness: x and y are rounded to 7 decimals as
    DECIMAL(16,7) — chosen so the cross products are DECIMAL(33,14),
    which BOTH engines keep exact (Spark's allowPrecisionLoss rule
    would round a (20,9)x(20,9) product to scale 15 while DuckDB
    keeps scale 18, desynchronizing the sums) — the slope is
    assembled from the five exact sums, and only the final one-row
    division is float (rounded to 6). No partition-order-dependent
    float accumulation.

    Scale shape: the term count is one map-side-combined hash
    aggregate; the rank is a row_number over ONLY the top-k rows
    (orderBy().limit() compiles to TakeOrderedAndProject — a k-row
    merge, never a vocabulary-wide single-partition window), so the
    single-partition step is k rows at any corpus size.

    Output: (n_terms, alpha, intercept).
    """
    from pyspark.sql.window import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) > 0,
    )
    freq = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term"))
        .limit(int(top_k))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("term"))
    d7 = "decimal(16,7)"
    xy = freq.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 7)
        .cast(d7)
        .alias("x"),
        F.round(F.log(F.col("c").cast("double")), 7).cast(d7).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    # fewer than 2 distinct terms: var(ln rank) = 0, slope undefined
    # (the when() also keeps the division lazy under ANSI mode)
    defined = den != 0.0
    return s.select(
        F.col("n").alias("n_terms"),
        F.when(defined, F.round(-slope, 6)).alias("alpha"),
        F.when(defined, F.round((sy - slope * sx) / n, 6)).alias(
            "intercept"
        ),
    )


def zipf_alpha_sql_duckdb(
    table: str = "documents", top_k: int = 1000, text_col: str = "text"
) -> str:
    """DuckDB twin of zipf_alpha: identical rank order, rounding and
    decimal accumulation."""
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '[^a-z]+'), "
        "x -> length(x) > 0)"
    )
    return f"""
WITH freq AS (
  SELECT term, count(*) AS c FROM (
    SELECT unnest({toks}) AS term FROM {table}
  ) GROUP BY 1 ORDER BY c DESC, term LIMIT {int(top_k)}
),
xy AS (
  SELECT cast(round(ln(cast(row_number() OVER (ORDER BY c DESC, term)
                     AS DOUBLE)), 7) AS DECIMAL(16,7)) AS x,
         cast(round(ln(cast(c AS DOUBLE)), 7) AS DECIMAL(16,7)) AS y
  FROM freq
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy
),
d AS (
  SELECT n, cast(sx AS DOUBLE) AS sx, cast(sy AS DOUBLE) AS sy,
         cast(sxy AS DOUBLE) AS sxy, cast(sxx AS DOUBLE) AS sxx,
         cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
           - cast(sx AS DOUBLE) * cast(sx AS DOUBLE) AS den
  FROM s
)
SELECT n AS n_terms,
       CASE WHEN den <> 0.0 THEN
         round(-((cast(n AS DOUBLE) * sxy - sx * sy) / den), 6)
       END AS alpha,
       CASE WHEN den <> 0.0 THEN
         round((sy - ((cast(n AS DOUBLE) * sxy - sx * sy) / den) * sx)
               / cast(n AS DOUBLE), 6)
       END AS intercept
FROM d
"""


# ---------------------------------------------------------------------------
# Readability score (Flesch reading ease, vowel-group syllables)
# ---------------------------------------------------------------------------


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document,

        206.835 - 1.015 * words/sentences - 84.6 * syllables/words

    with the standard cheap proxies: sentences = non-empty runs
    between ``[.!?]+`` (min 1 so fragments don't divide by zero),
    words = non-empty ``[a-z]+`` runs of the lowercased text,
    syllables = vowel GROUPS per word (``[aeiouy]+`` runs, min 1 per
    word) — the classic approximation used when no dictionary is
    available. Documents with zero words are omitted (the score is
    undefined, same as fragments in the original formula).

    Engine-exactness: all three counts are exact integers; the score
    is one float expression of identical integer inputs, rounded to
    4. Zero shuffles — a narrow per-row projection over let-bound
    token arrays.

    Output: (doc_id, n_sentences, n_words, n_syllables, flesch).
    """
    from ..functions.exprs import let

    c = F.col(text_col)
    sentences = F.filter(
        F.split(c, "[.!?]+"), lambda s: F.trim(s) != ""
    )
    words = F.filter(
        F.split(F.lower(c), "[^a-z]+"), lambda x: F.length(x) > 0
    )

    def syl(ws: Column) -> Column:
        return F.aggregate(
            ws,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.greatest(
                F.size(
                    F.filter(
                        F.split(w, "[^aeiouy]+"),
                        lambda g: F.length(g) > 0,
                    )
                ),
                F.lit(1),
            ).cast("long"),
        )

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.size(sentences), F.lit(1)).alias("n_sentences"),
        let(
            words,
            lambda ws: F.struct(
                F.size(ws).alias("nw"), syl(ws).alias("ns")
            ),
        ).alias("_w"),
    ).select(
        "doc_id",
        "n_sentences",
        F.col("_w.nw").alias("n_words"),
        F.col("_w.ns").alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (
            F.col("n_words").cast("double")
            / F.col("n_sentences").cast("double")
        )
        - F.lit(84.6)
        * (
            F.col("n_syllables").cast("double")
            / F.col("n_words").cast("double")
        )
    )
    return staged.filter(F.col("n_words") > 0).select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(flesch, 4).alias("flesch"),
    )


def readability_sql_duckdb(
    table: str = "documents", text_expr: str = "text"
) -> str:
    """DuckDB twin — identical splits, minimums, and float order."""
    sents = (
        f"greatest(len(list_filter(string_split_regex({text_expr},"
        f" '[\\.!\\?]+'), s -> trim(s) <> '')), 1)"
    )
    words = (
        f"list_filter(string_split_regex(lower({text_expr}),"
        f" '[^a-z]+'), x -> length(x) > 0)"
    )
    syl = (
        "list_sum(list_transform(w, x -> greatest("
        "len(list_filter(string_split_regex(x, '[^aeiouy]+'),"
        " g -> length(g) > 0)), 1)))"
    )
    return f"""
WITH staged AS (
  SELECT doc_id, {sents} AS n_sentences, w,
         len(w) AS n_words,
         CASE WHEN len(w) = 0 THEN 0
              ELSE cast({syl} AS BIGINT) END AS n_syllables
  FROM (SELECT doc_id, {words} AS w, {text_expr} FROM {table})
)
SELECT doc_id, n_sentences, n_words, n_syllables,
       round(206.835
             - 1.015 * (cast(n_words AS DOUBLE)
                        / cast(n_sentences AS DOUBLE))
             - 84.6 * (cast(n_syllables AS DOUBLE)
                       / cast(n_words AS DOUBLE)), 4) AS flesch
FROM staged WHERE n_words > 0
"""
