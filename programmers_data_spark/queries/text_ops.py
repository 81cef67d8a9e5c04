"""Text-analysis queries over `documents` (north-star tier).

Token/char statistics, quality scoring, fingerprinting, language-ID.
All Spark forms are pure built-in expressions (functions/textfn.py);
oracles mirror the same arithmetic in DuckDB (integer counts +
single-division ratios, so doubles agree bitwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import textfn
from ..registry import ORACLE, query

from ._oracle_shared import _DUCK_TOKS
_DUCK_STOPS = "['the','and','of','to','a','in','is','it']"
# regex matching textfn.punct_count's class; embedded in a
# single-quoted SQL literal, so the single quote is doubled for SQL
_DUCK_PUNCT = r"""[\.,;:!\?"''\(\)\[\]]"""


@query(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           len({_DUCK_TOKS}) AS n_tokens,
           length(text) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token + char counts (whitespace tokenizer)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textfn.token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


@query(
    "text_stats",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_chars,
           CAST(sum(len({_DUCK_TOKS})) AS DOUBLE) / count(*) AS avg_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language label: the histogram pass every
    pretraining pipeline runs first. Integer sums + one terminal
    division keep doubles exact."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = F.count(F.lit(1))
    chars = F.sum(F.length("text"))
    toks = F.sum(textfn.token_count("text"))
    return (
        docs.groupBy("lang")
        .agg(
            cnt.alias("n_docs"),
            chars.alias("total_chars"),
            toks.alias("total_tokens"),
            (chars.cast("double") / cnt).alias("avg_chars"),
            (toks.cast("double") / cnt).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased
    text — the portable content hash used by exact dedup. (The engine
    also offers xxhash64 fingerprints — textfn.fingerprint — for
    cheaper 64-bit keys at scale.)"""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm.cast("binary")).alias("fp")).orderBy(
        "doc_id"
    )


@query(
    "quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({_DUCK_TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '{_DUCK_PUNCT}')) AS n_punct,
             len(list_filter({_DUCK_TOKS},
                 t -> list_contains({_DUCK_STOPS}, lower(t)))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars >= 50 AND n_chars <= 10000 AS DOUBLE) * 0.4
           + CAST(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) < 0.2 AS DOUBLE) * 0.3
           + least(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) * 3, 1.0) * 0.3
             AS score
    FROM t
    ORDER BY doc_id
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite doc-quality score (length band, punctuation sanity,
    stopword presence) — the classic pretraining filter trio."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textfn.quality_score("text").alias("score")
    ).orderBy("doc_id")


def lang_pred_ctes() -> str:
    """DuckDB twin of textfn.lang_id as a reusable CTE chain ending in
    `p(doc_id, lang, source, predicted_lang)`: same whitespace-
    normalized space-delimited token hits per profile (str_split +
    list_filter ≡ the Spark lookaround regexp_count), same argmax
    tie-break — list_sort of {'score','lang'} structs picks max score
    then lexicographically greatest lang, exactly like Spark's
    array_max over struct(score, lang). Shared by lang_id_heuristic
    and round3_ops.doc_lang_mix."""
    structs = ",\n        ".join(
        "{'score': len(list_filter(toks, x -> list_contains([%s], x))), 'lang': '%s'}"
        % (", ".join(f"'{w}'" for w in words), lang)
        for lang, words in textfn.LANG_PROFILES.items()
    )
    n = len(textfn.LANG_PROFILES)
    return f"""
    t AS (
      SELECT doc_id, lang, source,
             str_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang, source, list_sort([
        {structs}
      ])[{n}] AS best
      FROM t
    ), p AS (
      SELECT doc_id, lang, source,
             CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS predicted_lang
      FROM s
    )"""


def _lang_id_oracle() -> str:
    return f"""
    WITH {lang_pred_ctes()}
    SELECT doc_id, lang, predicted_lang,
           CAST(CASE WHEN lang = predicted_lang THEN 1 ELSE 0 END AS INTEGER) AS agrees
    FROM p ORDER BY doc_id
    """


@query("lang_id_heuristic", oracle=_lang_id_oracle())
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language-ID (textfn.lang_id, the codegen
    regexp_count form) with agreement against the fixture's lang
    label. Map-only; scales linearly."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            textfn.lang_id("text").alias("predicted_lang"),
        )
        .withColumn(
            "agrees", (F.col("lang") == F.col("predicted_lang")).cast("int")
        )
        .orderBy("doc_id")
    )


@query(
    "bpe_token_count",
    oracle="""
    SELECT doc_id,
           len({toks}) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r]'))
             AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """.format(toks=_DUCK_TOKS),
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-flavored token estimate next to the whitespace count: runs
    of alphanumerics count once, every other non-space char counts
    individually — the cheap regex proxy for subword tokenizers
    (both engines evaluate the same RE2/Java-compatible pattern:
    no lookarounds, so it ports exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r]"), F.lit(0)
        )
    )
    return docs.select(
        "doc_id",
        textfn.token_count("text").alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    ).orderBy("doc_id")


_WINNOW_K = 8  # char-gram length
_WINNOW_W = 4  # winnowing window (mins over w consecutive gram hashes)


@query(
    "doc_winnow_fingerprint",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
      FROM documents
      WHERE doc_id < 200
    ),
    grams AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(t) - {_WINNOW_K - 1}, 1)),
               i -> substr(md5(substr(t, i, {_WINNOW_K})), 1, 8)
             ) AS hs
      FROM norm
    ),
    wins AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - {_WINNOW_W - 1}, 1)),
               j -> list_min(hs[j:j+{_WINNOW_W - 1}])
             )) AS fps
      FROM grams
    )
    SELECT doc_id, unnest(fps) AS fp
    FROM wins
    ORDER BY doc_id, fp
    """,
)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the rolling-hash scheme behind MOSS):
    hash every 8-char gram of the normalized text, keep the minimum
    hash of each 4-gram window, emit the distinct mins — a position-
    robust fingerprint set that survives local edits, unlike the
    whole-document md5 (doc_fingerprint). Bounded to doc_id < 200:
    the per-doc fingerprint set is ~text_length/w rows, and the
    operator itself is map-only (scales linearly; the bound only caps
    oracle-comparison volume).

    Gram hashes come from posexplode over the position range + one
    codegen md5 per row, with the w-window minimum as a rows-framed
    window function — the transform/slice HOF form ran interpreted
    (an md5 per array element per branch) and cost 7.2 s at sf0.1;
    this form is < 1 s for identical output."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    pos = docs.select(
        "doc_id",
        norm.alias("t"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length(norm) - (_WINNOW_K - 1), F.lit(1))
            )
        ).alias("i"),
    )
    gram_hash = F.substring(
        F.md5(F.col("t").substr(F.col("i"), F.lit(_WINNOW_K)).cast("binary")),
        1,
        8,
    )
    # window start positions run 1..greatest(n_grams-(w-1), 1): the
    # same clamp the sequence form used, so truncated tail windows are
    # excluded except for degenerate short docs
    n_grams = F.greatest(F.length("t") - (_WINNOW_K - 1), F.lit(1))
    wmin = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, _WINNOW_W - 1)
    return (
        pos.select(
            "doc_id",
            "i",
            n_grams.alias("n_grams"),
            gram_hash.alias("h"),
        )
        .select(
            "doc_id",
            "i",
            "n_grams",
            F.min("h").over(wmin).alias("fp"),
        )
        .filter(
            F.col("i") <= F.greatest(F.col("n_grams") - (_WINNOW_W - 1), F.lit(1))
        )
        .select("doc_id", "fp")
        .distinct()
        .orderBy("doc_id", "fp")
    )


@query(
    "corpus_clean",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             CAST(length(text) >= 50 AND length(text) <= 10000 AS DOUBLE) * 0.4
             + CAST(CAST(len(regexp_extract_all(text, '{_DUCK_PUNCT}')) AS DOUBLE)
                    / greatest(length(text), 1) < 0.2 AS DOUBLE) * 0.3
             + least(CAST(len(list_filter({_DUCK_TOKS},
                     t -> list_contains({_DUCK_STOPS}, lower(t)))) AS DOUBLE)
                     / greatest(len({_DUCK_TOKS}), 1) * 3, 1.0) * 0.3
               AS score
      FROM documents
    ),
    kept AS (
      SELECT doc_id, lang, text FROM scored WHERE score >= 0.7
    ),
    deduped AS (
      SELECT doc_id, lang, text
      FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
        FROM kept
      )
      WHERE rn = 1
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS total_tokens
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-corpus pass: quality filter (≥0.7) →
    exact dedup (keep lowest doc_id per content hash) → per-language
    doc/token counts — the operators above chained as one Catalyst
    plan. The filter prunes before the dedup shuffle, the shuffle key
    is the content hash, and the final agg combines map-side: the
    composition costs one shuffle more than the cheapest member."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(textfn.quality_score("text") >= 0.7)
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(textfn.token_count("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "corpus_sample_hash",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(text), 1, 2) < '1a'
    ORDER BY doc_id
    """,
)
def corpus_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample by content hash (first md5
    byte < 0x1a ≈ 26/256). Unlike df.sample(), the same document is
    in or out on every run, every engine, every partitioning — the
    reproducible-sampling primitive for eval splits and A/B corpus
    experiments. Map-only; the predicate pushes to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.substring(F.md5(F.col("text").cast("binary")), 1, 2) < "1a")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# deterministic PII injection (the fixture corpus contains no PII):
# every 10th doc gains a synthetic email + phone, identically in both
# engines, so the redaction path is exercised non-vacuously.
_PII_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]"
_PII_PHONE = "555-[0-9]{4}"


@query(
    "pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INT)
             AS n_phones,
           regexp_replace(
             regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
    FROM aug
    ORDER BY doc_id
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — a first-class training-data pipeline stage:
    count and redact email/phone matches per document. Pure built-in
    regexp expressions (JVM-side, whole-stage codegen), map-only, so
    at 100 TB this is a linear scan with zero shuffle; the patterns
    are ASCII-only so Java regex and RE2 agree byte-for-byte.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(_PII_PHONE)).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ).alias("redacted"),
    ).orderBy("doc_id")


@query(
    "vocab_topk",
    oracle=f"""
    SELECT tok, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest({_DUCK_TOKS}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 100
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-100 token frequencies — the
    wordcount that seeds tokenizer training. explode → groupBy is the
    canonical two-phase aggregate (map-side partial counts collapse
    the token stream before the shuffle); the top-k runs as
    TakeOrdered (per-partition heap), never a global sort. Ties break
    alphabetically so the cutoff row is deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(textfn.tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(100)
    )


@query(
    "top_terms_per_doc",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC, tf.term
             ) AS rn
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, score
    FROM scored WHERE rn <= 3
    ORDER BY doc_id, term
    """,
)
def top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style distinctive terms: top-3 terms per document scored
    tf × (N/df) — a LINEAR inverse-document-frequency, deliberately:
    score is one IEEE division of exact integers, so Spark and DuckDB
    produce bit-identical doubles, where log-idf would differ in the
    last ulp between libm implementations.

    Shape: explode → per-(doc,term) tf agg → term df agg joined back
    on term → per-doc top-3 window. At 100 TB the df table is the
    small side (vocabulary-sized) and broadcasts; the window
    partitions by doc_id, which is also tf's grouping key, so the
    sort reuses the same partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(textfn.tokenize("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # driver-side scalar: one count job, literal thereafter
    score = (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc(score), "term")
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
        .orderBy("doc_id", "term")
    )


@query(
    "doc_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(i - 1 AS INT) AS chunk_id,
           coalesce(array_to_string(toks[(i-1)*24 + 1 : (i-1)*24 + 32], ' '),
                    '') AS chunk,
           CAST(least(len(toks) - (i-1)*24, 32) AS INT) AS n_tokens
    FROM toks,
         LATERAL unnest(generate_series(
           1, greatest(1, CAST(ceil((len(toks) - 8) / 24.0) AS INT)))) AS t(i)
    ORDER BY doc_id, chunk_id
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into token windows
    of 32 with stride 24 (8-token overlap) — the chunk layout LLM
    pretraining pipelines feed tokenizers. Pure built-in expressions
    (sequence + transform + slice, then posexplode): map-only, no
    Python, no shuffle; output order is (doc_id, chunk_id) so
    downstream writes cluster chunks of a document together.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = textfn.tokenize("text")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size("toks") - F.lit(8)) / F.lit(24.0)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice("toks", (i - 1) * 24 + 1, 32)).alias("chunk"),
            F.least(F.size("toks") - (i - 1) * 24, F.lit(32)).alias("n_tokens"),
        ),
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.n_tokens").cast("int").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# Heavy-hitter threshold: a token is a heavy hitter when it exceeds
# 1/HH_K of the corpus token stream. The candidate pass keeps the
# top HH_K values per Arrow batch — a GUARANTEED superset: if
# global freq(x) > n/K then in some batch freq_b(x) > n_b/K
# (pigeonhole), and fewer than K values can exceed n_b/K in a batch,
# so x is inside that batch's top-K by count.
HH_K = 30


@query(
    "token_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
    SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM toks, tot
    GROUP BY tok, tot.n
    HAVING count(*) * {HH_K} > tot.n
    ORDER BY n_occurrences DESC, tok
    """,
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters (tokens above 1/K of the corpus
    stream) via the two-pass candidate/verify pattern: a map-only
    per-batch top-K count pass yields a candidate set that PROVABLY
    contains every true heavy hitter (pigeonhole over batches — the
    same guarantee a per-partition Misra-Gries sketch gives, here as
    one vectorized value_counts per Arrow batch), then one exact
    count pass restricted to candidates. The full-vocabulary groupBy
    never happens: only candidate occurrences shuffle, so a 100 TB
    stream with a billion-key vocabulary aggregates ~K keys per
    batch instead of all of them. Output is EXACT (the verify pass
    recounts candidates and applies the threshold as an integer
    cross-multiplication), which is why a plain SQL oracle exists —
    the sketch bounds the candidate set, not the answer.

    Distinct from vocab_topk (rank-based top-k needs a full-vocab
    aggregate); threshold-exceeders admit the candidate-pruned plan.

    The token stream reads the PUBLISHED token store (r18): this plan
    references it three times (candidate pass, total count, verify
    count) and each reference previously re-ran the trim+regex
    tokenize over raw text. The pigeonhole superset guarantee holds
    under ANY batching, so the store's row layout cannot affect the
    exact output."""
    import pandas as pd

    from ..derived_store import token_store

    toks = token_store(spark, sf_dir).select(
        F.explode("toks").alias("tok")
    )

    def batch_topk(batches):
        for pdf in batches:
            vc = pdf["tok"].value_counts().head(HH_K)
            yield pd.DataFrame({"tok": vc.index})

    # NO repartition before the candidate pass: the pigeonhole
    # superset guarantee holds for any batching, so shuffling the
    # whole token stream first would cost more movement than the
    # full-vocabulary groupBy this query exists to avoid — the pass
    # runs map-side on the scan partitions as-is.
    cands = toks.mapInPandas(batch_topk, schema="tok string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    counted = (
        toks.join(F.broadcast(cands), "tok", "semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * HH_K > F.col("n"))
        .select("tok", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), "tok")
    )


# winnow-collision pair generation: fingerprints shared by more than
# this many docs are boilerplate and dropped (the MOSS rule — also
# what keeps the self-join fan-out SUM(df^2)-bounded, the tfidf
# candidate-economics argument); pairs need at least MIN_SHARED
# surviving fingerprints in common.
_WINNOW_DF_CAP = 10
_WINNOW_MIN_SHARED = 3
_WINNOW_CONTAINMENT = 0.2


@query(
    "winnow_collision_pairs",
    oracle="""
    WITH fps AS (
      {winnow}
    ),
    rare AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING count(DISTINCT doc_id) <= {df_cap}
    ),
    kept AS (
      SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)
    ),
    sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
      FROM kept GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared
      FROM kept a JOIN kept b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {min_shared}
    )
    SELECT doc_a, doc_b, shared, containment
    FROM (
      SELECT p.doc_a, p.doc_b, p.shared,
             CAST(p.shared AS DOUBLE) / least(sa.n_fp, sb.n_fp)
               AS containment
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
    )
    WHERE containment >= {containment}
    ORDER BY doc_a, doc_b
    """.format(
        winnow=ORACLE["doc_winnow_fingerprint"],
        df_cap=_WINNOW_DF_CAP,
        min_shared=_WINNOW_MIN_SHARED,
        containment=_WINNOW_CONTAINMENT,
    ),
)
def winnow_collision_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-overlap near-dup pairs via winnowing-fingerprint
    collisions (the MOSS detection step): docs sharing >= MIN_SHARED
    rare fingerprints with containment = shared / min set size at
    least _WINNOW_CONTAINMENT — catches partial/copied-passage
    overlap that whole-document shingle Jaccard dilutes away. Completes the dedup family next to
    exact / MinHash / SimHash / semantic.

    Scale shape: inherits the fingerprint pass (map-only, see
    doc_winnow_fingerprint incl. its doc_id<200 oracle cap);
    ubiquitous fingerprints are dropped at _WINNOW_DF_CAP before the
    self-equi-join, so pair fan-out is SUM(df^2) over rare
    fingerprints — the same bounded candidate economics as
    tfidf_shingle_pairs, never all-pairs. Containment is one IEEE
    division of exact integers (bitwise-portable)."""
    from pyspark.sql.window import Window

    # One fingerprint pass per self-join side, not eight: the original
    # rare/kept/sizes composition re-evaluated the whole winnow
    # subtree (documents scan -> gram-stream explode -> rolling-min
    # window) EIGHT times in one plan (r17 plan capture:
    # winnow_collision_pairs_before.txt). The df cap and the per-doc
    # fingerprint count are windows over the SAME fps rows instead of
    # aggregate+join pairs — fps rows are distinct (doc_id, fp) by
    # construction, so count(*) per fp IS the distinct-doc frequency —
    # and n_fp rides through the self-join so no sizes join re-derives
    # the pass. (A persist of fps/kept was measured too: the
    # materialization barriers cost more than the recompute saves at
    # bench scale — interleaved A/B old 2.81 / persist 3.69 / this
    # form 2.48.)
    fps = doc_winnow_fingerprint(spark, sf_dir)
    kept = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("df") <= _WINNOW_DF_CAP)
        .withColumn(
            "n_fp",
            F.count(F.lit(1)).over(Window.partitionBy("doc_id")).cast("long"),
        )
        .select("doc_id", "fp", "n_fp")
    )
    a = kept.select(
        F.col("doc_id").alias("doc_a"), "fp", F.col("n_fp").alias("na")
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "fp", F.col("n_fp").alias("nb")
    )
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared"),
            # na/nb are functionally dependent on doc_a/doc_b: max of a
            # per-group constant is that constant
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
        .filter(F.col("shared") >= _WINNOW_MIN_SHARED)
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            "shared",
            (
                F.col("shared").cast("double")
                / F.least(F.col("na"), F.col("nb"))
            ).alias("containment"),
        )
        .filter(F.col("containment") >= F.lit(_WINNOW_CONTAINMENT))
        .orderBy("doc_a", "doc_b")
    )
