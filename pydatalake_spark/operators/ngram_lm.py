"""Corpus-trained n-gram language-model scoring — the perplexity-filter
tier of a pre-training data pipeline (KenLM-style quality gates as in
CCNet / Wenzek et al. 2020, re-expressed as pure DataFrame algebra).

Reference parity: the reference engine has no LM scoring; this is a
beyond-reference north-star op (brief: "text analysis" family, sibling of
``unigram_surprisal`` in queries/text.py).

Scale design (100 TB corpus):
- One tokenize+explode pass produces positional bigrams; everything
  downstream works on the (doc, w1, w2, count) COLLAPSED granularity
  (the DSIR pattern, operators/dsir.py) so per-doc token multiplicity
  never re-crosses a shuffle.
- The trained model is two vocabulary-sized tables (bigram counts,
  context counts). Zipf: vocabulary << corpus, so the score joins are
  equi-joins of a corpus-sized side against vocabulary-sized sides —
  Catalyst broadcasts them under AQE when they fit, and the fallback
  shuffle is keyed on the token columns (no skew beyond natural Zipf
  head, which the collapsed granularity already bounds per doc).
- The vocabulary size |V| is a single scalar aggregate crossed in as a
  literal-free broadcast (no driver collect in the plan hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import tokenize


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2, c_doc): per-document bigram multiplicities.

    The token array is bound to a REAL column before the pair transform:
    referencing the raw ``split()`` expression from inside the lambda
    would re-inline (and re-split) it per element — the HOF re-inline
    hazard (O(n²) per doc; same fix as winnowing). One explode, then a
    per-doc collapse whose partial agg runs map-side.
    """
    bound = docs.select(F.col(id_col), tokenize(text_col).alias("__toks"))
    toks = F.col("__toks")
    pairs: Column = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, i: F.struct(
            t.alias("w1"), F.element_at(toks, i + 2).alias("w2")
        ),
    )
    return (
        bound.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.w1", "p.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_doc"))
    )


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram surprisal −ln p(w2|w1) under an add-k
    smoothed bigram LM trained on the SAME corpus in the same lazy plan.

    p(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·|V|), |V| = distinct tokens.

    Returns (id, n_bigrams BIGINT, avg_surprisal DOUBLE, ppl DOUBLE);
    documents with fewer than two tokens contribute no rows (no bigram
    evidence to score). ``ppl = exp(avg_surprisal)`` is the standard
    per-token perplexity readout.
    """
    db = _doc_bigrams(docs, id_col, text_col)
    bg = db.groupBy("w1", "w2").agg(F.sum("c_doc").alias("c_bg"))
    ctx = db.groupBy("w1").agg(F.sum("c_doc").alias("c_ctx"))
    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    k = F.lit(float(add_k))
    scored = (
        db.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "s",
            -F.log(
                (F.col("c_bg") + k)
                / (F.col("c_ctx") + k * F.col("v"))
            ),
        )
    )
    avg = F.sum(F.col("c_doc") * F.col("s")) / F.sum("c_doc")
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("c_doc").cast("long").alias("n_bigrams"),
            avg.alias("avg_surprisal"),
        )
        .withColumn("ppl", F.exp("avg_surprisal"))
    )


def token_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top-N adjacent-token pairs by pointwise mutual information — the
    phrase-mining pass (word2vec-style collocation detection, Mikolov et
    al. 2013 §4) over a training corpus.

    PMI(w1,w2) = ln( (C12/N2) / ((C1/N)·(C2/N)) ) with C12 over adjacent
    pairs (N2 total bigrams) and C1/C2 unigram counts (N total tokens).
    Pairs below ``min_count`` bigram occurrences are pruned BEFORE the
    unigram joins (Zipf tail cut — the candidate table is tiny at any
    corpus size). Returns (w1, w2, n_pair BIGINT, pmi DOUBLE) with a
    deterministic (pmi DESC, w1, w2) top-N — TakeOrderedAndProject, no
    global sort.
    """
    db = _doc_bigrams(docs, id_col, text_col)
    pair = (
        db.groupBy("w1", "w2")
        .agg(F.sum("c_doc").alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    tok = docs.select(F.explode(tokenize(text_col)).alias("t"))
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    totals = uni.agg(F.sum("c").alias("n_tok"))
    n2 = db.agg(F.sum("c_doc").alias("n_bg"))
    scored = (
        pair.join(uni.withColumnsRenamed({"t": "w1", "c": "c1"}), "w1")
        .join(uni.withColumnsRenamed({"t": "w2", "c": "c2"}), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("n_pair"),
            F.log(
                (F.col("c12") / F.col("n_bg"))
                / (
                    (F.col("c1") / F.col("n_tok"))
                    * (F.col("c2") / F.col("n_tok"))
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_n)


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Top-N documents by BM25 (Robertson/Okapi) for a bag of query
    terms — the lexical-retrieval complement of the embedding ANN tier
    (hybrid search = this + ``cosine_topk``).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Returns (id, score DOUBLE) with a deterministic (score DESC, id)
    top-N. Scale shape: the token stream is filtered to the query terms
    BEFORE any aggregation (the per-term postings are the only rows that
    ever reach an exchange — query-sized, not corpus-sized); document
    length and corpus stats ride one narrow per-doc projection; N, avgdl
    and the per-term df/idf table are scalars/broadcasts. Top-N plans as
    TakeOrderedAndProject.
    """
    terms = [t for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    bound = docs.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    )
    dl = bound.select(
        F.col(id_col), F.size("__toks").cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tok = bound.select(
        F.col(id_col), F.explode("__toks").alias("t")
    ).filter(F.col("t").isin(terms))
    tf = tok.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("s").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_n)
    )
