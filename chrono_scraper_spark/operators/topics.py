"""Topic / content-clustering operators: distributed TF-IDF, per-doc top
terms, deterministic cosine k-means, and closed-form cluster cohesion.

Re-expresses the reference's topic-modeling service
(``backend/app/services/topic_modeling.py``) Spark-first:

* TF-IDF vectorization (``TfidfVectorizer(max_features, min_df=2,
  max_df=0.8)``, topic_modeling.py:145-152 / 408-415) → ``tfidf_terms``:
  the corpus-wide document-frequency pass is one map-side-combined hash
  agg; the vocabulary (≤ ``max_features`` rows by construction) is
  **broadcast** back onto the per-doc term counts, so document text is
  tokenized exactly once and never shuffled — the only exchanges move
  (doc_id, term, count) rows, and the vocab cap bounds every per-doc
  vector at ``max_features`` components.
* KMeans content clustering (``KMeans(n_clusters, random_state=42)``,
  topic_modeling.py:399-417) → ``kmeans_clusters``: fixed-iteration Lloyd
  over cosine distance. sklearn's n_init=10 random restarts are replaced
  by a deterministic seeding (the k docs with the smallest
  ``md5(doc_id)`` — portable to the DuckDB oracle) so engine and oracle
  converge to the identical fixpoint; disclosed convention, same spirit
  as the reference pinning ``random_state=42``.
* Cluster cohesion — mean pairwise cosine (topic_modeling.py:436-440) →
  ``cluster_cohesion``: the reference materializes the full n×n
  ``cosine_similarity`` matrix per cluster; at corpus scale that is
  O(n²·dim). For unit vectors mean pairwise cosine has the closed form
  ``(‖Σv̂‖² − n) / (n·(n−1))``, so one groupBy(cluster, term) sum + one
  groupBy(cluster) sum-of-squares replaces the pairwise matrix — O(nnz).
* Per-cluster representative terms (centroid top-10,
  topic_modeling.py:430-434) ride along in ``cluster_cohesion``.

LDA / NMF (topic_modeling.py:137-318) are **n/a-by-design**: sklearn's
online variational LDA / randomized-init NMF are nondeterministic
library-internal fits a corpus replay cannot value-check. The clustering
path above (same TF-IDF features → hard assignments + top terms per
group) is the reference's own fallback representation of "topics"
(cluster_summaries top_terms); a real deployment would call
``pyspark.ml.clustering.LDA`` on the ``tfidf_terms`` output, which this
long format feeds directly.

Cross-engine determinism (the driver hash-compares values): every
accumulation happens in exact integer arithmetic — idf is quantized once
to micro units (``floor(idf·1e6)`` as long), tf·idf weights are exact
longs, dot products / squared norms are exact ``decimal(38,0)`` sums
(order-independent, unlike double sums) — and doubles appear only in
final single-expression transforms (sqrt / divide / round) of identical
exact integers, which IEEE-754 rounds identically on both engines.

Scale notes (100 TB): centroid components are **sum** vectors, not means
— cosine is scale-invariant, so Σ ≡ Σ/n and the update needs no
division, stays exact, and a mega-cluster's component magnitude can be
rescaled by any per-cluster constant (e.g. a right-shift) without
changing assignments if decimal headroom ever matters. The k·vocab
centroid relation (≤ k·max_features rows) is broadcast every iteration;
document vectors are re-derived from the cached weights relation, never
re-tokenized. Docs sharing no vocabulary term with any centroid (or
pruned empty by min_df/max_df) have no cosine defined and are absent
from the output — inner-join semantics, same convention as
``quality.unigram_logprob``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textops as T
from . import text_dedup as TD

_DEC = "decimal(38,0)"


def _term_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf) — raw per-doc term counts, vocab-unpruned."""
    return (docs
            .select(F.col(id_col),
                    F.explode(T.tokens(F.col(text_col))).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count("*").alias("tf")))


def tfidf_vocab(tf: DataFrame, id_col: str = "doc_id",
                min_df: int = 2, max_df_frac: float = 0.8,
                max_features: int = 1000) -> DataFrame:
    """Vocabulary + idf from a (doc, term, tf) relation: keep terms with
    ``min_df ≤ df ≤ floor(max_df_frac·n_docs)``, cap at ``max_features``
    by (corpus frequency DESC, term ASC) — sklearn's max_features rule
    with a deterministic tie-break. idf is sklearn's smooth default
    ``ln((1+n)/(1+df)) + 1``, quantized to micro units (long).

    The df agg partial-aggregates map-side; the cap is a TakeOrdered
    top-k, never a full sort. n_docs rides in as a broadcast 1-row join
    (no driver collect)."""
    n = tf.select(id_col).distinct().agg(
        F.count("*").alias("_n_docs"))
    df_ = (tf.groupBy("term")
           .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
    kept = (df_.join(F.broadcast(n))
            .filter((F.col("df") >= min_df)
                    & (F.col("df") <= F.floor(F.lit(max_df_frac)
                                              * F.col("_n_docs"))))
            .orderBy(F.col("cf").desc(), F.col("term"))
            .limit(max_features))
    return kept.select(
        "term", "df", "cf",
        F.floor((F.log((1 + F.col("_n_docs")) / (1 + F.col("df"))) + 1)
                * 1e6).cast("long").alias("idf_micro"))


def tfidf_terms(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", min_df: int = 2,
                max_df_frac: float = 0.8,
                max_features: int = 1000) -> DataFrame:
    """Sparse TF-IDF in long format: (doc_id, term, tf, w, weight) where
    ``w = tf·idf_micro`` is the exact integer weight (all ranking and
    all downstream accumulation use it) and ``weight`` is the
    l2-normalized display value (sklearn ``norm='l2'``), a final-step
    double rounded to 6.

    One tokenize pass — enforced: the (doc, term, tf) counts relation is
    eagerly localCheckpointed, because it feeds the n_docs agg, the df
    agg, AND the weights join; left lazy, Catalyst re-expands the
    tokenize+explode into all of them (6 Generates in one plan) and a
    100 TB corpus would be scanned six times. The checkpoint holds the
    long-format counts — already the compacted form of the corpus.
    Vocabulary (≤ max_features rows) broadcast back; the l2 norm is a
    per-doc sum of exact decimal squares."""
    tf = _term_counts(docs, id_col, text_col).localCheckpoint(eager=True)
    vocab = tfidf_vocab(tf, id_col, min_df, max_df_frac, max_features)
    w = (tf.join(F.broadcast(vocab.select("term", "idf_micro")), "term")
         .select(id_col, "term", "tf",
                 (F.col("tf") * F.col("idf_micro")).alias("w")))
    norm2 = w.groupBy(id_col).agg(
        F.sum((F.col("w").cast(_DEC) * F.col("w"))).alias("_n2"))
    return (w.join(norm2, id_col)
            .select(id_col, "term", "tf", "w",
                    F.round(F.col("w")
                            / F.sqrt(F.col("_n2").cast("double")), 6)
                    .alias("weight")))


def tfidf_topk(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text", min_df: int = 2,
               max_df_frac: float = 0.8,
               max_features: int = 1000) -> DataFrame:
    """Per-doc top-k TF-IDF terms (rank by exact integer weight DESC,
    term ASC). The window partitions by doc and each partition holds at
    most ``max_features`` rows (vocab cap), so WindowGroupLimit keeps
    per-task state at k rows — no mega-partition risk at any corpus
    size."""
    terms = tfidf_terms(docs, id_col, text_col, min_df, max_df_frac,
                        max_features)
    rn = F.row_number().over(
        Window.partitionBy(id_col)
        .orderBy(F.col("w").desc(), F.col("term")))
    return (terms.withColumn("rnk", rn).filter(F.col("rnk") <= k)
            .select(id_col, F.col("rnk").cast("long").alias("rnk"),
                    "term", "tf", "weight"))


def _cosine_nano(dot, n2_doc, n2_cent):
    """floor(1e9·cos) from exact-decimal dot and squared norms — the one
    double expression, identical on both engines for identical exact
    inputs."""
    return F.floor(dot.cast("double")
                   / (F.sqrt(n2_doc.cast("double"))
                      * F.sqrt(n2_cent.cast("double")))
                   * 1e9).cast("long")


def kmeans_clusters(docs: DataFrame, k: int = 8, iters: int = 2,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_df: int = 2, max_df_frac: float = 0.8,
                    max_features: int = 1000,
                    vectors: DataFrame | None = None) -> DataFrame:
    """Deterministic cosine k-means over TF-IDF vectors
    (topic_modeling.py:399-417's ``KMeans(n_clusters,
    random_state=42)``): exactly ``iters`` assignment steps from the
    md5-seeded init, centroid update between steps.

    Per iteration: centroids (k·max_features rows max) **broadcast**
    onto the sparse doc vectors joined on term — the corpus-sized
    relation never shuffles for the similarity; one (doc, cid) agg forms
    the exact-decimal dot products, one window picks the argmax
    (cos_nano DESC, cid ASC — deterministic ties), one (cid, term) agg
    re-sums centroids. Centroids stay exact integer SUM vectors (cosine
    is scale-invariant, so sums ≡ means and no division error ever
    enters the loop).

    Returns (doc_id, cluster_id, cos_sim) for every doc sharing ≥1
    vocab term with its iteration's centroid set."""
    if vectors is None:
        vectors = tfidf_terms(docs, id_col, text_col, min_df,
                              max_df_frac, max_features)
    # eager localCheckpoint, not persist: the weights relation is
    # referenced once per iteration × (dots, centroid update) plus by
    # every caller-side derivation — checkpointing truncates the tfidf
    # lineage so those references are scans, not re-expansions of the
    # whole DAG (a lazy persist would be dropped before the caller's
    # action and recompute everything)
    vec = (vectors.select(id_col, "term", "w")
           .localCheckpoint(eager=True))
    norm2 = (vec.groupBy(id_col)
             .agg(F.sum(F.col("w").cast(_DEC) * F.col("w"))
                  .alias("_dn2"))
             .localCheckpoint(eager=True))

    seeds = (norm2.select(id_col)
             .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
             .limit(k)
             .select(F.col(id_col),
                     (F.row_number().over(
                         Window.orderBy(
                             F.md5(F.col(id_col).cast("string")),
                             id_col)) - 1)
                     .cast("long").alias("cluster_id")))
    # The centroid table is referenced TWICE per iteration (its norms and
    # the dot products), and each next iteration's cent nests the previous
    # assign — left lazy the plan doubles per iteration (2^iters subtree
    # copies; 87 Exchanges at iters=2 in the cohesion caller). cent is at
    # most k·max_features rows, so an eager localCheckpoint per iteration
    # makes the loop linear in iters for the cost of materializing a few
    # thousand rows.
    cent = (vec.join(F.broadcast(seeds), id_col)
            .select("cluster_id", "term",
                    F.col("w").cast(_DEC).alias("cw"))
            .localCheckpoint(eager=True))

    assign = None
    for step in range(iters):
        cnorm2 = cent.groupBy("cluster_id").agg(
            F.sum(F.col("cw") * F.col("cw")).alias("_cn2"))
        dots = (vec.join(F.broadcast(cent), "term")
                .groupBy(id_col, "cluster_id")
                .agg(F.sum(F.col("w").cast(_DEC) * F.col("cw"))
                     .alias("_dot")))
        sims = (dots.join(norm2, id_col)
                .join(F.broadcast(cnorm2), "cluster_id")
                .select(id_col, "cluster_id",
                        _cosine_nano(F.col("_dot"), F.col("_dn2"),
                                     F.col("_cn2")).alias("cos_nano")))
        rn = F.row_number().over(
            Window.partitionBy(id_col)
            .orderBy(F.col("cos_nano").desc(), F.col("cluster_id")))
        assign = (sims.withColumn("_rn", rn).filter(F.col("_rn") == 1)
                  .select(id_col, "cluster_id", "cos_nano"))
        if step < iters - 1:
            cent = (vec.join(assign.select(id_col, "cluster_id"), id_col)
                    .groupBy("cluster_id", "term")
                    .agg(F.sum(F.col("w").cast(_DEC)).alias("cw"))
                    .localCheckpoint(eager=True))

    return assign.select(
        id_col, "cluster_id",
        F.round(F.col("cos_nano") / 1e9, 6).alias("cos_sim"))


def cluster_cohesion(docs: DataFrame, k: int = 8, iters: int = 2,
                     top_terms: int = 10, id_col: str = "doc_id",
                     text_col: str = "text", min_df: int = 2,
                     max_df_frac: float = 0.8,
                     max_features: int = 1000) -> DataFrame:
    """Per-cluster summary (topic_modeling.py:430-447): document count,
    mean pairwise cosine cohesion, and the centroid's top terms — WITHOUT
    the reference's n×n similarity matrix.

    For l2-normalized members v̂ᵢ, ``Σᵢ≠ⱼ cos(vᵢ,vⱼ) = ‖Σv̂‖² − n``, so
    cohesion = ``(‖Σv̂‖² − n) / (n(n−1))`` — one (cluster, term) sum and
    one (cluster) sum-of-squares, both map-side combinable. Components
    are nano-quantized (``floor(1e9·w/‖v‖)`` longs) before summing so
    the accumulation is order-independent; the quantization error is
    ≤ dim·1e-9 per pairwise term, disclosed. Singletons get cohesion
    1.0 (reference convention, topic_modeling.py:440).

    ``top_terms`` representative terms come from the final SUM centroid
    ranked by (component DESC, term ASC) — identical to ranking the mean
    centroid (topic_modeling.py:430-433)."""
    vectors = tfidf_terms(docs, id_col, text_col, min_df, max_df_frac,
                          max_features).localCheckpoint(eager=True)
    # assign feeds three derivations (unit vectors, sizes, and through
    # them the cohesion join) — truncate the k-means lineage once so each
    # is a scan of the (doc, cluster) result, not a re-run of the loop
    assign = kmeans_clusters(docs, k, iters, id_col, text_col, min_df,
                             max_df_frac, max_features, vectors=vectors
                             ).localCheckpoint(eager=True)
    norm2 = vectors.groupBy(id_col).agg(
        F.sum(F.col("w").cast(_DEC) * F.col("w")).alias("_dn2"))
    unit = (vectors.join(norm2, id_col)
            .join(assign.select(id_col, "cluster_id"), id_col)
            .select("cluster_id", "term",
                    F.floor(F.col("w")
                            / F.sqrt(F.col("_dn2").cast("double"))
                            * 1e9).cast("long").alias("u_nano")))
    # referenced by both the sum-of-squares agg and the top-terms ranking;
    # ≤ k·max_features rows, so materialize once
    comp = unit.groupBy("cluster_id", "term").agg(
        F.sum("u_nano").alias("s")).localCheckpoint(eager=True)
    sums = comp.groupBy("cluster_id").agg(
        F.sum(F.col("s").cast(_DEC) * F.col("s")).alias("_ss2"))
    sizes = assign.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"))
    coh = (sizes.join(sums, "cluster_id")
           .select("cluster_id", "n_docs",
                   F.when(F.col("n_docs") <= 1, F.lit(1.0))
                   .otherwise(F.round(
                       (F.col("_ss2").cast("double") / 1e18
                        - F.col("n_docs"))
                       / (F.col("n_docs") * (F.col("n_docs") - 1)), 6))
                   .alias("cohesion")))
    rn = F.row_number().over(
        Window.partitionBy("cluster_id")
        .orderBy(F.col("s").desc(), F.col("term")))
    terms = (comp.withColumn("_rn", rn).filter(F.col("_rn") <= top_terms)
             .groupBy("cluster_id")
             .agg(F.concat_ws(
                 " ", F.array_sort(F.collect_list(
                     F.struct(F.col("_rn"), F.col("term"))))
                 .getField("term")).alias("top_terms")))
    return (coh.join(terms, "cluster_id")
            .select("cluster_id", "n_docs", "cohesion", "top_terms"))


def dbscan(emb: DataFrame, eps: float = 0.7, min_samples: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding",
           bands: int = 0, r_planes: int = 4, seed: int = 7,
           max_iters: int = 25) -> DataFrame:
    """Distributed DBSCAN over an embedding column with cosine distance
    (``1 − cos``) — the reference's second clustering method
    (topic_modeling.py:401-410, ``DBSCAN(eps, min_samples,
    metric='cosine')``), decomposed into relational steps:

    1. ε-neighbor pairs via ``text_dedup.embedding_near_duplicates``
       (``cos ≥ 1 − eps``): exact all-pairs at ``bands=0`` (the
       verification baseline and the oracle contract), banded
       random-hyperplane LSH + exact verify for corpus scale — shuffle ∝
       bucket collisions, never n². With LSH the result is approximate
       exactly where LSH recall is (a missed edge can demote a core or
       split a component) — the standard distributed-DBSCAN trade; the
       S-curve 1-(1-p^r)^b governs it, and ε-graphs this dense are
       forgiving (a core has ≥ min_samples chances to be recalled).
    2. degrees: one endpoint agg; a point counts itself
       (sklearn convention — min_samples includes the query point).
    3. core points: ``degree ≥ min_samples``; clusters = connected
       components over the core-core subgraph
       (``text_dedup.connected_components`` — min-label propagation,
       O(diameter) rounds; ``algo='star'`` available upstream for
       adversarial chains). Isolated cores (all neighbors non-core)
       become singleton clusters.
    4. border points: non-core with ≥1 core neighbor join the MINIMUM
       core-neighbor's cluster; everything else is noise (−1).

    Disclosed determinism conventions (sklearn's are visit-order-
    dependent, which no distributed engine can reproduce): cluster label
    = min point id among the cluster's cores, and border tie-break = min
    cluster label — both deterministic and engine-portable.

    Output: (id, cluster, role ∈ {core, border, noise}, n_neighbors).
    """
    # materialize the ε-pair list once: it feeds sym (→ degrees →
    # border) AND the core-core subgraph — without truncation the
    # candidate-generation subtree (all-pairs or LSH bucket join)
    # replicates into every downstream reference
    pairs = (TD.embedding_near_duplicates(
        emb, id_col=id_col, vec_col=vec_col, threshold=1.0 - eps,
        bands=bands, r_planes=r_planes, seed=seed)
        .select("a", "b").localCheckpoint(eager=True))
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (sym.groupBy("a").agg((F.count("*") + 1).alias("n_neighbors"))
           .withColumnRenamed("a", "_id"))
    core = (deg.filter(F.col("n_neighbors") >= min_samples)
            .select("_id"))
    core_edges = (pairs
                  .join(core.withColumnRenamed("_id", "a"), "a")
                  .join(core.withColumnRenamed("_id", "b"), "b"))
    cc = TD.connected_components(core_edges, "a", "b",
                                 max_iters=max_iters)
    corec = (core.join(cc.withColumnRenamed("node", "_id"), "_id", "left")
             .select("_id",
                     F.coalesce(F.col("cluster_id"), F.col("_id"))
                     .alias("_core_cl")))
    border = (sym
              .join(corec.select(F.col("_id").alias("b"),
                                 F.col("_core_cl")), "b")
              .join(core.withColumnRenamed("_id", "a"), "a", "left_anti")
              .groupBy("a").agg(F.min("_core_cl").alias("_bord_cl"))
              .withColumnRenamed("a", "_id"))
    pts = emb.select(F.col(id_col).alias("_id"))
    return (pts
            .join(corec, "_id", "left")
            .join(border, "_id", "left")
            .join(deg, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("_core_cl", "_bord_cl", F.lit(-1))
                    .cast("long").alias("cluster"),
                    F.when(F.col("_core_cl").isNotNull(), F.lit("core"))
                    .when(F.col("_bord_cl").isNotNull(), F.lit("border"))
                    .otherwise(F.lit("noise")).alias("role"),
                    F.coalesce(F.col("n_neighbors"), F.lit(1))
                    .cast("long").alias("n_neighbors")))


def lda_topics(docs: DataFrame, k: int = 5, vocab_size: int = 1000,
               min_df: float = 2.0, seed: int = 42, max_iter: int = 20,
               top_terms: int = 10, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """LDA topic extraction via the Spark-native stack — the
    ``extract_topics_lda`` bridge (topic_modeling.py:81-201,
    ``LatentDirichletAllocation(n_components, random_state=42,
    max_iter=20)``): tokens → ``CountVectorizer(vocabSize, minDF)`` →
    ``pyspark.ml.clustering.LDA(k, seed, optimizer='em')``.

    Returns the topic_words analog (topic_modeling.py:176-190): one row
    per (topic_id, rank) with the term and its milli-quantized topic
    weight. The EM optimizer with a pinned seed is the deterministic
    Spark-side counterpart of the reference pinning random_state=42;
    sklearn's *online variational* fit itself is library-internal and
    not value-reproducible cross-engine, so this bridge is unit-tested
    (planted-topic separation) rather than DuckDB-oracled — same
    treatment as ``quality.fasttext_train``. Distribution shape: the
    featurize pass is the same one-tokenize CountVectorizer scan; LDA-EM
    runs Spark-side (GraphX-backed), so the bridge scales with the
    cluster rather than a driver matrix."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = docs.select(F.col(id_col),
                       T.tokens(F.col(text_col)).alias("_tk"))
    cv = CountVectorizer(inputCol="_tk", outputCol="_feat",
                         vocabSize=vocab_size, minDF=min_df)
    cvm = cv.fit(toks)
    feats = cvm.transform(toks).select(id_col, "_feat")
    lda = LDA(k=k, seed=seed, maxIter=max_iter, optimizer="em",
              featuresCol="_feat")
    model = lda.fit(feats)
    spark = docs.sparkSession
    vocab = cvm.vocabulary  # ≤ vocab_size entries, driver-side by design
    rows = []
    for r in model.describeTopics(maxTermsPerTopic=top_terms).collect():
        for rank, (ti, wt) in enumerate(zip(r.termIndices,
                                            r.termWeights), start=1):
            rows.append((int(r.topic), int(rank), vocab[ti],
                         int(round(wt * 1000))))
    return spark.createDataFrame(
        rows, "topic_id long, rank long, term string, weight_milli long")


def topic_assign(docs: DataFrame, topics: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 topic_col: str = "topic_id", term_col: str = "term",
                 cnt_col: str = "cnt") -> DataFrame:
    """Hard topic assignment under count-based unigram topic models —
    the inference half of the topic pipeline (the reference's
    document_topics / page_clusters maps, topic_modeling.py:192-196 /
    420-424), usable with ANY (topic, term, count) table: k-means
    cluster term sums, LDA topic counts, or hand-built taxonomies.

    score(doc, topic) = Σ_tokens log10 P̂(token|topic) with add-one
    smoothing over the GLOBAL topic vocabulary; out-of-vocabulary
    tokens take the smoothed floor 1/(total+V). Per-token logs are
    nano-quantized longs (order-independent sums, the
    ``quality.unigram_logprob`` recipe), so the argmax — ties → lowest
    topic — is bit-deterministic cross-engine.

    Shape: the topic table (k·vocab rows) is **broadcast** with its
    totals; matched tokens aggregate per (doc, topic); the per-doc
    token count closes the OOV term arithmetically — the corpus is
    tokenized once and never shuffled beyond the (doc, topic) agg.
    Token-less docs are absent (inner-join semantics)."""
    # the topic table is a bounded codebook; materialize it once so the
    # four derived broadcasts (totals, vocab size, scored vocab, floors)
    # scan it instead of re-expanding however deep a DAG produced it
    # (e.g. the full k-means chain in q_topic_assign)
    topics = topics.localCheckpoint(eager=True)
    toks = docs.select(F.col(id_col),
                       F.explode(T.tokens(F.col(text_col))).alias("term"))
    # per-doc token counts as a zero-shuffle projection (size of the token
    # array) instead of a second explode + agg over the corpus; the >0
    # filter keeps the exploded branch's inner-join semantics (token-less
    # docs absent)
    nt = (docs.select(F.col(id_col),
                      F.size(T.tokens(F.col(text_col))).alias("_n"))
          .filter(F.col("_n") > 0))
    tot = topics.groupBy(F.col(topic_col)).agg(
        F.sum(F.col(cnt_col)).alias("_tot"))
    vv = topics.agg(F.count_distinct(F.col(term_col)).alias("_v"))
    scored = (topics
              .join(F.broadcast(tot), topic_col)
              .join(F.broadcast(vv))
              .select(F.col(topic_col), F.col(term_col).alias("term"),
                      F.floor(F.log10((F.col(cnt_col) + 1)
                                      / (F.col("_tot") + F.col("_v")))
                              * 1e9).cast("long").alias("_lp")))
    matched = (toks.join(F.broadcast(scored), "term")
               .groupBy(id_col, topic_col)
               .agg(F.sum("_lp").alias("_s"), F.count("*").alias("_nm")))
    floors = (tot.join(F.broadcast(vv))
              .select(topic_col,
                      F.floor(F.log10(1.0 / (F.col("_tot") + F.col("_v")))
                              * 1e9).cast("long").alias("_oov")))
    scores = (nt.join(F.broadcast(floors))
              .join(matched, [id_col, topic_col], "left")
              .select(id_col, topic_col, "_n",
                      (F.coalesce(F.col("_s"), F.lit(0))
                       + (F.col("_n") - F.coalesce(F.col("_nm"),
                                                   F.lit(0)))
                       * F.col("_oov")).alias("_score")))
    rn = F.row_number().over(
        Window.partitionBy(id_col)
        .orderBy(F.col("_score").desc(), F.col(topic_col)))
    return (scores.withColumn("_rn", rn).filter(F.col("_rn") == 1)
            .select(id_col, F.col(topic_col),
                    F.round(F.col("_score") / F.col("_n") / 1e9, 6)
                    .alias("mean_logprob"),
                    F.col("_n").cast("long").alias("n_tokens")))
