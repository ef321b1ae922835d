package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Streaming surface of the SEMANTIC dedup tier — ingest-time embedding
  * dedup against a static corpus ([[Similarity.semDedupAgainstCorpus]]'s
  * stream twin). Unusually for this engine's streaming twins it is
  * fully STATELESS: no watermark, no state store — projections plus one
  * stream-static anti join, the shape that ingests at line rate.
  */
object VecStream {

  /** Stateless ingest-time semantic dedup: arriving vectors assign to
    * the corpus codebook ROW-LOCALLY — the k-centroid book packs into
    * ONE static row that equi-joins in on a constant key (broadcast),
    * and the argmin is an `array_sort` over (dist, cluster) structs,
    * whose lexicographic struct order reproduces the batch tier's
    * (dist asc, cluster asc) tie-break with no rank window (illegal on
    * an unbounded stream). A stream-static LEFT ANTI join against the
    * corpus then drops every vector with a same-cluster near-twin —
    * the identical integer squared-cosine verdict as the batch tier,
    * evaluated inside the join condition.
    *
    * The corpus relations are the lake's offline artifacts (codebook +
    * cluster-assigned vectors with norms); at 100 TB the corpus side
    * persists bucketed by cluster and Spark broadcasts it per cluster
    * shard. Output: surviving (vec_id, ts, cluster) rows, append mode,
    * exactly-once without any state to checkpoint beyond source
    * offsets. */
  def semDedupStream(vecs: DataFrame, corpus: DataFrame,
                     thresholdHundredths: Int, dim: Int = 64): DataFrame = {
    require(thresholdHundredths >= 1 && thresholdHundredths <= 100,
      s"cosine threshold must be in (0, 1] hundredths: $thresholdHundredths")
    val spark = corpus.sparkSession
    val t2 = thresholdHundredths.toLong * thresholdHundredths
    val book = Similarity.coarseBook(spark, corpus, dim)
    // the packed 1-row codebook: a constant-key equi join keeps the
    // stream-static join in the officially supported class (a cross
    // join shape would be rejected by the streaming planner)
    // Both static relations PERSIST: a stream-static join re-evaluates
    // the static side every micro-batch, so an uncached codebook (a
    // full-corpus aggregation) and cluster-assigned corpus would
    // re-run per batch and undercut the line-rate claim. In the lake
    // story these are precomputed offline artifacts; persisting is the
    // in-session stand-in (freed with the session, or unpersist when
    // the stream stops).
    val packed = book
      .agg(collect_list(struct(col("cluster"), col("cq"))).as("book"))
      .withColumn("one", lit(1))
      .persist()
    val corpusSide = Similarity.assignToBook(corpus, book)
      .select(col("vec_id").as("id_c"), col("cluster").as("c_cluster"))
      .join(corpus.select(col("vec_id").as("id_c"),
        col("embedding").as("ec"),
        normSqQuantized(col("embedding"), 100).as("nc")), "id_c")
      .persist()
    val assigned = vecs
      .withColumn("one", lit(1))
      .join(broadcast(packed), "one")
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * 1000).cast("long")))
      .withColumn("cluster", element_at(array_sort(expr(
        """transform(book, b -> named_struct(
          |  'd', aggregate(zip_with(q, b.cq, (x, y) -> (x - y) * (x - y)),
          |         CAST(0 AS BIGINT), (a, x) -> a + x),
          |  'c', b.cluster))""".stripMargin)), 1).getField("c"))
      .withColumn("nb", normSqQuantized(col("embedding"), 100))
    // the dot appears twice in the verdict — same deterministic
    // expression tree; codegen subexpression elimination shares it
    val d = dotQuantized(col("embedding"), col("ec"), 100)
    assigned.join(corpusSide,
        col("cluster") === col("c_cluster") && d > lit(0L) &&
          lit(10000L) * d * d >= lit(t2) * col("nb") * col("nc"),
        "left_anti")
      .select("vec_id", "ts", "cluster")
  }

  /** Stateless ingest-time PQ encode —
    * [[Similarity.pqIncrementalCodes]]'s stream twin, the PQ index's
    * streaming ingest path: arriving vectors take codes against the
    * FROZEN corpus-trained per-subspace book (retraining in-stream
    * would re-code the whole store; the book is the versioned offline
    * artifact). The m·cw-codeword book packs into ONE static row that
    * equi-joins in on a constant key (broadcast — the
    * [[semDedupStream]] rule that keeps the stream-static join in the
    * supported class) INDEXED BY SUBSPACE — `element_at(books, s+1)`
    * lands each slice directly on its own codeword list, no
    * per-subspace rescan of the whole table — and each subspace's
    * argmin IS the batch tier's fused `pq_argmin` kernel
    * ([[graft.functions.PqArgMinCode]], SQL-registered so it binds
    * the transform's lambda variable): the identical packed
    * `dist·2²⁰ + label` scan, the identical (dist asc, code asc)
    * tie-break, and — the r11 ADVICE gap this closes — the identical
    * FAIL-LOUD bounds contract (`checkBounds`: an out-of-envelope
    * distance or label errors instead of silently mis-coding, so the
    * streaming and batch ingest paths share ONE safety contract).
    * Because the argmin is the SQL-registered `pq_argmin`,
    * graft.GraftExtensions must be on the session
    * (`spark.sql.extensions=graft.GraftExtensions`) — a plain
    * session fails analysis with an unresolved-function error (the
    * [[graft.operators.TextOps.rollingFingerprints]] fnv64 rule).
    * No rank window (illegal on an unbounded stream), no state
    * store. Per-row cost is dim·cw multiplies plus one m-length
    * index lookup — constant, the line-rate shape; steady-state
    * ingest rows/s measured in STREAM_PROBE_r13.json
    * ([[graft.VecStreamProbe]] `pq_encode` leg). Output: (vec_id, ts,
    * subspace, code, dist) append rows — the [[Similarity.pqCodes]]
    * contract plus the event time. The persisted book has
    * caller-owned lifecycle ([[DocStream.fuzzyIngestStream]]'s
    * rule). */
  def pqEncodeStream(vecs: DataFrame, corpus: DataFrame, m: Int = 8,
                     dim: Int = 64, scale: Int = 1000, cw: Int = 64,
                     rounds: Int = 2): DataFrame = {
    val sub = dim / m
    val pack = graft.functions.PqArgMinCode.Pack
    val book = Similarity.pqCodebookTrained(corpus, m, cw, rounds, dim,
      scale)
    // books[s + 1] = subspace s's codeword list: every subspace holds
    // ≥ 1 codeword (a vector always assigns somewhere, so the
    // empty-cluster drop can never empty a whole subspace), so the
    // sorted-by-subspace entries pack positionally
    val packed = book
      .groupBy("subspace")
      .agg(collect_list(struct(col("label"), col("cs"))).as("entries"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(subspace, entries)))," +
          " x -> x.entries)").as("books"))
      .withColumn("one", lit(1))
      .persist()
    vecs
      .withColumn("one", lit(1))
      .join(broadcast(packed), "one")
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * scale).cast("long")))
      .select(col("vec_id"), col("ts"), posexplode(expr(
        s"""transform(sequence(0, ${m - 1}), s -> pq_argmin(
           |  slice(q, s * $sub + 1, $sub), element_at(books, s + 1)))"""
          .stripMargin))
        .as(Seq("subspace", "best")))
      .select(col("vec_id"), col("ts"),
        col("subspace").cast("long").as("subspace"),
        (col("best") % pack).as("code"),
        expr(s"best div $pack").as("dist"))
  }

  /** Streaming IVFADC SERVE — arriving query vectors get their
    * single nearest corpus neighbor by PQ approximate distance from
    * the probed Lloyd cell, with raw corpus embeddings NEVER read at
    * query time: the quantized index (codes, m small ints per vector
    * — the storage artifact) decodes once per corpus snapshot into
    * the per-cell serving relation (cell, vec_id, v̂). This is
    * [[graft.operators.Similarity.annIvfPq]]'s stream twin at the one
    * k where state stays BOUNDED (k = 1, the [[nnServeStream]] rule),
    * and the memory-bound production serving tier: where
    * [[nnServeStream]] re-reads stored vectors for exact cosine, this
    * path serves from the quantized index alone.
    *
    * Row-local per query (against ONE broadcast packed row, the
    * [[semDedupStream]] constant-key rule): coarse cell =
    * lexicographic (dist, cell) struct-min over the packed Lloyd book
    * — the batch [[graft.operators.Similarity]] probedCells tie-break
    * with no rank window, distances through the SQL-registered native
    * `sqdist_l` kernel (graft.GraftExtensions must be on the session
    * — the [[pqEncodeStream]] rule). The stream-static equi-join on
    * the cell then scores each candidate with ONE `sqdist_l` call
    * against the vector's DECODED reconstruction v̂ (its m codeword
    * slices concatenated offline): subspaces partition the dims, so
    * ‖q − v̂‖² ≡ Σ_s ‖q_s − cs_s‖² — bit-identical to the classic
    * per-subspace LUT sum (Jégou et al. 2011 §III-B), but one
    * codegen'd kernel per row where the m-lookup LUT walk runs on
    * Spark's interpreted higher-order-function path — measured ~18×
    * slower end-to-end at the declared m=16/cw=256 book: the LUT and
    * per-codeword-kernel forms served 126-230 rows/s in two in-round
    * captures (commit 276b332's log) vs the 2 424 rows/s the shipped
    * shape records in STREAM_PROBE_r13.json's `adc_serve` leg. The
    * nearest
    * pick is one watermark-bounded `min(struct(adist, id))` —
    * (adist asc, vec_id asc), the batch rank order at k = 1.
    *
    * Output: (qid, ts, vec_id, adist, n_scored), append mode;
    * `adist` carries the same integers as the batch tier's column so
    * twins are directly comparable; `n_scored` records the probed
    * cell's population (the serving-cost audit column). Quality is
    * AUDITED against the batch tier, not assumed: 500 held-out
    * queries' streamed k=1 answers matched
    * [[graft.operators.Similarity.annIvfPqFromIndex]]'s 1.000 on the
    * probe corpus (STREAM_PROBE_r14.json `recall.adc_match`). The persisted
    * artifacts (cell book, codeword book, positioned codes) have
    * CALLER-OWNED lifecycle ([[DocStream.fuzzyIngestStream]]'s rule):
    * unpersist the superseded set when re-serving a new corpus
    * snapshot. */
  def adcServeStream(queries: DataFrame, corpus: DataFrame, m: Int = 8,
                     dim: Int = 64, scale: Int = 1000, cw: Int = 64,
                     rounds: Int = 2, cells: Int = 10, cellRounds: Int = 2,
                     watermark: String = "1 hour"): DataFrame = {
    val spark = corpus.sparkSession
    // ---- offline artifacts (persisted; the lake's index files) ----
    val cellPacked = Similarity.lloydBook(spark, corpus, cells, cellRounds)
      .agg(collect_list(struct(col("cluster").as("cell"), col("cq")))
        .as("cellbook"))
      .withColumn("one", lit(1))
      .persist()
    val book = Similarity.pqCodebookTrained(corpus, m, cw, rounds, dim,
      scale)
    // corpus side: cell + the DECODED reconstruction v̂ (each code's
    // codeword slice, concatenated in subspace order). ADC algebra:
    // Σ_s ‖q_s − cs_s‖² = ‖q − v̂‖² because subspaces partition the
    // dims — so scoring is ONE codegen'd sqdist_l per candidate row,
    // no per-query distance table at all. Codes (m small ints) remain
    // the STORAGE artifact; v̂ is the decode the serving executor
    // materializes once per corpus snapshot — the Spark-idiomatic
    // trade, since a per-row m-lookup LUT walk runs on the interpreted
    // higher-order-function path (measured ~18× slower end-to-end than
    // this kernel form at the declared m=16/cw=256 book).
    val corpusSide = Similarity.ivfAssignments(spark, corpus, cells,
        cellRounds)
      .select(col("vec_id").as("id_c"), col("cell").as("c_cell"))
      .join(Similarity.pqCodes(spark, corpus, m, dim, scale, cw, rounds)
        .select(col("vec_id").as("id_c"), col("subspace"), col("code")),
        "id_c")
      .join(broadcast(book.select(col("subspace"),
        col("label").as("code"), col("cs"))), Seq("subspace", "code"))
      .groupBy("id_c", "c_cell")
      .agg(array_sort(collect_list(struct(col("subspace"), col("cs"))))
        .as("sc"))
      .select(col("id_c"), col("c_cell"),
        expr("flatten(transform(sc, x -> x.cs))").as("vhat"))
      .persist()
    // ---- the stream ----
    val assigned = queries
      .withWatermark("ts", watermark)
      .withColumn("one", lit(1))
      .join(broadcast(cellPacked), "one")
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * scale).cast("long")))
      // cell argmin via the SQL-registered native sqdist_l kernel (the
      // [[pqEncodeStream]] pq_argmin rule — lambda contexts can't bind
      // Column-API expressions, and the interpreted zip_with +
      // aggregate body measured ~8× slower)
      .withColumn("cell", element_at(array_sort(expr(
        """transform(cellbook, b -> named_struct(
          |  'd', sqdist_l(q, b.cq), 'c', b.cell))""".stripMargin)), 1)
        .getField("c"))
    assigned
      .join(corpusSide, col("cell") === col("c_cell"))
      .withColumn("adist",
        graft.functions.VectorFunctions.sqDistLong(col("q"), col("vhat")))
      .groupBy(col("vec_id").as("qid"), col("ts"))
      .agg(min(struct(col("adist"), col("id_c").as("id"))).as("best"),
        count(lit(1)).as("n_scored"))
      .select(col("qid"), col("ts"), col("best.id").as("vec_id"),
        col("best.adist").as("adist"), col("n_scored"))
  }

  /** Streaming nearest-neighbor SERVE — arriving query vectors get
    * their single nearest corpus neighbor from the probed IVF cell,
    * completing retrieval's streaming story at the one k where state
    * stays BOUNDED: per query the aggregation holds exactly one
    * (cos, id) struct (a rank window, and a collect-list top-k, would
    * be respectively illegal and cell-sized on an unbounded stream).
    * Cell assignment is the [[semDedupStream]] row-local packed-book
    * argmin (batch tie-break reproduced by lexicographic struct
    * order); scoring joins the persisted cluster-assigned corpus
    * stream-static on the cell; the nearest pick is one
    * watermark-bounded `max(struct(cos, -id))` — highest cosine,
    * lowest id on ties, exactly [[Similarity.annIvf]]'s (cos desc,
    * vec_id asc) order at k = 1. Output: (qid, ts, vec_id, cos,
    * n_scored), append mode; n_scored records the probed cell's
    * candidate count (the serving-cost audit column). Quality is
    * AUDITED against the batch tier: 500 held-out queries' streamed
    * k=1 answers matched the cell-exact cosine batch twin 1.000 on
    * the probe corpus (STREAM_PROBE_r14.json `recall.nn_match`). The persisted
    * book + assigned corpus have CALLER-OWNED lifecycle
    * ([[DocStream.fuzzyIngestStream]]'s rule): unpersist the
    * superseded pair when re-serving a new corpus snapshot. */
  def nnServeStream(queries: DataFrame, corpus: DataFrame,
                    dim: Int = 64,
                    watermark: String = "1 hour"): DataFrame = {
    val spark = corpus.sparkSession
    val book = Similarity.coarseBook(spark, corpus, dim)
    val packed = book
      .agg(collect_list(struct(col("cluster"), col("cq"))).as("book"))
      .withColumn("one", lit(1))
      .persist()
    val corpusSide = Similarity.assignToBook(corpus, book)
      .select(col("vec_id").as("id_c"), col("cluster").as("c_cluster"))
      .join(corpus.select(col("vec_id").as("id_c"),
        col("embedding").as("ec"),
        normSqQuantized(col("embedding"), 1000).as("nc")), "id_c")
      .persist()
    val assigned = queries
      .withWatermark("ts", watermark)
      .withColumn("one", lit(1))
      .join(broadcast(packed), "one")
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * 1000).cast("long")))
      .withColumn("cluster", element_at(array_sort(expr(
        """transform(book, b -> named_struct(
          |  'd', aggregate(zip_with(q, b.cq, (x, y) -> (x - y) * (x - y)),
          |         CAST(0 AS BIGINT), (a, x) -> a + x),
          |  'c', b.cluster))""".stripMargin)), 1).getField("c"))
      .withColumn("nq", normSqQuantized(col("embedding"), 1000))
    assigned
      .join(corpusSide, col("cluster") === col("c_cluster"))
      .withColumn("cos",
        dotQuantized(col("embedding"), col("ec"), 1000).cast("double") /
          (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
      .groupBy(col("vec_id").as("qid"), col("ts"))
      .agg(max(struct(col("cos"), (-col("id_c")).as("nid"))).as("best"),
        count(lit(1)).as("n_scored"))
      .select(col("qid"), col("ts"),
        (-col("best.nid")).as("vec_id"), col("best.cos").as("cos"),
        col("n_scored"))
  }
}
