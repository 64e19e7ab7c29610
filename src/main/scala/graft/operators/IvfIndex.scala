package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN index over an embedding column — the
  * k-means-quantizer scale path, complementing [[SimilarityIndex]]'s
  * hyperplane LSH:
  *
  *  - TRAIN: MLlib k-means over L2-normalized embeddings (Euclidean on
  *    the unit sphere ranks identically to cosine) learns `k` coarse
  *    centroids. At 100 TB train on a sample — centroids need O(k·dim)
  *    evidence, not the corpus.
  *  - BUILD: every vector is assigned to its nearest centroid by an
  *    argmax over k broadcast centroid literals (codegen'd cosine per
  *    centroid, no UDF, no shuffle beyond the partitioned write), and the
  *    corpus is written PARTITIONED BY inverted-list id.
  *  - QUERY: rank centroids against the query on the driver (k values),
  *    read only the `nprobe` nearest lists — file-level partition
  *    pruning — and run exact cosine top-k within them.
  *
  * IVF vs LSH trade-off: LSH buckets need no training and handle
  * adversarial distributions; IVF adapts its cells to the actual data
  * density, giving better recall-per-probed-fraction on clustered real
  * embeddings. Both are provided; both prune at the file level.
  */
object IvfIndex {

  /** Train the coarse quantizer; returns centroids as float arrays (the
    * same element type as the embedding column, so the assignment
    * expression is literal-typed without casts).
    */
  def trainCentroids(embeddings: DataFrame, k: Int, seed: Long = 42L,
      maxIter: Int = 20, sampleFraction: Double = 1.0): Array[Array[Float]] = {
    val e = col("embedding")
    val sample =
      if (sampleFraction >= 1.0) embeddings
      else embeddings.sample(withReplacement = false, sampleFraction, seed)
    // The norm MUST be projected as its own column before the divide:
    // referencing the aggregate subtree inside the transform() lambda
    // would re-evaluate it per array ELEMENT — O(dim²) per row. A bound
    // column reference inside the lambda is a plain attribute read.
    // Zero vectors are dropped, not divided: x/0 → NaN features would
    // poison k-means training.
    val withNorm = sample
      .select(e.as("embedding"),
        sqrt(aggregate(zip_with(e, e,
          (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("nrm"))
      .filter(col("nrm") > 1e-12)
    // CACHE the prepared features: k-means re-reads its input every
    // iteration (plus the k-means|| init rounds) — uncached, that is
    // 20+ re-executions of the scan + normalization lineage (MLlib warns
    // about exactly this). Storage cost is the sample, not the corpus.
    // COALESCE to a few partitions: the training input is a bounded
    // sample by design (O(k·dim) evidence), and every k-means iteration
    // schedules one task per partition — hundreds of near-empty tasks
    // per iteration is pure scheduling overhead, not parallelism.
    val train = withNorm.select(array_to_vector(
      transform(col("embedding"), x => x.cast("double") / col("nrm"))).as("features"))
      .coalesce(8)
      .cache()
    try {
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .fit(train)
      model.clusterCenters.map(_.toArray.map(_.toFloat))
    } finally train.unpersist(blocking = false)
  }

  /** Fixed-iteration Lloyd k-means, INTEGER-EXACT — the oracle-checkable
    * counterpart of [[trainCentroids]] (MLlib's float k-means trains the
    * serving quantizer fine, but FP partial-sum reassociation makes its
    * centroids engine- and run-dependent, so nothing downstream of it can
    * be hash-verified). Here every quantity is deterministic on any
    * engine: components are floor-scaled to micro-units (the
    * [[graft.functions.CentroidAgg]] convention), distances are int64
    * squared-L2 over those units (max |diff| ≈ 2·10⁶ squared × dim 64 ≈
    * 2.6·10¹⁴ — int64-safe through sf 1), centroid updates use long sums
    * with TRUNCATING division (JVM `/` == DuckDB `//`), seeding is the
    * content-addressed md5 order (derivable in SQL, unlike xxhash64), and
    * ties in the argmin break to the smallest centroid id via struct
    * ordering. Empty clusters keep their previous centroid.
    *
    * Scale shape per iteration: one scan with k codegen'd distance
    * expressions against BROADCAST centroid literals (k·dim longs —
    * kilobytes), then one mergeable [[graft.functions.CentroidAgg]]
    * aggregate whose shuffle carries k×(dim+1) longs per map partition.
    * The driver holds only the k×dim centroid table between iterations —
    * the same coarse-codebook footprint [[sampleCentroids]] already
    * collects. Returns per-cluster (n_vecs, inertia, centroid_sum) —
    * the convergence stats a training job monitors.
    */
  def kmeansExact(embeddings: DataFrame, k: Int = 8,
      iterations: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate, array, array_min,
      count => fcount, md5, struct, sum => fsum, transform, typedlit,
      zip_with}
    val e = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qe"))
    val seeds = e
      .select(col("vec_id"), col("qe"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(seeds.nonEmpty, "kmeansExact: no non-null vectors to seed from")
    val dim = seeds(0).length
    def assign(cents: Array[Array[Long]]): DataFrame = {
      val scored = cents.zipWithIndex.map { case (c, j) =>
        struct(
          VectorFunctions.longSqDist(col("qe"), typedlit(c.toSeq)).as("dist"),
          lit(j).as("cid"))
      }
      e.withColumn("best", array_min(array(scored.toIndexedSeq: _*)))
        .select(col("vec_id"), col("embedding"),
          col("best.cid").as("cid"), col("best.dist").as("dist"))
    }
    var centroids = seeds
    for (_ <- 1 to iterations) {
      val updated = assign(centroids)
        .groupBy("cid")
        .agg(graft.functions.CentroidAgg.centroid(col("embedding"), dim).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        updated.getOrElse(j, old) // empty cluster keeps its centroid
      }
    }
    // centroid sums attach via a MAP LITERAL, not a joined table: an
    // equi-join would put a null-filter on the join key above the scan,
    // re-evaluating the whole k-distance expression once in the Filter
    // and again in the Project
    val sumMap = org.apache.spark.sql.functions.map(
      centroids.zipWithIndex.flatMap { case (c, j) =>
        Seq(lit(j), lit(c.sum)) }.toIndexedSeq: _*)
    assign(centroids)
      .groupBy("cid")
      .agg(fcount(lit(1)).as("n_vecs"), fsum(col("dist")).as("inertia"))
      .select(col("cid").as("cluster_id"), col("n_vecs"), col("inertia"),
        org.apache.spark.sql.functions.element_at(sumMap, col("cid"))
          .as("centroid_sum"))
      .orderBy("cluster_id")
  }

  /** Deterministic data-derived coarse quantizer WITHOUT iterative
    * training: the k nonzero corpus vectors minimizing a seeded
    * xxhash64 of their id — a seeded random draw expressed as one
    * scan-bound top-k (TakeOrdered, no shuffle of the corpus). Cosine
    * probe ranking is scale-invariant, so unnormalized corpus vectors
    * are valid centroids as-is.
    *
    * This is the quantizer for CONTRACT queries (s8/e8b), where the
    * property under test — probe selection, asymmetric scoring, repair
    * equality — is orthogonal to centroid quality, and an iterative
    * k-means (20+ driver-coordinated jobs) would dominate the query's
    * cost. Production index builds use [[trainCentroids]] (float) or
    * [[kmeansExact]] (hash-verifiable).
    */
  def sampleCentroids(embeddings: DataFrame, k: Int,
      seed: Long = 42L): Array[Array[Float]] = {
    val picked = embeddings
      .filter(col("embedding").isNotNull)
      // the zero filter must run BEFORE the top-k: filtering after
      // limit(k) would silently shrink the centroid set (or spuriously
      // fail) whenever a zero vector hashes into the k smallest
      .filter(exists(col("embedding"), x => x =!= 0.0f))
      .select(col("vec_id"), col("embedding"),
        xxhash64(lit(seed), col("vec_id")).as("h"))
      .orderBy("h", "vec_id").limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(picked.nonEmpty, "sampleCentroids: no nonzero vectors to sample")
    picked
  }

  /** Nearest-centroid assignment: argmax of cosine over the k broadcast
    * centroid literals via `array_max` on (sim, list_id) structs — struct
    * ordering makes ties break to the larger id, deterministically.
    */
  def assignLists(embeddings: DataFrame,
      centroids: Array[Array[Float]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        VectorFunctions.cosineSim(col("embedding"), typedlit(c.toSeq)).as("sim"),
        lit(i).as("list_id"))
    }
    embeddings.withColumn("list_id",
      array_max(array(scored.toIndexedSeq: _*)).getField("list_id"))
  }

  /** Build and persist: inverted lists as parquet partitions, centroids in
    * an underscore-prefixed side directory (ignored by the data reader).
    */
  def writeIndex(embeddings: DataFrame, path: String, k: Int,
      seed: Long = 42L): Array[Array[Float]] =
    writeIndexWith(embeddings, path, k, seed, identity)

  /** Shared build skeleton: train -> assign -> storage projection ->
    * partitioned write + centroid sidecar. The float and quantized
    * layouts differ ONLY in `storage`.
    */
  private def writeIndexWith(embeddings: DataFrame, path: String, k: Int,
      seed: Long, storage: DataFrame => DataFrame): Array[Array[Float]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(embeddings, k, seed)
    storage(assignLists(embeddings, centroids))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    centroids
  }

  /** Centroid-nearest `nprobe` list ids for a query (driver-side, k
    * cosines — shared probe-selection preamble of both query paths).
    */
  private def rankProbes(queryVec: Array[Float],
      centroids: Array[Array[Float]], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .sortBy { case (c, i) => (-cosine(queryVec, c), i) }
      .take(nprobe).map(_._2).toSeq

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/_centroids").orderBy("list_id").collect()
      .map(_.getSeq[Float](1).toArray)

  /** Probe the `nprobe` centroid-nearest inverted lists only (partition
    * pruning on disk), exact cosine top-k within them.
    */
  def queryIndex(spark: SparkSession, path: String, queryVec: Array[Float],
      centroids: Array[Array[Float]], k: Int, nprobe: Int = 2): DataFrame = {
    val probes = rankProbes(queryVec, centroids, nprobe)
    val qLit = array(queryVec.map(v => lit(v)).toIndexedSeq: _*)
    spark.read.parquet(path)
      .filter(col("list_id").isin(probes: _*))
      .select(col("vec_id"),
        round(VectorFunctions.cosineSim(col("embedding"), qLit), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** QUANTIZED build (the IVF-PQ-style serving layout): inverted lists
    * store `(vec_id, qmin, qrange, codes array<tinyint>)` — ONE BYTE per
    * dimension plus two longs — and NOT the float embedding. At 100 TB of
    * float32 embeddings this is the difference between a 25 TB index and
    * a 100 TB one; the scan that serves a query reads a quarter of the
    * bytes before pruning even starts.
    */
  def writeQuantizedIndex(embeddings: DataFrame, path: String, k: Int,
      seed: Long = 42L): Array[Array[Float]] =
    // null embeddings carry no direction to index (trainCentroids already
    // drops them); storing them would surface NaN-scored rows at query time
    writeIndexWith(embeddings.filter(col("embedding").isNotNull), path, k, seed,
      assigned => Similarity.withQuantization(assigned)
        .select(col("vec_id"), col("qmin"), col("qrange"), col("codes"),
          col("list_id")))

  /** Probe the quantized index: asymmetric distance computation — the raw
    * query vector (in integer micro-units) is scored against the DEQUANTIZED
    * integer reconstruction of each stored code, so the only approximation
    * is the storage quantization itself. Reconstruction and dot products
    * are exact integer arithmetic (terms bounded by 10¹² · dim ≪ 2⁶³);
    * only the final norm division is floating-point.
    */
  def queryQuantizedIndex(spark: SparkSession, path: String,
      queryVec: Array[Float], centroids: Array[Array[Float]], k: Int,
      nprobe: Int = 2): DataFrame = {
    val probes = rankProbes(queryVec, centroids, nprobe)
    val qMicro = queryVec.map(v => math.floor(v.toDouble * 1e6).toLong)
    val qLit = array(qMicro.map(lit).toIndexedSeq: _*)
    // the query self-dot is a constant: computed ONCE on the driver, not
    // as an interpreted lambda chain per scanned row
    val nq = qMicro.map(x => x * x).sum
    // a zero-norm query has no cosine direction: nq = 0 would make every
    // score 0/0 = NaN, and NaN sorts ABOVE every real double under desc —
    // the same trap the nr > 0 filter guards on the stored side
    require(nq > 0, "queryQuantizedIndex: query vector has zero norm")
    val recon = transform(col("codes"), c =>
      col("qmin") + floor(((c.cast("long") + 128L) * col("qrange")).cast("double") / 255)
        .cast("long"))
    val dot = VectorFunctions.longDot(col("r"), qLit)
    val nr = VectorFunctions.longDot(col("r"), col("r"))
    spark.read.parquet(path)
      .filter(col("list_id").isin(probes: _*))
      .select(col("vec_id"), recon.as("r"))
      .select(col("vec_id"), dot.as("dot"), nr.as("nr"))
      // an all-zero reconstruction (e.g. a zero embedding) has no cosine
      // direction: nr = 0 would score NaN, and Spark sorts NaN ABOVE every
      // double under desc — it would top every probed top-k. Drop it, the
      // same rule trainCentroids applies to zero vectors.
      .filter(col("nr") > 0)
      .select(col("vec_id"),
        round(col("dot").cast("double") /
          (sqrt(col("nr").cast("double")) * sqrt(lit(nq).cast("double"))), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** INCREMENTAL index append: assign + quantize an incoming batch under
    * the index's FROZEN centroids and union it with the stored lists —
    * the insert mirror of [[Erasure.repairIvfLists]]' delete, completing
    * index MAINTENANCE (a served index must absorb inserts and erasures
    * without rebuild; periodic retrain is a separate batch concern).
    * Cost ∝ batch: corpus lists are untouched, no shuffle of the corpus.
    * Assignment and quantization are row-local, so the appended index
    * equals a rebuild from corpus+batch under the same centroids
    * (contract-proven as s9).
    */
  def appendQuantized(lists: DataFrame, incoming: DataFrame,
      centroids: Array[Array[Float]]): DataFrame =
    lists.unionByName(
      Similarity.withQuantization(
        assignLists(incoming.filter(col("embedding").isNotNull), centroids))
        .select("vec_id", "qmin", "qrange", "codes", "list_id"))

  /** Driver-witnessed maintenance contract (s9, the d5b/e8b pattern):
    * content-addressed corpus/batch split, then the incrementally
    * APPENDED quantized index must equal the index REBUILT from the full
    * embedding set under the same frozen centroids — a wrong union
    * schema, a drifted quantization, or centroids re-derived on the
    * append path would flip a boolean and fail the driver gate.
    */
  def appendContract(embeddings: DataFrame, ivfK: Int = 8): DataFrame = {
    val corpus = embeddings.filter(graft.operators.TextOps.hexNibble("vec_id") =!= 7)
    val batch = embeddings.filter(graft.operators.TextOps.hexNibble("vec_id") === 7)
    // centroids from the CORPUS only: the batch arrives after training,
    // which is exactly the frozen-quantizer serving situation
    val centroids = sampleCentroids(corpus, ivfK)
    def quantLists(e: DataFrame): DataFrame =
      Similarity.withQuantization(
        assignLists(e.filter(col("embedding").isNotNull), centroids))
        .select("vec_id", "qmin", "qrange", "codes", "list_id")
    val appended = appendQuantized(quantLists(corpus), batch, centroids)
      .localCheckpoint(true) // feeds both exceptAll directions
    val rebuilt = quantLists(embeddings).localCheckpoint(true)
    def agg1(df: DataFrame, out: String): DataFrame =
      df.agg(count(lit(1)).as(out)).withColumn("k", lit(1))
    Seq(
      agg1(batch, "n_batch"), // an empty batch passes vacuously
      agg1(corpus, "n_corpus"),
      agg1(appended.exceptAll(rebuilt), "extra"),
      agg1(rebuilt.exceptAll(appended), "missing"))
      .reduce((a, b) => a.join(broadcast(b), "k"))
      .select(
        (col("n_batch") > 0 && col("n_corpus") > 0).as("split_nonempty"),
        (col("extra") === 0 && col("missing") === 0).as("append_equal"))
  }

  /** Driver-witnessed ANN RECALL contract (s8, the d4c pattern): the
    * quantized IVF serving path — coarse probe selection + asymmetric
    * scoring over ONE-BYTE codes — must recover at least `threshold` of
    * the exact float k-NN ([[Similarity.knnJoin]], the s3 oracle-green
    * ground truth) on the fixture's query set. Hash-seeded centroids make
    * the ANN rows themselves un-oracle-able (s2 precedent); the recall
    * boolean is checkable against a TRUE-emitting oracle. A broken probe
    * ranking, a wrong dequantization, or a NaN leak in scoring drops
    * recall and fails the driver gate.
    *
    * Recall is micro-averaged (Σ matched / Σ |exact top-k|) over the
    * query set — per-query jitter from quantization near-ties cancels
    * out, which is what makes the threshold stable across scale factors.
    * Measured on the fixtures: 0.67-0.72 at sf0.001/0.01/0.1 with the
    * default nprobe=4 of ivfK=8 over [[sampleCentroids]] — the 0.55
    * threshold leaves ≥ 12 points of margin.
    * Scale shape: queries broadcast; the corpus is scanned once for the
    * exact side and once (probed lists only) for the ANN side; both
    * rankings are WindowGroupLimit top-k heaps.
    */
  def annRecallContract(embeddings: DataFrame, queryIds: Seq[Long],
      k: Int = 10, ivfK: Int = 8, nprobe: Int = 4,
      threshold: Double = 0.55): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val clean = embeddings.filter(col("embedding").isNotNull)
    val centroids = sampleCentroids(clean, ivfK)
    val lists = Similarity.withQuantization(assignLists(clean, centroids))
      .select("vec_id", "qmin", "qrange", "codes", "list_id")
      .localCheckpoint(true) // feeds |Q| probe joins below
    // probe selection is driver-side BY DESIGN (same as queryQuantizedIndex:
    // ivfK centroid cosines per query, never data-sized); ship one
    // (query_id, probed list, micro query vector, query self-dot) row per
    // probe and broadcast it into the list scan
    val qRows = clean.filter(col("vec_id").isin(queryIds: _*))
      .select("vec_id", "embedding").collect()
    val probeRows = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      val qMicro = qv.map(v => math.floor(v.toDouble * 1e6).toLong)
      val nq = qMicro.map(x => x * x).sum
      if (nq == 0L) Seq.empty // zero-norm query: no cosine direction
      else rankProbes(qv, centroids, nprobe)
        .map(listId => (qid, listId, qMicro.toSeq, nq))
    }.toSeq
    val probes = probeRows.toDF("query_id", "list_id", "q_micro", "nq")
    val recon = transform(col("codes"), c =>
      col("qmin") + floor(((c.cast("long") + 128L) * col("qrange")).cast("double") / 255)
        .cast("long"))
    val dot = VectorFunctions.longDot(col("r"), col("q_micro"))
    val nr = VectorFunctions.longDot(col("r"), col("r"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    val annTopK = lists.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("nq"), col("q_micro"),
        recon.as("r"))
      .select(col("query_id"), col("vec_id"), col("nq"),
        dot.as("dot"), nr.as("nr"))
      .filter(col("nr") > 0) // zero recon has no direction (NaN-sorts-first)
      .select(col("query_id"), col("vec_id"),
        (col("dot").cast("double") /
          (sqrt(col("nr").cast("double")) * sqrt(col("nq").cast("double"))))
          .as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id")
    val exact = Similarity.knnJoin(clean, queryIds, k)
      .select("query_id", "vec_id")
    val matched = exact.join(annTopK, Seq("query_id", "vec_id"), "left_semi")
    val nExact = exact.agg(count(lit(1)).as("n_exact")).withColumn("j", lit(1))
    val nMatch = matched.agg(count(lit(1)).as("n_match")).withColumn("j", lit(1))
    nExact.join(broadcast(nMatch), "j")
      .select(
        (col("n_exact") >= queryIds.size).as("nonempty"), // guards vacuity
        (col("n_match").cast("double") >= lit(threshold) * col("n_exact"))
          .as("recall_ok"))
  }

  /** PRODUCT QUANTIZATION contract (s12): split the `dim`-dimensional
    * embedding into `m` subspaces, quantize each subvector to its nearest
    * of `kSub` sub-codewords (integer-µ L2, the [[kmeansExact]] metric),
    * and witness the two properties that make PQ the memory-compression
    * path for ANN serving — as booleans a SQL oracle asserts TRUE:
    *
    *  - `err_monotone`: total quantization error with the `kSub`-word
    *    codebook ≤ with its first-`kPrefix` prefix. Guaranteed (not
    *    statistical): the prefix codebook's codewords are a SUBSET under
    *    the shared md5-seeded order, so each vector's per-subspace min
    *    can only improve — the hash-checkable stand-in for "bigger
    *    codebooks reconstruct better".
    *  - `recall_ok`: the production serving shape is ADC SHORTLIST +
    *    EXACT RERANK — scan compressed codes for a `shortlist`-sized
    *    candidate set (asymmetric distance: exact query vs reconstructed
    *    corpus), then rerank only those candidates at full precision.
    *    Exact-top-`k` members in the shortlist always survive an exact
    *    rerank into the reranked top-`k` (anything exactly closer is
    *    itself exact-top-`k`), so rerank recall ≡ shortlist containment:
    *    |ADC-top-shortlist ∩ exact-top-k| / k ≥ `threshold`. Measured
    *    0.83 (sf0.01) / 0.64 (sf0.1) at the registered m=16/kSub=16/
    *    shortlist=100 — 64 bits/vector against 2048 uncompressed
    *    (dim 64 × float32), scanning the full corpus at 32× less memory
    *    bandwidth and touching float vectors only for the shortlist.
    *    (The fixture's near-random embeddings are PQ's worst case —
    *    distance concentration; clustered real embeddings rank better.)
    *
    * Codebooks are the md5-seeded corpus draw ([[sampleCentroids]]'s
    * rationale: contract tests exercise the encode/ADC machinery, not
    * codeword quality; production would train each subspace with
    * [[kmeansExact]] on a sample). Scale shape: codebooks are
    * m × kSub × (dim/m) literals broadcast into one codegen'd projection —
    * encoding is scan-bound, no shuffle; the ADC/exact legs join the
    * corpus against |Q| broadcast query rows and take windowed top-k,
    * exactly the s8 probe shape. Subvectors are projected ONCE before the
    * per-codeword distance battery (the shingles3Tokens lesson: HOF
    * arguments referenced k times re-evaluate k times).
    */
  def pqContract(embeddings: DataFrame, queryIds: Seq[Long], m: Int = 8,
      kSub: Int = 16, kPrefix: Int = 4, k: Int = 10,
      threshold: Double = 0.4, shortlist: Int = 64,
      shortlistFor: Option[Long => Int] = None): DataFrame =
    pqContractDebug(embeddings, queryIds, m, kSub, k, kPrefix, threshold,
      shortlist, shortlistFor)
      .select("n_vectors", "err_monotone", "nonempty", "recall_ok")

  private[graft] def pqContractDebug(embeddings: DataFrame, queryIds: Seq[Long],
      m: Int = 8, kSub: Int = 16, k: Int = 10, kPrefix: Int = 4,
      threshold: Double = 0.4, shortlist: Int = 64,
      shortlistFor: Option[Long => Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = embeddings.filter(col("embedding").isNotNull)
    val eq = clean.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qe"))
    // corpus-proportional shortlist sizing rides the seeds job via
    // observe() (r12): every row flows through the metrics node below
    // the TakeOrdered, so the caller's separate count() scan is gone
    val nObs = org.apache.spark.sql.Observation()
    val seeds = eq
      .observe(nObs, count(lit(1)).as("n"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(kSub)
      .collect().map(_.getSeq[Long](1).toArray)
    val shortlistN = shortlistFor.map { f =>
      // count() fallback where observe metrics don't arrive (see
      // GraftShims.observedMetric)
      f(org.apache.spark.sql.GraftShims.observedMetric(nObs, "n")
        .map(_.asInstanceOf[Long]).getOrElse(eq.count()))
    }.getOrElse(shortlist)
    require(seeds.length == kSub, s"pqContract: corpus smaller than $kSub")
    val dim = seeds(0).length
    require(dim % m == 0, s"pqContract: dim $dim not divisible by m=$m")
    val d0 = dim / m
    // codebooks(mi)(j) = j-th codeword of subspace mi
    val codebooks = Array.tabulate(m, kSub)((mi, j) =>
      seeds(j).slice(mi * d0, (mi + 1) * d0))
    val sub = eq.select(col("vec_id") +: col("qe") +:
      (0 until m).map(mi => slice(col("qe"), mi * d0 + 1, d0).as(s"s$mi")): _*)
    def best(mi: Int, kk: Int) = array_min(array((0 until kk).map { j =>
      struct(
        VectorFunctions.longSqDist(col(s"s$mi"), typedlit(codebooks(mi)(j).toSeq))
          .as("dist"),
        lit(j).as("code"))
    }: _*))
    val enc = sub.select(col("vec_id") +: col("qe") +:
      ((0 until m).map(mi => best(mi, kSub).as(s"b$mi")) ++
        (0 until m).map(mi => best(mi, kPrefix).as(s"p$mi"))): _*)
    def codeMap(mi: Int) = map((0 until kSub).flatMap(j =>
      Seq(lit(j), typedlit(codebooks(mi)(j).toSeq))): _*)
    val recon = concat((0 until m).map(mi =>
      element_at(codeMap(mi), col(s"b$mi.code"))): _*)
    val withErr = enc.select(col("vec_id"), col("qe"),
      (0 until m).map(mi => col(s"b$mi.dist")).reduce(_ + _).as("err_full"),
      (0 until m).map(mi => col(s"p$mi.dist")).reduce(_ + _).as("err_prefix"),
      recon.as("recon")).localCheckpoint(true) // feeds err agg + ADC leg
    val qRows = eq.filter(col("vec_id").isin(queryIds: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val queries = {
      val spark = embeddings.sparkSession
      import spark.implicits._
      qRows.toSeq.toDF("query_id", "q_micro")
    }
    def l2(v: Column) = VectorFunctions.longSqDist(v, col("q_micro"))
    val w = Window.partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    def topK(base: DataFrame, v: Column, kk: Int) = base
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), l2(v).as("d"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kk)
      .select("query_id", "vec_id")
    val exact = topK(eq, col("qe"), k)
    val adc = topK(withErr.select("vec_id", "recon"), col("recon"), shortlistN)
    val nMatch = exact.join(adc, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_match")).withColumn("j", lit(1))
    val nExact = exact.agg(count(lit(1)).as("n_exact")).withColumn("j", lit(1))
    val errs = withErr
      .agg(count(lit(1)).as("n_vectors"), sum("err_full").as("ef"),
        sum("err_prefix").as("ep")).withColumn("j", lit(1))
    errs.join(broadcast(nExact), "j").join(broadcast(nMatch), "j")
      .select(col("n_vectors"),
        (col("ef") <= col("ep")).as("err_monotone"),
        (col("n_exact") >= queryIds.size).as("nonempty"),
        (col("n_match").cast("double") >= lit(threshold) * col("n_exact"))
          .as("recall_ok"),
        col("n_exact"), col("n_match"))
  }

  /** TRUNCATED-DIMENSION retrieval contract (s13): candidate scan over
    * only the first `keepDims` vector components, exact rerank of the
    * shortlist at full dimension — the dimension-truncation serving
    * pattern (Matryoshka-style): a dim-truncated scan reads `keepDims/dim`
    * of the bytes PQ-style but with zero training and zero decode, the
    * natural first lever when embeddings are stored full-precision. Same
    * contract algebra as [[pqContract]]: exact-top-k members in the
    * shortlist survive an exact rerank, so rerank recall ≡ shortlist
    * containment ≥ `threshold`. (On embeddings TRAINED with
    * matryoshka-style nesting, leading dims carry most of the signal and
    * recall approaches 1; the fixture's random vectors spread signal
    * uniformly — recall ≈ the information fraction kept — so the
    * registered keepDims/shortlist are chosen to pass on the worst case.)
    */
  def truncatedRecallContract(embeddings: DataFrame, queryIds: Seq[Long],
      keepDims: Int = 32, k: Int = 10, shortlist: Int = 100,
      threshold: Double = 0.5,
      shortlistFor: Option[Long => Int] = None): DataFrame =
    truncatedDebug(embeddings, queryIds, keepDims, k, shortlist, threshold,
      shortlistFor)
      .select("n_vectors", "nonempty", "recall_ok")

  private[graft] def truncatedDebug(embeddings: DataFrame, queryIds: Seq[Long],
      keepDims: Int, k: Int, shortlist: Int, threshold: Double,
      shortlistFor: Option[Long => Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eq = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qe"))
      .withColumn("tq", slice(col("qe"), 1, keepDims))
    // shortlist sizing rides the query-row collect via observe() (r12):
    // the metrics node sits BELOW the isin filter, so it counts every
    // corpus row and the caller's separate count() scan is gone
    val nObs = org.apache.spark.sql.Observation()
    val qRows = eq.observe(nObs, count(lit(1)).as("n"))
      .filter(col("vec_id").isin(queryIds: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val shortlistN = shortlistFor.map { f =>
      // count() fallback where observe metrics don't arrive (see
      // GraftShims.observedMetric)
      f(org.apache.spark.sql.GraftShims.observedMetric(nObs, "n")
        .map(_.asInstanceOf[Long]).getOrElse(eq.count()))
    }.getOrElse(shortlist)
    val queries = {
      val spark = embeddings.sparkSession
      import spark.implicits._
      qRows.toSeq.toDF("query_id", "q_full", "q_trunc")
    }
    def l2(v: Column, q: Column) = VectorFunctions.longSqDist(v, q)
    val w = Window.partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    def topK(v: Column, q: Column, kk: Int) = eq
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), l2(v, q).as("d"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kk)
      .select("query_id", "vec_id")
    val exact = topK(col("qe"), col("q_full"), k)
    val trunc = topK(col("tq"), col("q_trunc"), shortlistN)
    val nMatch = exact.join(trunc, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_match")).withColumn("j", lit(1))
    val nExact = exact.agg(count(lit(1)).as("n_exact")).withColumn("j", lit(1))
    val nVec = eq.agg(count(lit(1)).as("n_vectors")).withColumn("j", lit(1))
    nVec.join(broadcast(nExact), "j").join(broadcast(nMatch), "j")
      .select(col("n_vectors"),
        (col("n_exact") >= queryIds.size).as("nonempty"),
        (col("n_match").cast("double") >= lit(threshold) * col("n_exact"))
          .as("recall_ok"),
        col("n_exact"), col("n_match"))
  }

  /** Dev-only: the measured truncated-scan recall behind s13's boolean. */
  private[graft] def truncProbeRecall(embeddings: DataFrame,
      queryIds: Seq[Long], keepDims: Int, k: Int, shortlist: Int): Double = {
    val row = truncatedDebug(embeddings, queryIds, keepDims, k, shortlist, 0.0).head()
    row.getLong(4).toDouble / math.max(row.getLong(3), 1L)
  }

  /** Dev-only: the measured ADC recall behind [[pqContract]]'s boolean. */
  private[graft] def pqProbeRecall(embeddings: DataFrame, queryIds: Seq[Long],
      m: Int, kSub: Int, k: Int, shortlist: Int = 64): Double = {
    val row = pqContractDebug(embeddings, queryIds, m, kSub, k,
      shortlist = shortlist).head()
    row.getLong(5).toDouble / math.max(row.getLong(4), 1L)
  }

  /** Driver-side cosine for centroid ranking (k values, not data-sized). */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }
}
