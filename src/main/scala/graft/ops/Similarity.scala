package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.Rng

/** Similarity search over an embedding column (Array[Float]):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (buckets shrink the candidate set
  * from N to N/2^bits per query; the bucket join replaces the cross join).
  * All arithmetic in double, sequential array order — deterministic and
  * engine-reproducible. Pure Catalyst expressions (zip_with/aggregate),
  * no UDFs.
  */
object Similarity {

  /** Embedding column cast float->double for stable arithmetic. Native
    * array cast (r7) — the element-wise `transform(c, _.cast("double"))`
    * HOF it replaces is CodegenFallback (interpreted per element, 64
    * lambda evaluations per row in every e-query); the Cast expression
    * performs the identical float->double widening inside codegen. */
  private def asDouble(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity — native Catalyst expression (one fused loop per
    * pair; same array-order double accumulation as the HOF formulation and
    * the DuckDB oracle, so values are bit-identical). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.cosine_sim(a, b)

  /** Reference HOF formulation of [[cosine]] (kept for cross-checks). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each query vector (`queryPred` selects queries),
    * the k nearest other vectors. Brute force = one broadcast of the query
    * side against a full scan — the right baseline at any scale when the
    * query set is small (it broadcasts) and the corpus scan is columnar. */
  def cosineTopK(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val all = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    val q = emb.where(queryPred)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val scored = all.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), 4).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (the embedding flavor of the
    * dedup family): all pairs above `threshold`, brute force — the exact
    * small-scale oracle. The scale path replaces the pair join with the
    * LSH bucket join of [[annLsh]] (same verify step on candidates). */
  def cosineNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(cosine(col("x.v"), col("y.v")), 4).as("cos"))
      .where(col("cos") >= threshold)
      .orderBy("a", "b")
  }

  /** Deterministic random hyperplanes for sign-LSH (seeded; fixed across
    * runs and engines). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val r = new Rng(seed)
    Array.tabulate(bits, dim) { (_, _) =>
      // uniform in [-1, 1): direction-only, magnitude irrelevant for sign
      ((r.nextLong() >>> 11) * 1.1102230246251565e-16) * 2.0 - 1.0
    }
  }

  /** Sign-LSH bucket id: bit j = sign(v · h_j). (Charikar 2002 SimHash for
    * real vectors / Indyk-Motwani LSH.) Native one-fused-loop expression
    * since r7 — the HOF formulation ([[lshBucketHof]], kept as the test
    * twin) evaluated bits x dim interpreted lambda calls per row; the
    * native loop is bit-identical (sequential double accumulation in array
    * order, the same null-on-length-mismatch degradation). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.sign_lsh_bucket(
      vec, planes.map(_.toSeq).toSeq)

  /** Reference HOF formulation of [[lshBucket]] (tests only). */
  private[graft] def lshBucketHof(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.indices.map { j =>
      val h = lit(planes(j))
      when(dot(vec, transform(h, x => x.cast("double"))) > 0,
        shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH buckets: queries only score candidates in the same bucket.
    * Recall < 1 by design; at 10^9 vectors this turns a cross join into a
    * uniform equi-join on the bucket key. The `multiProbe` flag raises
    * recall by also probing Hamming-distance-1 buckets.
    * SIZE `bits` WITH THE CORPUS: expected bucket occupancy is N / 2^bits,
    * so bits must grow with log2(N) to keep candidate sets bounded (the
    * default 8 fits the test scale; at 10^9 vectors use ~20+, i.e.
    * buckets of ~1k). Parameterized precisely so deployments set it. */
  def annLsh(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      bits: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      /** Also probe every bucket at Hamming distance 1 from the query's
        * (bits+1 probes per query): near-boundary neighbors whose sign
        * flipped on one hyperplane are recovered — the standard recall
        * lever that costs probes, not index size. Corpus side is
        * unchanged (still one bucket per vector). */
      multiProbe: Boolean = false): DataFrame = {
    val planes = hyperplanes(bits, dim)
    val bucketed = emb.select(col(idCol).as("nid"),
      asDouble(col(vecCol)).as("nvec"))
      .withColumn("bucket", lshBucket(col("nvec"), planes))
    val exactBucket = lshBucket(col("qvec"), planes)
    val probes =
      if (!multiProbe) array(exactBucket)
      else array(exactBucket +:
        (0 until bits).map(j => exactBucket.bitwiseXOR(lit(1L << j))): _*)
    val q = emb.where(queryPred)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("bucket", explode(probes))
    val scored = bucketed.join(q, Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("bucket"),
        round(cosine(col("qvec"), col("nvec")), 4).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos"), col("bucket"))
      .orderBy("query_id", "rank")
  }

  // ------------------------------------------------------------- IVF ANN

  /** Deterministic coarse quantizer: Lloyd k-means over a fixed sample (the
    * first `sampleSize` vectors by id — stable under any partitioning),
    * seeded init, fixed iteration count, sequential double accumulation.
    * Centroids are tiny (nlist x dim doubles) and travel as expression
    * literals — nothing data-sized is collected. */
  def trainCentroids(
      emb: DataFrame,
      nlist: Int,
      dim: Int = 64,
      sampleSize: Int = 2048,
      iters: Int = 10,
      seed: Long = 11L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val sample = emb.orderBy(col(idCol)).limit(sampleSize)
      .select(asDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    val r = new Rng(seed)
    // init: distinct random sample points (seeded -> deterministic)
    val centroids = {
      val idx = scala.collection.mutable.LinkedHashSet.empty[Int]
      while (idx.size < nlist) idx += r.nextInt(sample.length)
      idx.toArray.map(i => sample(i).clone())
    }
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](nlist, dim)
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < nlist) {
          var s = 0.0
          var i = 0
          val n = math.min(v.length, dim)
          while (i < n) { val d = v(i) - centroids(c)(i); s += d * d; i += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < math.min(v.length, dim)) { sums(best)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < nlist) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        } // empty list keeps its previous centroid (deterministic)
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** IVF ANN (inverted-file index, the classic FAISS coarse-quantizer
    * layout): every vector is assigned to its nearest of `nlist` centroids
    * (ONE narrow pass — the inverted list id is just a column); each query
    * probes its `nprobe` nearest lists. The probe join is an equi-join on
    * the list id, so per query only ~nprobe/nlist of the corpus is scored —
    * at 10^9 vectors with nlist=65536, nprobe=32 that is a 0.05% scan,
    * versus LSH's fixed-radius buckets this gives data-adaptive cells.
    * nprobe = nlist degrades gracefully to the exact search (tested). */
  def annIvf(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    annIvfWith(emb, queryPred, k,
      trainCentroids(emb, nlist, dim, idCol = idCol, vecCol = vecCol)
        .map(_.toSeq).toSeq,
      nprobe, idCol, vecCol)

  /** [[annIvf]] with an already-trained coarse quantizer — lets callers
    * train once and reuse (or export) the centroid table. */
  def annIvfWith(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      cents: Seq[Seq[Double]],
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftexpr.GraftExpr.centroid_probes
    val assigned = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("list", element_at(centroid_probes(col("nvec"), cents, 1), 1))
    val q = emb.where(queryPred)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      // array_distinct: a degenerate (NaN-distance) vector's probe list can
      // repeat an id — a duplicate probe would double-count candidates
      .withColumn("list",
        explode(array_distinct(centroid_probes(col("qvec"), cents, nprobe))))
    val scored = assigned.join(q, Seq("list"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), 4).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }
}
