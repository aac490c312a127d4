package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash groupBy), MinHash+LSH near-dup (shingle -> minhash -> band ->
  * bucket-join), n-gram Jaccard verification, SimHash. All pure
  * DataFrame/Catalyst expressions — codegen'd, no UDFs, no driver loops —
  * so the same plan scales from 500 docs to 10^9 (the LSH band join is the
  * only shuffle and it's on a uniform hash key).
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Counts lazy initializations of [[fallbackCheckpointDir]] — assertable
    * evidence (OpsSpec) that repeated clusters() calls never stack JVM
    * shutdown hooks (the r4 verdict finding). */
  private[graft] val fallbackCheckpointInits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** ONE per-JVM driver-local checkpoint fallback dir (+ one cleanup hook),
    * created lazily on first use: a long-lived driver calling clusters()
    * repeatedly must not accumulate shutdown hooks or temp dirs. Removed on
    * JVM exit, bounding held disk to the driver's lifetime; long-lived
    * drivers should set a managed checkpoint dir (and enable
    * spark.cleaner.referenceTracking.cleanCheckpoints so data is reclaimed
    * as soon as the result RDD is collected). */
  private lazy val fallbackCheckpointDir: java.nio.file.Path = {
    fallbackCheckpointInits.incrementAndGet()
    val dir = java.nio.file.Files.createTempDirectory("graft-clusters-ckpt-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))
    dir
  }

  /** Ensure an RDD checkpoint dir is set (the reliable-checkpoint
    * precondition shared by [[clusters]] and [[reliableCheckpoint]]): on a
    * real cluster callers must have called `setCheckpointDir(<shared
    * storage>)`; when unset, fall back LOUDLY to the per-JVM driver-local
    * temp dir — correct in local mode only, where executors share the
    * filesystem. */
  private def ensureCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    if (sc.getCheckpointDir.isEmpty) {
      log.warn("[graft] no checkpoint dir set; falling back to driver-local " +
        s"$fallbackCheckpointDir — call sparkContext.setCheckpointDir(" +
        "<shared storage>) on a cluster")
      sc.setCheckpointDir(fallbackCheckpointDir.toString)
    }

  /** Eager, file-backed (reliable) checkpoint of `df` — the bounded-memory
    * way to pin a frame that downstream EAGER loops will re-read many times
    * (the curate near-dedup stage): unlike a MEMORY_AND_DISK persist, the
    * footprint is disk-only and never competes with execution memory for a
    * corpus-sized cache, and unlike a bare lazy plan, re-reads do not replay
    * the upstream lineage (in streaming curate: the whole batch
    * extraction). Reclaimed by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set (Main does). */
  def reliableCheckpoint(df: DataFrame): DataFrame = {
    ensureCheckpointDir(df.sparkSession.sparkContext)
    df.checkpoint()
  }

  /** Exact dedup on content: keep the smallest id per identical text.
    * At scale this is a single hash-partial/final aggregate on a narrow
    * composite key: TWO independent 64-bit hashes (different seeds) plus the
    * text length — 128+ bits of discrimination, so birthday collisions are
    * negligible even at 10^12 docs (a bare 64-bit key starts silently
    * merging distinct texts around 10^9). Shuffle rows stay ~24 bytes. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(exactKeyCols(col(textCol)): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("dup_count"))

  /** The 128-bit exact-text key (two independent 64-bit hashes + length)
    * shared by [[exact]] and the Curate job — one definition so the
    * collision argument can never drift between them. */
  def exactKeyCols(textCol: Column): Seq[Column] = Seq(
    xxhash64(textCol).as("_h1"),
    xxhash64(lit(0x9e3779b9L), textCol).as("_h2"),
    length(textCol).as("_len"))

  /** Distinct word n-gram shingles of `textCol` (lowercased). Backed by the
    * native one-pass [[org.apache.spark.sql.graftexpr.WordShingles]]
    * expression (the interpreted HOF pipeline was the cost left in d05
    * after the signature went native). */
  def shingles(textCol: Column, n: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.word_shingles(textCol, n)

  /** Reference HOF formulation of [[shingles]], kept for cross-checking the
    * native expression in tests (identical trim/split/slice semantics). */
  def shinglesHof(textCol: Column, n: Int): Column = {
    val words = split(trim(lower(textCol)), "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** MinHash signature: k independent permutations approximated by
    * xxhash64(i, shingle); signature[i] = min over shingles.
    * (Broder, "On the resemblance and containment of documents", 1997.)
    * Backed by the native one-pass [[org.apache.spark.sql.graftexpr.MinHashSig]]
    * expression — one tight loop per row instead of k interpreted
    * transform+array_min HOF pipelines (the round-1 d05 hot spot). */
  def minhashSignature(sh: Column, k: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.minhash_sig(sh, k)

  /** Reference HOF formulation of [[minhashSignature]], kept for
    * cross-checking the native expression in tests (bit-identical
    * per-permutation hashes: xxhash64(lit(i), s)). */
  def minhashSignatureHof(sh: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))): _*)

  /** LSH banding: k minhashes -> `bands` band hashes (rows = k/bands each).
    * Docs sharing any band hash are near-dup candidates. */
  def bandHashes(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map(b =>
      xxhash64((lit(b) +: (0 until rows).map(r =>
        element_at(sig, b * rows + r + 1))): _*)): _*)
  }

  /** Exact n-gram Jaccard similarity between two shingle-set columns.
    * Native one-hash-set-pass expression since r7 — the declarative twin
    * ([[jaccardHof]], kept for cross-checks) materialized TWO intermediate
    * arrays per compared pair, the entire cost of the quadratic d06
    * oracle; values are identical under set semantics (see JaccardSim). */
  def jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.jaccard_sim(a, b)

  /** Reference built-ins formulation of [[jaccard]] (tests only). */
  private[graft] def jaccardHof(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b)))

  /** MinHash+LSH near-duplicate pairs, verified with exact n-gram Jaccard.
    *
    * Plan shape (scale-first): shingle+sign per doc (narrow map) ->
    * explode band hashes -> self-join on (band, hash) -> dedupe candidate
    * pairs -> verify Jaccard on the pair (re-joining the shingle arrays).
    * The candidate join is the only wide op; band hashes are uniform so no
    * skew FROM HASHING. At 10^9 docs the shingle arrays stay out of the
    * band shuffle (only doc ids travel), joined back just for the
    * surviving candidates.
    *
    * PRECONDITION at scale: run [[exact]] dedup FIRST. Exact duplicates
    * share every band hash, so a text repeated m times puts m ids in one
    * bucket and m^2/2 candidate pairs in one task — at web dup rates
    * (30-60% exact dups, some texts repeated 10^6x) that is the one skew
    * hashing cannot fix. Near-dup detection over exact-dedup
    * representatives is both correct and the standard pipeline order. */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      ngram: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), ngram).as("sh"))
    val sig = sh.select(col("id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))
    val banded = sig
      .select(col("id"), posexplode(bandHashes(col("sig"), k, bands)).as(Seq("band", "bh")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // Verification sides re-shingle the corpus once per join side. An r7
    // candidate-restricted variant (semi-join docs against the candidate
    // ids BEFORE the shingle projection) was built and MEASURED SLOWER
    // (0.93 s -> 1.28 s at sf0.1): deriving the id set references `cand`
    // a second time, and the streamed side of the band self-join is not
    // behind an exchange — so the signature pipeline (shingle + 32-hash
    // minhash over every doc, the dominant cost) re-evaluated wholesale,
    // costing more than the two saved native-shingle passes. Rejected on
    // the measurement (the d11 rule: the bench vetoes nice-on-paper
    // shapes); revisit only with a cheap way to pin `cand` (it is
    // pair-set-sized) that keeps this a pure plan builder.
    val shA = sh.select(col("id").as("a"), col("sh").as("sha"))
    val shB = sh.select(col("id").as("b"), col("sh").as("shb"))
    cand.join(shA, "a").join(shB, "b")
      .select(col("a"), col("b"),
        round(jaccard(col("sha"), col("shb")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
    // no global orderBy: the pair set scales with the corpus dup rate — a
    // total sort of it is waste at 10^9 docs (consumers/driver sort slices)
  }

  /** Benchmark decontamination — the standard training-data hygiene op
    * (n-gram overlap against a held-out evaluation set, as popularized by
    * the GPT-3 appendix): flag every training document sharing at least
    * one word n-gram with the benchmark corpus.
    *
    * Scale shape: the benchmark side is SMALL (evaluation sets are MBs
    * even when the corpus is 100 TB), so AQE broadcasts its distinct gram
    * hashes and the probe is a map-side hash join over the training
    * scan — no shuffle of corpus data at all; grams travel as 8-byte
    * xxhash64 keys, never strings. (No broadcast() hint — the same
    * degrade-not-die reasoning as [[stripRepeatedParagraphs]]: if someone
    * passes a giant "benchmark", the plan goes slow, not OOM.)
    * Returns one row per training doc:
    * (id, contaminated_ngrams, is_contaminated) — zeros included, so the
    * output doubles as the keep/drop filter input. */
  def decontaminate(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      ngram: Int = 5): DataFrame = {
    val hits = contaminationHits(docs, benchGramHashes(bench, textCol, ngram),
      idCol, textCol, ngram)
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("hits"), lit(0L)).as("contaminated_ngrams"),
        (coalesce(col("hits"), lit(0L)) > 0).cast("int").as("is_contaminated"))
  }

  /** The benchmark side of the d10 rule: the distinct xxhash64'd word
    * `ngram`-grams of `bench.textCol` — the probe set. Computed separately
    * so a long-lived caller (the streaming curate) can build + persist it
    * ONCE instead of re-deriving it every micro-batch. */
  def benchGramHashes(bench: DataFrame, textCol: String = "text",
      ngram: Int = 5): DataFrame =
    bench
      .select(explode(shingles(col(textCol).cast("string"), ngram)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .distinct()

  /** The d10 rule's core: per doc id, the count of its word `ngram`-grams
    * present in `benchGrams` (a [[benchGramHashes]] frame; docs with zero
    * hits are ABSENT). The ONE definition of the gram derivation + hash
    * probe, shared by [[decontaminate]] and the curate chain's drop stage
    * so the oracle-checked op and the production filter can never drift. */
  def contaminationHits(
      docs: DataFrame,
      benchGrams: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int): DataFrame =
    docs
      .select(col(idCol), explode(shingles(col(textCol), ngram)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(benchGrams, Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits")) // shingles are distinct per doc already

  /** Brute-force n-gram Jaccard pairs (quadratic; the small-scale oracle for
    * minhashPairs and the DuckDB-checkable variant). */
  def jaccardPairsBrute(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      ngram: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), ngram).as("sh"))
    sh.as("x").join(sh.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(jaccard(col("x.sh"), col("y.sh")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** Near-dup clusters from verified pairs: min-label propagation over the
    * pair graph to a FIXPOINT (connected components), accelerated with
    * POINTER JUMPING — each round takes the min of (own label, the
    * neighbors' labels, AND the label's own current label), the classic
    * PRAM path-halving step used by MapReduce connected-components
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): label-chasing distance halves per round, so convergence
    * is O(log diameter) rounds instead of O(diameter) — a 1000-link chain
    * of incrementally-edited boilerplate pages resolves in ~10 rounds,
    * not 1000 shuffles. Each round is two narrow-row shuffles (neighbor
    * min + the jump lookup) over ONLY the pair-touched node set —
    * singletons (the overwhelming majority at web dup rates) never enter
    * the loop and rejoin as (id, id) at the end. Convergence is checked
    * with a changed-count action after fully materializing the round's
    * cache, and the loop is capped at `maxRounds` (the cap is a runaway
    * guard supporting diameter ~2^maxRounds, and hitting it raises rather
    * than silently returning partial clusters).
    *
    * Lineage is truncated with a reliable checkpoint every couple of
    * rounds: an iterated cache-on-cache plan nests one AQE subplan per
    * round and is re-rendered as a TREE by every posted SQL event, so an
    * unbounded loop kills the DRIVER with exponential plan rendering
    * (not a data cost — a plan cost; see the in-loop comment).
    * The fixpoint is materialized via a RELIABLE checkpoint before the loop
    * caches are released: returning the cached plan itself would leak one
    * MEMORY_AND_DISK cache per invocation, and an unpersisted lazy plan
    * would replay every propagation round on first use. On a real cluster
    * set `sparkContext.setCheckpointDir` to shared storage (the standard
    * iterative-algorithm contract); when unset, a driver-local temp dir is
    * used — correct in local mode, where executors share the filesystem.
    * Returns (doc_id, cluster_id). */
  def clusters(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
      maxRounds: Int = 10): DataFrame = {
    // lineage-truncation cadence for the propagation loop (see the
    // in-loop comment): nesting depth between checkpoints stays <= this,
    // so per-event plan rendering is O(3^interval) small sub-plans
    val CheckpointInterval = 2
    val sc = docs.sparkSession.sparkContext
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the loop runs ONLY over nodes that have at least one edge: at web
      // dup rates the pair-touched set is orders of magnitude smaller than
      // the corpus, and a singleton's label provably never changes — it
      // rejoins the output as (id, id) after convergence, instead of
      // paying the full-corpus shuffles every round
      val docIds = docs.select(col(idCol).as("id"))
      val touched = docIds
        .join(edges.select(col("a").as("id")).distinct(), Seq("id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var labels = touched.select(col("id"), col("id").as("cluster"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          ensureCheckpointDir(sc)
          var converged = false
          var i = 0
          while (!converged && i < maxRounds) {
            val neighborMin = edges.join(labels, edges("b") === labels("id"))
              .groupBy(edges("a").as("id2")).agg(min(col("cluster")).as("nmin"))
            val stepped = labels.join(neighborMin, labels("id") === col("id2"), "left")
              .select(col("id"),
                least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
            // pointer jump: also adopt the label's OWN current label
            // (labels are node ids of touched nodes, so cluster is a valid
            // lookup key); min with a stale-but-monotone label is still an
            // upper bound on the component min, so correctness is
            // unchanged and the chase distance halves per round
            val next = stepped.as("s")
              .join(labels.as("l2"), col("s.cluster") === col("l2.id"), "left")
              .select(col("s.id").as("id"),
                least(col("s.cluster"), coalesce(col("l2.cluster"), col("s.cluster")))
                  .as("cluster"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // a failure in an action must release `next` too — at that
            // point it is persisted but not yet owned by `labels`
            val changed =
              try {
                // fully materialize next's cache BEFORE releasing the old
                // labels: the convergence probe below early-stops on the
                // first differing row and may compute only a few
                // partitions — dropping the previous round on a partial
                // cache would leave later rounds re-deriving the whole
                // round lineage from the source (O(rounds^2) replays)
                next.count()
                next.as("n").join(labels.as("p"), col("n.id") === col("p.id"))
                  .where(col("n.cluster") =!= col("p.cluster")).limit(1).count()
              } catch { case t: Throwable => next.unpersist(); throw t }
            labels.unpersist()
            labels = next
            converged = changed == 0
            i += 1
            // truncate lineage every CheckpointInterval rounds: round r's
            // plan nests round r-1's cached AQE plan inside an
            // InMemoryRelation, and each round references `labels` three
            // times (neighbor join, left join, jump lookup) — so the
            // plan-description string posted with every SQL event expands
            // the cache-on-cache DAG as a TREE, ~3^r sub-plan renders per
            // action. Left unbounded, the DRIVER dies of plan rendering
            // (minutes of TreeNode.generateTreeString + a GC storm from
            // the giant strings) long before the data is large. A reliable
            // checkpoint cuts the plan to a file-backed leaf, bounding the
            // nesting depth at the interval — the standard iterative-
            // algorithm contract (GraphX/GraphFrames checkpoint the same
            // way); re-persisting keeps later probes memory-speed.
            if (!converged && i % CheckpointInterval == 0) {
              val cp = labels.checkpoint()
              labels.unpersist()
              labels = cp.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            }
          }
          require(converged, s"label propagation did not converge in $maxRounds rounds")
          // eager file-backed materialization computed from the still-cached
          // labels + the untouched singletons; after it, no persisted RDD
          // from this call remains
          labels.select(col("id").as(idCol), col("cluster").as("cluster_id"))
            .unionByName(docIds.join(touched, Seq("id"), "left_anti")
              .select(col("id").as(idCol), col("id").as("cluster_id")))
            .checkpoint()
        } finally labels.unpersist()
      } finally touched.unpersist()
    } finally edges.unpersist()
  }

  /** Repeated-paragraph removal — passage-granularity dedup (the
    * RefinedWeb/FineWeb "line-level dedup" stage): a paragraph occurring
    * in more than `maxDocs` DISTINCT documents is boilerplate that
    * page-level extraction missed (cookie banners, disclaimers, CTA
    * text), and is stripped from every document; the per-document text is
    * reassembled in original paragraph order.
    *
    * Scale shape: paragraph occurrences travel as the 128-bit exact-text
    * key (~24-byte shuffle rows, never paragraph strings) through a
    * distinct-doc count; the HOT key set is tiny at any corpus size (hot
    * paragraphs ARE the repeated boilerplate), so AQE broadcasts the
    * removal join at runtime — deliberately NOT a broadcast() hint: a hint
    * is a promise, and on a precondition-violating corpus (mirrored
    * articles, below) the hot set grows with the duplicated fraction and a
    * forced broadcast OOMs where AQE's size-based choice degrades to a
    * slow-but-correct shuffle join. Reassembly is a NARROW map since r7:
    * only the REMOVED positions per doc (boilerplate-occurrence-sized)
    * aggregate and join back — text never crosses an exchange at all.
    *
    * PRECONDITION at scale (same as [[minhashPairs]]): run [[exact]]
    * document dedup FIRST. On a corpus where whole texts repeat across
    * many ids, EVERY paragraph of a mirrored article is "repeated" — all
    * copies would be annihilated to empty text instead of one winner
    * surviving, and the hot set would grow with the duplicated fraction
    * rather than staying boilerplate-sized.
    *
    * Empty paragraphs (blank-line separators) are EXEMPT from the hot
    * count: blank lines repeat in any multi-paragraph corpus and removing
    * them would silently reflow paragraph boundaries corpus-wide.
    * Returns (id, n_paras, n_kept, text). */
  def stripRepeatedParagraphs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDocs: Int = 2): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1: $maxDocs")
    // (id, pos, 128-bit para key) — the para STRING is dropped inside the
    // projection, so nothing string-shaped ever reaches an exchange (the
    // r6 shape shuffled every kept (pos, para) row through the reassembly
    // aggregate — the one payload-bearing exchange this removes)
    val keyed = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "para")))
      .select(Seq(col("id"), col("pos")) ++ exactKeyCols(col("para")): _*)
    val hot = keyed.where(col("_len") > 0)
      .groupBy(col("_h1"), col("_h2"), col("_len"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") > maxDocs)
      .select("_h1", "_h2", "_len")
    // no broadcast() hint: AQE picks BHJ at the intended (boilerplate-
    // sized) hot set and falls back to a shuffle join when the
    // exact-dedup-first precondition was violated — never an OOM
    // REMOVED positions per doc (docs with none are absent): at real dup
    // rates this frame is boilerplate-occurrence-sized, far below the
    // kept set the r6 shape aggregated, and AQE broadcasts it into the
    // final join — the reassembly then happens as a narrow map over the
    // doc's own split array, no doc-key shuffle of text at all
    val removed = keyed.join(hot, Seq("_h1", "_h2", "_len"), "left_semi")
      .groupBy(col("id")).agg(sort_array(collect_list(col("pos"))).as("rm"))
    docs.select(col(idCol).as("id"), split(col(textCol), "\n").as("paras"))
      .join(removed, Seq("id"), "left") // a doc of ONLY hot paras -> empty
      .select(col("id").as(idCol),
        size(col("paras")).as("n_paras"),
        when(col("paras").isNull, lit(0L))
          .otherwise((size(col("paras")) - coalesce(size(col("rm")), lit(0)))
            .cast("long")).as("n_kept"),
        coalesce(
          when(col("rm").isNull, concat_ws("\n", col("paras")))
            .otherwise(concat_ws("\n", filter(col("paras"),
              (p, i) => !array_contains(col("rm"), i)))),
          lit("")).as("text"))
  }

  /** Reference reassembly-shuffle formulation of [[stripRepeatedParagraphs]]
    * (the r6 shape: anti-join kept (pos, para) rows, collect_list + sort
    * per doc). Kept for cross-checking the positions-only path in tests. */
  private[graft] def stripRepeatedParagraphsRef(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocs: Int = 2): DataFrame = {
    val paras = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "para")))
    val keyed = paras.select(
      Seq(col("id"), col("pos"), col("para")) ++ exactKeyCols(col("para")): _*)
    val hot = keyed.where(col("_len") > 0)
      .groupBy(col("_h1"), col("_h2"), col("_len"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") > maxDocs)
      .select("_h1", "_h2", "_len")
    val kept = keyed.join(hot, Seq("_h1", "_h2", "_len"), "left_anti")
    val rebuilt = kept.groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            s => s.getField("para"))).as("text"))
    docs.select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).as("n_paras"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Cross-document repeated-window statistics — the detection half of
    * exact substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL 2022: their ExactSubstr finds
    * 50-token spans shared across docs via a suffix array; the
    * Spark-native equivalent is this k-token sliding-window hash join).
    * Every k-token window of every doc is keyed by the 128-bit
    * [[exactKeyCols]] key; a window seen in more than `maxDocs` distinct
    * docs is duplicated text. Per doc: total window count, duplicated
    * window count, and the duplicated fraction (null when the doc is
    * shorter than k tokens) — the standard signal for span-level dedup
    * policies (drop docs above a dup fraction, or excise the spans).
    *
    * Scale shape: the window explosion amplifies the corpus ~k-fold, but
    * only TRANSIENTLY inside a projection — what leaves each map task is
    * the ~28-byte (id, _h1, _h2, _len) row, and the distinct-doc count
    * partially aggregates map-side. The hot set (boilerplate + mirrored
    * passages) is a small fraction of distinct windows, so AQE broadcasts
    * the semi-join at runtime (no hint, same degrade-not-die reasoning as
    * [[stripRepeatedParagraphs]]); the final per-doc count shuffles ids
    * only. The window stream is evaluated once per consumer (hot-set agg
    * + probe) rather than cached — recompute-over-corpus-sized-cache, the
    * same trade the curate chain makes. PRECONDITION at scale: run
    * [[exact]] document dedup first, or mirrored whole docs flood the
    * hot set with their entire window streams. */
  def dupWindowStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 20, maxDocs: Int = 1): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens: $k")
    require(maxDocs >= 1, s"maxDocs must be >= 1: $maxDocs")
    val base = docs
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("tk"))
      .withColumn("nw", greatest(size(col("tk")) - (k - 1), lit(0)))
    // ONE native pass per doc builds every window's 128-bit key directly
    // from per-token hash streams (see WindowHashes) — no window STRING is
    // ever built, where the previous transform+slice+concat_ws+xxhash64
    // HOF chain was interpreted per window (ArrayTransform is
    // CodegenFallback) and dominated d19/d20 (r7 bench: 2.0 s -> 0.4 s)
    val win = base.where(col("nw") >= 1)
      .select(col("id"), explode(
        org.apache.spark.sql.graftexpr.GraftExpr.window_hashes(col("tk"), k)).as("ph"))
      .select(col("id"), col("ph.h1").as("_h1"), col("ph.h2").as("_h2"))
    val hot = hotWindowKeys(win, maxDocs)
    val dup = win.join(hot, Seq("_h1", "_h2"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup"))
    base.select(col("id"), col("nw"))
      .join(dup, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("nw").cast("long").as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("n_dup"), lit(0L)).cast("double") /
          nullif(col("nw").cast("long"), lit(0L)), 4).as("dup_frac"))
  }

  /** Reference string-keyed formulation of [[dupWindowStats]] (the r6
    * shape): windows materialized as strings via HOFs and keyed by
    * [[exactKeyCols]]. Kept for cross-checking the native WindowHashes
    * path in tests — the two must agree row-for-row on any corpus. */
  private[graft] def dupWindowStatsStrKeyed(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 20,
      maxDocs: Int = 1): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("tk"))
      .withColumn("nw", greatest(size(col("tk")) - (k - 1), lit(0)))
    // sequence(1, nw) only when nw >= 1: Spark's sequence RUNS BACKWARDS
    // for stop < start (sequence(1, 0) = [1, 0]), it does not return []
    val win = base.where(col("nw") >= 1)
      .select(col("id"), explode(transform(sequence(lit(1), col("nw")),
        i => concat_ws(" ", slice(col("tk"), i, lit(k))))).as("w"))
      .select(col("id") +: exactKeyCols(col("w")): _*)
    val hot = win.groupBy(col("_h1"), col("_h2"), col("_len"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") > maxDocs)
      .select("_h1", "_h2", "_len")
    val dup = win.join(hot, Seq("_h1", "_h2", "_len"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup"))
    base.select(col("id"), col("nw"))
      .join(dup, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("nw").cast("long").as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("n_dup"), lit(0L)).cast("double") /
          nullif(col("nw").cast("long"), lit(0L)), 4).as("dup_frac"))
  }

  /** Window hash keys seen in more than `maxDocs` distinct docs — the
    * shared hot-set core of [[dupWindowStats]] and [[exciseDupWindows]];
    * partial-aggregates map-side, stays broadcast-sized at real dup rates.
    * The key is the native WindowHashes 128-bit (h1, h2) pair. */
  private def hotWindowKeys(win: DataFrame, maxDocs: Int): DataFrame =
    win.groupBy(col("_h1"), col("_h2"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") > maxDocs)
      .select("_h1", "_h2")

  /** Duplicated-span EXCISION — the removal half of exact-substring dedup
    * ([[dupWindowStats]] is the detection half; Lee et al. ACL 2022 cut
    * the shared spans rather than dropping whole documents, preserving
    * each doc's unique remainder). Every k-token window repeated in more
    * than `maxDocs` distinct docs marks its k token positions; the union
    * of marked positions is removed and the survivors are re-serialized
    * with single spaces — the operator is defined over the TOKEN STREAM,
    * like the reference algorithm, so original inter-token whitespace is
    * not preserved (unchanged docs come back as their token join too).
    *
    * Scale shape: identical to [[dupWindowStats]] up to the hot set — the
    * k-fold window explosion stays transient inside a projection, ~32-byte
    * (id, pos, hash-key) rows shuffle, the hot probe broadcasts under AQE.
    * The excision itself is one doc-key shuffle of (id, sorted dup
    * positions) joined back to the token arrays, then a narrow map:
    * covered positions expand from the doc's OWN duplicated windows
    * (bounded by its token count) and the keep-filter is membership per
    * token — O(tokens x covered) worst case within a single doc, linear
    * where dup spans are the expected small fraction. Same PRECONDITION:
    * [[exact]]-dedup first, or mirrored whole docs excise each other to
    * empty text.
    *
    * SINGLE-PASS semantics (honest limit): excision joins the tokens on
    * either side of a cut span, and that new adjacency can occasionally
    * form a window shared with another doc that the pre-cut corpus did
    * not contain — the same residue the reference algorithm leaves and
    * resolves by iterating. Re-run on the output when a strictly
    * shared-window-free corpus is required; one pass removes the
    * overwhelming mass. Returns (id, n_tokens, n_removed, text). */
  def exciseDupWindows(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 20, maxDocs: Int = 1): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens: $k")
    require(maxDocs >= 1, s"maxDocs must be >= 1: $maxDocs")
    val base = docs
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("tk"))
      .withColumn("nw", greatest(size(col("tk")) - (k - 1), lit(0)))
    // window POSITION rides along this time (excision needs it); the
    // native WindowHashes pass emits (pos, h1, h2) directly — no window
    // strings, no interpreted HOFs (see dupWindowStats)
    val win = base.where(col("nw") >= 1)
      .select(col("id"), explode(
        org.apache.spark.sql.graftexpr.GraftExpr.window_hashes(col("tk"), k)).as("ph"))
      .select(col("id"), col("ph.pos").as("pos"),
        col("ph.h1").as("_h1"), col("ph.h2").as("_h2"))
    val hot = hotWindowKeys(win, maxDocs)
    val dupPos = win.join(hot, Seq("_h1", "_h2"), "left_semi")
      .groupBy(col("id")).agg(sort_array(collect_list(col("pos"))).as("ps"))
    // dup window at pos p covers tokens [p, p+k-1]; p <= n-k+1 so the
    // cover never runs past the token array. The excision itself is the
    // native linear merge over (sorted ps, tokens) — O(tokens + |ps|)
    // per doc, replacing the per-token array_contains probe whose
    // O(tokens x covered) worst case the r6 ADVICE flagged.
    val ex = org.apache.spark.sql.graftexpr.GraftExpr.excise_tokens(
      col("tk"), coalesce(col("ps"), array().cast("array<int>")), k)
    base.join(dupPos, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        coalesce(ex.getField("n_removed"), lit(0L)).as("n_removed"),
        coalesce(ex.getField("text"), lit("")).as("text"))
  }

  /** Reference covered-set formulation of [[exciseDupWindows]] (the r6
    * shape): string-keyed windows, explicit distinct covered-position
    * array, per-token array_contains filter. Kept for cross-checking the
    * native WindowHashes + ExciseTokens path in tests. */
  private[graft] def exciseDupWindowsRef(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 20,
      maxDocs: Int = 1): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("tk"))
      .withColumn("nw", greatest(size(col("tk")) - (k - 1), lit(0)))
    val win = base.where(col("nw") >= 1)
      .select(col("id"), explode(transform(sequence(lit(1), col("nw")),
        i => struct(i.as("pos"), concat_ws(" ", slice(col("tk"), i, lit(k))).as("w")))).as("pw"))
      .select(Seq(col("id"), col("pw.pos").as("pos")) ++ exactKeyCols(col("pw.w")): _*)
    val hot = win.groupBy(col("_h1"), col("_h2"), col("_len"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") > maxDocs)
      .select("_h1", "_h2", "_len")
    val dupPos = win.join(hot, Seq("_h1", "_h2", "_len"), "left_semi")
      .groupBy(col("id")).agg(sort_array(collect_list(col("pos"))).as("ps"))
    base.join(dupPos, Seq("id"), "left")
      .withColumn("cov", array_distinct(flatten(transform(col("ps"),
        p => sequence(p, p + lit(k - 1))))))
      .select(col("id").as(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        when(col("ps").isNull, lit(0L))
          .otherwise(size(col("cov")).cast("long")).as("n_removed"),
        when(col("ps").isNull, concat_ws(" ", col("tk")))
          .otherwise(concat_ws(" ", filter(col("tk"),
            (t, i) => !array_contains(col("cov"), i + 1)))).as("text"))
  }

  /** SimHash (Charikar 2002): 64-bit signature where bit j is the sign of
    * the sum over tokens of (bit j of token hash ? +1 : -1). Docs within a
    * small Hamming distance are near-dups. Backed by the native Catalyst
    * expression [[org.apache.spark.sql.graftexpr.SimHash64]] — one tight
    * JVM loop per row instead of interpreted per-token-per-bit lambdas. */
  def simhash(textCol: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.simhash64(textCol)

  /** Reference HOF formulation of [[simhash]] kept for cross-checking the
    * native expression in tests (identical tokenization/hash/sign rules,
    * expressed with built-in transform/aggregate/zip_with). */
  def simhashHof(textCol: Column): Column = {
    val masks: Array[Long] = Array.tabulate(64)(j => 1L << j)
    val words = filter(split(trim(lower(textCol)), "\\s+"), w => length(w) > 0)
    val hashes = transform(words, w => xxhash64(w))
    // single pass over tokens: per-bit +/-1 sums in a 64-long accumulator
    val sums = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, lit(masks),
        (a, m) => a + when(h.bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(sums, lit(masks), (s, m) => when(s > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxHamming`, using Manku-style
    * multi-table blocking (Manku/Jain/Das Sarma, "Detecting near-duplicates
    * for web crawling", WWW 2007): split the 64-bit signature into
    * B = maxHamming + 3 blocks; by pigeonhole, two signatures within
    * Hamming distance d agree exactly on at least B - d blocks, so one
    * table per (B - d)-subset of blocks — keyed by the concatenated block
    * values — catches every qualifying pair. For d = 3 that is C(6,3) = 20
    * tables with ~32-bit keys: expected candidates ~ 20 * N^2 / 2^32,
    * versus N^2 / 2^16 for naive 4x16-bit segment blocking — the difference
    * between feasible and quadratic at 10^9 docs. The join key is a single
    * long (xxhash64 of tableId + block values); false key-collisions are
    * removed by the exact Hamming verify. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 8, s"maxHamming out of range: $maxHamming")
    val b = maxHamming + 3 // blocks; B - d = 3 blocks must match exactly
    val clean = b - maxHamming
    val widths = Array.tabulate(b)(i => 64 / b + (if (i < 64 % b) 1 else 0))
    val offs = widths.scanLeft(0)(_ + _)
    def block(sig: Column, i: Int): Column =
      shiftrightunsigned(sig, offs(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    val tables = (0 until b).combinations(clean).toSeq
    def keys(sig: Column): Column = array(tables.zipWithIndex.map {
      case (blocks, t) => xxhash64((lit(t) +: blocks.map(block(sig, _))): _*)
    }: _*)
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val keyed = sigs.select(col("id"), col("sig"), explode(keys(col("sig"))).as("key"))
    keyed.as("x").join(keyed.as("y"),
        col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming) // unsorted: see minhashPairs note
  }

  /** Naive 4x16-bit-segment blocking — candidate sets explode (~N^2/2^16)
    * at scale; kept ONLY as a small-scale cross-check for [[simhashPairs]]
    * (both must equal brute-force Hamming enumeration on test corpora). */
  private[graft] def simhashPairsSeg16(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val seg = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(s =>
        shiftright(col("sig"), s * 16).bitwiseAND(lit(0xffffL))): _*)).as(Seq("seg", "segv")))
    seg.as("x").join(seg.as("y"),
        col("x.seg") === col("y.seg") && col("x.segv") === col("y.segv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }
}
