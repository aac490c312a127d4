package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusWriter
import graft.ops.{Dedup, Similarity, TextStats}
import graft.pipeline.ExtractPipeline

/** Driver contract: queries (one per operator family), DuckDB oracle SQL,
  * and the flagship entry. Column names/types are aligned 1:1 with the
  * oracle SQL (the driver sorts columns by name and hashes values).
  *
  * Query families (SURVEY.md §2 Table B):
  *  - q01..q10: relational coverage (agg, joins incl. broadcast/semi/anti,
  *    window, rollup, set ops, string/date/array functions, sessionize)
  *  - d01..d14: training-data corpus ops (exact dedup, token stats,
  *    quality, lang-id, MinHash+LSH, brute Jaccard, SimHash, fingerprint,
  *    clusters, benchmark decontamination, Gopher-style repetition
  *    signals, PII scrubbing over the extracted corpus, URL/domain
  *    curation: blocklists + per-domain balancing caps, passage-level
  *    repeated-paragraph dedup)
  *  - e01..e04: embedding similarity (brute-force cosine top-k, LSH ANN,
  *    brute near-dup pairs, IVF ANN)
  *  - x01..x07: the extraction pipeline itself on the synthetic pages
  *    corpus. Extraction can't be replicated in SQL, but its AGGREGATION
  *    layer is oracle-checked: the x02/x04/x05/x07 queries export per-doc
  *    rows to a fixed path and the static oracle SQL re-aggregates them in
  *    DuckDB (x01/x03/x04/x05/x06/x07 all value-compared; x02 itself stays
  *    rows-only + golden-gated). x05 exercises the nested attachments
  *    array + re-attach filter policy; x06 the WARC (Common-Crawl archive)
  *    ingest path — its counts must equal the parquet path's; x07 the
  *    thumbnail artifact fan-out.
  *
  * Oracle coverage: 39/40. The only rows-only query is per-doc x02
  * (golden byte-equality gate + source of x01/x06's oracle exports).
  * d08/m01/m02 are value-checked through per-doc exports; e02's seeded
  * hyperplanes are baked into its oracle SQL as literals (DuckDB
  * recomputes the whole LSH search independently); e04 exports its
  * trained centroid table and DuckDB re-derives assignment, probing,
  * scoring and ranking from it.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fixed export root that the STATIC oracle SQL reads back via DuckDB's
    * read_parquet. The oracle cannot replicate extraction itself, but it can
    * independently re-aggregate the engine's own exported per-doc rows —
    * turning the extraction queries (x01/x04/x05/x06/x07) from rows-only
    * checks into real schema+rows+hash comparisons. Overwritten per Verify
    * run; the path is static because oracleSql is a static map, and
    * CORPUS-VERSIONED so a failed export can never be silently compared
    * against a stale pre-bump run's files. (Single active driver assumed,
    * as everywhere — see the Bench-concurrency warning in CLAUDE.md.) */
  private val ExportRoot =
    s"/tmp/graft-verify-export-${graft.corpus.PagesGen.CorpusVersion}"

  /** Pages-cache path PINNED to the driver's Verify scale (sf0.01 -> 1000
    * rows, the same sf-to-rows formula as [[pages]]) — the ONE constant the
    * x03/d13 oracle SQL reads; the cache is materialized by the same Verify
    * run. Running Verify at another sf would compare against a different
    * corpus instance — keep the pin and the formula together. */
  private val VerifyPagesGlob =
    s"/tmp/graft-pages/${graft.corpus.PagesGen.CorpusVersion}-rows-1000/*.parquet"

  /** d21's per-language sampling fractions — the ONE table both the Spark
    * plan and the generated oracle CASE compile from (the d13/d04
    * drift-proofing pattern). */
  private val D21Fractions = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 1.0)

  /** Export property set ONLY by graft.Verify: Bench runs the same queries
    * as pure operators — without the gate it would time oracle-export I/O
    * and write the shared export path outside the Verify run (ADVICE r3). */
  private[graft] val ExportProp = "graft.verify.export"

  private def exportAndRead(df: DataFrame, name: String): DataFrame =
    if (!sys.props.get(ExportProp).contains("1")) df // gate off: identical data, no I/O
    else {
      val path = s"$ExportRoot/$name"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }

  /** [[exportAndRead]] for inputs consumed by a MULTI-PASS operator (d14's
    * paragraph dedup reads its input three times: hot-set aggregation,
    * removal probe, final rebuild). In Verify mode the export already
    * returns a file-backed frame; with the gate off the raw frame is the
    * UNMATERIALIZED extraction lineage, and each consumer would replay the
    * whole pipeline (guide §5: materialize reused expensive intermediates;
    * the same non-file-backed-input rule Curate.curate applies). The
    * reliable checkpoint runs inside the timed query — nothing is reused
    * across bench runs. */
  private def exportOrMaterialize(df: DataFrame, name: String): DataFrame = {
    val read = exportAndRead(df, name)
    if (sys.props.get(ExportProp).contains("1")) read
    else graft.ops.Dedup.reliableCheckpoint(read)
  }

  /** DuckDB expression for the e02 sign-LSH bucket of a double-list column:
    * the SAME seeded hyperplanes as `Similarity.hyperplanes(8, 64)` — a
    * pure function of the seed, no data — baked in as literals so the
    * oracle recomputes the bucketing independently of the engine. */
  private def e02Bucket(vExpr: String): String =
    graft.ops.Similarity.hyperplanes(8, 64).zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vExpr, ${p.mkString("[", ",", "]")}) > 0" +
        s" THEN ${1L << j} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Synthetic pages corpus sized to the scale factor; cached per size. */
  private def pages(spark: SparkSession, dir: String): DataFrame = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.01)
    val rows = math.max(200L, (sf * 100000).toLong)
    val path = s"/tmp/graft-pages/${graft.corpus.PagesGen.CorpusVersion}-rows-$rows"
    CorpusWriter.ensurePages(spark, rows, path)
    spark.read.parquet(path)
  }

  /** Flagship: the full extraction pipeline on a small synthetic corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val p = CorpusWriter.pagesDs(spark, 200L, partitions = 4)
    ExtractPipeline.run(p, ExtractPipeline.Config(partitions = 8)).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------- relational
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        // decimal arithmetic internally (exact), but the FINAL projection is
        // round(cast(x as double)) on both sides: the driver's comparer reads
        // Spark parquet via pyarrow, which reprs DECIMAL as Decimal('..') vs
        // the DuckDB oracle's float64 — value-identical yet hash-red (r1 bug)
        .agg(
          round(sum(col("l_quantity").cast("decimal(12,2)")).cast("double"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double"), 2).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_topk_revenue" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
      // r7: aggregate the FACT side per order BEFORE any join (guide §2.3
      // "aggregate before you shuffle") — the r6 shape joined raw lineitem
      // and the static planner picked the 600k-row fact projection as the
      // BROADCAST BUILD side (a driver-built hash relation of the largest
      // table). Now the per-order partial sums (~orders-count narrow rows)
      // are the only lineitem bytes past the scan; both remaining joins
      // have bounded-small build sides at this SF and degrade to SMJ under
      // AQE at scale. Decimal sums are exact and associative, so the
      // two-level aggregation is value-identical to the one-level r6 plan
      // (oracle-verified).
      val perOrder = l.groupBy(col("l_orderkey"))
        // exact decimal arithmetic end-to-end: double->decimal casts happen
        // on the RAW columns (far from rounding boundaries), never on
        // computed doubles, so Spark and the oracle agree bit-for-bit
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).as("orev"))
      val byCust = o.join(perOrder, o("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("orev")).cast("decimal(18,4)").as("rev_d")) // scale 4 =
        // no rounding at the cast (Spark HALF_UP vs DuckDB half-even differ)
      c.join(byCust, c("c_custkey") === col("o_custkey"))
        .orderBy(col("rev_d").desc, col("c_custkey")) // exact-decimal ordering
        .limit(10)
        .select(col("c_custkey"), col("c_name"),
          round(col("rev_d").cast("double"), 4).as("revenue"))
    }),
    "q03_region_rollup" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal").cast("decimal(12,2)")).cast("double"), 2).as("sum_bal"))
        .select(coalesce(col("r_name"), lit("_ALL_")).as("region"),
          coalesce(col("n_name"), lit("_ALL_")).as("nation"),
          col("n_cust"), col("sum_bal"))
        .orderBy("region", "nation")
    }),
    "q04_semi_anti" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("with_orders"))
      val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("without_orders"))
      withO.crossJoin(withoutO)
    }),
    "q05_window_topn" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice").cast("double"), 2).as("price"))
        .orderBy("o_custkey", "rn")
    }),
    "q06_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull, 0)
            .when(unix_micros(col("ts").cast("timestamp")) - col("prev_us") > 1800L * 1000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (sum(col("new_session")) + 1).as("n_sessions"))
        .orderBy("user_id")
    }),
    "q07_setops" -> ((s, d) => {
      val ck = t(s, d, "customer").select(col("c_custkey").as("k"))
      val ok = t(s, d, "orders").select(col("o_custkey").as("k")).distinct()
      val u = ck.union(ok).distinct().agg(count(lit(1)).as("n_union"))
      val i = ck.intersect(ok).agg(count(lit(1)).as("n_intersect"))
      val e = ck.except(ok).agg(count(lit(1)).as("n_except"))
      u.crossJoin(i).crossJoin(e)
    }),
    "q08_string_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .select(regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).as("prio_num"),
          upper(substring(col("o_orderstatus"), 1, 1)).as("status_u"),
          col("o_custkey"))
        .groupBy(col("prio_num"), col("status_u"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("prio_num", "status_u")
    }),
    "q09_datetime" -> ((s, d) => {
      t(s, d, "events")
        // day as a STRING: DuckDB DATE -> pandas datetime64 ('2024-01-01
        // 00:00:00') vs Spark DATE -> datetime.date ('2024-01-01') repr-differ
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(14,4)")).cast("double"), 4).as("sum_value"))
        .orderBy("day", "event_type")
    }),
    "q10_arrays" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
          col("label").cast("int").as("label"))
        .orderBy("vec_id")
    }),
    "q11_cube" -> ((s, d) => {
      // grouping sets: CUBE over (event_type, user bucket) — all four
      // grouping combinations in one pass (one Expand + one aggregate)
      t(s, d, "events")
        .cube(col("event_type"), (col("user_id") % 10).as("user_mod"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(14,4)")).cast("double"), 4).as("sum_value"))
        .select(coalesce(col("event_type"), lit("_ALL_")).as("etype"),
          coalesce(col("user_mod"), lit(-1L)).as("umod"),
          col("n"), col("sum_value"))
        .orderBy("etype", "umod")
    }),
    "q12_percentiles" -> ((s, d) => {
      // EXACT percentiles (sort-based linear interpolation — matches
      // DuckDB quantile_cont); approx_percentile would not oracle-match
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
    "q13_json" -> ((s, d) => {
      // JSON column access: extract props.k, bucket, aggregate
      t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        // % (not pmod): DuckDB's % keeps the dividend's sign — the two
        // must agree even if a future generator produces negative keys
        .groupBy((col("k") % 5).as("k_mod"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy("k_mod")
    }),
    // ------------------------------------------------ text/dedup ops
    "d01_exact_dedup" -> ((s, d) => {
      Dedup.exact(t(s, d, "documents")) // unsorted: driver sorts; a global
      // orderBy of the distinct-text set is waste at scale
    }),
    "d02_token_stats" -> ((s, d) => TextStats.tokenStats(t(s, d, "documents"))),
    "d03_quality" -> ((s, d) => TextStats.quality(t(s, d, "documents"))),
    "d04_lang_id" -> ((s, d) => TextStats.langId(t(s, d, "documents"))),
    "d05_minhash_pairs" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), threshold = 0.8)),
    "d06_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairsBrute(t(s, d, "documents"), threshold = 0.8)),
    "d07_simhash_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // per-doc signatures exported: the oracle BRUTE-FORCES all pairs in
      // DuckDB (bit_count(xor)) — a completeness check that the Manku
      // multi-table blocking misses no qualifying pair (the signature
      // computation itself is cross-checked bit-for-bit in OpsSpec)
      exportAndRead(docs.select(col("doc_id").as("id"),
        Dedup.simhash(col("text")).as("sig")), "d07sigs")
      Dedup.simhashPairs(docs, maxHamming = 3)
    }),
    "d08_fingerprint" -> ((s, d) => {
      // per-doc sketch VALUE ARRAYS are exported; the oracle re-assembles
      // each CSV sketch in DuckDB (sort + join over the same arrays) and
      // must match the engine's own concat_ws construction value-for-value
      // — d08 was rows-only (xxhash64 inexpressible in DuckDB) until r4.
      // The expensive gram scan runs ONCE: the returned CSV is built from
      // the re-read export, exactly like m01/m02
      exportAndRead(TextStats.fingerprintValues(t(s, d, "documents")), "d08fp")
        .select(col("doc_id"),
          concat_ws(",", col("fp").cast("array<string>")).as("fingerprint"))
    }),
    "d09_dedup_clusters" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.clusters(docs, Dedup.minhashPairs(docs, threshold = 0.8))
    }),
    "d10_decontaminate" -> ((s, d) => {
      // benchmark decontamination: docs with doc_id % 50 == 0 play the
      // held-out evaluation set; everything else is training data
      val docs = t(s, d, "documents")
      Dedup.decontaminate(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0), ngram = 5)
    }),
    "d11_repetition" -> ((s, d) => TextStats.repetition(t(s, d, "documents"))),
    "d12_pii" -> ((s, d) => {
      // PII scrubbing — the standard pre-training hygiene stage: per
      // finished doc, per-category match counts + redacted length over the
      // EXTRACTED text (the corpus plants emails/phones/IPs in article
      // paragraphs). The text itself is exported and both engines compute
      // the stats from it independently with identical RE2-compatible
      // patterns — a real value check of the whole scrubbing op.
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      val texts = exportAndRead(out.toDF()
        .where(col("status") === "finished")
        .select(col("url"), col("text").cast("string").as("text")), "d12text")
      TextStats.piiStats(texts, idCol = "url", textCol = "text")
    }),
    "d14_para_dedup" -> ((s, d) => {
      // passage-granularity dedup (FineWeb-style line-level dedup): strip
      // paragraphs occurring in >2 distinct extracted docs (the corpus
      // plants fixed in-article disclaimers that page-level boilerplate
      // removal correctly keeps). The extracted texts are exported and
      // DuckDB independently re-derives hot paragraphs, removal AND the
      // reassembled per-doc text — full-string compared.
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      val texts = exportOrMaterialize(out.toDF()
        .where(col("status") === "finished")
        .select(col("url"), col("text").cast("string").as("text")), "d14text")
      Dedup.stripRepeatedParagraphs(texts, idCol = "url", textCol = "text",
        maxDocs = 2)
    }),
    "d16_token_budget" -> ((s, d) => {
      // token-budgeted mix selection: per lang (the demo group — real
      // mixes group by registered domain or (lang, source); see Mix docs),
      // keep the doc_id-ordered prefix until 50k whitespace tokens. The
      // inclusive running sum is part of the output so DuckDB re-derives
      // selection AND accounting.
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.ops.Mix.tokenBudgetPerGroup(docs, col("lang"),
          Seq(col("doc_id")), col("n_tokens"), budget = 50000L)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("running_tokens"))
    }),
    "d15_url_canon" -> ((s, d) => {
      // URL canonicalization (the C4-style pre-dedup normalization): both
      // engines derive the SAME six messy variants of every corpus url
      // (identity, fragment anchor, uppercased scheme://host, explicit
      // default port, trailing slash, query string) and canonicalize them
      // with the same RE2-compatible rule chain — every variant row
      // value-compared.
      val p = pages(s, d).select(col("url"))
      val variants = p.select(explode(array(
        col("url"),
        concat(col("url"), lit("#Section-2")),
        concat(lit("HTTPS://"), expr("substring(url, 9)")),
        regexp_replace(col("url"), "^https://([^/]+)", "https://$1:443"),
        concat(col("url"), lit("/")),
        // query string: case and internal slashes must survive untouched
        concat(col("url"), lit("?Q=Mixed/Case/")))).as("u"))
      variants.select(col("u"),
        graft.ops.Urls.canonicalize(col("u")).as("canon"))
    }),
    "d17_corpus_lang" -> ((s, d) => {
      // the widened 22-language ID + language-aware stopword ratio over
      // EXTRACTED corpus text — d03/d04's operators on real multilingual
      // extraction output (the c14 corpus plants ru/el/zh docs, incl. a
      // script-scored language with no whitespace tokens). Per-doc text
      // is exported; DuckDB re-derives the full generated argmax chain
      // from the same tables.
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      val texts = exportAndRead(out.toDF()
        .where(col("status") === "finished")
        .select(col("url"), col("text").cast("string").as("text")), "d17text")
      texts.select(col("url"),
        TextStats.langGuess(col("text")).as("lang_guess"),
        round(TextStats.stopwordRatio(col("text")), 4).as("stopword_ratio"))
    }),
    "d18_holdout_split" -> ((s, d) => {
      // deterministic train/validation/test holdout: membership is a pure
      // function of (salt, doc_id) — stable under corpus growth, uniform
      // within any subpopulation (stratified without a per-group pass).
      // Per-doc assignment value-compared; the oracle CASE thresholds are
      // GENERATED from the same fractions (Mix.holdoutSplitSql).
      graft.ops.Mix.holdoutSplit(
          t(s, d, "documents").select(col("doc_id"), col("lang")),
          col("doc_id"), testFrac = 0.1, valFrac = 0.1)
        .select(col("doc_id"), col("lang"), col("bucket"), col("split"))
    }),
    "d19_dup_windows" -> ((s, d) =>
      // exact-substring dedup signal (Lee et al. ACL 2022): per doc, how
      // many of its 20-token sliding windows repeat in other docs. The
      // engine groups 128-bit window hashes; DuckDB independently groups
      // the window STRINGS — so the check also certifies the hash path
      // against a collision-free formulation.
      Dedup.dupWindowStats(t(s, d, "documents"), k = 20, maxDocs = 1)),
    "d20_dup_excise" -> ((s, d) =>
      // the removal half of exact-substring dedup: cut every cross-doc
      // repeated 20-token span and keep each doc's unique remainder. The
      // oracle re-derives the whole excision over window STRINGS and
      // re-serializes the kept tokens — every output text value-compared.
      Dedup.exciseDupWindows(t(s, d, "documents"), k = 20, maxDocs = 1)),
    "d21_hash_sample" -> ((s, d) =>
      // deterministic mix reweighting: keep 50% of en, 25% of de, all of
      // zh, 10% of everything else — membership a pure hash of the doc id
      // (run/partitioning/growth stable). Exercises all three predicate
      // paths: threshold compare, keep-all (frac >= 1), and the default.
      // The oracle CASE is GENERATED from the same fraction table.
      graft.ops.Mix.hashSample(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        D21Fractions, default = 0.1)),
    "d13_domains" -> ((s, d) => {
      // URL/domain curation over the crawl METADATA (no payload reads):
      // per registered domain — doc count, distinct urls, survivors of a
      // 25-doc-per-domain balancing cap, the max url of the KEPT set (the
      // order-sensitive column that makes the earliest-crawl cap ordering
      // oracle-observable), and the blocklist flag. DuckDB re-derives
      // everything from the same pages parquet with identical regexes.
      graft.ops.Urls.domainStats(pages(s, d), urlCol = "url",
          tsCol = "warc_ts", cap = 25, block = Seq("example-3.test"))
        .orderBy("domain")
    }),
    // ------------------------------------------------ similarity
    "e01_cosine_topk" -> ((s, d) =>
      Similarity.cosineTopK(t(s, d, "embeddings"), col("vec_id") < 20, k = 5)),
    "e02_ann_lsh" -> ((s, d) =>
      Similarity.annLsh(t(s, d, "embeddings"), col("vec_id") < 20, k = 5)),
    "e03_embedding_neardup" -> ((s, d) =>
      Similarity.cosineNearDupPairs(t(s, d, "embeddings"), threshold = 0.45)),
    "e04_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      // the trained coarse quantizer is exported: the oracle re-derives
      // list assignment, probe selection, candidate scoring AND ranking in
      // DuckDB from ONLY the centroid table — the whole IVF search modulo
      // the k-means training is independently value-checked
      val cents = Similarity.trainCentroids(emb, nlist = 16, dim = 64)
        .map(_.toSeq).toSeq
      import s.implicits._
      exportAndRead(cents.zipWithIndex
        .map { case (c, i) => (i, c) }.toDF("list", "cvec"), "e04cent")
      Similarity.annIvfWith(emb, col("vec_id") < 20, k = 5, cents, nprobe = 4)
    }),
    // ------------------------------------------------ multimodal
    "m01_media_meta" -> ((s, d) => {
      // per-doc header-parse rows (url, mediaType, byteLen, width, height,
      // sampleRate, channels) are exported; the query returns the per-type
      // aggregate, which the static DuckDB SQL independently re-derives
      // from the export — the x01 pattern, turning m01 from rows-only into
      // a real schema+rows+hash check (reference analog: the metadata
      // equality asserts of test_views.py:92)
      val meta = graft.ops.Multimodal.mediaMeta(pages(s, d)).toDF()
      exportAndRead(meta, "m01media")
        .groupBy(col("mediaType"))
        .agg(count(lit(1)).as("docs"),
          sum(col("byteLen")).as("bytes"),
          min(col("width")).as("w_min"), max(col("width")).as("w_max"),
          min(col("height")).as("h_min"), max(col("height")).as("h_max"),
          max(col("sampleRate")).as("rate_max"), max(col("channels")).as("ch_max"))
        .orderBy("mediaType")
    }),
    "m02_media_features" -> ((s, d) => {
      // same export-oracle pattern over the stub-decode feature rows
      val f = graft.ops.Multimodal.mediaFeatures(pages(s, d)).toDF()
        .select(col("url"), col("mediaType"), col("frames"),
          size(col("feature")).as("dim"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
      exportAndRead(f, "m02feat")
        .groupBy(col("mediaType"))
        .agg(count(lit(1)).as("docs"),
          sum(col("frames")).as("frames_total"),
          min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
          round(min(col("f0")), 4).as("f0_min"),
          round(max(col("f0")), 4).as("f0_max"))
        .orderBy("mediaType")
    }),
    // ------------------------------------------------ extraction
    "x01_extract_status_counts" -> ((s, d) => {
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      out.groupBy(col("status"), col("mimeType"))
        .agg(count(lit(1)).as("docs"), sum(col("textBytes")).as("bytes"))
        .orderBy("status", "mimeType")
    }),
    "x02_extract_docs" -> ((s, d) => {
      // per-doc rows are ALSO exported to the fixed path: x01's and x06's
      // oracles re-aggregate this export in DuckDB (real value checks over
      // the engine's own rows — extraction itself is golden-gated)
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      exportAndRead(out.select(col("url"), col("status"), col("mimeType"),
        col("detectedKind"), col("pdfVersion"), col("textBytes"),
        size(col("spans")).as("n_spans"), size(col("attachments")).as("n_atts"),
        xxhash64(col("text")).as("text_hash")), "x02docs") // unsorted per-doc output
    }),
    "x05_attachment_policy" -> ((s, d) => {
      // nested-data filter policy (A15, utils.py:464-507): per target
      // PDF/A version, filter the attachments array in place (codegen'd
      // HOF, no explode). ONE pipeline pass computes all three policies
      // as columns of one aggregate; the per-version rows are unpivoted
      // from literals afterward (a union of three aggregates would replay
      // the whole extraction per branch — Spark shares exchanges, not
      // arbitrary subplans).
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
        .toDF()
        .where(size(col("attachments")) > 0)
      val perDoc = exportAndRead(out.select(
          size(col("attachments")).as("n_in"),
          size(graft.ops.Attachments.applyPolicy(col("attachments"), "1")).as("k1"),
          size(graft.ops.Attachments.applyPolicy(col("attachments"), "2")).as("k2")),
        "x05atts") // oracle re-aggregates the exported per-doc policy counts
      val agg = perDoc
        .agg(count(lit(1)).as("docs_with_atts"), sum(col("n_in")).as("atts_in"),
          sum(col("k1")).as("kept1"), sum(col("k2")).as("kept2"))
      agg.select(explode(array(
          struct(lit("1").as("pdf_version"), col("docs_with_atts"),
            col("atts_in"), col("kept1").as("atts_kept")),
          struct(lit("2").as("pdf_version"), col("docs_with_atts"),
            col("atts_in"), col("kept2").as("atts_kept")),
          struct(lit("3").as("pdf_version"), col("docs_with_atts"),
            col("atts_in"), col("atts_in").as("atts_kept")))).as("r"))
        .select(col("r.pdf_version"), col("r.docs_with_atts"),
          col("r.atts_in"), col("r.atts_kept"))
        .orderBy("pdf_version")
    }),
    "x04_span_kinds" -> ((s, d) => {
      // fan-out + regroup (thumbnail fan-out analog, tasks.py:186-201):
      // explode the per-doc span array, aggregate per kind, collect samples
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      val spansDf = out.select(col("url"), explode(col("spans")).as("span"))
        .select(col("url"), col("span.kind").as("kind"),
          (col("span.end") - col("span.start")).as("len"))
      // exported exploded rows: the oracle re-runs this aggregation in DuckDB
      exportAndRead(spansDf, "x04spans")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("len")).as("bytes"),
          // stringified: array-typed output crashes the driver's pandas
          // comparer (unhashable numpy.ndarray in sort_values) — r1 bug
          concat_ws(",", slice(sort_array(collect_list(col("url"))), 1, 3))
            .as("sample_urls"))
        .orderBy("kind")
    }),
    "x06_warc_ingest" -> ((s, d) => {
      // the Common-Crawl path end-to-end: pages -> WARC archives (cached
      // per corpus version) -> Ingest.fromWarc -> extract -> status counts.
      // Must agree with x01's counts row-for-row on the same corpus slice.
      val sf = "sf([0-9.]+)".r.findFirstMatchIn(d).map(_.group(1).toDouble).getOrElse(0.01)
      val rows = math.min(2000L, math.max(200L, (sf * 100000).toLong))
      val dir = java.nio.file.Paths.get(
        s"/tmp/graft-warc/${graft.corpus.PagesGen.CorpusVersion}-rows-$rows")
      if (!java.nio.file.Files.exists(dir)) {
        // concurrent-driver safe (e.g. Bench + Verify): generate into a
        // process-unique temp dir, then ATOMIC_MOVE into the versioned
        // cache path — a reader can never observe a half-written archive.
        // Losing the rename race means another driver finished first: use
        // theirs (content is a pure fn of the corpus version).
        java.nio.file.Files.createDirectories(dir.getParent)
        val tmp = java.nio.file.Files.createTempDirectory(
          dir.getParent, s".gen-${dir.getFileName}-")
        val ps = (0L until rows).map(graft.corpus.PagesGen.page)
        val (a, b) = ps.splitAt(ps.length / 2)
        java.nio.file.Files.write(tmp.resolve("part-0.warc"),
          graft.corpus.WarcGen.build(a))
        java.nio.file.Files.write(tmp.resolve("part-1.warc.gz"),
          graft.corpus.WarcGen.build(b, gzip = true))
        try java.nio.file.Files.move(tmp, dir,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException |
               _: java.nio.file.FileSystemException =>
            // lost the race: discard our copy
            java.nio.file.Files.deleteIfExists(tmp.resolve("part-0.warc"))
            java.nio.file.Files.deleteIfExists(tmp.resolve("part-1.warc.gz"))
            java.nio.file.Files.deleteIfExists(tmp)
        }
      }
      val ingested = graft.sources.Ingest.fromWarc(s, dir.toString)
      ExtractPipeline.run(ingested, ExtractPipeline.Config(partitions = 32))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("docs"), sum(col("textBytes")).as("bytes"))
        .orderBy("status")
    }),
    "x03_pages_dedup" -> ((s, d) => {
      val p = pages(s, d)
      val deduped = ExtractPipeline.dedupLatest(p)
      p.agg(count(lit(1)).as("raw_rows")).crossJoin(
        deduped.agg(count(lit(1)).as("unique_urls")))
    }),
    "x07_thumbnails" -> ((s, d) => {
      // thumbnail artifact fan-out (A21, utils.py:99-115): one real 16x12
      // PNG per finished doc; per-doc rows exported, aggregate oracle-checked
      val out = ExtractPipeline.run(pages(s, d), ExtractPipeline.Config(partitions = 32))
      val thumbs = graft.ops.Thumbnails.generate(out, 16, 12)
        .select(col("url"), col("width"), col("height"),
          length(col("png")).as("png_bytes"))
      exportAndRead(thumbs, "x07thumbs")
        .agg(count(lit(1)).as("docs"),
          min(col("width")).as("w_min"), max(col("width")).as("w_max"),
          min(col("height")).as("h_min"), max(col("height")).as("h_max"),
          sum(col("png_bytes")).as("png_bytes_total"))
    }),
  )

  /** DuckDB-equivalent SQL per query (omitted for ops DuckDB cannot express
    * engine-identically: hash-based signatures, the extraction pipeline). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_topk_revenue" ->
      """SELECT c_custkey, c_name, ROUND(CAST(rev_d AS DOUBLE), 4) AS revenue
        |FROM (SELECT c_custkey, c_name,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS rev_d
        | FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        | GROUP BY 1, 2 ORDER BY rev_d DESC, c_custkey LIMIT 10)
        |ORDER BY rev_d DESC, c_custkey""".stripMargin,
    "q03_region_rollup" ->
      """SELECT COALESCE(r_name, '_ALL_') AS region, COALESCE(n_name, '_ALL_') AS nation,
        | COUNT(*) AS n_cust,
        | ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,
    "q04_semi_anti" ->
      """SELECT
        | (SELECT COUNT(*) FROM customer c WHERE EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
        | (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin,
    "q05_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q06_sessionize" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CASE WHEN prev_us IS NOT NULL
        |          AND epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions
        |FROM (SELECT user_id, ts,
        |        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q07_setops" ->
      """SELECT
        | (SELECT COUNT(*) FROM (SELECT c_custkey AS k FROM customer
        |    UNION SELECT DISTINCT o_custkey FROM orders)) AS n_union,
        | (SELECT COUNT(*) FROM (SELECT c_custkey AS k FROM customer
        |    INTERSECT SELECT DISTINCT o_custkey FROM orders)) AS n_intersect,
        | (SELECT COUNT(*) FROM (SELECT c_custkey AS k FROM customer
        |    EXCEPT SELECT DISTINCT o_custkey FROM orders)) AS n_except""".stripMargin,
    "q08_string_funcs" ->
      """SELECT regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
        | UPPER(SUBSTRING(o_orderstatus, 1, 1)) AS status_u,
        | COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q09_datetime" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | COUNT(*) AS n,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q10_arrays" ->
      """SELECT vec_id, len(embedding) AS dim,
        | ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        | CAST(label AS INT) AS label
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q11_cube" ->
      """SELECT COALESCE(event_type, '_ALL_') AS etype,
        | COALESCE(user_id % 10, -1) AS umod, COUNT(*) AS n,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE), 4) AS sum_value
        |FROM events GROUP BY CUBE(event_type, user_id % 10)
        |ORDER BY 1, 2""".stripMargin,
    "q12_percentiles" ->
      """SELECT l_returnflag,
        | ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        | ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        | ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_json" ->
      """WITH j AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT k % 5 AS k_mod, COUNT(*) AS n, MIN(k) AS k_min, MAX(k) AS k_max
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY 1""".stripMargin,
    "d02_token_stats" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), ' +')) AS n_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_subwords,
        | LENGTH(text) AS n_chars_m,
        | ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
        |   / len(string_split_regex(trim(text), ' +')), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // language-aware quality: the stopword ratio is scored against the
    // argmax language's signal — the SAME argmax as d04 over all 22
    // languages (19 stoplists + 3 script-char scores; tie-break: score
    // desc then lang asc), with the all-zero case falling back to the
    // English list. The score columns, the pick CASE and the per-language
    // ratio CASE are all GENERATED from the one Scala table
    // (TextStats.StopLists/ScriptLangs) so the two engines cannot drift.
    "d03_quality" ->
      s"""WITH base AS (
         | SELECT doc_id, text,
         |  string_split_regex(trim(lower(text)), ' +') AS toks,
         |  LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
         |  LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS digits
         | FROM documents),
         |sc AS (
         | SELECT *, ${graft.ops.TextStats.langScoresSql("toks", "text")}
         | FROM base),
         |pick AS (
         | SELECT *, ${graft.ops.TextStats.langPickSql(graft.ops.TextStats.langMaxSql)} AS lang_pick
         | FROM sc),
         |r AS (
         | SELECT doc_id,
         |  ${graft.ops.TextStats.stopwordRatioSql("lang_pick", "toks", "text")} AS sr,
         |  CAST(punct AS DOUBLE) / LENGTH(text) AS pr,
         |  CAST(digits AS DOUBLE) / LENGTH(text) AS dr,
         |  len(toks) AS nt, LENGTH(text) AS lt
         | FROM pick)
         |SELECT doc_id, ROUND(sr, 4) AS stopword_ratio, ROUND(pr, 4) AS punct_ratio,
         | ROUND(dr, 4) AS digit_ratio,
         | CASE WHEN lt = 0 THEN 0.0
         |   ELSE ROUND(0.5 * sr + 0.3 * (1.0 - pr) + 0.2 * LEAST(1.0, CAST(nt AS DOUBLE) / 100.0), 4)
         | END AS quality_score
         |FROM r ORDER BY doc_id""".stripMargin,
    "d04_lang_id" ->
      s"""WITH s AS (
         | SELECT doc_id, lang, text,
         |  string_split_regex(trim(lower(text)), ' +') AS toks
         | FROM documents),
         |sc AS (
         | SELECT *, ${graft.ops.TextStats.langScoresSql("toks", "text")}
         | FROM s)
         |SELECT doc_id, lang AS lang_tag,
         | ${graft.ops.TextStats.langPickSql(graft.ops.TextStats.langMaxSql)} AS lang_guess
         |FROM sc ORDER BY doc_id""".stripMargin,
    // d05's oracle is the BRUTE-FORCE pair enumeration: on corpora where
    // every true pair shares a band (planted near-dups at j≈0.97 — recall
    // verified total in OpsSpec), LSH+verify must equal brute force
    // value-for-value, which DuckDB can express. This checks the whole
    // shingle->minhash->band->verify chain, not just the verify step.
    "d05_minhash_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
        |   for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS g FROM toks)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        | ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.g, b.g))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.g, b.g))), 4) >= 0.8
        |ORDER BY a, b""".stripMargin,
    "d06_jaccard_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
        |   for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS g FROM toks)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        | ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.g, b.g))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.g, b.g))), 4) >= 0.8
        |ORDER BY a, b""".stripMargin,
    "e01_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
        |scored AS (
        | SELECT q.qid, e.vec_id AS nid,
        |  ROUND(list_cosine_similarity(
        |    CAST(q.qvec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS cos
        | FROM q JOIN embeddings e ON e.vec_id <> q.qid),
        |ranked AS (
        | SELECT qid, nid, cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        | FROM scored)
        |SELECT qid AS query_id, rank, nid AS neighbor_id, cos
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "e03_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT x.vec_id AS a, y.vec_id AS b,
        | ROUND(list_cosine_similarity(x.v, y.v), 4) AS cos
        |FROM e x JOIN e y ON x.vec_id < y.vec_id
        |WHERE ROUND(list_cosine_similarity(x.v, y.v), 4) >= 0.45
        |ORDER BY a, b""".stripMargin,
    // passage dedup: DuckDB re-derives hot paragraphs (>2 distinct docs),
    // strips them, and reassembles each doc's text in paragraph order
    // (string_agg ORDER BY pos) — compared full-string against the
    // engine's reassembly. Paired unnests zip positionally in DuckDB.
    "d14_para_dedup" ->
      s"""WITH t AS (SELECT url, text FROM read_parquet('$ExportRoot/d14text/*.parquet')),
         |p AS (SELECT url, unnest(ls) AS para,
         |        unnest(range(1, len(ls) + 1)) AS pos
         |      FROM (SELECT url, string_split(text, chr(10)) AS ls FROM t)),
         |hot AS (SELECT para FROM (SELECT para, COUNT(DISTINCT url) AS nd
         |      FROM p WHERE para <> '' GROUP BY 1) WHERE nd > 2),
         |kept AS (SELECT * FROM p ANTI JOIN hot USING (para)),
         |rebuilt AS (SELECT url, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |        string_agg(para, chr(10) ORDER BY pos) AS text
         |      FROM kept GROUP BY url)
         |SELECT t.url, len(string_split(t.text, chr(10))) AS n_paras,
         | COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.text, '') AS text
         |FROM t LEFT JOIN rebuilt r ON t.url = r.url
         |ORDER BY t.url""".stripMargin,
    // domain curation: DuckDB recomputes registered domains via the FULL
    // generated PSL chain (exception > wildcard > ccSLD > last-two — the
    // same rule tables as the engine, rendered to SQL by
    // Urls.registeredDomainSql), the per-domain cap via ROW_NUMBER in the
    // same (warc_ts, url) order, and the blocklist flag from the pages
    // cache
    "d13_domains" ->
      s"""WITH h AS (SELECT url, warc_ts,
         |    lower(regexp_extract(url, '${graft.ops.Urls.HostPat}', 1)) AS host
         |  FROM read_parquet('$VerifyPagesGlob')),
         |p AS (SELECT url, warc_ts,
         |    ${graft.ops.Urls.registeredDomainSql("host")} AS domain
         |  FROM h),
         |r AS (SELECT domain, url,
         |        ROW_NUMBER() OVER (PARTITION BY domain ORDER BY warc_ts, url) AS rn
         |      FROM p),
         |k AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS kept,
         |        MIN(url) AS mnk, MAX(url) AS mxk FROM r
         |      WHERE rn <= 25 GROUP BY 1)
         |SELECT p.domain, COUNT(*) AS docs, COUNT(DISTINCT p.url) AS unique_urls,
         | COALESCE(MAX(k.kept), 0) AS kept_after_cap,
         | COALESCE(MAX(k.mnk), '') AS min_kept_url,
         | COALESCE(MAX(k.mxk), '') AS max_kept_url,
         | CAST(p.domain IN ('example-3.test') AS INT) AS is_blocked
         |FROM p LEFT JOIN k USING (domain)
         |GROUP BY p.domain ORDER BY 1""".stripMargin,
    // corpus language ID: DuckDB re-derives the generated 22-language
    // argmax + the language-aware stopword ratio from the exported
    // extracted text — same generated fragments as d03/d04
    "d17_corpus_lang" ->
      s"""WITH t AS (SELECT url, text,
         |  string_split_regex(trim(lower(text)), ' +') AS toks
         | FROM read_parquet('$ExportRoot/d17text/*.parquet')),
         |sc AS (
         | SELECT *, ${graft.ops.TextStats.langScoresSql("toks", "text")}
         | FROM t),
         |pick AS (
         | SELECT *, ${graft.ops.TextStats.langPickSql(graft.ops.TextStats.langMaxSql)} AS lang_guess
         | FROM sc)
         |SELECT url, lang_guess,
         | ROUND(${graft.ops.TextStats.stopwordRatioSql("lang_guess", "toks", "text")}, 4) AS stopword_ratio
         |FROM pick ORDER BY url""".stripMargin,
    // token-budget mix selection: DuckDB re-derives the per-lang running
    // prefix sum (same ROWS frame, same order) and the <=-budget cut
    "d16_token_budget" ->
      """WITH d AS (
        | SELECT doc_id, lang,
        |  CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
        | FROM documents),
        |r AS (
        | SELECT doc_id, lang, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_tokens
        | FROM d)
        |SELECT doc_id, lang, n_tokens, running_tokens
        |FROM r WHERE running_tokens <= 50000 ORDER BY lang, doc_id""".stripMargin,
    // holdout split: the bucket expression and the threshold CASE are
    // generated from the same Mix constants the Spark plan compiles, so
    // the fraction->hex-cut-point arithmetic cannot drift; both engines
    // compare fixed-width lowercase md5 hex lexicographically
    "d18_holdout_split" ->
      s"""SELECT doc_id, lang,
         | ${graft.ops.Mix.holdoutBucketSql("doc_id", "split")} AS bucket,
         | ${graft.ops.Mix.holdoutSplitSql(
               graft.ops.Mix.holdoutBucketSql("doc_id", "split"), 0.1, 0.1)} AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    // repeated-window stats: DuckDB re-derives every 20-token sliding
    // window AS A STRING (same trim/' +'-split tokenization as d02),
    // groups strings where the engine groups 128-bit hashes, and
    // recomputes the per-doc dup counts — a value check of the whole
    // window pipeline AND a collision check of the hash formulation
    "d19_dup_windows" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), ' +') AS tk FROM documents),
        |base AS (
        | SELECT doc_id, tk, greatest(len(tk) - 19, 0) AS nw FROM toks),
        |win AS (
        | SELECT doc_id, array_to_string(tk[i:i+19], ' ') AS w
        | FROM (SELECT doc_id, tk, unnest(generate_series(1, nw)) AS i
        |       FROM base WHERE nw >= 1)),
        |hot AS (
        | SELECT w FROM win GROUP BY w HAVING count(distinct doc_id) > 1),
        |dup AS (
        | SELECT doc_id, count(*) AS n_dup FROM win
        | WHERE w IN (SELECT w FROM hot) GROUP BY doc_id)
        |SELECT b.doc_id,
        | CAST(b.nw AS BIGINT) AS n_windows,
        | CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
        | round(CAST(coalesce(d.n_dup, 0) AS DOUBLE) / nullif(b.nw, 0), 4) AS dup_frac
        |FROM base b LEFT JOIN dup d USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    // span excision: DuckDB re-runs the ENTIRE algorithm over window
    // strings — dup window positions, the distinct covered-token set, and
    // the kept-token re-serialization — so every excised text is
    // value-compared character for character against an independent
    // string-keyed derivation
    "d20_dup_excise" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), ' +') AS tk FROM documents),
        |base AS (
        | SELECT doc_id, tk, len(tk) AS n, greatest(len(tk) - 19, 0) AS nw FROM toks),
        |win AS (
        | SELECT doc_id, i, array_to_string(tk[i:i+19], ' ') AS w
        | FROM (SELECT doc_id, tk, unnest(generate_series(1, nw)) AS i
        |       FROM base WHERE nw >= 1)),
        |hot AS (
        | SELECT w FROM win GROUP BY w HAVING count(distinct doc_id) > 1),
        |dup AS (
        | SELECT doc_id, i FROM win WHERE w IN (SELECT w FROM hot)),
        |cov AS (
        | SELECT DISTINCT doc_id, j FROM (
        |   SELECT doc_id, unnest(generate_series(i, i + 19)) AS j FROM dup)),
        |tokpos AS (
        | SELECT doc_id, j, tk[j] AS tok FROM (
        |   SELECT doc_id, tk, unnest(generate_series(1, n)) AS j FROM base)),
        |kept AS (
        | SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.j) AS text
        | FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.j = c.j
        | WHERE c.j IS NULL GROUP BY t.doc_id),
        |nrem AS (SELECT doc_id, count(*) AS r FROM cov GROUP BY doc_id)
        |SELECT b.doc_id,
        | CAST(b.n AS BIGINT) AS n_tokens,
        | CAST(coalesce(nr.r, 0) AS BIGINT) AS n_removed,
        | coalesce(k2.text, '') AS text
        |FROM base b LEFT JOIN nrem nr USING (doc_id) LEFT JOIN kept k2 USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // hash sampling: the keep CASE (thresholds, keep-all branch, default)
    // is generated from the same D21Fractions table the Spark plan
    // compiles; both engines compare the same md5-prefix bucket
    "d21_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${graft.ops.Mix.hashSampleSql(
             graft.ops.Mix.holdoutBucketSql("doc_id", "sample"),
             "lang", D21Fractions, default = 0.1)}
         |ORDER BY doc_id""".stripMargin,
    // url canonicalization: DuckDB re-derives the same six variants per
    // corpus url and re-runs the same rule chain (strip fragment,
    // lowercase scheme://host, drop default ports, strip trailing
    // slashes; non-URLs unchanged). ALL patterns — frag/port/slash
    // included — are the interpolated shared Urls constants (\z-anchored,
    // see their doc); only the replacement backref literals differ
    // (\1-style in RE2 vs $1 in java.util.regex)
    "d15_url_canon" ->
      s"""WITH p AS (SELECT url FROM read_parquet('$VerifyPagesGlob')),
         |v AS (SELECT unnest([
         |    url,
         |    url || '#Section-2',
         |    'HTTPS://' || substring(url, 9),
         |    regexp_replace(url, '^https://([^/]+)', 'https://\\1:443'),
         |    url || '/',
         |    url || '?Q=Mixed/Case/']) AS u FROM p),
         |x AS (SELECT u,
         |    regexp_extract(regexp_replace(u, '${graft.ops.Urls.FragPat}', ''), '${graft.ops.Urls.PrePat}', 1) AS pre,
         |    regexp_replace(regexp_replace(u, '${graft.ops.Urls.FragPat}', ''), '${graft.ops.Urls.PrePat}', '') AS rest
         |  FROM v)
         |SELECT u,
         | CASE WHEN pre = '' THEN u
         |      ELSE regexp_replace(
         |             regexp_replace(
         |               regexp_replace(lower(pre) || rest,
         |                 '${graft.ops.Urls.PortHttpPat}', '\\1\\2'),
         |               '${graft.ops.Urls.PortHttpsPat}', '\\1\\2'),
         |             '${graft.ops.Urls.SlashPat}', '\\1\\2')
         | END AS canon
         |FROM x ORDER BY u, canon""".stripMargin,
    // PII scrubbing: DuckDB recomputes category counts and the redacted
    // length from the exported extracted text with the SAME patterns
    // (restricted to the java.regex/RE2 common subset) under the same
    // SEQUENTIAL-REDACTION semantics — phones counted on the email-masked
    // text, IPv6 on that, IPv4 on the IPv6-masked text, cards last — so
    // an email's digits never double-count as a phone/IP/card (the exact
    // pass chain the engine's native PiiScan expression runs)
    "d12_pii" ->
      s"""SELECT url,
         | len(regexp_extract_all(text, '${graft.ops.TextStats.EmailPat}')) AS n_emails,
         | len(regexp_extract_all(r1, '${graft.ops.TextStats.PhonePat}')) AS n_phones,
         | len(regexp_extract_all(r3, '${graft.ops.TextStats.Ipv4Pat}')) AS n_ipv4,
         | len(regexp_extract_all(r2, '${graft.ops.TextStats.Ipv6Pat}')) AS n_ipv6,
         | len(regexp_extract_all(r4, '${graft.ops.TextStats.CardPat}')) AS n_card,
         | LENGTH(regexp_replace(r4, '${graft.ops.TextStats.CardPat}',
         |   '${org.apache.spark.sql.graftexpr.PiiScan.CardToken}', 'g')) AS redacted_chars
         |FROM (SELECT url, text, r1, r2, r3,
         |   regexp_replace(r3, '${graft.ops.TextStats.Ipv4Pat}',
         |     '${org.apache.spark.sql.graftexpr.PiiScan.IpToken}', 'g') AS r4
         | FROM (SELECT url, text, r1, r2,
         |    regexp_replace(r2, '${graft.ops.TextStats.Ipv6Pat}',
         |      '${org.apache.spark.sql.graftexpr.PiiScan.Ipv6Token}', 'g') AS r3
         |  FROM (SELECT url, text, r1,
         |     regexp_replace(r1, '${graft.ops.TextStats.PhonePat}',
         |       '${org.apache.spark.sql.graftexpr.PiiScan.PhoneToken}', 'g') AS r2
         |   FROM (SELECT url, text,
         |      regexp_replace(text, '${graft.ops.TextStats.EmailPat}',
         |        '${org.apache.spark.sql.graftexpr.PiiScan.EmailToken}', 'g') AS r1
         |    FROM read_parquet('$ExportRoot/d12text/*.parquet')))))
         |ORDER BY url""".stripMargin,
    // sign-LSH ANN: the seeded hyperplanes are a PURE function (no data),
    // so they are baked into the SQL as literals and DuckDB recomputes the
    // whole search independently — bucketing, candidate join, scoring,
    // ranking. Any drift in plane generation, bucket packing or top-k
    // tie-breaks goes hash-red.
    "e02_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ${e02Bucket("v")} AS bucket FROM e),
         |s AS (SELECT q.vec_id AS qid, n.vec_id AS nid, q.bucket AS bucket,
         |        ROUND(list_cosine_similarity(q.v, n.v), 4) AS cos
         |      FROM b q JOIN b n ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
         |      WHERE q.vec_id < 20),
         |r AS (SELECT qid, nid, bucket, cos,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |      FROM s)
         |SELECT qid AS query_id, rank, nid AS neighbor_id, cos, bucket
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // IVF ANN: DuckDB re-derives list assignment (argmin centroid distance,
    // ties -> lower list id), the 4 probe lists per query, candidate
    // scoring and ranking from ONLY the exported centroid table.
    "e04_ann_ivf" ->
      s"""WITH c AS (SELECT list, cvec FROM read_parquet('$ExportRoot/e04cent/*.parquet')),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |d AS (SELECT e.vec_id, c.list,
         |        list_distance(e.v, CAST(c.cvec AS DOUBLE[])) AS dist
         |      FROM e CROSS JOIN c),
         |r AS (SELECT vec_id, list,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, list) AS rn
         |      FROM d),
         |assign AS (SELECT vec_id AS nid, list FROM r WHERE rn = 1),
         |probes AS (SELECT vec_id AS qid, list FROM r WHERE rn <= 4 AND vec_id < 20),
         |s AS (SELECT p.qid, a.nid, ROUND(list_cosine_similarity(eq.v, en.v), 4) AS cos
         |      FROM probes p JOIN assign a USING (list)
         |      JOIN e eq ON eq.vec_id = p.qid
         |      JOIN e en ON en.vec_id = a.nid
         |      WHERE a.nid <> p.qid),
         |rk AS (SELECT qid, nid, cos,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |      FROM s)
         |SELECT qid AS query_id, rank, nid AS neighbor_id, cos
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "d10_decontaminate" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |g AS (
        | SELECT doc_id, list_distinct([array_to_string(w[i:i+4], ' ')
        |   for i in range(1, greatest(len(w) - 4, 1) + 1)]) AS gs FROM toks),
        |bench AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 50 = 0),
        |docg AS (SELECT doc_id, unnest(gs) AS gr FROM g WHERE doc_id % 50 <> 0),
        |hits AS (SELECT dg.doc_id, COUNT(*) AS c
        |  FROM docg dg JOIN bench b ON dg.gr = b.gr GROUP BY 1)
        |SELECT t.doc_id, COALESCE(c, 0) AS contaminated_ngrams,
        | CAST(COALESCE(c, 0) > 0 AS INT) AS is_contaminated
        |FROM toks t LEFT JOIN hits USING (doc_id)
        |WHERE t.doc_id % 50 <> 0 ORDER BY 1""".stripMargin,
    "d11_repetition" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
        |b AS (
        | SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct,
        |  CASE WHEN len(ws) >= 2
        |   THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
        |   ELSE [] END AS bg
        | FROM t),
        |e AS (SELECT doc_id, unnest(bg) AS g FROM b),
        |c AS (SELECT doc_id, g, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |m AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
        | ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS dup_word_frac,
        | ROUND(COALESCE(CAST(mx AS DOUBLE) / tot, 0.0), 4) AS top_bigram_frac
        |FROM b LEFT JOIN m ON b.doc_id = m.doc_id ORDER BY 1""".stripMargin,
    // simhash pairs: DuckDB brute-forces ALL pairs over the exported
    // signatures — if the Manku blocking dropped any qualifying pair (or
    // admitted a wrong one), the row sets would differ. hamming is cast to
    // INT to match Spark's bit_count type.
    "d07_simhash_pairs" ->
      s"""WITH s AS (SELECT id, sig FROM read_parquet('$ExportRoot/d07sigs/*.parquet'))
         |SELECT x.id AS a, y.id AS b,
         | CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
         |FROM s x JOIN s y ON x.id < y.id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 3""".stripMargin,
    // dedup clusters: connected components of the d05 near-dup graph,
    // computed in DuckDB with a recursive transitive closure + min-label —
    // an independent implementation of the whole clusters operator.
    // Spark's edges come from LSH candidates, the oracle's from exact
    // all-pairs Jaccard: they agree because the documents table (driver-
    // provided, FIXED — independent of our pages CorpusVersion) plants its
    // near-dups at j≈0.97, where the per-pair band-miss probability is
    // (1-0.97^4)^8 ≈ 3e-8 (same argument as d05's oracle, whose equality
    // the OpsSpec brute-force cross-check also pins)
    "d09_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
        |   for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS g FROM toks),
        |pairs AS (
        | SELECT a.doc_id AS a, b.doc_id AS b
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.g, b.g))), 4) >= 0.8),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(x, y) AS (
        | SELECT doc_id, doc_id FROM documents
        | UNION
        | SELECT r.x, e.b FROM reach r JOIN edges e ON r.y = e.a)
        |SELECT x AS doc_id, MIN(y) AS cluster_id FROM reach GROUP BY x""".stripMargin,
    // winnowing fingerprints: the engine's CSV sketch per doc must equal
    // DuckDB's independent re-assembly (ascending sort + join) of the
    // exported per-doc sketch values — any dropped/extra/unsorted hash in
    // the sketch construction breaks the row hash
    "d08_fingerprint" ->
      s"""SELECT doc_id, array_to_string(list_sort(fp), ',') AS fingerprint
         |FROM read_parquet('$ExportRoot/d08fp/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // multimodal metadata/features: DuckDB re-aggregates the per-doc
    // exports (the x01 pattern); SUMs cast to BIGINT (DuckDB INT128)
    "m01_media_meta" ->
      s"""SELECT "mediaType", COUNT(*) AS docs,
         | CAST(SUM("byteLen") AS BIGINT) AS bytes,
         | MIN(width) AS w_min, MAX(width) AS w_max,
         | MIN(height) AS h_min, MAX(height) AS h_max,
         | MAX("sampleRate") AS rate_max, MAX(channels) AS ch_max
         |FROM read_parquet('$ExportRoot/m01media/*.parquet')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "m02_media_features" ->
      s"""SELECT "mediaType", COUNT(*) AS docs,
         | CAST(SUM(frames) AS BIGINT) AS frames_total,
         | MIN(dim) AS dim_min, MAX(dim) AS dim_max,
         | ROUND(MIN(f0), 4) AS f0_min, ROUND(MAX(f0), 4) AS f0_max
         |FROM read_parquet('$ExportRoot/m02feat/*.parquet')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // ------------------------------------------------ extraction exports
    // The oracle cannot replicate extraction, but it CAN independently
    // re-aggregate the engine's own per-doc exports (fixed paths written by
    // the x02/x04/x05/x07 queries during the same Verify run) — real
    // schema+rows+hash checks for the aggregation layer. SUMs are cast to
    // BIGINT (DuckDB SUM(int) -> INT128 -> float64 in pandas otherwise).
    "x01_extract_status_counts" ->
      s"""SELECT status, "mimeType", COUNT(*) AS docs,
         | CAST(SUM("textBytes") AS BIGINT) AS bytes
         |FROM read_parquet('$ExportRoot/x02docs/*.parquet')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x06_warc_ingest" -> // WARC-path counts MUST equal the parquet path's
      s"""SELECT status, COUNT(*) AS docs,
         | CAST(SUM("textBytes") AS BIGINT) AS bytes
         |FROM read_parquet('$ExportRoot/x02docs/*.parquet')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // pages-cache path pinned via VerifyPagesGlob (see its doc)
    "x03_pages_dedup" ->
      s"""SELECT
         | (SELECT COUNT(*) FROM read_parquet('$VerifyPagesGlob')) AS raw_rows,
         | (SELECT COUNT(DISTINCT url) FROM read_parquet('$VerifyPagesGlob')) AS unique_urls""".stripMargin,
    "x04_span_kinds" ->
      s"""SELECT kind, COUNT(*) AS n, CAST(SUM(len) AS BIGINT) AS bytes,
         | array_to_string(list_sort(list(url))[1:3], ',') AS sample_urls
         |FROM read_parquet('$ExportRoot/x04spans/*.parquet')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x05_attachment_policy" ->
      s"""WITH a AS (SELECT COUNT(*) AS d, CAST(SUM(n_in) AS BIGINT) AS ai,
         |  CAST(SUM(k1) AS BIGINT) AS kk1, CAST(SUM(k2) AS BIGINT) AS kk2
         | FROM read_parquet('$ExportRoot/x05atts/*.parquet'))
         |SELECT '1' AS pdf_version, d AS docs_with_atts, ai AS atts_in, kk1 AS atts_kept FROM a
         |UNION ALL SELECT '2', d, ai, kk2 FROM a
         |UNION ALL SELECT '3', d, ai, ai FROM a
         |ORDER BY 1""".stripMargin,
    "x07_thumbnails" ->
      s"""SELECT COUNT(*) AS docs, MIN(width) AS w_min, MAX(width) AS w_max,
         | MIN(height) AS h_min, MAX(height) AS h_max,
         | CAST(SUM(png_bytes) AS BIGINT) AS png_bytes_total
         |FROM read_parquet('$ExportRoot/x07thumbs/*.parquet')""".stripMargin,
  )
}
