package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Num

/** Structured-Streaming variants of the event-time operators
  * (SURVEY.md §2 I3). Each transform takes a DataFrame/Dataset and
  * returns one, so the same code runs on `spark.read` (batch backfill)
  * and `spark.readStream` (live) — the Spark-native replacement for
  * the reference's one-shot import→transform pipeline runs.
  */
object StreamOps {

  /** Streaming point-in-ring-set tagging (geofence enrichment): each
    * streaming point row joins the STATIC ring-set dimension through
    * the same cell blocking + exact multi-ring even-odd test as the
    * batch [[graft.operators.Geo.pointInRingSet]] — shared code, so
    * stream and batch agree row-for-row (StreamingSpec parity). Every
    * step is stateless per row (cell key, broadcast stream-static
    * join, codegen'd crossing test): append-mode, no watermark, no
    * state store — the shape that holds at any stream rate. */
  def geoTagStream(
      points: DataFrame, rings: DataFrame,
      lonCol: String, latCol: String, featureKey: String,
      xsCol: String, ysCol: String, cellDeg: Double = 5.0): DataFrame =
    graft.operators.Geo.tagPointsInRingSet(
      points, rings, lonCol, latCol, featureKey, xsCol, ysCol, cellDeg)

  /** Streaming semantic-cluster tagging: each streaming embedding row
    * is assigned its fixed-point k-means cell by the same codegen'd
    * expression as the batch path
    * ([[graft.functions.QuantNearestCell]]), against a codebook FIT
    * OFFLINE with [[graft.operators.Clustering.kmeansCodebook]] — the
    * train-offline / serve-online split. Map-only and stateless: the
    * codebook rides into every task as a referenced `long[][]`
    * (append-mode, no watermark, no state store, no join) — the shape
    * that holds at any stream rate. Batch/stream parity is
    * spec-asserted (shared expression ⇒ row-for-row identical). */
  def clusterTagStream(
      df: DataFrame, vecCol: String,
      codebook: Array[Array[Long]],
      scale: Double = graft.operators.Clustering.DefaultScale): DataFrame =
    df.withColumn("cell",
      graft.functions.GraftFunctions.quant_nearest_cell(col(vecCol), codebook, scale))

  /** Streaming DSIR importance tagging: score an unbounded document
    * stream against an OFFLINE-FITTED bucket-ratio table (the
    * [[graft.operators.Importance.resample]] fit — train offline,
    * serve online, the I9 pattern). The ≤4096-row ratio table folds
    * into a literal map, so the per-doc weight
    * `Σ_gram q(bucket(gram))` is ONE in-row fold over the gram array —
    * no explode, no per-doc aggregation state, no join: stateless
    * append mode at any stream rate. Grams hashing to buckets unseen
    * in the fit score `defaultQ` (the add-half-smoothed empty-bucket
    * ratio — in-fit replays never hit it). The keep decision is the
    * batch operator's exact integer arithmetic verbatim; batch/stream
    * parity is spec-asserted. */
  def importanceTagStream(
      docs: DataFrame, idCol: String, textCol: String,
      ratios: Map[Int, Long], defaultQ: Long, cap: Long,
      buckets: Int = 64): DataFrame = {
    require(ratios.size <= 4096,
      s"importanceTagStream: ratio table has ${ratios.size} buckets (> 4096)")
    require(cap >= 1 && cap <= (1L << 31),
      s"importanceTagStream: need 1 <= cap <= 2^31, got $cap")
    val rmap =
      if (ratios.isEmpty) map()
      else map(ratios.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val toks = split(col(textCol), " ")
    val grams = graft.functions.HashFunctions.string_ngrams(toks, 2)
    val w = aggregate(grams, lit(0L), (acc, g) =>
      acc + coalesce(
        element_at(rmap, graft.operators.Importance.hashedBucket(g, buckets)),
        lit(defaultQ)))
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    docs.where(size(toks) >= 2)
      .select(col(idCol), w.as("weight"))
      .select(col(idCol), col("weight"),
        when(col("weight") >= cap, lit(true))
          .otherwise(u * lit(cap) < col("weight") * lit(1L << 32)).as("kept"))
  }

  /** Streaming learned-quality scorer: the Q18 classifier's FITTED
    * integer weights served on an unbounded document stream through
    * the SAME stateless scoring expression as the batch operator
    * ([[graft.operators.Classifier.scoreExpr]] — tokenize, md5-bucket,
    * distinct, one in-row fold against the weight-array literal: no
    * explode, no join, no state store, append mode at any rate).
    * Train offline, serve online — the I12 pattern applied to the
    * learned filter; batch/stream parity holds by shared expression
    * and is spec-asserted. */
  def qualityClassifierStream(
      docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Long], buckets: Int): DataFrame = {
    require(weights.length == buckets + 1,
      s"qualityClassifierStream: need ${buckets + 1} weights (incl. bias), " +
        s"got ${weights.length}")
    val m = graft.operators.Classifier.scoreExpr(col(textCol), weights, buckets)
    val p = graft.operators.Classifier.probS(col("margin"))
    docs.select(col(idCol), m.as("margin"))
      .select(col(idCol), col("margin"), p.as("score"),
        (p * lit(2L) >= lit(graft.operators.Classifier.S)).as("kept"))
  }

  /** Streaming learned language ID: the L18 one-vs-rest classifier's
    * FITTED integer weights served on an unbounded stream — char-gram
    * buckets projected ONCE per row, then the SAME argmax expression
    * as the batch server ([[graft.operators.Classifier.langBestExpr]]).
    * Train offline, serve online (the I12/I13 fitted-literal posture);
    * stateless append mode, batch/stream parity spec-asserted. */
  def langIdStream(
      docs: DataFrame, idCol: String, textCol: String,
      langs: Seq[String], weights: Seq[Array[Long]],
      buckets: Int, gramN: Int = 3): DataFrame = {
    val c = graft.operators.Classifier
    docs
      .select(col(idCol),
        c.charGramBuckets(col(textCol), buckets, gramN).as("__barr"))
      .select(col(idCol), c.langBestExpr(col("__barr"), langs, weights).as("__b"))
      .select(col(idCol),
        col("__b.lang_pred").as("lang_pred"), col("__b.margin").as("margin"))
  }

  /** Streaming HTML → text extraction: the L9 WET stage applied to a
    * live crawl stream through the SAME pure column algebra as the
    * batch operator ([[graft.operators.Html.htmlExtract]] — regexes,
    * entity chain, integer link-density cut). Stateless map-only
    * append mode (no watermark, no state store, no join), so raw HTML
    * never lands in the lake — only extracted text plus extraction
    * stats. Batch/stream parity is spec-asserted (shared code ⇒
    * row-for-row identical). */
  def htmlExtractStream(
      docs: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 3): DataFrame =
    graft.operators.Html.htmlExtract(docs, idCol, htmlCol, minWords)

  /** Streaming curation scrub: PII redaction + quality signals over
    * an unbounded document stream, via the SAME pure column
    * expressions as the batch operators
    * ([[graft.operators.Curation.piiScrub]] regexes,
    * [[graft.functions.RepetitionStats]]) — stateless per row
    * (append-mode, no watermark, no state store, no join): the
    * live-ingest hygiene pass in front of a training-data lake, at
    * any stream rate. Batch/stream parity is spec-asserted (shared
    * code ⇒ row-for-row identical). */
  def curationScrubStream(
      docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(String, String, String)]): DataFrame = {
    val scrubbed = graft.operators.Curation.piiScrubUnordered(
      docs, idCol, textCol, patterns)
    scrubbed.withColumn("n_words",
      graft.functions.HashFunctions.repetition_stats(
        split(col("scrubbed"), " ")).getField("n_words"))
  }

  /** Streaming Gopher quality gate: the Q15 keep decision applied to
    * an unbounded document stream through the SAME single-pass
    * codegen'd predicate as the batch operator
    * ([[graft.functions.GopherKeep]] — one stats pass per row, no
    * regex, no state). Stateless append-mode filter: survivors flow
    * through with their signal columns, at any stream rate.
    * Batch/stream parity is spec-asserted (shared expression ⇒
    * row-for-row identical keep decisions). */
  def qualityFilterStream(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int, minDistinctFrac: Double, maxTopShare: Double): DataFrame = {
    val st = graft.functions.HashFunctions.repetition_stats(
      split(col(textCol), " "))
    val n = st.getField("n_words")
    docs
      .where(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.GopherKeep(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            split(col(textCol), " ")),
          minWords, minDistinctFrac, maxTopShare)))
      .select(col(idCol),
        n.as("n_words"),
        (st.getField("n_distinct").cast("double") / n).as("distinct_word_frac"),
        (st.getField("top_word").cast("double") / n).as("top_word_share"))
  }

  /** Watermarked tumbling-window aggregation: late events beyond
    * `watermarkDur` are dropped and window state is bounded — the
    * property that keeps an unbounded 100 TB/day stream in fixed
    * executor memory. */
  def windowedAggregate(
      df: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermarkDur: String, aggs: Seq[Column]): DataFrame =
    graft.operators.Events.tumblingWindowAggregate(
      df.withWatermark(tsCol, watermarkDur), tsCol, keyCol, windowDur, aggs)

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserAgg(user_id: Long, n_events: Long, value_sum: Double)

  /** Running per-user aggregate via `mapGroupsWithState` — the custom
    * keyed-state primitive (niamoto's per-entity incremental stats,
    * unbounded-stream edition). State is one tiny struct per user. */
  def runningUserAgg(ds: Dataset[UserEvent]): Dataset[UserAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[UserEvent], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0))
          val next = events.foldLeft(prev) { (a, e) =>
            UserAgg(user, a.n_events + 1L, a.value_sum + e.value)
          }
          state.update(next)
          next
      }
  }

  /** Streaming windowed event counts with an exact decimal value sum —
    * the wiring used by the StreamingSpec and any readStream caller. */
  def eventCounts(df: DataFrame): DataFrame =
    windowedAggregate(
      df, "ts", "event_type", "1 hour", "10 minutes",
      Seq(Num.dsum(col("value")).as("value_sum")))

  /** Stream-stream interval join: enrich an event stream with a state
    * stream's rows whose timestamp falls within `[eventTs −
    * boundSeconds, eventTs]` for the same key — the streaming bounded
    * as-of shape. Both sides carry watermarks, so Spark bounds the
    * join state buffers (each side evicts rows older than watermark +
    * bound) — the property that keeps two unbounded 100 TB streams
    * joinable in fixed memory. Column names must be disjoint except
    * for the shared key. */
  def intervalStreamJoin(
      events: DataFrame, states: DataFrame, keyCol: String,
      eventTsCol: String, stateTsCol: String,
      watermarkDelay: String, boundSeconds: Long): DataFrame =
    events.withWatermark(eventTsCol, watermarkDelay).alias("__e")
      .join(
        states.withWatermark(stateTsCol, watermarkDelay).alias("__s"),
        col(s"__e.$keyCol") === col(s"__s.$keyCol") &&
          col(stateTsCol) <= col(eventTsCol) &&
          col(stateTsCol) >= col(eventTsCol) - expr(s"INTERVAL $boundSeconds SECONDS"))
      .drop(col(s"__s.$keyCol"))

  /** Streaming exact dedup — the unbounded twin of
    * [[graft.operators.Dedup.exact]]: duplicates of a key arriving
    * within the watermark horizon are dropped; state for a key is
    * evicted once the watermark passes it, so dedup state stays bounded
    * no matter how long the stream runs (the property that makes
    * at-least-once ingest into a 100 TB corpus idempotent). */
  def dedupWithinWatermark(
      df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** [[runningUserAgg]] on the Spark 4 arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`):
    * the current recommended custom-state primitive — state is
    * per-key, schema'd, TTL-able, and backed by the RocksDB state
    * store (`spark.sql.streaming.stateStore.providerClass` must be the
    * RocksDB provider), which keeps hot state off-heap and incremental
    * snapshots cheap on unbounded streams. */
  class RunningAggProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserAgg] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserAgg] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[UserAgg](
        "agg", org.apache.spark.sql.Encoders.product[UserAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserAgg] = {
      val prev = if (state.exists()) state.get() else UserAgg(key, 0L, 0.0)
      val next = rows.foldLeft(prev) { (a, e) =>
        UserAgg(key, a.n_events + 1L, a.value_sum + e.value)
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserAggTws(ds: Dataset[UserEvent]): Dataset[UserAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(
        new RunningAggProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  case class MinhashCandidate(id_a: Long, id_b: Long, band: Int)

  /** Per-(band, bucket) membership state for the streaming minhash
    * dedup: each arriving doc pairs with every member already in its
    * bucket, then joins the bucket. `maxBucket` mirrors the batch
    * miner's over-cap DROP as a tombstone: the arrival that would
    * exceed the cap kills the bucket — its state clears to one
    * boolean, the current micro-batch's pairs for it are suppressed,
    * and it stays permanently quiet (so a boilerplate mega-bucket
    * costs O(1) per arrival forever after). Within one micro-batch
    * this is EXACTLY the batch semantics; across batches, pairs a
    * previous batch already emitted cannot be retracted in append
    * mode — the one documented divergence (those pairs carry exact
    * verified distances, so consumers lose no precision; they see a
    * prefix the batch miner would have dropped for skew, not for
    * wrongness). Re-delivered ids are ignored (idempotent under
    * at-least-once). */
  class MinhashBucketProcessor(maxBucket: Int, ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Int, Long), (Int, Long, Long), MinhashCandidate] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var dead: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConf = ttl.map(d => new org.apache.spark.sql.streaming.TTLConfig(d))
        .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
      members = getHandle.getListState[Long](
        "members", org.apache.spark.sql.Encoders.scalaLong, ttlConf)
      dead = getHandle.getValueState[Boolean](
        "dead", org.apache.spark.sql.Encoders.scalaBoolean, ttlConf)
    }

    override def handleInputRows(
        key: (Int, Long), rows: Iterator[(Int, Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[MinhashCandidate] = {
      if (dead.exists()) Iterator.empty
      else {
        val current = scala.collection.mutable.ArrayBuffer.empty[Long]
        val it = members.get()
        while (it.hasNext) current += it.next()
        val out = Seq.newBuilder[MinhashCandidate]
        var alive = true
        rows.foreach { case (band, _, id) =>
          if (alive && !current.contains(id)) {
            if (current.size >= maxBucket) {
              alive = false
              dead.update(true)
              members.clear()
              out.clear()
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"skew cap: minhash bucket $key exceeded maxBucket=$maxBucket — " +
                  "tombstoned (no further candidate pairs from this bucket)")
            } else {
              current.foreach { m =>
                out += MinhashCandidate(math.min(m, id), math.max(m, id), band)
              }
              current += id
              members.appendValue(id)
            }
          }
        }
        if (alive) out.result().iterator else Iterator.empty
      }
    }
  }

  /** J8 — streaming MinHash-bucket near-dup candidates: the unbounded
    * twin of [[graft.operators.Dedup.minhashCandidates]], sharing its
    * signature + banding expressions verbatim (so stream and batch
    * bucket identically, by construction). Candidate pairs surface the
    * moment the second member of a bucket arrives; with `ttl` set,
    * bucket membership expires after the horizon, so state stays
    * bounded on an unbounded corpus ingest (the batch pass over the
    * full corpus remains the completeness backstop, exactly as in
    * production dedup pipelines). Emitted pairs may repeat across
    * bands/batches — consumers `dropDuplicates(id_a, id_b)` or feed
    * [[graft.operators.Dedup.connectedComponents]], which is
    * idempotent to duplicate edges. */
  def minhashCandidateStream(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000,
      ttl: Option[java.time.Duration] = None): Dataset[MinhashCandidate] = {
    import df.sparkSession.implicits._
    val banded = graft.operators.Dedup.bandedBuckets(
      graft.operators.Dedup.signatureFrame(df, idCol, textCol, shingleN, numHashes),
      numHashes, bands)
    banded.select(col("band"), col("bucket"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .transformWithState(
        new MinhashBucketProcessor(maxBucket, ttl),
        if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** J14 twin — rolling-ingest dedup served online: every micro-batch
    * is one arriving shard, probed against the PERSISTED minhash index
    * ([[graft.operators.Dedup.minhashIndexWrite]]) by the batch
    * operator itself through `foreachBatch` — a micro-batch IS a
    * bounded shard, so the exact-verify joins and the best-match fold
    * run as plain batch plans and stream/batch parity holds by
    * construction (spec-asserted). Per-batch cost ∝ batch + the
    * candidate sliver of the index; the corpus is never rescanned and
    * NO state store is involved — the index artifact is the state,
    * shared by every executor, refreshable between batches by
    * rewriting the artifact (e.g. folding accepted novel docs in).
    * `onFlagged` receives each batch's flagged rows
    * `(doc_id, match_id, jaccard)` with its batch id. */
  /** I16 — streaming URL compliance: the L14/L16 verdicts on an
    * unbounded URL stream (live crawl-frontier filtering). The rule
    * list folds into a LITERAL struct array at stream build (the
    * I12/I13 fitted-literal posture — train/compile offline, serve
    * online), with RFC 9309 wildcard patterns compiled ONCE rules-side
    * by the SAME [[graft.operators.Html.robotsPatternRegex]] column
    * expression the batch matcher uses: each row normalizes its URL
    * and folds the array in-row — no join, no state store, stateless
    * append mode, so batch/stream parity holds by shared semantics
    * (spec-asserted). Verdict mode mirrors the batch operator: a rule
    * frame WITHOUT an `allow` column is a blocklist (min-rule_id
    * attribution), one WITH it runs the §2.2.2 longest-match argmax
    * (Allow wins an exact-length tie) as the same struct-max fold.
    * Bounded by construction: a rule list past the literal bound must
    * use the batch suffix-explode join instead — loudly enforced,
    * never silently truncated. */
  def urlFilterStream(
      df: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, maxRules: Int = 10000): DataFrame =
    urlFlagStream(df, idCol, urlCol, rules, maxRules)
      .select(col(idCol), col("canon"), col("blocked"), col("rule_id"))

  /** [[urlFilterStream]] keeping the INPUT row: every original column
    * plus (canon, blocked, rule_id) — the compliance verdict as an
    * annotation, so a streaming pipeline can DROP blocked rows while
    * the rest of the row flows on (the spec-compiled `url_filter`
    * drop mode). Input columns named canon/blocked/rule_id would
    * collide — rejected loudly. */
  def urlFlagStream(
      df: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, maxRules: Int = 10000): DataFrame = {
    Seq("canon", "blocked", "rule_id", "__h", "__p", "__b").foreach { c =>
      require(!df.columns.contains(c),
        s"urlFlagStream: input already has a '$c' column — rename it first")
    }
    val hasAllow = rules.columns.contains("allow")
    // wildcard compile AND percent-normalization ride the rules side —
    // ∝ rules, once, byte-identical to the batch matcher's compile
    // (the URL path arrives percent-normalized through urlNormalize,
    // so the rule pattern must normalize the same way; specificity is
    // the NORMALIZED pattern length — the same string the matcher
    // compares — matching the batch argmax; wildcards compile in
    // allow mode only, mirroring the batch matcher: blocklist
    // prefixes are literal octets, `*`/`$` included)
    val normPp = when(col("path_prefix").isNotNull,
      graft.operators.Html.pctNormalize(col("path_prefix")))
    val collected = rules
      .select(col("rule_id").cast("long"), col("host_suffix"), col("path_prefix"),
        (if (hasAllow) col("allow") else lit(false)).as("allow"),
        coalesce(
          when(lit(hasAllow) && col("path_prefix").isNotNull &&
              (col("path_prefix").contains("*") || col("path_prefix").endsWith("$")),
            graft.operators.Html.robotsPatternRegex(normPp)),
          lit("")).as("rx"),
        coalesce(normPp, lit("")).as("pp"))
      .limit(maxRules + 1).collect()
    require(collected.length <= maxRules,
      s"urlFilterStream: rule list exceeds the $maxRules literal bound — " +
        "use the batch Html.urlFilter join for unbounded lists")
    val ruleSeq = collected.toSeq.map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse(""),
        r.getBoolean(3), r.getString(4), r.getString(5)))
    val rulesLit = typedLit(ruleSeq)
    val canon = graft.operators.Html.urlNormalize(col(urlCol))
    val host = graft.operators.Html.urlHost(col(urlCol))
    def matches(r: Column, h: Column, p: Column): Column =
      (h === r.getField("_2") || h.endsWith(concat(lit("."), r.getField("_2")))) &&
        (r.getField("_6") === "" ||
          when(r.getField("_5") === "", p.startsWith(r.getField("_6")))
            .otherwise(regexp_like(p, r.getField("_5"))))
    val base = df
      .withColumn("canon", canon)
      .withColumn("__h", host)
      .withColumn("__p", regexp_extract(col("canon"), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1))
    val out =
      if (!hasAllow) {
        val ruleId = aggregate(rulesLit, lit(null).cast("long"),
          (acc, r) => when(matches(r, col("__h"), col("__p")) &&
              (acc.isNull || r.getField("_1") < acc), r.getField("_1"))
            .otherwise(acc))
        base.withColumn("rule_id", ruleId)
          .withColumn("blocked", col("rule_id").isNotNull)
      } else {
        // the batch argmax verbatim: (normalized-pattern length,
        // allow, -rule_id) — `_6` is the normalized pp, '' for null,
        // so length 0 matches the batch coalesce
        val nullBest = lit(null).cast("struct<spec:INT,allow:BOOLEAN,nrid:BIGINT>")
        def cand(r: Column): Column = struct(
          length(r.getField("_6")).cast("int").as("spec"),
          r.getField("_4").as("allow"),
          (-r.getField("_1")).as("nrid"))
        val best = aggregate(rulesLit, nullBest,
          (acc, r) => when(matches(r, col("__h"), col("__p")) &&
              (acc.isNull || cand(r) > acc), cand(r))
            .otherwise(acc))
        base.withColumn("__b", best)
          .withColumn("rule_id", (-col("__b.nrid")).cast("long"))
          .withColumn("blocked",
            col("__b").isNotNull && !col("__b.allow"))
      }
    out.drop("__h", "__p", "__b")
  }

  case class HammingPair(id_a: Long, id_b: Long, hamming: Int)

  /** Per-bucket state for [[fingerprintPairStream]]: fingerprints of
    * current members; a new arrival pairs against every member within
    * `maxHamming` (exact popcount at emission — unlike the minhash
    * twin, a hamming bucket key is a LOSSY pigeonhole, so the
    * filter must run before anything is emitted). `maxBucket` mirrors
    * the batch miner's over-cap DROP as a tombstone (see
    * [[MinhashBucketProcessor]]): the arrival that would exceed the
    * cap kills the bucket — state clears, the current micro-batch's
    * pairs for it are suppressed (exact batch parity when the bucket
    * goes hot within one batch), and it stays permanently quiet.
    * Pairs emitted by EARLIER batches cannot be retracted in append
    * mode — the one documented divergence; they carry exact verified
    * hamming, so precision is unaffected. Re-delivered ids are
    * ignored (idempotent under at-least-once). */
  class HammingBucketProcessor(
      maxHamming: Int, maxBucket: Int, ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Int, Long), (Int, Long, Long, Long, Long), HammingPair] {
    @transient private var members:
      org.apache.spark.sql.streaming.ListState[(Long, Long, Long)] = _
    @transient private var dead: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConf = ttl.map(d => new org.apache.spark.sql.streaming.TTLConfig(d))
        .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
      members = getHandle.getListState[(Long, Long, Long)](
        "members",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        ttlConf)
      dead = getHandle.getValueState[Boolean](
        "dead", org.apache.spark.sql.Encoders.scalaBoolean, ttlConf)
    }

    override def handleInputRows(
        key: (Int, Long), rows: Iterator[(Int, Long, Long, Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[HammingPair] = {
      if (dead.exists()) Iterator.empty
      else {
        val current = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        val it = members.get()
        while (it.hasNext) current += it.next()
        val out = Seq.newBuilder[HammingPair]
        var alive = true
        rows.foreach { case (_, _, id, hi, lo) =>
          if (alive && !current.exists(_._1 == id)) {
            if (current.size >= maxBucket) {
              alive = false
              dead.update(true)
              members.clear()
              out.clear()
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"skew cap: hamming bucket $key exceeded maxBucket=$maxBucket — " +
                  "tombstoned (no further pairs from this bucket)")
            } else {
              current.foreach { case (mid, mhi, mlo) =>
                val ham = java.lang.Long.bitCount(mhi ^ hi) +
                  java.lang.Long.bitCount(mlo ^ lo)
                if (ham <= maxHamming)
                  out += HammingPair(math.min(mid, id), math.max(mid, id), ham)
              }
              current += ((id, hi, lo))
              members.appendValue((id, hi, lo))
            }
          }
        }
        if (alive) out.result().iterator else Iterator.empty
      }
    }
  }

  /** I13 — streaming media-fingerprint near-dup pairs: the unbounded
    * twin of [[graft.operators.Dedup.mineHammingPairs]] for the M2/M3
    * image/audio fingerprints, sharing [[graft.operators.Dedup
    * .hammingChunks]]' chunk expressions verbatim (stream and batch
    * bucket identically, by construction). Input is a fingerprint
    * frame (doc_id, hi, lo) — compute it on the stream with
    * [[graft.operators.Multimodal.imageAHash]]/[[graft.operators
    * .Multimodal.audioAHash]] (stateless mapPartitions chains onto a
    * streaming Dataset). A pair surfaces the moment the second member
    * of a pigeonhole bucket arrives; exact hamming is enforced at
    * emission (a chunk bucket is lossy — the batch miner filters after
    * expansion, a stream must filter before it emits). With `ttl` set,
    * membership expires after the horizon, so state stays bounded on
    * an unbounded ingest. Pairs may repeat across chunks/batches —
    * consumers `dropDuplicates(id_a, id_b)` (the J8 contract). */
  def fingerprintPairStream(
      fp: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1000,
      ttl: Option[java.time.Duration] = None): Dataset[HammingPair] = {
    import fp.sparkSession.implicits._
    graft.operators.Dedup.hammingChunks(fp)
      .select(col("chunk"), col("ckey"), col("doc_id"), col("hi"), col("lo"))
      .as[(Int, Long, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .transformWithState(
        new HammingBucketProcessor(maxHamming, maxBucket, ttl),
        // a non-None TTLConfig is only legal under ProcessingTime —
        // Spark's validateTTLConfig throws at query start otherwise
        if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  def incrementalDedupStream(
      shards: DataFrame, idCol: String, textCol: String, indexPath: String,
      onFlagged: (DataFrame, Long) => Unit,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000, minJaccard: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val probe = (batch: DataFrame, batchId: Long) =>
      onFlagged(
        graft.operators.Dedup.dedupShardAgainstIndex(
          batch, idCol, textCol, indexPath, shingleN, numHashes, bands,
          maxBucket, minJaccard),
        batchId)
    shards.writeStream.foreachBatch(probe).start()
  }

  /** J14b twin — the FULL rolling-ingest loop online: each micro-batch
    * probes the persisted index, hands its flagged rows to
    * `onFlagged`, and APPENDS its novel (unflagged) docs to the index
    * via [[graft.operators.Dedup.minhashIndexAppend]], so the NEXT
    * micro-batch dedups against them too — the batch
    * probe→keep-novel→append loop (the q_dedup_rolling gate) verbatim,
    * one iteration per micro-batch. The flagged frame is checkpointed
    * (∝ batch) before the append so the probe never re-runs against
    * the already-mutated artifact; parity with per-shard batch rounds
    * is spec-asserted, including a cross-batch match against a
    * batch-1 novel doc. Delivery contract (standard foreachBatch): a
    * retried micro-batch may re-invoke `onFlagged` (use `batchId` for
    * an idempotent sink) and may re-append its novel docs —
    * duplicates only OVER-drop (inflated occupancy is conservative,
    * never a wrong match) and [[graft.operators.Dedup
    * .minhashIndexCompact]], the periodic maintenance job as segments
    * accumulate, collapses them back to the cleanly built index
    * (spec-asserted). */
  def rollingIngestStream(
      shards: DataFrame, idCol: String, textCol: String, indexPath: String,
      onFlagged: (DataFrame, Long) => Unit,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000, minJaccard: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val step = (batch: DataFrame, batchId: Long) => {
      val flagged = graft.operators.Dedup.dedupShardAgainstIndex(
          batch, idCol, textCol, indexPath, shingleN, numHashes, bands,
          maxBucket, minJaccard)
        .localCheckpoint(true)
      onFlagged(flagged, batchId)
      graft.operators.Dedup.minhashIndexAppend(
        batch.join(flagged.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti"),
        idCol, textCol, indexPath, shingleN, numHashes, bands)
    }
    shards.writeStream.foreachBatch(step).start()
  }

  case class SpanDecision(doc_id: Long, pos: Int, keep: Boolean)

  /** Per-span first-seen state for the streaming span scrub (the J12
    * twin): keyed by the 64-bit span hash, the value is the corpus-wide
    * first occurrence `(doc_id, pos)`. Within a micro-batch the
    * processor replays the batch operator's semantics EXACTLY —
    * occurrences sort by `(doc_id, pos)`, and non-first occurrences
    * scrub only when the span is seen in ≥ 2 distinct docs (the batch
    * `minDocs = 2` flag). Across micro-batches the stream keeps the
    * arrival-order first occurrence and scrubs every later one from
    * other docs; the one batch behavior a stream cannot replicate is
    * retracting a within-introducing-doc repeat whose duplicating doc
    * arrives LATER (an emitted keep cannot be unsent) — the standard
    * online-dedup approximation, with the batch pass as completeness
    * backstop (the J8 contract). With `ttl` set, first-seen state
    * expires after the horizon, bounding state on unbounded ingest. */
  class SpanFirstSeenProcessor(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Int), SpanDecision] {
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[(Long, Int)] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[(Long, Int)](
        "first",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaInt),
        ttl.map(d => new org.apache.spark.sql.streaming.TTLConfig(d))
          .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE))

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Int)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SpanDecision] = {
      val occ = rows.map { case (_, d, p) => (d, p) }.toArray.sorted
      val out = Seq.newBuilder[SpanDecision]
      if (seen.exists()) {
        val (fd, fp) = seen.get()
        occ.foreach { case (d, p) =>
          out += SpanDecision(d, p, keep = d == fd && p == fp)
        }
      } else if (occ.nonEmpty) {
        seen.update(occ.head)
        val multiDoc = occ.iterator.map(_._1).distinct.size >= 2
        occ.zipWithIndex.foreach { case ((d, p), i) =>
          out += SpanDecision(d, p, keep = i == 0 || !multiDoc)
        }
      }
      out.result().iterator
    }
  }

  /** Streaming span-level scrub DECISIONS — the unbounded twin of
    * [[graft.operators.Dedup.spanScrub]] (J12): every `spanLen`-token
    * window of every arriving document gets a keep/scrub verdict
    * against the (span-hash → first-seen) state. Shares the batch
    * operator's codegen'd window expression verbatim, so stream and
    * batch window identically by construction; the xxhash64 state key
    * is 8 bytes/span (a 2⁻⁶⁴ collision would scrub a false positive —
    * the usual fingerprint trade, same as the J3 family). Consumers
    * rebuild cleaned text per micro-batch via [[applySpanDecisions]]
    * (the batch rebuild applied to that batch's docs — all of a doc's
    * windows arrive together, so the rebuild never splits a doc). */
  def spanScrubStream(
      df: DataFrame, idCol: String, textCol: String, spanLen: Int,
      ttl: Option[java.time.Duration] = None): Dataset[SpanDecision] = {
    import df.sparkSession.implicits._
    require(spanLen >= 1, "spanScrubStream: spanLen must be >= 1")
    val toks = split(col(textCol), " ")
    df.where(size(toks) >= spanLen)
      .select(
        col(idCol).cast("long").as("doc_id"),
        posexplode(graft.functions.HashFunctions.string_ngrams(toks, spanLen)))
      .toDF("doc_id", "pos", "span")
      .select(xxhash64(col("span")).as("h"), col("doc_id"), col("pos").cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .transformWithState(
        new SpanFirstSeenProcessor(ttl),
        if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Apply a micro-batch's [[SpanDecision]]s to its documents: expand
    * scrubbed window positions to covered token positions and rebuild
    * through the batch operator's own tail, so streamed output is
    * byte-identical to [[graft.operators.Dedup.spanScrub]] wherever
    * the decisions agree. */
  def applySpanDecisions(
      docs: DataFrame, idCol: String, textCol: String,
      decisions: DataFrame, spanLen: Int): DataFrame = {
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"), split(col(textCol), " ").as("toks"))
    val cover = decisions.where(!col("keep"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(spanLen - 1))).as("tpos"))
      .distinct()
    graft.operators.Dedup.spanCoverRebuild(base, cover)
  }

  case class SessionState(
      start: Long, last: Long, n: Long, sum: Double)
  case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, value_sum: Double)

  /** Gap-based sessionization on an unbounded stream — the streaming
    * twin of [[graft.operators.Events.sessionize]], via
    * `flatMapGroupsWithState` with an event-time timeout: a session
    * closes (and is emitted, append-mode) either when a same-user event
    * arrives past the gap, or when the watermark passes the open
    * session's gap deadline. State per user is one fixed-size struct —
    * bounded memory on any stream. */
  def sessionizeStream(
      ds: Dataset[UserEvent], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import ds.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[UserEvent], state: GroupState[SessionState]) =>
          def toSession(s: SessionState) = Session(
            user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.n, s.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).iterator
            state.remove()
            out
          } else {
            // fold this micro-batch's events (in event-time order) into
            // the open session, closing at each gap > gapSeconds
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last > gapMs =>
                  closed += toSession(s)
                  open = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(SessionState(s.start, math.max(s.last, t), s.n + 1L, s.sum + e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
