package graft

import org.apache.spark.sql.functions._
import graft.plans.Pipeline

/** Config-driven pipeline runner: validation loudness (the
  * chain_validator mirror), op bridges vs direct operator calls,
  * end-to-end exports, and the one-Catalyst-plan claim. */
class PipelineSpecSuite extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "news", 120L, "en"), (2L, "web", 80L, "en"),
    (3L, "news", 200L, "fr"), (4L, "web", 50L, "fr"),
    (5L, "news", 10L, "en")).toDF("doc_id", "source", "n_chars", "lang")

  private def resolve: String => org.apache.spark.sql.DataFrame = {
    case "docs" => docs
    case other => fail(s"unexpected table $other")
  }

  test("a YAML spec compiles to the same rows as the hand-written plan") {
    val spec = """
entity: doc_stats
sources:
  - name: d
    table: docs
steps:
  - name: long_docs
    op: filter
    params: {where: "n_chars >= 50"}
  - name: by_source
    op: aggregate
    params:
      groupBy: [source]
      aggs: {n_docs: "count(1)", chars: "sum(n_chars)"}
  - name: ordered
    op: sort
    params: {by: [source]}
"""
    val got = Pipeline.result(spark, spec, resolve).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.where("n_chars >= 50").groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("c")).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("JSON specs parse through the same loader (YAML superset)") {
    val spec =
      """{"entity":"j","sources":[{"name":"d","table":"docs"}],
        |"steps":[{"name":"s","op":"filter",
        |"params":{"where":"lang = 'en'"}}]}""".stripMargin
    assert(Pipeline.result(spark, spec, resolve).count() == 3L)
  }

  test("unknown op fails loudly, listing the known ops") {
    val spec = """
entity: bad
sources: [{name: d, table: docs}]
steps: [{name: s, op: frobnicate, params: {}}]
"""
    val e = intercept[IllegalArgumentException](
      Pipeline.result(spark, spec, resolve))
    assert(e.getMessage.contains("unknown op 'frobnicate'"))
    assert(e.getMessage.contains("aggregate")) // the known-op list
  }

  test("reference to an undefined step/input fails loudly before execution") {
    val spec = """
entity: bad
sources: [{name: d, table: docs}]
steps:
  - {name: s, op: filter, input: nonexistent, params: {where: "1=1"}}
"""
    val e = intercept[IllegalArgumentException](
      Pipeline.result(spark, spec, resolve))
    assert(e.getMessage.contains("undefined input 'nonexistent'"))
  }

  test("duplicate names, missing params and unknown export formats are loud") {
    val dup = """
entity: bad
sources: [{name: s, table: docs}]
steps: [{name: s, op: filter, params: {where: "1=1"}}]
"""
    assert(intercept[IllegalArgumentException](
      Pipeline.result(spark, dup, resolve))
      .getMessage.contains("duplicate"))
    val missing = """
entity: bad
sources: [{name: d, table: docs}]
steps: [{name: s, op: filter, params: {}}]
"""
    assert(intercept[IllegalArgumentException](
      Pipeline.result(spark, missing, resolve))
      .getMessage.contains("missing required param 'where'"))
    val badExport = """
entity: bad
sources: [{name: d, table: docs}]
steps: [{name: s, op: filter, params: {where: "1=1"}}]
exports: [{name: e, format: carrier_pigeon, params: {path: x}}]
"""
    assert(intercept[IllegalArgumentException](
      Pipeline.result(spark, badExport, resolve))
      .getMessage.contains("unknown format 'carrier_pigeon'"))
  }

  test("widget-bridge ops match the direct operator calls") {
    val spec = """
entity: widgets
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: statistical_summary
    params: {field: n_chars, groupBy: [source]}
"""
    val got = Pipeline.result(spark, spec, resolve).collect().map(_.toString)
    val want = graft.operators.Aggregations
      .statisticalSummary(docs, "n_chars", Seq("source"))
      .collect().map(_.toString)
    assert(got.toSeq == want.toSeq)

    val dist = """
entity: widgets2
sources: [{name: d, table: docs}]
steps:
  - name: cat
    op: categorical_distribution
    params: {field: lang, categories: [en, fr], groupBy: [source]}
"""
    val got2 = Pipeline.result(spark, dist, resolve).collect().map(_.toString)
    val want2 = graft.operators.Distributions
      .categoricalDistribution(docs, "lang", Seq("en", "fr"), Seq("source"))
      .collect().map(_.toString)
    assert(got2.toSeq == want2.toSeq)
  }

  test("curation-bridge ops match the direct operator calls") {
    val corpus = Seq(
      (1L, "news", "the quick brown fox jumps over a lazy dog near the river bank today"),
      (2L, "news", "the quick brown fox jumps over a lazy dog near the river bank today"),
      (3L, "web", "contact me at bob@mail.com for details about the offer we discussed"),
      (4L, "web", "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (5L, "news", "short doc")).toDF("doc_id", "source", "text")
    val resolveC: String => org.apache.spark.sql.DataFrame = {
      case "corpus" => corpus
      case other => fail(s"unexpected table $other")
    }
    val spec = """
entity: curate
sources: [{name: c, table: corpus}]
steps:
  - name: dedup
    op: exact_dedup
    params: {id: doc_id, text: text}
  - name: quality
    op: quality_filter
    params: {text: text, minWords: 5, minDistinctFrac: 0.5, maxTopShare: 0.5}
  - name: scrubbed
    op: pii_scrub
    params:
      text: text
      patterns:
        - {name: emails, regex: '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', replace: "<EMAIL>"}
  - name: sampled
    op: stratified_sample
    params: {strata: [source], id: doc_id, frac: 1.0}
"""
    val got = Pipeline.result(spark, spec, resolveC)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // direct composition of the same operators
    val want = graft.operators.Curation.stratifiedSample(
        graft.operators.Curation.piiScrubText(
          graft.operators.Curation.qualityKeep(
            graft.operators.Dedup.exactDedupKeep(corpus, "doc_id", "text"),
            "text", 5, 0.5, 0.5),
          "text", Seq(("emails",
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"))),
        Seq("source"), "doc_id", 1.0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // semantics: doc 2 deduped away, doc 4 (top share) and 5 (short)
    // filtered, email redacted
    assert(got.map(_._1).toSeq == Seq(1L, 3L))
    assert(got.find(_._1 == 3L).get._2.contains("<EMAIL>"))
  }

  test("html_extract step strips boilerplate in place ahead of the curation chain") {
    val pages = Seq(
      (1L, "<html><body><div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
        "<p>the quick brown fox jumps over a lazy dog today</p></body></html>"),
      (2L, "<p>Tom &amp; Jerry say 1 &lt; 2 in this long line of words</p>" +
        "<div><a href=\"/t\">Terms</a> <a href=\"/p\">Priv</a> 2026</div>"))
      .toDF("doc_id", "html")
    val resolveP: String => org.apache.spark.sql.DataFrame = {
      case "pages" => pages
      case other => fail(s"unexpected table $other")
    }
    val spec = """
entity: wet
sources: [{name: p, table: pages}]
steps:
  - name: extracted
    op: html_extract
    params: {html: html}
"""
    val got = Pipeline.result(spark, spec, resolveP)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = graft.operators.Html.htmlExtractText(pages, "html")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got(0)._2 == "the quick brown fox jumps over a lazy dog today")
    assert(got(1)._2 == "Tom & Jerry say 1 < 2 in this long line of words")
  }

  test("a warc source reads real crawl bytes and chains into html_extract") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val dir = s"/tmp/graft-pipe-warc-${System.nanoTime()}"
    val pages = (0L until 9L)
      .map(i => (i, s"https://s${i % 3}.example/doc/$i",
        s"<html><body><div><a href=\"/\">Home</a></div>" +
          s"<p>document $i alpha beta gamma delta words</p></body></html>"))
      .toDF("doc_id", "url", "html")
      .repartition(2, pmod(col("doc_id"), lit(2)))
    graft.sources.Warc.writeFiles(pages, "url", "html", dir)
    val spec = s"""
entity: crawl
sources: [{name: crawl, table: "$dir/*.warc.gz", format: warc}]
steps:
  - name: extracted
    op: html_extract
    params: {html: html}
"""
    // a warc source never touches the table registry; html_extract
    // replaces the html column in place (the WET convention)
    val got = Pipeline.result(spark, spec,
        t => fail(s"warc source must not resolve table '$t'"))
      .select("url", "html").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.size === 9)
    assert(got("https://s1.example/doc/4") ===
      "document 4 alpha beta gamma delta words")
    // unknown source formats are refused loudly at validate time
    val ex = intercept[IllegalArgumentException] {
      Pipeline.result(spark, """
entity: x
sources: [{name: a, table: t, format: avro}]
steps: [{name: s, op: select, params: {columns: [c]}}]
""", resolve)
    }
    assert(ex.getMessage.contains("unknown format"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }

  test("web front-end steps compose: links -> url_normalize -> pagerank in one spec") {
    // 4 pages, each linking to page 0 except page 0 -> 1; hrefs messy
    // (case, default port, fragment) so url_normalize must produce
    // clean join keys before the graph builds
    val pages = (0L to 3L).map { i =>
      val t = if (i == 0L) 1L else 0L
      (i, s"""<p>page body</p><a href="HTTP://Site$t.Example.COM:80/#x">go</a>""")
    }.toDF("doc_id", "html")
    val resolveW: String => org.apache.spark.sql.DataFrame = {
      case "pages" => pages
      case other => fail(s"unexpected table $other")
    }
    // pagerank keys are longs: the edges step extracts the site
    // ordinal from the CANONICAL host (www/port/case all normalized
    // away by url_normalize — the extract would not match otherwise)
    val spec = """
entity: webrank
sources: [{name: p, table: pages}]
steps:
  - name: links
    op: html_links
    params: {id: doc_id, html: html}
  - name: canon
    op: url_normalize
    params: {url: href, hostColumn: dst_host}
  - name: edges
    op: select
    params:
      columns:
        - "doc_id AS src"
        - "CAST(regexp_extract(dst_host, 'site(\\\\d+)', 1) AS LONG) AS dst"
  - name: ranked
    op: pagerank
    params: {src: src, dst: dst, iters: 3}
"""
    val ranks = Pipeline.result(spark, spec, resolveW)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L) && ranks(2L) === ranks(3L))
  }

  test("url_filter step drops blocked rows; anchor_text and label_prop chain on links") {
    // three pages on two hosts; bad.example.com is blocklisted
    val pages = Seq(
      (0L, """<a href="https://ok.example.com/a">alpha beta</a>"""),
      (1L, """<a href="https://ok.example.com/a">alpha gamma</a>"""),
      (2L, """<a href="https://bad.example.com/x">zap</a>"""))
      .toDF("doc_id", "html")
    val resolveW: String => org.apache.spark.sql.DataFrame = {
      case "pages" => pages
      case other => fail(s"unexpected table $other")
    }
    val spec = """
entity: webcompliance
sources: [{name: p, table: pages}]
steps:
  - name: links
    op: html_links
    params: {id: doc_id, html: html}
  - name: clean
    op: url_filter
    params:
      id: doc_id
      url: href
      rules: [{id: 0, host: bad.example.com}]
  - name: terms
    op: anchor_text
    params: {target: href, anchor: anchor, k: 2}
"""
    val terms = Pipeline.result(spark, spec, resolveW)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // doc 2's blocked link is gone; alpha counted twice on the ok target
    assert(terms === Set(
      ("https://ok.example.com/a", "alpha", 2L),
      ("https://ok.example.com/a", "beta", 1L)))

    // label_prop over an edge-list spec: two triangles, one bridge
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L)).toDF("s", "d")
    val resolveE: String => org.apache.spark.sql.DataFrame = {
      case "edges" => edges
      case other => fail(s"unexpected table $other")
    }
    val lpSpec = """
entity: communities
sources: [{name: e, table: edges}]
steps:
  - name: labeled
    op: label_prop
    params: {src: s, dst: d, iters: 3}
"""
    val labels = Pipeline.result(spark, lpSpec, resolveE)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(0L) === labels(1L) && labels(11L) === labels(12L))

    // shard_shuffle as the terminal layout step
    val docs = (0L until 50L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val resolveD: String => org.apache.spark.sql.DataFrame = {
      case "docs" => docs
      case other => fail(s"unexpected table $other")
    }
    val shardSpec = """
entity: shards
sources: [{name: d, table: docs}]
steps:
  - name: laid_out
    op: shard_shuffle
    params: {id: doc_id, tokens: "size(split(text, ' '))", budget: "32", seed: 5}
"""
    val out = Pipeline.result(spark, shardSpec, resolveD)
    val direct = graft.operators.Curation.shardShuffle(
      docs, "doc_id", org.apache.spark.sql.functions.expr("size(split(text, ' '))").cast("long"),
      budget = 32L, seed = 5L)
    assert(out.collect().toSeq === direct.collect().toSeq)
  }

  test("index_dedup step drops near-dups of the persisted index, flag mode returns verdicts") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val idx = s"/tmp/graft-spec-pipeidx-${java.lang.Math.abs(hashCode)}"
    graft.operators.Dedup.minhashIndexWrite(corpus, "doc_id", "text", idx)
    val shard = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 10
      (3L, "totally novel content that matches nothing in the index at all"))
      .toDF("doc_id", "text")
    val resolveS: String => org.apache.spark.sql.DataFrame = {
      case "shard" => shard
      case other => fail(s"unexpected table $other")
    }
    def spec(mode: String) = s"""
entity: ingest
sources: [{name: s, table: shard}]
steps:
  - name: probed
    op: index_dedup
    params: {id: doc_id, text: text, path: '$idx', mode: $mode}
"""
    val kept = Pipeline.result(spark, spec("drop"), resolveS)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L))
    val flagged = Pipeline.result(spark, spec("flag"), resolveS)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged === Set((1L, 10L)))
  }

  test("fluency_buckets step matches the direct operator") {
    val corpus = (Seq((0L, "w1 w2 w3 w4 w5 w6 w7 w8", "ref")) ++
      (1 to 6).map { i =>
        val known = (1 to (8 - i)).map(j => s"w$j")
        (i.toLong, (known ++ (1 to i).map(j => s"z${i}_$j")).mkString(" "), "wild")
      }).toDF("doc_id", "text", "src")
    val resolveF: String => org.apache.spark.sql.DataFrame = {
      case "corpus" => corpus
      case other => fail(s"unexpected table $other")
    }
    val spec = """
entity: ccnet
sources: [{name: c, table: corpus}]
steps:
  - name: buckets
    op: fluency_buckets
    params: {id: doc_id, text: text, ref: "src = 'ref'"}
"""
    val got = Pipeline.result(spark, spec, resolveF)
      .collect().map(r => (r.getLong(0), r.getString(4))).toSet
    val want = graft.operators.TextAnalysis.fluencyBuckets(
      corpus, "doc_id", "text", col("src") === "ref")
      .collect().map(r => (r.getLong(0), r.getString(4))).toSet
    assert(got === want && got.map(_._1) === (1L to 6L).toSet)
  }

  test("quality_classifier step fits at build time and matches the operator") {
    val corpus = Seq(
      (0L, "seed", "lucid prose about careful work"),
      (1L, "seed", "lucid prose on measured thought"),
      (2L, "seed", "prose lucid and careful thought"),
      (3L, "seed", "lucid careful measured prose work"),
      (10L, "web", "lucid prose with careful thought here"),
      (11L, "web", "measured lucid prose work sample"),
      (12L, "web", "zxq qqzz vvkk jjpp wwyy"),
      (13L, "web", "zxq vvkk qqzz wwyy jjpp zz")).toDF("doc_id", "source", "text")
    val resolveC: String => org.apache.spark.sql.DataFrame = {
      case "corpus" => corpus
      case other => fail(s"unexpected table $other")
    }
    val spec = """
entity: learned
sources: [{name: c, table: corpus}]
steps:
  - name: kept
    op: quality_classifier
    params: {id: doc_id, text: text, label: "source = 'seed'", buckets: 16, epochs: 8}
"""
    val got = Pipeline.result(spark, spec, resolveC)
    // original columns preserved, only wild kept-rows survive
    assert(got.columns.toSeq == Seq("doc_id", "source", "text"))
    val ids = got.collect().map(_.getLong(0)).sorted.toSeq
    val want = graft.operators.Classifier.trainAndScore(
        corpus, "doc_id", "text", col("source") === "seed", 16, 8)
      .where(col("kept")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == want)
    assert(ids.nonEmpty && !ids.contains(12L) && !ids.contains(13L))
  }

  test("sql step sees prior steps as views under their logical names") {
    val spec = """
entity: sqltest
sources: [{name: d, table: docs}]
steps:
  - name: en_docs
    op: filter
    params: {where: "lang = 'en'"}
  - name: agg
    op: sql
    params: {query: "SELECT source, count(1) AS n FROM en_docs GROUP BY 1 ORDER BY 1"}
"""
    val got = Pipeline.result(spark, spec, resolve).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("news", 2L), ("web", 1L)))
  }

  test("late filters still push into the source scan (one-plan compilation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-push").toString
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val spec = """
entity: pushdown
sources: [{name: d, table: docs}]
steps:
  - name: wide
    op: select
    params: {columns: ["doc_id", "source", "n_chars"]}
  - name: narrow
    op: filter
    params: {where: "n_chars > 100"}
"""
    val out = Pipeline.result(
      spark, spec, _ => spark.read.parquet(s"$dir/docs"))
    val scan = out.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)"),
      s"filter did not reach the scan:\n$scan")
    assert(out.count() == 2L)
  }

  test("jsonapi and dwc_archive exports land on disk with consistent indexes") {
    val root = java.nio.file.Files.createTempDirectory("graft-pipe-exp").toString
    val spec = """
entity: exports
sources: [{name: d, table: docs}]
steps:
  - name: summary
    op: aggregate
    params:
      groupBy: [source, lang]
      aggs: {n_docs: "count(1)", chars: "sum(n_chars)"}
exports:
  - name: api
    format: jsonapi
    params: {path: api, entityKeys: [source], sortKey: chars, topN: 5}
  - name: archive
    format: dwc_archive
    params: {path: dwca}
"""
    val outs = Pipeline.run(spark, spec, resolve, root).toMap
    // jsonapi: detail docs + index derived from the same frame
    val idx = spark.read.json(s"${outs("api")}/index")
    assert(idx.columns.toSet == Set("source", "n_records", "detail_path"))
    assert(idx.count() == 2L) // news, web
    val payloads = spark.read.text(s"${outs("api")}/details").collect()
      .map(_.getString(0))
    assert(payloads.length == 2 && payloads.forall(_.contains("top_details")))
    // dwc archive: headered CSV parts + meta.xml + per-part zips
    val occ = new java.io.File(s"${outs("archive")}/occurrence")
    assert(occ.listFiles().exists(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".csv")))
    assert(new java.io.File(s"${outs("archive")}/meta.xml").exists())
    assert(occ.listFiles().exists(_.getName.endsWith(".csv.zip")))
  }

  test("mode: streaming compiles the SAME spec steps to one readStream plan") {
    // real landing dir: two multi-member .warc.gz files on three hosts,
    // one of which robots.txt forbids entirely
    val dir = s"/tmp/graft-pipe-stream-${System.nanoTime()}"
    val pages = (0L until 12L)
      .map(i => (i, s"https://s${i % 3}.example/doc/$i",
        s"<html><body><div><a href=\"/\">Home</a> <a href=\"/a\">A</a></div>" +
          s"<p>document $i reach me at u$i@x.org for details</p></body></html>"))
      .toDF("doc_id", "url", "html")
      .repartition(2, pmod(col("doc_id"), lit(2)))
    graft.sources.Warc.writeFiles(pages, "url", "html", dir)
    val robots = Seq(
      ("s0.example", "User-agent: *\nDisallow: /private/\n"),
      ("s1.example", "User-agent: *\nDisallow: /\n"),
      ("s2.example", "User-agent: *\nDisallow: /doc/2\nDisallow: /doc/5\n"))
      .toDF("host", "robots")
    val resolveR: String => org.apache.spark.sql.DataFrame = {
      case "robots" => robots
      case other => fail(s"unexpected table $other")
    }
    def specFor(mode: String) = s"""
entity: stream_hygiene
mode: $mode
sources:
  - {name: crawl, table: "$dir/*.warc.gz", format: warc}
  - {name: robots_bodies, table: robots}
steps:
  - name: rules
    op: robots_rules
    input: robots_bodies
    params: {host: host, robots: robots}
  - name: extracted
    op: html_extract
    input: crawl
    params: {html: html}
  - name: compliant
    op: url_filter
    params: {id: url, url: url, rulesFrom: rules, mode: drop}
  - name: scrubbed
    op: pii_scrub
    params:
      text: html
      patterns:
        - {name: emails, regex: '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', replace: '<EMAIL>'}
  - name: kept
    op: quality_filter
    params: {text: html, minWords: 3, minDistinctFrac: 0.0, maxTopShare: 1.0}
"""
    val want = Pipeline.result(spark, specFor("batch"), resolveR)
      .select("url", "html").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // s1.example is robots-blocked entirely; emails scrubbed
    assert(want.nonEmpty && want.forall(!_._1.contains("s1.example")))
    assert(want.forall(_._2.contains("<EMAIL>")))
    val stream = Pipeline.resultStream(spark, specFor("streaming"), resolveR)
    assert(stream.isStreaming)
    val q = stream.selectExpr("url", "html")
      .writeStream.format("memory").queryName("pipe_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pipe_stream_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === want)
    } finally q.stop()
    // guard rails: batch-mode spec refused, stateful op refused,
    // exports refused
    val exMode = intercept[IllegalArgumentException] {
      Pipeline.resultStream(spark, specFor("batch"), resolveR)
    }
    assert(exMode.getMessage.contains("mode: streaming"))
    val exOp = intercept[IllegalArgumentException] {
      Pipeline.resultStream(spark, s"""
entity: bad
mode: streaming
sources: [{name: crawl, table: "$dir/*.warc.gz", format: warc}]
steps:
  - {name: agg, op: aggregate, params: {groupBy: [url], aggs: {n: "count(1)"}}}
""", resolveR)
    }
    assert(exOp.getMessage.contains("stateless streaming"))
    val exExp = intercept[IllegalArgumentException] {
      Pipeline.resultStream(spark, s"""
entity: bad2
mode: streaming
sources: [{name: crawl, table: "$dir/*.warc.gz", format: warc}]
steps:
  - {name: ex, op: html_extract, params: {html: html}}
exports: [{name: out, format: parquet, params: {path: p}}]
""", resolveR)
    }
    assert(exExp.getMessage.contains("no exports"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }

  test("window_agg step: streaming watermarked windows match the batch twin") {
    val dir = s"/tmp/graft-pipe-wagg-${System.nanoTime()}"
    // 12 pages across 3 hosts and 3 distinct fetch hours -> multiple
    // real event-time windows per host
    val pages = (0L until 12L)
      .map(i => (i, s"https://s${i % 3}.example/doc/$i",
        s"<html><body><p>doc $i</p></body></html>",
        f"2026-01-01T0${i % 3}%d:10:00Z"))
      .toDF("doc_id", "url", "html", "fetched")
      .repartition(2, pmod(col("doc_id"), lit(2)))
    graft.sources.Warc.writeFiles(pages, "url", "html", dir, dateCol = "fetched")
    def specFor(mode: String) = s"""
entity: crawl_rate
mode: $mode
sources: [{name: crawl, table: "$dir/*.warc.gz", format: warc}]
steps:
  - name: picked
    op: select
    input: crawl
    params: {columns: ["url", "fetched_at", "regexp_extract(url, 'https://([^/]+)/', 1) AS host"]}
  - name: counted
    op: window_agg
    params: {ts: fetched_at, key: host, window: "1 hour", watermark: "10 minutes"}
"""
    val want = Pipeline.result(spark, specFor("batch"),
        t => fail(s"unexpected table $t"))
      .selectExpr("window.start AS ws", "host", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(want.size === 3 && want.forall(_._3 === 4L)) // 3 (host,hour) cells
    val stream = Pipeline.resultStream(spark, specFor("streaming"),
      t => fail(s"unexpected table $t"))
    assert(stream.isStreaming)
    val q = stream.selectExpr("window.start AS ws", "host", "n_events")
      .writeStream.format("memory").queryName("pipe_wagg_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pipe_wagg_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got === want)
    } finally q.stop()
    // an aggregation mid-chain is refused loudly
    val ex = intercept[IllegalArgumentException] {
      Pipeline.resultStream(spark, s"""
entity: bad
mode: streaming
sources: [{name: crawl, table: "$dir/*.warc.gz", format: warc}]
steps:
  - name: counted
    op: window_agg
    params: {ts: fetched_at, key: url, window: "1 hour", watermark: "10 minutes"}
  - name: after
    op: filter
    params: {where: "n_events > 1"}
""", t => fail(s"unexpected table $t"))
    }
    assert(ex.getMessage.contains("LAST step"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }

  test("url_resolve and lang_id_learned steps match the direct operators") {
    // links with relative hrefs resolve against the page URL in-spec
    val links = Seq(
      (1L, "https://h.example/dir/sub/p.html", "img/a.png"),
      (2L, "https://h.example/dir/sub/p.html", "../up/b"),
      (3L, "https://h.example/dir/sub/p.html", "/rooted/c"),
      (4L, "https://h.example/dir/sub/p.html", "//cdn.net/d.js"))
      .toDF("id", "base", "href")
    val resolveL: String => org.apache.spark.sql.DataFrame = {
      case "links" => links
      case other => fail(s"unexpected table $other")
    }
    val got = Pipeline.result(spark, """
entity: resolver
sources: [{name: l, table: links}]
steps:
  - {name: r, op: url_resolve, params: {base: base, href: href}}
  - {name: n, op: url_normalize, params: {url: href}}
""", resolveL)
      .orderBy("id").collect().map(_.getAs[String]("href"))
    assert(got.toSeq === Seq(
      "https://h.example/dir/sub/img/a.png",
      "https://h.example/dir/up/b",
      "https://h.example/rooted/c",
      "https://cdn.net/d.js"))
    // learned lang-ID: fit at build time on the train slice, annotate all
    import graft.operators.TextAnalysis
    val raw = Map(
      "en" -> TextAnalysis.stopEn, "fr" -> TextAnalysis.stopFr,
      "de" -> TextAnalysis.stopDe, "es" -> TextAnalysis.stopEs)
    val vocab = raw.map { case (l, ws) =>
      l -> ws.filterNot(w => raw.exists { case (o, ows) => o != l && ows.contains(w) })
    }
    val langsOrder = Seq("de", "en", "es", "fr")
    val docs = (0L until 80L).map { i =>
      val l = langsOrder((i / 2 % 4).toInt)
      val ws = vocab(l)
      (i, (0 until 12).map(j => ws(((i * 7 + j * 5) % ws.size).toInt)).mkString(" "), l)
    }.toDF("doc_id", "text", "lang")
    val resolveD: String => org.apache.spark.sql.DataFrame = {
      case "docs" => docs
      case other => fail(s"unexpected table $other")
    }
    val out = Pipeline.result(spark, """
entity: langid
sources: [{name: d, table: docs}]
steps:
  - {name: tagged, op: lang_id_learned, params: {id: doc_id, text: text, lang: lang, train: "doc_id % 2 = 0"}}
  - {name: held, op: filter, params: {where: "doc_id % 2 = 1"}}
""", resolveD).collect()
    assert(out.length === 40)
    out.foreach(r => assert(r.getAs[String]("lang_pred") === r.getAs[String]("lang")))
  }

  test("hygiene vocabulary: minhash_dedup, decontaminate, span_scrub, bpe_count steps") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 1
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "contamination marker gram one two plus some clean padding here"))
      .toDF("doc_id", "text")
    val bench = Seq((99L, "contamination marker gram one two"))
      .toDF("doc_id", "text")
    val resolveH: String => org.apache.spark.sql.DataFrame = {
      case "documents" => corpus
      case "benchmarks" => bench
      case other => fail(s"unexpected table $other")
    }
    // drop chain: near-dup cluster {1,2} keeps doc 1; decontamination
    // drops doc 4 (shares the 5-gram "contamination marker gram one
    // two" with the benchmark) — survivors 1 and 3
    val got = Pipeline.result(spark, """
entity: hygiene
sources: [{name: docs, table: documents}, {name: bench, table: benchmarks}]
steps:
  - {name: nd, op: minhash_dedup, input: docs, params: {id: doc_id, text: text, minJaccard: 0.5}}
  - {name: dc, op: decontaminate, params: {id: doc_id, text: text, benchFrom: bench, n: 5}}
  - {name: o, op: sort, params: {by: [doc_id]}}
""", resolveH).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 3L))
    // flag modes expose the underlying verdicts
    val clusters = Pipeline.result(spark, """
entity: hygiene_flag
sources: [{name: docs, table: documents}]
steps:
  - {name: nd, op: minhash_dedup, params: {id: doc_id, text: text, minJaccard: 0.5, mode: flag}}
""", resolveH).orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.toSeq === Seq((1L, 1L), (2L, 1L)))
    val flagged = Pipeline.result(spark, """
entity: decon_flag
sources: [{name: docs, table: documents}, {name: bench, table: benchmarks}]
steps:
  - {name: dc, op: decontaminate, input: docs, params: {id: doc_id, text: text, benchFrom: bench, n: 5, mode: flag}}
""", resolveH).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.toSeq === Seq((4L, 1L)))
    // span_scrub (variable) rewrites text in place, matching the operator
    val ps = (1 to 9).map(i => s"P$i")
    val spanDocs = Seq(
      (1L, "z " + ps.drop(1).mkString(" ")),
      (2L, ps.mkString(" ")),
      (3L, ps.take(8).mkString(" ") + " q")).toDF("doc_id", "text")
    val scrubbed = Pipeline.result(spark, """
entity: scrub
sources: [{name: docs, table: documents}]
steps:
  - {name: sc, op: span_scrub, params: {id: doc_id, text: text, spanLen: 8, mode: variable}}
  - {name: o, op: sort, params: {by: [doc_id]}}
""", { case "documents" => spanDocs; case t => fail(s"unexpected $t") })
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val want = graft.operators.Dedup
      .spanScrubVar(spanDocs, "doc_id", "text", minLen = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed === want)
    // bpe_count annotates the trainer-real token budget (== Bpe.encode)
    val counted = Pipeline.result(spark, """
entity: budget
sources: [{name: docs, table: documents}]
steps:
  - {name: bc, op: bpe_count, params: {id: doc_id, text: text, merges: 4}}
""", resolveH).select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantCounts = graft.operators.Bpe.encode(
        corpus, "doc_id", "text", graft.operators.Bpe.train(corpus, "text", 4))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(counted === wantCounts)
  }

  test("longest_dup and suffix_array steps match their operators") {
    // the minLen-tuning diagnostic producible from CONFIG (round-14
    // verdict task 6): spec-step output must be the operator verbatim
    val ps = (1 to 9).map(i => s"D$i")
    val docs = Seq(
      (1L, "z " + ps.mkString(" ")),
      (2L, ps.mkString(" ") + " q"),
      (3L, "solo words only here nothing shared")).toDF("doc_id", "text")
    val resolve: String => org.apache.spark.sql.DataFrame = {
      case "documents" => docs; case t => fail(s"unexpected $t")
    }
    val report = Pipeline.result(spark, """
entity: dup_diag
sources: [{name: docs, table: documents}]
steps:
  - {name: ld, op: longest_dup, params: {id: doc_id, text: text, rounds: 5}}
""", resolve).collect().map(_.toSeq).toSet
    val wantReport = graft.operators.Dedup
      .longestDuplicate(docs, "doc_id", "text", rounds = 5)
      .collect().map(_.toSeq).toSet
    assert(report === wantReport)
    val ranks = Pipeline.result(spark, """
entity: sa
sources: [{name: docs, table: documents}]
steps:
  - {name: sr, op: suffix_array, params: {id: doc_id, text: text, rounds: 5}}
""", resolve).collect().map(_.toSeq).toSet
    val wantRanks = graft.operators.Dedup
      .suffixRanks(docs, "doc_id", "text", rounds = 5)
      .collect().map(_.toSeq).toSet
    assert(ranks === wantRanks)
  }

  test("streaming specs refuse corpus-aggregating hygiene ops with the reason") {
    val dir = s"/tmp/graft-pipe-aggops-${System.nanoTime()}"
    val pages = Seq((1L, "https://h.example/p", "<html><body><p>x</p></body></html>"))
      .toDF("doc_id", "url", "html")
    graft.sources.Warc.writeFiles(pages, "url", "html", dir)
    Seq("minhash_dedup", "span_scrub", "decontaminate", "bpe_count",
        "longest_dup", "suffix_array").foreach { op =>
      val ex = intercept[IllegalArgumentException] {
        Pipeline.resultStream(spark, s"""
entity: bad
mode: streaming
sources: [{name: crawl, table: "$dir/*.warc.gz", format: warc}]
steps:
  - {name: s, op: $op, params: {id: doc_id, text: html}}
""", t => fail(s"unexpected table $t"))
      }
      assert(ex.getMessage.contains("aggregates"),
        s"$op: expected the corpus-aggregation reason, got: ${ex.getMessage}")
      assert(ex.getMessage.contains("StreamOps"), s"$op: no incremental-twin pointer")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }
}
