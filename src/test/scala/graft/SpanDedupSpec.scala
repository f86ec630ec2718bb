package graft

import graft.core.Sketch
import graft.text.{Sharding, SpanDedup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the round-3 corpus ops: exact-substring (n-gram span)
  * dedup, Count-Min heavy hitters, deterministic dataset split and
  * weighted sampling.
  */
class SpanDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    df("doc_id BIGINT, text STRING",
      rows.map { case (i, t) => Row(i, t) })

  test("duplicatedSpans: cross-doc duplicate marks the mirrored span " +
      "in BOTH docs; unique docs absent") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 tokens
    val d = docs(
      1L -> s"a b c $shared x y",
      2L -> s"p q $shared",
      3L -> "totally unique text with no repeated windows at all")
    val out = SpanDedup.duplicatedSpans(d, "doc_id", "text", n = 8)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: shared = tokens 3..12 -> dup 8-windows start at 3,4,5
    //        (window must sit fully inside the shared run) -> span 3..12
    // doc 2: shared = tokens 2..11 -> span 2..11
    assert(out.toSeq == Seq((1L, 3L, 12L), (2L, 2L, 11L)))
  }

  test("duplicatedSpans: WITHIN-doc repetition counts (corpus-wide " +
      "count >= 2 includes one doc repeating itself)") {
    val run = (1 to 8).map(i => s"w$i").mkString(" ")
    val d = docs(7L -> s"$run mid1 mid2 mid3 $run")
    val out = SpanDedup.duplicatedSpans(d, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 8-token run appears twice: starts 0 and 11 -> two spans
    // (gap 11 > n, so they do NOT merge)
    assert(out.toSet == Set((7L, 0L, 7L), (7L, 11L, 18L)))
  }

  test("duplicatedSpans: overlapping and adjacent windows merge into " +
      "one maximal span") {
    // doc 1 and 2 share a 12-token run: dup windows start at
    // 0..4 in doc 1 -> consecutive starts (gap 1 <= n) merge to 0..11
    val shared = (1 to 12).map(i => s"m$i").mkString(" ")
    val d = docs(1L -> shared, 2L -> s"$shared tail1 tail2")
    val out = SpanDedup.duplicatedSpans(d, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 0L, 11L), (2L, 0L, 11L)))
  }

  test("duplicationRatio: full-tail twin scores 1.0, partial overlap " +
      "in (0,1), unique doc 0.0, short docs absent") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a b c $shared",    // 6 of 6 windows? no: 13 tokens -> 6 windows, 3 dup
      2L -> shared,              // 3 windows, all dup -> 1.0
      3L -> "totally unique text with no repeated windows at all",
      4L -> "too short")
    val out = SpanDedup.duplicationRatio(d, "doc_id", "text", 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!out.contains(4L)) // 2 tokens: no windows
    assert(out(2L) == ((3L, 3L, 1.0)))
    val (w1, d1, r1) = out(1L)
    assert(w1 == 6L && d1 == 3L && r1 == 0.5)
    assert(out(3L)._3 == 0.0)
  }

  test("removeDuplicatedSpans: covered tokens cut, text re-joined, " +
      "fully-duplicated doc survives as empty string") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a b c $shared x y",
      2L -> shared, // fully covered
      3L -> "totally unique text with no repeated windows at all")
    val out = SpanDedup
      .removeDuplicatedSpans(d, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, "a b c x y"),
      (2L, 10L, ""),
      (3L, 0L, "totally unique text with no repeated windows at all")))
  }

  test("removeDuplicatedSpans: null doc_id and null text are " +
      "accounted, not reported fully-removed") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(null, "alpha beta gamma"),
      Row(2L, null),
      Row(3L, "plain unique text")))
    val out = SpanDedup.removeDuplicatedSpans(d, "doc_id", "text", 8)
      .collect()
      .map(r => ((if (r.isNullAt(0)) -1L else r.getLong(0)),
        r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (-1L, 0L, "alpha beta gamma"), // null id: nothing removed
      (2L, 0L, ""),                  // null text: 0 tokens, not -1
      (3L, 0L, "plain unique text")))
  }

  test("string ids are rejected up front by the TopKBy-carried " +
      "samplers instead of silently emptying") {
    val d = df("g STRING, id STRING, w DOUBLE",
      Seq(Row("a", "doc-1", 1.0)))
    val e = intercept[IllegalArgumentException] {
      Sharding.weightedSamplePerGroup(d, "g", "id", "w", 5)
    }
    assert(e.getMessage.contains("integral id"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.GroupOps.topKPerGroup(d, Seq("g"), "w", "id", 5)
    }
    assert(e2.getMessage.contains("integral id"))
  }

  test("TopKBuffer: -0.0 and 0.0 tie (SQL semantics), smaller id wins") {
    val b = new graft.functions.TopKBuffer(2)
    b.insert(0.0, 7L)
    b.insert(-0.0, 3L)
    b.insert(-1.0, 1L)
    // both zeros kept (k=2), ordered by the id tie-break — without
    // -0.0 canonicalization the heap's total order ranked -0.0 below
    // 0.0 and id 7 outranked id 3
    assert(b.sorted.toSeq == Seq((0.0, 3L), (0.0, 7L)))
  }

  test("removeDuplicatedSpans is consistent with duplicatedSpans " +
      "coverage on a generated corpus") {
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => s"t${(i * 7 + j * 3) % 50}")
        .mkString(" "))
    }
    val d = docs(base: _*)
    val spans = SpanDedup.duplicatedSpans(d, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val removed = SpanDedup
      .removeDuplicatedSpans(d, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val covByDoc = spans.groupBy(_._1).view
      .mapValues(_.map { case (_, a, b) => b - a + 1 }.sum).toMap
    assert(base.forall { case (id, _) =>
      removed(id) == covByDoc.getOrElse(id, 0L) })
  }

  test("round-6 rewrites match the relational reference forms: " +
      "removeDuplicatedSpans kernel == anti-join+collect_list, " +
      "duplicationRatio totals projection == gram aggregation") {
    // generated corpus with real duplication + every edge shape the
    // old forms handled: null id, null text, empty text, short doc,
    // doc with consecutive spaces, fully-duplicated doc
    val shared = (1 to 12).map(i => s"m$i").mkString(" ")
    val base: Seq[Row] = (0 until 30).map { i =>
      Row(i.toLong, (0 until 25).map(j => s"t${(i * 5 + j * 3) % 40}")
        .mkString(" "))
    } ++ Seq(
      Row(100L, shared), Row(101L, s"pre1 pre2 $shared post"),
      Row(102L, null), Row(103L, ""), Row(104L, "short doc"),
      Row(105L, s"a  b $shared"), Row(null, s"x y $shared z"))
    val d = df("doc_id BIGINT, text STRING", base)
    val n = 8
    // --- reference: the pre-round-6 removeDuplicatedSpans ---
    val toks = d.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("__pos", "__t")))
    val spans = SpanDedup.duplicatedSpans(d, "doc_id", "text", n)
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("span_start"), col("span_end"))).as("__pos"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "__pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__t")))),
          e => e.getField("__t"))).as("clean_text"))
      .withColumnRenamed("doc_id", "__kd")
    val refRemove = d.select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long"))
          .as("__total"))
      .join(kept, col("doc_id") <=> col("__kd"), "left")
      .select(col("doc_id"),
        (col("__total") - coalesce(col("__kept"), lit(0L)))
          .as("n_tokens_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getString(2))).toSet
    val gotRemove = SpanDedup
      .removeDuplicatedSpans(d, "doc_id", "text", n)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getString(2))).toSet
    assert(gotRemove == refRemove)
    // --- reference: per-doc totals as a gram aggregation ---
    val refTotals = d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("__pos", "__t")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
      .filter(col("n_toks") >= n)
      .select(col("doc_id"), (col("n_toks") - (n - 1)).as("n_windows"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        r.getLong(1)).toMap
    val gotRatio = SpanDedup.duplicationRatio(d, "doc_id", "text", n)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        r.getLong(1)).toMap
    assert(gotRatio == refTotals)
  }

  test("cms: estimate >= true count always, exact when width kills " +
      "collisions, and null items are skipped") {
    val items = df("item STRING",
      (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"cold$i") ++
        Seq(null)).map(Row(_)))
    val narrow = Sketch.cmsCounters(items, "item", depth = 4, width = 8)
    val estN = Sketch.cmsEstimate(narrow, items, "item", 4, 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val truth = items.filter(col("item").isNotNull)
      .groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(truth.forall { case (k, n) => estN(k) >= n })
    // total counter mass per row d == total items (sanity of the matrix)
    val mass = narrow.groupBy("d").agg(sum("cnt").as("m"))
      .collect().map(r => r.getDouble(1)).toSet
    assert(mass == Set(80.0))
    val wide = Sketch.cmsCounters(items, "item", depth = 4, width = 1 << 16)
    val estW = Sketch.cmsEstimate(wide, items, "item", 4, 1 << 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(estW == truth.view.mapValues(_.toDouble).toMap) // no collisions
    // fractional weights count exactly (double counters — a long cast
    // would truncate 0.5 to 0 and invert the over-count guarantee)
    val frac = Sketch.cmsCounters(items, "item", 4, 1 << 16,
      weight = lit(0.5))
    val estF = Sketch.cmsEstimate(frac, items, "item", 4, 1 << 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(estF("hot") == 25.0 && estF("cold1") == 0.5)
  }

  test("hashSplit: total, deterministic, subset-invariant, " +
      "null id -> null split") {
    val d = df("doc_id BIGINT", ((1L to 1000L).map(Row(_)) :+
      Row(null)))
    val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)
    val out = Sharding.hashSplit(d, "doc_id", "s1", cuts)
    val byId = out.collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0)) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(byId(null.asInstanceOf[Any]) == null)
    val counts = out.filter(col("split").isNotNull)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)
    // hash split is close to the requested proportions
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 150)
    // subset invariance: the same id gets the same split in a
    // half-sized corpus (randomSplit CANNOT promise this)
    val half = Sharding.hashSplit(
      d.filter(col("doc_id") <= 500), "doc_id", "s1", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(half.forall { case (id, s) => byId(id) == s })
    // a different salt reshuffles at least some assignments
    val resalted = Sharding.hashSplit(d, "doc_id", "s2", cuts)
      .filter(col("doc_id").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(resalted.exists { case (id, s) => byId(id) != s })
  }

  test("scrubPii: counts + typed placeholders, clean rows untouched, " +
      "null text stays null") {
    import graft.text.TextOps
    val d = df("id BIGINT, text STRING", Seq(
      Row(1L, "mail a.b-c%d@ex-ample.co.uk or x@y.io now"),
      Row(2L, "call 555-867-5309 or 555.867.0001 from 10.0.0.1"),
      Row(3L, "nothing sensitive here"),
      Row(4L, null),
      // nested: the email CONTAINS a phone-shaped substring — it must
      // be redacted once (as the email) and counted once
      Row(5L, "ping 555-867-5309@corp.example.com ok")))
    val out = TextOps.scrubPii(d, "text").orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(out(0) == ((1L, 2L, "mail <EMAIL> or <EMAIL> now")))
    assert(out(1) == ((2L, 3L, "call <PHONE> or <PHONE> from <IP>")))
    assert(out(2) == ((3L, 0L, "nothing sensitive here")))
    assert(out(3) == ((4L, -1L, null)))
    assert(out(4) == ((5L, 1L, "ping <EMAIL> ok")))
  }

  test("mixtureSample: keep rates honor budget*share/tokens, cap at " +
      "1 for under-represented strata, unlisted strata dropped") {
    import graft.text.TextOps
    val rows = (1L to 600L).map { i =>
      val g = if (i <= 400) "big" else if (i <= 590) "small" else "out"
      Row(g, i, 100L)
    }
    val d = df("g STRING, id BIGINT, tok BIGINT", rows)
    // budget 20000 at big 0.5 / small 0.5:
    //   big: 400 docs x 100 tok = 40000 -> rate 10000/40000 = 0.25
    //   small: 190 x 100 = 19000 -> rate 10000/19000 -> capped? no, 0.526
    val out = TextOps.mixtureSample(d, "g", "id", "tok",
      Map("big" -> 0.5, "small" -> 0.5), tokenBudget = 20000L)
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("out"))
    // hash-sample tolerance ~ 3 sigma
    assert(math.abs(counts("big") - 100L) < 40)
    assert(math.abs(counts("small") - 100L) < 40)
    // a stratum smaller than its target keeps EVERYTHING (rate 1)
    val tiny = TextOps.mixtureSample(d, "g", "id", "tok",
      Map("small" -> 1.0), tokenBudget = 1000000L)
    assert(tiny.count() == 190L)
    // determinism: same call -> same rows
    assert(out.collect().map(_.getLong(1)).toSet ==
      TextOps.mixtureSample(d, "g", "id", "tok",
        Map("big" -> 0.5, "small" -> 0.5), 20000L)
        .collect().map(_.getLong(1)).toSet)
  }

  test("dsir: importance table is total (width rows) and the sample " +
      "prefers target-shaped documents decisively") {
    import graft.text.Dsir
    // population A speaks the target's vocabulary; population B does
    // not appear in the target at all
    val aText = (1 to 50).map(i => s"alpha${i % 7}").mkString(" ")
    val bText = (1 to 50).map(i => s"zulu${i % 7}").mkString(" ")
    val source = df("doc_id BIGINT, text STRING",
      ((1L to 30L).map(i => Row(i, aText)) ++
        (31L to 60L).map(i => Row(i, bText))))
    val target = df("doc_id BIGINT, text STRING",
      Seq(Row(100L, aText), Row(101L, aText)))
    val table = Dsir.importanceTable(target, source, "text", 64)
    assert(table.count() == 64)
    // the Gumbel noise (±~2e7 micro) is far below the ~2e8-micro gap
    // between an A doc and a B doc, so the top 30 are EXACTLY the A docs
    val out = Dsir.dsirSample(source, target, "doc_id", "text",
      width = 64, k = 30).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 30)
    assert(out.forall(_._2 <= 30L))
    assert(out.map(_._1).sorted.toSeq == (1 to 30))
    // every A doc shares one text -> one exact integer score
    assert(out.map(_._3).distinct.length == 1)
    // k beyond the corpus returns everything
    assert(Dsir.dsirSample(source, target, "doc_id", "text", 64,
      k = 500).count() == 60)
  }

  test("weightedSamplePerGroup: exactly min(k,|group|) distinct ids, " +
      "non-positive/null weights never sampled, matches the window " +
      "formulation") {
    val rows = (1L to 300L).map { i =>
      Row(s"g${i % 3}", i, (i % 7 + 1).toDouble)
    } ++ Seq(Row("g0", 1001L, 0.0), Row("g0", 1002L, -5.0),
      Row("g0", 1003L, null), Row("tiny", 2001L, 3.0))
    val d = df("g STRING, id BIGINT, w DOUBLE", rows)
    val out = Sharding.weightedSamplePerGroup(d, "g", "id", "w", k = 10)
    val got = out.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perGroup = got.groupBy(_._1)
    assert(perGroup("g0").length == 10 &&
      perGroup("tiny").toSeq == Seq(("tiny", 1, 2001L)))
    assert(got.map(_._3).distinct.length == got.length) // no replacement
    assert(!got.exists(t => t._3 >= 1001L && t._3 <= 1003L))
    // equivalence with the row_number-over-key window
    val u = (expr("conv(substring(md5(concat(cast(id as string), " +
      "'#', 'es')), 1, 15), 16, 10)").cast("long") + 1L)
      .cast("double") / lit(1152921504606846976.0)
    val key = round(log(u) / col("w"), 9)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("__key").desc, col("id"))
    val expected = d
      .filter(col("id").isNotNull && col("w") > 0)
      .withColumn("__key", key)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= 10)
      .select(col("g"), col("__rn").cast("int"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == expected.toSet)
  }

  test("temperatureMixtureSample: alpha=1 proportional, alpha<1 " +
      "upweights low-resource strata, deterministic") {
    import graft.text.TextOps
    val rows = (1L to 1100L).map { i =>
      val g = if (i <= 1000) "big" else "small"
      Row(g, i, 100L)
    }
    val d = df("g STRING, id BIGINT, tok BIGINT", rows)
    // alpha=1: shares proportional to mass -> every stratum keeps the
    // same rate budget/total (here 55000/110000 = 0.5)
    val prop = TextOps.temperatureMixtureSample(d, "g", "id", "tok",
      alpha = 1.0, tokenBudget = 55000L)
    val pc = prop.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(pc("big") - 500L) < 60, pc.toString)
    assert(math.abs(pc("small") - 50L) < 25, pc.toString)
    // alpha=0.5: sqrt temperature — small's share rises from 1/11
    // (9.1%) to sqrt(10000)/(sqrt(100000)+sqrt(10000)) = 24.0%, so
    // small keeps ~55000*0.24/10000 = ~132% -> capped at ALL 100 docs
    val temp = TextOps.temperatureMixtureSample(d, "g", "id", "tok",
      alpha = 0.5, tokenBudget = 55000L)
    val tc = temp.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tc("small") == 100L, tc.toString) // rate capped at 1.0
    assert(math.abs(tc("big") - 418L) < 60, tc.toString) // 0.418 rate
    // determinism
    assert(temp.collect().map(_.getLong(1)).toSet ==
      TextOps.temperatureMixtureSample(d, "g", "id", "tok",
        0.5, 55000L).collect().map(_.getLong(1)).toSet)
    // a stratum with only null token mass has no share: silently
    // dropped (the mixtureSample convention), not an NPE
    val withNull = df("g STRING, id BIGINT, tok BIGINT",
      (1L to 20L).map(i => Row("ok", i, 100L)) ++
        (21L to 25L).map(i => Row("nulls", i, null)))
    val nn = TextOps.temperatureMixtureSample(withNull, "g", "id",
      "tok", 0.5, 10000L)
    assert(nn.filter(col("g") === "nulls").count() == 0L)
    assert(nn.filter(col("g") === "ok").count() == 20L) // rate capped 1
  }
}
