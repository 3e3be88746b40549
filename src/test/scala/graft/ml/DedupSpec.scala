package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "THE  quick brown fox jumps over the lazy dog"), // exact dup of 1 (norm)
    (4L, "completely different words entirely unrelated content here"),
  ).toDF("doc_id", "text")

  test("exactGroups collapses case/whitespace variants") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length == 3)
    val dup = g.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }

  test("jaccardPairs finds near-dups above threshold, no cartesian pairs") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
    val pairs = p.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // 1-2 and 2-3 share 6/8 shingles (j=0.6); 1-3 identical after case-norm?
    // no — shingles are case-sensitive ("THE quick brown" != "the quick brown")
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    p.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("lshPairs finds the same high-jaccard pairs as the exact scan") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.lshPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at j>=0.7 band-collision probability is ~1; sets must agree here
    assert(lsh == exact)
  }

  test("simhash32 is stable and near-dups differ in few bits") {
    val s = docs.select(col("doc_id"), Dedup.simhash32(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(2L)) < hamming(s(1L), s(4L)))
    assert(s.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("native simhash kernel equals the per-bit HOF formulation") {
    // the reference formulation the one-pass kernel replaced: 32 aggregate
    // HOFs over transform(tokens, hash60) — kept here as the semantic spec
    def hofSimhash(text: org.apache.spark.sql.Column) = {
      val hs = transform(TextAnalysis.tokens(text), t => Dedup.hash60(t))
      (0 until 32).map { j =>
        val bitSum = aggregate(hs, lit(0L),
          (acc, x) => acc + (shiftright(x, j).bitwiseAND(lit(1L)) * 2 - 1))
        when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val rows = docs
      .withColumn("extra", lit("  multi   spaced  tökens 😀  "))
      .select(
        Dedup.simhash32(col("text")).as("native"),
        hofSimhash(col("text")).as("hof"),
        Dedup.simhash32(col("extra")).as("native2"),
        hofSimhash(col("extra")).as("hof2"),
        Dedup.simhash32(lit("")).as("native_empty"),
        hofSimhash(lit("")).as("hof_empty"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getLong(4) == r.getLong(5) && r.getLong(4) == 0L)
    }
  }

  test("maxShingleFreq drops stop-shingles from the join key") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.0,
      maxShingleFreq = Some(1L)).collect()
    assert(p.isEmpty) // every shared shingle occurs in >1 doc by definition
  }

  test("prefix-filtered jaccard matches the plain shingle join exactly") {
    for (t <- Seq(0.3, 0.5, 0.7)) {
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val plain = key(Dedup.jaccardPairs(docs, "doc_id", "text", threshold = t))
      val pref = key(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", threshold = t))
      assert(pref == plain, s"threshold $t")
    }
  }

  test("clusters: min-label propagation finds connected components") {
    import spark.implicits._
    // components: {1,2,3,9} via chain 9-3, 3-2, 2-1; {5,7}; {10,11}
    val pairs = Seq((2L, 1L), (3L, 2L), (9L, 3L), (5L, 7L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: chain longer than one round still converges") {
    import spark.implicits._
    // a path 0-1-2-...-7: worst case for label propagation (diameter 7)
    val pairs = (0L until 7L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).collect()
    assert(out.forall(_.getLong(1) == 0L) && out.length == 8)
  }

  test("clusters on empty pairs is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(empty).collect().isEmpty)
  }

  test("containmentPairs is directed: subset qualifies, superset does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),                         // contained in 2
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),  // superset
      (3L, "totally different words here entirely"))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(docs, "id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1's two 3-grams both occur in doc 2 → containment(1→2)=1.0;
    // doc 2 has 6 shingles, only 2 shared → containment(2→1)=1/3 < 0.8
    assert(out == Set((1L, 2L)))
  }

  test("contamination finds train docs overlapping benchmark n-grams") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val train = Seq(
      (1L, "a quick brown fox jumps over my fence"), // shares 2 distinct 4-grams
      (2L, "completely unrelated text about databases here"),
      (3L, "the quick brown fox jumps over the lazy dog today")) // near copy
      .toDF("id", "text")
    val out = Dedup.contamination(train, bench, "id", "text",
        n = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out.map(_._1).toSet == Set(1L, 3L))
    val byId = out.map(t => t._1 -> t._3).toMap
    assert(byId(3L) > byId(1L)) // the near copy shares far more n-grams
  }

  test("contaminationBloom matches exact contamination (no false negatives)") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (200L, "pack my box with five dozen liquor jugs"))
      .toDF("id", "text")
    val train = Seq(
      (1L, "a quick brown fox jumps over my fence"),
      (2L, "completely unrelated text about databases here"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "please pack my box with five dozen roses"))
      .toDF("id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = key(Dedup.contamination(train, bench, "id", "text",
      n = 4, minShared = 2L))
    val bloom = key(Dedup.contaminationBloom(train, bench, "id", "text",
      n = 4, minShared = 2L, expectedItems = 1000L))
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("contaminationBloom prefilter is the codegen'd might_contain, not a UDF") {
    import spark.implicits._
    val bench = Seq((100L, "one two three four five")).toDF("id", "text")
    val train = Seq((1L, "zero one two three four five six")).toDF("id", "text")
    val plan = Dedup.contaminationBloom(train, bench, "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("editDistancePairs: blocked comparison finds near-identical texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the quick brown fox"),
      (2L, "en", "the quick brown cat"),   // same block, dist 3
      (3L, "en", "a different opening"),   // different block
      (4L, "de", "the quick brown fox"))   // same text, different lang block
      .toDF("id", "lang", "text")
    val out = Dedup.editDistancePairs(docs, "id", "text", Seq("lang"),
        blockLen = 8, compareLen = 80, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L)))
    // maxBlockSize drops the oversized block but keeps the rest intact
    val capped = Dedup.editDistancePairs(
      docs.union(Seq((5L, "en", "the quick brown dog")).toDF("id", "lang", "text")),
      "id", "text", Seq("lang"), blockLen = 8, compareLen = 80, maxDist = 5,
      maxBlockSize = Some(2L))
    assert(capped.count() == 0) // the en "the quic" block now has 3 rows
  }

  test("editDistancePairs: the adaptive default cap drops a mega-block, " +
      "healthy blocks are untouched") {
    import spark.implicits._
    // 1500 docs sharing one (lang, 8-char-prefix) block — over the
    // adaptive bound (64 × median-of-1 block size, floored at 1000) —
    // plus 600 singleton-block docs and one healthy near-dup pair.
    // Without the default cap the mega-block contributes ~1.1M
    // Levenshtein pairs; with it, zero.
    val mega = (0L until 1500L).map(i =>
      (i, "en", s"boilerplate cookie banner text variant number $i"))
    val singles = (0L until 600L).map(i =>
      (10000L + i, "en", s"u$i distinct opening line"))
    val pair = Seq(
      (50000L, "en", "zzyzx road trip report from the desert"),
      (50001L, "en", "zzyzx road trip report from the dessert"))
    val docs = (mega ++ singles ++ pair).toDF("id", "lang", "text")
    val out = Dedup.editDistancePairs(docs, "id", "text", Seq("lang"),
        blockLen = 8, compareLen = 80, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!out.exists { case (a, b) => a < 1500L && b < 1500L },
      "mega-block pairs must be dropped by the adaptive default cap")
    assert(out.contains((50000L, 50001L)),
      "healthy-block near-dup must survive")
  }

  test("clusters: distributed path matches driver union-find path") {
    import spark.implicits._
    // mixed shapes: a chain, a clique edge set, singleton pairs
    val pairs = (Seq((2L, 1L), (3L, 2L), (9L, 3L), (5L, 7L), (10L, 11L)) ++
      (0L until 7L).map(i => (i + 20L, i + 21L))).toDF("id_a", "id_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = m(Dedup.clusters(pairs))
    val dist = m(Dedup.clusters(pairs, driverMaxEdges = -1L))
    assert(local == dist)
  }

  test("duplicateSpans finds cross-doc k-token windows, skips within-doc repeats") {
    import spark.implicits._
    val passage = "one two three four" // shared 4-token passage
    val docs = Seq(
      (1L, s"alpha $passage beta"),
      (2L, s"gamma delta $passage"),
      (3L, s"solo text with no sharing here"),
      (4L, "rep rep rep rep rep rep")). // within-doc repeat only
      toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(docs, k = 4).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((passage, 2L, 2L, 1L)))
  }

  test("jaccardAgainstReference finds only new-vs-ref pairs") {
    import spark.implicits._
    val refDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different reference text lives here now")).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of ref 1
      (11L, "the quick brown fox jumps over the lazy dog"), // dup of ref 1 AND 10
      (12L, "novel content with no reference overlap at all")).toDF("doc_id", "text")
    val r = Dedup.jaccardAgainstReference(newDocs, refDocs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("new_id", "ref_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    // 10-11 are near-dups of each other but that pair must NOT appear:
    // bipartite means new x ref only
    assert(r.toSeq == Seq((10L, 1L), (11L, 1L)))
  }

  test("maximalDuplicateSpans coalesces overlapping windows into one passage") {
    import spark.implicits._
    // 6 shared tokens -> three overlapping 4-token windows in each doc,
    // which must merge into ONE maximal passage [start, start+5]
    val passage = "p1 p2 p3 p4 p5 p6"
    val docs = Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"$passage trailer text here"),
      (3L, s"unrelated words only in this document")).toDF("doc_id", "text")
    val r = Dedup.maximalDuplicateSpans(docs, k = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4))).sortBy(x => (x._1, x._2))
    assert(r.toSeq == Seq(
      (1L, 2L, 7L, 3L, passage),
      (2L, 1L, 6L, 3L, passage)))
  }

  test("removeDuplicateSpans splices passages out, passes clean docs through") {
    import spark.implicits._
    val passage = "p1 p2 p3 p4 p5 p6"
    val docs = Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"$passage trailer text here"),
      (3L, s"unrelated words only in this document")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(docs, k = 4).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getString(3)))
    assert(r.toSeq == Seq(
      (1L, 1L, 6L, "alpha omega"),
      (2L, 1L, 6L, "trailer text here"),
      (3L, 0L, 0L, "unrelated words only in this document")))
    // a fully-duplicated doc cleans to the empty string
    val full = Seq((1L, passage.split(" ").take(4).mkString(" ")),
      (2L, passage.split(" ").take(4).mkString(" ")))
      .toDF("doc_id", "text")
    val fr = Dedup.removeDuplicateSpans(full, k = 4).orderBy("doc_id")
      .collect()
    assert(fr.forall(_.getString(3) == ""))
    assert(fr.forall(_.getLong(2) == 4L))
  }

  test("removeDuplicateSpans keepCanonical retains exactly one copy (Lee 2022)") {
    import spark.implicits._
    val passage = "p1 p2 p3 p4 p5 p6"
    val docs = Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"$passage trailer text here"),
      (3L, s"prefix words $passage")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(docs, k = 4, keepCanonical = true)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(3)))
    // the lowest (doc_id, start) occurrence — doc 1 — keeps its copy;
    // later occurrences are spliced out
    assert(r.toSeq == Seq(
      (1L, s"alpha $passage omega"),
      (2L, "trailer text here"),
      (3L, "prefix words")))
    // the passage text survives exactly once across the cleaned corpus
    val joined = r.map(_._2).mkString(" | ")
    assert(joined.indexOf(passage) == joined.lastIndexOf(passage))
    assert(joined.contains(passage))
  }

  test("maximalDuplicateSpans keeps disjoint duplicated passages separate") {
    import spark.implicits._
    val a = "a1 a2 a3 a4"
    val b = "b1 b2 b3 b4"
    // gap of >k tokens between the two shared passages in doc 1
    val docs = Seq(
      (1L, s"$a x1 x2 x3 x4 x5 $b"),
      (2L, s"$a y1 y2 and then unrelated"),
      (3L, s"lead in tokens here $b")).toDF("doc_id", "text")
    val r = Dedup.maximalDuplicateSpans(docs, k = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(4)))
      .sortBy(x => (x._1, x._2))
    assert(r.toSeq == Seq(
      (1L, 1L, 4L, a), (1L, 10L, 13L, b),
      (2L, 1L, 4L, a), (3L, 5L, 8L, b)))
  }

  test("exactKeepBest keeps max-score variant, min id on ties") {
    import spark.implicits._
    val d = Seq(
      (1L, "same content", 10L), // dup group: 1,2,3
      (2L, "Same  Content", 30L), // best score -> kept
      (3L, "SAME CONTENT", 30L), // tied score, higher id -> dropped
      (9L, "unique", 5L),
    ).toDF("doc_id", "text", "q")
    val r = Dedup.exactKeepBest(d, "doc_id", "text", score = col("q"))
      .collect().map(x => (x.getAs[Long]("keep_id"), x.getAs[Long]("score"),
        x.getAs[Long]("dup_count"))).toSet
    assert(r == Set((2L, 30L, 3L), (9L, 5L, 1L)))
  }

  test("lineDedup strips corpus-wide boilerplate lines, preserves order") {
    import spark.implicits._
    val d = Seq(
      (1L, "unique alpha\nCOOKIE  banner\nunique beta"),
      (2L, "cookie banner\nsecond body line"),
      (3L, "cookie banner\nthird doc text\ncookie banner"),
      (4L, "Cookie Banner"), // all-boilerplate -> doc removed
    ).toDF("doc_id", "text")
    // "cookie banner" normalizes identically in 4 docs; threshold 2
    val r = Dedup.lineDedup(d, "doc_id", "text", maxDocFreq = 2L)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[String]("clean_text"), x.getAs[Long]("kept_lines"),
        x.getAs[Long]("dropped_lines"))).toSet
    assert(r == Set(
      (1L, "unique alpha\nunique beta", 2L, 1L),
      (2L, "second body line", 1L, 1L),
      (3L, "third doc text", 1L, 2L)))
  }

  test("lineDedupKeepFirst: duplicated line survives only at its first " +
      "occurrence (CCNet)") {
    import spark.implicits._
    val d = Seq(
      (1L, "shared quote\nown text one"),
      (2L, "own text two\nShared  Quote"), // normalized dup, later doc
      (3L, "shared quote"))                // all-duplicate -> doc removed
    .toDF("doc_id", "text")
    val r = Dedup.lineDedupKeepFirst(d, "doc_id", "text")
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[String]("clean_text"), x.getAs[Long]("kept_lines"),
        x.getAs[Long]("dropped_lines"))).toSet
    assert(r == Set(
      (1L, "shared quote\nown text one", 2L, 0L),
      (2L, "own text two", 1L, 1L)))
  }

  test("lineDedup keeps legitimately repeated lines under the threshold") {
    import spark.implicits._
    val d = Seq(
      (1L, "shared quote\nown text one"),
      (2L, "shared quote\nown text two"),
    ).toDF("doc_id", "text")
    val r = Dedup.lineDedup(d, "doc_id", "text", maxDocFreq = 2L)
      .collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Long]("dropped_lines") == 0L))
    assert(r.forall(_.getAs[String]("clean_text").startsWith("shared quote\n")))
  }
}
