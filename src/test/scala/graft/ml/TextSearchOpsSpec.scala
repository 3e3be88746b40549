package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-13 search-surface operators on the persisted text index:
  * batched facet panels, snippet windows, the SymSpell fuzzy-term
  * dictionary, more-like-this, and corpus collocations.
  */
class TextSearchOpsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  // ---------------------------------------------------------------- facets

  private val facetDocs = Seq(
    (0L, "fox dog", "en"), (1L, "fox", "en"),
    (2L, "dog", "de"), (3L, "cat", "de"), (4L, "bird", "fr"))
    .toDF("doc_id", "text", "lang")

  test("facetCountsBatch matches per-query facetCounts and respects deletes") {
    val idx = tmp("fctidx")
    TextIndex.saveTextIndex(facetDocs, "doc_id", "text", idx,
      numBuckets = 4, attrCols = Seq("lang"))
    val qs = Seq((0L, "fox"), (1L, "dog"), (1L, "cat")).toDF("q_id", "term")
    val batch = TextIndex.facetCountsBatch(spark, idx, qs, "lang")
      .orderBy($"q_id", $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(batch == Seq((0L, "en", 2L), (1L, "de", 2L), (1L, "en", 1L)))
    // parity with N single-query panels
    for ((qid, ts) <- Seq(0L -> Seq("fox"), 1L -> Seq("dog", "cat"))) {
      val single = TextIndex.facetCounts(spark, idx, ts, "lang")
        .orderBy($"lang")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(single == batch.filter(_._1 == qid).map(t => (t._2, t._3)))
    }
    // a deleted doc leaves every panel it matched
    TextIndex.deleteFromTextIndex(spark, idx, Seq(0L).toDF("doc_id"), "doc_id")
    val after = TextIndex.facetCountsBatch(spark, idx, qs, "lang")
      .orderBy($"q_id", $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(after == Seq((0L, "en", 1L), (1L, "de", 2L)))
  }

  test("facetMetrics: per-facet exact sums over deduped matching docs") {
    val docs = Seq(
      (0L, "fox dog", "en", 10L), (1L, "fox", "en", 5L),
      (2L, "dog", "de", 7L), (3L, "cat", "de", 100L))
      .toDF("doc_id", "text", "lang", "n")
    val idx = tmp("fmidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4,
      attrCols = Seq("lang", "n"))
    val r = TextIndex.facetMetrics(spark, idx, Seq("fox", "dog"), "lang", "n")
      .orderBy($"lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // doc 0 matches BOTH terms but counts once (sum 10+5 for en, not 25)
    assert(r == Seq(("de", 1L, 7L, 7L, 7L), ("en", 2L, 15L, 5L, 10L)))
  }

  test("facetPanels: every facet column in one pass, per-query dedup") {
    val docs = Seq(
      (0L, "fox dog", "en", "web"), (1L, "fox", "en", "book"),
      (2L, "dog", "de", "web"), (3L, "cat", "fr", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val idx = tmp("fpidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4,
      attrCols = Seq("lang", "source"))
    val qs = Seq((0L, "fox"), (0L, "dog"), (1L, "cat")).toDF("q_id", "term")
    val r = TextIndex.facetPanels(spark, idx, qs, Seq("lang", "source"))
      .orderBy($"q_id", $"facet_col", $"facet_val")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // q0 matches docs 0,1,2 (doc 0 matches both terms — once)
    assert(r == Seq(
      (0L, "lang", "de", 1L), (0L, "lang", "en", 2L),
      (0L, "source", "book", 1L), (0L, "source", "web", 2L),
      (1L, "lang", "fr", 1L), (1L, "source", "web", 1L)))
  }

  test("boolean mustPhrase is a non-scoring filter clause") {
    val docs = Seq(
      (0L, "alpha table scan here"),   // must + phrase
      (1L, "alpha scan table"),        // must, phrase reversed → out
      (2L, "table scan only"),         // phrase but no scoring term → out
      (3L, "alpha alone"))             // must, no phrase → out
      .toDF("doc_id", "text")
    val idx = tmp("bphidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val r = TextIndex.booleanSearchPersisted(spark, idx,
        must = Seq("alpha"), should = Nil, mustNot = Nil, k = 10,
        mustPhrase = Seq("table", "scan"))
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(0L))
    // the phrase terms do not contribute to the score: same score as a
    // phrase-free must query restricted to doc 0
    val scored = TextIndex.booleanSearchPersisted(spark, idx,
        must = Seq("alpha"), should = Nil, mustNot = Nil, k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toMap
    val withPhrase = TextIndex.booleanSearchPersisted(spark, idx,
        must = Seq("alpha"), should = Nil, mustNot = Nil, k = 10,
        mustPhrase = Seq("table", "scan"))
      .collect().map(x => (x.getLong(0), x.getLong(2))).toMap
    assert(withPhrase(0L) == scored(0L))
  }

  test("facetCountsBatch rejects a facet column not persisted at build") {
    val idx = tmp("fctbad")
    TextIndex.saveTextIndex(facetDocs, "doc_id", "text", idx, numBuckets = 4)
    val qs = Seq((0L, "fox")).toDF("q_id", "term")
    intercept[IllegalArgumentException] {
      TextIndex.facetCountsBatch(spark, idx, qs, "lang")
    }
  }

  // -------------------------------------------------------------- snippets

  test("snippetWindows picks the densest window, earliest on ties") {
    val docs = Seq(
      // anchors 1,4,5,7: [4,8) covers q2,q1,q3 — the unique best
      (0L, "x q1 x x q2 q1 x q3"),
      // all of [0,3) [2,5) [4,7) cover two terms — earliest start wins
      (1L, "q1 x q2 x q1 x q2"),
      // no query term at all — absent from the answer
      (2L, "y y y")).toDF("doc_id", "text")
    val idx = tmp("snpidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val w4 = TextIndex.snippetWindows(spark, idx, Seq("q1", "q2", "q3"), 4)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(w4.head == ((0L, 3L, 4L)))
    val w3 = TextIndex.snippetWindows(spark, idx, Seq("q1", "q2", "q3"), 3)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(w3 == Seq((0L, 2L, 4L), (1L, 2L, 0L)))
    assert(!w4.exists(_._1 == 2L))
  }

  test("snippetPassages: greedy non-overlapping top-p windows") {
    // two hit clusters far apart plus a weak singleton between them
    val docs = Seq(
      (0L, "q1 q2 x x x x x x x x q1 x x x x x x x x q1 q2 q3"))
      .toDF("doc_id", "text")
    val idx = tmp("snpp")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    val r = TextIndex.snippetPassages(spark, idx, Seq("q1", "q2", "q3"),
        width = 4, p = 3)
      .orderBy($"passage_rk")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    // best: [19,23) covers q1,q2,q3 (cov 3); next: [0,4) cov 2; the
    // lone q1@10 survives the overlap bars → cov 1
    assert(r == Seq((1L, 19L, 3L), (2L, 0L, 2L), (3L, 10L, 1L)))
    // p larger than available passages: no extra rows, no nulls
    val r2 = TextIndex.snippetPassages(spark, idx, Seq("q1", "q2", "q3"),
        width = 4, p = 10)
    assert(r2.count() >= 3 && r2.filter($"win_start".isNull).count() == 0)
    // passage_rk 1 always equals snippetWindows' single answer
    val single = TextIndex.snippetWindows(spark, idx,
        Seq("q1", "q2", "q3"), 4)
      .collect().map(x => (x.getLong(2), x.getLong(1))).head
    assert((r.head._2, r.head._3) == single)
  }

  test("passagesText slices every selected passage of the top-k docs") {
    val docs = Seq(
      (0L, "q1 q2 x x x x x x x x q1 q2 q3"),
      (1L, "q1 here only"),
      (2L, "none at all")).toDF("doc_id", "text")
    val idx = tmp("psgt")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    val r = TextIndex.passagesText(spark, idx, docs, "doc_id", "text",
        Seq("q1", "q2", "q3"), width = 4, p = 2, k = 1)
      .orderBy($"passage_rk")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(4))).toSeq
    // doc 0 wins (best passage covers 3 terms); both its passages
    // materialize: [10,14) then the earlier [0,4)
    assert(r == Seq((0L, 1L, "q1 q2 q3"), (0L, 2L, "q1 q2 x x")))
    // k=2 brings doc 1's single passage along
    val r2 = TextIndex.passagesText(spark, idx, docs, "doc_id", "text",
        Seq("q1", "q2", "q3"), width = 4, p = 2, k = 2)
      .orderBy($"doc_id", $"passage_rk")
      .collect().map(x => (x.getLong(0), x.getString(4))).toSeq
    assert(r2 == Seq((0L, "q1 q2 q3"), (0L, "q1 q2 x x"),
      (1L, "q1 here only")))
  }

  test("snippetWindows width 1 degenerates to first single occurrence") {
    val docs = Seq((0L, "a b c b")).toDF("doc_id", "text")
    val idx = tmp("snp1")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    val r = TextIndex.snippetWindows(spark, idx, Seq("b", "c"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r == Seq((0L, 1L, 1L)))
  }

  // ----------------------------------------------------------- fuzzy terms

  test("fuzzy lookup finds exactly the edit-distance-1 vocabulary") {
    val docs = Seq(
      (0L, "stream stream processing"), (1L, "steam rises"),
      (2L, "streams of data"), (3L, "a scream outside"),
      (4L, "a dream inside"), (5L, "stream again"))
      .toDF("doc_id", "text")
    val idx = tmp("fzidx"); val dict = tmp("fzdict")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 4)
    val r = TextIndex.fuzzyTermsPersisted(spark, dict, "stream")
      .orderBy($"term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // equal, deletion ("steam"), insertion ("streams"), substitution
    // ("scream"); "dream" is distance 2 and must NOT appear
    assert(r == Seq(("scream", 1L), ("steam", 1L), ("stream", 2L),
      ("streams", 1L)).map { case (t, df) =>
      (t, df, if (t == "stream") 0L else 1L) })
  }

  test("batched fuzzy lookup equals the per-query union; didYouMean picks") {
    val docs = Seq(
      (0L, "stream stream processing"), (1L, "steam rises"),
      (2L, "streams of data"), (3L, "filter it"), (4L, "filter again"),
      (5L, "fitter person")).toDF("doc_id", "text")
    val idx = tmp("fzbidx"); val dict = tmp("fzbdict")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 4)
    val qs = Seq("strean", "filtr", "zzz")
    val batch = TextIndex.fuzzyTermsPersistedBatch(spark, dict, qs)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val single = qs.flatMap(q =>
      TextIndex.fuzzyTermsPersisted(spark, dict, q)
        .collect().map(r =>
          (q, r.getString(0), r.getLong(1), r.getLong(2)))).toSet
    assert(batch == single && batch.nonEmpty)
    // didYouMean: 'strean'→stream (dist1); 'filtr'→filter (df 2 beats
    // fitter df 1 at the same dist); 'filter' exact hit → itself even
    // though 'fitter' exists at dist 1; 'zzz' → null
    val dym = TextIndex.didYouMean(spark, dict,
        Seq("strean", "filtr", "filter", "zzz"))
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(dym == Set(
      ("strean", Some("stream"), 1L),
      ("filtr", Some("filter"), 2L),
      ("filter", Some("filter"), 2L),
      ("zzz", None, -1L)))
  }

  test("snippetWindows bounds per-doc analysis at maxOccurrences") {
    // 40 hits of 'q' then the only 'r' at the far end: with q's cap at
    // 4 the analyzed prefix never reaches a window containing 'r', so
    // the best window covers one term at the first occurrence; uncapped
    // it finds the earliest (q,r) window at position 38
    val text = (Seq.fill(40)("q") ++ Seq("r", "q")).mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val idx = tmp("snpcap")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    val full = TextIndex.snippetWindows(spark, idx, Seq("q", "r"), 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(full == Seq((2L, 38L)))
    val capped = TextIndex.snippetWindows(spark, idx, Seq("q", "r"), 3,
        maxOccurrences = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(capped == Seq((1L, 0L)))
  }

  test("term dict rebuild flips the generation and refreshes df") {
    val docs = Seq((0L, "fox"), (1L, "fox box")).toDF("doc_id", "text")
    val idx = tmp("fzgen"); val dict = tmp("fzgdict")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 2)
    val before = TextIndex.fuzzyTermsPersisted(spark, dict, "fox")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(before == Set(("fox", 2L), ("box", 1L)))
    TextIndex.deleteFromTextIndex(spark, idx, Seq(1L).toDF("doc_id"), "doc_id")
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 2)
    val after = TextIndex.fuzzyTermsPersisted(spark, dict, "fox")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == Set(("fox", 1L)))
    val (nTerms, _) = TextIndex.readDictStats(spark, dict)
    assert(nTerms == 1L)
  }

  // ------------------------------------------------------------------- merge

  test("merged index answers exactly like a rebuild from the union corpus") {
    val a = Seq((0L, "fox dog rain"), (1L, "fox fox"), (2L, "dog"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "rain rain fox"), (11L, "unrelated words"))
      .toDF("doc_id", "text")
    val ia = tmp("mrgA"); val ib = tmp("mrgB")
    val out = tmp("mrgO"); val ref = tmp("mrgR")
    TextIndex.saveTextIndex(a, "doc_id", "text", ia, numBuckets = 4)
    TextIndex.saveTextIndex(b, "doc_id", "text", ib, numBuckets = 4)
    // deletion state must NOT carry over: delete doc 2 in A first — the
    // merge folds only live rows, like a compaction would
    TextIndex.deleteFromTextIndex(spark, ia, Seq(2L).toDF("doc_id"), "doc_id")
    TextIndex.mergeTextIndexes(spark, ia, ib, out, numBuckets = 8)
    TextIndex.saveTextIndex(a.filter($"doc_id" =!= 2L).unionByName(b),
      "doc_id", "text", ref, numBuckets = 8)
    def search(p: String) =
      TextIndex.bm25SearchPersisted(spark, p, Seq("fox", "dog", "rain"), 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(search(out) == search(ref) && search(out).nonEmpty)
    assert(TextIndex.readStats(spark, out)._1 == 4L) // 2 live A + 2 B
    // the merged index supports the full lifecycle: delete + search
    TextIndex.deleteFromTextIndex(spark, out, Seq(10L).toDF("doc_id"),
      "doc_id")
    assert(!TextIndex.bm25SearchPersisted(spark, out, Seq("rain"), 100)
      .collect().map(_.getLong(0)).contains(10L))
    // mismatched attr layouts fail loudly
    val ic = tmp("mrgC")
    TextIndex.saveTextIndex(a.withColumn("lang", lit("en")), "doc_id",
      "text", ic, numBuckets = 4, attrCols = Seq("lang"))
    intercept[IllegalArgumentException] {
      TextIndex.mergeTextIndexes(spark, ia, ic, tmp("mrgX"))
    }
  }

  // --------------------------------------------------------------------- prf

  test("pseudo-relevance feedback recovers docs the raw query misses") {
    val docs = Seq(
      (0L, "alpha beta beta"), (1L, "alpha beta"),
      (2L, "beta gamma"), (3L, "delta")).toDF("doc_id", "text")
    val idx = tmp("prfidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val raw = TextIndex.bm25SearchPersisted(spark, idx, Seq("alpha"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(raw == Set(0L, 1L)) // doc 2 is invisible to the raw query
    val prf = TextIndex.pseudoRelevanceFeedback(spark, idx, docs,
        "doc_id", "text", Seq("alpha"), rDocs = 2, mTerms = 1, k = 10)
      .collect().map(_.getLong(0)).toSet
    // feedback docs {0,1} donate 'beta' → doc 2 becomes reachable
    assert(prf == Set(0L, 1L, 2L))
    // mTerms = 0 degrades to the raw query (same candidates)
    val zero = TextIndex.pseudoRelevanceFeedback(spark, idx, docs,
        "doc_id", "text", Seq("alpha"), rDocs = 2, mTerms = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(zero == raw)
  }

  // ---------------------------------------------------------- bucket parity

  test("driver-side term buckets match the Column xxhash64 path exactly") {
    val terms = Seq("stream", "join", "filter", "", "a", "ü", "日本語",
      "with space", "back`tick", "dot.ted", "x" * 300)
    for (nb <- Seq(2, 4, 64, 1000)) {
      val fromSpark = terms.toDF("term")
        .select(col("term"),
          pmod(xxhash64(col("term")), lit(nb)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val local = terms.map(t =>
        t -> TextIndex.termBucketsLocal(Seq(t), nb).head).toMap
      assert(local == fromSpark, s"numBuckets=$nb")
    }
  }

  // --------------------------------------------------------------- proximity

  test("proximitySearch finds the minimal covering span, any order") {
    val docs = Seq(
      (0L, "a x x b"),          // span 4 (a..b)
      (1L, "b x a"),            // span 3, reversed order counts
      (2L, "a x x x x x b a"),  // min span is the trailing (b, a) pair: 2
      (3L, "a only here"),      // missing b → absent
      (4L, "a b x x x x x a")). // adjacent at the front: 2
      toDF("doc_id", "text")
    val idx = tmp("prxidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val r = TextIndex.proximitySearch(spark, idx, Seq("a", "b"), slop = 4)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r == Seq((0L, 4L), (1L, 3L), (2L, 2L), (4L, 2L)))
    // tighter slop drops the wide doc
    val tight = TextIndex.proximitySearch(spark, idx, Seq("a", "b"), slop = 3)
      .collect().map(_.getLong(0)).toSet
    assert(tight == Set(1L, 2L, 4L))
  }

  test("proximitySearch three terms and the occurrence cap") {
    val docs = Seq((0L, "p x q x x r p q r")).toDF("doc_id", "text")
    val idx = tmp("prx3")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    // best window is the trailing "p q r": span 3
    val r = TextIndex.proximitySearch(spark, idx, Seq("p", "q", "r"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r == Seq((0L, 3L)))
    // cap = 1 analyzes only each term's first occurrence: p@0, q@2, r@5
    // → span 6 > slop 3 → no match
    assert(TextIndex.proximitySearch(spark, idx, Seq("p", "q", "r"), 3,
      maxOccurrences = 1).count() == 0)
  }

  // ------------------------------------------------ per-query batch filters

  test("batch BM25 per-query filters scope candidates, not statistics") {
    val docs = Seq(
      (0L, "fox dog", "en"), (1L, "fox", "de"), (2L, "fox fox", "en"),
      (3L, "dog", "de")).toDF("doc_id", "text", "lang")
    val idx = tmp("bbfidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4,
      attrCols = Seq("lang"))
    val qt = Seq((0L, "fox"), (1L, "fox")).toDF("q_id", "term")
    val r = TextIndex.bm25SearchPersistedBatch(spark, idx, qt, kLex = 10,
        perQueryWhere = Map(0L -> (col("lang") === "en")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // q0 sees only en docs {0, 2}; q1 (unfiltered) sees {0, 1, 2}
    assert(r.filter(_._1 == 0L).map(_._2).toSet == Set(0L, 2L))
    assert(r.filter(_._1 == 1L).map(_._2).toSet == Set(0L, 1L, 2L))
    // SCORES are identical across the two queries for shared docs:
    // df/N/avgdl stay corpus-global under the filter (Lucene convention)
    val s0 = r.filter(_._1 == 0L).map(x => x._2 -> x._3).toMap
    val s1 = r.filter(_._1 == 1L).map(x => x._2 -> x._3).toMap
    assert(s0.forall { case (d, s) => s1(d) == s })
  }

  // ------------------------------------------- boolean / paging / num-facet

  test("booleanSearchPersisted: must, mustNot, minimum_should_match") {
    val docs = Seq(
      (0L, "alpha beta gamma"),   // must + 2 should
      (1L, "alpha beta"),         // must + 1 should
      (2L, "alpha"),              // must, 0 should → msm drops it
      (3L, "alpha beta bad"),     // contains mustNot → excluded
      (4L, "beta gamma"))         // no must → excluded
      .toDF("doc_id", "text")
    val idx = tmp("boolidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val r = TextIndex.booleanSearchPersisted(spark, idx,
        must = Seq("alpha"), should = Seq("beta", "gamma"),
        mustNot = Seq("bad"), k = 10, minShouldMatch = 1)
      .orderBy($"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r.map(_._1).toSet == Set(0L, 1L))
    assert(r.toMap == Map(0L -> 2L, 1L -> 1L))
    // msm 0: doc 2 returns (all must present, no should needed)
    val loose = TextIndex.booleanSearchPersisted(spark, idx,
        must = Seq("alpha"), should = Seq("beta", "gamma"),
        mustNot = Seq("bad"), k = 10, minShouldMatch = 0)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(0L, 1L, 2L))
    // empty must: pure should query with msm 2
    val sh = TextIndex.booleanSearchPersisted(spark, idx,
        must = Nil, should = Seq("beta", "gamma"), mustNot = Nil,
        k = 10, minShouldMatch = 2)
      .collect().map(_.getLong(0)).toSet
    assert(sh == Set(0L, 4L))
  }

  test("boolean score equals plain BM25 over the scoring terms") {
    val docs = Seq(
      (0L, "alpha beta x"), (1L, "alpha y"), (2L, "beta z"), (3L, "w"))
      .toDF("doc_id", "text")
    val idx = tmp("boolsc")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    // no constraints at all → same candidates as plain OR-query BM25;
    // scores on the per-term micro grid == the BATCH scorer's grid
    val bool = TextIndex.booleanSearchPersisted(spark, idx,
        must = Nil, should = Seq("alpha", "beta"), mustNot = Nil, k = 10)
      .select("doc_id", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = TextIndex.bm25SearchPersistedBatch(spark, idx,
        Seq((0L, "alpha"), (0L, "beta")).toDF("q_id", "term"), kLex = 10)
      .select("doc_id", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bool == batch)
  }

  test("bm25 search-after pages the ranking without overlap or gaps") {
    val docs = (0L to 29L).map(i =>
      (i, if (i % 3 == 0) "hit hit filler" else "hit filler plus"))
      .toDF("doc_id", "text")
    val idx = tmp("saidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val full = TextIndex.bm25SearchPersisted(spark, idx, Seq("hit"), k = 30)
      .orderBy($"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p1 = TextIndex.bm25SearchPersisted(spark, idx, Seq("hit"), k = 12)
      .orderBy($"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cur = p1.last
    val p2 = TextIndex.bm25SearchPersisted(spark, idx, Seq("hit"), k = 12,
        after = Some((cur._2, cur._1)))
      .orderBy($"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(p1 ++ p2 == full.take(24))
    // paging past the end returns empty
    val lastCur = full.last
    assert(TextIndex.bm25SearchPersisted(spark, idx, Seq("hit"), k = 12,
      after = Some((lastCur._2, lastCur._1))).count() == 0)
  }

  test("facetHistogram bins matching docs by a numeric attr") {
    val docs = Seq(
      (0L, "fox a", 10L), (1L, "fox b", 70L), (2L, "fox c", 75L),
      (3L, "dog d", 10L), (4L, "none", 200L))
      .toDF("doc_id", "text", "n")
    val idx = tmp("fhidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4,
      attrCols = Seq("n"))
    val r = TextIndex.facetHistogram(spark, idx, Seq("fox"), "n", 64L)
      .orderBy($"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r == Seq((0L, 0L, 1L), (1L, 64L, 2L)))
  }

  // ------------------------------------------------- suggest / regex / text

  test("suggestTerms completes a prefix by df desc, term asc") {
    val docs = Seq(
      (0L, "spark stream spark"), (1L, "spark sort"), (2L, "sort stone"),
      (3L, "other words")).toDF("doc_id", "text")
    val idx = tmp("sgidx"); val dict = tmp("sgdict")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 4)
    val r = TextIndex.suggestTerms(spark, dict, "s", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // df: sort 2, spark 2, stone 1, stream 1 → k=3 cuts at stone
    assert(r == Seq(("sort", 2L), ("spark", 2L), ("stone", 1L)))
    val st = TextIndex.suggestTerms(spark, dict, "st", 5)
      .collect().map(_.getString(0)).toSeq
    assert(st == Seq("stone", "stream"))
  }

  test("regexDocSearch: anchored prefix pruning and per-doc term stats") {
    val docs = Seq(
      (0L, "scan scan small"), (1L, "slow sort"), (2L, "spark alpha"),
      (3L, "beta")).toDF("doc_id", "text")
    val idx = tmp("rgidx"); val dict = tmp("rgdict")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 4)
    // ^s.*a: scan, small, spark — not slow/sort/alpha/beta
    val terms = TextIndex.regexTermMatches(spark, dict, "^s.*a")
      .collect().map(_.getString(0)).toSet
    assert(terms == Set("scan", "small", "spark"))
    val r = TextIndex.regexDocSearch(spark, idx, dict, "^s.*a")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r == Seq((0L, 2L, 3L), (2L, 1L, 1L)))
    // unanchored pattern still answers (vocabulary-scan degradation)
    val un = TextIndex.regexDocSearch(spark, idx, dict, "lpha$")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(un == Seq((2L, 1L)))
    // no match → empty frame with the contract schema
    assert(TextIndex.regexDocSearch(spark, idx, dict, "^zzz").count() == 0)
  }

  test("regexDocSearch fails loudly past the maxTerms IN-list cap") {
    val docs = Seq((0L, "aa ab ac ad")).toDF("doc_id", "text")
    val idx = tmp("rgcap"); val dict = tmp("rgcapd")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 2)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 2)
    intercept[IllegalArgumentException] {
      TextIndex.regexDocSearch(spark, idx, dict, "^a", maxTerms = 2)
    }
  }

  test("literalPrefix extraction") {
    assert(TextIndex.literalPrefix("^stream") == "stream")
    assert(TextIndex.literalPrefix("^st.*m$") == "st")
    assert(TextIndex.literalPrefix("st.*") == "")
    assert(TextIndex.literalPrefix("^[sa]x") == "")
    assert(TextIndex.literalPrefix("^a\\d+") == "a")
    // quantifier after the last literal makes it optional → drop it
    assert(TextIndex.literalPrefix("^scan?") == "sca")
    assert(TextIndex.literalPrefix("^ab{0,2}") == "a")
    assert(TextIndex.literalPrefix("^ab*") == "a")
    assert(TextIndex.literalPrefix("^ab+") == "ab") // + needs ≥1: keep
    // top-level alternation voids the anchor for the right branch
    assert(TextIndex.literalPrefix("^ab|cd") == "")
    assert(TextIndex.literalPrefix("^a(b|c)d") == "a") // grouped: sound
    assert(TextIndex.literalPrefix("^a[|]b") == "a")   // in-class: sound
    assert(TextIndex.literalPrefix("^a\\|b") == "a")   // escaped: sound
  }

  test("literalPrefix soundness PROPERTY: over random patterns and " +
      "vocabularies, pruning never drops a matching term") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genAtom: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "d"),
      3 -> (for {
        c <- Gen.oneOf("a", "b", "c", "d")
        q <- Gen.oneOf("?", "*", "+", "{0,2}", "{1,2}")
      } yield c + q),
      1 -> Gen.oneOf("[ab]", "[bc]"),
      1 -> Gen.oneOf("(a|b)", "(bc|d)"),
      1 -> Gen.oneOf("\\|", "\\?", "."),
      1 -> Gen.const("a|cd")) // top-level alternation
    val genPattern: Gen[String] = for {
      n <- Gen.chooseNum(1, 5)
      atoms <- Gen.listOfN(n, genAtom)
      anchor <- Gen.oneOf("", "$")
    } yield "^" + atoms.mkString + anchor
    val genTerm: Gen[String] = Gen.chooseNum(0, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd', 'x', '|'))
        .map(_.mkString))
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val vocab = (0 until 300).map(i => sample(genTerm, 7000L + i)).distinct
    (0 until 400).foreach { i =>
      val pat = sample(genPattern, i.toLong)
      val pre = TextIndex.literalPrefix(pat)
      val m = java.util.regex.Pattern.compile(pat)
      vocab.foreach { t =>
        if (m.matcher(t).find()) { // rlike = find semantics
          val kept = pre.isEmpty ||
            (t.nonEmpty && t(0) == pre(0) && t.startsWith(pre))
          assert(kept,
            s"pattern '$pat' prefix '$pre' drops matching term '$t'")
        }
      }
    }
  }

  test("regexTermMatches: optional-quantifier and alternation shapes " +
      "keep terms the old prefix pruning dropped") {
    val docs = Seq(
      (0L, "sca scan scant"), (1L, "a ab abb abbb"), (2L, "cdx zcd"))
      .toDF("doc_id", "text")
    val idx = tmp("rgopt"); val dict = tmp("rgoptd")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    TextIndex.saveTermDict(spark, idx, dict, numBuckets = 4)
    def terms(p: String): Set[String] =
      TextIndex.regexTermMatches(spark, dict, p)
        .collect().map(_.getString(0)).toSet
    // ^scan? — "sca" matches too (prefix "scan" would have dropped it)
    assert(terms("^scan?") == Set("sca", "scan", "scant"))
    // ^ab{0,2}$ — "a" matches (zero b's allowed)
    assert(terms("^ab{0,2}$") == Set("a", "ab", "abb"))
    // ^ab|cd — find semantics: any term containing "cd" also matches
    assert(terms("^ab|cd") == Set("ab", "abb", "abbb", "cdx", "zcd"))
  }

  test("snippetText slices the winning window back out of the corpus") {
    val docs = Seq(
      (0L, "x q1 x x q2 q1 x q3"), (1L, "q1 only here"),
      (2L, "nothing at all")).toDF("doc_id", "text")
    val idx = tmp("snptidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val r = TextIndex.snippetText(spark, idx, docs, "doc_id", "text",
        Seq("q1", "q2", "q3"), width = 4, k = 1)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(r == Seq((0L, 3L, 4L, "q2 q1 x q3")))
    // k beyond matches: every matching doc text present, window clipped
    // at the doc end
    val all = TextIndex.snippetText(spark, idx, docs, "doc_id", "text",
        Seq("q1", "q2", "q3"), width = 4, k = 10)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(all == Seq((0L, "q2 q1 x q3"), (1L, "q1 only here")))
  }

  // -------------------------------------------------------- more-like-this

  test("moreLikeThis retrieves term-sharing docs, source excluded") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta delta"),
      (2L, "gamma gamma zeta"), (3L, "omega psi"))
      .toDF("doc_id", "text")
    val idx = tmp("mltidx")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val r = TextIndex.moreLikeThisPersisted(spark, idx, docs,
        "doc_id", "text", docId = 0L, mTerms = 2, k = 3)
      .orderBy($"rk")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // doc 0's terms tie on tf·idf (tf 1, df 2 each) → lexicographic
    // pick "alpha","beta"; only doc 1 contains them; never doc 0 itself
    assert(r == Seq((1L, 1L)))
  }

  test("moreLikeThis keeps k answers when the source doc ranks inside top k") {
    val docs = Seq(
      (0L, "red blue"), (1L, "red blue"), (2L, "red blue"), (3L, "red"))
      .toDF("doc_id", "text")
    val idx = tmp("mltk")
    TextIndex.saveTextIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val r = TextIndex.moreLikeThisPersisted(spark, idx, docs,
        "doc_id", "text", docId = 0L, mTerms = 2, k = 2)
      .orderBy($"rk")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(r == Seq((1L, 1L), (2L, 2L)))
  }

  // ---------------------------------------------------------- collocations

  test("collocations: directed windowed pairs, PMI grid, minCount") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(docs, window = 1, minCount = 2,
        topK = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // pairs: (a,b)x3, (b,a)x1, (b,c)x1 — only (a,b) survives minCount.
    // uni a:3 b:3 c:1, n_tok 7, pairs total 5.
    val pmi = math.floor(
      math.log((3.0 * 7.0 * 7.0) / (3.0 * 3.0 * 5.0)) * 1e6).toLong
    assert(r == Seq(("a", "b", 3L, pmi)))
  }

  test("collocations window spans gaps but never documents") {
    val docs = Seq((0L, "x y"), (1L, "y z")).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(docs, window = 2, minCount = 1,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // window 2 could reach across docs if the partition were wrong
    assert(r == Set(("x", "y", 1L), ("y", "z", 1L)))
    val wide = TextAnalysis.collocations(
        Seq((0L, "p q r")).toDF("doc_id", "text"),
        window = 2, minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(wide == Set(("p", "q"), ("p", "r"), ("q", "r")))
  }
}
