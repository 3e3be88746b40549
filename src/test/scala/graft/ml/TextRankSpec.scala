package graft.ml

import org.apache.spark.sql.functions.col

import graft.SparkSuite

class TextRankSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark streams"),
    (2L, "spark joins"),
    (3L, "streams and windows and state"),
    (4L, "windows windows windows")).toDF("doc_id", "text")

  test("tfidf: corpus-wide terms score zero, rare repeated terms score high") {
    val out = TextRank.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    val d4 = out.filter(_._1 == 4L)
    // 'windows' tf=3 df=2 → 3·ln(2) ≈ 2.079; top term of doc 4
    assert(d4.head._2 == "windows")
    assert(d4.head._3 == math.floor(3.0 * math.log(2.0) * 1e6).toLong)
    // a term present in every doc would have ln(1)=0; here every doc's
    // top-1 score is positive since no term spans all 4 docs
    assert(out.groupBy(_._1).values.forall(_.head._3 > 0))
  }

  test("tfidf: rank is dense per doc and capped at k") {
    val out = TextRank.tfidfTopK(docs, "doc_id", "text", k = 2).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(rs =>
      rs.map(_.getLong(5)).sorted.sameElements(1L to rs.length.toLong)))
    assert(byDoc.values.forall(_.length <= 2))
  }

  test("bm25: docs with the query term rank above docs without it") {
    val out = TextRank.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // only docs 1 and 2 contain 'spark'
    assert(out.keySet == Set(1L, 2L))
    // doc 2 is shorter (dl=2 vs 3) with tf=1 vs tf=2: tf wins here
    assert(out(1L) > out(2L))
    assert(out.values.forall(_ > 0L))
  }

  test("bm25: multi-term scores add per-term contributions") {
    val single = TextRank.bm25Scores(docs, "doc_id", "text", Seq("streams"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val multi = TextRank.bm25Scores(docs, "doc_id", "text",
      Seq("streams", "windows")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 3 has both terms: its multi-term score exceeds its single-term one
    assert(multi(3L) > single(3L))
    // doc 1 has only 'streams': identical contribution either way (same
    // floor grid since the other term adds exactly 0.0)
    assert(multi(1L) == single(1L))
  }

  test("lmScore: hand-computed add-one bigram likelihoods") {
    // uni: a=3 b=3 c=1, V=3; bigrams: "a b"=3, "b a"=1
    // P(a b) = (3+1)/(3+3) = 2/3; P(b a) = (1+1)/(3+3) = 1/3
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = TextRank.lmScore(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 3 has no bigrams -> no row
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val mAB = math.floor(math.log(4.0 / 6.0) * 1e6).toLong // "a b"
    val mBA = math.floor(math.log(2.0 / 6.0) * 1e6).toLong // "b a"
    val d1 = out(0)
    assert(d1.getAs[Long]("n_bigrams") == 3L)
    assert(d1.getAs[Long]("sum_micro") == 2 * mAB + mBA)
    assert(d1.getAs[Double]("avg_nll") ==
      -(2 * mAB + mBA).toDouble / (3L * 1000000L).toDouble)
    val d2 = out(1)
    assert(d2.getAs[Long]("n_bigrams") == 1L)
    assert(d2.getAs[Long]("sum_micro") == mAB)
    // rarer continuations score lower likelihood (higher NLL)
    assert(mBA < mAB)
  }

  test("lmScore broadcasts its model tables; shuffle fallback matches") {
    val corpus = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val plan = TextRank.lmScore(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val broadcastRows = TextRank.lmScore(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val shuffleRows = TextRank.lmScore(corpus, "doc_id", "text",
        maxBroadcastVocab = 0L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(broadcastRows == shuffleRows)
  }

  test("dsirScores: hand-computed unigram importance log-ratios") {
    // target = docs 1,2 ("good good", "good bad"); raw adds doc 3 ("bad bad")
    // raw: good=3 bad=3, r_tot=6, V=2; target: good=3 bad=1, t_tot=4
    val corpus = Seq(
      (1L, "tgt", "good good"), (2L, "tgt", "good bad"),
      (3L, "raw", "bad bad")).toDF("doc_id", "split", "text")
    val out = TextRank.dsirScores(corpus, "doc_id", "text",
        col("split") === "tgt")
      .orderBy("doc_id").collect()
    def term(tCnt: Long, rCnt: Long): Long =
      math.floor(math.log(
        ((tCnt + 1).toDouble / (rCnt + 1).toDouble) * (8.0 / 6.0)) * 1e6).toLong
    val tGood = term(3, 3) // ratio (4/4)*(8/6) > 1 — target-typical
    val tBad = term(1, 3)  // ratio (2/4)*(8/6) < 1 — target-atypical
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("logratio_micro"))).toMap
    assert(byId(1L) == (2L, 2 * tGood))
    assert(byId(2L) == (2L, tGood + tBad))
    assert(byId(3L) == (2L, 2 * tBad))
    // in-domain docs outscore out-of-domain ones
    assert(byId(1L)._2 > byId(2L)._2 && byId(2L)._2 > byId(3L)._2)
  }

  test("dsirScores joins every token (n_tokens = doc length)") {
    val corpus = Seq((1L, "a b c d e"), (2L, "a a")).toDF("doc_id", "text")
    val out = TextRank.dsirScores(corpus, "doc_id", "text",
        col("doc_id") === 1L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(out == Map(1L -> 5L, 2L -> 2L))
  }

  test("dsirScores broadcasts the word-stats side (stopword-skew guard)") {
    val corpus = Seq((1L, "the the the a b"), (2L, "the the c")).toDF("doc_id", "text")
    val plan = TextRank.dsirScores(corpus, "doc_id", "text",
        col("doc_id") === 1L)
      .queryExecution.executedPlan.toString
    // the token-stream ⋈ stats join must be a broadcast hash join — no
    // shuffle of the raw token stream, so stopword hot keys never form
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast stats join in:\n$plan")
  }

  test("dsirScores above the vocab cap falls back to a shuffle join") {
    val corpus = Seq((1L, "a b c d e"), (2L, "a a f")).toDF("doc_id", "text")
    val guarded = TextRank.dsirScores(corpus, "doc_id", "text",
      col("doc_id") === 1L, maxBroadcastVocab = 1L)
    // same rows as the broadcast path (PreparedQuerySpec-style parity)
    val out = guarded.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(out == Map(1L -> 5L, 2L -> 3L))
  }

  test("trainLinearModel separates a word-keyed corpus; quantized apply " +
       "side ranks positives above negatives") {
    import org.apache.spark.sql.functions.col
    // positives mention quality words, negatives spam words; some shared
    // filler so the model must actually learn the discriminative slots
    val docs = (
      (1 to 10).map(i => (i.toLong,
        s"great wonderful insight number $i with common filler words", 1.0)) ++
      (11 to 20).map(i => (i.toLong,
        s"spam junk clickbait number $i with common filler words", 0.0))
    ).toDF("doc_id", "text", "label")
    val (w, b) = TextRank.trainLinearModel(docs, "doc_id", "text", "label",
      dim = 64, iters = 40, lr = 1.0)
    val (wq, bq) = TextRank.toMicro(w, b)
    val scored = TextRank.scoreLinearModel(docs, "doc_id", "text", wq, bq)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logit"))
      .toMap
    val pos = (1 to 10).map(i => scored(i.toLong))
    val neg = (11 to 20).map(i => scored(i.toLong))
    // full separation on the training set: worst positive above best negative
    assert(pos.min > neg.max,
      s"pos=${pos.sorted.mkString(",")} neg=${neg.sorted.mkString(",")}")
  }

  test("scoreLinearModel: logit equals the hand-folded feature sum") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "a b a"), (2L, "c"), (3L, " ")).toDF("doc_id", "text")
    val dim = 8
    val w = Array.tabulate(dim)(i => (i * 10 + 1).toLong) // micro units
    val r = TextRank.scoreLinearModel(docs, "doc_id", "text",
        weightsMicro = w, biasMicro = 7L)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("logit_micro"), x.getAs[Double]("logit"))).toMap
    // naive oracle: portable md5 slot per token, fold tf*w + bias
    def slot(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % dim).toInt
    }
    def expect(toks: Seq[String]): Long =
      toks.groupBy(slot).map { case (s, g) => g.size * w(s) }.sum + 7L
    val e1 = expect(Seq("a", "b", "a"))
    val e2 = expect(Seq("c"))
    assert(r.keySet == Set(1L, 2L)) // tokenless doc 3 emits no row
    assert(r(1L) == (e1, e1.toDouble / 1e6), s"got ${r(1L)} want $e1")
    assert(r(2L) == (e2, e2.toDouble / 1e6))
  }
}
