package graft.query

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property tests for the alert condition AST: random condition trees over
  * random rows vs a naive Scala evaluator that mirrors Spark's
  * THREE-VALUED logic (null-propagating comparisons, Kleene and/or) — the
  * semantics a flat boolean oracle would get wrong and exactly where
  * alert-filter bugs hide.
  */
class AlertsPropertySpec extends SparkSuite {
  import spark.implicits._
  import Alerts._

  private def forAll[T](gen: Gen[T], iters: Int = 25)(check: T => Unit): Unit =
    (0 until iters).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // ---- data: (id, s: nullable ASCII string, tags: array<string>) ----
  private val pool = Vector("alpha", "beta", "bet", "gamma", "", "a", "ab")
  private val tagPool = Vector("x", "y", "z", "w")

  private val genRows: Gen[List[(Long, Option[String], List[String])]] = for {
    n <- Gen.chooseNum(1, 25)
    rows <- Gen.listOfN(n, for {
      s <- Gen.option(Gen.oneOf(pool))
      t <- Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, Gen.oneOf(tagPool)))
    } yield (s, t.distinct))
  } yield rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }

  // ---- condition trees ----
  private val genStringOp: Gen[WhereOp] = Gen.oneOf(
    Eq, NotEq, Lt, Gt, LtEq, GtEq, IsNull, IsNotNull, ILike, Contains,
    BeginsWith, EndsWith, DoesNotContain, DoesNotBeginWith, DoesNotEndWith)
  private val genArrayOp: Gen[WhereOp] =
    Gen.oneOf(ArrayContains, ArrayHasAll, ArrayHasAny)

  private val genLeaf: Gen[Leaf] = Gen.oneOf(
    for {
      op <- genStringOp
      v <- Gen.oneOf(pool.filter(_.nonEmpty))
      pat <- Gen.oneOf(v, s"%$v", s"$v%", s"%$v%")
    } yield Leaf("s", op,
      if (op == IsNull || op == IsNotNull) None
      else Some(if (op == ILike) pat else v)),
    for {
      op <- genArrayOp
      k <- Gen.chooseNum(1, 2)
      vs <- Gen.listOfN(k, Gen.oneOf(tagPool))
    } yield Leaf("tags", op,
      Some(if (op == ArrayContains) vs.head else vs.mkString(","))))

  private def genNode(depth: Int): Gen[ConditionNode] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      1 -> (for {
        and <- Gen.oneOf(true, false)
        n <- Gen.chooseNum(1, 3)
        cs <- Gen.listOfN(n, genNode(depth - 1))
      } yield Group(and, cs)))

  // ---- naive three-valued evaluator ----
  private def likeMatch(s: String, pat: String): Boolean = {
    val rx = pat.toLowerCase.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+-?^$|".contains(c) => "\\" + c
      case c => c.toString
    }
    s.toLowerCase.matches(rx)
  }

  private def evalLeaf(l: Leaf, s: Option[String],
                       tags: List[String]): Option[Boolean] = {
    def str(f: String => Boolean): Option[Boolean] = s.map(f)
    l match {
      case Leaf("s", IsNull, _) => Some(s.isEmpty)
      case Leaf("s", IsNotNull, _) => Some(s.nonEmpty)
      case Leaf("s", op, Some(v)) => op match {
        case Eq => str(_ == v)
        case NotEq => str(_ != v)
        case Lt => str(_.compareTo(v) < 0)
        case Gt => str(_.compareTo(v) > 0)
        case LtEq => str(_.compareTo(v) <= 0)
        case GtEq => str(_.compareTo(v) >= 0)
        case ILike => str(likeMatch(_, v))
        case Contains => str(_.contains(v))
        case BeginsWith => str(_.startsWith(v))
        case EndsWith => str(_.endsWith(v))
        case DoesNotContain => str(x => !x.contains(v))
        case DoesNotBeginWith => str(x => !x.startsWith(v))
        case DoesNotEndWith => str(x => !x.endsWith(v))
        case other => fail(s"unexpected string op $other")
      }
      case Leaf("tags", op, Some(v)) => op match {
        // the tags column is never null in the generator, so array ops
        // always produce a definite boolean
        case ArrayContains => Some(tags.contains(v))
        case ArrayHasAll =>
          Some(Conditions.parseCsv(v).forall(tags.contains))
        case ArrayHasAny =>
          Some(Conditions.parseCsv(v).exists(tags.contains))
        case other => fail(s"unexpected array op $other")
      }
      case other => fail(s"unexpected leaf $other")
    }
  }

  /** Kleene logic, matching Spark's And/Or. */
  private def kAnd(a: Option[Boolean], b: Option[Boolean]) = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }
  private def kOr(a: Option[Boolean], b: Option[Boolean]) = (a, b) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }

  private def eval(node: ConditionNode, s: Option[String],
                   tags: List[String]): Option[Boolean] = node match {
    case l: Leaf => evalLeaf(l, s, tags)
    case Group(and, cs) =>
      cs.map(eval(_, s, tags)).reduce(if (and) kAnd else kOr)
  }

  test("condition trees filter exactly like the naive 3-valued evaluator") {
    val genCase = for {
      rows <- genRows
      node <- genNode(2)
    } yield (rows, node)
    forAll(genCase) { case (rows, node) =>
      val df = rows.toDF("id", "s", "tags")
      val got = df.filter(Conditions.toColumn(node))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.filter { case (_, s, tags) =>
        eval(node, s, tags).contains(true) }.map(_._1).toSet
      assert(got == want, s"node=$node rows=$rows")
    }
  }

  test("parseCsv: quote-aware splitting round-trips generated segments") {
    val genSegs: Gen[List[String]] = for {
      n <- Gen.chooseNum(1, 5)
      segs <- Gen.listOfN(n, Gen.oneOf(
        Gen.oneOf("a", "xy", "hello world"),
        Gen.oneOf("b,c", "d,e,f"))) // comma-carrying → need quoting
    } yield segs
    forAll(genSegs, iters = 50) { segs =>
      val csv = segs.map(s =>
        if (s.contains(',')) s"'$s'" else s).mkString(",")
      assert(Conditions.parseCsv(csv) == segs, s"csv=$csv")
    }
  }
}
