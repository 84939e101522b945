package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties mirroring the reference's semantics (SURVEY.md
  * §5.2.3): offset/limit over a sorted range slices like Seq.slice, and
  * unique-key join cardinality equals set-intersection size (the reference's
  * HashMap build, `/root/reference/src/executor/mod.rs:371`). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("offset(o).limit(l) over a sorted range == Seq.slice(o, o+l)") {
    val gen = for {
      n <- Gen.choose(0, 500)
      o <- Gen.choose(0, 60)
      l <- Gen.choose(0, 60)
    } yield (n, o, l)
    check(Prop.forAllNoShrink(gen) { case (n, o, l) =>
      val got = spark.range(0, n).toDF("id").orderBy("id")
        .offset(o).limit(l)
        .collect().map(_.getLong(0)).toSeq
      got == (0L until n.toLong).slice(o, o + l)
    })
  }

  test("unique-key inner join cardinality == range intersection size") {
    val gen = for {
      a <- Gen.choose(0, 300)
      b <- Gen.choose(0, 300)
      c <- Gen.choose(0, 300)
    } yield (a, b, c)
    check(Prop.forAllNoShrink(gen) { case (a, b, c) =>
      val lo = math.min(b, c); val hi = math.max(b, c)
      val got = spark.range(0, a).toDF("id")
        .join(spark.range(lo, hi).toDF("id"), "id")
        .count()
      got == (math.min(a.toLong, hi.toLong) - lo.toLong).max(0L)
    })
  }
}
