package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Heuristic language-ID on real multilingual sentences. */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("detects language from char classes and stopword votes") {
    import spark.implicits._
    val samples = Seq(
      ("the quick brown fox jumps over the lazy dog and it is fine", "en"),
      ("el gato que vive en la casa de los vecinos es muy tranquilo", "es"),
      ("le chat est dans les jardins des voisins et il dort", "fr"),
      ("der hund und die katze sind nicht in dem haus und das ist gut", "de"),
      ("这是一个用中文写的句子用来测试语言识别", "zh"),
    ).toDF("text", "expected")
    val got = samples
      .withColumn("predicted", TextOps.detectLang(col("text")))
      .collect()
    got.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"text='${r.getString(0)}' expected=${r.getString(1)} got=${r.getString(2)}")
    }
  }
}
