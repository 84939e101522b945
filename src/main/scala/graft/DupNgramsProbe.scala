package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (VERDICT r17 next #4): adjudicate q_dup_ngrams' docfreq
  * join-back against the duplicated-gram prefilter variant
  * ([[ops.TextOps.dupNgramsPrefilter]]) at a given SF, and measure the
  * freq-aggregate FLOOR (distinct (doc,gh) build + docfreq count — the
  * stage both shapes share and neither can avoid). Also
  * checksum-compares the two shapes' results so a registered swap would
  * be oracle-safe. Heap rule: q_dup_ngrams is agg-spill-bound — probe at
  * GRAFT_HEAP=96g for comparability with the r17 sub-sweep numbers
  * (184.4 s in-sweep at sf100/96 g; 321.5 isolated at 32 g). */
object DupNgramsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", Bench.shufflePartitions(d, cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TimeProbe.time("warmup")(Tables(spark, d, "region").count())

    def cooldown(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
    }

    // The shared floor: distinct (doc_id, gh) pairs + the docfreq
    // aggregate, nothing else. Both shapes pay this; the delta between a
    // full query and this floor is what a join-back rewrite can recover.
    val n = 8
    val toks = ops.TextOps.tokens(col("text"))
    def floorOnly(): Unit = {
      val pairs = Tables(spark, d, "documents")
        .filter(size(toks) >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(toks) - lit(n)),
            i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))).as("g"))
        .select(col("doc_id"), ops.Dedup.portableHash(col("g")).as("gh"))
        .distinct()
      Bench.forceEval(pairs.groupBy("gh").agg(count(lit(1)).as("docfreq")))
    }

    for (run <- 1 to 3) {
      TimeProbe.time(s"freq-aggregate floor (run $run)") { floorOnly() }
      cooldown()
    }
    var sumCur = Seq.empty[Double]; var sumPre = Seq.empty[Double]
    for (run <- 1 to 3) {
      val t0 = System.nanoTime()
      TimeProbe.time(s"current q_dup_ngrams (run $run)") {
        Bench.forceEval(ops.TextOps.dupNgrams(spark, d))
      }
      sumCur :+= (System.nanoTime() - t0) / 1e9
      cooldown()
      val t1 = System.nanoTime()
      TimeProbe.time(s"prefilter variant (run $run)") {
        Bench.forceEval(ops.TextOps.dupNgramsPrefilter(spark, d))
      }
      sumPre :+= (System.nanoTime() - t1) / 1e9
      cooldown()
    }
    // Result parity: identical checksums ⇒ a registered swap is oracle-safe.
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.selectExpr(
        s"bit_xor(xxhash64(struct(${df.schema.fieldNames.map(f => s"`$f`").mkString(",")}))) AS c")
        .collect()(0).getLong(0)
    val a = checksum(ops.TextOps.dupNgrams(spark, d))
    val b = checksum(ops.TextOps.dupNgramsPrefilter(spark, d))
    println(f"[probe] medians: current ${sumCur.sorted.apply(1)}%.1f s, " +
      f"prefilter ${sumPre.sorted.apply(1)}%.1f s; checksums match=${a == b} ($a vs $b)")
    spark.stop()
  }
}
