package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Decomposition probe for the banded embedding near-dup verify — the
  * round's largest single sf100 entry (q_embed_clusters, 165.5 s in the r20
  * full-surface union; r17 adjudicated it heap-invariant but never split the
  * cost between the band join's exchange, the per-pair cosine loop, and the
  * connected-components rounds). Regimes, each computing from the same
  * banded candidate structure (3 runs, median, ProbeQ teardown discipline):
  *
  *   candidates_ids      explode + (band,bucket) self-join, ids only — the
  *                       narrow exchange + join floor, no embedding payload,
  *                       no cosine
  *   candidates_payload  same join carrying both embeddings, O(1) arithmetic
  *                       (element_at) — isolates the payload-carry cost
  *   verify_current      the registered [[Similarity.embedNearDupBanded]]
  *                       (cosine_sim per candidate: 3 FMA/elem + 2 sqrt + div)
  *   verify_prenorm      per-vector reciprocal norm computed BEFORE the band
  *                       explode, per-pair dot_product only (1 FMA/elem, no
  *                       sqrt/div) — `dot * rinvA * rinvB`
  *   full_current        the registered q_embed_clusters (verify + CC)
  *
  * Plus untimed: candidate/verified-pair counts, and an EXACT output
  * comparison verify_current vs verify_prenorm (anti-joins both ways + a
  * value diff on cos_sim) — the adoption gate for the prenorm form.
  *
  * Usage: `tools/runjava.sh graft.EmbedBandProbe <sfDir> [runsPerRegime]`
  */
object EmbedBandProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EmbedBandProbe <sfDir> [runs]")
    val d = args.head
    val runsPer = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = Bench.shufflePartitions(d, cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables(spark, d, "embeddings")
    val n = emb.count()
    val bands = 4
    val bits = Similarity.autoBits(n)
    println(s"[probe] n=$n bands=$bands bits=$bits parts=$parts cpus=$cpus")

    // Warm the input before any timed regime (the skew probe's lesson:
    // regime order must not decide who pays the cold read).
    Bench.forceEval(emb)

    def bandedSides(withInv: Boolean): (DataFrame, DataFrame) = {
      val base =
        if (withInv) {
          val nrm = sqrt(graft.functions.Functions.dotProduct(col("embedding"), col("embedding")))
          emb.select(col("vec_id"), col("embedding"),
            when(nrm === 0.0, 0.0).otherwise(lit(1.0) / nrm).as("rinv"),
            explode(Similarity.bandBuckets(col("embedding"), bands, bits)).as("bb"))
        } else {
          emb.select(col("vec_id"), col("embedding"),
            explode(Similarity.bandBuckets(col("embedding"), bands, bits)).as("bb"))
        }
      val eb = base.select(
        Seq(col("vec_id"), col("embedding")) ++
          (if (withInv) Seq(col("rinv")) else Nil) ++
          Seq(col("bb.band").as("band"), col("bb.bucket").as("bucket")): _*)
      val a = eb.toDF(eb.columns.map(c => if (c == "band" || c == "bucket") c else c + "_a"): _*)
      val b = eb.toDF(eb.columns.map(c => if (c == "band" || c == "bucket") c else c + "_b"): _*)
      (a, b)
    }

    def candIds(): DataFrame = {
      val (a, b) = bandedSides(withInv = false)
      a.select(col("vec_id_a"), col("band"), col("bucket"))
        .join(b.select(col("vec_id_b"), col("band"), col("bucket")), Seq("band", "bucket"))
        .filter(col("vec_id_a") < col("vec_id_b"))
        .select(col("vec_id_a"), col("vec_id_b"))
    }

    def candPayload(): DataFrame = {
      val (a, b) = bandedSides(withInv = false)
      a.join(b, Seq("band", "bucket"))
        .filter(col("vec_id_a") < col("vec_id_b"))
        .select(col("vec_id_a"), col("vec_id_b"),
          element_at(col("embedding_a"), 1).as("ea"),
          element_at(col("embedding_b"), 1).as("eb"))
    }

    /** The prenorm mirror of [[Similarity.embedNearDupBanded]]: identical
      * candidate set, identical dedup/round/order — only the per-pair
      * arithmetic changes (dot * rinvA * rinvB, accumulation order of the
      * dot identical to cosine_sim's). */
    def verifyPrenorm(threshold: Double): DataFrame = {
      val (a, b) = bandedSides(withInv = true)
      a.join(b, Seq("band", "bucket"))
        .filter(col("vec_id_a") < col("vec_id_b"))
        .select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"),
          (graft.functions.Functions.dotProduct(col("embedding_a"), col("embedding_b")) *
            col("rinv_a") * col("rinv_b")).as("cos"))
        .filter(col("cos") >= threshold)
        .groupBy("vec_a", "vec_b")
        .agg(first(col("cos")).as("cos"))
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 2).as("cos_sim"))
        .orderBy("vec_a", "vec_b")
    }

    def fullPrenorm(): DataFrame =
      Dedup.connectedComponentsAuto(
          verifyPrenorm(0.40).select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("id").as("vec_id"), col("comp").as("canonical_id"))
        .orderBy("vec_id")

    // EXPLAIN=1: print formatted plans for the two verify forms and exit —
    // the plan diff for the prenorm adjudication.
    if (sys.env.get("EXPLAIN").contains("1")) {
      println("=== verify_current plan ===")
      println(Similarity.embedNearDupBanded(emb, 0.40, bands, bits)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      println("=== verify_prenorm plan ===")
      println(verifyPrenorm(0.40)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      spark.stop(); return
    }

    // CCONLY=1: materialize the verified pairs once (localCheckpoint), then
    // time the CC strategies over them — the decomposition of the full
    // query's CC share, plus which strategy connectedComponentsAuto picks.
    if (sys.env.get("CCONLY").contains("1")) {
      val pairs = Similarity.embedNearDupBanded(emb, 0.40, bands, bits)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        .localCheckpoint()
      println(s"[probe] verified edges=${pairs.count()}")
      // Teardown must NOT unpersist the shared checkpointed input (the
      // first CCONLY run lost rdd blocks and failed the second regime).
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      def teardown(): Unit = {
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => keep(id) }
          .values.foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(1500)
      }
      def timed(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        teardown()
      }
      // Untimed warmup so the first timed regime does not alone pay cold
      // page cache / JIT (the skew probe's order-bias lesson).
      Bench.forceEval(Dedup.connectedComponentsStar(pairs))
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(1500)
      timed("ccAuto (probe=8, registered)") {
        val (labels, strat) = Dedup.ccAutoWithStrategy(pairs)
        Bench.forceEval(labels); print(s"[probe] strategy=$strat ")
      }
      timed("star alone") {
        val (labels2, alts) = Dedup.starContraction(pairs)
        Bench.forceEval(labels2); print(s"[probe] alternations=$alts ")
      }
      timed("min-label to convergence") {
        val (labels3, strat3) = Dedup.ccAutoWithStrategy(pairs, probeIterations = 50)
        Bench.forceEval(labels3); print(s"[probe] strategy=$strat3 ")
      }
      // Adoption gate: the auto path's labels must EQUAL star's, row for row.
      val auto = Dedup.ccAutoWithStrategy(pairs)._1
      val star = Dedup.connectedComponentsStar(pairs)
        .withColumnRenamed("comp", "comp_star")
      val diff = auto.join(star, Seq("id"), "full")
        .filter(col("comp").isNull || col("comp_star").isNull ||
          col("comp") =!= col("comp_star")).count()
      println(s"[probe] label diffs auto-vs-star=$diff")
      spark.stop(); return
    }

    val regimes: Seq[(String, () => DataFrame)] = Seq(
      "candidates_ids" -> (() => candIds()),
      "candidates_payload" -> (() => candPayload()),
      "verify_current" -> (() => Similarity.embedNearDupBanded(emb, 0.40, bands, bits)),
      "verify_prenorm" -> (() => verifyPrenorm(0.40)),
      "full_current" -> (() => SparkEntry.queries("q_embed_clusters")(spark, d)),
      "full_prenorm" -> (() => fullPrenorm())
    )

    for ((name, mk) <- regimes) {
      val times = (1 to runsPer).map { _ =>
        val t0 = System.nanoTime()
        Bench.forceEval(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(1500); System.gc(); Thread.sleep(1500)
        dt
      }.sorted
      println(f"[probe] $name%-20s median ${times(times.size / 2)}%8.2f s  (min ${times.head}%.2f, max ${times.last}%.2f)")
    }

    // Untimed structure counts.
    val nCand = candIds().count()
    val nVer = Similarity.embedNearDupBanded(emb, 0.40, bands, bits).count()
    println(s"[probe] candidate rows (pre-dedup, band-duplicated)=$nCand verified pairs=$nVer")

    // Adoption gate: EXACT equality of the verify outputs.
    val cur = Similarity.embedNearDupBanded(emb, 0.40, bands, bits)
    val pre = verifyPrenorm(0.40)
    val onlyCur = cur.join(pre, Seq("vec_a", "vec_b"), "left_anti").count()
    val onlyPre = pre.join(cur, Seq("vec_a", "vec_b"), "left_anti").count()
    val valDiff = cur.withColumnRenamed("cos_sim", "c1")
      .join(pre.withColumnRenamed("cos_sim", "c2"), Seq("vec_a", "vec_b"))
      .filter(col("c1") =!= col("c2")).count()
    println(s"[probe] equality: pairs only-current=$onlyCur only-prenorm=$onlyPre value-diffs=$valDiff")
    spark.stop()
  }
}
