package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost bisection of the FULL OUTER salted composition
  * (r17): checkpoints the q_salted_join_rewrite_full fixture sides,
  * then times the plain full join, each leg's preserved diagnosis, the
  * composed [[graft.plans.JoinSkew.saltedJoinFullMulti]], and each leg
  * alone — the evidence trail for the entry's floor and its sf1 curve.
  * Run: sbt "runMain graft.tools.FullJoinProbe [sfDir]" */
object FullJoinProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.Tables.register(s, dir)
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[fullprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val e = t("checkpoint e") {
      s.table("events").select(col("event_id"),
        when(col("event_id") % 3 === 0, 0L)
          .otherwise(pmod(col("user_id"), lit(500L)) + 1L).as("k"),
        col("value")).localCheckpoint(true)
    }
    val r = t("checkpoint r") {
      e.filter(col("k") % 5 =!= 2)
        .groupBy("k").agg(count(lit(1)).cast("bigint").as("n_r"))
        .unionAll(s.table("events").filter(col("event_id") % 7 === 0)
          .select(lit(1000L).as("k"), col("event_id").cast("long").as("n_r")))
        .localCheckpoint(true)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("plain full join") { noop(e.join(r, Seq("k"), "full")) }
    val p1 = t("diag left (preserved)") {
      graft.plans.JoinSkew.saltingPlanMulti(e.select(col("k")),
        r.select(col("k")), Seq("k"), 200L, 5, preserved = true)
        .localCheckpoint(true)
    }
    val p2 = t("diag right (preserved)") {
      graft.plans.JoinSkew.saltingPlanMulti(r.select(col("k")),
        e.select(col("k")), Seq("k"), 200L, 5, preserved = true)
        .localCheckpoint(true)
    }
    println("[fullprobe] left plan:"); p1.show(5, false)
    println("[fullprobe] right plan:"); p2.show(5, false)
    t("composed saltedJoinFullMulti") {
      noop(graft.plans.JoinSkew.saltedJoinFullMulti(e, r, Seq("k"), p1, p2))
    }
    t("leg1 alone (salted left outer)") {
      noop(graft.plans.JoinSkew.saltedJoinMulti(e, r, Seq("k"), p1,
        joinType = "left"))
    }
    t("leg2 alone (salted anti)") {
      noop(graft.plans.JoinSkew.saltedJoinMulti(r, e.select("k"), Seq("k"),
        p2, joinType = "left_anti"))
    }
    s.stop()
  }
}
