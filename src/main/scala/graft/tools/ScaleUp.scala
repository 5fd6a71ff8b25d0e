// Deterministic scale-up of a driver-generated sf directory: tiles the
// fact tables `factor`× with key-shifted, content-perturbed replicas and
// copies the dimensions through, so larger-sf scaling runs (Bench,
// ScaleProbe) measure organic corpus growth rather than planted exact
// duplication. Run:
//   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 <outDir> 10"
//
// Perturbation scheme (same rationale as ScaleProbe's copies):
//  - documents: per-replica seeded alphabet PERMUTATION — each replica
//    is a disjoint sub-corpus with the original's internal dup
//    statistics (a suffix would make every replica a near-dup of its
//    original and candidate pairs would grow quadratically in the
//    factor, which is duplication, not scale). Permutations, not
//    rotations: rotations form a group of order 26, so a downstream
//    tool that perturbs the same way (ScaleProbe's copies) composes
//    rot(a)∘rot(b)=rot(a+b) and collides with an existing replica —
//    planting exact duplicates. Random permutations composed with
//    random permutations are new random permutations; a collision
//    needs two independent 26!-space draws to coincide;
//  - embeddings: per-replica hash-seeded sign mask (~half the dims
//    flip) — norms and intra-replica geometry preserved, expected
//    cross-replica cosine ~0. A modular mask like (j+i)%3 has only 3
//    distinct values, making replicas i and i+3 EXACT duplicates;
//    hash masks are pairwise independent (salt 7 here; ScaleProbe's
//    copies use salt 13 so the two tools never cancel);
//  - orders/lineitem: order keys shifted per replica (FK consistency
//    preserved), dimensions shared — the TPC-H scaling shape, where
//    fact rows grow and dimension cardinalities hold;
//  - events: event ids shifted, timestamps offset by the replica index
//    seconds so no replica row collides exactly.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ScaleUp {
  private val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleUp <srcSfDir> <outDir> [factor=10]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the driver writes events.ts as TIMESTAMP(NANOS) — readable only as
    // a long under this flag (Tables.register sets the same)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def write(n: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[scaleup] $n: ${spark.read.parquet(s"$out/$n.parquet").count()} rows")
    }
    def tiled(df: DataFrame, replica: Int => DataFrame): DataFrame =
      (0 until factor).map(i => if (i == 0) df else replica(i))
        .reduce(_ unionAll _)

    // dimensions pass through unchanged
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(n, read(n)))

    val abc = "abcdefghijklmnopqrstuvwxyz"
    write("documents", tiled(read("documents"), { i =>
      val perm = new scala.util.Random(1000L + i)
        .shuffle(abc.toList).mkString
      read("documents").select(
        (col("doc_id") + lit(i * Stride)).as("doc_id"),
        translate(col("text"), abc, perm).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }))

    write("embeddings", tiled(read("embeddings"), { i =>
      read("embeddings").select(
        (col("vec_id") + lit(i * Stride)).as("vec_id"),
        expr(s"transform(embedding, (x, j) -> CAST(x * CASE WHEN " +
          s"pmod(hash(j, 7, $i), 2) = 0 THEN -1.0 ELSE 1.0 END AS FLOAT))")
          .as("embedding"),
        col("label"))
    }))

    write("orders", tiled(read("orders"), { i =>
      read("orders").withColumn("o_orderkey",
        col("o_orderkey") + lit(i * Stride))
    }))

    write("lineitem", tiled(read("lineitem"), { i =>
      read("lineitem").withColumn("l_orderkey",
        col("l_orderkey") + lit(i * Stride))
    }))

    // ts arrives either as a nanos LONG (TIMESTAMP(NANOS) source under the
    // flag above — offset in nanos, column stays a long) or as a
    // timestamp/_NTZ column (µs-precision fixtures — offset via INTERVAL);
    // either way the output round-trips through Tables.register exactly
    // like the source
    val eventsTsIsLong =
      read("events").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
    write("events", tiled(read("events"), { i =>
      read("events")
        .withColumn("event_id", col("event_id") + lit(i * Stride))
        .withColumn("ts",
          if (eventsTsIsLong) col("ts") + lit(i * 1000000000L)
          else col("ts") + expr(s"INTERVAL $i SECOND"))
    }))

    spark.stop()
  }
}
