package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: `sbt "runMain graft.Explain <query-key>"`
  * prints the formatted physical plan of a declared query and times three
  * consecutive executions (first run absorbs codegen/JIT warmup) against
  * `SPARK_GRAFT_SF_DIR`. This is the iterate-on-the-plan loop the scale
  * notes in each operator module refer to. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("sim_edges")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      df.count()
      println(f"[explain] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
