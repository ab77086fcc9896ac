package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Property-style checks for the cosine/similitud expressions (SURVEY §5.2
  * tier 3): symmetry, bounds, self-similarity, and the ANSI-mode zero-norm
  * guard from ADVICE r1. Samples are seeded so the suite is deterministic.
  */
class VectorsSpec extends SparkSpec {

  private def sims(pairs: Seq[(Seq[Float], Seq[Float])]): Seq[Option[Double]] = {
    val df = spark.createDataFrame(pairs).toDF("a", "b")
      .select(Vectors.similitud(col("a"), col("b")).as("s"))
    df.collect().toSeq.map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
  }

  private val rnd = new scala.util.Random(42)
  private def vec(): Seq[Float] =
    Seq.fill(8)(rnd.nextFloat() * 10.0f - 5.0f)

  test("similitud is symmetric and bounded in [-100, 100] on 100 random pairs") {
    val pairs = Seq.fill(100)((vec(), vec()))
    val fwd = sims(pairs)
    val bwd = sims(pairs.map(_.swap))
    fwd.zip(bwd).foreach { case (ab, ba) => assert(ab === ba) }
    fwd.flatten.foreach(v => assert(v >= -100.0001 && v <= 100.0001))
  }

  test("self-similarity is exactly 100") {
    val vs = Seq.fill(20)(vec())
    sims(vs.map(v => (v, v))).foreach(v => assert(v.contains(100.0)))
  }

  test("zero-norm vector yields NULL, not DIVIDE_BY_ZERO (ANSI mode)") {
    val zero = Seq(0.0f, 0.0f, 0.0f, 0.0f)
    val a = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    assert(sims(Seq((zero, a))).head.isEmpty)
    assert(sims(Seq((zero, zero))).head.isEmpty)
  }

  test("dot/norm/l2sq agree with hand computation") {
    val df = spark.createDataFrame(Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))))
      .toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("d"),
        Vectors.norm(col("a")).as("na"),
        Vectors.l2sq(col("a"), col("b")).as("l2"))
    val r = df.collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    assert(r.getDouble(2) === 8.0)
  }
}
