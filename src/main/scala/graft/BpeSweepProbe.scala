package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not part of the driver contract): the production-vocab
  * K-sweep datum for [[graft.functions.expressions.BpeUnitCount]] — the
  * r16 verdict asked for a measured curve behind the "O(len²) per token,
  * K-INDEPENDENT" claim at real vocabulary sizes (256 → 4k → 32k), not
  * just the K=256 gate.
  *
  * Method: the ACTIVE head of the table is the real learnMergesLocal
  * K=256 output for the corpus (so the encode loop does real merge work
  * at every sweep point — identical merge behavior isolates the variable
  * under test), padded to the target K with INERT merges whose symbols
  * contain bytes outside [a-z]: the encoder only reaches the rank table
  * for `\A[a-z]+\z` tokens whose symbols are [a-z] spans, so a pad entry
  * can never match a probe — it only grows the open-addressed table the
  * probes walk. A flat curve = the probe cost does not scale with table
  * size, which is the whole claim (a real 32k table's extra LIVE merges
  * only reduce loop iterations further by merging tokens deeper).
  *
  * Also sweeps the FREQUENCY-FLOOR prune (collectVocab minFreq — the
  * web-scale vocab-cap path, r17): vocab rows surviving floors 1/2/4 and
  * the encode wall under the table each floor trains.
  *
  * Usage: `sbt "runMain graft.BpeSweepProbe [sfDir]"` (default sf0.1);
  * prints one `SWEEP {...}` JSON line per point; numbers land in
  * SCALE.md.
  */
object BpeSweepProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def encodeWall(merges: Seq[(String, String)]): Double = {
      def q() = {
        val units = org.apache.spark.sql.GraftShim.column(
          graft.functions.expressions.BpeUnitCount(
            org.apache.spark.sql.GraftShim.expression(col("tok")), merges))
        graft.Tables.documents(spark, d)
          .select(col("source"), explode(
            graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
          .select(col("source"), units.as("u"))
          .groupBy(col("source")).agg(sum(col("u")).as("bpe_tokens"))
      }
      Q.force(q()) // warm codegen + plan
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Q.force(q())
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val vocab = graft.operators.BpeModel.collectVocab(spark, d)
    val t0 = System.nanoTime()
    val head = graft.operators.BpeModel.learnMergesLocal(vocab, 256)
    val trainSec = (System.nanoTime() - t0) / 1e9
    println(f"""SWEEP {"point":"train","k":256,"vocab":${vocab.length}%d,"sec":$trainSec%.3f}""")

    // inert pad: 'A'/'0' bytes are outside [a-z], unreachable from any
    // [a-z]-span probe; unique per index so the table holds K live slots
    def pad(k: Int): Seq[(String, String)] =
      head ++ (head.size until k).map(i => (s"A$i", s"0$i"))
    Seq(256, 4096, 32768).foreach { k =>
      val sec = encodeWall(pad(k))
      println(f"""SWEEP {"point":"encode","k":$k%d,"sec":$sec%.3f}""")
    }

    // frequency-floor prune: surviving vocab + the encode wall under the
    // table each floor trains (the defined web-scale path)
    Seq(1L, 2L, 4L).foreach { floor =>
      val v = graft.operators.BpeModel.collectVocab(spark, d, minFreq = floor)
      val m = graft.operators.BpeModel.learnMergesLocal(v, 256)
      val sec = encodeWall(m)
      println(f"""SWEEP {"point":"prune","min_freq":$floor%d,"vocab":${v.length}%d,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
