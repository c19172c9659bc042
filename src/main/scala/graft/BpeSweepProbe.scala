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

    // LIVE deep-merge datum (r17): the pad sweep above proves the rank
    // TABLE's size is free, but the fixture corpus holds only ~31 short
    // distinct tokens, so its encode loop performs little merge work. A
    // structured synthetic vocabulary closes that: 20 000 distinct
    // tokens composed of 2-char syllables from a 40-syllable set (so
    // pair statistics repeat and BPE finds real structure), Zipf
    // frequencies, trained LIVE at K=1024 — every probe in the encode
    // loop walks a genuinely learned production-shape table and tokens
    // compress through multi-level merges. Encoded over a 10 M-row
    // synthetic token column served from a plan-constant lookup array
    // (no disk IO — isolates pure encode cost).
    {
      val syll = (0 until 40).map { i =>
        val a = ('a' + i % 26).toChar; val b = ('a' + (i * 7 + 3) % 26).toChar
        s"$a$b"
      }
      val toks = (0 until 20000).map { i =>
        val n = 5 + i % 4 // 10-16 chars
        // hash-mixed syllable choice: pairs draw from the full 40x40
        // space (a linear progression collapses to 40 distinct pairs
        // and the trainer converges after ~96 merges)
        (0 until n).map { j =>
          val h = (i * 2654435761L + j * 40503L) ^ ((i + j) >> 2)
          syll(((h >>> 5) % 40).toInt)
        }.mkString
      }.toArray
      val zipf = toks.zipWithIndex.map { case (t, i) => (t, 1000000L / (i + 1)) }
      val t1 = System.nanoTime()
      val live = graft.operators.BpeModel.learnMergesLocal(zipf, 1024)
      val liveTrain = (System.nanoTime() - t1) / 1e9
      println(f"""SWEEP {"point":"live_train","k":1024,"vocab":${toks.length}%d,"live_merges":${live.size}%d,"sec":$liveTrain%.3f}""")
      import org.apache.spark.sql.functions.{typedlit, element_at}
      def q() = {
        val tok = element_at(typedlit(toks.toSeq),
          (col("id") % toks.length).cast("int") + 1)
        val units = org.apache.spark.sql.GraftShim.column(
          graft.functions.expressions.BpeUnitCount(
            org.apache.spark.sql.GraftShim.expression(tok), live))
        spark.range(0, 10000000L, 1, 32)
          .select((col("id") % 17).as("g"), units.as("u"))
          .groupBy(col("g")).agg(sum(col("u")).as("bpe_tokens"))
      }
      Q.force(q())
      val sec = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); Q.force(q())
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""SWEEP {"point":"live_encode","k":1024,"rows":10000000,"sec":$sec%.3f}""")
      // and the same live deep-merge load against a 32k-slot table (live
      // head + inert pad): production table size AND real merge work
      val live32k = live ++ (live.size until 32768).map(i => (s"A$i", s"0$i"))
      def q32() = {
        val tok = element_at(typedlit(toks.toSeq),
          (col("id") % toks.length).cast("int") + 1)
        val units = org.apache.spark.sql.GraftShim.column(
          graft.functions.expressions.BpeUnitCount(
            org.apache.spark.sql.GraftShim.expression(tok), live32k))
        spark.range(0, 10000000L, 1, 32)
          .select((col("id") % 17).as("g"), units.as("u"))
          .groupBy(col("g")).agg(sum(col("u")).as("bpe_tokens"))
      }
      Q.force(q32())
      val sec32 = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); Q.force(q32())
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""SWEEP {"point":"live_encode_32k","k":32768,"rows":10000000,"sec":$sec32%.3f}""")
    }
    spark.stop()
  }
}
