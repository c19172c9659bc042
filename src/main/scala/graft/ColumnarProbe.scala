package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Dev tool (r11, VERDICT task 7): decompose the t1/v1 per-row scan
  * floor by measuring what a COLUMNAR consumer can do over the exact
  * same parquet, without Spark's row materialization boundary.
  *
  * Tiers, each warm min-of-5 on the SPARK_GRAFT_SCALE fixture:
  *   t1_sql        — the production t1 plan (groupBy date_trunc).
  *   t1_countstar  — bare `count(*)` over events (the r10 floor datum).
  *   t1_columnar   — hand-rolled per-batch (hour, event_type) count/sum
  *                   over `executeColumnar()` batches: no ColumnarToRow,
  *                   no row hashing — the cheapest aggregate ANY engine
  *                   could run over these bytes short of skipping decode.
  *   v1_sql        — the production v1 plan (broadcast qvec + top-k).
  *   v1_columnar   — per-batch dot/norm over the ColumnarArray child
  *                   (no array copy, no row), per-partition top-10 heap.
  *
  * Reading the result: if t1_columnar ≈ t1_sql, the wall is parquet
  * decode + per-row iteration itself and the SQL plan is floor-bound —
  * close the item. If t1_columnar ≪ t1_sql, the ColumnarToRow boundary
  * is the cost and a custom columnar aggregate exec would pay.
  *
  * Usage: `SPARK_GRAFT_SCALE=100 sbt "runMain graft.ColumnarProbe"`.
  */
object ColumnarProbe {

  private def time(f: => Unit): Double = {
    (1 to 2).foreach(_ => f) // warm
    (1 to 5).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val dir0 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-columnar-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.get("SPARK_GRAFT_SCALE").map { n =>
      val out = s"/tmp/graft-scale-${n}x"
      ScaleProbe.scaled(spark, dir0, out, n.toInt)
      out
    }.getOrElse(dir0)

    // ——— t1 tiers ———
    val t1Sql = time {
      operators.StreamingQueries.t1_tumbling(spark, dir).collect()
    }
    // the same aggregate without the final global sort: isolates the
    // orderBy exchange from the partial+final agg cost
    val t1NoOrder = time {
      Tables.events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect()
    }
    val countStar = time {
      spark.read.parquet(s"$dir/events.parquet").count()
    }
    val t1Col = time {
      val df = spark.read.parquet(s"$dir/events.parquet")
        .select("ts", "event_type", "value")
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      val agg = scan.executeColumnar().mapPartitions { it =>
        // (hour-bucket, interned type id) → [count, sum]; UTF8String keys
        // cloned once per distinct type, never per row
        val typeIds = new java.util.HashMap[UTF8String, Integer]()
        val names = new scala.collection.mutable.ArrayBuffer[String]()
        val acc = new java.util.HashMap[Long, Array[Double]]()
        it.foreach { batch =>
          val c0 = batch.column(0); val c1 = batch.column(1)
          val c2 = batch.column(2)
          var i = 0
          val n = batch.numRows()
          while (i < n) {
            val tsNanos = c0.getLong(i)
            val hour = Math.floorDiv(tsNanos, 3600L * 1000000000L)
            val et = c1.getUTF8String(i)
            var id = typeIds.get(et)
            if (id == null) {
              id = Integer.valueOf(typeIds.size())
              typeIds.put(et.clone(), id)
              names += et.toString
            }
            val key = hour * 64L + id.intValue()
            var slot = acc.get(key)
            if (slot == null) { slot = new Array[Double](2); acc.put(key, slot) }
            slot(0) += 1.0
            slot(1) += c2.getDouble(i)
            i += 1
          }
        }
        import scala.jdk.CollectionConverters._
        acc.asScala.iterator.map { case (k, v) =>
          ((k >> 6, names((k & 63L).toInt)), (v(0).toLong, v(1)))
        }
      }
      // few-hundred-group driver reduce: the probe measures the scan+agg
      val merged = new scala.collection.mutable.HashMap[(Long, String), (Long, Double)]()
      agg.collect().foreach { case (k, (n1, s1)) =>
        val (n0, s0) = merged.getOrElse(k, (0L, 0.0))
        merged(k) = (n0 + n1, s0 + s1)
      }
      require(merged.nonEmpty)
    }

    // ——— v1 tiers ———
    val v1Sql = time {
      operators.VectorQueries.v1_knn_exact(spark, dir).collect()
    }
    val qvec = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    val v1Col = time {
      val df = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      val bq = spark.sparkContext.broadcast(qvec)
      val tops = scan.executeColumnar().mapPartitions { it =>
        val q = bq.value
        var qn = 0.0
        q.foreach(x => qn += x.toDouble * x)
        val qnorm = math.sqrt(qn)
        // fixed-size top-10 by (cos desc, vec_id asc)
        val top = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by { case (c, id) => (-c, id) })
        it.foreach { batch =>
          val c0 = batch.column(0); val c1 = batch.column(1)
          var i = 0
          val n = batch.numRows()
          while (i < n) {
            val arr = c1.getArray(i)
            var dot = 0.0; var nn = 0.0
            var j = 0
            val m = arr.numElements()
            while (j < m) {
              val x = arr.getFloat(j).toDouble
              dot += x * q(j); nn += x * x
              j += 1
            }
            val cos = dot / (math.sqrt(nn) * qnorm)
            if (top.size < 10) top.enqueue((cos, c0.getLong(i)))
            else if (cos > top.head._1) { top.dequeue(); top.enqueue((cos, c0.getLong(i))) }
            i += 1
          }
        }
        top.iterator
      }.collect().sortBy { case (c, id) => (-c, id) }.take(10)
      require(tops.nonEmpty)
    }

    println(f"""{"t1_sql": $t1Sql%.3f, "t1_noorder": $t1NoOrder%.3f, """ +
      f""""t1_countstar": $countStar%.3f, """ +
      f""""t1_columnar": $t1Col%.3f, "v1_sql": $v1Sql%.3f, """ +
      f""""v1_columnar": $v1Col%.3f}""")
    spark.stop()
  }
}
