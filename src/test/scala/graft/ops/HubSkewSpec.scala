package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Hub-skew evidence for the graph tier, measured on a hub-heavy
  * fixture (one node carrying ~half the edges) via per-task shuffle
  * metrics — the "would this survive a hot key at 100 TB" claims for
  * [[Graph.pagerank]] and [[Graph.triangles]], demonstrated rather
  * than argued:
  *
  *  - pagerank's per-iteration join reads the CACHED edge side, which
  *    is outside AQE's reach (skew-join split only re-slices shuffle
  *    map outputs) — so the cache LAYOUT is the skew story, and
  *    `saltBuckets` is the control that spreads a hub across it.
  *  - triangles' degree-annotation joins are plain shuffle joins that
  *    a hub key DOES concentrate; AQE's skew split re-slices them at
  *    runtime. The wedge join, the part that would be quadratic in
  *    the hub, is protected structurally by the degree orientation
  *    (a hub's edges all point INTO it, so it is never a wedge apex).
  *
  * Assertions use max shuffle-records-read per task: deterministic
  * where task durations are noisy. AQE partition coalescing is
  * disabled during measurement — at fixture scale it folds every
  * tiny shuffle into one task, which would read as fake "skew"
  * (and at real scale coalescing only merges SMALL partitions, so
  * disabling it here removes noise, not protection). */
class HubSkewSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark

  private class MaxTaskRecords extends SparkListener {
    val maxShuffle = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        maxShuffle.getAndAccumulate(
          m.shuffleReadMetrics.recordsRead, math.max)
        tasks.incrementAndGet()
      }
    }
  }

  /** Wait for the async listener bus to drain: poll until the task
    * counter stops moving. */
  private def settled(l: MaxTaskRecords): Unit = {
    var last = -1L
    var same = 0
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (same < 3 && System.nanoTime() < deadline) {
      val now = l.tasks.get()
      if (now == last) same += 1 else { same = 0; last = now }
      Thread.sleep(50)
    }
  }

  private def measure[A](body: => A): (A, Long) = {
    val l = new MaxTaskRecords
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      settled(l)
      (r, l.maxShuffle.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // 64 partitions so the per-task background share — uniform edges
  // (~m/64) plus the salt-exploded node-sized tables (~8n/64) — stays
  // far below the hub degree and concentration is unambiguous
  private val measureConfs = Map(
    "spark.sql.shuffle.partitions" -> "64",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  private val hubDeg = 30000
  /** Hub graph: node 0 is the source of `hubDeg` DISTINCT-dst edges
    * (half the graph); the other half is pseudorandom among the hub's
    * neighbors (so triangles through the hub exist). Distinctness
    * matters: a modular fixture would collapse under the canonical
    * dedupe and the "hub" would stop being one. */
  private def hubEdges: DataFrame = {
    import spark.implicits._
    val hub = spark.range(hubDeg)
      .select(lit(0L).as("src"), (col("id") + 1).as("dst"))
    val uniform = spark.range(hubDeg)
      .select((col("id") * 2654435761L % hubDeg + 1).as("src"),
        (col("id") * 40503L % hubDeg + 1).as("dst"))
    hub.unionAll(uniform).filter($"src" =!= $"dst")
  }

  test("pagerank: salt_buckets bounds the hub's per-task records; " +
      "ranks identical") {
    def run(salt: Int): (Map[Long, Double], Long) = withConfs(measureConfs) {
      measure {
        Graph.pagerank(hubEdges, "src", "dst", iterations = 2,
            saltBuckets = salt)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
    }
    val (r1, maxUnsalted) = run(1)
    val (r8, maxSalted) = run(8)
    info(s"max shuffle records/task: unsalted=$maxUnsalted salted=$maxSalted")

    // identical ranks: salting regroups the same contribution sum
    assert(r1.keySet == r8.keySet)
    r1.foreach { case (k, v) => assert(math.abs(v - r8(k)) < 1e-12,
      s"node $k: unsalted $v vs salted ${r8(k)}") }
    assert(math.abs(r1.values.sum - 1.0) < 1e-9)

    // unsalted: the hub's whole out-edge list funnels through single
    // tasks in the cache-build/degree-fold shuffles, and that cached
    // layout is what every iteration's join inherits
    assert(maxUnsalted >= hubDeg,
      s"fixture check: expected a >=$hubDeg-record hub task, saw " +
        s"$maxUnsalted")
    // salted 8 ways: hub share ~hubDeg/8 + uniform share ~m/32 +
    // salted-ranks shuffle (~8n/32) — assert the order-of-magnitude
    // drop with slack
    val bound = hubDeg / 2
    assert(maxSalted < bound,
      s"salted hub not spread: max $maxSalted, want < $bound " +
        s"(unsalted was $maxUnsalted)")
  }

  test("triangles: salt_buckets bounds the degree-annotation joins on " +
      "a hub graph; counts identical") {
    // broadcast disabled so the degree joins exercise the shuffle
    // path they'd take at 100 TB node counts (the degree table stops
    // being broadcastable long before the edge list is interesting)
    val confs = measureConfs +
      ("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    def run(salt: Int): (Map[Long, Long], Long) = withConfs(confs) {
      measure {
        Graph.triangles(hubEdges, "src", "dst", saltBuckets = salt)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    }
    val (c1, maxUnsalted) = run(1)
    val (c8, maxSalted) = run(8)
    info(s"max shuffle records/task: unsalted=$maxUnsalted " +
      s"salted=$maxSalted; nodes in triangles=${c1.size}")

    assert(c1.nonEmpty) // hub graph has triangles through node 0
    assert(c1 == c8) // identical triangle counts — salt only re-groups
    // unsalted: the hub's whole canonical adjacency (a = hub for
    // every hub edge) funnels through one degree-join task. This is
    // the skew AQE cannot be relied on to split here: the canonical
    // edge exchange is reused by the degree aggregation, which blocks
    // the skew-join reader.
    assert(maxUnsalted >= hubDeg,
      s"fixture check: expected a >=$hubDeg-record hub task unsalted, " +
        s"saw $maxUnsalted")
    // salted 8 ways: hub share ~hubDeg/8 + uniform share ~m/32; the
    // wedge join never concentrates regardless (orientation: every
    // hub edge points INTO the hub, so it is never a wedge apex)
    assert(maxSalted < hubDeg / 2,
      s"salted hub not spread: max $maxSalted records/task, want < " +
        s"${hubDeg / 2} (unsalted was $maxUnsalted)")
  }
}
