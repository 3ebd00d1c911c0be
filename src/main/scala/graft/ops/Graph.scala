package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge DataFrames — the power-method
  * PageRank the GraphX docs describe, re-expressed as plain
  * relational iterations so it runs on any `(src, dst)` edge table
  * with no special graph runtime.
  *
  * Scale shape per iteration:
  *  - one shuffle join (edges ⋈ ranks on `src`, both sides
  *    hash-partitioned on the same key — the partitioning is reused
  *    across iterations since the edge side is persisted pre-hashed),
  *  - partial-aggregated `sum` of contributions on `dst`,
  *  - the dangling-mass term is a single-row aggregate cross-joined
  *    in (a 1-row broadcast, never a collect),
  *  - the new rank frame is `localCheckpoint(eager = true)`d each
  *    `checkpointInterval` iterations (default: every one) and at the
  *    end; persist+count in between. The checkpoint truncates the
  *    analyzed LOGICAL plan to a stats-bearing `LogicalRDD` leaf —
  *    necessary because each iteration references `ranks` twice
  *    (contribution join + dangling anti-join), so with lineage
  *    intact the tree doubles per iteration (~2^n nodes): past ~10
  *    the driver OOMs on plan strings, and even within a 5-wide
  *    interval Catalyst's re-planning of the doubled tree measures
  *    multiples of the iteration's compute. Superseded frames are
  *    unpersisted; checkpoint blocks are released by the
  *    ContextCleaner once dropped.
  * Driver state is O(1): iteration index and nothing else. At 100 TB
  * the edge table is the big side; it is persisted once (deserialized
  * columnar), and every iteration's shuffle moves only `(node, rank)`
  * pairs — 16 bytes of payload per node, not edges.
  */
object Graph {

  /** PageRank over a directed edge list with uniform teleport and
    * dangling-mass redistribution:
    *
    * `rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + D/N)`
    *
    * where `D` is the total rank mass sitting on dangling nodes
    * (no outgoing edges). Nodes = distinct endpoints of `edges`.
    * Returns `(node, rank)`; ranks sum to 1 at every iteration.
    *
    * Runs `iterations` fixed steps (deterministic — matches an
    * unrolled SQL oracle), each materialized via persist + count,
    * with an eager local checkpoint every `checkpointInterval` steps
    * and at the end, so the logical plan stays bounded regardless of
    * `iterations`. (Checkpointing trades lineage-based recovery for
    * bounded driver state — the right trade for an iterative
    * algorithm whose recompute-from-scratch cost dwarfs a rerun.)
    * The returned frame is checkpoint-backed; its blocks are
    * reclaimed by the ContextCleaner when the frame is GC'd — no
    * unpersist obligation on the caller.
    *
    * `tol > 0` adds convergence-based early exit: stop once the L1
    * delta `Σ_v |rank'(v) - rank(v)|` drops to `tol` or below. The
    * delta is one join+aggregate per iteration over two frames that
    * are already materialized (checkpointed/persisted), so its cost
    * is a cache scan, not a recompute — at 100 TB this is what stops
    * you paying for configured-but-converged iterations. `tol = 0`
    * (default) preserves the exact fixed-iteration semantics: no
    * delta job runs at all (an L1 delta of exactly 0 is only reached
    * at a true fixed point, but we skip even computing it so the
    * oracle-matched plan shape is untouched).
    *
    * `saltBuckets > 1` is the HUB-SKEW control: the cached edge side
    * is partitioned on `(_src, hash(_dst) % saltBuckets)` instead of
    * `_src` alone, so a hub source whose out-edges would otherwise
    * land in ONE join task (the cached side is not a shuffle, so
    * AQE's skew-join split can never reach it) spreads across
    * `saltBuckets` tasks; the ranks side is exploded ×saltBuckets to
    * meet every bucket, which costs `saltBuckets·n` shuffled rows per
    * iteration — node-sized, negligible against the edge side it
    * de-skews. Results are numerically identical up to float
    * summation order: the contribution sum groups the SAME rows, but
    * salting changes the order/grouping of the floating-point adds,
    * so last-ulp digits can differ (HubSkewSpec asserts 1e-12
    * closeness, not bit equality) — keep saltBuckets = 1 on
    * hash-oracled runs and let the rounding keys absorb the rest.
    * Default 1 = no salting (the right choice when degrees are
    * bounded, e.g. after hub capping).
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, damping: Double = 0.85,
               checkpointInterval: Int = 1, tol: Double = 0.0,
               saltBuckets: Int = 1): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1), got $damping")
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1, got $checkpointInterval")
    require(tol >= 0, s"tol must be >= 0, got $tol")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    // Persist the edge table PRE-HASHED on the per-iteration join
    // key, straight off the (possibly expensive) source subtree so it
    // is scanned exactly ONCE: a cached frame keeps its
    // outputPartitioning, so every iteration's edges ⋈ ranks join
    // reuses this one layout instead of re-shuffling the (big) edge
    // side, and the join moves only node-sized pairs. With salting
    // the layout key is (_src, hash(_dst) % saltBuckets), spreading a
    // hub's out-edges; unsalted keeps the plain hash-by-source layout
    // (and, below, the exact unsalted join chain — no constant salt
    // column riding through the default path's cache and plans).
    val salted = saltBuckets > 1
    val eBase = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    val e = (if (salted)
        eBase.withColumn("_salt",
            pmod(hash(col("_dst")), lit(saltBuckets)).cast("int"))
          .repartition(col("_src"), col("_salt"))
      else eBase.repartition(col("_src")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // out-degree is static across iterations — computed once FROM THE
    // CACHE (unsalted: groupBy on the exact partitioning key, no
    // exchange; salted: partial aggregation emits ≤ saltBuckets rows
    // per source per partition, so the exchange is node-sized) and
    // kept for the dangling anti-join and the rank/deg fold
    val outdeg = e.groupBy("_src").agg(count(lit(1)).as("_deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    outdeg.count()
    // explode, not union: one pass over the cached edges instead of
    // two cache reads feeding the distinct shuffle
    val nodes = e
      .select(explode(array(col("_src"), col("_dst"))).as("node"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one setup action; O(1) driver result

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    val saltVals = array((0 until saltBuckets).map(lit): _*)
    var it = 0
    while (it < iterations) {
      // Salted: the NODE-SIZED side carries everything the edge join
      // needs — rank(u)/outdeg(u), duplicated per salt bucket so
      // every (src, salt) partition of the cached edges meets its
      // row; the big cached side is never re-shuffled. Unsalted: the
      // e ⋈ outdeg ⋈ ranks chain, all keyed on _src against e's
      // cached layout.
      val contrib = (if (salted) {
        val saltedRanks = ranks
          .join(outdeg.withColumnRenamed("_src", "node"), Seq("node"))
          .select(col("node").as("_src"), explode(saltVals).as("_salt"),
            (col("rank") / col("_deg")).as("_rd"))
        e.join(saltedRanks, Seq("_src", "_salt"))
          .select(col("_dst"), col("_rd"))
      } else {
        e.join(outdeg, Seq("_src"))
          .join(ranks.withColumnRenamed("node", "_src"), Seq("_src"))
          .select(col("_dst"), (col("rank") / col("_deg")).as("_rd"))
      })
        .groupBy(col("_dst").as("node"))
        .agg(sum(col("_rd")).as("_c"))
      // Mass on dangling nodes (no out-edges): 1-row aggregate,
      // broadcast via crossJoin — no driver-side collect.
      val dangling = ranks.join(
          outdeg.select(col("_src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
      val nextBase = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("_c"), lit(0.0)) + col("_dm") / n)).as("rank"))
      // Checkpoint on the cadence (default: every iteration — each
      // boundary truncates the analyzed plan to a stats-bearing
      // LogicalRDD leaf, keeping Catalyst's per-iteration planning
      // O(1); measured, the re-planning of even a 4-deep doubled tree
      // costs multiples of the iteration's actual compute). Larger
      // intervals persist+count in between — for clusters where
      // checkpoint I/O dominates tiny iterations.
      val boundary =
        (it + 1) % checkpointInterval == 0 || it + 1 == iterations
      val next =
        if (boundary) nextBase.localCheckpoint(eager = true)
        else {
          val p = nextBase.persist(StorageLevel.MEMORY_AND_DISK)
          p.count()
          p
        }
      // Convergence probe: both frames are materialized, so the L1
      // delta is a cache-scan join + 1-row aggregate. Runs only when
      // tol is enabled, and never turns the final iteration's result
      // into an extra job.
      val converged = tol > 0 && it + 1 < iterations && {
        val delta = next
          .join(ranks.select(col("node"), col("rank").as("_prev")),
            Seq("node"))
          .agg(coalesce(sum(abs(col("rank") - col("_prev"))), lit(0.0)))
          .head().getDouble(0)
        delta <= tol
      }
      ranks.unpersist(blocking = false) // no-op on checkpointed frames
      // Early exit between checkpoints: promote the persisted frame
      // to a checkpoint (a cache scan) so the returned frame is
      // always checkpoint-backed with a leaf plan, as documented.
      ranks =
        if (converged && !boundary) {
          val ck = next.localCheckpoint(eager = true)
          next.unpersist(blocking = false)
          ck
        } else next
      it += 1
      if (converged) it = iterations
    }
    e.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** Per-node degree summary of a directed edge list: out-degree,
    * in-degree, total — the profile pass run before choosing a
    * partitioning/skew strategy for any iterative algorithm. One
    * aggregation per direction, outer-merged on node. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** Exact per-node triangle counts of the UNDIRECTED simple graph
    * (self-loops dropped, directions/duplicates collapsed) — the
    * clustering-coefficient numerator and the classic local-community
    * density signal.
    *
    * Algorithm: degree-ordered orientation (each edge points from the
    * lower (degree, id) endpoint to the higher), then one wedge
    * self-join + one closing-edge join. The orientation is THE scale
    * move: out-degrees are bounded by O(√m) on any graph, so the
    * wedge count is O(m^1.5) worst-case instead of Σ deg² — a hub
    * node's quadratic wedge explosion cannot happen. Which wedges
    * get enumerated changes with the order; the triangle SET does not
    * (each triangle is counted exactly once, at its smallest
    * endpoint), which is why an id-ordered SQL replay hash-matches.
    *
    * Three shuffles (canonical dedupe, degree agg + joins, wedge
    * join keyed on the wedge apex) — all on keys, no driver state.
    * Output: `(node, n_triangles)`, nodes in ≥1 triangle.
    *
    * `saltBuckets > 1` de-skews the two DEGREE-ANNOTATION joins: the
    * orientation bounds the wedge join, but annotating each edge with
    * its endpoints' degrees joins on a single node column, and a hub
    * key funnels its whole adjacency through one task there. AQE's
    * skew split cannot be relied on for these joins (the canonical
    * edge exchange is reused by the degree aggregation, which blocks
    * the skew reader), so the fix is the same salt move as
    * [[pagerank]]: join on `(node, hash(other_end) % saltBuckets)`
    * with the node-sized degree table exploded per bucket. Identical
    * output for any value; HubSkewSpec pins the per-task bound.
    *
    * `wedgeBatches` is the SCRATCH-SPACE control: the wedge stream is
    * the query's largest intermediate, and on very large graphs even
    * the Bloom-pruned wedge shuffle can exceed a single machine's
    * shuffle scratch (the ×100 fixture — ~120M edges, ~30B raw
    * wedges — filled a 45 GB /tmp). Batching slices the wedge APEX
    * space (`hash(u) % B`): each batch generates only its slice's
    * wedges (both wedge legs share the apex, so total wedge
    * GENERATION work is unchanged — only the closing-side build and
    * its m-row shuffle repeat per batch), materializes its node-sized
    * partial counts eagerly, and releases its shuffle files before
    * the next batch starts, so peak scratch is ~1/B of the one-shot
    * plan. 0 (default) = auto: on graphs big enough for the Bloom
    * prune (≥ 16M edges) the projected post-prune wedge shuffle is
    * estimated from the measured out-degree profile and batching
    * engages only when it exceeds `scratchBudgetBytes`; small graphs
    * keep the exact one-shot plan. 1 forces one-shot; ≥ 2 forces
    * that many batches. Batch results sum per node — output
    * identical for any value. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String,
                saltBuckets: Int = 1, wedgeBatches: Int = 0,
                scratchBudgetBytes: Long = 16L << 30): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(wedgeBatches >= 0, s"wedgeBatches must be >= 0, got $wedgeBatches")
    require(scratchBudgetBytes > 0,
      s"scratchBudgetBytes must be > 0, got $scratchBudgetBytes")
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // default path keeps the exact unsalted join shape — no constant
    // salt column, explode, or composite keys riding through every
    // caller's plan (same rationale as pagerank's two paths)
    val withDeg = if (saltBuckets == 1) {
      e.join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    } else {
      val saltVals = array((0 until saltBuckets).map(lit): _*)
      val degS = deg.select(col("n"), explode(saltVals).as("_s"), col("d"))
      e.withColumn("_s", pmod(hash(col("b")), lit(saltBuckets)).cast("int"))
        .join(degS.select(col("n").as("a"), col("_s"), col("d").as("da")),
          Seq("a", "_s"))
        .withColumn("_s", pmod(hash(col("a")), lit(saltBuckets)).cast("int"))
        .join(degS.select(col("n").as("b"), col("_s"), col("d").as("db")),
          Seq("b", "_s"))
    }
    // orient low (degree, id) -> high; a < b by construction, so the
    // degree tie falls back to id order
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // the oriented edge list feeds THREE consumers (both wedge sides
    // and the closing join on a different key) — persist it once
    // instead of re-running the self-join + distinct + degree joins
    // per consumer; EAGER like pagerank (result is node-sized, so the
    // localCheckpoint is cheap) so the cache can be dropped before
    // returning
    val oriented0 = withDeg.select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // SHUFFLE_HASH on the build sides: the wedge stream is the
      // largest intermediate in the query (quadratic in per-node
      // oriented out-degree, bounded by sqrt(m) via the orientation)
      // and sort-merge would SORT it twice — once producing it, once
      // for the closing join. Hash-building on the edge list streams
      // the wedges unsorted through both joins. BUT a forced hash
      // build cannot spill, so the edge list must fit per-task
      // memory at ANY scale: size the join partitioning from the
      // measured edge count (~500k oriented edges ≈ 30-40 MB build
      // per task — sized so ALL concurrent tasks' builds fit beside
      // the persisted edge cache in one executor's unified region)
      // instead of trusting the session default — a fixed
      // 32-partition default OOM'd the 120M-edge ×100 fixture. The
      // count also eagerly materializes the shared persist (it fed
      // three consumers lazily before). On small graphs parts =
      // default and the plan is unchanged.
      val m = oriented0.count()
      val parts = math.max(
        edges.sparkSession.sessionState.conf.numShufflePartitions,
        (m / 500000L).toInt + 1)
      // Big graphs: replace the persisted frame with an EAGER local
      // checkpoint before the wedge phase. The cache alone keeps the
      // whole edge-construction lineage (canonical-dedupe distinct +
      // two degree-annotation joins) alive, so those shuffle files —
      // tens of GB at the ×100 fixture, often more than the wedge
      // phase itself — sit on disk for the entire query. Truncating
      // the lineage makes them collectable; the System.gc() nudges
      // the ContextCleaner to delete them NOW, so the wedge phase
      // starts from a clean scratch floor (measured: peak scratch
      // ~47 GB without this, with the construction shuffles
      // co-resident with batch 1's wedge shuffle). Small graphs skip
      // the extra materialization job.
      // DISK_ONLY checkpoint blocks: the default MEMORY_AND_DISK
      // level stores the 100M+-row edge frame as deserialized rows
      // in the protected storage half of unified memory, which
      // starved the very next aggregation (AGGREGATE_OUT_OF_MEMORY
      // at the ×100 fixture). The edge list is re-read a handful of
      // times; a disk scan of ~3 GB per pass is noise against the
      // wedge phase it unblocks.
      val oriented =
        if (m >= 16000000L) {
          val chk = oriented0.localCheckpoint(true, StorageLevel.DISK_ONLY)
          oriented0.unpersist(false)
          System.gc()
          chk
        } else oriented0
      // Bloom prefilter on the closing-edge key: every wedge must
      // cross the (v1, v2) exchange to meet the closing join, but
      // only wedges whose far endpoints form an actual edge can close
      // a triangle — on most graphs that is a tiny fraction of the
      // Σ outdeg² wedge mass (the query's largest intermediate; at
      // the ×100 fixture its raw shuffle filled a 45 GB disk). One
      // extra pass over the m-row edge list builds the filter;
      // map-side filtering cuts the shuffled wedges to
      // triangles + fpp·wedges, with NO false negatives (the join
      // stays exact, the bloom only prunes). Gated on graph size:
      // below ~16M edges the whole wedge shuffle is a few GB and the
      // extra edge pass + broadcast costs more than it saves
      // (measured +2 s at the 12M-edge ×10 fixture, −tens of GB of
      // spill at the 120M-edge ×100 one). Built ONCE, shared by
      // every wedge batch.
      val bigGraph = m >= 16000000L
      val fpp = 0.03
      val bloom =
        if (!bigGraph) None
        else IncrementalDedup.buildFilter(
            oriented.select(xxhash64(col("u"), col("v")).as("_k")), "_k",
            expectedItems = m, fpp = fpp)
          .map(bytes => edges.sparkSession.sparkContext.broadcast(bytes))
      // Auto wedge batching: estimate the post-prune wedge shuffle
      // from the measured out-degree profile (one agg over the
      // persisted edge list — big-graph path only) and slice the
      // wedge apex space so each batch's shuffle fits the scratch
      // budget. ~24 bytes per shuffled wedge row; the Bloom prune
      // keeps (fpp + triangles/wedges) of the raw mass, and the
      // triangle fraction is NOT knowable before running the query —
      // on dense co-occurrence graphs it is large (measured ~0.5 at
      // the ×100 lineitem graph: 4.1B wedges, and the B=1 run's
      // wedge shuffle still hit ~69 GB of scratch because the
      // closing-triangle rows survive any prune) — so the estimate
      // budgets for the worst case with a 0.5 closing allowance.
      // Over-batching is cheap (each extra batch re-shuffles only
      // the m-row closing side and re-scans the checkpointed edge
      // list); under-batching fills the disk.
      val batches =
        if (wedgeBatches >= 1) wedgeBatches
        else if (!bigGraph) 1
        else {
          val w = oriented.groupBy("u").agg(count(lit(1)).as("c"))
            .agg(sum(col("c") * (col("c") - 1) / 2)).head().getDouble(0)
          val projBytes = w * 24.0 * (2.0 * fpp + 0.5)
          math.min(64, math.max(1,
            math.ceil(projBytes / scratchBudgetBytes).toInt))
        }
      // Closing side: ONE pre-partitioned materialization shared by
      // every batch. The closing key (v1, v2) is independent of the
      // wedge apex, so each batch joins the SAME m-row side — the
      // round-11 spelling re-ran its shuffle per batch (~B·m rows).
      // A DISK_ONLY persist ABOVE the (v1, v2) repartition runs that
      // exchange once and the InMemoryRelation PRESERVES the hash
      // partitioning, so each batch's closing join builds straight
      // from the cached partitions with no new exchange (PlanSpec
      // pins the single-exchange mechanism — and pins that an eager
      // localCheckpoint would NOT work: LogicalRDD drops the
      // partitioning on this build). Disk cost ≈ the edge list once,
      // replacing B shuffle-writes of the same rows; unpersisted in
      // the outer finally. Single-batch runs keep the inline
      // repartition — one consumer, nothing to share.
      val closingShared =
        if (batches <= 1) None
        else Some(oriented
          .select(col("u").as("v1"), col("v").as("v2"))
          .repartition(parts, col("v1"), col("v2"))
          .persist(StorageLevel.DISK_ONLY))
      closingShared.foreach(_.count()) // materialize before batch 1
      def batchCounts(slice: Option[Int]): DataFrame = {
        val base = slice match {
          case Some(i) => oriented.filter(
            pmod(xxhash64(col("u")), lit(batches.toLong)) === i.toLong)
          case None => oriented
        }
        // SHUFFLE_HASH on the build sides (see the header comment):
        // the wedge stream must not be sorted twice; builds are
        // partition-sized via `parts`.
        val x = base.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
          .repartition(parts, col("u"))
        val y = base.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
          .repartition(parts, col("u"))
        val wedges0 = x.join(y.hint("SHUFFLE_HASH"), Seq("u"))
          .filter(col("dv1") < col("dv2") ||
            (col("dv1") === col("dv2") && col("v1") < col("v2")))
        val wedges = bloom match {
          case Some(bc) => wedges0.filter(
            graft.expressions.BloomMightContain.might_contain(
              xxhash64(col("v1"), col("v2")), bc))
          case None => wedges0
        }
        // closing side is the FULL edge list in every batch — the
        // shared pre-partitioned checkpoint when batching (one
        // exchange total), inline otherwise
        val closing = closingShared.getOrElse(
          oriented.select(col("u").as("v1"), col("v").as("v2"))
            .repartition(parts, col("v1"), col("v2")))
        wedges.join(closing.hint("SHUFFLE_HASH"), Seq("v1", "v2"))
          .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      }
      if (batches <= 1) batchCounts(None).localCheckpoint(true)
      else {
        // Sequential batches: each materializes its node-sized
        // partial eagerly (localCheckpoint truncates lineage), then
        // the batch's wedge shuffle files are released before the
        // next batch runs — System.gc() nudges the ContextCleaner,
        // which frees shuffle data when its dependency objects are
        // collected. Peak scratch ≈ one batch's shuffle, by design.
        val partials = (0 until batches).map { i =>
          val p = batchCounts(Some(i)).localCheckpoint(true)
          System.gc()
          p
        }
        val out = partials.reduce(_.unionByName(_))
          .groupBy("node").agg(sum(col("n_triangles")).as("n_triangles"))
          .localCheckpoint(true)
        closingShared.foreach(_.unpersist(false))
        out
      }
    } finally oriented0.unpersist(false)
  }
}
