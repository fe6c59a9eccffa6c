package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics for web-scale corpora (LLM-pipeline extension
  * beyond SURVEY §2: URL/link-graph quality signals à la Common Crawl
  * curation).
  *
  * PageRank here is the classic synchronous power iteration expressed as
  * DataFrame joins — the Pregel shape without a graph library:
  *
  *   - the adjacency list joined with its out-degree is built ONCE and
  *     persisted; every iteration reuses the same partitioned frame, so
  *     the per-iteration cost is one shuffle-join (contribs on `src`)
  *     plus one aggregation shuffle (sum on `dst`).
  *   - rank state is a (id, rank) frame — 16 bytes a row at 100 TB scale,
  *     never the edge payload.
  *   - iteration count is FIXED (power iteration to a chosen depth), so
  *     the whole computation is a static DAG: no driver-side convergence
  *     loop reading results back, and the plan is identical across
  *     engines, which is what lets a SQL oracle unroll it exactly.
  *   - lineage grows linearly with iterations; `checkpointEvery` truncates
  *     it with a localCheckpoint for deep runs (the same barrier pattern
  *     as [[Dedup]]'s staged pipelines). Default 0 = off, right for the
  *     shallow fixed-depth runs the oracle can mirror.
  *
  * Semantics: dangling-node mass is NOT redistributed (nodes with no
  * out-edges simply contribute nothing), matching the plain unrolled-SQL
  * definition. With damping d and N nodes, r₀ = 1/N and
  * rᵢ₊₁(v) = (1-d)/N + d·Σ_{u→v} rᵢ(u)/outdeg(u).
  */
object Graph {

  /** Fixed-depth PageRank over an edge list.
    *
    * @param edges     (src, dst) pairs; parallel edges count once per copy
    * @param iters     number of synchronous power iterations (≥ 0)
    * @param damping   damping factor d
    * @param checkpointEvery  truncate lineage every k iterations (0 = off)
    * @return (id, rank) for every node appearing as src or dst
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    val spark = edges.sparkSession
    val e = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // adjacency ⋈ out-degree, built once and reused every iteration; the
    // node count is the one driver scalar (a single COUNT job), needed to
    // fold (1-d)/N into a literal so iterations stay pure map/join/agg
    val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contribs = adj.join(ranks, adj("src") === ranks("id"))
        .select(adj("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
      ranks = nodes.join(
          contribs.groupBy("id").agg(sum(col("c")).as("s")), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Exact triangle count over an undirected graph given as an edge list
    * (direction, duplicates, and self-loops are normalized away).
    *
    * The degree-orientation algorithm (the MapReduce-era standard —
    * Suri & Vassilvitskii 2011): orient every canonical edge from its
    * lower-(degree, id) endpoint to its higher one, enumerate wedges by
    * self-joining oriented edges on their source, and close each wedge
    * with a semi-join against the canonical edge set. Orientation bounds
    * the wedge fan-out per node by O(√|E|) regardless of raw degree —
    * the hub that would explode a naive neighbor self-join generates
    * almost no wedges because nearly all its edges point INTO it.
    * Every join is an equi-join (shuffle-partitionable, AQE-splittable);
    * each triangle is counted exactly once (its lowest-ranked vertex
    * owns the wedge).
    *
    * Returns one row: (n_nodes, n_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    val canon = e0.filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = canon.select(col("a").as("id")).unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): rank(u) < rank(v) ⇒ u→v
    val oriented = canon
      .join(deg.select(col("id").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("_db")), Seq("b"))
      .select(
        when(struct(col("_da"), col("a")) < struct(col("_db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("_da"), col("a")) < struct(col("_db"), col("b")),
          col("b")).otherwise(col("a")).as("v"))
    val wedges = oriented.select(col("u"), col("v").as("w1"))
      .join(oriented.select(col("u"), col("v").as("w2")), Seq("u"))
      .filter(col("w1") < col("w2"))
    // wedges carries canon in its lineage, so the closing semi-join is a
    // self-join: canon's columns must be renamed or col("a")/col("b")
    // resolve into the LEFT side and the filter passes every wedge
    val closing = canon.select(col("a").as("_tc_a"), col("b").as("_tc_b"))
    val tri = wedges.join(closing,
        col("_tc_a") === col("w1") && col("_tc_b") === col("w2"), "left_semi")
    val nNodes = deg.agg(count(lit(1)).as("n")).select(col("n"))
    val nEdges = canon.agg(count(lit(1)).as("n")).select(col("n"))
    tri.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(nNodes.select(col("n").as("n_nodes"))))
      .crossJoin(broadcast(nEdges.select(col("n").as("n_edges"))))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
