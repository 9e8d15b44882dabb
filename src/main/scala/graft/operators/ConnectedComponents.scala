package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — public literature, PAPERS.md).
  *
  * Why this algorithm at 100 TB: naive label propagation converges in
  * O(graph diameter) rounds — a chain of pairwise near-dups (doc A ~ B,
  * B ~ C, …) makes that O(n) shuffles. Star contraction halves tree
  * heights every round → O(log n) rounds regardless of shape, each
  * round two groupBy-min shuffles on (long, long) edges. This is the
  * standard production algorithm for dup-group formation in training-
  * data pipelines (the step that turns near-dup PAIRS into KEEP-ONE
  * groups).
  *
  * Contract: input is an undirected edge list (columns `u`, `v`, any
  * orientation, self-loops/dups tolerated); output maps every node that
  * appears in some edge to the minimum node id of its component
  * (columns `node`, `label`). Nodes with no edges are absent — callers
  * union isolated nodes back with label = their own id.
  */
object ConnectedComponents {

  /** canonical edge form: u < v, no self-loops, distinct */
  private def canonical(e: DataFrame): DataFrame =
    e.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** both orientations of every edge */
  private def sym(e: DataFrame): DataFrame =
    e.select(col("u").as("src"), col("v").as("dst"))
      .union(e.select(col("v").as("src"), col("u").as("dst")))

  /** m(u) = min(N(u) ∪ {u}) — one groupBy-min shuffle */
  private def minNbr(e: DataFrame): DataFrame =
    sym(e).groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))

  /** large-star: every neighbor v > u re-attaches to m(u) */
  private def largeStar(e: DataFrame): DataFrame =
    canonical(
      sym(e).join(minNbr(e), "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("u"), col("m").as("v")))

  /** small-star: every neighbor v <= u, and u itself, attach to m(u) */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = minNbr(e)
    canonical(
      sym(e).join(m, "src")
        .filter(col("dst") <= col("src"))
        .select(col("dst").as("u"), col("m").as("v"))
        .union(m.select(col("src").as("u"), col("m").as("v"))))
  }

  /** order-independent edge-set signature for the convergence test.
    * count + bit_xor of a 64-bit row hash: no overflow under ANSI mode,
    * one cheap job per round instead of the two full except() shuffles
    * an exact set-equality check would cost at scale. (A signature
    * collision between DIFFERENT edge sets needs an xxhash64 xor
    * coincidence — and even then the loop merely stops one round early
    * on a fixpoint-adjacent set; the alternation is monotone, so a
    * genuinely unconverged stop is ~2^-64 unlikely, which we accept.)
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("x")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** @return (node BIGINT, label BIGINT) for every node in `edges` */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var cur = canonical(
      edges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v"))).localCheckpoint()
    var sig = signature(cur)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // localCheckpoint per round: truncates the iterative lineage
      // (without it the plan doubles every round) and is the barrier
      // that keeps large-star's output from recomputing inside
      // small-star's two references (sym + minNbr). Storage for past
      // rounds is reclaimed by the ContextCleaner once the dropped
      // `cur` references are GC'd on the driver (Dataset.unpersist is
      // a no-op for checkpoint blocks) — bounded in practice by GC
      // cadence, not by round count; an explicit per-round free would
      // need the internal checkpointed RDD handle.
      val next = smallStar(largeStar(cur).localCheckpoint()).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      cur = next
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // at the fixpoint every edge is (component-min, member)
    cur.select(col("v").as("node"), col("u").as("label"))
      .union(cur.select(col("u").as("node"), col("u").as("label")))
      .groupBy(col("node"))
      // min() guards the (benign) case of a root also appearing as a
      // member mid-contraction; at a true fixpoint it's the identity
      .agg(min(col("label")).as("label"))
  }
}
