package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => Ckpt}

/** Distributed connected components over an edge list — the transitive
  * step a real dedup pipeline needs between PAIRS and ACTIONS: near-dup
  * pairs (minhash / simhash / embedding output) say "a~b" and "b~c", but
  * the unit of deduplication is the CLUSTER {a,b,c}, from which one
  * survivor is kept.
  *
  * Algorithm: min-label propagation with pointer jumping. Each round
  * (a) every node pulls the smallest label across its edges, then
  * (b) labels are shortcut one hop (label := label's label), so a chain
  * of length L converges in O(log L) rounds, not O(L). Every round
  * shuffles only narrow (id, label) pairs — the MapReduce-CC shape of
  * Kiveris et al., "Connected Components in MapReduce and Beyond"
  * (SoCC'14) — and `localCheckpoint` truncates the plan so lineage does
  * not grow with iterations; each round frees the previous round's
  * checkpoint blocks once its own count materializes, so block-manager
  * storage stays O(1) in the number of rounds. The driver sees one
  * converged-count per round (control flow only; data never leaves the
  * cluster).
  *
  * Durability: by default rounds truncate lineage with `localCheckpoint`
  * (blocks on executors — an executor loss mid-run fails the job, since
  * Spark cannot recompute a truncated lineage). Pass `checkpointDir` to
  * swap in RELIABLE `checkpoint()`: same plan shape, same O(log L)
  * rounds, but every round's state is backed by files on the cluster FS,
  * so lost blocks recompute from storage instead of failing — the
  * long-cluster-run mode (spec'd by dropping all cached blocks mid-result
  * and recounting). The per-round unpersist cleanup is identical: it
  * drops cached blocks only, never the checkpoint files.
  */
object Components {

  /** (id, comp) for every node appearing in `pairs` (columns a, b);
    * comp = the minimum node id reachable from id. Nodes with no edges
    * don't appear — callers left-join and `coalesce(comp, id)` to label
    * singletons as their own component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(d => pairs.sparkSession.sparkContext.setCheckpointDir(d))
    // one knob, two durability modes: reliable checkpoint() when a dir is
    // given, executor-local truncation otherwise
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // a silent cast of string ids would turn every edge into (NULL, NULL)
    // and "converge" to an empty labeling — reject non-integral ids loudly
    // (hash string ids to longs with xxhash64 at the call site)
    Seq("a", "b").foreach { c =>
      import org.apache.spark.sql.types._
      val ok = pairs.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"connectedComponents needs integral node ids; " +
        s"column '$c' is ${pairs.schema(c).dataType}")
    }
    val edges = pairs.select(
      col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
    // localCheckpoint (not persist): the symmetrized edge list is joined
    // once per round, and a leaf plan keeps the Union node out of every
    // downstream plan (Catalyst's union constraint rewrite chokes on the
    // repeatedly re-joined subtree otherwise)
    val sym = ckpt(edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    var lab = ckpt(sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // (a) pull the min label across edges (both directions are in sym),
      // then keep min(own, best neighbor) — join+least instead of a
      // union+groupBy (same result, one less wide shuffle). Checkpointed:
      // it feeds both sides of the pointer-jump self-join below.
      val nbrMin = sym.join(lab.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp").as("ncomp"))
        .groupBy("id").agg(min("ncomp").as("ncomp"))
      val pulled = ckpt(lab.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), col("ncomp")).as("comp")))
      // (b) pointer jump: comp := comp's comp (labels are node ids, so
      // every label has a row; left+coalesce guards the root's self-row).
      // Applied TWICE per round: the extra self-join is one more shuffle
      // inside the same job, but it quarters (not halves) label depth, so
      // the number of ROUNDS — each a driver sync barrier, a checkpoint
      // materialization and a convergence-count job — drops by ~2x on
      // chain-heavy graphs.
      def jump(l: DataFrame): DataFrame = l.as("x")
        .join(l.select(col("id").as("cid"), col("comp").as("ccomp")).as("y"),
          col("x.comp") === col("y.cid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.ccomp"), col("x.comp")).as("comp"))
      // the inner jump is checkpointed too: un-materialized it would sit
      // on BOTH sides of the outer self-join and its join work would run
      // twice per round
      val half = ckpt(jump(pulled))
      val jumped = ckpt(jump(half))
      Ckpt.unpersistLocalCheckpoint(half)
      // jumped is materialized (localCheckpoint is eager) — pulled's
      // blocks are dead from here
      Ckpt.unpersistLocalCheckpoint(pulled)
      changed = jumped.as("n")
        .join(lab.select(col("id"), col("comp").as("old")).as("o"), "id")
        .filter(col("comp") =!= col("old")).count()
      // the convergence count was the old labeling's last consumer
      Ckpt.unpersistLocalCheckpoint(lab)
      lab = jumped
      it += 1
    }
    Ckpt.unpersistLocalCheckpoint(sym)
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    lab
  }

  /** Keep one survivor (min id) per duplicate cluster: rows of `df` whose
    * id is either a component minimum or a singleton (no near-dup edge).
    */
  def clusterSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val losers = comp.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
