package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns,
  * composed from codegen'd builtins (`zip_with` / `aggregate`) so the whole
  * expression stays inside WholeStageCodegen — no UDF serialization, no
  * Python round-trips. Used by similarity search and embedding dedup.
  *
  * All math is done in double: float embeddings are cast element-wise
  * first, which keeps results deterministic across partitioning.
  */
object VectorFunctions {

  /** Element-wise cast to double — cheap no-op for double arrays. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity in [-1, 1]; 0.0 for zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane signature: bit i = sign(dot(v, plane_i)).
    * Planes are generated deterministically from `seed` via a splitmix-ish
    * hash so executors need no broadcast of plane data — the literal plane
    * arrays are baked into the plan (fine for <=64 planes * dim doubles).
    */
  def hyperplaneSignature(v: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    require(nPlanes <= 63, "signature packed into one long")
    val planes = RandomPlanes.planes(dim, nPlanes, seed)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pCol = array(p.toSeq.map(lit(_)): _*)
      when(dot(v, pCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}

/** Deterministic pseudo-random hyperplanes (public splitmix64 algorithm). */
object RandomPlanes {
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  /** Uniform in [-1, 1) — adequate for LSH sign tests. */
  def planes(dim: Int, n: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(n) { i =>
      Array.tabulate(dim) { j =>
        val h = splitmix64(seed * 1000003L + i.toLong * 131071L + j)
        (h.toDouble / Long.MaxValue.toDouble)
      }
    }
}
