package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  * - [[bruteForceTopK]] — exact cosine top-k, the correctness
  *   baseline. Query-set × corpus join; fine when the query set is
  *   small or the corpus is broadcastable.
  * - [[lshTopK]] — random-hyperplane LSH bucketing: vectors only meet
  *   inside a bucket (equi-join on the bucket signature), which is the
  *   scale path: corpus shuffles once on bucket id instead of
  *   cross-joining.
  *
  * All math is double (floats widened first): `zip_with` + `aggregate`
  * are codegen'd higher-order functions, no UDF.
  */
object Similarity {
  import graft.functions.VectorFunctions.{vec_dot, vec_norm}

  /** Dot product in double, index order — the codegen'd
    * [[graft.functions.VectorDot]] (floats widened per element,
    * bit-identical to a double fold).
    */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  /** L2 norm. */
  def norm(v: Column): Column = vec_norm(v)

  /** Attach the vector's norm (computed once per row — pairwise
    * consumers then only pay one dot product per pair).
    */
  def withNorm(df: DataFrame, vecCol: String = "vec"): DataFrame =
    df.withColumn("norm", norm(col(vecCol)))

  def cosineFromNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ranked by (cosine desc, id asc).
    * The query side is broadcast — the corpus is scanned exactly once,
    * no shuffle of the corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withNorm(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
    val q = withNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")), "qvec")
      .withColumnRenamed("norm", "qnorm")
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos",
        cosineFromNorms(col("qvec"), col("vec"), col("qnorm"), col("norm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component r[plane][dim]:
    * a hash of (plane, dim) mapped into [-0.5, 0.5). Reproducible
    * anywhere (including SQL) without shipping plane data.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(lit(plane.toLong) * lit(1315423911L) + dim * lit(2654435761L),
      lit(1000003L)).cast("double") / lit(1000003.0)) - lit(0.5)

  /** Random-hyperplane LSH signature: bit p = sign(dot(v, r_p)).
    * `nPlanes` bits → one long bucket id.
    */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: bucket the corpus by LSH signature, probe each
    * query's own bucket (plus buckets at Hamming distance 1 when
    * `multiProbe`), rank within candidates. Recall < 1 by design; the
    * win is that the corpus-side join is an equi-join on bucket id.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, multiProbe: Boolean = true,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withNorm(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .withColumn("bucket", lshBucket(col("vec"), nPlanes))
    val qBase = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")), "qvec")
      .withColumnRenamed("norm", "qnorm")
      .withColumn("qbucket", lshBucket(col("qvec"), nPlanes))
    // multi-probe: query's bucket + all buckets one bit-flip away
    val probes =
      if (!multiProbe) qBase.withColumn("bucket", col("qbucket"))
      else {
        val flips = lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))
        qBase.withColumn("flip", explode(array(flips: _*)))
          .withColumn("bucket", col("qbucket").bitwiseXOR(col("flip")))
          .drop("flip")
      }
    val scored = c.join(probes, Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos",
        cosineFromNorms(col("qvec"), col("vec"), col("qnorm"), col("norm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }
}
