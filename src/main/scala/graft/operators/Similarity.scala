package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, plus LSH-bucketed and IVF-style
  * variants as the scale paths. All vector math is SQL HOFs
  * (`zip_with`/`aggregate`) — codegen, no UDF, columnar parquet reads prune
  * to (id, embedding).
  *
  * Scale notes:
  *   - brute force is a single scan + TakeOrderedAndProject (no full sort,
  *     no shuffle of vectors) — right for one-off queries / small corpora;
  *   - random-hyperplane LSH: sign-bit signature vs `nPlanes` deterministic
  *     pseudo-random hyperplanes → bucket join: only same-bucket vectors are
  *     compared. Recall/cost tuned by (nPlanes, nTables);
  *   - IVF: k coarse centroids (deterministically seeded k-means-ish via
  *     hash-sampled seeds); assign each vector to nearest centroid at write
  *     time, probe `nProbe` nearest lists at query time.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, z) => acc + z)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, z) => acc + z))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Per-row cosine scores against one query vector (driver-side literal —
    * the query is small; it folds into codegen as constants). No sort: a
    * single scan projection.
    */
  def cosineScores(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float]): DataFrame = {
    val q = typedlit(query.map(_.toDouble))
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === query.size)
      .select(col(idCol).as("id"),
        cosine(transform(col(vecCol), x => x.cast("double")), q).as("cosine"))
  }

  /** Exact top-k by cosine: scan + TakeOrderedAndProject (no full sort). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame =
    cosineScores(df, idCol, vecCol, query)
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component: a reproducible
    * ±1-ish value for (table, plane, dim) — derived from xxhash64, so the
    * "random" planes are identical on every executor and every run.
    */
  private def planeComponent(table: Int, plane: Column, dim: Column): Column =
    (pmod(xxhash64(lit(table), plane, dim), lit(2001L)).cast("double") - 1000.0) / 1000.0

  /** Sign-bit LSH signature of a vector for one hash table: a `nPlanes`-bit
    * bucket id (long).
    */
  def lshBucket(vec: Column, dims: Int, nPlanes: Int, table: Int): Column = {
    val planeBits = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)), (x, d) =>
          x.cast("double") * planeComponent(table, p, d)),
        lit(0.0d), (acc, z) => acc + z)
      when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
    })
    aggregate(planeBits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** LSH-bucketed approximate top-k: only vectors sharing a bucket with the
    * query (in any of `nTables` tables) are scored. Returns the same schema
    * as bruteForceTopK.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
      k: Int, nPlanes: Int = 12, nTables: Int = 4): DataFrame = {
    val dims = query.size
    // query buckets computed with the exact same expression family via a
    // 1-row job (keeps driver and executor hashing bit-identical)
    val spark = df.sparkSession
    val qvec = typedlit(query.map(_.toDouble))
    val qBuckets: Seq[(Int, Long)] = (0 until nTables).map { t =>
      val r = spark.range(1)
        .select(lshBucket(qvec, dims, nPlanes, t).as("b")).collect()(0)
      (t, r.getLong(0))
    }
    val candidates = (0 until nTables).map { t =>
      val bucket = qBuckets.find(_._1 == t).get._2
      df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
        .filter(lshBucket(transform(col(vecCol), x => x.cast("double")),
          dims, nPlanes, t) === lit(bucket))
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
    }.reduce(_ unionAll _).dropDuplicates("id")
    candidates
      .select(col("id"),
        cosine(transform(col("vec"), x => x.cast("double")), qvec).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs within the corpus: LSH-bucket
    * all vectors once, self-join per (table, bucket), verify with exact
    * cosine ≥ threshold. The candidate mass is Σ bucket² instead of n².
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      threshold: Double = 0.95, nPlanes: Int = 12, nTables: Int = 2,
      maxBucket: Int = 2000): DataFrame = {
    val base = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
    val banded = (0 until nTables).map { t =>
      base.select(lit(t).as("tbl"),
        lshBucket(col("vec"), dims, nPlanes, t).as("bucket"), col("id"), col("vec"))
    }.reduce(_ unionAll _)
    val capped = banded.withColumn("bucket_size",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("tbl"), col("bucket"))))
      .filter(col("bucket_size") <= maxBucket).drop("bucket_size")
    val l = capped.select(col("tbl"), col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val r = capped.select(col("tbl"), col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** IVF probe: rank centroids by similarity to the query on the driver,
    * scan only rows assigned to the `nProbe` nearest lists, exact top-k
    * within them. At scale the assignment is a write-time partition column,
    * so the probe prunes partitions instead of filtering.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], query: Seq[Float], k: Int,
      nProbe: Int = 2): DataFrame = {
    val qd = query.map(_.toDouble)
    def dotS(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cosS(a: Seq[Double], b: Seq[Double]): Double = {
      val n = math.sqrt(dotS(a, a)) * math.sqrt(dotS(b, b))
      if (n == 0) 0 else dotS(a, b) / n
    }
    val probeLists = centroids.zipWithIndex
      .sortBy { case (c, _) => -cosS(c, qd) }.take(nProbe).map(_._2)
    val assigned = ivfAssign(df, idCol, vecCol, centroids)
    assigned
      .filter(col("centroid").isin(probeLists: _*))
      .select(col("id"),
        cosine(transform(col("vec"), x => x.cast("double")), typedlit(qd)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVF-style partition assignment: nearest of `centroids` per vector —
    * the write-time clustering step of an IVF index. Centroids broadcast as
    * literals (small).
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(transform(col(vecCol), x => x.cast("double")),
        typedlit(c)).as("sim"), lit(i).as("cid"))
    }
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        greatest(scored: _*).getField("cid").as("centroid"))
  }
}
