package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Item-item collaborative filtering — the classic recommender workload
  * over implicit feedback: similarity(i, j) = binary cosine
  * |U_i ∩ U_j| / sqrt(|U_i|·|U_j|) on the customer–part incidence, top-k
  * neighbors per item. The co-occurrence counting is the q30/SON shape
  * (equi-join on the shared customer key + group-count — never an O(n²)
  * cross join), the support floor bounds the pair relation exactly like
  * the co-purchase graph's HAVING, and the per-item top-k is the plain
  * row_number window that [[graft.plans.TopKRewrite]] plans onto the
  * native TopKPerGroup operator. Similarities are rounded to 6 dp BEFORE
  * ranking, with the neighbor id as tie-break, so both engines rank
  * identically. At 100 TB: skewed "everyone bought it" items are the
  * documented salting/AQE case of the co-occurrence join; the floor and
  * top-k bound everything downstream.
  */
object Recommend {

  /** q9d: top-5 most-similar parts per part (binary cosine, co-purchase
    * support ≥ `minShared`). */
  def itemItemTopK(spark: SparkSession, dir: String, k: Int = 5,
      minShared: Int = 2): DataFrame = {
    val cp = GraphOps.incidence(spark, dir)
    val nUsers = cp.groupBy("p").agg(count(lit(1)).as("n"))
    val pairs = cp.as("a").join(cp.as("b"),
        col("a.c") === col("b.c") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("i"), col("b.p").as("j"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    val sims = pairs
      .join(nUsers.select(col("p").as("i"), col("n").as("ni")), "i")
      .join(nUsers.select(col("p").as("j"), col("n").as("nj")), "j")
      .select(col("i"), col("j"),
        round(col("shared") / sqrt(col("ni") * col("nj")), 6).as("sim"))
    // both directions in ONE pass over the pair relation — a self-union
    // would re-execute the expensive co-occurrence join per branch (the
    // q31 double-join lesson); field names must match across the two
    // structs or the array() won't type-check (the q89 lesson)
    val directed = sims.select(explode(array(
        struct(col("i").as("i"), col("j").as("j"), col("sim").as("sim")),
        struct(col("j").as("i"), col("i").as("j"), col("sim").as("sim"))))
        .as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.sim").as("sim"))
    val w = Window.partitionBy("i").orderBy(col("sim").desc, col("j"))
    directed.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("i").as("part"), col("rn").cast("int").as("rn"),
        col("j").as("rec"), col("sim"))
      .orderBy("part", "rn")
  }
}
