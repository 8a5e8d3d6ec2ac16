package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J5: hot-key salted equi-join (SURVEY.md §2.6/§4.2, BASELINE.json "salted
  * on hot hosts to defeat skew").
  *
  * Standard recipe: detect hot keys by frequency (A5), split the probe side
  * into hot/cold, salt hot probe rows with `pmod(xxhash64(id), s)`, explode
  * the (small) build side × s for hot keys, join each stream, re-union. The
  * salt lives only inside the shuffle — output rows are identical to the
  * unsalted join, so downstream per-key semantics (politeness, ordering) are
  * unchanged. AQE's skew-join split stays enabled as the runtime backstop.
  */
object SkewJoin {

  /** A5: keys whose frequency exceeds `factor` × mean frequency. */
  def hotKeys(df: DataFrame, key: String, factor: Double = 4.0): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    // avg over zero rows is null — an empty input simply has no hot keys
    // (getDouble on the null would NPE)
    val meanRow = counts.agg(avg(col("n"))).head()
    if (meanRow.isNullAt(0)) counts.select(col(key)).limit(0)
    else counts.where(col("n") > meanRow.getDouble(0) * factor).select(col(key))
  }

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salting the hot
    * keys with `salt` buckets. `rowId` must be a column of `big` that spreads
    * rows within a key (any high-cardinality column works — it only feeds the
    * salt hash).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      rowId: String,
      salt: Int = 8,
      hotFactor: Double = 4.0,
      maxHotKeys: Int = 10000): DataFrame = {
    // materialize the hot-key set ONCE: hot keys are few by construction
    // (freq > factor × mean bounds them under n/(factor·mean)), and leaving
    // `hot` lazy recomputed the full groupBy-count over the skewed side
    // inside EACH of the two broadcast builds below (3 full aggregations per
    // call). The cap bounds the driver copy on adversarial distributions —
    // keys past it just stay on the cold (unsalted) path, where AQE's
    // runtime skew split remains the backstop; output rows are identical
    // either way.
    val spark = big.sparkSession
    val hkDf = hotKeys(big, key, hotFactor).limit(maxHotKeys)
    val hot = spark.createDataFrame(
        spark.sparkContext.parallelize(hkDf.collect().toSeq, 1), hkDf.schema)
      .withColumn("__is_hot", lit(true))

    val bigTagged = big.join(broadcast(hot), Seq(key), "left")
    val bigHot = bigTagged.where(col("__is_hot")).drop("__is_hot")
      .withColumn("__salt", pmod(xxhash64(col(rowId)), lit(salt.toLong)).cast("int"))
    val bigCold = bigTagged.where(col("__is_hot").isNull).drop("__is_hot")

    val smallTagged = small.join(broadcast(hot), Seq(key), "left")
    val smallHot = smallTagged.where(col("__is_hot")).drop("__is_hot")
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    val smallCold = smallTagged.where(col("__is_hot").isNull).drop("__is_hot")

    val joinedHot = bigHot.join(smallHot,
      bigHot(key) === smallHot(key) && bigHot("__salt") === smallHot("__salt"))
      .drop(smallHot(key)).drop(bigHot("__salt")).drop(smallHot("__salt"))
    val joinedCold = bigCold.join(smallCold, Seq(key))
    joinedHot.unionByName(joinedCold)
  }
}
