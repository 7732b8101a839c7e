package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB posture; SURVEY §4).
  *
  * AQE's skew-join handles sort-merge skew at runtime; these helpers
  * cover the cases AQE cannot: a hot key in a shuffle HASH join or a
  * skewed aggregation where one key owns a large share of all rows.
  *
  * Salting: the skewed (large) side gets a random-but-deterministic
  * salt in [0, n); the small side is replicated n× with every salt
  * value; the join key becomes (key, salt). One hot key then spreads
  * over n tasks. Deterministic salt (hash of a unique row id) keeps
  * runs reproducible.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, salting the big side `n` ways.
    * `rowId` must be unique per big-side row (drives the deterministic
    * salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowId: String, n: Int, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(rowId)), lit(n)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Correct for decomposable aggregates
    * (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      rowId: String, n: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(rowId)), lit(n)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("total"),
        sum(col("__pcnt")).as("n_rows"))
}
