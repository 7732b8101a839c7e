package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** Keyed document store over Parquet with the reference's two ES write
  * modes (SURVEY K1/K2):
  *
  *  - `index`: overwrite-by-id (`_op_type: index`, e.g.
  *    `load_elastic_candidates/main.py:50-82`);
  *  - `upsert`: merge-by-key partial update (`update` + `doc_as_upsert`
  *    + retry_on_conflict, e.g. `load_elastic_contributions/
  *    main.py:190-196`): incoming non-null top-level fields replace,
  *    missing fields keep the stored value, and STRUCT fields merge
  *    field-wise one level deep — so a writer that only sets
  *    `context.last_graphed` does not clobber `context.last_indexed`
  *    (exactly how the partial-doc ES update behaves).
  *
  * Scale: one shuffle on the key per upsert batch (full-outer merge);
  * the conflict-retry machinery of the reference dissolves — a batch
  * merge has no concurrent writers.
  */
final class DocStore(spark: SparkSession, baseDir: String) {

  private def dir(index: String) = s"$baseDir/$index"

  def read(index: String): Option[DataFrame] = {
    val d = dir(index)
    if (Files.exists(Paths.get(d))) Some(spark.read.parquet(d)) else None
  }

  private def swapIn(index: String, df: DataFrame): Unit = {
    val d = dir(index)
    val staging = d + ".staging"
    df.write.mode("overwrite").parquet(staging)
    val trash = Paths.get(d + ".trash")
    if (Files.exists(trash)) rm(trash)
    if (Files.exists(Paths.get(d))) Files.move(Paths.get(d), trash)
    Files.move(Paths.get(staging), Paths.get(d))
    if (Files.exists(trash)) rm(trash)
  }

  private def rm(p: java.nio.file.Path): Unit =
    Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => Files.delete(f))

  private def dedupLastWins(batch: DataFrame, key: String): DataFrame = {
    // max_by hash-agg (no per-key sort): keep the LAST row per key,
    // matching sequential bulk-API application order
    val props = batch.columns.filterNot(_ == key).toSeq
    if (props.isEmpty) batch.dropDuplicates(key)
    else batch.withColumn("__ord", monotonically_increasing_id())
      .groupBy(col(key))
      .agg(max_by(struct(props.map(col): _*), col("__ord")).as("__s"))
      .select(col(key) +: props.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** K1: overwrite-by-id. */
  def index(indexName: String, key: String, batch: DataFrame): Unit = {
    val deduped = dedupLastWins(batch, key)
    val merged = read(indexName) match {
      case None => deduped
      case Some(old) =>
        old.join(deduped.select(col(key)), Seq(key), "left_anti")
          .unionByName(deduped, allowMissingColumns = true)
    }
    swapIn(indexName, merged)
  }

  /** The reference's `es.exists` guard as a set operation: index ONLY
    * batch rows whose key is not already stored (parents immutable
    * once indexed — the lobbying ingest pattern). Returns the
    * actually-inserted rows, pinned with a localCheckpoint because the
    * caller consumes them AFTER the swap has replaced the files the
    * anti-join read. */
  def insertNew(indexName: String, key: String, batch: DataFrame): DataFrame = {
    val deduped = dedupLastWins(batch, key)
    val fresh = (read(indexName) match {
      case None => deduped
      case Some(old) =>
        deduped.join(old.select(col(key)), Seq(key), "left_anti")
    }).localCheckpoint(true)
    read(indexName) match {
      case None => swapIn(indexName, fresh)
      case Some(old) => swapIn(indexName,
        old.unionByName(fresh, allowMissingColumns = true))
    }
    fresh
  }

  /** K2: doc_as_upsert partial merge; see class doc. */
  def upsert(indexName: String, key: String, batch: DataFrame): Unit = {
    val deduped = dedupLastWins(batch, key)
    val merged = read(indexName) match {
      case None => deduped
      case Some(old) =>
        val newCols = deduped.columns.filterNot(_ == key).toSeq
        val oldCols = old.columns.filterNot(_ == key).toSeq
        val oldR = old.select(col(key) +: oldCols.map(c => col(c).as(s"__old_$c")): _*)
        val newR = deduped.select(col(key) +:
          (newCols.map(c => col(c).as(s"__new_$c")) :+ lit(1).as("__present")): _*)
        val joined = newR.join(oldR, Seq(key), "full_outer")
        val allCols = (newCols ++ oldCols.filterNot(newCols.contains)).distinct
        val out = allCols.map { c =>
          val hasNew = newCols.contains(c)
          val hasOld = oldCols.contains(c)
          if (hasNew && hasOld)
            mergeField(joined, c).as(c)
          else if (hasNew) col(s"__new_$c").as(c)
          else col(s"__old_$c").as(c)
        }
        joined.select(col(key) +: out: _*)
    }
    swapIn(indexName, merged)
  }

  /** Field merge: struct → field-wise coalesce(new, old) one level
    * deep; scalar → new when the batch row carries a non-null value. */
  private def mergeField(joined: DataFrame, c: String): Column = {
    val n = col(s"__new_$c"); val o = col(s"__old_$c")
    joined.schema(s"__new_$c").dataType match {
      case st: StructType =>
        val oldSt = joined.schema(s"__old_$c").dataType.asInstanceOf[StructType]
        val fields = (st.fieldNames ++
          oldSt.fieldNames.filterNot(st.fieldNames.contains)).distinct
        def fieldType(f: String) =
          st.fields.find(_.name == f).map(_.dataType)
            .getOrElse(oldSt(f).dataType)
        // every branch must carry the SAME widened struct type: a
        // partial doc (fewer fields) pads its missing fields with
        // typed nulls (the ES partial update never narrows the doc)
        def widen(src: Column, s: StructType) = struct(fields.map { f =>
          (if (s.fieldNames.contains(f)) src.getField(f)
           else lit(null).cast(fieldType(f))).as(f)
        }: _*)
        val mergedStruct = struct(fields.map { f =>
          val nf = if (st.fieldNames.contains(f)) n.getField(f)
            else lit(null).cast(fieldType(f))
          val of = if (oldSt.fieldNames.contains(f)) o.getField(f)
            else lit(null).cast(fieldType(f))
          coalesce(nf, of).as(f)
        }: _*)
        when(n.isNotNull && o.isNotNull, mergedStruct)
          .when(n.isNotNull, widen(n, st)).otherwise(widen(o, oldSt))
      case _ => when(col("__present").isNotNull, coalesce(n, o)).otherwise(o)
    }
  }
}
