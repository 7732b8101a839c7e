package graft.lobbying

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.DocStore

/** The lobbying DAG as one call: per-chamber disclosure and
  * contribution filings → parent envelopes into their four indices +
  * `_nested` child docs, with the reference's insert-only `es.exists`
  * guard (`senate .../main.py:81`, `house .../main.py:324`) — a parent
  * already indexed is never rewritten, and both sides dedupe against
  * their own index, so replaying the same filings is a no-op
  * (idempotent by construction, and crash-safe at any point between
  * the two swaps: a re-run re-attempts both sides unconditionally).
  *
  * Children carry no natural id in the reference (ES auto-ids); here
  * they key on md5 of their full JSON rendering, which makes the child
  * insert idempotent too — a deliberate strengthening, same family as
  * the GraphStore's deterministic uuids.
  */
object LobbyingPipeline {

  final case class Summary(
      senateDisclosures: Long, houseDisclosures: Long,
      senateContributions: Long, houseContributions: Long,
      childDocs: Long)

  /** Public form of the child keying, for specs that need to stage a
    * partially-committed store state. */
  def keyedChildren(df: DataFrame): DataFrame = childKey(df)

  private def childKey(df: DataFrame): DataFrame = {
    // identity rendering: every column EXCEPT the volatile ingest
    // timestamp (context.last_indexed). A replay of the same filings
    // at a LATER runTs must produce the same key set — hashing the
    // timestamp would turn every periodic re-fetch into a full
    // duplicate insert of the overlap's children.
    val identityCols: Seq[Column] = df.columns.toSeq.map {
      case "context" =>
        val ctx = df.schema("context").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        // getField, not a dot-path string: a future field name with a
        // dot in it must address the field literally, not as a path
        struct(ctx.fieldNames.toSeq.filterNot(_ == "last_indexed")
          .map(f => col("context").getField(f).as(f)): _*).as("context")
      case c => col(c)
    }
    val js = to_json(struct(identityCols: _*))
    // a filing can legitimately list the SAME item twice (the
    // reference's ES auto-ids store both) — rank equal renderings and
    // fold the ordinal into the key so duplicates survive. Ordinal
    // assignment among identical rows is arbitrary, but the resulting
    // key SET {md5(json#1..k)} is deterministic, so replays converge.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(js).orderBy(lit(1))
    df.withColumn("doc_id",
      md5(concat(js, lit("#"), row_number().over(w).cast("string"))))
  }

  /** Insert unseen children, then unseen parents. Children commit
    * FIRST, gated on the parent key being ABSENT from the parent
    * STORE (a bucket-pruned membership probe — the reference's
    * es.exists guard skips a whole already-indexed filing, so a
    * re-fetch whose child content drifted must not land a second
    * generation of children under the stale parent). Gating against
    * the store rather than this run's parent delta keeps the crash
    * window healed: a crash between the two swaps leaves the parent
    * absent, so a replay re-derives these children (their idempotent
    * keys dedupe) and then lands the parent.
    * Returns (new parents, new children) counts. */
  private def insertFamily(docs: DocStore, index: String,
      parents: DataFrame, children: DataFrame): (Long, Long) = {
    val storedParents = docs
      .storedKeys(index, "doc_id", parents.select(col("doc_id")))
      .select(col("doc_id").as("__parent"))
    val newFamilies = children.join(storedParents,
      col("context.parent_id") === col("__parent"), "left_anti")
    val insertedKids =
      docs.insertNew(s"${index}_nested", "doc_id", childKey(newFamilies))
    val inserted = docs.insertNew(index, "doc_id", parents)
    (inserted.count(), insertedKids.count())
  }

  def run(spark: SparkSession,
      senateDisclosureFilings: DataFrame,
      houseDisclosureFilings: DataFrame,
      senateContributionFilings: DataFrame,
      houseContributionFilings: DataFrame,
      docs: DocStore,
      runTs: Column = lit(null).cast("timestamp")): Summary = {
    val sd = insertFamily(docs, "federal_senate_lobbying_disclosures",
      LobbyingChambers.senateParentDocs(senateDisclosureFilings, runTs),
      LobbyingChambers.senateChildDocs(senateDisclosureFilings, runTs))
    val hd = insertFamily(docs, "federal_house_lobbying_disclosures",
      LobbyingChambers.houseParentDocs(houseDisclosureFilings, runTs),
      LobbyingChambers.houseChildDocs(houseDisclosureFilings, runTs))
    val sc = insertFamily(docs, "federal_senate_lobbying_contributions",
      LobbyingContributions.senateParentDocs(senateContributionFilings, runTs),
      LobbyingContributions.senateChildDocs(senateContributionFilings, runTs))
    val hc = insertFamily(docs, "federal_house_lobbying_contributions",
      LobbyingContributions.houseParentDocs(houseContributionFilings, runTs),
      LobbyingContributions.houseChildDocs(houseContributionFilings, runTs))
    Summary(sd._1, hd._1, sc._1, hc._1,
      sd._2 + hd._2 + sc._2 + hc._2)
  }
}
