package graft.fec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FEC REST-API sources (SURVEY S7/S8) — the engine side: response
  * fixtures (JSONL of API pages) read with explicit schemas, the
  * augmentation docs built from them, and the keyset-pagination cursor
  * as a derivable state row.
  *
  * Behavioral specs: `federal_fec_ingest_get_financials/main.py:60-88`
  * (index-by-image-number envelope) and
  * `federal_fec_ingest_get_receipts/main.py:34-95,177-195` (schedule-A
  * receipts: processed contributor name for individuals, doc_as_upsert
  * augmentation keyed by sub_id, keyset cursor on
  * (last_index, last_contribution_receipt_amount)).
  */
object FecApiSources {

  val receiptSchema: StructType = StructType(Seq(
    StructField("sub_id", StringType),
    StructField("is_individual", BooleanType),
    StructField("contributor_first_name", StringType),
    StructField("contributor_middle_name", StringType),
    StructField("contributor_last_name", StringType),
    StructField("contribution_receipt_date", StringType),
    StructField("contribution_receipt_amount", DoubleType),
    StructField("contributor_name", StringType),
    StructField("committee_id", StringType),
    StructField("two_year_transaction_period", LongType)))

  val financialSchema: StructType = StructType(Seq(
    StructField("beginning_image_number", StringType),
    StructField("committee_id", StringType),
    StructField("report_type", StringType),
    StructField("coverage_start_date", StringType),
    StructField("coverage_end_date", StringType),
    StructField("total_receipts", DoubleType),
    StructField("total_disbursements", DoubleType)))

  def readReceipts(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(receiptSchema).json(path)

  def readFinancials(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(financialSchema).json(path)

  /** The reference builds the individual contributor name by
    * concatenating non-null first/middle/last with single spaces then
    * stripping (`get_receipts/main.py:56-65`) — null-skipping
    * concat_ws reproduces it exactly. */
  def processedContributorName: Column =
    when(col("is_individual") === true,
      trim(concat_ws(" ", col("contributor_first_name"),
        col("contributor_middle_name"), col("contributor_last_name"))))

  /** S8: receipt augmentation docs (doc_as_upsert keyed by sub_id). */
  def receiptDocs(receipts: DataFrame, runTs: Column): DataFrame =
    receipts.select(
      col("sub_id").as("doc_id"),
      struct(receipts.columns.map(col): _*).as("obj"),
      struct(
        col("contribution_receipt_date").as("date"),
        when(processedContributorName.isNotNull,
          struct(struct(processedContributorName.as("name"))
            .as("individual"))).as("contributor")).as("processed"),
      struct(runTs.as("last_augmented"), runTs.as("last_indexed"))
        .as("context"))

  /** S7: financial report docs (index mode, keyed by image number). */
  def financialDocs(financials: DataFrame, runTs: Column): DataFrame =
    financials.select(
      col("beginning_image_number").as("doc_id"),
      struct(financials.columns.map(col): _*).as("obj"),
      struct(runTs.as("last_indexed")).as("context"))

  /** The keyset cursor after a batch: FEC schedule-A pages are keyed by
    * (last_index, last_contribution_receipt_amount) sorted by amount
    * descending (`main.py:35,177-195`). In batch form the next cursor
    * is just the min-amount row's key pair. */
  def keysetCursor(receipts: DataFrame): DataFrame =
    receipts
      .orderBy(col("contribution_receipt_amount").asc, col("sub_id").asc)
      .limit(1)
      .select(col("sub_id").as("last_index"),
        col("contribution_receipt_amount")
          .as("last_contribution_receipt_amount"))
}
