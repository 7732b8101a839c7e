package graft.fec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The 9 FEC classification + enrichment views
  * (`federal/fec/bigquery/contributions.sql:3-129`), as pure DataFrame
  * functions over the contributions22 master table.
  *
  * The disbursement predicate: transaction types starting '2' or '4'
  * are outflows, EXCEPT earmarked 24I/24T which remain receipts
  * (BigQuery SUBSTR is 1-based with 0 treated as 1).
  *
  * The 5 receipt-side views partition the filtered fact table by
  * entity class; views stay separate functions (filters live in the
  * view, consumers compose — Catalyst pushes/merges them anyway).
  */
object ContributionViews {

  private val passCols = Seq("transaction_dt", "transaction_amt",
    "amndt_ind", "rpt_tp", "transaction_pgi", "transaction_tp",
    "image_num", "file_num", "tran_id", "sub_id")

  /** `(SUBSTR(tp,0,1)='2' OR '4') AND tp NOT IN ('24I','24T')`. */
  def isDisbursementTp: Column =
    (substring(col("transaction_tp"), 1, 1) === "2"
      || substring(col("transaction_tp"), 1, 1) === "4") &&
      col("transaction_tp") =!= "24I" && col("transaction_tp") =!= "24T"

  private def sourceTarget(src: Column, tgt: Column): Seq[Column] =
    Seq(src.as("source"), tgt.as("target")) ++ passCols.map(col)

  /** contributions_from_candidates22 (contributions.sql:3-8). */
  def fromCandidates(c: DataFrame): DataFrame =
    c.filter(col("entity_tp") === "CAN" && !col("other_id").like("C%")
        && !isDisbursementTp
        && col("other_id").isNotNull && col("cmte_id").isNotNull)
      .select(sourceTarget(col("other_id"), col("cmte_id")): _*)

  /** contributions_from_ind_donors22 (sql:10-16). */
  def fromIndDonors(c: DataFrame): DataFrame =
    c.filter(col("entity_tp") === "IND" && !isDisbursementTp
        && col("name").isNotNull && col("cmte_id").isNotNull)
      .select(Seq(col("entity_tp"), col("name"), col("state"),
        coalesce(col("zip_code"), lit("")).as("zip_code"),
        col("employer"), col("occupation"), col("cmte_id").as("target"))
        ++ passCols.map(col): _*)

  /** contributions_from_org_donors22 (sql:18-23). */
  def fromOrgDonors(c: DataFrame): DataFrame =
    c.filter(col("entity_tp") === "ORG" && col("other_id").isNull
        && !isDisbursementTp
        && col("name").isNotNull && col("cmte_id").isNotNull)
      .select(Seq(col("entity_tp"), col("name"), col("state"),
        coalesce(col("zip_code"), lit("")).as("zip_code"),
        col("cmte_id").as("target")) ++ passCols.map(col): _*)

  private val committeeEntity =
    col("entity_tp").isin("CCM", "COM", "PAC", "PTY")

  /** contributions_com_receipts22 (sql:25-31). */
  def comReceipts(c: DataFrame): DataFrame =
    c.filter(committeeEntity && !isDisbursementTp
        && col("other_id").isNotNull && col("cmte_id").isNotNull)
      .select(sourceTarget(col("other_id"), col("cmte_id")): _*)

  /** contributions_com_disbursements22 (sql:33-39). */
  def comDisbursements(c: DataFrame): DataFrame =
    c.filter(committeeEntity && isDisbursementTp
        && col("cmte_id").isNotNull && col("other_id").isNotNull)
      .select(sourceTarget(col("cmte_id"), col("other_id")): _*)

  /** contributions_can_disbursements22 (sql:41-47). */
  def canDisbursements(c: DataFrame): DataFrame =
    c.filter(col("entity_tp") === "CAN" && col("other_id").like("C%")
        && isDisbursementTp
        && col("cmte_id").isNotNull && col("other_id").isNotNull)
      .select(sourceTarget(col("cmte_id"), col("other_id")): _*)

  /** contributions_org_receipts22 (sql:49-55). */
  def orgReceipts(c: DataFrame): DataFrame =
    c.filter(col("entity_tp") === "ORG" && col("other_id").like("C%")
        && !isDisbursementTp
        && col("other_id").isNotNull && col("cmte_id").isNotNull)
      .select(sourceTarget(col("other_id"), col("cmte_id")): _*)

  /** contributions_org_disbursements22 (sql:57-63). */
  def orgDisbursements(c: DataFrame): DataFrame =
    c.filter(col("entity_tp") === "ORG" && col("other_id").like("C%")
        && isDisbursementTp
        && col("cmte_id").isNotNull && col("other_id").isNotNull)
      .select(sourceTarget(col("cmte_id"), col("other_id")): _*)

  /** contributions_from_committees22 (sql:65-80): UNION ALL of the 4
    * committee-flow views. */
  def fromCommittees(c: DataFrame): DataFrame =
    comReceipts(c)
      .unionByName(comDisbursements(c))
      .unionByName(canDisbursements(c))
      .unionByName(orgReceipts(c))
      .unionByName(orgDisbursements(c))

  // ---------------------------------------------------------- elastic

  private val candEnrichCols = Seq("cand_name", "cand_pty_affiliation",
    "cand_election_yr", "cand_office_st", "cand_office",
    "cand_office_district", "cand_ici", "cand_pcc", "cand_zip")
  private val cmteEnrichCols = Seq("cmte_nm", "cmte_zip", "cmte_dsgn",
    "cmte_tp", "cmte_pty_affiliation", "cmte_filing_freq", "org_tp",
    "connected_org_nm")

  /** contributions_elastic22 (sql:82-129): the 4-branch tagged-union
    * enrichment — candidate/individual/organization/committee — with
    * schema aligned by null padding and dims joined by broadcast. */
  def elastic(c: DataFrame, cn: DataFrame, cm: DataFrame): DataFrame = {
    val nullS = lit(null).cast("string")
    val nullI = lit(null).cast("long")

    def donorNulls: Seq[Column] = Seq(
      nullS.as("donor_entity_tp"), nullS.as("donor_name"),
      nullS.as("donor_state"), nullS.as("donor_zip_code"),
      nullS.as("donor_employer"), nullS.as("donor_occupation"))
    def srcCandNulls: Seq[Column] =
      candEnrichCols.map(n => (if (n == "cand_election_yr") nullI else nullS)
        .as(s"source_$n"))
    def srcCmteNulls: Seq[Column] =
      cmteEnrichCols.map(n => nullS.as(s"source_$n"))
    def tail: Seq[Column] = passCols.map(col)

    val cnB = broadcast(cn.select(col("cand_id") +:
      candEnrichCols.map(n => col(n).as(s"source_$n")): _*))
    val cmSrcB = broadcast(cm.select(col("cmte_id") +:
      cmteEnrichCols.map(n => col(n).as(s"source_$n")): _*))
    val cmTgtB = broadcast(cm.select(col("cmte_id") +:
      cmteEnrichCols.map(n => col(n).as(s"target_$n")): _*))
    def tgtCmte(df: DataFrame): DataFrame =
      df.join(cmTgtB, df("target") === cmTgtB("cmte_id"), "left")
        .drop(cmTgtB("cmte_id"))
    val tgtCols: Seq[Column] = col("target") +:
      cmteEnrichCols.map(n => col(s"target_$n"))

    // candidate branch
    val candBranch = tgtCmte(
      fromCandidates(c).join(cnB, col("source") === cnB("cand_id"), "left")
        .drop(cnB("cand_id")))
      .select(Seq(lit("candidate").as("classification")) ++ donorNulls ++
        Seq(col("source")) ++ candEnrichCols.map(n => col(s"source_$n")) ++
        srcCmteNulls ++ tgtCols ++ tail: _*)

    // individual branch
    val indBranch = tgtCmte(fromIndDonors(c))
      .select(Seq(lit("individual").as("classification"),
        col("entity_tp").as("donor_entity_tp"), col("name").as("donor_name"),
        col("state").as("donor_state"), col("zip_code").as("donor_zip_code"),
        col("employer").as("donor_employer"),
        col("occupation").as("donor_occupation"), nullS.as("source")) ++
        srcCandNulls ++ srcCmteNulls ++ tgtCols ++ tail: _*)

    // organization branch
    val orgBranch = tgtCmte(fromOrgDonors(c))
      .select(Seq(lit("organization").as("classification"),
        col("entity_tp").as("donor_entity_tp"), col("name").as("donor_name"),
        col("state").as("donor_state"), col("zip_code").as("donor_zip_code"),
        nullS.as("donor_employer"), nullS.as("donor_occupation"),
        nullS.as("source")) ++
        srcCandNulls ++ srcCmteNulls ++ tgtCols ++ tail: _*)

    // committee branch
    val comBranch = tgtCmte(
      fromCommittees(c).join(cmSrcB, col("source") === cmSrcB("cmte_id"), "left")
        .drop(cmSrcB("cmte_id")))
      .select(Seq(lit("committee").as("classification")) ++ donorNulls ++
        Seq(col("source")) ++ srcCandNulls ++
        cmteEnrichCols.map(n => col(s"source_$n")) ++ tgtCols ++ tail: _*)

    candBranch.unionByName(indBranch).unionByName(orgBranch)
      .unionByName(comBranch)
  }
}
