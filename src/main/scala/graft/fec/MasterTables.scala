package graft.fec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Dates, Zips}

/** FEC master tables — pure DataFrame→DataFrame restatements of the
  * reference's DELETE+CREATE+INSERT..SELECT jobs
  * (`federal_fec_ingest_create_master_tables/main.py:20-140`).
  *
  * Scale: contributions22 is DISTINCT over the full fact union — one
  * hash-aggregate shuffle on all 19 columns (Catalyst does partial
  * aggregation map-side). The dim joins in expenditures22 broadcast
  * (cm22/cn22 are tiny). At 100 TB, cycle becomes a partition column
  * and DISTINCT runs per cycle partition.
  */
object MasterTables {

  private val contributionCols = Seq(
    "cmte_id", "other_id", "amndt_ind", "rpt_tp", "transaction_pgi",
    "transaction_tp", "entity_tp", "name", "state", "zip_code",
    "employer", "occupation", "transaction_dt", "transaction_amt",
    "memo_text", "image_num", "file_num", "tran_id", "sub_id")

  /** contributions22 (main.py:26-61): UNION ALL of oth22+indiv22 with
    * memo rows excluded, zip truncated to 5, MMDDYYYY→ISO date, then
    * SELECT DISTINCT. */
  def contributions(oth: DataFrame, indiv: DataFrame): DataFrame = {
    def shape(df: DataFrame): DataFrame =
      df.filter(col("memo_cd").isNull)
        .select(
          col("cmte_id"), col("other_id"), col("amndt_ind"), col("rpt_tp"),
          col("transaction_pgi"), col("transaction_tp"), col("entity_tp"),
          col("name"), col("state"),
          Zips.zip5(col("zip_code")).as("zip_code"),
          col("employer"), col("occupation"),
          Dates.fec_date_iso(col("transaction_dt")).as("transaction_dt"),
          col("transaction_amt"), col("memo_text"), col("image_num"),
          col("file_num"), col("tran_id"), col("sub_id"))
    shape(oth).unionByName(shape(indiv))
      .dropDuplicates()
      .select(contributionCols.map(col): _*)
  }

  /** expenditures22 (main.py:66-136): operating (oppexp22 ⟕ cm22) UNION
    * ALL independent (independent_expenditure ⟕ cm22 ⟕ cn22 with IFNULL
    * coalescing), null-padded to the 45-col master schema. */
  def expenditures(oppexp: DataFrame, indExp: DataFrame, cm: DataFrame,
      cn: DataFrame): DataFrame = {
    val nullS = lit(null).cast("string")
    val nullI = lit(null).cast("long")

    val operating = oppexp.alias("a")
      .filter(col("a.memo_cd").isNull)
      .join(broadcast(cm.alias("b")), col("a.cmte_id") === col("b.cmte_id"), "left")
      .select(
        col("a.sub_id").cast("string").as("id"),
        lit("operating").as("type"),
        col("a.cmte_id"), col("b.cmte_nm"), col("b.cmte_zip"),
        col("b.cmte_dsgn"), col("b.cmte_tp"), col("b.cmte_pty_affiliation"),
        col("b.cmte_filing_freq"), col("b.org_tp"), col("b.connected_org_nm"),
        Dates.parse_date_mdy(col("a.transaction_dt")).cast("string")
          .as("transaction_dt"),
        col("a.transaction_amt"), col("a.purpose"),
        nullS.as("sup_opp"), nullS.as("cand_id"), nullS.as("cand_name"),
        nullS.as("cand_pty_affiliation"), nullI.as("cand_election_yr"),
        nullS.as("cand_office_st"), nullS.as("cand_office"),
        nullS.as("cand_office_district"), nullS.as("cand_ici"),
        nullS.as("cand_pcc"), nullS.as("cand_zip"),
        col("a.category"), col("a.category_desc"),
        col("a.name").as("payee"), col("a.entity_tp"), col("a.state"),
        Zips.zip5(col("a.zip_code")).as("zip_code"),
        col("a.transaction_pgi"), col("a.amndt_ind"), col("a.image_num"),
        col("a.file_num"), col("a.tran_id"), col("a.line_num"),
        col("a.rpt_yr"), col("a.rpt_tp"), col("a.form_tp_cd"),
        col("a.sched_tp_cd"), nullS.as("rec_dt"),
        nullI.as("prev_file_num"), col("a.back_ref_tran_id"), col("a.sub_id"))

    val independent = indExp.alias("a")
      .join(broadcast(cm.alias("b")), col("a.spe_id") === col("b.cmte_id"), "left")
      .join(broadcast(cn.alias("c")), col("a.can_id") === col("c.cand_id"), "left")
      .select(
        concat(col("a.file_num").cast("string"), lit("-"), col("a.tra_id"))
          .as("id"),
        lit("independent").as("type"),
        col("a.spe_id").as("cmte_id"),
        coalesce(col("b.cmte_nm"), col("a.spe_nam")).as("cmte_nm"),
        col("b.cmte_zip"), col("b.cmte_dsgn"), col("b.cmte_tp"),
        col("b.cmte_pty_affiliation"), col("b.cmte_filing_freq"),
        col("b.org_tp"), col("b.connected_org_nm"),
        Dates.parse_date_dby(col("a.exp_dat")).cast("string")
          .as("transaction_dt"),
        col("a.exp_amo").as("transaction_amt"),
        col("a.pur").as("purpose"),
        col("a.sup_opp"), col("a.can_id").as("cand_id"),
        coalesce(col("c.cand_name"), col("a.can_nam")).as("cand_name"),
        substring(coalesce(col("c.cand_pty_affiliation"),
          col("a.can_par_aff")), 1, 3).as("cand_pty_affiliation"),
        coalesce(col("c.cand_election_yr"), col("a.fec_election_yr"))
          .as("cand_election_yr"),
        coalesce(col("c.cand_office_st"), col("a.can_off_sta"))
          .as("cand_office_st"),
        coalesce(col("c.cand_office"), col("a.can_off")).as("cand_office"),
        coalesce(col("c.cand_office_district"), col("a.can_off_dis"))
          .as("cand_office_district"),
        col("c.cand_ici"), col("c.cand_pcc"), col("c.cand_zip"),
        nullS.as("category"), nullS.as("category_desc"),
        col("a.pay").as("payee"), nullS.as("entity_tp"), nullS.as("state"),
        nullS.as("zip_code"),
        concat(col("a.ele_typ"), col("a.fec_election_yr")).as("transaction_pgi"),
        col("a.amn_ind").as("amndt_ind"), col("a.ima_num").as("image_num"),
        col("a.file_num"), col("a.tra_id").as("tran_id"),
        nullS.as("line_num"), nullI.as("rpt_yr"), nullS.as("rpt_tp"),
        nullS.as("form_tp_cd"), nullS.as("sched_tp_cd"),
        Dates.parse_date_dby(col("a.rec_dt")).cast("string").as("rec_dt"),
        col("a.prev_file_num"), nullS.as("back_ref_tran_id"),
        nullI.as("sub_id"))

    operating.unionByName(independent)
  }
}
