package graft.registry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Cleaning

/** Registry-driven endpoint catalog — the single source of truth for core
  * schemas, primary keys, and mapping, mirroring the reference's in-code
  * registry (/root/reference/etl/registry.py:37-167) and the data-driven
  * redesign of its hand-written per-column mapper (SURVEY.md T6: one select
  * built from (target, aliases, castType) triples).
  */
sealed trait CastKind
object CastKind {
  case object AsInt extends CastKind
  case object AsDouble extends CastKind
  case object AsString extends CastKind
}

/** One logical column: target name, candidate source keys in preference
  * order (field names drift across years, directory.py:55-67), target type. */
final case class ColumnSpec(target: String, aliases: Seq[String], kind: CastKind) {

  def dataType: DataType = kind match {
    case CastKind.AsInt => IntegerType
    case CastKind.AsDouble => DoubleType
    case CastKind.AsString => StringType
  }

  /** Mapping expression over a `MAP<STRING,STRING>` record column — the
    * exact T1–T6 composition: clean each alias (sentinels → null) and pick
    * the FIRST non-missing one, THEN cast. The cast applies only to the
    * picked value: `_to_int(_pick(row, aliases))` in the reference
    * (directory.py:132+) does NOT fall through to a later alias when the
    * picked value is malformed — it returns NULL. */
  def expr(record: Column): Column = {
    val picked = coalesce(aliases.map(a => Cleaning.cleanStr(element_at(record, a))): _*)
    val cast = kind match {
      case CastKind.AsInt => Cleaning.castCleanInt(picked)
      case CastKind.AsDouble => Cleaning.castCleanDouble(picked)
      case CastKind.AsString => picked
    }
    cast.as(target)
  }
}

final case class EndpointConfig(
    name: String,
    path: String,
    columns: Seq[ColumnSpec],
    primaryKey: Seq[String]) {

  def schema: StructType = StructType(columns.map(c =>
    StructField(c.target, c.dataType, nullable = !primaryKey.contains(c.target))))
}

object Registry {

  private def i(target: String, aliases: String*) =
    ColumnSpec(target, if (aliases.isEmpty) Seq(target) else aliases, CastKind.AsInt)
  private def s(target: String, aliases: String*) =
    ColumnSpec(target, if (aliases.isEmpty) Seq(target) else aliases, CastKind.AsString)
  private def d(target: String, aliases: String*) =
    ColumnSpec(target, if (aliases.isEmpty) Seq(target) else aliases, CastKind.AsDouble)

  /** The IPEDS Directory endpoint: 89 typed columns, PK (unitid, year).
    * Column contract from /root/reference/etl/registry.py:49-161; alias lists
    * from /root/reference/etl/mappers/directory.py:126-238. */
  val directory: EndpointConfig = EndpointConfig(
    name = "directory",
    path = "college-university/ipeds/directory",
    primaryKey = Seq("unitid", "year"),
    columns = Seq(
      // primary key
      i("unitid"),
      i("year"),
      // identity / contact
      s("opeid"),
      s("inst_name", "inst_name", "institution_name", "instnm", "name"),
      s("inst_alias"),
      s("address"),
      s("city"),
      s("state_abbr", "state_abbr", "stabbr", "state"),
      s("zip", "zip", "zip5", "zip_code"),
      s("phone_number", "phone_number", "phone"),
      s("url_school", "url_school", "website", "web_address"),
      s("url_fin_aid"),
      s("url_application"),
      s("url_netprice"),
      s("url_veterans"),
      s("url_athletes"),
      s("url_disability_services"),
      s("ein"),
      s("duns"),
      s("ueis"),
      s("chief_admin_name"),
      s("chief_admin_title"),
      s("inst_system_name"),
      // geography
      i("fips"),
      s("county_name"),
      i("county_fips"),
      i("region"),
      i("urban_centric_locale", "urban_centric_locale", "locale"),
      i("cbsa"),
      i("cbsa_type"),
      i("csa"),
      i("necta"),
      i("congress_district_id"),
      d("latitude", "latitude", "lat"),
      d("longitude", "longitude", "lon", "lng"),
      // status / attributes
      i("inst_status"),
      i("sector", "sector", "sector_cd"),
      i("inst_control", "inst_control", "control"),
      i("institution_level", "institution_level", "level", "iclevel"),
      i("inst_category"),
      i("inst_size"),
      i("degree_granting"),
      i("title_iv_indicator"),
      i("hbcu"),
      i("tribal_college"),
      i("land_grant"),
      i("hospital"),
      i("medical_degree"),
      i("open_public"),
      i("currently_active_ipeds"),
      i("postsec_public_active"),
      i("postsec_public_active_title_iv"),
      i("primarily_postsecondary"),
      i("offering_highest_degree"),
      i("offering_highest_level"),
      i("offering_undergrad"),
      i("offering_grad"),
      i("reporting_method"),
      i("inst_system_flag"),
      i("comparison_group"),
      i("comparison_group_custom"),
      // mergers / deletions / dates
      i("newid"),
      s("date_closed"), // deliberately TEXT (registry.py:120-122)
      i("year_deleted"),
      // Carnegie classifications
      i("cc_basic_2000"), i("cc_basic_2010"), i("cc_basic_2015"),
      i("cc_basic_2018"), i("cc_basic_2021"),
      i("cc_instruc_undergrad_2010"), i("cc_instruc_undergrad_2015"),
      i("cc_instruc_undergrad_2018"), i("cc_instruc_undergrad_2021"),
      i("cc_instruc_grad_2010"), i("cc_instruc_grad_2015"),
      i("cc_instruc_grad_2018"), i("cc_instruc_grad_2021"),
      i("cc_undergrad_2010"), i("cc_undergrad_2015"),
      i("cc_undergrad_2018"), i("cc_undergrad_2021"),
      i("cc_enroll_2010"), i("cc_enroll_2015"),
      i("cc_enroll_2018"), i("cc_enroll_2021"),
      i("cc_size_setting_2010"), i("cc_size_setting_2015"),
      i("cc_size_setting_2018"), i("cc_size_setting_2021")))

  /** The IPEDS Admissions endpoint — the reference documents this mapper
    * but never ships it (`etl/mappers/admissions.py`, architecture.md:122;
    * the `admissions_enriched` view at architecture.md:53-54 and the
    * accept-rate/yield KPIs at architecture.md:56 define its required
    * fields). Column set follows the public IPEDS ADM component: applicant
    * / admitted / enrolled counts plus test-score percentiles; alias lists
    * carry the survey's historical short names the same way the directory
    * mapper does. PK (unitid, year) per architecture.md:41-44. */
  val admissions: EndpointConfig = EndpointConfig(
    name = "admissions",
    path = "college-university/ipeds/admissions-enrollment",
    primaryKey = Seq("unitid", "year"),
    columns = Seq(
      i("unitid"),
      i("year"),
      i("number_applied", "number_applied", "applicants_total", "applcn"),
      i("number_admitted", "number_admitted", "admissions_total", "admssn"),
      i("number_enrolled_total", "number_enrolled_total", "enrolled_total", "enrlt"),
      i("number_enrolled_ft", "number_enrolled_ft", "enrlft"),
      i("number_enrolled_pt", "number_enrolled_pt", "enrlpt"),
      i("sat_reading_25_pctl", "sat_reading_25_pctl", "satvr25"),
      i("sat_reading_75_pctl", "sat_reading_75_pctl", "satvr75"),
      i("sat_math_25_pctl", "sat_math_25_pctl", "satmt25"),
      i("sat_math_75_pctl", "sat_math_75_pctl", "satmt75"),
      i("act_composite_25_pctl", "act_composite_25_pctl", "actcm25"),
      i("act_composite_75_pctl", "act_composite_75_pctl", "actcm75")))

  /** The IPEDS Completions endpoint — documented mapper + view
    * (architecture.md:122, `completions_by_cip` at architecture.md:55)
    * with the documented composite key (unitid, year, cipcode,
    * award_level) (architecture.md:43) — the 4-column-PK case the upsert
    * and index guidance (architecture.md:78-79) call out. Counts follow
    * the public IPEDS C component short names. */
  val completions: EndpointConfig = EndpointConfig(
    name = "completions",
    path = "college-university/ipeds/completions-cip-6",
    primaryKey = Seq("unitid", "year", "cipcode", "award_level"),
    columns = Seq(
      i("unitid"),
      i("year"),
      s("cipcode", "cipcode", "cip6", "cip"),
      i("award_level", "award_level", "awlevel"),
      i("awards_total", "awards_total", "ctotalt", "awards"),
      i("awards_men", "awards_men", "ctotalm"),
      i("awards_women", "awards_women", "ctotalw")))

  /** The IPEDS Finance endpoint — the last of the mappers the reference
    * names but never ships ("plus others (finance, completions, etc.)",
    * architecture.md:122). Revenue/expense/endowment totals follow the
    * public IPEDS F component's harmonized names, with the survey-form
    * short names (F1A GASB / F2 FASB items) as drifting aliases, exactly
    * like the directory mapper's instnm/stabbr pairs. Dollar amounts are
    * doubles, NOT ints: large-system totals exceed the 32-bit range, and
    * the reference's float cast (T4) is the documented money path. PK
    * (unitid, year) per architecture.md:41-44. */
  val finance: EndpointConfig = EndpointConfig(
    name = "finance",
    path = "college-university/ipeds/finance",
    primaryKey = Seq("unitid", "year"),
    columns = Seq(
      i("unitid"),
      i("year"),
      s("accounting_standard", "accounting_standard", "gasb_fasb", "acctstd"),
      d("rev_total", "rev_total", "rev_total_current", "total_revenues"),
      d("rev_tuition_fees", "rev_tuition_fees", "rev_tuition_fees_net",
        "tuition_fees"),
      d("rev_federal_approps", "rev_federal_approps", "federal_approps"),
      d("rev_state_local_approps", "rev_state_local_approps",
        "state_local_approps"),
      d("rev_investment_return", "rev_investment_return", "investment_return"),
      d("exp_total", "exp_total", "exp_total_current", "total_expenses"),
      d("exp_instruction", "exp_instruction", "exp_instruc_total",
        "instruction_exp"),
      d("exp_research", "exp_research", "research_exp"),
      d("exp_student_services", "exp_student_services", "student_services_exp"),
      d("endowment_assets", "endowment_assets", "endowment_eoy")))

  val endpoints: Map[String, EndpointConfig] = Map(
    directory.name -> directory,
    admissions.name -> admissions,
    completions.name -> completions,
    finance.name -> finance)

  /** Accessor with the reference's unknown-endpoint error contract
    * (registry.py:170-181). */
  def endpoint(name: String): EndpointConfig =
    endpoints.getOrElse(name,
      throw new IllegalArgumentException(
        s"Unknown endpoint '$name'. Known: ${endpoints.keys.mkString(", ")}"))
}
