package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** X1 — entity extraction (ref: NER agent roadmap README.md:86, the
  * always-empty `entities` field ingest_enron.py:137 and its planned
  * index :152). Heavy model NER is out of scope offline (SURVEY.md
  * §2.9); this is the deterministic tier: regex extractors for
  * structured entities + gazetteer matching for domain terms. Both are
  * pure Column expressions — codegen'd, partition-parallel, and (for
  * the gazetteer tier) oracle-reproducible.
  */
object Ner {

  /** entities struct array from a regex: every match of `pattern`
    * becomes {text, type}. */
  def regexEntities(c: Column, pattern: String, entityType: String): Column =
    transform(regexp_extract_all(c, lit(pattern), lit(0)),
      t => struct(t.as("text"), lit(entityType).as("type")))

  /** entities from a gazetteer: tokens ∈ `terms` become {token, type}. */
  def gazetteerEntities(toks: Column, terms: Seq[String],
      entityType: String): Column =
    transform(filter(toks, t => t.isin(terms.map(lit): _*)),
      t => struct(t.as("text"), lit(entityType).as("type")))

  private val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlPattern = "https?://[^\\s<>]+"
  private val numberPattern = "[0-9]+(?:\\.[0-9]+)?"

  /** Title-case sequence: ≥2 capitalized words — the surface form
    * shared by person and organization mentions. Each token is
    * `[A-Z][A-Za-z]+` (initial capital, ≥2 letters, internal caps
    * allowed) rather than strict `[A-Z][a-z]+`: all-caps suffix tokens
    * like "LLC" must be matchable or the ORG branch is dead for them
    * (caught in round-10 review — strict lowercase tails silently
    * dropped every "… LLC" mention on BOTH engines, so the oracle
    * could never see the miss). RE2-compatible (no lookaround), so the
    * oracle runs the IDENTICAL pattern in DuckDB. */
  private[graft] val titleSeqPattern = "[A-Z][A-Za-z]+(?: [A-Z][A-Za-z]+)+"

  /** Org suffixes for the context rule. RE2 has no lookahead, so
    * PERSON-vs-ORG is decided by a post-extraction context test on the
    * sequence's LAST token — expressible as the same list filter on
    * both engines. */
  private[graft] val orgSuffixes = Seq("Inc", "Corp", "Ltd", "LLC")

  private def endsInOrgSuffix(t: Column): Column =
    element_at(split(t, " "), -1).isin(orgSuffixes.map(lit): _*)

  /** PERSON/ORG context entities from free text: title-case sequences,
    * classified ORG when the final token is a corporate suffix and
    * PERSON otherwise (the deterministic context rule standing in for
    * the reference's deferred statistical models, README.md:86). */
  def titleCaseEntities(text: Column): Column = {
    val seqs = regexp_extract_all(text, lit(titleSeqPattern), lit(0))
    concat(
      transform(filter(seqs, t => !endsInOrgSuffix(t)),
        t => struct(t.as("text"), lit("PERSON").as("type"))),
      transform(filter(seqs, t => endsInOrgSuffix(t)),
        t => struct(t.as("text"), lit("ORG").as("type"))))
  }

  /** Annotate an email store: EMAIL/URL/NUMBER regex entities plus
    * PERSON/ORG context entities extracted from subject+body replace
    * the reference's empty placeholder — after this, Q6 (`byEntity`)
    * returns real rows. */
  def annotateEmails(store: DataFrame): DataFrame = {
    val text = concat_ws(" ", col("subject"), col("body"))
    store.withColumn("entities",
      concat(
        regexEntities(text, emailPattern, "EMAIL"),
        regexEntities(text, urlPattern, "URL"),
        regexEntities(text, numberPattern, "NUMBER"),
        titleCaseEntities(text)))
  }

  // ------------------------------------------------ driver queries

  private val colorTerms = Seq("red", "blue", "green")
  private val productTerms = Seq("bolt", "widget", "rod", "anvil", "ring",
    "gear", "cog")

  /** t47: gazetteer NER over part names — entity counts per type+text
    * (oracle-checked: identical token matching in DuckDB). */
  def gazetteerNer(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("p_name"), " ")
    part(s, d)
      .select(explode(concat(
        gazetteerEntities(toks, colorTerms, "COLOR"),
        gazetteerEntities(toks, productTerms, "PRODUCT"))).as("e"))
      .groupBy(col("e.type").as("entity_type"), col("e.text").as("entity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy("entity_type", "entity_text")
  }

  val gazetteerNerSql: String = {
    def inList(terms: Seq[String]) = terms.map(t => s"'$t'").mkString(", ")
    s"""SELECT entity_type, entity_text, count(*) AS n FROM (
      |  SELECT 'COLOR' AS entity_type,
      |    unnest(list_filter(string_split(p_name, ' '),
      |      t -> t IN (${inList(colorTerms)}))) AS entity_text
      |  FROM part
      |  UNION ALL
      |  SELECT 'PRODUCT',
      |    unnest(list_filter(string_split(p_name, ' '),
      |      t -> t IN (${inList(productTerms)})))
      |  FROM part)
      |GROUP BY 1, 2 ORDER BY entity_type, entity_text""".stripMargin
  }

  /** em67 / Q6: entity lookup over the annotated fixture corpus — the
    * previously-stubbed `byEntity` path end to end, oracle-checked: the
    * NUMBER regex runs identically in DuckDB over subject+body. */
  def byEntityDemo(s: SparkSession, d: String): DataFrame = {
    val annotated = annotateEmails(graft.query.FixtureCorpus.store(s, d))
    graft.query.EmailQueries.byEntity(annotated, "10", "NUMBER")
      .select("dedupe_key", "subject").orderBy("dedupe_key")
  }

  val byEntityDemoSql: String =
    s"""${graft.query.FixtureCorpus.sqlPrelude}
      |SELECT dedupe_key, subject FROM m
      |WHERE list_contains(
      |  regexp_extract_all(subject || ' ' || body, '[0-9]+(?:\\.[0-9]+)?'),
      |  '10')
      |ORDER BY dedupe_key""".stripMargin

  /** t63: PERSON/ORG context NER over the fixture corpus — title-case
    * sequences from the store's subjects, classified by the org-suffix
    * context rule, censused per (type, text). The fixture synthesis
    * plants the mentions (FixtureCorpus.subjectFor: every 11th subject
    * carries a person + an org), so the oracle independently
    * reconstructs them from `documents` and re-runs the SAME RE2
    * pattern + last-token classification in DuckDB — asserting regex
    * semantics, the context split, and the census cross-engine. */
  def titleCaseNer(s: SparkSession, d: String): DataFrame = {
    val store = graft.query.FixtureCorpus.store(s, d)
    store
      .select(explode(titleCaseEntities(col("subject"))).as("e"))
      .groupBy(col("e.type").as("entity_type"),
        col("e.text").as("entity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy("entity_type", "entity_text")
  }

  val titleCaseNerSql: String = {
    val inList = orgSuffixes.map(t => s"'$t'").mkString(", ")
    s"""${graft.query.FixtureCorpus.sqlPrelude},
      |seqs AS (
      |  SELECT unnest(regexp_extract_all(subject,
      |    '[A-Z][A-Za-z]+(?: [A-Z][A-Za-z]+)+')) AS t
      |  FROM m)
      |SELECT CASE WHEN string_split(t, ' ')[-1] IN ($inList)
      |    THEN 'ORG' ELSE 'PERSON' END AS entity_type,
      |  t AS entity_text, count(*) AS n
      |FROM seqs GROUP BY 1, 2 ORDER BY entity_type, entity_text"""
      .stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t47_gazetteer_ner" -> gazetteerNer _,
    "t63_title_ner"     -> titleCaseNer _,
    "em67_by_entity"    -> byEntityDemo _,
  )

  val oracleSql: Map[String, String] = Map(
    "t47_gazetteer_ner" -> gazetteerNerSql,
    "t63_title_ner"     -> titleCaseNerSql,
    "em67_by_entity"    -> byEntityDemoSql,
  )
}
