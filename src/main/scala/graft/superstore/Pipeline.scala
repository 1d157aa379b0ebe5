package graft.superstore

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.superstore.StarSchema.SuperstoreDims

/** End-to-end Superstore ELT pipeline (SURVEY §3.1's 13-stage DAG as lazy
  * DataFrames; the caller decides where to write/materialize).
  *
  * Mirrors the reference script order: raw load -> typed staging -> dedup ->
  * QA -> date spine -> simple dims -> SCD2 dims -> fact -> views/marts.
  */
object Pipeline {

  final case class Outputs(
      raw: DataFrame, staged: DataFrame, deduped: DataFrame,
      loadIssues: DataFrame, dims: SuperstoreDims, fact: DataFrame,
      rolling30: DataFrame, customerCohort: DataFrame,
      topProducts: DataFrame, suspiciousDiscounts: DataFrame,
      pivotByCategory: DataFrame, pivotByOrderDate: DataFrame)

  def run(spark: SparkSession, csvPath: String,
          excelCompat: Boolean = false): Outputs = {
    val raw = Ingest.readRaw(spark, csvPath, excelCompat)
    val staged = Staging.typed(raw)
    // dedup output feeds every downstream consumer: cache it (S5 — the
    // reference materializes #temp tables for the same reason)
    val deduped = Staging.deduped(staged).cache()

    val categoryDim = StarSchema.categoryDim(deduped)
    val dims = SuperstoreDims(
      date = StarSchema.dateDim(deduped),
      shipMode = StarSchema.shipModeDim(deduped),
      category = categoryDim,
      subCategory = StarSchema.subCategoryDim(deduped, categoryDim),
      geography = StarSchema.geographyDim(deduped),
      customer = StarSchema.customerDim(deduped),
      product = StarSchema.productDim(deduped))

    val fact = StarSchema.salesFact(deduped, dims)

    Outputs(
      raw = raw, staged = staged, deduped = deduped,
      loadIssues = Marts.loadIssues(deduped),
      dims = dims, fact = fact,
      rolling30 = Marts.rolling30(fact, dims.geography, dims.date),
      customerCohort = Marts.customerCohort(fact, dims.date),
      topProducts = Marts.topProductsBySubCat(fact, dims.product),
      suspiciousDiscounts = Marts.suspiciousDiscounts(fact),
      pivotByCategory = Marts.pivotByCategory(deduped),
      pivotByOrderDate = Marts.pivotByOrderDate(deduped))
  }
}
