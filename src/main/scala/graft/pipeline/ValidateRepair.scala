package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.JobConfig
import graft.llm.LlmClient

/** Validate-then-REPAIR enrich loop — the yield-recovery operator a
  * production pipeline runs on top of [[SchemaValidate]]'s QA gate
  * (VERDICT r13 item 4): records whose LLM output violates the schema
  * are re-prompted ONCE with the violation reason injected into the
  * retry template, then re-validated. The gate stops being a pure
  * filter (q214's stance: route to dead-letter) and becomes a
  * recovery pass: most transient failures (truncated JSON, prose
  * where an integer belongs) repair on the second ask, while
  * systematic ones (the model insisting on an out-of-enum value)
  * land in the final dead-letter with attempts = 2.
  *
  * Loop shape, by construction:
  *   - BOUNDED: exactly one retry — attempts ∈ {1, 2}, never a
  *     re-ask loop that a stubborn model could spin forever;
  *   - FRUGAL: only first-pass FAILURES are re-asked (the first-pass
  *     frame is localCheckpoint'd so the LLM stage runs exactly once
  *     per pass — without it, the dead/valid forks would each re-fire
  *     the mapPartitions call stage), spec-proven with a counting
  *     client;
  *   - TOTAL: every input record gets one report row — (attempts,
  *     valid_first, valid_final, reason_first, reason_final) — so the
  *     per-reason repair-rate dashboard is one fold of this frame.
  *
  * Spark-first: both passes are the same EnrichJob mapPartitions
  * stage; validation is SchemaValidate's codegen'd Column chain; the
  * only movement between passes is the dead slice, which re-enters
  * the enrich stage under the retry template. At 100 TB the retry
  * pass touches |failures| records, not the corpus — the loop's cost
  * is proportional to the defect rate, which is the whole point.
  */
object ValidateRepair {

  /** Returns the per-record repair report:
    * (id, attempts, valid_first, valid_final, reason_first,
    * reason_final) — flags as BIGINT 0/1, reasons '' when clean.
    *
    * `retryTemplate` is an ERB template with `texts[:why]` bound to
    * the first pass's violation reason (plus everything the first
    * template saw under `contentLabel`).
    */
  def run(
      records: DataFrame,
      cfg: JobConfig,
      retryTemplate: String,
      client: LlmClient,
      constraints: Seq[(String, SchemaValidate.Constraint)],
      contentLabel: String = "content",
      opts: EnrichOptions = EnrichOptions()): DataFrame = {
    val first = EnrichJob.run(records, cfg, client, opts).good
      .select(col("id"),
        element_at(col("texts"), contentLabel).as("content"),
        element_at(col("texts"), cfg.outputLabel).as("j"))
    // one LLM call per record per pass — materialize before forking
    // into the valid/dead consumers (and the retry join)
    val checked1 = SchemaValidate.verdicts(first, "j", constraints)
      .select(col("id"), col("content"),
        col("valid").cast("boolean").as("valid1"),
        col("reason").as("reason_first"))
      .localCheckpoint()

    val dead1 = checked1.filter(!col("valid1"))
    val retryRecords = dead1.select(col("id"),
      map(lit(contentLabel), col("content"),
        lit("why"), col("reason_first")).as("texts"),
      array().cast("array<string>").as("images"))
    val cfg2 = cfg.copy(id = cfg.id + "-retry", erbTemplate = retryTemplate)
    val second = EnrichJob.run(retryRecords, cfg2, client, opts).good
      .select(col("id"), element_at(col("texts"), cfg.outputLabel).as("j"))
    val checked2 = SchemaValidate.verdicts(second, "j", constraints)
      .select(col("id"), col("valid").cast("boolean").as("valid2"),
        col("reason").as("reason_final"))

    val repaired = dead1.select(col("id"), col("reason_first"))
      .join(checked2, Seq("id"))
      .select(col("id"), lit(2L).as("attempts"), lit(0L).as("valid_first"),
        col("valid2").cast("long").as("valid_final"),
        col("reason_first"), col("reason_final"))
    val cleanFirst = checked1.filter(col("valid1"))
      .select(col("id"), lit(1L).as("attempts"), lit(1L).as("valid_first"),
        lit(1L).as("valid_final"), col("reason_first"),
        lit("").as("reason_final"))
    cleanFirst.unionByName(repaired)
  }
}
