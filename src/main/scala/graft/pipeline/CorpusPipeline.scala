package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end training-corpus preparation — the composition the
  * individual §2.6/§2.8 operators exist for, as ONE declarative plan:
  *
  *   1. quality-score every document (codegen scalar pass);
  *   2. drop low-quality docs (score < threshold);
  *   3. near-dup the SURVIVORS (blocked Jaccard pair join — dedup cost
  *      scales with the filtered corpus, not the raw one: filter
  *      before the expensive operator, the same reason predicate
  *      pushdown matters);
  *   4. keep one doc per near-dup pair (greedy keeper);
  *   5. report per-language corpus stats (exact-int counts, order-free
  *      min/max for the float column — no order-dependent float sums
  *      cross the oracle boundary).
  *
  * Every stage reuses the already-verified pieces (qualityScore,
  * ngramJaccard, applyPairs), so the pipeline itself is the unit under
  * test: its oracle recomposes the same stages in SQL.
  */
object CorpusPipeline extends QueryModule {

  def corpusFilter(docs: DataFrame, minScore: Double,
      jaccard: Double): DataFrame = {
    val scored = docs.withColumn("_score",
      TextAnalysis.qualityScore(col("text")))
    val kept = scored.filter(col("_score") >= minScore)
    val deduped = Dedup.applyPairs(kept, Dedup.ngramJaccard(kept, jaccard))
    deduped.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        min(col("_score")).as("min_score"),
        max(col("_score")).as("max_score"))
      .orderBy("lang")
  }

  def pipeCorpusFilter(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    corpusFilter(Tables.documents(spark, dir), 0.5, 0.9)
  }

  val pipeCorpusFilterSql: String = {
    val score = TextAnalysis.qualityScoreSql("text")
    s"""WITH kept AS (
       |  SELECT doc_id, lang, text, $score AS s
       |  FROM documents WHERE $score >= 0.5),
       |tok AS (
       |  SELECT doc_id, lang,
       |    unnest(list_distinct(regexp_split_to_array(text, '\\s+'))) AS w
       |  FROM kept),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |  FROM tok a JOIN tok b
       |    ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(i AS DOUBLE)/CAST(s1.n + s2.n - i AS DOUBLE) >= 0.9)
       |SELECT lang, COUNT(*) AS n_docs,
       |  MIN(s) AS min_score, MAX(s) AS max_score
       |FROM kept
       |WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM pairs)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_corpus_filter" -> (pipeCorpusFilter _))

  val oracles: Map[String, String] = Map(
    "pipe_corpus_filter" -> pipeCorpusFilterSql)
}
