package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** End-to-end document curation — the training-data analog of the
  * reference's book-curation flow (and the flagship composition of the
  * engine's pipeline operators): score → filter → dedup → split.
  *
  * Stage order is the scale order: quality scoring and language ID are
  * scan-stage expressions (zero shuffle), so running the threshold and
  * language filters FIRST shrinks the corpus before the dedup shuffle;
  * exact dedup is one shuffle on the content hash; split assignment is
  * again scan-stage. The whole flow is a single Catalyst plan — and
  * every stage is engine-portable, so the COMPOSED pipeline is
  * DuckDB-oracle-checkable end to end (query p03).
  */
object Curation {

  /** Curate `docs`: keep documents with quality ≥ `minQuality` whose
    * predicted language is in `keepLangs`, drop exact duplicates
    * (minimum-id survivor per distinct text), assign a deterministic
    * content-hash train/val/test split. Output:
    * (id, quality, pred_lang, split). */
  def curateDocuments(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, keepLangs: Seq[String]): DataFrame = {
    val enStop = TextOps.langMarkers.head._2
    val scored = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("quality", TextOps.qualityScore(col("text"), enStop))
      .withColumn("pred_lang", TextOps.langId(col("text")))
      .filter(col("quality") >= minQuality && col("pred_lang").isin(keepLangs: _*))
    Dedup.dropExactDups(scored, "id", "text")
      .withColumn("split", Sampling.splitLabel(col("text")))
      .select("id", "quality", "pred_lang", "split")
  }
}
