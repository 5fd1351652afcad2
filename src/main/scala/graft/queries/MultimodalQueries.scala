package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payloads as first-class data.
  *
  * mm01 treats document text's UTF-8 bytes as the payload (both engines
  * can hash/measure those → oracle-backed). mm02 synthesizes
  * deterministic fake media payloads and runs the full decode →
  * feature-extract path (mapPartitions stub codec) — not
  * SQL-expressible, so rows-only here with semantics pinned by
  * MultimodalSpec.
  */
object MultimodalQueries {

  val all: Seq[NamedQuery] = Seq(

    // ---- byte-level payload stats, fully declarative (codegen).
    NamedQuery("mm01_payload_bytes",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("hash8"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |  substr(md5(text), 1, 8) AS hash8
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- full decode path over synthetic payloads: doc_id-keyed fake
    // media, mapPartitions "codec", per-media features.
    NamedQuery("mm02_media_features", (s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          (id, Multimodal.syntheticPayload(
            width = 8 + (nChars % 24).toInt, height = 6, seed = (id % 97).toInt))
        }
        .toDF("media_id", "content")
      Multimodal.decodeFeatures(media, "media_id", "content")
        .orderBy("media_id")
    })
  )
}
