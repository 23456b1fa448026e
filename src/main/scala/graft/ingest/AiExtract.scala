package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** U3: AI event extraction from unstructured document text
  * (transform_data.py:276-480) as an injectable mapPartitions stage.
  *
  * The reference calls a hosted LLM with a structured-output schema, caps
  * input at 15 000 chars, validates the JSON-array reply, and emits a
  * fallback error record when extraction fails. Here the service client is
  * a trait: deployments plug an HTTP client; the default is a
  * deterministic offline extractor (the zero-egress build) that reuses the
  * U4 line-parser — same schema, same cap, same fallback semantics. */
object AiExtract {

  val MaxChars = 15000 // transform_data.py:320,421

  final case class AiEvent(name: String, date: Option[String],
      venue_name: Option[String], venue_address: Option[String],
      description: Option[String], category: Option[String],
      price: Option[String], url: Option[String], error: Option[String])

  /** The pluggable extraction service: text (≤ MaxChars) → events. */
  trait Extractor extends Serializable {
    def extract(text: String): Seq[AiEvent]
  }

  /** Deterministic offline stub: structured-line parse via DocParse.
    * Emits the reference's fallback error record when nothing extracts
    * (transform_data.py:369-385). */
  object StubExtractor extends Extractor {
    def extract(text: String): Seq[AiEvent] = {
      val recs = DocParse.parseText(text)
      if (recs.isEmpty)
        Seq(AiEvent("Extraction Failed", None, None, None,
          Some(text.take(200)), None, None, None,
          Some("no events found")))
      else recs.map(r => AiEvent(r.name.getOrElse("Unknown"), r.event_date,
        r.venue_name, r.venue_address, r.description, None, None, r.url,
        None))
    }
  }

  /** mapPartitions over (id, text): one extractor per partition, text
    * gated at 20 chars (P8) and capped at MaxChars before the call. */
  def extract(docs: DataFrame, idCol: String, textCol: String,
      extractor: Extractor = StubExtractor): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          if (text == null || text.trim.length < 20) Iterator.empty // P8
          else extractor.extract(text.take(MaxChars)).iterator
            .map(e => (id, e))
        }
      }
      .select(col("_1").as("doc_id"), col("_2.*"))
  }
}
