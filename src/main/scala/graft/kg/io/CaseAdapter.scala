package graft.kg.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, LongType, StringType}

/** Schema-adaptive case loader — the Spark form of the reference's
  * heuristic input adapter (_adapt_case + _sanitize_case_id,
  * run_iltur.py:431-577): coalesce an arbitrary corpus DataFrame (HF dumps,
  * Turkish AYM exports, ECHR fact lists…) into the canonical
  * (case_id, text, label) shape, entirely with column expressions — the
  * coalesce happens at plan time over whichever candidate columns exist, so
  * unrelated columns are pruned at the scan.
  */
object CaseAdapter {

  /** Candidate columns in the reference's priority order. */
  private val IdCandidates = Seq(
    "Başvuru Numarası", "Basvuru Numarasi", "Esas Sayısı", "Esas Sayisi",
    "id", "case_id", "uid", "doc_id", "guid", "citation")
  private val TextCandidates = Seq(
    "Metin", "Karar Metni", "metin", "text", "document", "judgment",
    "content", "full_text", "case_text")
  private val ListTextCandidates = Seq(
    "facts", "paragraphs", "paragraph", "sentences", "sentence")
  private val LabelCandidates = Seq("label", "labels", "accepted", "outcome")
  private val UrlCandidates = Seq("Kararın Bağlantı Linki", "url")

  /** _sanitize_case_id (run_iltur.py:431-440) as a column expression. */
  def sanitizeCaseId(c: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(trim(coalesce(c.cast("string"), lit(""))),
          "[/\\\\]", "_"),
        "[^0-9A-Za-z._-]+", "_"),
      "_+", "_")
    val stripped = regexp_replace(regexp_replace(cleaned, "^_+", ""), "_+$", "")
    when(length(stripped) > 0, stripped).otherwise(lit("case"))
  }

  private def existing(df: DataFrame, names: Seq[String]): Seq[String] = {
    val have = df.schema.fieldNames.toSet
    names.filter(have.contains)
  }

  private def asText(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case _: ArrayType =>
        // list of paragraphs/sentences → newline join, skipping nulls
        concat_ws("\n", filter(col(name).cast("array<string>"), x => x.isNotNull))
      case _ => col(name).cast("string")
    }

  /** Normalized binary label (run_iltur.py:540-575): bool/int pass through
    * when already 0/1; multi-hot or id-list → any-positive; common yes/no
    * strings; anything else null. */
  private def labelOf(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case BooleanType => col(name).cast("int")
      case IntegerType | LongType =>
        when(col(name).isin(0, 1), col(name).cast("int"))
      case ArrayType(et, _) =>
        val arr = col(name)
        et match {
          case IntegerType | LongType | BooleanType =>
            when(size(arr) === 0, lit(0))
              .otherwise(when(exists(arr, x => x.cast("int") =!= 0), lit(1)).otherwise(lit(0)))
          case _ =>
            when(size(arr) === 0, lit(0)).otherwise(lit(1))
        }
      case StringType =>
        val s = lower(trim(col(name)))
        when(s.isin("1", "true", "yes", "accepted", "allow", "allowed", "violation"), lit(1))
          .when(s.isin("0", "false", "no", "rejected", "dismiss", "dismissed", "no_violation"), lit(0))
      case _ => lit(null).cast("int")
    }

  /** Adapt an arbitrary corpus table to (case_id, text, label). Missing ids
    * fall back to jurisdiction_rownumber; missing text falls back through
    * fact/paragraph/sentence lists, then the whole record as JSON (the
    * reference's "better than crashing" last resort). */
  def adaptCases(df: DataFrame, jurisdiction: String = "in"): DataFrame = {
    val textCols = existing(df, TextCandidates).map(c => asText(df, c))
    val listCols = existing(df, ListTextCandidates).map(c => asText(df, c))
    val lastResort = to_json(struct(df.columns.map(col): _*))
    val text = coalesce((textCols ++ listCols :+ lastResort): _*)

    val idCols = existing(df, IdCandidates).map(c => col(c).cast("string"))
    val urlCols = existing(df, UrlCandidates).map(col)
    // AYM URL → trailing path segment as id
    val urlId = urlCols.headOption.map(u =>
      when(u.contains("anayasa.gov.tr"),
        element_at(split(regexp_replace(u, "/+$", ""), "/"), -1)))
    // last fallback: jurisdiction + content hash — deterministic and
    // shuffle-free, unlike the reference's enumerate index (a global row
    // number would serialize the scan on one task at corpus scale)
    val hashId = concat_ws("_", lit(jurisdiction), substring(sha2(text, 256), 1, 12))
    val rawId = coalesce((idCols ++ urlId.toSeq :+ hashId): _*)

    val labelCols = existing(df, LabelCandidates).map(c => labelOf(df, c))
    val label =
      if (labelCols.isEmpty) lit(null).cast("int") else coalesce(labelCols: _*)

    df.select(
      sanitizeCaseId(rawId).as("case_id"),
      text.as("text"),
      label.as("label"))
  }

  /** Adapted cases → the transcript input shape (one document turn per
    * case), ready for KgPipeline. */
  def asTranscripts(adapted: DataFrame): DataFrame =
    adapted.select(
      col("case_id").as("conv_id"),
      lit(0).as("turn_idx"),
      lit("document").as("role"),
      col("text"),
      lit(null).cast("string").as("tool"),
      lit(null).cast("timestamp").as("ts"))
}
