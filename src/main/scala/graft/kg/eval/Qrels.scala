package graft.kg.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance-judgment (qrels) construction by regex-matching concepts in raw
  * text — the reference's independent ground-truth route
  * (build_regex_qrels + _concept_id_to_patterns, eval_retrieval_v2.py:345-643):
  * a document is relevant to a concept query iff any generated pattern
  * matches its raw text. Pattern generation is a faithful port of the four
  * strategies (statute prefix+number with act-alias qualification, doctrine
  * keywords, label phrases, multi-word fallback).
  */
object Qrels {

  /** Statute prefix regexes (eval_retrieval_v2.py:345-351). */
  val PrefixMap: Map[String, String] = Map(
    "article" -> "(?:Article|Art\\.?)\\s*",
    "section" -> "(?:Section|Sec\\.?|S\\.?)\\s*",
    "rule" -> "(?:Rule)\\s*",
    "order" -> "(?:Order)\\s*",
    "clause" -> "(?:Clause|Cl\\.?)\\s*")

  /** Act-name aliases (eval_retrieval_v2.py:353-388). */
  val ActAliases: Map[String, List[String]] = Map(
    "ipc" -> List("I\\.?P\\.?C\\.?", "Indian\\s+Penal\\s+Code"),
    "indian_penal_code" -> List("I\\.?P\\.?C\\.?", "Indian\\s+Penal\\s+Code"),
    "crpc" -> List("Cr\\.?P\\.?C\\.?", "Code\\s+of\\s+Criminal\\s+Procedure"),
    "code_criminal_procedure" -> List("Cr\\.?P\\.?C\\.?", "Code\\s+of\\s+Criminal\\s+Procedure"),
    "cpc" -> List("C\\.?P\\.?C\\.?", "Code\\s+of\\s+Civil\\s+Procedure"),
    "code_civil_procedure" -> List("C\\.?P\\.?C\\.?", "Code\\s+of\\s+Civil\\s+Procedure"),
    "constitution" -> List("Constitution", "Constitution\\s+of\\s+India"),
    "constitution_india" -> List("Constitution", "Constitution\\s+of\\s+India"),
    "evidence_act" -> List("Evidence\\s+Act", "Indian\\s+Evidence\\s+Act"),
    "bns" -> List("B\\.?N\\.?S\\.?", "Bharatiya\\s+Nyaya\\s+Sanhita"),
    "bnss" -> List("B\\.?N\\.?S\\.?S\\.?", "Bharatiya\\s+Nagarik\\s+Suraksha\\s+Sanhita"),
    "ida" -> List("I\\.?D\\.?\\s*Act", "Industrial\\s+Disputes\\s+Act"),
    "industrial_disputes_act" -> List("I\\.?D\\.?\\s*Act", "Industrial\\s+Disputes\\s+Act"),
    "it_act" -> List("I\\.?T\\.?\\s*Act", "Information\\s+Technology\\s+Act", "Income[\\s-]?Tax\\s+Act"),
    "ndps" -> List("N\\.?D\\.?P\\.?S\\.?", "Narcotic\\s+Drugs"),
    "ndps_act" -> List("N\\.?D\\.?P\\.?S\\.?", "Narcotic\\s+Drugs"),
    "mv_act" -> List("M\\.?V\\.?\\s*Act", "Motor\\s+Vehicles?\\s+Act"),
    "posh" -> List("POSH", "Sexual\\s+Harassment"),
    "sarfaesi" -> List("SARFAESI", "Securitisation"),
    "rera" -> List("RERA", "Real\\s+Estate"),
    "arms_act" -> List("Arms\\s+Act"),
    "sc_st_act" -> List("SC/?ST", "Scheduled\\s+Castes?\\s+and\\s+Scheduled\\s+Tribes?"),
    "pocso" -> List("POCSO", "Protection\\s+of\\s+Children"),
    "tada" -> List("TADA", "Terrorist.*?Disruptive"),
    "pota" -> List("POTA", "Prevention\\s+of\\s+Terrorism"),
    "uapa" -> List("UAPA", "Unlawful\\s+Activities"),
    "nia" -> List("N\\.?I\\.?A\\.?\\s*Act", "National\\s+Investigation\\s+Agency"),
    "ni_act" -> List("N\\.?I\\.?\\s*Act", "Negotiable\\s+Instruments?\\s+Act"),
    "transfer_property" -> List("T\\.?P\\.?\\s*Act", "Transfer\\s+of\\s+Property"),
    "arbitration" -> List("Arbitration.*?Conciliation\\s+Act", "Arbitration\\s+Act"),
    "hindu_marriage" -> List("Hindu\\s+Marriage\\s+Act", "H\\.?M\\.?A\\.?"),
    "companies_act" -> List("Companies\\s+Act"),
    "consumer_protection" -> List("Consumer\\s+Protection\\s+Act"),
    "land_acquisition" -> List("Land\\s+Acquisition\\s+Act"))

  /** Doctrine keyword patterns IN DEFINITION ORDER — multiple keys can match
    * one id and append in this order (eval_retrieval_v2.py:390-465). */
  val DoctrineKeywords: List[(String, String)] = List(
    "wednesbury" -> "Wednesbury",
    "basic_structure" -> "basic structure",
    "maneka_gandhi" -> "Maneka Gandhi",
    "rarest_of_rare" -> "rarest of (?:the )?rare",
    "reasonable_classification" -> "reasonable classification",
    "natural_justice" -> "natural justice",
    "res_judicata" -> "res judicata",
    "stare_decisis" -> "stare decisis",
    "proportionality" -> "proportionality",
    "legitimate_expectation" -> "legitimate expectation",
    "promissory_estoppel" -> "promissory estoppel",
    "due_process" -> "due process",
    "right_to_life" -> "right to life",
    "right_to_privacy" -> "right to privacy",
    "right_to_livelihood" -> "right to livelihood",
    "free_speech" -> "free(?:dom of)? speech",
    "double_jeopardy" -> "double jeopardy",
    "habeas_corpus" -> "habeas corpus",
    "eminent_domain" -> "eminent domain",
    "adverse_possession" -> "adverse possession",
    "specific_performance" -> "specific performance",
    "anticipatory_bail" -> "anticipatory bail",
    "dying_declaration" -> "dying declaration",
    "dowry_death" -> "dowry death",
    "cruelty" -> "cruelty",
    "murder" -> "\\bmurder\\b",
    "culpable_homicide" -> "culpable homicide",
    "cheating" -> "\\bcheating\\b",
    "defamation" -> "defamation",
    "kidnapping" -> "kidnapping",
    "robbery" -> "\\brobbery\\b",
    "dacoity" -> "dacoity",
    "forgery" -> "\\bforgery\\b",
    "writ" -> "\\bwrit\\b",
    "common_intention" -> "common intention",
    "common_object" -> "common object",
    "abetment" -> "\\babetment\\b",
    "criminal_conspiracy" -> "criminal conspiracy",
    "attempt_to_murder" -> "attempt to (?:commit )?murder",
    "hurt" -> "\\bgrevious hurt\\b|\\bhurt\\b",
    "negligence" -> "\\bnegligence\\b",
    "strict_liability" -> "strict liability",
    "vicarious_liability" -> "vicarious liability",
    "ultra_vires" -> "ultra vires",
    "locus_standi" -> "locus standi",
    "certiorari" -> "\\bcertiorari\\b",
    "mandamus" -> "\\bmandamus\\b",
    "prohibition" -> "\\bprohibition\\b",
    "quo_warranto" -> "quo warranto",
    "judicial_review" -> "judicial review",
    "separation_of_powers" -> "separation of powers",
    "pith_and_substance" -> "pith and substance",
    "colourable_legislation" -> "colourable legislation",
    "doctrine_of_eclipse" -> "doctrine of eclipse",
    "doctrine_of_severability" -> "doctrine of severability",
    "bail" -> "\\bbail\\b",
    "quashing" -> "\\bquashing\\b",
    "discharge" -> "\\bdischarge\\b",
    "acquittal" -> "\\bacquittal\\b",
    "compensation" -> "\\bcompensation\\b",
    "restitution" -> "\\brestitution\\b",
    "injunction" -> "\\binjunction\\b",
    "stay" -> "\\bstay\\b",
    "arbitration" -> "\\barbitration\\b",
    "mediation" -> "\\bmediation\\b",
    "harmonious_construction" -> "harmonious construction",
    "rational_nexus" -> "rational nexus",
    "criminal_breach_trust" -> "criminal breach of trust",
    "criminal_breach" -> "criminal breach",
    "breach_of_trust" -> "breach of trust",
    "mischief" -> "\\bmischief\\b",
    "trespass" -> "\\btrespass\\b",
    "extortion" -> "\\bextortion\\b",
    "misappropriation" -> "\\bmisappropriation\\b")

  private val LinkStops = Set("of", "the", "and", "to", "for", "in", "under")

  /** Python re.escape semantics: backslash-escape everything outside
    * [a-zA-Z0-9_] (Pattern.quote's \Q..\E form would diverge textually). */
  private def reEscape(s: String): String =
    s.flatMap(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c.toString else "\\" + c)
  private val NumRe = "^\\d+[a-z]?$".r
  private val BareNumRe = "^\\d+$".r
  private val SecShortRe = "^(s|sec)(\\d+[a-z]?)$".r
  private val ArtShortRe = "^(art)(\\d+[a-z]?)$".r
  private val CombinedRe = "^(article|section|rule|order|clause)(\\d+[a-z]?)$".r

  /** Generate regex patterns for matching a concept in raw text
    * (_concept_id_to_patterns, eval_retrieval_v2.py:468-592). */
  def conceptIdToPatterns(conceptId: String, label: String = null): List[String] = {
    var raw = conceptId
    for (p <- List("UNLISTED_", "CONCEPT_", "DOCTRINE_", "TEST_")
         if raw == conceptId && raw.startsWith(p)) raw = raw.substring(p.length)

    var tokens = raw.toLowerCase.split("_").toList.filter(_.nonEmpty)
    tokens = tokens.flatMap {
      case SecShortRe(_, num) => List("section", num)
      case ArtShortRe(_, num) => List("article", num)
      case t => List(t)
    }
    tokens = tokens.map(t => if (t == "const") "constitution" else t)

    val patterns = scala.collection.mutable.ListBuffer.empty[String]

    // Strategy 1: statute prefix + number (+ optional act qualification)
    var prefixType: String = null
    var number: String = null
    var actTokens: List[String] = Nil
    var i = 0
    var done = false
    while (i < tokens.length && !done) {
      val tok = tokens(i)
      if (PrefixMap.contains(tok) && prefixType == null) {
        prefixType = tok
        var j = i + 1
        var found = false
        while (j < tokens.length && !found) {
          if (NumRe.findFirstIn(tokens(j)).isDefined) {
            number = tokens(j)
            val ji = j
            actTokens = tokens.zipWithIndex.collect {
              case (t, k) if k != i && k != ji && !LinkStops.contains(t) => t
            }
            found = true
          }
          j += 1
        }
        done = true
      } else {
        tok match {
          case CombinedRe(pk, num) if PrefixMap.contains(pk) =>
            prefixType = pk
            number = num
            val ii = i
            actTokens = tokens.zipWithIndex.collect {
              case (t, k) if k != ii && !LinkStops.contains(t) => t
            }
            done = true
          case _ =>
        }
      }
      i += 1
    }
    if (prefixType == null) {
      var k = 0
      var found = false
      while (k < tokens.length && !found) {
        if (NumRe.findFirstIn(tokens(k)).isDefined) {
          val ki = k
          val remaining = tokens.zipWithIndex.collect {
            case (t, j) if j != ki && !LinkStops.contains(t) => t
          }
          if (ActAliases.contains(remaining.mkString("_"))) {
            prefixType = "section"
            number = tokens(k)
            actTokens = remaining
            found = true
          }
        }
        k += 1
      }
    }
    if (prefixType != null && number != null) {
      val prefixRe = PrefixMap(prefixType)
      val subsection = actTokens.find(t =>
        BareNumRe.findFirstIn(t).isDefined && t != number)
      subsection.foreach(s => actTokens = actTokens.filterNot(_ == s))
      val actStr = actTokens.mkString("_")
      patterns += s"$prefixRe$number\\b"
      subsection.foreach(s => patterns += s"$prefixRe$number\\s*\\($s\\)")
      for (aliases <- ActAliases.get(actStr); alias <- aliases) {
        patterns += s"$prefixRe$number\\b.{0,30}$alias"
        patterns += s"\\b$number\\s+$alias"
        subsection.foreach(s => patterns += s"$prefixRe$number\\s*\\($s\\).{0,30}$alias")
      }
    }

    // Strategy 2: doctrine keywords (all matches, definition order)
    val rawLower = raw.toLowerCase
    for ((key, kw) <- DoctrineKeywords if rawLower.contains(key)) patterns += kw

    // Strategy 3: label phrase
    if (label != null && label.length > 4) {
      val stops = Set("the", "and", "for", "with", "from", "under", "that",
        "this", "have", "been", "case", "court", "section", "article", "act")
      val words = label.split("\\s+").toList
        .filter(w => w.length > 3 && !stops.contains(w.toLowerCase))
      if (words.length >= 2)
        patterns += words.take(3).map(reEscape).mkString("\\s+")
    }

    // Strategy 4: fallback multi-word phrase
    if (patterns.isEmpty) {
      val clean = tokens.filter(t => t.length > 2 &&
        !Set("the", "and", "for", "with", "from", "under").contains(t))
      if (clean.length >= 2)
        patterns += clean.take(3).map(reEscape).mkString("\\s+")
      else if (clean.length == 1 && clean.head.length > 5)
        patterns += "\\b" + reEscape(clean.head) + "\\b"
    }

    patterns.toList
  }

  private val SimpleStatuteRe = "(?i)^([a-z]+)\\s+(\\d+[a-z]?)$".r

  /** Expand a concept's patterns with the ontology's statute-renumbering
    * table (statute_mappings: IPC→BNS, CrPC→BNSS, IEA→BSA): a query for the
    * old section also matches text citing its successor, and vice versa.
    * Only simple "CODE NUM" mappings expand; ranges/repeals are skipped. */
  def patternsWithStatuteEquivalents(
      conceptId: String, label: String,
      mappings: List[graft.kg.ontology.StatuteMapping]): List[String] = {
    val base = conceptIdToPatterns(conceptId, label)
    val idLower = conceptId.toLowerCase
    val extra = mappings.flatMap { m =>
      def parse(s: String): Option[(String, String)] = Option(s).flatMap {
        case SimpleStatuteRe(code, num) => Some((code.toLowerCase, num.toLowerCase))
        case _ => None
      }
      def mentions(code: String, num: String): Boolean =
        idLower.contains(code) && idLower.contains(num)
      def pseudoId(code: String, num: String): String =
        s"UNLISTED_${code.toUpperCase}_S${num.toUpperCase}"
      (parse(m.old), parse(m.nw)) match {
        case (Some((oc, on)), Some((nc, nn))) =>
          if (mentions(oc, on)) conceptIdToPatterns(pseudoId(nc, nn))
          else if (mentions(nc, nn)) conceptIdToPatterns(pseudoId(oc, on))
          else Nil
        case _ => Nil
      }
    }
    (base ++ extra).distinct
  }

  private val RelevanceGrade = Map(
    "central" -> 4, "supporting" -> 3, "mentioned" -> 1, "obiter" -> 1)

  /** Annotation-mode qrels (build_annotation_qrels,
    * eval_retrieval_v2.py:234-303): graded relevance from extracted concept
    * annotations. Per (conv, concept) grade = max relevance grade; query
    * concepts are those with 3 ≤ df ≤ 25% of the corpus, top-n by df
    * descending (ties broken by concept id for determinism — the reference's
    * Python sort is stable on its dict order, which has no distributed
    * analog); query text = the cleaned concept id (this engine's rule
    * extractor emits listed-ontology concepts, for which the reference also
    * falls back to the cleaned id). Returns (queries, qrels) DataFrames. */
  def annotationQrels(nodes: DataFrame, nQueries: Int = 50): (DataFrame, DataFrame) = {
    val grades = nodes
      .filter(col("nodeType") === "concept" && col("conceptId").isNotNull)
      .select(col("convId").as("doc_id"), col("conceptId").as("query_id"),
        coalesce(element_at(typedLit(RelevanceGrade), col("relevance")), lit(1)).as("rel"))
      .groupBy(col("doc_id"), col("query_id")).agg(max(col("rel")).as("rel"))
    val nCorpus = nodes.select(col("convId")).distinct().count()
    val maxDf = (nCorpus * 0.25).toLong
    val top = grades.groupBy(col("query_id")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3 && col("df") <= maxDf)
      .orderBy(col("df").desc, col("query_id").asc)
      .limit(nQueries)
    val queries = top.select(col("query_id"),
      regexp_replace(regexp_replace(col("query_id"), lit("^UNLISTED_"), lit("")),
        lit("_"), lit(" ")).as("query_text"))
    val qrels = grades.join(broadcast(top.select(col("query_id"))), "query_id")
      .select(col("query_id"), col("doc_id"), col("rel"))
    (queries, qrels)
  }

  /** Build binary qrels as a DataFrame (query_cid, doc_id, rel=1): a doc is
    * relevant iff any pattern for the concept matches its raw text
    * (case-insensitive), evaluated as ONE distributed regexp pass per corpus
    * scan — queries broadcast, never collected documents. */
  def buildRegexQrels(
      docs: DataFrame, idCol: String, textCol: String,
      queryConcepts: Seq[(String, String)] /* (conceptId, label-or-null) */): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = queryConcepts.map { case (cid, label) =>
      val ps = conceptIdToPatterns(cid, label)
      (cid, if (ps.isEmpty) null else ps.map(p => s"(?:$p)").mkString("(?i)", "|", ""))
    }.toDF("query_cid", "pattern")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("raw_text"))
      .crossJoin(broadcast(pats))
      .filter(col("pattern").isNotNull &&
        regexp_like(col("raw_text"), col("pattern")))
      .select(col("query_cid").as("query_id"), col("doc_id"), lit(1).as("rel"))
  }
}
