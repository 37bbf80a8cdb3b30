package graft.kg.gen

import graft.kg.model.Turn
import java.sql.Timestamp

/** Deterministic synthetic transcript generator.
  *
  * Produces multi-turn conversations shaped like the BASELINE.json
  * `input_hint` table (conv_id, turn_idx, role, text, tool, ts), whose turn
  * texts are templated legal-discussion fragments planting work for every
  * extractor rule: event-cue facts, "whether" issues, submission-cue
  * arguments, citation strings per the reference citation grammar, signal
  * phrases from the pattern grammar, ontology key phrases, holding markers and
  * disposition sentences. All choices are hash-derived from (convId, slot) —
  * no RNG state, so any subset of conversations regenerates identically.
  */
object TranscriptGen {

  /** Stable 64-bit FNV-1a hash — the only "randomness" source. */
  private def fnv(parts: String*): Long = {
    var h = 0xcbf29ce484222325L
    var pi = 0
    while (pi < parts.length) {
      val p = parts(pi)
      var i = 0
      while (i < p.length) { h ^= p.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      pi += 1
    }
    h & Long.MaxValue
  }
  private def pick[A](xs: IndexedSeq[A], convId: String, slot: String): A =
    xs((fnv(convId, slot) % xs.length).toInt)

  private val Parties = Vector(
    ("Ram Kumar", "State of Punjab"), ("Sunita Devi", "Union of India"),
    ("Mohan Lal", "State of Kerala"), ("Gopal Das", "Municipal Corporation of Delhi"),
    ("Radha Krishnan", "State of Tamil Nadu"), ("Vijay Singh", "State of Rajasthan"))

  private val FactTemplates = Vector(
    "The petitioner %s was served with a show-cause notice and the disciplinary authority passed an order terminating his services on 12.03.%d.",
    "The appellant %s filed a writ petition after the authority rejected the application for renewal of the licence in %d.",
    "An FIR was lodged against the accused %s and he was arrested on 05.07.%d without any warrant being issued.",
    "The respondent issued a notification acquiring the land of %s in %d, and compensation was awarded at the circle rate.",
    "The petitioner %s was dismissed from service without being granted any opportunity of hearing in %d.",
    "The tender submitted by %s was rejected and the contract was awarded to a rival bidder in %d.")

  private val NegFacts = Vector(
    "No notice was served upon the petitioner and no enquiry was conducted before the order was passed.",
    "The authority failed to supply the enquiry report and denied inspection of the records.",
    "The order was passed without recording any reasons and without hearing the affected party.")

  private val IssueTemplates = Vector(
    "The question is whether the impugned order violates the principles of natural justice.",
    "The issue that arises is whether the classification satisfies the twin test of intelligible differentia and rational nexus.",
    "The matter falls for consideration whether the restriction pursues a legitimate aim and employs the least restrictive means.",
    "The point for determination is whether the amendment would destroy identity of Constitution.")

  private val ArgTemplates = Vector(
    "The petitioner contends that the order was passed without affording a fair opportunity to answer the allegations.",
    "The respondent submits that the procedure followed was just, fair and reasonable in the circumstances.",
    "Learned counsel for the appellant argues that the action is manifestly arbitrary and without determining principle.",
    "The State urged that the measure bears a rational nexus to the object sought to be achieved.",
    "The prosecution asserts that the confession was recorded in accordance with law and is admissible.")

  private val CitationPool = Vector(
    ("Maneka Gandhi v. Union of India", "AIR 1978 SC 597"),
    ("Kesavananda Bharati v. State of Kerala", "AIR 1973 SC 1461"),
    ("A.K. Kraipak v. Union of India", "AIR 1970 SC 150"),
    ("E.P. Royappa v. State of Tamil Nadu", "AIR 1974 SC 555"),
    ("Olga Tellis v. Bombay Municipal Corporation", "AIR 1986 SC 180"),
    ("Shayara Bano v. Union of India", "(2017) 9 SCC 1"),
    ("K.S. Puttaswamy v. Union of India", "(2017) 10 SCC 1"),
    ("Modern Dental College v. State of Madhya Pradesh", "(2016) 7 SCC 353"))

  private val PrecedentTemplates = Vector(
    "As held in %s, %s, the rules of natural justice operate in areas not covered by any law validly made.",
    "Following the ratio in %s, %s, the procedure established by law must be just, fair and reasonable.",
    "The facts in the present case are distinguishable from %s, %s, which turned on the language of the statute.",
    "The true ratio of that decision is explained in %s, %s, and it governs administrative action generally.")

  private val HoldingTemplates = Vector(
    "We hold that the impugned order cannot be sustained as it was passed in violation of the principles of natural justice.",
    "We are of the considered view that the classification fails the test of intelligible differentia and is manifestly arbitrary.",
    "We accordingly hold that the restriction does not satisfy the requirement of proportionality and must be struck down.",
    "It must therefore be held that the dismissal order is vitiated for denial of a fair opportunity of hearing.")

  private val OutcomeTemplates = Vector(
    "In the result, the appeal is accordingly allowed and the impugned order is set aside.",
    "For the foregoing reasons, the writ petition is allowed.",
    "The appeal is dismissed. The judgment of the High Court is affirmed.",
    "The petition is partly allowed to the extent indicated above.")

  /** Generate the turns of one conversation. Turn count scales with `turnsPerConv`. */
  def conversation(convId: String, turnsPerConv: Int): Seq[Turn] = {
    val (pet, resp) = pick(Parties, convId, "parties")
    val year = 1990 + (fnv(convId, "year") % 30).toInt
    val baseTs = 1600000000000L + (fnv(convId, "ts") % 100000000L)

    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    body += s"This matter concerns a dispute between $pet and $resp arising in $year."
    var k = 0
    while (body.length < turnsPerConv - 4) {
      val slot = s"b$k"
      (fnv(convId, slot) % 5) match {
        case 0 => body += FactTemplates((fnv(convId, slot + "f") % FactTemplates.length).toInt
          ).format(pet, year)
        case 1 => body += NegFacts((fnv(convId, slot + "n") % NegFacts.length).toInt)
        case 2 => body += IssueTemplates((fnv(convId, slot + "i") % IssueTemplates.length).toInt)
        case 3 => body += ArgTemplates((fnv(convId, slot + "a") % ArgTemplates.length).toInt)
        case 4 =>
          val (cn, cit) = CitationPool((fnv(convId, slot + "c") % CitationPool.length).toInt)
          body += PrecedentTemplates((fnv(convId, slot + "p") % PrecedentTemplates.length).toInt
            ).format(cn, cit)
      }
      k += 1
    }
    body += IssueTemplates((fnv(convId, "issue") % IssueTemplates.length).toInt)
    body += HoldingTemplates((fnv(convId, "holding") % HoldingTemplates.length).toInt)
    body += OutcomeTemplates((fnv(convId, "outcome") % OutcomeTemplates.length).toInt)

    body.zipWithIndex.map { case (text, idx) =>
      val role = if (idx % 2 == 0) "user" else "assistant"
      val tool = if (fnv(convId, s"tool$idx") % 7 == 0) "search" else null
      Turn(convId, idx, role, text, tool, new Timestamp(baseTs + idx * 60000L))
    }.toSeq
  }

  /** Generate turns for `nConvs` conversations with ~`turnsPerConv` turns each. */
  def turns(nConvs: Int, turnsPerConv: Int): Seq[Turn] =
    (0 until nConvs).flatMap(i => conversation(f"conv_$i%06d", turnsPerConv))
}
