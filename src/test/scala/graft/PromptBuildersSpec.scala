package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.kg.query.PromptBuilders
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** PromptBuilders vs the PUBLISHED eval_graph_vs_raw.py / eval_ablation.py,
  * string-exact on 40 published graphs + pure-function probes
  * (scripts/gen_prompts_fixture.py). */
class PromptBuildersSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val fx = mapper.readTree(
    getClass.getResourceAsStream("/graft/prompts_fixture.json"))

  test("blinded graph summaries + prompts are string-exact (40 graphs, both modes)") {
    assume(new java.io.File("/root/reference/iltur_graphs").isDirectory)
    var n = 0
    for (c <- fx.path("cases").elements().asScala) {
      val cid = c.path("case_id").asText()
      val g = mapper.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/iltur_graphs/$cid.json")))
      assert(PromptBuilders.blindedGraphSummary(g, noScrub = false) ==
        c.path("summary_scrub").asText(), s"$cid scrub")
      assert(PromptBuilders.blindedGraphSummary(g, noScrub = true) ==
        c.path("summary_noscrub").asText(), s"$cid noscrub")
      assert(PromptBuilders.graphPrompt(g, noScrub = true) ==
        c.path("graph_prompt_noscrub").asText(), s"$cid prompt")
      assert(PromptBuilders.flatPrompt(g) == c.path("flat_prompt").asText(), s"$cid flat")
      assert(PromptBuilders.typedPrompt(g) == c.path("typed_prompt").asText(), s"$cid typed")
      assert(PromptBuilders.compactGraphSummary(g) ==
        c.path("compact_full").asText(), s"$cid compact")
      assert(PromptBuilders.compactGraphSummary(g, blind = true) ==
        c.path("compact_blind").asText(), s"$cid compact blind")
      assert(PromptBuilders.compactGraphSummary(g, hideOutcome = true) ==
        c.path("compact_behavior").asText(), s"$cid compact behavior")
      n += 1
    }
    assert(n == 40)
  }

  test("blinded STRUCTURED-case summaries + prompt are string-exact (30 cases)") {
    assume(new java.io.File("/root/reference/structured-nongraph-cases").isDirectory)
    var n = 0
    for (c <- fx.path("structured").elements().asScala) {
      val cid = c.path("case_id").asText()
      val d = mapper.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/structured-nongraph-cases/$cid.json")))
      assert(PromptBuilders.blindedStructuredSummary(d, noScrub = false) ==
        c.path("summary_scrub").asText(), s"$cid scrub")
      assert(PromptBuilders.blindedStructuredSummary(d, noScrub = true) ==
        c.path("summary_noscrub").asText(), s"$cid noscrub")
      assert(PromptBuilders.structuredPrompt(d, noScrub = false) ==
        c.path("prompt_scrub").asText(), s"$cid prompt")
      n += 1
    }
    assert(n == 30)
  }

  test("raw-text blinding is string-exact on all probe branches") {
    for (p <- fx.path("blind_raw").elements().asScala) {
      assert(PromptBuilders.blindRawText(p.path("text").asText()) ==
        p.path("blinded").asText())
    }
  }

  test("fact scrubbing incl. the first-100 fallback is string-exact") {
    for (p <- fx.path("scrub").elements().asScala) {
      assert(PromptBuilders.scrubFactText(p.path("text").asText()) ==
        p.path("scrubbed").asText())
    }
  }

  test("blinding sanity check warnings are string-exact") {
    for (p <- fx.path("sanity").elements().asScala) {
      val exp = p.path("warnings").elements().asScala.map(_.asText()).toSeq
      assert(PromptBuilders.blindingSanityCheck(p.path("text").asText(), "L", "C") == exp)
    }
  }
}
