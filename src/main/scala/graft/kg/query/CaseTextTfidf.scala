package graft.kg.query

/** The text channel of CaseRetrieval's combined similarity — sklearn
  * TfidfVectorizer's documented pipeline (the reference constructs it with
  * max_features=5000, stop_words="english", ngram_range=(1,2), min_df=2,
  * sublinear_tf=True, eval_concept_retrieval.py:374-396, then pairwise
  * cosine):
  *
  *  1. tokenize lowercased text with `(?u)\b\w\w+\b` (2+ word chars);
  *  2. drop stop words, THEN build 1-2-grams over the surviving sequence
  *     (bigrams join the filtered neighbors with a space, like sklearn);
  *  3. drop terms with document frequency < minDf;
  *  4. keep the top `maxFeatures` terms by TOTAL corpus count, ties to the
  *     alphabetically first (sklearn sorts its vocabulary, then stable-sorts
  *     by descending count);
  *  5. weight = (1 + ln tf) · (ln((1+n)/(1+df)) + 1), l2-normalized;
  *  6. similarity = sparse dot product of the normalized vectors.
  *
  * sklearn itself is not in this container, so its frozen English stop list
  * is a caller-supplied parameter; the formula above is the operator. The
  * corpus here is bounded (one vector per CASE, not per turn) so the build
  * is driver-side; the corpus-scale term-statistics variant of the same
  * weighting lives in Retrieval.buildTfidfIndex (oracle-checked by q25).
  */
object CaseTextTfidf {

  private val TokenRe = java.util.regex.Pattern.compile(
    "\\b\\w\\w+\\b",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def tokenize(text: String): Vector[String] = {
    val m = TokenRe.matcher(text.toLowerCase)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group(0)
    out.result()
  }

  /** Terms of one document after stop filtering + 1..nMax grams. */
  def terms(text: String, stopWords: Set[String], nMax: Int = 2): Vector[String] = {
    val toks = tokenize(text).filterNot(stopWords.contains)
    val out = Vector.newBuilder[String]
    out ++= toks
    var n = 2
    while (n <= nMax) {
      var i = 0
      while (i + n <= toks.length) { out += toks.slice(i, i + n).mkString(" "); i += 1 }
      n += 1
    }
    out.result()
  }

  final class Index private[CaseTextTfidf] (
      ids: Vector[String], vectors: Vector[Map[String, Double]]) {
    private val byId = ids.zipWithIndex.toMap
    val vocabularySize: Int = vectors.iterator.flatMap(_.keysIterator).toSet.size

    /** Cosine similarity of two cases' l2-normalized vectors (0 for unknown
      * ids, like the reference's idx.get miss). */
    def similarity(a: String, b: String): Double =
      (byId.get(a), byId.get(b)) match {
        case (Some(i), Some(j)) =>
          val (small, large) =
            if (vectors(i).size <= vectors(j).size) (vectors(i), vectors(j))
            else (vectors(j), vectors(i))
          small.iterator.map { case (t, w) => w * large.getOrElse(t, 0.0) }.sum
        case _ => 0.0
      }
  }

  /** Build the per-case tf-idf index over (caseId, text). */
  def build(texts: Seq[(String, String)], stopWords: Set[String],
            maxFeatures: Int = 5000, minDf: Int = 2, nMax: Int = 2,
            sublinearTf: Boolean = true): Index = {
    val n = texts.size
    // sklearn feeds "empty" for blank docs so every case keeps a row
    val docTerms = texts.map { case (_, t) =>
      val tt = if (t.trim.isEmpty) "empty" else t
      terms(tt, stopWords, nMax)
    }
    val counts: Seq[Map[String, Int]] =
      docTerms.map(_.groupBy(identity).map { case (t, xs) => t -> xs.size })
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    val totalTf = scala.collection.mutable.HashMap.empty[String, Long]
    for (c <- counts; (t, k) <- c) {
      df(t) = df.getOrElse(t, 0) + 1
      totalTf(t) = totalTf.getOrElse(t, 0L) + k
    }
    val afterDf = df.keysIterator.filter(t => df(t) >= minDf).toVector
    val vocab: Set[String] =
      if (afterDf.size <= maxFeatures) afterDf.toSet
      else afterDf.sorted.sortBy(t => -totalTf(t)).take(maxFeatures).toSet
    val idf = vocab.iterator.map(t =>
      t -> (math.log((1.0 + n) / (1.0 + df(t))) + 1.0)).toMap
    val vectors = counts.map { c =>
      val w = c.collect { case (t, k) if vocab.contains(t) =>
        t -> (if (sublinearTf) 1.0 + math.log(k.toDouble) else k.toDouble) * idf(t)
      }
      val norm = math.sqrt(w.valuesIterator.map(x => x * x).sum)
      if (norm == 0) Map.empty[String, Double]
      else w.map { case (t, x) => t -> x / norm }
    }.toVector
    new Index(texts.map(_._1).toVector, vectors)
  }

  /** Text-similarity function over profiles for
    * [[CaseRetrieval.combinedSimilarity]] (use_full_text selects
    * full_case_text vs concept_text, :383-389). */
  def textSim(profiles: Seq[CaseRetrieval.Profile], stopWords: Set[String],
              useFullText: Boolean = true, maxFeatures: Int = 5000): (String, String) => Double = {
    val idx = build(
      profiles.map(p => p.caseId -> (if (useFullText) p.fullCaseText else p.conceptText)),
      stopWords, maxFeatures)
    (a, b) => idx.similarity(a, b)
  }
}
