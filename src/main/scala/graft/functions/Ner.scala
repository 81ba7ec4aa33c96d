// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Rule-based PII recognizer + redactor: the engine-native stand-in for
  * the reference's Presidio pipeline (patient_notes/src/patient_notes/
  * stages/pseudonymisation/presidio.py:24-46). Presidio itself is
  * pattern+gazetteer+NLP based; this implementation keeps the pattern
  * and gazetteer recognizers (deterministic, dependency-free) and the
  * exact replacement contract: each detected span is replaced by its
  * entity label in angle brackets — "John Smith is in London" →
  * "<PERSON> is in <LOCATION>".
  *
  * Recognized entity types = PII_ENTITIES (config.py:34-41):
  * PERSON, LOCATION, DATE_TIME, EMAIL_ADDRESS, URL, PHONE_NUMBER.
  *
  * Nullability contract (presidio.py:24-35): null AND empty/blank input
  * both map to null (Python falsiness of "").
  *
  * The object is a per-executor singleton — the JVM analogue of the
  * reference's `sparkContext.broadcast(AnalyzerEngine())`: state ships
  * once per executor, not per row.
  */
object Ner extends Serializable {

  final case class Span(start: Int, end: Int, entity: String, score: Double)

  // -- pattern recognizers ------------------------------------------------

  private val email = Pattern.compile(
    """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b""")
  private val url = Pattern.compile(
    """\b(?:https?://|www\.)[^\s<>"]+""")
  private val phone = Pattern.compile(
    """(?<!\w)(?:\+?\d{1,3}[\s.-]?)?(?:\(\d{2,4}\)[\s.-]?)?\d{3,4}[\s.-]\d{3,4}(?:[\s.-]\d{2,4})?(?!\w)|(?<!\w)\+?\d{9,12}(?!\w)""")
  private val dateTime = Pattern.compile(
    """\b\d{4}-\d{2}-\d{2}(?:[T ]\d{2}:\d{2}(?::\d{2})?)?\b""" +
      """|\b\d{1,2}[/.]\d{1,2}[/.]\d{2,4}\b""" +
      """|\b(?:Mon|Tues?|Wednes|Thurs?|Fri|Satur|Sun)day\b""" +
      """|\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s+\d{4})?\b""" +
      """|\b\d{1,2}:\d{2}(?::\d{2})?\s?(?:am|pm|AM|PM)?\b""" +
      """|\b(?:today|tomorrow|yesterday|tonight)\b""" +
      """|\b(?:this|next|last)\s+(?:week|month|year|morning|afternoon|evening)\b""")

  // -- gazetteer recognizers ---------------------------------------------

  /** Common given names (public top-name lists). */
  private val givenNames: Set[String] = Set(
    "james", "john", "robert", "michael", "william", "david", "richard",
    "joseph", "thomas", "charles", "christopher", "daniel", "matthew",
    "anthony", "mark", "donald", "steven", "paul", "andrew", "joshua",
    "mary", "patricia", "jennifer", "linda", "elizabeth", "barbara",
    "susan", "jessica", "sarah", "karen", "nancy", "lisa", "margaret",
    "betty", "sandra", "ashley", "dorothy", "kimberly", "emily", "olivia",
    "emma", "sophia", "isabella", "mia", "charlotte", "amelia", "harper",
    "alice", "jack", "harry", "george", "oliver", "noah", "arthur",
    "oscar", "leo", "archie", "henry", "jacob", "ethan", "lucas", "amy",
    "claire", "grace", "hannah", "kate", "laura", "lucy", "rachel",
    "rebecca", "samantha", "victoria", "zoe", "adam", "alan", "brian",
    "carl", "dennis", "edward", "eric", "frank", "gary", "gregory",
    "jason", "jeffrey", "kenneth", "kevin", "larry", "nicholas", "peter",
    "raymond", "ronald", "ryan", "samuel", "scott", "stephen", "timothy")

  /** Major cities/countries (public lists). */
  private val places: Set[String] = Set(
    "london", "paris", "berlin", "madrid", "rome", "lisbon", "dublin",
    "amsterdam", "brussels", "vienna", "prague", "warsaw", "budapest",
    "athens", "stockholm", "oslo", "copenhagen", "helsinki", "moscow",
    "istanbul", "cairo", "lagos", "nairobi", "johannesburg", "sydney",
    "melbourne", "auckland", "tokyo", "osaka", "seoul", "beijing",
    "shanghai", "mumbai", "delhi", "bangkok", "singapore", "jakarta",
    "manila", "toronto", "vancouver", "montreal", "chicago", "boston",
    "seattle", "denver", "houston", "dallas", "austin", "phoenix",
    "miami", "atlanta", "manchester", "liverpool", "birmingham", "leeds",
    "glasgow", "edinburgh", "cardiff", "belfast", "bristol", "oxford",
    "cambridge", "england", "scotland", "wales", "ireland", "france",
    "germany", "spain", "italy", "portugal", "america", "canada",
    "australia", "japan", "china", "india", "brazil", "mexico")

  private val surnameSuffixes = Seq("son", "sen", "ez", "ov", "ova", "ski")
  private val commonSurnames: Set[String] = Set(
    "smith", "jones", "taylor", "brown", "williams", "wilson", "johnson",
    "davies", "robinson", "wright", "thompson", "evans", "walker",
    "white", "roberts", "green", "hall", "wood", "jackson", "clark",
    "garcia", "martinez", "rodriguez", "lopez", "gonzalez", "hernandez",
    "perez", "sanchez", "miller", "davis", "moore", "anderson", "lee",
    "king", "martin", "hill", "allen", "young", "scott", "adams",
    "baker", "nelson", "carter", "mitchell", "turner", "phillips",
    "campbell", "parker", "collins", "stewart", "murphy", "cook",
    "morgan", "bell", "bailey", "cooper", "richardson", "cox", "ward")

  private val capWord = Pattern.compile("""\b[A-Z][a-z]+\b""")

  /** Presidio-style analyze: return all recognized spans. */
  def analyze(text: String): Seq[Span] = {
    val spans = Seq.newBuilder[Span]
    def scan(p: Pattern, entity: String, score: Double): Unit = {
      val m = p.matcher(text)
      while (m.find()) spans += Span(m.start, m.end, entity, score)
    }
    scan(email, "EMAIL_ADDRESS", 1.0)
    scan(url, "URL", 0.9)
    scan(dateTime, "DATE_TIME", 0.85)
    scan(phone, "PHONE_NUMBER", 0.7)

    // gazetteer pass over capitalized words: PERSON (given name,
    // optionally followed by a capitalized surname) and LOCATION
    val m = capWord.matcher(text)
    var pending: Option[(Int, Int)] = None // (start, end) of a given name
    while (m.find()) {
      val w = text.substring(m.start, m.end).toLowerCase
      pending match {
        case Some((ps, pe)) if m.start == pe + 1 &&
            (commonSurnames.contains(w) || surnameSuffixes.exists(w.endsWith)
              || !places.contains(w)) =>
          // "Given Surname" — extend the person span over both words
          spans += Span(ps, m.end, "PERSON", 0.85)
          pending = None
        case _ =>
          pending = None
          if (places.contains(w)) {
            spans += Span(m.start, m.end, "LOCATION", 0.8)
          } else if (givenNames.contains(w)) {
            pending = Some((m.start, m.end))
            spans += Span(m.start, m.end, "PERSON", 0.6) // lone given name
          } else if (commonSurnames.contains(w)) {
            spans += Span(m.start, m.end, "PERSON", 0.5)
          }
      }
    }
    spans.result()
  }

  /** Presidio-style anonymize: replace each winning span with its
    * entity label. Overlaps resolve to the higher score, longer span,
    * earlier start (Presidio's effective precedence).
    */
  def anonymise(text: String): String = {
    if (text == null || text.isEmpty) return null
    val ranked = analyze(text)
      .sortBy(s => (-s.score, -(s.end - s.start), s.start))
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Span]
    ranked.foreach { s =>
      if (!chosen.exists(c => s.start < c.end && c.start < s.end)) chosen += s
    }
    val sb = new StringBuilder(text)
    chosen.sortBy(-_.start).foreach { s =>
      sb.replace(s.start, s.end, s"<${s.entity}>")
    }
    sb.toString
  }

  /** The injectable Column→Column transform (presidio.py:37-46). */
  val anonymiseUdf: Column => Column = {
    val u = udf((text: String) => Option(anonymise(text)))
    (c: Column) => u(c)
  }
}
