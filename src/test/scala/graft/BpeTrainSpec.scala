package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Gate for the (non-SQL-expressible) BPE merge trainer: an independent
  * scalar replay of the subword-nmt algorithm — word-frequency table,
  * weighted adjacent-pair counts, lexicographic tie-break, greedy
  * leftmost-non-overlapping merge — compared rule-for-rule against the
  * distributed operator on crafted corpora.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar reference BPE (Sennrich et al. 2016). */
  private def replay(text: String, nMerges: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = text.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toVector -> ws.length.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0L
    var done = false
    while (r < nMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      val best = pairs.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          r += 1
          out += ((r, a, b, c))
          words = words.groupBy { case (syms, _) =>
            val acc = scala.collection.mutable.ArrayBuffer(syms.head)
            syms.tail.foreach { x =>
              if (acc.last == a && x == b) acc(acc.length - 1) = a + b
              else acc += x
            }
            acc.toVector
          }.map { case (k, m) => k -> m.values.sum }
        case _ => done = true
      }
    }
    out.toSeq
  }

  private def run(text: String, nMerges: Int): Seq[(Long, String, String, Long)] = {
    val df = Seq(Tuple1(text)).toDF("text")
    TextAnalysis.learnBpeMerges(df, "text", nMerges).orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("learnBpeMerges matches the scalar subword-nmt replay on the classic corpus") {
    // Sennrich's example frequencies: low:5 lower:2 newest:6 widest:3
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = run(corpus, 6)
    val want = replay(corpus, 6)
    assert(got == want, s"got $got\nwant $want")
    // the canonical first merges: (e,s) 9 then (es,t) 9
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    assert(got(1)._2 == "es" && got(1)._3 == "t" && got(1)._4 == 9L)
  }

  test("learnBpeMerges: greedy leftmost-non-overlapping and early exhaustion") {
    // "aaa"x3 + "aa": pair (a,a) counts 2*3 + 1 = 7; after the merge the
    // words are [aa,a]x3 and [aa] — greedy, no overlap double-count
    val got = run("aaa aaa aaa aa", 5)
    val want = replay("aaa aaa aaa aa", 5)
    assert(got == want)
    assert(got.head == ((1L, "a", "a", 7L)))
    // exhaustion: every remaining pair occurs once -> trainer stops early
    val sparse = run("ab cd ef", 5)
    assert(sparse == replay("ab cd ef", 5))
    assert(sparse.length <= 3)
  }

  test("bpeTokenCountLearned: apply replays the trained rules word-for-word") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val rules = replay(corpus, 6).map(m => (m._2, m._3))
    // scalar application of the same greedy merges
    def tokenize(w: String): Int = {
      var syms = w.map(_.toString).toVector
      rules.foreach { case (a, b) =>
        val acc = scala.collection.mutable.ArrayBuffer(syms.head)
        syms.tail.foreach { x =>
          if (acc.last == a && x == b) acc(acc.length - 1) = a + b else acc += x
        }
        syms = acc.toVector
      }
      syms.length
    }
    val docs = Seq((1L, corpus), (2L, "low lowest wide"), (3L, "zz")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCountLearned(docs, "doc_id", "text", rules)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L -> corpus, 2L -> "low lowest wide", 3L -> "zz").foreach { case (id, text) =>
      val want = text.split("\\s+").filter(_.nonEmpty).map(tokenize).sum.toLong
      assert(got(id) == want, s"doc $id")
    }
    // a single fully-merged word collapses to one token
    val aa = Seq((1L, "aa aa aa aa")).toDF("doc_id", "text")
    val m = TextAnalysis.learnBpeMerges(aa, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val n = TextAnalysis.bpeTokenCountLearned(aa, "doc_id", "text", m)
      .collect()(0).getLong(1)
    assert(m == Seq(("a", "a")) && n == 4L)
  }

  test("tx32 drop reasons: first-failing-rule precedence on crafted docs") {
    import org.apache.spark.sql.functions.{col, lit}
    // a doc failing MULTIPLE rules must report the FIRST in precedence:
    // too_short beats low_stopword beats word_len
    val shortAndNoStops = "zz " * 10            // 10 tokens after trim, no stopwords
    val stopless = Seq.fill(40)("zzzzzz").mkString(" ") // 40 tokens, 0 stopwords
    val badLen = (Seq.fill(20)("the") ++ Seq.fill(20)("a")).mkString(" ") // stops ok, mean len 2
    val good = Seq.fill(20)("the words here") .mkString(" a of ")
    def row(id: Long, text: String) =
      (id, "srcX", text, text.length.toLong)
    val df = Seq(
      row(1, shortAndNoStops.trim),
      row(2, stopless),
      row(3, badLen),
      row(4, (1 to 40).map(_ => "quick").mkString(" ") + " the a of and is the a")
    ).toDF("doc_id", "source", "text", "n_chars")
    // evaluate via the registered query body on a temp dir? The reason
    // expression is inline in the query; replicate its contract by writing
    // the frame to parquet and pointing Tables.documents at it
    val dir = java.nio.file.Files.createTempDirectory("graft-tx32").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.tx32DropReasons.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "too_short")   // 20 tokens AND stopless: short wins
    assert(out(2L) == "low_stopword")
    assert(out(3L) == "word_len")    // mean word length 2 < 4.5
    assert(out(4L) == "keep")
  }

  test("piiScrub: pinned stage order — email digits never count as phones, IP dots never as emails") {
    val df = Seq(
      // two emails (one with digits a phone pattern would otherwise hit),
      // one IP, one phone; the raw phone survives, the email's does not
      (1L, "mail a.b+c12345678@host90.example.org and x@y.io, " +
        "ip 10.20.30.40, call +1-555-012-3456 now"),
      (2L, "no pii here at all"),
      // an IP alone: its digit runs must not double-count as a phone
      // (dots break the [0-9-] phone run)
      (3L, "bare ip 192.168.100.200 only")
    ).toDF("id", "text")
    val out = TextAnalysis.piiScrub(df, "text").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("n_emails")),
        r.getLong(r.fieldIndex("n_ips")), r.getLong(r.fieldIndex("n_phones")),
        r.getString(r.fieldIndex("text"))))
    assert(out(0) == (1L, 2L, 1L, 1L,
      "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE> now"))
    assert(out(1) == (2L, 0L, 0L, 0L, "no pii here at all"))
    assert(out(2) == (3L, 0L, 1L, 0L, "bare ip <IP> only"))
  }
}
