package graft

import graft.fulltext.Bm25
import graft.fulltext.Bm25._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boolean-mode parser + operator semantics and the CJK ngram path —
  * the parts the DuckDB oracle can't express (ft5–ft8 cover the rest).
  */
class FulltextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark streams data fast"),
      (2L, "slow batch spark spark"),
      (3L, "data stream spark window"),
      (4L, "stream spark error log"),
      (5L, "window functions rule")
    ).toDF("doc_id", "text")
  }
  private lazy val idx = FulltextIndex.build(corpus, "doc_id", "text")

  private def docs(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("parser: operators, phrase, group, star") {
    val nodes = parseBoolean("""+apple -banana <cat >dog ~eel "big data" (x y*) pre*""")
    assert(nodes == Seq(
      FtMod('+', FtText("apple")), FtMod('-', FtText("banana")),
      FtMod('<', FtText("cat")), FtMod('>', FtText("dog")),
      FtMod('~', FtText("eel")), FtPhrase(Seq(("big", 0), ("data", 4))),
      FtGroup(Seq(FtText("x"), FtStar("y"))), FtStar("pre")))
  }

  test("boolean: plus requires, minus excludes, should extends only without plus") {
    assert(docs(searchBoolean(idx, "+spark -error")) == Set(1L, 2L, 3L))
    // no plus: should-terms extend the doc set (OR semantics)
    assert(docs(searchBoolean(idx, "spark window")) == Set(1L, 2L, 3L, 4L, 5L))
    // with plus: 'window' only adds score to spark docs, never doc 5
    assert(docs(searchBoolean(idx, "+spark window")) == Set(1L, 2L, 3L, 4L))
  }

  test("star prefix matches the term dictionary") {
    assert(docs(searchBoolean(idx, "stream*")) == Set(1L, 3L, 4L))
    assert(docs(searchBoolean(idx, "+wind* +rule")) == Set(5L))
  }

  test("phrase requires adjacency in order") {
    assert(docs(searchBoolean(idx, "\"stream spark\"")) == Set(3L, 4L))
    assert(docs(searchBoolean(idx, "\"spark stream\"")) == Set.empty[Long])
    assert(docs(searchBoolean(idx, "\"data stream spark\"")) == Set(3L))
  }

  test("rank modifiers reweight without changing the doc set; ~ goes negative") {
    val plain = searchBoolean(idx, "window").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val boosted = searchBoolean(idx, ">window").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val less = searchBoolean(idx, "<window").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rankless = searchBoolean(idx, "~window").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == boosted.keySet && plain.keySet == rankless.keySet)
    for ((k, v) <- plain) {
      assert(math.abs(boosted(k) - v * 1.1) < 1e-9)
      assert(math.abs(less(k) - v * 0.9) < 1e-9)
      assert(math.abs(rankless(k) + v) < 1e-9)
    }
  }

  test("group: OR within, AND-able under plus") {
    assert(docs(searchBoolean(idx, "+(error log) +stream")) == Set(4L))
    assert(docs(searchBoolean(idx, "(error rule)")) == Set(4L, 5L))
  }

  test("tfidf scoring: weight * tf * log10(N/df)^2") {
    // 'window' df=2 of N=5; doc 3 tf=1, doc 5 tf=1
    val scores = searchNatural(idx, "window", algo = "tfidf")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = math.pow(math.log10(5.0 / 2.0), 2)
    assert(scores.keySet == Set(3L, 5L))
    assert(math.abs(scores(3L) - expected) < 1e-9)
  }

  test("ngram index: CJK substring search without whitespace tokens") {
    import spark.implicits._
    val cjk = Seq(
      (1L, "数据库系统概论"),
      (2L, "分布式数据处理"),
      (3L, "操作系统原理"),
      (4L, "mixed 数据库 and english")
    ).toDF("doc_id", "text")
    val nIdx = FulltextIndex.build(cjk, "doc_id", "text", ngram = true)
    assert(docs(searchNgram(nIdx, "数据库")) == Set(1L, 4L))
    assert(docs(searchNgram(nIdx, "系统概论")) == Set(1L))
    // sub-ngram needle falls back to prefix match (reference's short-token rewrite)
    assert(docs(searchNgram(nIdx, "数据")) == Set(1L, 2L, 4L))
    // latin runs gram-match too (MySQL ngram applies to all scripts)
    assert(docs(searchNgram(nIdx, "engli")) == Set(4L))
  }

  test("ngram tokenize: positions are global char offsets within runs") {
    assert(Bm25.ngramTokenize("ab cdef", 3) == Seq(("cde", 3), ("def", 4)))
    assert(Bm25.ngramTokenize("XYZw", 3) == Seq(("xyz", 0), ("yzw", 1)))
  }

  test("prebuilt index cache: second probe reuses the persisted postings") {
    val a = FulltextIndex.forCorpus(corpus, "doc_id", "text", key = "spec-corpus")
    val b = FulltextIndex.forCorpus(corpus, "doc_id", "text", key = "spec-corpus")
    assert(a eq b)
    assert(a.nDocs == 5L)
    FulltextIndex.invalidate("spec-corpus")
  }

  test("cjk segmentation: dictionary DP recovers words, longest compounds win") {
    import graft.fulltext.CjkSegmenter.tokenize
    // plain 2-char words, no separators
    assert(tokenize("火花连接流式窗口") == Seq("火花", "连接", "流式", "窗口"))
    // one 4-char compound beats two 2-char words (机器 + 学习 are in dict too)
    assert(tokenize("机器学习模型") == Seq("机器学习", "模型"))
    assert(tokenize("时间序列数据库") == Seq("时间序列", "数据库"))
    // out-of-dictionary chars fall back to single-char tokens
    assert(tokenize("鑫数据") == Seq("鑫", "数据"))
    // mixed text: latin runs keep the default lowercase rule
    assert(tokenize("Spark处理数据 fast") == Seq("spark", "处理", "数据", "fast"))
    assert(tokenize("") == Nil && tokenize(null) == Nil)
  }

  test("cjk natural mode scores CJK docs through the segmenting index") {
    import spark.implicits._
    val zhDocs = Seq(
      (1L, "火花流式处理"), (2L, "数据库查询优化"), (3L, "火花火花连接")).toDF("doc_id", "text")
    val idx = FulltextIndex.build(zhDocs, "doc_id", "text", tokenizer = "chinese")
    val scores = Bm25.searchNatural(idx, "火花", tokenizer = "chinese")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 3L))
    assert(scores(3L) > scores(1L)) // tf=2 beats tf=1
  }

  test("multi-column MATCH builds one combined index (tokenize-time concat)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark joins data", "intro"),
      (2L, "window functions", "spark guide"),
      (3L, "batch errors", "appendix")).toDF("doc_id", "body", "title")
    // combined index ≡ index over concat_ws('\n', body, title)
    // (fulltext_tokenize.go:142-150 concatenates the listed columns)
    val multi = FulltextIndex.buildMulti(docs, "doc_id", Seq("body", "title"))
    val concat = FulltextIndex.build(
      docs.select(col("doc_id"), concat_ws("\n", col("body"), col("title")).as("t")),
      "doc_id", "t")
    val key = Seq("doc_id", "term", "tf", "dl")
    assert(multi.postings.select(key.head, key.tail: _*).collect().toSet ==
      concat.postings.select(key.head, key.tail: _*).collect().toSet)
    assert(multi.nDocs == 3 && multi.avgdl == concat.avgdl)
    // a term present only in the second column matches — and df counts
    // docs where ANY listed column has it
    val scores = searchNatural(multi, "spark")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L))
    // single-column probe would miss doc 2 entirely
    val single = FulltextIndex.build(docs, "doc_id", "body")
    assert(searchNatural(single, "spark").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }
}
