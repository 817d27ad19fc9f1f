package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Trained char-n-gram language ID (r14 verdict #8): held-out
  * accuracy across four writing systems must clear 95% — the bar that
  * separates a production language gate from the three-stopword
  * fixture heuristic ([[TextAnalysis.languageId]], which q32 keeps
  * pinning unchanged). The corpus is the documents table mapped 1:1
  * into cyrillic/greek/devanagari alphabets (the q218 construction),
  * trained on even doc_ids, scored on the odd half. */
class LangProfileSpec extends SparkSpec {

  private val latin = "abcdefghijklmnopqrstuvwxyz"
  private val scripts = Seq(
    ("lat", latin),
    ("cyr", "абвгдежзийклмнопрстуфхцчшщ"),
    ("gre", "αβγδεζηθικλμνξοπρστυφχψωάέ"),
    ("dev", "कखगघङचछजझञटठडढणतथदधनपफबभमय"))

  test("held-out accuracy >= 95% on each of four scripts; overall too") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val variants = scripts.zipWithIndex.map { case ((lang, to), idx) =>
      docs.select((col("doc_id") * 4 + lit(idx)).as("vid"),
        col("doc_id"), lit(lang).as("lang"),
        translate(lower(col("text")), latin, to).as("text"))
    }.reduce(_ unionByName _).cache()
    val train = variants.filter(col("doc_id") % 2 === 0)
    val test = variants.filter(col("doc_id") % 2 =!= 0)
    val profile = TextAnalysis.langProfileTrain(train).cache()
    assert(profile.select("lang").distinct().count() === 4L)
    val pred = TextAnalysis.langProfileId(test, profile, idCol = "vid")
      .join(test.select("vid", "lang"), "vid")
    val perLang = pred.groupBy("lang").agg(
      avg((col("lang_pred") === col("lang")).cast("double")).as("acc"),
      count(lit(1)).as("n")).collect()
    assert(perLang.length === 4, "every script must have held-out docs")
    perLang.foreach { r =>
      assert(r.getLong(2) >= 20,
        s"${r.getString(0)}: too few held-out docs to claim accuracy")
      assert(r.getDouble(1) >= 0.95,
        s"${r.getString(0)}: held-out accuracy ${r.getDouble(1)} < 0.95")
    }
    variants.unpersist(); profile.unpersist()
  }

  test("charNgrams: short and empty docs yield empty gram arrays, " +
    "never a reversed sequence") {
    import spark.implicits._
    val got = Seq((0L, ""), (1L, "a"), (2L, "ab"), (3L, "abc"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.charNgrams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L).isEmpty && got(1L).isEmpty)
    assert(got(2L) === Seq("ab"))
    assert(got(3L) === Seq("ab", "bc"))
  }

  test("the trained profile beats the stopword heuristic where the " +
    "heuristic is blind: non-latin scripts all collapse to 'und'") {
    val cyr = Tables.documents(spark, sf).select(col("doc_id"),
      translate(lower(col("text")), latin, scripts(1)._2).as("text"))
      .limit(50)
    val heuristic = cyr.select(
      TextAnalysis.languageId(col("text")).as("p"))
      .groupBy("p").count().collect()
    assert(heuristic.forall(_.getString(0) == "und"),
      "precondition: the stopword heuristic cannot see cyrillic")
  }
}
