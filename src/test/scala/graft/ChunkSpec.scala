package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._

class ChunkSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val sp = spark; import sp.implicits._
    rows.toSeq.toDF("id", "text")
  }

  private def chunks(df: org.apache.spark.sql.DataFrame, c: Int, o: Int) =
    Curation.chunkDocuments(df, "id", "text", c, o)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("exact windows with overlap; short tail chunk; token counts") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val out = chunks(docs(1L -> text), c = 4, o = 1)    // stride 3
    assert(out == Seq(
      (1L, 0L, "w1 w2 w3 w4", 4L),
      (1L, 1L, "w4 w5 w6 w7", 4L),
      (1L, 2L, "w7 w8 w9 w10", 4L)))
    // 11 tokens → a 2-token tail starting at 9
    val out11 = chunks(docs(1L -> ((1 to 11).map(i => s"w$i").mkString(" "))), 4, 1)
    assert(out11.last == ((1L, 3L, "w10 w11", 2L)))
  }

  test("no overlap = disjoint cover; every token appears exactly once") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = chunks(docs(1L -> text), c = 8, o = 0)
    assert(out.size == 13 && out.map(_._4).sum == 100)
    assert(out.flatMap(_._3.split(" ")).toSeq == (1 to 100).map(i => s"t$i"))
  }

  test("documents shorter than one chunk produce exactly one chunk") {
    val out = chunks(docs(1L -> "a b c"), c = 64, o = 16)
    assert(out == Seq((1L, 0L, "a b c", 3L)))
  }

  test("empty and null documents produce zero rows") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
      .unionByName(Seq((3L, Option.empty[String])).toDF("id", "text"))
    assert(Curation.chunkDocuments(df, "id", "text", 8, 2).count() == 0)
  }

  test("overlap invariant: consecutive chunks share exactly `overlap` tokens") {
    val text = (1 to 50).map(i => s"x$i").mkString(" ")
    val out = chunks(docs(1L -> text), c = 10, o = 4)
    out.sliding(2).foreach {
      case Seq((_, _, a, _), (_, _, b, bn)) =>
        val tail = a.split(" ").takeRight(4).toSeq
        val head = b.split(" ").take(math.min(4, bn.toInt)).toSeq
        assert(head == tail.take(head.size))
      case _ =>
    }
  }

  test("zero shuffles: the plan has no exchange") {
    val plan = Curation.chunkDocuments(
        docs(1L -> "a b c d e").repartition(2), "id", "text", 2, 1)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n == 0, plan)
  }
}
