package graft

import graft.functions.{Scored, TopKAggregator}

/** Unit semantics of the bounded top-k aggregator: capping, partial
  * merge, deterministic tie-break, final ordering.
  */
class TopKAggregatorSpec extends SparkSpecBase {

  private val agg = new TopKAggregator(3)

  test("reduce keeps only the k best, ordered") {
    val buf = Seq(1.0, 5.0, 3.0, 4.0, 2.0).zipWithIndex
      .foldLeft(agg.zero) { case (b, (s, i)) => agg.reduce(b, Scored(i, s)) }
    assert(agg.finish(buf).map(_.score) == List(5.0, 4.0, 3.0))
  }

  test("merge of partial buffers equals global top-k") {
    val left = List(Scored(1, 9.0), Scored(2, 5.0), Scored(3, 1.0))
    val right = List(Scored(4, 8.0), Scored(5, 6.0), Scored(6, 2.0))
    assert(agg.finish(agg.merge(left, right)).map(_.id) == List(1, 4, 5))
  }

  test("score ties break by ascending id") {
    val buf = List(Scored(9, 5.0), Scored(2, 5.0), Scored(7, 5.0),
      Scored(1, 4.0))
    assert(agg.finish(agg.merge(agg.zero, buf)).map(_.id) == List(2, 7, 9))
  }

  test("NaN scores rank greatest — the same total order Spark SQL " +
      "sorts doubles with") {
    // a zero-norm vector gives cosine 0/0 = NaN; the window strategy
    // (ORDER BY sim DESC) puts NaN first, so the aggregator must too —
    // and a non-total naive comparator can also blow up sortWith
    val rows = List(Scored(1, 0.9), Scored(2, Double.NaN), Scored(3, 0.5),
      Scored(4, 0.7))
    val viaReduce = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(viaReduce).map(_.id) == List(2, 1, 4))
    val viaMerge = agg.merge(
      rows.take(2).foldLeft(agg.zero)(agg.reduce),
      rows.drop(2).foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(viaMerge).map(_.id) == List(2, 1, 4))
  }

  test("typed end-to-end matches the window formulation on embeddings") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.limit(50).select(col("vec_id").as("q"),
        col("embedding").as("qv"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("n"),
        col("embedding").as("nv")))
      .filter(col("q") =!= col("n"))
      .select(col("q"), col("n"),
        graft.functions.VectorExprs
          .cosine_similarity(col("qv"), col("nv")).as("sim"))
    val viaAgg = pairs.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(TopKAggregator.topK(3).name("top"))
      .flatMap { case (q, top) => top.map(s => (q, s.id)) }
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("sim").desc, col("n"))
    val viaWindow = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("q", "n")
      .as[(Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
