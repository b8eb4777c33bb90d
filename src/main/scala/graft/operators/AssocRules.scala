package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant 1994) as a
  * DataFrame-first library API — support / confidence / lift over
  * item pairs, the miner behind `q58_association_rules` (promoted on
  * the Bm25/RangeJoin precedent), usable against any (basket, item)
  * table.
  *
  * All ratios are EXACT ppm integers (`cnt·1e6 div base` — no float
  * division to drift on):
  *
  *   conf(a→b) = n_ab·1e6 div n_a
  *   lift(a,b) = n_ab·N·1e6 div (n_a·n_b)     (symmetric)
  *
  * Scale shape: the pair table derives from per-basket item SETS in
  * ONE shuffle (map-side-combined `collect_set` + two narrow
  * explodes, a<b — group fan-out is O(width²) per basket, never
  * O(n²) over the table); `minPairSupport` prunes it immediately;
  * item supports are one distinct-(basket, item) aggregate joined
  * UNHINTED onto the surviving pairs twice — item cardinality grows
  * with the catalog, so whether it broadcasts is AQE's call from
  * file statistics (broadcast while it fits, shuffle past that),
  * never a forced hint; the basket count is a broadcast scalar.
  * Nothing touches pairs that fail support.
  *
  * Baskets wider than ~10⁴ items square into that basket's pair
  * count — pre-cap pathological baskets upstream (the packing/t6
  * length-cap rule) rather than asking the miner to guess a policy.
  */
object AssocRules {

  /** @param baskets (basketCol, itemCol) — duplicates fine (dedup'd
    *        to set semantics internally)
    * @param minPairSupport keep pairs co-occurring in at least this
    *        many baskets
    * @return (item_a, item_b, n_ab, n_a, n_b, conf_ab_ppm,
    *         conf_ba_ppm, lift_ppm), item_a < item_b
    */
  def mine(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minPairSupport: Long = 2L): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport must be ≥ 1")
    val li = baskets
      .select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .distinct()
    val pairs = baskets
      .groupBy(col(basketCol).as("ok"))
      .agg(collect_set(col(itemCol)).as("pks"))
      .select(explode(col("pks")).as("a"), col("pks"))
      .select(col("a"), explode(col("pks")).as("b"))
      .where(col("a") < col("b"))
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    val itemCnt = li.groupBy("pk").agg(count(lit(1)).as("n"))
    val nBaskets = li.select("ok").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      // UNHINTED: itemCnt is item-cardinality (grows with the
      // catalog) — AQE broadcasts it while its file statistics say
      // it fits, shuffles past that; the 1-row nBaskets scalar
      // below keeps its hint
      .join(itemCnt.select(col("pk").as("item_a"),
        col("n").as("n_a")), Seq("item_a"))
      .join(itemCnt.select(col("pk").as("item_b"),
        col("n").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        expr("n_ab * 1000000L div n_a").as("conf_ab_ppm"),
        expr("n_ab * 1000000L div n_b").as("conf_ba_ppm"),
        expr("n_ab * n_baskets * 1000000L div (n_a * n_b)")
          .as("lift_ppm"))
  }
}
