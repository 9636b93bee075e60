package graft

import graft.functions.AggExprs
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** [[graft.functions.CappedSortedIds]] / [[CappedSortedIdSigs]] must be
  * drop-ins for `sort_array(collect_list(...))` + size-band filter — same
  * groups kept, same sorted contents — while never storing more than cap+1
  * elements. Checked against the uncapped idiom on multi-partition data so
  * partial/merge paths (including merging two saturated buffers) run. */
class AggExprsSpec extends SparkSpec {

  private def groupsDf = {
    import spark.implicits._
    // group g has g members (g = 1..12): sizes straddle the cap on both sides
    (1 to 12).flatMap(g => (1 to g).map(i => (g.toLong, (100 * g + i).toLong)))
      .toDF("g", "id")
      .repartition(7) // force partial buffers + merges
  }

  test("cappedSortedIds ≡ collect_list + size band, saturated groups dropped") {
    val cap = 6
    val capped = groupsDf.groupBy("g")
      .agg(AggExprs.cappedSortedIds(F.col("id"), cap).as("ids"))
      .filter(F.col("ids").isNotNull)
    val reference = groupsDf.groupBy("g")
      .agg(F.sort_array(F.collect_list("id")).as("ids"))
      .filter(F.size(F.col("ids")).between(2, cap))
    val c = capped.orderBy("g").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    val r = reference.orderBy("g").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    assert(c.toSeq === r.toSeq)
    assert(c.map(_._1).toSeq === (2L to 6L)) // 1 too small, >6 saturated
  }

  test("cappedSortedIds counts true size even when every map task saturates") {
    import spark.implicits._
    // one group, 400 members over many partitions: each partial holds <=
    // cap+1 but the MERGED seen must reach 400 and null the group out
    val one = (1 to 400).map(i => (1L, i.toLong)).toDF("g", "id")
      .repartition(13)
    val out = one.groupBy("g")
      .agg(AggExprs.cappedSortedIds(F.col("id"), 100).as("ids"))
    assert(out.collect().map(_.isNullAt(1)).toSeq === Seq(true))
  }

  test("cappedSortedIdSigs ≡ collect_list(struct) + size band") {
    val cap = 6
    val withSig = groupsDf.withColumn("simhash", F.col("id") * 31L)
    val capped = withSig.groupBy("g")
      .agg(AggExprs.cappedSortedIdSigs(
        F.struct(F.col("id"), F.col("simhash")), cap).as("rows"))
      .filter(F.col("rows").isNotNull)
    val reference = withSig.groupBy("g")
      .agg(F.sort_array(F.collect_list(
        F.struct(F.col("id"), F.col("simhash")))).as("rows"))
      .filter(F.size(F.col("rows")).between(2, cap))
    def render(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("g").collect().map(r => (r.getLong(0),
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getLong(0), x.getLong(1))))).toSeq
    assert(render(capped) === render(reference))
  }
}
