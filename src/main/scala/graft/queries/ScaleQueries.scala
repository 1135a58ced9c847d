package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Bucketing, SkewJoin}

/** Scale techniques surfaced as driver-checked queries. The utilities in
  * [[graft.ext.SkewJoin]] and the bucketing write path change only the
  * PHYSICAL distribution of work — results must be bit-identical to the
  * plain formulation, which is exactly what a DuckDB oracle can certify.
  * ScaleSpec asserts the physical property itself (salt fan-out; no
  * shuffle under the bucketed join); these queries certify the semantic
  * no-op half of the contract on the driver's gate.
  */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Skew-salted fact-to-dim join: lineitem scattered over 8 sub-keys of
    * l_suppkey, supplier replicated 8×, joined on (key, salt) — a hot
    * supplier's rows spread over 8 reducers instead of one straggler.
    * The oracle is the PLAIN join: salting must not change a single row.
    * Aggregation in decimal (order-independent), emitted as double per
    * the repo's cross-engine convention.
    */
  val extSkewSaltedJoin = Q(
    "ext_skew_salted_join",
    (s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .select($"l_suppkey".as("s_suppkey"),
          $"l_quantity".cast("decimal(18,2)").as("qty"))
      val small = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      SkewJoin.saltedInnerJoin(big, small, "s_suppkey", salt = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          sum($"qty").cast("double").as("total_qty"))
        .orderBy($"s_nationkey")
    },
    Some("""SELECT s_nationkey, COUNT(*) AS n_items,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
           |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |GROUP BY s_nationkey
           |ORDER BY s_nationkey""".stripMargin))

  /** Bucketed co-located join: both sides are written `bucketBy(8, key)`
    * + `sortBy(key)` into the session catalog, so the sort-merge join
    * reads pre-partitioned, pre-sorted buckets — NO shuffle exchange and
    * no sort on either side (ScaleSpec asserts the plan shape). At 100 TB
    * this is the difference between re-shuffling the fact table on every
    * join and paying the layout cost once at write time; the oracle
    * certifies the layout changes nothing semantically.
    */
  val extBucketedJoin = Q(
    "ext_bucketed_join",
    (s, dir) => {
      import s.implicits._
      writeBucketed(s, dir)
      s.table(bucketedName("orders", dir))
        .join(s.table(bucketedName("customer", dir)),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
            .as("total_price"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin))

  /** Catalog name for this query's bucketed copy of `table`, scoped by
    * the dataset dir: interleaved runs across scale factors must not
    * read each other's layout or race through the drop+delete+write in
    * [[graft.ext.Bucketing.writeBucketed]]. The suffix is an MD5 digest
    * of the dir, not `dir.hashCode` — a 32-bit string hash collides
    * trivially (silently defeating the isolation) and
    * `math.abs(Int.MinValue)` is negative, which breaks identifier
    * parsing.
    */
  private[graft] def bucketedName(table: String, dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
    s"graft_scale_${table}_b_$digest"
  }

  /** Idempotent bucketed-layout build shared by the query and ScaleSpec:
    * 8 buckets on the join key, sorted within buckets, via
    * [[graft.ext.Bucketing]].
    */
  private[graft] def writeBucketed(s: SparkSession, dir: String): Unit = {
    Bucketing.writeBucketed(
      t(s, dir, "orders"), bucketedName("orders", dir), "o_custkey", 8)
    Bucketing.writeBucketed(
      t(s, dir, "customer"), bucketedName("customer", dir), "c_custkey", 8)
  }

  val all: Seq[Q] = Seq(extSkewSaltedJoin, extBucketedJoin)
}
