package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY §2.8): the reference's scalar needs
  * are tiny (now(), epoch math, murmur token); an engine needs the full
  * date/string/math library. These queries pin the cross-dialect
  * semantics against the DuckDB oracle.
  */
object ScalarOps {

  def datetimeFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("2024-01-01").cast("date"))
          .as("days_since"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))

  def stringFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        substring(col("p_name"), 1, 5).as("pre5"),
        length(col("p_name")).as("len"),
        concat_ws("#", col("p_brand"), col("p_type")).as("joined"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        trim(lpad(col("p_brand"), 12, "_")).as("padded"),
        col("p_name").contains("a").as("has_a"))

  /** Semi-structured JSON extraction over the events.props payload —
    * `get_json_object` is a codegen'd Catalyst expression, so pulling
    * typed fields out of a JSON column stays a zero-shuffle projection
    * (the common "properties bag" pattern in event pipelines). An
    * absent path yields NULL, pinned against the oracle so missing-key
    * semantics match across engines.
    */
  def jsonFns(spark: SparkSession, sfDir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.load(spark, sfDir, "events")
      .select(
        col("event_id"),
        k.as("k"),
        (k % 10).as("k_mod"),
        get_json_object(col("props"), "$.absent").as("absent_attr"))
  }

  /** Array/collection function surface over a row-local long array
    * (sort, max, membership, position, slice). Outputs are scalars —
    * joined strings for the ordered views — because array-typed
    * columns render differently across engines in the hash compare.
    * Note `array_position`'s missing-element convention differs: Spark
    * returns 0, DuckDB NULL — the oracle coalesces to 0 to pin Spark's
    * convention. All inputs are integral-valued (quantity) or
    * pre-rounded (percentages), so double→long casts agree across
    * engines' truncate-vs-round conventions.
    */
  def arrayFns(spark: SparkSession, sfDir: String): DataFrame = {
    val arr = array(
      col("l_linenumber").cast("long"),
      col("l_quantity").cast("long"),
      round(col("l_discount") * 100).cast("long"),
      round(col("l_tax") * 100).cast("long"))
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        array_join(sort_array(arr), ",").as("sorted_str"),
        array_max(arr).as("amax"),
        array_contains(arr, lit(7L)).as("has7"),
        array_position(arr, lit(7L)).cast("long").as("pos7"),
        array_join(slice(sort_array(arr), 1, 2), ",").as("low2"))
  }

  def mathFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("absdiff"),
        ceil(col("l_quantity")).as("ceil_q"),
        floor(col("l_quantity")).as("floor_q"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
        round(log(col("l_quantity") + 1), 6).as("ln_q"),
        (col("l_quantity") * col("l_quantity")).as("sq"),
        signum(col("l_discount") - 0.05).as("sgn"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        greatest(col("l_tax"), col("l_discount")).as("gmax"))
}
