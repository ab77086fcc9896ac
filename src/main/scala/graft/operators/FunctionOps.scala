package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** Scalar-function families (SURVEY.md §2 B9) — one declared query per
  * family, each a single projection over a fixture table. Everything is a
  * built-in `org.apache.spark.sql.functions` call, so the whole query stays
  * inside one WholeStageCodegen span: zero shuffles, a pure map over the
  * scan, embarrassingly parallel at any scale.
  *
  * Array-typed results are reduced to scalars (size / element_at / folds)
  * because the oracle compare is defined over scalar columns (SURVEY §7.4).
  */
object FunctionOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String functions over part names.
    "fn_string" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 5).as("pre5"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          trim(col("p_name")).as("trimmed"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey")),

    // Regex family beyond the single extract in fn_string: extract-all,
    // global replace, and boolean match. Patterns stay in the
    // POSIX-class subset both engines' regex dialects (Java util.regex /
    // RE2) interpret identically — all codegen'd string expressions, no
    // UDF.
    "fn_regex" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)))
            .as("n_vowel_runs"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
          col("p_name").rlike("red").as("has_red"))
        .orderBy("p_partkey")),

    // Date/time functions over order dates.
    "fn_date" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(current_date(), col("o_orderdate")).isNotNull.as("has_age"))
        .orderBy("o_orderkey")),

    // Calendar functions: quarter, ISO weekday, last day of month, and a
    // make_date reconstruction (engine-portable: Spark weekday() is
    // 0=Monday, DuckDB isodow is 1=Monday — emitted as isodow).
    "fn_calendar" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          quarter(col("o_orderdate")).as("q"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          last_day(col("o_orderdate")).as("month_end"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
            .as("month_first"))
        .orderBy("o_orderkey")),

    // Null-handling family: nullif / coalesce / two-branch defaulting
    // over a computed nullable column (zero discounts become NULL).
    "fn_null" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_defaulted"),
          when(nullif(col("l_discount"), lit(0.0)).isNull, "none")
            .otherwise("some").as("disc_label"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // ANSI-safe error handling: try_divide / try_cast return NULL instead
    // of failing the job — the difference between one malformed row
    // killing a 100 TB pass and it landing in a quarantine column.
    "fn_try" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(try_divide(col("l_extendedprice"), col("l_discount")), 4)
            .as("price_per_disc"),
          expr("try_cast(l_returnflag AS INT)").as("flag_as_int"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // Math + conditional functions over lineitem prices.
    "fn_math" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("rounded"),
          abs(col("l_discount") - 0.05).as("abs_centered"),
          ceil(col("l_quantity")).as("qty_ceil"),
          floor(col("l_quantity")).as("qty_floor"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          when(col("l_quantity") > 30, "bulk")
            .when(col("l_quantity") > 10, "mid")
            .otherwise("small").as("qty_band"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — order
        // by all outputs for a total compare order (§7.4).
        .orderBy("l_orderkey", "l_linenumber", "rounded", "abs_centered",
          "qty_ceil", "qty_floor", "disc_sq", "qty_band")),

    // Array higher-order functions over embeddings (scalar-reduced).
    "fn_array" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first"),
          round(element_at(col("embedding"), -1).cast("double"), 4).as("last"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 4).as("sum_all"),
          round(Vectors.dot(col("embedding"), col("embedding")), 4).as("self_dot"))
        .orderBy("vec_id")),

    // JSON extraction from the events props column.
    "fn_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"),
          get_json_object(col("props"), "$.missing").as("absent"))
        .orderBy("event_id")),

    // Spark 4 VARIANT (the open semi-structured type): parse once into a
    // binary variant, then typed path extraction — the columnar-shredded
    // answer to schemaless JSON at scale (parse cost paid once per row,
    // extraction is a codegen'd path walk, not a string re-parse per
    // field). from_json with an explicit schema rides along as the
    // schema-ful twin.
    "fn_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .withColumn("st",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .select(col("event_id"),
          try_variant_get(col("v"), "$.k", "long").as("k_variant"),
          col("st.k").as("k_struct"),
          try_variant_get(col("v"), "$.missing", "string").as("absent"))
        .orderBy("event_id")),

    // Unpivot (wide -> long): two part metrics melted into (metric, value).
    "fn_unpivot" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .orderBy("p_partkey", "metric")),

    // Map construction + access. A raw MAP column is not hash-stable
    // across engines (entry order is physical, not semantic), so the
    // declared output serializes the map as a KEY-SORTED `k:v` string —
    // a canonical form both engines agree on — alongside the scalar
    // probes; DuckDB rebuilds the same map with MAP{} and serializes it
    // through the identical sort.
    "fn_map" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          map_from_entries(array(
            struct(lit("name").as("key"), col("n_name").as("value")),
            struct(lit("region").as("key"), col("n_regionkey").cast("string").as("value")))).as("m"))
        .select(col("n_nationkey"),
          size(map_keys(col("m"))).as("n_keys"),
          element_at(col("m"), "name").as("name_val"),
          concat_ws(",", transform(array_sort(map_keys(col("m"))),
            k => concat(k, lit(":"), element_at(col("m"), k)))).as("m_str"))
        .orderBy("n_nationkey")),

    // Nested STRUCT surface: build (price, key) structs, collect them
    // per customer, sort the array by the struct's natural (field-order
    // lexicographic) ordering, and read fields back out — the
    // groupBy-collect idiom for "ordered detail without a second
    // window". One shuffle (the groupBy); the per-group array stays on
    // the executor, so this holds at scale only while groups are bounded
    // (orders-per-customer), which is exactly when the idiom is right.
    "fn_struct" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(struct(
          col("o_totalprice").as("p"), col("o_orderkey").as("k")))).as("arr"))
        .select(col("o_custkey"),
          size(col("arr")).as("n_orders"),
          col("arr")(0)("k").as("cheapest_key"),
          col("arr")(0)("p").as("cheapest_price"))
        .orderBy("o_custkey"))
  )

  def oracles: Map[String, String] = Map(
    "fn_null" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
                nullif(l_discount, 0.0) AS disc_or_null,
                coalesce(nullif(l_discount, 0.0), -1.0) AS disc_defaulted,
                CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 'none'
                     ELSE 'some' END AS disc_label
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "fn_try" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
                round(l_extendedprice / NULLIF(l_discount, 0), 4) AS price_per_disc,
                TRY_CAST(l_returnflag AS INT) AS flag_as_int
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "fn_calendar" ->
      """SELECT o_orderkey,
                CAST(quarter(o_orderdate) AS INT) AS q,
                CAST(isodow(o_orderdate) AS INT) AS isodow,
                CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
                make_date(CAST(year(o_orderdate) AS INT),
                          CAST(month(o_orderdate) AS INT), 1) AS month_first
         FROM orders ORDER BY o_orderkey""",
    "fn_regex" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
                CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS n_vowel_runs,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
                regexp_matches(p_name, 'red') AS has_red
         FROM part ORDER BY p_partkey""",
    "fn_string" ->
      """SELECT p_partkey,
                upper(p_name) AS up,
                substring(p_name, 1, 5) AS pre5,
                p_brand || '#' || p_type AS brand_type,
                CAST(length(p_name) AS INT) AS name_len,
                trim(p_name) AS trimmed,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
         FROM part ORDER BY p_partkey""",
    "fn_date" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS d,
                date_trunc('month', o_orderdate) AS month_start,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
                TRUE AS has_age
         FROM orders ORDER BY o_orderkey""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice, 1) AS rounded,
                abs(l_discount - 0.05) AS abs_centered,
                CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
                CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
                round(pow(l_discount, 2), 6) AS disc_sq,
                CASE WHEN l_quantity > 30 THEN 'bulk'
                     WHEN l_quantity > 10 THEN 'mid'
                     ELSE 'small' END AS qty_band
         FROM lineitem ORDER BY l_orderkey, l_linenumber, rounded, abs_centered,
                  qty_ceil, qty_floor, disc_sq, qty_band""",
    "fn_array" ->
      """SELECT vec_id,
                CAST(len(embedding) AS INT) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 4) AS first,
                round(CAST(embedding[-1] AS DOUBLE), 4) AS last,
                CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
                round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_all,
                round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS self_dot
         FROM embeddings ORDER BY vec_id""",
    "fn_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
         UNION ALL
         SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
         ORDER BY p_partkey, metric""",
    "fn_json" ->
      """SELECT event_id,
                json_extract_string(props, '$.k') AS k_str,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
                json_extract_string(props, '$.missing') AS absent
         FROM events ORDER BY event_id""",
    "fn_variant" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_variant,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
                json_extract_string(props, '$.missing') AS absent
         FROM events ORDER BY event_id""",
    "fn_struct" ->
      """SELECT o_custkey, CAST(n_orders AS INT) AS n_orders,
                cheapest_key, cheapest_price
         FROM (
           SELECT o_custkey, o_orderkey AS cheapest_key,
                  o_totalprice AS cheapest_price,
                  count(*) OVER (PARTITION BY o_custkey) AS n_orders,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice, o_orderkey) AS rn
           FROM orders
         ) WHERE rn = 1 ORDER BY o_custkey""",
    // the map rebuilt with DuckDB's MAP{} literal and serialized through
    // the same key-sort (map extract returns a LIST there — [1] unwraps)
    "fn_map" ->
      """WITH mm AS (
           SELECT n_nationkey,
                  MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)} AS m
           FROM nation
         )
         SELECT n_nationkey, CAST(cardinality(m) AS INT) AS n_keys,
                m['name'][1] AS name_val,
                array_to_string(list_transform(list_sort(map_keys(m)),
                  k -> k || ':' || m[k][1]), ',') AS m_str
         FROM mm ORDER BY n_nationkey"""
  )
}
