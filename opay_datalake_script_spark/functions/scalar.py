"""Scalar-function surface (SURVEY.md §2-H), grouped into themed
oracle-checkable queries.

Reference analogs: the HiveQL built-in surface the Opay scripts leaned on —
string manipulation for report labels, date arithmetic on the ``dt``
partition axis, ``get_json_object`` event-payload extraction (the central
event-tracking idiom), ``lateral view explode`` for array expansion,
``str_to_map`` config parsing, and md5/sha fingerprints for dedup.

Everything stays JVM-side (pyspark.sql.functions -> codegen); dialect
offsets vs DuckDB (dayofweek origin, BIGINT vs INT widths, floor/ceil
return types) are aligned explicitly in the oracle SQL per SURVEY.md §5.3-7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .exact import sql_sum_e4_2dp, sum_e4_2dp
from ..sources.io import load


@register(
    "h_string",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '#', p_type)                   AS brand_type,
           concat_ws('|', p_brand, p_type, p_name)        AS joined,
           substr(p_name, 1, 8)                           AS name8,
           upper(p_brand)                                 AS up,
           lower(p_type)                                  AS lo,
           trim(concat(' ', p_name, ' '))                 AS trimmed,
           CAST(length(p_name) AS BIGINT)                 AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0')          AS size_pad,
           rpad(p_brand, 12, '.')                         AS brand_pad,
           CAST(strpos(p_name, 'a') AS BIGINT)            AS a_pos,
           replace(p_type, ' ', '_')                      AS type_us,
           reverse(p_brand)                               AS brand_rev,
           array_to_string(string_split(p_name, ' '), '|') AS name_tokens
    FROM part
    """,
)
def h_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: concat/substr/case/trim/pad/search/split.
    split's token array is re-joined with '|' so every checked column is
    scalar (array cells crash the driver canonicalizer)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
        F.concat_ws("|", "p_brand", "p_type", "p_name").alias("joined"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("up"),
        F.lower("p_type").alias("lo"),
        F.trim(F.concat(F.lit(" "), "p_name", F.lit(" "))).alias("trimmed"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_us"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("|", F.split("p_name", " ")).alias("name_tokens"),
    )


@register(
    "h_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)      AS first_word,
           regexp_replace(text, 'join', 'JOIN', 'g') AS join_upper,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
               AS novowel_len
    FROM documents
    WHERE regexp_matches(text, 'scan|filter')
    """,
)
def h_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace + rlike filter (RE2-safe patterns only —
    Spark uses Java regex, DuckDB RE2; stick to the common subset)."""
    d = load(spark, sf_dir, "documents")
    return d.where(F.col("text").rlike("scan|filter")).select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "join", "JOIN").alias("join_upper"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias("novowel_len"),
    )


@register(
    "h_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)             AS y,
           CAST(month(o_orderdate) AS INTEGER)            AS m,
           CAST(day(o_orderdate) AS INTEGER)              AS d,
           strftime(o_orderdate, '%Y-%m')                 AS ym,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
                                                          AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                AS INTEGER)                               AS days_to_98,
           CAST(CAST(o_orderdate AS DATE) + 7 AS VARCHAR) AS plus_week,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)    AS dow
    FROM orders
    """,
)
def h_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic battery. Dialect notes: Spark dayofweek is 1=Sunday,
    DuckDB 0=Sunday -> oracle adds 1; Spark datediff(end, start) == DuckDB
    date_diff('day', start, end)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        # DATE-typed outputs are emitted as ISO strings: pandas round-trips
        # of DATE differ between Spark (date) and DuckDB (midnight ts).
        F.trunc("o_orderdate", "month").cast("string").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_98"
        ),
        F.date_add(F.col("o_orderdate"), 7).cast("string").alias("plus_week"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@register(
    "h_unix_ts",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT)             AS epoch_s,
           strftime(ts, '%Y-%m-%d %H:%M:%S')            AS ts_str,
           ts + INTERVAL 1 HOUR                         AS plus_hour
    FROM events
    """,
)
def h_unix_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch math: unix_timestamp truncates to seconds in both engines
    (session TZ pinned to UTC so from_unixtime round-trips the naive ts)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.from_unixtime(F.unix_timestamp("ts")).alias("ts_str"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("plus_hour"),
    )


@register(
    "h_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                         AS r1,
           CAST(floor(l_extendedprice) AS BIGINT)            AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT)             AS ce,
           abs(l_discount - 0.05)                            AS ab,
           round(pow(l_quantity, 2), 6)                      AS p2,
           round(sqrt(l_extendedprice), 6)                   AS sq,
           round(exp(l_discount), 6)                         AS ex,
           round(ln(l_extendedprice), 6)                     AS lg,
           round(log10(l_extendedprice), 6)                  AS l10,
           CAST(sign(l_discount - 0.05) AS DOUBLE)           AS sg,
           l_orderkey % 7                                    AS m7,
           ((l_orderkey - l_partkey) % 5 + 5) % 5            AS pm5,
           greatest(l_quantity, l_discount * 100)            AS gr,
           least(l_quantity, l_tax * 100)                    AS le
    FROM lineitem
    """,
)
def h_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery. floor/ceil return BIGINT in Spark but DOUBLE in
    DuckDB (cast in oracle); pmod has no DuckDB twin -> ((a%b)+b)%b."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("p2"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.log10("l_extendedprice"), 6).alias("l10"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        (F.col("l_orderkey") % 7).alias("m7"),
        F.pmod(F.col("l_orderkey") - F.col("l_partkey"), F.lit(5)).alias("pm5"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("gr"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("le"),
    )


@register(
    "h_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'rich' ELSE 'normal' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT')    AS seg_or_default,
           nullif(c_nationkey, 0)                                   AS nk_nullable,
           coalesce(nullif(c_acctbal, c_acctbal), -1.0)             AS always_minus1
    FROM customer
    """,
)
def h_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """if/coalesce/nullif conditional battery."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "rich").otherwise("normal").alias("tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")
        ).alias("seg_or_default"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nullable"),
        F.coalesce(F.nullif(F.col("c_acctbal"), F.col("c_acctbal")), F.lit(-1.0)).alias(
            "always_minus1"
        ),
    )


@register(
    "h_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sk,
           count(*) AS c
    FROM events GROUP BY event_type
    """,
)
def h_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON event-payload extraction + aggregation — the central reference
    event-tracking idiom. Measured head-to-head at sf0.1 (medians of 7):
    get_json_object 53 ms, parse_json/VARIANT 62 ms, from_json+schema
    73 ms, regexp 62 ms — for ONE shallow key the path query wins (the
    typed-struct parse only pays off when several fields are extracted
    from the same parse). The remaining wall time equals the no-JSON
    groupBy-count floor, i.e. scheduler+Arrow overhead, not parsing.
    The plan stays one pruned scan (event_type, props) + one hash agg."""
    ev = load(spark, sf_dir, "events")
    # decimal accumulator (the e4() rule): event-type groups are corpus
    # fractions and the summed value comes from an arbitrary JSON payload
    # (no magnitude bound), so a long sum can wrap past int64 at scale
    # while the DuckDB oracle widens to HUGEINT; display recasts. Measured
    # +2 ms over the long sum at sf0.1 (50.1 -> 52.1 ms min-of-7).
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("decimal(38,0)"))
        .cast("long")
        .alias("sk"),
        F.count("*").alias("c"),
    )


@register(
    "h_json_struct",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS INTEGER) AS k_typed,
           CAST(props ->> '$.k' AS BIGINT)  AS k_scalar
    FROM events
    """,
)
def h_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with from_json + schema (vs path extraction)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_typed"),
        F.get_json_object("props", "$.k").cast("long").alias("k_scalar"),
    )


@register(
    "h_variant",
    oracle="""
    SELECT event_id,
           TRY_CAST(TRY_CAST(props AS JSON) ->> '$.k' AS BIGINT)       AS k_big,
           (TRY_CAST(props AS JSON) ->> '$.k')                         AS k_str,
           TRY_CAST(TRY_CAST(props AS JSON) ->> '$.missing' AS BIGINT) AS k_missing,
           (TRY_CAST(substr(props, 1, length(props) - 1) AS JSON) IS NULL)
                                                                   AS truncated_is_null
    FROM events
    """,
)
def h_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT battery — the third member of the JSON trio
    (h_json = path extraction, h_json_struct = from_json + schema,
    h_variant = the open-schema VARIANT type): try_parse_json into a
    VARIANT, typed try_variant_get extraction (bigint and string off
    ONE parse — where get_json_object re-parses per path), a missing
    path (NULL, not an error), and try_parse_json's malformed-input
    contract (a truncated payload parses to NULL; both engines are
    null-safe end-to-end — try_parse_json / try_variant_get on Spark,
    TRY_CAST at both the parse and the bigint cast on DuckDB — so a
    malformed payload or a non-integer k degrades to NULL instead of
    erroring one engine; note the ENGINES' lenient-coercion edge rules
    for a non-integer k are their own and the fixture pins k to small
    ints, so only the no-error contract is cross-engine normative). The VARIANT
    column itself never reaches the output — the driver canonicalizer
    takes scalars only — so every extraction lands as bigint / string
    / boolean.

    At 100 TB: parse once per row, map-only, pruned (event_id, props)
    scan; VARIANT's binary encoding makes repeated path access cheap
    without declaring a schema up front (measured in the h_json
    docstring: 62 ms vs 53 ms for one shallow key at sf0.1 — variant
    pays off at several fields per payload)."""
    ev = load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_big"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.try_parse_json(F.expr("substr(props, 1, length(props) - 1)"))
        .isNull()
        .alias("truncated_is_null"),
    )


@register(
    "h_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER)          AS n_tokens,
           list_contains(string_split(text, ' '), 'join')         AS has_join,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ',')
                                                                  AS first3,
           string_split(text, ' ')[2]                             AS second_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
                                                                  AS vocab
    FROM documents
    """,
)
def h_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over tokenized text (lateral-view-free ops;
    explode/posexplode are exercised by k_tfidf_topterms and j_udtf).
    Array-valued results (slice, distinct-sorted vocab) are string-joined
    in the checked output — array cells crash the driver canonicalizer."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "join").alias("has_join"),
        F.concat_ws(",", F.slice(toks, 1, 3)).alias("first3"),
        F.element_at(toks, 2).alias("second_token"),
        F.concat_ws(",", F.sort_array(F.array_distinct(toks))).alias("vocab"),
    )


@register(
    "h_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 20
    """,
)
def h_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW EXPLODE analog: one row per token."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@register(
    "h_map",
    oracle="""
    SELECT doc_id,
           lang   AS lang_from_map,
           source AS src_from_map,
           2      AS n_keys
    FROM documents
    """,
)
def h_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map config-string parsing (k1:v1,k2:v2 idiom): build the
    string, parse it back, extract typed values."""
    d = load(spark, sf_dir, "documents")
    conf = F.concat(F.lit("lang:"), "lang", F.lit(",src:"), "source")
    m = F.str_to_map(conf, F.lit(","), F.lit(":"))
    return d.select(
        "doc_id",
        m.getItem("lang").alias("lang_from_map"),
        m.getItem("src").alias("src_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "h_hash",
    oracle="""
    SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
    FROM documents
    """,
)
def h_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row fingerprints for dedup: md5 + sha2-256 (hex, lowercase in both)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@register("h_hash_engine")
def h_hash_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes (xxhash64 / crc32 / murmur3) — no DuckDB
    equivalent, rows-only. These are the cheap shuffle-friendly
    fingerprints for 100 TB dedup (no crypto overhead)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("h_xx64"),
        F.crc32("text").alias("h_crc32"),
        F.hash("text").alias("h_murmur3"),
    )


@register(
    "h_url",
    oracle="""
    WITH u AS (
        SELECT event_id,
               'https://opay.example/' || event_type || '?uid=' || user_id
                   AS url
        FROM events
    )
    SELECT event_id,
           regexp_extract(url, 'https?://([^/]+)', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]uid=([^&]*)', 1) AS uid
    FROM u
    """,
)
def h_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`parse_url` — the Hive event-tracking idiom for splitting page/
    referrer URLs into host, path, and query parameters. The URL is
    synthesized from event columns (no URL column in the fixtures); the
    oracle mirrors parse_url with anchored regexps. Pure JVM codegen, no
    shuffle — scales linearly with the scan."""
    ev = load(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://opay.example/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("uid")).alias("uid"),
    )


@register(
    "h_date_spine",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                      INTERVAL 1 DAY))::DATE AS d
    ),
    daily AS (
        SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate <  DATE '1995-04-01'
        GROUP BY 1
    )
    SELECT strftime(spine.d, '%Y-%m-%d') AS dt,
           coalesce(daily.n, 0) AS n_orders
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def h_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill — `sequence` + `explode` generates the
    calendar dimension, then a left join zero-fills days with no orders
    (dashboards need every day present, not just days with data; the
    reference's report jobs join against a Hive calendar table for this).
    The spine is a single in-memory row exploded JVM-side and broadcast;
    the daily aggregate is the only shuffle."""
    o = load(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"), F.lit("1995-03-31").cast("date")
            )
        ).alias("d")
    )
    daily = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
        )
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    return (
        spine.join(daily, spine.d == F.to_timestamp(daily.d), "left")
        .select(
            F.date_format(spine.d, "yyyy-MM-dd").alias("dt"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "h_geo_haversine",
    oracle="""
    WITH pts AS (
        SELECT event_id,
               6.4 + (('0x' || substr(md5('la:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2000) / 1000.0 AS lat1,
               3.3 + (('0x' || substr(md5('lo:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2000) / 1000.0 AS lon1,
               6.4 + (('0x' || substr(md5('lb:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 2000) / 1000.0 AS lat2,
               3.3 + (('0x' || substr(md5('lc:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 2000) / 1000.0 AS lon2
        FROM events
    )
    SELECT event_id,
           round(2 * 6371.0 * asin(sqrt(
               sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
               + cos(radians(lat1)) * cos(radians(lat2))
                 * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)
           )), 3) AS dist_km,
           CAST(floor(2 * 6371.0 * asin(sqrt(
               sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
               + cos(radians(lat1)) * cos(radians(lat2))
                 * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)
           )) / 25) AS INT) AS dist_band
    FROM pts
    """,
)
def h_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine trip distance — the ride-hailing ETL staple (pickup ->
    dropoff km per trip, plus a 25 km fare band). The fixtures carry no
    coordinates, so pickup/dropoff points are synthesized
    deterministically from md5 bits into a Lagos-sized 2°x2° box (same
    integer arithmetic in both engines — only the trig differs, and the
    3-decimal rounding sits ~1e9x above the cross-engine ulp noise).
    Map-only JVM math: no UDF, no shuffle, scales with input splits.
    """
    ev = load(spark, sf_dir, "events")

    def h60(prefix: str, col):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")

    lat1 = 6.4 + F.pmod(h60("la:", F.col("user_id")), F.lit(2000)) / 1000.0
    lon1 = 3.3 + F.pmod(h60("lo:", F.col("user_id")), F.lit(2000)) / 1000.0
    lat2 = 6.4 + F.pmod(h60("lb:", F.col("event_id")), F.lit(2000)) / 1000.0
    lon2 = 3.3 + F.pmod(h60("lc:", F.col("event_id")), F.lit(2000)) / 1000.0
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) * F.sin(dlmb)
    )
    dist = 2 * 6371.0 * F.asin(F.sqrt(a))
    return ev.select(
        "event_id",
        F.round(dist, 3).alias("dist_km"),
        F.floor(dist / 25).cast("int").alias("dist_band"),
    )


@register(
    "h_geo_grid_heatmap",
    oracle=f"""
    WITH pts AS (
        SELECT ('0x' || substr(md5('la:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2000 AS la,
               ('0x' || substr(md5('lo:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2000 AS lo,
               value
        FROM events
    )
    SELECT CAST(floor(la / 100.0) AS INT) AS cell_y,
           CAST(floor(lo / 100.0) AS INT) AS cell_x,
           count(*) AS n_pickups,
           {sql_sum_e4_2dp("value")} AS gmv
    FROM pts GROUP BY 1, 2
    """,
)
def h_geo_grid_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pickup-density grid heatmap — the demand/GMV-by-zone report every
    ride/delivery dashboard renders: bucket each pickup point into a
    20x20 grid (0.1° cells over the same synthesized city box as
    h_geo_haversine) and aggregate trip count + value per cell. Cell ids
    are exact integer arithmetic (no float boundary risk); one hash-agg
    shuffle over at most 400 cells, partial-agg friendly at any scale —
    the geohash-prefix rollup in miniature.
    """
    ev = load(spark, sf_dir, "events")

    def h60(prefix: str, col):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")

    la = F.pmod(h60("la:", F.col("user_id")), F.lit(2000))
    lo = F.pmod(h60("lo:", F.col("user_id")), F.lit(2000))
    return (
        ev.select(
            F.floor(la / 100).cast("int").alias("cell_y"),
            F.floor(lo / 100).cast("int").alias("cell_x"),
            "value",
        )
        .groupBy("cell_y", "cell_x")
        .agg(
            F.count("*").alias("n_pickups"),
            sum_e4_2dp(F.col("value")).alias("gmv"),
        )
    )


@register(
    "h_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                         AS low_byte,
           o_orderkey | 4096                        AS with_flag,
           xor(o_orderkey, 21845)                   AS xored,
           o_orderkey << 3                          AS shl3,
           o_orderkey >> 2                          AS shr2,
           CAST(bit_count(o_orderkey) AS INTEGER)   AS popcount
    FROM orders
    """,
)
def h_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function battery — the flag-mask / hash-mixing / bucket
    arithmetic primitives (SimHash's bit votes, grouping_id masks, and
    bloom-style fingerprints all reduce to these): AND/OR/XOR, shifts,
    and population count on a bigint key. All JVM codegen; the one
    dialect seam is bit_count's return width (Spark INT vs DuckDB
    TINYINT), aligned by casting the oracle UP to the Spark type per
    the repo's widen-don't-narrow rule.
    """
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "h_nested_hof",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> len(x) >= 5)) AS INTEGER)
               AS n_long,
           len(list_filter(toks, x -> x = 'spark')) > 0     AS has_spark,
           len(list_filter(toks, x -> len(x) < 12)) = len(toks)
                                                            AS all_short,
           CAST(list_reduce(list_transform(toks, x -> len(x)),
                            (a, b) -> a + b) AS BIGINT)     AS total_chars,
           coalesce(array_to_string(
               list_filter(toks, x -> len(x) >= 6), ','), '') AS long_toks
    FROM t
    """,
)
def h_nested_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function battery on array columns — filter / exists /
    forall / aggregate / filtered projection, the JVM-side lambda
    surface that keeps per-row collection logic OUT of Python (each of
    these over a UDF is the difference between codegen and an Arrow
    round trip). DuckDB's list_filter/list_reduce lambdas mirror each
    form; exists/forall are spelled via list_filter lengths there since
    the engines' truth-aggregation builtins differ, and DuckDB's
    array_to_string maps an EMPTY list to NULL where Spark concat_ws
    yields '' — coalesced in the oracle.

    Map-only, zero shuffles; the arrays never leave their row.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) >= 5)).alias("n_long"),
        F.exists(toks, lambda x: x == "spark").alias("has_spark"),
        F.forall(toks, lambda x: F.length(x) < 12).alias("all_short"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.concat_ws(",", F.filter(toks, lambda x: F.length(x) >= 6)).alias(
            "long_toks"
        ),
    )


@register(
    "h_try_arith",
    oracle="""
    SELECT event_id,
           try_cast(event_type AS INTEGER)            AS bad_cast,
           try_cast(CAST(event_id AS VARCHAR) AS BIGINT) AS good_cast,
           value / nullif(event_id % 5, 0)            AS safe_ratio,
           string_split(event_type, '_')[5]           AS oob_element
    FROM events
    """,
)
def h_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe (`try_`) arithmetic battery — the ANSI-mode survival
    kit for dirty feeds: try_cast of a non-numeric string -> NULL (not
    a job-killing cast error), try_divide by a zero denominator ->
    NULL, try_element_at past the array end -> NULL. (Sibling battery:
    h_try_arithmetic covers the try_add/try_multiply OVERFLOW edges on
    orders — the two IDs are distinct demonstrations, not a duplicate
    registration.) Under ANSI SQL
    mode (Spark 4 default) the non-try forms THROW, so every dirty-feed
    projection at 100 TB uses these — one malformed row must not kill
    a 10k-task stage. Dialect seams: DuckDB double/0 is NULL for its
    nullable division only via nullif (spelled explicitly), and its
    1-based list index returns NULL out of bounds natively, matching
    try_element_at.
    """
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("int").alias("bad_cast"),
        F.col("event_id").cast("string").try_cast("bigint").alias("good_cast"),
        F.try_divide("value", F.col("event_id") % 5).alias("safe_ratio"),
        F.try_element_at(F.split("event_type", "_"), F.lit(5)).alias("oob_element"),
    )


@register(
    "h_encode_battery",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
               = substr(text, 1, 24) AS rt_ok,
           hex(substr(text, 1, 16)) AS hx
    FROM documents WHERE doc_id < 200
    """,
)
def h_encode_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-text codec battery — base64 encode, full decode round
    trip, and hex dump (the blob-in-JSON / wire-format / debugging
    idioms: attachments in event payloads, keys in logs). Both engines
    agree byte-for-byte on standard base64 (same alphabet + padding)
    and uppercase hex, probed empirically before registering. Map-only.
    """
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    head24 = F.substring("text", 1, 24)
    b64 = F.base64(F.encode(head24, "UTF-8"))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        (F.decode(F.unbase64(b64), "UTF-8") == head24).alias("rt_ok"),
        F.hex(F.substring("text", 1, 16)).alias("hx"),
    )


@register(
    "h_collation",
    oracle="""
    SELECT lower(mixed) AS lang_ci, count(*) AS n
    FROM (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS mixed
        FROM documents
    ) GROUP BY lower(mixed)
    """,
)
def h_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4.0): a mixed-case language column
    (every even doc_id upper-cased) grouped under UTF8_LCASE, so 'EN'
    and 'en' land in ONE group with no lower() rewrite at the
    grouping site — the collation IS the equality semantics, and
    comparisons/joins/sorts on the collated column inherit it. The
    displayed key is lower()-normalized (and cast back to the default
    collation) because the collated GROUP BY keeps an arbitrary
    representative casing — whichever member a partition saw first —
    which would make the raw key partitioning-dependent; lower() is
    casing-invariant across the equality class, so the output is
    deterministic. Oracle groups by lower() — identical semantics on
    this ASCII fixture (UTF8_LCASE and lower() diverge only on
    locale-sensitive codepoints)."""
    d = load(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(
        F.col("lang")
    )
    return (
        d.select(F.collate(mixed, "UTF8_LCASE").alias("ml"))
        .groupBy("ml")
        .agg(F.count("*").alias("n"))
        .select(F.lower("ml").cast("string").alias("lang_ci"), "n")
    )


@register(
    "h_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_custkey % 3) END          AS safe_div,
           CASE WHEN o_orderkey = 0
                THEN 9223372036854775807 ELSE NULL END           AS add_edge,
           CASE WHEN o_orderkey BETWEEN 0 AND 1
                THEN o_orderkey * 4611686018427387904
                ELSE NULL END                                    AS mul_edge
    FROM orders
    """,
)
def h_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* arithmetic (try_divide / try_add / try_multiply)
    — NULL instead of an error or a silent wrap, the spelling a
    pipeline uses under spark.sql.ansi.enabled. (Sibling battery:
    h_try_arith covers try_cast/try_element_at on the events feed —
    the two IDs are distinct demonstrations, not a duplicate
    registration.) Covered edges: division by a zero
    modulus, int64 addition at the MaxValue edge (overflows — and
    try_add nulls — for every o_orderkey > 0), and multiplication by
    2^62 (overflows for any factor above 1). The oracle spells each
    as an explicit CASE guard because DuckDB has no try-arithmetic —
    which is the point of the demonstration: the try_* family IS that
    guard, applied engine-side without enumerating failure conditions
    by hand. The division result is one IEEE op on identical operands
    (hash-exact); orderkeys are non-negative in the fixture, so the
    overflow CASEs cover the whole key domain."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3).alias(
            "safe_div"
        ),
        F.try_add(
            F.lit(9223372036854775807).cast("long"), F.col("o_orderkey")
        ).alias("add_edge"),
        F.try_multiply(
            F.col("o_orderkey"), F.lit(4611686018427387904).cast("long")
        ).alias("mul_edge"),
    )
