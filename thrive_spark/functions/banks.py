"""§2.8 Scalar function banks.

One wide-projection query per bank so the whole function inventory is
oracle-checked without dozens of micro-queries. All functions are
built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd;
no Python in any hot path. Cross-engine alignment notes are inline
(DuckDB's dayofweek is 0-based, its regexp_replace needs the 'g'
flag, its ceil/floor return doubles, etc.).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators._util import r4
from ..registry import query
from ..tables import Tables


@query(
    "fn_string_bank",
    oracle="""
    SELECT p_partkey,
           p_name || '|' || p_brand AS c_concat,
           substr(p_name, 1, 5) AS c_substr,
           upper(p_name) AS c_upper,
           lower(p_brand) AS c_lower,
           trim('  ' || p_name || '  ') AS c_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS c_lpad,
           CAST(length(p_name) AS BIGINT) AS c_length,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           regexp_extract(p_name, '([aeiou][a-z]+)', 1) AS c_re_extract,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS c_re_replace,
           CAST(strpos(p_name, 'a') AS BIGINT) AS c_instr,
           translate(p_name, 'abc', 'xyz') AS c_translate,
           reverse(p_brand) AS c_reverse,
           repeat('ab', 3) AS c_repeat
    FROM part
    """,
)
def fn_string_bank(spark, sf_dir):
    """concat/substr/case/trim/lpad/length/split/regexp/instr/translate/reverse/repeat bank."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.concat("p_name", F.lit("|"), "p_brand").alias("c_concat"),
        F.substring("p_name", 1, 5).alias("c_substr"),
        F.upper("p_name").alias("c_upper"),
        F.lower("p_brand").alias("c_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("c_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("c_lpad"),
        F.length("p_name").cast("bigint").alias("c_length"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_tokens"),
        F.regexp_extract("p_name", "([aeiou][a-z]+)", 1).alias("c_re_extract"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("c_re_replace"),
        F.instr("p_name", "a").cast("bigint").alias("c_instr"),
        F.translate("p_name", "abc", "xyz").alias("c_translate"),
        F.reverse("p_brand").alias("c_reverse"),
        F.repeat(F.lit("ab"), 3).alias("c_repeat"),
    )


@query(
    "fn_date_bank",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS c_year,
           CAST(month(o_orderdate) AS BIGINT) AS c_month,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS c_day,
           date_trunc('month', o_orderdate) AS c_trunc_month,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS c_plus_30d,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
               AS c_days_to_y2k,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS c_last_day,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS c_dow0,
           epoch_us(o_orderdate) AS c_epoch_us,
           strftime(o_orderdate, '%Y-%m') AS c_ym
    FROM orders
    """,
)
def fn_date_bank(spark, sf_dir):
    """year/month/day, date_trunc, date_add, datediff, last_day, dow, epoch, strftime bank."""
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("c_year"),
        F.month("o_orderdate").cast("bigint").alias("c_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("c_day"),
        F.date_trunc("month", "o_orderdate").alias("c_trunc_month"),
        F.date_add(d, 30).cast("string").alias("c_plus_30d"),
        # Spark datediff(end, start); DuckDB datediff('day', start, end)
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("bigint").alias(
            "c_days_to_y2k"
        ),
        F.last_day(d).cast("string").alias("c_last_day"),
        # Spark dayofweek is 1-based (Sunday=1); DuckDB is 0-based
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("c_dow0"),
        # o_orderdate is TIMESTAMP_NTZ in parquet; unix_micros needs TIMESTAMP
        # (the session TZ is pinned to UTC, so the cast is value-preserving)
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("c_epoch_us"),
        F.date_format("o_orderdate", "yyyy-MM").alias("c_ym"),
    )


@query(
    "agg_bitwise_bool",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey & 1023) AS BIGINT) AS c_bit_and,
           CAST(bit_or(o_orderkey & 1023) AS BIGINT) AS c_bit_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS c_bit_xor,
           bool_and(o_totalprice IS NULL OR o_totalprice > 0)
               AS c_bool_and,
           bool_or(o_totalprice > 250000.0) AS c_bool_or,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT)
               AS c_count_if
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bitwise_bool(spark, sf_dir):
    """Bitwise / boolean AGGREGATE inventory: bit_and/bit_or/bit_xor
    (set-membership folds — bit_xor is the engine-portable
    convergence-checksum fold the iterative-graph loops rely on,
    CLAUDE.md) plus bool_and/bool_or/count_if predicates. NULL
    discipline matches: both engines skip NULL inputs in every one of
    these folds (bool_and guards the nullable o_totalprice
    explicitly so the predicate itself is never NULL)."""
    t = Tables(spark, sf_dir)
    masked = F.col("o_orderkey").bitwiseAND(F.lit(1023))
    return t.orders.groupBy("o_orderstatus").agg(
        F.bit_and(masked).cast("bigint").alias("c_bit_and"),
        F.bit_or(masked).cast("bigint").alias("c_bit_or"),
        F.bit_xor("o_orderkey").cast("bigint").alias("c_bit_xor"),
        F.bool_and(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") > 0)
        ).alias("c_bool_and"),
        F.bool_or(F.col("o_totalprice") > 250000.0).alias("c_bool_or"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT")
        .cast("bigint")
        .alias("c_count_if"),
    )


@query(
    "fn_interval_bank",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
               AS c_plus_3mo,
           CAST(CAST(o_orderdate - INTERVAL 90 DAY AS DATE) AS VARCHAR)
               AS c_minus_90d,
           o_orderdate + INTERVAL 90 MINUTE AS c_plus_90min,
           o_orderdate + INTERVAL '1 day 2 hours 30 minutes' AS c_mixed,
           CAST(CAST(o_orderdate - INTERVAL 1 YEAR AS DATE) AS VARCHAR)
               AS c_back_1y,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(o_orderdate + INTERVAL 2 MONTH AS DATE))
                AS BIGINT) AS c_2mo_days
    FROM orders
    """,
)
def fn_interval_bank(spark, sf_dir):
    """INTERVAL arithmetic bank (the one scalar family without an
    exhibit row through r9): interval literals, make_interval, date ±
    year/month/day/minute intervals, and a month-span day count whose
    value depends on calendar month lengths.

    Cross-engine notes that make this hash-checkable: month/year
    arithmetic is CALENDAR-based and end-of-month-clamped identically
    in Spark and DuckDB (Jan 31 + 1 month = Feb 28/29 in both); mixed
    day-time intervals add exact microsecond counts; outputs are
    DATE-as-string / TIMESTAMP / BIGINT — never INTERVAL-typed, whose
    repr differs per engine. All map-only JVM expressions; verified on
    pre-1970 dates by the r10 stress corpus (calendar math has no
    epoch discontinuity)."""
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.expr("cast(o_orderdate + interval 3 month as date)")
        .cast("string")
        .alias("c_plus_3mo"),
        F.expr("cast(o_orderdate - interval 90 day as date)")
        .cast("string")
        .alias("c_minus_90d"),
        F.expr("o_orderdate + interval 90 minute").alias("c_plus_90min"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0, 1, 2, 30, 0)"
        ).alias("c_mixed"),
        F.expr("cast(o_orderdate - interval 1 year as date)")
        .cast("string")
        .alias("c_back_1y"),
        F.datediff(
            F.expr("cast(o_orderdate + interval 2 month as date)"),
            d.cast("date"),
        )
        .cast("bigint")
        .alias("c_2mo_days"),
    )


@query(
    "fn_math_bank",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS c_round,
           round(abs(o_totalprice - 150000.0), 4) AS c_abs,
           CAST(ceil(o_totalprice) AS BIGINT) AS c_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS c_floor,
           round(pow(o_totalprice / 100000.0, 2), 4) AS c_pow,
           round(sqrt(o_totalprice), 4) AS c_sqrt,
           round(ln(o_totalprice), 4) AS c_ln,
           round(log10(o_totalprice), 4) AS c_log10,
           round(exp(o_totalprice / 400000.0), 4) AS c_exp,
           CAST(sign(o_totalprice - 150000.0) AS BIGINT) AS c_sign,
           CAST(((o_orderkey - 1000) % 13 + 13) % 13 AS BIGINT) AS c_pmod
    FROM orders
    """,
)
def fn_math_bank(spark, sf_dir):
    """round/abs/ceil/floor/pow/sqrt/ln/log10/exp/sign/pmod math bank."""
    t = Tables(spark, sf_dir)
    p = F.col("o_totalprice")
    return t.orders.select(
        "o_orderkey",
        F.round(p, 2).alias("c_round"),
        r4(F.abs(p - 150000.0)).alias("c_abs"),
        F.ceil(p).cast("bigint").alias("c_ceil"),
        F.floor(p).cast("bigint").alias("c_floor"),
        r4(F.pow(p / 100000.0, 2)).alias("c_pow"),
        r4(F.sqrt(p)).alias("c_sqrt"),
        r4(F.log(p)).alias("c_ln"),
        r4(F.log10(p)).alias("c_log10"),
        r4(F.exp(p / 400000.0)).alias("c_exp"),
        F.signum(p - 150000.0).cast("bigint").alias("c_sign"),
        F.pmod(F.col("o_orderkey") - 1000, F.lit(13)).cast("bigint").alias("c_pmod"),
    )


@query(
    "fn_conditional_bank",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000.0 THEN 'low'
                WHEN o_totalprice < 250000.0 THEN 'mid'
                ELSE 'high' END AS c_case,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS c_coalesce,
           nullif(o_orderstatus, 'P') AS c_nullif,
           round(greatest(o_totalprice, 200000.0), 4) AS c_greatest,
           round(least(o_totalprice, 200000.0), 4) AS c_least,
           CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS BIGINT) AS c_if
    FROM orders
    """,
)
def fn_conditional_bank(spark, sf_dir):
    """CASE/coalesce/nullif/greatest/least conditional-function bank."""
    t = Tables(spark, sf_dir)
    p = F.col("o_totalprice")
    return t.orders.select(
        "o_orderkey",
        F.when(p < 100000.0, "low")
        .when(p < 250000.0, "mid")
        .otherwise("high")
        .alias("c_case"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "c_coalesce"
        ),
        F.nullif("o_orderstatus", F.lit("P")).alias("c_nullif"),
        r4(F.greatest(p, F.lit(200000.0))).alias("c_greatest"),
        r4(F.least(p, F.lit(200000.0))).alias("c_least"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .cast("int")
        .cast("bigint").alias("c_if"),
    )


@query(
    "fn_array_bank",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS c_size,
           CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
               AS c_first,
           array_to_string(list_transform(embedding[1:3],
               x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)), ',')
               AS c_slice,
           array_to_string(
               list_sort(list_distinct([label, (label * 2) % 10, label])), ',')
               AS c_int_arr,
           array_to_string(list_transform(embedding[1:3],
               x -> CAST(floor(CAST(x AS DOUBLE) * 2 * 10000 + 0.5) AS BIGINT)), ',')
               AS c_doubled,
           CAST(floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                      * 10000 + 0.5) AS BIGINT) AS c_sum,
           list_contains(embedding, embedding[1]) AS c_contains,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'max'), 4) AS c_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS c_n_pos
    FROM embeddings
    """,
)
def fn_array_bank(spark, sf_dir):
    """Array + higher-order functions over the embedding column. The
    fold/transform/filter lambdas run inside codegen — this is also
    the building block of the cosine similarity operators (§2.11).

    Array-valued results are serialized to CSV text (fixed-point for
    floats) — the driver canonicalizer cannot hash list cells, and
    float→string formatting differs across engines."""
    t = Tables(spark, sf_dir)
    emb = F.col("embedding")
    dbl = F.transform(emb, lambda x: x.cast("double"))

    def fp(x, mul=1.0):
        return F.floor(x.cast("double") * mul * 10000 + 0.5).cast("bigint")

    return t.embeddings.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("c_size"),
        fp(F.element_at(emb, 1)).alias("c_first"),
        F.array_join(F.transform(F.slice(emb, 1, 3), lambda x: fp(x)), ",").alias(
            "c_slice"
        ),
        F.array_join(
            F.sort_array(
                F.array_distinct(
                    F.array(F.col("label"), (F.col("label") * 2) % 10, F.col("label"))
                )
            ),
            ",",
        ).alias("c_int_arr"),
        F.array_join(
            F.transform(F.slice(emb, 1, 3), lambda x: fp(x, 2.0)), ","
        ).alias("c_doubled"),
        fp(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)).alias(
            "c_sum"
        ),
        F.array_contains(emb, F.element_at(emb, 1)).alias("c_contains"),
        F.round(F.array_max(dbl), 4).alias("c_max"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("c_n_pos"),
    )


@query(
    "fn_array_explode",
    oracle="""
    SELECT vec_id, CAST(i AS BIGINT) AS pos,
           round(CAST(embedding[i] AS DOUBLE), 4) AS val
    FROM embeddings, generate_series(1, 4) AS s(i)
    WHERE vec_id < 50 AND i <= len(embedding)
    """,
)
def fn_array_explode(spark, sf_dir):
    """posexplode of an array slice (1-based pos to align with SQL)."""
    t = Tables(spark, sf_dir)
    sliced = t.embeddings.filter(F.col("vec_id") < 50).select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos0", "v")
    )
    return sliced.select(
        "vec_id",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.round(F.col("v").cast("double"), 4).alias("val"),
    )


@query(
    "fn_map_bank",
    oracle="""
    WITH m AS (
        SELECT event_id,
               map(['k', 'etype'],
                   [CASE WHEN json_valid(props)
                         THEN CAST(CAST(json_extract_string(props, '$.k')
                                        AS BIGINT) AS VARCHAR) END,
                    event_type]) AS mp
        FROM events
    )
    SELECT event_id,
           mp['k'][1] AS k_val,
           mp['etype'][1] AS etype_val,
           CAST(cardinality(mp) AS BIGINT) AS n_keys,
           list_contains(map_keys(mp), 'k') AS has_k
    FROM m
    """,
)
def fn_map_bank(spark, sf_dir):
    """create_map + element_at / map_keys / cardinality over a JSON-derived map."""
    t = Tables(spark, sf_dir)
    mp = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").cast("bigint").cast("string"),
        F.lit("etype"),
        F.col("event_type"),
    )
    d = t.events.select("event_id", mp.alias("mp"))
    return d.select(
        "event_id",
        F.element_at("mp", "k").alias("k_val"),
        F.element_at("mp", "etype").alias("etype_val"),
        F.size(F.map_keys("mp")).cast("bigint").alias("n_keys"),
        F.array_contains(F.map_keys("mp"), "k").alias("has_k"),
    )


@query(
    "fn_json_bank",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k_int,
           to_json(struct_pack(id := event_id, t := event_type)) AS c_to_json,
           CASE WHEN json_valid(props)
                THEN array_to_string(
                         list_sort(CAST(json_keys(props) AS VARCHAR[])), ',')
           END AS c_keys,
           coalesce(json_valid(props), false) AS c_valid
    FROM events
    """,
)
def fn_json_bank(spark, sf_dir):
    """The reference's core mapper surface [R]: JSON extraction into
    typed columns, plus re-serialization."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_int"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("t"))
        ).alias("c_to_json"),
        F.array_join(F.sort_array(F.json_object_keys("props")), ",").alias("c_keys"),
        F.get_json_object("props", "$").isNotNull().alias("c_valid"),
    )


@query(
    "fn_hash_bank",
    oracle="""
    SELECT doc_id, md5(text) AS c_md5, sha256(text) AS c_sha256
    FROM documents
    """,
)
def fn_hash_bank(spark, sf_dir):
    """Portable digest bank: md5 + sha256 of document text."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5("text").alias("c_md5"),
        F.sha2("text", 256).alias("c_sha256"),
    )


@query("fn_hash_spark")  # rows-only: Spark-seeded hash functions have
# no cross-engine twin (xxhash64 seed=42, Murmur3 seed=42)
def fn_hash_spark(spark, sf_dir):
    """Spark-native hash bank: xxhash64, murmur3, crc32, sha1 (rows-only: engine-specific seeds)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.xxhash64("text").alias("c_xxhash64"),
        F.hash("text").cast("bigint").alias("c_murmur3"),
        F.crc32(F.encode("text", "utf-8")).alias("c_crc32"),
        F.sha1("text").alias("c_sha1"),
    )


@query(
    "fn_url_bank",
    oracle="""
    WITH u AS (
        SELECT doc_id, source, lang, n_chars,
               'https://' || source || '.example.com/docs/' || doc_id
                   || '?lang=' || lang || '&n=' || n_chars AS c_url
        FROM documents
    )
    SELECT doc_id, c_url,
           CASE WHEN c_url IS NOT NULL
                THEN source || '.example.com' END AS c_host,
           CASE WHEN c_url IS NOT NULL
                THEN '/docs/' || doc_id END AS c_path,
           CASE WHEN c_url IS NOT NULL
                THEN 'lang=' || lang || '&n=' || n_chars END AS c_query,
           CASE WHEN c_url IS NOT NULL THEN lang END AS c_lang_param,
           CASE WHEN c_url IS NOT NULL
                THEN CAST(n_chars AS VARCHAR) END AS c_n_param,
           CASE WHEN c_url IS NOT NULL THEN 'example.com' END AS c_domain,
           CASE WHEN c_url IS NOT NULL THEN source END AS c_subdomain,
           CASE WHEN c_url IS NOT NULL
                THEN CAST(doc_id AS VARCHAR) END AS c_path_leaf,
           CASE WHEN c_url IS NOT NULL THEN 'https' END AS c_scheme
    FROM u
    """,
)
def fn_url_bank(spark, sf_dir):
    """URL function inventory — the domain/host/path/query-param
    extraction a web-corpus pipeline runs for domain filtering,
    blocklists, and per-site quotas. A canonical URL is constructed
    from document columns, then every component is recovered with
    Spark's parse_url / substring_index; the oracle states the
    expected components directly from the same columns, so the check
    verifies the parser inventory, not string round-tripping."""
    t = Tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    d = t.documents.select("doc_id", url.alias("c_url"))
    host = F.parse_url(F.col("c_url"), F.lit("HOST"))
    path = F.parse_url(F.col("c_url"), F.lit("PATH"))
    return d.select(
        "doc_id",
        "c_url",
        host.alias("c_host"),
        path.alias("c_path"),
        F.parse_url(F.col("c_url"), F.lit("QUERY")).alias("c_query"),
        F.parse_url(F.col("c_url"), F.lit("QUERY"), F.lit("lang")).alias(
            "c_lang_param"
        ),
        F.parse_url(F.col("c_url"), F.lit("QUERY"), F.lit("n")).alias(
            "c_n_param"
        ),
        F.substring_index(host, ".", -2).alias("c_domain"),
        F.substring_index(host, ".", 1).alias("c_subdomain"),
        F.substring_index(path, "/", -1).alias("c_path_leaf"),
        F.parse_url(F.col("c_url"), F.lit("PROTOCOL")).alias("c_scheme"),
    )


@query(
    "fn_bitwise_bank",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_orderkey & l_partkey AS c_and,
           l_orderkey | l_partkey AS c_or,
           xor(l_orderkey, l_partkey) AS c_xor,
           ~l_orderkey AS c_not,
           l_orderkey << 3 AS c_shl,
           l_partkey >> 2 AS c_shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS c_popcount,
           l_orderkey & (l_orderkey - 1) AS c_clear_lowest,
           xor(l_orderkey >> 1, l_orderkey) AS c_gray
    FROM lineitem WHERE l_orderkey % 7 = 0
    """,
)
def fn_bitwise_bank(spark, sf_dir):
    """Bitwise function inventory — the mask/shift/popcount arithmetic
    behind bucketing keys, bloom/simhash probes, and the z-order
    layout. All JVM built-ins; DuckDB's xor is a function, Spark's an
    operator — semantics identical on BIGINT two's complement.
    """
    t = Tables(spark, sf_dir)
    k, p = F.col("l_orderkey"), F.col("l_partkey")
    return t.lineitem.filter(k % 7 == 0).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        k.bitwiseAND(p).alias("c_and"),
        k.bitwiseOR(p).alias("c_or"),
        k.bitwiseXOR(p).alias("c_xor"),
        F.bitwise_not(k).alias("c_not"),
        F.shiftleft(k, 3).alias("c_shl"),
        F.shiftright(p, 2).alias("c_shr"),
        F.bit_count(k).cast("bigint").alias("c_popcount"),
        k.bitwiseAND(k - 1).alias("c_clear_lowest"),
        F.shiftright(k, 1).bitwiseXOR(k).alias("c_gray"),
    )


@query(
    "fn_struct_bank",
    oracle="""
    SELECT o_orderkey,
           struct_extract(struct_pack(k := o_custkey, p := o_totalprice), 'k')
             AS c_field_int,
           struct_extract(struct_pack(k := o_custkey, p := o_totalprice), 'p')
             AS c_field_dbl,
           CASE WHEN struct_pack(a := o_custkey, b := o_orderstatus)
                   = struct_pack(a := o_custkey, b := o_orderstatus)
                THEN 1 ELSE 0 END::BIGINT AS c_struct_eq,
           struct_extract(
             CASE WHEN o_totalprice > 200000.0
                  THEN struct_pack(tag := 'big',  v := o_totalprice)
                  ELSE struct_pack(tag := 'small', v := o_totalprice) END,
             'tag') AS c_branch_tag
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def fn_struct_bank(spark, sf_dir):
    """Struct function inventory: construction, field extraction,
    whole-struct equality, and CASE over struct values — flattened to
    scalar outputs (complex-typed output columns are banned by the
    driver canonicalizer; see test_no_complex_output_columns)."""
    t = Tables(spark, sf_dir)
    s = F.struct(
        F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    eq = F.struct(
        F.col("o_custkey").alias("a"), F.col("o_orderstatus").alias("b")
    )
    branch = F.when(
        F.col("o_totalprice") > 200000.0,
        F.struct(F.lit("big").alias("tag"), F.col("o_totalprice").alias("v")),
    ).otherwise(
        F.struct(F.lit("small").alias("tag"), F.col("o_totalprice").alias("v"))
    )
    return t.orders.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        s.getField("k").alias("c_field_int"),
        s.getField("p").alias("c_field_dbl"),
        F.when(eq == eq, 1).otherwise(0).cast("bigint").alias("c_struct_eq"),
        branch.getField("tag").alias("c_branch_tag"),
    )


@query(
    "fn_regex_bank",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS c_first_word,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS c_second_word,
           CAST(CASE WHEN regexp_matches(text, 'data') THEN 1 ELSE 0 END
                AS BIGINT) AS c_has_data,
           regexp_replace(text, ' +', '_', 'g') AS c_underscored,
           CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
             AS c_n_fields,
           CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS BIGINT)
             AS c_n_a_words,
           regexp_extract(lang || '-' || source, '^([a-z]+)-(src[0-9]+)$', 1)
             AS c_lang_part,
           regexp_extract(lang || '-' || source, '^([a-z]+)-(src[0-9]+)$', 2)
             AS c_src_part
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def fn_regex_bank(spark, sf_dir):
    """Regex function inventory: extraction (group select), matching,
    global replace, split-count, and extract_all-count — on patterns
    inside the RE2 ∩ java.util.regex common subset (no backrefs, no
    lookaround), where both engines' semantics coincide. DuckDB's
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all default — the classic cross-engine trap, pinned here.
    """
    t = Tables(spark, sf_dir)
    tagged = F.concat_ws("-", F.col("lang"), F.col("source"))
    return t.documents.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("c_first_word"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("c_second_word"),
        F.when(F.col("text").rlike("data"), 1).otherwise(0).cast("bigint").alias("c_has_data"),
        F.regexp_replace("text", " +", "_").alias("c_underscored"),
        F.size(F.split("text", " +")).cast("bigint").alias("c_n_fields"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+a[a-z]*"), 0)).cast(
            "bigint"
        ).alias("c_n_a_words"),
        F.regexp_extract(tagged, r"^([a-z]+)-(src[0-9]+)$", 1).alias(
            "c_lang_part"
        ),
        F.regexp_extract(tagged, r"^([a-z]+)-(src[0-9]+)$", 2).alias(
            "c_src_part"
        ),
    )


@query(
    "fn_string_agg",
    oracle="""
    WITH top5 AS (
      SELECT n_regionkey, n_name,
             row_number() OVER (PARTITION BY n_regionkey
                                ORDER BY n_name) AS rn
      FROM nation
    )
    SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS members
    FROM top5 WHERE rn <= 3
    GROUP BY n_regionkey
    """,
)
def fn_string_agg(spark, sf_dir):
    """LISTAGG / string_agg: per-region member roster as one ordered,
    delimited string. Determinism rule: an UNORDERED string_agg is a
    different string on every shuffle — always collect, sort, then
    join (sort_array + array_join, same recipe as agg_collect_sorted)
    with an explicit ORDER BY in the oracle. Bounded here to 3
    members/group: unbounded string aggregation is a memory landmine
    at 100 TB (one hot group = one giant string on one executor)."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("n_regionkey").orderBy("n_name")
    top = t.nation.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    return (
        top.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_name")), "|"
            ).alias("members")
        )
    )


@query(
    "fn_masking_bank",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS seg_masked,
           regexp_replace(c_mktsegment, '[A-Za-z]', '*', 'g') AS seg_starred,
           substr(c_mktsegment, 1, 2) ||
               repeat('*', greatest(strlen(c_mktsegment) - 2, 0))
               AS seg_prefix_only,
           md5(CAST(c_custkey AS VARCHAR) || ':' || c_mktsegment)
               AS seg_tokenized
    FROM customer WHERE c_custkey <= 500
    """,
)
def fn_masking_bank(spark, sf_dir):
    """Data-masking function bank — the governance surface for
    PII-safe analytics exports: Spark's ``mask()`` (class-preserving
    substitution), full character starring, prefix-reveal masking,
    and deterministic tokenization (keyed hash — referentially stable
    across tables, so masked data still joins).

    The oracle spells mask() as its regexp definition (upper→X,
    lower→x, digit→n), which is also the portable form. All four are
    map-only scalar functions — masking 100 TB costs a scan; put it
    in the export writer, not a post-pass. (The repo's
    text_redact_pii covers free-text PII; this bank covers COLUMN
    masking.)"""
    t = Tables(spark, sf_dir)
    seg = F.col("c_mktsegment")
    return t.customer.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.mask(seg).alias("seg_masked"),
        F.regexp_replace(seg, "[A-Za-z]", "*").alias("seg_starred"),
        F.concat(
            F.substring(seg, 1, 2),
            F.expr(
                "repeat('*', greatest(length(c_mktsegment) - 2, 0))"
            ),
        ).alias("seg_prefix_only"),
        F.md5(
            F.concat(F.col("c_custkey").cast("string"), F.lit(":"), seg)
        ).alias("seg_tokenized"),
    )


@query(
    "fn_collation_bank",
    oracle="""
    WITH m AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                    ELSE p_name END AS name_mixed
        FROM part
    )
    SELECT lower(name_mixed) AS name_ci,
           count(*) AS n,
           count(DISTINCT name_mixed) AS n_case_variants,
           min(name_mixed) AS min_binary
    FROM m GROUP BY lower(name_mixed)
    """,
)
def fn_collation_bank(spark, sf_dir):
    """Spark 4 collation surface: grouping and distinct-counting under
    ``COLLATE UTF8_LCASE`` on a deliberately case-mixed column —
    case-insensitive semantics declared on the TYPE instead of
    scattering lower() through every predicate (the governance win:
    one declaration, every comparison/join/group obeys it).

    The oracle mirrors with explicit lower(), which is also the
    portable translation; min() stays on the binary column so the
    output exposes both collations side by side. Collated comparisons
    run JVM-side with no normalization copies — at 100 TB that is one
    less full-column transform per case-insensitive join."""
    t = Tables(spark, sf_dir)
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_name")
    ).otherwise(F.col("p_name"))
    m = t.part.select(mixed.alias("name_mixed"))
    ci = F.expr("name_mixed COLLATE UTF8_LCASE")
    return (
        m.groupBy(ci.alias("name_key"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("name_mixed").alias("n_case_variants"),
            F.min("name_mixed").alias("min_binary"),
        )
        .select(
            F.lower("name_key").alias("name_ci"),
            "n",
            "n_case_variants",
            "min_binary",
        )
    )


@query(
    "fn_try_bank",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS c_try_divide,
           CAST(NULL AS BIGINT) AS c_try_add_overflow,
           CASE WHEN o_orderkey % 7 = 0
                THEN CAST(o_orderkey AS BIGINT) * 1000000
                ELSE NULL END AS c_try_mul,
           CASE WHEN o_orderkey % 5 + 1 <= 3
                THEN ['a','b','c'][CAST(o_orderkey % 5 + 1 AS INT)]
                ELSE NULL END AS c_try_element
    FROM orders
    """,
)
def fn_try_bank(spark, sf_dir):
    """ANSI-safe `try_*` surface: division by a sometimes-zero
    denominator, BIGINT-overflow addition, conditional multiplication,
    and out-of-bounds array indexing — each yielding NULL instead of a
    job-killing exception. This is the error-containment contract ETL
    needs under ANSI mode (one malformed row must not fail a 100 TB
    job); the oracle spells each as its explicit CASE guard, which is
    both the portable translation and the documentation of WHEN each
    function nulls.

    c_try_add_overflow pins the overflow behavior concretely:
    BIGINT_MAX + (o_orderkey+1) overflows for every row (keys start
    at 0), so the column is identically NULL — an engine that wraps
    around instead would fail the hash."""
    t = Tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return t.orders.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), k % 3).alias("c_try_divide"),
        F.try_add(F.lit(9223372036854775807).cast("bigint"), k + 1).alias(
            "c_try_add_overflow"
        ),
        F.when(k % 7 == 0, F.try_multiply(k.cast("bigint"), F.lit(1000000)))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("c_try_mul"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (k % 5 + 1).cast("int"),
        ).alias("c_try_element"),
    )


@query(
    "fn_surrogate_key_bank",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
        WHERE c_custkey <= 300
    ),
    k AS (
        SELECT *, md5('cust:' || CAST(c_custkey AS VARCHAR)) AS h
        FROM base
    )
    SELECT c_custkey,
           substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-'
               || substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-'
               || substr(h, 21, 12) AS uuid_key,
           'cust|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
               AS composite_key,
           row_number() OVER (ORDER BY c_mktsegment, c_custkey)
               AS dense_seq_key
    FROM k
    """,
)
def fn_surrogate_key_bank(spark, sf_dir):
    """Surrogate-key minting bank — the identity layer of a warehouse
    load: a UUID-shaped key from the namespaced md5 of the business
    key (deterministic and collision-safe like UUIDv5 — unlike
    ``uuid()``/``monotonically_increasing_id()``, which are
    nondeterministic per run and therefore EXCLUDED from this bank on
    purpose), a delimited composite natural key, and a dense ordinal
    minted by row_number over a total business order.

    The first two are map-only and reshuffle-proof (pure functions of
    the row); the ordinal needs a global sort and is the one to avoid
    at 100 TB unless the consumer truly needs dense integers — the
    docstring IS the design guidance."""
    t = Tables(spark, sf_dir)
    base = t.customer.filter(F.col("c_custkey") <= 300)
    h = F.md5(F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")))
    k = base.select("c_custkey", "c_mktsegment", "c_nationkey", h.alias("h"))
    uuid_key = F.concat_ws(
        "-",
        F.substring("h", 1, 8),
        F.substring("h", 9, 4),
        F.substring("h", 13, 4),
        F.substring("h", 17, 4),
        F.substring("h", 21, 12),
    )
    from pyspark.sql import Window

    return k.select(
        "c_custkey",
        uuid_key.alias("uuid_key"),
        F.concat_ws(
            "|",
            F.lit("cust"),
            F.col("c_nationkey").cast("string"),
            F.col("c_mktsegment"),
        ).alias("composite_key"),
        F.row_number()
        .over(Window.orderBy("c_mktsegment", "c_custkey"))
        .cast("bigint").alias("dense_seq_key"),
    )


@query(
    "fn_timezone_bank",
    oracle="""
    SELECT event_id, ts,
           timezone('America/New_York', ts AT TIME ZONE 'UTC') AS ny_local,
           timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC') AS tokyo_local,
           hour(timezone('America/New_York', ts AT TIME ZONE 'UTC'))
               AS ny_hour,
           CAST(CAST(timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC') AS DATE)
                <> CAST(ts AS DATE) AS BOOLEAN) AS crosses_dateline
    FROM events WHERE event_id < 200
    """,
)
def fn_timezone_bank(spark, sf_dir):
    """Timezone conversion bank: UTC event timestamps rendered as
    DST-aware local wall-clock time in two zones, plus the derived
    local hour and a did-the-date-shift flag — the "display in the
    user's timezone" surface every analytics UI needs, exercised
    against the IANA tzdb in BOTH engines (the oracle equivalence
    pins down the semantics bridge: Spark ``from_utc_timestamp(ts,
    tz)`` ≡ DuckDB ``timezone(tz, ts AT TIME ZONE 'UTC')`` — both
    yield naive local wall time independent of session TZ).

    Map-only projection with the filter pushed to the scan; tz
    conversion is a per-row table lookup, no shuffle."""
    t = Tables(spark, sf_dir)
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tk = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return t.events.filter(F.col("event_id") < 200).select(
        "event_id",
        "ts",
        ny.alias("ny_local"),
        tk.alias("tokyo_local"),
        F.hour(ny).cast("bigint").alias("ny_hour"),
        (tk.cast("date") != F.col("ts").cast("date")).alias(
            "crosses_dateline"
        ),
    )
