"""Explicit StructType registry.

The reference's schemas are implicit — record shapes defined by
dict-literal construction sites (SURVEY.md §1.3, e.g.
exchage_rate_crawler.py:386-404) and positional HTML cell indices
(exchage_rate_crawler.py:158-180). Nothing validates them. This module
is the engine-side answer: every table, fixture, and stream hop gets a
fixed StructType so schema violations surface as nulls / corrupt-record
columns instead of KeyErrors.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver test tables (/root/testdata/sf*/<name>.parquet — FIXTURES.md §A)
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampType()),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Domain schemas (reference data model, SURVEY.md §1 / FIXTURES.md §B)
# ---------------------------------------------------------------------------

# Mirrors config/master_country_crawler.json (59 countries x 7 fields,
# loaded at exchage_rate_crawler.py:45-47).
COUNTRY_MASTER = T.StructType([
    T.StructField("country_code_3", T.StringType()),
    T.StructField("country_code_2", T.StringType()),
    T.StructField("country_name_eng", T.StringType()),
    T.StructField("country_name_kor", T.StringType()),
    T.StructField("currency_code", T.StringType()),
    T.StructField("is_euro_zone", T.BooleanType()),
    T.StructField("google_trend_keyword_kor", T.StringType()),
])

# Mirrors config/standard_country_map.json (739 alias entries,
# google_trends_processor.py:32-34).
COUNTRY_ALIAS = T.StructType([
    T.StructField("alias", T.StringType()),
    T.StructField("korean_name", T.StringType()),
    T.StructField("english_name", T.StringType()),
    T.StructField("country_code_3", T.StringType()),
    T.StructField("country_code_2", T.StringType()),
])

# One row per (currency, rate_type, period) — the schema'd form of the
# HTML-table scrape S1 (exchage_rate_crawler.py:107-322).
EXCHANGE_RATES_RAW = T.StructType([
    T.StructField("currency_code", T.StringType()),
    T.StructField("rate_type", T.StringType()),   # realtime|daily_avg|monthly_avg|yearly_avg
    T.StructField("period", T.StringType()),      # 'YYYYMM' for monthly_avg else NULL
    T.StructField("buy_rate", T.DoubleType()),
    T.StructField("sell_rate", T.DoubleType()),
    T.StructField("send_rate", T.DoubleType()),
    T.StructField("receive_rate", T.DoubleType()),
    T.StructField("standard_rate", T.DoubleType()),
    T.StructField("crawled_at_utc", T.TimestampType()),
])

# Long-format trends interest — the engine-side grain of the wide
# pytrends frame (google_trends_crawler.py:56-57; unpivot W4).
TRENDS_INTEREST_LONG = T.StructType([
    T.StructField("group_id", T.IntegerType()),
    T.StructField("keyword", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("interest", T.IntegerType()),
    T.StructField("is_partial", T.BooleanType()),
])

# Nested flight JSON (_archive/flight_price_preprocessing.py:3-49).
_STATION = T.StructType([
    T.StructField("code", T.StringType()),
    T.StructField("city", T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("legacyId", T.StringType()),
    ])),
    T.StructField("country", T.StructType([
        T.StructField("code", T.StringType()),
    ])),
    T.StructField("gps", T.StructType([
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
    ])),
])

_SEGMENT = T.StructType([
    T.StructField("segment", T.StructType([
        T.StructField("source", T.StructType([
            T.StructField("station", _STATION),
            T.StructField("localTime", T.StringType()),
        ])),
        T.StructField("destination", T.StructType([
            T.StructField("station", _STATION),
            T.StructField("localTime", T.StringType()),
        ])),
        T.StructField("carrier", T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("code", T.StringType()),
        ])),
        T.StructField("cabinClass", T.StringType()),
        T.StructField("duration", T.LongType()),
    ])),
])

FLIGHT_ITINERARIES = T.StructType([
    T.StructField("itineraries", T.ArrayType(T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("price", T.StructType([
            T.StructField("amount", T.DoubleType()),
            T.StructField("priceBeforeDiscount", T.DoubleType()),
        ])),
        T.StructField("sector", T.StructType([
            T.StructField("sectorSegments", T.ArrayType(_SEGMENT)),
        ])),
    ]))),
])

# JSON event-stream hop schema (Queue / Event Hub messages, SURVEY.md
# §1.1 #3): every hop is to_json(struct(*)) / from_json(col, schema).
TRENDS_TASK_MESSAGE = T.StructType([
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("timeframe", T.StringType()),
    T.StructField("geo", T.StringType()),
    T.StructField("request_time", T.StringType()),
])
