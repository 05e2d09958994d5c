"""Country -> ISO-3166 alpha-3 / continent-code lookup.

Replaces the reference's three independent pycountry UDF copies
(``add_columns.py:41-62``, ``sales_tax.py:33-41``, ``sales_currency.py:
37-44``) with ONE static lookup table used as a broadcast join (or a pure
map-literal expression) — no Python worker boundary, no per-row library
calls, fully pushdown/codegen-friendly.

The table covers every country appearing in the reference's raw data
(taxrate.csv's 24 + exchange_data.csv's 11 + customer/supplier countries),
with the reference's special cases: "UK" -> GBR (add_columns.py:44-45) and
unknown -> "UNK" fallback. Generated from public ISO 3166 / continent data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# name -> (alpha3, continent_code)  [continents: AF, AS, EU, NA, OC, SA]
COUNTRY_TABLE: dict[str, tuple[str, str]] = {
    "Argentina": ("ARG", "SA"),
    "Australia": ("AUS", "OC"),
    "Austria": ("AUT", "EU"),
    "Belgium": ("BEL", "EU"),
    "Brazil": ("BRA", "SA"),
    "Canada": ("CAN", "NA"),
    "Denmark": ("DNK", "EU"),
    "Finland": ("FIN", "EU"),
    "France": ("FRA", "EU"),
    "Germany": ("DEU", "EU"),
    "Ireland": ("IRL", "EU"),
    "Italy": ("ITA", "EU"),
    "Japan": ("JPN", "AS"),
    "Mexico": ("MEX", "NA"),
    "Netherlands": ("NLD", "EU"),
    "Norway": ("NOR", "EU"),
    "Poland": ("POL", "EU"),
    "Portugal": ("PRT", "EU"),
    "Singapore": ("SGP", "AS"),
    "Spain": ("ESP", "EU"),
    "Sweden": ("SWE", "EU"),
    "Switzerland": ("CHE", "EU"),
    "UK": ("GBR", "EU"),
    "United Kingdom": ("GBR", "EU"),
    "USA": ("USA", "NA"),
    "United States": ("USA", "NA"),
    "Venezuela": ("VEN", "SA"),
    # exchange_data.csv uses "EU" as the Eurozone sentinel row
    "EU": ("EU", "EU"),
}

UNKNOWN = "UNK"


def lookup_df(spark: SparkSession) -> DataFrame:
    """The lookup as a (broadcastable) DataFrame for join-based enrichment."""
    rows = [(name, iso3, cont) for name, (iso3, cont) in COUNTRY_TABLE.items()]
    return spark.createDataFrame(rows, "country_name string, iso3 string, continent string")


def with_geo(
    df: DataFrame,
    country_col: str,
    iso_col: str | None = None,
    continent_col: str | None = None,
) -> DataFrame:
    """Broadcast-join enrichment with UNK fallback (never drops rows).

    The lookup side's working columns are ``__geo_``-prefixed so (a) a
    requested output name of 'iso3'/'continent' is not silently deleted
    by the post-join cleanup, (b) a pre-existing iso3/continent/
    country_name column on ``df`` neither becomes ambiguous nor gets
    dropped (review finding)."""
    clash = {"__geo_name", "__geo_iso3", "__geo_continent"} & set(df.columns)
    if clash:
        raise ValueError(f"with_geo: reserved working columns on input: {sorted(clash)}")
    spark = df.sparkSession
    lk = F.broadcast(
        lookup_df(spark).select(
            F.col("country_name").alias("__geo_name"),
            F.col("iso3").alias("__geo_iso3"),
            F.col("continent").alias("__geo_continent"),
        )
    )
    out = df.join(lk, df[country_col] == lk["__geo_name"], "left")
    cols = {}
    if iso_col:
        cols[iso_col] = F.coalesce(F.col("__geo_iso3"), F.lit(UNKNOWN))
    if continent_col:
        cols[continent_col] = F.coalesce(F.col("__geo_continent"), F.lit(UNKNOWN))
    return out.withColumns(cols).drop(
        "__geo_name", "__geo_iso3", "__geo_continent"
    )


def iso3_expr(country_col: str) -> Column:
    """Pure-expression variant (map literal): stays inside codegen, no join.
    Right choice when the lookup feeds another expression."""
    pairs: list[Column] = []
    for name, (iso3, _) in COUNTRY_TABLE.items():
        pairs.extend([F.lit(name), F.lit(iso3)])
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(country_col)), F.lit(UNKNOWN)
    )


def continent_expr(country_col: str) -> Column:
    pairs: list[Column] = []
    for name, (_, cont) in COUNTRY_TABLE.items():
        pairs.extend([F.lit(name), F.lit(cont)])
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(country_col)), F.lit(UNKNOWN)
    )
