from ningaloo_turtle_etl_spark.functions.scalars import (
    R_ORDER_PATTERNS,
    parse_date_time,
    make_timestamp_from,
    season,
    season_by_isoweek,
    recode_12_to_10,
    restore_southern_sign,
    patch_where,
    sanitize_column_names,
    rescale_minmax,
)

__all__ = [
    "R_ORDER_PATTERNS",
    "parse_date_time",
    "make_timestamp_from",
    "season",
    "season_by_isoweek",
    "recode_12_to_10",
    "restore_southern_sign",
    "patch_where",
    "sanitize_column_names",
    "rescale_minmax",
]
