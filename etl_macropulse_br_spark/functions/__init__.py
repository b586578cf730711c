from etl_macropulse_br_spark.functions.exprs import (
    dayfirst_date,
    flag_is_enabled,
    last_by,
    month_trunc,
    parse_date_ddmmyyyy,
    parse_ptbr_number,
    parse_price_mixed,
)
from etl_macropulse_br_spark.functions.headers import (
    normalize_header,
    resolve_columns,
)

__all__ = [
    "parse_ptbr_number",
    "parse_price_mixed",
    "parse_date_ddmmyyyy",
    "dayfirst_date",
    "month_trunc",
    "flag_is_enabled",
    "last_by",
    "normalize_header",
    "resolve_columns",
]
