from .scalar import (  # noqa: F401
    davg,
    dec2,
    dec4,
    dsum,
    dsum_expr,
    iso_dow,
    oracle_davg,
    oracle_dec2,
    oracle_dec4,
    oracle_dsum,
    oracle_dsum_expr,
    surrogate_key,
)
