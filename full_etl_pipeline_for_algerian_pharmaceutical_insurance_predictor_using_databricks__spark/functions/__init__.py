from .exprs import (
    extract_price,
    pct_of_total,
    price_bucket,
    price_category,
    coverage_status,
    refundable_label,
    round0,
    round1,
)

__all__ = [
    "extract_price",
    "pct_of_total",
    "price_bucket",
    "price_category",
    "coverage_status",
    "refundable_label",
    "round0",
    "round1",
]
