from .scalar import (
    dsum,
    normalize_key,
    pattern_valid,
    pct,
    safe_ratio,
)

__all__ = ["dsum", "normalize_key", "pattern_valid", "pct", "safe_ratio"]
