from .joins import (
    asof_join,
    dim_lookup,
    idempotent_new_rows,
    merge_upsert,
    salted_join,
)
from .resample import resample_ffill
from .windows import latest_per_key, pivot_top_k, sessionize, top_k_per_group

__all__ = [
    "asof_join",
    "dim_lookup",
    "idempotent_new_rows",
    "merge_upsert",
    "salted_join",
    "latest_per_key",
    "resample_ffill",
    "pivot_top_k",
    "sessionize",
    "top_k_per_group",
]
