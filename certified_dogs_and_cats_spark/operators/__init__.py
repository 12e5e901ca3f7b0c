from .joins import dim_lookup, idempotent_new_rows, merge_upsert
from .windows import latest_per_key, pivot_top_k, top_k_per_group

__all__ = [
    "dim_lookup",
    "idempotent_new_rows",
    "merge_upsert",
    "latest_per_key",
    "pivot_top_k",
    "top_k_per_group",
]
