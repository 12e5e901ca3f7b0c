"""Shared execution rosters: which registered queries are side-effect-free
plan-auditable/benchable DataFrame queries, and which are excluded with a
stated reason.

ONE exclusion list serves both scripts/audit_plans.py (physical-plan
conventions) and bench.py (wall-clock measurement): a query is excluded
only when its execution shape puts a pure read-plan measurement out of
reach — it drives a temp warehouse, writes and reads back export files,
or drains a stream — and each exclusion names why. Everything else is
covered by BOTH rosters, so adding a query makes it audited and benched
by default; an unclassified name fails the audit script.

Exclusion reasons:

- "e2e temp-warehouse": the query drives a multi-stage pipeline/DDL
  lifecycle against a throwaway catalog — the returned frame is a tiny
  summary of WRITES already performed; the interesting plans are the
  per-stage ones, pinned by their own pytests.
- "export + readback": the query writes files (csv/jsonl/orc/tar/shard
  manifests) to a temp dir and returns an attestation read back from
  disk; the plan of the readback says nothing about the export.
- "streaming drain": the query runs a Structured Streaming flow into a
  memory sink and returns the drained table; physical plans are
  per-micro-batch and not reachable from the returned frame.
- "bucketed temp tables": writes bucketed tables into a temp warehouse
  to prove the zero-shuffle join property (asserted inside the query).
"""

from __future__ import annotations

E2E = "e2e temp-warehouse"
EXPORT = "export + readback"
STREAM = "streaming drain"

EXCLUDED: dict[str, str] = {
    "pipeline_totals_end_to_end": E2E,
    "ddl_lifecycle_end_to_end": E2E,
    "scan_skipping_end_to_end": E2E,
    "clone_isolation_end_to_end": E2E,
    "bloom_skipping_end_to_end": E2E,
    "incremental_mv_end_to_end": E2E,
    "cdf_time_travel_end_to_end": E2E,
    "schema_merge_scan_end_to_end": E2E,
    "replace_where_rename_end_to_end": E2E,
    "check_constraint_end_to_end": E2E,
    "restore_copy_into_end_to_end": E2E,
    "mv_rewrite_end_to_end": E2E,
    "governance_end_to_end": E2E,
    "extrema_mv_end_to_end": E2E,
    "scd2_dimension_end_to_end": E2E,
    "export_roundtrip_csv": EXPORT,
    "export_roundtrip_jsonl": EXPORT,
    "export_roundtrip_orc": EXPORT,
    "sorted_export_attest": EXPORT,
    "webdataset_export_manifest": EXPORT,
    "shard_export_manifest": EXPORT,
    "streaming_running_totals": STREAM,
    "streaming_windowed_counts": STREAM,
    "streaming_dedup_ids": STREAM,
    "streaming_enriched_counts": STREAM,
    "streaming_session_stats": STREAM,
    "streaming_stream_join": STREAM,
    "streaming_stream_join_outer": STREAM,
    "streaming_late_drop": STREAM,
    "streaming_timeout_sessions": STREAM,
    "hopping_window_counts": STREAM,
    "bucketed_join_zero_shuffle": "bucketed temp tables",
}


def auditable(queries: dict) -> list[str]:
    """Registry names covered by the audit/bench rosters (insertion
    order of the given mapping, exclusions removed)."""
    return [n for n in queries if n not in EXCLUDED]
