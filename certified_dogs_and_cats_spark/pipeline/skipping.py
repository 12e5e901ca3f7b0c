"""File-level data skipping from parquet footer statistics (Delta parity).

Delta keeps per-file min/max/null-count stats in its transaction log and
prunes files against a query predicate BEFORE the scan — at 100 TB the
difference between reading terabytes and reading the three files that can
possibly match. This module gives the manifest catalog the same power:

- :func:`collect_file_stats` reads each data file's parquet FOOTER (row
  counts, per-column min/max/null-count aggregated over row groups) — a
  metadata-sized read per file, cached in ``_meta/<table>/file_stats.json``
  and invalidated by file size, so stats are computed once per file ever.
- :func:`parse_conjuncts` splits a predicate into top-level AND conjuncts
  of the prunable shapes (``col <op> literal``, ``col IN (...)``, ``col IS
  [NOT] NULL``). Anything it does not recognize simply prunes nothing —
  correctness never depends on the parser, because the full predicate is
  ALSO applied as a real filter after the pruned read.
- :func:`keep_file` is the conservative verdict: a file is skipped only
  when its stats PROVE no row can satisfy some conjunct. Partition-column
  values are parsed from the ``col=value`` path segments (min = max =
  value), so partition pruning falls out of the same rule.

The engine-level guarantee: ``Catalog.scan(name, pred)`` ==
``Catalog.table(name).filter(pred)`` row-for-row, with strictly fewer
files opened.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import json
import math
import os
import re
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.FloatType,
    T.DoubleType,
)


@dataclass(frozen=True)
class Conjunct:
    col: str
    op: str  # '=', '<', '<=', '>', '>=', 'in', 'null', 'notnull'
    values: tuple


def _parse_literal(tok: str):
    tok = tok.strip()
    # [^']* (not greedy .*) so a trailing "...' OR b = 'y'" tail can never
    # be swallowed into one garbage literal — an OR-disjunction must fall
    # through to "unparsable" (prunes nothing) rather than misparse into a
    # wrong single-column conjunct that silently drops matching files.
    m = re.match(r"^(?:DATE|TIMESTAMP)?\s*'([^']*)'$", tok, re.I | re.S)
    if m:
        return m.group(1)
    if re.match(r"^-?\d+$", tok):
        return int(tok)
    if re.match(r"^-?\d*\.\d+(?:[eE][+-]?\d+)?$", tok):
        return float(tok)
    if tok.lower() in ("true", "false"):
        return tok.lower() == "true"
    return None  # unparsable literal -> conjunct prunes nothing


def _split_top_and(s: str) -> list[str]:
    """Split on top-level AND (outside parens and string literals)."""
    parts, depth, last, i, n = [], 0, 0, 0, len(s)
    in_str = False
    while i < n:
        ch = s[i]
        if in_str:
            in_str = ch != "'"
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and s[i : i + 5].upper() == " AND ":
            parts.append(s[last:i])
            i += 4
            last = i + 1
        i += 1
    parts.append(s[last:])
    return parts


def parse_conjuncts(predicate: str) -> list[Conjunct]:
    """Extract the prunable conjuncts; unrecognized pieces are dropped
    (they still execute in the post-read filter)."""
    out: list[Conjunct] = []
    for part in _split_top_and(" " + predicate.strip() + " "):
        p = part.strip()
        m = re.match(r"^(\w+) IS NOT NULL$", p, re.I)
        if m:
            out.append(Conjunct(m.group(1), "notnull", ()))
            continue
        m = re.match(r"^(\w+) IS NULL$", p, re.I)
        if m:
            out.append(Conjunct(m.group(1), "null", ()))
            continue
        m = re.match(r"^(\w+) IN \((.*)\)$", p, re.I | re.S)
        if m:
            lits = [_parse_literal(x) for x in m.group(2).split(",")]
            if all(v is not None for v in lits):
                out.append(Conjunct(m.group(1), "in", tuple(lits)))
            continue
        m = re.match(r"^([A-Za-z_]\w*)\s*(=|<=|>=|<|>)\s*(.+)$", p, re.S)
        if m:
            lit = _parse_literal(m.group(3))
            if lit is not None:
                out.append(Conjunct(m.group(1), m.group(2), (lit,)))
            continue
        m = re.match(r"^(.+?)\s*(=|<=|>=|<|>)\s*(\w+)$", p, re.S)
        if m and re.match(r"^[A-Za-z_]\w*$", m.group(3)):
            lit = _parse_literal(m.group(1))
            if lit is not None:
                flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "="}
                out.append(
                    Conjunct(m.group(3), flip[m.group(2)], (lit,))
                )
    return out


def _jsonable(v):
    if isinstance(v, bytes):
        return None  # binary stats are not comparable here
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return None


def file_footer_stats(path: str) -> dict:
    """One file's footer rollup: {"rows": n, "cols": {name: [min, max,
    null_count]}} — row-group stats folded together; a column with no
    usable stats is absent."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    cols: dict[str, list] = {}
    storage: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(md.num_columns):
            ch = rgm.column(ci)
            sb = storage.setdefault(ch.path_in_schema, [0, 0, 0])
            sb[0] += ch.total_compressed_size
            sb[1] += ch.total_uncompressed_size
            sb[2] += ch.num_values
            st = ch.statistics
            if st is None:
                continue
            name = ch.path_in_schema
            mn = _jsonable(st.min) if st.has_min_max else None
            mx = _jsonable(st.max) if st.has_min_max else None
            nulls = st.null_count if st.has_null_count else None
            cur = cols.get(name)
            if cur is None:
                cols[name] = [mn, mx, nulls]
            else:
                if cur[0] is not None and mn is not None:
                    cur[0] = min(cur[0], mn)
                else:
                    cur[0] = None
                if cur[1] is not None and mx is not None:
                    cur[1] = max(cur[1], mx)
                else:
                    cur[1] = None
                cur[2] = (
                    cur[2] + nulls
                    if cur[2] is not None and nulls is not None
                    else None
                )
    return {"rows": md.num_rows, "cols": cols, "storage": storage}


def collect_file_stats(
    root: str, files: list[str], cache_path: str
) -> dict[str, dict]:
    """Footer stats for every file (relative to ``root``), cached by file
    size — each footer is read once per file ever, and the cache survives
    sessions beside the manifest."""
    cache: dict[str, dict] = {}
    if os.path.isfile(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    out: dict[str, dict] = {}
    dirty = False
    for rel in files:
        path = os.path.join(root, rel)
        if not os.path.isfile(path):
            continue  # retired to trash: no stats -> never skipped
        size = os.path.getsize(path)
        hit = cache.get(rel)
        # "storage" joined the record later — a cache written before it
        # counts as a miss so old caches migrate on first touch.
        if hit is not None and hit.get("size") == size and "storage" in hit:
            out[rel] = hit
            continue
        entry = file_footer_stats(path)
        entry["size"] = size
        cache[rel] = entry
        out[rel] = entry
        dirty = True
    if dirty:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        tmp = cache_path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, cache_path)
    return out


def hive_partition_segments(rel: str) -> list[tuple[str, str | None]]:
    """The ONE parser of Hive-style ``col=value`` path segments (shared by
    stat pruning, layout signatures, and the streaming source — the
    escaping rules must never drift between them): ordered (col, value)
    pairs with percent-escapes decoded and the
    ``__HIVE_DEFAULT_PARTITION__`` NULL sentinel mapped to ``None``."""
    out: list[tuple[str, str | None]] = []
    for seg in rel.split(os.sep)[:-1]:
        if "=" not in seg:
            continue
        col, _, raw = seg.partition("=")
        out.append(
            (
                col,
                None
                if raw == "__HIVE_DEFAULT_PARTITION__"
                else urllib.parse.unquote(raw),
            )
        )
    return out


def _partition_values(rel: str, schema: T.StructType) -> dict[str, object]:
    """col=value path segments, typed by the declared schema."""
    by_name = {f.name: f.dataType for f in schema.fields}
    out: dict[str, object] = {}
    for col, val in hive_partition_segments(rel):
        if col not in by_name:
            continue
        if val is None:
            # NULL partition sentinel: no comparable value — leave the
            # column out so no conjunct can prune this file on it.
            continue
        t = by_name[col]
        if isinstance(t, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
            try:
                out[col] = int(val)
            except ValueError:
                continue
        elif isinstance(t, (T.FloatType, T.DoubleType)):
            try:
                out[col] = float(val)
            except ValueError:
                continue
        else:
            out[col] = val
    return out


def _comparable(a, b) -> bool:
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    num = (int, float)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return type(a) is type(b)


# -- Bloom-filter file index (Delta BLOOMFILTER INDEX parity) -----------------
#
# Min/max stats cannot prune point lookups on a high-cardinality column
# whose values are scattered across files (every file's [min, max] covers
# everything). Delta's answer is a per-file bloom filter index; ours is the
# same: one bitset per (indexed column, data file), sized from that file's
# exact distinct count, stored beside the manifest. A membership miss
# PROVES the file holds no matching row (no false negatives), so `=` / IN
# conjuncts skip files footer stats cannot.
#
# Hashing must agree bit-for-bit between the Spark build job and the
# Python query side, so both use md5 over the canonical CAST(col AS
# STRING) form, and the k probe positions derive from that single 60-bit
# hash by Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m) — the
# build job computes ONE hash per value, never k.

BLOOM_HASH_SQL = (
    "conv(substring(md5(cast({col} AS STRING)), 1, 15), 16, 10)"
)


def bloom_hash60(canonical: str) -> int:
    """60-bit md5 prefix of the canonical string — the Python twin of
    :data:`BLOOM_HASH_SQL` (15 hex chars, so it fits signed 64-bit)."""
    return int(hashlib.md5(canonical.encode()).hexdigest()[:15], 16)


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Textbook sizing: m = -n ln(fpp)/ln(2)^2 bits, k = (m/n) ln 2."""
    n = max(1, n_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, min(16, int(round(m / n * math.log(2)))))
    return m, k


def bloom_positions(h60: int, m: int, k: int) -> list[int]:
    h1 = h60 >> 30
    h2 = (h60 & ((1 << 30) - 1)) | 1  # odd: never a degenerate stride
    return [(h1 + i * h2) % m for i in range(k)]


def pack_bloom(hashes, n_items: int, fpp: float) -> dict:
    """Build one file's bloom entry from its distinct value hashes."""
    m, k = bloom_params(n_items, fpp)
    bits = bytearray((m + 7) // 8)
    for h in hashes:
        for p in bloom_positions(int(h), m, k):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "k": k, "bits": base64.b64encode(bytes(bits)).decode()}


def bloom_canonical(value) -> str | None:
    """The literal's canonical string, matching Spark's CAST(col AS
    STRING) for the supported index types (string / integer / date /
    boolean). None = not canonicalizable -> no pruning on this value."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, str):
        return value
    return None  # floats etc. — the builder refuses such columns anyway


def bloom_might_contain(entry: dict, value) -> bool:
    """False only when the bitset PROVES the value is absent."""
    s = bloom_canonical(value)
    if s is None:
        return True
    m, k = entry["m"], entry["k"]
    bits = base64.b64decode(entry["bits"])
    for p in bloom_positions(bloom_hash60(s), m, k):
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def keep_file(
    rel: str,
    stats: dict | None,
    conjuncts: list[Conjunct],
    schema: T.StructType,
    column_map: dict[str, str] | None = None,
    blooms: dict[str, dict] | None = None,
) -> bool:
    """False only when the stats PROVE no row in the file can satisfy the
    predicate. Missing stats for a referenced column keep the file.
    ``column_map`` translates logical predicate columns to the physical
    names footer stats are keyed by (Delta column mapping). ``blooms``
    maps indexed logical columns to ``{"fpp":..., "files": {rel:
    entry}}``; a bloom miss on every value of an ``=`` / ``IN`` conjunct
    skips the file even where min/max ranges overlap."""
    parts = _partition_values(rel, schema)
    rows = stats.get("rows") if stats else None
    cols = stats.get("cols", {}) if stats else {}
    cmap = column_map or {}
    if rows == 0 and conjuncts:
        return False  # an empty part file can never satisfy a predicate
    for c in conjuncts:
        # Partition-path values are authoritative — a file whose column
        # lives in the PATH (old partition era) has an empty bloom, so the
        # bloom may only speak for columns stored as data in this file.
        if (
            c.op in ("=", "in")
            and blooms
            and c.col in blooms
            and c.col not in parts
        ):
            entry = blooms[c.col].get("files", {}).get(rel)
            if entry is not None and not any(
                bloom_might_contain(entry, v) for v in c.values
            ):
                return False
        phys = cmap.get(c.col, c.col)
        if c.col in parts:
            mn = mx = parts[c.col]
            nulls = 0
        elif phys in cols:
            mn, mx, nulls = cols[phys]
        else:
            continue  # no stats for this column -> cannot prune on it
        if c.op == "null":
            if nulls == 0:
                return False
            continue
        if c.op == "notnull":
            if rows is not None and nulls == rows:
                return False
            continue
        # Comparison conjuncts never match NULL rows; a column that is
        # entirely NULL (no min/max) can be skipped outright.
        if mn is None or mx is None:
            if rows is not None and nulls == rows:
                return False
            continue
        lits = [v for v in c.values if _comparable(v, mn)]
        if len(lits) != len(c.values):
            continue  # type mismatch -> no pruning on this conjunct
        if c.op == "=" and (lits[0] < mn or lits[0] > mx):
            return False
        if c.op == "in" and all(v < mn or v > mx for v in lits):
            return False
        if c.op == ">" and mx <= lits[0]:
            return False
        if c.op == ">=" and mx < lits[0]:
            return False
        if c.op == "<" and mn >= lits[0]:
            return False
        if c.op == "<=" and mn > lits[0]:
            return False
    return True


def column_storage_stats(path: str) -> dict[str, dict]:
    """Per-column ON-DISK cost from one parquet footer:
    {col: {"compressed_bytes", "uncompressed_bytes", "n_values"}} summed
    over row groups. Metadata-sized (no data pages read) — the storage-
    attribution primitive behind ``Catalog.column_storage_report``: at
    100 TB, knowing that one text column is 90% of the bytes is what
    decides compression codecs, column pruning discipline, and whether a
    column belongs in a separate table."""
    raw = file_footer_stats(path)["storage"]
    return {
        col: {
            "compressed_bytes": v[0],
            "uncompressed_bytes": v[1],
            "n_values": v[2],
        }
        for col, v in raw.items()
    }
