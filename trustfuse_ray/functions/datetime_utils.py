"""Datetime + labeling helpers (reference: dataset_generation/utils.py and
automatic_labeling.py)."""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

_FMT = "%Y-%m-%dT%H:%M:%SZ"
_IP4 = re.compile(r"^(\d{1,3}\.){3}\d{1,3}$")
_IP6 = re.compile(r"^[0-9A-Fa-f:]+:[0-9A-Fa-f:]+$")
_MAC = re.compile(r"^([0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}$")


def date2seconds(date: str) -> int:
    """`dataset_generation/utils.py:17-27` — '%Y-%m-%dT%H:%M:%SZ' → epoch."""
    return int(datetime.strptime(date, _FMT)
               .replace(tzinfo=timezone.utc).timestamp())


def seconds2date(seconds: int) -> str:
    """`dataset_generation/utils.py:30-43` — epoch → '%Y-%m-%dT%H:%M:%SZ'."""
    return datetime.fromtimestamp(seconds, tz=timezone.utc).strftime(_FMT)


def convert_seconds_to_readable_time(seconds: float) -> str:
    """`dataset_generation/utils.py:46-71` — duration → 'Xd Yh Zm Ws'."""
    d, rem = divmod(int(seconds), 86_400)
    h, rem = divmod(rem, 3_600)
    m, s = divmod(rem, 60)
    parts = []
    if d:
        parts.append(f"{d}d")
    if h:
        parts.append(f"{h}h")
    if m:
        parts.append(f"{m}m")
    parts.append(f"{s}s")
    return " ".join(parts)


def is_ip_or_mac(value: str) -> bool:
    """`dataset_generation/automatic_labeling.py:27-48` — anonymous-
    contributor detection (IPv4/IPv6/MAC shapes)."""
    if not isinstance(value, str):
        return False
    return bool(_IP4.match(value) or _MAC.match(value)
                or (":" in value and _IP6.match(value)))


def date2seconds_batch(arr: pa.Array) -> pa.Array:
    """Vectorized Arrow form: ISO-Z strings → epoch seconds (int64)."""
    ts = pc.strptime(arr, format=_FMT, unit="s")
    return pc.cast(ts, pa.int64())


def seconds2date_batch(arr: pa.Array) -> pa.Array:
    ts = pc.cast(pc.cast(arr, pa.int64()), pa.timestamp("s"))
    return pc.strftime(ts, format=_FMT)
