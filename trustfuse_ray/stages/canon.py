"""Canonicalization kernels — vectorized re-expressions of the reference's
scalar preprocessing library
(`/root/reference/trustfuse/conflicting_dataset/preprocessing.py:86-257`).

Each kernel has two forms:

* a scalar form (suffix ``_scalar``) that is semantically identical to the
  reference function — used by unit tests as the parity oracle;
* an Arrow batch form operating on a ``pa.Array`` — the hot-path form used
  inside ``map_batches`` stages (pyarrow.compute / numpy, no per-row Python
  in the common case).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NUM_RE = re.compile(r"[-+]?\d*\.\d+|\d+")
_NUM_COMMAS_RE = re.compile(r"[-+]?\d{1,3}(?:,\d{3})*(?:\.\d+)?|\d+")
_TIME_RE = re.compile(r"(\d{1,2}):(\d{2})")
_PAREN_RE = re.compile(r"\(.*?\)")

# ---------------------------------------------------------------------------
# scalar parity forms (preprocessing.py:86-257 semantics, incl. edge cases)
# ---------------------------------------------------------------------------


def remove_space_scalar(text):
    """preprocessing.py:168-173 — strip; pass-through on non-str."""
    try:
        return text.strip()
    except Exception:
        return text


def extract_number_scalar(text):
    """preprocessing.py:106-119 — first number in str(x) as float, else None."""
    m = _NUM_RE.search(str(text))
    return float(m.group()) if m else None


def extract_number_with_commas_scalar(text):
    """preprocessing.py:150-165 — first number allowing thousands separators."""
    m = _NUM_COMMAS_RE.search(str(text))
    return float(m.group().replace(",", "")) if m else None


def extract_time_scalar(date):
    """preprocessing.py:86-103 — strip parens, first H:MM → (h, m) else None."""
    if date is None or (isinstance(date, float) and np.isnan(date)):
        return None
    date = _PAREN_RE.sub("", date)
    m = _TIME_RE.search(date)
    if m:
        h, mi = m.groups()
        return int(h), int(mi)
    return None


def get_minutes_scalar(time):
    """preprocessing.py:122-134 — (h, m) → h*60+m."""
    if time is not None:
        h, m = time
        return h * 60 + m
    return None


def transform_date_scalar(date):
    """preprocessing.py:137-147 — composed extract_time ∘ get_minutes."""
    return get_minutes_scalar(extract_time_scalar(str(date)))


def extract_authors_scalar(authors):
    """preprocessing.py:228-252 — split author strings; returns a list."""
    if authors is None or (isinstance(authors, float) and np.isnan(authors)):
        return None
    if not isinstance(authors, str):
        return None
    if "; " in authors:
        return [name.lower().strip() for name in authors.split("; ")]
    if authors.count(",") > 1 or (
        authors.count(",") == 1 and len(authors.split()) > 3
    ):
        formatted = []
        for name in authors.split(", "):
            parts = name.split()
            if len(parts) > 1:
                formatted.append(
                    f"{parts[-1].lower()}, {' '.join(parts[:-1]).lower()}"
                )
            else:
                formatted.append(name.lower())
        return formatted
    return [authors.lower().strip()]


def split_authors_scalar(authors):
    """preprocessing.py:255-257."""
    return [n.strip() for n in authors.split(";") if n.strip()]


# ---------------------------------------------------------------------------
# Arrow batch forms
# ---------------------------------------------------------------------------


def remove_space(arr: pa.Array) -> pa.Array:
    return pc.utf8_trim_whitespace(arr)


def _extract_float(arr: pa.Array, rx: re.Pattern, strip_commas: bool) -> pa.Array:
    """Vectorized first-number extraction.

    pyarrow's extract_regex covers the common case; rows where the Arrow
    RE2 kernel finds nothing yield None.  Known deviation: RE2's ``\\d`` is
    ASCII-only while the reference's Python ``re`` matches Unicode digits
    (e.g. float('١') == 1.0) — irrelevant for the reference's ISO-8859-1
    corpora; property-tested over ASCII in tests/test_canon.py.
    """
    named = f"(?P<v>{rx.pattern})"
    s = pc.cast(arr, pa.string())
    struct = pc.extract_regex(s, named)
    v = pc.struct_field(struct, "v")
    if strip_commas:
        v = pc.replace_substring(v, ",", "")
    return pc.cast(v, pa.float64())


def extract_number(arr: pa.Array) -> pa.Array:
    return _extract_float(arr, _NUM_RE, strip_commas=False)


def extract_number_with_commas(arr: pa.Array) -> pa.Array:
    return _extract_float(arr, _NUM_COMMAS_RE, strip_commas=True)


def transform_date(arr: pa.Array) -> pa.Array:
    """H:MM anywhere in the string → minutes since midnight (int64)."""
    s = pc.cast(arr, pa.string())
    s = pc.replace_substring_regex(s, r"\(.*?\)", "")
    struct = pc.extract_regex(s, r"(?P<h>\d{1,2}):(?P<m>\d{2})")
    h = pc.cast(pc.struct_field(struct, "h"), pa.int64())
    m = pc.cast(pc.struct_field(struct, "m"), pa.int64())
    return pc.add(pc.multiply(h, 60), m)


def extract_authors(arr: pa.Array) -> pa.Array:
    """List-valued kernel (row-exploding upstream via flat_map)."""
    return pa.array([extract_authors_scalar(x) for x in arr.to_pylist()],
                    type=pa.list_(pa.string()))


# registry mirroring preprocessing.py:260-268 (config-driven kernel lists)
BATCH_KERNELS = {
    "remove_space": remove_space,
    "extract_number": extract_number,
    "extract_number_with_commas": extract_number_with_commas,
    "transform_date": transform_date,
    "extract_authors": extract_authors,
}
SCALAR_KERNELS = {
    "remove_space": remove_space_scalar,
    "extract_number": extract_number_scalar,
    "extract_number_with_commas": extract_number_with_commas_scalar,
    "extract_time": extract_time_scalar,
    "get_minutes": get_minutes_scalar,
    "transform_date": transform_date_scalar,
    "extract_authors": extract_authors_scalar,
}


def scale_units_group(values: np.ndarray, lower_factor=-0.8, upper_factor=0.8,
                      max_itr=10) -> np.ndarray:
    """preprocessing.py:176-225 ``scale_units`` inner loop for ONE
    (entity, attr) group: iteratively multiply values by 10 / 0.1 until all
    lie within 10**±0.8 of the group median.  Order/group-sensitive → must
    run under groupby(entity).map_groups (SURVEY.md §7.5)."""
    extracted = np.array(
        [extract_number_with_commas_scalar(v) for v in values], dtype=object
    )
    mask = np.array([(e is not None) and (e != 0) for e in extracted])
    nums = np.array([e for e, m in zip(extracted, mask) if m], dtype=float)
    if nums.size:
        for _ in range(max_itr):
            center = np.median(nums)
            if center == 0:
                break
            power = np.log10(nums / center)
            below, above = power < lower_factor, power > upper_factor
            if below.any() or above.any():
                nums[below] *= 10
                nums[above] *= 0.1
            else:
                break
        extracted[mask] = nums
    return extracted
