"""Canonicalization kernel parity: scalar reference semantics vs Arrow batch
forms (SURVEY.md §5.1; reference cases from preprocessing.py docstrings)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trustfuse_ray.stages import canon


def test_remove_space():
    assert canon.remove_space_scalar("  a b  ") == "a b"
    assert canon.remove_space_scalar(3) == 3  # non-str pass-through
    out = canon.remove_space(pa.array(["  x ", None, "y"]))
    assert out.to_pylist() == ["x", None, "y"]


@pytest.mark.parametrize(
    "text,expected",
    [
        ("abc 12.5 def", 12.5),
        ("no digits", None),
        ("-3.25e", -3.25),
        ("42", 42.0),
        ("x.5y7", 0.5),
    ],
)
def test_extract_number(text, expected):
    assert canon.extract_number_scalar(text) == expected
    got = canon.extract_number(pa.array([text])).to_pylist()[0]
    assert got == expected


@pytest.mark.parametrize(
    "text,expected",
    [
        ("1,234,567 widgets", 1234567.0),
        ("about 12,500.75", 12500.75),
        ("99", 99.0),
        ("none", None),
    ],
)
def test_extract_number_with_commas(text, expected):
    assert canon.extract_number_with_commas_scalar(text) == expected
    got = canon.extract_number_with_commas(pa.array([text])).to_pylist()[0]
    assert got == expected


def test_extract_time_and_minutes():
    assert canon.extract_time_scalar("12/01/2011 9:15 PM (est)") == (9, 15)
    assert canon.extract_time_scalar("(10:30) 7:05") == (7, 5)  # parens removed
    assert canon.extract_time_scalar("nope") is None
    assert canon.get_minutes_scalar((2, 5)) == 125
    assert canon.get_minutes_scalar(None) is None
    assert canon.transform_date_scalar("9:15 PM") == 555
    got = canon.transform_date(pa.array(["9:15 PM", "junk", "(x:y) 0:07"]))
    assert got.to_pylist() == [555, None, 7]


def test_extract_authors():
    assert canon.extract_authors_scalar("A. Smith; B. Jones") == \
        ["a. smith", "b. jones"]
    # comma heuristic: >1 comma → "last, first" reorder
    assert canon.extract_authors_scalar("John A Smith, Bob Jones, Al Woo") == \
        ["smith, john a", "jones, bob", "woo, al"]
    assert canon.extract_authors_scalar("Plain Name") == ["plain name"]
    assert canon.extract_authors_scalar(None) is None
    assert canon.extract_authors_scalar(3.5) is None
    batch = canon.extract_authors(pa.array(["A; B", None]))
    assert batch.to_pylist() == [["a", "b"], None]


@settings(max_examples=200, deadline=None)
@given(st.text(st.characters(min_codepoint=32, max_codepoint=126),
               max_size=30))
def test_extract_number_batch_matches_scalar(s):
    # ASCII domain: Arrow RE2's \d is ASCII-only while Python re matches
    # Unicode digits — documented deviation in canon._extract_float; the
    # reference corpora are ISO-8859-1/ASCII
    scalar = canon.extract_number_scalar(s)
    batch = canon.extract_number(pa.array([s], pa.string())).to_pylist()[0]
    if scalar is None:
        assert batch is None
    else:
        assert batch == pytest.approx(scalar)


def test_scale_units_group():
    # mixed magnitudes around a median harmonize into one decade band
    vals = np.array(["1,000", "1.2", "950", "1100000"], dtype=object)
    out = canon.scale_units_group(vals)
    nums = np.array([float(x) for x in out])
    assert np.all(np.abs(np.log10(nums / np.median(nums))) <= 0.8)
