"""Unit tests for the integer sample-identity layer (mlmc_tpu/tags.py)."""
import numpy as np
import pytest

from mlmc_tpu.tags import (TagArray, TagChain, TagRange, format_tag,
                           format_tags, parse_tag, parse_tags)


def test_format_parse_roundtrip():
    idx = np.array([0, 1, 99, 12345, 9999999])
    tags = format_tags(3, idx)
    assert tags[0] == "L03_S0000000"
    assert list(parse_tags(tags)) == list(idx)
    for i in idx:
        assert parse_tag(format_tag(3, int(i))) == (3, int(i))


def test_format_tags_wide_indices():
    """Indices beyond the %07d field widen per element (reference parity)."""
    tags = format_tags(1, np.array([5, 12345678]))
    assert tags.tolist() == ["L01_S0000005", "L01_S12345678"]
    assert parse_tags(tags).tolist() == [5, 12345678]


def test_parse_tags_inputs():
    # bytes, numpy S, python list, ragged widths -> fallback parse
    assert parse_tags([b"L00_S0000042"]).tolist() == [42]
    assert parse_tags(np.array(["L00_S0000042"], dtype="S100")).tolist() == [42]
    assert parse_tags(["L00_S0000001", "L00_S12345678"]).tolist() == [1, 12345678]
    assert parse_tags([]).tolist() == []


def test_tag_range():
    tr = TagRange(2, 10, 14)
    assert len(tr) == 4
    assert tr[0] == "L02_S0000010" and tr[-1] == "L02_S0000013"
    assert list(tr) == [format_tag(2, i) for i in range(10, 14)]
    assert list(tr[1:3].indices) == [11, 12]
    assert np.asarray(tr).shape == (4,)
    assert np.asarray(tr, dtype="S100")[0] == b"L02_S0000010"
    with pytest.raises(IndexError):
        tr[4]


def test_tag_array_add():
    a = TagArray(1, [3, 5])
    b = TagArray(1, [7])
    ab = a + b
    assert isinstance(ab, TagArray) and ab.tolist() == [
        "L01_S0000003", "L01_S0000005", "L01_S0000007"]
    # different level -> plain list concatenation
    c = TagArray(2, [1])
    assert a + c == a.tolist() + c.tolist()
    assert ["x"] + a == ["x"] + a.tolist()


def test_tag_chain():
    ch = TagChain()
    ch.extend(TagRange(0, 0, 3))
    ch.extend(["L00_S0000099"])
    ch.append("L00_S0000100")
    assert len(ch) == 5
    assert ch[3] == "L00_S0000099" and ch[-1] == "L00_S0000100"
    assert list(ch)[0] == "L00_S0000000"
    assert np.asarray(ch).shape == (5,)
    with pytest.raises(IndexError):
        ch[5]
