"""Multimodal plumbing tests: the Arrow/mapInPandas path must produce
deterministic, python-oracle-matching features; the real decode is an
explicit stub."""

from __future__ import annotations

import pytest

from distgrep_spark.operators.multimodal import (
    attach_fake_payload,
    decode_image,
    extract_byte_features,
    payload_metadata,
)

DOCS = [(0, "hello world"), (1, "abc"), (2, "éè accented")]


@pytest.fixture(scope="module")
def payload_df(spark):
    return attach_fake_payload(spark.createDataFrame(DOCS, ["doc_id", "text"]))


def py_features(text: str):
    b = text.encode("utf-8")
    hist = [0.0] * 16
    for byte in b:
        hist[byte >> 4] += 1.0
    n = float(len(b)) or 1.0
    return len(b), sum(1 for h in hist if h > 0), [h / n for h in hist]


def test_byte_features_match_python(payload_df):
    rows = {r["doc_id"]: r for r in extract_byte_features(payload_df).collect()}
    for doc_id, text in DOCS:
        n, ent, hist = py_features(text)
        r = rows[doc_id]
        assert r["n_bytes"] == n
        assert r["byte_entropy_bin"] == ent
        assert list(r["byte_histogram"]) == pytest.approx(hist)


def test_payload_metadata(payload_df):
    rows = {r["doc_id"]: r for r in payload_metadata(payload_df).collect()}
    assert rows[0]["n_bytes"] == len("hello world".encode())
    assert rows[2]["n_bytes"] == len("éè accented".encode("utf-8"))
    assert rows[0]["format"] == "fake/png"
    assert rows[1]["width"] == 1 % 640 + 64


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
