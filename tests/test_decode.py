"""Decode operator vs a pure-Python ABI oracle — ports the macro decoder
semantics (/root/reference/eth_event_macro/src/lib.rs:119-154)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from eth_event_stream_spark.functions.decode import assert_no_removed, decode_event
from eth_event_stream_spark.sources.fixtures import ADDR_A, TRANSFER_DECL


def _py_decode(row):
    """Reference-equivalent decode in plain Python (the oracle)."""
    src = "0x" + row["topics"][1][-40:]
    dst = "0x" + row["topics"][2][-40:]
    value = int.from_bytes(row["data"], "big")
    return src, dst, value


def test_decode_matches_python_oracle(spark, eth_logs_fixture, eth_logs):
    fx, _ = eth_logs_fixture
    decoded = decode_event(eth_logs, TRANSFER_DECL, address=ADDR_A)
    got = {
        (r["block_number"], r["log_index"]): r
        for r in decoded.collect()
    }
    expected = {}
    for row in fx.rows:
        if row["address"] != ADDR_A or row["removed"]:
            continue
        expected[(row["block_number"], row["log_index"])] = _py_decode(row)

    assert set(got) == set(expected)
    for key, (src, dst, value) in expected.items():
        r = got[key]
        assert r["from"] == src
        assert r["to"] == dst
        assert r["value_hex"] == "0x" + format(value, "x").rjust(64, "0")
        if value < 10**38:
            assert r["value"] == Decimal(value), (key, value)
        else:
            assert r["value"] is None  # out of decimal range -> NULL, hex lossless


def test_decode_fixed_columns(spark, eth_logs):
    decoded = decode_event(eth_logs, TRANSFER_DECL, address=ADDR_A)
    assert decoded.columns == [
        "block_number",
        "transaction_hash",
        "address",
        "log_index",
        "from",
        "to",
        "value",
        "value_hex",
    ]
    assert decoded.filter(F.col("address") != ADDR_A).count() == 0


def test_golden_count(spark, eth_logs_fixture, eth_logs):
    """Analog of the reference's '56 USDC logs' golden (stream.rs:371)."""
    fx, _ = eth_logs_fixture
    n = (
        decode_event(eth_logs, TRANSFER_DECL, address=ADDR_A)
        .dropDuplicates(["block_number", "log_index"])
        .count()
    )
    assert n == fx.golden_count_a
    assert n > 0


def test_assert_no_removed_raises(spark, eth_logs):
    import py4j.protocol

    with pytest.raises(Exception) as ei:
        assert_no_removed(eth_logs).count()
    assert "confirmation blocks" in str(ei.value)


def test_decimal_edge_values(spark, eth_logs_fixture, eth_logs):
    """The fixture plants 2^64, 10^38-1 (fits), 10^38+12345 and 2^127+7."""
    decoded = decode_event(eth_logs, TRANSFER_DECL).dropDuplicates(
        ["block_number", "log_index"]
    )
    vals = {r["value_hex"]: r["value"] for r in decoded.collect()}

    def hx(v):
        return "0x" + format(v, "x").rjust(64, "0")

    assert vals[hx(2**64)] == Decimal(2**64)
    assert vals[hx(10**38 - 1)] == Decimal(10**38 - 1)
    assert vals[hx(10**38 + 12345)] is None
    assert vals[hx(2**127 + 7)] is None
