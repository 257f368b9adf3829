"""Parser + signature goldens — ports /root/reference/eth_event_macro/src/events.rs:117-194."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from eth_event_stream_spark.functions.keccak import keccak256_hex
from eth_event_stream_spark.functions.schema import (
    EventDeclarationError,
    event_schema,
    parse_event_declaration,
)

TRANSFER = "Transfer(address indexed from, address indexed to, uint value)"


def test_keccak_golden_vectors():
    # Ethereum's canonical empty hash + the ERC-20 event signature hashes
    assert (
        keccak256_hex(b"")
        == "0xc5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256_hex("Transfer(address,address,uint256)")
        == "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    assert (
        keccak256_hex("Approval(address,address,uint256)")
        == "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925"
    )
    # multi-block input exercises the sponge loop
    assert keccak256_hex(b"a" * 1000).startswith("0x")


def test_transfer_golden():
    """The events.rs golden case: full ERC-20 Transfer declaration."""
    ev = parse_event_declaration(TRANSFER)
    assert ev.name == "Transfer"
    assert [(p.name, p.type, p.indexed) for p in ev.params] == [
        ("from", "address", True),
        ("to", "address", True),
        ("value", "uint256", False),
    ]
    assert not ev.anonymous
    assert ev.canonical_signature == "Transfer(address,address,uint256)"
    # signature == ethabi::Event::signature() == on-chain topic0
    assert (
        ev.topic0
        == "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )


def test_struct_type_shape():
    st = event_schema(TRANSFER)
    names = [f.name for f in st.fields]
    # fixed columns first (eth_event_macro/src/lib.rs:190-220), then params
    assert names == [
        "block_number",
        "transaction_hash",
        "address",
        "log_index",
        "from",
        "to",
        "value",
        "value_hex",
    ]
    assert st["value"].dataType == T.DecimalType(38, 0)
    assert st["from"].dataType == T.StringType()
    assert st["block_number"].dataType == T.LongType()


def test_empty_params_and_anonymous():
    ev = parse_event_declaration("Ping() anonymous")
    assert ev.name == "Ping" and ev.params == () and ev.anonymous
    ev2 = parse_event_declaration("Ping()")
    assert not ev2.anonymous
    assert ev2.canonical_signature == "Ping()"


def test_type_canonicalization():
    ev = parse_event_declaration("E(uint a, uint256 b, bool c, uint8 d, bytes32 e)")
    assert [p.type for p in ev.params] == ["uint256", "uint256", "bool", "uint8", "bytes32"]
    st = ev.to_struct_type(include_fixed=False)
    assert st["d"].dataType == T.LongType()  # small uint stays a long
    assert st["c"].dataType == T.BooleanType()
    assert st["e"].dataType == T.StringType()


@pytest.mark.parametrize(
    "bad",
    [
        "event Transfer(address indexed from, address indexed to, uint value)",  # events.rs:16-18
        "Transfer(address indexed from) garbage",  # trailing garbage, events.rs:81-86
        "Transfer(address indexed)",  # missing name
        "Transfer(uint7 x)",  # invalid width
        "Transfer(address from, address from)",  # duplicate name
        "Transfer",  # no parens
        "1Bad(uint x)",  # invalid event name
        "Transfer(notatype x)",
    ],
)
def test_rejects(bad):
    with pytest.raises(EventDeclarationError):
        parse_event_declaration(bad)


def test_query_catalog_is_current():
    """QUERIES.md must match the registry — regenerate with
    tools/gen_query_catalog.py after adding or renaming queries."""
    import os
    import re

    from eth_event_stream_spark.plans import QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md")) as f:
        md = f.read()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", md, re.M))
    registered = set(QUERIES)
    assert listed == registered, (
        f"QUERIES.md stale: missing {sorted(registered - listed)}, "
        f"extra {sorted(listed - registered)} — run tools/gen_query_catalog.py"
    )
