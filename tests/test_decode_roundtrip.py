"""Randomized ABI encode->decode round-trip: a seeded fuzz over the full
supported type lattice (addresses, uintN, intN, bool, bytesN, string, bytes,
indexed and not), encoded by an independent pure-Python ABI encoder and
decoded by the engine's column expressions in ONE DataFrame pass.

This is the property-based upgrade of the reference's golden-count test
(stream.rs:304-375): instead of one fixed range with one known count, every
supported type is exercised across its value domain, including boundaries
(0, max, sign flips, decimal-range edges).
"""

from __future__ import annotations

import random
from decimal import Decimal

import pyarrow as pa
import pytest

from eth_event_stream_spark.functions.decode import decode_event
from eth_event_stream_spark.functions.schema import parse_event_declaration

SEED = 20260813


def _tuple_comps(typ: str) -> list[str]:
    return typ[1:-1].split(",")


def _enc_static(typ: str, v) -> bytes:
    if typ.startswith("("):  # flat static tuple: components inline
        return b"".join(_enc_static(ct, cv) for ct, cv in zip(_tuple_comps(typ), v))
    if typ == "address":
        return bytes(12) + bytes.fromhex(v[2:])
    if typ == "bool":
        return (1 if v else 0).to_bytes(32, "big")
    if typ.startswith("uint"):
        return v.to_bytes(32, "big")
    if typ.startswith("int"):
        return (v % 2**256).to_bytes(32, "big")
    if typ.startswith("bytes"):  # bytesN
        n = int(typ[5:])
        return v + bytes(32 - n)
    raise AssertionError(typ)


def _enc_dynamic(payload: bytes) -> bytes:
    n = len(payload)
    return n.to_bytes(32, "big") + payload + bytes((32 - n % 32) % 32)


def _encode_data(params: list[tuple[str, object]]) -> bytes:
    """Standard ABI head/tail encoding of non-indexed params."""
    heads, tails = [], []
    # a static tuple occupies k head slots, everything else one
    head_size = sum(
        32 * (len(_tuple_comps(t)) if t.startswith("(") else 1) for t, _ in params
    )
    for typ, v in params:
        if typ in ("string", "bytes"):
            payload = v.encode() if typ == "string" else v
            offset = head_size + sum(len(t) for t in tails)
            heads.append(offset.to_bytes(32, "big"))
            tails.append(_enc_dynamic(payload))
        elif typ.endswith("[]") and typ[:-2] in ("string", "bytes"):
            # dynamic elements: [count][elem offsets (relative to the area
            # after the count)][elem tails]
            elem_t = typ[:-2]
            payloads = [e.encode() if elem_t == "string" else e for e in v]
            elem_tails = [_enc_dynamic(p) for p in payloads]
            elem_heads, off = [], 32 * len(v)
            for et in elem_tails:
                elem_heads.append(off.to_bytes(32, "big"))
                off += len(et)
            tail = (
                len(v).to_bytes(32, "big")
                + b"".join(elem_heads)
                + b"".join(elem_tails)
            )
            offset = head_size + sum(len(t) for t in tails)
            heads.append(offset.to_bytes(32, "big"))
            tails.append(tail)
        elif typ.endswith("[]"):
            elem_t = typ[:-2]
            tail = len(v).to_bytes(32, "big") + b"".join(
                _enc_static(elem_t, e) for e in v
            )
            offset = head_size + sum(len(t) for t in tails)
            heads.append(offset.to_bytes(32, "big"))
            tails.append(tail)
        else:
            heads.append(_enc_static(typ, v))
    return b"".join(heads) + b"".join(tails)


def _rand_value(rng: random.Random, typ: str):
    if typ.startswith("("):
        return tuple(_rand_value(rng, ct) for ct in _tuple_comps(typ))
    if typ.endswith("[]"):
        return [_rand_value(rng, typ[:-2]) for _ in range(rng.randint(0, 5))]
    if typ == "address":
        return f"0x{rng.getrandbits(160):040x}"
    if typ == "bool":
        return rng.random() < 0.5
    if typ.startswith("uint"):
        bits = int(typ[4:] or 256)
        choices = [0, 1, 2**bits - 1, rng.getrandbits(bits)]
        if bits >= 130:
            choices += [10**38 - 1, 10**38]  # decimal-range edge
        return rng.choice([c for c in choices if c < 2**bits])
    if typ.startswith("int"):
        bits = int(typ[3:] or 256)
        lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
        return rng.choice([0, -1, lo, hi, rng.randint(lo, hi)])
    if typ.startswith("bytes") and typ != "bytes":
        n = int(typ[5:])
        return rng.getrandbits(8 * n).to_bytes(n, "big")
    if typ == "string":
        return "".join(rng.choice("abcdef ∆é") for _ in range(rng.randint(0, 70)))
    if typ == "bytes":
        # one length draw — two independent draws overflowed to_bytes
        n = rng.randint(0, 70)
        return rng.getrandbits(8 * n).to_bytes(n, "big") if rng.random() < 0.9 else b""
    raise AssertionError(typ)


def _expected(typ: str, v):
    """What the decoder should surface for a value of this type."""
    if typ.startswith("("):
        return tuple(_expected(ct, cv) for ct, cv in zip(_tuple_comps(typ), v))
    if typ.endswith("[]"):
        return [_expected(typ[:-2], e) for e in v]
    if typ == "address":
        return v.lower()
    if typ == "bool":
        return v
    if typ.startswith("uint"):
        bits = int(typ[4:] or 256)
        if bits <= 63:
            return v
        return Decimal(v) if v < 10**38 else None
    if typ.startswith("int"):
        bits = int(typ[3:] or 256)
        if bits <= 63:
            return v
        if bits <= 122:
            return Decimal(v)
        return Decimal(v) if abs(v) <= 10**38 - 1 else None
    if typ.startswith("bytes") and typ != "bytes":
        return "0x" + v.hex()
    if typ == "string":
        return v
    if typ == "bytes":
        return v
    raise AssertionError(typ)


TYPES = [
    "address",
    "bool",
    "uint8",
    "uint32",
    "uint64",
    "uint128",
    "uint256",
    "int8",
    "int64",
    "int120",
    "int256",
    "bytes4",
    "bytes32",
    "string",
    "bytes",
    "uint256[]",
    "address[]",
    "uint64[]",
    "bool[]",
    "string[]",
    "bytes[]",
    "(uint256,address)",
    "(uint64,bool,bytes4)",
    "(int128,uint8,address)",
]
# indexed dynamic params and tuples are keccak hashes per the ABI spec —
# exclude them
INDEXABLE = [
    t
    for t in TYPES
    if t not in ("string", "bytes") and not t.endswith("[]") and not t.startswith("(")
]


def test_tuple_and_dynamic_array_roundtrip(spark):
    """Deterministic pin of the round-2 type extensions: string[]/bytes[]
    (two-level head/tail) and flat static tuples (inline k-slot encoding,
    incl. a wide numeric component -> whole-tuple lossless hex), mixed with
    scalars so head-slot accounting across multi-slot tuples is exercised."""
    decl = (
        "Evt((uint256,address) pair, string[] names, uint64 n, "
        "bytes[] blobs, (uint32,bool,bytes4) trip)"
    )
    vals = {
        "pair": (10**38 + 7, "0x" + "ab" * 20),  # uint256 beyond decimal range
        "names": ["alice", "", "b∆b"],
        "n": 7,
        "blobs": [b"\x01\x02", b"", b"\xff" * 40],
        "trip": (2**31, True, b"\xde\xad\xbe\xef"),
    }
    types = {
        "pair": "(uint256,address)",
        "names": "string[]",
        "n": "uint64",
        "blobs": "bytes[]",
        "trip": "(uint32,bool,bytes4)",
    }
    ev = parse_event_declaration(decl)
    data = _encode_data([(types[n], vals[n]) for n in vals])
    row = {
        "address": "0x" + "aa" * 20,
        "topics": [ev.topic0],
        "data": data,
        "block_number": 1,
        "log_index": 0,
        "transaction_hash": "0x0",
        "removed": False,
    }
    schema = pa.schema(
        [
            pa.field("address", pa.string()),
            pa.field("topics", pa.list_(pa.string())),
            pa.field("data", pa.binary()),
            pa.field("block_number", pa.int64()),
            pa.field("log_index", pa.int64()),
            pa.field("transaction_hash", pa.string()),
            pa.field("removed", pa.bool_()),
        ]
    )
    tbl = pa.table({k: [row[k]] for k in schema.names}, schema=schema)
    df = spark.createDataFrame(tbl.to_pandas())
    r = decode_event(df, decl).collect()[0]

    for name in vals:
        assert _norm(r[name]) == _expected(types[name], vals[name]), name
    # the out-of-decimal-range uint256 component nulls, but the tuple's
    # lossless hex carries the full 2-slot inline encoding
    assert r["pair"]["f0"] is None
    assert r["pair_hex"] == "0x" + _enc_static(types["pair"], vals["pair"]).hex()
    # and the trip tuple (no wide numerics) gets no hex column
    assert "trip_hex" not in r.asDict()


def _norm(x):
    """Canonicalize collected cells: bytearray -> bytes, Row -> tuple,
    recursively (bytes[] yields lists of bytearray; tuples yield Rows)."""
    if isinstance(x, bytearray):
        return bytes(x)
    if isinstance(x, list):
        return [_norm(e) for e in x]
    if isinstance(x, tuple):  # includes Row
        return tuple(_norm(e) for e in x)
    return x


@pytest.mark.parametrize("case_seed", [SEED, SEED + 1, SEED + 2, SEED + 3, SEED + 4])
def test_random_roundtrip(spark, case_seed):
    rng = random.Random(case_seed)
    # one random event shape per seed, many random rows decoded in one pass
    n_params = rng.randint(1, 6)
    params = []
    for i in range(n_params):
        typ = rng.choice(TYPES)
        indexed = typ in INDEXABLE and rng.random() < 0.4 and sum(p[2] for p in params) < 3
        params.append((f"p{i}", typ, indexed))
    decl = "Evt(" + ", ".join(
        f"{t} indexed {n}" if ix else f"{t} {n}" for n, t, ix in params
    ) + ")"
    ev = parse_event_declaration(decl)

    rows, expected = [], []
    for li in range(120):
        vals = {n: _rand_value(rng, t) for n, t, _ in params}
        topics = [ev.topic0] + [
            "0x" + _enc_static(t, vals[n]).hex() for n, t, ix in params if ix
        ]
        data = _encode_data([(t, vals[n]) for n, t, ix in params if not ix])
        rows.append(
            {
                "address": "0x" + "aa" * 20,
                "topics": topics,
                "data": data,
                "block_number": 1,
                "log_index": li,
                "transaction_hash": f"0x{li:x}",
                "removed": False,
            }
        )
        expected.append({n: _expected(t, vals[n]) for n, t, _ in params})

    schema = pa.schema(
        [
            pa.field("address", pa.string()),
            pa.field("topics", pa.list_(pa.string())),
            pa.field("data", pa.binary()),
            pa.field("block_number", pa.int64()),
            pa.field("log_index", pa.int64()),
            pa.field("transaction_hash", pa.string()),
            pa.field("removed", pa.bool_()),
        ]
    )
    tbl = pa.table({k: [r[k] for r in rows] for k in schema.names}, schema=schema)
    df = spark.createDataFrame(tbl.to_pandas())

    got = {r["log_index"]: r for r in decode_event(df, decl).collect()}
    assert len(got) == 120, decl
    for li, exp in enumerate(expected):
        r = got[li]
        for name, want in exp.items():
            assert _norm(r[name]) == want, (decl, li, name, _norm(r[name]), want)
